"""Third relational batch: the remaining classic TPC-H query shapes,
adapted to the driver's trimmed star schema (no partsupp table, no
commit/receipt dates — the docstring of each spec names the proxy).

Covers: min-per-group join-back (Q2), market share ratio (Q8),
multi-dim profit rollup (Q9), HAVING-vs-global-scalar (Q11),
conditional two-way counts (Q12), outer-join distribution (Q13),
CASE-ratio aggregate (Q14).

Scale notes (100 TB): lineitem stays probe-side everywhere; part /
supplier / nation / region are broadcast. Q2's min-per-group reuses
one (l_partkey, l_suppkey) shuffle for both the per-pair min and the
per-part argmin. Q11's global scalar is a 1-row broadcast, not a
driver collect. Q13 shuffles orders once on o_custkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.functions.money import cents, cents_sum, rev_cents
from dolphinbeat_spark.plans.registry import register

_DEC = "decimal(12,4)"


def _d(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast(_DEC)


def _dsum(c, alias: str) -> F.Column:
    return F.round(F.sum(_d(c) if isinstance(c, str) else c), 2).cast("double").alias(alias)


_REV = "CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))"


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(unit_price) AS best_price FROM unit GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, u.unit_price AS best_unit_price
FROM unit u
JOIN best b ON u.l_partkey = b.l_partkey AND u.unit_price = b.best_price
JOIN part p ON p.p_partkey = u.l_partkey
JOIN supplier s ON s.s_suppkey = u.l_suppkey
ORDER BY best_unit_price, p.p_partkey, s.s_suppkey
LIMIT 100
""",
    tags=("relational", "join", "argmin"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part argmin supplier. The reference schema
    has no partsupp, so observed unit price (l_extendedprice /
    l_quantity) stands in for ps_supplycost. The correlated MIN
    subquery is decorrelated into min-per-group + join-back; both aggs
    hang off the same (l_partkey, l_suppkey) shuffle, and the
    join-back keys on l_partkey alone — a subset of that partitioning,
    so no extra exchange of the big side."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    best = unit.groupBy("l_partkey").agg(F.min("unit_price").alias("best_price"))
    return (
        unit.join(best, "l_partkey")
        .filter(F.col("unit_price") == F.col("best_price"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.col("unit_price").alias("best_unit_price"),
        )
        .orderBy("best_unit_price", "p_partkey", "s_suppkey")
        .limit(100)
    )


@register(
    "q8_market_share",
    oracle=f"""
WITH rev AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
         {_REV} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA'
), g AS (
  SELECT o_year,
         CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END), 2) AS DOUBLE) AS nation_revenue,
         CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_revenue
  FROM rev GROUP BY o_year
)
SELECT o_year, nation_revenue, total_revenue,
       ROUND(nation_revenue / total_revenue, 6) AS mkt_share
FROM g ORDER BY o_year
""",
    tags=("relational", "join", "ratio"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of yearly revenue into a region.
    Two broadcast dim chains (customer-nation-region restricts the
    orders side; supplier-nation tags the lineitem side); the only big
    shuffle is lineitem ⋈ orders. The ratio divides two already-
    rounded doubles, so it is bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = load(spark, sf_dir, "supplier")
    cn = c.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        c.c_nationkey == n.n_nationkey,
    ).select("c_custkey")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    rev = (
        li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .join(cn, F.col("o_custkey") == cn.c_custkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            # r16 long-cents (functions/money.py): scale-4 integer
            rev_cents().alias("volume"),
            "supp_nation",
        )
    )
    g = rev.groupBy("o_year").agg(
        cents_sum(
            F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                F.lit(0).cast("long")
            ),
            4,
            "nation_revenue",
        ),
        cents_sum(F.col("volume"), 4, "total_revenue"),
    )
    return g.select(
        "o_year",
        "nation_revenue",
        "total_revenue",
        F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias("mkt_share"),
    ).orderBy("o_year")


@register(
    "q9_profit_by_nation_year",
    oracle="""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))
                      - CAST(l.l_quantity AS DECIMAL(12,4)) * CAST(p.p_retailprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_name LIKE '%widget%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    tags=("relational", "join", "aggregate"),
    bench=True,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-line profit by supplier nation and year. The
    schema has no ps_supplycost; cost is proxied by quantity *
    p_retailprice (same decimal-exact subtraction shape). part is
    filtered THEN broadcast, so the p_name LIKE prunes lineitem at the
    join instead of post-hoc; supplier⋈nation broadcast too — the only
    shuffle is lineitem ⋈ orders plus the final (nation, year) agg."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    # r16 long-cents (functions/money.py): both terms are scale-4
    # integers — cents x basis-points and cents x cents — so the
    # subtraction and sum stay primitive int64 in the agg buffer;
    # per-row |term| <= ~1e11, sf100 group sums ~1e17 << 2^63 (ANSI
    # raises loudly beyond).
    profit = rev_cents() - cents("l_quantity") * cents("p_retailprice")
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(cents_sum(profit, 4, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(ROUND(val, 2) AS DOUBLE) AS part_value
FROM pv
WHERE CAST(val AS DOUBLE) > 1.4 * (SELECT CAST(SUM(val) AS DOUBLE) / COUNT(*) FROM pv)
ORDER BY part_value DESC, l_partkey
""",
    tags=("relational", "subquery", "scalar"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose value exceeds a threshold derived
    from a global scalar subquery (here 1.4× the mean part value, which
    stays meaningful at every scale factor — TPC-H's fixed fraction
    over-selects or empties out as |parts| changes). The scalar is a
    1-row aggregate broadcast-joined to every group — no driver
    collect, no second scan of lineitem (pv feeds both sides). The
    comparison is done on doubles derived from exact decimal sums, so
    both engines see identical bits."""
    li = load(spark, sf_dir, "lineitem")
    # r16 long-cents (functions/money.py): the per-part partials are
    # primitive longs. Every double the comparison sees is derived by
    # first restoring the EXACT decimal value (scale-4 integer cast
    # decimal(38,6) / 10^4 — exact at 6 fractional digits), so each
    # double conversion happens once on the same exact value as the
    # decimal formulation: identical bits, identical row set.
    _v = lambda c: (c.cast("decimal(38,6)") / F.lit(10 ** 4))  # noqa: E731
    pv = li.groupBy("l_partkey").agg(F.sum(rev_cents()).alias("val"))
    total = pv.agg(
        (_v(F.sum("val")).cast("double") / F.count(F.lit(1))).alias("mean_val")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(_v(F.col("val")).cast("double") > 1.4 * F.col("mean_val"))
        .select(
            "l_partkey",
            F.round(_v(F.col("val")), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "q12_priority_by_lateness",
    oracle="""
SELECT l.l_returnflag AS shipclass,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
GROUP BY shipclass
ORDER BY shipclass
""",
    tags=("relational", "join", "conditional-agg"),
)
def q12_priority_by_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional two-way counts over a join. The
    schema has no l_shipmode/commitdate, so the class is l_returnflag
    and "late" is shipped ≥30 days after order date. The CASE
    aggregation is a single pass — no self-join, map-side combined."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
                li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.col("l_returnflag").alias("shipclass"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipclass")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
WITH co AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM co GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("relational", "outer-join", "aggregate"),
    bench=True,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: orders-per-customer histogram via LEFT OUTER join
    (zero-order customers must appear with c_count=0 — an inner join
    silently drops them, which is the classic Q13 bug). One shuffle on
    the customer key, then a cheap re-agg on the tiny count domain."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    co = (
        c.select("c_custkey")
        .join(o.select("o_custkey", "o_orderkey"), c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
WITH m AS (
  SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS ship_month,
         CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV} ELSE 0 END), 2) AS DOUBLE) AS promo_revenue,
         CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY ship_month
)
SELECT ship_month, promo_revenue, total_revenue,
       ROUND(100 * promo_revenue / total_revenue, 6) AS promo_pct
FROM m ORDER BY ship_month
""",
    tags=("relational", "join", "ratio"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share per ship month. part is
    broadcast (only p_partkey, p_type survive pruning); one pass, one
    (month) agg shuffle; the percentage divides two rounded doubles."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    # r16 long-cents (functions/money.py)
    vol = rev_cents()
    m = (
        li.join(F.broadcast(p.select("p_partkey", "p_type")), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            cents_sum(
                F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("long")),
                4,
                "promo_revenue",
            ),
            cents_sum(vol, 4, "total_revenue"),
        )
    )
    return m.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        F.round(100 * F.col("promo_revenue") / F.col("total_revenue"), 6).alias("promo_pct"),
    ).orderBy("ship_month")
