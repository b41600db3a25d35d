"""Relational query plans (TPC-H-style, adapted to the driver schema).

The reference engine has NO relational operators (SURVEY.md §2.8) —
this module is the analytics layer the north star asks for, written
DataFrame-first so Catalyst does pushdown/pruning/join-selection.

Scale notes (100 TB): every query here keeps the big fact tables
(lineitem/orders/events) on the probe side; dimension tables
(region/nation/supplier/part, customer at small SF) are broadcast
either by Catalyst's threshold or an explicit ``F.broadcast``. The
aggregates use decimal-exact partial aggregation which map-side
combines like any sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.functions.money import cents, cents_sum, rescale, rev_cents
from dolphinbeat_spark.plans.registry import register

# decimal-exact money arithmetic (see registry docstring)
_DEC = "decimal(12,4)"


def _d(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast(_DEC)


def _dsum(c, alias: str) -> F.Column:
    # ROUND(…, 2) before the double cast: at scale 2 the unscaled value
    # stays < 2^53, so decimal→double is exact on every engine. Without
    # it, scale-8 sums > ~9e15 unscaled convert with ±1 ulp differences
    # between Spark (BigDecimal) and DuckDB (int128/10^s in fp).
    return F.round(F.sum(_d(c) if isinstance(c, str) else c), 2).cast("double").alias(alias)


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(18,8)) * (1 + CAST(l_tax AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_charge,
       CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("relational", "aggregate"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted: full-scan partial-agg — the map-side-combine
    benchmark. Only 7 columns of lineitem are read (check ReadSchema).
    widen=True: eight aggregates per row out-cost the one-task scan of
    the single-row-group test file (see catalog.load).

    r16 optimization (guide §1.2/§2.3 "narrower types"): the partial
    aggregates run on LONG cents/basis-points instead of DECIMAL —
    the representation the q1_pricing_summary_cents experiment proved
    bit-identical (both specs pass the SAME oracle SQL, hash included)
    and ~3x faster at sf100 (BASELINE §r16: 29.2 vs 9.3 s normalized;
    Spark decimal partials box BigDecimal per row, long partials stay
    primitive in the hash-agg buffer). The 2-decimal money columns are
    exact as scaled integers, so sum(price_c*(100-disc_bp)) ==
    10^4 * sum(price*(1-disc)) etc., and one decimal rescale after
    the (4-group) aggregation restores the q1 output exactly. Per-row
    terms stay far inside int64 (price_c <= ~10^7, *100*110 ~ 10^11;
    the whole-table sum at sf100 is ~2.5e18 < 2^63 — ANSI mode would
    raise loudly, not corrupt, beyond that)."""
    li = load(spark, sf_dir, "lineitem", widen=True)
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    disc_bp = F.round(F.col("l_discount") * 100).cast("long")
    tax_bp = F.round(F.col("l_tax") * 100).cast("long")
    n = F.count(F.lit(1))

    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rescale(F.sum(qty_c), 2, "sum_qty"),
            rescale(F.sum(price_c), 2, "sum_base_price"),
            rescale(F.sum(price_c * (100 - disc_bp)), 4,
                    "sum_disc_price"),
            rescale(F.sum(price_c * (100 - disc_bp) * (100 + tax_bp)),
                    6, "sum_charge"),
            (F.round(F.sum(qty_c).cast("decimal(38,6)") / 100, 2)
             .cast("double") / n).alias("avg_qty"),
            (F.round(F.sum(disc_bp).cast("decimal(38,6)") / 100, 2)
             .cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q1_pricing_summary_cents",
    # same relation as q1_pricing_summary — the EXPERIMENT (r15,
    # verdict task #5) is the aggregation representation: all four
    # money aggregates run on scaled INTEGERS (cents / basis points)
    # with a single decimal rescale at the end, instead of decimal
    # partial aggregates. If the normalized sf100 wall drops
    # materially vs q1, the decimal path was the memory-bandwidth
    # bottleneck; if not, the q1 canary is host-bound. Results are
    # identical (2-decimal inputs are exact in cents), so the oracle
    # is q1's verbatim.
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(18,8)) * (1 + CAST(l_tax AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_charge,
       CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("relational", "aggregate", "experiment"),
    bench=True,
)
def q1_pricing_summary_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1 with LONG (cents / basis-point) partial aggregates: the
    2-decimal money columns are exact as scaled integers, so
    sum(price_c*(100-disc_bp)) == 10^4 * sum(price*(1-disc)) etc.,
    and one decimal rescale after the (4-group) aggregation restores
    the q1 output exactly. Per-row terms stay far inside int64
    (price_c <= ~10^7, *100*110 ~ 10^11; the whole-table sum at sf100
    is ~2.5e18 < 2^63 — ANSI mode would raise loudly, not corrupt,
    beyond that)."""
    li = load(spark, sf_dir, "lineitem", widen=True)
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    disc_bp = F.round(F.col("l_discount") * 100).cast("long")
    tax_bp = F.round(F.col("l_tax") * 100).cast("long")
    n = F.count(F.lit(1))

    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rescale(F.sum(qty_c), 2, "sum_qty"),
            rescale(F.sum(price_c), 2, "sum_base_price"),
            rescale(F.sum(price_c * (100 - disc_bp)), 4,
                    "sum_disc_price"),
            rescale(F.sum(price_c * (100 - disc_bp) * (100 + tax_bp)),
                    6, "sum_charge"),
            (F.round(F.sum(qty_c).cast("decimal(38,6)") / 100, 2)
             .cast("double") / n).alias("avg_qty"),
            (F.round(F.sum(disc_bp).cast("decimal(38,6)") / 100, 2)
             .cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 20
""",
    tags=("relational", "join", "topn"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter → join → agg → top-N.

    customer(filtered) is broadcast into orders; orders(filtered) joins
    lineitem on the shuffle; the LIMIT is pushed through a TakeOrdered.
    """
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
                "o_orderkey", "o_orderdate", "o_orderpriority"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(cents_sum(rev_cents(), 4, "revenue"))  # r16 long-cents (functions/money.py)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(20)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
""",
    tags=("relational", "join", "aggregate"),
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join. region/nation/supplier are broadcast;
    the only shuffles are lineitem⋈orders and customer⋈orders."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    sn = s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
                s.s_nationkey == n.n_nationkey).select("s_suppkey", "s_nationkey", "n_name")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == c.c_custkey)
        .join(
            F.broadcast(sn),
            (li.l_suppkey == sn.s_suppkey) & (F.col("c_nationkey") == sn.s_nationkey),
        )
        .groupBy("n_name")
        .agg(cents_sum(rev_cents(), 4, "revenue"))  # r16 long-cents (functions/money.py)
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "q6_revenue_forecast",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("relational", "scan"),
    bench=True,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg; all predicates push to parquet."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        cents_sum(cents("l_extendedprice") * cents("l_discount"), 4, "revenue"),  # r16 long-cents
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q7_nation_trade",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("relational", "join"),
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 adapted: cross-nation trade volume by year."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == s.s_suppkey)
        .join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(cents_sum(rev_cents(), 4, "revenue"))  # r16 long-cents (functions/money.py)
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue,
       n.n_name, c.c_acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    tags=("relational", "join", "topn"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(cents_sum(rev_cents(), 4, "revenue"))  # r16 long-cents (functions/money.py)
        .select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "agg_rollup_sales",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
    tags=("relational", "aggregate", "rollup"),
)
def agg_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (reference has none — SURVEY §2.8).

    NULL group markers are coalesced to 'ALL' so the oracle compare is
    unambiguous (lineitem's own columns are never NULL here).
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(cents_sum(cents("l_quantity"), 2, "sum_qty"), F.count(F.lit(1)).alias("n_rows"))  # r16 long-cents
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "agg_distinct_counts",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("relational", "aggregate", "distinct"),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) via Spark's two-phase expand-aggregate."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,4)")).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_anti_customers_no_orders",
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c.c_custkey
""",
    tags=("relational", "join", "anti"),
)
def join_anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (TPC-H Q22 flavor)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_semi_parts_shipped",
    oracle="""
SELECT p.p_partkey, p.p_name, p.p_brand
FROM part p
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45
)
ORDER BY p.p_partkey
""",
    tags=("relational", "join", "semi"),
)
def join_semi_parts_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: parts with at least one bulk shipment."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


@register(
    "set_ops_customer_segments",
    oracle="""
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     big_spenders AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000)
SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT DISTINCT c_custkey FROM building INTERSECT SELECT DISTINCT c_custkey FROM big_spenders)
UNION ALL
SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT DISTINCT c_custkey FROM building EXCEPT SELECT DISTINCT c_custkey FROM big_spenders)
UNION ALL
SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM big_spenders)
ORDER BY op
""",
    tags=("relational", "setop"),
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (reference has none — SURVEY §2.8)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("c_custkey"))
    rows = [
        ("intersect", building.distinct().intersect(big.distinct())),
        ("except", building.distinct().exceptAll(big.distinct()).distinct()),
        ("union", building.union(big).distinct()),
    ]
    out = None
    for op, df in rows:
        part = df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")
        out = part if out is None else out.union(part)
    return out.orderBy("op")


@register(
    "scalar_functions_showcase",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       substr(p_name, 1, 8) AS name_prefix,
       length(p_name) AS name_len,
       concat(p_brand, ':', p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_slug,
       CAST(round(CAST(p_retailprice AS DECIMAL(12,4)) * 1.1, 2) AS DOUBLE) AS marked_up,
       CAST(p_size % 7 AS INTEGER) AS size_mod,
       CAST(abs(p_size - 25) AS INTEGER) AS size_dist
FROM part
ORDER BY p_partkey
""",
    tags=("relational", "scalar"),
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math function library parity (reference: none)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.round(F.col("p_retailprice").cast(_DEC) * F.lit(1.1).cast(_DEC), 2)
        .cast("double")
        .alias("marked_up"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dist"),
    ).orderBy("p_partkey")


@register(
    "datetime_functions_showcase",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
       CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS order_day,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
FROM orders
WHERE o_orderkey % 10 = 0
ORDER BY o_orderkey
""",
    tags=("relational", "scalar", "datetime"),
)
def datetime_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
    ).orderBy("o_orderkey")


@register(
    "sort_limit_global",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
""",
    tags=("relational", "sort", "topn"),
)
def sort_limit_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: Spark plans TakeOrderedAndProject — no full sort,
    each partition keeps K rows, driver merges. O(K) memory at any SF."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )
