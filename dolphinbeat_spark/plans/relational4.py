"""Fourth relational batch: the remaining TPC-H query shapes —
argmax-with-ties (Q15), distinct-count rollup (Q16), HAVING join-back
(Q18), disjunctive multi-range predicates (Q19), nested semi join
(Q20), exists/not-exists lateness (Q21, decorrelated), anti join with
global scalar (Q22).

Scale notes (100 TB): every shape decorrelates to hash joins on keys
Catalyst can shuffle-partition; the correlated forms (Q21's double
EXISTS, Q22's NOT EXISTS) are rewritten to single-pass aggregates +
semi/anti joins — the per-row subquery form would be O(n·m) probes at
scale. Thresholds are chosen to stay selective at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.functions.money import cents, cents_sum, rescale, rev_cents
from dolphinbeat_spark.plans.registry import register

_DEC = "decimal(12,4)"


def _d(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast(_DEC)


_REV = "CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))"


@register(
    "q15_top_supplier",
    oracle=f"""
WITH srev AS (
  SELECT l_suppkey, SUM({_REV}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(ROUND(t.total_rev, 2) AS DOUBLE) AS total_revenue
FROM srev t JOIN supplier s ON t.l_suppkey = s.s_suppkey
WHERE t.total_rev = (SELECT MAX(total_rev) FROM srev)
ORDER BY s.s_suppkey
""",
    tags=("relational", "subquery", "argmax"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue —
    argmax with ties via a global-MAX scalar subquery. The scalar MAX
    is a 1-row broadcast over the already-aggregated srev (computed
    once, consumed twice); equality compares exact decimals, so ties
    resolve identically on both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    # r16 long-cents (functions/money.py): max/equality on the exact
    # scale-4 integers resolves ties identically to the decimals
    # (scaling is injective); the rescale restores the output exactly.
    srev = li.groupBy("l_suppkey").agg(F.sum(rev_cents()).alias("total_rev"))
    mx = srev.agg(F.max("total_rev").alias("max_rev"))
    return (
        srev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", rescale(F.col("total_rev"), 4, "total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 7, 14, 23, 36, 45)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    tags=("relational", "distinct", "aggregate"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct suppliers per (brand, type, size). The
    filtered part dim is broadcast; COUNT(DISTINCT) expands to a
    two-phase partial-dedup aggregate (dedup happens map-side before
    the shuffle, so the exchange carries distinct pairs only)."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 7, 14, 23, 36, 45)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
                li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q18_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,4))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(ROUND(b.sum_qty, 2) AS DOUBLE) AS sum_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
    tags=("relational", "having", "join"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300, joined back
    to orders+customer. The HAVING prunes to a tiny key set BEFORE the
    joins, so the surviving `big` side is broadcast into orders — the
    orders and customer scans never shuffle."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # r16 long-cents (functions/money.py): exact integer filter
    # (cents > 30000 <=> decimal > 300), primitive partials
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity")).alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > 30000)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c.select("c_custkey", "c_name"), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            rescale(F.col("sum_qty_c"), 2, "sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("relational", "join", "disjunction"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate spanning both join sides.
    Catalyst extracts the common per-side conjuncts from the
    disjunction (brand/size reach the broadcast part scan, quantity
    1-30 reaches the lineitem scan as a derived filter) and evaluates
    the residual disjunction post-join — the classic pushdown-through-
    OR test."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
                li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 35) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        cents_sum(rev_cents(), 4, "revenue"),  # r16 long-cents
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q20_excess_suppliers",
    oracle="""
WITH pq AS (
  SELECT l.l_suppkey, l.l_partkey, SUM(CAST(l.l_quantity AS DECIMAL(12,4))) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'red%'
  GROUP BY l.l_suppkey, l.l_partkey
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM pq WHERE qty > 50)
ORDER BY s.s_suppkey
""",
    tags=("relational", "semi", "subquery"),
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved >50 units of any 'red'
    part — nested aggregate feeding a LEFT SEMI join (IN-subquery).
    The inner agg groups on (suppkey, partkey); the semi join then
    needs only the distinct suppkeys, which Spark derives without
    materializing duplicates (semi joins short-circuit per key)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load(spark, sf_dir, "supplier")
    pq = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_c"))  # r16 long-cents
        .filter(F.col("qty_c") > 5000)
    )
    return (
        s.join(pq, s.s_suppkey == pq.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F' AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  GROUP BY l.l_orderkey, l.l_suppkey
), allsupp AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp FROM lineitem GROUP BY l_orderkey
), lateagg AS (
  SELECT l_orderkey, COUNT(*) AS n_late FROM late GROUP BY l_orderkey
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late t
JOIN lateagg la ON t.l_orderkey = la.l_orderkey
JOIN allsupp a ON t.l_orderkey = a.l_orderkey
JOIN supplier s ON t.l_suppkey = s.s_suppkey
WHERE la.n_late = 1 AND a.n_supp > 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
    tags=("relational", "semi", "anti", "decorrelated"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finished order (no commit/receipt dates in this
    schema, so "late" = shipped >60 days after order date). The
    EXISTS / NOT-EXISTS pair is decorrelated into per-order counts
    (n_supp > 1 replaces EXISTS other-supplier; n_late = 1 replaces
    NOT EXISTS other-late-supplier) — all three aggregates share the
    l_orderkey partitioning, one scan of lineitem each, no per-row
    correlated probes."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    late = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    allsupp = li.groupBy("l_orderkey").agg(F.count_distinct("l_suppkey").alias("n_supp"))
    lateagg = late.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_late"))
    return (
        late.join(lateagg, "l_orderkey")
        .join(allsupp, "l_orderkey")
        .filter((F.col("n_late") == 1) & (F.col("n_supp") > 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "q22_churned_balance",
    oracle="""
WITH ab AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey AS nationkey, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,4))), 2) AS DOUBLE) AS totacctbal
FROM customer c, ab
WHERE c.c_acctbal > ab.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
    tags=("relational", "anti", "subquery"),
)
def q22_churned_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no recent orders
    (every synthetic customer has SOME order, so the anti join is on
    orders after 2000-01-01 — "churned" rather than "never ordered").
    Global average balance is a 1-row broadcast; the NOT EXISTS is a
    LEFT ANTI hash join on o_custkey with the date filter pushed below
    the join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    # r16 long-cents: the exact decimal value is restored (cast
    # decimal(38,6) / 100, exact) before the single double cast, so
    # avg_bal is bit-identical to the decimal formulation.
    ab = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            ((F.sum(cents("c_acctbal")).cast("decimal(38,6)") / 100)
             .cast("double") / F.count(F.lit(1))).alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            cents_sum(cents("c_acctbal"), 2, "totacctbal"),
        )
        .orderBy("nationkey")
    )


@register(
    "array_functions_showcase",
    oracle="""
WITH arr AS (
  SELECT l_orderkey,
         list_sort(list(l_linenumber)) AS lns,
         list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(qtys) AS n_lines,
       qtys[1] AS min_qty,
       qtys[len(qtys)] AS max_qty,
       list_reduce(qtys, (a, b) -> a + b) AS total_qty,
       len(list_filter(qtys, q -> q >= 25)) AS n_heavy,
       to_json(list_transform(lns, x -> CAST(x AS BIGINT) * 10)) AS lns_x10,
       list_contains(lns, 3) AS has_line3,
       to_json(qtys[1:2]) AS first_two
FROM arr
WHERE l_orderkey % 20 = 0
ORDER BY l_orderkey
""",
    tags=("relational", "array", "higher-order"),
)
def array_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function library parity (collect →
    array_sort for deterministic order, element_at, aggregate fold,
    filter, transform, contains, slice). The reference has no
    value-level function surface at all (SURVEY §2.8); these are the
    Catalyst lambda functions that keep array work JVM-side instead of
    in Python UDFs."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    arr = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("lns"),
        F.array_sort(F.collect_list(F.col("l_quantity").cast("bigint"))).alias("qtys"),
    )
    return (
        arr.select(
            "l_orderkey",
            F.size("qtys").alias("n_lines"),
            F.element_at("qtys", 1).alias("min_qty"),
            F.element_at("qtys", F.size("qtys")).alias("max_qty"),
            F.aggregate("qtys", F.lit(0).cast("bigint"), lambda a, b: a + b).alias("total_qty"),
            F.size(F.filter("qtys", lambda q: q >= 25)).alias("n_heavy"),
            # array-typed outputs ship as JSON strings: the driver's
            # canonicalizer (pandas sort) can't hash list cells
            F.to_json(F.transform("lns", lambda x: x.cast("bigint") * 10)).alias("lns_x10"),
            F.array_contains("lns", 3).alias("has_line3"),
            F.to_json(F.slice("qtys", 1, 2)).alias("first_two"),
        )
        .orderBy("l_orderkey")
    )


@register(
    "join_salted_supplier_revenue",
    oracle="""
SELECT s.s_nationkey,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
ORDER BY s.s_nationkey
""",
    tags=("relational", "join", "skew"),
)
def join_salted_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-and-replicate skew join (operators/skew.py): lineitem
    salted on its primary key, supplier replicated x8, join on
    (suppkey, salt). The oracle is the PLAIN join — the rewrite is
    semantics-preserving; this is the manual fallback when AQE skew
    splitting can't apply (non-SMJ plans, custom partitioners)."""
    from dolphinbeat_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    # key columns differ (l_suppkey vs s_suppkey): align names first
    joined = salted_join(
        li.withColumnRenamed("l_suppkey", "suppkey"),
        s.select(F.col("s_suppkey").alias("suppkey"), "s_nationkey"),
        on="suppkey",
        salt_src=F.col("l_orderkey") * 10 + F.col("l_linenumber"),
        factor=8,
    )
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.round(F.sum(_d("l_extendedprice") * (1 - _d("l_discount"))), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY returnflag, linestatus
""",
    tags=("relational", "aggregate", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not derivable from cube/rollup alone)
    with GROUPING() null-vs-grouped disambiguation. DataFrame API has
    only cube/rollup, so this goes through spark.sql — one Expand node,
    single scan, partial-aggregated like any groupBy."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
               COALESCE(l_linestatus, '<all>') AS linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               COUNT(*) AS n_rows,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty
        FROM v_li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus
        """
    )


@register(
    "set_ops_all_variants",
    oracle="""
WITH a AS (
  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
), b AS (
  SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F' AND l_quantity >= 25
)
SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
UNION ALL
SELECT 'except_all' AS op, COUNT(*) AS n FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
ORDER BY op
""",
    tags=("relational", "set-ops", "multiset"),
)
def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL / EXCEPT ALL (bag semantics — the
    DISTINCT forms are covered by set_ops_customer_segments). Spark
    plans these as aggregate+generate over per-row multiplicity counts:
    one shuffle per side on the full row, no join blowup."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(
        (F.col("l_linestatus") == "F") & (F.col("l_quantity") >= 25)
    ).select("l_suppkey")
    inter = a.intersectAll(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    exc = a.exceptAll(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    return inter.union(exc).orderBy("op")


@register(
    "agg_string_concat_ordered",
    oracle="""
SELECT l_returnflag,
       string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
       string_agg(DISTINCT CAST(l_linenumber AS VARCHAR), '|' ORDER BY CAST(l_linenumber AS VARCHAR)) AS linenumbers
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("relational", "aggregate", "listagg"),
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string-concatenation aggregate (LISTAGG/string_agg):
    expressed as concat_ws over a sorted collect_set — deterministic
    where a bare listagg's element order is engine-private. The set
    dedups map-side; only distinct values shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias(
                "statuses"
            ),
            F.concat_ws(
                "|",
                F.array_sort(F.collect_set(F.col("l_linenumber").cast("string"))),
            ).alias("linenumbers"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "array_zip_functions",
    oracle="""
WITH per_line AS (
  SELECT l_orderkey, l_linenumber,
         MAX(CAST(l_quantity AS BIGINT)) AS qty,
         MAX(CAST(l_extendedprice AS DECIMAL(12,4))) AS price
  FROM lineitem GROUP BY l_orderkey, l_linenumber
), arr AS (
  SELECT l_orderkey,
         list_sort(list(struct_pack(k := l_linenumber, q := qty, p := price))) AS entries
  FROM per_line GROUP BY l_orderkey
)
SELECT l_orderkey,
       to_json(list_transform(entries, e -> e.q)) AS qtys,
       CAST(ROUND(list_reduce(list_transform(entries, e -> e.q * e.p),
                  (a, b) -> a + b), 2) AS DOUBLE) AS dot_qty_price
FROM arr
WHERE l_orderkey % 150 = 0
ORDER BY l_orderkey
""",
    tags=("relational", "array", "zip"),
)
def array_zip_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip_with over parallel arrays: element-wise qty×price then an
    ordered fold — the vector dot product in pure Catalyst (the same
    kernel the similarity operators build on, here over business
    arrays). Arrays built sorted so both engines fold identical
    sequences; decimal products keep the fold exact."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 150 == 0)
    per_line = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.max(F.col("l_quantity").cast("bigint")).alias("qty"),
        F.max(F.col("l_extendedprice").cast("decimal(12,4)")).alias("price"),
    )
    arr = per_line.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "qty", "price"))
        ).alias("entries")
    )
    qtys = F.transform("entries", lambda e: e["qty"])
    prices = F.transform("entries", lambda e: e["price"])
    # ANSI folds need a type-stable accumulator: bound the product and
    # cast each step back to the seed's decimal type
    dot = F.aggregate(
        F.zip_with(qtys, prices, lambda q, p: (q.cast("decimal(10,0)") * p).cast("decimal(28,4)")),
        F.lit(0).cast("decimal(28,4)"),
        lambda acc, x: (acc + x).cast("decimal(28,4)"),
    )
    return arr.select(
        "l_orderkey",
        # JSON string, not a raw array: driver canonicalizer can't hash lists
        F.to_json(qtys).alias("qtys"),
        F.round(dot, 2).cast("double").alias("dot_qty_price"),
    ).orderBy("l_orderkey")


@register(
    "generator_inline_structs",
    oracle="""
WITH per_line AS (
  SELECT l_orderkey, l_linenumber, MAX(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem GROUP BY l_orderkey, l_linenumber
), arr AS (
  SELECT l_orderkey,
         list_sort(list(struct_pack(ln := l_linenumber, q := qty))) AS entries
  FROM per_line GROUP BY l_orderkey
)
SELECT a.l_orderkey, u.e.ln AS ln, u.e.q AS q
FROM arr a, unnest(a.entries) AS u(e)
WHERE a.l_orderkey % 250 = 0
ORDER BY a.l_orderkey, ln
""",
    tags=("relational", "generator", "inline"),
)
def generator_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline() generator: explode an array<struct> into one row per
    struct with the fields as columns — the typed row-expansion
    counterpart of explode (which yields a single struct column)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 250 == 0)
    per_line = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.max(F.col("l_quantity").cast("bigint")).alias("qty")
    )
    arr = per_line.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("l_linenumber").alias("ln"), F.col("qty").alias("q"))
            )
        ).alias("entries")
    )
    return (
        arr.select("l_orderkey", F.inline("entries"))
        .orderBy("l_orderkey", "ln")
    )


@register(
    "hierarchy_recursive_paths",
    # the oracle uses a TRUE recursive CTE; the engine runs the bounded
    # iterative-join loop (Spark has no recursive CTE — the loop is the
    # idiomatic translation, same machinery as dedup_clusters'
    # label propagation)
    oracle="""
WITH RECURSIVE walk(user_id, node, path_sum, depth) AS (
  SELECT user_id, user_id, user_id, 0
  FROM (SELECT DISTINCT user_id FROM events)
  UNION ALL
  SELECT user_id, node // 10, path_sum + node // 10, depth + 1
  FROM walk WHERE node > 0
)
SELECT depth, COUNT(*) AS n_users,
       CAST(SUM(path_sum) AS BIGINT) AS sum_path
FROM (
  SELECT user_id, MAX(depth) AS depth, MAX(path_sum) AS path_sum
  FROM walk GROUP BY user_id
)
GROUP BY depth
ORDER BY depth
""",
    tags=("relational", "recursive", "hierarchy", "iterative"),
)
def hierarchy_recursive_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy traversal without recursive CTEs: each user walks the
    synthetic tree parent(n) = n // 10 to the root, accumulating depth
    and ancestor sum. The Spark form is a bounded iterative refinement
    (each round advances every non-root walker one level; rounds =
    tree height = O(log max_id)) with a localCheckpoint per
    round to cut the exploding lineage — the standard Spark shape for
    transitive closure when the recursion depth is bounded, identical
    machinery to dedup_clusters. The oracle is DuckDB's native
    WITH RECURSIVE."""
    e = load(spark, sf_dir, "events")
    walk = (
        e.select("user_id").distinct()
        .select(
            "user_id",
            F.col("user_id").alias("node"),
            F.col("user_id").alias("path_sum"),
            F.lit(0).alias("depth"),
        )
    )
    for _ in range(9):  # ceil(log10(max user_id)) bounds the height (9 → ids < 10^9)
        nxt = F.floor(F.col("node") / 10).cast("bigint")
        walk = walk.select(
            "user_id",
            F.when(F.col("node") > 0, nxt).otherwise(F.col("node")).alias("node"),
            F.when(F.col("node") > 0, F.col("path_sum") + nxt)
            .otherwise(F.col("path_sum"))
            .alias("path_sum"),
            F.when(F.col("node") > 0, F.col("depth") + 1)
            .otherwise(F.col("depth"))
            .alias("depth"),
        ).localCheckpoint(eager=False)
    return (
        walk.groupBy("depth")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("path_sum").cast("bigint").alias("sum_path"),
        )
        .orderBy("depth")
    )


_PROFILE_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_returnflag", "l_linestatus", "l_shipdate",
)


def _profile_min_max_sql(c: str) -> tuple[str, str]:
    if c == "l_shipdate":
        return (
            f"strftime(MIN({c}), '%Y-%m-%d %H:%M:%S')",
            f"strftime(MAX({c}), '%Y-%m-%d %H:%M:%S')",
        )
    return f"CAST(MIN({c}) AS VARCHAR)", f"CAST(MAX({c}) AS VARCHAR)"


@register(
    "profile_table_stats",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {_profile_min_max_sql(c)[0]} AS min_value,
       {_profile_min_max_sql(c)[1]} AS max_value
FROM lineitem"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY column_name",
    tags=("profiling", "stats", "data-quality"),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table data-profiling report: one row per column with
    row/null/distinct counts and min/max — the first thing any data
    platform runs against a new 100 TB delivery. ONE scan computes
    every column's aggregates simultaneously (Spark's partial-agg
    machinery fuses them); the oracle's N-scan UNION ALL is the
    semantic spec, not the plan. Doubles are profiled numerically in
    production; here the column set sticks to types whose min/max
    render identically as text on both engines (the l_quantity family
    would hit float-formatting differences, not value differences)."""
    li = load(spark, sf_dir, "lineitem", widen=True)

    def min_max(c):
        mn, mx = F.min(c), F.max(c)
        if c == "l_shipdate":
            fmt = "yyyy-MM-dd HH:mm:ss"
            return F.date_format(mn, fmt), F.date_format(mx, fmt)
        return mn.cast("string"), mx.cast("string")

    # Two single-row aggregation passes instead of one (r17): mixing
    # count_distinct with string-buffered min/max in ONE agg put the
    # stringly min/max buffers onto the distinct-rewrite's Expand, and
    # string agg buffers force SortAggregate — the plan sorted
    # (|cols|+1) x |table| expanded rows three times. Split, the
    # min/max pass has no Expand (grouping-free partial agg, no sort)
    # and the distinct pass keeps long-only buffers, so both sides
    # hash/fuse cleanly. Both hang off the SAME widen exchange, so the
    # runtime reuses one physical scan (AQE ReusedExchange — the r16
    # cascade rule), and the 1-row sides recombine by cross join.
    mm_aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    nd_aggs = []
    for c in _PROFILE_COLS:
        mn, mx = min_max(c)
        mm_aggs += [
            F.count(c).cast("bigint").alias(f"__nn_{c}"),
            mn.alias(f"__mn_{c}"),
            mx.alias(f"__mx_{c}"),
        ]
        nd_aggs.append(F.count_distinct(c).cast("bigint").alias(f"__nd_{c}"))
    one = li.agg(*mm_aggs).crossJoin(li.agg(*nd_aggs))
    rows = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col("n_rows").alias("n_rows"),
                        (F.col("n_rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__mn_{c}").alias("min_value"),
                        F.col(f"__mx_{c}").alias("max_value"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("r")
    )
    return rows.select(
        "r.column_name", "r.n_rows", "r.n_nulls", "r.n_distinct",
        "r.min_value", "r.max_value",
    ).orderBy("column_name")
