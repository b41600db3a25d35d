"""Second relational batch: subqueries, pivot, percentiles, salted
skew aggregation, approximate distinct.

The salted-aggregation spec doubles as the skew-handling playbook: its
oracle is the PLAIN group-by (same answer), proving the two-phase
salt/unsalt rewrite is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.functions.money import cents, cents_sum, rescale
from dolphinbeat_spark.plans.registry import register

_DEC = "decimal(12,4)"


def _d(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast(_DEC)


@register(
    "q4_order_priority_exists",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("relational", "subquery", "semi"),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: correlated EXISTS → Catalyst plans a LEFT SEMI join
    (expressed via the SQL API to exercise the subquery rewriter)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM v_orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM v_lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS aq
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_price,
       COUNT(*) AS n_items
FROM lineitem l JOIN avg_qty a ON l.l_partkey = a.l_partkey
WHERE l.l_quantity < 0.5 * a.aq
""",
    tags=("relational", "subquery", "scalar"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 flavor: per-group scalar aggregate joined back to the
    fact table (the decorrelated form — one shuffle on l_partkey reused
    by both sides)."""
    li = load(spark, sf_dir, "lineitem")
    # r16 long-cents (functions/money.py): the per-group quantity sum
    # and the final price sum run on primitive longs; the rescale
    # reproduces round(sum(decimal), 2).cast(double) exactly, so aq
    # and the filter threshold are bit-identical.
    avg_qty = li.groupBy("l_partkey").agg(
        (rescale(F.sum(cents("l_quantity")), 2, "sq")
         / F.count(F.lit(1))).alias("aq")
    )
    return (
        li.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            cents_sum(cents("l_extendedprice"), 2, "total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIV_COLS = {p: "p" + p.split("-")[0] for p in _PRIORITIES}


@register(
    "pivot_orders_priority_by_year",
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       {", ".join(f"COUNT(*) FILTER (o_orderpriority = '{p}') AS {c}" for p, c in _PIV_COLS.items())}
FROM orders
GROUP BY order_year
ORDER BY order_year
""",
    tags=("relational", "pivot"),
)
def pivot_orders_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (explicit value list → no extra distinct-discovery job;
    at scale always pass the values)."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    renamed = piv.select(
        "order_year", *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(c) for p, c in _PIV_COLS.items()]
    )
    return renamed.orderBy("order_year")


@register(
    "percentiles_by_returnflag",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99,
       MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("relational", "aggregate", "percentile"),
)
def percentiles_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (verified bit-identical to
    quantile_cont: both use lo + (hi-lo)*frac on the sorted values)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "skew_salted_agg",
    oracle="""
SELECT l_suppkey,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
""",
    tags=("relational", "aggregate", "skew"),
    bench=True,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: phase 1 groups on (key, salt)
    spreading a hot key over 16 reducers; phase 2 merges partials.
    The oracle is the PLAIN group-by — proving the rewrite preserves
    semantics. This is the manual fallback when AQE's skew handling
    can't apply (e.g. custom partitioners); partial decimal sums and
    counts re-aggregate losslessly."""
    li = load(spark, sf_dir, "lineitem")
    # r16 long-cents (functions/money.py): the salted partials carry
    # one primitive long per (key, salt) instead of a boxed decimal;
    # long partial sums re-merge exactly and the single rescale after
    # the merge reproduces the decimal result bit-for-bit.
    salted = (
        li.withColumn("__salt", (F.crc32(F.col("l_orderkey").cast("string")) % 16).cast("int"))
        .groupBy("l_suppkey", "__salt")
        .agg(
            F.sum(cents("l_quantity")).alias("pq"),
            F.count(F.lit(1)).alias("pn"),
        )
    )
    return (
        salted.groupBy("l_suppkey")
        .agg(
            rescale(F.sum("pq"), 2, "total_qty"),
            F.sum("pn").alias("n_items"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "approx_distinct_parts",
    # Sketch estimates are engine-specific, so the oracle checks the
    # INVARIANT instead: the approx count must land within 5× the
    # requested 1% rsd of the exact count. Both engines emit the same
    # booleans (DuckDB trivially, Spark by actually computing both).
    oracle="""
SELECT l_returnflag,
       TRUE AS parts_within_rsd,
       TRUE AS orders_within_rsd
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("relational", "aggregate", "approx"),
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the at-scale substitute
    for exact COUNT(DISTINCT) — no exact-mode expand, fixed-size
    sketch, mergeable map-side. The estimate itself is engine-specific
    (deterministic per engine, not portable), so the comparable output
    is the banded invariant |approx - exact| / exact <= 5 * rsd; the
    exact twin (un-banded values) is agg_distinct_counts.

    r17 (guide §2.3 "shuffle fewer bytes", REGISTRY_TIMING: 32.2 s →
    ~1 s at sf0.1): mixing approx_count_distinct with countDistinct in
    ONE agg is a buffer-width trap — the distinct rewrite Expands every
    row into per-distinct-column groups and EVERY (flag, partkey/
    orderkey) group's hash-agg buffer then carries the two rsd-0.01
    HLL++ sketches (~2×2.7k longs ≈ 43 KB per group, ~10⁵ groups at
    sf0.1 and unbounded at 100 TB). Splitting the approx pass (3
    groups total, map-side partial, fixed 2-sketch buffer per task)
    from the exact-distinct pass (plain Expand with 16-byte buffers)
    and joining on the 3-row group key computes the identical values
    with sane buffers on both passes."""
    li = load(spark, sf_dir, "lineitem")

    def within(approx_col: str, exact_col: str):
        rel_err = F.abs(F.col(approx_col) - F.col(exact_col)) / F.col(exact_col)
        return rel_err <= F.lit(0.05)

    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("ap"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("ao"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("ep"),
        F.countDistinct("l_orderkey").alias("eo"),
    )
    return (
        approx.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            within("ap", "ep").alias("parts_within_rsd"),
            within("ao", "eo").alias("orders_within_rsd"),
        )
        .orderBy("l_returnflag")
    )
