"""Semantic-edge specs: three-valued-logic null handling and physical
join-strategy control. Small result sets; the value is pinning down
semantics that silently diverge between engines (NULL propagation,
null-safe equality) and proving the engine can force each physical
join strategy without changing results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.plans.registry import register


@register(
    "scalar_null_semantics",
    oracle="""
SELECT l_linestatus,
       COUNT(*) AS n_rows,
       SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULLIF(l_linestatus, 'O')
                THEN 1 ELSE 0 END) AS n_nullsafe_eq,
       SUM(CASE WHEN NULLIF(l_returnflag, 'N') = NULLIF(l_linestatus, 'O')
                THEN 1 ELSE 0 END) AS n_plain_eq,
       COUNT(NULLIF(l_returnflag, 'N')) AS n_nonnull_flag,
       SUM(CASE WHEN COALESCE(NULLIF(l_returnflag, 'N'), '?') = '?'
                THEN 1 ELSE 0 END) AS n_coalesced
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    tags=("relational", "scalar", "null-semantics"),
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic pinned down: NULLIF-synthesized nulls (the
    test tables carry none) through null-safe equality (<=> / IS NOT
    DISTINCT FROM), plain = (NULL ⇒ no count), COUNT's null skipping,
    and COALESCE defaulting. Both engines must agree on every branch
    or the CASE sums diverge."""
    li = load(spark, sf_dir, "lineitem")
    nf = F.nullif(F.col("l_returnflag"), F.lit("N"))
    ns = F.nullif(F.col("l_linestatus"), F.lit("O"))
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(nf.eqNullSafe(ns), 1).otherwise(0)).alias("n_nullsafe_eq"),
            F.sum(F.when(nf == ns, 1).otherwise(0)).alias("n_plain_eq"),
            F.count(nf).alias("n_nonnull_flag"),
            F.sum(F.when(F.coalesce(nf, F.lit("?")) == "?", 1).otherwise(0)).alias(
                "n_coalesced"
            ),
        )
        .orderBy("l_linestatus")
    )


_HINT_ORACLE = """
SELECT s.s_nationkey,
       COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_qty
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
ORDER BY s.s_nationkey
"""


@register(
    "join_hint_shuffle_hash",
    oracle=_HINT_ORACLE,
    tags=("relational", "join", "hints"),
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE_HASH-hinted join: same answer as the planner's own
    choice (the oracle is the plain join), different physical strategy.
    Forcing hash beats sort-merge when one side is modest but above
    the broadcast threshold — no per-partition sort, build-side hash
    map only; the hint is how the engine pins that at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").hint("shuffle_hash")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,4)")), 2)
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "join_hint_merge",
    oracle=_HINT_ORACLE,
    tags=("relational", "join", "hints"),
)
def join_hint_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (sort-merge) hinted variant of the same join — the
    strategy of choice when BOTH sides are huge (bounded memory,
    spill-friendly, and free if inputs are already bucketed-sorted —
    see tests/test_dataset_layout.py for the zero-exchange case)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").hint("merge")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,4)")), 2)
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "agg_stats_showcase",
    oracle="""
SELECT l_returnflag,
       ROUND(stddev_pop(l_quantity), 4) AS sd_qty,
       ROUND(var_pop(l_quantity), 4) AS var_qty,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(covar_pop(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       bool_and(l_quantity >= 1) AS all_positive,
       bool_or(l_quantity >= 49) AS any_near_max
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("relational", "aggregate", "statistics"),
)
def agg_stats_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate library: population stddev/variance,
    correlation, covariance (rounded — both engines use numerically
    stable one-pass updates whose low bits differ), and boolean
    aggregates."""
    li = load(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_pop(q), 4).alias("sd_qty"),
            F.round(F.var_pop(q), 4).alias("var_qty"),
            F.round(F.corr(q, p), 6).alias("corr_qty_price"),
            F.round(F.covar_pop(q, p), 2).alias("covar_qty_price"),
            F.bool_and(q >= 1).alias("all_positive"),
            F.bool_or(q >= 49).alias("any_near_max"),
        )
        .orderBy("l_returnflag")
    )
