"""Semantic-edge specs: three-valued-logic null handling and physical
join-strategy control. Small result sets; the value is pinning down
semantics that silently diverge between engines (NULL propagation,
null-safe equality) and proving the engine can force each physical
join strategy without changing results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.plans.registry import register


@register(
    "scalar_null_semantics",
    oracle="""
SELECT l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULLIF(l_linestatus, 'O')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
       CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') = NULLIF(l_linestatus, 'O')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_eq,
       COUNT(NULLIF(l_returnflag, 'N')) AS n_nonnull_flag,
       CAST(SUM(CASE WHEN COALESCE(NULLIF(l_returnflag, 'N'), '?') = '?'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_coalesced
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


@register(
    "scalar_string_functions2",
    oracle="""
SELECT p_partkey,
       split_part(p_type, ' ', 1) AS type_head,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       rpad(p_brand, 12, '.') AS brand_padded,
       translate(p_name, 'aeiou', 'AEIOU') AS name_shout,
       reverse(p_brand) AS brand_rev,
       repeat('-', p_size % 5) AS dashes,
       strpos(p_name, 'e') AS first_e,
       ascii(substr(p_name, 1, 1)) AS first_cp,
       left(p_name, 4) AS name_left4,
       right(p_name, 3) AS name_right3
FROM part
WHERE p_partkey % 7 = 0
ORDER BY p_partkey
""",
    tags=("relational", "scalar", "string"),
)
def scalar_string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function library, second batch: split_part, padding,
    translate, reverse, repeat, 1-based substring search (instr ≡
    strpos), codepoints, left/right slices."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_shout"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("dashes"),
        F.instr("p_name", "e").cast("bigint").alias("first_e"),
        F.ascii(F.substring("p_name", 1, 1)).cast("int").alias("first_cp"),
        F.left("p_name", F.lit(4)).alias("name_left4"),
        F.right("p_name", F.lit(3)).alias("name_right3"),
    ).orderBy("p_partkey")


@register(
    "datetime_functions2",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3_months,
       CAST(EXTRACT(week FROM o_orderdate) AS INTEGER) AS iso_week,
       CAST(EXTRACT(isodow FROM o_orderdate) AS INTEGER) AS iso_dow,
       CAST(EXTRACT(doy FROM o_orderdate) AS INTEGER) AS day_of_year
FROM orders
WHERE o_orderkey % 13 = 0
ORDER BY o_orderkey
""",
    tags=("relational", "scalar", "datetime"),
)
def datetime_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime library, second batch. Cross-engine footguns pinned:
    Spark dayofweek is 1=Sunday while ISO dow is 1=Monday (weekday()+1
    gives ISO); week-of-year is ISO in both; add_months vs +INTERVAL
    MONTH end-of-month clamping agrees."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("order_quarter"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3_months"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_dow"),
        F.dayofyear("o_orderdate").alias("day_of_year"),
    ).orderBy("o_orderkey")


@register(
    "lateral_explode_outer",
    oracle="""
WITH arr AS (
  SELECT l_orderkey,
         list_sort(list_filter(list(CAST(l_quantity AS BIGINT)), q -> q > 45)) AS heavy
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, u.q AS heavy_qty
FROM arr, unnest(CASE WHEN len(heavy) = 0 THEN [CAST(NULL AS BIGINT)] ELSE heavy END) AS u(q)
WHERE l_orderkey % 50 = 0
ORDER BY l_orderkey, heavy_qty
""",
    tags=("relational", "lateral", "explode-outer"),
)
def lateral_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics pinned: orders whose heavy-quantity
    array is EMPTY survive with a NULL row (plain explode silently
    drops them — the row-loss bug this spec guards). The oracle
    emulates outer-unnest with a [NULL] substitution."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    arr = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.filter(
                F.collect_list(F.col("l_quantity").cast("bigint")), lambda q: q > 45
            )
        ).alias("heavy")
    )
    return (
        arr.select("l_orderkey", F.explode_outer("heavy").alias("heavy_qty"))
        .orderBy("l_orderkey", "heavy_qty")
    )


@register(
    "map_functions_showcase",
    oracle="""
WITH per_line AS (
  SELECT l_orderkey, l_linenumber, MAX(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem GROUP BY l_orderkey, l_linenumber
), g AS (
  SELECT l_orderkey,
         COUNT(*) AS n_entries,
         MAX(CASE WHEN l_linenumber = 1 THEN qty END) AS qty_line1,
         list_sort(list(struct_pack(k := l_linenumber, v := qty))) AS entries
  FROM per_line GROUP BY l_orderkey
)
SELECT l_orderkey, n_entries, qty_line1,
       to_json(list_transform(entries, e -> e.k)) AS keys_sorted,
       to_json(list_transform(entries, e -> e.v)) AS vals_by_key
FROM g
WHERE l_orderkey % 100 = 0
ORDER BY l_orderkey
""",
    tags=("relational", "map"),
)
def map_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: construction from key/value arrays,
    cardinality, key lookup, sorted key listing, and value projection
    through transform. Outputs are scalars/arrays (raw map columns
    don't hash portably — entry order is engine-private)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    # l_linenumber is NOT unique per order in the synthetic data — maps
    # reject duplicate keys, so reduce to one entry per (order, line)
    per_line = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.max(F.col("l_quantity").cast("bigint")).alias("qty")
    )
    arr = per_line.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("k"), F.col("qty").alias("v")
                    )
                )
            )
        ).alias("qty_by_line")
    )
    keys_sorted = F.array_sort(F.map_keys("qty_by_line"))
    return arr.select(
        "l_orderkey",
        F.size("qty_by_line").cast("bigint").alias("n_entries"),
        F.element_at("qty_by_line", F.lit(1)).alias("qty_line1"),
        # JSON strings, not raw arrays: driver canonicalizer can't hash lists
        F.to_json(keys_sorted).alias("keys_sorted"),
        F.to_json(
            F.transform(keys_sorted, lambda k: F.element_at("qty_by_line", k))
        ).alias("vals_by_key"),
    ).orderBy("l_orderkey")


@register(
    "scalar_try_cast",
    oracle="""
SELECT p_partkey,
       TRY_CAST(split_part(p_name, ' ', 1) AS INTEGER) AS word_as_int,
       TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS size_roundtrip,
       TRY_CAST(p_brand AS DOUBLE) AS brand_as_double,
       CAST(p_size AS DOUBLE) / NULLIF(p_size - p_size, 0) IS NULL AS div_zero_nulled
FROM part
WHERE p_partkey % 11 = 0
ORDER BY p_partkey
""",
    tags=("relational", "scalar", "ansi"),
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safety valves: TRY_CAST returns NULL where a plain
    CAST would raise (Spark 4 runs ANSI — unparseable strings are
    runtime errors, the #1 migration trap), and NULLIF-guarded
    division instead of div-by-zero errors."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 11 == 0)
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
        .try_cast("int")
        .alias("word_as_int"),
        F.col("p_size").cast("string").try_cast("int").alias("size_roundtrip"),
        F.col("p_brand").try_cast("double").alias("brand_as_double"),
        (
            F.col("p_size").cast("double")
            / F.nullif(F.col("p_size") - F.col("p_size"), F.lit(0))
        ).isNull().alias("div_zero_nulled"),
    ).orderBy("p_partkey")


@register(
    "scalar_regex_functions",
    oracle=r"""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
       regexp_matches(p_name, '^(red|blue)') AS is_colored,
       len(regexp_split_to_array(p_type, '[ ]')) AS type_words
FROM part
WHERE p_partkey % 17 = 0
ORDER BY p_partkey
""",
    tags=("relational", "scalar", "regex"),
)
def scalar_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex library parity. Cross-engine trap pinned: Spark's
    regexp_replace replaces ALL matches while DuckDB's default is
    FIRST-only — the oracle must pass the 'g' flag to agree."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 17 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", r"[aeiou]", "*").alias("devoweled"),
        F.col("p_name").rlike(r"^(red|blue)").alias("is_colored"),
        F.size(F.split(F.col("p_type"), r"[ ]")).cast("bigint").alias("type_words"),
    ).orderBy("p_partkey")


@register(
    "unpivot_order_metrics",
    oracle="""
WITH m AS (
  SELECT l_orderkey,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_qty,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_price,
         CAST(COUNT(*) AS DOUBLE) AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, metric, value
FROM m UNPIVOT (value FOR metric IN (total_qty, total_price, n_lines))
WHERE l_orderkey % 200 = 0
ORDER BY l_orderkey, metric
""",
    tags=("relational", "unpivot"),
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (inverse of the pivot spec): wide per-order metric
    columns → long (metric, value) rows. Spark plans an Expand —
    map-only, rows × metrics, no shuffle beyond the source agg."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    m = li.groupBy("l_orderkey").agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(12,4)")), 2)
        .cast("double")
        .alias("total_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,4)")), 2)
        .cast("double")
        .alias("total_price"),
        F.count(F.lit(1)).cast("double").alias("n_lines"),
    )
    return (
        m.unpivot(
            "l_orderkey",
            ["total_qty", "total_price", "n_lines"],
            "metric",
            "value",
        )
        .orderBy("l_orderkey", "metric")
    )


@register(
    "win_nth_last_value",
    oracle="""
SELECT o_custkey, o_orderkey,
       nth_value(o_orderkey, 2) OVER w AS second_order,
       last_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_order,
       first_value(o_totalprice) OVER w AS first_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
    tags=("window", "nth-value"),
)
def win_nth_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / last_value frames: last_value needs the explicit
    unbounded-following frame (the default frame ends at CURRENT ROW,
    making last_value ≡ current row — the classic silent-wrong-answer);
    nth_value(_, 2) is NULL until two rows have arrived."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.last("o_orderkey").over(wfull).alias("final_order"),
        F.first("o_totalprice").over(w).alias("first_price"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "agg_bitwise",
    oracle="""
SELECT l_returnflag,
       bit_and(CAST(l_quantity AS BIGINT)) AS qty_and,
       bit_or(CAST(l_quantity AS BIGINT)) AS qty_or,
       bit_xor(CAST(l_quantity AS BIGINT)) AS qty_xor
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("relational", "aggregate", "bitwise"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR fold) — order-free integer
    reductions, map-side combinable like any semigroup."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and(q).alias("qty_and"),
            F.bit_or(q).alias("qty_or"),
            F.bit_xor(q).alias("qty_xor"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_mode_exact",
    oracle="""
WITH counts AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag, qty
), ranked AS (
  SELECT l_returnflag, qty, n,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY n DESC, qty) AS rn
  FROM counts
)
SELECT l_returnflag, qty AS mode_qty, n AS mode_count
FROM ranked WHERE rn = 1
ORDER BY l_returnflag
""",
    tags=("relational", "aggregate", "mode"),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode with a DETERMINISTIC tie-break (most-frequent value,
    smallest value wins ties) — built-in mode() functions leave ties
    engine-defined, which is exactly what an oracle-checked engine
    cannot accept. Two-phase: count per (group, value) — map-side
    combined — then argmax via max_by on the unique (n, -qty) struct."""
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", F.col("l_quantity").cast("bigint").alias("qty")).agg(
        F.count(F.lit(1)).alias("n")
    )
    best = counts.groupBy("l_returnflag").agg(
        F.max_by(
            F.struct(F.col("qty"), F.col("n")),
            F.struct(F.col("n"), (-F.col("qty")).alias("__negq")),
        ).alias("__best")
    )
    return best.select(
        "l_returnflag",
        F.col("__best.qty").alias("mode_qty"),
        F.col("__best.n").alias("mode_count"),
    ).orderBy("l_returnflag")


@register(
    "agg_regression",
    oracle="""
SELECT l_returnflag,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS base_price,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS fit_r2,
       regr_count(l_extendedprice, l_quantity) AS n_obs
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("relational", "aggregate", "regression"),
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS regression aggregates (slope/intercept/R²) —
    single-pass, map-side-combinable moment accumulation; rounded
    because the engines' moment updates differ in final ulps."""
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 4).alias("price_per_qty"),
            F.round(F.regr_intercept(y, x), 4).alias("base_price"),
            F.round(F.regr_r2(y, x), 6).alias("fit_r2"),
            F.regr_count(y, x).alias("n_obs"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "histogram_order_totals",
    oracle="""
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
), binned AS (
  SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20.0)) AS INTEGER), 19) AS bin,
         lo, hi
  FROM orders, bounds
)
SELECT bin,
       CAST(ROUND(MIN(lo) + bin * ((MIN(hi) - MIN(lo)) / 20.0), 4) AS DOUBLE) AS bin_lo,
       COUNT(*) AS n_orders
FROM binned
GROUP BY bin
ORDER BY bin
""",
    tags=("relational", "aggregate", "histogram"),
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 bins over the observed range): global
    min/max is a 1-row broadcast, binning is pure map arithmetic, the
    count is one groupBy on a 20-value domain — the O(n) profile query
    every column-stats pass needs."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 20.0
    binned = o.join(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast("int"),
            F.lit(19),
        ).alias("bin"),
        "lo",
        "hi",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.round(F.min("lo") + F.col("bin") * ((F.min("hi") - F.min("lo")) / 20.0), 4)
            .cast("double")
            .alias("bin_lo"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("bin")
    )


@register(
    "agg_distinct_variants",
    oracle="""
SELECT l_linestatus,
       CAST(ROUND(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_distinct_qty,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part_pairs,
       CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    tags=("relational", "aggregate", "distinct"),
)
def agg_distinct_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT-aggregate variants in one pass: SUM(DISTINCT), single-
    and multi-column COUNT(DISTINCT) (the pair form dedups the tuple),
    and count_if. Multiple distinct aggregates expand to the
    two-phase Expand plan — each distinct set dedups map-side."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.sum_distinct(F.col("l_quantity").cast("decimal(12,4)")), 2)
            .cast("double")
            .alias("sum_distinct_qty"),
            F.count_distinct("l_suppkey").alias("n_suppliers"),
            F.count_distinct("l_suppkey", "l_partkey").alias("n_supp_part_pairs"),
            F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "concentration_customer_deciles",
    oracle="""
WITH cust_rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS rev
  FROM orders GROUP BY o_custkey
), tiled AS (
  SELECT o_custkey, rev,
         NTILE(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
  FROM cust_rev
), total AS (
  SELECT CAST(SUM(rev) AS DOUBLE) AS t FROM cust_rev
)
SELECT decile,
       COUNT(*) AS n_customers,
       CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS decile_revenue,
       ROUND(CAST(SUM(rev) AS DOUBLE) / MIN(t.t), 6) AS revenue_share
FROM tiled, total t
GROUP BY decile
ORDER BY decile
""",
    tags=("window", "ntile", "concentration"),
)
def concentration_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: customers ranked into spend deciles
    (ntile over the aggregated per-customer revenue — the window input
    is |customers|, never |orders|), each decile's share of total.
    The whale-curve / Pareto profile every usage-billing analysis
    starts from."""
    o = load(spark, sf_dir, "orders")
    cust_rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,4)")).alias("rev")
    )
    w = Window.orderBy(F.col("rev").desc(), "o_custkey")
    tiled = cust_rev.withColumn("decile", F.ntile(10).over(w))
    total = cust_rev.agg(F.sum("rev").cast("double").alias("t"))
    return (
        tiled.join(F.broadcast(total))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("rev"), 2).cast("double").alias("decile_revenue"),
            F.round(F.sum("rev").cast("double") / F.min("t"), 6).alias("revenue_share"),
        )
        .orderBy("decile")
    )


@register(
    "anomaly_zscore_events",
    oracle="""
WITH stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS m2
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - s.mu) / sqrt(s.m2 - s.mu * s.mu), 6) AS zscore
FROM events e JOIN stats s USING (event_type)
WHERE abs(e.value - s.mu) / sqrt(s.m2 - s.mu * s.mu) > 3
ORDER BY e.event_id
""",
    tags=("profiling", "anomaly", "events"),
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection with EXACT moments: mean and E[x²]
    from decimal sums (not stddev_pop, whose one-pass update differs
    in final ulps between engines and could flip the |z|>3 boundary) —
    every double here derives from exact decimals, so the flagged set
    is bit-stable. Per-group stats are a broadcast join back onto the
    stream: two passes, both map-side-combinable."""
    e = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    stats = e.groupBy("event_type").agg(
        (F.sum(v).cast("double") / F.count(F.lit(1))).alias("mu"),
        (F.sum(v * v).cast("double") / F.count(F.lit(1))).alias("m2"),
    )
    sd = F.sqrt(F.col("m2") - F.col("mu") * F.col("mu"))
    z = (F.col("value") - F.col("mu")) / sd
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(F.col("value") - F.col("mu")) / sd > 3)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("zscore"))
        .orderBy("event_id")
    )


@register(
    "profile_leading_digits",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS lead_digit
  FROM orders WHERE o_totalprice >= 1
)
SELECT lead_digit, COUNT(*) AS n,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM d), 6) AS share
FROM d GROUP BY lead_digit
ORDER BY lead_digit
""",
    tags=("profiling", "benford"),
)
def profile_leading_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution (the Benford's-law data-quality
    probe): integer string extraction, counts, share of total via a
    1-row broadcast — a column-profiling primitive alongside
    histogram_order_totals."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("lead_digit")
    )
    total = d.agg(F.count(F.lit(1)).alias("t"))
    return (
        d.groupBy("lead_digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(total))
        .select(
            "lead_digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
        )
        .orderBy("lead_digit")
    )


@register(
    "sql_text_interface",
    oracle="""
WITH per_nation AS (
  SELECT s.s_nationkey AS nationkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))) AS rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey
)
SELECT nationkey,
       CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
       CAST(ROUND(100.0 * rev / SUM(rev) OVER (), 4) AS DOUBLE) AS pct_share,
       RANK() OVER (ORDER BY rev DESC, nationkey) AS rev_rank
FROM per_nation
ORDER BY nationkey
""",
    tags=("relational", "sql-interface", "window"),
)
def sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path: the SAME engine surface exercised as a pure
    SQL string over registered views (spark.sql), not the DataFrame
    builder — proving a user of the reference who writes SQL can run it
    verbatim. CTE + join + grouped aggregate + two window functions;
    Catalyst plans both APIs into the identical physical plan, so every
    plan-quality property audited elsewhere holds here too."""
    for t in ("lineitem", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        WITH per_nation AS (
          SELECT s.s_nationkey AS nationkey,
                 SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))) AS rev
          FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY s.s_nationkey
        )
        SELECT nationkey,
               CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
               CAST(ROUND(100.0 * rev / SUM(rev) OVER (), 4) AS DOUBLE) AS pct_share,
               RANK() OVER (ORDER BY rev DESC, nationkey) AS rev_rank
        FROM per_nation
        ORDER BY nationkey
    """)
