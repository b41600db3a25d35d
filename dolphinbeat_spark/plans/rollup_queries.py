"""Hypertable-rollup and portable-sketch specs (operators/rollups.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.functions.hashes import hash64, hash64_sql
from dolphinbeat_spark.operators.rollups import HLL_ALPHA_64, hll_distinct, rollup_cascade
from dolphinbeat_spark.plans.registry import register


def _grain_sql(grain: str) -> str:
    return f"""
SELECT '{grain}' AS grain,
       CAST(date_trunc('{grain}', ts) AS TIMESTAMP) AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY bucket_start, event_type
"""


@register(
    "events_rollup_cascade",
    oracle=(
        _grain_sql("minute")
        + " UNION ALL "
        + _grain_sql("hour")
        + " UNION ALL "
        + _grain_sql("day")
        + " ORDER BY grain, bucket_start, event_type"
    ),
    tags=("rollup", "hypertable", "events"),
    bench=True,
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable continuous-aggregate cascade: minute buckets from raw
    events, hour buckets FROM the minute aggregates, day buckets FROM
    hour — one raw scan for all three grains. The oracle computes every
    grain directly from raw events, so a PASS proves the cascade
    re-aggregates losslessly (decimal sums + counts compose)."""
    e = load(spark, sf_dir, "events")
    return rollup_cascade(e, "ts", ["event_type"], "value").orderBy(
        "grain", "bucket_start", "event_type"
    )


_HLL_M = 64
_HLL_MAXR = 43  # 48-bit hash - 6 bucket bits + 1


@register(
    "sketch_hll_users",
    oracle=f"""
WITH hashed AS (
  SELECT event_type, user_id,
         {hash64_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events
), ranked AS (
  SELECT event_type,
         CAST(h % {_HLL_M} AS INTEGER) AS b,
         CAST(42 - (CASE WHEN h // {_HLL_M} > 0
                         THEN length(bin(h // {_HLL_M})) ELSE 0 END) + 1 AS INTEGER) AS r
  FROM hashed
), regs AS (
  SELECT event_type, b, MAX(r) AS reg FROM ranked GROUP BY event_type, b
), folded AS (
  SELECT event_type,
         SUM(CAST(1 AS BIGINT) << ({_HLL_MAXR} - reg)) AS present_scaled,
         COUNT(*) AS n_present
  FROM regs GROUP BY event_type
), est AS (
  SELECT event_type,
         ({_HLL_M} - n_present) AS zeros,
         CAST(present_scaled + ({_HLL_M} - n_present) * (CAST(1 AS BIGINT) << {_HLL_MAXR}) AS DOUBLE)
           / {float(1 << _HLL_MAXR)} AS z
  FROM folded
), exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct FROM events GROUP BY event_type
)
SELECT e.event_type,
       ROUND(CASE WHEN ({HLL_ALPHA_64} * {_HLL_M} * {_HLL_M} / z) < {2.5 * _HLL_M} AND zeros > 0
                  THEN {float(_HLL_M)} * LN({float(_HLL_M)} / zeros)
                  ELSE {HLL_ALPHA_64} * {_HLL_M} * {_HLL_M} / z END, 4) AS hll_estimate,
       x.exact_distinct
FROM est e JOIN exact x USING (event_type)
ORDER BY e.event_type
""",
    tags=("sketch", "hll", "approx-distinct"),
    bench=True,
)
def sketch_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch portable HyperLogLog (m=64) per event_type, joined
    with the exact distinct count so accuracy is visible in the result.
    Unlike approx_count_distinct (engine-private HLL++ bytes, rows-only
    checkable), every intermediate here is integer-exact portable
    arithmetic — the estimate itself is oracle-verified bit-for-bit.

    NOTE ln(): both engines compute natural log of identical doubles;
    libm vs JVM can differ in the final ulp, but ROUND(,4) on values
    O(100) gives ~1e10 ulps of slack at the boundary."""
    e = load(spark, sf_dir, "events")
    # r16 examined, left as-is (negative result, OPTIMIZATION_r16.md):
    # rewriting both branches over a shared DISTINCT(event_type,
    # user_id) relation — hoping AQE stage reuse would collapse the two
    # scans to one — is undone by RemoveRedundantAggregates: max() is
    # duplicate-insensitive, so the optimizer strips the distinct from
    # the sketch branch and the final plan is shape-identical to this
    # one (verified: 0 Reused* nodes). Forcing the distinct to
    # materialize (nondeterministic barrier) would replace a cheap
    # 2-column scan with a full-cardinality pair shuffle — worse at
    # scale. This shape is already right: both branches do map-side
    # partial aggregation; the sketch shuffle is O(types x 64 buckets).
    sketch = hll_distinct(e, ["event_type"], F.col("user_id").cast("string"), _HLL_M)
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return sketch.join(exact, "event_type").orderBy("event_type")


_CM_DEPTH, _CM_WIDTH = 4, 64


@register(
    "sketch_countmin_tokens",
    # portable Count-Min: 4 md5-derived hash rows x 64 buckets; the
    # sketch is integer-exact on both engines, and the estimate is the
    # min over rows — always >= the true count (the CM guarantee, also
    # asserted by the oracle's cm_ge_exact flag)
    oracle=f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
), cells AS (
  SELECT r, {hash64_sql("concat('cm', CAST(r AS VARCHAR), '-', token)")} % {_CM_WIDTH} AS b,
         COUNT(*) AS cnt
  FROM tok, unnest(range(0, {_CM_DEPTH})) AS u(r)
  GROUP BY r, b
), exact AS (
  SELECT token, COUNT(*) AS exact_cnt FROM tok GROUP BY token
  ORDER BY exact_cnt DESC, token LIMIT 10
)
SELECT e.token, e.exact_cnt,
       CAST(MIN(c.cnt) AS BIGINT) AS cm_estimate,
       MIN(c.cnt) >= e.exact_cnt AS cm_ge_exact
FROM exact e
JOIN cells c
  ON c.b = {hash64_sql("concat('cm', CAST(c.r AS VARCHAR), '-', e.token)")} % {_CM_WIDTH}
GROUP BY e.token, e.exact_cnt
ORDER BY e.exact_cnt DESC, e.token
""",
    tags=("sketch", "countmin", "frequency"),
)
def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over the corpus token stream
    (portable md5-derived rows, integer-exact cross-engine): the
    fixed-size structure that answers "how often does X appear" at any
    corpus scale — the sketch table is depth×width cells no matter the
    input, built by ONE map-side-combined groupBy over (row, bucket).
    The heavy-hitter estimates are then min-over-rows lookups; the CM
    overcount guarantee (estimate >= exact) is asserted in-row."""
    from dolphinbeat_spark.functions.hashes import hash64
    from dolphinbeat_spark.operators.text import tokens

    d = load(spark, sf_dir, "documents", widen=True)
    tok = d.select(F.explode(tokens("text")).alias("token"))
    rows_arr = F.array(*[F.lit(r) for r in range(_CM_DEPTH)])
    cells = (
        tok.select("token", F.explode(rows_arr).alias("r"))
        .select(
            "r",
            (
                hash64(F.concat(F.lit("cm"), F.col("r").cast("string"), F.lit("-"), F.col("token")))
                % _CM_WIDTH
            ).alias("b"),
        )
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "token")
        .limit(10)
    )
    probe = exact.select(
        "token", "exact_cnt", F.explode(rows_arr).alias("r")
    ).select(
        "token", "exact_cnt", "r",
        (
            hash64(F.concat(F.lit("cm"), F.col("r").cast("string"), F.lit("-"), F.col("token")))
            % _CM_WIDTH
        ).alias("b"),
    )
    return (
        probe.join(cells, ["r", "b"])
        .groupBy("token", "exact_cnt")
        .agg(
            F.min("cnt").cast("bigint").alias("cm_estimate"),
            (F.min("cnt") >= F.col("exact_cnt")).alias("cm_ge_exact"),
        )
        .orderBy(F.col("exact_cnt").desc(), "token")
    )


_KMV_K = 64
_KMV_DOMAIN = 1 << 48  # hash64() is a 48-bit portable hash


@register(
    "sketch_kmv_intersection",
    # pure integer arithmetic until the final divisions; BIGINT→DOUBLE
    # conversion and double division are IEEE-defined, so estimates are
    # bit-identical cross-engine (no ROUND slack needed beyond display)
    oracle=f"""
WITH dist AS (
  SELECT DISTINCT event_type,
         {hash64_sql("concat('kmv-', CAST(user_id AS VARCHAR))")} AS h
  FROM events
), km AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM dist
), arr AS (
  SELECT event_type, list(h ORDER BY h) AS kmv
  FROM km WHERE rn <= {_KMV_K} GROUP BY event_type
), ex AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS exact_inter
  FROM dist a JOIN dist b ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY type_a, type_b
), p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.kmv AS ka, b.kmv AS kb,
         list_sort(list_distinct(list_concat(a.kmv, b.kmv))) AS mg
  FROM arr a JOIN arr b ON a.event_type < b.event_type
), calc AS (
  SELECT type_a, type_b,
         len(mg) AS m_full,
         CASE WHEN len(mg) < {_KMV_K} THEN CAST(len(mg) AS DOUBLE)
              ELSE CAST({(_KMV_K - 1) * _KMV_DOMAIN} AS DOUBLE)
                   / CAST(mg[{_KMV_K}] AS DOUBLE) END AS union_est,
         len(list_filter(mg[1:{_KMV_K}],
             x -> list_contains(ka, x) AND list_contains(kb, x))) AS rho
  FROM p
)
SELECT c.type_a, c.type_b,
       CAST(COALESCE(e.exact_inter, 0) AS BIGINT) AS exact_inter,
       ROUND(CASE WHEN c.m_full < {_KMV_K} THEN CAST(c.rho AS DOUBLE)
                  ELSE CAST(c.rho AS DOUBLE) * c.union_est / {_KMV_K} END, 2)
         AS kmv_inter,
       ROUND(c.union_est, 2) AS kmv_union
FROM calc c LEFT JOIN ex e ON e.type_a = c.type_a AND e.type_b = c.type_b
ORDER BY c.type_a, c.type_b
""",
    tags=("sketch", "kmv", "set-ops"),
)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketches with SET-OPERATION
    estimation — the capability HLL lacks: union AND intersection
    cardinalities from k=64-value summaries. Per event_type the sketch
    keeps the k smallest portable user-hashes; pairs estimate
    |A∪B| = (k-1)·D / θ (θ = the merged sketch's k-th value) and
    |A∩B| = ρ/k · |A∪B| (ρ = merged values present in both sketches),
    with the exact-count degenerate case when the union fits in k.
    Exact intersections ride along so accuracy is visible per pair.

    Scale shape: one distinct (wordcount), per-type k-smallest via a
    windowed top-k (bounded state — never a collect_set of the full
    user set), then all arithmetic on 10 pairs of 64-value arrays. The
    exact-side self-join exists only for the accuracy column."""
    e = load(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    h = hash64(F.concat(F.lit("kmv-"), F.col("user_id").cast("string")))
    dist = e.select("event_type", h.alias("h")).distinct()
    w = W.partitionBy("event_type").orderBy("h")
    arr = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    )
    a = arr.select(F.col("event_type").alias("type_a"), F.col("kmv").alias("ka"))
    b = arr.select(F.col("event_type").alias("type_b"), F.col("kmv").alias("kb"))
    p = a.join(b, F.col("type_a") < F.col("type_b")).withColumn(
        "mg", F.array_sort(F.array_union("ka", "kb"))
    )
    m_full = F.size("mg")
    merged = F.slice("mg", 1, _KMV_K)
    theta = F.element_at("mg", _KMV_K)
    union_est = F.when(m_full < _KMV_K, m_full.cast("double")).otherwise(
        F.lit((_KMV_K - 1) * _KMV_DOMAIN).cast("double") / theta.cast("double")
    )
    rho = F.size(
        F.filter(
            merged,
            lambda x: F.array_contains("ka", x) & F.array_contains("kb", x),
        )
    )
    ex = (
        dist.select(F.col("event_type").alias("type_a"), "h")
        .join(dist.select(F.col("event_type").alias("type_b"), "h"), "h")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    calc = p.select(
        "type_a",
        "type_b",
        m_full.alias("m_full"),
        union_est.alias("union_est"),
        rho.alias("rho"),
    )
    # LEFT join: a disjoint pair has no exact row, but its sketch
    # estimate must still appear (that's exactly where a false-positive
    # kmv_inter needs exact_inter=0 next to it)
    return (
        calc.join(ex, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("exact_inter", F.lit(0)).cast("bigint").alias("exact_inter"),
            F.round(
                F.when(F.col("m_full") < _KMV_K, F.col("rho").cast("double")).otherwise(
                    F.col("rho").cast("double") * F.col("union_est") / _KMV_K
                ),
                2,
            ).alias("kmv_inter"),
            F.round("union_est", 2).alias("kmv_union"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "sketch_quantiles_sampled",
    # rank-based quantiles with EXPLICIT index arithmetic (value at
    # 1-based rank floor(q*(n-1))+1 under (value, id) order) — no
    # interpolation, so both engines agree bit-for-bit; the sample is
    # the deterministic portable-hash 1/16 slice
    oracle=f"""
WITH src AS (
  SELECT l_orderkey * 10 + l_linenumber AS rid, l_extendedprice AS v
  FROM lineitem
), samp AS (
  SELECT rid, v FROM src WHERE ({hash64_sql("CAST(rid AS VARCHAR)")}) % 16 = 0
), ranked_s AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v, rid) AS r,
         COUNT(*) OVER () AS n
  FROM samp
), ranked_f AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v, rid) AS r,
         COUNT(*) OVER () AS n
  FROM src
), q(qq) AS (
  SELECT CAST(x AS DOUBLE) FROM (VALUES (0.5), (0.9), (0.99)) t(x)
)
SELECT qq AS quantile,
       (SELECT CAST(s.v AS DOUBLE) FROM ranked_s s
        WHERE s.r = CAST(floor(qq * (s.n - 1)) AS BIGINT) + 1) AS est,
       (SELECT CAST(f.v AS DOUBLE) FROM ranked_f f
        WHERE f.r = CAST(floor(qq * (f.n - 1)) AS BIGINT) + 1) AS exact,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM samp) AS n_sample
FROM q
ORDER BY quantile
""",
    tags=("sketch", "quantiles", "sampling"),
)
def sketch_quantiles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-based quantile estimation — the sketch-family cell HLL
    / Count-Min / KMV don't cover: p50/p90/p99 of l_extendedprice from
    a deterministic portable-hash 1/16 sample, side by side with the
    exact full-data quantiles so the estimation error is visible in
    the result (measure, don't guess). Rank-by-explicit-index (no
    interpolation) keeps both engines bit-identical.

    Scale shape: the estimate path sorts only the sample (1/16 and
    tunable — the knob that bounds sort memory at 100 TB); the exact
    side exists for the error column and is what you'd DROP at scale,
    leaving a sample-sort whose size you control. A mergeable KLL
    sketch would avoid the sample sort too; the hash-sample form keeps
    the cross-engine oracle exact, which the randomized compactors of
    KLL cannot."""
    li = load(spark, sf_dir, "lineitem")
    src = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        F.col("l_extendedprice").alias("v"),
    )
    samp = src.filter(F.pmod(hash64(F.col("rid").cast("string")), F.lit(16)) == 0)

    def rank_at(df: DataFrame, name: str) -> DataFrame:
        from pyspark.sql import Window

        w = Window.orderBy("v", "rid")
        ranked = df.select(
            "v",
            F.row_number().over(w).alias("r"),
            F.count(F.lit(1)).over(
                Window.partitionBy(F.lit(1)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n"),
        )
        qs = df.sparkSession.createDataFrame(
            [(0.5,), (0.9,), (0.99,)], "quantile double"
        )
        hit = qs.join(
            ranked,
            ranked["r"] == F.floor(qs["quantile"] * (ranked["n"] - 1)) + 1,
        )
        return hit.select("quantile", F.col("v").cast("double").alias(name))

    est = rank_at(samp, "est")
    exact = rank_at(src, "exact")
    n_sample = samp.agg(F.count(F.lit(1)).cast("bigint").alias("n_sample"))
    return (
        est.join(exact, "quantile")
        .join(F.broadcast(n_sample))
        .select("quantile", "est", "exact", "n_sample")
        .orderBy("quantile")
    )
