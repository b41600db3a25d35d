"""Third analytics batch: sliding windows, vector centroids, corpus
token top-k, CUBE grouping, exact event dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.functions.hashes import hash64_sql
from dolphinbeat_spark.operators.dedup import exact_dedup
from dolphinbeat_spark.plans.registry import register


@register(
    "win_sliding_10m_5m",
    oracle="""
WITH g AS (
  SELECT event_type, epoch_us(ts) // 1000000 AS s FROM events
), w AS (
  SELECT event_type, CAST(to_timestamp(CAST(start AS BIGINT)) AS TIMESTAMP) AS window_start
  FROM g, unnest([s - (s % 300), s - (s % 300) - 300]) AS t(start)
)
SELECT window_start, event_type, COUNT(*) AS n_events
FROM w
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
    tags=("window", "events", "sliding"),
)
def win_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (10 min window, 5 min slide): every
    event lands in exactly two windows. F.window's expand is the same
    two-bucket union the oracle spells out."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
        .orderBy("window_start", "event_type")
    )


@register(
    "sim_label_centroids",
    oracle="""
SELECT label, CAST(i AS INTEGER) AS dim,
       ROUND(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 6) AS centroid,
       COUNT(*) AS n_vectors
FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
GROUP BY label, dim
ORDER BY label, dim
""",
    tags=("similarity", "vector", "aggregate"),
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, element-wise: posexplode dims → double sums
    rounded to 6 places (absorbs summation-order noise portably; Spark
    and DuckDB disagree on float→decimal cast rounding, so decimal
    accumulation is NOT portable). The explode form shuffles
    (label, dim) partials — linear in |vectors|·dim, map-side combined;
    no array shuffling."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    return (
        ex.groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            F.round(F.sum(F.col("val").cast("double")) / F.count(F.lit(1)), 6).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "dim")
    )


@register(
    "text_token_topk",
    oracle=r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents
)
SELECT token, COUNT(*) AS n
FROM toks
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
""",
    tags=("text", "topn"),
)
def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequencies, top 20 (explode → count → top-k;
    the partial-agg + TakeOrdered plan keeps it O(k) memory)."""
    from dolphinbeat_spark.operators.text import tokens

    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@register(
    "agg_cube_sales",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
    tags=("relational", "aggregate", "cube"),
)
def agg_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,4)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "events_dedup_exact",
    oracle="""
SELECT concat(CAST(user_id AS VARCHAR), '|', event_type, '|',
              CAST(CAST(date_trunc('minute', ts) AS TIMESTAMP) AS VARCHAR)) AS dup_key,
       COUNT(*) AS n_dups, MIN(event_id) AS keep_id
FROM events
GROUP BY dup_key
HAVING COUNT(*) > 1
ORDER BY dup_key
""",
    tags=("dedup", "exact", "events"),
)
def events_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a composite key with a deterministic keeper —
    the scalable alternative to dropDuplicates (whose survivor is
    partition-order-dependent)."""
    e = load(spark, sf_dir, "events")
    key = F.concat_ws(
        "|",
        F.col("user_id").cast("string"),
        "event_type",
        F.date_trunc("minute", "ts").cast("string"),
    )
    return (
        exact_dedup(e, "event_id", key)
        .filter(F.col("n_dups") > 1)
        .select("dup_key", "n_dups", F.col("keep_id").alias("keep_id"))
        .orderBy("dup_key")
    )


@register(
    "win_range_frame_30d",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))) OVER (
           PARTITION BY o_custkey
           ORDER BY epoch_us(o_orderdate) // 1000000
           RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
       ), 2) AS DOUBLE) AS spend_30d
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
    tags=("window", "range-frame"),
)
def win_range_frame_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, vs the ROWS frames elsewhere):
    per-customer trailing-30-day spend. The frame is keyed on epoch
    seconds because Spark's rangeBetween needs a numeric ordering key;
    all orders at the SAME timestamp fall in one frame peer-group —
    the semantic difference from ROWS that this spec pins down."""
    o = load(spark, sf_dir, "orders")
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-2592000, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum(F.col("o_totalprice").cast("decimal(14,4)")).over(w), 2)
            .cast("double")
            .alias("spend_30d"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "range_join_banded_global",
    oracle="""
SELECT CAST(date_trunc('day', c.ts) AS TIMESTAMP) AS click_day,
       COUNT(*) AS n_pairs
FROM events c JOIN events x
  ON x.ts > c.ts AND x.ts <= c.ts + INTERVAL 5 MINUTE
WHERE c.event_type = 'click' AND x.event_type = 'error'
GROUP BY click_day
ORDER BY click_day
""",
    tags=("join", "range", "banded", "events"),
)
def range_join_banded_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS interval join via time banding (operators/ranges.py):
    errors within 5 min after ANY click, counted per day. The oracle is
    the naive non-equi join; the engine runs the banded equi-join on
    gap-width bins — a hash join instead of a nested loop, which is the
    only feasible shape without an equi key at scale."""
    from dolphinbeat_spark.operators.ranges import banded_interval_join

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("cts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("xts")
    )
    pairs = banded_interval_join(clicks, errors, "cts", "xts", 300)
    return (
        pairs.groupBy(F.date_trunc("day", "cts").alias("click_day"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("click_day")
    )


@register(
    "geo_grid_neighbor_pairs",
    # users get deterministic integer grid coordinates from the portable
    # hash; the oracle is the naive all-pairs neighbor join, the engine
    # runs the 3x3 grid-cell equi-join (the standard spatial-banding
    # trick: |dx|<=8 with cell size 8 implies same-or-adjacent cell, so
    # a hash join over exploded neighbor-cell keys replaces the O(n²)
    # distance join). All integers: bit-exact cross-engine.
    oracle=f"""
WITH u AS (
  SELECT DISTINCT user_id FROM events
), pts AS (
  SELECT user_id,
         {hash64_sql("concat('gx-', CAST(user_id AS VARCHAR))")} % 1000 AS x,
         {hash64_sql("concat('gy-', CAST(user_id AS VARCHAR))")} % 1000 AS y
  FROM u
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS BIGINT)
         AS sum_dist2
FROM pts a JOIN pts b
  ON b.user_id > a.user_id
 AND abs(a.x - b.x) <= 8 AND abs(a.y - b.y) <= 8
""",
    tags=("join", "spatial", "banded"),
)
def geo_grid_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial neighbor pairs via grid-cell banding: points within
    L∞ ≤ 8 on a synthetic integer grid, found by exploding each point
    into its 3×3 neighbor-cell keys and equi-joining on the cell —
    never the all-pairs distance join the oracle runs. Cell size =
    radius guarantees candidates are in the same or an adjacent cell;
    the exact distance filter runs on the banded candidates only. The
    same plan shape serves geohash radius joins at any scale."""
    from dolphinbeat_spark.functions.hashes import hash64

    e = load(spark, sf_dir, "events")
    u = e.select("user_id").distinct()
    x = hash64(F.concat(F.lit("gx-"), F.col("user_id").cast("string"))) % 1000
    y = hash64(F.concat(F.lit("gy-"), F.col("user_id").cast("string"))) % 1000
    pts = u.select(
        "user_id", x.alias("x"), y.alias("y"),
        F.floor(x / 8).alias("cx"), F.floor(y / 8).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = (
        pts.withColumn("o", F.explode(offsets))
        .select(
            F.col("user_id").alias("uid_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("o.dx")).alias("kx"),
            (F.col("cy") + F.col("o.dy")).alias("ky"),
        )
    )
    b = pts.select(
        F.col("user_id").alias("uid_b"), F.col("x").alias("xb"), F.col("y").alias("yb"),
        F.col("cx").alias("kx"), F.col("cy").alias("ky"),
    )
    pairs = a.join(b, ["kx", "ky"]).filter(
        (F.col("uid_b") > F.col("uid_a"))
        & (F.abs(F.col("xa") - F.col("xb")) <= 8)
        & (F.abs(F.col("ya") - F.col("yb")) <= 8)
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(d2).cast("bigint").alias("sum_dist2"),
    )


@register(
    "session_window_native",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
  FROM flagged
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, sess
ORDER BY user_id, session_start
""",
    tags=("window", "session", "events"),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (30-min gap) proven equivalent to
    the gaps-and-islands SQL formulation: window.start = first event,
    window.end = last event + gap. The native operator is the one the
    streaming pipeline uses with a watermark; this spec pins its batch
    semantics to the classic decomposition."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "win_share_of_total",
    oracle="""
WITH nat AS (
  SELECT s.s_nationkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))) AS rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey
)
SELECT s_nationkey,
       CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
       ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS share
FROM nat
ORDER BY s_nationkey
""",
    tags=("window", "unpartitioned", "ratio"),
)
def win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total via an UNPARTITIONED window (SUM() OVER ()) — the
    single-partition hazard is harmless here because the window input
    is the already-aggregated per-nation rollup (25 rows), not the fact
    table: aggregate first, window over the small result. The exact
    decimal total is cast to double identically on both engines."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    nat = (
        li.join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
                li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,4)")
                * (1 - F.col("l_discount").cast("decimal(12,4)"))
            ).alias("rev")
        )
    )
    w = Window.partitionBy()
    return nat.select(
        "s_nationkey",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w).cast("double"), 6
        ).alias("share"),
    ).orderBy("s_nationkey")


@register(
    "win_lag_lead_offsets",
    oracle="""
SELECT user_id, event_id, ts,
       lag(event_id, 2) OVER w AS lag2,
       lead(event_id, 3) OVER w AS lead3,
       COALESCE(lag(event_id, 2) OVER w, -1) AS lag2_defaulted,
       CAST(epoch_us(ts) - epoch_us(COALESCE(lag(ts, 1) OVER w, ts)) AS BIGINT) AS us_since_prev
FROM events
WHERE user_id % 25 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
""",
    tags=("window", "lag-lead"),
)
def win_lag_lead_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with multi-row offsets and defaults, plus the
    inter-event gap (microseconds since previous event) — the feature
    extraction every sequence model's preprocessing needs."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.coalesce(F.lag("ts", 1).over(w), F.col("ts"))
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_id", 2).over(w).alias("lag2"),
        F.lead("event_id", 3).over(w).alias("lead3"),
        F.lag("event_id", 2, -1).over(w).alias("lag2_defaulted"),
        (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(prev_ts.cast("timestamp")))
        .cast("bigint")
        .alias("us_since_prev"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "funnel_signup_to_purchase",
    oracle="""
WITH stage_ts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(count_if(t_signup IS NOT NULL) AS BIGINT) AS reached_signup,
       CAST(count_if(t_signup IS NOT NULL AND t_view > t_signup) AS BIGINT) AS reached_view,
       CAST(count_if(t_signup IS NOT NULL AND t_view > t_signup AND t_click > t_view) AS BIGINT) AS reached_click,
       CAST(count_if(t_signup IS NOT NULL AND t_view > t_signup AND t_click > t_view
                AND t_purchase > t_click) AS BIGINT) AS reached_purchase
FROM stage_ts
""",
    tags=("events", "funnel", "behavioral"),
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → view → click → purchase):
    one conditional-MIN pass collapses each user to stage timestamps,
    then stage predicates count strictly-ordered progressions — the
    single-scan funnel formulation (the self-join-per-stage version is
    |stages| scans and dies at scale)."""
    e = load(spark, sf_dir, "events")
    stage = e.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in ("signup", "view", "click", "purchase")
        ]
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & (F.col("t_click") > F.col("t_view"))
    s4 = s3 & (F.col("t_purchase") > F.col("t_click"))
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count_if(s1).alias("reached_signup"),
        F.count_if(s2).alias("reached_view"),
        F.count_if(s3).alias("reached_click"),
        F.count_if(s4).alias("reached_purchase"),
    )


@register(
    "cohort_weekly_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS active_day
  FROM events
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.active_day) // 7 AS BIGINT) AS week_n,
       COUNT(DISTINCT a.user_id) AS active_users
FROM activity a JOIN first_seen f USING (user_id)
WHERE f.cohort_day <= TIMESTAMP '2024-01-08'
GROUP BY f.cohort_day, week_n
ORDER BY f.cohort_day, week_n
""",
    tags=("events", "cohort", "retention", "behavioral"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen day,
    activity counted per week-offset. Both inputs partial-aggregate
    (MIN per user; DISTINCT user-day) before the join — the matrix
    shuffles |users| + |user-days|, never raw events."""
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    ).filter(F.col("cohort_day") <= F.lit("2024-01-08").cast("timestamp"))
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("active_day")
    ).distinct()
    week_n = (
        F.datediff(
            F.col("active_day").cast("date"), F.col("cohort_day").cast("date")
        )
        / 7
    )
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_day", F.floor(week_n).cast("bigint").alias("week_n")
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "week_n")
    )


@register(
    "events_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type, next_type, COUNT(*) AS n_transitions
FROM seq
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY event_type, next_type
""",
    tags=("events", "sequence", "markov"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts (the Markov prior of user
    behavior): lead() pairs each event with its successor per user —
    one shuffle on user_id, counts on the tiny |types|² domain."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("event_type", "next_type")
    )


@register(
    "funnel_conversion_within_24h",
    # integer microsecond arithmetic + exact int/int rate division:
    # bit-identical cross-engine (sessionize's epoch_us convention)
    oracle="""
WITH su AS (
  SELECT user_id, MIN(ts) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), fp AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN su ON su.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > su.t_signup
  GROUP BY e.user_id
), per_user AS (
  SELECT su.user_id, CAST(su.t_signup AS DATE) AS cohort_day,
         CASE WHEN fp.t_purchase IS NOT NULL
                   AND epoch_us(fp.t_purchase) - epoch_us(su.t_signup) <= 86400000000
              THEN 1 ELSE 0 END AS converted
  FROM su LEFT JOIN fp ON fp.user_id = su.user_id
)
SELECT cohort_day,
       CAST(COUNT(*) AS BIGINT) AS n_signups,
       CAST(SUM(converted) AS BIGINT) AS n_converted_24h,
       CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conv_rate
FROM per_user GROUP BY cohort_day ORDER BY cohort_day
""",
    tags=("events", "funnel", "behavioral", "windowed"),
)
def funnel_conversion_within_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-budgeted conversion by cohort: of each day's first-time
    signups, how many purchased within 24 HOURS of signing up — the
    windowed funnel product analytics actually reports (the global
    funnel ignores elapsed time). Two aggregations and one equi-join
    on user_id: signup times reduce first, purchases after signup
    reduce against them, cohorts aggregate the per-user flags —
    nothing ever windows the raw event stream."""
    e = load(spark, sf_dir, "events")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    us = F.unix_micros(F.col("t_purchase").cast("timestamp")) - F.unix_micros(
        F.col("t_signup").cast("timestamp")
    )
    per_user = su.join(fp, "user_id", "left").select(
        F.col("t_signup").cast("date").alias("cohort_day"),
        F.when(F.col("t_purchase").isNotNull() & (us <= 86_400_000_000), 1)
        .otherwise(0)
        .alias("converted"),
    )
    return (
        per_user.groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_signups"),
            F.sum("converted").cast("bigint").alias("n_converted_24h"),
            (F.sum("converted").cast("double") / F.count(F.lit(1))).alias("conv_rate"),
        )
        .orderBy("cohort_day")
    )
