"""Window-function, sessionization, as-of/range-join and event-time
query plans over the ``events``/``orders`` tables.

The reference has NO window functions, sessionization, or temporal
joins (SURVEY.md §2.8); these are the streaming-analytics surface the
north star requires. Batch forms here (oracle-checkable); streaming
forms live in dolphinbeat_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.functions.money import cents
from dolphinbeat_spark.operators.asof import asof_join, asof_self_join
from dolphinbeat_spark.operators.sessions import sessionize
from dolphinbeat_spark.plans.registry import register

_DEC = "decimal(14,4)"


@register(
    "win_running_revenue",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       ROW_NUMBER() OVER w AS order_seq,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, order_seq
""",
    tags=("window", "events"),
    bench=True,
)
def win_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total: one shuffle on o_custkey,
    per-partition sort — the canonical cumulative window."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # r16 long-cents (functions/money.py): the running-sum window state
    # is a primitive long instead of a per-row boxed decimal; the
    # per-row rescale (exact: scale-2 integer / 100 at 6 fractional
    # digits, then ROUND 2) reproduces the decimal value bit-for-bit.
    # |o_totalprice| < ~6e5 so a customer's running cents stay far
    # inside int64 at any scale (ANSI raises loudly regardless).
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(w).alias("order_seq"),
        F.round(
            F.sum(cents("o_totalprice")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("decimal(38,6)") / 100,
            2,
        )
        .cast("double")
        .alias("running_total"),
    ).orderBy("o_custkey", "order_seq")


@register(
    "win_top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
ORDER BY o_custkey, rnk, o_orderkey
""",
    tags=("window", "topn"),
)
def win_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via rank: Spark pushes a per-partition limit
    (WindowGroupLimit) before the shuffle — no full materialization."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


@register(
    "win_rank_showcase",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile,
       CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
       CAST(CUME_DIST() OVER w AS DOUBLE) AS cdist,
       LAG(c_custkey) OVER w AS prev_cust,
       LEAD(c_custkey) OVER w AS next_cust,
       FIRST_VALUE(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_cust
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, rn
""",
    tags=("window",),
)
def win_rank_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking/analytic function surface in one plan."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cdist"),
        F.lag("c_custkey").over(w).alias("prev_cust"),
        F.lead("c_custkey").over(w).alias("next_cust"),
        F.first("c_custkey").over(wf).alias("first_cust"),
    ).orderBy("c_mktsegment", "rn")


@register(
    "win_moving_sum_daily",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(14,6))) AS day_value
  FROM events GROUP BY event_type, day
)
SELECT event_type, day, n_events,
       CAST(ROUND(SUM(day_value) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS value_7d
FROM daily
ORDER BY event_type, day
""",
    tags=("window", "events"),
    bench=True,
)
def win_moving_sum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level: daily pre-aggregation (map-side combine shrinks the
    stream to |types|x|days| rows), then a 7-row moving frame.

    r17 (guide §2.3): the raw-cardinality daily aggregation runs on
    limbed long micro-units (functions/money.py) — 4 primitive longs in
    the agg buffer instead of a boxed BigDecimal per input row,
    overflow-safe past 1.4e14 rows per (type, day) group, recombined to
    exactly the decimal value sum(cast(value as decimal(14,6))) yields.
    The 7-day moving window then sums |types|x|days| decimal rows,
    unchanged."""
    from dolphinbeat_spark.functions.money import limb_sums, limb_total, micros

    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            *limb_sums(micros("value"), "__v"),
        )
        .select("event_type", "day", "n_events", limb_total("__v").alias("day_value"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, Window.currentRow)
    return (
        daily.select(
            "event_type",
            "day",
            "n_events",
            F.round(F.sum("day_value").over(w), 2).cast("double").alias("value_7d"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "win_tumbling_hourly_events",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(14,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY hour_start, event_type
ORDER BY hour_start, event_type
""",
    tags=("window", "events", "eventtime"),
)
def win_tumbling_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window via F.window (same operator the
    streaming pipeline uses with a watermark)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(14,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
        .orderBy("hour_start", "event_type")
    )


@register(
    "sessionize_users",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    tags=("window", "events", "session"),
    bench=True,
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) via operators/sessions.py."""
    e = load(spark, sf_dir, "events")
    s = sessionize(e, key="user_id", time_col="ts", gap_seconds=1800, tie_break="event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "asof_purchase_last_view",
    oracle="""
WITH views AS (
  SELECT user_id, ts AS vts, MAX(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
), purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), matched AS (
  SELECT p.event_id, v.vts, v.view_event_id,
         ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY v.vts DESC) AS rn
  FROM purchases p JOIN views v ON v.user_id = p.user_id AND v.vts <= p.ts
)
SELECT p.event_id, p.user_id, p.ts,
       m.vts AS last_view_ts, m.view_event_id AS last_view_event_id
FROM purchases p LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m USING (event_id)
ORDER BY p.event_id
""",
    tags=("join", "asof", "events"),
    bench=True,
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase → latest preceding view of
    the same user. Both sides come from the events table, so this uses
    the fused single-scan asof_self_join (one scan, one shuffle; the
    right_order tie-break subsumes the oracle's groupBy-MAX pre-pass —
    no candidate-pair blowup, which is exactly what the oracle's
    row_number formulation would cost at scale)."""
    e = load(spark, sf_dir, "events")
    joined = asof_self_join(
        e.select("event_id", "user_id", "event_type", "ts"),
        on="user_id",
        time_col="ts",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "view",
        right_payload=["ts", "event_id"],
        right_order=["event_id"],
        right_prefix="v_",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("v_ts").alias("last_view_ts"),
        F.col("v_event_id").alias("last_view_event_id"),
    ).orderBy("event_id")


@register(
    "asof_error_last_click",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts AS cts, MAX(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), matched AS (
  SELECT e.event_id, c.cts, c.click_event_id,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY c.cts DESC) AS rn
  FROM errors e JOIN clicks c ON c.user_id = e.user_id AND c.cts <= e.ts
)
SELECT e.event_id, e.user_id, e.ts,
       m.cts AS last_click_ts, m.click_event_id AS last_click_event_id
FROM errors e LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m USING (event_id)
ORDER BY e.event_id
""",
    tags=("join", "asof", "events"),
)
def asof_error_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join via the GENERIC union-scan asof_join
    operator (two inputs, pre-aggregated right side) — the cross-table
    form; asof_purchase_last_view covers the fused same-table form."""
    e = load(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("cts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    joined = asof_join(
        errors, clicks, on="user_id", left_time="ts", right_time="cts", right_prefix=""
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("cts").alias("last_click_ts"),
        F.col("click_event_id").alias("last_click_event_id"),
    ).orderBy("event_id")


@register(
    "range_join_click_error",
    oracle="""
SELECT c.event_id AS click_event_id, x.event_id AS error_event_id, c.user_id
FROM events c JOIN events x
  ON x.user_id = c.user_id
 AND x.ts > c.ts AND x.ts <= c.ts + INTERVAL 5 MINUTE
WHERE c.event_type = 'click' AND x.event_type = 'error'
ORDER BY click_event_id, error_event_id
""",
    tags=("join", "range", "events"),
)
def range_join_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: errors within 5 min after a click, same
    user. Equi key (user_id) carries the shuffle; the range predicate
    is evaluated post-join — bounded blowup since windows are short."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"), "user_id", F.col("ts").alias("cts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("ets"),
    )
    return (
        clicks.join(
            errors,
            (F.col("e_user_id") == F.col("user_id"))
            & (F.col("ets") > F.col("cts"))
            & (F.col("ets") <= F.col("cts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select("click_event_id", "error_event_id", "user_id")
        .orderBy("click_event_id", "error_event_id")
    )


@register(
    "json_props_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("events", "json", "scalar"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column extraction (reference treats JSON
    as opaque strings — SURVEY §1.2 TypeJSON)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
            F.min(k).alias("min_k"),
        )
        .orderBy("event_type")
    )


@register(
    "sessions_peak_concurrency",
    # end-exclusive overlap: at one timestamp the -1 (session end)
    # sorts before the +1 (session start), so back-to-back sessions
    # never count as concurrent; (user_id, session_id) complete the
    # total order for the order-strict check
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
         ts
  FROM flagged
), iv AS (
  SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM sess GROUP BY user_id, session_id
), pts AS (
  SELECT CAST(s_start AS DATE) AS day, s_start AS t, 1 AS delta, user_id, session_id FROM iv
  UNION ALL
  SELECT CAST(s_start AS DATE) AS day, s_end AS t, -1 AS delta, user_id, session_id FROM iv
), run AS (
  SELECT day, SUM(delta) OVER (PARTITION BY day ORDER BY t, delta, user_id, session_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM pts
)
SELECT r.day, i.n_sessions, CAST(MAX(r.conc) AS BIGINT) AS peak_concurrency
FROM run r
JOIN (SELECT CAST(s_start AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM iv GROUP BY day) i USING (day)
GROUP BY r.day, i.n_sessions
ORDER BY r.day
""",
    tags=("window", "events", "session", "sweep-line"),
)
def sessions_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the classic sweep-line
    reduction: each session contributes (+1 at start, -1 at end)
    events, a running sum inside the day partition is the live
    concurrency, and its max is the capacity-planning number. End
    sorts before start at equal timestamps (end-exclusive overlap).
    Sessions are attributed to their START day — the bounded-partition
    form of the sweep (a global sweep would be one unpartitioned
    window; per-day partitions keep state bounded and parallel at any
    scale).

    Shuffles: the sessionize windows per user (bounded), one explode
    to 2 rows per session, one window per day partition."""
    e = load(spark, sf_dir, "events")
    s = sessionize(e, key="user_id", time_col="ts", gap_seconds=1800, tie_break="event_id")
    iv = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    pts = iv.select(
        F.col("s_start").cast("date").alias("day"),
        F.explode(
            F.array(
                F.struct(F.col("s_start").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("s_end").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("pt"),
        "user_id",
        "session_id",
    ).select("day", F.col("pt.t").alias("t"), F.col("pt.delta").alias("delta"),
             "user_id", "session_id")
    w = Window.partitionBy("day").orderBy("t", "delta", "user_id", "session_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = pts.withColumn("conc", F.sum("delta").over(w))
    n_sess = iv.groupBy(F.col("s_start").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    return (
        run.groupBy("day")
        .agg(F.max("conc").cast("bigint").alias("peak_concurrency"))
        .join(n_sess, "day")
        .select("day", "n_sessions", "peak_concurrency")
        .orderBy("day")
    )


@register(
    "ts_ewma_daily_events",
    # alpha = 0.5 deliberately: halving is exact in binary floating
    # point, and both engines fold the SAME prefix left-to-right, so
    # every EWMA value is bit-identical with no rounding slack needed
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY day
), arr AS (
  SELECT list(CAST(n_events AS DOUBLE) ORDER BY day) AS xs,
         list(day ORDER BY day) AS days,
         list(n_events ORDER BY day) AS ns
  FROM daily
)
SELECT u.day, u.n_events,
       CASE WHEN u.i = 1 THEN a.xs[1]
            ELSE list_reduce(a.xs[1:CAST(u.i AS INTEGER)],
                             (acc, x) -> 0.5 * x + 0.5 * acc) END AS ewma
FROM arr a,
     LATERAL (SELECT CAST(i AS BIGINT) AS i, a.days[CAST(i AS INTEGER)] AS day,
                     a.ns[CAST(i AS INTEGER)] AS n_events
              FROM unnest(range(1, len(a.days) + 1)) AS t(i)) u
ORDER BY u.day
""",
    tags=("timeseries", "ewma", "smoothing"),
)
def ts_ewma_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event volume
    (alpha = 0.5) — the recursive smoother windows can't express
    (ewma_t depends on ewma_{t-1}, not on a fixed frame), computed as
    an ordered prefix fold over the BOUNDED daily aggregate. The shape
    that scales: the raw table reduces to one row per day first
    (partial-aggregated shuffle), and the O(days²) fold runs over that
    tiny array — never over events. Per-key variants partition the
    collect by key with the same machinery."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    arr = daily.agg(
        F.array_sort(
            F.collect_list(F.struct("day", F.col("n_events").cast("double").alias("x")))
        ).alias("s")
    )
    # one output row per day: the EWMA at position i is the fold of
    # the first i values (seeded with the first element, like the
    # oracle's list_reduce)
    out = arr.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("s")),
                lambda i: F.struct(
                    F.element_at("s", i)["day"].alias("day"),
                    F.element_at("s", i)["x"].cast("bigint").alias("n_events"),
                    F.aggregate(
                        F.slice(F.transform("s", lambda e_: e_["x"]), 2, (i - 1).cast("int")),
                        F.element_at("s", 1)["x"],
                        lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
                    ).alias("ewma"),
                ),
            )
        ).alias("r")
    )
    return out.select("r.day", "r.n_events", "r.ewma").orderBy("day")


@register(
    "anomaly_cusum_daily",
    # deviations are exact (BIGINT count minus an int/int-exact mean);
    # the clamped fold runs in the same order on both engines; ROUND
    # absorbs nothing because every op is deterministic — kept only
    # for display stability of the half-unit slack constant
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY day
), m AS (
  SELECT CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean FROM daily
), arr AS (
  SELECT list(CAST(n_events AS DOUBLE) ORDER BY day) AS xs,
         list(day ORDER BY day) AS days,
         list(n_events ORDER BY day) AS ns
  FROM daily
)
SELECT u.day, u.n_events,
       list_reduce(
         list_prepend(0.0, list_transform(arr.xs[1:CAST(u.i AS INTEGER)],
                                          x -> x - m.mean - 0.5)),
         (acc, x) -> greatest(0.0, acc + x)) AS cusum_hi,
       list_reduce(
         list_prepend(0.0, list_transform(arr.xs[1:CAST(u.i AS INTEGER)],
                                          x -> m.mean - x - 0.5)),
         (acc, x) -> greatest(0.0, acc + x)) AS cusum_lo
FROM arr, m,
     LATERAL (SELECT CAST(i AS BIGINT) AS i, arr.days[CAST(i AS INTEGER)] AS day,
                     arr.ns[CAST(i AS INTEGER)] AS n_events
              FROM unnest(range(1, len(arr.days) + 1)) AS t(i)) u
ORDER BY u.day
""",
    tags=("timeseries", "anomaly", "cusum", "change-point"),
)
def anomaly_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point statistic over daily event volume:
    S⁺_t = max(0, S⁺_{t-1} + x_t − μ − k) and the mirrored S⁻ (slack
    k = 0.5) — the sequential drift detector; a sustained level shift
    accumulates where a one-day spike resets. Recursive with a clamp,
    so like the EWMA it is a prefix fold over the bounded daily
    aggregate, never a window over the fact table."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    arr = daily.agg(
        F.array_sort(
            F.collect_list(F.struct("day", F.col("n_events").cast("double").alias("x")))
        ).alias("s"),
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias("mean"),
    )

    def cusum(i, sign):
        # sign=+1: x - mean - k; sign=-1: mean - x - k
        return F.aggregate(
            F.slice(F.transform("s", lambda e_: e_["x"]), 1, i.cast("int")),
            F.lit(0.0),
            lambda acc, x: F.greatest(
                F.lit(0.0),
                acc + (sign * (x - F.col("mean")) - F.lit(0.5)),
            ),
        )

    out = arr.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("s")),
                lambda i: F.struct(
                    F.element_at("s", i)["day"].alias("day"),
                    F.element_at("s", i)["x"].cast("bigint").alias("n_events"),
                    cusum(i, F.lit(1.0)).alias("cusum_hi"),
                    cusum(i, F.lit(-1.0)).alias("cusum_lo"),
                ),
            )
        ).alias("r")
    )
    return out.select("r.day", "r.n_events", "r.cusum_hi", "r.cusum_lo").orderBy("day")


_TS_NSEG = 4  # PAA segments for the similarity-search word prefilter


@register(
    "ts_similarity_topk",
    # EVERYTHING integer-exact: daily counts, segment sums, the SAX-ish
    # word bits (segment_sum * NSEG vs series total), and the squared
    # euclidean distance — zero float hazard, no ROUND needed
    oracle=f"""
WITH b AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0,
         datediff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1 AS nd
  FROM events
), daily AS (
  SELECT user_id, datediff('day', b.d0, CAST(ts AS DATE)) AS i,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events, b GROUP BY user_id, i
), vec AS (
  SELECT g.user_id,
         list_transform(range(0, b.nd),
           x -> COALESCE(list_extract(cs, list_position(iis, x)), 0)) AS s
  FROM (SELECT user_id, list(i ORDER BY i) AS iis, list(c ORDER BY i) AS cs
        FROM daily GROUP BY user_id) g, b
), worded AS (
  SELECT user_id, s,
         list_reduce(s, (a, x) -> a + x) AS tot,
         array_to_string(list_transform(range(0, {_TS_NSEG}), j ->
           CASE WHEN list_reduce(
                  list_transform(range(1, len(s) + 1),
                    i -> CASE WHEN ((i - 1) * {_TS_NSEG}) // len(s) = j
                              THEN s[i] ELSE 0 END),
                  (a, x) -> a + x) * {_TS_NSEG}
                > list_reduce(s, (a, x) -> a + x)
           THEN '1' ELSE '0' END), '') AS word
  FROM vec
), scored AS (
  SELECT q.user_id AS query_id, c.user_id AS neighbor_id,
         list_reduce(list_transform(range(1, len(q.s) + 1),
           i -> (q.s[i] - c.s[i]) * (q.s[i] - c.s[i])), (a, x) -> a + x) AS dist2
  FROM worded q JOIN worded c ON q.word = c.word AND q.user_id <> c.user_id
  WHERE q.user_id % 10 = 0
), ranked AS (
  SELECT query_id, neighbor_id, dist2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dist2, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(dist2 AS BIGINT) AS dist2
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
""",
    tags=("timeseries", "similarity", "paa"),
)
def ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed time-series similarity search (the EDBT'19/ICDE'21
    streaming-similarity family, PAPERS.md): each user's daily activity
    profile (zero-filled day grid) is a fixed-length integer series;
    candidates come from a PAA/SAX-style WORD bucket join — one bit per
    segment (above/below the series' mean segment mass), so similar
    shapes collide and the join never goes all-pairs — and candidates
    verify by EXACT integer squared euclidean distance, top-5 per
    query user.

    Scale shape: the series build is one shuffle (user,day) + one per
    user; the word is a map-side fold; the only join is the word-bucket
    equi-join (16 buckets at 4 segments — raise segments/alphabet for
    finer buckets at corpus scale, the standard iSAX refinement); the
    verify is a bounded zip_with fold per candidate pair. All integer
    arithmetic end to end — bit-identical across engines by
    construction."""
    e = load(spark, sf_dir, "events")
    day = F.to_date("ts")
    bounds = e.agg(
        F.min(day).alias("d0"),
        (F.datediff(F.max(day), F.min(day)) + 1).alias("nd"),
    )
    daily = (
        e.join(F.broadcast(bounds))
        .select("user_id", F.datediff(day, F.col("d0")).alias("i"), "nd")
        .groupBy("user_id", "i", "nd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    series = (
        daily.groupBy("user_id", "nd")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("i", "c"))).alias("m")
        )
        .select(
            "user_id",
            F.expr("transform(sequence(0, nd - 1), x -> coalesce(m[x], 0L))").alias("s"),
        )
    )
    worded = series.select(
        "user_id",
        "s",
        F.expr(
            f"""concat_ws('', transform(sequence(0, {_TS_NSEG - 1}), j ->
              CASE WHEN aggregate(
                     zip_with(s, sequence(0, size(s) - 1),
                       (v, i) -> IF((i * {_TS_NSEG}) div size(s) = j, v, 0L)),
                     0L, (a, x) -> a + x) * {_TS_NSEG}
                   > aggregate(s, 0L, (a, x) -> a + x)
              THEN '1' ELSE '0' END))"""
        ).alias("word"),
    )
    q = worded.filter(F.col("user_id") % 10 == 0).select(
        F.col("user_id").alias("query_id"), F.col("s").alias("qs"), "word"
    )
    scored = (
        q.join(worded, "word")
        .filter(F.col("user_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("user_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(qs, s, (a, b) -> (a - b) * (a - b)),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("dist2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "dist2")
        .orderBy("query_id", "rank")
    )


@register(
    "ts_motif_discord",
    # integer-exact end to end (window sums and squared distances over
    # daily counts); ties broken by window index
    oracle="""
WITH b AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0,
         datediff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1 AS nd
  FROM events
), daily AS (
  SELECT user_id, datediff('day', b.d0, CAST(ts AS DATE)) AS i,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events, b GROUP BY user_id, i
), vec AS (
  SELECT g.user_id,
         list_transform(range(0, b.nd),
           x -> COALESCE(list_extract(cs, list_position(iis, x)), 0)) AS s
  FROM (SELECT user_id, list(i ORDER BY i) AS iis, list(c ORDER BY i) AS cs
        FROM daily GROUP BY user_id) g, b
  WHERE user_id % 5 = 0
), win AS (
  SELECT user_id, CAST(w AS BIGINT) AS w,
         list_slice(s, w + 1, w + 7) AS seg
  FROM vec, unnest(range(0, len(s) - 6)) AS t(w)
), pair AS (
  SELECT a.user_id, a.w AS w_a, c.w AS w_b,
         list_reduce(list_transform(range(1, 8),
           i -> (a.seg[i] - c.seg[i]) * (a.seg[i] - c.seg[i])),
           (x, y) -> x + y) AS dist2
  FROM win a JOIN win c
    ON a.user_id = c.user_id AND c.w >= a.w + 7  -- non-overlapping, ordered
), nn AS (
  -- nearest non-overlapping neighbor distance per window (both sides)
  SELECT user_id, w, MIN(dist2) AS nn_dist2 FROM (
    SELECT user_id, w_a AS w, dist2 FROM pair
    UNION ALL
    SELECT user_id, w_b AS w, dist2 FROM pair
  ) GROUP BY user_id, w
), motif AS (
  SELECT user_id, w_a, w_b, dist2,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY dist2, w_a, w_b) AS rn
  FROM pair
), discord AS (
  SELECT user_id, w, nn_dist2,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY nn_dist2 DESC, w) AS rn
  FROM nn
)
SELECT m.user_id,
       m.w_a AS motif_a, m.w_b AS motif_b, m.dist2 AS motif_dist2,
       d.w AS discord_w, d.nn_dist2 AS discord_dist2
FROM motif m JOIN discord d ON d.user_id = m.user_id AND d.rn = 1
WHERE m.rn = 1
ORDER BY m.user_id
""",
    tags=("timeseries", "motif", "matrix-profile"),
)
def ts_motif_discord(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other classic time-series primitive pair (matrix-profile
    family): per user, the MOTIF (closest pair of non-overlapping
    7-day windows — the repeated behavioral pattern) and the DISCORD
    (the window farthest from its nearest non-overlapping neighbor —
    the anomalous week). Exact integer squared distances over the
    zero-filled daily-count series.

    Scale shape: everything after the (user, day) count shuffle is
    PER-USER bounded compute — window extraction is a map-side
    sequence/slice, the pair join is a self-join within the user key
    (24 windows -> 276 pairs for a 30-day series), and both argmins
    are per-user windows. Series length bounds memory, corpus size
    only adds users — embarrassingly parallel."""
    e = load(spark, sf_dir, "events")
    day = F.to_date("ts")
    bounds = e.agg(
        F.min(day).alias("d0"),
        (F.datediff(F.max(day), F.min(day)) + 1).alias("nd"),
    )
    daily = (
        e.join(F.broadcast(bounds))
        .select("user_id", F.datediff(day, F.col("d0")).alias("i"), "nd")
        .groupBy("user_id", "i", "nd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    series = (
        daily.groupBy("user_id", "nd")
        .agg(F.map_from_entries(F.collect_list(F.struct("i", "c"))).alias("m"))
        .filter(F.col("user_id") % 5 == 0)
        .select(
            "user_id",
            F.expr("transform(sequence(0, nd - 1), x -> coalesce(m[x], 0L))").alias("s"),
        )
    )
    win = series.select(
        "user_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(s) - 7),"
                " w -> struct(cast(w as bigint) as w, slice(s, w + 1, 7) as seg))"
            )
        ).alias("e"),
    ).select("user_id", F.col("e.w").alias("w"), F.col("e.seg").alias("seg"))
    a = win.select("user_id", F.col("w").alias("w_a"), F.col("seg").alias("seg_a"))
    c = win.select("user_id", F.col("w").alias("w_b"), F.col("seg").alias("seg_b"))
    pair = (
        a.join(c, "user_id")
        .filter(F.col("w_b") >= F.col("w_a") + 7)
        .select(
            "user_id",
            "w_a",
            "w_b",
            F.expr(
                "aggregate(zip_with(seg_a, seg_b, (x, y) -> (x - y) * (x - y)),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("dist2"),
        )
    )
    nn = (
        pair.select("user_id", F.col("w_a").alias("w"), "dist2")
        .unionAll(pair.select("user_id", F.col("w_b").alias("w"), "dist2"))
        .groupBy("user_id", "w")
        .agg(F.min("dist2").alias("nn_dist2"))
    )
    wm = Window.partitionBy("user_id").orderBy("dist2", "w_a", "w_b")
    motif = (
        pair.withColumn("rn", F.row_number().over(wm)).filter(F.col("rn") == 1)
    )
    wd = Window.partitionBy("user_id").orderBy(F.col("nn_dist2").desc(), "w")
    discord = (
        nn.withColumn("rn", F.row_number().over(wd)).filter(F.col("rn") == 1)
    )
    return (
        motif.select(
            "user_id",
            F.col("w_a").alias("motif_a"),
            F.col("w_b").alias("motif_b"),
            F.col("dist2").alias("motif_dist2"),
        )
        .join(
            discord.select(
                "user_id",
                F.col("w").alias("discord_w"),
                F.col("nn_dist2").alias("discord_dist2"),
            ),
            "user_id",
        )
        .orderBy("user_id")
    )
