"""Rollup cascade invariants: lossless re-aggregation is oracle-checked
(plans/rollup_queries.py); here: INCREMENTAL maintenance — partial
rollups over disjoint slices merge to exactly the full rollup, which
is what lets a streaming foreachBatch update only touched buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.operators.rollups import rollup_cascade

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(
        (r["grain"], r["bucket_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in df.collect()
    )


def test_rollup_incremental_merge_equals_full(spark):
    e = load(spark, SF_DIR, "events")
    full = rollup_cascade(e, "ts", ["event_type"], "value")

    part1 = rollup_cascade(e.filter(F.col("event_id") % 2 == 0), "ts", ["event_type"], "value")
    part2 = rollup_cascade(e.filter(F.col("event_id") % 2 == 1), "ts", ["event_type"], "value")
    # merge = re-aggregate bucket partials (exactly what a foreachBatch
    # MERGE INTO would do per incoming batch)
    merged = (
        part1.unionByName(part2)
        .groupBy("grain", "bucket_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            # partials were rounded to 2 for presentation; summing two
            # 2-decimal doubles is exact (scaled integers < 2^53)
            F.round(F.sum("total_value"), 2).alias("total_value"),
        )
    )
    assert _canon(merged) == _canon(full)


def test_continuous_rollup_streaming(spark, tmp_path):
    """Envelope stream → incrementally merged per-minute op-type
    rollup; final table equals the one-pass batch aggregation."""
    from dolphinbeat_spark.sources.fixture_source import (
        golden_envelope_df,
        register_fixture_source,
    )
    from dolphinbeat_spark.streaming.rollup import continuous_rollup

    register_fixture_source(spark)
    stream = (
        spark.readStream.format("dolphinbeat_fixture")
        .option("batch_size", "3")
        .load()
        .filter(F.col("timestamp").isNotNull())
        .select("op_type", F.col("timestamp").cast("timestamp").alias("event_ts"))
    )
    rollup = str(tmp_path / "rollup")
    q = continuous_rollup(
        stream, rollup, str(tmp_path / "ckp"), "event_ts", ["op_type"]
    )
    q.awaitTermination(120)

    got = {
        (r["bucket_start"], r["op_type"]): r["n_events"]
        for r in spark.read.parquet(rollup).collect()
    }
    batch = (
        golden_envelope_df(spark)
        .filter(F.col("timestamp").isNotNull())
        .groupBy(
            F.date_trunc("minute", F.col("timestamp").cast("timestamp")).alias(
                "bucket_start"
            ),
            "op_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    expect = {
        (r["bucket_start"], r["op_type"]): r["n_events"] for r in batch.collect()
    }
    assert got == expect and got


def test_continuous_rollup_replay_is_idempotent(spark, tmp_path):
    """Replaying a batch (crash between merge and checkpoint commit)
    must not double-count: the applied-marker skips it."""
    from dolphinbeat_spark.sources.fixture_source import golden_envelope_df
    from dolphinbeat_spark.streaming.rollup import merge_rollup_batch

    rollup = str(tmp_path / "rollup")
    b = (
        golden_envelope_df(spark)
        .filter(F.col("timestamp").isNotNull())
        .select("op_type", F.col("timestamp").cast("timestamp").alias("event_ts"))
    )
    merge_rollup_batch(b, rollup, "event_ts", ["op_type"], batch_id=0)
    once = sorted(
        (r["bucket_start"], r["op_type"], r["n_events"])
        for r in spark.read.parquet(rollup).collect()
    )
    # marker commits ATOMICALLY with the data (inside the snapshot dir,
    # landed by the same rename) — no crash window between swap and mark
    import os

    assert os.path.exists(os.path.join(rollup, "_applied_0"))
    merge_rollup_batch(b, rollup, "event_ts", ["op_type"], batch_id=0)  # replay
    again = sorted(
        (r["bucket_start"], r["op_type"], r["n_events"])
        for r in spark.read.parquet(rollup).collect()
    )
    assert once == again
    # markers from earlier batches carry forward across later merges
    merge_rollup_batch(b, rollup, "event_ts", ["op_type"], batch_id=1)
    assert os.path.exists(os.path.join(rollup, "_applied_0"))
    assert os.path.exists(os.path.join(rollup, "_applied_1"))
    merge_rollup_batch(b, rollup, "event_ts", ["op_type"], batch_id=1)  # replay
    final = sorted(
        (r["bucket_start"], r["op_type"], r["n_events"])
        for r in spark.read.parquet(rollup).collect()
    )
    assert [(b_, o, n) for (b_, o, n) in final] == [
        (b_, o, 2 * n) for (b_, o, n) in once
    ]


def test_partitioned_rollup_touches_only_dirty_days(spark, tmp_path):
    """Time-partitioned continuous aggregate: a batch only rewrites the
    day-partitions its events fall in; replay is marker-idempotent per
    partition."""
    import os
    import time as _t

    from dolphinbeat_spark.streaming.rollup import (
        merge_rollup_batch_partitioned,
        read_partitioned_rollup,
    )

    rollup = str(tmp_path / "rollup_part")
    rows_day1 = [(f"2024-01-01 10:{m:02d}:30", "insert") for m in range(10)]
    rows_day2 = [(f"2024-01-02 11:{m:02d}:30", "update") for m in range(5)]
    b0 = spark.createDataFrame(rows_day1 + rows_day2, ["ts", "op_type"]).select(
        F.col("ts").cast("timestamp").alias("event_ts"), "op_type"
    )
    merge_rollup_batch_partitioned(b0, rollup, "event_ts", ["op_type"], batch_id=0)
    assert sorted(os.listdir(rollup)) == ["part=2024-01-01", "part=2024-01-02"]
    state0 = sorted(
        (str(r["bucket_start"]), r["op_type"], r["n_events"])
        for r in read_partitioned_rollup(spark, rollup).collect()
    )
    assert len(state0) == 15 and all(n == 1 for _, _, n in state0)

    def mtimes():
        out = {}
        for d in os.listdir(rollup):
            p = os.path.join(rollup, d)
            out[d] = max(os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p))
        return out

    before = mtimes()
    _t.sleep(1.1)
    # batch 1 touches ONLY day 2
    b1 = spark.createDataFrame(
        [("2024-01-02 11:00:45", "update")], ["ts", "op_type"]
    ).select(F.col("ts").cast("timestamp").alias("event_ts"), "op_type")
    merge_rollup_batch_partitioned(b1, rollup, "event_ts", ["op_type"], batch_id=1)
    after = mtimes()
    assert after["part=2024-01-01"] == before["part=2024-01-01"]  # cold day untouched
    assert after["part=2024-01-02"] > before["part=2024-01-02"]
    merged = {
        (str(r["bucket_start"]), r["op_type"]): r["n_events"]
        for r in read_partitioned_rollup(spark, rollup).collect()
    }
    assert merged[("2024-01-02 11:00:00", "update")] == 2  # additive merge

    # replay of batch 1: per-partition marker skips -> identical state
    merge_rollup_batch_partitioned(b1, rollup, "event_ts", ["op_type"], batch_id=1)
    replayed = {
        (str(r["bucket_start"]), r["op_type"]): r["n_events"]
        for r in read_partitioned_rollup(spark, rollup).collect()
    }
    assert replayed == merged
    # markers carried forward inside each partition dir
    assert os.path.exists(os.path.join(rollup, "part=2024-01-02", "_applied_0"))
    assert os.path.exists(os.path.join(rollup, "part=2024-01-02", "_applied_1"))
