"""StreamingQueryListener metrics (reference M1/M2 parity) +
built-in streaming dedup (dropDuplicatesWithinWatermark)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dolphinbeat_spark.sources.fixture_source import register_fixture_source
from dolphinbeat_spark.streaming.metrics import PipelineMetrics
from dolphinbeat_spark.envelope import golden_sequences


def test_pipeline_metrics_counts_rows(spark, tmp_path):
    register_fixture_source(spark)
    metrics = PipelineMetrics()
    spark.streams.addListener(metrics)
    try:
        q = (
            spark.readStream.format("dolphinbeat_fixture")
            .option("batch_size", "5")
            .load()
            .writeStream.format("noop")
            .queryName("metrics_probe")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckp"))
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async; wait for the counters to land
        total = len(golden_sequences())
        deadline = time.time() + 30
        while time.time() < deadline:
            st = metrics.status().get("metrics_probe")
            if st and st["rows_total"] >= total:
                break
            time.sleep(0.5)
        st = metrics.status()["metrics_probe"]
        assert st["rows_total"] == total
        assert st["batches_total"] >= 1
    finally:
        spark.streams.removeListener(metrics)


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Built-in streaming dedup: the duplicated producer-retry op in
    the golden sequence (same log_pos re-sent) is dropped while state
    stays bounded by the watermark — the zero-custom-code alternative
    to streaming/state.py::dedup_by_seq."""
    register_fixture_source(spark)
    stream = (
        spark.readStream.format("dolphinbeat_fixture")
        .option("batch_size", "4")
        .load()
        .filter(F.col("log_pos").isNotNull())
        .select(
            "log_pos",
            F.col("timestamp").cast("timestamp").alias("event_ts"),
        )
        .withWatermark("event_ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["log_pos"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .start()
    )
    q.awaitTermination(120)
    seqs = [r["log_pos"] for r in spark.sql("SELECT * FROM wm_dedup").collect()]
    distinct_pos = {o["log_pos"] for o in golden_sequences() if o["log_pos"] is not None}
    assert sorted(seqs) == sorted(distinct_pos)
