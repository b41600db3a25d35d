"""Stream/batch parity: the windowed aggregation computed
incrementally over many micro-batches (file stream + watermark +
append mode) must equal the one-pass batch result — the property that
makes the batch oracles meaningful for the streaming engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    e = load(spark, SF_DIR, "events")
    src = str(tmp_path / "events_parts")
    # split into 8 files so availableNow + maxFilesPerTrigger=2 gives
    # 4 real micro-batches with out-of-order event time across them
    e.repartition(8).write.parquet(src)

    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_parity")
        # complete mode: every trigger re-emits the full aggregate from
        # state, so nothing waits on a watermark to finalize — the
        # cross-batch state accumulation is exactly what's under test
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["hour_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_parity").collect()
    }
    expect = {(r["hour_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == expect
    assert len(got) > 10


def test_windowed_agg_resume_across_runs(spark, tmp_path):
    """Two availableNow runs over one checkpoint: run 1 sees half the
    files, more files land, run 2 must aggregate ONLY the new data into
    existing window state — ending exactly at the full batch answer
    (no loss, no double counting)."""
    e = load(spark, SF_DIR, "events")
    src = str(tmp_path / "incoming")
    first = e.filter(F.col("event_id") % 2 == 0)
    second = e.filter(F.col("event_id") % 2 == 1)
    first.repartition(2).write.parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(e.schema)
            .parquet(src)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("hour_start"), "event_type", "n")
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("win_resume")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckp"))
            .start()
        )
        q.awaitTermination(180)

    run_once()
    n_first = spark.sql("SELECT SUM(n) AS s FROM win_resume").collect()[0]["s"]
    assert n_first == first.count()

    # late-arriving files, same checkpoint → incremental pickup
    second.repartition(2).write.mode("append").parquet(src)
    run_once()
    got = {
        (r["hour_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_resume").collect()
    }
    expect = {
        (r["hour_start"], r["event_type"]): r["n"]
        for r in e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
        .collect()
    }
    assert got == expect
