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


def test_html_extract_stream_equals_batch(spark, tmp_path):
    """The HTML->text extractor (r10's raw-web bridge) runs inside
    Structured Streaming micro-batches (mapInPandas is stream-capable)
    and emits exactly the batch relation — so the WARC->HTML->quality
    path can run continuously over a live crawl drop."""
    from dolphinbeat_spark.operators.html import html_extract

    d = load(spark, SF_DIR, "documents").limit(64)
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>T</title></head><body><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"), F.col("text"),
            F.lit("</p><a href='/n'>next</a></body></html>"),
        ).alias("html"),
    )
    src = str(tmp_path / "pages")
    pages.repartition(4).write.parquet(src)

    batch = {r["doc_id"]: r for r in
             html_extract(spark.read.parquet(src)).collect()}

    stream = html_extract(
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("html_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckp_html"))
        .start()
    )
    q.awaitTermination(180)
    got = {r["doc_id"]: r for r in
           spark.sql("SELECT * FROM html_parity").collect()}
    assert len(got) == len(batch) == 64
    for k in batch:
        assert got[k].asDict() == batch[k].asDict(), k
    sample = batch[min(batch)]
    assert sample.title == "T" and sample.n_links == 1
