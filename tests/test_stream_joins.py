"""Streaming join coverage: stream-static enrichment and
watermarked stream-stream joins over the fixture envelope source.

The reference routes events to sinks without ever joining them
(SURVEY.md §2.8); these are north-star streaming operators the Spark
engine adds. Stream-static is the CDC-enrichment pattern (attach
dimension attributes to the change stream); stream-stream with
watermarks is the event-correlation pattern (match row ops to their
transaction commit within a bounded interval, state evicted by the
watermark).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dolphinbeat_spark.envelope import golden_sequences
from dolphinbeat_spark.sources.fixture_source import register_fixture_source


def _envelope_stream(spark, batch_size=4):
    register_fixture_source(spark)
    return (
        spark.readStream.format("dolphinbeat_fixture")
        .option("batch_size", str(batch_size))
        .load()
    )


def test_stream_static_enrichment(spark, tmp_path):
    """Row ops enriched with a static table-ownership dimension via a
    stream-static broadcast join (no state, no watermark needed — the
    static side is re-read per micro-batch)."""
    stream = _envelope_stream(spark).filter(
        F.col("op_type").isin("insert", "update", "delete")
    )
    owners = spark.createDataFrame(
        [("test", "canal_test", "team-payments"), ("test", "other", "team-growth")],
        ["dim_db", "dim_table", "owner"],
    )
    enriched = stream.join(
        F.broadcast(owners),
        (stream["db"] == owners["dim_db"]) & (stream["table"] == owners["dim_table"]),
        "left",
    ).select("op_type", "db", "table", "log_pos", "owner")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM enriched").collect()
    row_ops = [
        o for o in golden_sequences() if o["op_type"] in ("insert", "update", "delete")
    ]
    assert len(rows) == len(row_ops)
    # every golden row op targets test.canal_test → all enriched
    owners_seen = {r["owner"] for r in rows if r["table"] == "canal_test"}
    assert owners_seen == {"team-payments"}
    # nothing silently dropped by the left join
    assert all(r["owner"] is not None for r in rows if r["table"] == "canal_test")


def test_stream_stream_join_rows_to_commit(spark, tmp_path):
    """Watermarked stream-stream inner join: each row op matches its
    transaction's commit marker by (server_id, time window). Both
    sides carry event-time watermarks so join state is evicted — the
    unbounded-state hazard of stream-stream joins is bounded by the
    time-range condition, exactly how it must run at scale."""
    base = _envelope_stream(spark).withColumn(
        "event_ts", F.col("timestamp").cast("timestamp")
    )
    rows = (
        base.filter(F.col("op_type").isin("insert", "update", "delete"))
        .select(
            F.col("server_id").alias("r_server_id"),
            F.col("log_pos").alias("row_pos"),
            F.col("event_ts").alias("row_ts"),
        )
        .withWatermark("row_ts", "10 minutes")
    )
    commits = (
        base.filter(F.col("op_type") == "commit")
        .select(
            F.col("server_id").alias("c_server_id"),
            F.col("log_pos").alias("commit_pos"),
            F.col("event_ts").alias("commit_ts"),
        )
        .withWatermark("commit_ts", "10 minutes")
    )
    joined = rows.join(
        commits,
        (F.col("r_server_id") == F.col("c_server_id"))
        & (F.col("commit_ts") >= F.col("row_ts"))
        & (F.col("commit_ts") <= F.col("row_ts") + F.expr("INTERVAL 5 MINUTES")),
        "inner",
    ).select("row_pos", "commit_pos")
    q = (
        joined.writeStream.format("memory")
        .queryName("row_commits")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["row_pos"], r["commit_pos"])
        for r in spark.sql("SELECT * FROM row_commits").collect()
    }
    # oracle: replay the golden sequence in python
    expect = set()
    ops = golden_sequences()
    for r in ops:
        if r["op_type"] not in ("insert", "update", "delete"):
            continue
        for c in ops:
            if (
                c["op_type"] == "commit"
                and c["server_id"] == r["server_id"]
                and r["timestamp"] is not None
                and c["timestamp"] is not None
                and 0 <= c["timestamp"] - r["timestamp"] <= 300
            ):
                expect.add((r["log_pos"], c["log_pos"]))
    assert got == expect
    assert got, "join produced no pairs — fixture timestamps changed?"
