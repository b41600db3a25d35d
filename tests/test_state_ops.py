"""Custom stateful streaming operator tests (applyInPandasWithState)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dolphinbeat_spark.sources.fixture_source import register_fixture_source
from dolphinbeat_spark.streaming.state import dedup_by_seq, running_user_totals


def test_dedup_by_seq_drops_producer_retries(spark, tmp_path):
    """The golden sequence ends with a duplicated op (producer retry,
    FIXTURES.md F5 case g). Keyed by (producer_id, seq=log_pos), the
    stateful dedup must emit each seq exactly once."""
    register_fixture_source(spark)
    stream = (
        spark.readStream.format("dolphinbeat_fixture")
        .option("batch_size", "4")
        .load()
        .filter(F.col("log_pos").isNotNull())
        .select(
            F.lit(1).cast("bigint").alias("producer_id"),
            F.col("log_pos").alias("seq"),
            F.col("log_pos"),
        )
    )
    q = (
        dedup_by_seq(stream)
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM deduped ORDER BY seq").collect()
    seqs = [r["seq"] for r in rows]
    assert len(seqs) == len(set(seqs)), "duplicate seq leaked through"
    # the duplicated update (same log_pos re-sent later) was dropped
    from dolphinbeat_spark.envelope import golden_sequences

    distinct_pos = {o["log_pos"] for o in golden_sequences() if o["log_pos"] is not None}
    assert set(seqs) == distinct_pos


def test_running_user_totals(spark, tmp_path):
    register_fixture_source(spark)
    # reuse fixture stream as a generic keyed stream: user = server_id
    stream = (
        spark.readStream.format("dolphinbeat_fixture")
        .option("batch_size", "50")
        .load()
        .filter(F.col("log_pos").isNotNull())
        .select(
            F.col("server_id").cast("bigint").alias("user_id"),
            F.coalesce(F.col("log_pos"), F.lit(0)).alias("k"),
        )
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM totals").collect()
    assert rows, "no state output"
    by_user = {r["user_id"]: r for r in rows}
    assert by_user[1]["n_events"] >= 15


def test_dedup_by_seq_v2_transform_with_state(spark, tmp_path):
    """Same contract as test_dedup_by_seq_drops_producer_retries, via
    the Spark 4 transformWithStateInPandas API (streaming/state_v2).

    Gated: the transformWithState state-server protocol needs the
    google.protobuf python package, absent in this container (same
    class of gate as pymysqlreplication / confluent_kafka)."""
    import pytest

    pytest.importorskip("google.protobuf")
    from dolphinbeat_spark.streaming.state_v2 import dedup_by_seq_v2

    register_fixture_source(spark)
    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = (
        spark.readStream.format("dolphinbeat_fixture")
        .option("batch_size", "4")
        .load()
        .filter(F.col("log_pos").isNotNull())
        .select(
            F.lit(1).cast("bigint").alias("producer_id"),
            F.col("log_pos").alias("seq"),
            F.col("log_pos"),
        )
    )
    q = (
        dedup_by_seq_v2(stream)
        .writeStream.format("memory")
        .queryName("deduped_v2")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM deduped_v2 ORDER BY seq").collect()
    seqs = [r["seq"] for r in rows]
    from dolphinbeat_spark.envelope import golden_sequences

    distinct_pos = {o["log_pos"] for o in golden_sequences() if o["log_pos"] is not None}
    assert len(seqs) == len(set(seqs))
    assert set(seqs) == distinct_pos
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_dedup_by_seq_transformwithstate(spark, tmp_path):
    """Same K7 dedup contract through Spark 4's transformWithState
    (StatefulProcessor + ValueState) — the next-gen state API twin.

    Environment-gated: the TWS runtime speaks protobuf to the JVM and
    needs the ``google.protobuf`` package, absent in this sandbox."""
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState runtime needs the protobuf package",
    )
    from dolphinbeat_spark.streaming.state import dedup_by_seq_tws

    register_fixture_source(spark)
    stream = (
        spark.readStream.format("dolphinbeat_fixture")
        .option("batch_size", "4")
        .load()
        .filter(F.col("log_pos").isNotNull())
        .select(
            F.lit(1).cast("bigint").alias("producer_id"),
            F.col("log_pos").alias("seq"),
            F.col("log_pos"),
        )
    )
    q = (
        dedup_by_seq_tws(stream)
        .writeStream.format("memory")
        .queryName("deduped_tws")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckp_tws"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM deduped_tws ORDER BY seq").collect()
    seqs = [r["seq"] for r in rows]
    assert len(seqs) == len(set(seqs)), "duplicate seq leaked through"
    from dolphinbeat_spark.envelope import golden_sequences

    distinct_pos = {o["log_pos"] for o in golden_sequences() if o["log_pos"] is not None}
    assert set(seqs) == distinct_pos
