"""Apply-changes (CDC snapshot materialization) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from dolphinbeat_spark.sinks.apply_changes import (
    apply_batch,
    apply_changes_stream,
    last_op_per_key,
)
from dolphinbeat_spark.envelope import ENVELOPE_SCHEMA, golden_sequences
from dolphinbeat_spark.sources.fixture_source import register_fixture_source


def _golden_df(spark):
    rows = [
        {k: v for k, v in op.items()}
        for op in golden_sequences()
    ]
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)


def _state(spark, path):
    return {
        r["id"]: r["name"]
        for r in spark.read.parquet(path).collect()
    }


def test_last_op_per_key_picks_terminal_op(spark):
    df = _golden_df(spark)
    winners = last_op_per_key(df, ["id"])
    got = {r["__k_id"]: r["op_type"] for r in winners.collect()}
    # id 1: insert then update -> update wins; id 2: insert then delete
    # -> delete wins; id 3: insert only
    assert got == {"1": "update", "2": "delete", "3": "insert"}


def test_apply_batch_materializes_final_state(spark, tmp_path):
    snap = str(tmp_path / "snap")
    apply_batch(spark, _golden_df(spark), snap, ["id"], ["name", "content"])
    assert _state(spark, snap) == {"1": "a2", "3": "c"}


def test_apply_batch_is_idempotent_and_incremental(spark, tmp_path):
    snap = str(tmp_path / "snap")
    df = _golden_df(spark)
    inserts = df.filter(F.col("op_type") == "insert")
    rest = df.filter(F.col("op_type") != "insert")
    apply_batch(spark, inserts, snap, ["id"], ["name", "content"])
    assert _state(spark, snap) == {"1": "a", "2": "b", "3": "c"}
    apply_batch(spark, rest, snap, ["id"], ["name", "content"])
    assert _state(spark, snap) == {"1": "a2", "3": "c"}
    # replaying the tail batch (checkpoint-replay after crash between
    # merge and commit) converges to the same state
    apply_batch(spark, rest, snap, ["id"], ["name", "content"])
    assert _state(spark, snap) == {"1": "a2", "3": "c"}


def test_apply_changes_streaming_end_to_end(spark, tmp_path):
    register_fixture_source(spark)
    stream = (
        spark.readStream.format("dolphinbeat_fixture")
        .option("batch_size", "3")
        .load()
    )
    snap = str(tmp_path / "snap")
    q = apply_changes_stream(
        stream, snap, str(tmp_path / "ckp"), ["id"], ["name", "content"]
    )
    q.awaitTermination(120)
    assert _state(spark, snap) == {"1": "a2", "3": "c"}


def test_scd2_history(spark):
    from dolphinbeat_spark.sinks.apply_changes import scd2_history

    hist = scd2_history(_golden_df(spark), ["id"], ["name"]).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["id"], []).append(
            (r["name"], r["valid_from_pos"], r["valid_to_pos"], r["is_current"])
        )
        by_key[r["id"]].sort(key=lambda t: t[1])
    # id 1: insert(a)@140 superseded by update(a2)@240 twice (retry) —
    # the retry creates a zero-width [240,240) version then the real one
    assert by_key["1"][0] == ("a", 140, 240, False)
    assert by_key["1"][-1][0] == "a2" and by_key["1"][-1][3] is True
    # id 2: insert(b)@160 closed by delete@300, no current version
    assert by_key["2"] == [("b", 160, 300, False)]
    # id 3: insert(c)@180 still current
    assert by_key["3"] == [("c", 180, None, True)]
