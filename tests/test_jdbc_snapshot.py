"""Snapshot bootstrap tests (pure parts — no live MySQL in env)."""

from __future__ import annotations

from pyspark.sql import types as T

from dolphinbeat_spark.sources.jdbc_snapshot import BackfillPlan, registry_from_columns_rows

# (schema, table, column, ordinal, column_type, is_nullable, key, charset)
_ROWS = [
    ("test1", "t1", "name", 2, "varchar(256)", "YES", "", "utf8"),
    ("test1", "t1", "id", 1, "int unsigned", "NO", "PRI", None),
    ("test2", "t2", "id", 1, "bigint", "NO", "PRI", None),
    ("test2", "t2", "payload", 2, "mediumblob", "YES", "", None),
]


def test_registry_from_information_schema():
    reg = registry_from_columns_rows(_ROWS)
    td = reg.get("test1", "t1")
    # ordinal_position ordering restored (binlog rows are positional)
    assert td.column_names() == ["id", "name"]
    assert td.primary_key() == ["id"]
    assert td.columns[0].unsigned  # "int unsigned" parsed
    assert td.columns[0].spark_field().dataType == T.LongType()  # re-widened
    assert reg.get("test2", "t2").columns[1].spark_field().dataType == T.BinaryType()
    assert sorted(reg.tables()) == [("test1", "t1"), ("test2", "t2")]


def test_backfill_plan_options():
    plan = BackfillPlan("test1.t1", "id", 16, 1, 1_000_000)
    opts = plan.reader_options("jdbc:mysql://h/db", "u", "p")
    assert opts["partitionColumn"] == "id" and opts["numPartitions"] == "16"
    unpartitioned = BackfillPlan("test1.tiny", None, 1)
    assert "partitionColumn" not in unpartitioned.reader_options("jdbc:mysql://h/db", "u", "p")


def test_bootstrap_handover_probe_first():
    """S1+S5 handover: position probed before the snapshot; both
    halves wired from injectables (no live MySQL)."""
    from dolphinbeat_spark.sources.jdbc_snapshot import bootstrap_handover

    calls = []

    def run(sql):
        calls.append(sql)
        return {
            "SHOW BINARY LOG STATUS": [("binlog.000009", 777, "", "", "")],
            "SELECT @@GLOBAL.GTID_EXECUTED": [("uuid-1:1-9",)],
            "SELECT @@server_id": [(3,)],
        }[sql]

    rows = [
        ("d", "t", "id", 1, "int", "NO", "PRI", None),
        ("d", "t", "name", 2, "varchar(10)", "YES", "", "utf8"),
    ]
    reg, off = bootstrap_handover(run, rows)
    assert (off.file, off.pos, off.gtid_set, off.server_id) == (
        "binlog.000009", 777, "uuid-1:1-9", 3,
    )
    assert reg.get("d", "t").column_names() == ["id", "name"]
    assert reg.get("d", "t").primary_key() == ["id"]
    # probe happened before any schema assembly (order contract)
    assert calls[0].startswith("SHOW")


def test_handover_to_live_stream_e2e(spark, tmp_path):
    """Full snapshot→stream handover under a real ``spark.readStream``
    (reference canal.Run: dump bootstraps schema+position, sync tails
    from that position): bootstrap_handover seeds the registry and
    probes the master AFTER the CREATE TABLE committed (pos 24), the
    production LiveBinlogStreamReader then tails the scripted fake
    binlog from that offset — the CREATE is NOT replayed (it's in the
    snapshot), row decode works off the SEEDED registry, and offsets
    are contiguous at the handover point."""
    from pyspark.sql import functions as F

    from dolphinbeat_spark.sources.binlog_fake import register_fake_binlog_source
    from dolphinbeat_spark.sources.jdbc_snapshot import bootstrap_handover

    # the fake master: CREATE TABLE committed at pos 24 (script layout),
    # INFORMATION_SCHEMA already shows test.fake_t
    answers = {
        "SHOW BINARY LOG STATUS": [("binlog.000001", 24, "", "", "")],
        "SELECT @@GLOBAL.GTID_EXECUTED": [("",)],
        "SELECT @@server_id": [(1,)],
    }
    info_schema_rows = [
        ("test", "fake_t", "id", 1, "int", "NO", "PRI", None),
        ("test", "fake_t", "v", 2, "varchar(20)", "YES", "", "utf8mb4"),
    ]
    registry, offset = bootstrap_handover(lambda sql: answers[sql], info_schema_rows)
    assert (offset.file, offset.pos) == ("binlog.000001", 24)
    assert registry.get("test", "fake_t").column_names() == ["id", "v"]
    seeded_version = registry.version

    snap = tmp_path / "schema_snapshot.json"
    registry.save(snap)

    register_fake_binlog_source(spark)
    out = str(tmp_path / "out")

    def run_once():
        stream = (
            spark.readStream.format("dolphinbeat_binlog_fake")
            .option("schema_snapshot", str(snap))
            .option("file", offset.file)
            .option("pos", str(offset.pos))
            .option("server_id", str(offset.server_id))
            .option("n_trx", "4")
            .option("rows_per_trx", "3")
            .option("max_ops_per_batch", "9")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    for _ in range(4):  # chunked batches + checkpoint resume
        run_once()

    got = spark.read.parquet(out)
    by_op = {r["op_type"]: r["n"] for r in
             got.groupBy("op_type").agg(F.count("*").alias("n")).collect()}
    # the CREATE TABLE is NOT in the stream: it predates the handover
    assert "ddl" not in by_op and "rotate" not in by_op
    assert by_op == {"gtid": 4, "begin": 4, "insert": 12, "commit": 4}

    # offsets contiguous at the handover: the first streamed op is the
    # next event after the probed position, nothing skipped or repeated
    assert got.agg(F.min("log_pos")).first()[0] == 44  # gtid of trx 1
    inserts = got.filter(F.col("op_type") == "insert")
    ids = sorted(int(r["after"]["id"]) for r in inserts.collect())
    assert ids == list(range(1, 13))

    # row decode ran against the SEEDED registry (no DDL in-stream to
    # build one): schema_version stamps the snapshot's version
    assert {r["schema_version"] for r in inserts.collect()} == {seeded_version}
    # and the full gtid chain folded into the final offset
    gtids = {r["gtid"] for r in got.filter(F.col("op_type") == "commit").collect()}
    assert gtids == {f"uuid-f:{i}" for i in range(1, 5)}
