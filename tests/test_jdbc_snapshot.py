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
