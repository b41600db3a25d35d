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
