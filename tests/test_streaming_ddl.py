"""Streaming DDL replay (D9 in streaming context): DDL ops flowing in
the envelope stream update the schema registry live, versioned, with
old versions still resolvable — the no-barrier design of SURVEY §7.4
exercised end-to-end through foreachBatch."""

from __future__ import annotations

from pyspark.sql import functions as F

from dolphinbeat_spark.schema.registry import SchemaRegistry
from dolphinbeat_spark.sources.fixture_source import register_fixture_source

BASE_DDL = "CREATE TABLE test.canal_test (id INT PRIMARY KEY, name VARCHAR(100), content BLOB)"


def test_streaming_ddl_replay_versions_registry(spark, tmp_path):
    register_fixture_source(spark)
    reg = SchemaRegistry()
    reg.apply_ddl(BASE_DDL)
    v_before = reg.version
    cols_before = [c.name for c in reg.get("test", "canal_test").columns]

    stream = (
        spark.readStream.format("dolphinbeat_fixture")
        .option("batch_size", "4")
        .load()
        .filter(F.col("op_type") == "ddl")
        .select("statement", "db", "log_name", "log_pos")
    )

    def apply_ddls(batch_df, batch_id):
        # ordered, driver-side: the decode path is a single logical
        # stream (reference one-goroutine event loop); DDL is rare
        for r in batch_df.orderBy("log_name", "log_pos").collect():
            reg.apply_ddl(
                r["statement"],
                default_db=r["db"] or "",
                position=(r["log_name"], r["log_pos"]),
            )

    q = (
        stream.writeStream.foreachBatch(apply_ddls)
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # the golden ALTER added `age` after `name`
    cols_after = [c.name for c in reg.get("test", "canal_test").columns]
    assert "age" not in cols_before
    assert cols_after.index("age") == cols_after.index("name") + 1
    assert reg.version > v_before
    # old version still resolvable (no-barrier design): pre-DDL rows
    # decode against their own schema_version
    old = reg.get("test", "canal_test", version=v_before)
    assert [c.name for c in old.columns] == cols_before
    # replaying the position is a no-op (idempotence across restarts)
    v_now = reg.version
    reg.apply_ddl(
        "ALTER TABLE test.canal_test ADD age INT NOT NULL AFTER name",
        position=("binlog.000001", 340),
    )
    assert reg.version == v_now
