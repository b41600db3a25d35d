"""Envelope, filter-routing, and projection tests (batch forms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dolphinbeat_spark.envelope import ENVELOPE_SCHEMA, golden_sequences
from dolphinbeat_spark.operators.filters import filter_tables, table_matches
from dolphinbeat_spark.operators.projection import (
    frame_transactions,
    pair_before_after,
    to_json_ops,
    typed_view,
)
from dolphinbeat_spark.schema.registry import SchemaRegistry
from dolphinbeat_spark.sources.fixture_source import golden_envelope_df


def test_golden_sequences_shape():
    ops = golden_sequences()
    kinds = [o["op_type"] for o in ops]
    assert kinds.count("begin") == 4
    assert kinds.count("commit") == 4
    assert kinds.count("insert") == 3
    assert kinds.count("update") == 2  # incl. the duplicated retry op
    assert kinds.count("ddl") == 1 and kinds.count("rotate") == 1
    # log positions strictly increase until the duplicate
    pos = [o["log_pos"] for o in ops if o["log_pos"] is not None][:-1]
    assert pos == sorted(pos)


def test_fixture_routing_matrix(spark):
    """Reference filter test matrix (FIXTURES.md F3 /
    canal/canal_test.go:62-67,136-153)."""
    include = [r".*\.canal_test"]
    exclude = [r"mysql\..*", r".*\..*_inner"]
    cases = {
        "test.canal_test": True,
        "test.canal_test_inner": False,
        "mysql.canal_test": False,
        "other.not_canal_test": False,  # no '.canal_test' substring → dropped
    }
    df = spark.createDataFrame([(k,) for k in cases], ["db_table"])
    got = {
        r["db_table"]: r["m"]
        for r in df.select(
            "db_table", table_matches(F.col("db_table"), include, exclude).alias("m")
        ).collect()
    }
    assert got == cases


def test_filter_tables_keeps_markers(spark):
    env = golden_envelope_df(spark)
    routed = filter_tables(env, include=[r"nomatch\.nomatch"], exclude=None)
    kinds = {r["op_type"] for r in routed.collect()}
    # all row ops filtered out, transaction markers retained
    assert "insert" not in kinds and "begin" in kinds and "commit" in kinds


def test_typed_view_casts_and_nulls(spark):
    env = golden_envelope_df(spark)
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE test.canal_test (id INT PRIMARY KEY, name VARCHAR(100), content BLOB)")
    tv = typed_view(env, reg, "test", "canal_test")
    rows = {(r["op_type"], r["id"]): r for r in tv.collect()}
    assert rows[("insert", 1)]["name"] == "a"
    assert rows[("insert", 3)]["content"] is None  # null-map wins over ""
    assert isinstance(rows[("insert", 1)]["id"], int)  # stringly → typed


def test_pair_before_after_changed_fields(spark):
    env = golden_envelope_df(spark)
    out = pair_before_after(env, key_cols=["id"]).collect()
    assert len(out) == 2  # update + its duplicate
    assert dict(out[0]["changed"]) == {"name": "a2"}  # only the changed field


def test_frame_transactions(spark):
    # frame AFTER consumer-side dedup (K7): the golden stream ends with
    # a producer-retry duplicate that must not double-count its trx
    env = golden_envelope_df(spark).dropDuplicates(["log_name", "log_pos", "op_type"])
    frames = {r["trx_gtid"]: r for r in frame_transactions(env).collect()}
    assert frames["uuid-1:1"]["n_rows"] == 3
    assert frames["uuid-1:2"]["n_rows"] == 1
    assert frames["uuid-1:3"]["op_types"] == ["delete"]
    # empty trx (uuid-1:4) produces no frame but exists in the stream
    assert "uuid-1:4" not in frames


def test_to_json_ops(spark):
    env = golden_envelope_df(spark)
    j = to_json_ops(env).collect()
    assert len(j) == len(golden_sequences())
    import json

    first_insert = next(r for r in j if r["op_type"] == "insert")
    payload = json.loads(first_insert["json"])
    assert payload["after"]["id"] == "1"
    assert "before" not in payload  # null fields dropped


def test_to_debezium_json(spark):
    import json

    from dolphinbeat_spark.operators.projection import to_debezium_json

    env = golden_envelope_df(spark)
    rows = to_debezium_json(env).collect()
    # only row ops render; op codes map c/u/d
    golden_row_ops = [o for o in golden_sequences()
                      if o["op_type"] in ("insert", "update", "delete")]
    assert len(rows) == len(golden_row_ops)
    by_pos = {}
    for r in rows:
        by_pos.setdefault(r["log_pos"], []).append(json.loads(r["value"]))

    ins = next(json.loads(r["value"]) for r in rows
               if json.loads(r["value"])["op"] == "c")
    assert ins["before"] is None and ins["after"]["id"] == "1"
    assert ins["source"]["connector"] == "mysql"
    assert ins["source"]["file"] == "binlog.000001"
    assert ins["source"]["table"] == "canal_test"
    # the NULL content column renders as a true JSON null (null-flag
    # resolved), not the wire's empty string
    third = next(p for ps in by_pos.values() for p in ps
                 if p["op"] == "c" and p["after"]["id"] == "3")
    assert third["after"]["content"] is None

    upd = next(json.loads(r["value"]) for r in rows
               if json.loads(r["value"])["op"] == "u")
    assert upd["before"]["name"] == "a" and upd["after"]["name"] == "a2"
    dele = next(json.loads(r["value"]) for r in rows
                if json.loads(r["value"])["op"] == "d")
    assert dele["after"] is None and dele["before"]["id"] == "2"
    assert dele["ts_ms"] == 1002 * 1000


def test_to_maxwell_json(spark):
    import json

    from dolphinbeat_spark.operators.projection import to_maxwell_json

    env = golden_envelope_df(spark)
    rows = to_maxwell_json(env).collect()
    golden_row_ops = [o for o in golden_sequences()
                      if o["op_type"] in ("insert", "update", "delete")]
    assert len(rows) == len(golden_row_ops)
    payloads = [json.loads(r["value"]) for r in rows]

    ins = next(p for p in payloads if p["type"] == "insert")
    assert ins["database"] == "test" and ins["table"] == "canal_test"
    assert ins["data"]["id"] == "1"
    assert "old" not in ins  # old is update-only in Maxwell

    # NULL column renders as true JSON null inside data
    third = next(p for p in payloads
                 if p["type"] == "insert" and p["data"]["id"] == "3")
    assert third["data"]["content"] is None

    upd = next(p for p in payloads if p["type"] == "update")
    assert upd["data"]["name"] == "a2"
    # old carries ONLY the changed columns (id unchanged -> absent)
    assert upd["old"] == {"name": "a"}

    dele = next(p for p in payloads if p["type"] == "delete")
    assert dele["data"]["id"] == "2"  # delete: data = old image
    assert "old" not in dele


def test_to_canal_flat_json(spark):
    import json

    from dolphinbeat_spark.operators.projection import to_canal_flat_json
    from dolphinbeat_spark.schema.registry import SchemaRegistry

    reg = SchemaRegistry()
    reg.apply_ddl(
        "CREATE TABLE test.canal_test (id INT PRIMARY KEY, name VARCHAR(100), content BLOB)"
    )
    td = reg.get("test", "canal_test")
    # consumer-side dedup first (K7), as for frame_transactions: the
    # golden stream ends with a producer-retry duplicate
    env = golden_envelope_df(spark).dropDuplicates(
        ["log_name", "log_pos", "op_type", "row_index"]
    )
    rows = to_canal_flat_json(env, td).collect()
    payloads = {(r["type"], r["log_pos"]): json.loads(r["value"]) for r in rows}
    assert all(r["table"] == "canal_test" for r in rows)

    ins = next(p for (t, _), p in payloads.items()
               if t == "INSERT" and p["data"][0]["id"] == "1")
    assert ins["database"] == "test" and ins["isDdl"] is False
    assert ins["pkNames"] == ["id"]
    assert ins["mysqlType"]["name"].startswith("varchar")
    assert ins["sqlType"] == {"id": 4, "name": 12, "content": 2004}
    assert isinstance(ins["data"], list) and ins["data"][0]["id"] == "1"
    assert ins["old"] is None  # non-update: old renders null
    assert ins["es"] == ins["ts"]

    upd = next(p for (t, _), p in payloads.items() if t == "UPDATE")
    assert upd["data"][0]["name"] == "a2"
    assert upd["old"] == [{"name": "a"}]  # aligned per-row changed cols

    dele = next(p for (t, _), p in payloads.items() if t == "DELETE")
    assert dele["data"][0]["id"] == "2"

    # multi-row event batches into ONE message, rows ordered by row_index
    multi = env.sparkSession.createDataFrame(
        [
            ("insert", "test", "canal_test", "b.1", 500, 1, 100,
             {"id": "11", "name": "y", "content": ""}, {"id": False, "name": False, "content": True}),
            ("insert", "test", "canal_test", "b.1", 500, 0, 100,
             {"id": "10", "name": "x", "content": ""}, {"id": False, "name": False, "content": True}),
        ],
        "op_type string, db string, table string, log_name string, log_pos long, "
        "row_index int, timestamp long, after map<string,string>, after_null map<string,boolean>",
    ).withColumn("before", F.lit(None).cast("map<string,string>")) \
     .withColumn("before_null", F.lit(None).cast("map<string,boolean>"))
    out = to_canal_flat_json(multi, td).collect()
    assert len(out) == 1
    p = json.loads(out[0]["value"])
    assert [d["id"] for d in p["data"]] == ["10", "11"]
    assert p["data"][0]["content"] is None  # null flag -> JSON null


def test_maxwell_old_missing_after_column_counts_as_changed(spark):
    """A before-column absent from the after image is CHANGED in the
    update diff, even when its before value is NULL (the documented
    rule; NULL <=> missing must not read as equal)."""
    import json

    from dolphinbeat_spark.operators.projection import to_maxwell_json

    env = spark.createDataFrame(
        [(
            "update", "test", "t", "b.1", 10, 0, 100, None,
            {"id": "1", "dropped": ""}, {"id": False, "dropped": True},
            {"id": "1"}, {"id": False},
        )],
        "op_type string, db string, table string, log_name string, log_pos long, "
        "row_index int, timestamp long, gtid string, "
        "before map<string,string>, before_null map<string,boolean>, "
        "after map<string,string>, after_null map<string,boolean>",
    )
    p = json.loads(to_maxwell_json(env).collect()[0]["value"])
    assert p["old"] == {"dropped": None}
