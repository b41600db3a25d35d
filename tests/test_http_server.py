"""HTTP control surface tests (reference M1 routes, C5 retry loop)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from dolphinbeat_spark.schema.registry import SchemaRegistry
from dolphinbeat_spark.streaming.http_server import ControlServer


@pytest.fixture
def server():
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE d.t (id INT PRIMARY KEY, name VARCHAR(10))")
    reg.apply_ddl("ALTER TABLE d.t ADD age INT")
    srv = ControlServer(registry=reg, dead_letters=[
        {"statement": "ALTER TABLE d.missing ADD x INT", "db": "d",
         "log_name": "binlog.000001", "log_pos": 500, "error": "ALTER on unknown table"},
    ])
    port = srv.serve()
    yield srv, f"http://127.0.0.1:{port}"
    srv.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, json.loads(r.read())


def _post(url, payload=None):
    data = json.dumps(payload).encode() if payload else b""
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status, json.loads(r.read())


def test_status_and_schema_routes(server):
    srv, base = server
    code, status = _get(base + "/status")
    assert code == 200
    assert status["registry_version"] == srv.registry.version
    assert status["ddl_failed"] == 1

    code, all_tables = _get(base + "/schema")
    assert all_tables["tables"] == [["d", "t"]]
    code, db_tables = _get(base + "/schema/d")
    assert db_tables == {"db": "d", "tables": ["t"]}

    code, td = _get(base + "/schema/d/t")
    assert code == 200
    assert [c["name"] for c in td["def"]["columns"]] == ["id", "name", "age"]
    assert td["primary_key"] == ["id"]
    # historical version: before the ALTER (versioned registry bonus)
    code, old = _get(base + "/schema/d/t?version=1")
    assert [c["name"] for c in old["def"]["columns"]] == ["id", "name"]

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(base + "/schema/d/nope")
    assert ei.value.code == 404


def test_ddl_failed_retry_exec(server):
    srv, base = server
    code, failed = _get(base + "/ddl/failed")
    assert len(failed["failed"]) == 1

    # retry still fails (table still missing)
    code, res = _post(base + "/ddl/retry")
    assert res == {"retried": [], "still_failed": 1}

    # exec the missing CREATE, then retry drains the queue
    code, res = _post(base + "/ddl/exec",
                      {"statement": "CREATE TABLE d.missing (id INT)", "db": "d"})
    assert code == 200 and res["applied"]
    code, res = _post(base + "/ddl/retry")
    assert res["retried"] == ["ALTER TABLE d.missing ADD x INT"] and res["still_failed"] == 0
    assert srv.registry.get("d", "missing").column_names() == ["id", "x"]
    code, failed = _get(base + "/ddl/failed")
    assert failed["failed"] == []

    # bad exec -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/ddl/exec", {"statement": "NOT A DDL"})
    assert ei.value.code == 400


def test_decode_dead_letters_failed_ddl():
    """decode_event records unparseable DDL and keeps streaming
    (C5 deviation: versioned registry makes late apply safe)."""
    from types import SimpleNamespace

    from dolphinbeat_spark.sources.binlog_source import DecodeContext, decode_event

    ctx = DecodeContext(registry=SchemaRegistry(), log_name="binlog.000001")
    ev = SimpleNamespace(kind="query", query="ALTER TABLE d.ghost ADD x INT",
                         schema="d", timestamp=1, log_pos=42)
    ops = decode_event(ev, ctx)
    assert [o["op_type"] for o in ops] == ["ddl_failed"]
    assert len(ctx.dead_letters) == 1
    assert ctx.dead_letters[0]["log_pos"] == 42
    # the stream continues: a later valid DDL still applies
    ev2 = SimpleNamespace(kind="query", query="CREATE TABLE d.ok (id INT)",
                          schema="d", timestamp=1, log_pos=60)
    assert decode_event(ev2, ctx)[0]["op_type"] == "ddl"
