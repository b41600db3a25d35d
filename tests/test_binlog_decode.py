"""Binlog decode + offset algebra tests (no live MySQL needed).

Drives sources/binlog_source.py::decode_event with duck-typed fake
events through the reference's canonical scenario (SURVEY.md §5:
canal/canal_test.go:50-134): create → inserts → ALTER → insert with
new schema, plus rotate/gtid/commit framing.
"""

from __future__ import annotations

from types import SimpleNamespace as NS

import pytest

from dolphinbeat_spark.schema.registry import SchemaRegistry
from dolphinbeat_spark.sources.binlog_source import BinlogOffset, DecodeContext, decode_event


def _ctx() -> DecodeContext:
    return DecodeContext(registry=SchemaRegistry(), log_name="binlog.000001", server_id=1)


def test_full_canal_scenario():
    ctx = _ctx()
    ops = []

    def feed(**kw):
        ops.extend(decode_event(NS(**kw), ctx))

    feed(kind="rotate", next_binlog="binlog.000002", position=4, log_pos=0, timestamp=0)
    assert ctx.log_name == "binlog.000002"
    feed(kind="query", query="CREATE TABLE test.canal_test (id INT PRIMARY KEY, content BLOB, name VARCHAR(100))",
         schema="test", log_pos=200, timestamp=10)
    assert ops[-1]["op_type"] == "ddl" and ops[-1]["schema_version"] == 1
    feed(kind="gtid", gtid="uuid:1", log_pos=220, timestamp=11)
    feed(kind="query", query="BEGIN", schema="", log_pos=240, timestamp=11)
    feed(kind="insert", schema="test", table="canal_test",
         rows=[(1, b"1", "a"), (2, None, "b")], log_pos=260, timestamp=11)
    feed(kind="xid", log_pos=280, timestamp=11)

    inserts = [o for o in ops if o["op_type"] == "insert"]
    assert len(inserts) == 2
    # positional row named via the registry (reference D10); blob
    # bytes stringify as the RAW byte string (reference D12 parity),
    # not Python's b'...' repr
    assert inserts[0]["after"] == {"id": "1", "content": "1", "name": "a"}
    assert inserts[1]["after_null"] == {"id": False, "content": True, "name": False}
    assert inserts[1]["after"]["content"] == ""  # NULL stringifies to "" + flag
    commit = ops[-1]
    assert commit["op_type"] == "commit" and commit["gtid"] == "uuid:1"

    # ALTER mid-stream; subsequent insert resolves the NEW schema
    feed(kind="query", query="ALTER TABLE test.canal_test ADD age INT AFTER name",
         schema="test", log_pos=300, timestamp=12)
    feed(kind="insert", schema="test", table="canal_test",
         rows=[(3, None, "d", 18)], log_pos=320, timestamp=12)
    last = ops[-1]
    assert last["after"] == {"id": "3", "content": "", "name": "d", "age": "18"}
    assert last["schema_version"] == ctx.registry.version


def test_update_pairs_before_after():
    ctx = _ctx()
    decode_event(
        NS(kind="query", query="CREATE TABLE t.u (id INT PRIMARY KEY, v VARCHAR(5))",
           schema="t", log_pos=10, timestamp=1),
        ctx,
    )
    [op] = decode_event(
        NS(kind="update", schema="t", table="u", rows=[((1, "a"), (1, "b"))],
           log_pos=20, timestamp=2),
        ctx,
    )
    assert op["before"] == {"id": "1", "v": "a"}
    assert op["after"] == {"id": "1", "v": "b"}


def test_non_ddl_query_surfaces_as_query_op():
    """Reference F4 silently drops these; we keep them observable."""
    ctx = _ctx()
    [op] = decode_event(
        NS(kind="query", query="INSERT INTO t VALUES (1)", schema="d", log_pos=5, timestamp=1),
        ctx,
    )
    assert op["op_type"] == "query"


def test_offset_algebra():
    """Reference progress tests (canal/prog/progress_test.go)."""
    a = BinlogOffset("binlog.000001", 99, "", 1)
    b = BinlogOffset("binlog.000001", 199, "", 1)
    c = BinlogOffset("binlog.000002", 4, "", 1)
    assert a.compare(b) == -1 and b.compare(a) == 1 and a.compare(a) == 0
    assert b.compare(c) == -1  # file name dominates
    assert BinlogOffset().is_zero()
    assert BinlogOffset(gtid_set="").is_zero()  # empty-string gset is zero
    assert not BinlogOffset(gtid_set="uuid:1-5").is_zero()
    other_server = BinlogOffset("binlog.000001", 50, "", 2)
    with pytest.raises(ValueError):
        a.compare(other_server)  # C2 caveat: cross-server undefined
    rt = BinlogOffset.from_json(a.to_json())
    assert rt == a


def test_stringify_blob_bytes_raw_not_repr():
    """A bytes value in a non-JSON column renders as the RAW byte
    string (reference parity: go string(bytes)), never Python's
    "b'...'" repr; non-UTF8 bytes round-trip via the latin-1
    fallback."""
    from dolphinbeat_spark.sources.binlog_source import _stringify

    vals, nulls = _stringify({"a": b"plain", "b": b"\xff\x00ok", "c": 7}, None)
    assert vals["a"] == "plain"
    assert vals["b"].encode("latin-1") == b"\xff\x00ok"  # 1:1 reversible
    assert not vals["b"].startswith("b'")
    assert vals["c"] == "7"
    assert nulls == {"a": False, "b": False, "c": False}


def test_stringify_nonutf8_blob_survives_spark(spark):
    """The latin-1 fallback produces strings that cross Spark's UTF-8
    boundary (an escape scheme using lone surrogates would throw at
    serialization)."""
    from dolphinbeat_spark.sources.binlog_source import _stringify

    vals, _ = _stringify({"blob": bytes(range(256))}, None)
    df = spark.createDataFrame([(vals["blob"],)], "blob string")
    [row] = df.collect()
    assert row["blob"].encode("latin-1") == bytes(range(256))


def test_enum_set_values_render_canonically_both_routes():
    """ENUM/SET wire values reach decode in TWO shapes — int index /
    bitmask from the file parser, label str / frozenset from live
    pymysqlreplication — and must render to the SAME canonical text
    (labels resolved via the registry's column definition; set members
    in definition order, never str(set)'s unstable order)."""
    ctx = _ctx()
    decode_event(
        NS(kind="query", schema="test", log_pos=50, timestamp=1,
           query="CREATE TABLE test.e (id INT PRIMARY KEY, "
                 "status ENUM('New','active','closed'), "
                 "flags SET('a','b','c','d'))"),
        ctx,
    )
    # file-parser shape: 1-based index / bitmask
    ops = decode_event(
        NS(kind="insert", schema="test", table="e",
           rows=[(1, 2, 0b1010), (2, 0, 0)], log_pos=60, timestamp=1),
        ctx,
    )
    assert ops[0]["after"] == {"id": "1", "status": "active", "flags": "b,d"}
    assert ops[1]["after"] == {"id": "2", "status": "", "flags": ""}
    # label case preserved from the DDL (not lowercased)
    ops = decode_event(
        NS(kind="insert", schema="test", table="e",
           rows=[(3, 1, 0b0001)], log_pos=70, timestamp=1),
        ctx,
    )
    assert ops[0]["after"]["status"] == "New"
    # live pymysqlreplication shape: resolved label / frozenset
    ops = decode_event(
        NS(kind="insert", schema="test", table="e",
           rows=[(4, "closed", frozenset({"d", "a"}))], log_pos=80, timestamp=1),
        ctx,
    )
    assert ops[0]["after"] == {"id": "4", "status": "closed", "flags": "a,d"}
    # out-of-definition index / unknown set bit: raw number fallback,
    # never a crash or silent wrong label
    ops = decode_event(
        NS(kind="insert", schema="test", table="e",
           rows=[(5, 9, 1 << 6)], log_pos=90, timestamp=1),
        ctx,
    )
    assert ops[0]["after"]["status"] == "9"
    assert ops[0]["after"]["flags"] == "64"


def test_parse_labels_backslash_escapes():
    """ENUM/SET label tokenizing must honor BOTH MySQL quote escapes:
    the doubled quote ('') and the backslash forms (\\' \\\\) MySQL
    emits when NO_BACKSLASH_ESCAPES is off (ADVICE r7)."""
    from dolphinbeat_spark.sources.binlog_source import _parse_labels

    assert _parse_labels("enum('a','b')") == ["a", "b"]
    assert _parse_labels("enum('it''s','x')") == ["it's", "x"]
    assert _parse_labels("enum('it\\'s','x')") == ["it's", "x"]
    assert _parse_labels("set('a\\\\b','c')") == ["a\\b", "c"]
    # mixed in one definition; escape as the label's last char
    assert _parse_labels("enum('q\\'','\\\\','d''d')") == ["q'", "\\", "d'd"]
