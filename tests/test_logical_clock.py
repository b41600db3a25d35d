"""GTID group-commit logical clock (last_committed/sequence_number):
file-parser decode, envelope stamping, wire fields 9/10 round-trip,
and the parallel-apply cohort operator.

The reference tracks both fields (canal/sync.go:144-145) and reserves
wire fields 9/10 (sink/kafka/protocol/protocol.proto:137-138) but its
producer never populates them (sink/kafka/operation.go:93-99); this
engine carries them end-to-end.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from tools.make_binlog_fixture import Writer  # noqa: E402

from dolphinbeat_spark.schema.registry import SchemaRegistry  # noqa: E402
from dolphinbeat_spark.sources import binlog_file as B  # noqa: E402
from dolphinbeat_spark.sources.binlog_source import (  # noqa: E402
    DecodeContext,
    adapt_replication_event,
    decode_event,
)

SID = "aa11fa47e3b24f2c90b1aa6d1d1f3e22"


def _clocked_ops():
    """Two group-commit cohorts: trx 1-2 share last_committed=0,
    trx 3 has last_committed=2 (waits for both)."""
    cols = [(B.T_LONG, 0)]
    w = Writer()
    w.fde()
    w.query("test", "CREATE TABLE test.t (id INT)")
    for gno, lc, sn in ((1, 0, 1), (2, 0, 2), (3, 2, 3)):
        w.gtid(SID, gno, last_committed=lc, sequence_number=sn)
        w.query("test", "BEGIN")
        w.table_map(5, "test", "t", cols)
        w.rows(B.EV_WRITE_ROWS_V2, 5, cols, [(gno,)])
        w.xid(gno)
    ctx = DecodeContext(registry=SchemaRegistry(), log_name="c.bin")
    ops = []
    for e in B.parse_binlog_events(bytes(w.buf)):
        ev = adapt_replication_event(e)
        if ev is not None:
            ops.extend(decode_event(ev, ctx))
    return ops


def test_file_parser_decodes_logical_clock():
    cols = [(B.T_LONG, 0)]
    w = Writer()
    w.fde()
    w.gtid(SID, 7, last_committed=40, sequence_number=42)
    w.gtid(SID, 8)  # clock-less (pre-5.7 shape) stays None
    evs = [e for e in B.parse_binlog_events(bytes(w.buf))
           if isinstance(e, B.GtidEvent)]
    assert (evs[0].last_committed, evs[0].sequence_number) == (40, 42)
    assert evs[0].gtid.endswith(":7")
    assert (evs[1].last_committed, evs[1].sequence_number) == (None, None)
    del cols


def test_envelope_stamps_clock_on_every_trx_op():
    ops = _clocked_ops()
    by_type = {}
    for op in ops:
        by_type.setdefault(op["op_type"], []).append(op)
    # the gtid op, the BEGIN, each row op, and the commit all carry the
    # transaction's clock — parallel apply groups row ops WITHOUT
    # joining back to the gtid op
    for t in ("gtid", "begin", "insert", "commit"):
        assert [op["sequence_number"] for op in by_type[t]] == [1, 2, 3], t
    assert [op["last_committed"] for op in by_type["insert"]] == [0, 0, 2]


def test_wire_fields_9_10_roundtrip():
    from dolphinbeat_spark.sinks.wire_protocol import (
        decode_operation,
        encode_operation,
    )

    op = {"op_type": "gtid", "server_id": 1, "timestamp": 9, "log_pos": 120,
          "gtid": f"{SID[:8]}:3", "last_committed": 0, "sequence_number": 3}
    dec = decode_operation(bytes(encode_operation(op)))
    # last_committed=0 survives (field 10 is the presence witness)
    assert (dec["last_committed"], dec["sequence_number"]) == (0, 3)
    assert dec["gtid"] == f"{SID[:8]}:3"

    clockless = {"op_type": "gtid", "server_id": 1, "timestamp": 9,
                 "log_pos": 120, "gtid": "x:1"}
    dec2 = decode_operation(bytes(encode_operation(clockless)))
    assert (dec2["last_committed"], dec2["sequence_number"]) == (None, None)


def test_parallel_apply_groups_cohorts(spark):
    from dolphinbeat_spark.envelope import ENVELOPE_SCHEMA, empty_op
    from dolphinbeat_spark.operators.projection import parallel_apply_groups
    from dolphinbeat_spark.sources.binlog_source import _row_tuple

    ops = _clocked_ops()
    rows = [_row_tuple(empty_op(**{k: v for k, v in op.items()
                                   if k in {f.name for f in ENVELOPE_SCHEMA.fields}}))
            for op in ops]
    env = spark.createDataFrame(rows, ENVELOPE_SCHEMA)
    got = {r["gtid"]: (r["apply_group"], r["n_row_ops"])
           for r in parallel_apply_groups(env).collect()}
    assert got == {f"{_uuid()}:1": (1, 1), f"{_uuid()}:2": (1, 1),
                   f"{_uuid()}:3": (2, 1)}


def _uuid() -> str:
    return "-".join(
        SID[a:b] for a, b in ((0, 8), (8, 12), (12, 16), (16, 20), (20, 32))
    )


def test_parallel_apply_schedule_greedy_groups(spark):
    """Full MTS interval rule: groups merge ACROSS group commits when
    lc still precedes the group's first sn; boundary exactly at
    lc == group_start_seq."""
    from dolphinbeat_spark.operators.projection import parallel_apply_schedule

    # (lc, sn): greedy from sn=1 -> group1 {1,2,3} (lc<1), boundary at
    # (1,4) since lc 1 >= start 1 -> group2 {4,5} (lc<4), boundary at
    # (4,6) -> group3 {6}
    trx = [(0, 1), (0, 2), (0, 3), (1, 4), (3, 5), (4, 6)]
    rows = [("commit", "b.1", f"u:{sn}", lc, sn) for lc, sn in trx]
    env = spark.createDataFrame(
        rows,
        "op_type string, log_name string, gtid string, "
        "last_committed long, sequence_number long",
    )
    got = {
        r["sequence_number"]: (r["apply_group"], r["group_start_seq"])
        for r in parallel_apply_schedule(env).collect()
    }
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 1),
                   4: (2, 4), 5: (2, 4), 6: (3, 6)}
