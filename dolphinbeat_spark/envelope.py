"""The change-event envelope: the engine's wire schema.

One generic schema carries every table's changes (the reference's
``Operation`` protobuf, ``sink/kafka/protocol/protocol.proto:119-151``,
re-expressed relationally per FIXTURES.md F5): op_type + source
coordinates + stringly-typed before/after images + null maps + progress.
Typed per-table views are derived by joining the schema registry and
casting (see operators/projection.py) — exactly the reference's
stringify-on-the-wire / re-type-at-the-consumer contract
(``sink/kafka/operation.go:158-178``).
"""

from __future__ import annotations

from pyspark.sql import types as T

OP_TYPES = (
    "rotate",
    "gtid",
    "begin",
    "commit",
    "insert",
    "update",
    "delete",
    "query",
    "ddl",
)

PROGRESS_TYPE = T.StructType(
    [
        T.StructField("flavor", T.StringType()),
        T.StructField("server_id", T.IntegerType()),
        T.StructField("log_name", T.StringType()),
        T.StructField("log_pos", T.LongType()),
        T.StructField("gset", T.StringType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op_type", T.StringType(), False),
        T.StructField("server_id", T.IntegerType()),
        T.StructField("timestamp", T.IntegerType()),
        T.StructField("log_name", T.StringType()),
        T.StructField("log_pos", T.LongType()),
        # deterministic index of the row image WITHIN its RowsEvent —
        # all rows of a multi-row INSERT/UPDATE/DELETE share the
        # event's log_pos, so (log_name, log_pos) alone is not a total
        # order; sinks tiebreak on this (0 for non-row ops)
        T.StructField("row_index", T.IntegerType()),
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("gtid", T.StringType()),
        T.StructField("statement", T.StringType()),
        T.StructField("next_log_name", T.StringType()),
        T.StructField("next_log_pos", T.LongType()),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("before_null", T.MapType(T.StringType(), T.BooleanType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after_null", T.MapType(T.StringType(), T.BooleanType())),
        T.StructField("schema_version", T.LongType()),
        T.StructField("progress", PROGRESS_TYPE),
        # MySQL 5.7+ group-commit logical clock (GTID event bytes 26-41;
        # the reference tracks both, canal/sync.go:144-145, and reserves
        # wire fields 9/10, protocol.proto:137-138). Transactions whose
        # sequence_number intervals share a last_committed watermark
        # committed together on the master and are therefore
        # conflict-free — the enabling primitive for parallel
        # downstream apply (operators/projection.parallel_apply_groups).
        # NULL on feeds without the clock (pre-5.7, MariaDB dialect).
        T.StructField("last_committed", T.LongType()),
        T.StructField("sequence_number", T.LongType()),
    ]
)


def empty_op(**overrides) -> dict:
    """A fully-NULL envelope row; override the fields that apply."""
    base = {f.name: None for f in ENVELOPE_SCHEMA.fields}
    base["row_index"] = 0
    base.update(overrides)
    unknown = set(overrides) - set(base)
    if unknown:
        raise KeyError(f"unknown envelope fields: {unknown}")
    return base


def golden_sequences() -> list[dict]:
    """FIXTURES.md F5 golden op sequences (a)-(g), as envelope rows.

    Used by the fixture source and the streaming tests: trx with rows,
    update with before/after, delete, DDL with progress, empty trx,
    rotate + server-id change, and a duplicated (producer-retry) op.
    """
    pos = [100]

    def nxt(n: int = 20) -> int:
        pos[0] += n
        return pos[0]

    def prog(p: int, server_id: int = 1) -> dict:
        return {
            "flavor": "mysql",
            "server_id": server_id,
            "log_name": "binlog.000001",
            "log_pos": p,
            "gset": f"uuid-1:1-{p // 100}",
        }

    common = dict(server_id=1, log_name="binlog.000001")
    ops: list[dict] = []
    # (a) BEGIN, INSERT x3, COMMIT
    ops.append(empty_op(op_type="begin", log_pos=nxt(), timestamp=1000, **common))
    for i in range(3):
        ops.append(
            empty_op(
                op_type="insert",
                log_pos=nxt(),
                timestamp=1000,
                db="test",
                table="canal_test",
                after={"id": str(i + 1), "name": chr(ord("a") + i), "content": ""},
                after_null={"id": False, "name": False, "content": i == 2},
                schema_version=1,
                **common,
            )
        )
    ops.append(
        empty_op(op_type="commit", log_pos=nxt(), timestamp=1000, gtid="uuid-1:1",
                 progress=prog(pos[0]), **common)
    )
    # (b) BEGIN, UPDATE (before+after), COMMIT
    ops.append(empty_op(op_type="begin", log_pos=nxt(), timestamp=1001, **common))
    ops.append(
        empty_op(
            op_type="update",
            log_pos=nxt(),
            timestamp=1001,
            db="test",
            table="canal_test",
            before={"id": "1", "name": "a", "content": ""},
            before_null={"id": False, "name": False, "content": False},
            after={"id": "1", "name": "a2", "content": ""},
            after_null={"id": False, "name": False, "content": False},
            schema_version=1,
            **common,
        )
    )
    ops.append(
        empty_op(op_type="commit", log_pos=nxt(), timestamp=1001, gtid="uuid-1:2",
                 progress=prog(pos[0]), **common)
    )
    # (c) BEGIN, DELETE, COMMIT
    ops.append(empty_op(op_type="begin", log_pos=nxt(), timestamp=1002, **common))
    ops.append(
        empty_op(
            op_type="delete",
            log_pos=nxt(),
            timestamp=1002,
            db="test",
            table="canal_test",
            before={"id": "2", "name": "b", "content": ""},
            before_null={"id": False, "name": False, "content": False},
            schema_version=1,
            **common,
        )
    )
    ops.append(
        empty_op(op_type="commit", log_pos=nxt(), timestamp=1002, gtid="uuid-1:3",
                 progress=prog(pos[0]), **common)
    )
    # (d) DDL with progress
    ops.append(
        empty_op(
            op_type="ddl",
            log_pos=nxt(),
            timestamp=1003,
            db="test",
            statement="ALTER TABLE test.canal_test ADD age INT NOT NULL AFTER name",
            progress=prog(pos[0]),
            schema_version=2,
            **common,
        )
    )
    # (e) empty trx — offsets must still advance
    ops.append(empty_op(op_type="begin", log_pos=nxt(), timestamp=1004, **common))
    ops.append(
        empty_op(op_type="commit", log_pos=nxt(), timestamp=1004, gtid="uuid-1:4",
                 progress=prog(pos[0]), **common)
    )
    # (f) rotate + server-id change (failover)
    ops.append(
        empty_op(
            op_type="rotate",
            timestamp=1005,
            next_log_name="binlog.000002",
            next_log_pos=4,
            server_id=2,
            log_name="binlog.000001",
            log_pos=pos[0],
        )
    )
    # (g) duplicate op (producer retry) — same coordinates as the (b) update
    dup = dict(next(o for o in ops if o["op_type"] == "update"))
    ops.append(dup)
    return ops
