"""CDC-semantics query plans, batch-checkable against the oracle.

The streaming CDC path is covered by tests (no SQL oracle for a
stream); these specs express the same operator *semantics* —
envelope projection, regex table routing (F1/F2), sequence stamping
(K2), transaction framing (D5), resume dedup (F3), unsigned
re-widening (D4) — as deterministic batch queries over the ``events``
table, so the driver's DuckDB gate covers the CDC operator family too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load, sorted_spread
from dolphinbeat_spark.operators.filters import table_matches
from dolphinbeat_spark.plans.registry import (
    materialize_bounded,
    register,
)

# event_type → op_type mapping used by the synthetic change stream
_OP_CASE_SQL = """CASE event_type
  WHEN 'signup' THEN 'insert' WHEN 'view' THEN 'insert'
  WHEN 'purchase' THEN 'insert' WHEN 'click' THEN 'update'
  WHEN 'error' THEN 'delete' ELSE 'query' END"""


def _op_col():
    return (
        F.when(F.col("event_type").isin("signup", "view", "purchase"), "insert")
        .when(F.col("event_type") == "click", "update")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("query")
    )


def _db_table_cols():
    db = F.concat(F.lit("db"), (F.col("user_id") % 3).cast("string"))
    tbl = F.concat(F.lit("tbl_"), F.col("event_type"))
    return db, tbl


@register(
    "cdc_envelope_from_events",
    oracle=f"""
SELECT event_id,
       {_OP_CASE_SQL} AS op_type,
       concat('db', CAST(user_id % 3 AS VARCHAR)) AS db,
       concat('tbl_', event_type) AS "table",
       concat('{{"event_id":', CAST(event_id AS VARCHAR),
              ',"user_id":', CAST(user_id AS VARCHAR),
              ',"k":', json_extract_string(props, '$.k'), '}}') AS after_json
FROM events
ORDER BY event_id
""",
    tags=("cdc", "envelope"),
    bench=True,
)
def cdc_envelope_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope projection (D11/D12): events reinterpreted as a change
    stream; the after-image serialized as a JSON document built from
    integer fields (engine-portable formatting).

    r16 sort-first (guide §1.4/§2.4; see dedup_minhash_signatures):
    orderBy before the envelope projection so the JSON build
    (get_json_object + concats) runs ONCE above the sort instead of
    twice via range-bounds sampling. Identical rows and order; width
    pinned via sorted_spread (AQE would coalesce a bare orderBy)."""
    e = sorted_spread(load(spark, sf_dir, "events"), "event_id")
    db, tbl = _db_table_cols()
    after_json = F.concat(
        F.lit('{"event_id":'),
        F.col("event_id").cast("string"),
        F.lit(',"user_id":'),
        F.col("user_id").cast("string"),
        F.lit(',"k":'),
        F.get_json_object("props", "$.k"),
        F.lit("}"),
    )
    return e.select(
        "event_id",
        _op_col().alias("op_type"),
        db.alias("db"),
        tbl.alias("table"),
        after_json.alias("after_json"),
    )


@register(
    "cdc_debezium_envelope",
    oracle=f"""
SELECT event_id,
       concat('db', CAST(user_id % 3 AS VARCHAR)) AS db,
       concat('tbl_', event_type) AS "table",
       event_id AS log_pos,
       concat(
         '{{"before":',
         CASE WHEN {_OP_CASE_SQL} = 'insert' THEN 'null'
              ELSE concat('{{"event_id":"', CAST(event_id AS VARCHAR), '"}}') END,
         ',"after":',
         CASE WHEN {_OP_CASE_SQL} = 'delete' THEN 'null'
              ELSE concat('{{"event_id":"', CAST(event_id AS VARCHAR), '","k":',
                          CASE WHEN json_extract_string(props, '$.k') IS NULL
                               THEN 'null'
                               ELSE concat('"', json_extract_string(props, '$.k'), '"') END,
                          '}}') END,
         ',"source":{{"connector":"mysql","name":"dolphinbeat","db":"',
         concat('db', CAST(user_id % 3 AS VARCHAR)),
         '","table":"', concat('tbl_', event_type),
         '","server_id":', CAST(user_id % 5 AS VARCHAR),
         ',"file":"binlog.000001","pos":', CAST(event_id AS VARCHAR),
         ',"row":0,"gtid":null}},"op":"',
         CASE {_OP_CASE_SQL} WHEN 'insert' THEN 'c' WHEN 'update' THEN 'u'
              ELSE 'd' END,
         '","ts_ms":', CAST(event_id * 1000 AS VARCHAR), '}}'
       ) AS value
FROM events
WHERE {_OP_CASE_SQL} IN ('insert', 'update', 'delete')
ORDER BY event_id
""",
    tags=("cdc", "envelope", "interop"),
)
def cdc_debezium_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-interop projection: the synthetic change stream
    rendered as Debezium-style MySQL change-event payloads via the
    REAL operator (operators/projection.py::to_debezium_json) —
    op c/u/d codes, before/after images with true JSON nulls resolved
    through the null-flag maps, and the source block carrying binlog
    coordinates. A consumer built against Debezium's MySQL connector
    reads this topic unchanged. The oracle reconstructs the exact
    payload text, so rendering (null literals, key order, numeric
    form) is pinned cross-engine.

    r17 sort-first (guide §1.4/§2.4 — the same shape as
    cdc_envelope_from_events' r16 fix): sorted_spread by event_id
    BELOW the envelope build, so the map construction + to_json run
    ONCE above the sort instead of twice via the final orderBy's
    range-bounds sampling pass; the op-type filter and projections
    above are order-preserving, so output rows and order are
    identical (oracle order-strict green)."""
    from dolphinbeat_spark.operators.projection import to_debezium_json

    e = sorted_spread(load(spark, sf_dir, "events"), "event_id")
    db, tbl = _db_table_cols()
    k_raw = F.get_json_object("props", "$.k")
    eid_s = F.col("event_id").cast("string")
    is_ins = F.col("op_type") == "insert"
    is_del = F.col("op_type") == "delete"
    env = e.select(
        "event_id",
        _op_col().alias("op_type"),
        db.alias("db"),
        tbl.alias("table"),
        (F.col("user_id") % 5).cast("int").alias("server_id"),
        F.lit("binlog.000001").alias("log_name"),
        F.col("event_id").alias("log_pos"),
        F.lit(0).alias("row_index"),
        F.lit(None).cast("string").alias("gtid"),
        F.col("event_id").cast("int").alias("timestamp"),
        k_raw.alias("__k"),
    ).withColumns(
        {
            "before": F.when(
                ~is_ins, F.create_map(F.lit("event_id"), eid_s)
            ),
            "before_null": F.when(
                ~is_ins, F.create_map(F.lit("event_id"), F.lit(False))
            ),
            "after": F.when(
                ~is_del,
                F.create_map(F.lit("event_id"), eid_s, F.lit("k"), F.col("__k")),
            ),
            "after_null": F.when(
                ~is_del,
                F.create_map(
                    F.lit("event_id"), F.lit(False),
                    F.lit("k"), F.col("__k").isNull(),
                ),
            ),
        }
    )
    dbz = to_debezium_json(env)  # filters to insert/update/delete itself
    return dbz.select(
        F.col("log_pos").alias("event_id"),  # log_pos was set to event_id
        "db", "table", "log_pos", "value",
    )


@register(
    "cdc_route_tables",
    oracle="""
WITH named AS (
  SELECT concat('db', CAST(user_id % 3 AS VARCHAR), '.tbl_', event_type) AS db_table
  FROM events
)
SELECT db_table,
       COUNT(*) AS n_ops,
       CASE WHEN regexp_matches(db_table, '.*\\.tbl_(view|click|purchase)')
                 AND NOT regexp_matches(db_table, 'db2\\..*')
            THEN 1 ELSE 0 END AS routed
FROM named
GROUP BY db_table
ORDER BY db_table
""",
    tags=("cdc", "filter"),
)
def cdc_route_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Include/exclude regex routing (reference F1/F2 semantics:
    search-anywhere matching, include ∧ ¬exclude)."""
    e = load(spark, sf_dir, "events")
    db, tbl = _db_table_cols()
    db_table = F.concat(db, F.lit("."), tbl)
    routed = table_matches(
        db_table, include=[r".*\.tbl_(view|click|purchase)"], exclude=[r"db2\..*"]
    )
    return (
        e.select(db_table.alias("db_table"), routed.alias("r"))
        .groupBy("db_table")
        .agg(F.count(F.lit(1)).alias("n_ops"), F.max(F.when(F.col("r"), 1).otherwise(0)).alias("routed"))
        .orderBy("db_table")
    )


@register(
    "cdc_seq_stamp",
    oracle="""
SELECT event_id,
       ROW_NUMBER() OVER (ORDER BY ts, event_id) AS seq
FROM events
ORDER BY seq
""",
    tags=("cdc", "ordering"),
)
def cdc_seq_stamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 sequence discipline as a query: deterministic global seq in
    (ts, event_id) order. Single-partition window — the same
    order-only-at-the-boundary tradeoff the ordered sink makes
    (SURVEY.md §7.4); upstream stays parallel."""
    e = load(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    return e.select("event_id", F.row_number().over(w).cast("bigint").alias("seq")).orderBy("seq")


@register(
    "cdc_trx_framing",
    oracle="""
SELECT user_id, CAST(date_trunc('minute', ts) AS TIMESTAMP) AS trx_minute,
       COUNT(*) AS n_ops,
       MIN(event_id) AS first_op, MAX(event_id) AS last_op,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS op_types
FROM events
GROUP BY user_id, trx_minute
HAVING COUNT(*) > 1
ORDER BY user_id, trx_minute
""",
    tags=("cdc", "transaction"),
)
def cdc_trx_framing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction framing (D5): ops grouped into per-(user, minute)
    frames with begin/commit coordinates and the op-type set."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.date_trunc("minute", "ts").alias("trx_minute"))
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            F.min("event_id").alias("first_op"),
            F.max("event_id").alias("last_op"),
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("op_types"),
        )
        .filter(F.col("n_ops") > 1)
        .orderBy("user_id", "trx_minute")
    )


@register(
    "cdc_resume_dedup",
    oracle="""
WITH sinks(sink_name, cutoff) AS (
  VALUES ('kafka1', TIMESTAMP '2024-01-20'), ('stdout1', TIMESTAMP '2024-01-10')
)
SELECT s.sink_name, COUNT(*) AS delivered, MIN(e.event_id) AS first_delivered
FROM sinks s JOIN events e ON e.ts > s.cutoff
GROUP BY s.sink_name
ORDER BY s.sink_name
""",
    tags=("cdc", "checkpoint"),
)
def cdc_resume_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume dedup (F3): each sink resumes from its own checkpoint and
    skips events at-or-before it — expressed as a per-sink cutoff join
    (in streaming this is free via per-query checkpoints)."""
    e = load(spark, sf_dir, "events")
    sinks = spark.createDataFrame(
        [("kafka1", "2024-01-20"), ("stdout1", "2024-01-10")], ["sink_name", "cutoff_s"]
    ).select("sink_name", F.col("cutoff_s").cast("timestamp").alias("cutoff"))
    return (
        e.join(F.broadcast(sinks), e.ts > sinks.cutoff)
        .groupBy("sink_name")
        .agg(F.count(F.lit(1)).alias("delivered"), F.min("event_id").alias("first_delivered"))
        .orderBy("sink_name")
    )


@register(
    "cdc_unsigned_rewiden",
    oracle="""
WITH decoded AS (
  SELECT event_id,
         CAST(((CAST(json_extract_string(props, '$.k') AS BIGINT) + 128) % 256) - 128 AS BIGINT) AS signed_byte
  FROM events
)
SELECT event_id, signed_byte,
       CASE WHEN signed_byte < 0 THEN signed_byte + 256 ELSE signed_byte END AS unsigned_byte
FROM decoded
ORDER BY event_id
""",
    tags=("cdc", "types"),
)
def cdc_unsigned_rewiden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsigned re-widening (D4, reference canal/rows.go:58-91): a
    value decoded as signed TINYINT is re-widened to its unsigned
    range by adding 2^8 when negative."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    signed = (((k + 128) % 256) - 128).cast("bigint")
    return e.select(
        "event_id",
        signed.alias("signed_byte"),
        F.when(signed < 0, signed + 256).otherwise(signed).alias("unsigned_byte"),
    ).orderBy("event_id")


def _events_as_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events reinterpreted as an ordered envelope stream for ONE keyed
    table: key = user_id, log coords = (constant file, event_id),
    op_type via the standard mapping, stringly images per D12."""
    e = load(spark, sf_dir, "events")
    img = F.create_map(
        F.lit("user_id"), F.col("user_id").cast("string"),
        F.lit("etype"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    flags = F.create_map(
        F.lit("user_id"), F.lit(False),
        F.lit("etype"), F.lit(False),
        F.lit("k"), F.lit(False),
    )
    op = _op_col()
    null_map = F.lit(None).cast("map<string,string>")
    null_flags = F.lit(None).cast("map<string,boolean>")
    return e.select(
        op.alias("op_type"),
        F.lit("binlog.000001").alias("log_name"),
        F.col("event_id").alias("log_pos"),
        F.when(op.isin("update", "delete"), img).otherwise(null_map).alias("before"),
        F.when(op.isin("update", "delete"), flags).otherwise(null_flags).alias("before_null"),
        F.when(op != "delete", img).otherwise(null_map).alias("after"),
        F.when(op != "delete", flags).otherwise(null_flags).alias("after_null"),
    )


_OPS_CTE = f"""ops AS (
  SELECT user_id, event_id, event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         {_OP_CASE_SQL} AS op_type
  FROM events
)"""


@register(
    "cdc_apply_changes",
    oracle=f"""
WITH {_OPS_CTE},
last AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM ops
)
SELECT user_id, event_type AS etype, k AS k_val
FROM last WHERE rn = 1 AND op_type <> 'delete'
ORDER BY user_id
""",
    tags=("cdc", "apply-changes", "snapshot"),
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply-changes sink's current-state reduction under the
    oracle gate: the REAL operator chain (``sinks/apply_changes.py`` —
    normalize_pk_changes → last_op_per_key → upsert projection) over an
    events-derived envelope; the oracle is DuckDB's window-last-op.
    A key whose terminal op is a delete is absent from the state."""
    from dolphinbeat_spark.sinks.apply_changes import (
        _img_val,
        last_op_per_key,
        normalize_pk_changes,
    )

    env = _events_as_envelope(spark, sf_dir)
    winners = last_op_per_key(normalize_pk_changes(env), ["user_id"])
    return (
        winners.filter(F.col("op_type") != "delete")
        .select(
            F.col("__k_user_id").cast("bigint").alias("user_id"),
            _img_val("after", "etype").alias("etype"),
            _img_val("after", "k").cast("bigint").alias("k_val"),
        )
        .orderBy("user_id")
    )


@register(
    "cdc_scd2",
    oracle=f"""
WITH {_OPS_CTE},
v AS (
  SELECT user_id, op_type, event_type, k,
         event_id AS valid_from_pos,
         LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to_pos
  FROM ops
)
SELECT user_id, event_type AS etype, k AS k_val,
       valid_from_pos, valid_to_pos,
       valid_to_pos IS NULL AS is_current
FROM v WHERE op_type <> 'delete'
ORDER BY user_id, valid_from_pos
""",
    tags=("cdc", "scd2", "history"),
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity ranges under the oracle gate: the REAL
    ``scd2_history`` operator (one row per key-version with
    [valid_from_pos, valid_to_pos) ranges, deletes close ranges and
    emit none) vs DuckDB's per-key LEAD window."""
    from dolphinbeat_spark.sinks.apply_changes import scd2_history

    env = _events_as_envelope(spark, sf_dir)
    hist = scd2_history(env, ["user_id"], ["etype", "k"])
    return hist.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("etype"),
        F.col("k").cast("bigint").alias("k_val"),
        "valid_from_pos",
        "valid_to_pos",
        "is_current",
    ).orderBy("user_id", "valid_from_pos")


@register(
    "cdc_protobuf_roundtrip",
    oracle=f"""
SELECT event_id,
       {_OP_CASE_SQL} AS op_type,
       concat('db', CAST(user_id % 3 AS VARCHAR)) AS db,
       concat('tbl_', event_type) AS "table",
       CAST(user_id AS VARCHAR) AS user_id_str,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
            THEN '' ELSE json_extract_string(props, '$.k') END AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0 AS k_null
FROM events
WHERE event_id % 11 = 0
ORDER BY event_id
""",
    tags=("cdc", "wire", "protobuf"),
)
def cdc_protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K5/K7 protobuf wire codec under the oracle gate: each event
    becomes an envelope op, is serialized to a reference-schema
    protobuf ``Operation`` (sinks/wire_protocol.py — field numbers from
    ``sink/kafka/protocol/protocol.proto:128-151``, stringified values
    + null flags per ``sink/kafka/operation.go:158-178``), decoded
    back, and the DECODED fields are returned. Round-trip is identity,
    so the oracle is the plain projection — any codec defect (tag,
    varint, null flag, column order) breaks the value hash. Arrow-
    batched mapInPandas; encode/decode is embarrassingly parallel."""
    import pandas as pd

    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    db, tbl = _db_table_cols()
    src = e.select(
        "event_id",
        _op_col().alias("op_type"),
        db.alias("db"),
        tbl.alias("table"),
        F.col("user_id").cast("string").alias("user_id_s"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )

    def codec(batches):
        from dolphinbeat_spark.schema.registry import ColumnDef, TableDef
        from dolphinbeat_spark.sinks import wire_protocol as wp

        cols = [
            ColumnDef("event_id", "bigint", key="PRI"),
            ColumnDef("user_id", "bigint"),
            ColumnDef("k", "int"),
        ]
        for pdf in batches:
            out = []
            for r in pdf.to_dict("records"):
                k_null = int(r["k"]) % 7 == 0
                image = {
                    "event_id": str(r["event_id"]),
                    "user_id": r["user_id_s"],
                    "k": "" if k_null else str(r["k"]),
                }
                nulls = {"event_id": False, "user_id": False, "k": k_null}
                side = "before" if r["op_type"] == "delete" else "after"
                row = {
                    "op_type": r["op_type"],
                    "server_id": 1,
                    "log_pos": r["event_id"],
                    f"{side}": image,
                    f"{side}_null": nulls,
                }
                td = TableDef(database=r["db"], name=r["table"], columns=cols)
                op = wp.decode_operation(wp.encode_operation(row, td))
                img = op["rows"][0]["after"] or op["rows"][0]["before"]
                out.append(
                    (
                        op["log_pos"],
                        op["op_type"],
                        op["table"]["database"],
                        op["table"]["name"],
                        img[1]["value"],
                        img[2]["value"],
                        img[2]["is_null"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "event_id", "op_type", "db", "table",
                    "user_id_str", "k_str", "k_null",
                ],
            )

    return src.mapInPandas(
        codec,
        schema="event_id bigint, op_type string, db string, table string, "
        "user_id_str string, k_str string, k_null boolean",
    ).orderBy("event_id")


@register(
    "json_functions_showcase",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_typed,
       json_extract_string(props, '$.k') AS k_string,
       CAST(json_valid(props) AS BOOLEAN) AS is_valid,
       concat('{"event_id":', CAST(event_id AS VARCHAR), ',"k":',
              json_extract_string(props, '$.k'), '}') AS rebuilt
FROM events
WHERE event_id % 97 = 0
ORDER BY event_id
""",
    tags=("json", "semi-structured"),
)
def json_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON function surface: typed extraction via from_json with an
    explicit schema (the scale path — parse once, typed thereafter;
    get_json_object re-parses per call), string extraction, validity
    probing, and a deterministic re-serialization (manual concat:
    to_json key order/whitespace is engine-private)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    parsed = e.withColumn(
        "__p", F.from_json("props", "struct<k:int>")
    )
    return parsed.select(
        "event_id",
        F.col("__p.k").alias("k_typed"),
        F.get_json_object("props", "$.k").alias("k_string"),
        F.col("__p").isNotNull().alias("is_valid"),
        F.concat(
            F.lit('{"event_id":'),
            F.col("event_id").cast("string"),
            F.lit(',"k":'),
            F.get_json_object("props", "$.k"),
            F.lit("}"),
        ).alias("rebuilt"),
    ).orderBy("event_id")


@register(
    "cdc_maxwell_envelope",
    oracle=f"""
SELECT event_id,
       concat('db', CAST(user_id % 3 AS VARCHAR)) AS db,
       concat('tbl_', event_type) AS "table",
       event_id AS log_pos,
       concat(
         '{{"database":"db', CAST(user_id % 3 AS VARCHAR),
         '","table":"tbl_', event_type,
         '","type":"', {_OP_CASE_SQL},
         '","ts":', CAST(event_id AS VARCHAR),
         ',"gtid":null,"data":{{"event_id":"', CAST(event_id AS VARCHAR), '","k":',
         CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 'null'
              WHEN {_OP_CASE_SQL} = 'delete'
                THEN concat('"', json_extract_string(props, '$.k'), '_0"')
              ELSE concat('"', json_extract_string(props, '$.k'), '"') END,
         '}}',
         CASE WHEN {_OP_CASE_SQL} = 'update'
              THEN concat(',"old":{{',
                          CASE WHEN json_extract_string(props, '$.k') IS NULL THEN ''
                               ELSE concat('"k":"', json_extract_string(props, '$.k'), '_0"') END,
                          '}}')
              ELSE '' END,
         '}}'
       ) AS value
FROM events
WHERE {_OP_CASE_SQL} IN ('insert', 'update', 'delete')
ORDER BY event_id
""",
    tags=("cdc", "envelope", "interop", "maxwell"),
)
def cdc_maxwell_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maxwell-interop projection: the synthetic change stream rendered
    as Maxwell-daemon JSON payloads via the REAL operator
    (operators/projection.py::to_maxwell_json) — `data` carries the
    full new image (old image for deletes) with true JSON nulls, and
    updates carry `old` holding ONLY the columns whose value changed
    (here the before image stores k+'_0', so `old` has exactly `k`
    when k is set and is empty when it is NULL — both Maxwell paths
    exercised). The oracle reconstructs the payload text exactly, so
    key order, null literals, and the changed-column diff are pinned
    cross-engine.

    r17 sort-first (guide §1.4/§2.4, same shape as the debezium spec):
    sorted_spread below the envelope build replaces the final orderBy,
    so the map construction + to_json run once instead of twice via
    range-bounds sampling; everything above the sort is
    order-preserving."""
    from dolphinbeat_spark.operators.projection import to_maxwell_json

    e = sorted_spread(load(spark, sf_dir, "events"), "event_id")
    db, tbl = _db_table_cols()
    k_raw = F.get_json_object("props", "$.k")
    k_old = F.concat(k_raw, F.lit("_0"))  # NULL-propagating
    eid_s = F.col("event_id").cast("string")
    is_ins = F.col("op_type") == "insert"
    is_del = F.col("op_type") == "delete"
    env = e.select(
        "event_id",
        _op_col().alias("op_type"),
        db.alias("db"),
        tbl.alias("table"),
        F.lit("binlog.000001").alias("log_name"),
        F.col("event_id").alias("log_pos"),
        F.lit(0).alias("row_index"),
        F.lit(None).cast("string").alias("gtid"),
        F.col("event_id").cast("int").alias("timestamp"),
        k_raw.alias("__k"),
        k_old.alias("__k_old"),
    ).withColumns(
        {
            "before": F.when(
                ~is_ins,
                F.create_map(
                    F.lit("event_id"), eid_s, F.lit("k"), F.col("__k_old")
                ),
            ),
            "before_null": F.when(
                ~is_ins,
                F.create_map(
                    F.lit("event_id"), F.lit(False),
                    F.lit("k"), F.col("__k_old").isNull(),
                ),
            ),
            "after": F.when(
                ~is_del,
                F.create_map(F.lit("event_id"), eid_s, F.lit("k"), F.col("__k")),
            ),
            "after_null": F.when(
                ~is_del,
                F.create_map(
                    F.lit("event_id"), F.lit(False),
                    F.lit("k"), F.col("__k").isNull(),
                ),
            ),
        }
    )
    mxw = to_maxwell_json(env)  # filters to insert/update/delete itself
    return mxw.select(
        F.col("log_pos").alias("event_id"),
        "db", "table", "log_pos", "value",
    )


@register(
    "cdc_canal_flat",
    oracle=f"""
SELECT event_id,
       'db1' AS db, 'tbl_click' AS "table", event_id AS log_pos,
       concat(
         '{{"id":0,"database":"db1","table":"tbl_click",',
         '"pkNames":["event_id"],"isDdl":false,"type":"UPDATE",',
         '"es":', CAST(event_id * 1000 AS VARCHAR),
         ',"ts":', CAST(event_id * 1000 AS VARCHAR),
         ',"sql":"","sqlType":{{"event_id":-5,"k":12}},',
         '"mysqlType":{{"event_id":"bigint","k":"varchar(64)"}},',
         '"data":[{{"event_id":"', CAST(event_id AS VARCHAR), '","k":',
         CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 'null'
              ELSE concat('"', json_extract_string(props, '$.k'), '"') END,
         '}}],"old":[{{',
         CASE WHEN json_extract_string(props, '$.k') IS NULL THEN ''
              ELSE concat('"k":"', json_extract_string(props, '$.k'), '_0"') END,
         '}}]}}'
       ) AS value
FROM events
WHERE event_type = 'click' AND user_id % 3 = 1
ORDER BY event_id
""",
    tags=("cdc", "envelope", "interop", "canal"),
)
def cdc_canal_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canal-flatMessage interop: the db1.tbl_click slice of the
    synthetic change stream rendered as alibaba/canal MQ flat messages
    via the REAL operator (operators/projection.py::
    to_canal_flat_json) — data as a row-image ARRAY per binlog event,
    old aligned per row with only the changed columns, pkNames/
    sqlType/mysqlType from the registry TableDef, type upper-cased,
    ts pinned to es for determinism. The oracle reconstructs the
    payload text exactly. Multi-row event batching is pinned by the
    unit test (the synthetic stream is one row per event).

    r17 (guide §2.4 "two operations keyed the same way share one
    exchange"): the raw events are range-partitioned by event_id
    BELOW the envelope build. The operator's per-event groupBy key
    contains log_pos (= event_id), and RangePartitioning(event_id)
    satisfies the aggregation's ClusteredDistribution through Spark's
    alias-aware output partitioning, so the groupBy inserts NO hash
    exchange — and the contract order needs only a partition-local
    sort instead of a second (range) exchange whose sampling pass
    re-ran the aggregation + JSON render. Plan: 2 Exchange → 1, agg +
    render evaluated once; rows and order proven identical by
    collect() comparison at sf0.1 and the order-strict oracle."""
    from dolphinbeat_spark.operators.projection import to_canal_flat_json
    from dolphinbeat_spark.schema.registry import SchemaRegistry

    reg = SchemaRegistry()
    reg.apply_ddl(
        "CREATE TABLE db1.tbl_click (event_id BIGINT PRIMARY KEY, k VARCHAR(64))"
    )
    td = reg.get("db1", "tbl_click")

    e = load(spark, sf_dir, "events").repartitionByRange(
        spark.sparkContext.defaultParallelism, "event_id"
    )
    db, tbl = _db_table_cols()
    k_raw = F.get_json_object("props", "$.k")
    k_old = F.concat(k_raw, F.lit("_0"))
    eid_s = F.col("event_id").cast("string")
    env = e.select(
        "event_id",
        _op_col().alias("op_type"),
        db.alias("db"),
        tbl.alias("table"),
        F.lit("binlog.000001").alias("log_name"),
        F.col("event_id").alias("log_pos"),
        F.lit(0).alias("row_index"),
        F.col("event_id").cast("int").alias("timestamp"),
        F.create_map(F.lit("event_id"), eid_s, F.lit("k"), k_old).alias("before"),
        F.create_map(
            F.lit("event_id"), F.lit(False), F.lit("k"), k_old.isNull()
        ).alias("before_null"),
        F.create_map(F.lit("event_id"), eid_s, F.lit("k"), k_raw).alias("after"),
        F.create_map(
            F.lit("event_id"), F.lit(False), F.lit("k"), k_raw.isNull()
        ).alias("after_null"),
    )
    out = to_canal_flat_json(env, td)
    return out.select(
        F.col("log_pos").alias("event_id"), "db", "table", "log_pos", "value"
    ).sortWithinPartitions("event_id")


# final-state reconstruction of the synthetic per-user change chains
# (shared by the incremental-agg oracles): a user's row exists iff
# their LAST event is not an error (error = delete, later events
# re-insert), carrying that last event's (etype, k)
_INC_AGG_STATE_CTE = """
WITH seq AS (
  SELECT user_id, event_id, event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
), state AS (
  SELECT user_id, event_type AS etype, k FROM (
    SELECT user_id, event_type, k,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rnd
    FROM seq
  ) WHERE rnd = 1 AND event_type <> 'error'
)
"""

@register(
    "cdc_incremental_agg",
    # the oracle aggregates the FINAL state directly; the engine folds
    # the signed deltas of every change op. Their equality is the
    # incremental-view-maintenance theorem itself: per user the chain
    # +insert(img_1), (-img_{i-1} +img_i)..., [-img_last] telescopes to
    # exactly the user's final contribution
    # AVG and STDDEV are written CLOSED-FORM over exact integer sums on
    # BOTH sides (never AVG()/STDDEV_SAMP(): DuckDB's Welford order
    # differs) — identical IEEE expression trees are bit-identical
    oracle=_INC_AGG_STATE_CTE + """
SELECT etype,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CASE WHEN COUNT(k) = 0 THEN NULL
            ELSE CAST(SUM(k) AS DOUBLE) END AS sum_k,
       CASE WHEN COUNT(k) = 0 THEN NULL
            ELSE CAST(SUM(k) AS DOUBLE) / COUNT(k) END AS avg_k,
       CASE WHEN COUNT(k) < 2 THEN NULL
            ELSE SQRT(GREATEST(0.0,
              (CAST(SUM(k * k) AS DOUBLE)
               - CAST(SUM(k) AS DOUBLE) * CAST(SUM(k) AS DOUBLE) / COUNT(k))
              / (COUNT(k) - 1))) END AS std_k
FROM state GROUP BY etype ORDER BY etype
""",
    tags=("cdc", "incremental-view", "delta-algebra"),
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance under the oracle gate: the
    synthetic per-user event chains become a WELL-FORMED change stream
    (first event = insert, later events = update carrying the true
    before-image, 'error' = delete, nothing after a delete), and the
    REAL delta pipeline (sinks/incremental_agg.py::delta_frame — the
    single-batch case of merge_agg_batch) folds the +/- contributions,
    now including the sum-of-squares moment that derives AVG and sample
    STDDEV (r6 VERDICT #6). The oracle computes GROUP BY over the final
    state instead; equality is what 'maintained without recompute'
    means."""
    from dolphinbeat_spark.sinks.incremental_agg import AggViewSpec, delta_frame

    env = _event_change_stream(spark, sf_dir)
    view = AggViewSpec(group_cols=("etype",), sum_cols=("k",), avg_cols=("k",))
    deltas = delta_frame(env, view).filter(F.col("n_delta") != 0)
    nn, s, sq = F.col("nn_k"), F.col("sum_k"), F.col("sq_k")
    return deltas.select(
        "etype",
        F.col("n_delta").alias("n_rows"),
        F.when(nn > 0, s).otherwise(F.lit(None).cast("double")).alias("sum_k"),
        F.when(nn > 0, s / nn).otherwise(F.lit(None).cast("double")).alias("avg_k"),
        F.when(
            nn > 1,
            F.sqrt(F.greatest(F.lit(0.0), (sq - s * s / nn) / (nn - F.lit(1)))),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("std_k"),
    ).orderBy("etype")


def _event_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic per-user event chains as a well-formed CDC
    envelope stream, shared by the incremental-agg specs: an 'error'
    event DELETES the user's row and later events RE-INSERT it (the
    realistic PK delete + re-insert lifecycle), so within each error-
    delimited segment the first event is an insert, later ones are
    updates carrying the true before-image, and the error is a delete
    of the segment's last image. log_pos = event_id.

    (The original formulation dropped everything after a user's first
    error — but every synthetic user errors eventually, which made the
    final state EMPTY at every SF and the oracle comparison vacuously
    0 = 0 rows. Segmented semantics keep ~1/5 of users live at the
    end, so the maintained aggregates are compared on real groups.)"""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    wf = Window.partitionBy("user_id").orderBy("event_id")
    is_err = F.col("event_type") == "error"
    # segment index = number of STRICTLY preceding errors: the error
    # event itself still belongs to the segment it terminates
    seg = F.coalesce(
        F.sum(F.when(is_err, 1).otherwise(0)).over(
            wf.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    k_raw = F.get_json_object("props", "$.k")
    img = F.create_map(
        F.lit("user_id"), F.col("user_id").cast("string"),
        F.lit("etype"), F.col("event_type"),
        F.lit("k"), F.coalesce(k_raw, F.lit("")),
    )
    flags = F.create_map(
        F.lit("user_id"), F.lit(False),
        F.lit("etype"), F.lit(False),
        F.lit("k"), k_raw.isNull(),
    )
    wseg = Window.partitionBy("user_id", "__seg").orderBy("event_id")
    seq = e.withColumn("__seg", seg).select(
        "user_id", "event_id", "event_type",
        img.alias("__img"), flags.alias("__flags"),
        F.row_number().over(wseg).alias("__rn"),
        F.lag(img.alias("x")).over(wseg).alias("__lag_img"),
        F.lag(flags.alias("y")).over(wseg).alias("__lag_flags"),
    )
    op = (
        F.when(is_err, F.lit("delete"))
        .when(F.col("__rn") == 1, F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    null_map = F.lit(None).cast("map<string,string>")
    null_flags = F.lit(None).cast("map<string,boolean>")
    return (
        # an error opening a segment (consecutive errors, or a user
        # whose first event is an error) deletes a row that does not
        # exist: skip, keeping the stream well-formed
        seq.filter(~((F.col("__rn") == 1) & is_err)).select(
            op.alias("op_type"),
            F.lit("binlog.000001").alias("log_name"),
            F.col("event_id").alias("log_pos"),
            F.lit(0).alias("row_index"),
            F.when(op != "insert", F.col("__lag_img")).otherwise(null_map).alias("before"),
            F.when(op != "insert", F.col("__lag_flags")).otherwise(null_flags).alias("before_null"),
            F.when(op != "delete", F.col("__img")).otherwise(null_map).alias("after"),
            F.when(op != "delete", F.col("__flags")).otherwise(null_flags).alias("after_null"),
        )
    )


def _base_as_of(env: DataFrame, hi: int) -> DataFrame:
    """The base table after applying every change op with
    log_pos <= ``hi``: each user's last op decides existence (delete →
    gone) and the surviving after-image supplies (etype, k) — what an
    apply_changes snapshot would hold at that point. Supplied to the
    MIN/MAX merge as its recompute source."""
    from pyspark.sql import Window

    pref = env.filter(F.col("log_pos") <= hi)
    uid = F.coalesce(F.col("after")["user_id"], F.col("before")["user_id"])
    w = Window.partitionBy("__uid").orderBy(F.desc("log_pos"))
    last = (
        pref.withColumn("__uid", uid)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op_type") != "delete"))
    )
    return last.select(
        F.col("after")["etype"].alias("etype"),
        F.when(
            ~F.col("after_null")["k"], F.col("after")["k"].cast("double")
        ).alias("k"),
    )


@register(
    "cdc_incremental_agg_minmax",
    # same final-state oracle, extended with MIN/MAX — the aggregates
    # that are NOT self-maintainable under deletes. The engine side
    # runs the REAL persistent sink across three sequential batches
    # (stored parquet state, replay markers, crash-safe swaps), with
    # extremum retractions recomputing only the touched groups from the
    # post-batch base table; equality with a direct GROUP BY over the
    # final state is the correctness claim of hybrid maintenance.
    oracle=_INC_AGG_STATE_CTE + """
SELECT etype,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CASE WHEN COUNT(k) = 0 THEN NULL
            ELSE CAST(SUM(k) AS DOUBLE) END AS sum_k,
       CAST(MIN(k) AS DOUBLE) AS min_k,
       CAST(MAX(k) AS DOUBLE) AS max_k
FROM state GROUP BY etype ORDER BY etype
""",
    tags=("cdc", "incremental-view", "delta-algebra", "minmax"),
)
def cdc_incremental_agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX incremental maintenance end to end (closes the r5
    documented absence): the change stream splits into three log_pos
    ranges and each folds through merge_agg_batch into one on-disk
    view — COUNT/SUM as pure deltas, MIN/MAX hybrid with
    recompute-on-retraction against the post-batch base
    (sinks/incremental_agg.py::_resolve_extrema documents the exact
    predicate). The bounded driver-side collect materializes the final
    small view so the temp state can be removed before returning."""
    import os as _os
    import shutil
    import tempfile

    from dolphinbeat_spark.sinks.incremental_agg import (
        AggViewSpec,
        merge_agg_batch,
        read_agg_view,
    )

    env = _event_change_stream(spark, sf_dir)
    view = AggViewSpec(
        group_cols=("etype",), sum_cols=("k",), min_cols=("k",), max_cols=("k",)
    )
    hi = env.agg(F.max("log_pos")).first()[0] or 0
    # lower bound -1: batch filters are (lo, hi] and a change op can
    # legitimately sit at log_pos 0 (first synthetic event) — an
    # exclusive 0 bound would silently drop it from every batch
    cuts = [-1, hi // 3, 2 * hi // 3, hi]
    work = tempfile.mkdtemp(prefix="cdc_aggmm_")
    vp = _os.path.join(work, "view")
    try:
        for i in range(3):
            batch = env.filter(
                (F.col("log_pos") > cuts[i]) & (F.col("log_pos") <= cuts[i + 1])
            )
            merge_agg_batch(
                batch, vp, view, batch_id=i, base=_base_as_of(env, cuts[i + 1])
            )
        out = read_agg_view(spark, vp, view)
        out = materialize_bounded(out)  # pin before the dir vanishes
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out.orderBy("etype")


# --- recorded-binlog type tail (S4 file parser: ENUM/SET/BIT/GEOMETRY,
# WL#10570 partial JSON) -----------------------------------------------------

# SRID 0 + WKB POINT(1.5, -2.25) — the geometry bytes recorded in the
# committed fixture, pinned as hex so the stringly wire value (latin-1
# preserved bytes) compares cleanly cross-engine
_GEO_HEX = "000000000101000000000000000000F83F00000000000002C0"

_TAILS_ORACLE = f"""
SELECT * FROM (VALUES
  ('insert', 1, 'active', 'a,c',     '683',  '{_GEO_HEX}', '"hello jsonb"'),
  ('insert', 2, '',       '',        '0',    '',           '"hello jsonb"'),
  ('insert', 3, NULL,     NULL,      NULL,   NULL,         NULL),
  ('update', 1, 'closed', 'a,c',     '683',  '{_GEO_HEX}',
   '{{"$json_diff":[{{"op":"replace","path":"$.k","value":"patched"}},{{"op":"remove","path":"$.old"}}]}}'),
  ('update', 2, 'new',    'a,b,c,d', '1023', '',           '"hello jsonb"')
) AS t(op_type, id, status, flags, mask, geo_hex, doc)
ORDER BY id, op_type
"""


@register(
    "cdc_binlog_enum_set",
    oracle=_TAILS_ORACLE,
    tags=("cdc", "binlog-file", "type-tail"),
)
def cdc_binlog_enum_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r7 binlog-file type tail under the oracle gate: the REAL
    from-scratch parser (sources/binlog_file.py) decodes the committed
    recorded-bytes fixture — ENUM index→label via the registry's column
    definition, SET bitmask→members in definition order, BIT big-endian
    over its meta width, GEOMETRY as raw SRID+WKB passthrough (pinned
    as hex), and a WL#10570 PARTIAL_UPDATE_ROWS event whose PARTIAL_JSON
    row surfaces {"$json_diff": [...]} while its value_options=0 row
    decodes as a plain full image. The oracle is the independently
    written expected relation for the fixture (reference type inventory:
    schema/definition.go:40,44-45,52)."""
    from pathlib import Path

    from dolphinbeat_spark.sources.binlog_file import read_binlog_files

    fixture = (
        Path(__file__).resolve().parents[2] / "tests" / "fixtures" / "replay.binlog"
    )
    env = read_binlog_files(spark, str(fixture))

    def col(name):
        return F.when(F.col("after_null")[name], F.lit(None)).otherwise(
            F.col("after")[name]
        )

    return (
        env.filter(
            (F.col("table") == "tails") & F.col("op_type").isin("insert", "update")
        )
        .select(
            "op_type",
            F.col("after")["id"].cast("int").alias("id"),
            col("status").alias("status"),
            col("flags").alias("flags"),
            col("mask").alias("mask"),
            F.when(F.col("after_null")["geo"], F.lit(None))
            .otherwise(F.hex(F.encode(F.col("after")["geo"], "ISO-8859-1")))
            .alias("geo_hex"),
            col("doc").alias("doc"),
        )
        .orderBy("id", "op_type")
    )


@register(
    "cdc_incremental_agg_distinct",
    # final-state oracle for the LAST non-self-maintainable aggregate a
    # CDC-maintained dashboard needs: COUNT(DISTINCT k) under deletes.
    # The engine maintains a level-2 (group, value) multiplicity view
    # (a value leaves the distinct set only when its last copy
    # retracts); equality with a direct COUNT(DISTINCT) over the final
    # state is the two-level-view correctness claim (r6 VERDICT #4)
    oracle=_INC_AGG_STATE_CTE + """
SELECT etype,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS distinct_k
FROM state GROUP BY etype ORDER BY etype
""",
    tags=("cdc", "incremental-view", "delta-algebra", "distinct"),
)
def cdc_incremental_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) incremental maintenance end to end through the
    REAL persistent sink across three sequential batches (stored
    parquet state, replay markers, crash-safe swaps): each batch's
    signed deltas fold into the main view AND the per-(group, value)
    level-2 view (sinks/incremental_agg.py::AggViewSpec.distinct_cols);
    the reader counts live non-null values. The bounded driver-side
    collect materializes the final small view so the temp state can be
    removed before returning."""
    import os as _os
    import shutil
    import tempfile

    from dolphinbeat_spark.sinks.incremental_agg import (
        AggViewSpec,
        merge_agg_batch,
        read_agg_view,
    )

    env = _event_change_stream(spark, sf_dir)
    view = AggViewSpec(group_cols=("etype",), distinct_cols=("k",))
    hi = env.agg(F.max("log_pos")).first()[0] or 0
    # lower bound -1: batch filters are (lo, hi] and a change op can
    # legitimately sit at log_pos 0 (first synthetic event) — an
    # exclusive 0 bound would silently drop it from every batch
    cuts = [-1, hi // 3, 2 * hi // 3, hi]
    work = tempfile.mkdtemp(prefix="cdc_aggdc_")
    vp = _os.path.join(work, "view")
    try:
        for i in range(3):
            batch = env.filter(
                (F.col("log_pos") > cuts[i]) & (F.col("log_pos") <= cuts[i + 1])
            )
            merge_agg_batch(batch, vp, view, batch_id=i)
        out = read_agg_view(spark, vp, view)
        out = out.select(
            "etype", "n_rows", F.col("distinct_k").cast("bigint").alias("distinct_k")
        )
        out = materialize_bounded(out)  # pin before the dir vanishes
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out.orderBy("etype")


@register(
    "cdc_partial_json_materialize",
    # every user's doc starts {"k": first_k} and each later event
    # arrives as a WL#10570 partial diff replacing $.k — the maintained
    # snapshot must hold the MATERIALIZED document, so the oracle is
    # simply the last k rendered into the compact JSON text
    oracle="""
WITH seq AS (
  SELECT user_id, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rnd
  FROM events
)
SELECT user_id,
       concat('{"k":', COALESCE(CAST(k AS VARCHAR), 'null'), '}') AS doc
FROM seq WHERE rnd = 1
ORDER BY user_id
""",
    tags=("cdc", "partial-json", "apply-changes"),
)
def cdc_partial_json_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL_JSON consumer semantics under the oracle gate: the
    synthetic per-user chains become a change stream whose UPDATE
    after-images carry {"$json_diff": [...]} documents (replace $.k),
    split into three sequential batches through the REAL apply-changes
    sink with patch_json_cols — later diffs patch the snapshot's
    stored document (operators/json_patch.py), chaining across AND
    within batches. Equality with the last-k reconstruction is the
    materialization claim."""
    import os as _os
    import shutil
    import tempfile

    from pyspark.sql import Window as W

    from dolphinbeat_spark.sinks.apply_changes import apply_batch, read_snapshot

    e = load(spark, sf_dir, "events")
    wf = W.partitionBy("user_id").orderBy("event_id")
    k_raw = F.get_json_object("props", "$.k")  # JSON number text or null
    k_json = F.coalesce(k_raw, F.lit("null"))
    first = F.row_number().over(wf) == 1
    doc = F.when(
        first, F.concat(F.lit('{"k":'), k_json, F.lit("}"))
    ).otherwise(
        F.concat(
            F.lit('{"$json_diff":[{"op":"replace","path":"$.k","value":'),
            k_json,
            F.lit("}]}"),
        )
    )
    uid = F.col("user_id").cast("string")
    img = F.create_map(F.lit("user_id"), uid, F.lit("doc"), doc)
    flags = F.create_map(F.lit("user_id"), F.lit(False), F.lit("doc"), F.lit(False))
    null_map = F.lit(None).cast("map<string,string>")
    null_flags = F.lit(None).cast("map<string,boolean>")
    env = e.select(
        F.when(first, F.lit("insert")).otherwise(F.lit("update")).alias("op_type"),
        F.lit("binlog.000001").alias("log_name"),
        F.col("event_id").alias("log_pos"),
        F.lit(0).alias("row_index"),
        F.when(~first, F.create_map(F.lit("user_id"), uid)).otherwise(null_map).alias("before"),
        F.when(~first, F.create_map(F.lit("user_id"), F.lit(False))).otherwise(null_flags).alias("before_null"),
        img.alias("after"),
        flags.alias("after_null"),
    )
    hi = env.agg(F.max("log_pos")).first()[0] or 0
    # lower bound -1: batch filters are (lo, hi] and a change op can
    # legitimately sit at log_pos 0 (first synthetic event) — an
    # exclusive 0 bound would silently drop it from every batch
    cuts = [-1, hi // 3, 2 * hi // 3, hi]
    work = tempfile.mkdtemp(prefix="cdc_pjson_")
    snap = _os.path.join(work, "snap")
    try:
        for i in range(3):
            batch = env.filter(
                (F.col("log_pos") > cuts[i]) & (F.col("log_pos") <= cuts[i + 1])
            )
            apply_batch(spark, batch, snap, ["user_id"], ["doc"],
                        patch_json_cols=("doc",))
        out = read_snapshot(spark, snap).select(
            F.col("user_id").cast("bigint").alias("user_id"), "doc"
        )
        out = materialize_bounded(out)  # pin before the dir vanishes
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out.orderBy("user_id")


_MINIMAL_ORACLE = """
SELECT * FROM (VALUES
  ('insert', 1, '',            'bal,id,memo,name', 'alice',  '10.50', 'm1'),
  ('update', 1, 'id',          'bal,id',           NULL,     '99.25', NULL),
  ('delete', 2, 'id',          '',                 NULL,     NULL,    NULL),
  ('insert', 2, '',            'bal,id,memo,name', 'bob',    '0.00',  'm2'),
  ('update', 2, 'bal,id,name', 'bal,id,name',      'robert', '0.00',  NULL),
  ('insert', 3, '',            'bal,id,memo,name', NULL,     '1.00',  '')
) AS t(op_type, id, before_cols, after_cols, name, bal, memo)
ORDER BY id, op_type
"""


@register(
    "cdc_binlog_minimal_image",
    oracle=_MINIMAL_ORACLE,
    tags=("cdc", "binlog-file", "row-image"),
)
def cdc_binlog_minimal_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binlog_row_image=MINIMAL/NOBLOB decode under the oracle gate
    (VERDICT r7 #2): the from-scratch parser indexes row values by the
    columns-present bitmap (null bitmap covers only PRESENT columns,
    go-mysql rows.go contract) instead of positionally over the
    TABLE_MAP width. Absent columns are OMITTED from the envelope's
    before/after maps — distinct from present-and-NULL, which stays in
    the map with its null flag (row 3's name pins the difference).
    MINIMAL: update/delete before = PK only, update after = PK +
    changed; NOBLOB: unchanged blobs dropped. The oracle is the
    independently written expected relation for the committed
    recorded-bytes fixture (tests/fixtures/minimal.binlog)."""
    from pathlib import Path

    from dolphinbeat_spark.sources.binlog_file import read_binlog_files

    fixture = (
        Path(__file__).resolve().parents[2] / "tests" / "fixtures" / "minimal.binlog"
    )
    env = read_binlog_files(spark, str(fixture))

    def val(image, name):
        return F.when(
            F.coalesce(F.col(f"{image}_null")[name], F.lit(False)),
            F.lit(None),
        ).otherwise(F.col(image)[name])

    def cols_of(image):
        return F.coalesce(
            F.array_join(F.array_sort(F.map_keys(F.col(image))), ","),
            F.lit(""),
        )

    return (
        env.filter(F.col("op_type").isin("insert", "update", "delete"))
        .select(
            "op_type",
            F.coalesce(F.col("after")["id"], F.col("before")["id"])
            .cast("int")
            .alias("id"),
            cols_of("before").alias("before_cols"),
            cols_of("after").alias("after_cols"),
            val("after", "name").alias("name"),
            val("after", "bal").alias("bal"),
            val("after", "memo").alias("memo"),
        )
        .orderBy("id", "op_type")
    )


@register(
    "cdc_parallel_apply_groups",
    oracle="""
WITH trx AS (
  SELECT event_id // 5 AS t, COUNT(*) AS n_row_ops
  FROM events GROUP BY event_id // 5
)
SELECT 'binlog.000001' AS log_name,
       'uuid-1:' || CAST(t + 1 AS VARCHAR) AS gtid,
       (t // 4) * 4 AS last_committed,
       t + 1 AS sequence_number,
       n_row_ops,
       DENSE_RANK() OVER (ORDER BY (t // 4) * 4) AS apply_group
FROM trx
ORDER BY sequence_number
""",
    tags=("cdc", "logical-clock", "parallel-apply"),
)
def cdc_parallel_apply_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-commit logical-clock cohorts under the oracle gate
    (VERDICT r9 #3): events reinterpreted as transactions of 5 row ops
    (trx id = event_id DIV 5) whose GTID events carry sequence_number
    = trx+1 and last_committed = the 4-trx group-commit watermark;
    the REAL ``parallel_apply_groups`` operator assigns each committed
    transaction its parallel-apply cohort and row-op count. The oracle
    replays the same clock synthesis with a DENSE_RANK window. The
    clock itself is decoded from GTID event bytes 26-41
    (sources/binlog_file.py EV_GTID) and carried on every envelope op;
    wire fields 9/10 round-trip it (sinks/wire_protocol.py) — the
    fields the reference reserves (protocol.proto:137-138) but never
    populates (operation.go:93-99)."""
    from dolphinbeat_spark.operators.projection import parallel_apply_groups

    e = load(spark, sf_dir, "events")
    t = F.floor(F.col("event_id") / 5).cast("long")
    lc = (F.floor(t / 4) * 4).cast("long")
    null_s = F.lit(None).cast("string")
    row_ops = e.select(
        F.lit("insert").alias("op_type"),
        F.lit("binlog.000001").alias("log_name"),
        null_s.alias("gtid"),
        lc.alias("last_committed"),
        (t + 1).alias("sequence_number"),
    )
    commits = (
        e.groupBy(t.alias("t"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("commit").alias("op_type"),
            F.lit("binlog.000001").alias("log_name"),
            F.concat(F.lit("uuid-1:"), (F.col("t") + 1).cast("string")).alias("gtid"),
            (F.floor(F.col("t") / 4) * 4).cast("long").alias("last_committed"),
            (F.col("t") + 1).alias("sequence_number"),
        )
    )
    env = row_ops.unionByName(commits)
    return parallel_apply_groups(env).select(
        "log_name", "gtid", "last_committed", "sequence_number",
        "n_row_ops", "apply_group",
    ).orderBy("sequence_number")


@register(
    "cdc_parallel_apply_schedule",
    oracle="""
WITH RECURSIVE trx AS (
  SELECT event_id // 5 AS t FROM events GROUP BY 1
), c AS (
  SELECT t + 1 AS sn, GREATEST(0, t - ((t * 7) % 5)) AS lc,
         ROW_NUMBER() OVER (ORDER BY t) AS rn
  FROM trx
), g AS (
  SELECT rn, sn, lc, CAST(1 AS BIGINT) AS apply_group, sn AS group_start_seq
  FROM c WHERE rn = 1
  UNION ALL
  SELECT c.rn, c.sn, c.lc,
         CASE WHEN c.lc >= g.group_start_seq THEN g.apply_group + 1
              ELSE g.apply_group END,
         CASE WHEN c.lc >= g.group_start_seq THEN c.sn
              ELSE g.group_start_seq END
  FROM c JOIN g ON c.rn = g.rn + 1
)
SELECT 'binlog.000001' AS log_name,
       'uuid-1:' || CAST(sn AS VARCHAR) AS gtid,
       lc AS last_committed, sn AS sequence_number,
       apply_group, group_start_seq
FROM g ORDER BY sequence_number
""",
    tags=("cdc", "logical-clock", "parallel-apply"),
)
def cdc_parallel_apply_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL MTS LOGICAL_CLOCK greedy schedule under the oracle
    gate: events → transactions (trx = event_id DIV 5) with a sliding
    synthetic clock (sn = t+1, lc = max(0, t - (7t mod 5)) — groups of
    varying width that also merge ACROSS group commits), scheduled by
    the REAL ``parallel_apply_schedule`` operator (sequential greedy
    scan per binlog file via applyInPandas; a new group starts when
    lc >= the group's first sequence number). The oracle replays the
    same scan with a recursive CTE. Complements
    cdc_parallel_apply_groups' conservative same-lc cohorts with the
    exact replica-coordinator rule."""
    from dolphinbeat_spark.operators.projection import parallel_apply_schedule

    e = load(spark, sf_dir, "events")
    t = F.floor(F.col("event_id") / 5).cast("long")
    env = (
        e.groupBy(t.alias("t"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("commit").alias("op_type"),
            F.lit("binlog.000001").alias("log_name"),
            F.concat(F.lit("uuid-1:"), (F.col("t") + 1).cast("string")).alias("gtid"),
            F.greatest(
                F.lit(0).cast("long"),
                (F.col("t") - ((F.col("t") * 7) % 5)).cast("long"),
            ).alias("last_committed"),
            (F.col("t") + 1).alias("sequence_number"),
        )
    )
    return parallel_apply_schedule(env).orderBy("sequence_number")


@register(
    "cdc_apply_minimal_image",
    oracle="""
SELECT * FROM (VALUES
  (1, 'alice', '99.25', 'm1'),
  (3, CAST(NULL AS VARCHAR), '1.00', '')
) AS t(id, name, bal, memo)
ORDER BY id
""",
    tags=("cdc", "apply-changes", "row-image"),
)
def cdc_apply_minimal_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINIMAL after-image APPLY under the oracle gate (VERDICT r8 #4):
    the real snapshot sink (``apply_batch(row_image="minimal")``) over
    the decode output of the recorded MINIMAL/NOBLOB archive
    (tests/fixtures/minimal.binlog), split into three batches at
    log-pos thirds so absent columns must coalesce ACROSS batches from
    the parquet snapshot (id=1's name/memo arrive in batch 1; its
    MINIMAL update — after = PK + bal only — lands in a later batch).
    A column carried present-and-NULL stays NULL (id=3's name); the
    terminal delete removes id=2. The oracle is the independently
    written expected final relation."""
    import os as _os
    import shutil
    import tempfile
    from pathlib import Path

    from dolphinbeat_spark.sinks.apply_changes import apply_batch, read_snapshot
    from dolphinbeat_spark.sources.binlog_file import read_binlog_files

    fixture = (
        Path(__file__).resolve().parents[2] / "tests" / "fixtures" / "minimal.binlog"
    )
    env = read_binlog_files(spark, str(fixture)).filter(
        F.col("op_type").isin("insert", "update", "delete")
    )
    hi = env.agg(F.max("log_pos")).first()[0] or 0
    cuts = [-1, hi // 3, 2 * hi // 3, hi]
    work = tempfile.mkdtemp(prefix="cdc_minimal_apply_")
    snap = _os.path.join(work, "snap")
    try:
        for i in range(3):
            batch = env.filter(
                (F.col("log_pos") > cuts[i]) & (F.col("log_pos") <= cuts[i + 1])
            )
            apply_batch(spark, batch, snap, ["id"], ["name", "bal", "memo"],
                        row_image="minimal")
        out = read_snapshot(spark, snap).select(
            F.col("id").cast("int").alias("id"), "name", "bal", "memo"
        )
        out = materialize_bounded(out)  # pin before the dir vanishes
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out.orderBy("id")


@register(
    "cdc_binlog_zstd_payload",
    # the committed fixture's TRANSACTION_PAYLOAD is a REAL zstd frame
    # (CLI-compressed at fixture-build time) wrapping CREATE TABLE +
    # 40 formulaic inserts; the oracle regenerates the expected
    # relation from the same formula
    oracle="""
SELECT 'insert' AS op_type,
       CAST(i AS INTEGER) AS id,
       printf('server-%03d.dc1.example.com', i) AS host,
       CAST(i * 10 + 5 AS BIGINT) AS val
FROM range(40) t(i)
ORDER BY id
""",
    tags=("cdc", "binlog-file", "compression", "zstd"),
)
def cdc_binlog_zstd_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binlog_transaction_compression=zstd decode under the oracle
    gate: the archive's compressed transaction decodes through the
    from-scratch RFC 8878 zstd decoder (operators/zstd_frame.py —
    previously a named refusal; the reference gets zstd from a Go
    library). The inner events — DDL replayed into the schema
    registry for real column names, then 40 typed inserts — must
    match the oracle's regenerated relation exactly."""
    from pathlib import Path

    from dolphinbeat_spark.sources.binlog_file import read_binlog_files

    fixture = (
        Path(__file__).resolve().parents[2]
        / "tests" / "fixtures" / "zstd_payload.binlog"
    )
    env = read_binlog_files(spark, str(fixture))
    return (
        env.filter(F.col("op_type") == "insert")
        .select(
            "op_type",
            F.col("after")["id"].cast("int").alias("id"),
            F.col("after")["host"].alias("host"),
            F.col("after")["val"].cast("bigint").alias("val"),
        )
        .orderBy("id")
    )
