"""Envelope projections (reference D3/D4/D11/D12).

- ``to_json_ops``: envelope → one JSON document per op (stdout-sink
  shape, ``sink/stdout/operation.go:99-238``).
- ``typed_view``: generic stringly envelope → typed per-table
  DataFrame using the schema registry (the reference's consumers do
  this re-typing from the protobuf string values,
  ``sink/kafka/operation.go:158-178``; unsigned re-widening D4 is in
  the registry's type mapping).
- ``frame_transactions``: stamp/aggregate rows back into transaction
  frames by gtid (reference D5's BEGIN…COMMIT framing as data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dolphinbeat_spark.schema.registry import SchemaRegistry, TableDef


def to_json_ops(df: DataFrame) -> DataFrame:
    """Envelope → (log coordinates, json payload)."""
    payload = F.to_json(
        F.struct(*[F.col(c) for c in df.columns]), {"ignoreNullFields": "true"}
    )
    return df.select(
        "op_type",
        "log_name",
        "log_pos",
        payload.alias("json"),
    )


_DEBEZIUM_OP = {"insert": "c", "update": "u", "delete": "d"}


def _resolved_images() -> dict:
    """NULL-flag resolution shared by every interop exporter: the wire
    images carry (value map, null-flag map) pairs; a flagged column
    becomes a real NULL so it renders as JSON null, not "". One
    definition — the three export formats must never diverge here."""
    return {
        img: F.map_zip_with(
            F.col(img),
            F.col(f"{img}_null"),
            lambda k, v, isn: F.when(F.coalesce(isn, F.lit(False)), F.lit(None)).otherwise(v),
        )
        for img in ("before", "after")
    }


def _changed_old_columns(before_r, after_r):
    """Update-diff rule shared by the Maxwell and Canal exporters: the
    ``old`` image keeps a before-column iff its value differs in the
    after image OR the column is absent from the after image entirely
    (absent counts as changed even when the before value is NULL)."""
    return F.map_filter(
        before_r,
        lambda k, v: ~F.array_contains(F.map_keys(after_r), k)
        | ~v.eqNullSafe(F.element_at(after_r, k)),
    )


def to_debezium_json(envelope: DataFrame, server_name: str = "dolphinbeat") -> DataFrame:
    """Envelope row ops → Debezium-style MySQL change-event payloads —
    the interop bridge: downstream consumers built against Debezium's
    connector (sink frameworks, schema registries, CDC lakehouse
    ingesters) read this topic without a custom decoder.

    Payload shape mirrors Debezium's MySQL envelope: ``op`` (c/u/d),
    ``before``/``after`` images with real JSON nulls for NULL columns
    (resolved through the engine's null-flag maps), and a ``source``
    block carrying the binlog coordinates this engine tracks
    (file/pos/row/server_id/gtid). Map-only Catalyst projection — one
    ``to_json`` per row, no shuffle."""
    null_resolved = _resolved_images()
    op_code = (
        F.when(F.col("op_type") == "insert", "c")
        .when(F.col("op_type") == "update", "u")
        .when(F.col("op_type") == "delete", "d")
    )
    source = F.struct(
        F.lit("mysql").alias("connector"),
        F.lit(server_name).alias("name"),
        F.col("db").alias("db"),
        F.col("table").alias("table"),
        F.col("server_id").cast("long").alias("server_id"),
        F.col("log_name").alias("file"),
        F.col("log_pos").alias("pos"),
        F.coalesce(F.col("row_index"), F.lit(0)).alias("row"),
        F.col("gtid").alias("gtid"),
    )
    payload = F.to_json(
        F.struct(
            null_resolved["before"].alias("before"),
            null_resolved["after"].alias("after"),
            source.alias("source"),
            op_code.alias("op"),
            (F.col("timestamp").cast("long") * 1000).alias("ts_ms"),
        ),
        {"ignoreNullFields": "false"},
    )
    return (
        envelope.filter(F.col("op_type").isin(*_DEBEZIUM_OP))
        .select(
            F.col("db"),
            F.col("table"),
            F.col("log_name"),
            F.col("log_pos"),
            F.coalesce(F.col("row_index"), F.lit(0)).alias("row_index"),
            payload.alias("value"),
        )
    )


def to_maxwell_json(envelope: DataFrame) -> DataFrame:
    """Envelope row ops → Maxwell-format JSON change events (the
    public Zendesk Maxwell daemon wire format) — the second interop
    bridge next to ``to_debezium_json``: consumers built against
    Maxwell's `database/table/type/ts/data/old` payloads read this
    topic unchanged.

    Semantics per the Maxwell spec: ``data`` is the full new row image
    (the old image for deletes); ``old`` appears ONLY on updates and
    holds just the columns whose value changed (a column missing from
    the after image counts as changed). NULL column values are real
    JSON nulls, resolved through the engine's null-flag maps. Omitted
    Maxwell extras (xid/commit flags) need transaction framing — see
    ``frame_transactions``. Map-only Catalyst projection, no shuffle.
    """
    resolved = _resolved_images()
    before_r, after_r = resolved["before"], resolved["after"]
    is_del = F.col("op_type") == "delete"
    is_upd = F.col("op_type") == "update"
    data = F.when(is_del, before_r).otherwise(after_r)
    old = _changed_old_columns(before_r, after_r)
    base = [
        F.col("db").alias("database"),
        F.col("table").alias("table"),
        F.col("op_type").alias("type"),
        F.col("timestamp").cast("long").alias("ts"),
        F.col("gtid").alias("gtid"),
    ]
    render = {"ignoreNullFields": "false"}
    value = F.when(
        is_upd,
        F.to_json(F.struct(*base, data.alias("data"), old.alias("old")), render),
    ).otherwise(F.to_json(F.struct(*base, data.alias("data")), render))
    return envelope.filter(F.col("op_type").isin(*_DEBEZIUM_OP)).select(
        F.col("db"),
        F.col("table"),
        F.col("log_name"),
        F.col("log_pos"),
        F.coalesce(F.col("row_index"), F.lit(0)).alias("row_index"),
        value.alias("value"),
    )


# java.sql.Types constants for Canal's sqlType map (public JDBC spec;
# the mapping mirrors what alibaba/canal's MQ flatMessage emits)
_JDBC_TYPES = (
    ("tinyint", -6), ("smallint", 5), ("mediumint", 4), ("bigint", -5),
    ("int", 4), ("decimal", 3), ("numeric", 3), ("double", 8),
    ("float", 7), ("datetime", 93), ("timestamp", 93), ("date", 91),
    ("time", 92), ("year", 91), ("char", 1), ("varchar", 12),
    ("tinytext", 2005), ("mediumtext", 2005), ("longtext", 2005),
    ("text", 2005), ("tinyblob", 2004), ("mediumblob", 2004),
    ("longblob", 2004), ("blob", 2004), ("varbinary", -3),
    ("binary", -2), ("enum", 4), ("set", -7), ("bit", -7), ("json", 12),
)


def _jdbc_type(mysql_type: str) -> int:
    t = mysql_type.lower()
    for prefix, code in _JDBC_TYPES:
        if t.startswith(prefix):
            return code
    return 12  # VARCHAR fallback, canal's own default


def to_canal_flat_json(envelope: DataFrame, table_def: "TableDef") -> DataFrame:
    """Envelope row ops → Canal flatMessage JSON (the public
    alibaba/canal MQ format) for ONE table — the third interop bridge
    (protobuf wire / Debezium / Maxwell / this): consumers built
    against canal's RocketMQ/Kafka flat messages read the topic
    unchanged.

    flatMessage semantics: one message per BINLOG EVENT, with ``data``
    an array of row images (multi-row events stay batched, ordered by
    row_index), ``old`` an aligned array holding just the changed
    columns per row (updates only), ``pkNames``/``mysqlType``/
    ``sqlType`` from the table definition, ``type`` upper-cased,
    ``es`` the binlog execute time (ms) and ``ts`` pinned to ``es``
    (canal stamps its own sink-time there; a deterministic replay
    cannot). ``id``/``sql`` carry flatMessage's DML constants (0, "").

    Scale shape: one shuffle keyed on the event coordinate
    (log_name, log_pos) to regroup rows into their event — the same
    key the ordered sink already partitions by, so in a pipeline the
    exchange reuses that partitioning; everything else is map-side.
    """
    resolved = _resolved_images()
    before_r, after_r = resolved["before"], resolved["after"]
    is_del = F.col("op_type") == "delete"
    is_upd = F.col("op_type") == "update"
    row_data = F.when(is_del, before_r).otherwise(after_r)
    row_old = F.when(is_upd, _changed_old_columns(before_r, after_r))

    grouped = (
        envelope.filter(F.col("op_type").isin(*_DEBEZIUM_OP))
        .filter((F.col("db") == table_def.database) & (F.col("table") == table_def.name))
        .select(
            "db", "table", "op_type", "log_name", "log_pos", "timestamp",
            F.coalesce(F.col("row_index"), F.lit(0)).alias("row_index"),
            row_data.alias("__data"), row_old.alias("__old"),
        )
        .groupBy("db", "table", "op_type", "log_name", "log_pos")
        .agg(
            F.min("timestamp").alias("timestamp"),
            # explicit comparator: structs holding maps have no natural
            # ordering, but row_index alone is the sort key
            F.array_sort(
                F.collect_list(F.struct("row_index", "__data", "__old")),
                lambda a, b: F.when(a["row_index"] < b["row_index"], -1)
                .when(a["row_index"] > b["row_index"], 1)
                .otherwise(0),
            ).alias("__rows"),
        )
    )
    pk = table_def.primary_key()
    mysql_type = F.create_map(
        *[x for c in table_def.columns for x in (F.lit(c.name), F.lit(c.type))]
    )
    sql_type = F.create_map(
        *[x for c in table_def.columns
          for x in (F.lit(c.name), F.lit(_jdbc_type(c.type)))]
    )
    es = F.col("timestamp").cast("long") * 1000
    payload = F.to_json(
        F.struct(
            F.lit(0).alias("id"),
            F.col("db").alias("database"),
            F.col("table").alias("table"),
            F.array(*[F.lit(p) for p in pk]).alias("pkNames"),
            F.lit(False).alias("isDdl"),
            F.upper("op_type").alias("type"),
            es.alias("es"),
            es.alias("ts"),
            F.lit("").alias("sql"),
            sql_type.alias("sqlType"),
            mysql_type.alias("mysqlType"),
            F.transform(F.col("__rows"), lambda r: r["__data"]).alias("data"),
            F.when(
                F.col("op_type") == "update",
                F.transform(F.col("__rows"), lambda r: r["__old"]),
            ).alias("old"),
        ),
        {"ignoreNullFields": "false"},
    )
    return grouped.select(
        "db", "table", "log_name", "log_pos",
        F.upper("op_type").alias("type"), payload.alias("value"),
    )


def typed_view(
    envelope: DataFrame,
    registry: SchemaRegistry,
    db: str,
    table: str,
    version: int | None = None,
    image: str = "after",
) -> DataFrame:
    """Cast the ``after`` (or ``before``) map into typed columns for
    one table, per the registry's TableDef. NULL-vs-empty-string is
    resolved through the ``{image}_null`` map (reference D12's
    separate null flag)."""
    td = registry.get(db, table, version)
    if td is None:
        raise KeyError(f"no schema for {db}.{table} @ {version}")
    rows = envelope.filter(
        (F.col("db") == db)
        & (F.col("table") == table)
        & F.col("op_type").isin("insert", "update", "delete")
    )
    img, nulls = F.col(image), F.col(f"{image}_null")
    cols = []
    for c in td.columns:
        raw = img.getItem(c.name)
        is_null = F.coalesce(nulls.getItem(c.name), F.lit(False))
        typed = F.when(is_null, F.lit(None)).otherwise(raw).cast(c.spark_field().dataType)
        cols.append(typed.alias(c.name))
    return rows.select(
        F.col("op_type"),
        F.col("log_pos"),
        F.col("schema_version"),
        *cols,
    )


def pair_before_after(envelope: DataFrame, key_cols: list[str]) -> DataFrame:
    """Update ops → (key, changed_fields map) delta records.

    changed = keys of ``after`` whose value (or nullness) differs from
    ``before`` (reference pairs rows positionally, D3; here the images
    are already paired in one op)."""
    upd = envelope.filter(F.col("op_type") == "update")
    changed = F.map_filter(
        F.col("after"),
        lambda k, v: ~(
            F.col("before")[k].eqNullSafe(v)
            & F.coalesce(F.col("before_null")[k], F.lit(False)).eqNullSafe(
                F.coalesce(F.col("after_null")[k], F.lit(False))
            )
        ),
    )
    return upd.select(
        "db",
        "table",
        "log_pos",
        *[F.col("after").getItem(k).alias(k) for k in key_cols],
        changed.alias("changed"),
    )


def frame_transactions(envelope: DataFrame) -> DataFrame:
    """Re-frame row ops into per-transaction records by gtid carry.

    The single ordered stream stamps each row op with the last seen
    BEGIN's coordinates; in batch form we group by the commit gtid
    (rows between BEGIN..COMMIT share the commit's log range).

    Scale: the forward-fill window is partitioned by ``log_name`` — a
    MySQL transaction never spans binlog files (rotation happens only
    at transaction boundaries), so the partition is semantically safe,
    and a binlog file is size-capped (``max_binlog_size``), so each
    window partition is bounded no matter how large the envelope grows.
    The previous formulation windowed the WHOLE envelope into one
    partition (Spark's "No Partition Defined" warning)."""
    w_ops = envelope.filter(F.col("op_type").isin("insert", "update", "delete", "begin", "commit"))
    # forward-fill gtid is a streaming concern; batch fixtures carry
    # gtid on the commit row — associate by per-file log_pos ordering
    from pyspark.sql import Window

    w = (
        Window.partitionBy("log_name")
        .orderBy("log_pos")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    stamped = w_ops.withColumn(
        "trx_gtid", F.first(F.when(F.col("op_type") == "commit", F.col("gtid")), ignorenulls=True).over(w)
    )
    return (
        stamped.filter(F.col("op_type").isin("insert", "update", "delete"))
        .groupBy("trx_gtid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("log_pos").alias("first_pos"),
            F.max("log_pos").alias("last_pos"),
            F.collect_set("op_type").alias("op_types"),
        )
    )


def parallel_apply_groups(envelope: DataFrame) -> DataFrame:
    """Group committed transactions into parallel-apply cohorts from
    the group-commit logical clock (``last_committed`` /
    ``sequence_number``, MySQL 5.7+ GTID events).

    Transactions sharing one ``last_committed`` watermark prepared
    concurrently on the master (for i<j with equal lc:
    lc_j = lc < sn_i, the MTS LOGICAL_CLOCK pairwise rule), so a
    downstream applier can run each cohort's transactions in parallel
    and only barrier BETWEEN cohorts — the reference tracks the clock
    (canal/sync.go:144-145) and reserves wire fields 9/10 for it but
    never acts on it; this closes that loop. Same-lc grouping is the
    conservative subset of the full interval rule (a trx may also
    overlap the NEXT cohort when its sn interval allows); cohorts are
    already the master's real group-commit batches, so the extra
    parallelism forgone is the cross-batch overlap only.

    Returns one row per committed transaction: (log_name, gtid,
    last_committed, sequence_number, n_row_ops, apply_group). Scale:
    one row per TRANSACTION, not per row op — the window partitions by
    log_name (size-capped binlog files) and the per-trx row-op counts
    partial-aggregate map-side before the one keyed shuffle. Clock-less
    feeds (pre-5.7, MariaDB) have NULL sequence_number and are
    excluded: with no clock there is no safe parallelism claim."""
    from pyspark.sql import Window

    commits = envelope.filter(
        (F.col("op_type") == "commit") & F.col("sequence_number").isNotNull()
    ).select("log_name", "gtid", "last_committed", "sequence_number")
    row_ops = (
        envelope.filter(
            F.col("op_type").isin("insert", "update", "delete")
            & F.col("sequence_number").isNotNull()
        )
        .groupBy("log_name", "sequence_number")
        .agg(F.count(F.lit(1)).alias("n_row_ops"))
    )
    w = Window.partitionBy("log_name").orderBy("last_committed")
    return (
        commits.join(row_ops, ["log_name", "sequence_number"], "left")
        .withColumn("n_row_ops", F.coalesce(F.col("n_row_ops"), F.lit(0)))
        .withColumn("apply_group", F.dense_rank().over(w).cast("long"))
    )


def parallel_apply_schedule(envelope: DataFrame) -> DataFrame:
    """The FULL MTS LOGICAL_CLOCK schedule — greedy maximal groups
    under the pairwise rule (trx i<j parallel iff lc_j < sn_i), the
    exact algorithm a MySQL multi-threaded replica coordinator runs.

    :func:`parallel_apply_groups`' same-``last_committed`` cohorts are
    the conservative subset (the master's literal group-commit
    batches); this operator also merges ACROSS group commits whenever
    a later transaction's ``last_committed`` still precedes the
    current group's FIRST ``sequence_number``. Greedy scan in
    sequence-number order: a new group starts at transaction *i* iff
    ``lc_i >= sn_(group start)``. The scan is inherently sequential,
    so it runs as ``applyInPandas`` per ``log_name`` — a binlog file
    is size-capped (``max_binlog_size``), so each pandas group is a
    bounded list of TRANSACTIONS (one row per commit, never per row
    op); files schedule in parallel. Output: one row per committed
    transaction with its ``apply_group`` (1-based per file, in
    sequence order) and the group's anchoring first sequence number.
    Clock-less commits are excluded (no clock, no parallelism claim)."""
    commits = envelope.filter(
        (F.col("op_type") == "commit") & F.col("sequence_number").isNotNull()
    ).select("log_name", "gtid", "last_committed", "sequence_number")

    def sched(pdf):
        pdf = pdf.sort_values("sequence_number").reset_index(drop=True)
        groups, starts = [], []
        grp, start = 0, None
        for lc, sn in zip(pdf["last_committed"], pdf["sequence_number"]):
            if start is None or lc >= start:
                grp += 1
                start = sn
            groups.append(grp)
            starts.append(start)
        pdf["apply_group"] = groups
        pdf["group_start_seq"] = starts
        return pdf

    return commits.groupBy("log_name").applyInPandas(
        sched,
        schema=(
            "log_name string, gtid string, last_committed long, "
            "sequence_number long, apply_group long, group_start_seq long"
        ),
    )
