"""Apply-changes sink: materialize a CDC envelope stream into a
current-state table (the canonical CDC consumer).

The reference ships changes to Kafka and leaves state reconstruction
to consumers (``sink/kafka/client/go/decoder.go`` — decode only, no
apply). This operator closes that loop Spark-side: given ordered
insert/update/delete ops for one table, maintain a keyed snapshot:

- per micro-batch, reduce each key to its LAST op (by log coords:
  within one batch an insert followed by update collapses to the
  final image; a trailing delete wins)
- merge with the existing snapshot: delete removes, insert/update
  upserts the after-image

Storage here is plain parquet rewritten per batch (the only atomic
primitive the bare filesystem gives). At 100 TB you'd swap the
``_merge_write`` for a Delta/Iceberg MERGE INTO and keep the same
per-batch last-op reduction; the reduction is the scalable part —
it shuffles each batch once by key, never the snapshot by row count
(the join against the snapshot is keyed, prunable, and with a
partitioned snapshot only touched partitions rewrite).

Streaming entry: ``apply_changes_stream`` wires foreachBatch;
``apply_batch`` is the pure batch core (unit-testable without a
stream).

Row-image requirements (binlog_row_image): this sink assumes FULL
after-images — every value column present in each upsert. Under
MINIMAL the envelope's after map carries only the PK + changed
columns (absent columns are OMITTED from the map, see
sources/binlog_file.ABSENT), so ``_img_val`` would resolve the
untouched columns to NULL and the merge would clobber them. The
before-image narrowing is harmless — keys resolve from
after-coalesce-before maps and MINIMAL always carries the PK — but
consuming MINIMAL after-images correctly needs a patch-merge
(coalesce each absent column from the current snapshot row, the
same per-key join ``_materialize_json_patches`` already does for
JSON diffs). That variant is deliberately not implemented: decode
supports MINIMAL archives (cdc_binlog_minimal_image), and the
envelope faithfully distinguishes absent from NULL, so a consumer
CAN apply them — but this snapshot sink targets FULL/NOBLOB feeds
and a NOBLOB blob column is likewise only maintainable if it is not
a value column here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROW_OPS = ("insert", "update", "delete")


def _img_val(image: str, col: str):
    """Resolve one column from a stringly image map honoring the D12
    null flag: the wire encodes NULL as "" plus a true bit in
    ``{image}_null`` (same resolution ``typed_view`` applies), so a
    snapshot must store NULL, not ""."""
    raw = F.col(image).getItem(col)
    is_null = F.coalesce(F.col(f"{image}_null").getItem(col), F.lit(False))
    return F.when(is_null, F.lit(None)).otherwise(raw)


def normalize_pk_changes(batch: DataFrame) -> DataFrame:
    """Rewrite every update op as delete(before-image) + insert(after-
    image) at the same log coordinates.

    MySQL ROW update events carry both images and the primary key MAY
    change between them; keying an update on its after-image alone
    would leave the old-key row live in the snapshot forever. After the
    split each op has exactly one key: after-image for inserts,
    before-image for deletes. ``__op_rank`` breaks the tie at identical
    coordinates so the insert half wins over the delete half when the
    key did NOT change."""
    ops = batch.filter(F.col("op_type").isin(*ROW_OPS))
    non_upd = ops.filter(F.col("op_type") != "update").withColumn("__op_rank", F.lit(1))
    upd = ops.filter(F.col("op_type") == "update")
    null_map = F.lit(None).cast("map<string,string>")
    null_flags = F.lit(None).cast("map<string,boolean>")
    as_delete = (
        upd.withColumn("op_type", F.lit("delete"))
        .withColumn("after", null_map)
        .withColumn("after_null", null_flags)
        .withColumn("__op_rank", F.lit(0))
    )
    as_insert = (
        upd.withColumn("op_type", F.lit("insert"))
        .withColumn("before", null_map)
        .withColumn("before_null", null_flags)
        .withColumn("__op_rank", F.lit(2))
    )
    return non_upd.unionByName(as_delete).unionByName(as_insert)


def last_op_per_key(batch: DataFrame, key_cols: list[str]) -> DataFrame:
    """Collapse a micro-batch to one terminal op per key, ordered by
    binlog coordinates (log_name, log_pos) — the batch-local winner.
    Keys come from the after-image for upserts, before-image for
    deletes (null-flag-resolved). Honors ``__op_rank`` (from
    ``normalize_pk_changes``) as the within-coordinate tie-break."""
    ops = batch.filter(F.col("op_type").isin(*ROW_OPS))
    if "__op_rank" not in ops.columns:
        ops = ops.withColumn("__op_rank", F.lit(1))
    keyed = ops.select(
        "*",
        *[
            F.coalesce(_img_val("after", k), _img_val("before", k)).alias(f"__k_{k}")
            for k in key_cols
        ],
    )
    # __op_rank stays the PRIMARY within-coordinate tiebreak: a
    # multi-row PK-changing update replays as all-deletes-then-
    # all-inserts (normalize_pk_changes ranks), so when one event's
    # row i inserts key K and row j>i deletes it (UPDATE SET k=k+1 on
    # consecutive keys), the insert must win — ordering row_index
    # FIRST would pick the delete and silently drop the key. row_index
    # is only the final determinism tiebreak between same-rank pieces.
    row_idx = (
        F.coalesce(F.col("row_index"), F.lit(0))
        if "row_index" in ops.columns
        else F.lit(0)
    )
    w = Window.partitionBy(*[f"__k_{k}" for k in key_cols]).orderBy(
        F.col("log_name").desc(), F.col("log_pos").desc(),
        F.col("__op_rank").desc(), row_idx.desc()
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_path: str,
    key_cols: list[str],
    value_cols: list[str],
    patch_json_cols: tuple[str, ...] = (),
) -> None:
    """Merge one batch of envelope ops into the parquet snapshot.

    ``patch_json_cols``: JSON columns whose after-images may arrive as
    WL#10570 partial diffs ({"$json_diff": [...]}, the binlog-file
    route under binlog_row_value_options=PARTIAL_JSON). Those columns
    fold the batch's FULL ordered per-key value sequence against the
    current snapshot value (operators/json_patch.py), so the snapshot
    stores materialized documents — last-op-wins alone would store the
    diff text itself as the value."""
    norm = normalize_pk_changes(batch)
    winners = last_op_per_key(norm, key_cols)
    upserts = winners.filter(F.col("op_type") != "delete").select(
        *[F.col(f"__k_{k}").alias(k) for k in key_cols],
        *[_img_val("after", c).alias(c) for c in value_cols],
    )
    if patch_json_cols:
        upserts = _materialize_json_patches(
            spark, norm, upserts, snapshot_path, key_cols, patch_json_cols
        )
    deletes = winners.filter(F.col("op_type") == "delete").select(
        *[F.col(f"__k_{k}").alias(k) for k in key_cols]
    )
    touched = upserts.select(*key_cols).union(deletes).distinct()
    if os.path.exists(snapshot_path):
        current = spark.read.parquet(snapshot_path)
        kept = current.join(touched, key_cols, "left_anti")
        merged = kept.unionByName(upserts)
    else:
        merged = upserts
    # plain-parquet atomicity: write to side dir, then swap. The rows
    # must be materialized BEFORE the old snapshot is replaced.
    tmp = snapshot_path + ".next"
    merged.write.mode("overwrite").parquet(tmp)
    import shutil

    if os.path.exists(snapshot_path):
        shutil.rmtree(snapshot_path)
    os.rename(tmp, snapshot_path)


def apply_changes_stream(
    stream: DataFrame,
    snapshot_path: str,
    checkpoint: str,
    key_cols: list[str],
    value_cols: list[str],
):
    """foreachBatch wiring: exactly-once via checkpoint + idempotent
    merge (re-applying a replayed batch converges to the same state)."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_batch(batch.sparkSession, batch, snapshot_path, key_cols, value_cols)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def scd2_history(batch: DataFrame, key_cols: list[str], value_cols: list[str]) -> DataFrame:
    """SCD2 (slowly-changing-dimension) view of an envelope batch: one
    row per (key, version) with [valid_from_pos, valid_to_pos) binlog
    validity ranges — the history-preserving CDC consumer, vs
    apply_batch's current-state snapshot.

    valid_to_pos of a version = valid_from_pos of the key's next op
    (NULL = still current); deletes close the last range and emit no
    new version. Pure window arithmetic (lead over per-key op order):
    one shuffle on the key, linear in ops. At 100 TB the history table
    appends per batch; closing the previous open version is a keyed
    MERGE exactly like apply_batch's. Updates are keyed on the
    after-image: a PK-changing update starts a new key's history (the
    old key's last version stays open — history is per-key identity)."""
    ops = batch.filter(F.col("op_type").isin(*ROW_OPS))
    keyed = ops.select(
        "op_type",
        "log_name",
        "log_pos",
        *[
            F.coalesce(_img_val("after", k), _img_val("before", k)).alias(k)
            for k in key_cols
        ],
        *[_img_val("after", c).alias(c) for c in value_cols],
    )
    w = Window.partitionBy(*key_cols).orderBy("log_name", "log_pos")
    with_next = keyed.withColumn(
        "valid_to_pos", F.lead("log_pos").over(w)
    ).withColumnRenamed("log_pos", "valid_from_pos")
    return (
        with_next.filter(F.col("op_type") != "delete")
        .select(
            *key_cols,
            *value_cols,
            "valid_from_pos",
            "valid_to_pos",
            F.col("valid_to_pos").isNull().alias("is_current"),
        )
    )


def _materialize_json_patches(
    spark: SparkSession,
    norm: DataFrame,
    upserts: DataFrame,
    snapshot_path: str,
    key_cols: list[str],
    patch_cols: tuple[str, ...],
    old_df: DataFrame | None = None,
) -> DataFrame:
    """Replace each patch column's last-op value with the fold of the
    key's ORDERED after-image sequence over the current snapshot value
    — full documents overwrite, {"$json_diff"} documents patch
    (a later diff can chain on an earlier diff within one batch, which
    last-op-wins cannot express). Work is bounded by the batch's
    touched keys: the sequence aggregation reads only this batch's
    inserts and the old-value join is key-equi against the snapshot."""
    from dolphinbeat_spark.operators.json_patch import fold_udf

    # envelope batches may lack __op_rank / row_index (same presence
    # guard as last_op_per_key — ADVICE r7)
    rank_col = (
        F.col("__op_rank") if "__op_rank" in norm.columns else F.lit(1)
    )
    ri_col = (
        F.coalesce(F.col("row_index"), F.lit(0))
        if "row_index" in norm.columns
        else F.lit(0)
    )
    ins = norm.filter(F.col("op_type") == "insert").select(
        *[_img_val("after", k).alias(k) for k in key_cols],
        "log_name",
        "log_pos",
        rank_col.alias("__op_rank"),
        ri_col.alias("__ri"),
        *[_img_val("after", c).alias(f"__v_{c}") for c in patch_cols],
    )
    seqs = ins.groupBy(*key_cols).agg(
        *[
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "log_name", "log_pos", "__op_rank", "__ri",
                            F.col(f"__v_{c}").alias("v"),
                        )
                    )
                ),
                lambda x: x["v"],
            ).alias(f"__seq_{c}")
            for c in patch_cols
        ]
    )
    out = upserts.join(seqs, list(key_cols), "left")
    if old_df is None and os.path.exists(snapshot_path):
        old_df = spark.read.parquet(snapshot_path)
    if old_df is not None:
        old = old_df.select(
            *key_cols, *[F.col(c).alias(f"__old_{c}") for c in patch_cols]
        )
        out = out.join(old, list(key_cols), "left")
    else:
        for c in patch_cols:
            out = out.withColumn(f"__old_{c}", F.lit(None).cast("string"))
    fold = fold_udf()
    for c in patch_cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(f"__seq_{c}").isNotNull(),
                fold(F.col(f"__old_{c}"), F.col(f"__seq_{c}")),
            ).otherwise(F.col(c)),
        )
    return out.drop(*[f"__seq_{c}" for c in patch_cols],
                    *[f"__old_{c}" for c in patch_cols])


def apply_batch_partitioned(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_path: str,
    key_cols: list[str],
    value_cols: list[str],
    num_buckets: int = 16,
    patch_json_cols: tuple[str, ...] = (),
) -> None:
    """Partitioned-snapshot merge: the snapshot is hive-partitioned on
    a hash bucket of the key; a batch only reads and rewrites the
    buckets its keys touch (dynamic partition overwrite) — per-batch
    cost is O(touched buckets), not O(snapshot). This is the plain-
    parquet approximation of a Delta/Iceberg MERGE and the shape that
    survives a 100 TB snapshot: with small batches most buckets are
    cold and never open.

    Same last-op-per-key semantics as apply_batch; replay-idempotent
    (dynamic overwrite of the same buckets converges).
    ``patch_json_cols`` folds partial-JSON diffs like apply_batch —
    the old-value side reads only the touched buckets, keeping the
    per-batch cost discipline."""
    norm = normalize_pk_changes(batch)
    winners = last_op_per_key(norm, key_cols)
    key_exprs = [F.col(f"__k_{k}") for k in key_cols]
    bucket = F.pmod(F.xxhash64(*key_exprs), F.lit(num_buckets)).cast("int")
    upserts = winners.filter(F.col("op_type") != "delete").select(
        *[F.col(f"__k_{k}").alias(k) for k in key_cols],
        *[_img_val("after", c).alias(c) for c in value_cols],
        bucket.alias("__bucket"),
    )
    deletes = winners.filter(F.col("op_type") == "delete").select(
        *[F.col(f"__k_{k}").alias(k) for k in key_cols], bucket.alias("__bucket")
    )
    touched = [
        r["__bucket"]
        for r in upserts.select("__bucket").union(deletes.select("__bucket")).distinct().collect()
    ]
    if not touched:
        return
    current = None
    if os.path.exists(snapshot_path):
        current = spark.read.parquet(snapshot_path).filter(
            F.col("__bucket").isin(touched)  # partition-pruned read
        )
    if patch_json_cols:
        upserts = _materialize_json_patches(
            spark, norm, upserts, snapshot_path, key_cols, patch_json_cols,
            old_df=current,
        )
    merged = upserts
    if current is not None:
        gone = upserts.select(*key_cols).union(deletes.drop("__bucket")).distinct()
        kept = current.join(gone, key_cols, "left_anti")
        merged = kept.unionByName(upserts)
    written = {r["__bucket"] for r in merged.select("__bucket").distinct().collect()}
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__bucket")
        .parquet(snapshot_path)
    )
    # dynamic overwrite only replaces partitions PRESENT in the output:
    # a bucket whose last key was deleted ends empty and must be
    # removed explicitly or its stale file survives
    import shutil

    for b in set(touched) - written:
        shutil.rmtree(os.path.join(snapshot_path, f"__bucket={b}"), ignore_errors=True)


def read_snapshot(spark: SparkSession, snapshot_path: str) -> DataFrame:
    """Read a (partitioned or flat) snapshot without the internal
    bucket column."""
    df = spark.read.parquet(snapshot_path)
    return df.drop("__bucket") if "__bucket" in df.columns else df
