"""Continuous aggregate: incrementally-maintained time rollup.

The streaming face of operators/rollups.py — each micro-batch's
partial aggregates merge into a persistent rollup table keyed by
(bucket, group). Re-aggregability (sum-of-sums/counts, proven by
tests/test_rollups.py) makes the merge exact; unlike apply_changes'
key-overwrite merge, an ADDITIVE merge would double-count a replayed
batch, so replay protection is explicit: per-batch marker files (the
same discipline as OrderedFileSink's _seq_meta) skip already-applied
batch ids.

At 100 TB: a batch touches only the buckets its events fall in;
storage-side this pairs with a bucket-partitioned rollup table
(apply_batch_partitioned's layout) so cold time ranges never rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_rollup_batch(
    batch: DataFrame,
    rollup_path: str,
    ts_col: str,
    group_cols: list[str],
    grain: str = "minute",
    batch_id: int | None = None,
) -> None:
    """Merge one batch's counts into the persistent rollup parquet.
    ``batch_id`` (when given) makes the merge replay-idempotent via an
    applied-marker file INSIDE the rollup directory: the atomic rename
    commits data and marker together, so there is no crash window
    between "data swapped" and "marker written" that would double-count
    the batch on restart (Spark's parquet reader ignores ``_``-prefixed
    files, same convention as ``_SUCCESS``)."""
    recover_swap_dir(rollup_path, rollup_path + ".next", rollup_path + ".old")
    if batch_id is not None and os.path.exists(
        os.path.join(rollup_path, f"_applied_{batch_id}")
    ):
        return  # replayed batch: already folded in
    spark = batch.sparkSession
    part = batch.groupBy(
        F.date_trunc(grain, ts_col).alias("bucket_start"), *group_cols
    ).agg(F.count(F.lit(1)).alias("n_events"))
    keys = ["bucket_start", *group_cols]
    if os.path.exists(rollup_path):
        current = spark.read.parquet(rollup_path)
        merged = (
            current.unionByName(part)
            .groupBy(*keys)
            .agg(F.sum("n_events").alias("n_events"))
        )
    else:
        merged = part
    atomic_swap_dir(
        merged, rollup_path, rollup_path + ".next", rollup_path + ".old",
        f"_applied_{batch_id}" if batch_id is not None else None,
    )


#: retained replay markers per rollup dir. Structured Streaming only
#: ever replays the last uncommitted batch, so a bounded tail of
#: markers suffices and the dir stays O(1) over a long-running stream.
MARKER_RETENTION = 100


def _carry_markers(src_dir: str, dst_dir: str) -> None:
    ids = sorted(
        int(f[len("_applied_"):])
        for f in os.listdir(src_dir)
        if f.startswith("_applied_") and f[len("_applied_"):].isdigit()
    )
    for i in ids[-MARKER_RETENTION:]:
        open(os.path.join(dst_dir, f"_applied_{i}"), "w").close()


def atomic_swap_dir(
    merged: "DataFrame",
    dir_path: str,
    tmp_path: str,
    old_path: str,
    marker: str | None,
) -> None:
    """Crash-safe swap of an aggregate directory: write the merged
    frame to ``tmp_path``, carry forward prior replay markers, stamp
    ``marker``, then RENAME-ASIDE — ``dir`` → ``old``, ``tmp`` →
    ``dir``, drop ``old``. Unlike rmtree-then-rename, no window exists
    where the only copy of prior state lives in an uncommitted temp:
    every crash point leaves either ``dir`` or ``old`` holding the
    last committed state, and :func:`recover_swap_dir` (called first)
    restores it. ``tmp_path``/``old_path`` must be ignored by parquet
    discovery (outside the read root, or '_'-prefixed inside it)."""
    recover_swap_dir(dir_path, tmp_path, old_path)
    merged.write.mode("overwrite").parquet(tmp_path)
    if os.path.exists(dir_path):
        _carry_markers(dir_path, tmp_path)
    if marker:
        open(os.path.join(tmp_path, marker), "w").close()
    if os.path.exists(dir_path):
        os.rename(dir_path, old_path)
    os.rename(tmp_path, dir_path)
    if os.path.exists(old_path):
        import shutil

        shutil.rmtree(old_path)


def swap_aside_paths(root: str, live_name: str) -> tuple[str, str]:
    """(tmp, old) dir names for an in-root swap of ``live_name``:
    '_'-prefixed so parquet partition discovery ignores them — and
    with '=' encoded away, because a 'key=value' shape overrides the
    underscore rule and would be inferred as a conflicting partition
    column. Recovery maps back via :func:`swap_live_name`."""
    enc = live_name.replace("=", "~")
    return (
        os.path.join(root, "_next." + enc),
        os.path.join(root, "_old." + enc),
    )


def swap_live_name(aside_entry: str) -> str:
    """Inverse of the aside encoding: '_next.part~X' → 'part=X'."""
    for prefix in ("_next.", "_old."):
        if aside_entry.startswith(prefix):
            return aside_entry[len(prefix):].replace("~", "=")
    raise ValueError(f"not an aside dir name: {aside_entry}")


def sweep_interrupted_swaps(root: str) -> None:
    """Recover EVERY interrupted swap under ``root`` — not just the
    dirs the current batch touches: a '_old.<name>' left by a crash
    holds the only committed copy of its partition and is invisible to
    parquet discovery until restored."""
    if not os.path.isdir(root):
        return
    for entry in os.listdir(root):
        if entry.startswith(("_old.", "_next.")):
            live = swap_live_name(entry)
            tmp, old = swap_aside_paths(root, live)
            recover_swap_dir(os.path.join(root, live), tmp, old)


def recover_swap_dir(dir_path: str, tmp_path: str, old_path: str) -> None:
    """Roll an interrupted :func:`atomic_swap_dir` back to its last
    committed state: a lone ``old`` dir is the committed state
    (restore it); a leftover ``tmp`` is uncommitted (drop it)."""
    import shutil

    if not os.path.exists(dir_path) and os.path.exists(old_path):
        os.rename(old_path, dir_path)
    elif os.path.exists(old_path):
        shutil.rmtree(old_path)
    if os.path.exists(tmp_path):
        shutil.rmtree(tmp_path)


def merge_rollup_batch_partitioned(
    batch: DataFrame,
    rollup_path: str,
    ts_col: str,
    group_cols: list[str],
    grain: str = "minute",
    batch_id: int | None = None,
    partition_grain: str = "day",
) -> None:
    """Time-partitioned continuous aggregate: the rollup table is laid
    out as one directory per ``partition_grain`` bucket and a batch
    merges ONLY the partitions its events fall in — per-batch cost is
    O(touched time range), never O(rollup), which is the shape that
    survives a 100 TB history (a streaming batch touches "now", cold
    months never open).

    Each touched partition gets the SAME atomic swap + in-dir replay
    marker discipline as :func:`merge_rollup_batch` — per partition:
    a crash between two partition swaps replays the batch, the swapped
    partitions skip on their marker, the unswapped redo from their old
    (marker-less) state. Exactly-once per partition, no double counts.

    The driver loops over touched partitions (one small Spark job
    each); typical streaming batches touch 1-2 partitions, so the loop
    is short — bulk backfills should use operators/rollups.py batch
    aggregation instead."""
    spark = batch.sparkSession
    part = batch.groupBy(
        F.date_trunc(grain, ts_col).alias("bucket_start"), *group_cols
    ).agg(F.count(F.lit(1)).alias("n_events"))
    part = part.withColumn(
        "__part",
        F.date_format(F.date_trunc(partition_grain, "bucket_start"), "yyyy-MM-dd"),
    ).localCheckpoint(eager=True)  # batch partials computed once, reused per partition
    keys = ["bucket_start", *group_cols]
    touched = [r["__part"] for r in part.select("__part").distinct().collect()]
    os.makedirs(rollup_path, exist_ok=True)
    sweep_interrupted_swaps(rollup_path)
    for p in sorted(touched):
        part_path = os.path.join(rollup_path, f"part={p}")
        marker = f"_applied_{batch_id}" if batch_id is not None else None
        if marker and os.path.exists(os.path.join(part_path, marker)):
            continue  # this partition already folded this batch in
        mine = part.filter(F.col("__part") == p).drop("__part")
        if os.path.exists(part_path):
            current = spark.read.parquet(part_path)
            merged = (
                current.unionByName(mine)
                .groupBy(*keys)
                .agg(F.sum("n_events").alias("n_events"))
            )
        else:
            merged = mine
        # temp/aside dirs INSIDE the read root must be '_'-prefixed:
        # a 'part=X.next' name contains '=' and partition discovery
        # would read it as a phantom partition
        tmp, old = swap_aside_paths(rollup_path, f"part={p}")
        atomic_swap_dir(merged, part_path, tmp, old, marker)


def read_partitioned_rollup(spark, rollup_path: str) -> DataFrame:
    """Read the time-partitioned rollup (partition dirs are plain
    ``part=YYYY-MM-DD`` hive dirs; markers are ``_``-ignored)."""
    df = spark.read.parquet(rollup_path)
    return df.drop("part") if "part" in df.columns else df


def continuous_rollup(
    stream: DataFrame,
    rollup_path: str,
    checkpoint: str,
    ts_col: str,
    group_cols: list[str],
    grain: str = "minute",
):
    """Wire the merge as a foreachBatch streaming sink."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        merge_rollup_batch(
            batch, rollup_path, ts_col, group_cols, grain, batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
