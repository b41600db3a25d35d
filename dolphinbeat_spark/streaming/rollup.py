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
    tmp = rollup_path + ".next"
    merged.write.mode("overwrite").parquet(tmp)
    import shutil

    if os.path.exists(rollup_path):
        # carry prior batches' markers forward, then stamp this batch —
        # all BEFORE the rename that makes the new snapshot live
        for f in os.listdir(rollup_path):
            if f.startswith("_applied_"):
                open(os.path.join(tmp, f), "w").close()
    if batch_id is not None:
        open(os.path.join(tmp, f"_applied_{batch_id}"), "w").close()
    if os.path.exists(rollup_path):
        shutil.rmtree(rollup_path)
    os.rename(tmp, rollup_path)


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
