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
    applied-marker file."""
    marker = None
    if batch_id is not None:
        marker_dir = rollup_path + "_applied"
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, str(batch_id))
        if os.path.exists(marker):
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
        shutil.rmtree(rollup_path)
    os.rename(tmp, rollup_path)
    if marker is not None:
        open(marker, "w").close()


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
