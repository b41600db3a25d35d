"""Dataset layout writers — the storage-side half of 100 TB design.

The reference only ever writes ordered Kafka messages / stdout JSON
(SURVEY.md §2.5); an analytics engine additionally owns HOW datasets
land on storage, because layout decides every later query's cost:

- ``write_partitioned``: hive-style directory partitioning on a
  low-cardinality column (e.g. event date) → partition pruning makes
  time-bounded scans O(selected partitions), not O(dataset).
- ``write_bucketed``: hash-bucketed + sorted table registered in the
  session catalog → equi-joins and groupBys on the bucket key run
  WITHOUT an Exchange on either pre-bucketed side (verified by
  tests/test_dataset_layout.py asserting the plan is shuffle-free).
  At 100 TB this is the difference between re-shuffling the fact
  table per join and never shuffling it at all.
- ``compact``: rewrite small files to a target file count per
  partition (the streaming-sink small-file problem).

All writers are thin, deliberately: the point is picking the Spark
primitives (partitionBy / bucketBy+sortBy / repartition before write)
and the layout contract, not wrapping them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    sort_cols: list[str] | None = None,
    files_per_partition: int = 1,
) -> None:
    """Hive-partitioned parquet. ``sort_cols`` orders rows WITHIN each
    file (min/max stats become selective → row-group skipping); the
    repartition keys rows to their output partition so each partition
    directory is written by ``files_per_partition`` tasks, not by every
    task (the small-file explosion)."""
    parts = [F.col(c) for c in partition_cols]
    if files_per_partition == 1:
        shaped = df.repartition(*parts)
    else:
        # salt splits each partition's rows across N writer tasks
        salt = (F.rand(seed=0) * files_per_partition).cast("int")
        shaped = df.repartition(*parts, salt)
    if sort_cols:
        # partition cols FIRST: the dynamic-partition writer requires
        # rows ordered by partition key and inserts its own (data-order
        # destroying) sort unless the incoming ordering already has the
        # partition columns as a prefix
        shaped = shaped.sortWithinPartitions(
            *parts, *[F.col(c) for c in sort_cols]
        )
    shaped.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    *,
    sort: bool = True,
) -> None:
    """Bucketed (and bucket-sorted) managed table. Readers joining two
    tables bucketed on the same key with the same bucket count get a
    SortMergeJoin with ZERO Exchange nodes."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
    *,
    out_path: str | None = None,
) -> None:
    """Rewrite a parquet dataset into ``target_files`` files (coalesce,
    not repartition: no shuffle — fine for merging, never for
    splitting). Writes to ``out_path`` (default: in-place via temp dir
    is NOT attempted — atomic swap is storage-specific)."""
    dest = out_path or path + "_compacted"
    spark.read.parquet(path).coalesce(target_files).write.mode("overwrite").parquet(dest)


def _zvalue(rank_cols: list, bits: int = 8):
    """Interleave ``bits`` bits of each 0..2^bits-1 rank column into a
    single Z (Morton) value — bit j of column i lands at position
    j * n_cols + i."""
    from pyspark.sql import functions as F

    n = len(rank_cols)
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(rank_cols):
        for j in range(bits):
            bit = F.shiftright(c.cast("bigint"), j).bitwiseAND(F.lit(1))
            z = z + (bit * F.lit(1 << (j * n + i)).cast("bigint"))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int = 8,
    bits: int = 8,
) -> None:
    """Z-order clustered parquet: rows are range-partitioned and sorted
    by the Morton interleave of per-column quantile ranks, so EVERY
    z-ordered column gets tight per-file min/max ranges — multi-column
    data skipping, where a plain sort only skips on its leading column.

    Ranks come from ntile(2^bits) windows (a global pass; at 100 TB
    swap in approxQuantile bounds computed once and a range lookup —
    same z-value, no global window). Verified by
    tests/test_dataset_layout.py::test_zorder_tightens_file_ranges
    against single-column-sort baseline using parquet footer stats."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    ranked = df
    rank_cols = []
    for c in zorder_cols:
        rc = f"__rank_{c}"
        ranked = ranked.withColumn(
            rc, F.ntile(n_buckets).over(Window.orderBy(F.col(c))) - 1
        )
        rank_cols.append(F.col(rc))
    z = _zvalue(rank_cols, bits)
    (
        ranked.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__rank_{c}" for c in zorder_cols])
        .write.mode("overwrite")
        .parquet(path)
    )
