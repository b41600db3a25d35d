"""Dataset-layout contracts: partition pruning, shuffle-free bucketed
joins, small-file compaction (sinks/dataset.py)."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from dolphinbeat_spark.sinks.dataset import compact, write_bucketed, write_partitioned


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes_and_sorts(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    df = spark.range(0, 1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 4).cast("string").alias("bucket_type"),
        (F.col("id") * 7 % 100).alias("v"),
    )
    write_partitioned(df, path, ["bucket_type"], sort_cols=["v"])
    # layout: one directory per partition value, one file each
    dirs = sorted(d for d in os.listdir(path) if d.startswith("bucket_type="))
    assert dirs == [f"bucket_type={i}" for i in range(4)]
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: expected 1 file, got {files}"
    # partition pruning: a filtered read scans one partition only
    back = spark.read.parquet(path).filter(F.col("bucket_type") == "2")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "bucket_type" in plan
    assert back.count() == 250
    # within-file ordering held (row-group stats selective)
    vals = [r["v"] for r in back.collect()]
    assert vals == sorted(vals)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # warehouse dir is a static conf on the shared session; tables land
    # in ./spark-warehouse (gitignored) and are dropped at the end
    facts = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    dims = spark.range(0, 500).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    write_bucketed(facts, "t_facts", "k", 8)
    write_bucketed(dims, "t_dims", "k", 8)
    a = spark.table("t_facts")
    b = spark.table("t_dims")
    # force SMJ so the assertion is about Exchange, not broadcast
    joined = a.hint("merge").join(b, "k")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan
    assert joined.count() == 500
    spark.sql("DROP TABLE IF EXISTS t_facts")
    spark.sql("DROP TABLE IF EXISTS t_dims")


def test_compact_merges_small_files(spark, tmp_path):
    src = str(tmp_path / "small_files")
    spark.range(0, 1000).repartition(16).write.parquet(src)
    n_before = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_before == 16
    compact(spark, src, 2)
    dest = src + "_compacted"
    n_after = len([f for f in os.listdir(dest) if f.endswith(".parquet")])
    assert n_after == 2
    assert spark.read.parquet(dest).count() == 1000


def test_cli_list_and_run(spark, capsys):
    from dolphinbeat_spark.__main__ import main

    assert main(["list", "dedup"]) == 0
    out = capsys.readouterr().out
    assert "dedup_minhash_signatures" in out
    assert main(["run", "no_such_query"]) == 2


def test_zorder_tightens_file_ranges(spark, tmp_path):
    """Z-ordering by (a, b) must give BALANCED per-file min/max spans:
    a query filtering on b alone skips files under z-order (span_b ≪ 1
    per file) where a plain a-sort cannot (span_b ≈ 1 in every file).
    That balance — bounded spans on EVERY z-ordered column — is the
    point of Morton layout; total area is comparable to a single sort."""
    import pyarrow.parquet as pq
    import glob

    from dolphinbeat_spark.sinks.dataset import write_zordered

    n = 20000
    df = spark.range(0, n).select(
        F.col("id").alias("rid"),
        (F.col("id") * 2654435761 % n).alias("a"),  # decorrelated dims
        (F.col("id") * 40503 % n).alias("b"),
    )
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "sorted_a")
    write_zordered(df, zpath, ["a", "b"], num_files=64)
    df.repartitionByRange(64, F.col("a")).sortWithinPartitions("a").write.parquet(spath)

    def mean_spans(path):
        spans = {"a": [], "b": []}
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.row_group(0).num_columns)
            }
            for c in ("a", "b"):
                mn = min(md.row_group(g).column(cols[c]).statistics.min for g in range(md.num_row_groups))
                mx = max(md.row_group(g).column(cols[c]).statistics.max for g in range(md.num_row_groups))
                spans[c].append((mx - mn) / n)
        return {c: sum(v) / len(v) for c, v in spans.items()}

    z, srt = mean_spans(zpath), mean_spans(spath)
    # a-sort: perfect on a (~1/64), useless on b (~1). z-order with 64
    # files ≈ 8x8 grid: BOTH spans ~1/8 — b-only predicates now skip
    # ~7/8 of files instead of none.
    assert srt["b"] > 0.8, f"baseline should not constrain b: {srt}"
    assert z["b"] < 0.35, f"z-order must bound span_b: {z}"
    assert z["a"] < 0.35, f"z-order must keep span_a bounded: {z}"
    # round-trip: same rows
    assert spark.read.parquet(zpath).count() == n
