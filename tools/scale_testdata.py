"""Synthesize an N×-scale replica of a testdata dir + plan-drift
fingerprints (the sf0.1 → sf1 scale-evidence step).

``ensure_scaled`` replicates the fact tables ``factor`` times with
key-space shifts that preserve join integrity (orders↔lineitem on
orderkey, customer↔orders on custkey) and copies the dimension tables
verbatim — so an sf0.1 input yields an sf1-equivalent layout with
``factor``× the fact rows and the SAME dimensional cardinalities,
exactly how TPC-H scale factors behave for the small dims.

``plan_fingerprint`` reduces a formatted physical plan to its
strategy-relevant shape (join algorithm counts, exchange count,
aggregate count) so bench.py can detect sf0.1→sf1 plan drift — e.g.
AQE or size estimates flipping a BroadcastHashJoin to SortMergeJoin.
"""

from __future__ import annotations

import io
import re
import shutil
from contextlib import redirect_stdout
from pathlib import Path

from pyspark.sql import functions as F

# fact tables: replicated with per-replica key shifts.
# {table: [columns shifted by the named keyspace]} — tables sharing a
# keyspace name stay join-consistent across replicas.
_FACT_SHIFTS = {
    "lineitem": {"l_orderkey": "orderkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "events": {"event_id": "eventkey", "user_id": "userkey"},
    "documents": {"doc_id": "dockey"},
}
# keyspace → (table, column) that defines its width
_KEYSPACE_SOURCE = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "eventkey": ("events", "event_id"),
    "userkey": ("events", "user_id"),
    "dockey": ("documents", "doc_id"),
}
_COPY_TABLES = ("region", "nation", "supplier", "part", "embeddings")


def ensure_scaled(spark, src_dir: str, dest_dir: str, factor: int = 10) -> bool:
    """Build (once) a ``factor``× replica of ``src_dir`` under
    ``dest_dir``. Returns True if it built, False if already present."""
    from dolphinbeat_spark.catalog import load

    dest = Path(dest_dir)
    # v2 (r16): fact tables materialize across 64 files. The v1
    # replica inherited the source's 1-2 partitions through the
    # broadcast crossJoin, so sf100 lineitem was ONE 349 MB file —
    # 3 scan tasks on 32 cores (measured ~25% busy), making every
    # sf100 wall a tail-variance lottery over a handful of huge
    # tasks instead of a measure of the engine. 64 files give every
    # core work with 2x task slack; at real 100 TB scale the same
    # property comes from the source layout (many 128 MB-1 GB
    # files), which is exactly what this replica now mimics.
    # v3: v2's round-robin repartition destroyed parquet encoding
    # locality (the replica grew 567M -> 1.6G and the inflated size
    # estimates flipped q5's customer join from broadcast to SMJ —
    # caught by the plan fingerprint). Sorting within partitions on
    # the shifted key restores dictionary/RLE runs: same 64-way
    # parallelism, near-v1 encoded size, stable join strategies.
    marker = dest / f"_SCALED_x{factor}_OK_v3"
    if marker.exists():
        return False
    if dest.exists():
        shutil.rmtree(dest)
    dest.mkdir(parents=True)

    widths = {
        ks: load(spark, src_dir, tbl).agg(F.max(col)).first()[0] + 1
        for ks, (tbl, col) in _KEYSPACE_SOURCE.items()
    }
    replicas = spark.range(factor).withColumnRenamed("id", "__r")
    for table, shifts in _FACT_SHIFTS.items():
        df = load(spark, src_dir, table).crossJoin(F.broadcast(replicas))
        for col, ks in shifts.items():
            df = df.withColumn(col, F.col(col) + F.col("__r") * F.lit(widths[ks]))
        sort_key = next(iter(shifts))
        df.drop("__r").repartition(64).sortWithinPartitions(
            sort_key).write.mode("overwrite").parquet(
            str(dest / f"{table}.parquet"))
    for table in _COPY_TABLES:
        shutil.copy(f"{src_dir}/{table}.parquet", dest / f"{table}.parquet")
    marker.touch()
    return True


_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def plan_fingerprint(df) -> dict:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    joins = {j: len(re.findall(rf"\b{j}\b", text)) for j in _JOIN_NODES}
    return {
        "joins": {k: v for k, v in joins.items() if v},
        "exchanges": len(re.findall(r"\(\d+\) Exchange", text)),
        "aggregates": len(re.findall(r"\(\d+\) HashAggregate", text)),
    }
