"""Rollup cascade invariants: lossless re-aggregation is oracle-checked
(plans/rollup_queries.py); here: INCREMENTAL maintenance — partial
rollups over disjoint slices merge to exactly the full rollup, which
is what lets a streaming foreachBatch update only touched buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.operators.rollups import rollup_cascade

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(
        (r["grain"], r["bucket_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in df.collect()
    )


def test_rollup_incremental_merge_equals_full(spark):
    e = load(spark, SF_DIR, "events")
    full = rollup_cascade(e, "ts", ["event_type"], "value")

    part1 = rollup_cascade(e.filter(F.col("event_id") % 2 == 0), "ts", ["event_type"], "value")
    part2 = rollup_cascade(e.filter(F.col("event_id") % 2 == 1), "ts", ["event_type"], "value")
    # merge = re-aggregate bucket partials (exactly what a foreachBatch
    # MERGE INTO would do per incoming batch)
    merged = (
        part1.unionByName(part2)
        .groupBy("grain", "bucket_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            # partials were rounded to 2 for presentation; summing two
            # 2-decimal doubles is exact (scaled integers < 2^53)
            F.round(F.sum("total_value"), 2).alias("total_value"),
        )
    )
    assert _canon(merged) == _canon(full)
