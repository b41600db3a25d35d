"""Banded interval (range) join — the keyless range-join scale path.

A raw ``r.ts BETWEEN l.ts AND l.ts + gap`` join with no equi key plans
as a nested-loop: O(|L|·|R|) comparisons. Banding converts it to an
equi-join: bucket both sides into gap-width time bins; a right row at
bin b can only match left rows in bins {b-1, b}, so the left side is
expanded to 2 bin keys and the join is a plain hash join on bin. Exact
bounds are re-checked post-join — banding is a candidate filter, not
the predicate.

Cost: 2·|L| + |R| rows through one hash join keyed on time bins;
candidate fan-in per bin is bounded by event rate · gap, and bin keys
are naturally well-distributed for event streams (AQE skew-split
backstops hot bins). This is how keyless temporal correlation stays
feasible at 100 TB; the per-key variant (equi key + post-filter, see
range_join_click_error) is preferable whenever a key exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    *,
    strict_after: bool = True,
) -> DataFrame:
    """Pairs (left, right) with right_ts in (left_ts, left_ts + gap]
    (``strict_after=False`` makes the lower bound inclusive). Input
    frames must not share column names."""
    # the intermediate .cast("timestamp") accepts TIMESTAMP_NTZ columns
    # (parquet timestamps without tz) — NTZ cannot cast to long directly
    bin_l = F.floor(F.col(left_ts).cast("timestamp").cast("long") / max_gap_seconds)
    bin_r = F.floor(F.col(right_ts).cast("timestamp").cast("long") / max_gap_seconds)
    l_expanded = left.withColumn(
        "__bin", F.explode(F.array(bin_l, bin_l + 1))
    )
    r_binned = right.withColumn("__bin", bin_r)
    lower = (
        F.col(right_ts) > F.col(left_ts)
        if strict_after
        else F.col(right_ts) >= F.col(left_ts)
    )
    upper = F.col(right_ts) <= F.col(left_ts) + F.expr(
        f"INTERVAL {max_gap_seconds} SECONDS"
    )
    return (
        l_expanded.join(r_binned, "__bin")
        .filter(lower & upper)
        .drop("__bin")
    )
