"""Gap-based sessionization over an event stream (batch form).

``sessionize`` assigns a session id per (key) using the classic
lag-gap-cumsum: a new session starts when the gap to the previous
event exceeds ``gap``. One shuffle on the key + per-partition sort;
session ids are deterministic (ordinal per key by time, tie-broken by
a unique column).

The streaming equivalent is ``F.session_window`` with a watermark —
see dolphinbeat_spark/streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap_seconds: int,
    tie_break: str,
) -> DataFrame:
    """Adds ``session_id`` (1-based per key, in time order)."""
    w = Window.partitionBy(key).orderBy(F.col(time_col), F.col(tie_break))
    prev_ts = F.lag(F.col(time_col)).over(w)
    # integer microsecond arithmetic: portable across engines (second-
    # granularity date_diff truncates; float epoch seconds drift).
    # The .cast("timestamp") accepts TIMESTAMP_NTZ inputs (what parquet
    # timestamps without tz read as) — no-op for LTZ, session-tz (UTC)
    # reinterpretation for NTZ, matching the DuckDB oracle's epoch_us.
    gap_us = F.unix_micros(F.col(time_col).cast("timestamp")) - F.unix_micros(
        prev_ts.cast("timestamp")
    )
    is_new = F.when(prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )
