"""Table-routing filters (reference F1/F2).

The reference compiles include/exclude regex lists over "db.table"
with a memoized match cache (``canal/canal.go:116-141,290-326``).
In Spark the same semantics are a single ``rlike`` predicate —
codegen'd per row, pushed down by Catalyst, no cache needed
(SURVEY.md §4.1). Matching is *search* semantics (pattern found
anywhere), like Go's ``regexp.MatchString``.

Rules (mirroring ``checkTableMatch``):
- if include patterns exist: the table must match at least one
- if exclude patterns exist: the table must match none
- events without a table (begin/commit/rotate/gtid) pass through —
  transaction framing is never filtered out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_matches(
    db_table: Column, include: list[str] | None, exclude: list[str] | None
) -> Column:
    cond = F.lit(True)
    if include:
        inc = F.lit(False)
        for pat in include:
            inc = inc | db_table.rlike(pat)
        cond = cond & inc
    if exclude:
        for pat in exclude:
            cond = cond & ~db_table.rlike(pat)
    return cond


def filter_tables(
    df: DataFrame,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    db_col: str = "db",
    table_col: str = "table",
) -> DataFrame:
    """Envelope-stream filter: row ops are routed by db.table; marker
    ops (no table) always pass."""
    db_table = F.concat_ws(".", F.col(db_col), F.col(table_col))
    keep = F.col(table_col).isNull() | table_matches(db_table, include, exclude)
    return df.filter(keep)
