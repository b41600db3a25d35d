"""Evaluation barrier for expensive projected expressions.

``materialized(col)`` wraps a column so the optimizer treats the
projection as NONDETERMINISTIC — the value is unchanged (the guard
``monotonically_increasing_id() >= 0`` is always true by construction:
the id is non-negative), but:

- a filter referencing the output can no longer be pushed below the
  projection with the expression SUBSTITUTED into it (the optimizer
  guide §4.4 problem, which applies to built-in expression trees just
  as it does to UDFs: Catalyst happily duplicates an expensive
  projected expression into a pushed-down filter, evaluating it twice
  per row — or, pushed below a repartition, moves the whole per-row
  cost into the scan stage, serializing it onto however few tasks the
  input layout yields);
- adjacent projects are not collapsed through it, so each wrapped
  column is computed exactly once per row in its own whole-stage-
  codegen'd ProjectExec and downstream references read the
  materialized value.

Use it for columns that are expensive to compute and referenced more
than once downstream (token arrays, padded/lowercased text, decoded
payloads). Do NOT use it on cheap columns: the barrier also blocks
legitimate optimizations (filter pushdown past the projection).

Task retries are safe: the value is a pure function of the input row,
so a re-run computes the same result (unlike true nondeterminism,
which SPARK-38388 warns about under round-robin repartition).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def materialized(col: Column) -> Column:
    return F.when(F.monotonically_increasing_id() >= 0, col)
