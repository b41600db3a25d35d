"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst expressions (``aggregate``/``zip_with`` higher-order
functions) — JVM-side, no Python. Elements are cast to DOUBLE before
accumulation and folded strictly left-to-right in index order, which
makes the result bit-identical to any engine that does the same
(the DuckDB oracle sums in index order too).

r16 measured note (optimization guide §1.1 empirical loop): an
"unrolled" formulation of these folds — the identical left-associated
chain written as 64 ``element_at``/cast/multiply/add terms so it
whole-stage-codegens — was tried and is ~7x SLOWER at 10M pairs
(35.2 s vs 4.9 s for the fold; per-access ANSI bounds machinery and
per-term array re-materialization swamp any codegen benefit, and the
giant generated methods defeat JIT). The HOF fold in Spark 4.1 is the
fast formulation; do not "optimize" it back into element_at chains.
Same verdict for literal-coefficient folds (lsh_bucket 1.27 s fold vs
1.51 s unrolled) and squared-L2 (0.45 vs 0.56 s).

What DOES pay (same measurement): computing norms once per ROW and
carrying them through the join instead of once per PAIR —
``cosine_from_parts`` (15.5 s -> 4.9 s on the same 10M-pair bench).

At scale: these are per-row map-side expressions with no shuffle; a
brute-force top-k over N query x M corpus pairs shuffles only the
(qid, cid, sim) triples, and the corpus side should be the broadcast
side when it fits (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dcol(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right ordered dot product, DOUBLE precision."""
    prods = F.zip_with(_dcol(a), _dcol(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.aggregate(_dcol(a), F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_from_parts(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine from a precomputed dot and per-side norms — the same
    ``dot / (norm_a * norm_b)`` grouping as :func:`cosine_similarity`,
    so values are bit-identical while each side's norm is computed once
    per ROW (in a projection before the join) instead of once per PAIR."""
    return dot_col / (norm_a * norm_b)
