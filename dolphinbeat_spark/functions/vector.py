"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst expressions (``aggregate``/``zip_with`` higher-order
functions) — JVM-side, no Python. Elements are cast to DOUBLE before
accumulation and folded strictly left-to-right in index order, which
makes the result bit-identical to any engine that does the same
(the DuckDB oracle sums in index order too).

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
