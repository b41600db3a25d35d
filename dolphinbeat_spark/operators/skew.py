"""Skew-mitigation join: salt-and-replicate for hot keys.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions, but it only works
for sort-merge joins AFTER a shuffle exists and within one stage. The
manual salt-and-replicate rewrite here is the fallback that works for
any equi-join and composes with custom partitioning:

- probe (skewed) side: deterministic per-row salt in [0, factor)
- build side: each row replicated ``factor`` times, once per salt
- join on (key, salt) → a key that hashed to ONE reducer now spreads
  over ``factor`` reducers

Cost model at 100 TB: build side grows ×factor (keep it the small
side — a dim table ×16 is still broadcast-or-tiny), probe side is
untouched; the skewed key's reducer work divides by ``factor``.
Semantics are identical to the plain join (proved by the oracle of
``join_salted_supplier_revenue`` being the PLAIN join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_src: Column, factor: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic row salt in [0, factor): crc32 of a row-varying
    expression (NOT the join key — salting the key's own hash would
    put every copy of a hot key in the same bucket again)."""
    return df.withColumn(col_name, (F.crc32(salt_src.cast("string")) % factor).cast("int"))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_src: Column,
    factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on ``on`` with the hot-key
    spread. ``salt_src`` must vary within a key group on the skewed
    side (e.g. its primary key)."""
    s = with_salt(skewed, salt_src, factor)
    r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return s.join(r, [on, "__salt"], how).drop("__salt")


def grouped_topk_two_phase(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_name: str = "rk",
    sub_buckets: int = 32,
    bucket_src: Column | None = None,
) -> DataFrame:
    """Top-k per group without unbounded group partitions: the
    skew-safe form of ``row_number().over(partitionBy(group)) <= k``.

    Phase 1 ranks within (group, sub_bucket) and keeps <= k per
    sub-bucket — partitions are bounded by group_size / sub_buckets.
    Phase 2 re-ranks the <= k * sub_buckets survivors per group —
    bounded input by construction. Every global top-k row is top-k in
    its own sub-bucket, so the result is IDENTICAL to the single-window
    form (the equivalence a plain SQL oracle can verify); a mega-group
    at 100 TB costs a bounded second pass instead of one giant
    partition sort.

    ``order_cols`` must be a deterministic total order within each
    group (unique tie-break last). ``bucket_src`` defaults to hashing
    the order columns — any row-varying expression works; it never
    needs cross-engine portability (phase 1 is internal).
    """
    from pyspark.sql import Window

    src = bucket_src if bucket_src is not None else F.xxhash64(*order_cols)
    sub = F.pmod(src, F.lit(sub_buckets))
    w1 = Window.partitionBy(*group_cols, sub).orderBy(*order_cols)
    survivors = (
        df.withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= k)
        .drop("__rk1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= k)
    )
