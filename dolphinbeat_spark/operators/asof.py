"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, on, left_time, right_time)`` attaches to each
left row the latest right row with ``right_time <= left_time`` for the
same key (backward as-of; the common "state as of event time" join).

Implementation is the scalable union-scan pattern, NOT a non-equi
join: tag both sides, union, repartition by key, sort within
partition by (time, side), and carry the most recent right payload
forward with ``last(..., ignorenulls)`` over an unbounded-preceding
window. Cost: ONE shuffle of |L|+|R| rows and one per-partition sort —
versus the O(|L|·match) blowup of the naive range-join formulation.
This survives 100 TB because it never materializes candidate pairs;
skewed keys are handled by AQE only insofar as the window needs each
key on one partition (salting would break the window — for pathological
single-key skew, pre-split by time range instead).

Right-side rows must be unique per (key, right_time) for deterministic
output; callers pre-aggregate (see plans/windows_events.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    *,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join; right payload columns come back prefixed.

    Ties (``right_time == left_time``) match, i.e. semantics are
    ``right_time <= left_time``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    r_payload = [c for c in right.columns if c not in keys]

    l_tag = left.withColumn("__t", F.col(left_time).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    ).withColumn("__payload", F.lit(None).cast(_struct_type_expr(right, r_payload)))
    r_tag = (
        right.withColumn("__t", F.col(right_time).cast("timestamp"))
        .withColumn("__side", F.lit(0))
        .withColumn("__payload", F.struct(*[F.col(c) for c in r_payload]))
    )
    l_cols = [c for c in left.columns]
    l_aligned = l_tag.select(*keys, "__t", "__side", "__payload", F.struct(*l_cols).alias("__l"))
    r_aligned = r_tag.select(
        *keys, "__t", "__side", "__payload", F.lit(None).cast(l_aligned.schema["__l"].dataType).alias("__l")
    )
    unioned = l_aligned.unionByName(r_aligned)

    # right rows (side=0) sort before left rows at equal time → "<=" tie semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col("__l")[c].alias(c) for c in l_cols],
        *[F.col("__match")[c].alias(f"{right_prefix}{c}") for c in r_payload],
    )
    return out


def asof_self_join(
    df: DataFrame,
    on: str | list[str],
    time_col: str,
    left_pred: Column,
    right_pred: Column,
    right_payload: list[str],
    *,
    right_order: list[str] | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join between two row subsets of ONE DataFrame,
    fused into a single scan.

    When both sides of an as-of join come from the same table (e.g.
    purchase → latest preceding view of the same events stream), the
    generic ``asof_join`` would scan the table twice and union — this
    variant tags sides with predicates instead: one scan, one shuffle
    (the window partitioning), no union, no pre-aggregation pass.

    ``right_order`` breaks ties among right rows sharing (key, time):
    the LAST row in that ordering wins (e.g. ``["event_id"]`` keeps the
    max event_id, replacing a groupBy-max pre-pass with sort order).

    Same 100 TB properties as asof_join: no candidate-pair blowup;
    per-key locality required by the window (no salting).
    """
    keys = [on] if isinstance(on, str) else list(on)
    order_cols = right_order or []
    side = F.when(left_pred, F.lit(1)).when(right_pred, F.lit(0))
    tagged = (
        df.withColumn("__side", side)
        .filter(F.col("__side").isNotNull())
        .withColumn("__t", F.col(time_col).cast("timestamp"))
        .withColumn(
            "__payload",
            F.when(
                F.col("__side") == 0, F.struct(*[F.col(c) for c in right_payload])
            ),
        )
    )
    # right rows (side=0) sort first at equal time → "<=" tie semantics;
    # right_order makes the carried right row deterministic within a tie
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__side"), *[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out_cols = [c for c in df.columns]
    return carried.filter(F.col("__side") == 1).select(
        *out_cols,
        *[F.col("__match")[c].alias(f"{right_prefix}{c}") for c in right_payload],
    )


def _struct_type_expr(df: DataFrame, cols: list[str]):
    from pyspark.sql.types import StructField, StructType

    fields = {f.name: f for f in df.schema.fields}
    return StructType([StructField(c, fields[c].dataType, True) for c in cols])
