"""Hypertable-style cascading time rollups + a portable HLL sketch.

``rollup_cascade`` is the continuous-aggregate pattern of time-series
stores (hypertables): minute buckets aggregate raw events ONCE; hour
buckets aggregate the minute buckets; day buckets aggregate hours.
Correctness rests on re-aggregability (sum-of-sums, sum-of-counts);
the oracle computes every grain straight from raw events, so the spec
proves the cascade composes losslessly. At 100 TB this is the
difference between scanning raw events per grain (3 full scans) and
one raw scan + two tiny re-aggregations — and incrementally, new data
only touches the buckets it lands in.

``hll_distinct`` is a from-scratch HyperLogLog built ONLY from
engine-portable pieces (functions/hashes.py md5-derived hash64,
integer bit ops, one final double fold): bucket = hash mod m, rank =
leading-zeros of the remaining bits + 1, register = max(rank) per
bucket, estimate = alpha·m²/Σ2^-reg with the standard small-range
correction. Deterministic bit-for-bit on both engines — an
oracle-checkable approximate-distinct, unlike Spark's HLL++ whose
sketch bytes are engine-private. Register maxes merge by max, so the
sketch distributes like any map-side-combinable aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dolphinbeat_spark.functions.hashes import HASH_BITS, hash64


def rollup_cascade(
    events: DataFrame,
    ts_col: str,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """minute → hour → day cascade; returns the union with a ``grain``
    column. Each level aggregates the PREVIOUS level's partials."""

    def agg(df: DataFrame, bucket: Column, srcs: tuple[str, str]):
        return df.groupBy(bucket.alias("bucket_start"), *group_cols).agg(
            F.sum(srcs[0]).alias("n_events"),
            F.sum(srcs[1]).alias("total_value"),
        )

    # r17 (guide §2.3 "narrower types"): the minute level — the only
    # raw-cardinality aggregation — runs on limbed long micro-units
    # (functions/money.py): 4 primitive longs in the hash-agg buffer
    # instead of one boxed BigDecimal per input row, overflow-safe past
    # 1.4e14 rows per bucket (unconditional at 100 TB), recombined to
    # the exact decimal(38,6) value the decimal(18,6) sum produces.
    # Hour/day levels re-aggregate the tiny minute/hour relations and
    # stay decimal (sum-of-sums composes losslessly, as before).
    from dolphinbeat_spark.functions.money import limb_sums, limb_total, micros

    minutes = events.select(
        F.date_trunc("minute", ts_col).alias("m"),
        *group_cols,
        micros(value_col).alias("__m"),
    )
    minute_agg = (
        minutes.groupBy(F.col("m").alias("bucket_start"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            *limb_sums(F.col("__m"), "__v"),
        )
        .select(
            "bucket_start",
            *group_cols,
            "n_events",
            limb_total("__v").alias("total_value"),
        )
    )
    hour_agg = agg(
        minute_agg, F.date_trunc("hour", "bucket_start"), ("n_events", "total_value")
    )
    day_agg = agg(
        hour_agg, F.date_trunc("day", "bucket_start"), ("n_events", "total_value")
    )

    def out(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket_start",
            *group_cols,
            "n_events",
            F.round("total_value", 2).cast("double").alias("total_value"),
        )

    return out(minute_agg, "minute").unionByName(out(hour_agg, "hour")).unionByName(
        out(day_agg, "day")
    )


HLL_ALPHA_64 = 0.709  # standard alpha for m=64


def hll_distinct(
    df: DataFrame, group_cols: list[str], key: Column, m: int = 64
) -> DataFrame:
    """Portable HLL distinct estimate per group (m buckets, m power of
    two). Returns (group_cols..., hll_estimate double)."""
    bucket_bits = int(math.log2(m))
    h = hash64(key)
    bucket = (h % m).cast("int")
    rest = F.floor(h / m).cast("bigint")  # top HASH_BITS - bucket_bits bits
    val_bits = HASH_BITS - bucket_bits
    max_rank = val_bits + 1  # rank when the suffix is all zeros
    # rank = leading zeros of the suffix + 1 = val_bits - bit_length + 1.
    # bit_length via length(bin(x)) — integer-exact in both engines
    # (floor(log2(x)) is NOT: log2 can land a ulp under an exact power
    # of two and floor() then loses a whole bit).
    bit_length = F.when(rest > 0, F.length(F.bin(rest))).otherwise(F.lit(0))
    rank = (F.lit(val_bits) - bit_length + 1).cast("int")
    regs = (
        df.select(*group_cols, bucket.alias("__b"), rank.alias("__r"))
        .groupBy(*group_cols, "__b")
        .agg(F.max("__r").alias("reg"))
    )
    # harmonic fold, INTEGER-SCALED so the sum is exact and order-free:
    # 2^-reg scaled by 2^max_rank → 1 << (max_rank - reg), a bigint;
    # an absent bucket contributes 2^0 → 1 << max_rank. Total ≤
    # m · 2^max_rank = 2^(6+43) < 2^63: no overflow, no float order.
    scaled = F.expr(f"shiftleft(CAST(1 AS BIGINT), {max_rank} - reg)")
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(scaled).alias("present_scaled"),
        F.count(F.lit(1)).alias("n_present"),
    )
    zeros = F.lit(m) - F.col("n_present")
    z_scaled = F.col("present_scaled") + zeros.cast("bigint") * F.lit(
        1 << max_rank
    ).cast("bigint")
    z = z_scaled.cast("double") / F.lit(float(1 << max_rank))
    raw_est = F.lit(HLL_ALPHA_64 * m * m) / z
    # small-range correction: linear counting while registers are empty
    est = F.when(
        (raw_est < 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw_est)
    return per_group.select(*group_cols, F.round(est, 4).alias("hll_estimate"))
