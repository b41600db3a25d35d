"""r16 optimization parity tests: every rewrite that changed an
operator's internals must produce BIT-IDENTICAL values to the
formulation it replaced (the declared-query results may not change).

- cosine from hoisted per-side norms vs the inline formulation
- greatest-based lang argmax vs the old array-fold reference
- materialized() evaluation barrier is value-transparent
- cents-long q1 aggregation vs the old decimal aggregation
- sorted_spread vs orderBy: identical rows AND order, pinned width
- functions/money.py cents machinery vs the decimal formulation
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dolphinbeat_spark.functions.barrier import materialized
from dolphinbeat_spark.functions.vector import (
    cosine_from_parts,
    cosine_similarity,
    dot,
    l2_norm,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    import random

    rng = random.Random(16)
    rows = []
    for i in range(200):
        a = [rng.uniform(-2, 2) for _ in range(8)]
        b = [rng.uniform(-2, 2) for _ in range(8)]
        rows.append((i, a, b))
    # edge rows: exact cancellation (dot == 0), tiny/huge magnitudes.
    # (No zero vectors: ANSI mode raises DIVIDE_BY_ZERO on a zero norm
    # in BOTH formulations — identical behavior, untestable via values.)
    rows.append((201, [1.0, -1.0, 2.0, -2.0, 0.5, -0.5, 4.0, -4.0],
                 [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]))
    rows.append((202, [1e-30] * 8, [1e30] * 8))
    return spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>"
    )


def test_hoisted_norm_cosine_bit_identical(vec_df):
    out = vec_df.select(
        cosine_similarity("a", "b").alias("cos_inline"),
        cosine_from_parts(
            dot("a", "b"), l2_norm("a"), l2_norm("b")
        ).alias("cos_parts"),
    ).collect()
    import math
    import struct

    def bits(x):
        return struct.pack(">d", x)

    for r in out:
        if math.isnan(r.cos_inline):
            assert math.isnan(r.cos_parts)
        else:
            assert bits(r.cos_inline) == bits(r.cos_parts)


def _old_lang_predict(text):
    """The pre-r16 array-fold argmax, kept verbatim as the reference."""
    from dolphinbeat_spark.operators.text import lang_scores

    scores = lang_scores(text)
    langs = sorted(scores)
    pairs = F.array(
        *[F.struct(scores[lang].alias("s"), F.lit(lang).alias("l")) for lang in langs]
    )
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).cast("bigint").alias("s"), F.lit("").alias("l")),
        lambda acc, p: F.when(p["s"] > acc["s"], p).otherwise(acc),
    )
    return best["l"]


def test_lang_predict_greatest_matches_fold(spark):
    from dolphinbeat_spark.operators.text import lang_predict

    rows = [
        ("the cat and the dog of the house",),   # en
        ("el la de el la de",),                   # es
        ("der und die der und",),                 # de
        ("le et les le et",),                     # fr
        ("zh shi de zh shi",),                    # zh markers
        ("no markers here whatsoever",),          # all-zero tie -> 'de'
        ("de de de",),                            # es/zh shared marker tie
        ("",),                                    # empty text
        (None,),                                  # null text -> ""
    ]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(
        _old_lang_predict(F.col("text")).alias("old"),
        lang_predict(F.col("text")).alias("new"),
    ).collect()
    for r in out:
        assert r.old == r.new, rows[out.index(r)]


def test_materialized_is_value_transparent(spark):
    df = spark.range(0, 1000, 1, 7).select(
        F.col("id"),
        materialized(F.col("id") * 3 + 1).alias("m"),
        (F.col("id") * 3 + 1).alias("plain"),
    )
    assert df.filter(F.col("m") != F.col("plain")).count() == 0
    # and the barrier actually blocks pushdown: a filter on the wrapped
    # column must stay ABOVE the projection (no substituted duplicate)
    plan = df.filter(F.col("m") > 10)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.index("Filter") < plan.index("Project")


def test_sorted_spread_matches_orderby(spark):
    """sorted_spread must return exactly orderBy's rows in orderBy's
    order, with the partition count pinned to defaultParallelism
    (a bare orderBy gets AQE-coalesced to 1 partition on small data,
    serializing any expensive chain above it — the r16 finding)."""
    from dolphinbeat_spark.catalog import sorted_spread

    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 9973).alias("k"),
        F.col("id").alias("v"),
    )
    # unique sort key (k, v) so total order is well-defined
    via_orderby = df.orderBy("k", "v").collect()
    spread = sorted_spread(df, "k", "v")
    assert via_orderby == spread.collect()
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_money_cents_matches_decimal(spark):
    """cents/cents_sum/rev_cents vs the decimal formulation they
    replaced: bit-identical doubles on random 2-decimal inputs,
    including negatives (q22 acctbal) and the price*(1-disc) and
    price*disc product shapes."""
    import random
    import struct

    from dolphinbeat_spark.functions.money import cents, cents_sum, rev_cents

    rng = random.Random(16)
    rows = [
        (
            i % 7,
            round(rng.uniform(-900, 90000), 2),       # price-like, some negative
            round(rng.uniform(0.0, 0.10), 2),         # discount 2dp
            round(rng.uniform(0.0, 50.0), 2),         # qty 2dp
        )
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "g int, price double, disc double, qty double")

    def _d(c):
        return (F.col(c) if isinstance(c, str) else c).cast("decimal(12,4)")

    out = (
        df.groupBy("g")
        .agg(
            F.round(F.sum(_d("price") * (1 - _d("disc"))), 2)
            .cast("double").alias("rev_dec"),
            cents_sum(
                rev_cents("price", "disc"), 4, "rev_cents"
            ),
            F.round(F.sum(_d("price") * _d("disc")), 2)
            .cast("double").alias("pd_dec"),
            cents_sum(cents("price") * cents("disc"), 4, "pd_cents"),
            F.round(F.sum(_d("qty")), 2).cast("double").alias("q_dec"),
            cents_sum(cents("qty"), 2, "q_cents"),
        )
        .collect()
    )
    for r in out:
        for a, b in (("rev_dec", "rev_cents"), ("pd_dec", "pd_cents"),
                     ("q_dec", "q_cents")):
            assert struct.pack(">d", r[a]) == struct.pack(">d", r[b]), (a, r)


def test_q1_cents_matches_decimal_formulation(spark):
    """q1's new LONG-cents aggregation vs the old decimal aggregation,
    run side by side on the same sf0.001 input — every output column
    bit-identical."""
    from dolphinbeat_spark.plans.registry import all_specs

    q1 = all_specs()["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")

    # old decimal formulation, verbatim from pre-r16 relational.py
    from dolphinbeat_spark.catalog import load

    def _d(c):
        return (F.col(c) if isinstance(c, str) else c).cast("decimal(12,4)")

    def _dsum(c, alias):
        return F.round(F.sum(_d(c) if isinstance(c, str) else c), 2).cast(
            "double").alias(alias)

    li = load(spark, "/root/testdata/sf0.001", "lineitem")
    disc_price = _d("l_extendedprice") * (1 - _d("l_discount"))
    charge = disc_price.cast("decimal(18,8)") * (1 + _d("l_tax"))
    n = F.count(F.lit(1))
    old = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            (F.sum(_d("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(_d("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    import struct

    new_rows = q1.collect()
    old_rows = old.collect()
    assert len(new_rows) == len(old_rows)
    for a, b in zip(new_rows, old_rows):
        assert a.l_returnflag == b.l_returnflag
        assert a.l_linestatus == b.l_linestatus
        assert a.count_order == b.count_order
        for col in ("sum_qty", "sum_base_price", "sum_disc_price",
                    "sum_charge", "avg_qty", "avg_disc"):
            assert struct.pack(">d", a[col]) == struct.pack(">d", b[col]), col
