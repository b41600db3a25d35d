"""r17 optimization parity + plan-shape regression tests.

Parity: the limbed long micro-unit aggregation (functions/money.py)
must reproduce the decimal formulation it replaced bit-for-bit.

Plan shape (VERDICT r16 #7): the load-bearing optimizer behaviors r16
relied on are asserted so a Spark upgrade or refactor cannot silently
undo them —
- q1's aggregation buffers are LONG, not decimal;
- the limb-converted specs carry no decimal sum over raw events;
- the AQE reuse cascades actually reuse (ReusedExchange in the
  EXECUTED plan) for quality_unigram_lm / text_tfidf_topterms /
  sample_dsir_importance / events_rollup_cascade;
- materialized() keeps filters above the barrier projection (the
  value-transparency half lives in test_r16_optimizations.py).
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _bits(x: float) -> bytes:
    return struct.pack(">d", x)


# ---------------------------------------------------------------------------
# limbed micro-unit sums: parity with the decimal formulation
# ---------------------------------------------------------------------------


def test_limb_sum_matches_decimal_sum(spark):
    """Σ limbs recombined == sum(cast(value as decimal(18,6))) exactly,
    on random 6-decimal values including negatives and the int64-edge
    magnitudes the schema admits."""
    import random

    from dolphinbeat_spark.functions.money import limb_sums, limb_total, micros

    rng = random.Random(17)
    rows = [
        (i % 5, round(rng.uniform(-1e5, 1e6), rng.choice([0, 2, 6])))
        for i in range(5000)
    ]
    # domain-edge magnitudes (micros() is exact for |v*1e6| < 2^51 —
    # the documented 0.5-window bound) and tiny-value rounding cases
    rows += [(9, 2_251_799_813.685247), (9, -2_251_799_813.685247),
             (9, 0.000001), (9, -0.000001), (9, 0.0)]
    df = spark.createDataFrame(rows, "g int, v double")
    out = (
        df.groupBy("g")
        .agg(
            F.sum(F.col("v").cast("decimal(18,6)")).alias("dec"),
            *limb_sums(micros("v"), "lv"),
        )
        .select("g", "dec", limb_total("lv").alias("limbed"))
        .collect()
    )
    assert len(out) == 6
    for r in out:
        # exact decimal equality (both are Decimal objects)
        assert r.dec == r.limbed, r


def test_rollup_cascade_limbed_matches_decimal_reference(spark):
    """events_rollup_cascade's limb-converted minute level vs the old
    decimal formulation, run side by side on sf0.001 — every row and
    every total_value double bit-identical."""
    from dolphinbeat_spark.catalog import load
    from dolphinbeat_spark.operators.rollups import rollup_cascade

    e = load(spark, SF_SMALL, "events")
    new = rollup_cascade(e, "ts", ["event_type"], "value").orderBy(
        "grain", "bucket_start", "event_type"
    )

    # pre-r17 decimal formulation, verbatim
    def agg(df, bucket, srcs):
        return df.groupBy(bucket.alias("bucket_start"), "event_type").agg(
            F.sum(srcs[0]).alias("n_events"),
            F.sum(srcs[1]).alias("total_value"),
        )

    minutes = e.select(
        F.date_trunc("minute", "ts").alias("m"),
        "event_type",
        F.lit(1).cast("bigint").alias("__one"),
        F.col("value").cast("decimal(18,6)").alias("__val"),
    )
    minute_agg = agg(minutes, F.col("m"), ("__one", "__val"))
    hour_agg = agg(minute_agg, F.date_trunc("hour", "bucket_start"),
                   ("n_events", "total_value"))
    day_agg = agg(hour_agg, F.date_trunc("day", "bucket_start"),
                  ("n_events", "total_value"))

    def out(df, grain):
        return df.select(
            F.lit(grain).alias("grain"), "bucket_start", "event_type",
            "n_events",
            F.round("total_value", 2).cast("double").alias("total_value"),
        )

    old = (
        out(minute_agg, "minute")
        .unionByName(out(hour_agg, "hour"))
        .unionByName(out(day_agg, "day"))
        .orderBy("grain", "bucket_start", "event_type")
    )
    new_rows, old_rows = new.collect(), old.collect()
    assert len(new_rows) == len(old_rows) > 0
    for a, b in zip(new_rows, old_rows):
        assert (a.grain, a.bucket_start, a.event_type, a.n_events) == (
            b.grain, b.bucket_start, b.event_type, b.n_events)
        assert _bits(a.total_value) == _bits(b.total_value), a


# ---------------------------------------------------------------------------
# plan-shape regression tests
# ---------------------------------------------------------------------------


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_agg_buffers_are_long(spark):
    """q1's six money aggregates must stay primitive longs in the
    hash-agg buffer (the r16 win). A refactor reintroducing decimal
    partials would show sum(cast(... as decimal...)) here."""
    from dolphinbeat_spark.plans.registry import all_specs

    df = all_specs()["q1_pricing_summary"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "as bigint" in plan
    # decimal(22,4) / decimal(28,8) are the buffer types the decimal
    # formulation's sums would carry
    assert "decimal(22,4)" not in plan
    assert "decimal(28,8)" not in plan


def test_value_specs_carry_no_decimal_sum_over_raw_events(spark):
    """events_rollup_cascade / win_moving_sum_daily raw-cardinality
    aggregations run on limbed longs (r17); a decimal(28,6)/(24,6)
    sum buffer in the plan means the conversion regressed."""
    from dolphinbeat_spark.plans.registry import all_specs

    for name, buffer_ty in (
        ("events_rollup_cascade", "decimal(28,6)"),
        ("win_moving_sum_daily", "decimal(24,6)"),
    ):
        plan = _physical_plan(all_specs()[name].fn(spark, SF_SMALL))
        assert buffer_ty not in plan, name
        assert "shiftright" in plan, name


@pytest.mark.parametrize(
    "spec_name",
    [
        "quality_unigram_lm",
        "text_tfidf_topterms",
        "sample_dsir_importance",
        "events_rollup_cascade",
    ],
)
def test_reuse_cascades_reuse_at_runtime(spark, spec_name):
    """The r16 single-scan cascades depend on AQE stage reuse, which
    only shows in the EXECUTED plan: run the spec and assert at least
    one ReusedExchange survived (rules recorded in
    OPTIMIZATION_r16.md — canonical-equality is what breaks silently
    under refactors)."""
    from dolphinbeat_spark.plans.registry import all_specs

    df = all_specs()[spec_name].fn(spark, SF_SMALL)
    df.collect()
    plan = _physical_plan(df)
    assert "ReusedExchange" in plan, spec_name


def test_jaccard_shingle_filter_not_inlined(spark):
    """jaccard_blocked (wave 2): InferFiltersFromGenerate synthesizes
    `size(sh) > 0` from the shingle explode; without the materialized()
    barrier Catalyst pushes it to the scan with the whole shingle
    expression INLINED (split re-evaluated per element_at — the 17x
    trap, auto-generated). Assert no Filter node carries the shingle
    expression: the inferred filter must reference the barrier column."""
    from dolphinbeat_spark.plans.registry import all_specs

    df = all_specs()["dedup_ngram_jaccard"].fn(spark, SF_SMALL)
    df.collect()
    plan = _physical_plan(df)
    bad = [
        ln for ln in plan.splitlines()
        if "Filter" in ln and "array_distinct" in ln
    ]
    assert not bad, bad[:1]


def test_band_join_decode_chain_runs_once(spark):
    """dhash_near_dup_pairs (wave 2): the narrow (id, hash) barrier
    exchange below the self-join fork must be REUSED by both branches
    so the per-row Python decode chain executes once, not once per
    branch (plus once more for the output sort's range sampler)."""
    from dolphinbeat_spark.plans.registry import all_specs

    df = all_specs()["mm_image_dhash_neardup"].fn(spark, SF_SMALL)
    df.collect()
    plan = _physical_plan(df)
    assert "RoundRobinPartitioning" in plan
    assert "ReusedExchange" in plan


def test_canal_flat_rides_one_exchange(spark):
    """cdc_canal_flat (wave 2): the per-event groupBy and the contract
    order both ride the single range exchange on event_id —
    RangePartitioning(event_id) satisfies the aggregation's clustered
    distribution through the log_pos alias, so the plan must contain
    NO planner-inserted (ENSURE_REQUIREMENTS) exchange and no hash
    exchange; order comes from a partition-local sort."""
    from dolphinbeat_spark.plans.registry import all_specs

    df = all_specs()["cdc_canal_flat"].fn(spark, SF_SMALL)
    rows = df.collect()
    plan = _physical_plan(df)
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert ex, "expected the pinned range exchange"
    for ln in ex:
        assert "ENSURE_REQUIREMENTS" not in ln, ln
        assert "hashpartitioning" not in ln, ln
    # global order identical to the orderBy formulation it replaced
    assert rows == sorted(rows, key=lambda r: r.event_id)


def test_envelope_sort_first_order_identity(spark):
    """cdc_debezium_envelope / cdc_maxwell_envelope (wave 2): the
    sort-below-projection rewrite must yield exactly the rows of the
    old final-orderBy formulation, in event_id order."""
    from dolphinbeat_spark.plans.registry import all_specs

    for name in ("cdc_debezium_envelope", "cdc_maxwell_envelope"):
        df = all_specs()[name].fn(spark, SF_SMALL)
        rows = df.collect()
        assert rows == sorted(rows, key=lambda r: r.event_id), name
        assert len(rows) > 0, name


def test_approx_distinct_split_has_no_hll_buffers_under_expand(spark):
    """approx_distinct_parts (wave 2): the HLL++ sketches must never
    share an aggregate with the countDistinct Expand — the plan's
    Expand subtree must not contain approx_count_distinct partials."""
    from dolphinbeat_spark.plans.registry import all_specs

    df = all_specs()["approx_distinct_parts"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    assert "Expand" in plan  # the exact-distinct pass still expands
    for ln in plan.splitlines():
        # a gid-keyed aggregate (the distinct-rewrite stage, one group
        # per distinct value) must never carry HLL sketch functions
        if "HashAggregate" in ln and "gid" in ln:
            assert "approx_count_distinct" not in ln, ln[:200]


def _old_normalize_pk_changes(batch):
    """Pre-r17 three-branch union formulation of normalize_pk_changes,
    verbatim — the parity reference."""
    from dolphinbeat_spark.sinks.apply_changes import ROW_OPS

    ops = batch.filter(F.col("op_type").isin(*ROW_OPS))
    non_upd = ops.filter(F.col("op_type") != "update").withColumn(
        "__op_rank", F.lit(1))
    upd = ops.filter(F.col("op_type") == "update")
    null_map = F.lit(None).cast("map<string,string>")
    null_flags = F.lit(None).cast("map<string,boolean>")
    as_delete = (
        upd.withColumn("op_type", F.lit("delete"))
        .withColumn("after", null_map)
        .withColumn("after_null", null_flags)
        .withColumn("__op_rank", F.lit(0))
    )
    as_insert = (
        upd.withColumn("op_type", F.lit("insert"))
        .withColumn("before", null_map)
        .withColumn("before_null", null_flags)
        .withColumn("__op_rank", F.lit(2))
    )
    return non_upd.unionByName(as_delete).unionByName(as_insert)


def _envelope_fixture(spark):
    """Small envelope batch covering inserts, deletes, PK-changing and
    PK-stable updates, NULL-flagged image values, and a passthrough
    row_index column."""
    rows = []
    for i in range(40):
        op = ("insert", "update", "delete")[i % 3]
        before = {"id": str(i), "v": f"old{i}"} if op != "insert" else None
        bnull = {"id": False, "v": False} if op != "insert" else None
        # PK-changing update every 6th row; NULL-flagged v every 5th
        after_id = str(i + 1000) if op == "update" and i % 6 == 1 else str(i)
        after = {"id": after_id, "v": "" if i % 5 == 0 else f"new{i}"} \
            if op != "delete" else None
        anull = {"id": False, "v": i % 5 == 0} if op != "delete" else None
        rows.append(("binlog.000001", i, op, before, bnull, after, anull, i % 4))
    return spark.createDataFrame(
        rows,
        "log_name string, log_pos bigint, op_type string, "
        "before map<string,string>, before_null map<string,boolean>, "
        "after map<string,string>, after_null map<string,boolean>, "
        "row_index int",
    )


def test_normalize_pk_changes_matches_union_formulation(spark):
    """The one-scan explode formulation must yield exactly the rows of
    the historical three-branch union (same schema, same multiset)."""
    from dolphinbeat_spark.sinks.apply_changes import normalize_pk_changes

    env = _envelope_fixture(spark)
    new = normalize_pk_changes(env)
    old = _old_normalize_pk_changes(env)
    assert new.columns == old.columns
    key = lambda r: (r.log_pos, r["__op_rank"])  # noqa: E731
    new_rows = sorted(new.collect(), key=key)
    old_rows = sorted(old.collect(), key=key)
    assert len(new_rows) == len(old_rows) > 40  # updates split in two
    assert new_rows == old_rows


def test_normalize_minimal_matches_union_formulation(spark):
    """Same parity for the MINIMAL-image variant: keys resolved from
    the intact pre-split images, __k_*/__ok_* per the delete/insert
    halves, identical to the historical union."""
    from dolphinbeat_spark.sinks.apply_changes import (
        ROW_OPS,
        _img_val,
        _normalize_minimal,
    )

    env = _envelope_fixture(spark)
    new = _normalize_minimal(env, ["id"])

    # pre-r17 union formulation, verbatim
    ops = env.filter(F.col("op_type").isin(*ROW_OPS))
    new_key = F.coalesce(_img_val("after", "id"), _img_val("before", "id"))
    old_key = F.coalesce(_img_val("before", "id"), _img_val("after", "id"))
    non_upd = ops.filter(F.col("op_type") != "update").select(
        "*", new_key.alias("__k_id"), old_key.alias("__ok_id")
    ).withColumn("__op_rank", F.lit(1))
    upd = ops.filter(F.col("op_type") == "update")
    null_map = F.lit(None).cast("map<string,string>")
    null_flags = F.lit(None).cast("map<string,boolean>")
    as_delete = (
        upd.select("*", old_key.alias("__k_id"), old_key.alias("__ok_id"))
        .withColumn("op_type", F.lit("delete"))
        .withColumn("after", null_map)
        .withColumn("after_null", null_flags)
        .withColumn("__op_rank", F.lit(0))
    )
    as_insert = (
        upd.select("*", new_key.alias("__k_id"), old_key.alias("__ok_id"))
        .withColumn("op_type", F.lit("insert"))
        .withColumn("before", null_map)
        .withColumn("before_null", null_flags)
        .withColumn("__op_rank", F.lit(2))
    )
    old = non_upd.unionByName(as_delete).unionByName(as_insert)

    assert new.columns == old.columns
    key = lambda r: (r.log_pos, r["__op_rank"])  # noqa: E731
    new_rows = sorted(new.collect(), key=key)
    old_rows = sorted(old.collect(), key=key)
    assert len(new_rows) == len(old_rows) > 40
    assert new_rows == old_rows


def test_apply_changes_normalize_is_single_scan(spark):
    """cdc_apply_changes must read the envelope source ONCE (the union
    formulation scanned it three times): one scan node, no Union, and
    the explode-synthesized filter must not inline the image maps
    (it references the barrier column, so no map(...) in any Filter)."""
    from dolphinbeat_spark.plans.registry import all_specs

    df = all_specs()["cdc_apply_changes"].fn(spark, SF_SMALL)
    df.collect()
    # AQE's toString carries BOTH the final and the initial plan; the
    # contract applies to the final one
    plan = _physical_plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1, plan.count("Scan parquet")
    assert "Union" not in plan
    bad = [
        ln for ln in plan.splitlines()
        if ln.strip().startswith("+- Filter") and "get_json_object" in ln
    ]
    assert not bad, bad[:1]


def test_profile_stats_split_keeps_hash_distinct(spark):
    """profile_table_stats (r17): the distinct pass must never share an
    aggregate with the stringly min/max buffers — no SortAggregate may
    sit above the Expand (the old fused shape sorted (|cols|+1)x|table|
    expanded rows), and values must be unchanged vs the fused agg."""
    from dolphinbeat_spark.plans.registry import all_specs

    df = all_specs()["profile_table_stats"].fn(spark, SF_SMALL)
    rows = df.collect()
    plan = _physical_plan(df)
    assert "Expand" in plan  # the distinct rewrite still expands
    # walk the tree: no SortAggregate node may have Expand below it
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "SortAggregate" in ln:
            depth = len(ln) - len(ln.lstrip())
            for below in lines[i + 1:]:
                d = len(below) - len(below.lstrip())
                if d <= depth and ("+-" in below or ":-" in below):
                    break
                assert "Expand" not in below, "SortAggregate over Expand"
    # distinct counts really are distinct counts (spot-check vs data)
    import duckdb

    con = duckdb.connect()
    for r in rows:
        got = con.execute(
            f"SELECT COUNT(DISTINCT {r.column_name}), COUNT(*) FROM "
            f"read_parquet('{SF_SMALL}/lineitem.parquet')"
        ).fetchone()
        assert (r.n_distinct, r.n_rows) == got, r


def test_materialized_blocks_pushdown_in_training_filter(spark):
    """The barrier must keep the gate work ABOVE the widen exchange in
    the actual pipeline_training_data_filter plan: the scan node's
    pushed filters must stay trivial (isnotnull-only), proving no gate
    expression was substituted below the exchange."""
    from dolphinbeat_spark.plans.registry import all_specs

    df = all_specs()["pipeline_training_data_filter"].fn(spark, SF_SMALL)
    plan = _physical_plan(df)
    # the gate's padded-text marker scan must not appear twice (one
    # per-filter substitution + one projection = the regression shape)
    assert plan.count("monotonically_increasing_id") >= 1
    scan_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    for ln in scan_lines:
        assert "contains" not in ln.lower(), ln
