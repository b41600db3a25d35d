"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5: it has none). Three invariants that underpin the
engine's correctness story:

1. hash64 engine-parity: the portable hash produces identical bigints
   in Spark and DuckDB for arbitrary unicode strings — the foundation
   every sketch oracle (MinHash/SimHash/LSH) rests on.
2. asof_join semantics: the union-scan implementation matches a naive
   per-row Python oracle on random keyed event sets.
3. last_op_per_key: the CDC batch reduction picks exactly the op with
   the max (log_name, log_pos) per key.

Examples are kept small (Spark round-trip per example is ~100 ms);
the value is the adversarial inputs hypothesis finds (empty strings,
unicode astral chars, equal timestamps), not bulk.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dolphinbeat_spark.functions.hashes import hash64, hash64_sql

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# strings DuckDB/Spark can both hold: no NUL, valid unicode
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=0,
    max_size=40,
)


@given(strings=st.lists(_text, min_size=1, max_size=8, unique=True))
@settings(**_SETTINGS)
def test_hash64_engine_parity(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {
        r["s"]: r["h"] for r in df.select("s", hash64(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in strings:
        (expect,) = con.execute(
            f"SELECT {hash64_sql('?')}".replace("md5(?)", "md5(CAST(? AS VARCHAR))"),
            [s],
        ).fetchone()
        assert got[s] == expect, f"hash mismatch for {s!r}"


@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.integers(0, 50),  # time
            st.booleans(),  # side: True=left
        ),
        min_size=1,
        max_size=14,
    )
)
@settings(**_SETTINGS)
def test_asof_join_matches_naive_oracle(spark, data):
    from dolphinbeat_spark.operators.asof import asof_join

    lefts = [
        (i, k, t) for i, (k, t, is_l) in enumerate(data) if is_l
    ]  # (lid, key, time)
    rights_raw = [(k, t) for (k, t, is_l) in data if not is_l]
    # asof_join requires unique (key, right_time): dedup keeping max payload
    rights = {}
    for j, (k, t) in enumerate(rights_raw):
        rights[(k, t)] = max(rights.get((k, t), -1), j * 10)
    right_rows = [(k, t, payload) for (k, t), payload in rights.items()]
    if not lefts or not right_rows:
        return
    left_df = spark.createDataFrame(lefts, ["lid", "k", "lt"]).withColumn(
        "lt", F.timestamp_seconds("lt")
    )
    right_df = spark.createDataFrame(right_rows, ["k", "rt", "payload"]).withColumn(
        "rt", F.timestamp_seconds("rt")
    )
    out = {
        r["lid"]: r["r_payload"]
        for r in asof_join(
            left_df, right_df, on="k", left_time="lt", right_time="rt"
        ).collect()
    }
    for lid, k, lt in lefts:
        cands = [(t, p) for (kk, t), p in rights.items() if kk == k and t <= lt]
        expect = max(cands)[1] if cands else None
        assert out[lid] == expect, f"lid={lid} key={k} t={lt}"


@given(
    ops=st.lists(
        st.tuples(
            st.integers(1, 3),  # key id
            st.sampled_from(["insert", "update", "delete"]),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_last_op_per_key_property(spark, ops):
    from dolphinbeat_spark.envelope import ENVELOPE_SCHEMA, empty_op
    from dolphinbeat_spark.sinks.apply_changes import last_op_per_key

    rows = []
    for pos, (kid, op) in enumerate(ops):
        img = {"id": str(kid)}
        rows.append(
            empty_op(
                op_type=op,
                log_name="b.1",
                log_pos=100 + pos,
                before=img if op != "insert" else None,
                after=img if op != "delete" else None,
            )
        )
    df = spark.createDataFrame(rows, ENVELOPE_SCHEMA)
    winners = {
        r["__k_id"]: (r["op_type"], r["log_pos"])
        for r in last_op_per_key(df, ["id"]).collect()
    }
    expect = {}
    for pos, (kid, op) in enumerate(ops):
        expect[str(kid)] = (op, 100 + pos)  # later pos always wins
    assert winners == expect


# -- CDC apply-changes vs a pure-Python replay oracle -----------------------
#
# Random op sequences (insert / update-with-possible-PK-change / delete,
# split across arbitrary batch boundaries) applied through apply_batch
# must land on the same final keyed state a trivial sequential dict
# replay produces. This is the property the reference's whole delivery
# pipeline exists to preserve (canal/sync.go ordering + kafka.go seq).

_KEYS = ["1", "2", "3", "4"]
_VALS = ["a", "b", "c", ""]


@st.composite
def _op_sequences(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    ops, live = [], set()
    for _ in range(n):
        kind = draw(st.sampled_from(["insert", "update", "delete"]))
        if kind == "insert":
            free = [k for k in _KEYS if k not in live]
            if not free:
                kind = "update"
            else:
                k = draw(st.sampled_from(free))
                ops.append(("insert", None, k, draw(st.sampled_from(_VALS))))
                live.add(k)
                continue
        if not live:
            continue
        k = draw(st.sampled_from(sorted(live)))
        if kind == "delete":
            ops.append(("delete", k, None, None))
            live.discard(k)
        else:  # update: may change the PK to any key not otherwise live
            targets = sorted((set(_KEYS) - live) | {k})
            nk = draw(st.sampled_from(targets))
            ops.append(("update", k, nk, draw(st.sampled_from(_VALS))))
            live.discard(k)
            live.add(nk)
    return ops


def _dict_replay(ops):
    state = {}
    for kind, old_k, new_k, v in ops:
        if kind == "insert":
            state[new_k] = v
        elif kind == "delete":
            state.pop(old_k, None)
        else:
            state.pop(old_k, None)
            state[new_k] = v
    return state


@given(ops=_op_sequences(), split=st.integers(min_value=0, max_value=12))
@settings(**_SETTINGS)
def test_apply_batch_matches_sequential_replay(spark, tmp_path_factory, ops, split):
    from dolphinbeat_spark.envelope import ENVELOPE_SCHEMA, empty_op
    from dolphinbeat_spark.sinks.apply_changes import apply_batch

    if not ops:
        return
    rows = []
    for i, (kind, old_k, new_k, v) in enumerate(ops):
        common = dict(server_id=1, log_name="binlog.000001", log_pos=100 + 20 * i,
                      db="d", table="t", schema_version=1)
        if kind == "insert":
            rows.append(empty_op(op_type="insert",
                                 after={"id": new_k, "v": v},
                                 after_null={"id": False, "v": False}, **common))
        elif kind == "delete":
            rows.append(empty_op(op_type="delete",
                                 before={"id": old_k, "v": ""},
                                 before_null={"id": False, "v": True}, **common))
        else:
            rows.append(empty_op(op_type="update",
                                 before={"id": old_k, "v": ""},
                                 before_null={"id": False, "v": True},
                                 after={"id": new_k, "v": v},
                                 after_null={"id": False, "v": False}, **common))
    snap = str(tmp_path_factory.mktemp("prop") / "snap")
    cut = min(split, len(rows))
    for chunk in (rows[:cut], rows[cut:]):
        if chunk:
            apply_batch(spark, spark.createDataFrame(chunk, ENVELOPE_SCHEMA),
                        snap, ["id"], ["v"])
    import os as _os

    got = (
        {r["id"]: r["v"] for r in spark.read.parquet(snap).collect()}
        if _os.path.exists(snap)
        else {}
    )
    assert got == _dict_replay(ops)


def test_short_doc_shingles_empty_not_crash(spark):
    """A document shorter than k tokens has NO k-shingles — Spark's
    sequence(1, 0) is DESCENDING ([1, 0]), which used to drive
    element_at out of bounds under ANSI and kill the query (the
    production k=13 on any real corpus hits this immediately)."""
    from pyspark.sql import functions as F

    from dolphinbeat_spark.operators.dedup import ngram_decontaminate
    from dolphinbeat_spark.operators.text import word_shingles

    df = spark.createDataFrame(
        [(1, "only three tokens"),
         (2, "longer document with exactly seven tokens here"),
         (3, "only three tokens")],
        "doc_id long, text string",
    )
    sizes = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", F.size(word_shingles("text", 13)).alias("n")).collect()}
    assert sizes == {1: 0, 2: 0, 3: 0}
    # k at the boundary: a 3-token doc has exactly one 3-shingle
    assert df.filter("doc_id = 1").select(
        F.size(word_shingles("text", 3)).alias("n")).collect()[0]["n"] == 1
    # decontaminate with k > every doc length: no rows, no crash
    assert ngram_decontaminate(
        df, "doc_id", "text", (F.col("doc_id") == 1), k=13
    ).collect() == []
    # and with matching k the duplicated short doc is flagged
    got = ngram_decontaminate(
        df, "doc_id", "text", (F.col("doc_id") == 1), k=3
    ).collect()
    assert [r["train_doc_id"] for r in got] == [3]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 1)),
                min_size=1, max_size=800))
def test_mq_coder_roundtrip_property(seq):
    """T.88 MQ coder (r13): ANY multi-context decision sequence
    roundtrips through encode -> flush -> decode — the
    property-based widening of the spec's H.2 vector pin."""
    from dolphinbeat_spark.operators.jbig2 import MQDecoder, MQEncoder

    enc = MQEncoder()
    icx, mps = [0] * 16, [0] * 16
    for cx, d in seq:
        enc.encode(icx, mps, cx, d)
    blob = enc.flush()
    dec = MQDecoder(blob)
    icx, mps = [0] * 16, [0] * 16
    assert [dec.decode(icx, mps, cx) for cx, _ in seq] \
        == [d for _, d in seq]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(-(1 << 31), (1 << 31) - 1)),
                min_size=1, max_size=300))
def test_jbig2_int_coder_roundtrip_property(vals):
    """T.88 Annex A arithmetic integers (r13): every 32-bit value and
    OOB roundtrips through one adaptive context."""
    from dolphinbeat_spark.operators.jbig2 import (
        MQDecoder, MQEncoder, _IntCtx, _decode_int, _encode_int,
    )

    enc = MQEncoder()
    ctx = _IntCtx()
    for v in vals:
        _encode_int(enc, ctx, v)
    dec = MQDecoder(enc.flush())
    ctx = _IntCtx()
    assert [_decode_int(dec, ctx) for _ in vals] == vals


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.data_too_large])
@given(st.binary(min_size=0, max_size=20000),
       st.sampled_from([None, 7, 100, 900]),
       st.sampled_from([10, 12, 16]))
def test_compress_z_roundtrip_property(data, clear_every, maxbits):
    """compress(1) .Z (r13): arbitrary bytes roundtrip through the
    writer (incl. adaptive CLEAR emission with the historical group
    padding) and the padding-aware reader."""
    from dolphinbeat_spark.operators.lzw_z import decode_z, encode_z

    z = encode_z(data, maxbits=maxbits, clear_every=clear_every)
    assert decode_z(z) == data


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=5000), min_size=1,
                max_size=4))
def test_gzip_multi_capped_property(parts):
    """sources/inflate.py (r13): concatenated gzip members roundtrip
    under a generous cap; a cap below the total inflated size always
    raises the typed error, never over-produces."""
    import zlib

    from dolphinbeat_spark.sources.inflate import (
        InflateError, gzip_multi_capped,
    )

    blob = b""
    total = 0
    for p in parts:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        blob += co.compress(p) + co.flush()
        total += len(p)
    want = b"".join(parts)
    assert gzip_multi_capped(blob, total + 1) == want
    if total > 0:
        with pytest.raises(InflateError):
            gzip_multi_capped(blob, total - 1)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 200), min_size=72, max_size=72),
       st.integers(1, 55))
def test_dhash64_brightness_invariance_property(vals, shift):
    """operators/imagehash.py (r13): the difference hash is invariant
    under any non-saturating brightness shift and 2x upscaling, for
    ANY block image."""
    import numpy as np

    from dolphinbeat_spark.operators.imagehash import dhash64

    grid = np.array(vals, np.int32).reshape(8, 9)
    img = np.repeat(np.repeat(grid, 5, 0), 5, 1)
    h = dhash64(img)
    assert dhash64(img + shift) == h
    assert dhash64(np.repeat(np.repeat(img, 2, 0), 2, 1)) == h
