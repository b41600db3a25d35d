"""Parity check: Arrow/numpy brute-force top-k vs the Catalyst fold.

Same semantics up to float summation order; any rank disagreement must
be a genuine near-tie (|cosine difference| ~ ulps), not a logic bug.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_pandas,
)

SF_DIR = "/root/testdata/sf0.01"
K = 5


def test_pandas_topk_matches_catalyst(spark):
    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0)
    jvm = brute_force_topk(q, emb, "vec_id", "embedding", K).collect()
    arrow = brute_force_topk_pandas(q, emb, "vec_id", "embedding", K).collect()

    def by_query(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(r)
        for v in out.values():
            v.sort(key=lambda r: r["rank"])
        return out

    a, b = by_query(jvm), by_query(arrow)
    assert a.keys() == b.keys()
    for qid in a:
        ja, ar = a[qid], b[qid]
        assert len(ja) == len(ar) == K
        sa = {r["neighbor_id"] for r in ja}
        sb = {r["neighbor_id"] for r in ar}
        if sa != sb:
            # allowed only for near-ties at the k-th boundary
            kth = ja[-1]["cosine"]
            for r in ja + ar:
                if r["neighbor_id"] in sa.symmetric_difference(sb):
                    assert abs(r["cosine"] - kth) < 1e-9, (
                        f"query {qid}: neighbor sets diverge beyond "
                        f"float noise: {sa} vs {sb}"
                    )
        # where the sets agree, cosines agree to float noise
        for ra, rb in zip(ja, ar):
            if ra["neighbor_id"] == rb["neighbor_id"]:
                assert abs(ra["cosine"] - rb["cosine"]) < 1e-9


def test_ivf_with_kmeans_centroids(spark):
    """The trained-quantizer slot: MLlib k-means centroids feed the
    same IVF plan; results carry exact cosines and beat nothing-found
    (recall checked loosely vs brute force on the tiny SF)."""
    from dolphinbeat_spark.catalog import load
    from dolphinbeat_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
        kmeans_centroids,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings", widen=True)
    cents = kmeans_centroids(emb, "vec_id", "embedding", k=8)
    assert cents.count() == 8
    q = emb.filter(F.col("vec_id") % 25 == 0)
    ivf = ivf_ann_topk(q, emb, cents, "vec_id", "embedding", k=5, nprobe=3)
    rows = ivf.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert per_q and all(len(v) == 5 for v in per_q.values())
    # deterministic across re-runs (fixed seed)
    again = ivf_ann_topk(
        q, emb, kmeans_centroids(emb, "vec_id", "embedding", k=8),
        "vec_id", "embedding", k=5, nprobe=3,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # loose recall vs exact: probing 3/8 trained cells must recover a
    # reasonable share of true top-5 neighbors
    truth = brute_force_topk(q, emb, "vec_id", "embedding", 5).collect()
    true_pairs = {(r["query_id"], r["neighbor_id"]) for r in truth}
    got_pairs = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(true_pairs & got_pairs) / len(true_pairs)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"


def test_sample_kmeans_centroids_recovers_clusters(spark):
    """Driver-side Lloyd's (the faiss codebook pattern): on
    well-separated synthetic clusters it recovers the cluster means,
    is deterministic under a fixed seed, and its centroids drive the
    same IVF plan to exact-neighbor recall."""
    import numpy as np

    from dolphinbeat_spark.operators.similarity import (
        ivf_ann_topk,
        sample_kmeans_centroids,
    )

    rng = np.random.default_rng(7)
    centers = np.array(
        [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0], [-10.0, 0.0, 0.0]]
    )
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [float(v) for v in c + rng.normal(0, 0.1, 3)]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    cents = sample_kmeans_centroids(emb, "vec_id", "embedding", k=4, seed=3)
    got = sorted([tuple(round(v) for v in r["cv"]) for r in cents.collect()])
    want = sorted([tuple(int(v) for v in c) for c in centers])
    assert got == want, f"centroids off: {got} vs {want}"

    again = sample_kmeans_centroids(emb, "vec_id", "embedding", k=4, seed=3)
    assert sorted(map(tuple, cents.collect())) == sorted(map(tuple, again.collect()))

    # k > distinct points degrades gracefully (k clamped, no crash)
    tiny = spark.createDataFrame(rows[:3], "vec_id bigint, embedding array<float>")
    assert sample_kmeans_centroids(tiny, "vec_id", "embedding", k=8).count() == 3

    # with a perfect codebook, nprobe=1 IVF is exact on these clusters
    q = emb.filter(F.col("vec_id") % 25 == 0)
    ivf = ivf_ann_topk(q, emb, cents, "vec_id", "embedding", k=3, nprobe=1)
    per_q = {}
    for r in ivf.collect():
        per_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for qid, ns in per_q.items():
        assert all(n % 4 == qid % 4 for n in ns), (
            "IVF with trained codebook leaked a cross-cluster neighbor"
        )


def test_kmeans_warns_when_sample_cap_saturates_derived_k(spark):
    """Past sample_cap, a DERIVED k saturates while the corpus grows —
    the warning makes the silent apples-to-oranges recall comparison
    loud (r5 review nit). Explicit k stays silent."""
    import warnings

    from dolphinbeat_spark.operators.similarity import sample_kmeans_centroids

    df = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"), (F.col("id") % 5).cast("double")
        ).alias("embedding"),
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sample_kmeans_centroids(
            df, "vec_id", "embedding", k=lambda n: max(2, n // 8),
            sample_cap=16, max_iter=2,
        )
    assert any("sample_cap" in str(x.message) for x in w), "no saturation warning"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sample_kmeans_centroids(
            df, "vec_id", "embedding", k=3, sample_cap=16, max_iter=2
        )
    assert not any("sample_cap" in str(x.message) for x in w)
