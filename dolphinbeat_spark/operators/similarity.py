"""Similarity search over embedding columns (``array<float>``).

- **brute-force top-k**: exact cosine against the full corpus. The
  query set is broadcast; the corpus is scanned once — per-row map +
  a windowed top-k, no pair materialization beyond (q, c, sim).
- **cosine near-dup pairs**: all a<b pairs above a threshold (the
  embedding variant of dedup).
- **LSH-bucketed ANN**: deterministic random-hyperplane signatures
  (coefficients derived from the portable md5 hash, so the DuckDB
  oracle regenerates the identical planes); candidates only within a
  bucket → the scale path: bucket-join instead of cross-join.

All vector math is Catalyst higher-order functions folded strictly
left-to-right in DOUBLE — bit-identical to the oracle's list_reduce.

- **IVF ANN**: inverted-file index — a deterministic coarse quantizer
  (sampled centroids; production would swap in MLlib k-means, same
  plan shape) assigns every vector to its nearest cell once, queries
  probe their nprobe nearest cells only.

At 100 TB: brute-force is O(|Q|·|C|) and only sane with a broadcast
query set; the LSH path shuffles each vector once to its bucket and
joins within buckets (collision-bounded fan-in, AQE skew backstop).
IVF has the same shape with a data-adaptive partitioner: assignment is
a map-only pass (centroids broadcast), the cell join is an equi-join,
and recall/cost tunes with (|cells|, nprobe) instead of bit width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dolphinbeat_spark.functions.vector import (
    cosine_from_parts,
    cosine_similarity,
    dot,
    l2_norm,
)

HYPERPLANE_SALT = "rh"

# Per-pair scoring convention (r16, optimization guide §1.2/§2.3):
# every pairwise cosine below is dot/(norm_a*norm_b) with the NORMS
# hoisted into per-side projections — computed once per ROW and
# carried as one double through the join instead of recomputed per
# PAIR (measured 15.5 s -> 4.9 s at 10M pairs; see
# functions/vector.py, including the measured negative result for
# unrolling the folds themselves).


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k cosine neighbors (self excluded).

    Output: (query_id, neighbor_id, rank, cosine).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_parts(
                dot("__qv", "__cv"), F.col("__qn"), F.col("__cn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def brute_force_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Arrow/numpy variant of :func:`brute_force_topk`: the query set
    is collected (it must be broadcast-small either way), each corpus
    partition is scored as ONE (m×d)·(d×n) BLAS matmul inside
    mapInPandas, per-partition top-k rows are emitted, and a final
    window reduces to the global top-k.

    Same two-phase reduction shape as TakeOrdered: the shuffle carries
    at most |Q|·k rows per partition. Versus the Catalyst fold this
    trades JVM codegen for vectorized BLAS — wins when d·|C| is large
    enough that per-element expression interpretation dominates
    (see tests/test_similarity_pandas.py for the parity check).
    Float caveat: numpy's pairwise-summed dot differs from the
    left-fold in final ulps, so ranks can swap at exact near-ties —
    this is the documented cost of the fast path.
    """
    import numpy as np
    import pandas as pd

    qp = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).toPandas()
    qids = qp["qid"].to_numpy()
    Q = np.stack(qp["qv"].to_numpy()).astype("float64")  # (m, d)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy()
            C = np.stack(pdf[vec_col].to_numpy()).astype("float64")  # (n, d)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Qn @ Cn.T  # (m, n)
            n = S.shape[1]
            kk = min(k + 1, n)  # +1 to survive self-exclusion
            idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(qids, kk),
                "neighbor_id": cids[idx].ravel(),
                "cosine": np.take_along_axis(S, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All id_a < id_b pairs with cosine >= threshold (exact).

    O(n²) pair materialization — BOUNDED INPUTS ONLY: the truth side of
    recall evals and tiny reference sets. The scale path is
    :func:`cosine_near_dup_pairs_banded` (equi-join on LSH bands)."""
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        l2_norm(F.col(vec_col)).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        l2_norm(F.col(vec_col)).alias("__nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine_from_parts(
                dot("__va", "__vb"), F.col("__na"), F.col("__nb")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_band_keys(vec_col: Column | str, num_planes: int, bands: int, dim: int) -> Column:
    """Array of (band, band_key) structs: the hyperplane signature split
    into ``bands`` contiguous groups of ``num_planes // bands`` bits.
    Pure integer arithmetic on the portable signature — the DuckDB
    oracle regenerates identical keys."""
    bits = num_planes // bands
    sig = lsh_bucket(vec_col, num_planes, dim)
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            (
                F.floor(sig / F.pow(F.lit(2.0), (b * bits).cast("double"))).cast("bigint")
                % F.lit(2**bits)
            ).alias("band_key"),
        ),
    )


def cosine_near_dup_pairs_banded(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    num_planes: int,
    bands: int,
    dim: int,
) -> DataFrame:
    """Near-dup pairs via banded random-hyperplane LSH: candidates are
    pairs sharing at least one band of the signature; exact cosine is
    scored ONLY within candidates.

    The scale shape: each vector shuffles once per band to its
    (band, band_key) bucket, candidates come from an equi-join inside
    buckets (never an all-pairs product), pair dedup is a shuffle on
    the candidate set, and the vector fetch is two keyed joins. Recall
    against the exact all-pairs form is the standard OR-amplified bound
    1 - (1 - p^bits)^bands with p = 1 - theta/pi per bit — tune
    (num_planes, bands) to the target threshold; high thresholds
    (true near-dups) need far fewer planes than loose ones.
    """
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.explode(lsh_band_keys(vec_col, num_planes, bands, dim)).alias("__bk"),
    ).select("__id", F.col("__bk.band").alias("band"), F.col("__bk.band_key").alias("band_key"))
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), ["band", "band_key"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        l2_norm(F.col(vec_col)).alias("__na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        l2_norm(F.col(vec_col)).alias("__nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b",
            cosine_from_parts(
                dot("__va", "__vb"), F.col("__na"), F.col("__nb")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def projection_coeff(j: int, d: int, salt: str = "jl") -> float:
    """Deterministic pseudo-random coefficient in [-1, 1] for plane j,
    dim d — THE single source of truth for every projection matrix
    (LSH hyperplanes, JL). Derivation: first 12 hex digits of
    md5("{salt}-{j}-{d}") as an int, mapped into [-1, 1] — exactly
    what the DuckDB oracles regenerate SQL-side (hash64_sql), so
    driver-materialized matrices stay bit-identical cross-engine."""
    import hashlib

    h = int(hashlib.md5(f"{salt}-{j}-{d}".encode()).hexdigest()[:12], 16)
    return (h % 2001 - 1000) / 1000.0


def random_projection(
    vec_col: Column | str, out_dim: int, dim: int, salt: str = "jl"
) -> Column:
    """Johnson-Lindenstrauss random projection: dim → out_dim with a
    deterministic dense ±-random matrix. JL preserves pairwise
    distances within (1±ε) for out_dim = O(log n / ε²) — the standard
    dimensionality cut before a brute-force or IVF scan when the
    embedding width, not the row count, is the cost driver (distance
    cost drops dim/out_dim-fold for every query).

    The matrix is materialized ONCE driver-side (projection_coeff —
    the same md5 derivation the DuckDB oracle regenerates) and
    embedded as literal arrays: scoring a row costs out_dim ordered
    folds, never out_dim×dim per-row md5 evaluations. Fold order: per
    output dim, ascending input dims — bit-identical cross-engine."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    dv = v.cast("array<double>")
    out = []
    for j in range(out_dim):
        row = F.array(*[
            F.lit(projection_coeff(j, d, salt)) for d in range(1, dim + 1)
        ])
        out.append(
            F.aggregate(
                F.zip_with(dv, row, lambda a, c: a * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*out)


def lsh_bucket(vec_col: Column | str, num_planes: int, dim: int) -> Column:
    """Random-hyperplane signature: bit p = 1 iff dot(vec, plane_p) >= 0.

    Plane coefficients are materialized ONCE driver-side
    (projection_coeff with the hyperplane salt — the exact values the
    DuckDB oracle regenerates via md5) and embedded as literal arrays:
    signing a row costs num_planes ordered folds, never
    num_planes×dim per-row md5 evaluations (~770 md5/row at the
    default 12×64 — measured 5× off the near-dup specs)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    dv = v.cast("array<double>")
    out = None
    for p in range(num_planes):
        plane = F.array(*[
            F.lit(projection_coeff(p, d, HYPERPLANE_SALT)) for d in range(1, dim + 1)
        ])
        dot_p = F.aggregate(
            F.zip_with(dv, plane, lambda a, c: a * c),
            F.lit(0.0),
            lambda acc_, x: acc_ + x,
        )
        bit = F.when(dot_p >= 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        out = bit if out is None else out + bit
    return out


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    n_cells: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment (cells 1..n_cells per vector, by
    descending cosine, centroid id as tie-break). Centroids are
    broadcast; for the n_cells=1 corpus-assignment path the argmax is
    a max_by AGGREGATE — partial-aggregated map-side, so the exchange
    carries one row per vector, never the |corpus|×|centroids| scored
    rows (a row_number window would shuffle them all). The multi-cell
    path (query probes; tiny input) keeps the window formulation.
    Output: (out_id, vec, cell, cell_rank)."""
    v = df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__vn"),
    )
    c = centroids.select(
        F.col("cid").alias("cell"), F.col("cv").alias("__c"),
        l2_norm(F.col("cv")).alias("__cn"),
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        out_id, "__v", "cell",
        cosine_from_parts(
            dot("__v", "__c"), F.col("__vn"), F.col("__cn")
        ).alias("__sim"),
    )
    if n_cells == 1:
        # argmax by (sim DESC, cell ASC): max_by over the unique
        # ordering struct (sim, -cell) — ties on sim resolve to the
        # smallest centroid id, matching the window formulation
        best = scored.groupBy(out_id).agg(
            F.max_by(
                F.struct(F.col("cell"), F.col("__v")),
                F.struct(F.col("__sim"), (-F.col("cell")).alias("__negc")),
            ).alias("__best")
        )
        return best.select(
            out_id,
            F.col("__best.__v").alias("vec"),
            F.col("__best.cell").alias("cell"),
            F.lit(1).alias("cell_rank"),
        )
    w = Window.partitionBy(out_id).orderBy(F.col("__sim").desc(), F.col("cell"))
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= n_cells)
        .select(out_id, F.col("__v").alias("vec"), "cell", "cell_rank")
    )


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single
    nearest cell; each query probes its ``nprobe`` nearest cells and
    scores exact cosine within them. ``centroids`` must have columns
    (cid, cv)."""
    inv = ivf_assign(corpus, centroids, id_col, vec_col, "neighbor_id", 1).select(
        "neighbor_id", F.col("vec").alias("__cv"), "cell",
        l2_norm(F.col("vec")).alias("__cn"),
    )
    probes = ivf_assign(queries, centroids, id_col, vec_col, "query_id", nprobe).select(
        "query_id", F.col("vec").alias("__qv"), "cell",
        l2_norm(F.col("vec")).alias("__qn"),
    )
    scored = (
        F.broadcast(probes)
        .join(inv, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            cosine_from_parts(
                dot("__qv", "__cv"), F.col("__qn"), F.col("__cn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    num_planes: int,
    dim: int,
) -> DataFrame:
    """Approximate top-k: exact cosine but only within the query's
    hyperplane bucket. Equi-join on bucket replaces the cross join."""
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lsh_bucket(vec_col, num_planes, dim).alias("bucket"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        lsh_bucket(vec_col, num_planes, dim).alias("bucket"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        F.broadcast(qb)
        .join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            cosine_from_parts(
                dot("__qv", "__cv"), F.col("__qn"), F.col("__cn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    dim: int,
) -> DataFrame:
    """Product-quantization encode: split each vector into ``m``
    subvectors and store, per subspace, the id of the nearest codeword
    (min L2, smallest cid on ties) — the corpus compresses from
    dim×float to m small ints (the classic Jégou-style PQ memory
    story: 64 floats → 4 codes here).

    ``codebook`` needs (cid, cv) full-dim rows (sampled vectors or
    trained centroids — same contract as IVF). Scale shape: codebook
    broadcast, per-subspace argmin as a ``min_by`` partial aggregate —
    the exchange carries one row per (vector, subspace), never the
    scored products. Output: (pq_id, s, code) long form.
    """
    if dim % m:
        raise ValueError(f"dim={dim} must divide evenly into m={m} subspaces")
    sub = dim // m
    cb = codebook.select(
        F.col("cid"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("s"),
                    F.slice("cv", s * sub + 1, sub).alias("__csub"),
                )
                for s in range(m)
            ])
        ).alias("e"),
    ).select(F.col("cid"), F.col("e.s").alias("s"), F.col("e.__csub").alias("__csub"))
    v = corpus.select(F.col(id_col).alias("pq_id"), F.col(vec_col).alias("__v"))
    vsub = v.select(
        "pq_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("s"),
                    F.slice("__v", s * sub + 1, sub).alias("__vsub"),
                )
                for s in range(m)
            ])
        ).alias("e"),
    ).select("pq_id", F.col("e.s").alias("s"), F.col("e.__vsub").alias("__vsub"))
    dist2 = F.aggregate(
        F.zip_with(
            F.col("__vsub").cast("array<double>"),
            F.col("__csub").cast("array<double>"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = vsub.join(F.broadcast(cb), "s").select(
        "pq_id", "s", "cid", dist2.alias("__d2")
    )
    return scored.groupBy("pq_id", "s").agg(
        F.min_by(F.col("cid"), F.struct(F.col("__d2"), F.col("cid"))).alias("code")
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    m: int,
    dim: int,
) -> DataFrame:
    """PQ asymmetric-distance top-k: score each query against the
    CODES, not the vectors — approx_dot(q, x) = Σ_s dot(q_sub[s],
    codeword(code_s)_sub[s]), i.e. the exact dot against the
    PQ-reconstructed corpus. The scan reads m ints per corpus vector
    instead of dim floats (the PQ bandwidth story); composing with IVF
    cell filtering gives IVFPQ.

    Determinism: the m per-subspace dots are summed as a FIXED-ORDER
    column expression (not a shuffle-order-dependent aggregate), so
    scores are bit-identical to the oracle's ordered fold. Output:
    (query_id, neighbor_id, rank, approx_dot)."""
    sub = dim // m
    codes = pq_encode(corpus, codebook, id_col, vec_col, m, dim)
    wide = codes.groupBy("pq_id").pivot("s", list(range(m))).agg(
        F.first("code")
    )
    # attach each subspace's codeword subvector (m broadcast joins on
    # the small codebook), then score against broadcast queries
    for s in range(m):
        cb_s = codebook.select(
            F.col("cid").alias(f"__cid{s}"),
            F.slice("cv", s * sub + 1, sub).alias(f"__cw{s}"),
        )
        wide = wide.join(
            F.broadcast(cb_s), F.col(str(s)) == F.col(f"__cid{s}")
        ).drop(f"__cid{s}")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    from dolphinbeat_spark.functions.vector import dot as _dot

    score = None
    for s in range(m):
        term = _dot(F.slice("__qv", s * sub + 1, sub), F.col(f"__cw{s}"))
        score = term if score is None else score + term
    scored = (
        F.broadcast(q)
        .crossJoin(wide)
        .filter(F.col("query_id") != F.col("pq_id"))
        .select(
            "query_id",
            F.col("pq_id").alias("neighbor_id"),
            score.alias("approx_dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("approx_dot", 6).alias("approx_dot"))
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    seed: int = 42,
    max_iter: int = 10,
    init_mode: str = "k-means||",
) -> DataFrame:
    """Trained coarse quantizer for IVF: MLlib k-means over the
    embedding column, returning the (cid, cv) centroid contract
    ``ivf_assign``/``ivf_ann_topk`` consume — the production slot the
    sampled-centroid oracle specs stand in for (trained centroids
    follow the data distribution, so inverted lists balance and recall
    per nprobe rises; estimates stay engine-specific, hence test-only,
    no cross-engine oracle).

    Scales as k-means does: each iteration is one map-side assignment
    pass (centroids broadcast) + one partial-aggregated mean — the
    exact plan shape ``ivf_assign`` already uses.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = df.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features"),
    )
    # init_mode="random" skips the k-means|| init passes (2 extra
    # distributed rounds) — the right trade for a COARSE quantizer,
    # where a few refinement iterations matter more than seeding
    model = KMeans(
        k=k, seed=seed, maxIter=max_iter, featuresCol="__features",
        initMode=init_mode,
    ).fit(feats)
    spark = df.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cid int, cv array<double>",
    )
    return cents.select("cid", F.col("cv").cast("array<float>").alias("cv"))


def lloyd_kmeans_exact(
    train: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
    dim: int,
) -> DataFrame:
    """Deterministic DISTRIBUTED Lloyd's k-means whose every float op
    is a bit-reproducible ordered fold — the trained coarse quantizer
    that CAN be replicated by an independent engine (retiring the
    rows-only gate the seeded-numpy/MLlib variants force):

    - init: the first ``k`` training vectors by ``id_col`` order
      (sorted init — deterministic, no RNG), cid = 0..k-1
    - assignment: min squared-L2 via an in-order fold over dims,
      smallest cid on ties (min_by over the (d2, cid) struct — a
      map-side partial aggregate, the exchange carries one row per
      vector)
    - update: per-cell mean as an ordered fold — members sorted by id,
      elementwise array fold-sum, divide by count. Unordered SUM would
      be run-dependent float association; the ordered fold is
      bit-identical across engines (registry docstring contract).
      Empty cells keep their previous centroid.

    Scale: per iteration one broadcast-assign pass + one keyed shuffle
    of (cell, vector) — identical shape to ``ivf_assign``; the member
    fold is per-cell bounded by the TRAINING sample (callers pass a
    hash-mod sample, faiss practice), never the corpus. Returns the
    (cid, cv) contract, cv as array<double>."""
    v = train.select(
        F.col(id_col).alias("__tid"),
        F.col(vec_col).cast("array<double>").alias("__tv"),
    )
    w = Window.orderBy("__tid")
    cents = (
        v.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select((F.col("__rn") - 1).cast("int").alias("cid"), F.col("__tv").alias("cv"))
    )
    d2 = F.aggregate(
        F.zip_with(F.col("__tv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    for _ in range(iters):
        assigned = (
            v.crossJoin(F.broadcast(cents))
            .select("__tid", "__tv", "cid", d2.alias("__d2"))
            .groupBy("__tid")
            .agg(
                F.min_by(
                    F.struct(F.col("cid"), F.col("__tv")),
                    F.struct(F.col("__d2"), F.col("cid")),
                ).alias("__b")
            )
            .select(
                F.col("__b.cid").alias("cid"),
                F.col("__b.__tv").alias("__tv"),
                "__tid",
            )
        )
        means = (
            assigned.groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__tid"), F.col("__tv")))
                ).alias("__arr")
            )
            .select(
                "cid",
                F.transform(
                    F.aggregate(
                        F.transform(F.col("__arr"), lambda s: s["__tv"]),
                        F.array_repeat(F.lit(0.0), dim),
                        lambda acc, x: F.zip_with(acc, x, lambda p, q: p + q),
                    ),
                    lambda x: x / F.size(F.col("__arr")),
                ).alias("cv"),
            )
        )
        kept = cents.join(means.select("cid"), "cid", "left_anti")
        cents = means.unionByName(kept)
    return cents


def sample_kmeans_centroids(
    sample: DataFrame,
    id_col: str,
    vec_col: str,
    k,
    seed: int = 42,
    max_iter: int = 10,
    sample_cap: int = 262_144,
) -> DataFrame:
    """Codebook training the way production ANN systems actually do it
    (faiss practice): collect a BOUNDED deterministic sample to the
    driver, run numpy Lloyd's there, broadcast the k centroids back.
    Same (cid, cv) contract as ``kmeans_centroids``.

    Why not distributed k-means for the coarse quantizer? Training
    needs ~O(100·k) vectors regardless of corpus size — at 100 TB you
    still train on ≲256k sampled vectors (64 MB at d=64), while each
    MLlib iteration is a full distributed job. Driver-side training is
    one TakeOrdered of the pre-filtered sample + zero shuffles; the
    expensive part (assigning the full corpus) stays distributed and
    map-only in ``ivf_assign``. ``sample`` should already be a
    hash-mod filtered subset; the orderBy+limit inside is a bounded
    TakeOrdered, not a global sort of the corpus.
    """
    import numpy as np

    rows = (
        sample.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(id_col)
        .limit(sample_cap + 1)  # +1: detect (not fetch) an over-cap sample
        .collect()
    )
    capped = len(rows) > sample_cap
    rows = rows[:sample_cap]
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    n = x.shape[0]
    if n == 0:
        raise ValueError("sample_kmeans_centroids: empty training sample")
    if callable(k):
        # size the codebook FROM the sample (k = f(n_sample)) — saves
        # the caller a separate corpus-count job just to pick k
        k = int(k(n))
        if capped:
            # LOUD, not a comment (r5 review): past the cap a derived
            # k saturates at f(sample_cap) while the corpus keeps
            # growing — recall deltas measured against such a codebook
            # silently compare different effective k. Callers at that
            # scale should pass an explicit k (and typically a larger
            # hash-mod sample).
            import warnings

            warnings.warn(
                f"k-means training sample hit sample_cap={sample_cap}; "
                f"derived k saturates at k={k}. Pass an explicit k for "
                "corpora beyond the cap.",
                RuntimeWarning,
                stacklevel=2,
            )
    k = min(k, n)
    rng = np.random.default_rng(seed)
    # k-means++ seeding (deterministic under the seeded rng): spreads
    # initial centroids ∝ squared distance, avoiding the split-cluster
    # local optima plain random init falls into
    first = int(rng.integers(n))
    chosen = [first]
    d2min = ((x - x[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        total = d2min.sum()
        if total <= 0.0:
            # all remaining points coincide with a centroid
            nxt = int(rng.integers(n))
        else:
            nxt = int(rng.choice(n, p=d2min / total))
        chosen.append(nxt)
        d2min = np.minimum(d2min, ((x - x[nxt]) ** 2).sum(axis=1))
    cents = x[chosen].copy()
    for _ in range(max_iter):
        # one vectorized assignment pass: argmin_c ||x - c||^2
        d2 = (
            (x * x).sum(axis=1, keepdims=True)
            - 2.0 * x @ cents.T
            + (cents * cents).sum(axis=1)
        )
        assign = d2.argmin(axis=1)
        new = np.zeros_like(cents)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        np.add.at(new, assign, x)
        empty = counts == 0
        nonzero = ~empty
        new[nonzero] /= counts[nonzero, None]
        # deterministic empty-cluster reseed: farthest points by d2
        if empty.any():
            far = np.argsort(-d2[np.arange(n), assign], kind="stable")
            new[empty] = x[far[: int(empty.sum())]]
        if np.allclose(new, cents):
            cents = new
            break
        cents = new
    spark = sample.sparkSession
    out = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(cents)],
        "cid int, cv array<double>",
    )
    return out.select("cid", F.col("cv").cast("array<float>").alias("cv"))


def ivf_hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int,
    nprobe: int,
) -> DataFrame:
    """ANN hard-negative mining for contrastive/embedding training:
    for each anchor, the top-k most-similar corpus vectors carrying a
    DIFFERENT label — the standard in-batch-negatives upgrade (mine
    near neighbors across the label boundary instead of random
    negatives). Same scale shape as :func:`ivf_ann_topk` (broadcast
    centroids, cell-bucketed candidate join, no all-pairs product);
    the label filter runs before ranking so k true negatives survive
    even when an anchor's cell is dominated by its own class."""
    inv = (
        ivf_assign(corpus, centroids, id_col, vec_col, "negative_id", 1)
        .select("negative_id", F.col("vec").alias("__cv"), "cell",
                l2_norm(F.col("vec")).alias("__cn"))
        .join(
            corpus.select(
                F.col(id_col).alias("negative_id"),
                F.col(label_col).alias("negative_label"),
            ),
            "negative_id",
        )
    )
    probes = (
        ivf_assign(queries, centroids, id_col, vec_col, "anchor_id", nprobe)
        .select("anchor_id", F.col("vec").alias("__qv"), "cell",
                l2_norm(F.col("vec")).alias("__qn"))
        .join(
            queries.select(
                F.col(id_col).alias("anchor_id"),
                F.col(label_col).alias("anchor_label"),
            ),
            "anchor_id",
        )
    )
    scored = (
        F.broadcast(probes)
        .join(inv, "cell")
        .filter(F.col("negative_label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            cosine_from_parts(
                dot("__qv", "__cv"), F.col("__qn"), F.col("__cn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id", "anchor_label", "negative_id", "negative_label",
            "rank", "cosine",
        )
    )


def semdedup_prune(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """SemDeDup (public method, Abbas et al. 2023, arXiv:2303.09540):
    semantic deduplication by clustering embeddings and removing
    near-identical pairs WITHIN each cluster — the pairwise work is
    bounded per cluster, never corpus×corpus (the property that makes
    the method viable at LAION/LLM scale; clusters at 100 TB come from
    the same broadcast-centroid assignment the IVF index uses, and a
    skewed mega-cluster is split by re-clustering, not by widening the
    join). Keeper rule here: the LOWEST id of each duplicate pair
    survives (deterministic, cross-engine checkable; the paper's
    keep-farthest-from-centroid variant swaps the ordering key only).

    Returns the REMOVED rows: (``vec_id``, cell, max_cosine) — one row
    per dropped vector with its strongest same-cluster duplicate
    evidence; survivors = anti-join against this set."""
    assigned = ivf_assign(emb, centroids, id_col, vec_col, "vid", n_cells=1)
    a = assigned.select(
        F.col("vid").alias("id_a"), F.col("vec").alias("__va"), "cell",
        l2_norm(F.col("vec")).alias("__na"),
    )
    b = assigned.select(
        F.col("vid").alias("id_b"), F.col("vec").alias("__vb"),
        F.col("cell").alias("__cell_b"),
        l2_norm(F.col("vec")).alias("__nb"),
    )
    pairs = (
        a.join(b, (F.col("cell") == F.col("__cell_b")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_b", "cell",
            cosine_from_parts(
                dot("__va", "__vb"), F.col("__na"), F.col("__nb")
            ).alias("__sim"),
        )
        .filter(F.col("__sim") >= threshold)
    )
    return pairs.groupBy(F.col("id_b").alias("vec_id"), F.col("cell")).agg(
        F.max("__sim").alias("max_cosine")
    )
