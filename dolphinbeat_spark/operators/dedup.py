"""Deduplication operators for the large-scale training-data layer.

Five families, all engine-portable and shuffle-conscious:

- **exact**: hash-groupBy on a normalization key; keeper = min(id).
- **MinHash + LSH**: word-shingle sets → ``num_perm`` min-hashes via
  portable affine permutations (functions/hashes.py) → band buckets →
  candidate pairs via self-join on (band, bucket-hash). The self-join
  shuffles only (band_key, doc_id) pairs — never the documents.
- **SimHash**: sign-aggregated bit fingerprint from token hashes;
  near-dup = identical fingerprint (or small Hamming distance).
- **n-gram Jaccard**: exact Jaccard over shingle sets for candidate
  pairs (used to verify LSH candidates).
- **embedding cosine**: near-duplicate vectors by cosine >= threshold
  (see operators/similarity.py for the top-k variant).

Scale notes: MinHash signature computation is a per-row map (explode →
groupBy doc) — at 100 TB use ``num_perm`` 64-128 and band rows 4-8;
the band-bucket join is the only shuffle and its fan-in per bucket is
bounded by collision rate, with AQE skew-split as the backstop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dolphinbeat_spark.functions.hashes import (
    MERSENNE_61,
    affine_hash,
    hash64,
    minhash_params,
)
from dolphinbeat_spark.operators.text import tokens, word_shingles_from_tokens


def exact_dedup(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Group rows by a normalization key; emit one keeper per group."""
    return (
        df.select(F.col(id_col), key.alias("dup_key"))
        .groupBy("dup_key")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 32, shingle_k: int = 3
) -> DataFrame:
    """(id, perm_index, minhash) — long form, one row per permutation.

    Long form keeps the downstream banding a pure groupBy instead of a
    wide-column pivot; the explode is map-side only.
    """
    params = minhash_params(num_perm)
    # two-step projection: tokens materialized once per row, THEN
    # shingled (the shingle lambda reads the array k+1 times)
    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    # empty-shingle docs drop out (parity with the explode form, which
    # emits no row for them). The guard is on the CHEAP token count —
    # shingles are empty iff n_tokens < k — because filtering on
    # size(shingles) would force Catalyst to duplicate the expensive
    # shingle expression into the filter and every downstream use
    # (measured 17× slower)
    toked = toked.filter(F.size("__toks") >= shingle_k)
    shingled = toked.select(
        F.col(id_col),
        word_shingles_from_tokens(F.col("__toks"), shingle_k).alias("__sh"),
    )
    # MAP-ONLY signatures: hash the shingle array once per row, then
    # each permutation is an array_min over an affine transform of that
    # array — zero shuffle (the explode+groupBy formulation shuffled
    # |shingles| partial-min rows; same math, ~5× faster at sf0.1 and
    # flat-out wins at scale because no exchange exists at all)
    hashed = shingled.select(
        id_col, F.transform("__sh", lambda s: hash64(s)).alias("__hs")
    )
    wide = hashed.select(
        id_col,
        *[
            F.array_min(
                F.transform("__hs", lambda h: affine_hash(h, a, b))
            ).alias(f"mh_{i}")
            for i, (a, b) in enumerate(params)
        ],
    )
    stack_args = ", ".join(f"{i}L, mh_{i}" for i in range(num_perm))
    return wide.selectExpr(
        id_col, f"stack({num_perm}, {stack_args}) AS (perm, minhash)"
    ).select(id_col, F.col("perm").cast("int").alias("perm"), "minhash")


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_perm: int = 32, bands: int = 8
) -> DataFrame:
    """Band the signature and self-join on (band, band_hash).

    Returns distinct candidate (id_a < id_b) pairs.
    """
    rows_per_band = num_perm // bands
    # band key = md5 of the perm-ordered minhash concatenation. Built
    # from portable pieces (sort, cast-to-string, join, md5) so the SQL
    # oracle (string_agg ... ORDER BY perm) produces identical bytes.
    ordered = F.array_sort(F.collect_list(F.struct("perm", "minhash")))
    key = F.md5(F.concat_ws(",", F.transform(ordered, lambda s: s["minhash"].cast("string"))))
    banded = (
        signatures.withColumn("band", F.floor(F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(key.alias("band_key"))
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Sign-aggregated token-hash fingerprint (bits LSBs of hash64).

    fingerprint bit j = 1 iff sum over tokens of (+1 if token-hash bit
    j else -1) > 0. Weighted by token multiplicity (classic SimHash).
    """
    toked = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    hashed = toked.select(id_col, hash64(F.col("tok")).alias("h"))
    contribs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    sums = hashed.groupBy(id_col).agg(*contribs)
    fp = sum(
        (F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(bits)),
        F.lit(0),
    ).cast("bigint")
    return sums.select(F.col(id_col), fp.alias("simhash"))


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pairs: DataFrame,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given (id_a, id_b) candidate pairs.

    Joins the (small) pair list against per-doc shingle arrays and
    computes |A∩B| / |A∪B| with array built-ins — exact integer
    cardinalities, one double division at the end.
    """
    sh = df.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        F.col(id_col), word_shingles_from_tokens(F.col("__toks"), shingle_k).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    # arrays are distinct → |A∩B| via hash-based array_intersect
    # (O(n+m); a membership-filter scan would be O(n·m) per pair),
    # |A∪B| = |A|+|B|-|A∩B|. The SQL oracle uses list_filter — same
    # result on distinct inputs.
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return joined.select(
        "id_a",
        "id_b",
        inter.cast("bigint").alias("n_common"),
        union.cast("bigint").alias("n_union"),
        (inter.cast("double") / union).alias("jaccard"),
    )


def jaccard_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float,
    shingle_k: int = 3,
) -> DataFrame:
    """Scalable blocked Jaccard: explode (id, shingle), self-join on
    (block, shingle), count matches per pair, derive union from per-doc
    set sizes.

    Shuffles only (block, shingle, id) triples — never the shingle
    arrays — and only pairs sharing >= 1 shingle materialize, so the
    output is bounded by real overlap, not |block|^2. This is the
    100 TB formulation; jaccard_pairs() is for verifying a small
    explicit candidate list.
    """
    toked = df.select(
        F.col(id_col), F.col(block_col).alias("__blk"), tokens(text_col).alias("__toks")
    )
    # materialized(): InferFiltersFromGenerate synthesizes
    # `size(sh) > 0 AND isnotnull(sh)` from the explode below, and
    # Catalyst pushes that filter to the SCAN with the whole shingle
    # expression inlined (split(trim(text)) re-evaluated per
    # element_at reference, on however few tasks the file layout
    # yields — the documented 17x shingle-duplication trap, here
    # auto-generated). The barrier pins the inferred filter above this
    # projection so shingles are computed once per row, post-widen.
    # Measured at sf0.1: the explode stage alone 8.7 s -> 0.6 s.
    from dolphinbeat_spark.functions.barrier import materialized

    sh = toked.select(
        F.col(id_col),
        "__blk",
        materialized(
            word_shingles_from_tokens(F.col("__toks"), shingle_k)
        ).alias("sh"),
    )
    sizes = sh.select(F.col(id_col), F.size("sh").cast("bigint").alias("n"))
    ex = sh.select(F.col(id_col), "__blk", F.explode("sh").alias("s"))
    a = ex.select(F.col(id_col).alias("id_a"), F.col("__blk").alias("blk_a"), F.col("s"))
    b = ex.select(F.col(id_col).alias("id_b"), F.col("__blk").alias("blk_b"), F.col("s"))
    common = (
        a.join(b, ["s"])
        .filter((F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    out = (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_common"),
            (F.col("n_a") + F.col("n_b") - F.col("n_common")).alias("n_union"),
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """Duplicate-cluster extraction: connected components over a
    near-dup pair graph by iterative min-label propagation. Output:
    (node, cluster_id) where cluster_id = min node id reachable —
    the canonical keeper of each duplicate cluster.

    Iterative (non-SQL-expressible in one pass): each round every node
    adopts the minimum label among itself and its neighbors; converges
    in O(component diameter) rounds. Near-dup graphs are overwhelmingly
    tiny cliques/chains, so 3-4 rounds settle real corpora; max_iter
    bounds adversarial chains.

    At 100 TB: each round is one join (labels ⋈ edges, both partitioned
    by node) + one groupBy-min — shuffle-bound, no driver data motion;
    ``localCheckpoint`` truncates lineage so plans stay flat across
    rounds. (The classic large-star/small-star optimization halves
    round count; plain propagation keeps the oracle checkable.)
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "label"
                ),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def ngram_decontaminate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    test_pred: Column,
    k: int = 13,
) -> DataFrame:
    """Benchmark decontamination by k-gram overlap: flag every
    TRAINING document sharing at least one k-word shingle with any
    held-out/test document — the published method (13-gram collision)
    for scrubbing eval benchmarks out of a pretraining corpus, where
    exact/prefix matching misses benchmarks embedded mid-document and
    near-dup similarity is too loose a net.

    Scale shape: the test/train split happens BEFORE shingling, so
    each document is tokenized+shingled+hashed exactly once (filtering
    a shared shingled view would shingle the whole corpus in BOTH join
    branches); test-side shingles are DISTINCT (bounded by the
    benchmark corpus, typically tiny vs training); the collision is a
    hash equi-join — the exchange carries (shingle_hash, doc_id)
    longs, never text. Output one row per contaminated training doc:
    (train_doc_id, n_shared_ngrams = distinct colliding k-grams,
    n_test_docs = distinct test docs hit, min_test_doc_id = the
    example to inspect)."""
    from dolphinbeat_spark.functions.hashes import hash64
    from dolphinbeat_spark.operators.text import tokens, word_shingles_from_tokens

    def shingled(side):
        return side.select(
            F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks")
        ).select(
            "__id",
            F.explode(word_shingles_from_tokens(F.col("__toks"), k)).alias("__g"),
        ).select("__id", hash64(F.col("__g")).alias("__h"))

    test_sh = (
        shingled(docs.filter(test_pred))
        .select(F.col("__h"), F.col("__id").alias("__test_id"))
        .distinct()
    )
    train_sh = shingled(docs.filter(~test_pred)).select("__h", "__id")
    hits = train_sh.join(test_sh, "__h")
    return hits.groupBy(F.col("__id").alias("train_doc_id")).agg(
        F.countDistinct("__h").alias("n_shared_ngrams"),
        F.countDistinct("__test_id").alias("n_test_docs"),
        F.min("__test_id").alias("min_test_doc_id"),
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    rounds_out: list | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — same output contract as :func:`connected_components`
    ((node, cluster_id = component min)), but converging in
    O(log² n) rounds instead of O(component diameter): on a length-L
    chain, propagation needs ~L rounds; this needs ~log L. At 100 TB
    that's the difference between 4 and 60 shuffle stages for
    pathological near-dup chains.

    Each round is two phases over the edge set:

    - large-star: every node u connects its LARGER neighbors to
      m(u) = min(u ∪ Γ(u)) — long chains contract toward minima;
    - small-star: every node u (edges held as (max, min)) connects
      itself and its smaller neighbors to m(u) — stars flatten.

    Convergence = edge set fixed point. Checked in two tiers: a cheap
    (count, sum(hi), sum(lo)) fingerprint every round (one agg job),
    and the exact two-sided subtract ONLY when the fingerprint is
    unchanged — so the expensive confirmation typically runs once, at
    the actual fixed point. ``rounds_out``, when given, receives the
    number of rounds used (test hook for the round-count guarantee)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def fingerprint(df: DataFrame) -> tuple:
        r = df.agg(
            F.count(F.lit(1)), F.sum("hi"), F.sum("lo")
        ).collect()[0]
        return tuple(r)

    fp = fingerprint(edges)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # -- large-star: symmetric neighborhoods ------------------------
        sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        ls = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # -- small-star: (hi, lo) orientation only ----------------------
        smins = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        ss = (
            ls.join(smins, "hi")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("hi").alias("a"), F.col("m").alias("b")),
                        F.struct(F.col("lo").alias("a"), F.col("m").alias("b")),
                    )
                ).alias("e")
            )
            .select(
                F.greatest("e.a", "e.b").alias("hi"), F.least("e.a", "e.b").alias("lo")
            )
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_fp = fingerprint(ss)
        if new_fp == fp and ss.exceptAll(edges).isEmpty():
            # same count + same element sums + subset ⇒ same set
            edges = ss
            break
        fp, edges = new_fp, ss
    if rounds_out is not None:
        rounds_out.append(rounds)
    # fixed point is a forest of stars: every non-root points at its
    # component min; roots are the lo side never appearing as hi
    nodes = edges.select(F.col("hi").alias("node"), F.col("lo").alias("cluster_id"))
    roots = (
        edges.select(F.col("lo").alias("node"))
        .distinct()
        .join(edges.select(F.col("hi").alias("node")).distinct(), "node", "left_anti")
        .withColumn("cluster_id", F.col("node"))
    )
    return nodes.union(roots)


def cross_split_contamination(
    docs: DataFrame, id_col: str, text_col: str | Column, test_pred: Column
) -> DataFrame:
    """Train/test contamination check: exact-content matches between
    the rows ``test_pred`` selects (the held-out split) and the rest
    (the training split), by portable document fingerprint.

    The core eval-hygiene operator of an LLM data pipeline: a test
    document whose exact content also sits in training data silently
    inflates benchmarks. One scan fingerprints every doc, one
    fingerprint equi-join finds collisions — no pair materialization,
    scales as a plain keyed join (SMJ at 100 TB, broadcast when the
    test split is small). Near-dup contamination composes the same
    join with minhash/simhash keys instead of the exact fingerprint.

    ``text_col`` may be a derived Column — e.g. a leading-token prefix,
    the standard heuristic for "benchmark text embedded inside a
    longer training document".
    """
    from dolphinbeat_spark.operators.text import fingerprint

    fp = docs.select(
        F.col(id_col).alias("__id"),
        fingerprint(text_col).alias("fingerprint"),
        test_pred.alias("__is_test"),
    )
    test = fp.filter(F.col("__is_test")).select(
        F.col("__id").alias("test_doc_id"), "fingerprint"
    )
    train = fp.filter(~F.col("__is_test")).select(
        F.col("__id").alias("train_doc_id"), "fingerprint"
    )
    return test.join(train, "fingerprint").select(
        "test_doc_id", "train_doc_id", "fingerprint"
    )
