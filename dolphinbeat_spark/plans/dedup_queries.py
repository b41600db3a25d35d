"""Deduplication query plans over the ``documents`` table.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard families from
operators/dedup.py, each with a fully-equivalent DuckDB oracle built
from the same portable hash arithmetic (functions/hashes.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load, sorted_spread
from dolphinbeat_spark.functions.hashes import MERSENNE_61, hash64_sql, minhash_params
from dolphinbeat_spark.operators import dedup as D
from dolphinbeat_spark.operators.text import word_shingles as T_word_shingles
from dolphinbeat_spark.operators.text import tokens as T_tokens
from dolphinbeat_spark.operators.text import (
    word_shingles_from_tokens as T_word_shingles_from_tokens,
)
from dolphinbeat_spark.plans.registry import (
    materialize_bounded,
    register,
)

NUM_PERM = 32
BANDS = 8
SHINGLE_K = 3

_TOKS = r"regexp_split_to_array(trim(text), '\s+')"
_SHINGLES = (
    f"list_distinct(list_transform(range(1, greatest(len({_TOKS}) - 2, 0) + 1), "
    f"i -> concat({_TOKS}[i], ' ', {_TOKS}[i+1], ' ', {_TOKS}[i+2])))"
)
_PERM_VALUES = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(minhash_params(NUM_PERM)))

# shared CTE prefix: documents → shingles → portable hashes → minhash
_MINHASH_CTE = f"""
WITH shingled AS (
  SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
), hashed AS (
  SELECT doc_id, {hash64_sql('shingle')} AS h FROM shingled
), perms(perm, a, b) AS (
  VALUES {_PERM_VALUES}
), minhash AS (
  SELECT doc_id, perm, MIN((h * a + b) % {MERSENNE_61}) AS minhash
  FROM hashed CROSS JOIN perms
  GROUP BY doc_id, perm
)
"""

_BANDS_CTE = f"""
, bands AS (
  SELECT doc_id, CAST(floor(perm / {NUM_PERM // BANDS}) AS INTEGER) AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm)) AS band_key
  FROM minhash
  GROUP BY doc_id, band
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)
"""


@register(
    "dedup_exact_docs",
    oracle="""
SELECT md5(text) AS dup_key, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
FROM documents
GROUP BY dup_key
ORDER BY dup_key
""",
    tags=("dedup", "exact"),
    bench=True,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text), keeper = min(doc_id)."""
    d = load(spark, sf_dir, "documents")
    return D.exact_dedup(d, "doc_id", F.md5("text")).orderBy("dup_key")


@register(
    "dedup_minhash_signatures",
    oracle=_MINHASH_CTE + """
SELECT doc_id, perm, minhash FROM minhash
ORDER BY doc_id, perm
""",
    tags=("dedup", "minhash"),
    bench=True,
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix (long form), portable hashing.

    r16 (guide §1.4/§2.4, measured in OPTIMIZATION_r16.md): sort FIRST,
    map AFTER. A range-partitioned Sort executes its whole child twice
    (once to sample the range bounds, once for real), so the old
    ``minhash(...).orderBy(doc_id, perm)`` ran the md5/shingle chain
    2x per query. Sorting the raw (doc_id, text) rows first makes the
    sampling pass a cheap parquet re-scan, the range exchange spreads
    the rows across all cores (subsuming the widen repartition — one
    exchange instead of two), and the signature chain runs ONCE above
    the sort. Output order is identical: doc_id is unique per wide
    row, projections/Generate preserve row order, and stack emits
    perm 0..N-1 in sequence, so (doc_id ASC, perm ASC) holds exactly
    as before."""
    d = load(spark, sf_dir, "documents")
    ordered = sorted_spread(d.select("doc_id", "text"), "doc_id")
    return D.minhash_signatures(ordered, "doc_id", "text", NUM_PERM, SHINGLE_K)


@register(
    "dedup_minhash_lsh_pairs",
    oracle=_MINHASH_CTE + _BANDS_CTE + """
SELECT id_a, id_b FROM cand
ORDER BY id_a, id_b
""",
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: candidate near-dup pairs from band-bucket joins."""
    d = load(spark, sf_dir, "documents", widen=True)
    sigs = D.minhash_signatures(d, "doc_id", "text", NUM_PERM, SHINGLE_K)
    return D.lsh_candidate_pairs(sigs, "doc_id", NUM_PERM, BANDS).orderBy("id_a", "id_b")


@register(
    "dedup_simhash",
    oracle=f"""
WITH toked AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), hashed AS (
  SELECT doc_id, {hash64_sql('tok')} AS h FROM toked
), bitsums AS (
  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed CROSS JOIN (SELECT unnest(range(0, 32)) AS j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
FROM bitsums
GROUP BY doc_id
ORDER BY doc_id
""",
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (multiplicity-weighted)."""
    d = load(spark, sf_dir, "documents", widen=True)
    return D.simhash(d, "doc_id", "text", bits=32).orderBy("doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, source, {_SHINGLES} AS s FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sh_a, b.s AS sh_b
  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
), scored AS (
  SELECT id_a, id_b,
         len(list_filter(sh_a, x -> list_contains(sh_b, x))) AS n_common,
         len(sh_a) + len(sh_b) - len(list_filter(sh_a, x -> list_contains(sh_b, x))) AS n_union
  FROM pairs
)
SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common, CAST(n_union AS BIGINT) AS n_union,
       CAST(n_common AS DOUBLE) / n_union AS jaccard
FROM scored
WHERE CAST(n_common AS DOUBLE) / n_union >= 0.2
ORDER BY id_a, id_b
""",
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.2 over same-source blocks, via the
    scalable explode-join formulation (only pairs sharing a shingle
    materialize; the oracle's nested-loop form is the semantic spec).
    At scale the blocking key would be an LSH bucket — see
    dedup_minhash_lsh_pairs."""
    d = load(spark, sf_dir, "documents", widen=True)
    return D.jaccard_blocked(d, "doc_id", "text", "source", 0.2, SHINGLE_K).orderBy(
        "id_a", "id_b"
    )


@register(
    "dedup_clusters",
    oracle=_MINHASH_CTE.replace("WITH shingled", "WITH RECURSIVE shingled", 1)
    + _BANDS_CTE
    + """
, edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION
  SELECT id_b AS src, id_a AS dst FROM cand
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS node, LEAST(src, MIN(dst)) AS cluster_id
FROM reach
GROUP BY src
ORDER BY node
""",
    tags=("dedup", "clusters", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster extraction: LSH candidate pairs → connected
    components by alternating large-star/small-star (the genuinely
    iterative operator — the oracle needs a recursive CTE; O(log²)
    rounds vs propagation's O(diameter)). cluster_id is the canonical
    keeper (min doc_id in the component)."""
    d = load(spark, sf_dir, "documents", widen=True)
    sigs = D.minhash_signatures(d, "doc_id", "text", NUM_PERM, SHINGLE_K)
    pairs = D.lsh_candidate_pairs(sigs, "doc_id", NUM_PERM, BANDS)
    return D.connected_components_star(pairs).orderBy("node")


_DECON_K = 5  # 13 in production; the synthetic docs are short
_DECON_SHINGLES = (
    f"list_distinct(list_transform(range(1, greatest(len({_TOKS}) - {_DECON_K - 1}, 0) + 1), "
    f"i -> array_to_string(({_TOKS})[i:i+{_DECON_K - 1}], ' ')))"
)


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, doc_id % 17 = 0 AS is_test,
         {hash64_sql('g')} AS h
  FROM (SELECT doc_id, text, unnest({_DECON_SHINGLES}) AS g FROM documents)
), test_sh AS (
  SELECT DISTINCT h, doc_id AS test_id FROM sh WHERE is_test
), train_sh AS (
  SELECT h, doc_id FROM sh WHERE NOT is_test
)
SELECT tr.doc_id AS train_doc_id,
       COUNT(DISTINCT tr.h) AS n_shared_ngrams,
       COUNT(DISTINCT te.test_id) AS n_test_docs,
       MIN(te.test_id) AS min_test_doc_id
FROM train_sh tr JOIN test_sh te ON te.h = tr.h
GROUP BY tr.doc_id
ORDER BY train_doc_id
""",
    tags=("dedup", "contamination", "llm-pipeline"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by k-gram collision (the published
    13-gram method; k={_DECON_K} here for the short synthetic docs):
    training documents sharing any k-word shingle with the held-out
    split (doc_id %% 17 == 0 stands in for a benchmark corpus) are
    flagged with collision counts — stricter than the prefix heuristic
    (catches benchmarks embedded MID-document), tighter than near-dup
    similarity. operators/dedup.py::ngram_decontaminate."""
    d = load(spark, sf_dir, "documents", widen=True)
    return D.ngram_decontaminate(
        d, "doc_id", "text", (F.col("doc_id") % 17 == 0), k=_DECON_K
    ).orderBy("train_doc_id")


@register(
    "fuzzy_match_levenshtein",
    oracle="""
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a JOIN part b
  ON a.p_type = b.p_type AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3
  AND a.p_name <> b.p_name
ORDER BY id_a, id_b
""",
    tags=("dedup", "fuzzy", "levenshtein"),
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: near-identical part names (edit distance
    ≤ 3) within a p_type block — the entity-resolution primitive. The
    block key turns the O(n²) comparison into per-block self-joins
    (the same blocking discipline as jaccard_blocked); Levenshtein is
    a JVM built-in on both engines.

    r17 (guide §2.5/§1.2, REGISTRY_TIMING: 78.6 s → ~4 s at sf0.1):
    part is one scan task and the block key has single-digit
    cardinality, so the broadcast-join probe side ran EVERY pair's
    Levenshtein on one core — widen=True spreads the probe across the
    session parallelism. The repartition below the final sort is a
    materialization barrier: the range sampler then reads the
    (small) survivor shuffle instead of re-running the full pair join
    — at scale the pair join dwarfs one survivor exchange. Negative
    result, measured: the bounded 3-arg levenshtein + |Δlen|≤3
    prefilter was ~25% SLOWER on these 7-12 char names (banded-DP
    setup outweighs the saved cells; the length filter prunes almost
    nothing when all lengths are within 5) — kept 2-arg."""
    p = load(spark, sf_dir, "part", widen=True).select(
        "p_partkey", "p_name", "p_type"
    )
    a = p.select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_type").alias("t"),
    )
    b = p.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_type").alias("t"),
    )
    return (
        a.join(b, "t")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter((F.col("edit_dist") <= 3) & (F.col("name_a") != F.col("name_b")))
        .select("id_a", "id_b", "name_a", "name_b", "edit_dist")
        .repartition(spark.sparkContext.defaultParallelism)
        .orderBy("id_a", "id_b")
    )


@register(
    "dedup_lsh_precision",
    oracle=_MINHASH_CTE + _BANDS_CTE + f"""
, truth AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
  FROM cand c
  JOIN (SELECT doc_id, {_SHINGLES} AS sh FROM documents) a ON a.doc_id = c.id_a
  JOIN (SELECT doc_id, {_SHINGLES} AS sh FROM documents) b ON b.doc_id = c.id_b
)
SELECT COUNT(*) AS n_candidates,
       CAST(count_if(jaccard >= 0.5) AS BIGINT) AS n_true_pairs,
       ROUND(CAST(count_if(jaccard >= 0.5) AS DOUBLE) / COUNT(*), 6) AS precision
FROM truth
""",
    tags=("dedup", "lsh", "evaluation"),
)
def dedup_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure, don't guess: the LSH banding's candidate PRECISION
    against exact shingle Jaccard (>= 0.5) computed only for the
    candidates — the cheap half of sketch evaluation (recall needs
    all-pairs truth, which is exactly what LSH exists to avoid).
    Exercises jaccard_pairs() as the verifier stage of the
    candidate-generation → verification pipeline."""
    d = load(spark, sf_dir, "documents", widen=True)
    sigs = D.minhash_signatures(d, "doc_id", "text", NUM_PERM, SHINGLE_K)
    pairs = D.lsh_candidate_pairs(sigs, "doc_id", NUM_PERM, BANDS)
    verified = D.jaccard_pairs(d, "doc_id", "text", pairs, SHINGLE_K)
    return verified.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.count_if(F.col("jaccard") >= 0.5).alias("n_true_pairs"),
        F.round(
            F.count_if(F.col("jaccard") >= 0.5).cast("double") / F.count(F.lit(1)), 6
        ).alias("precision"),
    )


@register(
    "dedup_lsh_recall",
    oracle=_MINHASH_CTE + _BANDS_CTE + f"""
, universe AS (
  SELECT doc_id, {_SHINGLES} AS sh FROM documents WHERE doc_id % 2 = 0
), truth AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM universe a JOIN universe b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
)
SELECT COUNT(*) AS n_true_pairs,
       CAST(COALESCE(count_if(c.id_a IS NOT NULL), 0) AS BIGINT) AS n_captured,
       ROUND(CASE WHEN COUNT(*) = 0 THEN 1.0
                  ELSE CAST(count_if(c.id_a IS NOT NULL) AS DOUBLE) / COUNT(*) END, 6) AS recall
FROM truth t LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
""",
    tags=("dedup", "lsh", "evaluation"),
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other half of sketch evaluation: LSH candidate RECALL
    against exact all-pairs Jaccard truth over a bounded universe
    (doc_id % 2 == 0 — all-pairs truth is O(n²), which is the whole
    reason LSH exists; the sample keeps the truth computable while the
    candidates come from the FULL corpus banding)."""
    d = load(spark, sf_dir, "documents", widen=True)
    uni = d.filter(F.col("doc_id") % 2 == 0)
    sh = uni.select(
        "doc_id", T_word_shingles(F.col("text")).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    truth = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(inter.cast("double") / union >= 0.5)
        .select("id_a", "id_b")
    )
    sigs = D.minhash_signatures(d, "doc_id", "text", NUM_PERM, SHINGLE_K)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", NUM_PERM, BANDS).withColumn(
        "captured", F.lit(1)
    )
    joined = truth.join(cand, ["id_a", "id_b"], "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.count("captured").alias("n_captured"),
        F.round(
            F.when(F.count(F.lit(1)) == 0, F.lit(1.0)).otherwise(
                F.count("captured").cast("double") / F.count(F.lit(1))
            ),
            6,
        ).alias("recall"),
    )


@register(
    "dedup_cross_contamination",
    # match key = fingerprint of the 5 leading tokens: the standard
    # "benchmark text embedded in a training document" heuristic (exact
    # whole-document matching finds nothing in any real corpus — or in
    # this synthetic one; prefix collisions exist and are the signal)
    oracle=r"""
WITH fp AS (
  SELECT doc_id,
         substr(md5(lower(trim(array_to_string(
           (regexp_split_to_array(trim(text), '\s+'))[1:5], ' ')))), 1, 16)
           AS fingerprint,
         doc_id % 17 = 0 AS is_test
  FROM documents
)
SELECT t.doc_id AS test_doc_id, tr.doc_id AS train_doc_id, t.fingerprint
FROM fp t JOIN fp tr ON t.fingerprint = tr.fingerprint
WHERE t.is_test AND NOT tr.is_test
ORDER BY test_doc_id, train_doc_id
""",
    tags=("dedup", "contamination", "llm-pipeline"),
)
def dedup_cross_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination: leading-5-token prefix collisions
    between the held-out split (doc_id % 17 == 0 stands in for a
    benchmark set) and the training split — the eval-hygiene gate
    every LLM data pipeline needs. Single fingerprint scan + keyed
    equi-join (operators/dedup.py::cross_split_contamination)."""
    from dolphinbeat_spark.operators.dedup import cross_split_contamination
    from dolphinbeat_spark.operators.text import tokens

    d = load(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(tokens("text"), 1, 5))
    return cross_split_contamination(
        d, "doc_id", prefix, (F.col("doc_id") % 17 == 0)
    ).orderBy("test_doc_id", "train_doc_id")


@register(
    "dedup_soft_weights",
    # exact integer arithmetic end to end: sum(df) and n_shingles are
    # BIGINTs, dup_factor/weight are int/int -> DOUBLE (bit-identical
    # across engines; no float folds, no rounding needed)
    oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
), df AS (
  SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle
), doc AS (
  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(d.df) AS BIGINT) AS sum_df
  FROM sh s JOIN df d USING (shingle) GROUP BY s.doc_id
)
SELECT b.doc_id,
       COALESCE(doc.n_shingles, 0) AS n_shingles,
       CASE WHEN doc.doc_id IS NULL THEN 1.0
            ELSE CAST(doc.sum_df AS DOUBLE) / doc.n_shingles END AS dup_factor,
       CASE WHEN doc.doc_id IS NULL THEN 1.0
            ELSE CAST(doc.n_shingles AS DOUBLE) / doc.sum_df END AS weight
FROM documents b LEFT JOIN doc ON b.doc_id = doc.doc_id
ORDER BY b.doc_id
""",
    tags=("dedup", "soft", "reweight", "llm-pipeline"),
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication (SoftDedup-style): instead of DROPPING
    near-duplicate documents, every document gets a sampling weight
    inversely proportional to how duplicated its content is across the
    corpus — dup_factor = mean document-frequency of the doc's distinct
    3-word shingles, weight = 1/dup_factor. Training loaders then
    sample by weight, keeping one effective copy of boilerplate while
    never losing rare text. A doc too short to shingle is by definition
    unique (weight 1.0).

    Scale shape: the classic wordcount pair — one shuffle keyed on
    shingle for document frequency (partial-aggregated map-side), one
    shuffle keyed on doc_id for the per-doc sums; the join is an
    equi-join on shingle. Nothing materializes pairs, so cost is
    O(total shingles), not O(pairs) — the property that lets soft
    dedup run where pairwise near-dup mining would blow up.
    """
    d = load(spark, sf_dir, "documents", widen=True)
    toked = d.select("doc_id", T_tokens("text").alias("toks"))
    sh = toked.select(
        "doc_id", F.explode(T_word_shingles_from_tokens(F.col("toks"), SHINGLE_K)).alias("shingle")
    )
    # r16 (guide §2.4, the duplicate-spans pattern): groupBy(shingle)
    # + join-back referenced `sh` twice and Spark does not deduplicate
    # common subtrees, so the tokenize+shingle+explode chain ran twice
    # per query. count(*) OVER (PARTITION BY shingle) attaches the
    # corpus document-frequency to each row in ONE evaluation with the
    # same single shuffle key; the inner join it replaces kept every
    # row (df >= 1 for every existing shingle), so the per-doc sums
    # are identical.
    # Skew ceiling (r17, ADVICE): unlike the aggregate+join form, the
    # window puts EVERY row of one shingle in one task (no map-side
    # partial agg, no AQE skew split for windows). A corpus-dominant
    # shingle — a boilerplate phrase in most documents — caps at one
    # task's throughput/memory. For corpora where one shingle can
    # carry an O(corpus) share of rows, prefer the aggregate +
    # broadcast-join form of the frequency table; here shingles are
    # K-word (K=3) over real text, where even stopword shingles hold
    # well under 1% of the stream.
    dfw = sh.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    doc = (
        dfw.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum("df").cast("bigint").alias("sum_df"),
        )
    )
    return (
        d.select("doc_id")
        .join(doc.withColumnRenamed("doc_id", "sdoc_id"),
              F.col("doc_id") == F.col("sdoc_id"), "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0).cast("bigint")).alias("n_shingles"),
            F.when(F.col("sdoc_id").isNull(), F.lit(1.0))
            .otherwise(F.col("sum_df").cast("double") / F.col("n_shingles"))
            .alias("dup_factor"),
            F.when(F.col("sdoc_id").isNull(), F.lit(1.0))
            .otherwise(F.col("n_shingles").cast("double") / F.col("sum_df"))
            .alias("weight"),
        )
        .orderBy("doc_id")
    )


_SPAN_K = 8  # tokens per duplicate-detection window

# shared oracle prefix: documents → k-token windows → repeated-window
# positions → maximal spans (gaps-and-islands) — used by both the
# span-report and span-removal specs
_SPAN_CTE = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), w AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         concat_ws(' ', {", ".join(f"toks[CAST(i + {j} AS INTEGER)]" for j in range(_SPAN_K))}) AS gram
  FROM t, unnest(range(1, greatest(len(toks) - {_SPAN_K - 1}, 0) + 1)) AS u(i)
), h AS (
  SELECT doc_id, pos, {hash64_sql('gram')} AS gh FROM w
), dupw AS (
  SELECT doc_id, pos FROM h
  WHERE gh IN (SELECT gh FROM h GROUP BY gh HAVING COUNT(*) >= 2)
), isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dupw
), spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SPAN_K - 1} AS e
  FROM isl GROUP BY doc_id, grp
)
"""


def _duplicate_span_frames(spark, sf_dir):
    """Shared Spark-side span detection: returns (toked, spans) —
    tokenized docs and the maximal repeated spans per doc."""
    from dolphinbeat_spark.functions.hashes import hash64
    from dolphinbeat_spark.operators.text import word_grams_from_tokens

    d = load(spark, sf_dir, "documents", widen=True)
    toked = d.select("doc_id", T_tokens("text").alias("toks"))
    w = toked.select(
        "doc_id",
        F.posexplode(word_grams_from_tokens(F.col("toks"), _SPAN_K)).alias("pos0", "gram"),
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"),
        hash64(F.col("gram")).alias("gh"),
    )
    # r16 (guide §2.4, measured in OPTIMIZATION_r16.md): corpus-wide
    # window-frequency filter as ONE pass. The old groupBy(gh).count
    # + join-back referenced `w` twice, and Spark does not deduplicate
    # common subtrees, so the whole explode+md5 window-hash chain ran
    # twice per query (once under the frequency aggregate, once as the
    # join probe). count(*) OVER (PARTITION BY gh) keeps rows whose
    # hash repeats with identical semantics (inner join against the
    # distinct cnt>=2 hashes == per-row corpus count >= 2) while
    # evaluating `w` once; the one shuffle still carries only
    # (doc_id, pos, gh) — never text.
    # Skew ceiling (r17, ADVICE): one gh value = one window task (no
    # partial agg / AQE split for windows). A window-hash held by an
    # O(corpus) share of positions would bottleneck one task; K-gram
    # hashes (K=8 words) over real text are far below that, and the
    # rows carried are 24-byte triples, so the single-task worst case
    # is bounded by corpus duplication itself. If a corpus ever
    # concentrates one span that hard, revert this site to aggregate +
    # broadcast join of the cnt>=2 hash set.
    dupw = (
        w.withColumn(
            "__cnt", F.count(F.lit(1)).over(Window.partitionBy("gh"))
        )
        .filter(F.col("__cnt") >= 2)
        .select("doc_id", "pos")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        dupw.withColumn("grp", F.col("pos") - F.row_number().over(win))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("s"), (F.max("pos") + (_SPAN_K - 1)).alias("e"))
    )
    return toked, spans


@register(
    "dedup_duplicate_spans",
    oracle=_SPAN_CTE + f"""
SELECT doc_id,
       CAST(s AS BIGINT) AS span_start,
       CAST(e AS BIGINT) AS span_end,
       CAST(e - s + 1 AS BIGINT) AS span_tokens
FROM spans
ORDER BY doc_id, span_start
""",
    tags=("dedup", "spans", "substring", "llm-pipeline"),
    bench=True,
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring extraction (the 'Deduplicating
    Training Data Makes Language Models Better' operation): find every
    maximal token span whose k-token windows ALL occur at least twice
    in the corpus, per document — the spans a trainer cuts out instead
    of dropping whole documents. The suffix-array form of this is
    superlinear-memory and single-machine; the distributed standard is
    windowed hashing (winnowing's cousin): hash every k-token window,
    keep windows whose hash repeats corpus-wide, and merge per-doc
    consecutive positions into maximal spans with the gaps-and-islands
    trick (pos - row_number is constant within a consecutive run).

    Shuffles: window-hash frequency is wordcount-shaped (partial aggs);
    the repeat filter is an equi-join on the 64-bit hash (never the
    text); the island merge windows per doc_id — bounded by windows
    per document, skew-safe. Span detection is shared with
    dedup_remove_spans (_duplicate_span_frames)."""
    _, spans = _duplicate_span_frames(spark, sf_dir)
    return spans.select(
        "doc_id",
        F.col("s").cast("bigint").alias("span_start"),
        F.col("e").cast("bigint").alias("span_end"),
        (F.col("e") - F.col("s") + 1).cast("bigint").alias("span_tokens"),
    ).orderBy("doc_id", "span_start")


@register(
    "graph_triangles_neardup",
    oracle=_MINHASH_CTE + _BANDS_CTE + """
, tri AS (
  SELECT COUNT(*) AS n_triangles FROM cand e1
  JOIN cand e2 ON e2.id_a = e1.id_b
  JOIN cand e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
), wedges AS (
  SELECT COUNT(*) AS n_wedges FROM cand e1
  JOIN cand e2 ON e2.id_a = e1.id_b
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_edges,
       CAST(w.n_wedges AS BIGINT) AS n_wedges,
       CAST(t.n_triangles AS BIGINT) AS n_triangles
FROM tri t, wedges w
""",
    tags=("graph", "triangles", "dedup"),
)
def graph_triangles_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the near-duplicate candidate graph — the
    standard graph-analytics reduction beyond connected components
    (triangles measure how CLIQUE-LIKE duplicate clusters are: chains
    of borderline pairs have none, true duplicate groups are dense).
    Node-ordered edges (id_a < id_b) make each triangle count exactly
    once: wedges join edge(a,b)xedge(b,c), closure checks (a,c).

    Scale shape: two equi-joins on vertex keys over the ORDERED edge
    list — ordering by id (degree in production) bounds wedge fan-out
    by the smaller endpoint's out-degree, the classic trick that keeps
    triangle counting feasible on power-law graphs."""
    d = load(spark, sf_dir, "documents", widen=True)
    sigs = D.minhash_signatures(d, "doc_id", "text", NUM_PERM, SHINGLE_K)
    edges = D.lsh_candidate_pairs(sigs, "doc_id", NUM_PERM, BANDS)
    e1 = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = edges.select(F.col("id_a").alias("b2"), F.col("id_b").alias("c"))
    wedges = e1.join(e2, F.col("b") == F.col("b2")).select("a", "b", "c")
    closure = edges.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("c"), F.lit(1).alias("__hit")
    )
    tri = wedges.join(closure, ["a", "c"])
    return (
        edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        .join(wedges.agg(F.count(F.lit(1)).cast("bigint").alias("n_wedges")))
        .join(tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles")))
    )


@register(
    "dedup_remove_spans",
    # shared span CTE + pure integer anti-join of token positions
    # against covered positions, ordered string_agg — exact
    oracle=_SPAN_CTE + f""",
covered AS (
  SELECT DISTINCT spans.doc_id, CAST(c.p AS BIGINT) AS pos
  FROM spans, unnest(range(spans.s, spans.e + 1)) AS c(p)
), toks_l AS (
  SELECT t.doc_id, CAST(u.i AS BIGINT) AS pos,
         t.toks[CAST(u.i AS INTEGER)] AS tok
  FROM t, unnest(range(1, len(t.toks) + 1)) AS u(i)
), kept AS (
  SELECT tl.doc_id, tl.pos, tl.tok
  FROM toks_l tl LEFT JOIN covered c
    ON c.doc_id = tl.doc_id AND c.pos = tl.pos
  WHERE c.doc_id IS NULL
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_cut,
       COALESCE(a.cleaned, '') AS cleaned
FROM t LEFT JOIN agg a USING (doc_id)
ORDER BY t.doc_id
""",
    tags=("dedup", "spans", "cleaning", "llm-pipeline"),
)
def dedup_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the duplicate-span cut: compose the shared span detection
    (_duplicate_span_frames, same machinery as dedup_duplicate_spans)
    with the removal itself — every token whose position falls inside
    a repeated span is cut, the survivors re-join into cleaned text,
    and the cut count rides along. The cut-spans-not-documents dedup
    end to end (repeats of a gram are cut from every occurrence; a
    KEEP-one-copy policy would seed detection from a canonical-
    occurrence rank, same machinery).

    Scale shape: the span side is dedup_duplicate_spans' plan; spans
    regroup per doc (bounded arrays), one equi-join back to documents,
    and the cut is a per-row higher-order filter over positions."""
    toked, spans = _duplicate_span_frames(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(F.collect_list(F.struct("s", "e")).alias("iv"))
    joined = toked.join(per_doc, "doc_id", "left")
    positions = F.transform(
        F.sequence(F.lit(1), F.size("toks")), lambda x: x.cast("bigint")
    )
    in_span = lambda p: F.exists(  # noqa: E731
        F.coalesce(F.col("iv"), F.array().cast("array<struct<s:bigint,e:bigint>>")),
        lambda s: (p >= s["s"]) & (p <= s["e"]),
    )
    kept = F.filter(positions, lambda p: ~in_span(p))
    return joined.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("bigint").alias("n_cut"),
        F.array_join(
            F.transform(kept, lambda p: F.element_at("toks", p.cast("int"))), " "
        ).alias("cleaned"),
    ).orderBy("doc_id")

# ---------------------------------------------------------------------------
# STREAMING near-dup dedup with verify stage: the real streaming path
# (applyInPandasWithState over an availableNow file stream) driven as a
# correctness spec, with a full DuckDB oracle replicating the admit
# semantics — stronger evidence than a rows-only check.
# ---------------------------------------------------------------------------

# streaming-decision CTEs shared by both specs (on top of _MINHASH_CTE
# + _BANDS_CTE): the verified streaming path admits a banded doc unless
# some band key was first marked by an EARLIER doc (owner) whose full-
# signature minhash agreement clears the threshold. Bloom false
# positives / cache evictions cannot occur at gate scale (n_bits 2^20,
# cap 50k vs ~4k keys), so the SQL below is the exact decision law.
_STREAM_DECISIONS_CTE = f"""
, owners AS (
  SELECT band_key, MIN(doc_id) AS owner FROM bands GROUP BY band_key
), coll AS (
  SELECT DISTINCT b.doc_id, o.owner
  FROM bands b JOIN owners o USING (band_key)
  WHERE o.owner < b.doc_id
), est AS (
  SELECT c.doc_id, c.owner,
         CAST(count_if(m1.minhash = m2.minhash) AS DOUBLE) / {NUM_PERM} AS est
  FROM coll c
  JOIN minhash m1 ON m1.doc_id = c.doc_id
  JOIN minhash m2 ON m2.doc_id = c.owner AND m2.perm = m1.perm
  GROUP BY c.doc_id, c.owner
), decisions AS (
  SELECT d.doc_id,
         COALESCE(NOT bool_or(e.est >= 0.5), TRUE) AS admitted,
         COUNT(e.owner) > 0 AS any_collision
  FROM (SELECT DISTINCT doc_id FROM bands) d
  LEFT JOIN est e USING (doc_id)
  GROUP BY d.doc_id
)
"""


def _stream_verified_decisions(spark: SparkSession, sf_dir: str):
    """Run the VERIFIED streaming near-dup path (streaming/state.py::
    streaming_band_flags_verified) over the documents table as a real
    availableNow Structured Streaming query, and return the per-doc
    admit decisions as a local DataFrame.

    The stream/checkpoint/flag files live in a temp dir removed before
    returning; decisions are collected (bounded: one row per banded
    doc) and re-created so the returned plan has no dangling file
    dependency. The driver-side collect is the documented price of
    evaluating a STREAMING operator inside a batch correctness spec."""
    import shutil
    import tempfile

    from dolphinbeat_spark.streaming.state import (
        near_dup_admitted_verified,
        streaming_band_flags_verified,
    )

    d = load(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="stream_neardup_")
    try:
        src = f"{work}/src"
        d.select("doc_id", "text").write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        flags = streaming_band_flags_verified(
            stream,
            num_perm=NUM_PERM,
            bands=BANDS,
            shingle_k=SHINGLE_K,
            n_shards=16,
        )
        out = f"{work}/flags"
        q = (
            flags.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", f"{work}/ckp")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        decisions = near_dup_admitted_verified(spark.read.parquet(out), threshold=0.5)
        decisions = materialize_bounded(decisions)  # pin before rmtree
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return decisions


@register(
    "stream_near_dup_admitted",
    oracle=_MINHASH_CTE + _BANDS_CTE + _STREAM_DECISIONS_CTE + """
SELECT doc_id, admitted, any_collision FROM decisions
ORDER BY doc_id
""",
    tags=("dedup", "streaming", "lsh", "verify"),
)
def stream_near_dup_admitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified STREAMING near-dup admit decision per document,
    oracle-checked end to end: file stream -> Catalyst banding ->
    per-shard bloom + signature-cache state -> collision verify
    (minhash-estimated Jaccard vs the band key's owner) -> admit.

    ``any_collision`` is what the unverified OR-rule would have
    flagged; ``admitted`` is the verified decision — their disagreement
    rows are exactly the band-collision false positives the verify
    stage rescues (cf. VERDICT r5: the unverified admit silently loses
    training data at scale)."""
    return _stream_verified_decisions(spark, sf_dir).select(
        "doc_id", "admitted", "any_collision"
    ).orderBy("doc_id")


@register(
    "stream_near_dup_precision",
    oracle=_MINHASH_CTE + _BANDS_CTE + _STREAM_DECISIONS_CTE + f"""
, sh AS (
  SELECT doc_id, {_SHINGLES} AS sh FROM documents
), verified_pairs AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
  FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b
), batch_dups AS (
  SELECT DISTINCT id_b AS doc_id FROM verified_pairs WHERE jaccard >= 0.5
), joined AS (
  SELECT dec.doc_id, dec.admitted, dec.any_collision,
         bd.doc_id IS NOT NULL AS is_batch_dup
  FROM decisions dec LEFT JOIN batch_dups bd USING (doc_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(count_if(NOT admitted) AS BIGINT) AS n_dropped_verified,
       CAST(count_if(any_collision) AS BIGINT) AS n_flagged_any,
       CAST(count_if(is_batch_dup) AS BIGINT) AS n_batch_dups,
       CAST(count_if(NOT admitted AND is_batch_dup) AS BIGINT) AS n_tp_verified,
       CAST(count_if(any_collision AND is_batch_dup) AS BIGINT) AS n_tp_any,
       ROUND(CASE WHEN count_if(NOT admitted) = 0 THEN 1.0
                  ELSE CAST(count_if(NOT admitted AND is_batch_dup) AS DOUBLE)
                       / count_if(NOT admitted) END, 6) AS precision_verified,
       ROUND(CASE WHEN count_if(any_collision) = 0 THEN 1.0
                  ELSE CAST(count_if(any_collision AND is_batch_dup) AS DOUBLE)
                       / count_if(any_collision) END, 6) AS precision_any,
       ROUND(CASE WHEN count_if(is_batch_dup) = 0 THEN 1.0
                  ELSE CAST(count_if(NOT admitted AND is_batch_dup) AS DOUBLE)
                       / count_if(is_batch_dup) END, 6) AS recall_verified
FROM joined
""",
    tags=("dedup", "streaming", "lsh", "evaluation"),
)
def stream_near_dup_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup PRECISION vs the batch pipeline's truth
    (LSH candidates verified by exact shingle Jaccard >= 0.5, i.e.
    dedup_minhash_lsh_pairs -> jaccard_pairs): of the docs the
    verified streaming path drops, how many the batch pipeline also
    calls duplicates — side by side with what the unverified OR-rule
    would have dropped (``precision_any``), making the verify stage's
    gain a measured number instead of a design claim."""
    dec = _stream_verified_decisions(spark, sf_dir)
    d = load(spark, sf_dir, "documents", widen=True)
    sigs = D.minhash_signatures(d, "doc_id", "text", NUM_PERM, SHINGLE_K)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", NUM_PERM, BANDS)
    verified = D.jaccard_pairs(d, "doc_id", "text", cand, SHINGLE_K)
    batch_dups = (
        verified.filter(F.col("jaccard") >= 0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("is_batch_dup", F.lit(True))
    )
    j = dec.join(batch_dups, "doc_id", "left").select(
        "doc_id",
        "admitted",
        "any_collision",
        F.coalesce("is_batch_dup", F.lit(False)).alias("is_batch_dup"),
    )
    dropped = F.count_if(~F.col("admitted"))
    flagged = F.count_if("any_collision")
    dups = F.count_if("is_batch_dup")
    tp_v = F.count_if(~F.col("admitted") & F.col("is_batch_dup"))
    tp_a = F.count_if(F.col("any_collision") & F.col("is_batch_dup"))
    ratio = lambda num, den: F.round(  # noqa: E731
        F.when(den == 0, F.lit(1.0)).otherwise(num.cast("double") / den), 6
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_docs"),
        dropped.alias("n_dropped_verified"),
        flagged.alias("n_flagged_any"),
        dups.alias("n_batch_dups"),
        tp_v.alias("n_tp_verified"),
        tp_a.alias("n_tp_any"),
        ratio(tp_v, dropped).alias("precision_verified"),
        ratio(tp_a, flagged).alias("precision_any"),
        ratio(tp_v, dups).alias("recall_verified"),
    )
