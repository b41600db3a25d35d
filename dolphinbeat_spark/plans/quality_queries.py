"""Training-data quality / packing operators (north-star; absent in
the reference — the filters every large-scale LLM corpus pipeline runs
before training, per the public C4 and Gopher recipes).

All map-only or per-shard-window plans: repetition and quality signals
are Catalyst higher-order functions over a once-materialized token
array (no explode, no shuffle until presentation); sequence packing
windows per ``source`` shard, never globally. Ratios follow the
cross-engine convention (exact integer numerators / denominators cast
to double at the end — registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.functions.hashes import hash64_sql
from dolphinbeat_spark.operators import text as T
from dolphinbeat_spark.plans.registry import register

_TOKENS_SQL = r"regexp_split_to_array(trim(text), '\s+')"
_STOP_SQL = ", ".join(f"'{s}'" for s in T.STOPWORDS)


@register(
    "quality_repetition",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents WHERE doc_id % 3 = 0
), m AS (
  SELECT doc_id, len(toks) AS n_tokens,
         list_transform(range(1, len(toks)),
                        i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i + 1 AS INTEGER)]) AS bgs,
         list_max(list_transform(list_distinct(toks),
                                 d -> len(list_filter(toks, t -> t = d)))) AS top_cnt
  FROM t
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(len(bgs) - len(list_distinct(bgs)) AS DOUBLE)
         / greatest(len(bgs), 1) AS dup_bigram_frac,
       CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_frac
FROM m
ORDER BY doc_id
""",
    tags=("quality", "repetition", "gopher"),
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-bigram fraction and
    top-token mass per document — the classic 'repetitious document'
    gate. Map-only: one token split, bigrams/distincts/counts all as
    Catalyst higher-order functions (the per-distinct-token count scan
    is O(n·distinct) INSIDE one row — no shuffle at any size; the
    explode-and-group formulation would shuffle every token)."""
    d = load(spark, sf_dir, "documents", widen=True).filter(F.col("doc_id") % 3 == 0)
    toked = d.select("doc_id", T.tokens("text").alias("toks"))
    n = F.size("toks")
    bgs = F.when(
        n > 1,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("toks", i), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda d_: F.size(F.filter("toks", lambda t: t == d_)),
        )
    )
    m = toked.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        bgs.alias("bgs"),
        top_cnt.alias("top_cnt"),
    )
    n_bgs = F.size("bgs")
    return m.select(
        "doc_id",
        "n_tokens",
        (
            (n_bgs - F.size(F.array_distinct("bgs"))).cast("double")
            / F.greatest(n_bgs, F.lit(1))
        ).alias("dup_bigram_frac"),
        (F.col("top_cnt").cast("double") / F.col("n_tokens")).alias("top_token_frac"),
    ).orderBy("doc_id")


@register(
    "quality_c4_signals",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, {_TOKENS_SQL} AS toks FROM documents WHERE doc_id % 3 = 1
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
         / len(toks) AS mean_token_len,
       CAST(len(list_filter(toks, t -> regexp_matches(t, '^[a-z]+$'))) AS DOUBLE)
         / len(toks) AS frac_alpha,
       CAST(length(text) - length(replace(text, '.', '')) AS BIGINT) AS n_periods,
       regexp_matches(text, '[.!?] *$') AS ends_with_punct,
       regexp_matches(text, '[0-9]') AS has_digits
FROM t
ORDER BY doc_id
""",
    tags=("quality", "c4", "heuristics"),
)
def quality_c4_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality heuristics per document: mean token length,
    alphabetic-token fraction, sentence-period count, terminal
    punctuation, digit presence — the cheap gates a corpus pipeline
    runs on every document before anything expensive. Entirely
    map-side Catalyst expressions; ratios are exact-int / exact-int
    cast to double (bit-identical cross-engine)."""
    d = load(spark, sf_dir, "documents", widen=True).filter(F.col("doc_id") % 3 == 1)
    toked = d.select("doc_id", "text", T.tokens("text").alias("toks"))
    n = F.size("toks")
    sum_len = F.aggregate(
        "toks", F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    n_alpha = F.size(F.filter("toks", lambda t: t.rlike("^[a-z]+$")))
    return toked.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        (sum_len.cast("double") / n).alias("mean_token_len"),
        (n_alpha.cast("double") / n).alias("frac_alpha"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("."), F.lit(""))))
        .cast("bigint")
        .alias("n_periods"),
        F.col("text").rlike("[.!?] *$").alias("ends_with_punct"),
        F.col("text").rlike("[0-9]").alias("has_digits"),
    ).orderBy("doc_id")


@register(
    "text_boilerplate_ngrams",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents WHERE doc_id % 2 = 0
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
             i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ',
                         toks[i+3], ' ', toks[i+4])))) AS g
  FROM t
), counts AS (
  SELECT g, COUNT(*) AS nd FROM sh GROUP BY g
)
SELECT s.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN c.nd >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       CAST(SUM(CASE WHEN c.nd >= 5 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS boiler_frac
FROM sh s JOIN counts c USING (g)
GROUP BY s.doc_id
ORDER BY s.doc_id
""",
    tags=("quality", "boilerplate", "ngram"),
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate detection by cross-document n-gram
    frequency: a 5-gram present in ≥5 documents is boilerplate
    (headers, footers, license blurbs); each doc reports its
    boilerplate-gram fraction — the input to span-removal. Distinct
    grams per doc (set semantics), document frequency via one groupBy
    (map-side combined), join-back on the gram hash: two shuffles,
    both on the already-reduced gram stream — the formulation that
    survives a corpus-scale document-frequency table."""
    d = load(spark, sf_dir, "documents", widen=True).filter(F.col("doc_id") % 2 == 0)
    sh = (
        d.select("doc_id", T.tokens("text").alias("__toks"))
        .select(
            "doc_id",
            F.explode(T.word_shingles_from_tokens(F.col("__toks"), 5)).alias("g"),
        )
    )
    counts = sh.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    joined = sh.join(counts, "g")
    n_boiler = F.sum(F.when(F.col("nd") >= 5, 1).otherwise(0)).cast("bigint")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            n_boiler.alias("n_boiler"),
            (n_boiler.cast("double") / F.count(F.lit(1))).alias("boiler_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "sample_train_val_test",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, source, n_chars,
         CASE
           WHEN {hash64_sql("concat('split-', CAST(doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
           WHEN {hash64_sql("concat('split-', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT source, split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
FROM assigned
GROUP BY source, split
ORDER BY source, split
""",
    tags=("sampling", "splits", "training-prep"),
)
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-key
    hash — replayable across runs AND engines (rand()-based splits are
    neither), leakage-free by construction (a doc's split is a pure
    function of its id, so re-ingesting can never move it). Map-only
    until the per-(source, split) audit rollup."""
    from dolphinbeat_spark.functions.hashes import hash64

    d = load(spark, sf_dir, "documents")
    h = hash64(F.concat(F.lit("split-"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
        )
        .orderBy("source", "split")
    )


_CTX = 512  # packing context window (tokens)


@register(
    "pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, len({_TOKENS_SQL}) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM t WHERE n_tokens > 0
)
SELECT doc_id, source, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_token,
       CAST((cum - n_tokens) // {_CTX} AS BIGINT) AS bin_first,
       CAST((cum - 1) // {_CTX} AS BIGINT) AS bin_last,
       CAST((cum - 1) // {_CTX} - (cum - n_tokens) // {_CTX} + 1 AS BIGINT) AS n_bins
FROM c
ORDER BY doc_id
""",
    tags=("packing", "training-prep"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing offsets: documents are concatenated
    per ``source`` shard in doc_id order and chunked into fixed
    512-token context windows; each doc's start offset and the bin
    range it spans come from one per-shard prefix sum. The window is
    PARTITIONED by source — packing is a per-shard operation by
    construction (that's also how a real pipeline shards it), so no
    single-partition exchange at any corpus size. Pure integer
    arithmetic: exact cross-engine."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(T.tokens("text")).cast("bigint").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        start.cast("bigint").alias("start_token"),
        F.floor(start / _CTX).cast("bigint").alias("bin_first"),
        F.floor((F.col("cum") - 1) / _CTX).cast("bigint").alias("bin_last"),
        (
            F.floor((F.col("cum") - 1) / _CTX) - F.floor(start / _CTX) + 1
        ).cast("bigint").alias("n_bins"),
    ).orderBy("doc_id")


@register(
    "quality_unigram_lm",
    # ln() is not correctly-rounded identically across engines (ulp
    # differences); both sides fold the per-token terms in the SAME
    # deterministic token order and ROUND(,4) absorbs the ~1e-13
    # accumulated ulp noise (same convention as sketch_hll_users)
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS k FROM tok GROUP BY doc_id, token
), vocab AS (
  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM tok
), terms AS (
  SELECT tf.doc_id, tf.token, tf.k,
         CAST(tf.k AS DOUBLE)
           * ln(CAST(vb.cnt + 1 AS DOUBLE) / CAST(t.n_total + t.v AS DOUBLE)) AS term
  FROM tf JOIN vocab vb USING (token) CROSS JOIN tot t
), doc AS (
  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
         ROUND(-list_reduce(list(term ORDER BY token), (a, x) -> a + x)
               / CAST(SUM(k) AS BIGINT), 4) AS xent_nats
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n_tokens, xent_nats, ROUND(exp(xent_nats), 2) AS ppl
FROM doc ORDER BY doc_id
""",
    tags=("quality", "lm", "perplexity", "ccnet", "llm-pipeline"),
    bench=True,
)
def quality_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering with a from-scratch LM: train
    an add-one-smoothed unigram language model on the corpus itself,
    score every document by per-token cross-entropy (nats) and
    perplexity. Low-ppl documents read like the corpus average (head
    of a CCNet split); high-ppl ones are outliers — the standard
    cheap quality signal when no external KenLM is available, and the
    exact plan shape one would use WITH one (broadcast the external
    vocab instead of computing it).

    Scale shape: vocab building is wordcount (one shuffle on token,
    partial-aggregated); scoring joins (doc,token,k) to the vocab on
    token — an equi-join whose build side is the vocabulary, typically
    << corpus and broadcastable; the per-doc fold runs over an
    array_sort'ed collect_list so the double summation order matches
    the oracle bit-for-bit (doc-bounded memory: distinct tokens per
    doc)."""
    d = load(spark, sf_dir, "documents", widen=True)
    tok = d.select("doc_id", F.explode(T.tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("k"))
    # r16 single-tokenize cascade (guide §2.3/§2.4, second attempt —
    # the first, which kept count_distinct over tok, never got AQE
    # exchange reuse and was reverted): vocab re-aggregates tf
    # (sum of per-doc counts == count of occurrences) and tot derives
    # from VOCAB (n_total = sum cnt, v = row count — no distinct
    # aggregate anywhere), so all three branches hang off the same
    # tf exchange subtree and AQE stage reuse runs the scan+tokenize
    # and the (doc_id, token) shuffle ONCE (verified Reused* nodes in
    # the executedPlan; the rollup_cascade pattern). Integer-exact:
    # same counts, same bigint types, same join rows.
    vocab = tf.groupBy("token").agg(F.sum("k").alias("cnt"))
    tot = vocab.agg(
        F.sum("cnt").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    terms = (
        tf.join(vocab, "token")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            "token",
            "k",
            (
                F.col("k").cast("double")
                * F.log(
                    (F.col("cnt") + 1).cast("double")
                    / (F.col("n_total") + F.col("v")).cast("double")
                )
            ).alias("term"),
        )
    )
    doc = terms.groupBy("doc_id").agg(
        F.sum("k").cast("bigint").alias("n_tokens"),
        F.round(
            -F.aggregate(
                F.array_sort(F.collect_list(F.struct("token", "term"))),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            )
            / F.sum("k").cast("bigint"),
            4,
        ).alias("xent_nats"),
    )
    return doc.select(
        "doc_id", "n_tokens", "xent_nats", F.round(F.exp("xent_nats"), 2).alias("ppl")
    ).orderBy("doc_id")


@register(
    "quality_entropy",
    # ln() ulp differences absorbed by ROUND(,4); both engines fold
    # the per-symbol terms in the SAME order (sorted symbol) so the
    # double summation is order-identical
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_sort(list_distinct(string_split(text, ''))) AS chars_d,
         string_split(text, '') AS chars,
         list_sort(list_distinct({_TOKENS_SQL})) AS toks_d,
         {_TOKENS_SQL} AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         len(chars) AS n_chars_t,
         len(toks) AS n_toks,
         list_reduce(
           list_prepend(0.0, list_transform(chars_d,
             c -> - (CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE) / len(chars))
                  * ln(CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE) / len(chars)))),
           (a, x) -> a + x) AS char_h,
         list_reduce(
           list_prepend(0.0, list_transform(toks_d,
             w -> - (CAST(len(list_filter(toks, x -> x = w)) AS DOUBLE) / len(toks))
                  * ln(CAST(len(list_filter(toks, x -> x = w)) AS DOUBLE) / len(toks)))),
           (a, x) -> a + x) AS tok_h
  FROM t
)
SELECT doc_id, CAST(n_chars_t AS BIGINT) AS n_chars_t,
       ROUND(char_h, 4) AS char_entropy,
       ROUND(tok_h, 4) AS token_entropy
FROM m ORDER BY doc_id
""",
    tags=("quality", "entropy", "llm-pipeline"),
)
def quality_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy gates: character-level and token-level entropy
    per document (nats). Low char-entropy flags repeated-symbol junk
    ('aaaa…', ASCII art); low token-entropy flags template spam that
    passes length checks; both are standard cheap gates before
    expensive dedup. Map-only: the histogram is computed INSIDE each
    row with Catalyst higher-order functions over the distinct-symbol
    list (O(n·distinct) per row, zero shuffle until presentation) —
    the explode-and-group formulation would shuffle every character of
    a 100 TB corpus. Terms fold in sorted-symbol order on both
    engines, making the double sums bit-comparable under ROUND(,4)."""
    d = load(spark, sf_dir, "documents", widen=True)
    m = d.select(
        "doc_id",
        F.split("text", "").alias("chars"),
        T.tokens("text").alias("toks"),
    )

    def h(arr):
        n = F.size(arr)
        dis = F.array_sort(F.array_distinct(arr))
        p = lambda s: F.size(F.filter(arr, lambda x: x == s)).cast("double") / n  # noqa: E731
        return F.aggregate(
            F.transform(dis, lambda s: -p(s) * F.log(p(s))),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    return m.select(
        "doc_id",
        F.size("chars").cast("bigint").alias("n_chars_t"),
        F.round(h(F.col("chars")), 4).alias("char_entropy"),
        F.round(h(F.col("toks")), 4).alias("token_entropy"),
    ).orderBy("doc_id")


# stand-in coefficients for the classifier spec: intercept, mean token
# length, alphabetic fraction, stopword fraction. Production swaps in
# trained weights (same broadcast + identical plan).
_CLF_W = (-3.0, 0.35, 2.0, 1.5)


@register(
    "quality_linear_classifier",
    # features are exact int/int doubles; the linear combination is a
    # FIXED left-to-right chain of IEEE ops on identical operands →
    # bit-identical z on both engines. Only exp() needs ROUND-slack.
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
), feats AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
           / len(toks) AS mean_len,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$'))) AS DOUBLE)
           / len(toks) AS frac_alpha,
         CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
           / len(toks) AS frac_stop
  FROM t
), scored AS (
  SELECT doc_id,
         ((({_CLF_W[0]} + {_CLF_W[1]} * mean_len) + {_CLF_W[2]} * frac_alpha)
          + {_CLF_W[3]} * frac_stop) AS z
  FROM feats
)
SELECT doc_id, ROUND(z, 6) AS z,
       ROUND(1.0 / (1.0 + exp(-z)), 4) AS prob,
       z > 0 AS keep
FROM scored ORDER BY doc_id
""",
    tags=("quality", "classifier", "llm-pipeline"),
)
def quality_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier inference at scale (the fastText/logreg gate
    every production corpus runs — FineWeb-Edu style): a linear model
    over cheap per-doc features (mean token length, alphabetic
    fraction, stopword fraction), sigmoid score, keep decision on the
    raw margin. The coefficient vector here is a fixed stand-in;
    production broadcasts trained weights into the SAME plan — which
    is the point: inference is a map-only projection, no shuffle, no
    UDF, whatever the weights are. The keep decision compares the
    bit-deterministic margin z (not the rounded probability), so the
    boundary is exact cross-engine."""
    d = load(spark, sf_dir, "documents", widen=True)
    toked = d.select("doc_id", T.tokens("text").alias("toks"))
    n = F.size("toks")
    sum_len = F.aggregate(
        "toks", F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    mean_len = sum_len.cast("double") / n
    frac_alpha = (
        F.size(F.filter("toks", lambda t: t.rlike("^[a-z]+$"))).cast("double") / n
    )
    stop_arr = F.array(*[F.lit(s) for s in T.STOPWORDS])
    frac_stop = (
        F.size(F.filter("toks", lambda t: F.array_contains(stop_arr, t))).cast("double")
        / n
    )
    w0, w1, w2, w3 = _CLF_W
    z = ((F.lit(w0) + F.lit(w1) * mean_len) + F.lit(w2) * frac_alpha) + F.lit(
        w3
    ) * frac_stop
    return toked.select(
        "doc_id",
        F.round(z, 6).alias("z"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4).alias("prob"),
        (z > 0).alias("keep"),
    ).orderBy("doc_id")


@register(
    "profile_source_divergence",
    # per-source terms fold in sorted-token order on both engines;
    # ln() ulp noise absorbed by ROUND(,4) (the quality_unigram_lm
    # convention). p and q themselves are exact int/int doubles.
    oracle=f"""
WITH tok AS (
  SELECT source, unnest({_TOKENS_SQL}) AS token FROM documents
), st AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS k
  FROM tok GROUP BY source, token
), corpus AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY token
), totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok
), src_tot AS (
  SELECT source, CAST(SUM(k) AS BIGINT) AS n_s, CAST(COUNT(*) AS BIGINT) AS n_unique
  FROM st GROUP BY source
), terms AS (
  SELECT st.source, st.token,
         (CAST(st.k AS DOUBLE) / s.n_s)
           * ln((CAST(st.k AS DOUBLE) / s.n_s) / (CAST(c.c AS DOUBLE) / t.n)) AS term
  FROM st
  JOIN src_tot s USING (source)
  JOIN corpus c USING (token)
  CROSS JOIN totals t
)
SELECT s.source, s.n_s AS n_tokens, s.n_unique,
       ROUND(list_reduce(list_prepend(0.0, list(term ORDER BY token)),
                         (a, x) -> a + x), 4) AS kl_nats
FROM terms tm JOIN src_tot s USING (source)
GROUP BY s.source, s.n_s, s.n_unique
ORDER BY s.source
""",
    tags=("profiling", "divergence", "mixture", "llm-pipeline"),
)
def profile_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-audit divergence profile: KL(p_source ‖ p_corpus) over
    token distributions, per source — the drift/mixture audit a
    pipeline runs to see which sources are linguistic outliers (high
    KL = the source reads nothing like the blend; candidates for a
    dedicated mixture weight or a closer look). Every source token
    also appears in the corpus distribution, so the KL is finite by
    construction.

    Scale shape: two wordcount aggregations (per-source-token and
    corpus-token, both partial-aggregated), one equi-join on token,
    1-row totals broadcast, then a per-source sorted fold whose state
    is bounded by the source's vocabulary — no document text moves
    after the explode."""
    d = load(spark, sf_dir, "documents", widen=True)
    tok = d.select("source", F.explode(T.tokens("text")).alias("token"))
    st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    # corpus counts and the grand total REDUCE the per-source counts
    # instead of re-exploding tok: the tokenize+explode subtree (the
    # expensive step) runs once, not three times
    corpus = st.groupBy("token").agg(F.sum("k").cast("bigint").alias("c"))
    totals = st.agg(F.sum("k").cast("bigint").alias("n"))
    src_tot = st.groupBy("source").agg(
        F.sum("k").cast("bigint").alias("n_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
    )
    p = F.col("k").cast("double") / F.col("n_s")
    q = F.col("c").cast("double") / F.col("n")
    terms = (
        st.join(src_tot, "source")
        .join(corpus, "token")
        .join(F.broadcast(totals))
        .select("source", "n_s", "n_unique", "token", (p * F.log(p / q)).alias("term"))
    )
    return (
        terms.groupBy("source", "n_s", "n_unique")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("token", "term"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["term"],
                ),
                4,
            ).alias("kl_nats")
        )
        .select("source", F.col("n_s").alias("n_tokens"), "n_unique", "kl_nats")
        .orderBy("source")
    )


_DSIR_B = 256  # hashed feature buckets (DSIR uses 10k at corpus scale)


@register(
    "sample_dsir_importance",
    # ln() ulp noise absorbed by ROUND(,4) over a bucket-ordered fold
    # (the quality_unigram_lm convention). All counts are exact ints;
    # the only doubles are the two smoothed-log terms per bucket.
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKENS_SQL} AS tk FROM documents
), feats AS (
  SELECT doc_id, source, unnest(list_concat(
           tk,
           list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                          i -> concat(tk[i], ' ', tk[i + 1]))
         )) AS f
  FROM toks
), bucketed AS (
  SELECT doc_id, source,
         CAST(substr(source, 4) AS INTEGER) < 5 AS is_target,
         ({hash64_sql('f')}) % {_DSIR_B} AS b
  FROM feats
), bucket_stats AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS r_cnt,
         CAST(count_if(is_target) AS BIGINT) AS t_cnt
  FROM bucketed GROUP BY b
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS r_total,
         CAST(count_if(is_target) AS BIGINT) AS t_total
  FROM bucketed
), doc_b AS (
  SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS n
  FROM bucketed GROUP BY doc_id, source, b
), terms AS (
  SELECT d.doc_id, d.source, d.b, d.n,
         CAST(d.n AS DOUBLE)
           * (ln(CAST(s.t_cnt + 1 AS DOUBLE) / CAST(t.t_total + {_DSIR_B} AS DOUBLE))
              - ln(CAST(s.r_cnt + 1 AS DOUBLE) / CAST(t.r_total + {_DSIR_B} AS DOUBLE)))
           AS term
  FROM doc_b d JOIN bucket_stats s USING (b) CROSS JOIN tot t
), scored AS (
  SELECT doc_id, source, CAST(SUM(n) AS BIGINT) AS n_feats,
         ROUND(list_reduce(list(term ORDER BY b), (a, x) -> a + x), 4) AS log_importance
  FROM terms GROUP BY doc_id, source
)
SELECT doc_id, source, n_feats, log_importance,
       log_importance > 0 AS target_like
FROM scored ORDER BY doc_id
""",
    tags=("sampling", "dsir", "importance", "llm-pipeline"),
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (hashed n-gram importance resampling,
    Xie et al. 2023): per-document log importance weight
    log p_target(doc) - log p_raw(doc) under two add-one-smoothed
    bag-of-hashed-features models — unigrams + bigrams hashed into
    B=256 buckets, target = the src0-src4 slice of the corpus, raw =
    the whole pool. Positive weight = reads more like the target than
    the average document; DSIR then resamples proportional to
    exp(weight) (a nondeterministic Gumbel step left to the caller —
    the weights are the method's substance).

    Scale shape: the feature space is FIXED at B buckets regardless
    of corpus size, so both distributions and the per-doc join side
    are broadcastable constants; everything else is wordcount-shaped
    (one shuffle on bucket id, partial-aggregated) plus a per-doc
    bucket-ordered fold bounded by B. The 100 TB form is identical
    with B=10k."""
    d = load(spark, sf_dir, "documents", widen=True)
    toked = d.select("doc_id", "source", T.tokens("text").alias("tk"))
    feats = toked.select(
        "doc_id",
        "source",
        F.explode(
            F.concat(
                F.col("tk"),
                F.expr(
                    "transform(sequence(1, greatest(size(tk) - 1, 0)),"
                    " i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"
                ),
            )
        ).alias("f"),
    )
    from dolphinbeat_spark.functions.hashes import hash64

    bucketed = feats.select(
        "doc_id",
        "source",
        F.pmod(hash64(F.col("f")), F.lit(_DSIR_B)).alias("b"),
    )
    # r16 single-featurize cascade (the quality_unigram_lm pattern):
    # bucket_stats and the totals both derive from doc_b — r_cnt per
    # bucket = sum of per-doc counts, t_cnt = the same sum over target
    # docs (is_target is a function of the source column doc_b
    # carries), totals = sums over bucket_stats. Integer-exact, no
    # distinct aggregates, and every doc_b column is referenced, so
    # all branches share doc_b's exchange canonically and AQE stage
    # reuse runs the tokenize+bigram+hash chain ONCE (verified
    # Reused* in the executedPlan) instead of three times.
    doc_b = bucketed.groupBy("doc_id", "source", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    _is_t = F.substring("source", 4, 10).cast("int") < 5
    bucket_stats = doc_b.groupBy("b").agg(
        F.sum("n").cast("bigint").alias("r_cnt"),
        F.sum(F.when(_is_t, F.col("n")).otherwise(F.lit(0).cast("bigint")))
        .cast("bigint").alias("t_cnt"),
    )
    tot = bucket_stats.agg(
        F.sum("r_cnt").cast("bigint").alias("r_total"),
        F.sum("t_cnt").cast("bigint").alias("t_total"),
    )
    terms = (
        doc_b.join(F.broadcast(bucket_stats), "b")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            "b",
            "n",
            (
                F.col("n").cast("double")
                * (
                    F.log(
                        (F.col("t_cnt") + 1).cast("double")
                        / (F.col("t_total") + _DSIR_B).cast("double")
                    )
                    - F.log(
                        (F.col("r_cnt") + 1).cast("double")
                        / (F.col("r_total") + _DSIR_B).cast("double")
                    )
                )
            ).alias("term"),
        )
    )
    scored = terms.groupBy("doc_id", "source").agg(
        F.sum("n").cast("bigint").alias("n_feats"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("b", "term"))),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ),
            4,
        ).alias("log_importance"),
    )
    return scored.select(
        "doc_id",
        "source",
        "n_feats",
        "log_importance",
        (F.col("log_importance") > 0).alias("target_like"),
    ).orderBy("doc_id")
