"""Text-analysis query plans over the ``documents`` table.

Training-data-pipeline operators (north star; absent in the
reference): token statistics, quality scoring, language-ID heuristic,
document fingerprinting, shingle profiles. All pure Catalyst
expressions — per-row map work, no shuffle except final aggregations,
so they scale linearly to 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load, sorted_spread
from dolphinbeat_spark.functions.barrier import materialized
from dolphinbeat_spark.operators import text as T
from dolphinbeat_spark.plans.registry import register
from dolphinbeat_spark.functions.hashes import hash64_sql

_STOP_SQL = ", ".join(f"'{s}'" for s in T.STOPWORDS)
_TOKENS_SQL = r"regexp_split_to_array(trim(text), '\s+')"


@register(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       len({_TOKENS_SQL}) AS n_tokens,
       len(list_distinct({_TOKENS_SQL})) AS n_unique,
       length(text) AS n_chars_obs,
       CAST(length(replace(text, ' ', '')) AS DOUBLE) / len({_TOKENS_SQL}) AS avg_token_len
FROM documents
ORDER BY doc_id
""",
    tags=("text", "tokens"),
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + uniqueness + average token length.

    r16 sort-first (guide §1.4/§2.4; see dedup_minhash_signatures):
    orderBy before the tokenizing projection, so the range-bounds
    sampling pass re-scans raw parquet instead of re-running the
    split/distinct work, the projection runs ONCE above the sort, and
    the range exchange spreads it across cores. Identical rows and
    order (doc_id unique; projection preserves row order); the
    range-partition width is pinned via sorted_spread so AQE cannot
    collapse the tokenizing chain onto one core."""
    d = sorted_spread(load(spark, sf_dir, "documents"), "doc_id")
    toks = T.tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
        F.length("text").cast("bigint").alias("n_chars_obs"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text,
         len({_TOKENS_SQL}) AS n_tokens,
         len(list_filter({_TOKENS_SQL}, x -> x IN ({_STOP_SQL}))) AS n_stop,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id, n_tokens, n_stop,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_chars AS DOUBLE) / n_tokens AS chars_per_token,
       CASE WHEN n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6
            THEN 1 ELSE 0 END AS passes_quality
FROM t
ORDER BY doc_id
""",
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate: length + stopword-ratio band (the
    C4/Gopher-style rule family, deterministic integer arithmetic)."""
    d = load(spark, sf_dir, "documents")
    toks = T.tokens("text")
    base = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        T.stopword_count("text").alias("n_stop"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    return base.select(
        "doc_id",
        "n_tokens",
        "n_stop",
        ratio.alias("stopword_ratio"),
        (F.col("n_chars").cast("double") / F.col("n_tokens")).alias("chars_per_token"),
        F.when((F.col("n_tokens") >= 20) & (ratio >= 0.01) & (ratio <= 0.6), 1)
        .otherwise(0)
        .alias("passes_quality"),
    ).orderBy("doc_id")


def _occ_sql(needle: str) -> str:
    pad = "concat(' ', lower(text), ' ')"
    return (
        f"CAST((length({pad}) - length(replace({pad}, '{needle}', ''))) / {len(needle)} AS BIGINT)"
    )


_LANG_SCORE_SQL = {
    lang: " + ".join(_occ_sql(m) for m in markers)
    for lang, markers in T.LANG_MARKERS.items()
}


def _lang_case_sql() -> str:
    """argmax with tie-break to the lexicographically-first language:
    lang L wins iff score_L > every earlier score and >= every later.
    Mirrors the fold in operators/text.py::lang_predict exactly."""
    langs = sorted(_LANG_SCORE_SQL)
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"score_{lang} > score_{e}" for e in langs[:i]]
        conds += [f"score_{lang} >= score_{l}" for l in langs[i + 1 :]]
        branches.append(f"WHEN {' AND '.join(conds) or 'TRUE'} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " END"


@register(
    "text_lang_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
         {", ".join(f'{expr} AS score_{lang}' for lang, expr in sorted(_LANG_SCORE_SQL.items()))}
  FROM documents
)
SELECT doc_id, labeled_lang,
       {_lang_case_sql()} AS pred_lang,
       {", ".join(f"score_{lang}" for lang in sorted(_LANG_SCORE_SQL))}
FROM scored
ORDER BY doc_id
""",
    tags=("text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/marker language heuristic: per-language marker-occurrence
    scores, argmax with lexicographic tie-break.

    r16 sort-first (see text_token_stats): the 15-marker scan runs
    ONCE above the sort instead of twice (range sampling), spread
    across cores instead of in the single-task scan stage; width
    pinned via sorted_spread (AQE would coalesce a bare orderBy)."""
    d = sorted_spread(load(spark, sf_dir, "documents"), "doc_id")
    scores = T.lang_scores("text")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.lang_predict("text").alias("pred_lang"),
        *[scores[lang] for lang in sorted(scores)],
    )


@register(
    "text_fingerprint_dups",
    oracle="""
WITH fp AS (
  SELECT doc_id, substr(md5(lower(trim(text))), 1, 16) AS fingerprint
  FROM documents
)
SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
FROM fp
GROUP BY fingerprint
ORDER BY fingerprint
""",
    tags=("text", "fingerprint", "dedup"),
)
def text_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint + duplicate grouping; the
    canonical keeper is min(doc_id) — stable across engines."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", T.fingerprint("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("fingerprint")
    )


@register(
    "text_shingle_profile",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
)
SELECT doc_id,
       len(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
           i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))) AS n_shingles
FROM t
ORDER BY doc_id
""",
    tags=("text", "shingle"),
)
def text_shingle_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-word shingles per document (the MinHash input set).
    Tokens are materialized in their own projection first — the
    shingle lambda reads the array k+1 times (see
    word_shingles_from_tokens)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", T.tokens("text").alias("__toks"))
        .select(
            "doc_id",
            F.size(T.word_shingles_from_tokens(F.col("__toks"), 3)).cast("bigint").alias("n_shingles"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_tfidf_topterms",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
), df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df_docs FROM tok GROUP BY token
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT t.doc_id, t.token, t.tf, d.df_docs,
         CAST(t.tf AS DOUBLE) * (CAST(n.n_docs + 1 AS DOUBLE) / CAST(d.df_docs + 1 AS DOUBLE)) AS score
  FROM tf t JOIN df d USING (token) CROSS JOIN n
), ranked AS (
  SELECT doc_id, token, tf, df_docs, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rank
  FROM scored
)
SELECT doc_id, token, tf, df_docs, score, rank FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
""",
    tags=("text", "tfidf", "topn"),
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF. The IDF
    damping is rational ((N+1)/(df+1)) rather than logarithmic: ln()
    is not correctly-rounded identically across engines, while this
    form is exact integer arithmetic in doubles — same ranking
    behavior, portable bits. Two shuffles: (doc_id, token) for TF,
    token for DF (TF re-shuffles onto token for the join); the corpus
    size is a 1-row broadcast and the final top-k is a per-doc window."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(T.tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # r16 single-tokenize (guide §2.3/§2.4, the quality_unigram_lm
    # pattern): tf has exactly one row per distinct (doc_id, token),
    # so DF == count(*) over tf per token — integer-exact, and no
    # distinct aggregate, so the DF branch hangs off the SAME tf
    # exchange and AQE stage reuse tokenizes the corpus ONCE
    # (verified Reused* in the executedPlan). n_docs stays on the
    # base table (documents with zero tokens must count) — a
    # count-only parquet scan, metadata-cheap.
    # count(tf > 0) not count(*): the value is identical (tf is a
    # count of existing rows, always >= 1), but the optimizer cannot
    # prove that, so this branch's copy of the tf aggregate keeps its
    # count buffer instead of collapsing to a bare DISTINCT
    # (RemoveRedundantAggregates did exactly that to both count(*)
    # and count(tf) forms, breaking canonical subtree equality and
    # with it the exchange reuse).
    df = tf.groupBy("token").agg(
        F.count(F.when(F.col("tf") > 0, F.lit(1))).alias("df_docs")
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df_docs",
            (
                F.col("tf").cast("double")
                * ((F.col("n_docs") + 1).cast("double") / (F.col("df_docs") + 1).cast("double"))
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", "df_docs", "score", "rank")
        .orderBy("doc_id", "rank")
    )


@register(
    "pipeline_training_data_filter",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, source,
         len({_TOKENS_SQL}) AS n_tokens,
         len(list_filter({_TOKENS_SQL}, x -> x IN ({_STOP_SQL}))) AS n_stop,
         {", ".join(f'{expr} AS score_{lang}' for lang, expr in sorted(_LANG_SCORE_SQL.items()))}
  FROM documents
), gated AS (
  SELECT doc_id, text, source, n_tokens
  FROM t
  WHERE n_tokens >= 20
    AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6
    AND {_lang_case_sql()} = 'en'
), deduped AS (
  SELECT source, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM gated
)
SELECT source,
       COUNT(*) AS docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
FROM deduped WHERE rn = 1
GROUP BY source
ORDER BY source
""",
    tags=("text", "pipeline", "dedup", "langid", "quality"),
    bench=True,
)
def pipeline_training_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite LLM-training-data pipeline in one plan: quality
    gate (length + stopword band) → language-ID gate (marker argmax =
    'en') → exact dedup (min doc_id per content hash) → per-source
    yield stats. Only the dedup (by content hash) and the final
    per-source rollup shuffle — both on already heavily-reduced data.

    r16 restructure (guide §1.2/§4.4, measured in OPTIMIZATION_r16.md):
    the old single-conjunction filter was PUSHED BELOW the widen
    repartition into the scan stage (one task on the single-row-group
    bench file — the whole gate chain ran single-threaded), and its
    expression tree re-derived ``split(trim(text))`` five times and
    ``concat(' ', lower(text), ' ')`` thirty times per row because
    FilterExec has no common-subexpression elimination and the old
    argmax fold was CodegenFallback (interpreted). Now each expensive
    intermediate (token array, padded text) is MATERIALIZED once per
    row in its own projection behind an evaluation barrier
    (functions/barrier.py) so the optimizer can neither substitute it
    into a pushed filter nor push the gates below the exchange; the
    cheap gates still run before the padded projection, so only
    surviving rows pay the 15-marker scan, and the argmax is the
    codegen GREATEST (operators/text.py::lang_predict_padded). At
    100 TB with a splittable layout the same chain runs fully parallel
    either way; the barrier costs one long-compare per row."""
    d = load(spark, sf_dir, "documents", widen=True)
    # tokens materialized ONCE behind the barrier; n_tokens and n_stop
    # read the materialized array (without the barrier the filter
    # pushdown would substitute+re-split per reference)
    stop_arr = F.array(*[F.lit(s) for s in T.STOPWORDS])
    pre = d.select(
        "doc_id", "text", "source",
        materialized(T.tokens("text")).alias("__toks"),
    )
    n_tokens = F.size("__toks").cast("bigint")
    n_stop = F.size(
        F.filter("__toks", lambda t: F.array_contains(stop_arr, t))
    ).cast("bigint")
    ratio = n_stop.cast("double") / n_tokens
    cheap = pre.filter((n_tokens >= 20) & (ratio >= 0.01) & (ratio <= 0.6))
    # padded text materialized once per SURVIVING row; the lang gate
    # reads the materialized string 30 times instead of re-deriving
    # lower+concat per marker reference
    padded = cheap.select(
        "doc_id", "text", "source", n_tokens.alias("n_tokens"),
        materialized(T.lang_pad(F.col("text"))).alias("__padded"),
    )
    gated = padded.filter(
        T.lang_predict_padded(F.col("__padded"), F.col("text")) == "en"
    ).select("doc_id", "text", "source", "n_tokens")
    # dedup as an aggregate, not a window: min_by partial-aggregates
    # map-side, so the exchange carries (hash, winner-struct) — never
    # the full text column a partitioned row_number window would ship
    deduped = gated.groupBy(F.md5("text").alias("__h")).agg(
        F.min_by(F.struct("source", "n_tokens"), "doc_id").alias("__w")
    )
    return (
        deduped.groupBy(F.col("__w.source").alias("source"))
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("__w.n_tokens").alias("tokens_kept"),
        )
        .orderBy("source")
    )


@register(
    "text_html_extract",
    # each document is wrapped in a REAL HTML page (built JVM-side by
    # concat — comment, head/title with entities, style + script with
    # embedded fake tags, heading, two <p> blocks, a nav div with two
    # anchors incl. a '>' inside a quoted href, a noscript subtree);
    # operators/html.py extracts title/visible text/link signals and
    # the oracle reconstructs all of them in closed form. Template
    # constants: 2 links, 'nav one'+'nav two' = 14 anchor chars.
    oracle=r"""
WITH t AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS i,
         trim(regexp_replace(text, '\s+', ' ', 'g')) AS body
  FROM documents
), e AS (
  SELECT doc_id,
         'Doc ' || i || ' & Co' AS title,
         'Doc ' || i || chr(10) || body || chr(10) ||
         'tail <' || i || '>!' || chr(10) || 'nav one | nav two' AS text
  FROM t
)
SELECT doc_id, title, text,
       2::BIGINT AS n_links,
       14::BIGINT AS link_text_chars,
       CAST(length(text) AS BIGINT) AS text_chars,
       CAST(14 AS DOUBLE) / length(text) AS link_density,
       (doc_id % 2 = 1) AS robots_noindex
FROM e
ORDER BY doc_id
""",
    tags=("text", "html", "ingest"),
    bench=True,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→text extraction under the oracle gate — the operator that
    turns raw web pages into pipeline-ready text
    (operators/html.py::html_extract, Arrow mapInPandas, map-only):
    comments/doctype dropped, script/style raw-text skipped (embedded
    '<p>' strings never leak), head invisible except the RCDATA title,
    entity decode, block-element newline rules, whitespace collapse,
    and the anchor-density boilerplate signals. The page template is
    built JVM-side around each document's text; the oracle replays
    every output column in closed form."""
    from dolphinbeat_spark.operators.html import html_extract

    # r16: widen so the Arrow extraction runs at session parallelism
    # instead of inside the (single-task at bench layout) scan stage
    d = load(spark, sf_dir, "documents", widen=True)
    i = F.col("doc_id").cast("string")
    robots = F.when(
        F.col("doc_id") % 2 == 1,
        F.lit('<meta name="robots" content="noindex, nofollow">'),
    ).otherwise(F.lit(""))
    page = F.concat(
        F.lit("<!DOCTYPE html><!-- hidden "), i,
        F.lit(' --><html><head><meta charset="utf-8">'), robots,
        F.lit("<title>Doc "), i,
        F.lit(" &amp; Co</title><style>p{color:red}</style>"
              '<script>var s="<p>leak</p>";</script></head><body><h1>Doc '),
        i,
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><p>tail &lt;"), i,
        F.lit('&gt;&#33;</p><div><a href="/p?a>b">nav one</a> | '
              "<a href='/q'>nav two</a></div>"
              "<noscript>js off</noscript></body></html>"),
    )
    pages = d.select("doc_id", page.alias("html"))
    # explicit exchange + in-partition sort: a global orderBy would
    # range-sample and run the map-only Arrow extraction twice (the
    # r15 decode-wall finding); bounded result, total-order boundary
    return (
        html_extract(pages)
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


@register(
    "pipeline_warc_html_quality",
    # the end-to-end raw-web-corpus path: WARC file (one per doc,
    # bounded subset) -> HTTP envelope split (incl. Content-Encoding
    # gzip/deflate inflate + chunked Transfer-Encoding removal — the
    # page responses ride compressed, cycling coding by doc parity)
    # -> status/content-type gates -> HTML->text extraction ->
    # token/stopword/lang-ID/link-density quality gates. Record layout
    # per doc: [0] text/html 200 (the page), [1] text/plain 200
    # (content-type-gated out), [2] text/html 404 (status-gated out).
    # The oracle rebuilds the extracted text in closed form and
    # replays every gate — identical whatever the wire coding.
    oracle=rf"""
WITH t AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS i,
         trim(regexp_replace(text, '\s+', ' ', 'g')) AS body
  FROM documents WHERE doc_id % 20 = 3
), e AS (
  SELECT doc_id,
         'Doc ' || i || ' & Co' AS title,
         'Doc ' || i || chr(10) || body || chr(10) ||
         'tail <' || i || '>!' || chr(10) || 'nav one | nav two' AS text
  FROM t
), s AS (
  SELECT doc_id, title, text,
         {", ".join(f'{expr} AS score_{lang}' for lang, expr in sorted(_LANG_SCORE_SQL.items()))}
  FROM e
), g AS (
  SELECT doc_id, title,
         len({_TOKENS_SQL}) AS n_tokens,
         len(list_filter({_TOKENS_SQL}, x -> x IN ({_STOP_SQL}))) AS n_stop,
         CAST(14 AS DOUBLE) / length(text) AS link_density,
         {_lang_case_sql()} AS pred_lang
  FROM s
)
SELECT doc_id, title, n_tokens, n_stop, pred_lang, link_density,
       CASE WHEN n_tokens >= 20
             AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6
             AND pred_lang = 'en'
             AND link_density <= 0.5
            THEN 1 ELSE 0 END AS kept
FROM g
ORDER BY doc_id
""",
    tags=("text", "html", "pipeline", "warc", "quality", "langid"),
)
def pipeline_warc_html_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite raw-web path a 100 TB training pipeline runs on
    every crawled page: WARC ingest (sources/warc.py) → HTTP
    status/content-type gates (Catalyst filters) → HTML→text
    extraction (operators/html.py) → quality gates (token count,
    stopword band, lang-ID argmax, link density — all pure Catalyst
    over the extracted text). The WARC payloads are built IN
    EXECUTORS over a bounded doc subset (fixture_media, r14 hygiene);
    at scale the payload column is the raw crawl bytes."""
    from dolphinbeat_spark.operators.html import html_extract
    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    from dolphinbeat_spark.plans.multimodal_queries import fixture_media

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 3)

    def build(did, text):
        i = str(did)
        page = (
            f"<!DOCTYPE html><!-- hidden {i} --><html><head>"
            f'<meta charset="utf-8"><title>Doc {i} &amp; Co</title>'
            "<style>p{color:red}</style>"
            '<script>var s="<p>leak</p>";</script></head>'
            f"<body><h1>Doc {i}</h1><p>{text}</p>"
            f"<p>tail &lt;{i}&gt;&#33;</p>"
            '<div><a href="/p?a>b">nav one</a> | '
            "<a href='/q'>nav two</a></div>"
            "<noscript>js off</noscript></body></html>"
        )
        date = "2024-03-01T00:00:00Z"
        recs = [
            {"type": "response", "record_id": f"<urn:uuid:{i}-h>",
             "target_uri": f"http://ex.com/{i}", "date": date,
             "content": page.encode(),
             # real crawls store the compressed wire bytes: cycle the
             # coding per doc; the decoded relation must be identical
             "http": {"status": 200, "content_type": "text/html",
                      "content_encoding":
                          ("gzip" if did % 2 else "deflate"),
                      "chunked": did % 3 == 0}},
            {"type": "response", "record_id": f"<urn:uuid:{i}-t>",
             "target_uri": f"http://ex.com/{i}/robots.txt", "date": date,
             "content": b"User-agent: *\r\n",
             "http": {"status": 200, "content_type": "text/plain"}},
            {"type": "response", "record_id": f"<urn:uuid:{i}-x>",
             "target_uri": f"http://ex.com/{i}/gone", "date": date,
             "content": b"<html><body>404</body></html>",
             "http": {"status": 404, "content_type": "text/html"}},
        ]
        return encode_warc(recs, gzip_members=bool(did % 2))

    media = fixture_media(d, build, with_text=True)
    pages = (
        read_warc(media)
        .filter((F.col("http_status") == 200)
                & F.col("content_type").startswith("text/html"))
        .select("media_id", "body_text")
    )
    ext = html_extract(pages, id_col="media_id", html_col="body_text")
    toks = ext.select(
        "doc_id", "title", "link_density",
        T.tokens("text").alias("__toks"), F.col("text").alias("__text"),
    )
    n_tokens = F.size("__toks").cast("bigint")
    stop_arr = F.array(*[F.lit(s) for s in T.STOPWORDS])
    n_stop = F.size(
        F.filter("__toks", lambda t: F.array_contains(stop_arr, t))
    ).cast("bigint")
    ratio = n_stop.cast("double") / n_tokens
    kept = F.when(
        (n_tokens >= 20) & (ratio >= 0.01) & (ratio <= 0.6)
        & (T.lang_predict(F.col("__text")) == "en")
        & (F.col("link_density") <= 0.5),
        1,
    ).otherwise(0)
    return toks.select(
        "doc_id", "title",
        n_tokens.alias("n_tokens"), n_stop.alias("n_stop"),
        T.lang_predict(F.col("__text")).alias("pred_lang"),
        "link_density", kept.alias("kept"),
    ).orderBy("doc_id")


@register(
    "text_html_boilerplate",
    # four known lines per page: [0] a nav bar that is ~76% anchor
    # text (dropped), [1] the document body (kept), [2] a 2-char
    # stub (dropped by the length gate), [3] prose with an inline
    # link at ~27% density (kept) — the jusText-style line-level
    # keep/drop every extractor runs after tag stripping. The oracle
    # states every line's text/chars/link-chars/density/kept verdict
    # in closed form.
    oracle=r"""
WITH t AS (
  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS body
  FROM documents WHERE doc_id % 20 = 7
), l AS (
  SELECT doc_id, 0 AS line_idx,
         'Home | About Us | Contact' AS line_text, 19 AS link_chars
  FROM t
  UNION ALL SELECT doc_id, 1, body, 0 FROM t
  UNION ALL SELECT doc_id, 2, 'ok', 0 FROM t
  UNION ALL SELECT doc_id, 3,
         'Read the full story at our archive today', 11 FROM t
)
SELECT doc_id, CAST(line_idx AS BIGINT) AS line_idx, line_text,
       CAST(length(line_text) AS BIGINT) AS line_chars,
       CAST(link_chars AS BIGINT) AS line_link_chars,
       CAST(link_chars AS DOUBLE) / length(line_text)
           AS line_link_density,
       CASE WHEN CAST(link_chars AS DOUBLE) / length(line_text) <= 0.5
             AND length(line_text) >= 15 THEN 1 ELSE 0 END AS kept
FROM l
ORDER BY doc_id, line_idx
""",
    tags=("text", "html", "boilerplate", "quality"),
)
def text_html_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate classification under the oracle gate
    (operators/html.py::html_extract_lines): per visible line, the
    collapsed anchor-text share — nav/footer lines are mostly links,
    prose is not — with the keep/drop gate (link density ≤ 0.5 AND
    ≥ 15 chars) as a pure-Catalyst filter over the line relation.
    Page built JVM-side around each document's text; extraction runs
    distributed (Arrow mapInPandas, map-only)."""
    from dolphinbeat_spark.operators.html import html_extract_lines

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 7)
    page = F.concat(
        F.lit("<html><body><div><a href='/'>Home</a> | "
              "<a href='/about'>About Us</a> | "
              "<a href='/contact'>Contact</a></div><p>"),
        F.col("text"),
        F.lit("</p><p>ok</p><p>Read the full story at "
              "<a href='/x'>our archive</a> today</p></body></html>"),
    )
    pages = d.select("doc_id", page.alias("html"))
    lines = html_extract_lines(pages)
    kept = F.when(
        (F.col("line_link_density") <= 0.5) & (F.col("line_chars") >= 15), 1
    ).otherwise(0)
    return lines.select(
        "doc_id", "line_idx", "line_text", "line_chars",
        "line_link_chars", "line_link_density", kept.alias("kept"),
    ).orderBy("doc_id", "line_idx")


@register(
    "text_unicode_normalize",
    # each doc's text is dirtied with the real-world failure modes:
    # a zero-width space, a decomposed e+COMBINING ACUTE, a BEL
    # control, an NBSP, and a BOM. The oracle REPLAYS the cleaning
    # (DuckDB ships nfc_normalize; the drop class and NBSP mapping
    # are regexp/replace) rather than just stating the answer — two
    # independent NFC implementations must agree.
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         text || chr(8203) || ' cafe' || chr(769) || chr(7)
              || ' x' || chr(160) || 'y' || chr(65279) AS dirty
  FROM documents WHERE doc_id % 10 = 6
), n AS (
  SELECT doc_id, nfc_normalize(dirty) AS nfc FROM t
), c AS (
  SELECT doc_id, nfc,
         regexp_replace(nfc,
           '[\x{200B}-\x{200D}\x{FEFF}\x{00}-\x{08}\x{0B}-\x{1F}\x{7F}-\x{9F}]',
           '', 'g') AS dropped
  FROM n
)
SELECT doc_id,
       replace(dropped, chr(160), ' ') AS clean_text,
       CAST(length(dropped) AS BIGINT) AS n_chars,
       CAST(length(nfc) - length(dropped) AS BIGINT) AS n_removed
FROM c
ORDER BY doc_id
""",
    tags=("text", "unicode", "normalize", "quality"),
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization + invisible/control cleaning under
    the oracle gate (operators/textnorm.py): rendered-identical byte
    sequences must hash identically or dedup silently fails.
    Python's unicodedata NFC is replayed by DuckDB's independent
    nfc_normalize — cross-implementation agreement is the check.
    Arrow mapInPandas, map-only."""
    from dolphinbeat_spark.operators.textnorm import normalize_text

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 6)
    # ZWSP + ' cafe' + COMBINING ACUTE + BEL + ' x' + NBSP + 'y' + BOM
    dirty = F.concat(
        F.col("text"),
        F.lit("\u200b cafe\u0301\x07 x\u00a0y\ufeff"),
    )
    return normalize_text(
        d.select("doc_id", dirty.alias("text"))
    ).orderBy("doc_id")


@register(
    "text_url_canonicalize",
    # three URL shapes per doc exercise every canonicalization rule:
    # [0] uppercase scheme/host + default :80 + tracking params mixed
    #     with real ones + fragment, on a second-level public suffix
    #     (.co.uk -> 3-label registrable domain)
    # [1] default :443 + empty path + all-tracking query (drops to
    #     '' -> bare '/')
    # [2] userinfo + NON-default port (kept) + params that must keep
    #     their order.
    # [3] bracketed IPv6 literal host with a port — the colons inside
    #     the brackets must not split the host (RFC 3986 §3.2.2).
    # The oracle states the expected outputs in closed form from the
    # same template pieces.
    oracle="""
WITH p AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS i,
         CAST(doc_id % 5 AS VARCHAR) AS m
  FROM documents WHERE doc_id % 10 = 4
), v(k) AS (VALUES (0), (1), (2), (3))
SELECT doc_id, CAST(k AS BIGINT) AS variant,
       CASE k
         WHEN 0 THEN 'http://www.site' || m || '.co.uk/A/' || i
                     || '?q=' || i || '&keep=1'
         WHEN 1 THEN 'https://blog.example' || m || '.com/'
         WHEN 2 THEN 'https://cdn.host' || m || '.io:8443/x%20y?b=2&a=1'
         ELSE 'http://[2001:db8::' || m || ']:8080/p?x=' || i
       END AS canonical,
       CASE k
         WHEN 0 THEN 'www.site' || m || '.co.uk'
         WHEN 1 THEN 'blog.example' || m || '.com'
         WHEN 2 THEN 'cdn.host' || m || '.io'
         ELSE '[2001:db8::' || m || ']'
       END AS host,
       CASE k
         WHEN 0 THEN 'site' || m || '.co.uk'
         WHEN 1 THEN 'example' || m || '.com'
         WHEN 2 THEN 'host' || m || '.io'
         ELSE '[2001:db8::' || m || ']'
       END AS domain
FROM p CROSS JOIN v
ORDER BY doc_id, variant
""",
    tags=("text", "url", "ingest"),
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization under the oracle gate (operators/urls.py,
    pure Catalyst — zero Python in the row path): lowercased scheme/
    host, userinfo + fragment dropped, default ports stripped,
    tracking parameters scrubbed with order preserved, empty path →
    '/', plus the registrable-domain (eTLD+1) key with second-level
    public suffixes — the identity/quota keys a crawl pipeline groups
    and dedups on. Map-only at any scale."""
    from dolphinbeat_spark.operators import urls as U

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 4)
    i = F.col("doc_id").cast("string")
    m = (F.col("doc_id") % 5).cast("string")
    shapes = F.array(
        F.concat(F.lit("HTTP://WWW.Site"), m, F.lit(".CO.UK:80/A/"), i,
                 F.lit("?utm_source=news&q="), i,
                 F.lit("&fbclid=x&keep=1#top")),
        F.concat(F.lit("https://Blog.Example"), m,
                 F.lit(".com:443?gclid=1")),
        F.concat(F.lit("https://user:pw@cdn.Host"), m,
                 F.lit(".io:8443/x%20y?b=2&a=1")),
        F.concat(F.lit("HTTP://[2001:DB8::"), m,
                 F.lit("]:8080/p?x="), i, F.lit("#frag")),
    )
    exploded = d.select(
        "doc_id", F.posexplode(shapes).alias("variant", "url")
    )
    return exploded.select(
        "doc_id",
        F.col("variant").cast("bigint").alias("variant"),
        U.canonical_url("url").alias("canonical"),
        U.url_host("url").alias("host"),
        U.registrable_domain("url").alias("domain"),
    ).orderBy("doc_id", "variant")


@register(
    "text_chunking",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents WHERE doc_id % 10 = 0
), chunked AS (
  SELECT doc_id,
         CAST(i AS BIGINT) AS chunk_idx,
         list_slice(toks, i * 50 + 1, i * 50 + 50) AS chunk
  FROM t, unnest(range(0, CAST(ceil(len(toks) / 50.0) AS BIGINT))) AS u(i)
)
SELECT doc_id, chunk_idx,
       len(chunk) AS chunk_tokens,
       array_to_string(chunk, ' ') AS chunk_text
FROM chunked
ORDER BY doc_id, chunk_idx
""",
    tags=("text", "chunking"),
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking (50-token windows) — the
    context-window prep step of a training pipeline. Pure Catalyst:
    tokens materialized once, chunk indices from sequence(), slices
    JVM-side; one explode, no Python. At 100 TB chunking is map-only —
    rows never shuffle until a downstream op asks."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    toked = d.select("doc_id", T.tokens("text").alias("toks"))
    n_chunks = F.ceil(F.size("toks") / F.lit(50.0))
    chunked = toked.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("chunk_idx"),
        "toks",
    ).select(
        "doc_id",
        "chunk_idx",
        F.slice(
            "toks", (F.col("chunk_idx") * 50 + 1).cast("int"), 50
        ).alias("chunk"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").cast("bigint").alias("chunk_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


_DOC_HASH_SQL = hash64_sql("concat('sample-', CAST(doc_id AS VARCHAR))")


@register(
    "sample_hash_deterministic",
    oracle=f"""
WITH sampled AS (
  SELECT source, n_chars FROM documents
  WHERE {_DOC_HASH_SQL} % 10 = 0
)
SELECT source, COUNT(*) AS docs_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
FROM sampled
GROUP BY source
ORDER BY source
""",
    tags=("sampling", "pipeline"),
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by portable content-key hash — the
    reproducible sampling a training pipeline needs (rand()-based
    sampling is neither replayable across runs nor portable across
    engines; hash-mod is both, and stratifies per key range). Map-only
    until the per-source rollup."""
    from dolphinbeat_spark.functions.hashes import hash64

    d = load(spark, sf_dir, "documents")
    keyed = d.filter(
        hash64(F.concat(F.lit("sample-"), F.col("doc_id").cast("string"))) % 10 == 0
    )
    return (
        keyed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
        .orderBy("source")
    )


@register(
    "sample_weighted_priority",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         -- Efraimidis-Spirakis priority: u^(1/w) with u from the
         -- portable hash (deterministic; rand() is not replayable)
         POW(CAST({hash64_sql("concat('wsample-', CAST(doc_id AS VARCHAR))")} AS DOUBLE)
             / {float(1 << 48)}, 1.0 / n_chars) AS priority
  FROM documents
), ranked AS (
  SELECT doc_id, source, n_chars, priority,
         ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rk
  FROM keyed
)
SELECT doc_id, source, n_chars, ROUND(priority, 10) AS priority
FROM ranked WHERE rk <= 25
ORDER BY doc_id
""",
    tags=("sampling", "weighted", "pipeline"),
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis):
    top-25 docs by priority u^(1/weight), weight = document length —
    longer docs proportionally likelier, yet fully deterministic and
    replayable because u comes from the portable content hash, not
    rand(). One map pass + a global top-k (TakeOrdered, O(k) memory).
    (pow is libm-correct on both engines for these magnitudes; ties
    broken by doc_id.)"""
    from dolphinbeat_spark.functions.hashes import hash64

    d = load(spark, sf_dir, "documents")
    u = hash64(F.concat(F.lit("wsample-"), F.col("doc_id").cast("string"))).cast(
        "double"
    ) / F.lit(float(1 << 48))
    keyed = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.pow(u, 1.0 / F.col("n_chars")).alias("priority"),
    )
    # top-k via orderBy+limit → TakeOrderedAndProject: per-partition
    # top-25 then a driver-side merge of 25-row heaps — never the
    # single-partition shuffle an unpartitioned row_number window costs
    # (same rows under the same (priority DESC, doc_id) tie-break)
    return (
        keyed.orderBy(F.col("priority").desc(), "doc_id")
        .limit(25)
        .select("doc_id", "source", "n_chars", F.round("priority", 10).alias("priority"))
        .orderBy("doc_id")
    )


@register(
    "text_token_count_bpe",
    oracle=r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe_pieces,
       len(regexp_extract_all(text, '[0-9]+')) AS digit_runs,
       len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct_marks
FROM documents
WHERE doc_id % 5 = 0
ORDER BY doc_id
""",
    tags=("text", "tokens", "bpe"),
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style piece counting beside whitespace tokens: letter runs,
    digit runs, and punctuation as separate pieces (the pre-tokenizer
    split every BPE vocabulary builds on). Pure regexp_extract_all —
    JVM-side, and the class-based pattern means identical semantics in
    both engines' regex dialects."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return d.select(
        "doc_id",
        F.size(T.tokens("text")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), F.lit(0)))
        .cast("bigint")
        .alias("bpe_pieces"),
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]+"), F.lit(0))).cast("bigint").alias("digit_runs"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^a-zA-Z0-9 ]"), F.lit(0)))
        .cast("bigint")
        .alias("punct_marks"),
    ).orderBy("doc_id")


_KGRAM = 8   # winnowing k-gram length
_WINDOW = 4  # winnowing window


@register(
    "text_winnowing_fingerprint",
    oracle=f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - {_KGRAM} + 1, 0) + 1),
                        i -> {hash64_sql(f"substr(text, CAST(i AS INTEGER), {_KGRAM})")}) AS hs
  FROM documents WHERE doc_id % 10 = 3
), winnowed AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(hs) - {_WINDOW} + 1, 0) + 1),
                       w -> list_min(hs[w:w + {_WINDOW} - 1]))) AS fps
  FROM grams
)
SELECT doc_id,
       len(fps) AS n_fingerprints,
       list_min(fps) AS min_fp
FROM winnowed
ORDER BY doc_id
""",
    tags=("text", "fingerprint", "winnowing"),
)
def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    {k}-char k-gram, keep the MINIMUM hash of each sliding window —
    guaranteeing any sufficiently long match between documents shares a
    fingerprint. Selection is position-robust where head-anchored
    hashing is not. (The hash here is the portable md5-derived hash64
    per k-gram; a production kernel computes it as an O(1) rolling
    update inside a pandas UDF — selection semantics, and therefore
    this oracle, are identical.)"""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 3)
    # built via expr: F.substring needs a literal int start, so the
    # positional substring inside the lambda uses the SQL form
    grams = d.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, greatest(length(text) - {_KGRAM} + 1, 0)), "
            f"i -> cast(conv(substring(md5(substring(text, i, {_KGRAM})), 1, 12), 16, 10) as bigint))"
        ).alias("hs"),
    )
    windows = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(hs) - {_WINDOW} + 1, 0)), "
        f"w -> array_min(slice(hs, w, {_WINDOW}))))"
    )
    return (
        grams.select("doc_id", windows.alias("fps"))
        .select(
            "doc_id",
            F.size("fps").cast("bigint").alias("n_fingerprints"),
            F.array_min("fps").alias("min_fp"),
        )
        .orderBy("doc_id")
    )


@register(
    "sample_domain_quota",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {hash64_sql("CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, source, rk
FROM ranked WHERE rk <= 25
ORDER BY source, rk
""",
    tags=("sample", "quota", "llm-pipeline"),
)
def sample_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling: keep at most 25 docs per source,
    chosen by a deterministic hash order (stable across runs/engines) —
    the anti-domination step of pretraining mixes (no single crawl
    domain may swamp the corpus).

    Implemented with the SKEW-SAFE two-phase top-k
    (operators/skew.py::grouped_topk_two_phase): phase 1 ranks inside
    (domain, hash sub-bucket) partitions bounded by group_size/32,
    phase 2 re-ranks the <= 25*32 survivors — a mega-domain at 100 TB
    never sorts as one giant partition. The oracle is the SIMPLE
    single-window form: the two-phase rewrite is provably
    output-identical, and the driver verifies exactly that."""
    from dolphinbeat_spark.functions.hashes import hash64
    from dolphinbeat_spark.operators.skew import grouped_topk_two_phase

    d = load(spark, sf_dir, "documents")
    return (
        grouped_topk_two_phase(
            d.select("doc_id", "source"),
            group_cols=["source"],
            order_cols=[hash64(F.col("doc_id").cast("string")), F.col("doc_id")],
            k=25,
        )
        .select("doc_id", "source", "rk")
        .orderBy("source", "rk")
    )


# synthetic PII appended deterministically (the corpus itself is clean
# lowercase words): both engines build the identical input string
_PII_TEXT_SQL = (
    "concat(text, ' contact ', source, CAST(doc_id AS VARCHAR), "
    "'@example.com or +1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
)
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@register(
    "text_redact_pii",
    oracle=f"""
WITH pii AS (
  SELECT doc_id, {_PII_TEXT_SQL} AS full_text FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(full_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(full_text, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(full_text, '{_PHONE_RE}')) AS n_phones
FROM pii
WHERE doc_id % 5 = 0
ORDER BY doc_id
""",
    tags=("text", "redaction", "llm-pipeline"),
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: regex scrub of emails/phones with per-doc match
    counts — the pre-training privacy pass. Pure map-side
    regexp_replace/extract_all (Catalyst, no UDF), linear to 100 TB.
    The corpus is synthetic clean text, so the PII is injected
    deterministically from (source, doc_id) on BOTH engines first —
    the redaction machinery, not the generator, is what's verified."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    full = F.concat(
        F.col("text"), F.lit(" contact "), F.col("source"),
        F.col("doc_id").cast("string"), F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    base = d.select("doc_id", full.alias("full_text"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("full_text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE, "<PHONE>",
    )
    return base.select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all("full_text", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all("full_text", F.lit(_PHONE_RE), F.lit(0)))
        .cast("bigint").alias("n_phones"),
    ).orderBy("doc_id")


_MIX_MOD = 1_000_000


@register(
    "sample_temperature_mix",
    # sqrt() IS correctly rounded per IEEE-754 (unlike ln), so the
    # alpha=0.5 temperature weights are bit-identical across engines;
    # thresholds floor to integers, the per-doc keep decision is pure
    # integer hash arithmetic
    oracle=f"""
WITH per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
), tot AS (
  -- z folds the per-source sqrt terms in sorted-source order (not a
  -- bare SUM): double addition is order-dependent, and the threshold
  -- floor() downstream has no rounding slack to absorb a stray ulp
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
         list_reduce(list_prepend(0.0, list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source)),
                     (a, x) -> a + x) AS z
  FROM per_src
), rates AS (
  SELECT s.source, s.n_docs,
         sqrt(CAST(s.n_docs AS DOUBLE)) / t.z AS target_share,
         CAST(LEAST(
           floor((0.5 * t.n_total * (sqrt(CAST(s.n_docs AS DOUBLE)) / t.z)
                  / s.n_docs) * {_MIX_MOD}),
           {_MIX_MOD}) AS BIGINT) AS threshold
  FROM per_src s CROSS JOIN tot t
), kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN rates r USING (source)
  WHERE {hash64_sql("concat('mix-', CAST(doc_id AS VARCHAR))")} % {_MIX_MOD} < r.threshold
  GROUP BY d.source
)
SELECT r.source, r.n_docs, ROUND(r.target_share, 6) AS target_share,
       r.threshold, CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM rates r LEFT JOIN kept k ON r.source = k.source
ORDER BY r.source
""",
    tags=("sampling", "mixture", "temperature", "llm-pipeline"),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the mT5/Pile recipe): sampling
    share per source ∝ n^alpha with alpha=0.5, flattening the source
    distribution so big crawls stop drowning small high-quality
    sources. A global budget of half the corpus is allocated to
    sources by target share, converted to a per-source acceptance
    threshold, and every document decides membership by pure
    deterministic hash — reproducible across runs, engines, and
    cluster sizes (no RNG state). Returns the per-source audit:
    corpus count, target share, threshold, kept count.

    Scale shape: the rate table is a per-source aggregate (tiny,
    broadcast back); the keep decision is map-side integer hashing;
    the audit is one more partial-agg. No shuffle touches document
    text. alpha=0.5 specifically because sqrt is IEEE
    correctly-rounded — cross-engine bit-identical where a pow()/ln()
    temperature would not be."""
    d = load(spark, sf_dir, "documents", widen=True)
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    # ordered fold, not F.sum: the normalizer feeds an integer floor()
    # with no rounding slack, so the double summation order must match
    # the oracle exactly (sorted by source on both engines)
    tot = per_src.agg(
        F.sum("n_docs").cast("bigint").alias("n_total"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("source", F.sqrt(F.col("n_docs").cast("double")).alias("s"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("z"),
    )
    rates = per_src.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        (F.sqrt(F.col("n_docs").cast("double")) / F.col("z")).alias("target_share"),
        F.least(
            F.floor(
                (
                    F.lit(0.5)
                    * F.col("n_total")
                    * (F.sqrt(F.col("n_docs").cast("double")) / F.col("z"))
                    / F.col("n_docs")
                )
                * _MIX_MOD
            ),
            F.lit(_MIX_MOD),
        ).cast("bigint").alias("threshold"),
    )
    from dolphinbeat_spark.functions.hashes import hash64

    doc_hash = hash64(F.concat(F.lit("mix-"), F.col("doc_id").cast("string")))
    kept = (
        d.join(F.broadcast(rates.select("source", "threshold")), "source")
        .filter(doc_hash % _MIX_MOD < F.col("threshold"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.round("target_share", 6).alias("target_share"),
            "threshold",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
        .orderBy("source")
    )


@register(
    "text_collapse_repeats",
    # pure integer/string list ops — exact cross-engine
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents WHERE doc_id % 7 = 0
), kept AS (
  SELECT doc_id, len(toks) AS n_tokens,
         [toks[CAST(i AS INTEGER)] FOR i IN range(1, len(toks) + 1)
          IF i = 1 OR toks[CAST(i AS INTEGER)] <> toks[CAST(i - 1 AS INTEGER)]] AS dedup
  FROM t
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens - len(dedup) AS BIGINT) AS n_removed,
       array_to_string(dedup, ' ') AS cleaned
FROM kept
ORDER BY doc_id
""",
    tags=("text", "cleaning", "repetition", "llm-pipeline"),
)
def text_collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-token-run collapse — the cheap intra-document
    cleaning TRANSFORM (not just a signal): stuttered generations and
    scraped-page artifacts like 'buy buy buy buy now' become
    'buy now', with the removal count kept for filtering decisions.
    Map-only: the keep-mask compares each token to its predecessor
    inside one Catalyst higher-order expression; no shuffle, no UDF,
    linear in corpus size."""
    d = load(spark, sf_dir, "documents", widen=True).filter(F.col("doc_id") % 7 == 0)
    toked = d.select("doc_id", T.tokens("text").alias("toks"))
    n = F.size("toks")
    dedup = F.filter(
        "toks",
        lambda t, i: (i == 0) | (t != F.element_at("toks", i)),  # i is 0-based; element_at 1-based = predecessor
    )
    return toked.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        (n - F.size(dedup)).cast("bigint").alias("n_removed"),
        F.array_join(dedup, " ").alias("cleaned"),
    ).orderBy("doc_id")
