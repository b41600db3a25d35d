"""Text-analysis building blocks for the training-data pipeline layer.

All expressions are JVM-side Catalyst built-ins (split / higher-order
array functions / md5) — no Python in the hot path — and each has an
exactly-equivalent ANSI-SQL formulation used by the DuckDB oracle
(see plans/text_queries.py). Conventions for engine parity:

- tokenization: ``split(trim(text), '\\s+')`` (same in both engines)
- occurrence counts via the length-difference trick
  ``(len(s) - len(replace(s, m, ''))) / len(m)`` — integer-exact
- word shingles built with 1-based ``element_at`` to mirror SQL's
  1-based array indexing
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small English-ish stopword set present in the synthetic corpus
STOPWORDS = ("the", "a", "and", "of", "to", "in")

# deterministic marker vocabularies for the n-gram language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of "),
    "es": (" el ", " la ", " de "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " et ", " les "),
    "zh": (" zh ", " shi ", " de "),
}


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def occurrences(text: Column | str, needle: str) -> Column:
    """Non-overlapping occurrence count of a literal substring."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("bigint")


def stopword_count(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("bigint")


def word_grams_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word grams from a token-array column in POSITION order (one
    per window, duplicates kept — posexplode gives 0-based window
    positions), 1-based indexing to mirror SQL arrays.

    Pass a MATERIALIZED tokens column (a real projected column, not
    ``tokens(text)`` inline): the lambda references the array k+1
    times, and an inline split() would be re-evaluated on every
    reference — a quadratic blowup on long documents.
    """
    n = F.size(toks)
    # guard n < k explicitly: sequence(1, 0) is DESCENDING in Spark
    # ([1, 0] — not empty), and element_at(toks, 0) then throws under
    # ANSI. A doc shorter than k tokens has NO k-windows.
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)])  # noqa: E731
    return F.transform(idx, gram)


def word_shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles: the positional grams with
    multiplicity and order dropped (see word_grams_from_tokens for the
    materialized-column requirement)."""
    return F.array_distinct(word_grams_from_tokens(toks, k))


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Inline form (convenient, but see word_shingles_from_tokens for
    the hot path)."""
    return word_shingles_from_tokens(tokens(text), k)


def fingerprint(text: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint (hex string)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.substring(F.md5(F.lower(F.trim(c))), 1, 16)


def lang_pad(text: Column | str) -> Column:
    """The space-padded lowercased text every marker count scans.
    Exposed so hot paths can MATERIALIZE it once in a projection
    (see plans/text_queries.py) instead of re-deriving it per marker
    reference — lower+concat are full-string passes."""
    c = F.col(text) if isinstance(text, str) else text
    return F.concat(F.lit(" "), F.lower(c), F.lit(" "))


def lang_scores_padded(padded: Column) -> dict[str, Column]:
    """Marker-occurrence score per language over an ALREADY-padded
    column (``lang_pad``)."""
    return {
        lang: sum((occurrences(padded, m) for m in markers), F.lit(0).cast("bigint")).alias(
            f"score_{lang}"
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-occurrence score per language (space-padded text)."""
    return lang_scores_padded(lang_pad(text))


def _argmax_lang(scores: dict[str, Column], text: Column | str) -> Column:
    """argmax language with lexicographic tie-break (deterministic).

    r16 (guide §1.2): GREATEST over (score, -rank, lang) structs —
    each per-language score expression appears exactly once and the
    whole comparison whole-stage-codegens. The previous array-fold
    formulation also referenced each score once but ``aggregate`` is
    CodegenFallback, so every row evaluated the full 15-marker subtree
    interpreted. greatest picks max score, then max(-rank) = the
    EARLIEST sorted language — exactly the fold's strict-> semantics
    (the fold replaced acc only on p.s > acc.s, keeping the earliest
    sorted language on ties). Scores are non-null for non-null text;
    the null-text guard reproduces the fold's seed result ("")."""
    c = F.col(text) if isinstance(text, str) else text
    langs = sorted(scores)
    best = F.greatest(
        *[
            F.struct(
                scores[lang].alias("s"),
                F.lit(-i).alias("ni"),
                F.lit(lang).alias("l"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    return F.when(c.isNotNull(), best["l"]).otherwise(F.lit(""))


def lang_predict(text: Column | str) -> Column:
    """argmax language with lexicographic tie-break (deterministic)."""
    return _argmax_lang(lang_scores(text), text)


def lang_predict_padded(padded: Column, text: Column | str) -> Column:
    """``lang_predict`` over a materialized padded column (``text`` is
    only referenced for the null guard)."""
    return _argmax_lang(lang_scores_padded(padded), text)
