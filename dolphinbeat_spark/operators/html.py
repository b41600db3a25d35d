"""HTML→text extraction from scratch — the bridge between raw web
corpora (WARC bodies, sources/warc.py) and the text pipeline
(lang-ID / Gopher / C4 quality gates, dedup).

Raw web HTML is the #1 training-data source (Common Crawl ships it by
the 100 TB), and none of the downstream text operators can use it
until tags, scripts, styles and entities are gone. This module is a
single-pass tokenizer over the essentials of the WHATWG HTML parsing
rules — not a browser DOM, but the deterministic subset every corpus
extractor (jusText / trafilatura-class tools) agrees on:

- comments (``<!-- -->``), doctype/bogus ``<! >`` and ``<? >``
  directives dropped;
- ``<script>`` / ``<style>`` are raw-text elements: their content is
  skipped to the matching close tag (case-insensitive, no nesting —
  the WHATWG raw-text rule), so embedded ``"<p>"`` strings never leak;
- ``<head>`` content is invisible except ``<title>`` (RCDATA),
  captured separately; ``<body>`` implies head close;
- ``noscript`` / ``template`` / ``svg`` / ``iframe`` / ``object``
  subtrees are invisible (depth-tracked);
- block-level elements (p, div, li, tr, headings, pre, …) and
  ``<br>``/``<hr>`` produce line breaks; inline elements do not;
- character references decoded per the HTML5 named + numeric tables
  (stdlib ``html.unescape`` — the published WHATWG entity list);
- whitespace (incl. NBSP) collapses to single spaces within a line;
  empty lines drop — the normal form the dedup/quality stages hash;
- link signals for boilerplate detection: ``n_links`` (anchor count),
  ``link_text_chars`` (collapsed anchor-text length), and
  ``link_density`` — the classic nav/footer discriminator.

Attribute values are scanned quote-aware, so ``>`` inside an href
never ends a tag early. Unterminated constructs degrade the way
browsers degrade (comment to EOF, raw text to EOF) instead of
raising: wild HTML is hostile by default and a 100 TB ingest job
must not die on tag soup.

Spark surface: ``html_extract`` — Arrow ``mapInPandas`` over
(id, html) rows → typed columns. HTML parsing is genuinely
non-Catalyst work, so this is the documented Python slow path; it is
map-only (no shuffle), and the output relation is what the pure-
Catalyst gates consume.

Reference parity: the reference repo (CDC row mover) has no text
layer at all; this extends the LLM-pipeline layer per SURVEY §7.
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: elements whose open/close breaks the current line (HTML block-level
#: display set + table/list structure + headings)
BLOCK_TAGS = frozenset(
    """address article aside blockquote body caption center dd details
    dialog dir div dl dt fieldset figcaption figure footer form h1 h2
    h3 h4 h5 h6 header hgroup html li main menu nav ol p pre section
    summary table tbody td tfoot th thead tr ul""".split()
)

#: void elements that act as explicit line breaks
BREAK_TAGS = frozenset(("br", "hr"))

#: raw-text elements (WHATWG §13.2.5.2): content is literal until the
#: case-insensitive close tag, never parsed as markup
RAW_TEXT_TAGS = frozenset(("script", "style"))

#: subtrees that render nothing (depth-tracked containers)
INVISIBLE_TAGS = frozenset(("noscript", "template", "svg", "iframe", "object"))

_WS_RE = re.compile("[\\s\u00a0]+")  # \s is Unicode-aware, NBSP explicit for readers
_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9-]*")
#: matched against the LOWERED raw meta-tag slice
_META_ROBOTS_RE = re.compile(r"""name\s*=\s*["']?\s*robots\b""")


def _collapse(s: str) -> str:
    """Whitespace (incl. NBSP) runs -> single space, stripped."""
    return _WS_RE.sub(" ", s).strip()


@dataclass
class HtmlDoc:
    """Result of :func:`html_to_text`. ``lines`` carries the per-line
    decomposition [(line_text, line_link_chars), …] — line_link_chars
    is the collapsed length of the line's anchor-text segments, the
    jusText-style per-line boilerplate signal (a nav/footer line is
    mostly links; body prose is not). ``robots_noindex`` is True when
    a ``<meta name=robots>`` in the head declares ``noindex`` — pages
    a compliant corpus pipeline must drop."""

    title: str | None
    text: str
    n_links: int
    link_text_chars: int
    lines: list[tuple[str, int]] = None  # type: ignore[assignment]
    robots_noindex: bool = False

    @property
    def text_chars(self) -> int:
        return len(self.text)

    @property
    def link_density(self) -> float:
        return self.link_text_chars / max(self.text_chars, 1)


def _find_ci(haystack_lower: str, needle: str, start: int) -> int:
    """Case-insensitive find over a PRE-LOWERED haystack — lowering is
    done once per document in html_to_text, not per raw-text element
    (a page with k script tags would otherwise lowercase the whole
    document k times: quadratic on real pages)."""
    return haystack_lower.find(needle, start)


def _scan_tag(html: str, pos: int) -> tuple[str | None, bool, bool, int]:
    """``pos`` points at ``<``. Returns (name, closing, self_closing,
    end_pos_after_gt). name is None for non-tag ``<`` (emit literal).
    Attribute values are quote-aware."""
    n = len(html)
    if pos + 1 >= n:
        return None, False, False, pos + 1
    c = html[pos + 1]
    closing = c == "/"
    name_start = pos + 2 if closing else pos + 1
    m = _NAME_RE.match(html, name_start)
    if not m:
        return None, False, False, pos + 1
    name = m.group(0).lower()
    i = m.end()
    self_closing = False
    while i < n:
        ch = html[i]
        if ch == ">":
            return name, closing, self_closing, i + 1
        if ch in ("'", '"'):
            j = html.find(ch, i + 1)
            if j < 0:
                return name, closing, self_closing, n  # unterminated
            i = j + 1
            continue
        self_closing = ch == "/" and i + 1 < n and html[i + 1] == ">"
        i += 1
    return name, closing, self_closing, n  # unterminated tag: to EOF


def html_to_text(html: str) -> HtmlDoc:
    """Extract title + visible text + link signals from an HTML
    string. See the module docstring for the exact rules."""
    n = len(html)
    html_lower = html.lower()  # once: raw-text close-tag scans are CI
    pos = 0
    #: current line is lines[-1]; each part is (text, was_inside_link)
    lines: list[list[tuple[str, bool]]] = [[]]
    title_parts: list[str] = []
    in_head = False
    invis_depth = 0
    a_depth = 0
    n_links = 0
    link_text_chars = 0
    robots_noindex = False
    link_buf: list[str] = []

    def emit(raw: str) -> None:
        if in_head or invis_depth > 0 or not raw:
            return
        decoded = _htmllib.unescape(raw)
        lines[-1].append((decoded, a_depth > 0))
        if a_depth > 0:
            link_buf.append(decoded)

    def brk() -> None:
        if lines[-1]:
            lines.append([])

    def close_link() -> None:
        nonlocal link_text_chars
        if link_buf:
            link_text_chars += len(_collapse("".join(link_buf)))
            link_buf.clear()

    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            emit(html[pos:])
            break
        emit(html[pos:lt])
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            pos = n if end < 0 else end + 3  # comment to EOF degrades
            continue
        if html.startswith("<!", lt) or html.startswith("<?", lt):
            end = html.find(">", lt + 2)
            pos = n if end < 0 else end + 1
            continue
        name, closing, self_closing, after = _scan_tag(html, lt)
        if name is None:
            emit("<")  # literal '<' (tag soup)
            pos = lt + 1
            continue
        pos = after
        if not closing and name in RAW_TEXT_TAGS and not self_closing:
            close = _find_ci(html_lower, f"</{name}", pos)
            if close < 0:
                break  # raw text to EOF
            gt = html.find(">", close)
            pos = n if gt < 0 else gt + 1
            continue
        if (not closing and name == "title" and not self_closing
                and invis_depth == 0):
            # invis_depth guard: an SVG accessibility <title> inside an
            # invisible subtree is NOT the page title (its content is
            # also suppressed by emit() below)
            close = _find_ci(html_lower, "</title", pos)
            raw = html[pos:] if close < 0 else html[pos:close]
            title_parts.append(raw)
            if close < 0:
                break
            gt = html.find(">", close)
            pos = n if gt < 0 else gt + 1
            continue
        if name == "meta" and not closing and not robots_noindex:
            # robots directive sniff on the raw tag slice (HTML §4.2.5)
            tag = html_lower[lt:after]
            if _META_ROBOTS_RE.search(tag) and "noindex" in tag:
                robots_noindex = True
            continue
        if name in INVISIBLE_TAGS:
            if self_closing:
                continue
            invis_depth += 1 if not closing else -1
            invis_depth = max(invis_depth, 0)
            continue
        if name == "head":
            in_head = not closing
            continue
        if name == "body":
            in_head = False  # <body> implies head close
        if name == "a":
            if closing:
                close_link()
                a_depth = max(a_depth - 1, 0)
            elif not self_closing:
                close_link()  # unclosed previous anchor (tag soup)
                a_depth += 1
                n_links += 1
            continue
        if name in BREAK_TAGS or name in BLOCK_TAGS:
            brk()

    close_link()
    out_lines: list[tuple[str, int]] = []
    for parts in lines:
        collapsed = _collapse("".join(t for t, _ in parts))
        if not collapsed:
            continue
        in_link = _collapse("".join(t for t, il in parts if il))
        out_lines.append((collapsed, len(in_link)))
    title = _collapse(_htmllib.unescape("".join(title_parts))) or None
    return HtmlDoc(
        title=title,
        text="\n".join(t for t, _ in out_lines),
        n_links=n_links,
        link_text_chars=link_text_chars,
        lines=out_lines,
        robots_noindex=robots_noindex,
    )


HTML_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("title", StringType()),
        StructField("text", StringType()),
        StructField("n_links", LongType()),
        StructField("link_text_chars", LongType()),
        StructField("text_chars", LongType()),
        StructField("link_density", DoubleType()),
        StructField("robots_noindex", BooleanType()),
    ]
)

HTML_LINES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("line_idx", LongType()),
        StructField("line_text", StringType()),
        StructField("line_chars", LongType()),
        StructField("line_link_chars", LongType()),
        StructField("line_link_density", DoubleType()),
    ]
)


def html_extract(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, html) -> (doc_id, title, text, n_links, link_text_chars,
    text_chars, link_density) via Arrow ``mapInPandas``. Map-only: the
    extraction never shuffles; at 100 TB this stage runs where the
    WARC bytes landed."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, h in zip(pdf[id_col], pdf[html_col]):
                d = html_to_text(h if isinstance(h, str) else str(h))
                rows.append((
                    did, d.title, d.text, d.n_links, d.link_text_chars,
                    d.text_chars, d.link_density, d.robots_noindex,
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in HTML_SCHEMA.fields]
            )

    return df.mapInPandas(batches, HTML_SCHEMA)


def html_extract_lines(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, html) -> one row per visible LINE with the jusText-style
    per-line link-density signal — the unit boilerplate removal
    operates on (a nav/footer line is mostly anchor text; prose is
    not). Map-only Arrow ``mapInPandas``; the downstream keep/drop
    gate is a pure-Catalyst filter over these columns."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, h in zip(pdf[id_col], pdf[html_col]):
                d = html_to_text(h if isinstance(h, str) else str(h))
                for i, (text, link_chars) in enumerate(d.lines):
                    rows.append((
                        did, i, text, len(text), link_chars,
                        link_chars / max(len(text), 1),
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in HTML_LINES_SCHEMA.fields]
            )

    return df.mapInPandas(batches, HTML_LINES_SCHEMA)
