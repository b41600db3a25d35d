"""HTML→text extraction (operators/html.py) + charset-aware decode
(sources/charset.py) — the raw-web-corpus bridge into the text
pipeline."""

from __future__ import annotations

import pytest

from dolphinbeat_spark.operators.html import html_extract, html_to_text
from dolphinbeat_spark.sources.charset import (
    charset_from_content_type,
    detect_and_decode,
    normalize_label,
    sniff_meta_charset,
)


# --- html_to_text --------------------------------------------------------------


def test_html_full_page_extraction():
    h = (
        '<!DOCTYPE html><!-- hidden --><html><head>'
        '<meta charset="utf-8"><title>Doc 5 &amp; friends</title>'
        '<style>body { color: red; }</style>'
        '<script>var x = "<p>not text</p>";</script></head>'
        '<body><h1>Doc   5</h1><p>hello world</p>'
        '<p>tail &lt;tag&gt; &#33;</p>'
        "<div><a href=\"/a?x=1>2\">link one</a> and "
        "<a href='/b'>link two</a></div>"
        '<noscript><p>no js</p></noscript>pre<br>post</body></html>'
    )
    d = html_to_text(h)
    assert d.title == "Doc 5 & friends"
    assert d.text == (
        "Doc 5\nhello world\ntail <tag> !\nlink one and link two\npre\npost"
    )
    assert d.n_links == 2
    assert d.link_text_chars == len("link one") + len("link two")
    assert d.text_chars == len(d.text)
    assert d.link_density == d.link_text_chars / d.text_chars


def test_html_script_style_raw_text_never_leaks():
    # raw-text rule: "</div>" inside a script string must not close
    # anything; uppercase close tag matches case-insensitively
    d = html_to_text(
        "<div>a<script type='x'>if (1 < 2) { s = '</div>oops'; }"
        "</SCRIPT>b</div><style>p:after{content:'</p>x'}</style>c"
    )
    assert d.text == "ab\nc"


def test_html_entities_and_nbsp_collapse():
    d = html_to_text("<p>a&nbsp;&nbsp;b &euro;5 &#x41;&#66;</p>")
    assert d.text == "a b €5 AB"


def test_html_block_vs_inline_linebreaks():
    d = html_to_text(
        "<ul><li>one</li><li>two</li></ul>"
        "<table><tr><td>c1</td><td>c2</td></tr></table>"
        "<span>in</span><b>line</b><br><em>next</em>"
    )
    # li/tr break lines; td breaks too (cells become separate lines);
    # span/b/em do not break
    assert d.text == "one\ntwo\nc1\nc2\ninline\nnext"


def test_html_head_invisible_but_title_captured():
    d = html_to_text(
        "<head><title>T</title><meta x='y'><link rel=a>headjunk</head>"
        "<body>visible</body>"
    )
    assert d.title == "T" and d.text == "visible"
    # body implies head close even without </head>
    d2 = html_to_text("<head><title>T2</title><body>vis2")
    assert d2.title == "T2" and d2.text == "vis2"


def test_html_svg_title_not_page_title():
    """An SVG accessibility <title> inside <body> is NOT the page
    title (r10 ADVICE: the invisible-subtree depth check must run
    before the title capture)."""
    d = html_to_text(
        "<head><title>Real Title</title></head><body>"
        "<svg><title>icon label</title><circle r='1'/></svg>text</body>"
    )
    assert d.title == "Real Title"
    assert d.text == "text"
    # no page-level <title> at all: svg title must not fill in
    d2 = html_to_text("<body><svg><title>nope</title></svg>vis</body>")
    assert d2.title is None and d2.text == "vis"


def test_html_tag_soup_degrades():
    # literal '<' (not a tag), unterminated comment, unterminated tag
    assert html_to_text("x < 3 and y > 2").text == "x < 3 and y > 2"
    assert html_to_text("keep<!-- unterminated").text == "keep"
    assert html_to_text("<p>a<a href='x").text == "a"
    # unclosed <a> at EOF still counts its text
    d = html_to_text("<p><a href='/x'>anchor text")
    assert d.n_links == 1 and d.link_text_chars == len("anchor text")
    # empty input
    d0 = html_to_text("")
    assert d0.text == "" and d0.title is None and d0.link_density == 0.0


def test_html_attributes_quote_aware():
    d = html_to_text('<p data-x="a>b" data-y=\'c>d\'>kept</p>')
    assert d.text == "kept"


def test_html_per_line_link_signals_and_robots():
    """Per-line decomposition carries the jusText-style link-chars
    signal (nav line mostly links, prose not), and a robots noindex
    meta in the head is surfaced."""
    h = (
        '<html><head><meta name="ROBOTS" content="NOINDEX, nofollow">'
        "</head><body>"
        "<div><a href='/'>Home</a> | <a href='/a'>About Us</a></div>"
        "<p>plain prose line with no links here</p>"
        "<p>read <a href='/x'>the archive</a> now</p></body></html>"
    )
    d = html_to_text(h)
    assert d.robots_noindex is True
    assert d.lines == [
        ("Home | About Us", len("Home") + len("About Us")),
        ("plain prose line with no links here", 0),
        ("read the archive now", len("the archive")),
    ]
    d2 = html_to_text("<p>no meta at all</p>")
    assert d2.robots_noindex is False and d2.lines == [("no meta at all", 0)]
    # meta name=description does not trip the sniff
    d3 = html_to_text('<meta name="description" content="noindex word">x')
    assert d3.robots_noindex is False


def test_html_extract_lines_spark(spark):
    from dolphinbeat_spark.operators.html import html_extract_lines

    rows = [(1, "<div><a href='/'>Nav One</a></div><p>body text here</p>")]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = html_extract_lines(df).orderBy("line_idx").collect()
    assert [(r.line_idx, r.line_text, r.line_link_chars) for r in got] == [
        (0, "Nav One", 7), (1, "body text here", 0),
    ]
    assert got[0].line_link_density == 1.0 and got[1].line_link_density == 0.0


def test_html_hostile_text_never_raises():
    """The extractor's contract on wild HTML is total: ANY string in,
    extraction out — no exception may escape (a 100 TB ingest job must
    not die on tag soup). 300 random mutations of a real page plus
    pathological constructions."""
    import random

    base = (
        '<!DOCTYPE html><html><head><title>T</title><script>x="<p>"'
        "</script></head><body><p>hello &amp; world</p>"
        "<a href='/x'>link</a><ul><li>a<li>b</ul></body></html>"
    )
    rng = random.Random(13)
    alphabet = "<>/&#;!\"'= abAB\x00 \U0001F600"
    for _ in range(300):
        s = list(base)
        for _ in range(rng.randint(1, 8)):
            i = rng.randrange(len(s))
            s[i] = rng.choice(alphabet)
        d = html_to_text("".join(s))
        assert isinstance(d.text, str) and 0.0 <= d.link_density <= 1.0
    # pathological shapes
    for evil in ("<" * 5000, "&" * 5000, "<!--" * 100, "<script>" * 50,
                 "<a " * 1000, "\udcff<p>lone surrogate</p>",
                 "<p" + " x='y'" * 2000, "&#xFFFFFFFFF;</p>"):
        d = html_to_text(evil)
        assert isinstance(d.text, str)


def test_html_extract_spark(spark):
    rows = [
        (1, "<html><head><title>A</title></head><body><p>one</p>"
            "<a href='/'>x</a></body></html>"),
        (2, "no tags at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in html_extract(df).collect()}
    assert got[1].title == "A" and got[1].text == "one\nx"
    assert got[1].n_links == 1 and got[1].link_text_chars == 1
    assert got[2].title is None and got[2].text == "no tags at all"
    assert got[2].link_density == 0.0


def test_unicode_clean_text():
    """NFC composition, invisible/control drops, NBSP mapping, and
    the removal count (operators/textnorm.py)."""
    from dolphinbeat_spark.operators.textnorm import clean_text

    dirty = "éx​y\x07z  w﻿\ttab\nnl"
    cleaned, removed = clean_text(dirty)
    assert cleaned == "éxyz  w\ttab\nnl"  # tab/newline KEPT
    assert removed == 3  # ZWSP + BEL + BOM
    assert clean_text("plain ascii") == ("plain ascii", 0)
    # already-NFC input is a fixpoint
    assert clean_text(cleaned) == (cleaned, 0)


def test_normalize_text_spark(spark):
    from dolphinbeat_spark.operators.textnorm import normalize_text

    df = spark.createDataFrame(
        [(1, "a​b é")], "doc_id long, text string"
    )
    (row,) = normalize_text(df).collect()
    assert row.clean_text == "ab é"
    assert row.n_chars == 4 and row.n_removed == 1


# --- charset -------------------------------------------------------------------


def test_charset_label_table_whatwg_mappings():
    # the single most important real-world rule: latin-1 IS cp1252
    for label in ("latin1", "ISO-8859-1", "us-ascii", "Windows-1252"):
        assert normalize_label(label) == "cp1252"
    # shift_jis labels map to the Windows superset
    for label in ("Shift_JIS", "sjis", "x-sjis", "ms_kanji"):
        assert normalize_label(label) == "cp932"
    assert normalize_label("GB2312") == "gbk"
    assert normalize_label("bogus-charset-999") is None
    assert normalize_label(None) is None
    # CJK legacy families (r11 breadth): every WHATWG label lands on
    # the right stdlib codec
    for label in ("euc-kr", "korean", "ks_c_5601-1987", "ksc5601",
                  "windows-949", "cseuckr", "iso-ir-149"):
        assert normalize_label(label) == "cp949", label
    for label in ("euc-jp", "x-euc-jp", "cseucpkdfmtjapanese"):
        assert normalize_label(label) == "euc_jp", label
    for label in ("iso-2022-jp", "csiso2022jp"):
        assert normalize_label(label) == "iso2022_jp", label
    for label in ("big5", "cn-big5", "csbig5", "x-x-big5"):
        assert normalize_label(label) == "big5", label
    assert normalize_label("big5-hkscs") == "big5hkscs"
    assert normalize_label("gb18030") == "gb18030"


def test_charset_content_type_param():
    assert charset_from_content_type("text/html; charset=ISO-8859-1") == "cp1252"
    assert charset_from_content_type('text/html; charset="utf-8"') == "utf-8"
    assert charset_from_content_type("text/html") is None
    assert charset_from_content_type(None) is None


def test_charset_meta_prescan():
    assert sniff_meta_charset(b'<head><meta charset="shift_jis"></head>') == "cp932"
    assert sniff_meta_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=gb2312">'
    ) == "gbk"
    # outside the 1024-byte prescan window: not sniffed
    far = b" " * 1100 + b'<meta charset="shift_jis">'
    assert sniff_meta_charset(far) is None


def test_detect_and_decode_precedence():
    # BOM beats a lying transport header
    text, cs = detect_and_decode(
        "﻿BOM häder".encode("utf-8"), "text/html; charset=iso-8859-1"
    )
    assert (text, cs) == ("BOM häder", "utf-8")
    # transport header: latin-1-labeled cp1252 with € (0x80: cp1252-only)
    body = "Café naïve — résumé €9".encode("cp1252")
    text, cs = detect_and_decode(body, "text/html; charset=iso-8859-1")
    assert (text, cs) == ("Café naïve — résumé €9", "windows-1252")
    # meta sniff when the header is silent
    sj = ('<html><head><meta charset="shift_jis"></head>'
          "<body>こんにちは世界</body></html>").encode("cp932")
    text, cs = detect_and_decode(sj, "text/html")
    assert "こんにちは世界" in text and cs == "shift_jis"
    # strict UTF-8 trial when nothing declared
    text, cs = detect_and_decode("plain UTF-8 ✓".encode("utf-8"), None)
    assert (text, cs) == ("plain UTF-8 ✓", "utf-8")
    # fallback: undeclared cp1252 bytes are invalid UTF-8
    text, cs = detect_and_decode("déjà vu".encode("cp1252"), None)
    assert (text, cs) == ("déjà vu", "windows-1252")
    # utf-16 BOMs (the LE/BE codecs don't emit one — prepend explicitly)
    le = b"\xff\xfe" + "ab".encode("utf-16-le")
    be = b"\xfe\xff" + "ab".encode("utf-16-be")
    assert detect_and_decode(le, None) == ("ab", "utf-16le")
    assert detect_and_decode(be, None) == ("ab", "utf-16be")


def test_read_warc_charset_column(spark):
    """End-to-end: a WARC with a cp1252 body labeled iso-8859-1
    round-trips exactly (the old utf-8-replace path produced U+FFFD),
    and the charset column reports the encoding actually used."""
    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    want = "Café naïve — résumé €9"
    recs = [
        {"type": "response", "record_id": "<urn:uuid:cs-1>",
         "target_uri": "http://ex.com/legacy", "date": "2024-01-01T00:00:00Z",
         "content": want.encode("cp1252"),
         "http": {"status": 200,
                  "content_type": "text/html; charset=iso-8859-1"}},
    ]
    df = spark.createDataFrame(
        [(1, bytearray(encode_warc(recs)))], "media_id long, payload binary"
    )
    (got,) = read_warc(df).collect()
    assert got.body_text == want and got.charset == "windows-1252"
    assert "�" not in got.body_text
