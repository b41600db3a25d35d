"""Charset detection + decode for wild web text — the WHATWG Encoding
Standard's label table and precedence rules, applied to WARC/HTTP
bodies before they reach the text pipeline.

A meaningful share of the live web is still served in legacy
encodings (windows-1252 mislabeled as latin-1, Shift_JIS, GBK, …).
Decoding everything as UTF-8 with replacement characters silently
mangles those pages — and the U+FFFD soup then poisons dedup hashes,
n-gram language ID, and quality scores downstream, which is worse
than dropping the page. This module implements the practical subset
of the WHATWG rules a corpus pipeline needs:

precedence (https://encoding.spec.whatwg.org/ + HTML §13.2.3.2):
1. a byte-order mark (UTF-8 / UTF-16LE / UTF-16BE) wins over
   everything, including the transport header;
2. the transport-layer charset (Content-Type ``charset=`` parameter),
   run through the label table;
3. a ``<meta charset>`` / ``<meta http-equiv=Content-Type>`` sniff of
   the first 1024 bytes (the spec's prescan window);
4. strict UTF-8 trial decode (UTF-8 is self-validating: real UTF-8
   essentially never decodes strictly under another family);
5. windows-1252 fallback — the Encoding Standard's mandated default
   for unlabeled content (it never fails: all 256 bytes map).

Label normalization follows the spec's table: ``latin-1``,
``iso-8859-1``, ``ascii`` and friends are ALL windows-1252 on the
web (that mapping is the single most common real-world fix);
``shift_jis`` labels map to the Windows superset cp932 the spec
prescribes. Decoding a declared/sniffed charset uses
``errors="replace"`` (wild pages lie about their own encoding, and
one bad byte must not kill a 100 TB ingest job); the BOM and
trial-UTF-8 paths are exact by construction.

Everything here is stdlib ``codecs`` — published Python encodings,
no third-party codec libraries.
"""

from __future__ import annotations

import codecs
import re

#: WHATWG Encoding Standard label table (the subset covering ~all of
#: the real web). Keys are lowercased labels; values are Python codec
#: names. https://encoding.spec.whatwg.org/#names-and-labels
_LABELS: dict[str, str] = {
    # utf-8
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "unicode11utf8": "utf-8", "unicode20utf8": "utf-8",
    "x-unicode20utf8": "utf-8",
    # windows-1252 (the spec maps ALL latin-1/ascii labels here)
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "iso88591": "cp1252",
    "iso_8859-1": "cp1252", "iso_8859-1:1987": "cp1252",
    "latin1": "cp1252", "latin-1": "cp1252", "l1": "cp1252",
    "ascii": "cp1252", "us-ascii": "cp1252", "ansi_x3.4-1968": "cp1252",
    "cp819": "cp1252", "ibm819": "cp1252",
    # other single-byte families
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2", "l2": "iso8859-2",
    "iso-8859-5": "iso8859-5", "iso-8859-7": "iso8859-7",
    "iso-8859-9": "cp1254", "latin5": "cp1254",
    "iso-8859-15": "iso8859-15", "latin9": "iso8859-15", "l9": "iso8859-15",
    "windows-1250": "cp1250", "cp1250": "cp1250", "x-cp1250": "cp1250",
    "windows-1251": "cp1251", "cp1251": "cp1251", "x-cp1251": "cp1251",
    "windows-1253": "cp1253", "windows-1254": "cp1254",
    "windows-1255": "cp1255", "windows-1256": "cp1256",
    "windows-1257": "cp1257", "windows-1258": "cp1258",
    "koi8-r": "koi8-r", "koi8_r": "koi8-r", "koi8": "koi8-r",
    "koi8-u": "koi8-u", "koi8-ru": "koi8-u",
    # Japanese: the spec maps every shift_jis label to the Windows
    # superset (windows-31j / cp932)
    "shift_jis": "cp932", "shift-jis": "cp932", "sjis": "cp932",
    "x-sjis": "cp932", "ms_kanji": "cp932", "csshiftjis": "cp932",
    "windows-31j": "cp932", "ms932": "cp932",
    "euc-jp": "euc_jp", "x-euc-jp": "euc_jp", "cseucpkdfmtjapanese": "euc_jp",
    "iso-2022-jp": "iso2022_jp", "csiso2022jp": "iso2022_jp",
    # Chinese: gbk labels (incl. the gb2312 aliases the spec folds in)
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk", "gb_2312-80": "gbk",
    "chinese": "gbk", "csgb2312": "gbk", "csiso58gb231280": "gbk",
    "x-gbk": "gbk", "iso-ir-58": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs", "cn-big5": "big5",
    "csbig5": "big5", "x-x-big5": "big5",
    # Korean: every euc-kr label maps to the Windows superset cp949
    "euc-kr": "cp949", "korean": "cp949", "cseuckr": "cp949",
    "ks_c_5601-1987": "cp949",
    "ks_c_5601-1989": "cp949", "ksc5601": "cp949", "ksc_5601": "cp949",
    "windows-949": "cp949", "csksc56011987": "cp949", "iso-ir-149": "cp949",
    # utf-16
    "utf-16": "utf-16-le", "utf-16le": "utf-16-le", "ucs-2": "utf-16-le",
    "unicodefeff": "utf-16-le", "csunicode": "utf-16-le",
    "utf-16be": "utf-16-be", "unicodefffe": "utf-16-be",
}

#: canonical display name per Python codec (what the charset column
#: reports — WHATWG canonical names)
_DISPLAY: dict[str, str] = {
    "utf-8": "utf-8", "cp1252": "windows-1252", "cp932": "shift_jis",
    "gbk": "gbk", "gb18030": "gb18030", "big5": "big5",
    "big5hkscs": "big5-hkscs", "cp949": "euc-kr", "euc_jp": "euc-jp",
    "iso2022_jp": "iso-2022-jp", "utf-16-le": "utf-16le",
    "utf-16-be": "utf-16be", "iso8859-2": "iso-8859-2",
    "iso8859-5": "iso-8859-5", "iso8859-7": "iso-8859-7",
    "iso8859-15": "iso-8859-15", "cp1250": "windows-1250",
    "cp1251": "windows-1251", "cp1253": "windows-1253",
    "cp1254": "windows-1254", "cp1255": "windows-1255",
    "cp1256": "windows-1256", "cp1257": "windows-1257",
    "cp1258": "windows-1258", "koi8-r": "koi8-r", "koi8-u": "koi8-u",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9._:\-]+)""",
    re.IGNORECASE,
)

_CTYPE_CHARSET_RE = re.compile(
    r"""charset\s*=\s*["']?\s*([a-zA-Z0-9._:\-]+)""", re.IGNORECASE
)


def normalize_label(label: str | None) -> str | None:
    """A charset label -> Python codec name per the WHATWG table, or
    None for unknown/empty labels (unknown labels fall through to the
    sniff/UTF-8 path rather than erroring — the spec's behavior)."""
    if not label:
        return None
    key = label.strip().strip("\"'").lower()
    if key in _LABELS:
        return _LABELS[key]
    try:  # a valid Python codec the table doesn't list (rare, honest)
        return codecs.lookup(key).name
    except LookupError:
        return None


def charset_from_content_type(ctype: str | None) -> str | None:
    """The ``charset=`` parameter of a Content-Type header value ->
    Python codec name (or None)."""
    if not ctype:
        return None
    m = _CTYPE_CHARSET_RE.search(ctype)
    return normalize_label(m.group(1)) if m else None


def sniff_meta_charset(body: bytes, window: int = 1024) -> str | None:
    """Prescan the first ``window`` bytes for ``<meta charset=…>`` or
    ``<meta http-equiv=Content-Type content="…charset=…">`` (both hit
    the same attribute regex — the spec's prescan is byte-oriented and
    ASCII-compatible)."""
    m = _META_CHARSET_RE.search(body[:window])
    if not m:
        return None
    return normalize_label(m.group(1).decode("ascii", "replace"))


def detect_and_decode(
    body: bytes, declared_ctype: str | None = None
) -> tuple[str, str]:
    """(body bytes, transport Content-Type) -> (text, charset name).

    Applies the precedence chain from the module docstring; the
    returned charset is the WHATWG canonical name of the encoding
    actually used (e.g. ``windows-1252`` even when the page said
    ``iso-8859-1``)."""
    # 1. BOM beats everything (Encoding Standard "BOM sniff")
    if body.startswith(b"\xef\xbb\xbf"):
        return body[3:].decode("utf-8", "replace"), "utf-8"
    if body.startswith(b"\xff\xfe"):
        return body[2:].decode("utf-16-le", "replace"), "utf-16le"
    if body.startswith(b"\xfe\xff"):
        return body[2:].decode("utf-16-be", "replace"), "utf-16be"
    # 2. transport header, 3. meta prescan
    codec = charset_from_content_type(declared_ctype) or sniff_meta_charset(body)
    if codec is not None:
        return body.decode(codec, "replace"), _DISPLAY.get(codec, codec)
    # 4. strict UTF-8 trial
    try:
        return body.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass
    # 5. the mandated fallback: windows-1252 never fails
    return body.decode("cp1252", "replace"), "windows-1252"
