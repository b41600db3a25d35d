#!/usr/bin/env python3
"""Generate tests/fixtures/charset.warc — a WARC file whose HTTP
response bodies exercise every rung of the WHATWG charset-detection
precedence chain (sources/charset.py):

  r0  cp1252 bytes labeled ``charset=iso-8859-1`` (the web's most
      common lie — € and — are cp1252-only, so a latin-1 decode is
      provably wrong and a utf-8-replace decode yields U+FFFD)
  r1  Shift_JIS bytes, header silent, ``<meta charset="shift_jis">``
      prescan (decoded via the cp932 superset the spec prescribes)
  r2  UTF-8 BOM + a LYING ``charset=iso-8859-1`` header (BOM wins)
  r3  undeclared cp1252 bytes, invalid as UTF-8 (the windows-1252
      fallback rung)
  r4  GBK bytes labeled ``charset=gb2312`` (superset label mapping)
  r5  ISO-2022-JP bytes labeled ``charset=iso-2022-jp`` (r11 — the
      escape-sequence encoding: the bytes are pure 7-bit ASCII + ESC,
      so ONLY the label identifies it; a fallback decode would keep
      the escape soup)
  r6  EUC-JP bytes, header silent, ``<meta charset="euc-jp">`` prescan
  r7  EUC-KR bytes labeled ``charset=ks_c_5601-1987`` (the classic
      Korean label, mapped to the cp949 Windows superset per spec)
  r8  Big5 bytes labeled ``charset=big5``

The expected decoded strings are pinned verbatim in the
``warc_charset_decode`` oracle (plans/multimodal_queries.py) and in
tests/test_html_text.py — regenerate with this script if the record
set changes, then update both pins.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from dolphinbeat_spark.sources.warc import encode_warc  # noqa: E402

# (text, python codec to encode with, declared Content-Type)
RECORDS = [
    ("Café naïve — résumé €9", "cp1252",
     "text/html; charset=iso-8859-1"),
    ('<html><head><meta charset="shift_jis"></head>'
     "<body><p>こんにちは世界。日本語のページ。</p></body></html>", "cp932",
     "text/html"),
    ("BOM wins: héllo résumé", "utf-8-sig",  # utf-8-sig writes the BOM
     "text/html; charset=iso-8859-1"),
    ("déjà vu, 10€ œuvre", "cp1252", "text/html"),
    ('<html><body><p>你好，世界。中文页面。</p></body></html>', "gbk",
     "text/html; charset=gb2312"),
    ("日本語テキストです。ISO-2022-JP 版。", "iso2022_jp",
     "text/plain; charset=iso-2022-jp"),
    ('<html><head><meta charset="euc-jp"></head>'
     "<body><p>こんにちは、EUC-JP のページです。</p></body></html>", "euc_jp",
     "text/html"),
    ("안녕하세요 세계. 한국어 페이지.", "cp949",
     "text/html; charset=ks_c_5601-1987"),
    ("繁體中文網頁測試。", "big5", "text/html; charset=big5"),
]


def build() -> bytes:
    recs = []
    for i, (text, codec, ctype) in enumerate(RECORDS):
        recs.append({
            "type": "response",
            "record_id": f"<urn:uuid:charset-{i}>",
            "target_uri": f"http://ex.com/charset/{i}",
            "date": "2024-02-01T00:00:00Z",
            "content": text.encode(codec),
            "http": {"status": 200, "content_type": ctype},
        })
    return encode_warc(recs)


if __name__ == "__main__":
    out = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "charset.warc"
    out.write_bytes(build())
    print(f"wrote {out} ({out.stat().st_size} bytes)")
