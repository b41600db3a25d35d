#!/usr/bin/env python3
"""Generate golden brotli fixtures with the REFERENCE encoder
(brotlicffi over libbrotlienc, available in the container's conda
python) for tests/test_brotli.py. Imports NOTHING from the package —
the fixtures are independent pins of the from-scratch RFC 7932
decoder, exactly like the zstd-CLI goldens (tools/make_zstd_fixtures
pattern).

Each fixture pair is ``<name>.br`` (compressed) + ``<name>.raw``
(expected plaintext). Quality 11 exercises the static dictionary,
word transforms, context maps and block switching; quality 0 the
fast path and uncompressed meta-blocks; lgwin 10 the small-window
distance interplay.

Run: python tools/make_brotli_fixtures.py
(re-executes itself under /root/miniconda/bin/python if brotlicffi
is not importable in the current interpreter)
"""

from __future__ import annotations

import os
import random
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures", "brotli")

CONDA_PY = "/root/miniconda/bin/python"


def cases() -> list[tuple[str, bytes, int, int]]:
    random.seed(20260815)
    words = ["the", "of", "and", "a", "in", "to", "is", "was", "it",
             "for", "with", "on", "as", "by", "at", "http", "www",
             "href", "div", "class", "data", "information", "example",
             "license", "Copyright", "</p>", "<span>", "function",
             "return", "document", "which", "their", "would", "there"]
    english = " ".join(random.choice(words) for _ in range(2500)).encode()
    html = (b"<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
            b"<title>Example Domain</title></head><body><div>"
            + " ".join(random.choice(words) for _ in range(1200)).encode()
            + b"</div></body></html>")
    utf8 = ("Éléphant naïve café über straße — "
            "日本語のテキストと한국어 텍스트。" * 80).encode()
    rng = random.Random(7)
    binary = bytes(rng.randrange(256) for _ in range(20000))
    repetitive = b"ab" * 3000 + b"xyz" * 2000 + bytes(range(256)) * 20
    return [
        ("english_q11", english, 11, 22),
        ("english_q5", english, 5, 22),
        ("english_q0", english, 0, 22),
        ("html_q11", html, 11, 22),
        ("html_q11_w10", html, 11, 10),
        ("utf8_q11", utf8, 11, 22),
        ("binary_q9", binary, 9, 22),
        ("binary_q0", binary, 0, 22),
        ("repetitive_q11", repetitive, 11, 22),
        ("tiny_q11", b"The quick brown fox", 11, 22),
        ("empty_q11", b"", 11, 22),
    ]


def main() -> None:
    try:
        import brotlicffi
    except ImportError:
        os.execv(CONDA_PY, [CONDA_PY, os.path.abspath(__file__)])
        return
    os.makedirs(OUT, exist_ok=True)
    for name, raw, q, lgwin in cases():
        c = brotlicffi.compress(raw, quality=q, lgwin=lgwin)
        with open(os.path.join(OUT, f"{name}.br"), "wb") as f:
            f.write(c)
        with open(os.path.join(OUT, f"{name}.raw"), "wb") as f:
            f.write(raw)
        print(f"{name}: {len(raw)} -> {len(c)} bytes (q{q}, w{lgwin})")


if __name__ == "__main__":
    sys.exit(main())
