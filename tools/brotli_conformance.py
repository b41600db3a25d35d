#!/usr/bin/env python3
"""LIVE brotli differential harness (r13): random corpora are
compressed by the REFERENCE encoder (brotlicffi over libbrotlienc in
the container's conda python) across qualities/windows and must
decode byte-identically through the from-scratch RFC 7932 decoder
(operators/brotli.py) — widening the committed golden fixtures
(tools/make_brotli_fixtures.py) into an arbitrarily deep third-
implementation fuzz, the same posture as tools/vp8_conformance.py.

Content classes exercise distinct coding paths: ASCII text (static
dictionary + word transforms at q11), JSON-ish (context modeling),
runs (copy commands + distance cache), random bytes (literal-heavy /
uncompressed meta-blocks at low q), and mixed. Window sizes down to
lgwin 10 force the small-window distance interplay.

Run: python tools/brotli_conformance.py [n_cases]
(compression runs in the conda python as a subprocess — the package
import chain needs pyspark, which conda lacks, so the two
interpreters split the work)."""

from __future__ import annotations

import os
import random
import struct
import subprocess
import sys

CONDA = "/root/miniconda/bin/python"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from dolphinbeat_spark.operators.brotli import (  # noqa: E402
    BrotliError,
    decode_brotli,
)

_ENC_SNIPPET = r"""
import struct, sys
import brotlicffi
data = sys.stdin.buffer.read()
(q, lgwin, n) = struct.unpack(">BBI", data[:6])
blob = brotlicffi.compress(data[6:6 + n], quality=q, lgwin=lgwin)
sys.stdout.buffer.write(blob)
"""


def ref_compress(data: bytes, q: int, lgwin: int) -> bytes:
    p = subprocess.run(
        [CONDA, "-c", _ENC_SNIPPET],
        input=struct.pack(">BBI", q, lgwin, len(data)) + data,
        capture_output=True)
    if p.returncode != 0:
        raise RuntimeError(p.stderr.decode()[:200])
    return p.stdout


def corpus(rng: random.Random, kind: str, n: int) -> bytes:
    if kind == "text":
        words = ["the", "of", "and", "http", "www", "information",
                 "that", "data", "with", "which", "from", "page"]
        out = []
        size = 0
        while size < n:
            w = rng.choice(words)
            out.append(w)
            size += len(w) + 1
        return " ".join(out).encode()[:n]
    if kind == "json":
        rows = []
        size = 0
        while size < n:
            row = ('{"id": %d, "name": "user%d", "ok": %s}'
                   % (rng.randrange(10**6), rng.randrange(10**4),
                      rng.choice(["true", "false"])))
            rows.append(row)
            size += len(row) + 1
        return "\n".join(rows).encode()[:n]
    if kind == "runs":
        out = bytearray()
        while len(out) < n:
            out += bytes([rng.randrange(256)]) * rng.randrange(1, 300)
        return bytes(out[:n])
    if kind == "random":
        return bytes(rng.randrange(256) for _ in range(n))
    # mixed
    half = n // 2
    return corpus(rng, "text", half) + corpus(rng, "random", n - half)


def main() -> None:
    if not os.path.exists(CONDA):
        print("no conda python; reference encoder unavailable")
        sys.exit(0)
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    rng = random.Random(13)
    fails = total = 0
    kinds = ["text", "json", "runs", "random", "mixed"]
    while total < n_cases:
        kind = kinds[total % len(kinds)]
        n = rng.choice([0, 1, 50, 1000, 20000, 120000])
        q = rng.choice([0, 1, 5, 9, 11])
        lgwin = rng.choice([10, 18, 22])
        data = corpus(rng, kind, n)
        blob = ref_compress(data, q, lgwin)
        total += 1
        try:
            got = decode_brotli(blob)
        except (BrotliError, NotImplementedError) as ex:
            print(f"FAIL {kind} n={n} q={q} lgwin={lgwin}: "
                  f"decoder raised {ex}")
            fails += 1
            continue
        if got != data:
            print(f"FAIL {kind} n={n} q={q} lgwin={lgwin}: "
                  f"{len(got)} bytes decoded, first diff at "
                  f"{next((i for i, (a, b) in enumerate(zip(got, data)) if a != b), min(len(got), len(data)))}")
            fails += 1
    print(f"{total} streams, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
