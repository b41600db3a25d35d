#!/usr/bin/env python3
"""LIVE zstd differential harness (r13): random corpora are
compressed by the SYSTEM zstd CLI across levels (incl. --ultra -22
and long-distance matching) and must decode byte-identically through
the from-scratch RFC 8878 decoder (operators/zstd_frame.py) —
widening the committed CLI goldens (tools/make_zstd_fixtures.py)
into an arbitrarily deep third-implementation fuzz, the sibling of
tools/brotli_conformance.py.

Content classes: text (FSE/huffman-heavy), JSON-ish (sequences +
repeat offsets), runs (RLE blocks + long matches), random (raw
blocks), mixed. ``--long=27`` exercises window sizes past the
default MAX_WINDOW cap (the decoder is called with an explicit
max_output).

Run: python tools/zstd_conformance.py [n_cases]"""

from __future__ import annotations

import os
import random
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from dolphinbeat_spark.operators.zstd_frame import (  # noqa: E402
    ZstdError,
    decode_zstd,
)


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
            out += bytes([rng.randrange(256)]) * rng.randrange(1, 400)
        return bytes(out[:n])
    if kind == "random":
        return bytes(rng.randrange(256) for _ in range(n))
    half = n // 2
    return corpus(rng, "text", half) + corpus(rng, "random", n - half)


def main() -> None:
    cli = shutil.which("zstd")
    if not cli:
        print("no zstd CLI; reference encoder unavailable")
        sys.exit(0)
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    rng = random.Random(17)
    fails = total = 0
    kinds = ["text", "json", "runs", "random", "mixed"]
    while total < n_cases:
        kind = kinds[total % len(kinds)]
        n = rng.choice([0, 1, 60, 1500, 30000, 200000])
        level, extra = rng.choice([
            (1, []), (3, []), (9, []), (19, []),
            (22, ["--ultra"]), (12, ["--long=27"]),
        ])
        data = corpus(rng, kind, n)
        p = subprocess.run(
            [cli, f"-{level}", *extra, "-c"], input=data,
            capture_output=True)
        if p.returncode != 0:
            print(f"SKIP {kind} n={n} -{level} {extra}: CLI refused")
            total += 1
            continue
        blob = p.stdout
        total += 1
        try:
            got = decode_zstd(blob, max_output=max(n, 1) + 1024)
        except (ZstdError, NotImplementedError) as ex:
            print(f"FAIL {kind} n={n} -{level} {extra}: decoder "
                  f"raised {ex}")
            fails += 1
            continue
        if got != data:
            print(f"FAIL {kind} n={n} -{level} {extra}: "
                  f"{len(got)} bytes decoded")
            fails += 1
    print(f"{total} streams, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
