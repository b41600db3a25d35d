#!/usr/bin/env python3
"""JPEG Huffman-layer conformance against the system libjpeg, via the
compiled tools/jpeg_arith_harness.c (gcc -O2 -o /tmp/jpeg_harness
tools/jpeg_arith_harness.c -ljpeg):

- direction A: the repo's encoder (baseline + progressive, with and
  without restart intervals, gray and 4:2:0 RGB) produces streams
  libjpeg must decode to pixels within the IDCT tolerance;
- direction B: libjpeg Huffman-encodes (encode_huff /
  encode_huff_prog) and the repo's decoder must agree with libjpeg's
  own decode within the same tolerance.

The contract is |diff| <= TOL per sample with a tight mean bound:
T.81 permits small IDCT differences (libjpeg islow vs the orthonormal
float IDCT here), but an entropy-layer desync differs
catastrophically, which is what this harness exists to catch (the
arithmetic modes are already pinned BIT-FOR-BIT at the coefficient
level by tests/fixtures/arith). Run: python tools/jpeg_conformance.py
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, ".")
from dolphinbeat_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)

HARNESS = "/tmp/jpeg_harness"
TOL = 3        # per-sample IDCT tolerance (counts)
MEAN_TOL = 0.5


def harness(args: list[str], stdin: bytes) -> bytes:
    r = subprocess.run([HARNESS] + args, input=stdin,
                       capture_output=True)
    assert r.returncode == 0, (args, r.stderr[:200])
    return r.stdout


def close(a: np.ndarray, b: np.ndarray, tol: int = TOL,
          mean_tol: float = MEAN_TOL) -> tuple[bool, float, float]:
    d = np.abs(a.astype(int) - b.astype(int))
    return bool(d.max() <= tol and d.mean() <= mean_tol), \
        float(d.max()), float(d.mean())


def main() -> None:
    if not os.path.exists(HARNESS):
        subprocess.run(["gcc", "-O2", "-o", HARNESS,
                        "tools/jpeg_arith_harness.c", "-ljpeg"],
                       check=True)
    rng = np.random.RandomState(4)
    fails = total = 0

    def check(name, ok, mx, mean):
        nonlocal fails, total
        total += 1
        if not ok:
            print(f"FAIL {name}: max {mx} mean {mean:.2f}")
            fails += 1

    # smooth-ish content (quantized JPEG of noise is dominated by
    # quantization, hiding entropy desyncs less well than smooth data)
    def scene(h, w, ch):
        base = np.cumsum(rng.randint(-9, 10, (h, w, ch)), axis=1)
        return np.clip(base + 128, 0, 255).astype(np.uint8)

    for gray in (True, False):
        ch = 1 if gray else 3
        kind = "GRAY" if gray else "RGB"
        for (w, h) in ((32, 24), (17, 13), (64, 48)):
            img = scene(h, w, ch)
            for prog in (False, True):
                for ri in (0, 2):
                  for sub in (("444",) if gray else ("444", "420")):
                    # A: our encoder -> libjpeg decode. 4:2:0 rides
                    # here (libjpeg decodes OUR subsampled streams;
                    # its fancy upsampler vs our simple one is a
                    # documented policy difference, so 4:2:0 uses a
                    # wider bound that still catches entropy desyncs)
                    tol = (TOL, MEAN_TOL) if sub == "444" else (90, 6.0)
                    enc = (encode_jpeg_progressive if prog
                           else encode_jpeg)(
                        w, h, img.tobytes(), gray=gray, subsample=sub,
                        restart_interval=ri)
                    ref = np.frombuffer(
                        harness(["decode"], enc), np.uint8
                    ).reshape(h, w, ch)
                    _, _, mine = decode_jpeg(enc)
                    mine = mine.reshape(h, w, ch)
                    check(f"A {kind}{sub} {w}x{h} prog={prog} ri={ri}",
                          *close(ref, mine, *tol))
                    if sub != "444":
                        continue
                    # B: libjpeg huffman encoder (forced 4:4:4) ->
                    # our decoder vs libjpeg's own decode
                    mode = "encode_huff_prog" if prog else "encode_huff"
                    jb = harness([mode, str(w), str(h), kind, str(ri)],
                                 img.tobytes())
                    ref = np.frombuffer(
                        harness(["decode"], jb), np.uint8
                    ).reshape(h, w, ch)
                    _, _, mine = decode_jpeg(jb)
                    mine = mine.reshape(h, w, ch)
                    check(f"B {kind} {w}x{h} prog={prog} ri={ri}",
                          *close(ref, mine))
    print(f"{total} cases, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
