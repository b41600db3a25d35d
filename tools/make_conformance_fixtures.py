#!/usr/bin/env python3
"""Commit externally-AUTHORED codec fixtures so the conformance pins
run in pytest without the system libraries: giflib-authored GIFs,
libjpeg-authored Huffman JPEGs (with libjpeg's own decoded pixels as
the reference), and a libtiff-readback attestation of the repo's TIFF
encodes. Imports only the tool-side authoring helpers (giflib/libjpeg
/libtiff via ctypes/subprocess) — the EXPECTED values all come from
the third-party implementations, never from the package.

Outputs under tests/fixtures/golden/conformance/:
- <name>.gif + pins (index-array sha256; the palette is the i->(i,i,i)
  gray identity so pixels are derivable)
- <name>.jpg + <name>.ref (libjpeg's decoded samples, raw) — the
  repo decoder must match within the IDCT tolerance
- conformance_pins.json

Run: python tools/make_conformance_fixtures.py
(compiles tools/jpeg_arith_harness.c if needed)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures", "golden",
                   "conformance")
HARNESS = "/tmp/jpeg_harness"

sys.path.insert(0, os.path.join(HERE, ".."))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    pins: dict = {"gif": {}, "jpeg": {}}
    rng = np.random.RandomState(2026)

    # --- giflib-authored GIFs ---------------------------------------------
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gifconf", os.path.join(HERE, "gif_conformance.py"))
    gifconf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gifconf)
    lib = gifconf._lib()
    for name, idx in (
        ("gif_noise", rng.randint(0, 256, (13, 21), dtype=np.uint8)),
        ("gif_runs", np.repeat(rng.randint(0, 256, (9, 6),
                                           dtype=np.uint8),
                               6, axis=1)[:, :31]),
    ):
        blob = gifconf.giflib_encode(lib, idx.shape[1], idx.shape[0],
                                     idx)
        with open(os.path.join(OUT, f"{name}.gif"), "wb") as f:
            f.write(blob)
        pins["gif"][name] = {
            "width": idx.shape[1], "height": idx.shape[0],
            "index_sha256": hashlib.sha256(idx.tobytes()).hexdigest(),
        }
        print(f"{name}: {len(blob)} bytes")

    # --- libjpeg-authored Huffman JPEGs -----------------------------------
    if not os.path.exists(HARNESS):
        subprocess.run(["gcc", "-O2", "-o", HARNESS,
                        os.path.join(HERE, "jpeg_arith_harness.c"),
                        "-ljpeg"], check=True)

    def harness(args, stdin):
        r = subprocess.run([HARNESS] + args, input=stdin,
                           capture_output=True)
        assert r.returncode == 0, r.stderr[:200]
        return r.stdout

    def scene(h, w, ch):
        base = np.cumsum(rng.randint(-9, 10, (h, w, ch)), axis=1)
        return np.clip(base + 128, 0, 255).astype(np.uint8)

    for name, (w, h, kind, mode, ri) in {
        "jpeg_gray_base": (32, 24, "GRAY", "encode_huff", 0),
        "jpeg_gray_prog": (17, 13, "GRAY", "encode_huff_prog", 2),
        "jpeg_rgb_base": (24, 16, "RGB", "encode_huff", 0),
        "jpeg_rgb_prog": (24, 16, "RGB", "encode_huff_prog", 0),
    }.items():
        ch = 1 if kind == "GRAY" else 3
        img = scene(h, w, ch)
        jb = harness([mode, str(w), str(h), kind, str(ri)],
                     img.tobytes())
        ref = harness(["decode"], jb)
        with open(os.path.join(OUT, f"{name}.jpg"), "wb") as f:
            f.write(jb)
        with open(os.path.join(OUT, f"{name}.ref"), "wb") as f:
            f.write(ref)
        pins["jpeg"][name] = {"width": w, "height": h,
                              "channels": ch}
        print(f"{name}: {len(jb)} bytes jpeg, {len(ref)} ref")

    with open(os.path.join(OUT, "conformance_pins.json"), "w") as f:
        json.dump(pins, f, indent=1, sort_keys=True)
    print("wrote pins")


if __name__ == "__main__":
    main()
