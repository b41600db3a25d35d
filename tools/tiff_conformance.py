#!/usr/bin/env python3
"""TIFF + CCITT conformance harness against the system libtiff: the
repo's encoder writes the full feature matrix and libtiff must read
every file back to the SAME pixels (via TIFFReadRGBAImageOriented),
while the repo's decoder must agree with its own encoder — with a
third implementation in the loop, mirrored encoder/decoder bugs
cannot hide (the r12 VP8 lesson: three such bugs survived r11's
self-referential roundtrips).

Matrix: compression none/LZW/PackBits × predictor × photometric
(WhiteIsZero/BlackIsZero/RGB/Palette) × depth 8/16 × strips/tiles ×
planar 1/2 × byte order, plus the bilevel CCITT family (Compression
2 = MH, 3 = T.4 1D/2D with byte-aligned EOLs, 4 = T.6) — the CCITT
codec's first third-party cross-check (previously pinned by
hand-assembled spec vectors only).

Imports the package encoder/decoder; libtiff is the independent
oracle. Run: python tools/tiff_conformance.py
"""

from __future__ import annotations

import ctypes
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")
from dolphinbeat_spark.operators.ccitt import ccitt_decode  # noqa: E402
from dolphinbeat_spark.operators.tiff import (  # noqa: E402
    decode_tiff,
    encode_tiff,
    encode_tiff_ccitt,
    encode_tiff_jpeg,
)


def _lib():
    lib = ctypes.CDLL("libtiff.so.6")
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    lib.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    lib.TIFFSetWarningHandler.restype = ctypes.c_void_p
    lib.TIFFSetWarningHandler.argtypes = [ctypes.c_void_p]
    lib.TIFFSetWarningHandler(None)
    return lib


def libtiff_rgba(lib, blob: bytes, w: int, h: int):
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        tif = lib.TIFFOpen(path.encode(), b"r")
        if not tif:
            return None
        buf = (ctypes.c_uint32 * (w * h))()
        ok = lib.TIFFReadRGBAImageOriented(tif, w, h, buf, 1, 0)
        lib.TIFFClose(tif)
        if not ok:
            return None
        return np.frombuffer(bytes(buf), np.uint8).reshape(h, w, 4)
    finally:
        os.unlink(path)


def to_rgb(px: np.ndarray, photometric: int,
           colormap=None) -> np.ndarray:
    """Normalize the repo decoder's output to 8-bit RGB the way
    TIFFReadRGBAImage does: 16-bit samples take the high byte, gray
    replicates, palette was already expanded by decode_tiff
    (colormap >> 8)."""
    if px.dtype == np.uint16:
        px = (px >> 8).astype(np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] == 1:
        px = px.repeat(3, axis=2)
    return px


def main() -> None:
    lib = _lib()
    rng = np.random.RandomState(7)
    fails = total = 0

    def run(name, blob, w, h, want_rgb, tol=0):
        nonlocal fails, total
        total += 1
        ref = libtiff_rgba(lib, blob, w, h)
        if ref is None:
            print(f"FAIL {name}: libtiff refused the file")
            fails += 1
            return
        d = np.abs(ref[:, :, :3].astype(int) - want_rgb.astype(int))
        if d.max() > tol:
            print(f"FAIL {name}: libtiff maxdiff {d.max()} "
                  f"({(d > 0).mean():.1%} px)")
            fails += 1

    # --- general matrix -----------------------------------------------------
    for end in ("<", ">"):
        for comp in (1, 5, 32773):
            # Predictor pairs with LZW only (TIFF 6.0 §14)
            for pred in ((1, 2) if comp == 5 else (1,)):
                for spp, photo in ((1, 1), (3, 2), (1, 0)):
                    want = rng.randint(0, 256, (13, 21, spp),
                                       dtype=np.uint8)
                    enc = encode_tiff(21, 13, want.tobytes(), spp=spp,
                                      photometric=photo,
                                      compression=comp, predictor=pred,
                                      rows_per_strip=5, byte_order=end)
                    # our decoder agrees with our encoder
                    _, _, px = decode_tiff(enc)
                    shown = 255 - want if photo == 0 else want
                    assert (px == shown.reshape(px.shape)).all(), "self"
                    run(f"{end}c{comp}p{pred}ph{photo}", enc, 21, 13,
                        to_rgb(px, photo))
    # 16-bit
    for end in ("<", ">"):
        w16 = rng.randint(0, 65536, (7, 9, 1), dtype=np.uint16)
        enc = encode_tiff(9, 7, w16.astype(end + "u2").tobytes(),
                          depth=16, compression=5, predictor=2,
                          byte_order=end)
        _, _, px = decode_tiff(enc)
        run(f"16bit{end}", enc, 9, 7, to_rgb(px, 1))
    # palette
    cmap = list(rng.randint(0, 65536, 3 * 256))
    idx = rng.randint(0, 256, (5, 8, 1), dtype=np.uint8)
    enc = encode_tiff(8, 5, idx.tobytes(), photometric=3, colormap=cmap,
                      compression=32773)
    _, _, px = decode_tiff(enc)
    run("palette", enc, 8, 5, to_rgb(px, 3))
    # tiled + planar
    want = rng.randint(0, 256, (13, 20, 3), dtype=np.uint8)
    for comp in (1, 5, 32773):
        for planar in (1, 2):
            for tile in (None, (16, 16)):
                if tile and planar == 2:
                    continue  # libtiff RGBA reader limitation
                enc = encode_tiff(20, 13, want.tobytes(), spp=3,
                                  compression=comp,
                                  predictor=2 if comp == 5 else 1,
                                  planar=planar, tile=tile,
                                  rows_per_strip=None if tile else 4)
                _, _, px = decode_tiff(enc)
                assert (px == want).all(), "self tiled"
                run(f"c{comp}planar{planar}tile{bool(tile)}", enc,
                    20, 13, to_rgb(px, 2))

    # --- CCITT family -------------------------------------------------------
    for trial in range(4):
        ink = (rng.random_sample((24, 64)) < (0.1 + 0.2 * trial)) \
            .astype(np.uint8)
        for comp, kw in ((2, {}), (3, {}), (3, {"t4_2d": True}),
                         (3, {"t4_2d": True, "byte_align": True}),
                         (4, {})):
            enc = encode_tiff_ccitt(ink, compression=comp,
                                    rows_per_strip=10, **kw)
            _, _, px = decode_tiff(enc)
            want = ((1 - ink) * 255).reshape(px.shape)  # ink -> black
            assert (px == want).all(), f"self ccitt {comp} {kw}"
            run(f"ccitt{comp}{kw}t{trial}", enc, 64, 24,
                to_rgb(px, 0))

    # --- JPEG-in-TIFF (Compression 7, r13) ----------------------------------
    # Lossy codec: libtiff decodes through libjpeg, we decode through
    # the in-repo JPEG decoder (itself IDCT-pinned vs libjpeg), so the
    # two decodes of the SAME file must agree within ±1 gray level.
    yy, xx = np.mgrid[0:33, 0:50]
    for gray in (True, False):
        c = 1 if gray else 3
        px_in = np.zeros((33, 50, c), np.uint8)
        for k in range(c):
            px_in[:, :, k] = (20 + xx * 2 + yy + k * 30).clip(0, 255)
        for tag, kw in (
                ("plain", {}),
                ("strips", {"rows_per_strip": 8}),
                ("tables", {"rows_per_strip": 8, "split_tables": True}),
                ("tiled", {"tiles": (16, 16)}),
                ("tiledtab", {"tiles": (16, 16), "split_tables": True}),
                ("sub420", {"subsample": "420", "split_tables": True}),
        ):
            enc = encode_tiff_jpeg(50, 33, px_in.tobytes(), gray=gray,
                                   **kw)
            _, _, mine = decode_tiff(enc)
            mine3 = np.repeat(mine, 3, axis=2) if c == 1 else mine
            run(f"jpeg-{tag}-gray{gray}", enc, 50, 33, mine3, tol=1)

    print(f"{total} files, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
