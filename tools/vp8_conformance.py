#!/usr/bin/env python3
"""VP8 decoder conformance harness against the system libwebp: every
stream is decoded by BOTH decoders and the YUV planes AND the full
RGB renderings must match BIT-EXACTLY (RGB since r13: fancy chroma
upsampling + the truncating VP8Clip8 conversion close the former
simple-upsampler deviation). Two stream sources:

1. libwebp ENCODES a corpus spanning flats, gradients, random walks
   and noise across qualities 10..99 and sizes incl. odd
   non-MB-multiples — exercises natural mode mixes, probability
   updates, segmentation, all token categories and the loop filter;
2. the repo's OWN encoder force-writes targeted streams: every 4x4
   B-mode (all-one-mode MBs with residuals everywhere), every 16x16
   mode with Y2+chroma residuals, mixed-mode odd-size frames, and
   both loop filters across level/sharpness — exercises each
   predictor and filter branch in isolation.

This harness (r12) caught: the one-band shift of the whole default
coefficient-probability table, 10 wrong update-gate entries,
libwebp's permuted-vs-RFC bmode enum leaking into the extracted
KF_BMODE_PROBS, the within-MB above context for sub-block modes, and
inverted hev semantics in the sub-block loop filter — none of which
the r11 self-referential roundtrips could see (encoder and decoder
shared each bug).

Imports the package decoder only (the ctypes libwebp side is the
independent oracle). Run: python tools/vp8_conformance.py
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
import sys

import numpy as np

sys.path.insert(0, ".")
from dolphinbeat_spark.operators import vp8_tables as T  # noqa: E402
from dolphinbeat_spark.operators.vp8 import (  # noqa: E402
    decode_vp8,
    encode_vp8,
)


def _lib():
    name = ctypes.util.find_library("webp") or "libwebp.so.7"
    lib = ctypes.CDLL(name)
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    return lib


def ref_rgba(lib, blob: bytes, w: int, h: int):
    wd = ctypes.c_int()
    hd = ctypes.c_int()
    p = lib.WebPDecodeRGBA(blob, ctypes.c_size_t(len(blob)),
                           ctypes.byref(wd), ctypes.byref(hd))
    if not p:
        return None
    return np.frombuffer(ctypes.string_at(p, w * h * 4),
                         np.uint8).reshape(h, w, 4)


def ref_yuv(lib, blob: bytes, w: int, h: int):
    wd = ctypes.c_int()
    hd = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    st = ctypes.c_int()
    uvst = ctypes.c_int()
    yp = lib.WebPDecodeYUV(blob, ctypes.c_size_t(len(blob)),
                           ctypes.byref(wd), ctypes.byref(hd),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(st), ctypes.byref(uvst))
    if not yp:
        return None
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = np.frombuffer(ctypes.string_at(yp, st.value * h),
                      np.uint8).reshape(h, st.value)[:, :w].copy()
    u = np.frombuffer(ctypes.string_at(up, uvst.value * ch),
                      np.uint8).reshape(ch, uvst.value)[:, :cw].copy()
    v = np.frombuffer(ctypes.string_at(vp, uvst.value * ch),
                      np.uint8).reshape(ch, uvst.value)[:, :cw].copy()
    return y, u, v


def wrap(vp8: bytes) -> bytes:
    pad = b"\x00" if len(vp8) & 1 else b""
    return (b"RIFF" + struct.pack("<I", 12 + len(vp8) + len(pad))
            + b"WEBP" + b"VP8 " + struct.pack("<I", len(vp8))
            + vp8 + pad)


def check(lib, name: str, vp8: bytes, w: int, h: int) -> bool:
    from dolphinbeat_spark.operators.webp import decode_webp

    blob = wrap(vp8)
    r = ref_yuv(lib, blob, w, h)
    if r is None:
        print(f"FAIL {name}: libwebp refused the stream")
        return False
    try:
        _, _, y, u, v = decode_vp8(vp8)
    except Exception as ex:  # noqa: BLE001
        print(f"FAIL {name}: our decode raised {ex}")
        return False
    ds = [np.abs(a.astype(int) - b.astype(int)).max()
          for a, b in zip(r, (y, u, v))]
    if any(ds):
        print(f"FAIL {name}: Y={ds[0]} U={ds[1]} V={ds[2]}")
        return False
    # full RGB rendering (r13): fancy upsampler + VP8Clip8 must make
    # the container decode byte-identical to WebPDecodeRGBA
    ref = ref_rgba(lib, blob, w, h)
    if ref is None:
        print(f"FAIL {name}: libwebp RGBA refused the stream")
        return False
    _, _, mine = decode_webp(blob)
    if not (mine == ref).all():
        d = np.abs(mine.astype(int) - ref.astype(int))
        print(f"FAIL {name}: RGBA maxdiff {d.max()} "
              f"({(d > 0).mean():.2%} px)")
        return False
    return True


def main() -> None:
    lib = _lib()
    rng = np.random.RandomState(0)
    fails = total = 0

    def run(name, vp8, w, h):
        nonlocal fails, total
        total += 1
        if not check(lib, name, vp8, w, h):
            fails += 1

    # libwebp-encoded corpus
    def enc(img, q):
        h, w = img.shape[:2]
        out = ctypes.POINTER(ctypes.c_uint8)()
        size = lib.WebPEncodeRGB(img.tobytes(), w, h, w * 3,
                                 ctypes.c_float(q), ctypes.byref(out))
        blob = ctypes.string_at(out, size)
        (clen,) = struct.unpack_from("<I", blob, 16)
        return blob[20:20 + clen]

    for name, img in [
        ("flat255", np.full((16, 16, 3), 255, np.uint8)),
        ("flat210", np.full((16, 16, 3), 210, np.uint8)),
        ("grad", (np.mgrid[0:32, 0:32][1] * 8).astype(np.uint8)
         [:, :, None].repeat(3, 2)),
    ]:
        run(name, enc(img, 75), img.shape[1], img.shape[0])
    for q in (10, 30, 50, 75, 90, 99):
        for sz in ((32, 32), (64, 48), (37, 29), (128, 96), (17, 16)):
            walk = np.clip(
                np.cumsum(rng.randint(-9, 10, (sz[1], sz[0], 3)),
                          axis=1).astype(int) + rng.randint(60, 190),
                0, 255).astype(np.uint8)
            run(f"walk{sz}q{q}", enc(walk, q), sz[0], sz[1])
            noise = rng.randint(0, 256, (sz[1], sz[0], 3)) \
                .astype(np.uint8)
            run(f"noise{sz}q{q}", enc(noise, q), sz[0], sz[1])

    # own-encoder targeted streams
    def lv(n=3, lo=-8, hi=9):
        out = [0] * 16
        for k in rng.choice(16, n, replace=False):
            out[int(k)] = int(rng.randint(lo, hi)) or 1
        return out

    for bmode in range(10):
        mbs = [{"ymode": T.B_PRED, "uvmode": T.DC_PRED,
                "sub": [bmode] * 16,
                "y": [lv() for _ in range(16)]} for _ in range(4)]
        run(f"bmode{bmode}", encode_vp8(32, 32, mbs, qi=40), 32, 32)
    for m1 in range(10):
        for m2 in range(10):
            sub = [m1, m2] + [0] * 14
            run(f"pair{m1}{m2}", encode_vp8(
                16, 16, [{"ymode": T.B_PRED, "uvmode": 0,
                          "sub": sub}], qi=30), 16, 16)
    for ymode in range(4):
        mbs = [{"ymode": ymode, "uvmode": int(rng.randint(0, 4)),
                "y2": lv(4), "y": [lv() for _ in range(16)],
                "u": [lv() for _ in range(4)],
                "v": [lv() for _ in range(4)]} for _ in range(4)]
        run(f"ymode{ymode}", encode_vp8(32, 32, mbs, qi=35), 32, 32)
    for simple in (True, False):
        for flvl in (10, 30, 63):
            for sharp in (0, 3, 7):
                mbs = [{"ymode": int(rng.randint(0, 4)),
                        "uvmode": int(rng.randint(0, 4)),
                        "y2": lv(4), "y": [lv() for _ in range(16)],
                        "u": [lv() for _ in range(4)],
                        "v": [lv() for _ in range(4)]}
                       for _ in range(9)]
                run(f"lf s={simple} l={flvl} sh={sharp}",
                    encode_vp8(48, 48, mbs, qi=60, filter_level=flvl,
                               simple_filter=simple, sharpness=sharp),
                    48, 48)
    mbs = [{"ymode": int(rng.randint(0, 5)),
            "uvmode": int(rng.randint(0, 4))} for _ in range(12)]
    for m in mbs:
        if m["ymode"] == T.B_PRED:
            m["sub"] = [int(rng.randint(0, 10)) for _ in range(16)]
        else:
            m["y2"] = lv(4)
        m["y"] = [lv() for _ in range(16)]
        m["u"] = [lv() for _ in range(4)]
        m["v"] = [lv() for _ in range(4)]
    run("mixed 57x41", encode_vp8(57, 41, mbs, qi=50), 57, 41)

    print(f"{total} streams, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
