#!/usr/bin/env python3
"""Generate the second REAL-libwebp VP8 golden (r12): a BRIGHT
natural-content image encoded by the system libwebp, pinning the
from-scratch RFC 6386 decoder's luma/chroma reconstruction against
externally computed YUV planes (the r11 pin — python-logo.webp — is
premultiplied near-black, so bright-DC dequant and natural-image
reconstruction were only self-referentially pinned).

Imports NOTHING from the package. Outputs:
- tests/fixtures/golden/bright-natural.webp — libwebp-encoded lossy
  VP8 (quality 75) of a deterministic bright synthetic-natural scene
  (sky gradient, sun disc, hills, texture),
- prints the sha256 of libwebp's OWN decoded Y/U/V planes
  (WebPDecodeYUV) to pin in tests/test_vp8.py. YUV is the right
  contract: the in-repo decoder's planes are bit-exact; only the
  chroma UPSAMPLING deviates (simple vs fancy, documented at the
  decode_webp API).

Run: python tools/make_vp8_golden.py
"""

from __future__ import annotations

import ctypes
import hashlib
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures", "golden",
                   "bright-natural.webp")

W, H = 128, 96


def make_scene() -> np.ndarray:
    """Deterministic bright 'natural' scene: sky gradient + sun +
    rolling hills + mild texture; mean luma well above 100."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    r = 140 + 90 * (1 - yy / H)
    g = 170 + 60 * (1 - yy / H)
    b = 230 - 40 * (yy / H)
    # sun
    d2 = (xx - 96) ** 2 + (yy - 20) ** 2
    sun = np.clip(1 - d2 / 230.0, 0, 1)
    r += 110 * sun
    g += 90 * sun
    b += 20 * sun
    # hills
    ridge = 60 + 14 * np.sin(xx / 9.0) + 8 * np.cos(xx / 23.0)
    hill = yy > ridge
    r[hill] = 90 + 3 * np.sin(xx[hill] / 3.0)
    g[hill] = 160 + 20 * np.sin(xx[hill] / 5.0 + yy[hill] / 7.0)
    b[hill] = 80 + 5 * np.cos(yy[hill] / 4.0)
    rng = np.random.RandomState(1234)
    tex = rng.randint(-18, 19, (H, W, 3))
    # grass blades: high-frequency vertical streaks on the hills
    streak = (12 * np.sin(xx * 1.7 + yy * 0.3))[:, :, None] * hill[:, :, None]
    img = np.dstack([r, g, b]) + tex + streak
    return np.clip(img, 0, 255).astype(np.uint8)


def conformance_cases() -> list[tuple[str, np.ndarray, float]]:
    """A small conformance corpus spanning the decode surface: bright
    natural content (the original r12 golden), heavy noise at low
    quality (all token categories + B_PRED churn), a random walk at
    q90 (high-quality loop-filter detail), and an odd non-MB-multiple
    size (edge cropping + partial-MB borders)."""
    rng = np.random.RandomState(99)
    walk = np.clip(
        np.cumsum(rng.randint(-11, 12, (64, 96, 3)), axis=1) + 140,
        0, 255).astype(np.uint8)
    noise = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    odd = rng.randint(40, 240, (29, 37, 3)).astype(np.uint8)
    return [
        ("bright-natural", make_scene(), 75.0),
        ("conf-noise-q10", noise, 10.0),
        ("conf-walk-q90", walk, 90.0),
        ("conf-odd-q60", odd, 60.0),
    ]


def main() -> None:
    import json

    lib = ctypes.CDLL("libwebp.so.7")
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    gold_dir = os.path.dirname(OUT)
    pins = {}
    for name, img, q in conformance_cases():
        hh, ww = img.shape[:2]
        outp = ctypes.POINTER(ctypes.c_uint8)()
        size = lib.WebPEncodeRGB(img.tobytes(), ww, hh, ww * 3,
                                 ctypes.c_float(q), ctypes.byref(outp))
        assert size > 0, f"libwebp encode failed for {name}"
        blob = ctypes.string_at(outp, size)
        path = os.path.join(gold_dir, f"{name}.webp")
        with open(path, "wb") as f:
            f.write(blob)
        # libwebp's own decode = the external reference planes
        w = ctypes.c_int()
        h = ctypes.c_int()
        up = ctypes.POINTER(ctypes.c_uint8)()
        vp = ctypes.POINTER(ctypes.c_uint8)()
        stride = ctypes.c_int()
        uv_stride = ctypes.c_int()
        yp = lib.WebPDecodeYUV(blob, ctypes.c_size_t(size),
                               ctypes.byref(w), ctypes.byref(h),
                               ctypes.byref(up), ctypes.byref(vp),
                               ctypes.byref(stride),
                               ctypes.byref(uv_stride))
        assert yp and (w.value, h.value) == (ww, hh)
        cw, chh = (ww + 1) // 2, (hh + 1) // 2
        y = np.frombuffer(ctypes.string_at(yp, stride.value * hh),
                          np.uint8).reshape(hh, stride.value)[:, :ww]
        u = np.frombuffer(ctypes.string_at(up, uv_stride.value * chh),
                          np.uint8).reshape(chh, uv_stride.value)[:, :cw]
        v = np.frombuffer(ctypes.string_at(vp, uv_stride.value * chh),
                          np.uint8).reshape(chh, uv_stride.value)[:, :cw]
        pins[name] = {
            "width": ww, "height": hh, "mean_luma": round(y.mean(), 1),
            "y_sha256": hashlib.sha256(y.tobytes()).hexdigest(),
            "u_sha256": hashlib.sha256(u.tobytes()).hexdigest(),
            "v_sha256": hashlib.sha256(v.tobytes()).hexdigest(),
        }
        print(f"{name}: {size} bytes q{q:.0f} "
              f"mean luma {y.mean():.1f}")
    pin_path = os.path.join(gold_dir, "vp8_conformance_pins.json")
    with open(pin_path, "w") as f:
        json.dump(pins, f, indent=1, sort_keys=True)
    print(f"wrote {pin_path}")


if __name__ == "__main__":
    main()
