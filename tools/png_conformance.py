#!/usr/bin/env python3
"""PNG conformance harness against the system libpng (simplified
png_image API): every shape the repo's writer/decoder supports — all
five scanline filters forced per row, color types 0/2/3/4/6 at their
spec-legal depths (16-bit, sub-byte 1/2/4-bit, palette, alpha), and
Adam7 interlace — must decode identically through libpng. PNG decode
is exact (deflate + integer filters), so the contract is
bit-identical pixels; with a third implementation in the loop,
mirrored writer/decoder filter bugs (e.g. Paeth tie-breaking) cannot
hide (the r12 VP8 lesson). Run: python tools/png_conformance.py
"""

from __future__ import annotations

import ctypes
import sys

import numpy as np

sys.path.insert(0, ".")
from dolphinbeat_spark.operators.multimodal import (  # noqa: E402
    decode_png,
    encode_png,
)

# png.h simplified-API format flags: ALPHA=1, COLOR=2
PNG_FORMAT_GRAY = 0
PNG_FORMAT_RGB = 2
PNG_FORMAT_RGBA = 3  # COLOR | ALPHA
PNG_FORMAT_GA = 1


class PngImage(ctypes.Structure):
    _fields_ = [("opaque", ctypes.c_void_p),
                ("version", ctypes.c_uint32),
                ("width", ctypes.c_uint32),
                ("height", ctypes.c_uint32),
                ("format", ctypes.c_uint32),
                ("flags", ctypes.c_uint32),
                ("colormap_entries", ctypes.c_uint32),
                ("warning_or_error", ctypes.c_uint32),
                ("message", ctypes.c_char * 64)]


def _lib():
    lib = ctypes.CDLL("libpng16.so.16")
    lib.png_image_begin_read_from_memory.restype = ctypes.c_int
    lib.png_image_begin_read_from_memory.argtypes = [
        ctypes.POINTER(PngImage), ctypes.c_char_p, ctypes.c_size_t]
    lib.png_image_finish_read.restype = ctypes.c_int
    lib.png_image_finish_read.argtypes = [
        ctypes.POINTER(PngImage), ctypes.c_void_p, ctypes.c_char_p,
        ctypes.c_int32, ctypes.c_void_p]
    return lib


def libpng_read(lib, blob: bytes, fmt: int, channels: int):
    img = PngImage()
    img.version = 1
    if not lib.png_image_begin_read_from_memory(
            ctypes.byref(img), blob, len(blob)):
        return None
    w, h = img.width, img.height
    img.format = fmt
    buf = ctypes.create_string_buffer(w * h * channels)
    if not lib.png_image_finish_read(ctypes.byref(img), None, buf,
                                     0, None):
        return None
    return np.frombuffer(buf.raw, np.uint8).reshape(h, w, channels)


def main() -> None:
    lib = _lib()
    rng = np.random.RandomState(5)
    fails = total = 0

    def run(name, blob, want, fmt, channels):
        nonlocal fails, total
        total += 1
        ref = libpng_read(lib, blob, fmt, channels)
        if ref is None:
            print(f"FAIL {name}: libpng refused")
            fails += 1
            return
        if ref.shape != want.shape or not (ref == want).all():
            d = np.abs(ref.astype(int) - want.astype(int))
            print(f"FAIL {name}: maxdiff {d.max()} ({(d > 0).mean():.1%})")
            fails += 1

    w, h = 21, 13
    # every filter type forced, every color type, interlace
    for interlace in (False, True):
        for filt in (0, 1, 2, 3, 4, "cycle"):
            row_filters = list(np.arange(h) % 5) if filt == "cycle" \
                else filt
            rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            blob = encode_png(w, h, rgb.tobytes(), color_type=2,
                              row_filters=row_filters,
                              interlace=interlace)
            _, _, px = decode_png(blob)
            assert (px == rgb).all(), "self rgb"
            run(f"rgb f{filt} i{interlace}", blob, rgb,
                PNG_FORMAT_RGB, 3)
            gray = rng.randint(0, 256, (h, w, 1), dtype=np.uint8)
            blob = encode_png(w, h, gray.tobytes(), color_type=0,
                              row_filters=row_filters,
                              interlace=interlace)
            run(f"gray f{filt} i{interlace}", blob,
                gray.repeat(3, 2), PNG_FORMAT_RGB, 3)
            rgba = rng.randint(0, 256, (h, w, 4), dtype=np.uint8)
            blob = encode_png(w, h, rgba.tobytes(), color_type=6,
                              row_filters=row_filters,
                              interlace=interlace)
            run(f"rgba f{filt} i{interlace}", blob, rgba,
                PNG_FORMAT_RGBA, 4)
            ga = rng.randint(0, 256, (h, w, 2), dtype=np.uint8)
            blob = encode_png(w, h, ga.tobytes(), color_type=4,
                              row_filters=row_filters,
                              interlace=interlace)
            want = np.dstack([ga[:, :, :1].repeat(3, 2), ga[:, :, 1:]])
            run(f"ga f{filt} i{interlace}", blob, want,
                PNG_FORMAT_RGBA, 4)
    # palette
    pal = bytes(rng.randint(0, 256, 3 * 256, dtype=np.uint8))
    idx = rng.randint(0, 256, (h, w), dtype=np.uint8)
    blob = encode_png(w, h, idx.tobytes(), color_type=3, palette=pal,
                      row_filters=1)
    lut = np.frombuffer(pal, np.uint8).reshape(256, 3)
    run("palette8", blob, lut[idx], PNG_FORMAT_RGB, 3)
    # sub-byte gray depths with the exact 255/(2^d-1) expansion
    for depth in (1, 2, 4):
        vals = rng.randint(0, 1 << depth, (h, w), dtype=np.uint8)
        blob = encode_png(w, h, vals.tobytes(), color_type=0,
                          depth=depth, row_filters=0)
        want = (vals * (255 // ((1 << depth) - 1)))[:, :, None] \
            .repeat(3, 2).astype(np.uint8)
        run(f"gray{depth}bit", blob, want, PNG_FORMAT_RGB, 3)
    # sub-byte palette
    for depth in (1, 2, 4):
        pidx = rng.randint(0, 1 << depth, (h, w), dtype=np.uint8)
        spal = bytes(rng.randint(0, 256, 3 * (1 << depth),
                                 dtype=np.uint8))
        blob = encode_png(w, h, pidx.tobytes(), color_type=3,
                          palette=spal, depth=depth, row_filters=2)
        slut = np.frombuffer(spal, np.uint8).reshape(-1, 3)
        run(f"palette{depth}bit", blob, slut[pidx], PNG_FORMAT_RGB, 3)
    # 16-bit gray via the LINEAR format (flag 4): libpng returns the
    # 16-bit samples verbatim as host-endian uint16 — exact contract
    # (the 8-bit sRGB read path applies gamma, which is a simplified-
    # API presentation choice, not part of the decode)
    v16 = rng.randint(0, 65536, (h, w), dtype=np.uint16)
    blob = encode_png(w, h, v16.astype(">u2").tobytes(), color_type=0,
                      depth=16, row_filters=3)
    _, _, px16 = decode_png(blob)
    assert px16.dtype == np.uint16 and (px16.reshape(h, w) == v16).all()
    img = PngImage()
    img.version = 1
    assert lib.png_image_begin_read_from_memory(
        ctypes.byref(img), blob, len(blob))
    img.format = 4  # PNG_FORMAT_LINEAR_Y
    buf = ctypes.create_string_buffer(w * h * 2)
    assert lib.png_image_finish_read(ctypes.byref(img), None, buf,
                                     0, None)
    ref16 = np.frombuffer(buf.raw, np.uint16).reshape(h, w)
    total += 1
    if not (ref16 == v16).all():
        print("FAIL gray16-linear")
        fails += 1

    print(f"{total} files, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
