#!/usr/bin/env python3
"""GIF LZW conformance harness against the system giflib: the repo's
encoder writes index streams whose LZW code-width bookkeeping must be
readable by DGifSlurp byte-for-byte, and giflib-authored files
(EGifSpew) must decode identically through the repo's decoder — a
third implementation in the loop so mirrored encoder/decoder LZW
bugs (code-width growth timing, KwKwK, table freeze at 4096) cannot
hide. Run: python tools/gif_conformance.py
"""

from __future__ import annotations

import ctypes
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")
from dolphinbeat_spark.operators.multimodal import (  # noqa: E402
    decode_gif,
    encode_gif,
)


class GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_uint8), ("Green", ctypes.c_uint8),
                ("Blue", ctypes.c_uint8)]


class ColorMapObject(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int),
                ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_bool),
                ("Colors", ctypes.POINTER(GifColorType))]


class GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", ctypes.c_int), ("Top", ctypes.c_int),
                ("Width", ctypes.c_int), ("Height", ctypes.c_int),
                ("Interlace", ctypes.c_bool),
                ("ColorMap", ctypes.POINTER(ColorMapObject))]


class SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_uint8)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p)]


class GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
                ("SColorResolution", ctypes.c_int),
                ("SBackGroundColor", ctypes.c_int),
                ("AspectByte", ctypes.c_uint8),
                ("SColorMap", ctypes.POINTER(ColorMapObject)),
                ("ImageCount", ctypes.c_int),
                ("Image", GifImageDesc),
                ("SavedImages", ctypes.POINTER(SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


def _lib():
    lib = ctypes.CDLL("libgif.so.7")
    lib.DGifOpenFileName.restype = ctypes.POINTER(GifFileType)
    lib.DGifOpenFileName.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int)]
    lib.DGifSlurp.restype = ctypes.c_int
    lib.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]
    lib.DGifCloseFile.argtypes = [ctypes.POINTER(GifFileType),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.EGifOpenFileName.restype = ctypes.POINTER(GifFileType)
    lib.EGifOpenFileName.argtypes = [ctypes.c_char_p, ctypes.c_bool,
                                     ctypes.POINTER(ctypes.c_int)]
    lib.EGifSpew.restype = ctypes.c_int
    lib.EGifSpew.argtypes = [ctypes.POINTER(GifFileType)]
    lib.GifMakeMapObject.restype = ctypes.POINTER(ColorMapObject)
    lib.GifMakeMapObject.argtypes = [ctypes.c_int,
                                     ctypes.POINTER(GifColorType)]
    lib.GifMakeSavedImage.restype = ctypes.POINTER(SavedImage)
    lib.GifMakeSavedImage.argtypes = [ctypes.POINTER(GifFileType),
                                      ctypes.POINTER(SavedImage)]
    return lib


def giflib_indices(lib, blob: bytes):
    """Decode with giflib -> (w, h, index array) of frame 0."""
    with tempfile.NamedTemporaryFile(suffix=".gif", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        err = ctypes.c_int()
        g = lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
        if not g:
            return None
        if lib.DGifSlurp(g) != 1:
            lib.DGifCloseFile(g, ctypes.byref(err))
            return None
        gf = g.contents
        im = gf.SavedImages[0]
        w, h = im.ImageDesc.Width, im.ImageDesc.Height
        idx = np.frombuffer(
            ctypes.string_at(im.RasterBits, w * h), np.uint8
        ).reshape(h, w).copy()
        lib.DGifCloseFile(g, ctypes.byref(err))
        return w, h, idx
    finally:
        os.unlink(path)


def giflib_encode(lib, w: int, h: int, idx: np.ndarray) -> bytes:
    """Author a grayscale GIF with giflib (EGifSpew)."""
    with tempfile.NamedTemporaryFile(suffix=".gif", delete=False) as f:
        path = f.name
    try:
        err = ctypes.c_int()
        g = lib.EGifOpenFileName(path.encode(), False, ctypes.byref(err))
        assert g, "EGifOpenFileName failed"
        colors = (GifColorType * 256)(
            *[GifColorType(i, i, i) for i in range(256)])
        cmap = lib.GifMakeMapObject(256, colors)
        gf = g.contents
        gf.SWidth, gf.SHeight = w, h
        gf.SColorResolution = 8
        gf.SBackGroundColor = 0
        gf.SColorMap = cmap
        im = SavedImage()
        im.ImageDesc.Left = im.ImageDesc.Top = 0
        im.ImageDesc.Width, im.ImageDesc.Height = w, h
        im.ImageDesc.Interlace = False
        im.ImageDesc.ColorMap = None
        raster = (ctypes.c_uint8 * (w * h))(*idx.reshape(-1).tolist())
        im.RasterBits = ctypes.cast(raster,
                                    ctypes.POINTER(ctypes.c_uint8))
        im.ExtensionBlockCount = 0
        im.ExtensionBlocks = None
        lib.GifMakeSavedImage(g, ctypes.byref(im))
        assert lib.EGifSpew(g) == 1, "EGifSpew failed"
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def main() -> None:
    lib = _lib()
    rng = np.random.RandomState(3)
    fails = total = 0
    shapes = [(8, 8), (21, 13), (64, 48), (1, 1), (200, 3)]
    for kind in ("noise", "runs", "ramp"):
        for w, h in shapes:
            if kind == "noise":
                idx = rng.randint(0, 256, (h, w), dtype=np.uint8)
            elif kind == "runs":
                idx = np.repeat(
                    rng.randint(0, 256, (h, w // 7 + 1),
                                dtype=np.uint8), 7, axis=1)[:, :w]
            else:
                idx = (np.arange(w * h, dtype=np.int64) % 256) \
                    .astype(np.uint8).reshape(h, w)
            # direction 1: our encoder -> giflib decoder
            total += 1
            blob = encode_gif(w, h, idx.tobytes())
            got = giflib_indices(lib, blob)
            if got is None or not (got[2] == idx).all():
                print(f"FAIL enc {kind} {w}x{h}: giflib "
                      f"{'refused' if got is None else 'mismatch'}")
                fails += 1
            # direction 2: giflib encoder -> our decoder
            total += 1
            gblob = giflib_encode(lib, w, h, idx)
            dw, dh, px = decode_gif(gblob)
            want = idx[:, :, None].repeat(3, axis=2)  # grayscale map
            if (dw, dh) != (w, h) or not (px == want).all():
                print(f"FAIL dec {kind} {w}x{h}: our decode mismatch")
                fails += 1
    print(f"{total} cases, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
