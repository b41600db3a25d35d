"""Pluggable NATIVE decoders for the hot media formats — the 100 TB
throughput slot in front of the from-scratch codecs (r14).

The from-scratch decoders (operators/jpeg.py, webp.py+vp8.py,
tiff.py) are conformance oracles: bit-exact (WebP/TIFF) or within the
documented IDCT tolerance (JPEG) against the system reference
libraries. They are also pure Python at ~0.03-0.1 MB/s/core — three
orders of magnitude below libjpeg-turbo/libwebp. At 100 TB a
multimodal corpus spends essentially all its decode CPU here, so
``decode_media``'s per-format dispatch prefers a NATIVE decoder when
one is loadable and falls back to the from-scratch implementation
otherwise; the differential tests (tests/test_native_codecs.py) run
both paths on the same streams and pin the agreement, making the
pure decoders the standing oracle for the plugged path.

Bindings (no third-party Python packages exist in this environment;
everything below uses only the system shared libraries + ctypes):

- **WebP**: ctypes against ``libwebp`` — ``WebPDecodeRGBA`` returns
  exactly the HxWx4 RGBA layout decode_webp produces, and r13's
  conformance work proved the two BIT-IDENTICAL over 196 streams
  (fancy upsampling + VP8Clip8), so the plug is md5-transparent.
- **JPEG**: a ~60-line C shim compiled once against the system
  ``jpeglib.h`` (libjpeg-turbo) and cached by source hash — the
  libjpeg decompress struct layout is version-dependent, so calling
  it through a shim is robust where raw ctypes struct-guessing is
  not. Scope: 8-bit precision, 1- or 3-component output (gray/RGB);
  12-bit, CMYK/YCCK and anything the library rejects falls back to
  the pure decoder. libjpeg's integer ISLOW IDCT differs from the
  pure float IDCT by <= the documented +-3 tolerance
  (tools/jpeg_conformance.py TOL); DC-only (flat) blocks decode
  identically in both.
- **TIFF**: ctypes against ``libtiff`` via ``TIFFClientOpen`` over an
  in-memory cursor (no temp files). Scope: chunky planar config,
  strip organization, 8/16-bit samples, photometric MinIsBlack/RGB,
  any compression libtiff decodes losslessly (none/LZW/PackBits/
  Deflate...) EXCEPT JPEG-in-TIFF (lossy — stays on the pure path so
  sample values keep their pinned meaning). WhiteIsZero/palette/
  tiled/planar-separate fall back (the pure decoder post-processes
  those; keeping one implementation of that logic avoids a second
  subtly-different copy).

Selection order per payload: env ``SPARK_GRAFT_NATIVE_CODECS``
(``auto`` default, ``off``, or a comma list like ``webp,tiff``) ->
per-call override -> library availability -> in-scope check; ANY
native failure (unsupported shape, library error, hostile geometry)
falls back to the from-scratch decoder, which raises its own typed
error if the payload is genuinely bad. Geometry caps mirror the pure
decoders' hostile-header guards (w*h*spp <= 2^29 samples).

Reference parity: the reference repo has no media layer; this is the
SURVEY §7 LLM-pipeline mandate's decode slot, made scale-honest.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import hashlib
import os
import subprocess
import tempfile
from typing import Callable, Optional

import numpy as np

__all__ = [
    "native_formats_active",
    "maybe_decode",
    "decode_webp_native",
    "decode_jpeg_native",
    "decode_tiff_native",
    "NativeUnavailable",
    "NativeUnsupported",
]

MAX_SAMPLES = 1 << 29  # hostile-geometry cap, same as the pure decoders


class NativeUnavailable(RuntimeError):
    """The native library/shim for this format cannot be loaded."""


class NativeUnsupported(RuntimeError):
    """Payload is outside the native plug's bit-exact/robust scope."""


def _policy() -> set[str]:
    v = os.environ.get("SPARK_GRAFT_NATIVE_CODECS", "auto").strip().lower()
    if v in ("off", "0", "none", "never"):
        return set()
    if v in ("auto", "on", "1", ""):
        return {"jpeg", "webp", "tiff"}
    return {f.strip() for f in v.split(",") if f.strip()}


# ---------------------------------------------------------------- WebP

_webp_lib = None
_webp_err: Optional[str] = None


def _load_webp():
    global _webp_lib, _webp_err
    if _webp_lib is not None or _webp_err is not None:
        return _webp_lib
    try:
        lib = ctypes.CDLL(ctypes.util.find_library("webp") or "libwebp.so.7")
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        _webp_lib = lib
    except (OSError, AttributeError) as ex:
        _webp_err = str(ex)
    return _webp_lib


def decode_webp_native(data: bytes) -> tuple[int, int, np.ndarray]:
    """WebP -> (w, h, HxWx4 RGBA uint8) via libwebp — bit-identical
    to operators/webp.decode_webp (r13 conformance corpus)."""
    lib = _load_webp()
    if lib is None:
        raise NativeUnavailable(f"libwebp not loadable: {_webp_err}")
    # Animations must keep raising by name through the pure path (the
    # still-image API would decode only the canvas/first frame). The
    # VP8X feature flags byte (RIFF+12 "VP8X", flags at offset 20,
    # animation bit 0x02) is authoritative — a leading ICCP/EXIF chunk
    # can push the ANIM/ANMF chunks arbitrarily far into the file, so
    # a fixed-prefix substring scan misses them.
    if len(data) >= 21 and data[12:16] == b"VP8X" and data[20] & 0x02:
        raise NativeUnsupported("animated WebP: pure path demuxes")
    w, h = ctypes.c_int(), ctypes.c_int()
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w), ctypes.byref(h)):
        raise NativeUnsupported("WebPGetInfo rejected the header")
    if w.value * h.value * 4 > MAX_SAMPLES:
        raise NativeUnsupported(f"geometry {w.value}x{h.value} over cap")
    buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        raise NativeUnsupported("WebPDecodeRGBA failed")
    try:
        n = w.value * h.value * 4
        px = np.frombuffer(
            ctypes.string_at(buf, n), np.uint8
        ).reshape(h.value, w.value, 4).copy()
    finally:
        lib.WebPFree(buf)
    return w.value, h.value, px


# ---------------------------------------------------------------- JPEG

_JPEG_SHIM_SRC = r"""
#include <stddef.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

typedef struct {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
    char msg[JMSG_LENGTH_MAX];
} shim_err_t;

static void shim_error_exit(j_common_ptr cinfo) {
    shim_err_t *e = (shim_err_t *)cinfo->err;
    (*cinfo->err->format_message)(cinfo, e->msg);
    longjmp(e->jb, 1);
}

static void shim_emit_message(j_common_ptr cinfo, int msg_level) {
    (void)cinfo; (void)msg_level; /* silence warnings */
}

/* 0 = ok (*out malloc'd, w*h*comps bytes); 1 = decode error;
   2 = out of the plug's scope (fallback); 3 = OOM. */
int djpeg_decode(const unsigned char *buf, unsigned long n,
                 unsigned char **out, int *w, int *h, int *comps,
                 char *errmsg, int errcap) {
    struct jpeg_decompress_struct cinfo;
    shim_err_t jerr;
    *out = NULL;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    jerr.pub.emit_message = shim_emit_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        if (*out) { free(*out); *out = NULL; }
        if (errmsg && errcap > 0) {
            strncpy(errmsg, jerr.msg, (size_t)errcap - 1);
            errmsg[errcap - 1] = 0;
        }
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, n);
    jpeg_read_header(&cinfo, TRUE);
    if (cinfo.data_precision != 8)
        { jpeg_destroy_decompress(&cinfo); return 2; }
    cinfo.dct_method = JDCT_ISLOW; /* deterministic reference IDCT */
    /* replication upsampling to mirror the pure decoder (which
       np.repeat's subsampled chroma); fancy (triangular) upsampling
       drifts ~15 counts from it on 4:2:0 streams */
    cinfo.do_fancy_upsampling = FALSE;
    jpeg_calc_output_dimensions(&cinfo);
    if (cinfo.output_components != 1 && cinfo.output_components != 3)
        { jpeg_destroy_decompress(&cinfo); return 2; }
    if ((double)cinfo.output_width * cinfo.output_height
            * cinfo.output_components > 536870912.0 /* 1<<29 */)
        { jpeg_destroy_decompress(&cinfo); return 2; }
    jpeg_start_decompress(&cinfo);
    {
        size_t stride = (size_t)cinfo.output_width
                        * cinfo.output_components;
        unsigned char *data = malloc(stride * cinfo.output_height);
        if (!data) { jpeg_destroy_decompress(&cinfo); return 3; }
        *out = data;
        *w = (int)cinfo.output_width;
        *h = (int)cinfo.output_height;
        *comps = cinfo.output_components;
        while (cinfo.output_scanline < cinfo.output_height) {
            JSAMPROW row = data + (size_t)cinfo.output_scanline * stride;
            jpeg_read_scanlines(&cinfo, &row, 1);
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

void djpeg_free(unsigned char *p) { free(p); }
"""

_jpeg_lib = None
_jpeg_err: Optional[str] = None


def _shim_cache_dir() -> str:
    d = os.environ.get("SPARK_GRAFT_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "dolphinbeat_spark", "native")
    os.makedirs(d, exist_ok=True)
    return d


def _build_jpeg_shim() -> str:
    """Compile the libjpeg shim once, keyed by source hash; concurrent
    workers race benignly via an atomic rename."""
    tag = hashlib.sha256(_JPEG_SHIM_SRC.encode()).hexdigest()[:16]
    so = os.path.join(_shim_cache_dir(), f"djpeg_shim_{tag}.so")
    if os.path.exists(so):
        return so
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "djpeg_shim.c")
        with open(src, "w") as f:
            f.write(_JPEG_SHIM_SRC)
        tmp_so = os.path.join(td, "djpeg_shim.so")
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", src, "-o", tmp_so, "-ljpeg"],
            check=True, capture_output=True, timeout=120)
        final_tmp = so + f".tmp.{os.getpid()}"
        with open(tmp_so, "rb") as f:
            blob = f.read()
        with open(final_tmp, "wb") as f:
            f.write(blob)
        os.replace(final_tmp, so)  # atomic: last writer wins, same bytes
    return so


def _load_jpeg():
    global _jpeg_lib, _jpeg_err
    if _jpeg_lib is not None or _jpeg_err is not None:
        return _jpeg_lib
    try:
        lib = ctypes.CDLL(_build_jpeg_shim())
        lib.djpeg_decode.restype = ctypes.c_int
        lib.djpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.djpeg_free.restype = None
        lib.djpeg_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _jpeg_lib = lib
    except (OSError, subprocess.SubprocessError, FileNotFoundError) as ex:
        _jpeg_err = str(ex)
    return _jpeg_lib


def decode_jpeg_native(data: bytes) -> tuple[int, int, np.ndarray]:
    """JPEG -> (w, h, HxWxC uint8; C=1 gray / 3 RGB) via the
    libjpeg-turbo shim. Values agree with operators/jpeg.decode_jpeg
    within the +-3 IDCT tolerance (exact on DC-only blocks)."""
    lib = _load_jpeg()
    if lib is None:
        raise NativeUnavailable(f"libjpeg shim not buildable: {_jpeg_err}")
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    comps = ctypes.c_int()
    msg = ctypes.create_string_buffer(256)
    rc = lib.djpeg_decode(data, len(data), ctypes.byref(out),
                          ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(comps), msg, len(msg))
    if rc == 2:
        raise NativeUnsupported("12-bit/CMYK/oversize: pure path decodes")
    if rc != 0 or not out:
        if out:
            lib.djpeg_free(out)
        raise NativeUnsupported(
            f"libjpeg rejected the stream: {msg.value.decode(errors='replace')}")
    try:
        n = w.value * h.value * comps.value
        px = np.frombuffer(
            ctypes.string_at(out, n), np.uint8
        ).reshape(h.value, w.value, comps.value).copy()
    finally:
        lib.djpeg_free(out)
    return w.value, h.value, px


# ---------------------------------------------------------------- TIFF

_tiff_lib = None
_tiff_err: Optional[str] = None
# The CFUNCTYPE callback objects must outlive every TIFFClientOpen
# call that uses them — keep them module-level.
_TIFF_READ = ctypes.CFUNCTYPE(
    ctypes.c_ssize_t, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_ssize_t)
_TIFF_WRITE = _TIFF_READ
_TIFF_SEEK = ctypes.CFUNCTYPE(
    ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int)
_TIFF_CLOSE = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)
_TIFF_SIZE = ctypes.CFUNCTYPE(ctypes.c_uint64, ctypes.c_void_p)
_TIFF_MAP = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64))
_TIFF_UNMAP = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64)
_TIFF_ERRHANDLER = ctypes.CFUNCTYPE(
    None, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p)


def _load_tiff():
    global _tiff_lib, _tiff_err
    if _tiff_lib is not None or _tiff_err is not None:
        return _tiff_lib
    try:
        lib = ctypes.CDLL(ctypes.util.find_library("tiff") or "libtiff.so.6")
        lib.TIFFClientOpen.restype = ctypes.c_void_p
        lib.TIFFClientOpen.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p,
            _TIFF_READ, _TIFF_WRITE, _TIFF_SEEK, _TIFF_CLOSE,
            _TIFF_SIZE, _TIFF_MAP, _TIFF_UNMAP,
        ]
        lib.TIFFClose.restype = None
        lib.TIFFClose.argtypes = [ctypes.c_void_p]
        lib.TIFFIsTiled.restype = ctypes.c_int
        lib.TIFFIsTiled.argtypes = [ctypes.c_void_p]
        lib.TIFFNumberOfStrips.restype = ctypes.c_uint32
        lib.TIFFNumberOfStrips.argtypes = [ctypes.c_void_p]
        lib.TIFFStripSize.restype = ctypes.c_ssize_t
        lib.TIFFStripSize.argtypes = [ctypes.c_void_p]
        lib.TIFFReadEncodedStrip.restype = ctypes.c_ssize_t
        lib.TIFFReadEncodedStrip.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_ssize_t]
        # TIFFGetField(Defaulted) is varargs: declare only the fixed
        # prefix; out-pointers go through byref with exact C types.
        lib.TIFFGetFieldDefaulted.restype = ctypes.c_int
        lib.TIFFSetErrorHandler.restype = _TIFF_ERRHANDLER
        lib.TIFFSetWarningHandler.restype = _TIFF_ERRHANDLER
        quiet = _TIFF_ERRHANDLER(lambda mod, fmt, args: None)
        lib.TIFFSetErrorHandler(quiet)
        lib.TIFFSetWarningHandler(quiet)
        lib._quiet_handler_keepalive = quiet
        _tiff_lib = lib
    except (OSError, AttributeError) as ex:
        _tiff_err = str(ex)
    return _tiff_lib


class _MemCursor:
    """In-memory libtiff client: read-only cursor over the payload."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.read_cb = _TIFF_READ(self._read)
        self.write_cb = _TIFF_WRITE(lambda h, b, n: 0)
        self.seek_cb = _TIFF_SEEK(self._seek)
        self.close_cb = _TIFF_CLOSE(lambda h: 0)
        self.size_cb = _TIFF_SIZE(lambda h: len(self.data))
        self.map_cb = _TIFF_MAP(lambda h, pp, np_: 0)
        self.unmap_cb = _TIFF_UNMAP(lambda h, p, n: None)

    def _read(self, handle, buf, n):
        chunk = self.data[self.pos:self.pos + n]
        ctypes.memmove(buf, chunk, len(chunk))
        self.pos += len(chunk)
        return len(chunk)

    def _seek(self, handle, off, whence):
        if whence == 0:
            self.pos = off
        elif whence == 1:
            self.pos += off
        else:
            self.pos = len(self.data) + off
        return self.pos


def _tiff_tag_u32(lib, tif, tag: int) -> Optional[int]:
    v = ctypes.c_uint32(0)
    if lib.TIFFGetFieldDefaulted(
            ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.byref(v)):
        return v.value
    return None


def _tiff_tag_u16(lib, tif, tag: int) -> Optional[int]:
    v = ctypes.c_uint16(0)
    if lib.TIFFGetFieldDefaulted(
            ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.byref(v)):
        return v.value
    return None


def decode_tiff_native(data: bytes) -> tuple[int, int, np.ndarray]:
    """TIFF -> (w, h, HxWxC uint8/uint16) via libtiff, restricted to
    the bit-exact scope (module docstring); everything else raises
    NativeUnsupported so the pure decoder keeps owning it."""
    lib = _load_tiff()
    if lib is None:
        raise NativeUnavailable(f"libtiff not loadable: {_tiff_err}")
    cur = _MemCursor(data)
    tif = lib.TIFFClientOpen(
        b"mem", b"rm", None, cur.read_cb, cur.write_cb, cur.seek_cb,
        cur.close_cb, cur.size_cb, cur.map_cb, cur.unmap_cb)
    if not tif:
        raise NativeUnsupported("TIFFClientOpen rejected the header")
    try:
        if lib.TIFFIsTiled(tif):
            raise NativeUnsupported("tiled TIFF: pure path decodes")
        w = _tiff_tag_u32(lib, tif, 256)
        h = _tiff_tag_u32(lib, tif, 257)
        spp = _tiff_tag_u16(lib, tif, 277) or 1
        bps = _tiff_tag_u16(lib, tif, 258) or 1
        comp = _tiff_tag_u16(lib, tif, 259) or 1
        photo = _tiff_tag_u16(lib, tif, 262)
        planar = _tiff_tag_u16(lib, tif, 284) or 1
        sample_format = _tiff_tag_u16(lib, tif, 339) or 1
        if not w or not h:
            raise NativeUnsupported("TIFF missing geometry tags")
        if (planar != 1 or bps not in (8, 16) or photo not in (1, 2)
                or sample_format != 1
                or comp in (2, 3, 4, 6, 7, 34892)):  # CCITT/JPEG: lossy or
            # post-processed photometrics live on the pure path
            raise NativeUnsupported(
                f"TIFF shape (photo={photo}, bps={bps}, comp={comp}, "
                f"planar={planar}) outside the native bit-exact scope")
        if w * h * spp > MAX_SAMPLES:
            raise NativeUnsupported(f"geometry {w}x{h}x{spp} over cap")
        n_strips = lib.TIFFNumberOfStrips(tif)
        strip_cap = lib.TIFFStripSize(tif)
        if strip_cap <= 0 or n_strips <= 0:
            raise NativeUnsupported("TIFF strip layout unreadable")
        unit = bps // 8
        total = w * h * spp * unit
        raster = bytearray(total)
        view = (ctypes.c_char * total).from_buffer(raster)
        got = 0
        for s in range(n_strips):
            want = min(strip_cap, total - got)
            if want <= 0:
                break
            rc = lib.TIFFReadEncodedStrip(
                tif, s, ctypes.byref(view, got), want)
            if rc < 0:
                raise NativeUnsupported(f"TIFFReadEncodedStrip failed @{s}")
            got += rc
        if got != total:
            raise NativeUnsupported(
                f"TIFF strips yielded {got} of {total} bytes")
    finally:
        lib.TIFFClose(tif)
    dtype = np.uint8 if unit == 1 else np.uint16  # libtiff swabs to host
    # shape matches operators/tiff.decode_tiff: HxWxC even for C=1
    px = np.frombuffer(bytes(raster), dtype).reshape(h, w, spp)
    return w, h, px


# ------------------------------------------------------------- dispatch

_DECODERS: dict[str, Callable[[bytes], tuple[int, int, np.ndarray]]] = {
    "webp": decode_webp_native,
    "jpeg": decode_jpeg_native,
    "tiff": decode_tiff_native,
}


def native_formats_active() -> dict[str, bool]:
    """Which formats would take the native path right now (policy AND
    loadability) — surfaced in BENCH codec_throughput."""
    pol = _policy()
    out = {}
    for fmt in ("jpeg", "webp", "tiff"):
        ok = fmt in pol
        if ok:
            ok = {"jpeg": _load_jpeg, "webp": _load_webp,
                  "tiff": _load_tiff}[fmt]() is not None
        out[fmt] = bool(ok)
    return out


def maybe_decode(
    fmt: str, data: bytes, native: Optional[bool] = None,
) -> Optional[tuple[int, int, np.ndarray]]:
    """Try the native decoder for ``fmt``; None means 'fall back to
    the from-scratch decoder' (policy off, library missing, or the
    payload is outside the plug's scope)."""
    if native is False or (native is None and fmt not in _policy()):
        return None
    dec = _DECODERS.get(fmt)
    if dec is None:
        return None
    try:
        return dec(data)
    except (NativeUnavailable, NativeUnsupported):
        return None
