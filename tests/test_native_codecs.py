"""Differential tests for the native decode plugs (r14): the
from-scratch codecs are the standing oracle for the
libjpeg/libwebp/libtiff paths that decode_media prefers at scale.

Every test runs BOTH paths on the same streams and pins agreement:
bit-exact for WebP and in-scope TIFF, the documented +-3 IDCT
tolerance for JPEG (exact on DC-only blocks). Scope exits (tiled
TIFF, 12-bit JPEG, animations) are pinned to fall back rather than
silently mis-decode. Skips cleanly when the system libraries are
absent — the from-scratch decoders then own every payload.
"""

from __future__ import annotations

import numpy as np
import pytest

from dolphinbeat_spark.operators import native_codecs as NC

pytestmark = [
    pytest.mark.skipif(
        not any(NC.native_formats_active().values()),
        reason="no native codec libraries loadable in this environment"),
]


def _rand_rgb(rng, h, w):
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------------ JPEG

def test_jpeg_native_differential_within_idct_tolerance():
    from dolphinbeat_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    if not NC.native_formats_active()["jpeg"]:
        pytest.skip("libjpeg shim not buildable")
    rng = np.random.RandomState(14)
    cases = []
    for h, w in [(8, 8), (17, 23), (64, 64)]:
        img = _rand_rgb(rng, h, w)
        cases.append(encode_jpeg(w, h, img.tobytes()))
        cases.append(encode_jpeg(w, h, img.tobytes(), subsample="420"))
        cases.append(encode_jpeg_progressive(w, h, img.tobytes()))
        gray = rng.randint(0, 256, (h, w), dtype=np.uint8)
        cases.append(encode_jpeg(w, h, gray.tobytes(), gray=True))
    cases.append(encode_jpeg(48, 32, _rand_rgb(rng, 32, 48).tobytes(),
                             restart_interval=4))
    for data in cases:
        wn, hn, pn = NC.decode_jpeg_native(data)
        wp, hp, pp = decode_jpeg(data)
        assert (wn, hn) == (wp, hp)
        assert pn.shape == pp.shape
        d = np.abs(pn.astype(int) - pp.astype(int)).max()
        assert d <= 3, f"IDCT differential {d} exceeds tolerance"


def test_jpeg_native_exact_on_dc_only_blocks():
    """Solid-color images are DC-only: any correct IDCT reproduces
    them exactly — this is what keeps the md5-pinned oracle specs
    green with the native plug active."""
    from dolphinbeat_spark.operators.jpeg import decode_jpeg, encode_jpeg

    if not NC.native_formats_active()["jpeg"]:
        pytest.skip("libjpeg shim not buildable")
    for v in (0, 77, 128, 255):
        img = np.full((24, 40, 3), v, np.uint8)
        data = encode_jpeg(40, 24, img.tobytes())
        _, _, pn = NC.decode_jpeg_native(data)
        _, _, pp = decode_jpeg(data)
        assert np.array_equal(pn, pp)


def test_jpeg_native_fallback_paths():
    from dolphinbeat_spark.operators.jpeg import JpegError, encode_jpeg
    from dolphinbeat_spark.operators.multimodal import sniff_decode_image

    if not NC.native_formats_active()["jpeg"]:
        pytest.skip("libjpeg shim not buildable")
    # 12-bit precision is out of the shim's scope -> fallback (None)
    img12 = (np.arange(64, dtype=np.uint16) * 64 % 4096).reshape(8, 8)
    data12 = encode_jpeg(8, 8, img12.astype("<u2").tobytes(),
                         gray=True, precision=12)
    assert NC.maybe_decode("jpeg", data12) is None
    # sniff still decodes it through the pure path
    fmt, w, h, px = sniff_decode_image(data12)
    assert (fmt, w, h) == ("jpeg", 8, 8)
    # truncated garbage: native refuses, pure raises its TYPED error
    with pytest.raises(JpegError):
        sniff_decode_image(b"\xff\xd8\xff\xdb" + bytes(10))


# ------------------------------------------------------------------ WebP

def test_webp_native_bit_exact_lossy_and_lossless():
    import ctypes

    from dolphinbeat_spark.operators.webp import (
        decode_webp, encode_webp_lossless,
    )

    if not NC.native_formats_active()["webp"]:
        pytest.skip("libwebp not loadable")
    rng = np.random.RandomState(7)
    streams = []
    lib = ctypes.CDLL("libwebp.so.7")
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    for h, w in [(16, 16), (37, 53)]:
        img = _rand_rgb(rng, h, w)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeRGB(img.tobytes(), w, h, w * 3, 75.0,
                              ctypes.byref(out))
        assert n > 0
        streams.append(ctypes.string_at(out, n))
        lib.WebPFree(out)
        rgba = rng.randint(0, 256, (h, w, 4), dtype=np.uint8)
        streams.append(encode_webp_lossless(rgba))
    for data in streams:
        wn, hn, pn = NC.decode_webp_native(data)
        wp, hp, pp = decode_webp(data)
        assert (wn, hn) == (wp, hp)
        assert np.array_equal(pn, pp), "webp paths must be bit-identical"


def test_webp_vp8l_streams_accepted_by_libwebp():
    """r14 regression pin: the fixture encoder's flat prefix codes
    were Kraft-incomplete for non-power-of-two alphabets — every
    green/distance code — so libwebp rejected EVERY stream while the
    lax pure decoder round-tripped them. Both sides are fixed; this
    test keeps the encoder spec-complete via the native decode."""
    from dolphinbeat_spark.operators.webp import encode_webp_lossless

    if not NC.native_formats_active()["webp"]:
        pytest.skip("libwebp not loadable")
    rng = np.random.RandomState(3)
    rgba = rng.randint(0, 256, (13, 11, 4), dtype=np.uint8)
    for kw in ({}, {"use_cache_bits": 4}, {"lz77_min": 3},
               {"subtract_green": True}, {"predictor": (1, 2)},
               {"color": (10, 20, 30, 2)}):
        data = encode_webp_lossless(rgba, **kw)
        wn, hn, pn = NC.decode_webp_native(data)  # raises if rejected
        assert (wn, hn) == (11, 13)
        assert np.array_equal(pn, rgba)


def test_webp_incomplete_prefix_code_rejected_by_pure_decoder():
    """The pure decoder now matches libwebp's strictness: a normal
    prefix code whose Kraft sum is < 1 is a typed error."""
    from dolphinbeat_spark.operators import webp as W

    lengths = [9] * 280  # 280 < 2^9: incomplete
    with pytest.raises(W.WebpError, match="incomplete prefix code"):
        W._Prefix(lengths)
    W._Prefix([8] * 256)  # exactly complete: fine
    W._Prefix([0] * 10 + [1])  # single-symbol: fine


def test_webp_native_animation_falls_back_by_name():
    from dolphinbeat_spark.operators.webp import encode_webp_anim

    if not NC.native_formats_active()["webp"]:
        pytest.skip("libwebp not loadable")
    rgba = np.full((8, 8, 4), 9, np.uint8)
    anim = encode_webp_anim(
        [{"rgba": rgba, "x": 0, "y": 0, "duration": 10}], (8, 8))
    assert NC.maybe_decode("webp", anim) is None
    # a big leading ICCP chunk pushes ANIM/ANMF far past any fixed
    # prefix window — detection must key on the VP8X animation flag
    # (offset 20 bit 0x02), not a substring scan (r15 ADVICE)
    import struct

    iccp = b"ICCP" + struct.pack("<I", 256) + b"\x00" * 256
    riff_len = int.from_bytes(anim[4:8], "little") + len(iccp)
    spread = (anim[:4] + struct.pack("<I", riff_len) + anim[8:30]
              + iccp + anim[30:])
    assert spread[12:16] == b"VP8X" and spread[20] & 0x02
    assert b"ANIM" not in spread[:64]
    assert NC.maybe_decode("webp", spread) is None


# ------------------------------------------------------------------ TIFF

def test_tiff_native_bit_exact_matrix():
    from dolphinbeat_spark.operators.tiff import decode_tiff, encode_tiff

    if not NC.native_formats_active()["tiff"]:
        pytest.skip("libtiff not loadable")
    rng = np.random.RandomState(5)
    cases = []
    for comp in (1, 5, 32773):
        for spp in (1, 3):
            img = rng.randint(0, 256, (21, 17, spp), dtype=np.uint8)
            pred = 2 if comp == 5 else 1
            for bo in ("<", ">"):
                cases.append((img, encode_tiff(
                    17, 21, img.tobytes(), spp=spp, compression=comp,
                    predictor=pred, byte_order=bo, rows_per_strip=5)))
    img16 = rng.randint(0, 65536, (9, 13, 1), dtype=np.uint16)
    for bo in ("<", ">"):
        cases.append((img16, encode_tiff(
            13, 9, img16.astype(bo + "u2").tobytes(), spp=1, depth=16,
            compression=1, byte_order=bo)))
    for img, data in cases:
        wn, hn, pn = NC.decode_tiff_native(data)
        wp, hp, pp = decode_tiff(data)
        assert (wn, hn) == (wp, hp)
        assert pn.dtype == pp.dtype
        assert np.array_equal(pn, pp), "tiff paths must be bit-identical"
        assert np.array_equal(pp.reshape(img.shape), img)


def test_tiff_native_scope_exits_fall_back():
    from dolphinbeat_spark.operators.multimodal import sniff_decode_image
    from dolphinbeat_spark.operators.tiff import encode_tiff

    if not NC.native_formats_active()["tiff"]:
        pytest.skip("libtiff not loadable")
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (32, 32, 1), dtype=np.uint8)
    # tiled organization: native refuses, sniff still decodes (pure)
    tiled = encode_tiff(32, 32, img.tobytes(), spp=1, tile=(16, 16))
    assert NC.maybe_decode("tiff", tiled) is None
    fmt, w, h, px = sniff_decode_image(tiled)
    assert (fmt, w, h) == ("tiff", 32, 32)
    assert np.array_equal(px.reshape(img.shape), img)
    # WhiteIsZero photometric inverts in the pure decoder -> fallback
    w0 = encode_tiff(32, 32, img.tobytes(), spp=1, photometric=0)
    assert NC.maybe_decode("tiff", w0) is None
    # planar=2 (separate planes) -> fallback
    rgb = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    sep = encode_tiff(8, 8, rgb.tobytes(), spp=3, planar=2)
    assert NC.maybe_decode("tiff", sep) is None


# ---------------------------------------------------------------- policy

def test_native_policy_env_kill_switch(monkeypatch):
    from dolphinbeat_spark.operators.jpeg import encode_jpeg

    img = np.full((8, 8, 3), 50, np.uint8)
    data = encode_jpeg(8, 8, img.tobytes())
    monkeypatch.setenv("SPARK_GRAFT_NATIVE_CODECS", "off")
    assert NC.maybe_decode("jpeg", data) is None
    assert NC.native_formats_active() == {
        "jpeg": False, "webp": False, "tiff": False}
    monkeypatch.setenv("SPARK_GRAFT_NATIVE_CODECS", "webp")
    assert NC.maybe_decode("jpeg", data) is None
    monkeypatch.delenv("SPARK_GRAFT_NATIVE_CODECS")
    # per-call override beats the default-auto policy
    assert NC.maybe_decode("jpeg", data, native=False) is None
