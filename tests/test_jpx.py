"""JPEG 2000 reversible Part-1 decode (operators/jpx.py) — DWT
perfect reconstruction, Tier-1 roundtrips, codestream geometry/
progression matrix, PDF /JPXDecode integration, named boundaries,
hostile fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from dolphinbeat_spark.operators import jpx as J


def test_dwt53_perfect_reconstruction():
    """Forward/inverse 5/3 lifting must be the identity over every
    geometry parity (the inverse is also checked against the direct
    T.800 F.3.8.2 formulas on a hand case)."""
    rng = np.random.RandomState(1)
    for h, w in [(1, 1), (1, 7), (7, 1), (8, 8), (9, 13), (16, 5),
                 (31, 33), (2, 2), (3, 2)]:
        img = rng.randint(-4000, 4000, (h, w)).astype(np.int64)
        back = J._idwt53_2d(*J._fdwt53_2d(img))
        assert np.array_equal(back, img), (h, w)
    # hand case: constant input -> low band carries it, highs zero
    const = np.full((6, 6), 37, np.int64)
    ll, hl, lh, hh = J._fdwt53_2d(const)
    assert (hl == 0).all() and (lh == 0).all() and (hh == 0).all()
    assert (ll == 37).all()


def test_tier1_roundtrip_all_bands():
    rng = np.random.RandomState(2)
    for band in ("LL", "HL", "LH", "HH"):
        for h, w in [(4, 4), (5, 9), (16, 16), (3, 3), (13, 6),
                     (1, 1), (2, 17)]:
            coefs = rng.randint(-300, 300, (h, w)).astype(np.int64)
            coefs[rng.rand(h, w) < 0.6] = 0
            data, numbps, npasses = J._t1_encode(coefs, band, False)
            if numbps == 0:
                assert not coefs.any()
                continue
            got = J._t1_decode(data, h, w, band, numbps, npasses,
                               False)
            assert np.array_equal(got, coefs), (band, h, w)


def test_jpx_codestream_matrix():
    """Every progression order x MCT x wrapper x marker option
    round-trips bit-exactly (reversible path == lossless)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (37, 45, 3), dtype=np.uint8)
    for prog in range(5):
        cs = J.encode_jpx(img, levels=2, mct=prog % 2 == 0,
                          progression=prog)
        w, h, px = J.decode_jpx(cs)
        assert (w, h) == (45, 37) and np.array_equal(px, img), prog
    gray = rng.randint(0, 256, (20, 31), dtype=np.uint8)
    cs = J.encode_jpx(gray, levels=3, sop=True, eph=True, segsym=True)
    assert np.array_equal(J.decode_jpx(cs)[2][:, :, 0], gray)
    cs = J.encode_jpx(img, levels=1, cblk_exp=(4, 4), jp2=True)
    assert np.array_equal(J.decode_jpx(cs)[2], img)
    g16 = rng.randint(0, 65536, (9, 9), dtype=np.uint16)
    px = J.decode_jpx(J.encode_jpx(g16, levels=2))[2]
    assert px.dtype == np.uint16 and np.array_equal(px[:, :, 0], g16)
    # levels=0 (no transform) and deep levels
    for lv in (0, 4):
        cs = J.encode_jpx(img, levels=lv, mct=True)
        assert np.array_equal(J.decode_jpx(cs)[2], img), lv


def test_jpx_named_boundaries():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    cs = bytearray(J.encode_jpx(img, levels=1))
    # irreversible 9/7: COD transformation byte flips to 0
    cod_at = bytes(cs).find(b"\xff\x52")
    bad = bytearray(cs)
    bad[cod_at + 4 + 9] = 0  # SPcod transformation
    with pytest.raises(NotImplementedError, match="9/7"):
        J.decode_jpx(bytes(bad))
    # quantized QCD style
    qcd_at = bytes(cs).find(b"\xff\x5c")
    bad = bytearray(cs)
    bad[qcd_at + 4] |= 2
    with pytest.raises(NotImplementedError, match="quantized"):
        J.decode_jpx(bytes(bad))
    # bypass code-block style
    bad = bytearray(cs)
    bad[cod_at + 4 + 8] |= 1
    with pytest.raises(NotImplementedError, match="bypass"):
        J.decode_jpx(bytes(bad))
    with pytest.raises(J.JpxError, match="SOC"):
        J.decode_jpx(b"\x00" * 16)


def test_jpx_hostile_fuzz():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    good = J.encode_jpx(img, levels=2, mct=True, jp2=True)
    for _ in range(250):
        b = bytearray(good)
        b[int(rng.randint(0, len(b)))] ^= 1 << int(rng.randint(0, 8))
        try:
            w, h, px = J.decode_jpx(bytes(b), max_pixels=1 << 16)
            assert px.size <= (1 << 16) * 4
        except (J.JpxError, NotImplementedError):
            pass
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"untyped crash on corrupted JPX: {ex!r}")


def test_pdf_jpxdecode_integration():
    from dolphinbeat_spark.operators.pdf import (
        PdfError, encode_pdf, extract_pdf_images,
    )

    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    for jp2 in (False, True):
        cs = J.encode_jpx(img, levels=2, mct=True, jp2=jp2)
        pdf = encode_pdf([["jpx"]], images=[[("jpx", 24, 16, 3, cs)]],
                         xref_stream=jp2)
        (im,) = extract_pdf_images(pdf)
        assert (im.width, im.height, im.n_components,
                im.img_filter) == (24, 16, 3, "JPXDecode")
        assert bytes(im.pixels) == img.tobytes()
    # geometry mismatch between the dictionary and the codestream
    cs = J.encode_jpx(img, levels=1)
    pdf = encode_pdf([["x"]], images=[[("jpx", 99, 16, 3, cs)]])
    with pytest.raises(PdfError, match="dictionary"):
        extract_pdf_images(pdf)


def test_jpx_pdf_spark(spark):
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    rng = np.random.RandomState(7)
    rows = []
    want = {}
    for k in range(4):
        img = rng.randint(0, 256, (8, 12), dtype=np.uint8)
        cs = J.encode_jpx(img, levels=1, jp2=bool(k % 2))
        rows.append((k, bytearray(encode_pdf(
            [["p"]], images=[[("jpx", 12, 8, 1, cs)]]))))
        want[k] = img.tobytes()
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    for r in pdf_images(df).collect():
        assert bytes(r.pixels) == want[r.media_id]
        assert r.img_filter == "JPXDecode"
