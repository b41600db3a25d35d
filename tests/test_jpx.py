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
            segs, numbps = J._t1_encode(coefs, band, 0)
            if numbps == 0:
                assert not coefs.any()
                continue
            got = J._t1_decode(segs, h, w, band, numbps, 0)
            assert np.array_equal(got, coefs), (band, h, w)


def test_tier1_roundtrip_all_cblk_styles():
    """Every A.6.1 style combination round-trips at the T1 layer,
    and every style decodes to the SAME coefficients as style 0 —
    a cross-path differential (the raw, reset and causal branches
    share no coder state with the plain MQ path, so a bug in any
    of them shows as a mismatch against the plain decode)."""
    rng = np.random.RandomState(7)
    styles = [0x01, 0x02, 0x04, 0x08, 0x01 | 0x04, 0x01 | 0x02,
              0x01 | 0x08, 0x02 | 0x04 | 0x08,
              0x01 | 0x02 | 0x04 | 0x08 | 0x20]
    for band in ("LL", "HH"):
        for h, w in [(8, 8), (13, 6), (16, 16), (3, 11)]:
            # deep bit-planes so bypass actually produces raw passes
            # (raw coding starts at the 5th most significant plane)
            coefs = rng.randint(-4000, 4000, (h, w)).astype(np.int64)
            coefs[rng.rand(h, w) < 0.5] = 0
            base_segs, numbps = J._t1_encode(coefs, band, 0)
            assert numbps >= 5, "fixture must reach the bypass planes"
            base = J._t1_decode(base_segs, h, w, band, numbps, 0)
            assert np.array_equal(base, coefs)
            for sty in styles:
                segs, nb = J._t1_encode(coefs, band, sty)
                assert nb == numbps
                if sty & 0x01:
                    assert len(segs) > 1, "bypass must split segments"
                got = J._t1_decode(segs, h, w, band, nb, sty)
                assert np.array_equal(got, coefs), (band, h, w, sty)


def test_raw_bitio_stuffing_pins():
    """D.6 raw segment bit packing pinned byte-for-byte: an 0xFF
    byte leaves only 7 slots in its successor (stuffed MSB 0)."""
    enc = J._RawEncoder()
    for _ in range(8):
        enc.bit(1)          # fills 0xFF
    for b in (1, 0, 1, 0, 1, 0, 1):  # 7 bits into the stuffed byte
        enc.bit(b)
    out = enc.flush()
    assert out == bytes([0xFF, 0b1010101]), out.hex()
    dec = J._RawDecoder(out)
    assert [dec.bit() for _ in range(8)] == [1] * 8
    assert [dec.bit() for _ in range(7)] == [1, 0, 1, 0, 1, 0, 1]
    # draining past the end feeds 1-bits (marker semantics)
    assert [dec.bit() for _ in range(4)] == [1, 1, 1, 1]
    # partial tail pads with zeros, MSB-first
    enc2 = J._RawEncoder()
    for b in (1, 1, 0):
        enc2.bit(b)
    assert enc2.flush() == bytes([0b11000000])


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


def test_jpx_codestream_cblk_styles():
    """Full-codestream matrix over the A.6.1 coding styles: lossless
    round-trips, and every styled stream decodes IDENTICAL pixels to
    the plain stream (cross-path differential through the packet
    parser's per-segment length signaling). 16-bit content reaches
    numbps ~14 so bypass produces many raw segments per block."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (37, 45, 3), dtype=np.uint8)
    g16 = rng.randint(0, 65536, (33, 21), dtype=np.uint16)
    styles = [0x01, 0x02, 0x04, 0x08, 0x10, 0x01 | 0x04,
              0x01 | 0x02 | 0x08, 0x1F]
    for sty in styles:
        cs = J.encode_jpx(img, levels=2, mct=True, cblk_style=sty,
                          segsym=bool(sty & 0x02))
        assert np.array_equal(J.decode_jpx(cs)[2], img), hex(sty)
        cs = J.encode_jpx(g16, levels=3, cblk_style=sty)
        assert np.array_equal(J.decode_jpx(cs)[2][:, :, 0], g16), \
            hex(sty)
    # styles thread through COC overrides and multi-layer packets
    cs = J.encode_jpx(img, levels=2, cblk_style=0x01, layers=2,
                      cblk_exp=(4, 4))
    assert np.array_equal(J.decode_jpx(cs)[2], img)
    cs = J.encode_jpx(img, levels=2, cblk_style=0x05,
                      coc={1: {"levels": 3, "cblk_exp": (4, 5)}})
    assert np.array_equal(J.decode_jpx(cs)[2], img)
    # multi-tile x bypass (per-tile segment state must not leak)
    big = rng.randint(0, 256, (64, 96), dtype=np.uint8)
    cs = J.encode_jpx(big, levels=2, tile=(32, 32), cblk_style=0x01)
    assert np.array_equal(J.decode_jpx(cs)[2][:, :, 0], big)
    # 9/7 lossy path under bypass+termall: same tolerance contract
    # as the plain lossy matrix
    cs0 = J.encode_jpx(img, levels=2, transform=0, qstyle=2, mct=True)
    base = J.decode_jpx(cs0)[2]
    for sty in (0x01, 0x05, 0x0F):
        cs = J.encode_jpx(img, levels=2, transform=0, qstyle=2,
                          mct=True, cblk_style=sty)
        px = J.decode_jpx(cs)[2]
        assert np.array_equal(px, base), hex(sty)


def test_jpx_packed_packet_headers():
    """PPM/PPT packed packet headers (B.7/B.8, r16): headers move
    out of the bitstream into main-header PPM chunks or tile-part
    PPT segments; every packed stream must decode IDENTICAL pixels
    to its inline-header twin across progressions, layers, SOP/EPH,
    multi-tile grids, tile-parts and code-block styles."""
    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (37, 45, 3), dtype=np.uint8)
    for kw in ({"ppt": True}, {"ppm": True}):
        for prog in range(5):
            cs = J.encode_jpx(img, levels=2, mct=True,
                              progression=prog, **kw)
            assert np.array_equal(J.decode_jpx(cs)[2], img), (kw, prog)
        # SOP/EPH: SOP stays in the bitstream, EPH rides the packed
        # stream; layers exercise multi-contribution tag trees
        cs = J.encode_jpx(img, levels=2, sop=True, eph=True,
                          layers=2, cblk_exp=(4, 4), **kw)
        assert np.array_equal(J.decode_jpx(cs)[2], img), kw
        # bypass styles: per-segment length chunks ride the packed
        # header stream
        cs = J.encode_jpx(img, levels=2, cblk_style=0x01, **kw)
        assert np.array_equal(J.decode_jpx(cs)[2], img), kw
        # 9/7 lossy equals its inline twin bit-for-bit
        cs0 = J.encode_jpx(img, levels=2, transform=0, qstyle=2)
        cs1 = J.encode_jpx(img, levels=2, transform=0, qstyle=2, **kw)
        assert np.array_equal(J.decode_jpx(cs0)[2],
                              J.decode_jpx(cs1)[2]), kw
    # multi-tile x tile-parts x both forms
    big = rng.randint(0, 256, (64, 96), dtype=np.uint8)
    for kw in ({"ppt": True}, {"ppm": True}):
        cs = J.encode_jpx(big, levels=2, tile=(32, 32),
                          tile_parts=3, **kw)
        assert np.array_equal(J.decode_jpx(cs)[2][:, :, 0], big), kw
    # jp2 wrapper + 16-bit
    g16 = rng.randint(0, 65536, (9, 9), dtype=np.uint16)
    cs = J.encode_jpx(g16, levels=2, jp2=True, ppt=True)
    assert np.array_equal(J.decode_jpx(cs)[2][:, :, 0], g16)
    # mixing both forms is refused at encode time, and a PPT marker
    # in the main header is a typed error
    with pytest.raises(J.JpxError, match="mutually exclusive"):
        J.encode_jpx(img, ppt=True, ppm=True)
    cs = J.encode_jpx(img, levels=1)
    cod_at = cs.find(b"\xff\x52")
    bad = cs[:cod_at] + b"\xff\x61\x00\x03\x00" + cs[cod_at:]
    with pytest.raises(J.JpxError, match="main header"):
        J.decode_jpx(bad)


def test_jpx_named_boundaries():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    cs = bytearray(J.encode_jpx(img, levels=1))
    # transform/quantization style mismatches are typed errors now
    # that both paths exist (9/7 landed in r15): flipping the COD
    # transformation byte to 0 against a style-0 QCD must raise
    cod_at = bytes(cs).find(b"\xff\x52")
    bad = bytearray(cs)
    bad[cod_at + 4 + 9] = 0  # SPcod transformation
    with pytest.raises(J.JpxError, match="no-quantization"):
        J.decode_jpx(bytes(bad))
    # and a quantized QCD style against the reversible 5/3 transform
    qcd_at = bytes(cs).find(b"\xff\x5c")
    bad = bytearray(cs)
    bad[qcd_at + 4] |= 2
    with pytest.raises(J.JpxError, match="reversible 5/3"):
        J.decode_jpx(bytes(bad))
    # reserved code-block style bits (the six real flags all decode)
    bad = bytearray(cs)
    bad[cod_at + 4 + 8] |= 0x40
    with pytest.raises(NotImplementedError, match="reserved"):
        J.decode_jpx(bytes(bad))
    with pytest.raises(J.JpxError, match="SOC"):
        J.decode_jpx(b"\x00" * 16)


def test_jpx_typed_error_wrapper():
    """Malformed streams whose marker length fields still match must
    come back as JpxError, never a foreign struct/Index/Key error
    (the r15 ADVICE case: Lsiz shortened below the fixed SIZ body)."""
    rng = np.random.RandomState(40)
    img = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    good = J.encode_jpx(img, levels=1)
    siz_at = good.find(b"\xff\x51")
    # shrink Lsiz so _parse_siz struct-underruns on a matching body
    bad = bytearray(good)
    bad[siz_at + 2:siz_at + 4] = (20).to_bytes(2, "big")
    with pytest.raises(J.JpxError, match="malformed"):
        J.decode_jpx(bytes(bad))
    # truncate mid-tile: typed, whatever the failing layer
    with pytest.raises((J.JpxError, NotImplementedError)):
        J.decode_jpx(good[: len(good) // 2])


def test_dwt97_perfect_reconstruction():
    rng = np.random.RandomState(41)
    for h, w in [(1, 1), (1, 7), (7, 1), (8, 8), (9, 13), (16, 5),
                 (31, 33), (2, 2), (3, 2)]:
        x = rng.randn(h, w) * 1000
        back = J._idwt97_2d(*J._fdwt97_2d(x))
        assert np.allclose(back, x, atol=1e-8), (h, w)
    # DC gain 1 on the low branch, Nyquist gain 2 on the high branch
    # (Table E.1's nominal ranges: LL 0, HL/LH 1, HH 2)
    const = np.full((64,), 100.0)
    low, high = J._fdwt97_1d(const)
    assert np.allclose(low, 100.0) and np.allclose(high, 0.0)
    nyq = np.where(np.arange(64) % 2 == 0, 1.0, -1.0)
    low, high = J._fdwt97_1d(nyq)
    assert abs(abs(high[2]) - 2.0) < 1e-6 and abs(low[2]) < 1e-6


def test_jpx_lossy_matrix():
    """9/7 + scalar quantization: derived and expounded styles across
    progressions, MCT (ICT), layers, 16-bit, odd geometry — bounded
    error for the near-lossless fixture step sizes."""
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (37, 45, 3), dtype=np.uint8)
    for prog in range(5):
        for qs in (1, 2):
            cs = J.encode_jpx(img, levels=2, mct=True, transform=0,
                              qstyle=qs, progression=prog)
            w, h, px = J.decode_jpx(cs)
            err = np.abs(px.astype(int) - img.astype(int)).max()
            assert err <= (16 if qs == 1 else 6), (prog, qs, err)
    # multi-layer lossy on the spec packet order
    for prog in (0, 2, 3, 4):
        cs = J.encode_jpx(img, levels=2, transform=0, mct=True,
                          progression=prog, layers=2, cblk_exp=(4, 4))
        px = J.decode_jpx(cs)[2]
        assert np.abs(px.astype(int) - img.astype(int)).max() <= 6
    # 16-bit grayscale
    g16 = rng.randint(0, 65536, (9, 9), dtype=np.uint16)
    px = J.decode_jpx(J.encode_jpx(g16, levels=2, transform=0))[2]
    assert px.dtype == np.uint16
    assert np.abs(px[:, :, 0].astype(int) - g16.astype(int)).max() <= 4
    # odd geometries
    for hh, ww in [(1, 1), (1, 7), (8, 8), (9, 13), (2, 2), (31, 33)]:
        im = rng.randint(0, 256, (hh, ww), dtype=np.uint8)
        px = J.decode_jpx(J.encode_jpx(im, levels=2, transform=0))[2]
        assert np.abs(px[:, :, 0].astype(int)
                      - im.astype(int)).max() <= 6, (hh, ww)
    # smooth content should be near-transparent (PSNR sanity)
    yy, xx = np.mgrid[0:64, 0:80]
    smooth = np.dstack([
        128 + 60 * np.sin(xx / 9) + 40 * np.cos(yy / 7),
        128 + 50 * np.sin((xx + yy) / 11),
        128 + 70 * np.cos(xx / 13),
    ]).clip(0, 255).astype(np.uint8)
    px = J.decode_jpx(J.encode_jpx(smooth, levels=3, mct=True,
                                   transform=0, qstyle=2))[2]
    mse = ((px.astype(float) - smooth.astype(float)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / max(mse, 1e-12)) > 40


def test_jpx_coc_qcc_threading():
    """COC/QCC are applied, not just parsed (the r15 ADVICE case):
    per-component code-block geometry, decomposition levels (which
    reshape that component's packet sequence), and quantization."""
    rng = np.random.RandomState(43)
    img = rng.randint(0, 256, (37, 45, 3), dtype=np.uint8)
    cs = J.encode_jpx(img, levels=2,
                      coc={1: {"levels": 3, "cblk_exp": (4, 5)}})
    assert np.array_equal(J.decode_jpx(cs)[2], img)
    for prog in range(5):
        cs = J.encode_jpx(img, levels=2, progression=prog,
                          coc={0: {"levels": 1}, 2: {"levels": 4}})
        assert np.array_equal(J.decode_jpx(cs)[2], img), prog
    # a COC override must CHANGE the decode (guards against a decoder
    # that ignores COC): same packets parsed with the wrong code-block
    # size either fail or mis-decode, so strip the COC and compare
    cs = J.encode_jpx(img[:, :, 0], levels=2,
                      coc={0: {"cblk_exp": (4, 4)}})
    coc_at = cs.find(b"\xff\x53")
    ln = int.from_bytes(cs[coc_at + 2:coc_at + 4], "big")
    stripped = cs[:coc_at] + cs[coc_at + 2 + ln:]
    try:
        px = J.decode_jpx(stripped)[2]
        assert not np.array_equal(px[:, :, 0], img[:, :, 0])
    except (J.JpxError, NotImplementedError):
        pass
    # QCC: per-component quantization style on the lossy path
    cs = J.encode_jpx(img, levels=2, transform=0, qstyle=2,
                      qcc={1: 1})
    px = J.decode_jpx(cs)[2]
    err = np.abs(px.astype(int) - img.astype(int))
    assert err[:, :, 0].max() <= 6 and err[:, :, 2].max() <= 6
    assert err[:, :, 1].max() <= 16


def test_jpx_packet_order_spec_pin():
    """B.12 packet sequences, pinned directly (the encoder shares the
    generator, so roundtrips alone cannot catch a wrong loop order):
    RPCL keeps the layer loop innermost after r,c; PCRL/CPRL after
    c,r (one precinct per (r, c) makes the position loop implicit)."""
    two = [1, 1]  # two components, one decomposition level
    got = list(J._packet_order(2, 2, two))  # RPCL
    assert got == [(0, 0, 0), (1, 0, 0), (0, 0, 1), (1, 0, 1),
                   (0, 1, 0), (1, 1, 0), (0, 1, 1), (1, 1, 1)]
    for prog in (3, 4):  # PCRL / CPRL agree under a single precinct
        got = list(J._packet_order(prog, 2, two))
        assert got == [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
                       (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
    # LRCP/RLCP keep their documented layer positions
    assert list(J._packet_order(0, 2, [0]))[:2] == [(0, 0, 0),
                                                    (1, 0, 0)]
    assert list(J._packet_order(1, 2, [1])) == [
        (0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0)]
    # per-component levels: packets exist only for resolutions the
    # component has (B.12.1.3)
    got = list(J._packet_order(0, 1, [0, 1]))
    assert got == [(0, 0, 0), (0, 0, 1), (0, 1, 1)]


def test_jpx_multilayer_reversible_matrix():
    rng = np.random.RandomState(44)
    img = rng.randint(0, 256, (37, 45, 3), dtype=np.uint8)
    for prog in range(5):
        for lay in (2, 3):
            cs = J.encode_jpx(img, levels=2, progression=prog,
                              layers=lay, cblk_exp=(4, 4))
            assert np.array_equal(J.decode_jpx(cs)[2], img), (prog,
                                                              lay)


def test_jpx_hostile_fuzz():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    seeds = [
        J.encode_jpx(img, levels=2, mct=True, jp2=True),
        J.encode_jpx(img, levels=2, mct=True, transform=0, qstyle=2),
        J.encode_jpx(img, levels=1, transform=0, qstyle=1, layers=2),
        J.encode_jpx(img, levels=2, coc={1: {"cblk_exp": (4, 4)}}),
    ]
    for good in seeds:
        for _ in range(250):
            b = bytearray(good)
            b[int(rng.randint(0, len(b)))] ^= 1 << int(
                rng.randint(0, 8))
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
    # lossy 9/7 JPX inside a PDF
    cs = J.encode_jpx(img, levels=2, mct=True, transform=0, qstyle=2)
    pdf = encode_pdf([["jpx"]], images=[[("jpx", 24, 16, 3, cs)]])
    (im,) = extract_pdf_images(pdf)
    got = np.frombuffer(bytes(im.pixels), np.uint8).reshape(16, 24, 3)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 6
    # 16-bit JPX: PdfImage.pixels must stay uint8 (high byte), the
    # module's r12 convention — not 2 native-endian bytes per sample
    g16 = (rng.randint(0, 256, (8, 8)).astype(np.uint16) << 8) | 0x12
    cs = J.encode_jpx(g16, levels=1)
    pdf = encode_pdf([["g"]], images=[[("jpx", 8, 8, 1, cs)]])
    (im,) = extract_pdf_images(pdf)
    assert len(bytes(im.pixels)) == 64
    assert bytes(im.pixels) == (g16 >> 8).astype(np.uint8).tobytes()


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


def test_jpx_multi_tile():
    """r15 multi-tile: raster SOT grid + tile-parts join, exact on
    the reversible path (edge tiles included), bounded on the lossy
    path; unaligned grids and missing tiles fail loud."""
    rng = np.random.RandomState(45)
    big = rng.randint(0, 256, (64, 80, 3), dtype=np.uint8)
    cs = J.encode_jpx(big, levels=2, mct=True, tile=(32, 32))
    w, h, px = J.decode_jpx(cs)
    assert (w, h) == (80, 64) and np.array_equal(px, big)
    # uneven edge tiles (grid pitch aligned, edge tile sizes not)
    small = rng.randint(0, 256, (50, 70), dtype=np.uint8)
    cs = J.encode_jpx(small, levels=2, tile=(32, 32), tile_parts=3)
    assert np.array_equal(J.decode_jpx(cs)[2][:, :, 0], small)
    # non-power-of-two pitch that is still 2^levels-aligned is fine
    cs = J.encode_jpx(big, levels=2, tile=(36, 32))
    assert np.array_equal(J.decode_jpx(cs)[2], big)
    # r16 (ADVICE): absolute code-block anchoring — interior tiles
    # whose band origin is NOT a block multiple get a partial first
    # block (tile 12, level 1 -> origin 6k; 8-wide blocks cut the
    # 6-wide band of tile 1 into 2+4), unlike the old 0-anchored
    # grid which emitted one 6-wide block.
    assert J._cblk_cells(6, 6, 8) == [(0, 2), (2, 4)]
    assert J._cblk_cells(0, 6, 8) == [(0, 6)]
    assert J._cblk_cells(64, 32, 64) == [(0, 32)]
    assert J._cblk_cells(8, 96, 64) == [(0, 56), (56, 40)]
    tiny = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    cs = J.encode_jpx(tiny, levels=1, tile=(12, 12), cblk_exp=(3, 3))
    assert np.array_equal(J.decode_jpx(cs)[2][:, :, 0], tiny)
    # the wild scanner geometry's shape: pitch >> levels not a block
    # multiple but DWT-parity aligned still roundtrips exactly
    med = rng.randint(0, 256, (40, 72), dtype=np.uint8)
    cs = J.encode_jpx(med, levels=2, tile=(24, 20), cblk_exp=(3, 3))
    assert np.array_equal(J.decode_jpx(cs)[2][:, :, 0], med)
    # lossy multi-tile stays inside the fixture tolerance
    cs = J.encode_jpx(big, levels=2, mct=True, transform=0,
                      qstyle=2, tile=(32, 32))
    assert np.abs(J.decode_jpx(cs)[2].astype(int)
                  - big.astype(int)).max() <= 6
    # unaligned grid raises by name (36 % 2^3 != 0)
    cs = J.encode_jpx(big, levels=3, tile=(36, 32))
    with pytest.raises(NotImplementedError, match="tile grid"):
        J.decode_jpx(cs)
    # a tile missing from the grid is a typed error
    cs = J.encode_jpx(small, levels=2, tile=(32, 32))
    second = cs.find(b"\xff\x90", cs.find(b"\xff\x90") + 2)
    with pytest.raises(J.JpxError, match="tiles present"):
        J.decode_jpx(cs[:second] + b"\xff\xd9")
    # hostile fuzz over a tiled stream stays typed
    good = J.encode_jpx(small[:32, :48], levels=1, tile=(16, 16),
                        tile_parts=2)
    for _ in range(250):
        b = bytearray(good)
        b[int(rng.randint(0, len(b)))] ^= 1 << int(rng.randint(0, 8))
        try:
            J.decode_jpx(bytes(b), max_pixels=1 << 16)
        except (J.JpxError, NotImplementedError):
            pass
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"untyped crash on corrupted tiled JPX: {ex!r}")
