"""CCITT T.4/T.6 fax codecs (operators/ccitt.py) + the TIFF
Compression 2/3/4 and PDF CCITTFaxDecode integrations (r11)."""

from __future__ import annotations

import numpy as np
import pytest

from dolphinbeat_spark.operators.ccitt import (
    CcittError,
    ccitt_decode,
    ccitt_encode,
)


def _bits_to_bytes(s: str) -> bytes:
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def test_ccitt_hand_assembled_1d_vector():
    """A 1D row hand-assembled FROM THE PUBLISHED T.4 TABLES — pins
    the terminating-code table independently of the encoder mirror:
    white 2 = 0111, black 3 = 10, white 11 = 01000 (16 columns)."""
    blob = _bits_to_bytes("0111" + "10" + "01000")
    row = ccitt_decode(blob, 16, 1, mode="mh")
    want = np.array([[0, 0, 1, 1, 1] + [0] * 11], np.uint8)
    assert (row == want).all()


def test_ccitt_hand_assembled_makeup_vector():
    """Make-up + terminating composition per T.4: white 67 = make-up
    64 (11011) + term 3 (1000); black 70 = make-up 64 (0000001111) +
    term 6 (0010); trailing white 119 = make-up 64 + term 55
    (01011000). 256 columns."""
    blob = _bits_to_bytes(
        "11011" + "1000"            # white 67
        + "0000001111" + "0010"     # black 70
        + "11011" + "01011000"      # white 119
    )
    row = ccitt_decode(blob, 256, 1, mode="mh")
    want = np.zeros((1, 256), np.uint8)
    want[0, 67:137] = 1
    assert (row == want).all()


def test_ccitt_hand_assembled_g4_vector():
    """A 2-row G4 stream from the published 2D mode codes: row 0 =
    horizontal (001) white 4 (1011) black 4 (011); row 1 = V0 (1)
    twice — both transitions track the reference line exactly.
    8 columns."""
    blob = _bits_to_bytes(
        "001" + "1011" + "011"  # H, w4, b4
        + "1" + "1"             # V0, V0
    )
    img = ccitt_decode(blob, 8, 2, mode="g4")
    want = np.array([[0, 0, 0, 0, 1, 1, 1, 1]] * 2, np.uint8)
    assert (img == want).all()


def test_ccitt_hand_assembled_pass_and_vertical():
    """Pass mode (0001) skips a reference black run; VR1/VL1 shift the
    transition by one against the reference."""
    # reference row: black 2..4 (via MH-style 1D in a G3-2D stream)
    # row 1 (2D): pass over the black run, then the row stays white
    ref_bits = "1" + "0111" + "10" + "01000"  # tag 1, w2 b3 w11
    row2_bits = "0" + "0001" + "1"  # tag 0: PASS (a0->5), then V0 at 16
    eol = "000000000001"
    blob = _bits_to_bytes(eol + ref_bits + eol + row2_bits)
    img = ccitt_decode(blob, 16, 2, mode="g3-2d")
    assert (img[0, 2:5] == 1).all() and img[0].sum() == 3
    assert img[1].sum() == 0  # pass mode: reference run not copied
    # vertical with offset: row 1 = VL1 shifts the black start left by
    # one, V0 keeps the end, V0 closes the row at the right edge
    row2v = "0" + "010" + "1" + "1"
    blob = _bits_to_bytes(eol + ref_bits + eol + row2v)
    img = ccitt_decode(blob, 16, 2, mode="g3-2d")
    assert (img[1, 1:5] == 1).all() and img[1].sum() == 4


def test_ccitt_roundtrip_matrix():
    """encode -> decode identity across every mode × geometry ×
    byte-alignment, including long runs through the extended make-up
    codes (>2560)."""
    rng = np.random.RandomState(7)
    imgs = [
        np.zeros((4, 16), np.uint8),
        np.ones((4, 16), np.uint8),
        (rng.random_sample((8, 64)) < 0.3).astype(np.uint8),
        (rng.random_sample((5, 100)) < 0.05).astype(np.uint8),
        (rng.random_sample((6, 33)) < 0.7).astype(np.uint8),
        np.tile((np.arange(80) % 7 < 2).astype(np.uint8), (9, 1)),
    ]
    big = np.zeros((2, 3000), np.uint8)
    big[0, 2800:] = 1
    big[1, :70] = 1
    imgs.append(big)
    for k, img in enumerate(imgs):
        h, w = img.shape
        for mode in ("mh", "g3-1d", "g3-2d", "g4"):
            for ba in (False, True):
                if mode in ("mh", "g4") and ba:
                    continue
                enc = ccitt_encode(img, mode=mode, byte_align=ba)
                dec = ccitt_decode(enc, w, h, mode=mode, byte_align=ba)
                assert (dec == img).all(), (k, mode, ba)


def test_ccitt_typed_errors_and_boundaries():
    img = (np.arange(64).reshape(4, 16) % 3 == 0).astype(np.uint8)
    good = ccitt_encode(img, mode="g4")
    # truncation mid-stream
    with pytest.raises(CcittError, match="truncated"):
        ccitt_decode(good[:2], 16, 4, mode="g4")
    # a row overrunning the declared width (decode with wrong columns)
    with pytest.raises((CcittError, NotImplementedError)):
        ccitt_decode(ccitt_encode(img, mode="mh"), 9, 4, mode="mh")
    # 2D extension/uncompressed escape (7 zeros) raises BY NAME
    with pytest.raises(NotImplementedError, match="extension"):
        ccitt_decode(b"\x00\x00\x00", 16, 1, mode="g4")
    # invalid geometry / mode
    with pytest.raises(CcittError, match="geometry"):
        ccitt_decode(good, 0, 4, mode="g4")
    with pytest.raises(CcittError, match="mode"):
        ccitt_decode(good, 16, 4, mode="g5")
    # G3 stream ending before the declared row count
    g3 = ccitt_encode(img, mode="g3-1d")
    with pytest.raises(CcittError):
        ccitt_decode(g3, 16, 9, mode="g3-1d")
    # hostile random bytes never escape the typed contract
    rng = np.random.RandomState(3)
    for _ in range(200):
        blob = rng.bytes(int(rng.randint(1, 60)))
        for mode in ("mh", "g3-1d", "g3-2d", "g4"):
            try:
                ccitt_decode(blob, 24, 4, mode=mode)
            except (CcittError, NotImplementedError):
                pass
            except Exception as ex:  # pragma: no cover
                pytest.fail(f"untyped crash: {mode} {ex!r}")


def test_tiff_ccitt_integration():
    """TIFF Compression 2/3/4 across strips, byte orders and BOTH
    photometric senses — identical gray output; option-bit
    uncompressed modes raise by name (pinned in the spec tests via
    decode_tiff)."""
    from dolphinbeat_spark.operators.tiff import (
        decode_tiff, encode_tiff_ccitt,
    )

    rng = np.random.RandomState(11)
    img = (rng.random_sample((20, 37)) < 0.35).astype(np.uint8)
    want = (1 - img) * 255
    for comp, kw in ((2, {}), (3, {}), (3, {"t4_2d": True}),
                     (3, {"t4_2d": True, "byte_align": True}), (4, {})):
        for photo in (0, 1):
            blob = encode_tiff_ccitt(img, compression=comp,
                                     photometric=photo,
                                     rows_per_strip=7, **kw)
            w, h, arr = decode_tiff(blob)
            assert (w, h) == (37, 20)
            assert (arr[:, :, 0] == want).all(), (comp, kw, photo)


def test_pdf_ccitt_integration():
    """PDF CCITTFaxDecode delegates to the same codec: K selects
    G4/G3-1D/G3-2D; BlackIs1 default false maps ink to gray 0."""
    from dolphinbeat_spark.operators.pdf import (
        encode_pdf, extract_pdf_images,
    )

    rng = np.random.RandomState(5)
    ink = (rng.random_sample((12, 40)) < 0.3).astype(np.uint8)
    for kind in ("ccitt-g4", "ccitt-g3", "ccitt-g3-2d"):
        for xs in (False, True):
            pdf = encode_pdf([["scan"]], xref_stream=xs,
                             images=[[(kind, 40, 12, 1, ink.tobytes())]])
            (im,) = extract_pdf_images(pdf)
            assert im.img_filter == "CCITTFaxDecode"
            got = np.frombuffer(im.pixels, np.uint8).reshape(12, 40)
            assert ((got == 0) == (ink == 1)).all(), (kind, xs)
    # BlackIs1 true flips the decoded bit sense — 'false' -> 'true '
    # is byte-length-equal, so the xref stays valid
    pdf = encode_pdf([["scan"]],
                     images=[[("ccitt-g4", 40, 12, 1, ink.tobytes())]])
    flipped = pdf.replace(b"/BlackIs1 false", b"/BlackIs1 true ")
    assert flipped != pdf
    (im,) = extract_pdf_images(flipped)
    got = np.frombuffer(im.pixels, np.uint8).reshape(12, 40)
    assert ((got == 255) == (ink == 1)).all()
    # CCITT parms disagreeing with the dictionary stay typed
    from dolphinbeat_spark.operators.pdf import PdfError
    bad = pdf.replace(b"/Columns 40", b"/Columns 99")
    with pytest.raises(PdfError, match="CCITT parms"):
        extract_pdf_images(bad)