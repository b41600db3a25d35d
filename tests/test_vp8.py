"""VP8 lossy keyframe codec (operators/vp8.py, RFC 6386) and the
lossy-WebP container path (operators/webp.py) — r11.

The independent pin is tests/fixtures/golden/python-logo.webp: a REAL
libwebp-encoded lossy file (from the CPython test corpus, PSF
license) whose 160 bytes of arithmetic-coded DCT tokens decode
through the full DEFAULT_COEFF_PROBS / COEFF_UPDATE_PROBS tables —
a single wrong table entry desynchronizes the boolean decoder — and
whose ALPH plane renders the recognizable Python-logo silhouette
through the headerless-VP8L alpha path.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

from dolphinbeat_spark.operators import vp8_tables as T
from dolphinbeat_spark.operators.vp8 import (
    BoolDec,
    BoolEnc,
    Vp8Error,
    _decode_coeffs,
    _put_block,
    decode_vp8,
    encode_vp8,
)

_GOLDEN = pathlib.Path(__file__).parent / "fixtures" / "golden" \
    / "python-logo.webp"


def test_bool_coder_roundtrip():
    """§7/§8: encode->decode identity over random bits at random
    probabilities, including long runs at extreme probs (carry +
    renormalization paths)."""
    rng = np.random.RandomState(1)
    bits = [int(b) for b in rng.randint(0, 2, 2000)]
    probs = [int(p) for p in rng.randint(1, 255, 2000)]
    bits += [1] * 64 + [0] * 64
    probs += [1] * 64 + [254] * 64
    be = BoolEnc()
    for b, p in zip(bits, probs):
        be.put(b, p)
    blob = be.done()
    bd = BoolDec(blob)
    assert [bd.get(p) for p in probs] == bits


def test_token_layer_all_categories():
    """Coefficient tokens roundtrip across every category (literal
    1-4, cat1-6 extra bits), zero runs (the no-EOB-after-zero rule),
    signs and all three nonzero contexts."""
    cases = [
        [0] * 16,
        [1] + [0] * 15,
        [-4, 3, 0, 0, 2] + [0] * 11,
        [5, -6, 7, 10, 11, 18, 19, 34, 35, 66, 67, 100, -2047 - 67 + 1,
         0, 0, 1],
        [0, 0, 0, 1] + [0] * 12,          # leading zeros
        [2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3],  # zeros mid
    ]
    probs = T.DEFAULT_COEFF_PROBS
    for bt in (0, 1, 2, 3):
        first = 1 if bt == 0 else 0
        for ctx0 in (0, 1, 2):
            be = BoolEnc()
            for lv in cases:
                lv = list(lv)
                for i in range(first):
                    lv[i] = 0
                _put_block(be, probs, bt, first, ctx0, lv)
            blob = be.done()
            bd = BoolDec(blob)
            for lv in cases:
                lv = list(lv)
                for i in range(first):
                    lv[i] = 0
                got = _decode_coeffs(bd, probs, bt, first, ctx0, 1, 1)
                want = [0] * 16
                for i, v in enumerate(lv[:16]):
                    if i >= first and v:
                        want[T.ZIGZAG[i]] = v
                if got is None:
                    got = [0] * 16
                assert got == want, (bt, ctx0, lv)


def test_flat_frame_closed_form():
    """A DC-only frame reconstructs to the closed form the oracle
    uses: Y = 128 + ((((Ly*y2dc)+3)>>3)+4)>>3, chroma likewise with
    uvdc — table values stated literally here, independent of the
    decoder's own lookup."""
    qi = 20
    y2dc = 21 * 2   # DC_QLOOKUP[20] = 21 (RFC 6386 §14.1)
    uvdc = 21
    for Ly, Lu, Lv in ((6, 3, -4), (1, 1, 1), (-9, 8, 0)):
        mb = {"ymode": T.DC_PRED, "uvmode": T.DC_PRED,
              "y2": [Ly] + [0] * 15,
              "u": [[Lu] + [0] * 15 for _ in range(4)],
              "v": [[Lv] + [0] * 15 for _ in range(4)]}
        blob = encode_vp8(16, 16, [mb], qi=qi)
        w, h, Y, U, V = decode_vp8(blob)
        ry = (((Ly * y2dc + 3) >> 3) + 4) >> 3
        assert (Y == 128 + ry).all(), (Ly, np.unique(Y))
        assert (U == 128 + ((Lu * uvdc + 4) >> 3)).all()
        assert (V == 128 + ((Lv * uvdc + 4) >> 3)).all()
    # multi-MB: skipped MBs DC-predict from their reconstructed
    # neighbours, so the flat value propagates across the frame
    mb = {"ymode": T.DC_PRED, "uvmode": T.DC_PRED,
          "y2": [6] + [0] * 15,
          "u": [[3] + [0] * 15 for _ in range(4)],
          "v": [[3] + [0] * 15 for _ in range(4)]}
    mbs = [mb] + [{"ymode": T.DC_PRED, "uvmode": T.DC_PRED, "skip": 1}
                  for _ in range(5)]
    w, h, Y, U, V = decode_vp8(encode_vp8(48, 32, mbs, qi=qi))
    assert (w, h) == (48, 32) and len(np.unique(Y)) == 1


def test_bpred_and_mode_variety():
    """B_PRED submodes (all ten), V/H/TM 16x16 modes and chroma modes
    decode without error and deterministically; a coefficient in a
    B_PRED subblock lands in that subblock only."""
    sub = [T.B_DC_PRED, T.B_TM_PRED, T.B_VE_PRED, T.B_HE_PRED,
           T.B_LD_PRED, T.B_RD_PRED, T.B_VR_PRED, T.B_VL_PRED,
           T.B_HD_PRED, T.B_HU_PRED, T.B_DC_PRED, T.B_VE_PRED,
           T.B_HE_PRED, T.B_TM_PRED, T.B_LD_PRED, T.B_HU_PRED]
    y = [None] * 16
    y[5] = [7] + [0] * 15  # one hot subblock
    mbs = [{"ymode": T.B_PRED, "uvmode": T.TM_PRED, "sub": sub, "y": y},
           {"ymode": T.V_PRED, "uvmode": T.V_PRED},
           {"ymode": T.H_PRED, "uvmode": T.H_PRED},
           {"ymode": T.TM_PRED, "uvmode": T.DC_PRED}]
    blob = encode_vp8(64, 16, mbs, qi=30)
    w, h, Y, U, V = decode_vp8(blob)
    assert (w, h) == (64, 16)
    base = decode_vp8(encode_vp8(
        64, 16, [dict(m, y=None) if "y" in m else m for m in mbs],
        qi=30))[2]
    diff = np.argwhere(Y != base)
    # the hot coefficient affects subblock (r=1, c=1) and, through
    # B_PRED neighbour prediction, only pixels right/below it
    assert len(diff) > 0
    assert diff[:, 0].min() >= 4 and diff[:, 1].min() >= 4


def test_loop_filter_paths():
    """Both loop filters run deterministically and actually smooth
    soft block edges (normal at hev thresholds 1 and 2, simple), while
    STRONG edges are preserved — the §15 mask semantics. The real-file
    canary independently exercises the normal filter at level 12."""
    y = [None] * 16
    for i in (0, 5, 10, 15):
        y[i] = [2, -1, 1] + [0] * 13
    mb = {"ymode": T.DC_PRED, "uvmode": T.DC_PRED,
          "y2": [2] + [0] * 15, "y": y,
          "u": [[1] + [0] * 15] * 4, "v": [[-1] + [0] * 15] * 4}
    mbs = [dict(mb), dict(mb)]
    base = decode_vp8(encode_vp8(32, 16, mbs, qi=4))[2]
    for lvl, simple in ((12, False), (45, False), (20, True)):
        blob = encode_vp8(32, 16, mbs, qi=4, filter_level=lvl,
                          simple_filter=simple)
        Y = decode_vp8(blob)[2]
        assert (Y == decode_vp8(blob)[2]).all()  # deterministic
        assert int((Y != base).sum()) > 0, (lvl, simple)
    # strong edges exceed the filter limits and stay untouched
    hard = [None] * 16
    hard[0] = [9, -7, 5] + [0] * 13
    mbh = {"ymode": T.DC_PRED, "uvmode": T.DC_PRED,
           "y2": [8] + [0] * 15, "y": hard}
    b0 = decode_vp8(encode_vp8(16, 16, [mbh], qi=40))[2]
    b1 = decode_vp8(encode_vp8(16, 16, [mbh], qi=40,
                               filter_level=12))[2]
    assert (b0 == b1).all()


def test_real_libwebp_file_canary():
    """The committed REAL libwebp encoding: VP8 chunk decodes
    structurally clean through every probability table; the ALPH
    plane (headerless VP8L) renders the Python logo; the whole-file
    RGBA is stable (regression digest of OUR decode)."""
    import hashlib

    from dolphinbeat_spark.operators.webp import decode_webp

    import struct

    import numpy as np

    from dolphinbeat_spark.operators.vp8 import decode_vp8

    data = _GOLDEN.read_bytes()
    w, h, px = decode_webp(data)
    assert (w, h) == (16, 16) and px.shape == (16, 16, 4)
    a = px[:, :, 3]
    # the logo silhouette: opaque center, transparent corners
    assert a[0, 0] < 32 and a[15, 15] < 32
    assert a[2, 6] > 200 and a[8, 2] > 200 and a[13, 8] > 200
    assert 100 < float(a.mean()) < 200
    # r12: the VP8 chunk's YUV planes are BIT-EXACT against
    # libwebp's own WebPDecodeYUV output (pins computed externally;
    # the r11 assertion that luma was near-black was itself an
    # artifact of the mistranscribed tables — the true luma has
    # mean ~98.9, max 230)
    pos = 12
    vp8 = None
    while pos + 8 <= len(data):
        cc = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        if cc == b"VP8 ":
            vp8 = data[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    _, _, y, u, v = decode_vp8(vp8)
    assert abs(float(y.mean()) - 98.8828125) < 1e-9 and y.max() == 230
    assert hashlib.sha256(y.tobytes()).hexdigest().startswith(
        "0e4516f7a73e1abf")
    assert hashlib.sha256(u.tobytes()).hexdigest().startswith(
        "288e64e65b3f321c")
    assert np.unique(y).size > 30  # real DCT content, not flat


def test_webp_exif_extract_and_strip():
    """WebP EXIF chunks (VP8X container, r11): the TIFF-IFD parser
    reads both the raw and the 'Exif\\x00\\x00'-prefixed layouts;
    strip_metadata drops EXIF/XMP/ICCP, clears the VP8X flag bits and
    leaves the decoded pixels byte-identical."""
    from dolphinbeat_spark.operators.exif import (
        encode_exif_app1, parse_exif, strip_metadata,
    )
    from dolphinbeat_spark.operators.webp import (
        add_webp_exif, decode_webp, encode_webp_vp8,
    )

    mb = {"ymode": T.DC_PRED, "uvmode": T.DC_PRED,
          "y2": [4] + [0] * 15}
    base = encode_webp_vp8(16, 16, [mb], qi=20)
    app1 = encode_exif_app1(
        make="ACME", model="M7", orientation=3,
        gps=("N", ((10, 1), (20, 1), (30, 1)),
             "E", ((40, 1), (5, 1), (6, 1))))
    tiff = app1[10:]
    for prefixed in (False, True):
        blob = add_webp_exif(
            base, (b"Exif\x00\x00" + tiff) if prefixed else tiff,
            (16, 16))
        m = parse_exif(blob)
        assert (m["make"], m["model"], m["orientation"]) == \
            ("ACME", "M7", 3)
        assert abs(m["gps_lat"] - (10 + 20 / 60 + 30 / 3600)) < 1e-9
        stripped = strip_metadata(blob)
        assert parse_exif(stripped) == {}
        assert (decode_webp(stripped)[2] == decode_webp(blob)[2]).all()
        i = stripped.index(b"VP8X")
        assert stripped[i + 8] & 0x2C == 0
    # a metadata-free file passes through decode-identically
    real = _GOLDEN.read_bytes()
    assert (decode_webp(strip_metadata(real))[2]
            == decode_webp(real)[2]).all()


def test_webp_anim_frames():
    """Animated WebP (VP8X/ANIM/ANMF, r11): frames demux with canvas
    geometry, durations and flags; lossy VP8 and lossless VP8L frames
    decode through their matching still paths in ONE animation; the
    still-image decode_webp keeps raising by name on animations."""
    import numpy as np

    from dolphinbeat_spark.operators.webp import (
        WebpError, decode_webp, encode_webp_anim, webp_anim_frames,
    )

    def mk(ly):
        return encode_vp8(16, 16, [{"ymode": T.DC_PRED,
                                    "uvmode": T.DC_PRED,
                                    "y2": [ly] + [0] * 15}], qi=20)

    rgba = (np.arange(8 * 8 * 4, dtype=np.uint8).reshape(8, 8, 4) % 250)
    anim = encode_webp_anim(
        [{"vp8": mk(3), "duration_ms": 40},
         {"vp8": mk(6), "x": 16, "duration_ms": 80, "dispose": 1},
         {"rgba": rgba, "x": 4, "y": 2, "duration_ms": 120, "blend": 1}],
        canvas=(32, 16))
    frames = webp_anim_frames(anim)
    assert [(f["x"], f["y"], f["width"], f["height"], f["duration_ms"],
             f["dispose"], f["blend"]) for f in frames] == [
        (0, 0, 16, 16, 40, 0, 0), (16, 0, 16, 16, 80, 1, 0),
        (4, 2, 8, 8, 120, 0, 1)]
    assert (frames[2]["rgba"] == rgba).all()
    # flat lossy frames: one distinct RGB each, full alpha
    for fr, ly in ((frames[0], 3), (frames[1], 6)):
        y = 128 + ((((ly * 42) + 3 >> 3) + 4) >> 3)
        assert len(np.unique(fr["rgba"][:, :, 0])) == 1
        assert (fr["rgba"][:, :, 3] == 255).all()
    with pytest.raises(NotImplementedError, match="animated"):
        decode_webp(anim)
    from dolphinbeat_spark.operators.webp import encode_webp_vp8

    still = encode_webp_vp8(16, 16, [{"ymode": T.DC_PRED,
                                      "uvmode": T.DC_PRED}])
    with pytest.raises(WebpError, match="not animated"):
        webp_anim_frames(still)
    # truncated ANMF header stays typed
    bad = bytearray(anim)
    i = anim.index(b"ANMF")
    import struct as _st

    _st.pack_into("<I", bad, i + 4, 5)
    with pytest.raises(WebpError):
        webp_anim_frames(bytes(bad))


def test_vp8_libwebp_conformance_goldens():
    """r12 REAL-libwebp conformance pins: four committed files
    encoded by the system libwebp (tools/make_vp8_golden.py) —
    bright natural content (the r11 real-file pin was premultiplied
    near-black, so luma/chroma reconstruction was only
    self-referentially pinned), heavy noise at q10, a q90 random walk
    (loop-filter detail), and an odd non-MB-multiple size. The
    decoded Y/U/V planes must match libwebp's OWN WebPDecodeYUV
    output BIT-EXACTLY (sha256 pins computed externally by the tool);
    YUV is the contract because only the chroma UPSAMPLING deviates
    (simple vs fancy, documented at decode_webp).

    This corpus caught three r11 bugs: the big probability tables
    mistranscribed (incl. a one-band shift of the whole coefficient
    table and libwebp's permuted-vs-RFC bmode enum), the within-MB
    above context for sub-block modes, and inverted hev semantics in
    the sub-block loop filter (dev-time battery: 75/75 libwebp
    encodes across qualities/sizes decode bit-exactly)."""
    import hashlib
    import json
    import os
    import struct

    import numpy as np

    from dolphinbeat_spark.operators.vp8 import decode_vp8

    gold = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
    with open(os.path.join(gold, "vp8_conformance_pins.json")) as f:
        pins = json.load(f)
    assert len(pins) >= 4
    for name, pin in sorted(pins.items()):
        with open(os.path.join(gold, f"{name}.webp"), "rb") as f:
            data = f.read()
        assert data[:4] == b"RIFF" and data[8:16] == b"WEBPVP8 "
        (clen,) = struct.unpack_from("<I", data, 16)
        w, h, y, u, v = decode_vp8(data[20:20 + clen])
        assert (w, h) == (pin["width"], pin["height"]), name
        assert abs(y.mean() - pin["mean_luma"]) < 0.05, name
        for plane, key in ((y, "y_sha256"), (u, "u_sha256"),
                           (v, "v_sha256")):
            got = hashlib.sha256(plane.tobytes()).hexdigest()
            assert got == pin[key], (name, key)
    # the bright case specifically pins the bright-DC half
    assert pins["bright-natural"]["mean_luma"] > 150


def test_webp_anim_composite():
    """r12 canvas assembly per the container spec: background-color
    initialization, overwrite placement of opaque frames,
    dispose-to-background restoring a frame's rectangle, blend=1
    overwrite semantics, and the source-over alpha blend formula on a
    hand-computed pixel."""
    import numpy as np

    from dolphinbeat_spark.operators.webp import (
        WebpError, encode_webp_anim, webp_anim_composite,
    )

    def solid(w, h, rgba):
        a = np.empty((h, w, 4), np.uint8)
        a[:, :] = rgba
        return a

    bg = (10, 20, 30, 255)  # r,g,b,a
    bg_int = bg[2] | bg[1] << 8 | bg[0] << 16 | bg[3] << 24  # BGRA field
    c1, c2, c3 = (100, 0, 0, 255), (0, 150, 0, 255), (0, 0, 200, 255)
    anim = encode_webp_anim(
        [{"rgba": solid(8, 6, c1), "duration_ms": 40},
         {"rgba": solid(4, 2, c2), "x": 2, "y": 2, "duration_ms": 50,
          "dispose": 1},
         {"rgba": solid(2, 2, c3), "duration_ms": 60, "blend": 1}],
        canvas=(8, 6), bgcolor=bg_int)
    cw, ch, frames = webp_anim_composite(anim)
    # r13 (ADVICE): frames is a GENERATOR — memory is one canvas at
    # a time, not O(n_frames * canvas_area)
    import types
    assert isinstance(frames, types.GeneratorType)
    frames = list(frames)
    assert (cw, ch) == (8, 6)
    assert [f["duration_ms"] for f in frames] == [40, 50, 60]
    f0, f1, f2 = (f["canvas"] for f in frames)
    assert (f0 == c1).all()
    assert (f1[2:4, 2:6] == c2).all()
    assert (f1[0:2, :] == c1).all()
    # frame 1 disposed to background before frame 2; frame 2 overwrote
    # its own 2x2 rect at (0,0)
    assert (f2[2:4, 2:6] == bg).all()
    assert (f2[0:2, 0:2] == c3).all()
    assert (f2[4:6, :] == c1).all()
    # alpha blend (blend=0): semi-transparent red over opaque c1;
    # hand-computed: a_s=128/255, out = (255*a_s + 100*1*(1-a_s)) / 1
    semi = solid(2, 2, (255, 0, 0, 128))
    anim2 = encode_webp_anim(
        [{"rgba": solid(4, 4, c1), "duration_ms": 10},
         {"rgba": semi, "duration_ms": 10}],
        canvas=(4, 4), bgcolor=bg_int)
    _, _, fr2 = webp_anim_composite(anim2)
    fr2 = list(fr2)
    a_s = 128 / 255
    want_r = round(255 * a_s + 100 * (1 - a_s))
    px = fr2[1]["canvas"][0, 0]
    assert tuple(px) == (want_r, 0, 0, 255), px
    # frame rectangle exceeding the canvas stays typed
    bad = encode_webp_anim(
        [{"rgba": solid(4, 4, c1), "x": 6, "duration_ms": 10}],
        canvas=(8, 6), bgcolor=0)
    with pytest.raises(WebpError, match="exceeds"):
        webp_anim_composite(bad)


def test_vp8_typed_errors_and_fuzz():
    from dolphinbeat_spark.operators.webp import WebpError, decode_webp

    mb = {"ymode": T.DC_PRED, "uvmode": T.DC_PRED,
          "y2": [5] + [0] * 15}
    good = encode_vp8(16, 16, [mb], qi=20)
    # interframe raises by name
    inter = bytearray(good)
    inter[0] |= 1
    with pytest.raises(NotImplementedError, match="interframe"):
        decode_vp8(bytes(inter))
    # missing start code / truncation / bad dims
    bad = bytearray(good)
    bad[3] = 0x00
    with pytest.raises(Vp8Error, match="start code"):
        decode_vp8(bytes(bad))
    with pytest.raises(Vp8Error):
        decode_vp8(good[:8])
    # hostile bit flips stay typed (decode may also succeed with
    # different pixels — VP8 has no integrity check)
    rng = np.random.RandomState(7)
    for _ in range(120):
        blob = bytearray(good)
        i = int(rng.randint(0, len(blob)))
        blob[i] ^= 1 << int(rng.randint(0, 8))
        try:
            decode_vp8(bytes(blob))
        except (Vp8Error, NotImplementedError):
            pass
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"untyped crash on flipped VP8: {ex!r}")
    # animated container raises by name
    anim = (b"RIFF" + b"\x20\x00\x00\x00" + b"WEBP"
            + b"ANIM" + b"\x06\x00\x00\x00" + bytes(6))
    with pytest.raises(NotImplementedError, match="animated"):
        decode_webp(anim)
    del WebpError


def test_lossy_webp_container_and_decode_media(spark):
    """encode_webp_vp8 -> decode_webp RGBA matches the closed-form
    fixed-point conversion computed HERE with libwebp's published
    constants; the same payload decodes through the decode_media
    Arrow slot."""
    from dolphinbeat_spark.operators.multimodal import decode_media
    from dolphinbeat_spark.operators.webp import decode_webp, encode_webp_vp8

    qi = 20
    Ly, Lu, Lv = 6, 3, -4
    mb = {"ymode": T.DC_PRED, "uvmode": T.DC_PRED,
          "y2": [Ly] + [0] * 15,
          "u": [[Lu] + [0] * 15 for _ in range(4)],
          "v": [[Lv] + [0] * 15 for _ in range(4)]}
    blob = encode_webp_vp8(16, 16, [mb], qi=qi)
    w, h, px = decode_webp(blob)
    y = 128 + ((((Ly * 42) + 3) >> 3) + 4 >> 3)
    u = 128 + ((Lu * 21 + 4) >> 3)
    v = 128 + ((Lv * 21 + 4) >> 3)

    def mh(a, c):
        return (a * c) >> 8

    def clip8(x):
        # libwebp VP8Clip8: truncating >> 6 (r13)
        return max(0, min(255, x >> 6))

    r = clip8(mh(y, 19077) + mh(v, 26149) - 14234)
    g = clip8(mh(y, 19077) - mh(u, 6419) - mh(v, 13320) + 8708)
    b = clip8(mh(y, 19077) + mh(u, 33050) - 17685)
    assert (px == np.array([r, g, b, 255])).all(), (px[0, 0], (r, g, b))
    df = spark.createDataFrame([(5, bytearray(blob))],
                               "media_id long, payload binary")
    (row,) = decode_media(df).collect()
    assert row.fmt == "webp" and (row.width, row.height) == (16, 16)
    assert row.pixel_sum == (r + g + b + 255) * 256
