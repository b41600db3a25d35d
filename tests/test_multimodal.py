"""Multimodal plumbing tests: binary columns, Arrow batches, stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dolphinbeat_spark.operators import multimodal as M


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world " * 10), (2, "tiny"), (3, "frame " * 40)], ["doc_id", "text"]
    )
    return M.attach_binary_payload(docs, "doc_id", "text")


def test_payload_schema_and_bytes(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "media_type", "payload", "meta_width", "meta_height", "meta_duration_ms",
    ]
    row = media.filter(F.col("media_id") == 2).first()
    assert bytes(row["payload"]) == b"tiny"


def test_feature_extraction_arrow(media):
    feats = {r["media_id"]: r for r in M.extract_binary_features(media).collect()}
    assert feats[2]["n_bytes"] == 4
    assert feats[2]["sha256_16"] == hashlib.sha256(b"tiny").hexdigest()[:16]


def test_frame_sampling(media):
    frames = M.frame_sample_plan(media, frame_bytes=32, every=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append((r["frame_idx"], r["byte_offset"]))
    # doc 3: 240 bytes → 7 frames (0..6), every 4th → idx 0 and 4
    assert by_id[3] == [(0, 0), (4, 128)]
    # tiny doc still yields frame 0 (greatest(n-1, 0) floor)
    assert by_id[2] == [(0, 0)]


def test_decode_stub_is_honest(media):
    with pytest.raises(NotImplementedError, match="codec"):
        M.decode_media_stub(media).collect()
    fake = {r["media_id"]: r["fake_pixel_checksum"] for r in
            M.decode_media_stub(media, allow_fake=True).collect()}
    # deterministic fake: sha256-derived
    expected = int.from_bytes(hashlib.sha256(b"tiny").digest()[:6], "big")
    assert fake[2] == expected


def test_resize_plumbing(media):
    from dolphinbeat_spark.operators.multimodal import resize_media

    import pytest

    with pytest.raises(NotImplementedError):
        resize_media(media, 16, 16).collect()

    rows = resize_media(media, 16, 16, allow_fake=True).collect()
    assert len(rows) == media.count()
    for r in rows:
        assert r["out_width"] <= 16
        assert r["out_height"] == 16
        # fake resize must actually shrink payloads beyond the target
        assert len(r["resized_payload"]) <= 2 * 16 + 1
    # deterministic across runs
    again = resize_media(media, 16, 16, allow_fake=True).collect()
    assert sorted((r["media_id"], bytes(r["resized_payload"])) for r in rows) == sorted(
        (r["media_id"], bytes(r["resized_payload"])) for r in again
    )


# -- real zero-dependency codecs (PPM / BMP) ---------------------------


def test_ppm_roundtrip_and_header_tolerance():
    import numpy as np

    from dolphinbeat_spark.operators.multimodal import decode_ppm, encode_ppm

    rgb = bytes(range(2 * 3 * 3))  # 3x2 image
    data = encode_ppm(3, 2, rgb)
    w, h, px = decode_ppm(data)
    assert (w, h) == (3, 2)
    assert px.tobytes() == rgb
    # comment lines in the header (emitted by many tools)
    commented = b"P6\n# made by a tool\n3 2\n255\n" + rgb
    w2, h2, px2 = decode_ppm(commented)
    assert (w2, h2) == (3, 2) and px2.tobytes() == rgb
    # whitespace-valued pixel bytes survive (single separator rule)
    rgb_ws = b"\n" * 18
    assert decode_ppm(encode_ppm(3, 2, rgb_ws))[2].tobytes() == rgb_ws
    assert np.ascontiguousarray(px).shape == (2, 3, 3)
    # STACKED comment lines (PPM allows any number consecutively)
    stacked = b"P6\n# one\n# two\n# three\n3 # inline\n2\n255\n" + rgb
    w3, h3, px3 = decode_ppm(stacked)
    assert (w3, h3) == (3, 2) and px3.tobytes() == rgb
    # maxval < 255 rescales to full range (samples are 0..maxval)
    lowval = b"P6\n3 2\n51\n" + bytes([51, 0, 17] * 6)
    _, _, pxl = decode_ppm(lowval)
    assert pxl.reshape(-1, 3)[0].tolist() == [255, 0, 85]


def test_bmp_roundtrip_with_padding_and_orientation():
    from dolphinbeat_spark.operators.multimodal import decode_bmp, encode_bmp

    # width 3 -> raw row 9 bytes -> stride 12 (3 pad bytes per row)
    rgb = bytes(range(2 * 3 * 3))
    data = encode_bmp(3, 2, rgb)
    w, h, px = decode_bmp(data)
    assert (w, h) == (3, 2)
    assert px.tobytes() == rgb  # bottom-up + BGR undone exactly
    # width 4 -> no padding
    rgb4 = bytes(range(96, 96 + 2 * 4 * 3))
    assert decode_bmp(encode_bmp(4, 2, rgb4))[2].tobytes() == rgb4


def test_decode_media_real_formats_and_compressed_raise(spark):
    import pytest as _pytest

    from dolphinbeat_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        encode_ppm,
    )

    rgb = bytes([7] * 48)  # 4x4
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(4, 4, rgb))), (2, bytearray(encode_bmp(4, 4, rgb)))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
    assert rows[1]["fmt"] == "ppm" and rows[2]["fmt"] == "bmp"
    assert rows[1]["pixel_sum"] == rows[2]["pixel_sum"] == 7 * 48
    assert rows[1]["pixel_md5"] == rows[2]["pixel_md5"]  # same decoded pixels
    assert rows[1]["width"] == rows[1]["height"] == 4

    # video containers still raise the honest codec-stub error
    video = spark.createDataFrame(
        [(3, bytearray(b"\x00\x00\x00\x18ftypisom-not-decodable"))],
        "media_id long, payload binary",
    )
    with _pytest.raises(Exception) as exc:
        decode_media(video).collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)
    # a JPEG header with garbage markers routes to the REAL decoder
    # (since r7) and fails as a typed decode error, not a stub
    badjpeg = spark.createDataFrame(
        [(4, bytearray(b"\xff\xd8\xff\xe0JFIF-not-decodable"))],
        "media_id long, payload binary",
    )
    with _pytest.raises(Exception) as exc:
        decode_media(badjpeg).collect()
    assert "JpegError" in str(exc.value) or "JPEG" in str(exc.value)


def test_decode_wav_validation():
    """The WAV decoder parses real RIFF containers and rejects
    malformed/unsupported variants loudly."""
    import struct

    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.multimodal import decode_wav

    def wav(samples: bytes, rate=8000, channels=1, bits=8, fmt=1):
        block = channels * bits // 8
        return (
            b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", fmt, channels, rate, rate * block, block, bits)
            + b"data" + struct.pack("<I", len(samples)) + samples
        )

    rate, ch, n, got = decode_wav(wav(bytes(range(100, 110))))
    assert (rate, ch, n) == (8000, 1, 10)
    assert np.array_equal(got, np.arange(100, 110, dtype=np.uint8))

    # 16-bit stereo (the common real-world shape): interleaved signed
    # little-endian int16 frames
    frames = np.array([[1000, -1000], [32767, -32768], [0, 7]], dtype="<i2")
    rate, ch, n, got = decode_wav(
        wav(frames.tobytes(), rate=44100, channels=2, bits=16)
    )
    assert (rate, ch, n) == (44100, 2, 6)
    assert np.array_equal(got, frames.reshape(-1))

    # 16-bit mono
    rate, ch, n, got = decode_wav(
        wav(np.array([-5, 5], dtype="<i2").tobytes(), bits=16)
    )
    assert (ch, n) == (1, 2) and list(got) == [-5, 5]

    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + b"\x00" * 60)  # wrong magic
    with pytest.raises(ValueError):
        decode_wav(wav(bytes(10))[:-5])  # truncated data chunk

    # r9 widenings: IEEE float, 24/32-bit PCM, >2 channels
    f = np.array([1.5, -2.25, 7.0], dtype="<f4")
    rate, ch, n, got = decode_wav(wav(f.tobytes(), bits=32, fmt=3))
    assert (ch, n) == (1, 3) and np.array_equal(got, f)
    f64 = np.array([0.125, -1e9], dtype="<f8")
    _, _, n, got = decode_wav(wav(f64.tobytes(), bits=64, fmt=3))
    assert n == 2 and np.array_equal(got, f64)
    raw24 = bytes([0x56, 0x34, 0x12, 0xFE, 0xFF, 0xFF])  # 0x123456, -2
    _, _, n, got = decode_wav(wav(raw24, bits=24))
    assert list(got) == [0x123456, -2] and got.dtype == np.int32
    i32 = np.array([2**31 - 1, -5], dtype="<i4")
    _, _, _, got = decode_wav(wav(i32.tobytes(), bits=32))
    assert list(got) == [2**31 - 1, -5]
    rate, ch, n, got = decode_wav(wav(bytes(12), channels=3, bits=8))
    assert (ch, n) == (3, 12)

    # G.711 mu-law / A-law decode via the published expansion tables
    # (validated against the stdlib audioop reference)
    import audioop  # deprecated but present in 3.11 -- independent ref

    allb = bytes(range(256))
    for fmt_tag, ref in ((7, audioop.ulaw2lin(allb, 2)),
                         (6, audioop.alaw2lin(allb, 2))):
        rate, ch, n, got = decode_wav(wav(allb, fmt=fmt_tag))
        assert n == 256 and got.dtype == np.int16
        assert got.tobytes() == ref

    # still honestly out of scope: perceptual/legacy codecs by name
    with pytest.raises(NotImplementedError, match="0x2"):
        decode_wav(wav(bytes(10), fmt=2))  # MS-ADPCM
    with pytest.raises(NotImplementedError, match="8-bit IEEE-float"):
        decode_wav(wav(bytes(10), fmt=3))  # nonsense float width
    # inconsistent header (block_align lies about the frame size)
    bad = bytearray(wav(bytes(8), channels=2, bits=16))
    bad[32] = 1  # block_align 1 vs 2ch x 16bit
    with pytest.raises(ValueError, match="inconsistent WAV header"):
        decode_wav(bytes(bad))
    # data not a whole number of frames
    with pytest.raises(ValueError, match="multiple"):
        decode_wav(wav(bytes(7), channels=2, bits=16))


def test_decode_wav_chunk_walker_and_extensible():
    """RIFF chunks before data (LIST/fact) are walked per spec;
    WAVE_FORMAT_EXTENSIBLE unwraps via the SubFormat GUID."""
    import struct

    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.multimodal import decode_wav

    s = np.array([100, -100, 7], dtype="<i2")
    fmtc = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    payload = (
        b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd: padded
        + b"data" + struct.pack("<I", 6) + s.tobytes()
    )
    d = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload
    rate, ch, n, got = decode_wav(d)
    assert (rate, ch, n) == (8000, 1, 3) and list(got) == [100, -100, 7]

    # extensible wrapping 16-bit PCM
    guid = struct.pack("<H", 1) + bytes.fromhex("000000001000800000aa00389b71")
    ext = struct.pack("<HHI", 0x16, 16, 3) + guid
    fmtc = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) + ext
    d = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmtc) + 8 + 4) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
        + b"data" + struct.pack("<I", 4)
        + np.array([5, -6], dtype="<i2").tobytes()
    )
    _, _, n, got = decode_wav(d)
    assert n == 2 and list(got) == [5, -6]
    # unregistered GUID raises by name
    bad = bytearray(d)
    i = d.index(bytes.fromhex("000000001000800000aa00389b71"))
    bad[i] = 0xAB
    with pytest.raises(NotImplementedError, match="GUID"):
        decode_wav(bytes(bad))


def test_decode_wav_ima_adpcm_against_reference_recursion():
    """IMA ADPCM blocks decode exactly per the published recursion —
    compared against an independent straight-line replay here, for
    mono and stereo, multi-block, and fact-chunk truncation."""
    import struct

    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.multimodal import (
        _IMA_INDEX,
        _IMA_STEPS,
        decode_wav,
    )

    def ref_decode(nibbles, pred, idx):
        out = []
        for nb in nibbles:
            st = _IMA_STEPS[idx]
            d = st >> 3
            if nb & 1:
                d += st >> 2
            if nb & 2:
                d += st >> 1
            if nb & 4:
                d += st
            if nb & 8:
                d = -d
            pred = max(-32768, min(32767, pred + d))
            idx = max(0, min(88, idx + _IMA_INDEX[nb]))
            out.append(pred)
        return out

    def ima_wav(blocks, channels, block_align, spb, fact=None):
        ext = struct.pack("<HH", 2, spb)
        fmtc = struct.pack(
            "<HHIIHH", 0x11, channels, 8000, 4096, block_align, 4
        ) + ext
        data = b"".join(blocks)
        body = b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
        if fact is not None:
            body += b"fact" + struct.pack("<II", 4, fact)
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    rng = np.random.RandomState(11)
    # mono, two blocks, block_align 12 → 16 nibbles/block, spb 17
    blocks, want = [], []
    for _ in range(2):
        pred = int(rng.randint(-30000, 30000))
        idx = int(rng.randint(0, 89))
        body = bytes(rng.randint(0, 256, 8).astype("u1"))
        nib = [x for b in body for x in (b & 0xF, b >> 4)]
        blocks.append(struct.pack("<hBB", pred, idx, 0) + body)
        want += [pred] + ref_decode(nib, pred, idx)
    rate, ch, n, got = decode_wav(ima_wav(blocks, 1, 12, 17))
    assert (ch, n) == (1, 34) and list(got) == want

    # stereo: words interleave L/R per 4 bytes
    pL, iL, pR, iR = -5, 3, 1000, 70
    bodyL1, bodyR1 = bytes([0x10, 0x32, 0x54, 0x76]), bytes([0x98, 0xBA, 0xDC, 0xFE])
    bodyL2, bodyR2 = bytes([0x01, 0x23, 0x45, 0x67]), bytes([0x89, 0xAB, 0xCD, 0xEF])
    blk = (
        struct.pack("<hBB", pL, iL, 0) + struct.pack("<hBB", pR, iR, 0)
        + bodyL1 + bodyR1 + bodyL2 + bodyR2
    )
    rate, ch, n, got = decode_wav(ima_wav([blk], 2, 24, 17))
    nibL = [x for b in bodyL1 + bodyL2 for x in (b & 0xF, b >> 4)]
    nibR = [x for b in bodyR1 + bodyR2 for x in (b & 0xF, b >> 4)]
    assert (ch, n) == (2, 34)
    assert list(got[0::2]) == [pL] + ref_decode(nibL, pL, iL)
    assert list(got[1::2]) == [pR] + ref_decode(nibR, pR, iR)

    # fact chunk truncates the logically-short last block
    rate, ch, n, got = decode_wav(ima_wav(blocks, 1, 12, 17, fact=20))
    assert n == 20 and list(got) == want[:20]
    with pytest.raises(ValueError, match="fact"):
        decode_wav(ima_wav(blocks, 1, 12, 17, fact=99))
    # malformed: step index > 88 in a block header
    bad = struct.pack("<hBB", 0, 89, 0) + bytes(8)
    with pytest.raises(ValueError, match="step index"):
        decode_wav(ima_wav([bad], 1, 12, 17))


def test_png_roundtrip_all_filters_and_color_types():
    """encode_png/decode_png over every color type x scanline filter
    combination, odd widths included (bpp-offset edge in Sub/Paeth),
    plus mixed per-row filters — decoded bytes must be identical."""
    import numpy as np

    from dolphinbeat_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for ct, ch in [(0, 1), (2, 3), (6, 4)]:
        for w, h in [(1, 1), (8, 4), (17, 5)]:
            px = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
            for filt in [0, 1, 2, 3, 4, [i % 5 for i in range(h)]]:
                data = encode_png(w, h, px, color_type=ct, row_filters=filt)
                w2, h2, arr = decode_png(data)
                assert (w2, h2) == (w, h)
                assert arr.tobytes() == px


def test_png_rejects_corruption_and_unsupported():
    import pytest

    from dolphinbeat_spark.operators.multimodal import decode_png, encode_png

    good = encode_png(4, 4, bytes(48), color_type=2)
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # flip a CRC byte
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + good[4:])
    # every spec-legal depth/color-type combination decodes since r9;
    # an out-of-spec interlace method is a typed format error
    import struct as s
    import zlib

    def mutated(pos, val):
        mut = bytearray(good)
        mut[pos] = val
        body = bytes(mut[12:16]) + bytes(mut[16:29])
        mut[29:33] = s.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        return bytes(mut)

    # IHDR body starts at 16 (sig 8 + len 4 + type 4); depth byte at +8.
    # Flipping depth to 16 or color type to gray+alpha on an 8-bit RGB
    # stream makes the stream length wrong for the geometry: loud
    for pos, val in [(16 + 8, 16), (16 + 9, 4)]:
        with pytest.raises(ValueError, match="pixel stream"):
            decode_png(mutated(pos, val))
    # spec-ILLEGAL combinations (Table 11.1) are typed format errors
    with pytest.raises(ValueError, match="invalid PNG bit depth"):
        decode_png(mutated(16 + 8, 4))  # depth 4 illegal for truecolor
    with pytest.raises(ValueError, match="invalid PNG color type"):
        decode_png(mutated(16 + 9, 5))
    with pytest.raises(ValueError, match="invalid PNG interlace"):
        decode_png(mutated(16 + 12, 2))
    # flipping a plain stream's interlace flag makes the stream length
    # wrong for the declared pass structure: loud, never misdecoded
    with pytest.raises(ValueError, match="interlaced pixel stream"):
        decode_png(mutated(16 + 12, 1))


def test_decode_media_sniffs_png(spark):
    """decode_media routes PNG payloads through the real codec beside
    PPM/BMP in one mixed batch."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        encode_png,
        encode_ppm,
    )

    rgb = bytes(range(96))
    rows = [
        (1, bytearray(encode_ppm(8, 4, rgb))),
        (2, bytearray(encode_bmp(8, 4, rgb))),
        (3, bytearray(encode_png(8, 4, rgb, row_filters=[4, 3, 2, 1]))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_media(df).collect()}
    want_md5 = hashlib.md5(rgb).hexdigest()
    want_sum = int(np.frombuffer(rgb, np.uint8).astype(np.int64).sum())
    assert {got[i]["fmt"] for i in (1, 2, 3)} == {"ppm", "bmp", "png"}
    for i in (1, 2, 3):
        assert got[i]["width"] == 8 and got[i]["height"] == 4
        assert got[i]["pixel_md5"] == want_md5
        assert got[i]["pixel_sum"] == want_sum


def test_gif_lzw_roundtrip_and_hand_vectors():
    """From-scratch GIF LZW codec: random index streams survive the
    encode→decode roundtrip (dictionary growth, width escalation,
    4096-entry reset), and the DECODER is pinned independently by
    hand-computed code-stream vectors (width growth + the KwKwK case)
    so a complementary encoder/decoder bug cannot hide."""
    import random
    import struct

    import numpy as np

    from dolphinbeat_spark.operators.multimodal import decode_gif, encode_gif

    rng = random.Random(11)
    for w, h in [(8, 4), (64, 64), (150, 90)]:
        n = w * h
        idx = bytearray()
        while len(idx) < n:
            if rng.random() < 0.5:
                idx += bytes(rng.randrange(256) for _ in range(rng.randrange(1, 20)))
            else:
                idx += bytes([rng.randrange(256)]) * rng.randrange(1, 50)
        idx = bytes(idx[:n])
        W, H, px = decode_gif(encode_gif(w, h, idx))
        assert (W, H) == (w, h)
        assert px[:, :, 0].tobytes() == idx  # identity palette: R = index
        assert (px[:, :, 0] == px[:, :, 2]).all()

    def tiny_gif(mcs, stream, w, h, gct_bits=1):
        nc = 2 << gct_bits
        hdr = b"GIF87a" + struct.pack("<HH", w, h) + bytes([0x80 | gct_bits, 0, 0])
        gct = bytes(v for i in range(nc) for v in (i, i, i))
        img = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        return hdr + gct + img + bytes([mcs]) + bytes([len(stream)]) + stream + b"\x00\x3b"

    # mcs=2: codes [clear,1,2,6,eoi] -> pixels 1 2 1 2 (slot 6=[1,2],
    # width grows to 4 bits before EOI); LSB-first packing = 8C 5C
    _, _, px = decode_gif(tiny_gif(2, bytes([0x8C, 0x5C]), 4, 1))
    assert list(px[0, :, 0]) == [1, 2, 1, 2]
    # codes [clear,1,6,eoi]: KwKwK -> 1 1 1; packing = 8C 0B
    _, _, px = decode_gif(tiny_gif(2, bytes([0x8C, 0x0B]), 3, 1))
    assert list(px[0, :, 0]) == [1, 1, 1]


def test_gif_honest_failures():
    import struct

    import pytest

    from dolphinbeat_spark.operators.multimodal import decode_gif, encode_gif

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE" + bytes(40))
    gif = bytearray(encode_gif(4, 1, bytes([1, 2, 3, 4])))
    # image descriptor sits after header(13) + 256-entry GCT(768)
    desc = 13 + 768
    assert gif[desc] == 0x2C
    # truncated LZW stream must fail loudly, not return short pixels
    trunc = bytes(gif[:desc + 12]) + b"\x01\x00\x00\x3b"
    with pytest.raises(ValueError):
        decode_gif(trunc)


def test_gif_interlace_and_local_color_table():
    """The 4-pass interlace row reorder and local-color-table override
    (both previously honest raises) decode correctly."""
    import numpy as np

    from dolphinbeat_spark.operators.multimodal import decode_gif, encode_gif

    # target 4x9 image; write its rows in interlace ARRIVAL order with
    # a plain encoder, then set the descriptor's interlace flag — the
    # decoder must scatter them back to the target order
    h, w = 9, 4
    target = (np.arange(h * w, dtype=np.uint8)).reshape(h, w)
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    arrival = target[order]  # rows as they appear in the stream
    gif = bytearray(encode_gif(w, h, arrival.tobytes()))
    desc = 13 + 768
    gif[desc + 9] |= 0x40
    W, H, px = decode_gif(bytes(gif))
    assert (W, H) == (w, h)
    assert (px[:, :, 0] == target).all()

    # local color table: insert a 2-bit LCT after the descriptor and
    # flag it; indexes then resolve through the LOCAL palette
    base = bytearray(encode_gif(2, 2, bytes([0, 1, 2, 3])))
    lct = bytes(v for i in range(4) for v in (10 * i, 200 - i, i))
    out = bytearray(base[:desc + 10])
    out[desc + 9] |= 0x80 | 0x01  # LCT present, 4 entries
    out += lct + base[desc + 10:]
    W, H, px = decode_gif(bytes(out))
    exp = np.frombuffer(lct, np.uint8).reshape(4, 3)[
        np.array([0, 1, 2, 3])
    ].reshape(2, 2, 3)
    assert (px == exp).all()


def test_png_palette_indexed_roundtrip():
    """Color type 3 (indexed): PLTE indirection maps each index to its
    RGB triple through the same unfilter paths; missing PLTE and
    out-of-palette indexes are typed errors."""
    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.multimodal import decode_png, encode_png

    pal = bytes(v for i in range(64) for v in ((i * 3) % 256, i, 255 - i))
    idx = bytes([0, 1, 2, 63, 17, 33, 40, 41] * 4)
    png = encode_png(8, 4, idx, color_type=3, row_filters=[0, 1, 2, 4], palette=pal)
    w, h, px = decode_png(png)
    exp = np.frombuffer(pal, np.uint8).reshape(64, 3)[
        np.frombuffer(idx, np.uint8)
    ].reshape(4, 8, 3)
    assert (w, h) == (8, 4) and (px == exp).all()
    # index beyond the palette
    with pytest.raises(ValueError, match="beyond PLTE"):
        decode_png(encode_png(2, 1, bytes([0, 64]), color_type=3, palette=pal))
    # dropping the PLTE chunk (12-byte overhead + 192 body) is an error
    bad = png[:33] + png[33 + 12 + len(pal):]
    with pytest.raises(ValueError, match="missing its PLTE"):
        decode_png(bad)


def test_png_full_depth_matrix_roundtrip():
    """Every spec-legal (color type, bit depth) IHDR combination
    roundtrips through the real writer and decoder: 16-bit BE samples
    (filters at doubled bpp), sub-byte MSB-first packing with
    row-padding bits at a non-byte-aligned width, gray+alpha, and the
    exact 255/(2^d-1) range expansion for sub-byte grayscale — both
    plain and Adam7-interlaced."""
    import numpy as np

    from dolphinbeat_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(11)

    # 16-bit: all four sample layouts, every filter, plus Adam7
    for ct, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        want = rng.randint(0, 65536, (13, 21, ch), dtype=np.uint16)
        raw = want.astype(">u2").tobytes()
        for filt in (0, 1, 2, 3, 4):
            w, h, px = decode_png(
                encode_png(21, 13, raw, color_type=ct, depth=16,
                           row_filters=filt)
            )
        assert (w, h, px.dtype) == (21, 13, np.uint16)
        assert np.array_equal(px, want), ct
        _, _, px = decode_png(
            encode_png(21, 13, raw, color_type=ct, depth=16, interlace=True)
        )
        assert np.array_equal(px, want), ("adam7", ct)

    # sub-byte grayscale: scaling + padding bits (width 19)
    for dep in (1, 2, 4):
        vals = rng.randint(0, 1 << dep, (7, 19), dtype=np.uint8)
        scale = 255 // ((1 << dep) - 1)
        for filt in (0, 2, 4):
            _, _, px = decode_png(
                encode_png(19, 7, vals.tobytes(), color_type=0, depth=dep,
                           row_filters=filt)
            )
            assert np.array_equal(px.reshape(7, 19), vals * scale), (dep, filt)
        _, _, px = decode_png(
            encode_png(19, 7, vals.tobytes(), color_type=0, depth=dep,
                       interlace=True)
        )
        assert np.array_equal(px.reshape(7, 19), vals * scale), ("adam7", dep)

    # sub-byte indexed: raw PLTE indices, no scaling
    pal = bytes(rng.randint(0, 256, 16 * 3, dtype=np.uint8))
    want_pal = np.frombuffer(pal, np.uint8).reshape(-1, 3)
    for dep in (1, 2, 4):
        idx = rng.randint(0, 1 << dep, (7, 19), dtype=np.uint8)
        _, _, px = decode_png(
            encode_png(19, 7, idx.tobytes(), color_type=3, depth=dep,
                       palette=pal)
        )
        assert np.array_equal(px, want_pal[idx]), dep

    # gray+alpha 8-bit with the Paeth filter
    ga = rng.randint(0, 256, (6, 10, 2), dtype=np.uint8)
    _, _, px = decode_png(
        encode_png(10, 6, ga.tobytes(), color_type=4, row_filters=4)
    )
    assert np.array_equal(px, ga)

    # encoder rejects out-of-depth samples and illegal combinations
    import pytest

    with pytest.raises(ValueError, match="exceeds"):
        encode_png(4, 1, bytes([9, 0, 0, 0]), color_type=0, depth=2)
    with pytest.raises(ValueError, match="invalid PNG bit depth"):
        encode_png(4, 1, bytes(12), color_type=2, depth=4)


def test_png_adam7_interlaced_roundtrip():
    """Adam7 deinterlacing: 7 independently-filtered sub-images scatter
    back to the exact original pixels across odd sizes (partial passes,
    empty passes at 1x1) and color types incl. indexed."""
    import numpy as np

    from dolphinbeat_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for w, h, ct in [(8, 4, 2), (13, 7, 0), (16, 16, 6), (1, 1, 2), (9, 2, 2)]:
        ch = {0: 1, 2: 3, 6: 4}[ct]
        px = rng.integers(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
        W, H, out = decode_png(encode_png(w, h, px, color_type=ct, interlace=True))
        assert (W, H, out.tobytes()) == (w, h, px), (w, h, ct)
    pal = bytes(v for i in range(16) for v in (i, i * 2 % 256, 255 - i))
    idx = bytes(rng.integers(0, 16, size=10 * 6, dtype=np.uint8))
    _, _, out = decode_png(
        encode_png(10, 6, idx, color_type=3, palette=pal, interlace=True)
    )
    exp = np.frombuffer(pal, np.uint8).reshape(16, 3)[
        np.frombuffer(idx, np.uint8)
    ].reshape(6, 10, 3)
    assert (out == exp).all()


# -- baseline JPEG (from-scratch, ITU-T T.81) --------------------------


def _hand_jpeg(entropy: bytes, q: int = 16) -> bytes:
    """A minimal 8x8 grayscale baseline JPEG built BY HAND (markers +
    Annex K tables), independent of encode_jpeg."""
    import struct

    from dolphinbeat_spark.operators import jpeg as J

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([q] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht = (
        seg(0xC4, bytes([0x00]) + bytes(J.HUFF_DC_LUMA[0]) + bytes(J.HUFF_DC_LUMA[1]))
        + seg(0xC4, bytes([0x10]) + bytes(J.HUFF_AC_LUMA[0]) + bytes(J.HUFF_AC_LUMA[1]))
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"


def test_jpeg_decoder_pinned_by_hand_bitstream():
    """DC-only blocks decoded from HAND-ASSEMBLED entropy bits using
    the PUBLISHED canonical codes (DC-luma cat2='011', cat3='100';
    AC-luma EOB='1010') — pins Huffman construction, EXTEND, dequant,
    the IDCT DC scaling and level shift independently of the encoder."""
    from dolphinbeat_spark.operators.jpeg import decode_jpeg

    # diff=+5: cat 3 -> '100' + '101'; EOB '1010' => 1001011010 + 1-pad
    w, h, px = decode_jpeg(_hand_jpeg(bytes([0b10010110, 0b10111111])))
    assert (w, h) == (8, 8)
    assert set(px.reshape(-1).tolist()) == {2 * 5 + 128}
    # diff=-3: cat 2 -> '011' + bits (-3 + 3 = 0) '00'; EOB => 011001010
    w, h, px = decode_jpeg(_hand_jpeg(bytes([0b01100101, 0b01111111])))
    assert set(px.reshape(-1).tolist()) == {2 * -3 + 128}


def test_jpeg_roundtrip_and_closed_form():
    """Flat images decode to the closed-form dequantized DC value
    (exactly v when (v-128) is even, quant 16); smooth images bound
    reconstruction error; odd sizes exercise edge padding; color goes
    through YCbCr both ways."""
    import numpy as np

    from dolphinbeat_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for v in (64, 130, 200):  # even offsets from 128: lossless DC
        _, _, px = decode_jpeg(encode_jpeg(16, 8, bytes([v]) * 128, gray=True))
        assert set(px.reshape(-1).tolist()) == {v}
    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    smooth = (128 + 60 * np.sin(xx / 10) * np.cos(yy / 8)).astype(np.uint8)
    _, _, px = decode_jpeg(encode_jpeg(32, 24, smooth.tobytes(), gray=True))
    err = np.abs(px.reshape(24, 32).astype(int) - smooth.astype(int))
    assert err.mean() < 3 and err.max() <= 12
    rgb = np.stack([smooth, 255 - smooth, smooth // 2], axis=-1).astype(np.uint8)
    w, h, px = decode_jpeg(encode_jpeg(32, 24, rgb.tobytes()))
    assert (w, h) == (32, 24) and px.shape == (24, 32, 3)
    err = np.abs(px.astype(int) - rgb.astype(int))
    assert err.mean() < 6, err.mean()
    odd = (np.arange(13 * 5) % 256).astype(np.uint8)
    w, h, px = decode_jpeg(encode_jpeg(13, 5, odd.tobytes(), gray=True))
    assert (w, h) == (13, 5) and px.shape == (5, 13, 1)


def test_jpeg_chroma_subsampling_420():
    """4:2:0 — the wild-JPEG default: MCU of 4 luma + 2 chroma blocks,
    half-resolution chroma upsampled by replication. Flat color decodes
    exactly (DC-lossless for even offsets on all planes); smooth color
    stays within the quantization error band; odd sizes pad to 16."""
    import numpy as np

    from dolphinbeat_spark.operators.jpeg import decode_jpeg, encode_jpeg

    flat = np.full((16, 16, 3), 130, np.uint8)
    w, h, px = decode_jpeg(encode_jpeg(16, 16, flat.tobytes(), subsample="420"))
    assert set(px.reshape(-1).tolist()) == {130}
    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    smooth = (128 + 60 * np.sin(xx / 10) * np.cos(yy / 8)).astype(np.uint8)
    rgb = np.stack([smooth, 255 - smooth, smooth // 2], axis=-1).astype(np.uint8)
    w, h, px = decode_jpeg(encode_jpeg(32, 24, rgb.tobytes(), subsample="420"))
    err = np.abs(px.astype(int) - rgb.astype(int))
    assert (w, h) == (32, 24) and err.mean() < 8, err.mean()
    w, h, px = decode_jpeg(
        encode_jpeg(18, 10, np.full(18 * 10 * 3, 130, np.uint8).tobytes(),
                    subsample="420")
    )
    assert (w, h) == (18, 10) and set(px.reshape(-1).tolist()) == {130}


def test_jpeg_honest_failures():
    import struct

    import pytest

    from dolphinbeat_spark.operators.jpeg import JpegError, decode_jpeg, encode_jpeg

    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"NOPE")
    good = bytearray(encode_jpeg(8, 8, bytes(64), gray=True))
    # SOF0 -> SOF3 (lossless) — progressive SOF2 decodes since r8
    i = good.index(b"\xff\xc0")
    lossless = bytearray(good)
    lossless[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(lossless))
    # SOF0 -> SOF2 with the baseline's full-band interleaved scan is
    # NOT a valid progressive stream (DC scan must have Se=0): typed
    prog = bytearray(good)
    prog[i + 1] = 0xC2
    with pytest.raises(JpegError, match="DC scan"):
        decode_jpeg(bytes(prog))
    # out-of-range sampling factors (3x1; 1 and 2 are supported)
    sub = bytearray(good)
    sub[i + 11] = 0x31
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_jpeg(bytes(sub))
    # truncated entropy stream
    with pytest.raises((JpegError, IndexError)) as exc:
        decode_jpeg(bytes(good[:-8]))
    # a DRI segment now DECODES (r9); an interval the 1-MCU image never
    # reaches changes nothing
    dri = (bytes(good[:2]) + b"\xff\xdd" + struct.pack(">H", 4)
           + struct.pack(">H", 8) + bytes(good[2:]))
    import numpy as np

    assert np.array_equal(decode_jpeg(dri)[2], decode_jpeg(bytes(good))[2])


def test_codec_fuzz_typed_errors_only():
    """Robustness contract for the r7 codecs: random single-byte
    corruption and truncation of valid GIF/JPEG payloads either still
    decodes (JPEG's entropy data carries no integrity check — flips
    there legitimately change pixels) or raises a TYPED error
    (ValueError/JpegError/NotImplementedError) — never a foreign
    IndexError/struct.error/KeyError crash."""
    import random

    import numpy as np

    from dolphinbeat_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from dolphinbeat_spark.operators.multimodal import decode_gif, encode_gif

    rng = random.Random(19)
    xx, yy = np.meshgrid(np.arange(24), np.arange(16))
    smooth = (128 + 50 * np.sin(xx / 7) * np.cos(yy / 5)).astype(np.uint8)
    from dolphinbeat_spark.operators.jpeg import encode_jpeg_progressive

    payloads = [
        ("gif", encode_gif(24, 16, smooth.tobytes()), decode_gif),
        ("jpeg", encode_jpeg(24, 16, smooth.tobytes(), gray=True), decode_jpeg),
        ("jpeg-prog",
         encode_jpeg_progressive(24, 16, smooth.tobytes(), gray=True),
         decode_jpeg),
    ]
    for name, data, dec in payloads:
        for _ in range(120):
            mut = bytearray(data)
            i = rng.randrange(len(mut))
            mut[i] ^= 1 << rng.randrange(8)
            try:
                dec(bytes(mut))
            except (ValueError, NotImplementedError):
                pass  # typed: the contract (JpegError is a ValueError)
        for _ in range(30):
            cut = rng.randrange(1, len(data))
            try:
                dec(bytes(data[:cut]))
            except (ValueError, NotImplementedError):
                pass


def test_gif89a_extension_blocks_skipped():
    """GIF89a files carry extension blocks (Graphic Control, comment)
    before the image descriptor; the decoder skips them by sub-block
    length and still decodes the image."""
    from dolphinbeat_spark.operators.multimodal import decode_gif, encode_gif

    base = bytearray(encode_gif(4, 2, bytes([1, 2, 3, 4, 5, 6, 7, 8])))
    base[:6] = b"GIF89a"
    desc = 13 + 768
    assert base[desc] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"          # graphic control
    comment = b"\x21\xfe\x05hello\x00"                  # comment extension
    data = bytes(base[:desc]) + gce + comment + bytes(base[desc:])
    w, h, px = decode_gif(data)
    assert (w, h) == (4, 2)
    assert px[:, :, 0].tobytes() == bytes([1, 2, 3, 4, 5, 6, 7, 8])


# -- progressive JPEG (SOF2, Annex G) ----------------------------------


def test_jpeg_progressive_matches_baseline_decode():
    """A progressive re-encoding of an image carries the SAME
    quantized coefficients as the baseline encoding, only split across
    scans — so both must decode to BIT-IDENTICAL pixels. Covers gray,
    4:4:4 color and 4:2:0 (non-interleaved AC over the subsampled
    component's true block grid), plus flat closed form and odd sizes
    (padding blocks coded only in the interleaved DC scan)."""
    import numpy as np

    from dolphinbeat_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    for v in (64, 130, 200):
        _, _, px = decode_jpeg(
            encode_jpeg_progressive(16, 8, bytes([v]) * 128, gray=True)
        )
        assert set(px.reshape(-1).tolist()) == {v}

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=29 * 13, dtype=np.uint8).tobytes()
    _, _, b0 = decode_jpeg(encode_jpeg(29, 13, gray, gray=True))
    w, h, p0 = decode_jpeg(encode_jpeg_progressive(29, 13, gray, gray=True))
    assert (w, h) == (29, 13) and (b0 == p0).all()

    rgb = rng.integers(0, 256, size=20 * 12 * 3, dtype=np.uint8).tobytes()
    _, _, b1 = decode_jpeg(encode_jpeg(20, 12, rgb))
    _, _, p1 = decode_jpeg(encode_jpeg_progressive(20, 12, rgb))
    assert (b1 == p1).all()

    rgb2 = rng.integers(0, 256, size=27 * 21 * 3, dtype=np.uint8).tobytes()
    _, _, b2 = decode_jpeg(encode_jpeg(27, 21, rgb2, subsample="420"))
    _, _, p2 = decode_jpeg(encode_jpeg_progressive(27, 21, rgb2, subsample="420"))
    assert (b2 == p2).all()


def test_jpeg_progressive_refinement_hand_bitstream():
    """AC successive approximation decoded from HAND-ASSEMBLED scans,
    independent of any encoder (the progressive encoder deliberately
    emits no AC refinement scans, so this path is pinned only here):

    scan 1  DC first    Ss=0 Se=0 Ah=0 Al=0: diff=0 ('00' cat0)
    scan 2  AC first    Ss=1 Se=63 Ah=0 Al=1: k=1 value +1 -> coef 2
            ('00' sym 0x01, '1' magnitude, '1010' EOB)
    scan 3  AC refine   Ss=1 Se=63 Ah=1 Al=0:
            '00' sym 0x01 + sign '1' (new +1) -> correction '0' for
            the nonzero k=1, newly-significant k=2, then '1010' EOB0
            => coef[1] stays 2, coef[2] becomes 1

    Expected pixels = IDCT of {zz1: 2*16, zz2: 1*16} + 128 from the
    published orthonormal basis."""
    import struct

    import numpy as np

    from dolphinbeat_spark.operators import jpeg as J

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(ss, se, ah, al, entropy):
        return (
            seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])) + entropy
        )

    dqt = seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht = (
        seg(0xC4, bytes([0x00]) + bytes(J.HUFF_DC_LUMA[0]) + bytes(J.HUFF_DC_LUMA[1]))
        + seg(0xC4, bytes([0x10]) + bytes(J.HUFF_AC_LUMA[0]) + bytes(J.HUFF_AC_LUMA[1]))
    )
    data = (
        b"\xff\xd8" + dqt + sof + dht
        + sos(0, 0, 0, 0, bytes([0b00111111]))   # DC diff=0
        + sos(1, 63, 0, 1, bytes([0b00110101]))  # AC first: coef[1]=1<<1
        + sos(1, 63, 1, 0, bytes([0b00101010]))  # AC refine: +coef[2]=1
        + b"\xff\xd9"
    )
    w, h, px = J.decode_jpeg(data)
    assert (w, h) == (8, 8)
    nat = np.zeros(64)
    nat[J.ZIGZAG[1]] = 2 * 16
    nat[J.ZIGZAG[2]] = 1 * 16
    exp = J._DCT_M.T @ nat.reshape(8, 8) @ J._DCT_M + 128.0
    exp = np.clip(np.round(exp), 0, 255).astype(np.uint8)
    assert (px.reshape(8, 8) == exp).all()

    # refinement correction bit flips an established coefficient up:
    # scan 3' emits EOB0 immediately, correction bit '1' for k=1
    # => coef[1] 2 -> 3
    data2 = (
        b"\xff\xd8" + dqt + sof + dht
        + sos(0, 0, 0, 0, bytes([0b00111111]))
        + sos(1, 63, 0, 1, bytes([0b00110101]))
        + sos(1, 63, 1, 0, bytes([0b10101111]))  # EOB0 then bit=1
        + b"\xff\xd9"
    )
    _, _, px2 = J.decode_jpeg(data2)
    nat2 = np.zeros(64)
    nat2[J.ZIGZAG[1]] = 3 * 16
    exp2 = J._DCT_M.T @ nat2.reshape(8, 8) @ J._DCT_M + 128.0
    exp2 = np.clip(np.round(exp2), 0, 255).astype(np.uint8)
    assert (px2.reshape(8, 8) == exp2).all()


def test_jpeg_progressive_dc_refinement_and_eob_runs():
    """Multi-block coverage: a 32x8 gray flat-ish image whose encoder
    output necessarily carries DC successive approximation (Al=1 then
    the Ah=1 bit scan) and cross-block EOB runs in the AC scans; and
    v=101 (odd offset from 128) pins that the DC refinement bit
    restores the low bit the first scan dropped."""
    from dolphinbeat_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    # (101-128)*8/16 = -13.5 -> DC coef -14 (banker's to even) = odd:
    # Al=1 first scan carries -7, the refinement bit the trailing 0/1
    img = bytes([101]) * 256
    _, _, base = decode_jpeg(encode_jpeg(32, 8, img, gray=True))
    _, _, prog = decode_jpeg(encode_jpeg_progressive(32, 8, img, gray=True))
    assert (base == prog).all()


def test_jpeg_dri_baseline_and_progressive_roundtrip():
    """DRI + RSTn decode identity: restart markers partition the
    entropy data but must not change a single pixel — baseline 4:4:4,
    baseline 4:2:0, progressive (restarts in DC first / AC band / DC
    refinement scans), gray progressive."""
    import numpy as np

    from dolphinbeat_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    w, h = 40, 24
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
    assert np.array_equal(
        decode_jpeg(encode_jpeg(w, h, px, restart_interval=4))[2],
        decode_jpeg(encode_jpeg(w, h, px))[2],
    )
    assert np.array_equal(
        decode_jpeg(encode_jpeg(w, h, px, subsample="420", restart_interval=2))[2],
        decode_jpeg(encode_jpeg(w, h, px, subsample="420"))[2],
    )
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(w, h, px, restart_interval=3))[2],
        decode_jpeg(encode_jpeg_progressive(w, h, px))[2],
    )
    g = rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes()
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(w, h, g, gray=True, restart_interval=2))[2],
        decode_jpeg(encode_jpeg_progressive(w, h, g, gray=True))[2],
    )


def test_jpeg_dri_fuzz_typed_errors():
    """Misplaced, out-of-sequence, and missing RSTn all raise typed
    JpegError naming the marker — never a foreign crash."""
    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.jpeg import JpegError, decode_jpeg, encode_jpeg

    rng = np.random.default_rng(13)
    w, h = 40, 24
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
    good = encode_jpeg(w, h, px, restart_interval=4)

    # wrong sequence index (RST5 where RST0 due)
    buf = bytearray(good)
    i = buf.find(b"\xff\xd0", 100)
    assert i > 0
    buf[i + 1] = 0xD5
    with pytest.raises(JpegError, match="out of sequence"):
        decode_jpeg(bytes(buf))

    # DRI removed but markers still in the scan: misplaced RSTn by name
    nodri = bytearray(good)
    j = nodri.find(b"\xff\xdd")
    del nodri[j:j + 6]
    with pytest.raises(JpegError, match="misplaced restart"):
        decode_jpeg(bytes(nodri))

    # marker deleted where one is due: the decoder either reports the
    # missing/garbled restart structure or a downstream entropy error —
    # always typed
    nomark = bytearray(good)
    del nomark[i:i + 2]
    with pytest.raises(JpegError):
        decode_jpeg(bytes(nomark))

    # truncated DRI segment
    import struct as _s

    shortdri = (good[:2] + b"\xff\xdd" + _s.pack(">H", 3) + b"\x01" + good[2:])
    with pytest.raises(JpegError, match="DRI"):
        decode_jpeg(bytes(shortdri))


def test_jpeg_12bit_extended_sequential():
    """12-bit precision (SOF1 extended sequential): 16-bit DQT entries,
    level shift 2048, uint16 output; flat even values round-trip
    exactly (lossless DC quantization closed form); 12-bit baseline
    SOF0 is rejected as malformed per T.81 Table B.2."""
    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.jpeg import (
        JpegError,
        decode_jpeg,
        encode_jpeg,
    )

    for v in (2, 1984, 2048, 2110, 4094):
        px = np.full(16 * 8, v, dtype="<u2").tobytes()
        w, h, out = decode_jpeg(encode_jpeg(16, 8, px, gray=True,
                                            precision=12))
        assert (w, h) == (16, 8) and out.dtype == np.uint16
        assert (out == v).all()

    # restart markers interoperate with 12-bit scans
    px = np.full(128, 2046, dtype="<u2").tobytes()
    d = encode_jpeg(16, 8, px, gray=True, precision=12, restart_interval=1)
    assert (decode_jpeg(d)[2] == 2046).all()

    # textured content: reconstruction error bounded by quantization
    rng = np.random.RandomState(3)
    img = rng.randint(0, 4096, 24 * 16).astype("<u2")
    w, h, out = decode_jpeg(
        encode_jpeg(24, 16, img.tobytes(), gray=True, precision=12)
    )
    err = np.abs(out.reshape(-1).astype(int) - img.astype(int))
    assert err.max() < 300  # q-table bounded; measured ~67

    # 12-bit SOF0 = malformed stream, not a capability gap
    good = bytearray(encode_jpeg(16, 8, np.full(128, 2000, "<u2").tobytes(),
                                 gray=True, precision=12))
    i = good.index(b"\xff\xc1")
    good[i + 1] = 0xC0
    with pytest.raises(JpegError, match="baseline SOF0"):
        decode_jpeg(bytes(good))

    # still-unsupported precision raises by name
    bad = bytearray(encode_jpeg(16, 8, bytes(128), gray=True))
    j = bad.index(b"\xff\xc0")
    bad[j + 4] = 10  # SOF precision byte
    with pytest.raises(NotImplementedError, match="10-bit"):
        decode_jpeg(bytes(bad))


def _arith_fixture(name):
    import pathlib

    return (pathlib.Path(__file__).parent / "fixtures" / "arith" / name).read_bytes()


def _parse_harness_coefs(blob):
    """tools/jpeg_arith_harness.c `coefs` dump -> per-component
    (height_blocks, width_blocks, 64) int arrays in natural order."""
    import struct

    import numpy as np

    comps, off = [], 0
    while off < len(blob):
        _, hb, wb = struct.unpack_from("<3i", blob, off)
        off += 12
        comps.append(
            np.frombuffer(blob, "<i2", hb * wb * 64, off)
            .reshape(hb, wb, 64).astype(np.int64)
        )
        off += hb * wb * 128
    return comps


def test_jpeg_arith_decodes_libjpeg_coefficients_exactly():
    """The QM decoder (T.81 Annex D) reproduces libjpeg's — the public
    spec's reference implementation's — quantized coefficients
    bit-for-bit on a committed SOF9 fixture. Coefficient-level, so the
    pin is on the ENTROPY layer, independent of IDCT rounding."""
    import struct

    import numpy as np

    from dolphinbeat_spark.operators.jpeg import ZIGZAG, decode_jpeg
    from dolphinbeat_spark.operators.jpeg_arith import SeqArithScan, parse_dac

    jpg = _arith_fixture("gray_rand.jpg")
    want = _parse_harness_coefs(_arith_fixture("gray_rand.coefs"))[0]

    # minimal marker walk to the scan header
    pos, dc_cond, ac_cond = 2, {}, {}
    while True:
        marker = jpg[pos + 1]
        seglen = struct.unpack_from(">H", jpg, pos + 2)[0]
        if marker == 0xDA:
            ent = pos + 2 + seglen
            break
        if marker == 0xCC:
            d, a = parse_dac(jpg[pos + 4:pos + 2 + seglen])
            dc_cond.update(d)
            ac_cond.update(a)
        pos += 2 + seglen
    sc = SeqArithScan(jpg, ent, 1, dc_cond, ac_cond)
    for by in range(want.shape[0]):
        for bx in range(want.shape[1]):
            nat = np.zeros(64, np.int64)
            nat[ZIGZAG] = sc.read_zz(0, 0, 0)
            assert np.array_equal(nat, want[by, bx]), (by, bx)

    # and the full pixel decode runs on both committed fixtures,
    # including RGB 4:2:0 with restart interval 2
    w, h, px = decode_jpeg(jpg)
    assert (w, h, px.shape) == (64, 64, (64, 64, 1))
    w, h, px = decode_jpeg(_arith_fixture("rgb420_dri2.jpg"))
    assert (w, h, px.shape) == (48, 32, (32, 48, 3))


def test_jpeg_arith_roundtrip_matches_huffman_decode():
    """Arithmetic and Huffman encodings of the same image carry the
    same quantized coefficients, so both must decode BIT-IDENTICAL —
    the same cross-mode pin the progressive tests use."""
    import numpy as np

    from dolphinbeat_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from dolphinbeat_spark.operators.jpeg_arith import encode_jpeg_arith

    rng = np.random.RandomState(42)
    for kw in (
        dict(gray=True),
        dict(gray=True, restart_interval=3),
        dict(subsample="444"),
        dict(subsample="420"),
        dict(subsample="420", restart_interval=2),
    ):
        ch = 1 if kw.get("gray") else 3
        raw = rng.randint(0, 256, 40 * 56 * ch, dtype=np.uint8).tobytes()
        arith = decode_jpeg(encode_jpeg_arith(56, 40, raw, **kw))[2]
        huff = decode_jpeg(encode_jpeg(56, 40, raw, **kw))[2]
        assert np.array_equal(arith, huff), kw

    # flat grayscale at even offsets from 128: lossless DC closed form
    # (same pin as test_jpeg_roundtrip_and_closed_form)
    for v in (64, 130, 200):
        w, h, px = decode_jpeg(encode_jpeg_arith(16, 8, bytes([v]) * 128,
                                                 gray=True))
        assert (w, h) == (16, 8) and set(px.reshape(-1).tolist()) == {v}


def test_jpeg_arith_progressive_decodes_libjpeg_coefficients_exactly():
    """SOF10 (progressive arithmetic, T.81 Annex G.2) reproduces
    libjpeg's quantized coefficients bit-for-bit on committed fixtures
    written by libjpeg's own jpeg_simple_progression script — which
    includes AC successive-approximation scans — both grayscale and
    RGB 4:2:0 with a restart interval. The pin drives the real marker
    walk and captures the accumulated coefficient planes just before
    reconstruction."""
    import numpy as np

    from dolphinbeat_spark.operators import jpeg as J
    from dolphinbeat_spark.operators.jpeg import ZIGZAG, decode_jpeg

    for name in ("gray_rand_prog", "rgb420_prog_dri2"):
        jpg = _arith_fixture(f"{name}.jpg")
        want = _parse_harness_coefs(_arith_fixture(f"{name}.coefs"))
        captured = {}
        orig = J._ProgState.reconstruct

        def capture(self, quant, precision=8):
            captured["coefs"] = [c.copy() for c in self.coefs]
            return orig(self, quant, precision)

        J._ProgState.reconstruct = capture
        try:
            w, h, px = decode_jpeg(jpg)
        finally:
            J._ProgState.reconstruct = orig
        assert (w, h) == ((64, 64) if name.startswith("gray") else (48, 32))
        for ci, wc in enumerate(want):
            got = captured["coefs"][ci]
            assert got.shape[:2] == wc.shape[:2], (name, ci)
            for by in range(wc.shape[0]):
                for bx in range(wc.shape[1]):
                    nat = np.zeros(64, np.int64)
                    nat[ZIGZAG] = got[by, bx]
                    assert np.array_equal(nat, wc[by, bx]), (name, ci, by, bx)


def test_jpeg_arith_progressive_roundtrip_matches_huffman_decode():
    """Our own SOF10 writer (DC first/refine + AC first/refine scans,
    exercising all four G.2 procedures) decodes bit-identical to the
    Huffman encoding of the same image — the coefficients are the
    same, so the pixels must be."""
    import numpy as np

    from dolphinbeat_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from dolphinbeat_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    rng = np.random.RandomState(43)
    for kw in (
        dict(gray=True),
        dict(gray=True, restart_interval=3),
        dict(subsample="444"),
        dict(subsample="420", restart_interval=2),
    ):
        ch = 1 if kw.get("gray") else 3
        raw = rng.randint(0, 256, 40 * 56 * ch, dtype=np.uint8).tobytes()
        pa = decode_jpeg(encode_jpeg_arith_progressive(56, 40, raw, **kw))[2]
        hu = decode_jpeg(encode_jpeg(56, 40, raw, **kw))[2]
        assert np.array_equal(pa, hu), kw

    # flat grayscale: lossless DC closed form survives the progressive
    # successive-approximation path (DC first Al=1 + DC refine)
    for v in (64, 130, 200):
        w, h, px = decode_jpeg(
            encode_jpeg_arith_progressive(16, 8, bytes([v]) * 128, gray=True)
        )
        assert (w, h) == (16, 8) and set(px.reshape(-1).tolist()) == {v}


def test_jpeg_arith_honest_failures():
    """Unsupported arithmetic shapes raise by name; malformed DAC and
    restart sequences surface as typed JpegError."""
    import pytest

    from dolphinbeat_spark.operators.jpeg import JpegError, decode_jpeg
    from dolphinbeat_spark.operators.jpeg_arith import encode_jpeg_arith

    good = bytearray(encode_jpeg_arith(16, 8, bytes(128), gray=True))
    i = good.index(b"\xff\xc9")

    # SOF11 lossless-arithmetic: still a named capability boundary
    # (SOF10 progressive decodes since the Annex G.2 procedures landed
    # — a sequential stream re-marked SOF10 is instead a MALFORMED
    # progressive stream: its full-band interleaved scan is typed)
    lossless = bytearray(good)
    lossless[i + 1] = 0xCB
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(lossless))
    remarked = bytearray(good)
    remarked[i + 1] = 0xCA
    with pytest.raises(JpegError, match="Se"):
        decode_jpeg(bytes(remarked))

    # DAC with Kx=0 (valid range 1..63)
    j = good.index(b"\xff\xcc")
    bad_dac = bytearray(good)
    assert bad_dac[j + 4] == 0x00 and bad_dac[j + 6] == 0x10
    bad_dac[j + 7] = 0  # AC Cs byte
    with pytest.raises(JpegError, match="Kx"):
        decode_jpeg(bytes(bad_dac))

    # wrong RSTn sequence index
    dri = bytearray(encode_jpeg_arith(32, 8, bytes(256), gray=True,
                                      restart_interval=1))
    k = dri.index(b"\xff\xd0")
    dri[k + 1] = 0xD5
    with pytest.raises(JpegError, match="RST0"):
        decode_jpeg(bytes(dri))

    # truncation inside the scan header region stays a typed error
    with pytest.raises((JpegError, NotImplementedError)):
        decode_jpeg(bytes(good[: good.index(b"\xff\xda") + 3]))


def test_jpeg_arith_header_fuzz_typed_errors_only():
    """Byte flips across the header region (everything before the
    entropy data) either decode or raise the typed errors — never a
    foreign IndexError/struct.error. Entropy-region flips are the
    documented lossy caveat (arithmetic state diverges silently)."""
    import struct

    from dolphinbeat_spark.operators.jpeg import JpegError, decode_jpeg
    from dolphinbeat_spark.operators.jpeg_arith import encode_jpeg_arith

    good = encode_jpeg_arith(24, 16, bytes(b % 256 for b in range(24 * 16)),
                             gray=True, restart_interval=1)
    sos = good.index(b"\xff\xda")
    hdr_end = sos + 2 + struct.unpack_from(">H", good, sos + 2)[0]
    for pos in range(2, hdr_end):
        for flip in (0x01, 0x80, 0xFF):
            mut = bytearray(good)
            mut[pos] ^= flip
            try:
                decode_jpeg(bytes(mut))
            except (JpegError, NotImplementedError):
                pass


# --- FLAC (operators/flac.py, RFC 9639 from scratch) -------------------------


# Hand-assembled per the spec, INDEPENDENT of the encoder: mono 8-bit
# 8 kHz, STREAMINFO (min/max bs 4, rate 8000, 1 ch, 8 bps, 4 samples,
# md5 of bytes [10,12,13,11]), then ONE frame:
#   header  FF F8       sync 11111111111110 + reserved 0 + fixed-bs 0
#           64          block size code 0110 (8-bit bs-1 follows),
#                       sample rate code 0100 (8 kHz)
#           02          mono 0000, sample size 001 (8-bit), reserved 0
#           00 03       frame number 0; bs-1 = 3
#           6D          CRC-8 (poly 0x07) of the 6 header bytes
#   subframe 12         pad 0, type 001001 (FIXED order 1), wasted 0
#           0A          warmup sample 10
#   residual: method 00, partition order 0000, Rice param 0010, then
#   residuals +2,+1,-2 (zigzag 4,2,3): 0100 110 111; zero-pad to byte
#           00 93 70
#   F8 ED       CRC-16 (poly 0x8005) of the whole frame, big-endian
_FLAC_VECTOR = bytes.fromhex(
    "664c6143800000220004000400000000000001f400700000000498d659f3af51e8"
    "70fd902a433aec5b6ffff8640200036d120a009370f8ed"
)


def test_flac_hand_assembled_vector_decodes():
    """The from-scratch FLAC decoder reproduces a stream hand-built
    bit by bit from RFC 9639 (sync, coded sizes, CRC-8/16, FIXED
    order-1 prediction, Rice zigzag residuals) — fully independent of
    the repo's own encoder."""
    import numpy as np

    from dolphinbeat_spark.operators.flac import decode_flac

    rate, ch, n, out = decode_flac(_FLAC_VECTOR)
    assert (rate, ch, n) == (8000, 1, 4)
    assert out.tolist() == [10, 12, 13, 11]
    assert out.dtype == np.dtype("<i2")


def test_flac_typed_errors_and_self_checks():
    """Corruption anywhere surfaces as the typed FlacError: bad magic,
    frame sync, CRC-8, CRC-16, truncation, reserved subframe type,
    and — the end-to-end guarantee for real-world files — a decoded
    stream that fails the embedded STREAMINFO MD5."""
    import pytest

    from dolphinbeat_spark.operators.flac import FlacError, decode_flac

    v = _FLAC_VECTOR

    def mut(pos, val):
        m = bytearray(v)
        m[pos] = val
        return bytes(m)

    with pytest.raises(FlacError, match="magic"):
        decode_flac(b"fLaX" + v[4:])
    # frame starts at 4 + 4 + 34 = 42
    with pytest.raises(FlacError, match="sync"):
        decode_flac(mut(43, 0xF0))
    with pytest.raises(FlacError, match="CRC-8"):
        decode_flac(mut(48, 0x6D ^ 0xFF))
    with pytest.raises(FlacError, match="CRC-16"):
        decode_flac(mut(len(v) - 1, v[-1] ^ 0xFF))
    with pytest.raises(FlacError, match="truncated"):
        decode_flac(v[:50])
    with pytest.raises(FlacError, match="reserved subframe"):
        decode_flac(mut(49, 0x04))  # subframe type 000010
    # STREAMINFO md5 bytes live at 26..41: flipping one makes the
    # (otherwise valid) decode fail its own end-to-end check
    with pytest.raises(FlacError, match="MD5"):
        decode_flac(mut(30, v[30] ^ 0xFF))
    # reserved sample-rate code 1111 inside the frame header: byte 44
    # is 0x64 = bs 0110 | sr 0100
    with pytest.raises(FlacError, match="sample rate|CRC-8"):
        decode_flac(mut(44, 0x6F))


def test_flac_roundtrip_matrix():
    """Encoder->decoder roundtrips across every subframe type, fixed
    order, LPC shapes, Rice partition orders with escape partitions,
    all four stereo assignments, 8/16/24-bit, multi-frame streams
    with short tails, and non-table sample rates. Every stream also
    passes the embedded-MD5 self-check inside decode_flac."""
    import numpy as np

    from dolphinbeat_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.RandomState(3)

    def rt(s, rate=44100, **kw):
        r, ch, n, out = decode_flac(encode_flac(s, rate, **kw))
        want = np.asarray(s, np.int64).reshape(-1)
        assert r == rate and n == want.size
        assert np.array_equal(out.astype(np.int64), want), kw

    t = np.arange(2000)
    s = (3000 * np.sin(t / 50) + 500 * np.sin(t / 7)).astype(np.int64)[:, None]
    rt(s, block_size=576)
    rt(np.full((500, 1), -1234), block_size=192)           # constant
    rt(rng.randint(-32768, 32768, (700, 1)), force="verbatim",
       block_size=256)                                      # verbatim
    for o in range(5):                                      # fixed 0-4
        rt(s[:1024], force=("fixed", o), block_size=256)
    rt(s[:1152], force=("lpc", [3, -3, 1], 4, 1), block_size=576)
    rt(s[:1152], force=("lpc", [53, -22, 8, -1], 7, 5), block_size=576)
    rt(s[:1024], block_size=1024, partition_order=3)
    rt(s[:1024], block_size=1024, partition_order=2, escape_parts={1, 3})
    st = np.stack([(2000 * np.sin(t / 30)).astype(np.int64),
                   (1900 * np.sin(t / 30 + 0.2)).astype(np.int64)], 1)[:1600]
    for m in (None, "left-side", "right-side", "mid-side"):
        rt(st, block_size=512, stereo_mode=m)
    rt((s[:576] // 300).astype(np.int64), bits=8, block_size=192)
    rt(s[:576] * 1000, bits=24, block_size=576)
    rt(s[:1000], rate=11025, block_size=576)               # tail frame


def test_decode_audio_sniffs_flac(spark):
    """decode_audio routes fLaC payloads through the FLAC decoder in
    the same Arrow mapInPandas slot as WAV."""
    import numpy as np

    from dolphinbeat_spark.operators.flac import encode_flac
    from dolphinbeat_spark.operators.multimodal import decode_audio

    t = np.arange(300)
    s = np.stack([((t * 13) % 401) - 200, ((t * 7) % 301) - 150], 1)
    rows = [(1, bytearray(encode_flac(s, 8000, block_size=64,
                                      stereo_mode="mid-side")))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = decode_audio(df).collect()[0]
    assert got.fmt == "flac" and got.sample_rate == 8000
    assert got.n_samples == 600
    assert got.sample_sum == int(s.sum())


# --- Matroska / WebM demux (operators/mkv_demux.py) --------------------------


# Hand-assembled per RFC 8794/9559, independent of the encoder:
#   1A45DFA3 87          EBML header, size 7
#     4282 84 "webm"       DocType
#   18538067 B0          Segment, size 48
#     1549A966 87          Info, size 7
#       2AD7B1 83 0F4240     TimestampScale 1,000,000 ns (1 ms ticks)
#     1654AE6B 8F          Tracks, size 15
#       AE 8D                TrackEntry, size 13
#         D7 81 01             TrackNumber 1
#         83 81 01             TrackType video
#         86 85 "V_RAW"        CodecID
#     1F43B675 8B          Cluster, size 11
#       E7 81 00             Cluster Timestamp 0
#       A3 86                SimpleBlock, size 6:
#         81 0000 80 "hi"      track VINT 1, rel ts 0, keyframe, no lacing
_MKV_VECTOR = bytes.fromhex(
    "1a45dfa3874282847765626d18538067b01549a966872ad7b1830f42401654ae6b"
    "8fae8dd781018381018685565f5241571f43b6758be78100a386810000806869"
)


def test_mkv_hand_assembled_vector():
    from dolphinbeat_spark.operators.mkv_demux import parse_mkv

    (tr,) = parse_mkv(_MKV_VECTOR)
    assert (tr["track_id"], tr["handler"], tr["codec"]) == (1, "vide", "V_RAW")
    assert tr["timescale"] == 1000.0
    ((idx, ts, off, sz),) = tr["samples"]
    assert (idx, ts, sz) == (0, 0, 2)
    assert _MKV_VECTOR[off:off + sz] == b"hi"


def test_mkv_demux_roundtrip_all_lacings():
    """Encoder->parser roundtrips: two interleaved tracks, every
    lacing mode (none / Xiph 255-terminated / fixed / EBML deltas,
    incl. frames >255 bytes that force multi-byte Xiph and wide EBML
    deltas), SimpleBlock AND BlockGroup/Block carriage, custom
    timestamp scale. Laced frames share their block's timestamp —
    the spec's lacing contract."""
    from dolphinbeat_spark.operators.mkv_demux import encode_mkv, parse_mkv

    vid = [bytes([i]) * (10 + i) for i in range(6)]
    aud = [bytes([0x40 + i]) * 8 for i in range(4)]
    mkv = encode_mkv([
        {"track_id": 1, "handler": "vide", "codec": "V_VP9",
         "samples": vid, "deltas": [100] * 6},
        {"track_id": 2, "handler": "soun", "codec": "A_OPUS",
         "samples": aud, "deltas": [160] * 4},
    ])
    t1, t2 = parse_mkv(mkv)
    assert [ts for _, ts, _, _ in t1["samples"]] == [0, 100, 200, 300, 400, 500]
    assert [ts for _, ts, _, _ in t2["samples"]] == [0, 160, 320, 480]
    for t, src in ((t1, vid), (t2, aud)):
        for (i, ts, off, sz) in t["samples"]:
            assert mkv[off:off + sz] == src[i]

    for lac in ("xiph", "fixed", "ebml"):
        sizes = [8] * 6 if lac == "fixed" else [5, 300, 2, 17, 9, 260]
        smp = [bytes([i]) * s for i, s in enumerate(sizes)]
        for bg in (False, True):
            m = encode_mkv(
                [{"track_id": 3, "handler": "vide", "codec": "V_AV1",
                  "samples": smp, "deltas": [40] * 6, "lacing": lac}],
                cluster_frames=3, block_group=bg,
            )
            (t,) = parse_mkv(m)
            assert [ts for _, ts, _, _ in t["samples"]] == [0] * 3 + [120] * 3
            for (i, ts, off, sz) in t["samples"]:
                assert m[off:off + sz] == smp[i], (lac, bg, i)

    m = encode_mkv([{"track_id": 1, "handler": "vide", "codec": "V_VP8",
                     "samples": vid[:2], "deltas": [50] * 2}],
                   timestamp_scale=500_000)
    assert parse_mkv(m)[0]["timescale"] == 2000.0


def test_mkv_typed_errors():
    import pytest

    from dolphinbeat_spark.operators.mkv_demux import MkvError, parse_mkv

    v = _MKV_VECTOR
    with pytest.raises(MkvError, match="EBML/Matroska"):
        parse_mkv(b"\x1aE\xdf\xa4" + v[4:])  # near-miss magic
    with pytest.raises(MkvError, match="VINT"):
        parse_mkv(b"\x00" + v[1:])
    # DocType -> "xebm" (byte 8 = first DocType char)
    bad_doc = bytearray(v)
    bad_doc[8] = ord("x")
    with pytest.raises(MkvError, match="DocType"):
        parse_mkv(bytes(bad_doc))
    with pytest.raises(MkvError, match="truncated|overruns"):
        parse_mkv(v[:40])
    # unknown-size Cluster (size byte -> 0xFF, the live-WebM layout)
    # DECODES since r10: the scan recovers the cluster end at the
    # parent boundary and yields the identical sample relation
    unk = bytearray(v)
    cpos = v.index(bytes.fromhex("1F43B675"))
    unk[cpos + 4] = 0xFF
    (want_t,) = parse_mkv(v)
    (got_t,) = parse_mkv(bytes(unk))
    assert got_t["samples"] == want_t["samples"]
    # block referencing an absent track: track VINT 0x81 -> 0x82
    ghost = bytearray(v)
    ghost[-6] = 0x82
    with pytest.raises(MkvError, match="unknown track"):
        parse_mkv(bytes(ghost))


def test_mkv_content_encodings():
    """Matroska ContentEncodings (RFC 9559, r11): zlib/bzlib block
    compression and the header-stripping form round-trip through the
    decoded-bytes side channel; multiple encodings undo in descending
    ContentEncodingOrder; encryption/lzo1x/odd scopes raise by name;
    corrupt compressed payloads stay typed MkvError."""
    import pytest

    from dolphinbeat_spark.operators.mkv_demux import (
        _CE_COMP_ALGO, _CE_COMPRESSION, _CE_ENCRYPTION, _CE_ORDER,
        _CE_SCOPE, _CE_TYPE, _CONTENT_ENCODING,
        MkvError, _elem, _enc_uint, _parse_content_encodings,
        encode_mkv, parse_mkv,
    )

    samples = [b"PFX-frame-%d-" % i + bytes([65 + i]) * 30
               for i in range(4)]
    for comp in (("zlib", b""), ("bzlib", b""), ("lzo", b""),
                 ("strip", b"PFX-")):
        mkv = encode_mkv([{"track_id": 1, "handler": "vide",
                           "codec": "V_RAW", "samples": list(samples),
                           "deltas": [40] * 4, "compression": comp}])
        (t,) = parse_mkv(mkv)
        assert [t["decoded"][i] for i in range(4)] == samples, comp
        # the stored bytes in the container are NOT the plain frames
        if comp[0] != "strip":
            assert samples[0] not in mkv
    # plain tracks carry no decoded map
    (t,) = parse_mkv(encode_mkv([{"track_id": 1, "handler": "vide",
                                  "codec": "V_RAW",
                                  "samples": list(samples),
                                  "deltas": [40] * 4}]))
    assert "decoded" not in t

    # corrupt lzo payload stays typed as well
    mkv = encode_mkv([{"track_id": 1, "handler": "vide",
                       "codec": "V_RAW", "samples": [b"z" * 64],
                       "deltas": [40], "compression": ("lzo", b"")}])
    bad = bytearray(mkv)
    bad[-5] ^= 0xFF  # clobber the EOS marker region
    with pytest.raises(MkvError, match="lzo1x"):
        parse_mkv(bytes(bad))

    # boundary cases exercised directly on the ContentEncodings parser
    # with hand-built elements (the encoder never writes them)
    enc_body = (_elem(_CE_ORDER, _enc_uint(0))
                + _elem(_CE_SCOPE, _enc_uint(1))
                + _elem(_CE_TYPE, _enc_uint(1))
                + _elem(_CE_ENCRYPTION, b""))
    comp_scope = (_elem(_CE_ORDER, _enc_uint(0))
                  + _elem(_CE_SCOPE, _enc_uint(2))
                  + _elem(_CE_COMPRESSION,
                          _elem(_CE_COMP_ALGO, _enc_uint(0))))
    bogus = (_elem(_CE_SCOPE, _enc_uint(1))
             + _elem(_CE_COMPRESSION,
                     _elem(_CE_COMP_ALGO, _enc_uint(9))))
    for body, exc, pat in (
        (enc_body, NotImplementedError, "ContentEncryption"),
        (comp_scope, NotImplementedError, "Scope"),
        (bogus, MkvError, "ContentCompAlgo"),
    ):
        blob = _elem(_CONTENT_ENCODING, body)
        with pytest.raises(exc, match=pat):
            _parse_content_encodings(blob, 0, len(blob))
    # corrupt zlib payload inside a compressed track stays typed
    mkv = encode_mkv([{"track_id": 1, "handler": "vide",
                       "codec": "V_RAW", "samples": [b"y" * 40],
                       "deltas": [40], "compression": ("zlib", b"")}])
    bad = bytearray(mkv)
    bad[-10] ^= 0xFF  # inside the zlib stream
    with pytest.raises(MkvError, match="inflate"):
        parse_mkv(bytes(bad))
    # header-stripping encode refuses samples without the prefix
    with pytest.raises(ValueError, match="settings prefix"):
        encode_mkv([{"track_id": 1, "handler": "vide", "codec": "V_RAW",
                     "samples": [b"nope"], "deltas": [40],
                     "compression": ("strip", b"PFX-")}])


def test_lzo1x_codec():
    """From-scratch LZO1X (r16): roundtrips through the fixture
    compressor, plus HAND-BUILT byte vectors for every decoder
    opcode family the compressor never emits — the documented
    instruction encodings are the pin (no liblzo in this
    container)."""
    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.lzo1x import (
        Lzo1xError, lzo1x_compress, lzo1x_decompress,
    )

    EOS = b"\x11\x00\x00"
    # M2 short form (64..127): 5 literals then copy 3 at distance 4
    # t = 0b01_0_011_00 = 76, H = 0
    assert lzo1x_decompress(bytes([22]) + b"abcde"
                            + bytes([76, 0]) + EOS) == b"abcdebcd"
    # M2 long form (128..255): 6 literals, copy 5 at distance 6
    # t = 1_00_101_00 = 0x94, H=0 -> d = 5+1 = 6
    assert lzo1x_decompress(bytes([23]) + b"uvwxyz"
                            + bytes([0x94, 0]) + EOS) == \
        b"uvwxyzuvwxy"
    # M1 2-byte match: first byte 18 = one literal, state 1; then
    # opcode 0 (DD=0, SS=0) + H=0 -> d=1, copy 2
    assert lzo1x_decompress(bytes([18]) + b"a"
                            + bytes([0, 0]) + EOS) == b"aaa"
    # trailing-S literals: M2 with S=2 carries 2 literals inline
    # t = 0b01_0_011_10 = 78 -> d=4, len=3, then "XY"
    assert lzo1x_decompress(bytes([22]) + b"abcde"
                            + bytes([78, 0]) + b"XY" + EOS) == \
        b"abcdebcdXY"
    # long literal run with extension: t=0, ext=1+0*255 -> 19 bytes
    lit19 = bytes(range(19))
    assert lzo1x_decompress(bytes([0, 1]) + lit19 + EOS) == lit19
    # 3-byte match at 2-3 kB (state 4 after a literal run): 2100
    # literals, then opcode 0 + H: d = (H<<2) + D + 2049; want
    # d=2100 -> H=12, D=3 -> t = 0b0000_11_00 = 12
    body = bytes(275) + bytes(range(200)) * 9 + bytes(25)
    assert len(body) == 2100
    # t=0 ext form: 2100 - 18 = 2082 = 8*255 + 42
    first = bytes([0]) + b"\x00" * 8 + bytes([42]) + body
    got = lzo1x_decompress(first + bytes([12, 12]) + EOS)
    assert got == body + body[0:3]
    # far match (16..31): >16 kB out, then d = 16384 + le>>2
    big = bytes([0, 0x00]) + b""  # build: ext for 17000 literals
    # ext value = 17000 - 18 = 16982 = 66*255 + 152
    ext = b"\x00" * 66 + bytes([152])
    payload = (b"Qx" * 8500)
    # t = 16 | H=0<<3 | L=2 -> 18, le = (1 << 2) | 0 -> d = 16385
    far = lzo1x_decompress(bytes([0]) + ext + payload
                           + bytes([18, 4, 0]) + EOS)
    assert far == payload + payload[-16385:-16385 + 4]
    # version-1 RLE marker raises by name
    with pytest.raises(NotImplementedError, match="RLE"):
        lzo1x_decompress(bytes([17, 1]) + EOS)
    # ...but the bare 3-byte EOS block is the EMPTY payload, not RLE
    assert lzo1x_decompress(EOS) == b""
    # typed failures: truncation, bad distance, missing EOS
    for bad in (b"", bytes([22]) + b"abc",
                bytes([18]) + b"a" + bytes([0, 200]) + EOS,
                bytes([20]) + b"abc"):
        with pytest.raises(Lzo1xError):
            lzo1x_decompress(bad)

    # compressor roundtrip sweep: repetitive, random, short, binary
    rng = np.random.RandomState(77)
    cases = [b"", b"x", b"ab", b"abc", b"abcd" * 100,
             bytes(rng.randint(0, 256, 5000, dtype=np.uint8)),
             bytes(rng.randint(0, 4, 9000, dtype=np.uint8)),
             b"A" * 20000, (b"pattern-" * 3000)[:17003],
             bytes(rng.randint(0, 256, 3, dtype=np.uint8)),
             b"PFX-" + bytes(300) + b"PFX-" + bytes(300)]
    for case in cases:
        blob = lzo1x_compress(case)
        assert lzo1x_decompress(blob) == case, len(case)
    # compression actually compresses the repetitive cases
    assert len(lzo1x_compress(b"A" * 20000)) < 200


def test_mkv_unknown_size_clusters_multi():
    """Multiple unknown-size Clusters back-to-back (each terminated by
    the NEXT cluster's Segment-level ID, the last by the parent end) —
    the live-streamed WebM layout — parse identically to the sized
    form; an unknown-size element INSIDE such a cluster is typed."""
    import pytest

    from dolphinbeat_spark.operators.mkv_demux import (
        MkvError, encode_mkv, parse_mkv,
    )

    tracks = [{"track_id": 1, "handler": "soun", "codec": "A_OPUS",
               "samples": [bytes([i]) * (10 + i) for i in range(9)],
               "deltas": [20] * 9}]
    sized = encode_mkv(tracks, cluster_frames=3)
    unk = encode_mkv(tracks, cluster_frames=3, unknown_size_clusters=True)
    assert unk != sized and b"\x1f\x43\xb6\x75\xff" in unk
    (a,) = parse_mkv(sized)
    (b,) = parse_mkv(unk)
    assert [s[:2] + (s[3],) for s in a["samples"]] == \
        [s[:2] + (s[3],) for s in b["samples"]]  # offsets differ by layout
    assert len(b["samples"]) == 9
    # nested unknown-size element inside an unknown-size cluster: typed
    i = unk.index(b"\x1f\x43\xb6\x75\xff") + 5
    bad = bytearray(unk)
    bad[i + 1] = 0xFF  # first child's size vint -> unknown
    with pytest.raises(MkvError, match="inside an unknown-size"):
        parse_mkv(bytes(bad))


def test_demux_media_sniffs_mkv(spark):
    """demux_media dispatches on the payload magic: EBML streams go
    through parse_mkv in the same Arrow slot as MP4."""
    from dolphinbeat_spark.operators.mkv_demux import encode_mkv
    from dolphinbeat_spark.operators.mp4_demux import demux_media

    vid = [bytes([i]) * 12 for i in range(4)]
    rows = [(9, bytearray(encode_mkv(
        [{"track_id": 1, "handler": "vide", "codec": "V_VP9",
          "samples": vid, "deltas": [40] * 4}]
    )))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = demux_media(df, handler="vide").orderBy("sample_idx").collect()
    assert [r.codec for r in got] == ["V_VP9"] * 4
    assert [r.dts for r in got] == [0, 40, 80, 120]
    assert got[1].dts_s == 0.04


# --- MP3 frame demux (operators/mp3_demux.py) --------------------------------


def test_mp3_frame_demux_matrix():
    """Every (MPEG version, layer) pair frames correctly: published
    bitrate/sample-rate tables, Layer-I 4-byte slots, per-frame
    padding (the VBR length mechanism), ID3v2 prefix + ID3v1 trailer
    skip, and the samples-per-frame timestamp advance."""
    from dolphinbeat_spark.operators.mp3_demux import (
        encode_mp3_frames, parse_mp3,
    )

    mp3 = encode_mp3_frames(5, b"abcdefgh", paddings=[0, 1, 0, 1, 0])
    (t,) = parse_mp3(mp3)
    assert t["codec"] == "mpeg1-layer3" and t["timescale"] == 44100
    assert [(d, s) for _, d, _, s in t["samples"]] == [
        (0, 417), (1152, 418), (2304, 417), (3456, 418), (4608, 417)
    ]
    assert all(mp3[off] == 0xFF for _, _, off, _ in t["samples"])

    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + bytes(10)
    (t,) = parse_mp3(encode_mp3_frames(3, b"xy", id3v2=tag, id3v1=True))
    assert len(t["samples"]) == 3 and t["samples"][0][2] == 20

    # (version, layer) -> (frame bytes at samplerate_idx 1, samples/frame)
    want = {("1", 1): (288, 384), ("1", 2): (480, 1152),
            ("2", 3): (240, 576), ("2.5", 3): (480, 576),
            ("2", 2): (480, 1152)}
    for (v, l), (fl, spf) in want.items():
        (t,) = parse_mp3(encode_mp3_frames(2, b"z", version=v, layer=l,
                                           samplerate_idx=1))
        assert t["codec"] == f"mpeg{v}-layer{l}"
        assert t["samples"][0][3] == fl and t["samples"][1][1] == spf


def test_mp3_typed_errors():
    import pytest

    from dolphinbeat_spark.operators.mp3_demux import (
        Mp3Error, encode_mp3_frames, parse_mp3,
    )

    good = bytearray(encode_mp3_frames(2, b"q"))
    with pytest.raises(Mp3Error, match="sync"):
        parse_mp3(bytes(20))
    with pytest.raises(Mp3Error, match="overruns"):
        parse_mp3(bytes(good[:100]))
    # first frame marked free-format but the next sync has a tabled
    # bitrate: the constant free length is undiscoverable -> typed
    free = bytearray(good)
    free[2] &= 0x0F  # bitrate index 0
    with pytest.raises(Mp3Error, match="free-format"):
        parse_mp3(bytes(free))
    badsr = bytearray(good)
    badsr[2] |= 0x0C  # sample rate index 11
    with pytest.raises(Mp3Error, match="sample rate"):
        parse_mp3(bytes(badsr))
    # inconsistent stream: second frame re-marked MPEG2
    mixed = bytearray(good)
    mixed[417 + 1] = (mixed[417 + 1] & 0xE7) | (2 << 3)
    with pytest.raises(Mp3Error, match="inconsistent"):
        parse_mp3(bytes(mixed))
    with pytest.raises(Mp3Error, match="only an ID3 tag"):
        parse_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x00")


def test_mp3_free_format():
    """Free-format streams (bitrate index 0, ISO 11172-3 §2.4.2.3):
    the constant off-table frame length is discovered from the
    distance to the next matching sync, padding adds a slot, and a
    single-frame stream raises by name — closing the r9 boundary."""
    import pytest

    from dolphinbeat_spark.operators.mp3_demux import (
        Mp3Error, encode_mp3_frames, parse_mp3,
    )

    blob = encode_mp3_frames(5, b"xyz", bitrate_idx=0, free_frame_len=300)
    (t,) = parse_mp3(blob)
    assert [s[3] for s in t["samples"]] == [300] * 5
    assert t["codec"] == "mpeg1-layer3" and t["timescale"] == 44100
    # per-frame padding (incl. a PADDED FIRST frame: discovery must
    # subtract the padding slot)
    blob2 = encode_mp3_frames(4, b"q", bitrate_idx=0, free_frame_len=250,
                              paddings=[1, 0, 1, 0])
    (t2,) = parse_mp3(blob2)
    assert [s[3] for s in t2["samples"]] == [251, 250, 251, 250]
    # Layer I free format: 4-byte slots
    blob3 = encode_mp3_frames(3, b"L", layer=1, bitrate_idx=0,
                              free_frame_len=320, paddings=[0, 1, 0])
    (t3,) = parse_mp3(blob3)
    assert [s[3] for s in t3["samples"]] == [320, 324, 320]
    # a lone free frame cannot determine its own length
    with pytest.raises(Mp3Error, match="undiscoverable"):
        parse_mp3(encode_mp3_frames(1, b"a", bitrate_idx=0,
                                    free_frame_len=200))
    # a COINCIDENTAL sync-looking byte pattern inside the first
    # frame's audio data must not lock a wrong length: discovery now
    # demands a third matching sync one frame past the candidate
    # (r10 ADVICE finding)
    fake = bytearray(encode_mp3_frames(3, b"\x00", bitrate_idx=0,
                                       free_frame_len=300))
    fake[100:104] = b"\xff\xfb\x00\x00"  # matches ver/layer/rate, br=0
    (tf,) = parse_mp3(bytes(fake))
    assert [s[3] for s in tf["samples"]] == [300] * 3
    # two-frame streams stay legal (no third frame to confirm with)
    (t2f,) = parse_mp3(encode_mp3_frames(2, b"w", bitrate_idx=0,
                                         free_frame_len=280))
    assert [s[3] for s in t2f["samples"]] == [280, 280]
    # ... and with an ID3v1 trailer after the second frame
    (t2t,) = parse_mp3(encode_mp3_frames(2, b"w", bitrate_idx=0,
                                         free_frame_len=280, id3v1=True))
    assert [s[3] for s in t2t["samples"]] == [280, 280]


def test_demux_media_sniffs_mp3(spark):
    from dolphinbeat_spark.operators.mp3_demux import encode_mp3_frames
    from dolphinbeat_spark.operators.mp4_demux import demux_media

    rows = [(4, bytearray(encode_mp3_frames(4, b"pad")))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = demux_media(df).orderBy("sample_idx").collect()
    assert [r.codec for r in got] == ["mpeg1-layer3"] * 4
    assert [r.dts for r in got] == [0, 1152, 2304, 3456]
    assert got[0].handler == "soun"


# --- Ogg demux (operators/ogg_demux.py) --------------------------------------


def test_ogg_demux_roundtrip():
    """Page walk with the Ogg-specific CRC, 255-run lacing incl. the
    terminating-0 exact-multiple case, BOS codec identification
    (OpusHead fixed 48 kHz / Vorbis ident-header rate), multiplexed
    serials, and per-packet byte ranges carrying the page granule."""
    from dolphinbeat_spark.operators.ogg_demux import encode_ogg, parse_ogg

    head = b"OpusHead" + bytes([1, 2]) + bytes(9)
    pkts = [bytes([i]) * (50 + i * 40) for i in range(7)]
    ogg = encode_ogg([{"serial": 0xABCD, "packets": pkts,
                       "codec_head": head}])
    (t,) = parse_ogg(ogg)
    assert (t["track_id"], t["codec"], t["timescale"]) == (0xABCD, "opus",
                                                           48000)
    for (i, g, off, sz) in t["samples"]:
        want = head if i == 0 else pkts[i - 1]
        assert ogg[off:off + sz] == want, i

    # exact multiples of 255 need the terminating 0 lacing value
    p255 = [b"x" * 255, b"y" * 510, b"z" * 10]
    (t,) = parse_ogg(encode_ogg([{"serial": 7, "packets": p255}],
                                packets_per_page=2))
    assert [sz for _, _, _, sz in t["samples"]] == [255, 510, 10]

    vh = b"\x01vorbis" + bytes(4) + b"\x02" + b"\x44\xac\x00\x00" + bytes(6)
    streams = [{"serial": 1, "packets": [b"a", b"b"], "codec_head": head},
               {"serial": 2, "packets": [b"c"], "codec_head": vh}]
    t1, t2 = parse_ogg(encode_ogg(streams))
    assert (t1["codec"], len(t1["samples"])) == ("opus", 3)
    assert (t2["codec"], t2["timescale"]) == ("vorbis", 44100)


def test_ogg_typed_errors_and_spanning_packets():
    import struct

    import pytest

    from dolphinbeat_spark.operators.ogg_demux import (
        OggError, _ogg_crc, encode_ogg, parse_ogg,
    )

    good = encode_ogg([{"serial": 5, "packets": [b"hello", b"world"]}])
    with pytest.raises(OggError, match="OggS"):
        parse_ogg(b"XggS" + good[4:])
    bad = bytearray(good)
    bad[-1] ^= 1  # flip a body byte: CRC catches it
    with pytest.raises(OggError, match="CRC"):
        parse_ogg(bytes(bad))
    with pytest.raises(OggError, match="truncated"):
        parse_ogg(good[:20])

    def page(htype, seq, segtab, body, serial=9, granule=0):
        hdr = bytearray(b"OggS") + bytes([0, htype])
        hdr += struct.pack("<qIIIB", granule, serial, seq, 0, len(segtab))
        hdr += bytes(segtab)
        pg = hdr + body
        pg[22:26] = struct.pack("<I", _ogg_crc(bytes(pg)))
        return bytes(pg)

    # a packet spanning two pages reassembles (was a r9 boundary)
    spanning = (page(0x02, 0, [255], b"a" * 255, granule=-1)
                + page(0x05, 1, [45], b"b" * 45, granule=7))
    (ts,) = parse_ogg(spanning)
    (idx, g, off, sz) = ts["samples"][0]
    assert (idx, g, sz) == (0, 7, 300)
    parts = ts["fragments"][0]
    assert b"".join(spanning[o:o + s] for o, s in parts) == \
        b"a" * 255 + b"b" * 45
    # sequence gap
    gap = page(0x02, 0, [1], b"x") + page(0x04, 2, [1], b"y")
    with pytest.raises(OggError, match="sequence gap"):
        parse_ogg(gap)
    # continuation flag without a continued packet
    with pytest.raises(OggError, match="continuation page without"):
        parse_ogg(page(0x03, 0, [1], b"x"))
    # continued packet dropped by a flag-less page
    dropped = (page(0x02, 0, [255], b"a" * 255)
               + page(0x04, 1, [1], b"b"))
    with pytest.raises(OggError, match="continued packet dropped"):
        parse_ogg(dropped)
    # stream ends mid-packet
    with pytest.raises(OggError, match="ends inside"):
        parse_ogg(page(0x02, 0, [255], b"a" * 255))


def test_ogg_spanning_reassembly_paths():
    """The three wild spanning shapes: a >65025-byte packet (MUST span
    even at the 255-lace page cap), a multi-page packet under a forced
    small lace cap (3+ fragments), and a BOS identification packet
    that itself spans (the real Vorbis-header case) — plus granule -1
    on no-completion pages and hostile-bytes typing."""
    import struct

    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.ogg_demux import (
        OggError, encode_ogg, parse_ogg,
    )

    vhead = b"\x01vorbis" + bytes(5) + struct.pack("<I", 44100) + bytes(8)
    huge = bytes((i * 31) % 256 for i in range(70000))
    ogg = encode_ogg([{"serial": 9, "packets": [huge],
                       "codec_head": vhead}], packets_per_page=1)
    (t,) = parse_ogg(ogg)
    assert t["codec"] == "vorbis" and t["timescale"] == 44100
    _, _, _, sz = t["samples"][1]
    parts = t["fragments"][1]
    assert sz == 70000 and len(parts) == 2
    assert b"".join(ogg[o:o + s] for o, s in parts) == huge

    big = bytes(range(256)) * 3  # 768 B -> 4+ fragments at lace cap 2
    ogg2 = encode_ogg(
        [{"serial": 7, "packets": [big, b"tail"], "codec_head": b"xx"}],
        packets_per_page=1, max_laces_per_page=2,
    )
    (t2,) = parse_ogg(ogg2)
    _, _, off1, sz1 = t2["samples"][1]
    assert sz1 == len(big)
    assert b"".join(ogg2[o:o + s] for o, s in t2["fragments"][1]) == big
    _, _, off2, sz2 = t2["samples"][2]
    assert ogg2[off2:off2 + sz2] == b"tail" and 2 not in t2.get("fragments", {})

    bighead = b"\x01vorbis" + bytes(5) + struct.pack("<I", 22050) + bytes(900)
    ogg3 = encode_ogg([{"serial": 3, "packets": [b"x"],
                        "codec_head": bighead}],
                      packets_per_page=1, max_laces_per_page=2)
    (t3,) = parse_ogg(ogg3)
    assert t3["codec"] == "vorbis" and t3["timescale"] == 22050

    rng = np.random.RandomState(41)
    for _ in range(120):
        data = bytearray(ogg2)
        i = int(rng.randint(0, len(data)))
        data[i] ^= 1 << int(rng.randint(0, 8))
        try:
            parse_ogg(bytes(data))
        except (OggError, NotImplementedError):
            pass
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"untyped crash on corrupted spanning Ogg: {ex!r}")


def test_demux_media_reassembles_spanning_ogg(spark):
    """demux_media md5s the REASSEMBLED bytes of a spanning packet
    (fragment map), with sample_bytes = total size and byte_offset =
    first fragment."""
    import hashlib

    from dolphinbeat_spark.operators.mp4_demux import demux_media
    from dolphinbeat_spark.operators.ogg_demux import encode_ogg

    head = b"OpusHead" + bytes([1, 1]) + bytes(9)
    big = bytes((i * 13) % 256 for i in range(600))
    rows = [(4, bytearray(encode_ogg(
        [{"serial": 3, "packets": [big, b"after"], "codec_head": head}],
        packets_per_page=1, max_laces_per_page=2,
    )))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.sample_idx: r for r in demux_media(df).collect()}
    assert got[1].sample_bytes == 600
    assert got[1].sample_md5 == hashlib.md5(big).hexdigest()
    assert got[2].sample_md5 == hashlib.md5(b"after").hexdigest()


def test_demux_media_sniffs_ogg(spark):
    from dolphinbeat_spark.operators.ogg_demux import encode_ogg
    from dolphinbeat_spark.operators.mp4_demux import demux_media

    head = b"OpusHead" + bytes([1, 1]) + bytes(9)
    rows = [(2, bytearray(encode_ogg(
        [{"serial": 3, "packets": [b"pkt0", b"pkt11"], "codec_head": head,
          "granules": [960]}]
    )))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = demux_media(df).orderBy("sample_idx").collect()
    assert [r.codec for r in got] == ["opus"] * 3
    assert [r.dts for r in got] == [960, 960, 960]
    assert got[0].dts_s == 0.02


# --- EXIF (operators/exif.py) -------------------------------------------------


def test_exif_parse_both_byte_orders_and_redaction():
    """The TIFF-IFD parser reads real APP1 structures in both II and
    MM byte order (inline vs offset values, sub-IFD and GPS-IFD
    pointers, DMS->decimal with hemisphere signs), and strip_metadata
    removes the whole metadata layer while preserving the decode
    byte-for-byte."""
    import numpy as np

    from dolphinbeat_spark.operators.exif import (
        encode_exif_app1, insert_app1, parse_exif, strip_metadata,
    )
    from dolphinbeat_spark.operators.jpeg import decode_jpeg, encode_jpeg

    jpg = encode_jpeg(16, 8, bytes([130]) * 128, gray=True)
    want_px = decode_jpeg(jpg)[2]
    for bo in ("<", ">"):
        app1 = encode_exif_app1(
            make="ACME", model="Cam 9000", orientation=6,
            datetime_original="2024:05:01 10:20:30", iso=400,
            gps=("N", ((37, 1), (46, 1), (30, 1)),
                 "W", ((122, 1), (25, 1), (12, 1))),
            byte_order=bo,
        )
        tagged = insert_app1(jpg, app1)
        m = parse_exif(tagged)
        assert m["make"] == "ACME" and m["model"] == "Cam 9000"
        assert m["orientation"] == 6 and m["iso"] == 400
        assert m["datetime_original"] == "2024:05:01 10:20:30"
        assert m["gps_lat"] == 37 + 46 / 60 + 30 / 3600
        assert m["gps_lon"] == -(122 + 25 / 60 + 12 / 3600)
        # the tag does not disturb the decode; the strip removes it
        assert np.array_equal(decode_jpeg(tagged)[2], want_px)
        clean = strip_metadata(tagged)
        assert parse_exif(clean) == {}
        assert np.array_equal(decode_jpeg(clean)[2], want_px)
    assert parse_exif(jpg) == {}  # no APP1 at all


def test_exif_typed_errors_and_robustness():
    import pytest

    from dolphinbeat_spark.operators.exif import (
        ExifError, encode_exif_app1, insert_app1, parse_exif,
    )
    from dolphinbeat_spark.operators.jpeg import encode_jpeg

    with pytest.raises(ExifError, match="not a JPEG"):
        parse_exif(b"nope")
    jpg = encode_jpeg(8, 8, bytes(64), gray=True)
    app1 = encode_exif_app1(make="X", gps=("N", ((1, 1),) * 3,
                                           "E", ((2, 1),) * 3))
    tagged = bytearray(insert_app1(jpg, app1))
    # corrupt the TIFF byte-order mark: typed error
    i = bytes(tagged).index(b"Exif\x00\x00") + 6
    bad = bytearray(tagged)
    bad[i] = ord("X")
    with pytest.raises(ExifError, match="byte order"):
        parse_exif(bytes(bad))
    # IFD offset pointing past the segment: typed error
    bad2 = bytearray(tagged)
    bad2[i + 4:i + 8] = (2 ** 31).to_bytes(4, "little")
    with pytest.raises(ExifError, match="beyond|overruns|truncated"):
        parse_exif(bytes(bad2))
    # zero-denominator rationals degrade to absent fields, not errors
    weird = encode_exif_app1(gps=("N", ((1, 0), (0, 1), (0, 1)),
                                  "E", ((2, 1), (0, 1), (0, 1))))
    m = parse_exif(insert_app1(jpg, weird))
    assert "gps_lat" not in m and m["gps_lon"] == 2.0


def test_exif_fill_bytes_and_truncated_header():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker: both marker walks must skip them (a real camera JPEG with
    padding previously mis-read a bogus seglen), and a JPEG truncated
    mid-segment-header must raise the typed ExifError, not a raw
    struct.error."""
    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.exif import (
        ExifError, encode_exif_app1, parse_exif, strip_metadata,
    )
    from dolphinbeat_spark.operators.jpeg import decode_jpeg, encode_jpeg

    jpg = encode_jpeg(16, 8, bytes([90]) * 128, gray=True)
    want_px = decode_jpeg(jpg)[2]
    app1 = encode_exif_app1(make="PadCam", orientation=3)
    # fill bytes before the APP1 marker AND before the next segment
    padded = jpg[:2] + b"\xff\xff\xff" + app1 + b"\xff" + jpg[2:]
    m = parse_exif(padded)
    assert m["make"] == "PadCam" and m["orientation"] == 3
    clean = strip_metadata(padded)
    assert parse_exif(clean) == {}
    assert np.array_equal(decode_jpeg(clean)[2], want_px)
    # truncated mid-header: typed error from both walks
    trunc = jpg[:2] + b"\xff\xe1\x00"
    with pytest.raises(ExifError, match="truncated segment header"):
        parse_exif(trunc)
    with pytest.raises(ExifError, match="truncated segment header"):
        strip_metadata(trunc)


# --- WARC (sources/warc.py) ---------------------------------------------------


def test_warc_record_walk_plain_and_gzip_members():
    """The record grammar (version line, CRLF headers, Content-Length
    framing, double-CRLF separators) parses identically from plain
    multi-record files and the Common Crawl record-per-gzip-member
    layout; HTTP response payloads split into status/type/body."""
    from dolphinbeat_spark.sources.warc import (
        _split_http, encode_warc, iter_warc_records,
    )

    recs = [
        {"type": "warcinfo", "record_id": "<urn:uuid:0>",
         "content": b"software: test\r\n",
         "content_type": "application/warc-fields"},
        {"type": "response", "record_id": "<urn:uuid:1>",
         "target_uri": "http://a.example/",
         "date": "2024-01-01T00:00:00Z",
         "content": b"<html>hello</html>",
         "http": {"status": 200, "content_type": "text/html"}},
        {"type": "response", "record_id": "<urn:uuid:2>",
         "target_uri": "http://b.example/x",
         "content": b"not found",
         "http": {"status": 404, "content_type": "text/plain"}},
    ]
    for gz in (False, True):
        got = list(iter_warc_records(encode_warc(recs, gzip_members=gz)))
        assert [g["headers"]["warc-type"] for g in got] == [
            "warcinfo", "response", "response"
        ]
        assert got[1]["headers"]["warc-target-uri"] == "http://a.example/"
        st, ct, body, enc = _split_http(got[1]["content"])
        assert (st, ct, body) == (200, "text/html", b"<html>hello</html>")
        assert enc is None
        st, _, body, _ = _split_http(got[2]["content"])
        assert (st, body) == (404, b"not found")
        # a non-HTTP payload passes through whole
        st, ct, body, _ = _split_http(got[0]["content"])
        assert st is None and body == b"software: test\r\n"


def test_warc_http_body_decoding():
    """HTTP Content-/Transfer-Encoding inside WARC response payloads
    (RFC 9110 §8.4, RFC 9112 §7.1): gzip, both deflate wire forms,
    chunked framing (with chunk extensions + trailer fields), and
    stacked gzip-then-chunked all inflate back to the exact entity
    body; the applied coding list is surfaced. Wild crawls store raw
    HTTP bytes — pre-fix these bodies flowed through compressed."""
    import zlib as _z

    from dolphinbeat_spark.sources.warc import (
        _split_http, encode_warc, iter_warc_records,
    )

    body = b"entity body 0123456789 " * 9  # > one chunk
    variants = [
        ({}, None),
        ({"content_encoding": "gzip"}, "gzip"),
        ({"content_encoding": "deflate"}, "deflate"),
        ({"content_encoding": "deflate", "raw_deflate": True}, "deflate"),
        ({"chunked": True}, "chunked"),
        ({"content_encoding": "gzip", "chunked": True}, "gzip,chunked"),
        # multi-member gzip (RFC 1952 §2.2): members concatenate
        ({"content_encoding": "gzip", "gzip_parts": 3}, "gzip"),
        # zstd (RFC 8878) through the in-repo frame decoder
        ({"content_encoding": "zstd"}, "zstd"),
        # brotli (RFC 7932) through the in-repo from-scratch decoder
        ({"content_encoding": "br"}, "br"),
        # LF-only envelope from a sloppy server
        ({"bare_lf": True}, None),
        ({"content_encoding": "gzip", "bare_lf": True}, "gzip"),
    ]
    recs = [
        {"type": "response", "record_id": f"<urn:uuid:{n}>",
         "target_uri": f"http://x/{n}", "content": body,
         "http": {"status": 200, "content_type": "text/plain", **http}}
        for n, (http, _) in enumerate(variants)
    ]
    got = list(iter_warc_records(encode_warc(recs)))
    for rec, (_, want_enc) in zip(got, variants):
        st, ct, out, enc = _split_http(rec["content"])
        assert (st, ct) == (200, "text/plain")
        assert out == body and enc == want_enc
    # the wire bytes really were compressed/chunked
    assert body not in got[1]["content"]
    assert b"\r\n0\r\n" in got[4]["content"]
    # Transfer-Encoding: gzip, chunked in ONE header (RFC 9112 §6.1)
    co = _z.compressobj(6, _z.DEFLATED, 31)
    gz = co.compress(body) + co.flush()
    chunked = b"%x\r\n" % len(gz) + gz + b"\r\n0\r\n\r\n"
    raw = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
           b"Transfer-Encoding: gzip, chunked\r\n\r\n" + chunked)
    st, ct, out, enc = _split_http(raw)
    assert out == body and enc == "gzip,chunked"


def test_warc_http_body_decoding_hostile():
    """Hostile wire bytes stay typed: truncated chunk, bad chunk-size
    line, corrupt gzip/deflate bodies raise WarcError; brotli raises
    NotImplementedError BY NAME; a lying HTTP Content-Length does not
    crash (the WARC record length governs)."""
    import pytest

    from dolphinbeat_spark.sources.warc import WarcError, _split_http

    def http(hdrs: bytes, body: bytes) -> bytes:
        return b"HTTP/1.1 200 OK\r\n" + hdrs + b"\r\n\r\n" + body

    with pytest.raises(WarcError, match="chunk data truncated"):
        _split_http(http(b"Transfer-Encoding: chunked",
                         b"ff\r\nshort"))
    with pytest.raises(WarcError, match="size line"):
        _split_http(http(b"Transfer-Encoding: chunked", b"5 no crlf"))
    with pytest.raises(WarcError, match="bad chunk size"):
        _split_http(http(b"Transfer-Encoding: chunked", b"xyz\r\nab\r\n"))
    with pytest.raises(WarcError, match="CRLF-terminated"):
        _split_http(http(b"Transfer-Encoding: chunked",
                         b"2\r\nabXX0\r\n\r\n"))
    with pytest.raises(WarcError, match="gzip"):
        _split_http(http(b"Content-Encoding: gzip", b"not gzip at all"))
    with pytest.raises(WarcError, match="deflate.*inflate"):
        _split_http(http(b"Content-Encoding: deflate", b"\x00\x01garbage"))
    with pytest.raises(WarcError, match="br"):
        _split_http(http(b"Content-Encoding: br", b"\x11corrupt br!"))
    with pytest.raises(WarcError, match="compress"):
        _split_http(http(b"Content-Encoding: compress", b"not 1F 9D"))
    # every REGISTERED coding now decodes; unknown labels raise by name
    with pytest.raises(NotImplementedError, match="x-zaphod"):
        _split_http(http(b"Content-Encoding: x-zaphod", b"whatever"))
    with pytest.raises(WarcError, match="zstd"):
        _split_http(http(b"Content-Encoding: zstd", b"\x00bad frame"))
    # trailing garbage after a valid gzip member is corruption, not a
    # member — silently ignoring it hides data loss
    import zlib as _z2
    co = _z2.compressobj(6, _z2.DEFLATED, 31)
    gz_ok = co.compress(b"hello ") + co.flush()
    with pytest.raises(WarcError, match="trailing"):
        _split_http(http(b"Content-Encoding: gzip", gz_ok + b"JUNK"))
    # truncated mid-member raises (was silently empty pre-r12)
    with pytest.raises(WarcError, match="mid-member"):
        _split_http(http(b"Content-Encoding: gzip", gz_ok[:-4]))
    # strict=False containment: raw bytes flow with the unresolved
    # coding marked — one br response must not kill a WARC segment
    st, ct, out, enc = _split_http(
        http(b"Content-Encoding: br", b"whatever"), strict=False)
    assert (st, out, enc) == (200, b"whatever", "unresolved:br")
    st, _, out, enc = _split_http(
        http(b"Transfer-Encoding: chunked", b"ff\r\nshort"), strict=False)
    assert out == b"ff\r\nshort" and enc == "unresolved:chunked"
    # lying Content-Length: body is what the WARC record framed
    st, _, out, enc = _split_http(
        http(b"Content-Length: 99999", b"actual short body"))
    assert st == 200 and out == b"actual short body" and enc is None
    # Content-Encoding: identity is a no-op, reported as none
    st, _, out, enc = _split_http(
        http(b"Content-Encoding: identity", b"plain"))
    assert out == b"plain" and enc is None


def test_warc_typed_errors():
    import pytest

    from dolphinbeat_spark.sources.warc import (
        WarcError, encode_warc, iter_warc_records,
    )

    good = encode_warc([{"type": "resource", "record_id": "<r>",
                         "content": b"abc"}])
    with pytest.raises(WarcError, match="version line"):
        list(iter_warc_records(b"HTTP/1.1 200\r\n\r\n"))
    with pytest.raises(WarcError, match="not terminated"):
        list(iter_warc_records(good[:30]))
    with pytest.raises(WarcError, match="truncated"):
        list(iter_warc_records(good[:-7]))
    with pytest.raises(WarcError, match="Content-Length"):
        list(iter_warc_records(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n"))
    with pytest.raises(WarcError, match="gzip"):
        list(iter_warc_records(b"\x1f\x8b" + b"junkjunk"))


def test_inflation_caps_zip_bomb_guard():
    """r13 (ADVICE): every untrusted decompression path — HTTP coded
    bodies, JSONL shards, tar wrappers, ZIP deflate members — is
    inflation-capped, so a small crafted payload cannot inflate to
    gigabytes inside one Arrow batch; overruns raise each reader's
    OWN typed error so capture/strict=False containment absorbs them
    like any other corruption."""
    import gzip as G

    import pytest

    from dolphinbeat_spark.sources.inflate import (
        InflateError, inflation_cap,
    )

    # dynamic default: floor for small inputs, ratio-scaled for big
    assert inflation_cap(100) == 64 << 20
    assert inflation_cap(1 << 20) == 256 << 20
    assert inflation_cap(100, 5) == 5

    bomb = G.compress(b"\x00" * (8 << 20))  # ~8 KiB -> 8 MiB

    # WARC HTTP body: explicit cap raises WarcError...
    from dolphinbeat_spark.sources.warc import WarcError, _split_http
    http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + bomb)
    with pytest.raises(WarcError, match="cap"):
        _split_http(http, max_inflate=1 << 20)
    # ...and strict=False contains it as an unresolved coding
    st, _, body, enc = _split_http(http, strict=False,
                                   max_inflate=1 << 20)
    assert body == bomb and enc == "unresolved:gzip"
    # under the cap it inflates normally
    _, _, body, enc = _split_http(http)
    assert len(body) == 8 << 20 and enc == "gzip"

    # JSONL shard
    from dolphinbeat_spark.sources.jsonl import (
        JsonlError, decompress_auto,
    )
    with pytest.raises(JsonlError, match="cap"):
        decompress_auto(bomb, max_inflate=1 << 20)
    assert decompress_auto(bomb)[0] == "gzip"

    # tar wrapper
    from dolphinbeat_spark.sources.archives import (
        ArchiveError, encode_tar, iter_tar_members,
    )
    tgz = G.compress(encode_tar([("big.bin", b"\x00" * (4 << 20))]))
    with pytest.raises(ArchiveError, match="cap"):
        list(iter_tar_members(tgz, max_inflate=1 << 20))
    assert list(iter_tar_members(tgz, max_inflate=8 << 20)) \
        == [("big.bin", b"\x00" * (4 << 20))]

    # ZIP deflate member lying about its uncompressed size: bounded at
    # the declared size, typed error, never a giant materialization
    import struct as st_
    import zlib as z_
    from dolphinbeat_spark.sources.archives import iter_zip_members
    big = b"\x00" * (4 << 20)
    comp = z_.compress(big)[2:-4]  # raw deflate
    name = b"lie.bin"
    crc = z_.crc32(big) & 0xFFFFFFFF
    lho = (b"PK\x03\x04" + st_.pack("<HHHHHIII", 20, 0, 8, 0, 0, crc,
                                    len(comp), 10)  # usize LIES: 10
           + st_.pack("<HH", len(name), 0) + name)
    cd = (b"PK\x01\x02" + st_.pack("<HHHHHHIIIHHHHHII", 20, 20, 0, 8,
                                   0, 0, crc, len(comp), 10,
                                   len(name), 0, 0, 0, 0, 0, 0) + name)
    zdata = lho + comp
    eocd = (b"PK\x05\x06" + st_.pack("<HHHHIIH", 0, 0, 1, 1, len(cd),
                                     len(zdata), 0))
    with pytest.raises(ArchiveError, match="lie.bin"):
        list(iter_zip_members(zdata + cd + eocd))


def test_read_warc_spark(spark):
    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    recs = [{"type": "response", "record_id": "<r1>",
             "target_uri": "http://x/", "content": b"body-bytes",
             "http": {"status": 200, "content_type": "text/plain"}}]
    rows = [(6, bytearray(encode_warc(recs, gzip_members=True)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    (got,) = read_warc(df).collect()
    assert got.warc_type == "response" and got.http_status == 200
    assert got.content_type == "text/plain"
    assert got.body_text == "body-bytes" and got.body_len == 10


def test_warc_revisit_dedup_columns(spark):
    """r13: WARC revisit records surface the crawl's own dedup
    markers (WARC-Payload-Digest / WARC-Refers-To /
    WARC-Refers-To-Target-URI) as columns — joinable against the
    original fetch — and capture mode keeps emitting them while
    isolating a corrupt record in the same payload."""
    import hashlib

    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    body = b"the original payload bytes"
    dg = "md5:" + hashlib.md5(body).hexdigest()
    recs = [
        {"type": "response", "record_id": "<urn:a-1>",
         "target_uri": "http://x/orig", "content": body,
         "http": {"status": 200, "content_type": "text/plain"},
         "warc_headers": {"WARC-Payload-Digest": dg}},
        {"type": "revisit", "record_id": "<urn:a-2>",
         "target_uri": "http://mirror/x", "content": b"",
         "warc_headers": {
             "WARC-Payload-Digest": dg,
             "WARC-Refers-To": "<urn:a-1>",
             "WARC-Refers-To-Target-URI": "http://x/orig"}},
    ]
    blob = encode_warc(recs)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, payload binary")
    rows = {r.warc_type: r for r in read_warc(df).collect()}
    assert rows["response"].payload_digest == dg
    assert rows["response"].refers_to is None
    rv = rows["revisit"]
    assert (rv.payload_digest, rv.refers_to, rv.refers_to_uri) \
        == (dg, "<urn:a-1>", "http://x/orig")
    # capture-mode interplay: corrupt record between the two; the
    # revisit columns still flow on the surviving rows
    sep = blob.index(b"WARC/1.0", 10)
    corrupt = blob[:sep] + b"WARC/1.0\r\nbroken\r\n\r\n" + blob[sep:]
    df2 = spark.createDataFrame([(2, bytearray(corrupt))],
                                "media_id long, payload binary")
    got = read_warc(df2, errors="capture").collect()
    errs = [r for r in got if r.error is not None]
    good = {r.warc_type: r for r in got if r.error is None}
    assert len(errs) == 1 and len(good) == 2
    assert good["revisit"].refers_to == "<urn:a-1>"
    assert good["revisit"].payload_digest == dg


def test_warc_capture_mode_isolates_corrupt_record(spark):
    """errors="capture": one corrupt record among three becomes one
    error row and the OTHER records still flow (resync on the next
    \\r\\n\\r\\nWARC/ boundary); strict mode still raises. At 100 TB
    a corrupt record per segment is a statistical certainty — one must
    not kill a 1 GB segment's task."""
    import pytest

    from dolphinbeat_spark.sources.warc import (
        WarcError, encode_warc, iter_warc_records, read_warc,
    )

    def rec(n, body):
        return {"type": "response", "record_id": f"<urn:uuid:{n}>",
                "target_uri": f"http://x/{n}", "content": body,
                "http": {"status": 200, "content_type": "text/plain"}}

    r0 = encode_warc([rec(0, b"first-ok")])
    # corrupt record 1: its Content-Length claims bytes that aren't
    # there — the truncated-capture shape
    r1 = (b"WARC/1.0\r\nWARC-Type: response\r\n"
          b"WARC-Record-ID: <urn:uuid:bad>\r\n"
          b"Content-Length: 999999\r\n\r\nsecond-corrupt\r\n\r\n")
    r2 = encode_warc([rec(2, b"third-ok")])
    payload = r0 + r1 + r2
    with pytest.raises(WarcError):
        list(iter_warc_records(payload))
    got = list(iter_warc_records(payload, errors="capture"))
    bodies = [g["content"][-9:] for g in got if "error" not in g]
    assert any(b"first-ok" in b for b in bodies)
    assert any(b"third-ok" in b for b in bodies)
    assert sum("error" in g for g in got) >= 1
    # Spark surface: error column, good rows flow, nulls elsewhere
    df = spark.createDataFrame([(9, bytearray(payload))],
                               "media_id long, payload binary")
    with pytest.raises(Exception):
        read_warc(df).collect()
    rows = read_warc(df, errors="capture").collect()
    ok = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert len(bad) >= 1 and bad[0].body_text is None
    assert sorted(r.body_text for r in ok) == ["first-ok", "third-ok"]
    # capture over gzip members: a corrupt MEMBER salvages the rest
    gz = bytearray(encode_warc([rec(0, b"m-one"), rec(1, b"m-two"),
                                rec(2, b"m-three")], gzip_members=True))
    gz[12] ^= 0xFF  # corrupt inside member 0's deflate stream
    with pytest.raises(WarcError):
        list(iter_warc_records(bytes(gz)))
    got = list(iter_warc_records(bytes(gz), errors="capture"))
    salvaged = b"".join(g["content"] for g in got if "error" not in g)
    assert b"m-two" in salvaged and b"m-three" in salvaged
    assert sum("error" in g for g in got) >= 1


def test_read_warc_unresolved_coding_flows(spark):
    """ADVICE r11: a br-coded response (ubiquitous in crawls) must not
    fail the whole WARC payload — read_warc contains the coding
    failure, emits the RAW entity bytes, and marks http_encoding
    "unresolved:br" so downstream can filter."""
    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    raw_http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                b"Content-Encoding: br\r\n\r\n\x1b\x03\x00whatever")
    recs = [
        {"type": "response", "record_id": "<a>", "content": b"plain-ok",
         "http": {"status": 200, "content_type": "text/plain"}},
        {"type": "response", "record_id": "<b>", "content": raw_http,
         "content_type": "application/http; msgtype=response"},
    ]
    df = spark.createDataFrame(
        [(3, bytearray(encode_warc(recs)))], "media_id long, payload binary")
    rows = {r.record_id: r for r in read_warc(df).collect()}
    assert rows["<a>"].body_text == "plain-ok"
    assert rows["<b>"].http_encoding == "unresolved:br"
    assert rows["<b>"].http_status == 200
    assert rows["<b>"].body_len == len(b"\x1b\x03\x00whatever")


def test_unix_compress_lzw_z():
    """Unix compress (.Z) from scratch (r12, operators/lzw_z.py):
    encoder output is decompressed byte-identically by the SYSTEM
    gzip/uncompress (the living .Z reader) across inputs that cross
    every code-width boundary; the decoder roundtrips, enforces the
    bomb guard, and stays typed on hostile bytes. Wired as HTTP
    Content-Encoding: compress, the 1F 9D magic in JSONL sniffing,
    and the tar.Z wrapper."""
    import shutil
    import subprocess
    import tempfile

    import numpy as np

    from dolphinbeat_spark.operators.lzw_z import (
        ZCompressError, decode_z, encode_z,
    )

    rng = np.random.RandomState(0)
    cases = [b"", b"a", b"hello hello hello", b"ab" * 4000,
             bytes(rng.randint(0, 256, 60000, dtype=np.uint8).tolist()),
             b"the quick brown fox " * 8000]
    gzip_cli = shutil.which("gzip")
    for maxbits in (10, 12, 16):
        for d in cases:
            z = encode_z(d, maxbits=maxbits)
            assert decode_z(z) == d
            if gzip_cli:  # external pin: the de-facto .Z reader
                with tempfile.NamedTemporaryFile(suffix=".Z") as f:
                    f.write(z)
                    f.flush()
                    r = subprocess.run([gzip_cli, "-dc", f.name],
                                       capture_output=True)
                assert r.returncode == 0 and r.stdout == d, \
                    (maxbits, len(d))
    # CLEAR code resets the dictionary and carries the historical
    # 8-code group padding (r13, ADVICE): hand-built block-mode stream
    # with 9-bit codes 'a','b',CLEAR, zero-pad to the 72-bit group
    # boundary, then 'c' — exactly what compress 4.0's output() emits
    bits = 0
    acc = 0
    buf = bytearray()
    pos = 0
    for code in (97, 98, 256):
        acc |= code << bits
        bits += 9
        pos += 9
        while bits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    pad = (-pos) % 72  # flush the partial 8-code group, zero-padded
    bits += pad
    pos += pad
    while bits >= 8:
        buf.append(acc & 0xFF)
        acc >>= 8
        bits -= 8
    acc |= 99 << bits
    bits += 9
    while bits >= 8:
        buf.append(acc & 0xFF)
        acc >>= 8
        bits -= 8
    if bits:
        buf.append(acc & 0xFF)
    assert decode_z(b"\x1f\x9d\x90" + bytes(buf)) == b"abc"
    # adaptive-CLEAR corpus at unaligned group offsets, pinned against
    # the SYSTEM gzip -d (unlzw lineage — the living .Z reader): the
    # decoder's CLEAR resync must agree with it byte-for-byte
    rng3 = np.random.RandomState(13)
    clear_cases = [
        (b"abcd " * 3000, 7, 16),
        (b"abcd " * 3000, 100, 12),
        (bytes(rng3.randint(0, 256, 40000, dtype=np.uint8).tolist()),
         1000, 16),
        (b"ab" * 2000 + bytes(rng3.randint(0, 256, 20000,
                                           dtype=np.uint8).tolist()),
         333, 10),
    ]
    for d, every, maxbits in clear_cases:
        z = encode_z(d, maxbits=maxbits, clear_every=every)
        assert decode_z(z) == d, (every, maxbits)
        if gzip_cli:
            with tempfile.NamedTemporaryFile(suffix=".Z") as f:
                f.write(z)
                f.flush()
                r = subprocess.run([gzip_cli, "-dc", f.name],
                                   capture_output=True)
            assert r.returncode == 0 and r.stdout == d, (every, maxbits)
    # hostile: bad magic, reserved flags, out-of-range code, bomb cap
    with pytest.raises(ZCompressError, match="1F 9D"):
        decode_z(b"\x1f\x8bxx")
    with pytest.raises(ZCompressError, match="reserved"):
        decode_z(b"\x1f\x9d\xd0abc")
    with pytest.raises(ZCompressError, match="beyond"):
        decode_z(b"\x1f\x9d\x90\xff\xff\xff")
    with pytest.raises(ZCompressError, match="max_output"):
        decode_z(encode_z(b"x" * 10000), max_output=9999)
    # ingestion wiring: JSONL sniffing and the tar.Z wrapper
    from dolphinbeat_spark.sources.archives import (
        encode_tar, iter_tar_members,
    )
    from dolphinbeat_spark.sources.jsonl import decompress_auto
    raw = b'{"a": 1}\n{"a": 2}\n' * 50
    assert decompress_auto(encode_z(raw)) == ("compress", raw)
    tz = encode_z(encode_tar([("x.txt", b"member data")]))
    assert list(iter_tar_members(tz)) == [("x.txt", b"member data")]
    # bit-flip fuzz: corruption stays typed, never a foreign exception
    rng2 = np.random.RandomState(3)
    good = encode_z(b"the quick brown fox " * 500)
    for _ in range(150):
        b = bytearray(good)
        b[rng2.randint(0, len(b))] ^= 1 << rng2.randint(0, 8)
        try:
            decode_z(bytes(b), max_output=1_000_000)
        except ZCompressError:
            pass


def test_conformance_fixtures_external_authors():
    """r12 external-conformance regression pins that run WITHOUT the
    system libraries: committed giflib-AUTHORED GIFs must decode to
    the pinned index arrays (the palette is the gray identity), and
    committed libjpeg-AUTHORED Huffman JPEGs (baseline + progressive,
    gray + RGB, one with restart intervals) must decode within the
    IDCT tolerance of libjpeg's OWN decoded samples (committed as
    .ref). Authored by tools/make_conformance_fixtures.py; the
    expected values come from the third-party implementations only —
    the full matrices live in tools/{gif,jpeg,tiff,png}_conformance.py
    (dev-time, 0 failures at r12)."""
    import hashlib
    import json
    import os

    import numpy as np

    from dolphinbeat_spark.operators.jpeg import decode_jpeg
    from dolphinbeat_spark.operators.multimodal import decode_gif

    d = os.path.join(os.path.dirname(__file__), "fixtures", "golden",
                     "conformance")
    with open(os.path.join(d, "conformance_pins.json")) as f:
        pins = json.load(f)
    assert len(pins["gif"]) >= 2 and len(pins["jpeg"]) >= 4
    for name, pin in pins["gif"].items():
        with open(os.path.join(d, f"{name}.gif"), "rb") as f:
            blob = f.read()
        w, h, px = decode_gif(blob)
        assert (w, h) == (pin["width"], pin["height"]), name
        # gray-identity palette: channel 0 IS the index array
        assert (px[:, :, 0] == px[:, :, 1]).all()
        got = hashlib.sha256(px[:, :, 0].tobytes()).hexdigest()
        assert got == pin["index_sha256"], name
    for name, pin in pins["jpeg"].items():
        with open(os.path.join(d, f"{name}.jpg"), "rb") as f:
            blob = f.read()
        with open(os.path.join(d, f"{name}.ref"), "rb") as f:
            ref = np.frombuffer(f.read(), np.uint8)
        w, h, px = decode_jpeg(blob)
        assert (w, h) == (pin["width"], pin["height"]), name
        ref = ref.reshape(h, w, pin["channels"]).reshape(px.shape)
        diff = np.abs(px.astype(int) - ref.astype(int))
        assert diff.max() <= 3 and diff.mean() <= 0.5, \
            (name, diff.max(), diff.mean())


# --- TIFF (operators/tiff.py) -------------------------------------------------


def test_tiff_lzw_hand_vector():
    """The TIFF-LZW decoder reproduces a code stream hand-assembled
    from the spec's algorithm (MSB-first 9-bit codes): Clear(256),
    'A'(65), 'B'(66), 258(='AB' just entered), EOI(257) -> 'ABAB' —
    independent of the repo's encoder."""
    from dolphinbeat_spark.operators.tiff import tiff_lzw_decode

    assert tiff_lzw_decode(bytes.fromhex("801048502808"), 16) == b"ABAB"


def test_tiff_roundtrip_matrix():
    """Writer->decoder across compression (none/LZW/PackBits) ×
    predictor (none/horizontal differencing) × photometric
    (BlackIsZero/WhiteIsZero/RGB/Palette) × byte order × multi-strip,
    plus 16-bit samples and LZW streams long enough to grow the code
    width past 9 bits."""
    import numpy as np

    from dolphinbeat_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(9)
    for end in ("<", ">"):
        for comp in (1, 5, 32773):
            # Predictor pairs with LZW only (TIFF 6.0 §14; the
            # reference reader ignores it elsewhere — r12)
            for pred in ((1, 2) if comp == 5 else (1,)):
                for spp, photo in ((1, 1), (3, 2), (1, 0)):
                    want = rng.randint(0, 256, (13, 21, spp), dtype=np.uint8)
                    enc = encode_tiff(21, 13, want.tobytes(), spp=spp,
                                      photometric=photo, compression=comp,
                                      predictor=pred, rows_per_strip=5,
                                      byte_order=end)
                    w, h, px = decode_tiff(enc)
                    show = 255 - want if photo == 0 else want
                    assert (w, h) == (21, 13) and np.array_equal(px, show)
    w16 = rng.randint(0, 65536, (7, 9, 1), dtype=np.uint16)
    for end in ("<", ">"):
        enc = encode_tiff(9, 7, w16.astype(end + "u2").tobytes(), depth=16,
                          compression=5, predictor=2, byte_order=end)
        _, _, px = decode_tiff(enc)
        assert px.dtype == np.uint16 and np.array_equal(px, w16)
    cmap = list(rng.randint(0, 65536, 3 * 256))
    idx = rng.randint(0, 256, (5, 8, 1), dtype=np.uint8)
    enc = encode_tiff(8, 5, idx.tobytes(), photometric=3, colormap=cmap,
                      compression=32773)
    _, _, px = decode_tiff(enc)
    lut = np.array(cmap).reshape(3, 256).T >> 8
    assert np.array_equal(px, lut[idx.reshape(5, 8)])
    big = rng.randint(0, 256, (40, 200, 3), dtype=np.uint8)
    _, _, px = decode_tiff(encode_tiff(200, 40, big.tobytes(), spp=3,
                                       compression=5))
    assert np.array_equal(px, big)


def test_tiff_tiled_and_planar_roundtrip():
    """Tiled organization (§15: edge tiles cropped in BOTH dimensions,
    per-tile predictor restart) × planar configuration 2 (per-plane
    segments, plane-major) × compression × byte order, incl. 16-bit —
    closing the r9 boundary."""
    import numpy as np

    from dolphinbeat_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(17)
    want = rng.randint(0, 256, (13, 20, 3), dtype=np.uint8)
    for comp in (1, 5, 32773):
        for pred in ((1, 2) if comp == 5 else (1,)):
            for planar in (1, 2):
                for tile in (None, (8, 8), (16, 4)):
                    for end in ("<", ">"):
                        enc = encode_tiff(
                            20, 13, want.tobytes(), spp=3, compression=comp,
                            predictor=pred, planar=planar, tile=tile,
                            rows_per_strip=5, byte_order=end,
                        )
                        w, h, px = decode_tiff(enc)
                        assert (w, h) == (20, 13) and np.array_equal(px, want)
    w16 = rng.randint(0, 65536, (10, 9, 1), dtype=np.uint16)
    for end in ("<", ">"):
        enc = encode_tiff(9, 10, w16.astype(end + "u2").tobytes(), depth=16,
                          compression=5, predictor=2, tile=(4, 4),
                          byte_order=end)
        _, _, px = decode_tiff(enc)
        assert px.dtype == np.uint16 and np.array_equal(px, w16)


def test_tiff_tiled_hostile_bytes():
    """Bit flips on a tiled planar-2 TIFF raise the typed family or
    decode benignly — never a foreign exception."""
    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.tiff import TiffError, decode_tiff, encode_tiff

    good = encode_tiff(20, 13, bytes(range(13 * 20 * 3 % 256)) * 0
                       + bytes((i * 7) % 256 for i in range(13 * 20 * 3)),
                       spp=3, compression=5, predictor=2, planar=2,
                       tile=(8, 8))
    rng = np.random.RandomState(31)
    for _ in range(120):
        data = bytearray(good)
        i = int(rng.randint(0, len(data)))
        data[i] ^= 1 << int(rng.randint(0, 8))
        try:
            decode_tiff(bytes(data))
        except (TiffError, NotImplementedError):
            pass
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"untyped crash on corrupted tiled TIFF: {ex!r}")


def test_tiff_jpeg_compression7():
    """JPEG-in-TIFF (Compression 7, r13): strips and tiles route
    through the in-repo JPEG decoder; the JPEGTables abbreviated
    layout merges; flat even-valued strips roundtrip EXACTLY (the DC
    quantization closed form the oracle spec leans on); gradient
    content stays within codec tolerance; hostile bytes stay typed.
    libtiff agreement is pinned separately in
    tools/tiff_conformance.py."""
    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.tiff import (
        TiffError, decode_tiff, encode_tiff_jpeg,
    )

    # exact: flat strips with even values
    px = np.concatenate([np.full((4, 8, 1), v, np.uint8)
                         for v in (8, 248, 120)])
    for split in (False, True):
        for bo in ("<", ">"):
            blob = encode_tiff_jpeg(8, 12, px.tobytes(), gray=True,
                                    rows_per_strip=4,
                                    split_tables=split, byte_order=bo)
            w, h, arr = decode_tiff(blob)
            assert (w, h) == (8, 12) and (arr == px).all(), (split, bo)
    # tolerance: smooth gradients, gray + RGB, strips + tiles
    yy, xx = np.mgrid[0:33, 0:50]
    for gray in (True, False):
        c = 1 if gray else 3
        g = np.zeros((33, 50, c), np.uint8)
        for k in range(c):
            g[:, :, k] = (20 + xx * 2 + yy + k * 30).clip(0, 255)
        for kw in ({"rows_per_strip": 8, "split_tables": True},
                   {"tiles": (16, 16)},
                   {"subsample": "420"}):
            blob = encode_tiff_jpeg(50, 33, g.tobytes(), gray=gray, **kw)
            w, h, arr = decode_tiff(blob)
            err = np.abs(arr.astype(int) - g.astype(int)).max()
            assert (w, h) == (50, 33) and err <= 10, (gray, kw, err)
    # hostile: corrupt strip data stays typed
    blob = bytearray(encode_tiff_jpeg(8, 12, px.tobytes(), gray=True,
                                      rows_per_strip=4,
                                      split_tables=True))
    rng = np.random.RandomState(21)
    for _ in range(120):
        b = bytearray(blob)
        b[rng.randint(0, len(b))] ^= 1 << rng.randint(0, 8)
        try:
            decode_tiff(bytes(b))
        except (TiffError, NotImplementedError):
            pass


def test_tiff_typed_errors_and_honest_boundaries():
    import pytest

    from dolphinbeat_spark.operators.tiff import (
        TiffError, decode_tiff, encode_tiff, tiff_lzw_decode,
    )

    with pytest.raises(TiffError, match="II/MM"):
        decode_tiff(b"XX\x2a\x00")
    good = bytearray(encode_tiff(4, 4, bytes(16)))
    bad = bytearray(good)
    bad[2] = 43
    with pytest.raises(TiffError, match="magic"):
        decode_tiff(bytes(bad))
    with pytest.raises(TiffError, match="overruns|truncated"):
        decode_tiff(bytes(good[:30]))
    # LZW stream without EOI / oversized output are typed
    with pytest.raises(TiffError, match="EOI"):
        tiff_lzw_decode(bytes.fromhex("801048"), 100)
    with pytest.raises(TiffError, match="exceeds"):
        tiff_lzw_decode(bytes.fromhex("801048502808"), 2)
    # unsupported compression raises by name
    comp = bytearray(encode_tiff(4, 4, bytes(16)))
    i = bytes(comp).find((259).to_bytes(2, "little"))
    comp[i + 8] = 9  # compression 9 (undefined)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(bytes(comp))
    # compression 6 decodes since r15, but a compression-6 file
    # without either §22 layout still raises by name
    comp[i + 8] = 6
    with pytest.raises(NotImplementedError, match="JPEGQTables"):
        decode_tiff(bytes(comp))


def test_tiff_ojpeg_compression6():
    """Old-style JPEG (Compression 6, r15): both §22 layouts across
    byte orders; flat v = 16d+8 roundtrips exactly (the compression-7
    closed form); multi-strip tables form matches the direct JPEG
    roundtrip; hostile fuzz stays typed."""
    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from dolphinbeat_spark.operators.tiff import (
        TiffError, decode_tiff, encode_tiff_ojpeg,
    )

    for layout in ("interchange", "tables"):
        for end in ("<", ">"):
            for d in (0, 7, 15):
                v = 16 * d + 8
                t = encode_tiff_ojpeg(16, 8, bytes([v]) * 128,
                                      gray=True, layout=layout,
                                      byte_order=end)
                w, h, px = decode_tiff(t)
                assert (w, h) == (16, 8) and (px == v).all(), \
                    (layout, end, v)
    # RGB both layouts (flat chroma, small IDCT tolerance)
    for layout in ("interchange", "tables"):
        t = encode_tiff_ojpeg(16, 16, bytes([100, 150, 200]) * 256,
                              layout=layout)
        px = decode_tiff(t)[2]
        assert np.abs(px.astype(int)
                      - np.array([100, 150, 200])).max() <= 2
    # multi-strip tables form == the direct JPEG roundtrip per strip
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (24, 16), dtype=np.uint8)
    t = encode_tiff_ojpeg(16, 24, img.tobytes(), gray=True,
                          layout="tables", rows_per_strip=8)
    got = decode_tiff(t)[2][:, :, 0]
    want = np.vstack([
        decode_jpeg(encode_jpeg(16, 8, img[r:r + 8].tobytes(),
                                gray=True))[2][:, :, 0]
        for r in range(0, 24, 8)
    ])
    assert np.array_equal(got, want)
    # r16 (ADVICE): interchange stream whose component count
    # contradicts the IFD's SamplesPerPixel raises, mirroring the
    # tables-form check (RGB stream, IFD patched to say spp=1)
    t = bytearray(encode_tiff_ojpeg(16, 16,
                                    bytes([100, 150, 200]) * 256,
                                    layout="interchange"))
    i = bytes(t).find((277).to_bytes(2, "little"))
    assert i > 0 and t[i + 8] == 3
    t[i + 8] = 1
    with pytest.raises(TiffError, match="SamplesPerPixel"):
        decode_tiff(bytes(t))
    # hostile fuzz over both layouts stays typed
    seeds = [encode_tiff_ojpeg(8, 8, bytes(64), gray=True,
                               layout=lo) for lo in ("interchange",
                                                     "tables")]
    for good in seeds:
        for _ in range(150):
            b = bytearray(good)
            b[int(rng.randint(0, len(b)))] ^= 1 << int(
                rng.randint(0, 8))
            try:
                decode_tiff(bytes(b))
            except (TiffError, NotImplementedError):
                pass
            except Exception as ex:  # pragma: no cover
                pytest.fail(f"untyped crash on corrupt OJPEG: {ex!r}")


def test_decode_media_sniffs_tiff(spark):
    import numpy as np

    from dolphinbeat_spark.operators.multimodal import decode_media
    from dolphinbeat_spark.operators.tiff import encode_tiff

    want = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    rows = [(5, bytearray(encode_tiff(4, 4, want.tobytes(), spp=3,
                                      compression=5, predictor=2)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    (got,) = decode_media(df).collect()
    assert got.fmt == "tiff" and (got.width, got.height) == (4, 4)
    assert got.pixel_sum == int(want.sum())


# --- archives (sources/archives.py) --------------------------------------------


def test_archive_readers_cross_checked_with_stdlib():
    """The from-scratch ZIP/TAR readers and writers interoperate with
    the stdlib zipfile/tarfile modules in BOTH directions — the
    strongest independent pin in the tree — across stored+deflated
    ZIP members and plain+gzipped ustar."""
    import io
    import tarfile
    import zipfile

    from dolphinbeat_spark.sources.archives import (
        encode_tar, encode_zip, iter_tar_members, iter_zip_members,
    )

    members = [("a.txt", b"hello world"), ("dir/b.json", b'{"k": 1}' * 40),
               ("c.bin", bytes(range(256)))]
    for deflate in (True, False):
        z = encode_zip(members, deflate=deflate)
        zf = zipfile.ZipFile(io.BytesIO(z))
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] == members
        assert list(iter_zip_members(z)) == members
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, c in members:
            zf.writestr(n, c)
    assert list(iter_zip_members(buf.getvalue())) == members

    for gz in (False, True):
        t = encode_tar(members, gzip_wrap=gz)
        assert list(iter_tar_members(t)) == members
        tf = tarfile.open(fileobj=io.BytesIO(t), mode="r:gz" if gz else "r")
        assert [(m.name, tf.extractfile(m).read())
                for m in tf if m.isfile()] == members
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for n, c in members:
            ti = tarfile.TarInfo(n)
            ti.size = len(c)
            tf.addfile(ti, io.BytesIO(c))
    assert list(iter_tar_members(buf.getvalue())) == members


def test_archive_tar_bz2_xz_wrappers():
    """tar.bz2 / tar.xz unwrap by magic, cross-pinned against stdlib
    tarfile writing the compressed form; hostile wrappers raise the
    typed error."""
    import bz2
    import io
    import lzma
    import tarfile

    import pytest

    from dolphinbeat_spark.sources.archives import (
        ArchiveError, encode_tar, iter_tar_members,
    )

    members = [("a.txt", b"alpha"), ("d/b.bin", bytes(range(64)) * 3)]
    plain = encode_tar(members)
    assert list(iter_tar_members(bz2.compress(plain))) == members
    assert list(iter_tar_members(lzma.compress(plain))) == members
    # independent writer: stdlib tarfile in w:bz2 / w:xz modes
    for mode in ("w:bz2", "w:xz"):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode=mode) as tf:
            for n, c in members:
                ti = tarfile.TarInfo(n)
                ti.size = len(c)
                tf.addfile(ti, io.BytesIO(c))
        assert list(iter_tar_members(buf.getvalue())) == members, mode
    with pytest.raises(ArchiveError, match="bzip2"):
        list(iter_tar_members(b"BZh9" + b"\x00" * 40))
    with pytest.raises(ArchiveError, match="xz"):
        list(iter_tar_members(b"\xfd7zXZ\x00" + b"\x00" * 40))


def test_archive_zipcrypto():
    """Traditional ZipCrypto (APPNOTE 6.1) with a supplied password:
    round-trips across deflate/stored and classic/Zip64 layouts, the
    stdlib zipfile reads our encrypted output (independent
    implementation agrees on the cipher), wrong passwords fail on the
    crypto-header check byte, and no-password keeps the honest typed
    boundary."""
    import io
    import zipfile

    import pytest

    from dolphinbeat_spark.sources.archives import (
        ArchiveError, encode_zip, iter_zip_members,
    )

    members = [("a.txt", b"alpha secret"), ("b/c.bin", bytes(range(200)))]
    for deflate in (True, False):
        for z64 in (False, True):
            z = encode_zip(members, deflate=deflate, zip64=z64,
                           password=b"hunter2")
            got = list(iter_zip_members(z, password=b"hunter2"))
            assert got == members, (deflate, z64)
            zf = zipfile.ZipFile(io.BytesIO(z))
            zf.setpassword(b"hunter2")
            assert [(i.filename, zf.read(i))
                    for i in zf.infolist()] == members, (deflate, z64)
    z = encode_zip(members, password=b"hunter2")
    with pytest.raises(ArchiveError, match="wrong password"):
        list(iter_zip_members(z, password=b"letmein"))
    with pytest.raises(NotImplementedError, match="password="):
        list(iter_zip_members(z))


def test_archive_zip_aes_detection_by_header_id():
    """AES detection walks the extra field as (id, size) records: an
    unrelated extra whose PAYLOAD contains the bytes 01 99 must not
    reroute a valid ZipCrypto member (r10 ADVICE finding), while a
    real 0x9901 AE-x record routes into the AES path — where a
    ZipCrypto body fails TYPED on the password verifier (r11: AES is
    now implemented, so the old raise-by-name became a decrypt)."""
    import struct

    import pytest

    from dolphinbeat_spark.sources.archives import (
        ArchiveError, encode_zip, iter_zip_members,
    )

    def _with_cd_extra(z: bytes, extra: bytes) -> bytes:
        # splice an extra field into the FIRST central-directory
        # entry; cdoff/ntotal stay valid (extras live inside entries)
        cd = z.find(b"PK\x01\x02")
        assert cd >= 0
        (nlen, elen, klen) = struct.unpack_from("<HHH", z, cd + 28)
        assert elen == 0
        out = bytearray(z)
        struct.pack_into("<H", out, cd + 30, len(extra))
        insert_at = cd + 46 + nlen
        out[insert_at:insert_at] = extra
        # EOCD cd-size grows by len(extra)
        eocd = bytes(out).rfind(b"PK\x05\x06")
        (cdsize,) = struct.unpack_from("<I", out, eocd + 12)
        struct.pack_into("<I", out, eocd + 12, cdsize + len(extra))
        return bytes(out)

    members = [("x.txt", b"payload with entropy 123")]
    z = encode_zip(members, password=b"pw")
    # benign extra (0x5455 ext-timestamp) whose payload CONTAINS 01 99
    benign = struct.pack("<HH", 0x5455, 5) + b"\x03\x01\x99\x00\x00"
    got = list(iter_zip_members(_with_cd_extra(z, benign), password=b"pw"))
    assert got == members
    # a genuine 0x9901 AE-x record routes into the AES decrypt, where
    # the (actually ZipCrypto) body fails the PBKDF2 verifier typed
    aes = struct.pack("<HH", 0x9901, 7) + b"\x02\x00AE\x03\x08\x00"
    with pytest.raises(ArchiveError, match="wrong password|too short"):
        list(iter_zip_members(_with_cd_extra(z, aes), password=b"pw"))


def test_archive_zip64():
    """Zip64 (EOCD64 locator+record, 0x0001 extras): the from-scratch
    reader decodes a forced-Zip64 file, the stdlib zipfile reads our
    forced-Zip64 writer output byte-identically (independent pin), and
    a REAL stdlib-written Zip64 archive — 65 540 members, over the
    16-bit count that forces the Zip64 EOCD in the wild — enumerates
    completely (pre-fix this raised 'Zip64 not supported')."""
    import io
    import zipfile

    from dolphinbeat_spark.sources.archives import (
        encode_zip, iter_zip_members,
    )

    members = [("a.txt", b"hello world"), ("big/b.bin", bytes(range(256)) * 8),
               ("c.json", b'{"k": 1}' * 100)]
    for deflate in (True, False):
        z = encode_zip(members, deflate=deflate, zip64=True)
        assert list(iter_zip_members(z)) == members
        zf = zipfile.ZipFile(io.BytesIO(z))  # independent reader agrees
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] == members
    # independent writer: stdlib produces the Zip64 EOCD when the
    # member count exceeds 0xFFFF
    n = 65_540
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for i in range(n):
            zf.writestr(f"m{i:05d}", b"" if i else b"first")
    got = list(iter_zip_members(buf.getvalue()))
    assert len(got) == n
    assert got[0] == ("m00000", b"first") and got[-1] == (f"m{n-1:05d}", b"")


def test_archive_zip64_hostile_bytes():
    """Corrupting a Zip64 file must raise the typed error family,
    never a foreign exception (the hostile-bytes pin the other
    decoders carry)."""
    import numpy as np
    import pytest

    from dolphinbeat_spark.sources.archives import (
        ArchiveError, encode_zip, iter_zip_members,
    )

    good = encode_zip([("x.txt", b"abc" * 50)], zip64=True)
    rng = np.random.RandomState(11)
    for _ in range(120):
        data = bytearray(good)
        i = int(rng.randint(0, len(data)))
        data[i] ^= 1 << int(rng.randint(0, 8))
        try:
            got = list(iter_zip_members(bytes(data)))
            # names/counts aren't CRC-protected by the format, so a
            # flip there can alter them undetectably; member CONTENT
            # is CRC-gated and must never change silently
            assert all(c == b"abc" * 50 for _, c in got)
        except (ArchiveError, NotImplementedError):
            pass
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"untyped crash on corrupted Zip64 input: {ex!r}")


def test_archive_typed_errors():
    import pytest

    from dolphinbeat_spark.sources.archives import (
        ArchiveError, encode_tar, encode_zip, iter_tar_members,
        iter_zip_members,
    )

    with pytest.raises(ArchiveError, match="end-of-central"):
        list(iter_zip_members(b"PK\x03\x04" + bytes(30)))
    good = bytearray(encode_zip([("x", b"abc")], deflate=False))
    # flip a STORED content byte: CRC catches it
    bad = bytearray(good)
    bad[bytes(good).index(b"abc", 30)] ^= 1
    with pytest.raises(ArchiveError, match="CRC"):
        list(iter_zip_members(bytes(bad)))
    tbad = bytearray(encode_tar([("x", b"abc")]))
    tbad[150] ^= 1
    with pytest.raises(ArchiveError, match="checksum"):
        list(iter_tar_members(bytes(tbad)))
    with pytest.raises(ArchiveError, match="truncated"):
        list(iter_tar_members(encode_tar([("x", b"abc" * 200)])[:600]))


def test_read_archive_spark(spark):
    from dolphinbeat_spark.sources.archives import (
        encode_tar, encode_zip, read_archive,
    )

    members = [("n1.txt", b"alpha"), ("n2.txt", b"beta-beta")]
    rows = [
        (1, bytearray(encode_zip(members))),
        (2, bytearray(encode_tar(members, gzip_wrap=True))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = read_archive(df).orderBy("media_id", "member_idx").collect()
    assert [r.archive_fmt for r in got] == ["zip", "zip", "tar", "tar"]
    assert [r.name for r in got] == ["n1.txt", "n2.txt"] * 2
    assert [r.text for r in got] == ["alpha", "beta-beta"] * 2


def test_archive_capture_mode_isolates_corrupt_member(spark):
    """errors="capture" on read_archive: one corrupt member (flipped
    STORED byte → CRC mismatch in ZIP; corrupted header checksum in
    TAR) costs ONE error row; the other members still flow. Strict
    mode still raises on the same bytes."""
    import pytest

    from dolphinbeat_spark.sources.archives import (
        ArchiveError, encode_tar, encode_zip, iter_tar_members,
        iter_zip_members, read_archive,
    )

    members = [("a.txt", b"alpha"), ("b.txt", b"bravo"), ("c.txt", b"charlie")]
    zbad = bytearray(encode_zip(members, deflate=False))
    zbad[bytes(zbad).index(b"bravo", 30)] ^= 1  # corrupt member b only
    with pytest.raises(ArchiveError, match="CRC"):
        list(iter_zip_members(bytes(zbad)))
    got = list(iter_zip_members(bytes(zbad), errors="capture"))
    assert [(n, c) for n, c, e in got if e is None] == [
        ("a.txt", b"alpha"), ("c.txt", b"charlie")]
    assert [n for n, c, e in got if e is not None] == ["b.txt"]

    tbad = bytearray(encode_tar(members))
    # corrupt member b's HEADER checksum (header 2 starts at block 2:
    # a=512 hdr + 512 data, so b's header is at offset 1024)
    tbad[1024 + 150] ^= 1
    with pytest.raises(ArchiveError, match="checksum"):
        list(iter_tar_members(bytes(tbad)))
    got = list(iter_tar_members(bytes(tbad), errors="capture"))
    ok = [(n, c) for n, c, e in got if e is None]
    assert ("a.txt", b"alpha") in ok and ("c.txt", b"charlie") in ok
    assert sum(e is not None for _, _, e in got) == 1

    # Spark surface: error column; good rows flow with null error
    df = spark.createDataFrame(
        [(1, bytearray(zbad)), (2, bytearray(tbad))],
        "media_id long, payload binary")
    with pytest.raises(Exception):
        read_archive(df).collect()
    rows = read_archive(df, errors="capture").collect()
    ok = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert sorted(r.text for r in ok) == ["alpha", "alpha", "charlie",
                                          "charlie"]
    assert len(bad) == 2 and all(r.size is None for r in bad)


# --- compressed JSONL (sources/jsonl.py) ---------------------------------------


def test_jsonl_decompress_auto_all_codecs():
    """Magic sniffing picks the right codec: plain, multi-member
    gzip, bzip2, xz, and zstd — the last through the from-scratch
    RFC 8878 decoder, here fed REAL compressed frames from the
    reference zstd CLI when available, else the store-frame writer."""
    import bz2
    import lzma
    import shutil
    import subprocess
    import zlib

    from dolphinbeat_spark.operators.zstd_frame import encode_zstd_store
    from dolphinbeat_spark.sources.jsonl import JsonlError, decompress_auto

    raw = b'{"a": 1}\n{"a": 2}\n' * 20
    assert decompress_auto(raw) == ("plain", raw)
    co1 = zlib.compressobj(6, zlib.DEFLATED, 31)
    co2 = zlib.compressobj(6, zlib.DEFLATED, 31)
    half = len(raw) // 2
    two_members = (co1.compress(raw[:half]) + co1.flush()
                   + co2.compress(raw[half:]) + co2.flush())
    assert decompress_auto(two_members) == ("gzip", raw)
    assert decompress_auto(bz2.compress(raw)) == ("bzip2", raw)
    assert decompress_auto(lzma.compress(raw)) == ("xz", raw)
    assert decompress_auto(encode_zstd_store(raw)) == ("zstd", raw)
    if shutil.which("zstd"):
        real = subprocess.run(["zstd", "-c", "-19"], input=raw,
                              capture_output=True, check=True).stdout
        assert decompress_auto(real) == ("zstd", raw)

    import pytest

    with pytest.raises(JsonlError, match="gzip"):
        decompress_auto(b"\x1f\x8bgarbage")
    with pytest.raises(JsonlError, match="bzip2"):
        decompress_auto(b"BZhgarbage")


def test_read_jsonl_spark(spark):
    from dolphinbeat_spark.operators.zstd_frame import encode_zstd_store
    from dolphinbeat_spark.sources.jsonl import read_jsonl

    raw = b'{"x": 1}\n\n{"x": 3}\n'  # interior blank line preserved
    rows = [(7, bytearray(encode_zstd_store(raw)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = read_jsonl(df).orderBy("line_idx").collect()
    assert [r.line for r in got] == ['{"x": 1}', "", '{"x": 3}']
    assert got[0].codec == "zstd"


# --- AIFF (operators/multimodal.py::decode_aiff) --------------------------------


def test_aiff_roundtrip_and_stdlib_crosscheck():
    """The AIFF decoder handles 8 (SIGNED, unlike WAV) /16/24/32-bit
    big-endian PCM, the AIFF-C 'sowt' little-endian variant, and the
    80-bit extended-float sample rate; our writer's output is also
    read back by the stdlib aifc module (independent reference)."""
    import io
    import warnings

    import numpy as np

    from dolphinbeat_spark.operators.multimodal import (
        decode_aiff, encode_aiff,
    )

    rng = np.random.RandomState(4)
    for bits in (8, 16, 24, 32):
        lim = 1 << (bits - 1)
        s = rng.randint(-lim, lim, (200, 2))
        rate, ch, n, out = decode_aiff(encode_aiff(s, 44100, bits=bits))
        assert (rate, ch, n) == (44100, 2, 400)
        assert np.array_equal(out.astype(np.int64), s.reshape(-1)), bits
    s = rng.randint(-32768, 32768, (150, 1))
    rate, _, _, out = decode_aiff(
        encode_aiff(s, 22050, bits=16, compression=b"sowt")
    )
    assert rate == 22050 and np.array_equal(out.astype(np.int64),
                                            s.reshape(-1))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import aifc
    s = rng.randint(-32768, 32768, (100, 2))
    a = aifc.open(io.BytesIO(encode_aiff(s, 48000, bits=16)))
    assert (a.getframerate(), a.getnchannels(), a.getsampwidth()) \
        == (48000, 2, 2)
    got = np.frombuffer(a.readframes(100), ">i2")
    assert np.array_equal(got.astype(np.int64), s.reshape(-1))
    for r in (8000, 11025, 44100, 96000, 192000):
        assert decode_aiff(encode_aiff(np.zeros((4, 1)), r))[0] == r


def test_aiff_typed_errors():
    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.multimodal import (
        decode_aiff, encode_aiff,
    )

    good = bytearray(encode_aiff(np.zeros((8, 1)), 8000))
    with pytest.raises(ValueError, match="not an AIFF"):
        decode_aiff(b"RIFF" + bytes(good[4:]))
    with pytest.raises(ValueError, match="truncated"):
        decode_aiff(bytes(good[:-3]))
    # AIFC with a perceptual compression type raises by name
    ulaw = bytearray(encode_aiff(np.zeros((8, 1)), 8000,
                                 compression=b"sowt"))
    i = bytes(ulaw).index(b"sowt")
    ulaw[i:i + 4] = b"ulaw"
    with pytest.raises(NotImplementedError, match="ulaw"):
        decode_aiff(bytes(ulaw))


def test_decode_audio_sniffs_aiff(spark):
    import numpy as np

    from dolphinbeat_spark.operators.multimodal import (
        decode_audio, encode_aiff,
    )

    s = np.arange(-50, 50).reshape(-1, 1)
    rows = [(8, bytearray(encode_aiff(s, 8000, bits=16)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    (got,) = decode_audio(df).collect()
    assert got.fmt == "aiff" and got.sample_rate == 8000
    assert got.n_samples == 100 and got.sample_sum == int(s.sum())


# --- WebP lossless (operators/webp.py) ------------------------------------------


def test_vp8l_hand_assembled_vector():
    """A 2x1 VP8L stream assembled bit by bit from the spec text with
    an in-test LSB writer (independent of the repo's encoder): header
    fields, simple-form prefix codes (1- and 2-symbol), and literal
    pixel decode with single-symbol alpha consuming zero bits."""
    import struct

    import numpy as np

    from dolphinbeat_spark.operators.webp import decode_webp

    bits = []

    def put(v, n):
        for i in range(n):
            bits.append((v >> i) & 1)

    def put_simple2(a, b):
        put(1, 1)  # simple code
        put(1, 1)  # 2 symbols
        put(1, 1)  # 8-bit first symbol
        put(a, 8)
        put(b, 8)

    def put_simple1(s):
        put(1, 1)
        put(0, 1)
        put(1, 1)
        put(s, 8)

    put(1, 14)   # width - 1
    put(0, 14)   # height - 1
    put(0, 1)    # alpha hint
    put(0, 3)    # version
    put(0, 1)    # no transforms
    put(0, 1)    # no color cache
    put(0, 1)    # no meta prefix image
    put_simple2(2, 5)   # green: symbols {2, 5}, 1 bit each
    put_simple2(1, 4)   # red
    put_simple2(3, 6)   # blue
    put_simple1(255)    # alpha: single symbol, zero bits per use
    put_simple1(0)      # distance: unused but mandatory
    # P1 = (r1 g2 b3 a255): green 2 -> code 0, red 1 -> 0, blue 3 -> 0
    put(0, 1); put(0, 1); put(0, 1)
    # P2 = (r4 g5 b6): all the second (code 1) symbols
    put(1, 1); put(1, 1); put(1, 1)
    payload = bytearray(b"\x2f")
    acc = 0
    for i, b in enumerate(bits):
        acc |= b << (i % 8)
        if i % 8 == 7:
            payload.append(acc)
            acc = 0
    if len(bits) % 8:
        payload.append(acc)
    riff = b"VP8L" + struct.pack("<I", len(payload)) + bytes(payload)
    if len(payload) & 1:
        riff += b"\x00"
    stream = b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff
    w, h, px = decode_webp(stream)
    assert (w, h) == (2, 1)
    assert np.array_equal(
        px, np.array([[[1, 2, 3, 255], [4, 5, 6, 255]]], np.uint8)
    )


def test_vp8l_roundtrip_matrix():
    """Writer->decoder across literals, LZ77 runs (dist-1 and
    dist-width through the neighbor map), color cache hits, ALL 14
    predictor modes, the color transform, subtract-green, palettes at
    every packing width (<=2/4/16/256 colors), and stacked
    transforms."""
    import numpy as np

    from dolphinbeat_spark.operators.webp import (
        decode_webp, encode_webp_lossless,
    )

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (9, 13, 4), dtype=np.uint8)
    img[3:6, :, :] = img[2:3, :, :]
    img[7, 4:11] = img[7, 3]
    for kw in (dict(), dict(lz77_min=4), dict(use_cache_bits=4),
               dict(use_cache_bits=6, lz77_min=5),
               dict(subtract_green=True),
               dict(subtract_green=True, use_cache_bits=3, lz77_min=4)):
        w, h, out = decode_webp(encode_webp_lossless(img, **kw))
        assert (w, h) == (13, 9) and np.array_equal(out, img), kw
    for mode in range(14):
        _, _, out = decode_webp(encode_webp_lossless(img,
                                                     predictor=(mode, 3)))
        assert np.array_equal(out, img), ("predictor", mode)
    for cte in ((0x10, 0x20, 0x30, 2), (0xF0, 0x85, 0x7F, 4)):
        _, _, out = decode_webp(encode_webp_lossless(img, color=cte))
        assert np.array_equal(out, img), ("color", cte)
    for nc in (2, 4, 13, 200):
        pal_img = rng.randint(0, 256, (nc, 4), dtype=np.uint8)[
            rng.randint(0, nc, (11, 23))
        ]
        _, _, out = decode_webp(encode_webp_lossless(pal_img, palette=True))
        assert np.array_equal(out, pal_img), ("palette", nc)
    _, _, out = decode_webp(encode_webp_lossless(
        img, predictor=(7, 3), subtract_green=True, use_cache_bits=4,
        lz77_min=6,
    ))
    assert np.array_equal(out, img)


def test_webp_typed_errors_and_lossy_boundary():
    import struct

    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.webp import (
        WebpError, decode_webp, encode_webp_lossless,
    )

    img = np.zeros((2, 2, 4), np.uint8)
    good = bytearray(encode_webp_lossless(img))
    with pytest.raises(WebpError, match="RIFF/WEBP"):
        decode_webp(b"RIFX" + bytes(good[4:]))
    # a VP8L payload relabeled as a lossy chunk routes into the VP8
    # decoder (r11) and fails TYPED there (it is not a key frame)
    from dolphinbeat_spark.operators.vp8 import Vp8Error

    lossy = bytearray(good)
    i = bytes(lossy).index(b"VP8L")
    lossy[i:i + 4] = b"VP8 "
    with pytest.raises((Vp8Error, NotImplementedError)):
        decode_webp(bytes(lossy))
    bad_sig = bytearray(good)
    bad_sig[i + 8] = 0x30  # VP8L signature byte
    with pytest.raises(WebpError, match="signature"):
        decode_webp(bytes(bad_sig))
    with pytest.raises(WebpError, match="truncated"):
        decode_webp(bytes(good[:-4]) if len(good) > 24 else bytes(good[:20]))


def test_decode_media_sniffs_webp(spark):
    import numpy as np

    from dolphinbeat_spark.operators.multimodal import decode_media
    from dolphinbeat_spark.operators.webp import encode_webp_lossless

    want = np.arange(4 * 6 * 4, dtype=np.uint8).reshape(4, 6, 4) % 250
    rows = [(3, bytearray(encode_webp_lossless(want, subtract_green=True)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    (got,) = decode_media(df).collect()
    assert got.fmt == "webp" and (got.width, got.height) == (6, 4)
    assert got.pixel_sum == int(want.sum())


# --- H.264 Annex-B NAL demux (operators/h264_demux.py) ---------------------------


def test_h264_annexb_split_and_sps_parse():
    """Start-code scanning (3- and 4-byte codes), emulation-
    prevention round-trip on hostile payloads, and the real SPS
    parse: Exp-Golomb fields, high-profile chroma/scaling-list path,
    and frame cropping down to pixel dimensions."""
    from dolphinbeat_spark.operators.h264_demux import (
        build_annexb, build_sps, ebsp_to_rbsp, parse_sps, rbsp_to_ebsp,
        split_annexb,
    )

    for payload in (b"\x00\x00\x01\x00\x00\x00\x00\x00\x02",
                    b"\x00\x00\x03\x03", bytes(10), b"\x00\x00"):
        assert ebsp_to_rbsp(rbsp_to_ebsp(payload)) == payload

    sps = build_sps(40, 30)
    meta = parse_sps(bytes([0x67]) + sps)
    assert (meta["width"], meta["height"]) == (640, 480)
    assert meta["profile_idc"] == 66 and meta["chroma_format_idc"] == 1

    units = [(7, 3, sps), (8, 3, b"\x12\x34"),
             (5, 3, b"\x00\x00\x01" * 5), (1, 2, b"abc")]
    stream = build_annexb(units)
    got = split_annexb(stream)
    assert len(got) == 4
    for (off, size), (ntype, ref, payload) in zip(got, units):
        assert stream[off] & 0x1F == ntype
        assert (stream[off] >> 5) & 3 == ref
        assert ebsp_to_rbsp(stream[off + 1:off + size]) == payload


def test_h264_typed_errors():
    import pytest

    from dolphinbeat_spark.operators.h264_demux import (
        H264Error, build_annexb, build_sps, parse_sps, split_annexb,
    )

    with pytest.raises(H264Error, match="start codes"):
        split_annexb(b"\x01\x02\x03\x04")
    with pytest.raises(H264Error, match="garbage"):
        split_annexb(b"\xff\x00\x00\x01\x41abc")
    with pytest.raises(H264Error, match="not an SPS"):
        parse_sps(b"\x41\x00")
    with pytest.raises(H264Error, match="truncated"):
        parse_sps(bytes([0x67]) + build_sps(40, 30)[:2])
    # empty unit between back-to-back start codes
    with pytest.raises(H264Error, match="empty NAL"):
        split_annexb(b"\x00\x00\x01\x00\x00\x01\x41a")


def test_nal_units_spark(spark):
    from dolphinbeat_spark.operators.h264_demux import (
        build_annexb, build_sps, nal_units,
    )

    stream = build_annexb([
        (7, 3, build_sps(8, 6)),  # 128x96
        (8, 3, b"\x11"),
        (5, 3, b"keyframe-bytes"),
        (1, 2, b"delta"),
    ])
    df = spark.createDataFrame([(1, bytearray(stream))],
                               "media_id long, payload binary")
    got = nal_units(df).orderBy("nal_idx").collect()
    assert [r.type_name for r in got] == ["sps", "pps", "idr", "slice"]
    assert [r.is_keyframe for r in got] == [False, False, True, False]
    assert (got[0].sps_width, got[0].sps_height) == (128, 96)
    assert got[2].nal_bytes == 15


# --- subtitles (sources/subtitles.py) -------------------------------------------


def test_subtitle_parsers():
    """SRT (index lines, comma millis, CRLF, BOM) and WebVTT (header,
    NOTE blocks, cue identifiers, optional hour field) parse to the
    same cue shape; markup strips to clean text."""
    from dolphinbeat_spark.sources.subtitles import (
        parse_srt, parse_vtt, strip_markup,
    )

    srt = ("1\r\n00:00:01,000 --> 00:00:04,250\r\nHello <i>world</i>\r\n"
           "\r\n2\r\n00:00:05,500 --> 00:01:02,750\r\nLine one\r\n"
           "Line two\r\n")
    cues = parse_srt("﻿" + srt)
    assert [(c["start_ms"], c["end_ms"]) for c in cues] == [
        (1000, 4250), (5500, 62750)
    ]
    assert cues[1]["text"] == "Line one\nLine two"
    assert strip_markup(cues[0]["text"]) == "Hello world"

    vtt = ("WEBVTT\n\nNOTE a comment\n\nintro\n"
           "00:01.000 --> 00:04.000\n<v Ann>Hi there\n\n"
           "01:00:00.500 --> 01:00:02.000\nhour field\n")
    cues = parse_vtt(vtt)
    assert cues[0]["start_ms"] == 1000
    assert strip_markup(cues[0]["text"]) == "Hi there"
    assert cues[1]["start_ms"] == 3600500


def test_subtitle_typed_errors():
    import pytest

    from dolphinbeat_spark.sources.subtitles import (
        SubtitleError, parse_srt, parse_vtt,
    )

    with pytest.raises(SubtitleError, match="WEBVTT header"):
        parse_vtt("not vtt")
    with pytest.raises(SubtitleError, match="timing line"):
        parse_srt("1\nnot a time\ntext")
    with pytest.raises(SubtitleError, match="no SRT cues"):
        parse_srt("   ")
    with pytest.raises(SubtitleError, match="timing line"):
        parse_vtt("WEBVTT\n\nident-only\nstill no arrow")


def test_read_subtitles_spark(spark):
    from dolphinbeat_spark.sources.subtitles import read_subtitles

    srt = b"1\n00:00:02,000 --> 00:00:03,500\n<b>Bold</b> cue\n"
    vtt = b"WEBVTT\n\n00:05.000 --> 00:06.000\nplain\n"
    df = spark.createDataFrame(
        [(1, bytearray(srt)), (2, bytearray(vtt))],
        "media_id long, payload binary",
    )
    got = read_subtitles(df).orderBy("media_id").collect()
    assert [r.fmt for r in got] == ["srt", "vtt"]
    assert got[0].text == "Bold cue" and got[0].raw_text == "<b>Bold</b> cue"
    assert got[0].start_s == 2.0 and got[1].duration_ms == 1000


def test_bmp_16bit_and_bitfields():
    """16-bit BI_RGB (the 5-5-5 default), BI_BITFIELDS 5-6-5 and
    32-bit 10-10-10 masks — hand-built structures; channel expansion
    is the exact round-half-up 255*v/maxv."""
    import struct

    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.multimodal import decode_bmp

    def build(w, h, bpp, comp, masks, body):
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                           len(body), 0, 0, 0, 0)
        extra = b"".join(struct.pack("<I", m) for m in masks)
        off = 14 + 40 + len(extra)
        hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        return hdr + info + extra + body

    def scale(v, maxv):
        return (v * 255 + maxv // 2) // maxv

    rng = np.random.RandomState(12)
    # 16-bit default 5-5-5, 3x2 bottom-up, rows padded to 4 bytes
    rgb555 = rng.randint(0, 32, (2, 3, 3), dtype=np.uint16)
    rows = []
    for y in (1, 0):
        vals = (rgb555[y, :, 0].astype(np.uint16) << 10) \
            | (rgb555[y, :, 1] << 5) | rgb555[y, :, 2]
        rows.append(vals.astype("<u2").tobytes() + bytes(2))
    w, h, px = decode_bmp(build(3, 2, 16, 0, [], b"".join(rows)))
    assert (w, h) == (3, 2)
    for y in range(2):
        for x in range(3):
            want = [int(scale(int(c), 31)) for c in rgb555[y, x]]
            assert px[y, x].tolist() == want, (x, y)

    # BI_BITFIELDS 5-6-5
    r5, g6, b5 = 17, 40, 9
    val = (r5 << 11) | (g6 << 5) | b5
    body = struct.pack("<H", val) + bytes(2)
    _, _, px = decode_bmp(
        build(1, 1, 16, 3, [0xF800, 0x07E0, 0x001F], body)
    )
    assert px[0, 0].tolist() == [scale(r5, 31), scale(g6, 63), scale(b5, 31)]

    # 32-bit BITFIELDS 10-10-10 (alpha bits dropped)
    r, g, b = 700, 13, 1023
    val = (r << 20) | (g << 10) | b
    body = struct.pack("<I", val)
    _, _, px = decode_bmp(build(
        1, 1, 32, 3, [0x3FF00000, 0x000FFC00, 0x000003FF], body
    ))
    assert px[0, 0].tolist() == [
        scale(r, 1023), scale(g, 1023), scale(b, 1023)
    ]

    # BITFIELDS with a palette bpp is invalid
    with pytest.raises(ValueError, match="BI_BITFIELDS"):
        decode_bmp(build(1, 1, 8, 3, [0, 0, 0], b"\x00" * 4))


def test_bmp_palette_rle_and_wide_shapes():
    """The widened BMP decoder: 1/4/8-bit palette images (biClrUsed
    honored), BI_RLE8 and BI_RLE4 (encoded runs, absolute word-aligned
    runs, EOL/EOB/delta escapes), 32-bit BGRA (alpha dropped), and
    top-down layouts — hand-built structures, spec-vector pinned."""
    import struct

    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.multimodal import decode_bmp

    def build(w, h, bpp, comp, pal, body, top_down=False):
        hh = -h if top_down else h
        info = struct.pack("<IiiHHIIiiII", 40, w, hh, 1, bpp, comp,
                           len(body), 0, 0, len(pal) // 4, 0)
        off = 14 + 40 + len(pal)
        hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        return hdr + info + pal + body

    rng = np.random.RandomState(6)
    cols = rng.randint(0, 256, (256, 3), dtype=np.uint8)
    pal = b"".join(bytes([c[2], c[1], c[0], 0]) for c in cols)

    # 8-bit palette bottom-up with row padding
    idx = rng.randint(0, 256, (4, 6), dtype=np.uint8)
    stride = (6 + 3) // 4 * 4
    body = b"".join(idx[y].tobytes() + bytes(stride - 6)
                    for y in range(3, -1, -1))
    _, _, px = decode_bmp(build(6, 4, 8, 0, pal, body))
    assert np.array_equal(px, cols[idx])

    # 4-bit packed with padding bits
    idx4 = rng.randint(0, 16, (4, 9), dtype=np.uint8)
    rows = []
    for y in range(3, -1, -1):
        packed = bytearray()
        for k in range(0, 9, 2):
            hi = idx4[y, k] << 4
            lo = idx4[y, k + 1] if k + 1 < 9 else 0
            packed.append(hi | lo)
        while len(packed) % 4:
            packed.append(0)
        rows.append(bytes(packed))
    _, _, px = decode_bmp(build(9, 4, 4, 0, pal[:64], b"".join(rows)))
    assert np.array_equal(px, cols[:16][idx4])

    # RLE8: run + EOL, absolute + run, run + delta, final run, EOB
    rle = bytes([6, 5, 0, 0, 0, 3, 1, 2, 3, 0, 3, 9, 0, 0,
                 2, 7, 0, 2, 2, 1, 2, 8, 0, 1])
    _, _, px = decode_bmp(build(6, 4, 8, 1, pal, rle))
    exp = np.zeros((4, 6), np.uint8)
    exp[0] = [5] * 6
    exp[1] = [1, 2, 3, 9, 9, 9]
    exp[2, 0:2] = 7
    exp[3, 4:6] = 8
    assert np.array_equal(px, cols[exp[::-1]])

    # RLE4: alternating-nibble run + absolute run
    rle4 = bytes([5, 0x12, 0, 0, 0, 3, 0x34, 0x50, 0, 1])
    _, _, px = decode_bmp(build(5, 2, 4, 2, pal[:64], rle4))
    exp = np.array([[1, 2, 1, 2, 1], [3, 4, 5, 0, 0]], np.uint8)
    assert np.array_equal(px, cols[:16][exp[::-1]])

    # 32-bit BGRA (alpha dropped) + top-down 8-bit
    b32 = b"".join(bytes([1, 2, 3, 99]) for _ in range(8))
    _, _, px = decode_bmp(build(4, 2, 32, 0, b"", b32))
    assert np.array_equal(px[0, 0], [3, 2, 1])
    idx = rng.randint(0, 256, (3, 4), dtype=np.uint8)
    body = b"".join(idx[y].tobytes() for y in range(3))
    _, _, px = decode_bmp(build(4, 3, 8, 0, pal, body, top_down=True))
    assert np.array_equal(px, cols[idx])

    # typed errors and named boundaries (BI_BITFIELDS decodes since
    # r10 — see test_bmp_16bit_and_bitfields; BI_JPEG still raises)
    with pytest.raises(NotImplementedError, match="compression 4"):
        decode_bmp(build(4, 2, 32, 4, b"", b32))
    with pytest.raises(ValueError, match="overflows"):
        decode_bmp(build(2, 2, 8, 1, pal, bytes([9, 1, 0, 1])))
    with pytest.raises(ValueError, match="end-of-bitmap"):
        decode_bmp(build(6, 4, 8, 1, pal, bytes([2, 5, 0, 0])))
    # 16-bit decodes since r10 (5-5-5 default) — the boundary moved to
    # odd depths
    with pytest.raises(NotImplementedError, match="48-bit"):
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 48, 0, 0, 0, 0, 0, 0)
        decode_bmp(struct.pack("<2sIHHI", b"BM", 70, 0, 0, 54) + info
                   + bytes(16))


# --- ID3v2 (operators/id3.py) ---------------------------------------------------


def test_id3_versions_encodings_and_strip():
    """v2.3 (plain sizes) and v2.4 (syncsafe sizes, TDRC) tags parse
    across all four text encodings; whole-tag unsynchronisation
    round-trips; strip_id3 removes v2 + v1 tags while the MPEG frames
    stay byte-identical (the audio twin of EXIF redaction)."""
    from dolphinbeat_spark.operators.id3 import (
        encode_id3, parse_id3, strip_id3,
    )
    from dolphinbeat_spark.operators.mp3_demux import (
        encode_mp3_frames, parse_mp3,
    )

    frames = {"TIT2": "Sömé Títle", "TPE1": "Artist 人", "TALB": "Album",
              "TYER": "2023", "TRCK": "3/12", "TCON": "Jazz"}
    for ver in (3, 4):
        for enc in (0, 1, 2, 3):
            use = dict(frames)
            if enc == 0:
                use["TPE1"] = "Artist"  # latin-1 can't carry CJK
            tag = encode_id3(use, version=ver, comment="a cömment",
                             encoding=enc)
            m = parse_id3(tag)
            assert m["version"] == f"2.{ver}"
            assert m["title"] == use["TIT2"], (ver, enc)
            assert m["artist"] == use["TPE1"], (ver, enc)
            assert m["comment"] == "a cömment", (ver, enc)
            assert m["date"] == "2023" and m["track"] == "3/12"
    assert parse_id3(encode_id3({"TIT2": "ÿÿÿ"}, unsync=True,
                                encoding=3))["title"] == "ÿÿÿ"
    assert parse_id3(encode_id3({"TDRC": "2024-05-01"},
                                version=4))["date"] == "2024-05-01"

    mp3 = encode_mp3_frames(2, b"zz", id3v2=encode_id3(frames),
                            id3v1=True)
    (t,) = parse_mp3(mp3)
    clean = strip_id3(mp3)
    assert clean[:2] == b"\xff\xfb" and parse_id3(clean) == {}
    (t2,) = parse_mp3(clean)
    assert [mp3[o:o + s] for _, _, o, s in t["samples"]] == \
        [clean[o:o + s] for _, _, o, s in t2["samples"]]


def test_id3_typed_errors():
    import pytest

    from dolphinbeat_spark.operators.id3 import Id3Error, parse_id3

    with pytest.raises(Id3Error, match="2.5 not supported"):
        parse_id3(b"ID3\x05\x00\x00\x00\x00\x00\x00")
    with pytest.raises(Id3Error, match="truncated"):
        parse_id3(b"ID3\x03\x00\x00\x00\x00\x01\x00" + bytes(4))
    with pytest.raises(Id3Error, match="syncsafe"):
        parse_id3(b"ID3\x03\x00\x00\x80\x00\x00\x00")
    assert parse_id3(b"not a tag") == {}


def test_id3_extract_spark(spark):
    from dolphinbeat_spark.operators.id3 import encode_id3, id3_extract
    from dolphinbeat_spark.operators.mp3_demux import encode_mp3_frames

    tag = encode_id3({"TIT2": "Hello", "TPE1": "World"}, version=4)
    rows = [(1, bytearray(encode_mp3_frames(1, b"q", id3v2=tag))),
            (2, bytearray(encode_mp3_frames(1, b"q")))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = id3_extract(df).orderBy("media_id").collect()
    assert got[0].title == "Hello" and got[0].version == "2.4"
    assert got[1].title is None and got[1].version is None


def test_ico_decode_both_entry_kinds():
    """ICO entries decode whether they embed a PNG (modern) or a
    headerless doubled-height DIB (classic); output is ALWAYS RGBA —
    the 1-bit AND mask becomes the alpha plane (bit 1 = transparent),
    so favicon dedup keeps transparency differences; the largest
    entry wins."""
    import struct

    import numpy as np
    import pytest

    from dolphinbeat_spark.operators.multimodal import decode_ico, encode_png

    def build_ico(entries):
        out = bytearray(b"\x00\x00\x01\x00"
                        + struct.pack("<H", len(entries)))
        off = 6 + 16 * len(entries)
        for w, h, blob in entries:
            out += bytes([w % 256, h % 256, 0, 0])
            out += struct.pack("<HHII", 1, 32, len(blob), off)
            off += len(blob)
        for _, _, blob in entries:
            out += blob
        return bytes(out)

    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    png = encode_png(32, 32, img.tobytes(), color_type=2)
    dibpx = rng.randint(0, 256, (2, 4, 3), dtype=np.uint8)
    stride = (4 * 3 + 3) // 4 * 4
    body = b"".join(dibpx[y][:, ::-1].tobytes() + bytes(stride - 12)
                    for y in (1, 0))
    # AND mask: row 0 of the IMAGE = 0b1010.... (px 0 and 2
    # transparent), row 1 opaque; rows stored bottom-up, 4-byte stride
    mask = bytes([0x00, 0, 0, 0]) + bytes([0xA0, 0, 0, 0])
    dib = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, 0, 0, 0, 0, 0) \
        + body + mask
    w, h, px = decode_ico(build_ico([(4, 2, dib), (32, 32, png)]))
    assert (w, h) == (32, 32) and px.shape == (32, 32, 4)
    assert np.array_equal(px[:, :, :3], img)
    assert np.all(px[:, :, 3] == 255)  # opaque PNG normalizes to A=255
    w, h, px = decode_ico(build_ico([(4, 2, dib)]))
    assert (w, h) == (4, 2) and px.shape == (2, 4, 4)
    assert np.array_equal(px[:, :, :3], dibpx)
    assert px[0, :, 3].tolist() == [0, 255, 0, 255]  # masked row
    assert px[1, :, 3].tolist() == [255] * 4
    # an RGBA PNG entry keeps its own alpha
    rgba = rng.randint(0, 256, (8, 8, 4), dtype=np.uint8)
    png4 = encode_png(8, 8, rgba.tobytes(), color_type=6)
    w, h, px = decode_ico(build_ico([(8, 8, png4)]))
    assert np.array_equal(px, rgba)
    # a mask-less (truncated-mask) DIB degrades to opaque
    nomask = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, 0, 0, 0, 0, 0) \
        + body
    _, _, px = decode_ico(build_ico([(4, 2, nomask)]))
    assert np.all(px[:, :, 3] == 255)
    with pytest.raises(ValueError, match="not an ICO"):
        decode_ico(b"\x00\x00\x02\x00")
    with pytest.raises(ValueError, match="overruns"):
        decode_ico(build_ico([(4, 2, dib)])[:-5])


def test_fuzz_all_new_decoders_raise_typed_errors_only():
    """Hostile-bytes property for every round-9 decoder/demuxer: a
    random byte-flipped stream either decodes or raises the typed
    family (ValueError subclasses / NotImplementedError) — never a
    foreign IndexError/KeyError/struct.error that would kill an
    executor mid-batch at 100 TB."""
    import numpy as np

    from dolphinbeat_spark.operators.flac import decode_flac, encode_flac
    from dolphinbeat_spark.operators.h264_demux import (
        build_annexb, build_sps, ebsp_to_rbsp, parse_sps, split_annexb,
    )
    from dolphinbeat_spark.operators.id3 import encode_id3, parse_id3
    from dolphinbeat_spark.operators.mkv_demux import encode_mkv, parse_mkv
    from dolphinbeat_spark.operators.mp3_demux import (
        encode_mp3_frames, parse_mp3,
    )
    from dolphinbeat_spark.operators.ogg_demux import encode_ogg, parse_ogg
    from dolphinbeat_spark.operators.tiff import decode_tiff, encode_tiff
    from dolphinbeat_spark.operators.webp import (
        decode_webp, encode_webp_lossless,
    )
    from dolphinbeat_spark.sources.archives import (
        encode_tar, encode_zip, iter_tar_members, iter_zip_members,
    )
    from dolphinbeat_spark.sources.warc import encode_warc, iter_warc_records

    rng = np.random.RandomState(0)
    t = np.arange(400)
    s = (900 * np.sin(t / 9)).astype(np.int64)[:, None]
    img = np.arange(5 * 7 * 4, dtype=np.uint8).reshape(5, 7, 4)

    def h264(b):
        for off, sz in split_annexb(b):
            if b[off] & 0x1F == 7:
                parse_sps(ebsp_to_rbsp(b[off:off + sz]))

    cases = [
        ("flac", encode_flac(s, 8000, block_size=192), decode_flac),
        ("mkv", encode_mkv([{"track_id": 1, "handler": "vide",
                             "codec": "V_VP9",
                             "samples": [bytes([i]) * 9 for i in range(5)],
                             "deltas": [40] * 5}]), parse_mkv),
        ("ogg", encode_ogg([{"serial": 5,
                             "packets": [b"abc" * 9, b"de" * 40]}]),
         parse_ogg),
        ("mp3", encode_mp3_frames(2, b"xyz"), parse_mp3),
        ("tiff", encode_tiff(9, 6, bytes(range(162)), spp=3,
                             compression=5, predictor=2), decode_tiff),
        ("webp", encode_webp_lossless(img, use_cache_bits=3, lz77_min=4),
         decode_webp),
        ("zip", encode_zip([("a", b"hello" * 8)]),
         lambda b: list(iter_zip_members(b))),
        ("tar", encode_tar([("a", b"hello" * 8)], gzip_wrap=True),
         lambda b: list(iter_tar_members(b))),
        ("warc", encode_warc([{"type": "response", "record_id": "<r>",
                               "content": b"x" * 40,
                               "http": {"status": 200}}],
                             gzip_members=True),
         lambda b: list(iter_warc_records(b))),
        ("h264", build_annexb([(7, 3, build_sps(4, 3)),
                               (5, 3, b"idr" * 7)]), h264),
        ("id3", encode_id3({"TIT2": "t", "TPE1": "p"}, comment="c"),
         parse_id3),
    ]
    for name, good, decode in cases:
        for _ in range(120):
            mut = bytearray(good)
            for _ in range(int(rng.randint(1, 4))):
                mut[int(rng.randint(0, len(mut)))] ^= int(rng.randint(1, 256))
            try:
                decode(bytes(mut))
            except (ValueError, NotImplementedError):
                pass  # the typed family — what executors can catch
            # anything else propagates and fails the test, by name
