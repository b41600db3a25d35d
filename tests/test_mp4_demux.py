"""MP4/ISO-BMFF demux tests: the writer builds format-faithful
containers (interleaved chunks, multi-entry stts/stsc) and the parser
must recover every sample's track, timing, and byte range exactly —
plus typed failures on fragmented/truncated/hostile boxes."""

from __future__ import annotations

import hashlib
import struct

import pytest

from dolphinbeat_spark.operators.mp4_demux import (
    Mp4Error,
    demux_media,
    encode_mp4,
    parse_mp4,
)


def _two_track_mp4():
    vid_samples = [bytes([i]) * (10 + i) for i in range(7)]  # sizes 10..16
    aud_samples = [bytes([0x40 + i]) * 4 for i in range(9)]
    payload = encode_mp4(
        [
            {
                "handler": "vide", "codec": "raw ", "timescale": 1000,
                "width": 16, "height": 8,
                "samples": vid_samples,
                "deltas": [100] * 5 + [200] * 2,  # two stts runs
                "chunk_sizes": [3, 3, 1],  # multi-chunk stsc
            },
            {
                "handler": "soun", "codec": "twos", "timescale": 8000,
                "channels": 1,
                "samples": aud_samples,
                "deltas": [4] * 9,
                "chunk_sizes": [4, 4, 1],
            },
        ]
    )
    return payload, vid_samples, aud_samples


def test_roundtrip_two_tracks():
    payload, vid, aud = _two_track_mp4()
    tracks = parse_mp4(payload)
    assert [t["track_id"] for t in tracks] == [1, 2]
    tv, ta = tracks
    assert (tv["handler"], tv["codec"], tv["timescale"]) == ("vide", "raw ", 1000)
    assert (ta["handler"], ta["codec"], ta["timescale"]) == ("soun", "twos", 8000)
    # every sample's byte range recovers the original bytes
    assert len(tv["samples"]) == len(vid)
    for (idx, dts, off, size), want in zip(tv["samples"], vid):
        assert payload[off:off + size] == want
    # dts follows the two stts runs: 0,100,...,500, then +200 steps
    assert [s[1] for s in tv["samples"]] == [0, 100, 200, 300, 400, 500, 700]
    for (idx, dts, off, size), want in zip(ta["samples"], aud):
        assert payload[off:off + size] == want
    assert [s[1] for s in ta["samples"]] == [4 * i for i in range(9)]
    # chunks are interleaved: the first audio chunk sits between video
    # chunks in the file
    v_off0 = tv["samples"][0][2]
    a_off0 = ta["samples"][0][2]
    v_off3 = tv["samples"][3][2]
    assert v_off0 < a_off0 < v_off3


def test_single_chunk_default_and_fixed_sizes():
    samples = [b"x" * 8] * 5
    payload = encode_mp4(
        [{"handler": "vide", "codec": "raw ", "timescale": 90000,
          "samples": samples, "deltas": [3000] * 5}]
    )
    (t,) = parse_mp4(payload)
    offs = [s[2] for s in t["samples"]]
    assert offs == [offs[0] + 8 * i for i in range(5)]
    assert [s[3] for s in t["samples"]] == [8] * 5


def test_demux_media_operator(spark):
    payload, vid, aud = _two_track_mp4()
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = demux_media(df).orderBy("track_id", "sample_idx").collect()
    assert len(rows) == len(vid) + len(aud)
    r0 = rows[0]
    assert (r0["track_id"], r0["codec"], r0["sample_idx"]) == (1, "raw ", 0)
    assert r0["sample_md5"] == hashlib.md5(vid[0]).hexdigest()
    assert r0["dts_s"] == 0.0
    # frame sampling: every 3rd video sample only
    vrows = (
        demux_media(df, every=3, handler="vide")
        .orderBy("sample_idx").collect()
    )
    assert [r["sample_idx"] for r in vrows] == [0, 3, 6]
    assert vrows[1]["sample_md5"] == hashlib.md5(vid[3]).hexdigest()


def test_typed_failures():
    payload, _, _ = _two_track_mp4()
    with pytest.raises(Mp4Error, match="moov"):
        parse_mp4(payload[:28])  # ftyp only → no moov
    with pytest.raises(Mp4Error, match="overruns"):
        parse_mp4(payload[:40])  # truncated mid-mdat
    with pytest.raises(Mp4Error, match="truncated box header"):
        parse_mp4(payload + b"\x00\x00\x00\x09")  # dangling partial box
    # a stray empty moof is tolerated (fragmented layouts are parsed
    # since r9 — an empty fragment contributes no samples)
    moof = struct.pack(">I", 8) + b"moof"
    assert len(parse_mp4(moof + payload)) == 2
    # box overrunning its container
    bad = struct.pack(">I", 64) + b"free" + b"\x00" * 8
    with pytest.raises(Mp4Error, match="overruns"):
        parse_mp4(bad)
    # stsz/stts disagreement: corrupt the stts count field
    i = payload.index(b"stts")
    bad = bytearray(payload)
    # entry count lives 8 bytes after the 4cc (version/flags then count)
    cnt_off = i + 8
    bad[cnt_off:cnt_off + 4] = struct.pack(">I", 1)
    with pytest.raises(Mp4Error):
        parse_mp4(bytes(bad))


def test_largesize_and_co64_paths():
    """64-bit box size + 64-bit chunk offsets parse identically."""
    samples = [b"AB", b"CDE"]
    payload = encode_mp4(
        [{"handler": "vide", "codec": "raw ", "timescale": 10,
          "samples": samples, "deltas": [1, 1]}]
    )
    # rewrite mdat as a largesize box (shifts offsets by 8) and stco
    # → co64 with corrected offsets
    i = payload.index(b"mdat") - 4
    size = struct.unpack_from(">I", payload, i)[0]
    big = (
        payload[:i]
        + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", size + 8)
        + payload[i + 8:]
    )
    j = big.index(b"stco") - 4
    n = struct.unpack_from(">I", big, j + 12)[0]
    offs = [
        struct.unpack_from(">I", big, j + 16 + 4 * k)[0] + 8
        for k in range(n)
    ]
    co64 = (
        struct.pack(">I", 16 + 8 * n) + b"co64" + b"\x00" * 4
        + struct.pack(">I", n)
        + b"".join(struct.pack(">Q", o) for o in offs)
    )
    old_len = struct.unpack_from(">I", big, j)[0]
    big2 = bytearray(big[:j] + co64 + big[j + old_len:])
    # fix enclosing container sizes (stbl/minf/mdia/trak/moov grew)
    delta = len(co64) - old_len
    for cc in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        k = big2.index(cc) - 4
        sz = struct.unpack_from(">I", big2, k)[0]
        big2[k:k + 4] = struct.pack(">I", sz + delta)
    (t,) = parse_mp4(bytes(big2))
    for (idx, dts, off, size_), want in zip(t["samples"], samples):
        assert bytes(big2[off:off + size_]) == want


def test_fragmented_roundtrip():
    """fMP4: init segment + moof/mdat pairs — sample byte ranges,
    decode times (tfdt anchors), and cross-fragment sample indices all
    recover exactly; interleaved two-track fragments included."""
    vid = [bytes([0x10 + i]) * (6 + i) for i in range(7)]
    aud = [bytes([0x60 + i]) * 3 for i in range(5)]
    tracks = [
        {"handler": "vide", "codec": "raw ", "timescale": 1000,
         "width": 4, "height": 2, "samples": vid,
         "deltas": [100, 100, 100, 200, 200, 100, 100]},
        {"handler": "soun", "codec": "twos", "timescale": 8000,
         "channels": 1, "samples": aud, "deltas": [4] * 5},
    ]
    payload = encode_mp4(tracks, fragments=3)
    parsed = parse_mp4(payload)
    assert [t["track_id"] for t in parsed] == [1, 2]
    tv, ta = parsed
    assert len(tv["samples"]) == 7 and len(ta["samples"]) == 5
    for (idx, dts, off, size), want in zip(tv["samples"], vid):
        assert payload[off:off + size] == want
    assert [s[1] for s in tv["samples"]] == [0, 100, 200, 300, 500, 700, 800]
    assert [s[0] for s in tv["samples"]] == list(range(7))
    for (idx, dts, off, size), want in zip(ta["samples"], aud):
        assert payload[off:off + size] == want
    assert [s[1] for s in ta["samples"]] == [0, 4, 8, 12, 16]
    # three fragments (7 video samples / 3 per fragment)
    assert payload.count(b"moof") == 3
    # the classic and fragmented layouts of the same content agree on
    # everything but byte offsets
    classic = parse_mp4(encode_mp4(tracks))
    for tc, tf in zip(classic, parsed):
        assert [(s[0], s[1], s[3]) for s in tc["samples"]] == \
               [(s[0], s[1], s[3]) for s in tf["samples"]]


def test_fragmented_demux_operator(spark):
    import hashlib

    vid = [bytes([i]) * 10 for i in range(6)]
    payload = encode_mp4(
        [{"handler": "vide", "codec": "raw ", "timescale": 90000,
          "samples": vid, "deltas": [3000] * 6}],
        fragments=2,
    )
    df = spark.createDataFrame(
        [(9, bytearray(payload))], "media_id long, payload binary"
    )
    rows = demux_media(df).orderBy("sample_idx").collect()
    assert [r["sample_idx"] for r in rows] == list(range(6))
    assert rows[5]["sample_md5"] == hashlib.md5(vid[5]).hexdigest()
    assert rows[3]["dts_s"] == pytest.approx(3 * 3000 / 90000)


def test_fragmented_typed_failures():
    vid = [b"abcd"] * 4
    payload = encode_mp4(
        [{"handler": "vide", "codec": "raw ", "timescale": 10,
          "samples": vid, "deltas": [1] * 4}],
        fragments=2,
    )
    # traf referencing an unknown track id
    i = payload.index(b"tfhd")
    bad = bytearray(payload)
    bad[i + 8:i + 12] = struct.pack(">I", 99)
    with pytest.raises(Mp4Error, match="unknown track_id"):
        parse_mp4(bytes(bad))
    # trun sample table truncated: inflate the declared sample count
    j = payload.index(b"trun")
    bad = bytearray(payload)
    bad[j + 8:j + 12] = struct.pack(">I", 1000)
    with pytest.raises(Mp4Error):
        parse_mp4(bytes(bad))
