"""Matroska / WebM container demux from scratch — RFC 8794 (EBML) +
RFC 9559 (Matroska).

The second video-container demuxer beside ISO-BMFF (mp4_demux.py):
WebM is the other layout video training data actually ships in.
Covered: EBML element walk (variable-width IDs and sizes, Void/CRC
skip, unknown-size Segment), DocType verification, Info
(TimestampScale), Tracks (TrackNumber/TrackType/CodecID), Clusters
with SimpleBlock AND BlockGroup/Block, and ALL FOUR lacing modes
(none, Xiph 255-terminated sizes, fixed equal division, EBML
signed-delta sizes) — each demuxed frame yields its absolute byte
range + md5, the same contract as parse_mp4 so ``demux_media``
dispatches on the payload magic.

Unknown-size Clusters (r10) — the live-streamed WebM layout where the
muxer cannot know the cluster size up front — are recovered per RFC
8794 §6.3: the cluster's length-prefixed children are walked until a
Segment-level ID (next Cluster / Cues / Tags / …) or the parent end.

ContentEncodings (r11, RFC 9559 §ContentEncoding): zlib and bzlib
block compression (both stdlib), lzo1x (r16, the from-scratch
operators/lzo1x.py codec) and the header-stripping variant
(ContentCompAlgo 3 — the common real-world form: a constant per-track
prefix removed at mux time) are undone per track, multiple encodings
reversed in descending ContentEncodingOrder; decoded frame bytes ride
a per-track ``decoded`` map beside the stored byte ranges (the same
side-channel shape as Ogg's ``fragments``). Honest boundaries raise
by name: block ENCRYPTION, non-block scopes, and —
as with MP4 — codec BITSTREAM decode (VP9/AV1/Opus need libraries
this container doesn't have; byte-range extraction is the real 100 TB
primitive).

Reference parity: the reference repo has no media handling at all;
this extends the multimodal decode path it lacks. At 100 TB the demux
runs one-clip-per-row inside Arrow ``mapInPandas``
(operators/mp4_demux.py::demux_media).
"""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401  (parity with sibling codec modules)


class MkvError(ValueError):
    """Typed Matroska/EBML format error."""


# EBML / Matroska element IDs (with their marker bits, per RFC 8794)
_EBML_HEADER = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CONTENT_ENCODINGS = 0x6D80
_CONTENT_ENCODING = 0x6240
_CE_ORDER = 0x5031
_CE_SCOPE = 0x5032
_CE_TYPE = 0x5033
_CE_COMPRESSION = 0x5034
_CE_ENCRYPTION = 0x5035
_CE_COMP_ALGO = 0x4254
_CE_COMP_SETTINGS = 0x4255
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1

#: Matroska TrackType -> the ISO-BMFF handler fourcc demux_media
#: filters on (uniform across containers)
_HANDLERS = {1: "vide", 2: "soun", 0x10: "logo", 0x11: "text",
             0x12: "btns", 0x20: "ctrl"}


def _vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int | None, int]:
    """One EBML variable-width integer -> (value, width). IDs keep the
    marker bit (so the constants above compare directly); sizes strip
    it, and an all-ones size returns None (unknown size)."""
    if pos >= len(data):
        raise MkvError("EBML stream truncated in a VINT")
    b0 = data[pos]
    if b0 == 0:
        raise MkvError(f"invalid EBML VINT lead byte 0x00 at {pos}")
    width = 8 - b0.bit_length() + 1
    if pos + width > len(data):
        raise MkvError("EBML stream truncated in a VINT")
    if keep_marker:
        v = b0
    else:
        v = b0 & ((1 << (8 - width)) - 1)
    for i in range(1, width):
        v = (v << 8) | data[pos + i]
    if not keep_marker and v == (1 << (7 * width)) - 1:
        return None, width  # unknown size
    return v, width


def _uint(data: bytes, s: int, e: int) -> int:
    if e - s > 8:
        raise MkvError("EBML unsigned integer wider than 8 bytes")
    v = 0
    for i in range(s, e):
        v = (v << 8) | data[i]
    return v


#: Segment-level element IDs — the appearance of any of these ends an
#: unknown-size Cluster (RFC 8794 §6.3: an unknown-size master element
#: ends at the first element that is not a valid descendant)
_TOP_LEVEL_IDS = frozenset((
    0x1F43B675,  # Cluster
    0x1549A966,  # Info
    0x1654AE6B,  # Tracks
    0x1C53BB6B,  # Cues
    0x1254C367,  # Tags
    0x1043A770,  # Chapters
    0x1941A469,  # Attachments
    0x114D9B74,  # SeekHead
))


def _unknown_cluster_end(data: bytes, start: int, limit: int) -> int:
    """Scan an unknown-size Cluster's length-prefixed children until a
    Segment-level ID or the parent end — the live-streamed WebM layout
    where the muxer cannot know the cluster size up front."""
    pos = start
    while pos < limit:
        eid, w1 = _vint(data, pos, True)
        if eid in _TOP_LEVEL_IDS:
            return pos
        size, w2 = _vint(data, pos + w1, False)
        if size is None:
            raise MkvError(
                f"unknown-size element {eid:#x} inside an unknown-size "
                "Cluster"
            )
        nxt = pos + w1 + w2 + size
        if nxt > limit:
            raise MkvError(
                f"EBML element {eid:#x} at {pos} overruns its parent"
            )
        pos = nxt
    return limit


def _children(data: bytes, start: int, end: int):
    """Iterate (element_id, body_start, body_end) over a master
    element's children. Every child must declare its size, EXCEPT an
    unknown-size Cluster, whose end is recovered by scanning to the
    next Segment-level ID (the live-streamed WebM case)."""
    pos = start
    while pos < end:
        eid, w1 = _vint(data, pos, True)
        size, w2 = _vint(data, pos + w1, False)
        body = pos + w1 + w2
        if size is None:
            if eid == _CLUSTER:
                cend = _unknown_cluster_end(data, body, end)
                yield eid, body, cend
                pos = cend
                continue
            raise MkvError(f"unknown-size EBML element {eid:#x} at {pos}")
        if body + size > end:
            raise MkvError(
                f"EBML element {eid:#x} at {pos} overruns its parent"
            )
        yield eid, body, body + size
        pos = body + size


def _parse_content_encodings(data: bytes, s: int, e: int) -> list[dict]:
    """ContentEncodings -> [{order, algo, settings}] sorted in
    DESCENDING order (the decode order: the spec applies encodings in
    ascending ContentEncodingOrder at mux time). Block encryption
    and non-block scopes raise by name."""
    encs: list[dict] = []
    for eid, cs, ce in _children(data, s, e):
        if eid != _CONTENT_ENCODING:
            continue
        order, scope, etype = 0, 1, 0
        algo, settings = None, b""
        for ceid, ics, ice in _children(data, cs, ce):
            if ceid == _CE_ORDER:
                order = _uint(data, ics, ice)
            elif ceid == _CE_SCOPE:
                scope = _uint(data, ics, ice)
            elif ceid == _CE_TYPE:
                etype = _uint(data, ics, ice)
            elif ceid == _CE_ENCRYPTION:
                etype = 1
            elif ceid == _CE_COMPRESSION:
                algo = 0  # zlib is the ContentCompAlgo default
                for aeid, acs, ace in _children(data, ics, ice):
                    if aeid == _CE_COMP_ALGO:
                        algo = _uint(data, acs, ace)
                    elif aeid == _CE_COMP_SETTINGS:
                        settings = data[acs:ace]
        if etype == 1:
            raise NotImplementedError(
                "encrypted Matroska blocks (ContentEncryption) not "
                "supported"
            )
        if scope != 1:
            raise NotImplementedError(
                f"ContentEncodingScope {scope} not supported (all-block "
                "scope 1 only)"
            )
        if algo is None:
            raise MkvError("ContentEncoding without ContentCompression")
        if algo not in (0, 1, 2, 3):
            raise MkvError(f"unknown ContentCompAlgo {algo}")
        encs.append({"order": order, "algo": algo, "settings": settings})
    encs.sort(key=lambda d: -d["order"])
    return encs


def _decode_content(frame: bytes, encs: list[dict]) -> bytes:
    """Undo a track's ContentEncodings over one frame's stored bytes."""
    import bz2
    import zlib

    for enc in encs:
        if enc["algo"] == 0:
            try:
                frame = zlib.decompress(frame)
            except zlib.error as ex:
                raise MkvError(
                    f"zlib-compressed block fails to inflate: {ex}"
                ) from ex
        elif enc["algo"] == 1:
            try:
                frame = bz2.decompress(frame)
            except (OSError, ValueError) as ex:
                raise MkvError(
                    f"bzlib-compressed block fails to decompress: {ex}"
                ) from ex
        elif enc["algo"] == 2:
            # ContentCompAlgo 2: raw LZO1X blocks, decoded by the
            # from-scratch operators/lzo1x.py codec (r16)
            from dolphinbeat_spark.operators.lzo1x import (
                Lzo1xError, lzo1x_decompress,
            )

            try:
                frame = lzo1x_decompress(frame)
            except Lzo1xError as ex:
                raise MkvError(
                    f"lzo1x-compressed block fails to decompress: {ex}"
                ) from ex
        else:  # 3: header stripping — re-prepend the stripped prefix
            frame = enc["settings"] + frame
    return frame


def _parse_track_entry(data: bytes, s: int, e: int) -> dict:
    num = ttype = None
    codec = ""
    encs: list[dict] = []
    for eid, cs, ce in _children(data, s, e):
        if eid == _TRACK_NUMBER:
            num = _uint(data, cs, ce)
        elif eid == _TRACK_TYPE:
            ttype = _uint(data, cs, ce)
        elif eid == _CODEC_ID:
            codec = data[cs:ce].decode("ascii", "replace")
        elif eid == _CONTENT_ENCODINGS:
            encs = _parse_content_encodings(data, cs, ce)
    if num is None or ttype is None:
        raise MkvError("TrackEntry missing TrackNumber/TrackType")
    return {
        "track_id": num,
        "handler": _HANDLERS.get(ttype, f"{ttype:#x}"),
        "codec": codec,
        "content_encodings": encs,
        "samples": [],
    }


def _parse_block(data: bytes, s: int, e: int, cluster_ts: int, out: list):
    """One (Simple)Block -> (tracknum, ts_ticks, off, size) per frame,
    undoing the declared lacing (RFC 9559 §10.3)."""
    tracknum, w = _vint(data, s, False)
    if tracknum is None:
        raise MkvError("Block track number VINT has unknown-size form")
    p = s + w
    if p + 3 > e:
        raise MkvError("Block truncated before flags")
    (rel,) = struct.unpack_from(">h", data, p)
    flags = data[p + 2]
    p += 3
    ts = cluster_ts + rel
    lace = (flags >> 1) & 3
    if lace == 0:
        frames = [(p, e - p)]
    else:
        if p >= e:
            raise MkvError("laced Block truncated before frame count")
        nframes = data[p] + 1
        p += 1
        sizes: list[int] = []
        if lace == 2:  # fixed-size lacing: equal division of the rest
            total = e - p
            if total % nframes:
                raise MkvError(
                    f"fixed lacing: {total} bytes not divisible by "
                    f"{nframes} frames"
                )
            sizes = [total // nframes] * nframes
        elif lace == 1:  # Xiph: 255-terminated size bytes, last implicit
            for _ in range(nframes - 1):
                sz = 0
                while True:
                    if p >= e:
                        raise MkvError("Xiph lacing sizes truncated")
                    b = data[p]
                    p += 1
                    sz += b
                    if b < 255:
                        break
                sizes.append(sz)
            sizes.append(e - p - sum(sizes))
        else:  # EBML lacing: first size VINT, then signed VINT deltas
            first, w2 = _vint(data, p, False)
            if first is None:
                raise MkvError("EBML lacing size has unknown-size form")
            p += w2
            sizes = [first]
            for _ in range(nframes - 2):
                dv, w2 = _vint(data, p, False)
                if dv is None:
                    raise MkvError("EBML lacing delta has unknown-size form")
                p += w2
                sizes.append(sizes[-1] + dv - ((1 << (7 * w2 - 1)) - 1))
            if nframes >= 2:
                sizes.append(e - p - sum(sizes))
        frames = []
        for sz in sizes:
            if sz < 0 or p + sz > e:
                raise MkvError("laced frame size exceeds Block payload")
            frames.append((p, sz))
            p += sz
        if p != e:
            raise MkvError("laced Block has trailing bytes")
    for off, sz in frames:
        out.append((tracknum, ts, off, sz))


def parse_mkv(data: bytes) -> list[dict]:
    """Matroska/WebM -> the same per-track dict shape as
    mp4_demux.parse_mp4: {track_id, handler, codec, timescale,
    samples: [(idx, dts_ticks, byte_off, size)]} — dts in
    TimestampScale ticks, timescale = ticks per second."""
    eid, w1 = _vint(data, 0, True)
    if eid != _EBML_HEADER:
        raise MkvError("not an EBML/Matroska stream (missing \\x1aE\\xdf\\xa3)")
    hsize, w2 = _vint(data, w1, False)
    if hsize is None:
        raise MkvError("EBML header with unknown size")
    hstart = w1 + w2
    doctype = "matroska"  # the spec default when DocType is absent
    for ceid, cs, ce in _children(data, hstart, hstart + hsize):
        if ceid == _DOCTYPE:
            doctype = data[cs:ce].decode("ascii", "replace").rstrip("\x00")
    if doctype not in ("matroska", "webm"):
        raise MkvError(f"unsupported EBML DocType {doctype!r}")
    pos = hstart + hsize
    eid, w1 = _vint(data, pos, True)
    if eid != _SEGMENT:
        raise MkvError(f"expected Segment after EBML header, got {eid:#x}")
    ssize, w2 = _vint(data, pos + w1, False)
    seg_start = pos + w1 + w2
    seg_end = len(data) if ssize is None else seg_start + ssize
    if seg_end > len(data):
        raise MkvError("Segment overruns the payload")

    scale = 1_000_000  # nanoseconds per tick (Matroska default)
    tracks: dict[int, dict] = {}
    blocks: list[tuple[int, int, int, int]] = []
    for eid, cs, ce in _children(data, seg_start, seg_end):
        if eid == _INFO:
            for ceid, ics, ice in _children(data, cs, ce):
                if ceid == _TIMESTAMP_SCALE:
                    scale = _uint(data, ics, ice)
                    if scale == 0:
                        raise MkvError("TimestampScale of zero")
        elif eid == _TRACKS:
            for ceid, tcs, tce in _children(data, cs, ce):
                if ceid == _TRACK_ENTRY:
                    t = _parse_track_entry(data, tcs, tce)
                    tracks[t["track_id"]] = t
        elif eid == _CLUSTER:
            cluster_ts = 0
            for ceid, ccs, cce in _children(data, cs, ce):
                if ceid == _CLUSTER_TS:
                    cluster_ts = _uint(data, ccs, cce)
                elif ceid == _SIMPLE_BLOCK:
                    _parse_block(data, ccs, cce, cluster_ts, blocks)
                elif ceid == _BLOCK_GROUP:
                    for beid, bcs, bce in _children(data, ccs, cce):
                        if beid == _BLOCK:
                            _parse_block(data, bcs, bce, cluster_ts, blocks)
        # SeekHead / Cues / Tags / Chapters / Void / CRC: skipped by size
    if not tracks:
        raise MkvError("Matroska segment has no Tracks element")
    for tracknum, ts, off, sz in blocks:
        t = tracks.get(tracknum)
        if t is None:
            raise MkvError(f"Block references unknown track {tracknum}")
        idx = len(t["samples"])
        if t["content_encodings"]:
            t.setdefault("decoded", {})[idx] = _decode_content(
                data[off:off + sz], t["content_encodings"]
            )
        t["samples"].append((idx, ts, off, sz))
    out = []
    for num in sorted(tracks):
        t = tracks[num]
        t["timescale"] = 1e9 / scale  # ticks per second
        out.append(t)
    return out


# --- encoder (fixture generator) --------------------------------------------


def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _enc_size(n: int) -> bytes:
    for width in range(1, 9):
        if n < (1 << (7 * width)) - 1:  # all-ones reserved for unknown
            return (n | (1 << (7 * width))).to_bytes(width, "big")
    raise ValueError("EBML size too large")


def _elem(eid: int, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(payload)) + payload


def _enc_uint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def _enc_lace_sizes(sizes: list[int], mode: str) -> bytes:
    """The size header for a laced block (all but the implicit last
    frame; fixed lacing encodes nothing)."""
    out = bytearray([len(sizes) - 1])  # frame count - 1 (incl. last)
    if mode == "fixed":
        return bytes(out)
    if mode == "xiph":
        for sz in sizes[:-1]:
            while sz >= 255:
                out.append(255)
                sz -= 255
            out.append(sz)
        return bytes(out)
    # EBML lacing: first absolute, then signed deltas, minimal widths
    prev = sizes[0]
    out += _enc_size(prev)
    for sz in sizes[1:-1]:
        delta = sz - prev
        prev = sz
        for width in range(1, 9):
            bias = (1 << (7 * width - 1)) - 1
            if -bias <= delta < bias:
                out += ((delta + bias) | (1 << (7 * width))).to_bytes(
                    width, "big"
                )
                break
        else:
            raise ValueError("EBML lacing delta too large")
    return bytes(out)


def encode_mkv(tracks: list[dict], timestamp_scale: int = 1_000_000,
               doc_type: str = "webm", cluster_frames: int = 4,
               block_group: bool = False,
               unknown_size_clusters: bool = False) -> bytes:
    """Format-faithful Matroska/WebM writer — the fixture generator
    for :func:`parse_mkv`. Each track dict: handler ('vide'/'soun'),
    codec (CodecID string), samples (list of bytes), deltas (ticks per
    sample), optional lacing (None/'xiph'/'fixed'/'ebml' — groups
    ``cluster_frames`` samples into one laced block sharing the first
    sample's timestamp, the lossy-but-spec-true lacing contract),
    optional compression (('zlib'|'bzlib'|'strip', settings_bytes) —
    writes a ContentEncodings element and stores each sample
    transformed; 'strip' removes the settings prefix every sample must
    start with, the ContentCompAlgo-3 layout)."""
    import bz2
    import zlib as _zlib

    rev = {v: k for k, v in _HANDLERS.items()}
    tr_elems = b""
    tracks = [dict(t) for t in tracks]  # samples get transformed below
    for t in tracks:
        body = _elem(_TRACK_NUMBER, _enc_uint(t["track_id"]))
        body += _elem(_TRACK_TYPE, _enc_uint(rev[t["handler"]]))
        body += _elem(_CODEC_ID, t["codec"].encode("ascii"))
        comp = t.get("compression")
        if comp is not None:
            algo_name, settings = comp
            algo = {"zlib": 0, "bzlib": 1, "lzo": 2,
                    "strip": 3}[algo_name]
            if algo == 0:
                t["samples"] = [_zlib.compress(s) for s in t["samples"]]
            elif algo == 1:
                t["samples"] = [bz2.compress(s) for s in t["samples"]]
            elif algo == 2:
                from dolphinbeat_spark.operators.lzo1x import (
                    lzo1x_compress,
                )

                t["samples"] = [lzo1x_compress(s)
                                for s in t["samples"]]
            else:
                for s in t["samples"]:
                    if not s.startswith(settings):
                        raise ValueError(
                            "header-stripping compression: a sample "
                            "does not start with the settings prefix"
                        )
                t["samples"] = [s[len(settings):] for s in t["samples"]]
            comp_body = _elem(_CE_COMP_ALGO, _enc_uint(algo))
            if algo == 3:
                comp_body += _elem(_CE_COMP_SETTINGS, settings)
            body += _elem(_CONTENT_ENCODINGS, _elem(
                _CONTENT_ENCODING,
                _elem(_CE_ORDER, _enc_uint(0))
                + _elem(_CE_SCOPE, _enc_uint(1))
                + _elem(_CE_TYPE, _enc_uint(0))
                + _elem(_CE_COMPRESSION, comp_body),
            ))
        tr_elems += _elem(_TRACK_ENTRY, body)

    # per-track (dts, sample) streams -> merged cluster sequence: one
    # cluster per `cluster_frames` of the FIRST track, other tracks'
    # blocks ride in the cluster whose ts-range covers them
    events = []  # (dts, order, tracknum, [samples], lacing)
    for order, t in enumerate(tracks):
        lac = t.get("lacing")
        dts = 0
        samples, deltas = t["samples"], t["deltas"]
        if len(samples) != len(deltas):
            raise ValueError("samples/deltas length mismatch")
        if lac:
            for i in range(0, len(samples), cluster_frames):
                group = samples[i:i + cluster_frames]
                events.append((dts, order, t["track_id"], group, lac))
                dts += sum(deltas[i:i + len(group)])
        else:
            for s, d in zip(samples, deltas):
                events.append((dts, order, t["track_id"], [s], None))
                dts += d
    events.sort(key=lambda ev: (ev[0], ev[1]))

    clusters = b""
    for ci in range(0, len(events), cluster_frames):
        group = events[ci:ci + cluster_frames]
        cts = group[0][0]
        body = _elem(_CLUSTER_TS, _enc_uint(cts))
        for dts, _, tracknum, samples, lac in group:
            rel = dts - cts
            if not -32768 <= rel <= 32767:
                raise ValueError("block timestamp does not fit s16")
            hdr = _enc_size(tracknum) + struct.pack(">h", rel)
            # keyframe flag (0x80) exists on SimpleBlock only; Block
            # keeps those bits reserved-zero
            key = 0 if block_group else 0x80
            if lac is None:
                payload = hdr + bytes([key]) + samples[0]
            else:
                code = {"xiph": 1, "fixed": 2, "ebml": 3}[lac]
                sizes = [len(s) for s in samples]
                if lac == "fixed" and len(set(sizes)) > 1:
                    raise ValueError("fixed lacing needs equal frame sizes")
                payload = (hdr + bytes([key | (code << 1)])
                           + _enc_lace_sizes(sizes, lac)
                           + b"".join(samples))
            if block_group:
                body += _elem(_BLOCK_GROUP, _elem(_BLOCK, payload))
            else:
                body += _elem(_SIMPLE_BLOCK, payload)
        if unknown_size_clusters:
            # all-ones 1-byte size vint = unknown size (live muxing)
            clusters += _enc_id(_CLUSTER) + b"\xff" + body
        else:
            clusters += _elem(_CLUSTER, body)

    info = _elem(_INFO, _elem(_TIMESTAMP_SCALE, _enc_uint(timestamp_scale)))
    header = _elem(_EBML_HEADER, _elem(_DOCTYPE, doc_type.encode("ascii")))
    segment = _elem(_SEGMENT, info + _elem(_TRACKS, tr_elems) + clusters)
    return header + segment
