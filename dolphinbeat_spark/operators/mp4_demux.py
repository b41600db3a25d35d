"""MP4 / ISO-BMFF demux — from-scratch per ISO/IEC 14496-12 (public).

Closes the "video: raise by name" boundary at the CONTAINER level,
which is the part a 100 TB training-data pipeline actually needs from
Spark: locating every sample (frame / audio packet) inside an opaque
``binary`` column — track, codec 4cc, decode timestamp, byte range —
so frame-sampling, dedup-by-frame-hash, and shipping byte ranges to a
GPU decode stage are all expressible as DataFrame ops. Codec BITSTREAM
decode (H.264/AAC/...) stays honestly out of scope: no codec libs in
this container, and ``decode_video_frames`` raises by name. Raw
(uncompressed) sample entries — 'raw ' RGB video, 'twos'/'sowt' PCM
audio — ARE fully decodable and get real byte extraction + digests.

Box walker: size+4cc headers (64-bit largesize handled), moov/trak/
mdia/minf/stbl containers, mvhd/tkhd/mdhd/hdlr/stsd/stts/stsc/stsz/
stco/co64 leaves — plus FRAGMENTED layouts (§8.8): mvex/trex
defaults, moof/traf with tfhd flag parsing (base-data-offset,
default-base-is-moof, per-traf defaults), tfdt decode-time anchors,
multi-trun sample tables with per-sample duration/size/flags/cto
fields. The writer (`encode_mp4`) builds format-faithful fixtures in
both layouts: real chunk interleaving, multi-entry stts runs,
multi-chunk stsc patterns, and fMP4 init-segment + moof/mdat pairs —
tests and oracle specs decode what a real muxer would emit.

Scale notes: demux runs inside Arrow-batched ``mapInPandas`` — one
pass per payload, no driver involvement; emitted rows carry offsets
and digests (small), never the payload bytes, so the exploded
per-sample relation shuffles cheaply. At 100 TB the payload column
stays pruned unless a stage touches it.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "Mp4Error",
    "parse_mp4",
    "encode_mp4",
    "demux_media",
    "decode_video_frames",
]


class Mp4Error(ValueError):
    """Typed ISO-BMFF parse failure."""


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in a range."""
    pos = start
    while pos < end:
        if end - pos < 8:
            raise Mp4Error(f"truncated box header at {pos}")
        size = int.from_bytes(data[pos:pos + 4], "big")
        cc = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if end - pos < 16:
                raise Mp4Error(f"truncated largesize box at {pos}")
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise Mp4Error(
                f"box {cc!r} at {pos} overruns its container "
                f"(size {size}, room {end - pos})"
            )
        yield cc, body, pos + size
        pos += size


def _fullbox(data: bytes, start: int):
    """(version, flags, payload_start)."""
    v = data[start]
    flags = int.from_bytes(data[start + 1:start + 4], "big")
    return v, flags, start + 4


def _parse_stts(data, s, e):
    v, _, p = _fullbox(data, s)
    if v != 0:
        raise Mp4Error(f"stts version {v} not supported")
    n = int.from_bytes(data[p:p + 4], "big")
    p += 4
    if p + 8 * n > e:
        raise Mp4Error("stts entry table truncated")
    runs = []
    for i in range(n):
        cnt, delta = struct.unpack_from(">II", data, p + 8 * i)
        runs.append((cnt, delta))
    return runs


def _parse_stsc(data, s, e):
    v, _, p = _fullbox(data, s)
    if v != 0:
        raise Mp4Error(f"stsc version {v} not supported")
    n = int.from_bytes(data[p:p + 4], "big")
    p += 4
    if p + 12 * n > e:
        raise Mp4Error("stsc entry table truncated")
    return [struct.unpack_from(">III", data, p + 12 * i) for i in range(n)]


def _parse_stsz(data, s, e):
    v, _, p = _fullbox(data, s)
    if v != 0:
        raise Mp4Error(f"stsz version {v} not supported")
    fixed = int.from_bytes(data[p:p + 4], "big")
    n = int.from_bytes(data[p + 4:p + 8], "big")
    p += 8
    if fixed:
        return [fixed] * n
    if p + 4 * n > e:
        raise Mp4Error("stsz size table truncated")
    return [int.from_bytes(data[p + 4 * i:p + 4 * i + 4], "big")
            for i in range(n)]


def _parse_stco(data, s, e, wide: bool):
    v, _, p = _fullbox(data, s)
    if v != 0:
        raise Mp4Error(f"{'co64' if wide else 'stco'} version {v} unsupported")
    n = int.from_bytes(data[p:p + 4], "big")
    p += 4
    w = 8 if wide else 4
    if p + w * n > e:
        raise Mp4Error("chunk offset table truncated")
    return [int.from_bytes(data[p + w * i:p + w * i + w], "big")
            for i in range(n)]


def parse_mp4(data: bytes) -> list[dict]:
    """Parse an ISO-BMFF payload into per-track sample tables.

    Returns one dict per track: ``track_id``, ``handler`` (vide/soun/
    ...), ``codec`` (stsd entry 4cc), ``timescale``, ``duration``,
    ``samples`` = list of (sample_idx, dts, offset, size) with offsets
    absolute into ``data``. Handles both classic (moov sample tables)
    and FRAGMENTED layouts (moov/mvex init segment + moof/traf/trun
    fragments — the shape streaming video actually ships)."""
    tracks = []
    saw_moov = False
    trex: dict[int, tuple] = {}
    moofs: list[tuple[int, int, int]] = []  # (box_start, body_start, body_end)
    for cc, s, e in _walk(data, 0, len(data)):
        if cc == b"moof":
            # box start = body start - header (8; moof never needs
            # largesize in practice, and _walk validated the header)
            moofs.append((s - 8, s, e))
        if cc != b"moov":
            continue
        saw_moov = True
        for cc2, s2, e2 in _walk(data, s, e):
            if cc2 == b"trak":
                tracks.append(_parse_trak(data, s2, e2))
            elif cc2 == b"mvex":
                for cc3, s3, e3 in _walk(data, s2, e2):
                    if cc3 == b"trex":
                        _, _, p = _fullbox(data, s3)
                        tid, _sdi, d_dur, d_size, d_flags = struct.unpack_from(
                            ">IIIII", data, p
                        )
                        trex[tid] = (d_dur, d_size)
    if not saw_moov:
        raise Mp4Error("no moov box — not an ISO-BMFF payload (or truncated)")
    if moofs:
        _apply_fragments(data, tracks, trex, moofs)
    return tracks


def _apply_fragments(data, tracks, trex, moofs) -> None:
    """Walk moof fragments and append their samples to each track
    (ISO/IEC 14496-12 §8.8: tfhd defaults + trun per-sample tables)."""
    by_id = {t["track_id"]: t for t in tracks}
    next_dts = {tid: t["samples"][-1][1] if t["samples"] else 0
                for tid, t in by_id.items()}
    for moof_start, s, e in moofs:
        for cc, s1, e1 in _walk(data, s, e):
            if cc != b"traf":
                continue
            _parse_traf(data, s1, e1, moof_start, by_id, trex, next_dts)


def _parse_traf(data, s, e, moof_start, by_id, trex, next_dts) -> None:
    tfhd = None
    base_dts = None
    truns = []
    for cc, s1, e1 in _walk(data, s, e):
        if cc == b"tfhd":
            _, flags, p = _fullbox(data, s1)
            tid = int.from_bytes(data[p:p + 4], "big")
            p += 4
            base_off = None
            if flags & 0x1:  # base-data-offset
                base_off = int.from_bytes(data[p:p + 8], "big")
                p += 8
            if flags & 0x2:  # sample-description-index
                p += 4
            d_dur = d_size = None
            if flags & 0x8:
                d_dur = int.from_bytes(data[p:p + 4], "big")
                p += 4
            if flags & 0x10:
                d_size = int.from_bytes(data[p:p + 4], "big")
                p += 4
            if flags & 0x20:  # default-sample-flags
                p += 4
            if base_off is None:
                if flags & 0x20000:  # default-base-is-moof
                    base_off = moof_start
                else:
                    # legacy default (base = start of enclosing moof
                    # for the FIRST traf only) — ambiguous beyond that
                    base_off = moof_start
            tfhd = (tid, base_off, d_dur, d_size)
        elif cc == b"tfdt":
            v, _, p = _fullbox(data, s1)
            base_dts = int.from_bytes(data[p:p + (8 if v == 1 else 4)], "big")
        elif cc == b"trun":
            truns.append((s1, e1))
    if tfhd is None:
        raise Mp4Error("traf missing tfhd")
    tid, base_off, d_dur, d_size = tfhd
    tr = by_id.get(tid)
    if tr is None:
        raise Mp4Error(f"traf references unknown track_id {tid}")
    tx_dur, tx_size = trex.get(tid, (None, None))
    dts = base_dts if base_dts is not None else next_dts.get(tid, 0)
    run_off = None  # running offset when a trun omits data_offset
    for s1, e1 in truns:
        v, flags, p = _fullbox(data, s1)
        if v != 0:
            # v1 only changes composition-offset signedness, which we
            # skip over anyway
            pass
        n = int.from_bytes(data[p:p + 4], "big")
        p += 4
        if flags & 0x1:  # data-offset-present (signed)
            doff = int.from_bytes(data[p:p + 4], "big", signed=True)
            p += 4
            off = base_off + doff
        else:
            if run_off is None:
                raise Mp4Error("trun without data_offset before any run")
            off = run_off
        if flags & 0x4:  # first-sample-flags
            p += 4
        per_dur = bool(flags & 0x100)
        per_size = bool(flags & 0x200)
        per_flags = bool(flags & 0x400)
        per_cto = bool(flags & 0x800)
        for _ in range(n):
            dur = d_dur if d_dur is not None else tx_dur
            size = d_size if d_size is not None else tx_size
            if per_dur:
                dur = int.from_bytes(data[p:p + 4], "big")
                p += 4
            if per_size:
                size = int.from_bytes(data[p:p + 4], "big")
                p += 4
            if per_flags:
                p += 4
            if per_cto:
                p += 4
            if p > e1:
                raise Mp4Error("trun sample table truncated")
            if size is None or dur is None:
                raise Mp4Error(
                    f"track {tid}: no sample size/duration in trun, "
                    "tfhd defaults, or trex"
                )
            idx = len(tr["samples"])
            tr["samples"].append((idx, dts, off, size))
            dts += dur
            off += size
        run_off = off
    next_dts[tid] = dts


def _parse_trak(data, s, e) -> dict:
    track_id = None
    handler = codec = None
    timescale = duration = None
    stts = stsc = stsz = stco = None
    for cc, s1, e1 in _walk(data, s, e):
        if cc == b"tkhd":
            v, _, p = _fullbox(data, s1)
            # v0: times are u32; v1: u64 — track_id sits after ctime/mtime
            track_id = int.from_bytes(
                data[p + (16 if v == 1 else 8):][:4], "big"
            )
        elif cc == b"mdia":
            for cc2, s2, e2 in _walk(data, s1, e1):
                if cc2 == b"mdhd":
                    v, _, p = _fullbox(data, s2)
                    if v == 1:
                        timescale = int.from_bytes(data[p + 16:p + 20], "big")
                        duration = int.from_bytes(data[p + 20:p + 28], "big")
                    else:
                        timescale = int.from_bytes(data[p + 8:p + 12], "big")
                        duration = int.from_bytes(data[p + 12:p + 16], "big")
                elif cc2 == b"hdlr":
                    _, _, p = _fullbox(data, s2)
                    handler = data[p + 4:p + 8].decode("latin-1")
                elif cc2 == b"minf":
                    for cc3, s3, e3 in _walk(data, s2, e2):
                        if cc3 != b"stbl":
                            continue
                        for cc4, s4, e4 in _walk(data, s3, e3):
                            if cc4 == b"stsd":
                                _, _, p = _fullbox(data, s4)
                                n = int.from_bytes(data[p:p + 4], "big")
                                if n < 1:
                                    raise Mp4Error("empty stsd")
                                codec = data[p + 8:p + 12].decode("latin-1")
                            elif cc4 == b"stts":
                                stts = _parse_stts(data, s4, e4)
                            elif cc4 == b"stsc":
                                stsc = _parse_stsc(data, s4, e4)
                            elif cc4 == b"stsz":
                                stsz = _parse_stsz(data, s4, e4)
                            elif cc4 == b"stco":
                                stco = _parse_stco(data, s4, e4, False)
                            elif cc4 == b"co64":
                                stco = _parse_stco(data, s4, e4, True)
    if None in (track_id, timescale) or stsz is None or stco is None \
            or stsc is None or stts is None:
        raise Mp4Error("trak missing one of tkhd/mdhd/stts/stsc/stsz/stco")

    # sample → dts from stts runs
    dts_list = []
    t = 0
    for cnt, delta in stts:
        for _ in range(cnt):
            dts_list.append(t)
            t += delta
    if len(dts_list) != len(stsz):
        raise Mp4Error(
            f"stts covers {len(dts_list)} samples, stsz declares {len(stsz)}"
        )

    # sample → offset via stsc chunk mapping
    samples = []
    si = 0
    n_chunks = len(stco)
    for ei, (first, per_chunk, _desc) in enumerate(stsc):
        last = stsc[ei + 1][0] - 1 if ei + 1 < len(stsc) else n_chunks
        if first < 1 or last > n_chunks:
            raise Mp4Error("stsc chunk range out of bounds")
        for chunk in range(first, last + 1):
            off = stco[chunk - 1]
            for _ in range(per_chunk):
                if si >= len(stsz):
                    raise Mp4Error("stsc maps more samples than stsz has")
                samples.append((si, dts_list[si], off, stsz[si]))
                off += stsz[si]
                si += 1
    if si != len(stsz):
        raise Mp4Error(
            f"chunk map covers {si} samples, stsz declares {len(stsz)}"
        )
    return {
        "track_id": track_id,
        "handler": handler or "",
        "codec": codec or "",
        "timescale": timescale,
        "duration": duration or 0,
        "samples": samples,
    }


# --- writer (fixtures / tests) --------------------------------------------


def _box(cc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + cc + payload


def _full(cc: bytes, v: int, flags: int, payload: bytes) -> bytes:
    return _box(cc, bytes([v]) + flags.to_bytes(3, "big") + payload)


def encode_mp4(tracks: list[dict], fragments: int | None = None) -> bytes:
    """Minimal format-faithful ISO-BMFF writer for fixtures.

    Each track dict: ``handler`` ('vide'|'soun'), ``codec`` (4cc str),
    ``timescale``, ``samples`` = list of bytes, ``deltas`` = per-sample
    dts deltas (len == samples), optional ``chunk_sizes`` = samples per
    chunk (defaults to one chunk with everything). Chunks are
    interleaved round-robin across tracks in mdat — the layout a real
    muxer produces.

    With ``fragments=N`` the file is written FRAGMENTED (fMP4): an
    init segment (moov with empty sample tables + mvex/trex) followed
    by one moof+mdat pair per N samples — tfhd uses
    default-base-is-moof, truns carry explicit data offsets, sizes and
    durations, tfdt anchors each fragment's decode time."""
    if fragments is not None:
        return _encode_fmp4(tracks, fragments)
    # lay out mdat: round-robin chunks
    chunk_plans = []  # per track: list[(sample_lo, sample_hi)]
    for t in tracks:
        sizes = t.get("chunk_sizes") or [len(t["samples"])]
        if sum(sizes) != len(t["samples"]):
            raise ValueError("chunk_sizes must cover all samples exactly")
        lo, plan = 0, []
        for c in sizes:
            plan.append((lo, lo + c))
            lo += c
        chunk_plans.append(plan)
    mdat = bytearray()
    offsets = [[] for _ in tracks]  # absolute chunk offsets (filled later)
    order = []
    maxc = max((len(p) for p in chunk_plans), default=0)
    for ci in range(maxc):
        for ti, plan in enumerate(chunk_plans):
            if ci < len(plan):
                order.append((ti, ci))
    rel = []
    for ti, ci in order:
        lo, hi = chunk_plans[ti][ci]
        rel.append((ti, len(mdat)))
        for s in tracks[ti]["samples"][lo:hi]:
            mdat += s
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_box_off = len(ftyp)
    data_base = mdat_box_off + 8
    for (ti, r) in rel:
        offsets[ti].append(data_base + r)

    movie_ts = 1000
    traks = b""
    max_dur = 0
    for ti, t in enumerate(tracks):
        deltas = t["deltas"]
        if len(deltas) != len(t["samples"]):
            raise ValueError("deltas must match samples")
        dur = sum(deltas)
        mdur = dur * movie_ts // t["timescale"] if t["timescale"] else 0
        max_dur = max(max_dur, mdur)
        tkhd = _full(
            b"tkhd", 0, 7,
            struct.pack(">IIIII", 0, 0, ti + 1, 0, mdur)
            + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0 if t["handler"] == "vide" else 0x100, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II",
                          (t.get("width", 0)) << 16, (t.get("height", 0)) << 16),
        )
        mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIIIHH", 0, 0, t["timescale"], dur, 0x55C4, 0),
        )
        hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + t["handler"].encode() + b"\x00" * 12
            + b"db\x00",
        )
        cc = t["codec"].encode("latin-1")
        if t["handler"] == "vide":
            entry = _box(
                cc,
                b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                + struct.pack(">HH", t.get("width", 0), t.get("height", 0))
                + struct.pack(">IIIH", 0x480000, 0x480000, 0, 1)
                + b"\x00" * 32 + struct.pack(">Hh", 24, -1),
            )
            mhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        else:
            entry = _box(
                cc,
                b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
                + struct.pack(">HHII", t.get("channels", 1), 16, 0,
                              t["timescale"] << 16),
            )
            mhd = _full(b"smhd", 0, 0, struct.pack(">hH", 0, 0))
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        # stts runs (compress equal deltas)
        runs = []
        for d in deltas:
            if runs and runs[-1][1] == d:
                runs[-1][0] += 1
            else:
                runs.append([1, d])
        stts = _full(
            b"stts", 0, 0,
            struct.pack(">I", len(runs))
            + b"".join(struct.pack(">II", c, d) for c, d in runs),
        )
        # stsc entries from the chunk plan (compress equal run lengths)
        plan = chunk_plans[ti]
        entries = []
        for ci, (lo, hi) in enumerate(plan):
            per = hi - lo
            if entries and entries[-1][1] == per:
                continue
            entries.append((ci + 1, per, 1))
        stsc = _full(
            b"stsc", 0, 0,
            struct.pack(">I", len(entries))
            + b"".join(struct.pack(">III", *e) for e in entries),
        )
        sizes = [len(s) for s in t["samples"]]
        stsz = _full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, len(sizes))
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
        stco = _full(
            b"stco", 0, 0,
            struct.pack(">I", len(offsets[ti]))
            + b"".join(struct.pack(">I", o) for o in offsets[ti]),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        dinf = _box(b"dinf", _full(
            b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
        ))
        minf = _box(b"minf", mhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, movie_ts, max_dur)
        + struct.pack(">iH", 0x10000, 0x100) + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", len(tracks) + 1),
    )
    moov = _box(b"moov", mvhd + traks)
    return ftyp + _box(b"mdat", bytes(mdat)) + moov


def _encode_fmp4(tracks: list[dict], per_frag: int) -> bytes:
    """Fragmented writer: init segment (via the classic writer with
    empty sample tables, plus mvex/trex) + moof/mdat pairs. Data
    offsets are moof-relative (default-base-is-moof), computed by
    building each moof once with placeholders to learn its size."""
    if per_frag < 1:
        raise ValueError("fragments must be >= 1")
    init_tracks = [
        {**t, "samples": [], "deltas": [], "chunk_sizes": None}
        for t in tracks
    ]
    init = encode_mp4(init_tracks)
    parts = {}
    pos = 0
    while pos < len(init):
        size = int.from_bytes(init[pos:pos + 4], "big")
        parts[init[pos + 4:pos + 8]] = init[pos:pos + size]
        pos += size
    mvex = b"".join(
        _full(b"trex", 0, 0, struct.pack(">IIIII", ti + 1, 1, 0, 0, 0))
        for ti in range(len(tracks))
    )
    out = bytearray(
        parts[b"ftyp"] + _box(b"moov", parts[b"moov"][8:] + _box(b"mvex", mvex))
    )
    n_frags = max(
        (len(t["samples"]) + per_frag - 1) // per_frag for t in tracks
    )
    dts_cursor = [0] * len(tracks)
    for f in range(n_frags):
        slices = []
        for ti, t in enumerate(tracks):
            lo, hi = f * per_frag, min((f + 1) * per_frag, len(t["samples"]))
            if lo < hi:
                slices.append((ti, lo, hi))

        def build_moof(offs):
            trafs = b""
            for (ti, lo, hi) in slices:
                t = tracks[ti]
                tfhd = _full(b"tfhd", 0, 0x20000, struct.pack(">I", ti + 1))
                tfdt = _full(b"tfdt", 0, 0, struct.pack(">I", dts_cursor[ti]))
                body = struct.pack(">I", hi - lo)
                body += struct.pack(">i", offs[ti] if offs else 0)
                for d, smp in zip(t["deltas"][lo:hi], t["samples"][lo:hi]):
                    body += struct.pack(">II", d, len(smp))
                trun = _full(b"trun", 0, 0x1 | 0x100 | 0x200, body)
                trafs += _box(b"traf", tfhd + tfdt + trun)
            return _box(
                b"moof",
                _full(b"mfhd", 0, 0, struct.pack(">I", f + 1)) + trafs,
            )

        probe = build_moof(None)
        offs = {}
        cur = len(probe) + 8  # moof-relative: mdat payload starts here
        mdat = bytearray()
        for (ti, lo, hi) in slices:
            offs[ti] = cur
            for smp in tracks[ti]["samples"][lo:hi]:
                mdat += smp
                cur += len(smp)
        moof = build_moof(offs)
        out += moof + _box(b"mdat", bytes(mdat))
        for (ti, lo, hi) in slices:
            dts_cursor[ti] += sum(tracks[ti]["deltas"][lo:hi])
    return bytes(out)


# --- Spark operators -------------------------------------------------------

DEMUX_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("track_id", LongType()),
        StructField("handler", StringType()),
        StructField("codec", StringType()),
        StructField("sample_idx", LongType()),
        StructField("dts", LongType()),
        StructField("dts_s", DoubleType()),
        StructField("sample_bytes", LongType()),
        StructField("byte_offset", LongType()),
        StructField("sample_md5", StringType()),
    ]
)


def demux_media(df: DataFrame, every: int = 1,
                handler: str | None = None,
                digest: str = "bytes") -> DataFrame:
    """Demux ``(media_id, payload)`` rows into one row per sample
    (every ``every``-th, optionally one handler type only): the
    frame-sampling primitive. Emits byte ranges + md5 of the actual
    sample bytes — never the bytes themselves — so the result
    relation is shuffle-cheap at any scale. Containers dispatch on the
    payload magic: ISO-BMFF (MP4), EBML (Matroska/WebM), and raw MPEG
    audio (MP3, with ID3 tags). ``digest="hex"`` md5s the
    lowercase-hex rendering of the sample bytes instead — the form a
    SQL oracle recomputes when frames contain non-ASCII bytes
    (DuckDB's md5 takes VARCHAR only)."""
    if every < 1:
        raise ValueError("every must be >= 1")
    if digest not in ("bytes", "hex"):
        raise ValueError(f"digest must be 'bytes' or 'hex', got {digest!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(raw)
                if b[:4] == b"\x1aE\xdf\xa3":  # EBML: Matroska / WebM
                    from dolphinbeat_spark.operators.mkv_demux import (
                        parse_mkv,
                    )

                    tracks = parse_mkv(b)
                elif b[:4] == b"OggS":
                    from dolphinbeat_spark.operators.ogg_demux import (
                        parse_ogg,
                    )

                    tracks = parse_ogg(b)
                elif b[:3] == b"ID3" or (
                    len(b) > 1 and b[0] == 0xFF and b[1] >> 5 == 0b111
                ):
                    from dolphinbeat_spark.operators.mp3_demux import (
                        parse_mp3,
                    )

                    tracks = parse_mp3(b)
                else:
                    tracks = parse_mp4(b)
                for tr in tracks:
                    if handler is not None and tr["handler"] != handler:
                        continue
                    ts = tr["timescale"] or 1
                    # Ogg packets spanning pages carry a fragment map;
                    # Matroska ContentEncodings carry decoded bytes;
                    # everything else is a contiguous byte range
                    frag_map = tr.get("fragments") or {}
                    decoded_map = tr.get("decoded") or {}
                    for (idx, dts, off, size) in tr["samples"]:
                        if idx % every:
                            continue
                        dec = decoded_map.get(idx)
                        parts = frag_map.get(idx)
                        if dec is not None:
                            # size reports the DECODED frame length —
                            # what a downstream decode stage consumes
                            sb = dec
                            size = len(dec)
                        elif parts is not None:
                            for (fo, fs) in parts:
                                if fo + fs > len(b):
                                    raise Mp4Error(
                                        f"sample {idx} fragment {fo}+{fs} "
                                        f"exceeds payload ({len(b)})"
                                    )
                            sb = b"".join(b[fo:fo + fs] for fo, fs in parts)
                        elif off + size > len(b):
                            raise Mp4Error(
                                f"sample {idx} byte range {off}+{size} "
                                f"exceeds payload ({len(b)})"
                            )
                        else:
                            sb = b[off:off + size]
                        rows.append(
                            (
                                mid, tr["track_id"], tr["handler"],
                                tr["codec"], idx, dts, dts / ts, size, off,
                                hashlib.md5(
                                    sb if digest == "bytes"
                                    else sb.hex().encode()
                                ).hexdigest(),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in DEMUX_SCHEMA.fields],
            )

    return df.mapInPandas(batches, DEMUX_SCHEMA)


def decode_video_frames(df: DataFrame) -> DataFrame:
    """Codec bitstream decode — honestly unavailable: no codec
    libraries exist in this container, and H.264/HEVC/AV1 entropy
    decode is far outside from-scratch scope. Demux with
    :func:`demux_media`; ship byte ranges to a decode-capable stage."""
    raise NotImplementedError(
        "video codec bitstream decode needs libraries (ffmpeg/PyAV) "
        "absent from this environment; demux_media provides the "
        "per-sample byte ranges a decoder stage would consume"
    )
