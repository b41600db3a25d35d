"""Ogg container demux from scratch — RFC 3533 (+ RFC 7845 OpusHead /
the Vorbis I spec for stream identification).

The third media container beside ISO-BMFF and Matroska: Ogg is what
Opus/Vorbis audio ships in. Covered: page walk ("OggS", version 0,
header-type flags, 64-bit granule position, stream serial, page
sequence with per-stream continuity check, the Ogg-specific CRC-32
— poly 0x04C11DB7, unreflected, init/xorout 0, computed with the CRC
field zeroed), segment-table lacing (255-run packets incl. the
terminating-0 case for exact-multiple sizes), multiplexed streams
(one track per serial), BOS codec identification (OpusHead /
\\x01vorbis / \\x7fFLAC / Speex / \\x80theora) and the per-stream
timescale (Opus granules are always 48 kHz per RFC 7845; Vorbis reads
the identification header's rate).

Per-packet rows carry the ENCLOSING PAGE's granule position (that is
what the container stores — per RFC 3533 granules mark the last
finished sample of a page; per-packet times need codec decode; a page
where no packet completes carries granule -1 per the spec).

Packets SPANNING pages (a 255 lace at page end continues on the next
page, continuation flag set) are reassembled: real Vorbis
comment/setup headers routinely exceed one page, so wild ``.ogg``
files hit this on stream open. A spanning packet's sample row carries
the FIRST fragment's offset and the TOTAL reassembled size, and the
track dict gains a ``fragments`` map {sample_idx: [(off, size), …]}
that ``demux_media`` uses to md5 the reassembled bytes — contiguous
packets (the overwhelming majority) stay plain byte ranges.

Emits the parse_mp4/parse_mkv track-dict shape, dispatched on the
payload magic by ``demux_media`` (operators/mp4_demux.py).
"""

from __future__ import annotations

import struct


class OggError(ValueError):
    """Typed Ogg framing error."""


def _crc_table() -> list[int]:
    table = []
    for b in range(256):
        r = b << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        table.append(r)
    return table


_CRC = _crc_table()


def _ogg_crc(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC[(r >> 24) ^ b]
    return r


#: BOS-packet magic -> (codec name, fixed timescale or None)
_CODECS = [
    (b"OpusHead", "opus", 48000),      # RFC 7845: granules always 48 kHz
    (b"\x01vorbis", "vorbis", None),   # rate in the ident header
    (b"\x7fFLAC", "flac", None),
    (b"Speex   ", "speex", None),
    (b"\x80theora", "theora", None),
]


def parse_ogg(data: bytes) -> list[dict]:
    """Ogg -> the parse_mp4/parse_mkv track-dict shape: one track per
    stream serial, samples = [(idx, page_granule, byte_off, size)]
    per packet. Packets spanning pages are reassembled; their
    fragment ranges land in the track's ``fragments`` map (see the
    module docstring)."""
    if data[:4] != b"OggS":
        raise OggError("not an Ogg stream (missing OggS capture)")
    pos = 0
    tracks: dict[int, dict] = {}
    #: serial -> [(off, size), …] fragments of the packet in flight
    pending: dict[int, list[tuple[int, int]]] = {}
    seqs: dict[int, int] = {}
    while pos < len(data):
        if data[pos:pos + 4] != b"OggS":
            raise OggError(f"lost page capture at byte {pos}")
        if pos + 27 > len(data):
            raise OggError("Ogg page header truncated")
        version, htype = data[pos + 4], data[pos + 5]
        if version != 0:
            raise OggError(f"unsupported Ogg stream structure version {version}")
        granule, serial, seq, crc, nseg = struct.unpack_from(
            "<qIIIB", data, pos + 6
        )
        segtab = data[pos + 27:pos + 27 + nseg]
        if len(segtab) != nseg:
            raise OggError("Ogg segment table truncated")
        body_start = pos + 27 + nseg
        body_len = sum(segtab)
        if body_start + body_len > len(data):
            raise OggError("Ogg page body truncated")
        page = bytearray(data[pos:body_start + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise OggError(f"Ogg page CRC mismatch at byte {pos}")
        t = tracks.get(serial)
        if t is None:
            if not htype & 0x02:
                raise OggError(
                    f"stream {serial:#x} starts without a BOS page"
                )
            t = tracks[serial] = {
                "track_id": serial, "handler": "soun", "codec": "",
                "timescale": 1, "samples": [], "_first": True,
            }
            seqs[serial] = seq
        else:
            seqs[serial] += 1
            if seqs[serial] != seq:
                raise OggError(
                    f"stream {serial:#x} page sequence gap "
                    f"({seq} after {seqs[serial] - 1})"
                )
        if htype & 0x01 and serial not in pending:
            raise OggError(
                f"continuation page without a continued packet at {pos}"
            )
        if serial in pending and not htype & 0x01:
            raise OggError(
                f"continued packet dropped: page at {pos} lacks the "
                "continuation flag"
            )
        off = body_start
        frags = pending.pop(serial, [])
        run_start = off
        run = 0
        for lace in segtab:
            run += lace
            off += lace
            if lace < 255:  # packet complete
                parts = list(frags)
                if run or not parts:  # this page's contribution
                    parts.append((run_start, run))
                frags = []
                total = sum(sz for _, sz in parts)
                if t["_first"]:
                    t["_first"] = False
                    head = b"".join(data[o:o + s] for o, s in parts)
                    for magic, name, ts in _CODECS:
                        if head[:len(magic)] == magic:
                            t["codec"] = name
                            if ts:
                                t["timescale"] = ts
                            elif name == "vorbis" and len(head) >= 16:
                                t["timescale"] = struct.unpack_from(
                                    "<I", head, 12
                                )[0]
                            break
                    else:
                        t["codec"] = "unknown"
                idx = len(t["samples"])
                t["samples"].append((idx, granule, parts[0][0], total))
                if len(parts) > 1:  # spanned pages: fragment map
                    t.setdefault("fragments", {})[idx] = parts
                run = 0
                run_start = off
        if run:  # unterminated: packet continues on the next page
            frags.append((run_start, run))
        if frags:
            pending[serial] = frags
        pos = body_start + body_len
    if pending:
        raise OggError("Ogg stream ends inside a continued packet")
    out = []
    for serial in tracks:
        tracks[serial].pop("_first")
        out.append(tracks[serial])
    return out


# --- encoder (fixture generator) --------------------------------------------


def encode_ogg(streams: list[dict], packets_per_page: int = 3,
               max_laces_per_page: int = 255) -> bytes:
    """Format-faithful Ogg writer (fixture generator). Each stream
    dict: serial, packets (list of bytes), granules (one per packet
    GROUP of ``packets_per_page``, or computed as the running packet
    count), optional codec_head (prepended as its own BOS packet).
    Lacing emits 255-runs with the terminating 0 for exact multiples.

    A group whose lacing exceeds ``max_laces_per_page`` (or the hard
    255 page cap) SPLITS across pages with the continuation flag —
    the RFC 3533 spanning-packet layout real Vorbis headers produce;
    lower the cap to force spanning with small fixtures. Pages where
    no packet completes carry granule -1 per the spec; the group's
    granule rides on its final page."""
    if not 1 <= max_laces_per_page <= 255:
        raise ValueError("max_laces_per_page must be in 1..255")
    out = bytearray()
    for st in streams:
        serial = st["serial"]
        packets = list(st["packets"])
        if st.get("codec_head"):
            packets.insert(0, st["codec_head"])
        ngroups = (len(packets) + packets_per_page - 1) // packets_per_page
        granules = st.get("granules") or [
            (i + 1) * packets_per_page for i in range(ngroups)
        ]
        if len(granules) != ngroups:
            raise ValueError("granules must have one entry per packet group")
        # flatten each group into lace values, then paginate
        pages: list[tuple[bytearray, bytearray, bool, bool, int]] = []
        # (segtab, body, continued_in, completes_a_packet, granule)
        for gi in range(ngroups):
            group = packets[gi * packets_per_page:(gi + 1) * packets_per_page]
            seg = bytearray()
            body = bytearray()
            continued_in = False
            completes = False

            def flush(cont_next: bool):
                nonlocal seg, body, continued_in, completes
                pages.append((seg, body, continued_in, completes,
                              granules[gi]))
                seg, body = bytearray(), bytearray()
                continued_in = cont_next
                completes = False

            for pk in group:
                laces = [255] * (len(pk) // 255) + [len(pk) % 255]
                consumed = 0
                for li, lace in enumerate(laces):
                    if len(seg) >= max_laces_per_page:
                        flush(cont_next=li > 0)
                    seg.append(lace)
                    body += pk[consumed:consumed + lace]
                    consumed += lace
                    if lace < 255:
                        completes = True
            flush(cont_next=False)
        # fix granules: only the LAST page of each group carries the
        # group granule; handled above via completes/cont flags — now
        # emit with stream-wide sequence numbers and BOS/EOS flags
        for pi, (seg, body, cont_in, completes, gran) in enumerate(pages):
            htype = 0x01 if cont_in else 0
            if pi == 0:
                htype |= 0x02
            if pi == len(pages) - 1:
                htype |= 0x04
            g = gran if completes else -1
            hdr = bytearray(b"OggS") + bytes([0, htype])
            hdr += struct.pack("<qIIIB", g, serial, pi, 0, len(seg))
            hdr += seg
            page = hdr + body
            crc = _ogg_crc(bytes(page))
            page[22:26] = struct.pack("<I", crc)
            out += page
    return bytes(out)
