"""ID3v2 tag parsing — the informal-but-published id3.org spec
(v2.3/v2.4), the metadata layer of the MP3 demux.

Audio's EXIF analog: title/artist/album/date/track/genre become the
filter and dedup keys an audio training pipeline joins on, and —
like EXIF GPS — tags can carry data worth stripping (COMM comments,
private frames). Covered: the v2.2/v2.3/v2.4 header (syncsafe size,
footer flag), extended-header skip, v2.3 (plain sizes) and v2.4
(syncsafe frame sizes) frame walks, the four text encodings
(ISO-8859-1, UTF-16 with BOM, UTF-16BE, UTF-8), text frames (T***
incl. TXXX user frames), comment frames (COMM language + description
+ body), and whole-tag unsynchronisation (FF 00 -> FF). The v2.2
three-byte frame IDs map onto their v2.3 names.

``strip_id3`` removes both the leading v2 tag and the trailing v1
block while leaving the MPEG frames byte-identical — the audio twin
of exif.strip_metadata.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


class Id3Error(ValueError):
    """Typed ID3 format error."""


#: v2.2 3-byte ids -> v2.3/v2.4 4-byte names
_V22 = {b"TT2": "TIT2", b"TP1": "TPE1", b"TAL": "TALB", b"TYE": "TYER",
        b"TRK": "TRCK", b"TCO": "TCON", b"COM": "COMM", b"TXX": "TXXX"}


def _syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise Id3Error("non-syncsafe byte in a syncsafe integer")
    v = 0
    for x in b:
        v = (v << 7) | x
    return v


def _decode_text(enc: int, raw: bytes) -> str:
    if enc == 0:
        s = raw.decode("latin-1", "replace")
    elif enc == 1:
        s = raw.decode("utf-16", "replace")  # BOM-driven
    elif enc == 2:
        s = raw.decode("utf-16-be", "replace")
    elif enc == 3:
        s = raw.decode("utf-8", "replace")
    else:
        raise Id3Error(f"unknown ID3 text encoding {enc}")
    return s.split("\x00")[0]


def _unsynchronise(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        out.append(data[i])
        if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] == 0x00:
            i += 1  # drop the inserted zero
        i += 1
    return bytes(out)


def parse_id3(data: bytes) -> dict:
    """Leading ID3v2 tag -> flat dict: version, plus any of title /
    artist / album / date / track / genre / comment / txxx (a
    {description: value} dict). Empty dict when no tag leads."""
    if data[:3] != b"ID3":
        return {}
    if len(data) < 10:
        raise Id3Error("ID3v2 header truncated")
    ver_major, flags = data[3], data[5]
    if ver_major not in (2, 3, 4):
        raise Id3Error(f"ID3v2.{ver_major} not supported")
    size = _syncsafe(data[6:10])
    body = data[10:10 + size]
    if len(body) != size:
        raise Id3Error("ID3v2 tag body truncated")
    if flags & 0x80:  # whole-tag unsynchronisation
        body = _unsynchronise(body)
    pos = 0
    if flags & 0x40:  # extended header
        if ver_major == 4:
            pos += _syncsafe(body[0:4])
        else:
            pos += 4 + struct.unpack_from(">I", body, 0)[0]
    out: dict = {"version": f"2.{ver_major}"}
    names = {"TIT2": "title", "TPE1": "artist", "TALB": "album",
             "TDRC": "date", "TYER": "date", "TRCK": "track",
             "TCON": "genre"}
    id_len = 3 if ver_major == 2 else 4
    sz_len = 3 if ver_major == 2 else 4
    hdr_len = id_len + sz_len + (0 if ver_major == 2 else 2)
    while pos + hdr_len <= len(body):
        fid = body[pos:pos + id_len]
        if fid == bytes(id_len):  # padding
            break
        if ver_major == 2:
            fsz = int.from_bytes(body[pos + 3:pos + 6], "big")
            fid4 = _V22.get(fid, fid.decode("latin-1") + "?")
        else:
            raw_sz = body[pos + 4:pos + 8]
            fsz = _syncsafe(raw_sz) if ver_major == 4 \
                else struct.unpack(">I", raw_sz)[0]
            fid4 = fid.decode("latin-1")
        content = body[pos + hdr_len:pos + hdr_len + fsz]
        if len(content) != fsz:
            raise Id3Error(f"ID3 frame {fid4} truncated")
        pos += hdr_len + fsz
        if not content:
            continue
        if fid4 == "TXXX":
            enc = content[0]
            sep = b"\x00\x00" if enc in (1, 2) else b"\x00"
            step = 2 if enc in (1, 2) else 1
            cut = content.find(sep, 1)
            if enc in (1, 2) and cut > 0 and (cut - 1) % 2:
                cut += 1  # keep the UTF-16 code-unit grid
            desc = _decode_text(enc, content[1:max(cut, 1)])
            val = _decode_text(enc, content[cut + len(sep):]) \
                if cut >= 0 else ""
            out.setdefault("txxx", {})[desc] = val
        elif fid4.startswith("T"):
            key = names.get(fid4)
            if key:
                out[key] = _decode_text(content[0], content[1:])
        elif fid4 == "COMM":
            enc = content[0]
            rest = content[4:]  # skip 3-byte language
            sep = b"\x00\x00" if enc in (1, 2) else b"\x00"
            cut = rest.find(sep)
            if enc in (1, 2) and cut > 0 and cut % 2:
                cut += 1
            if cut >= 0:
                out["comment"] = _decode_text(enc, rest[cut + len(sep):])
            else:
                out["comment"] = _decode_text(enc, rest)
    return out


def strip_id3(data: bytes) -> bytes:
    """Remove the leading ID3v2 tag (incl. footer) and a trailing
    ID3v1 block; the MPEG audio frames pass through byte-identical —
    the metadata-redaction twin of exif.strip_metadata."""
    out = data
    if out[:3] == b"ID3":
        if len(out) < 10:
            raise Id3Error("ID3v2 header truncated")
        size = _syncsafe(out[6:10])
        footer = 10 if out[5] & 0x10 else 0
        out = out[10 + size + footer:]
    if len(out) >= 128 and out[-128:-125] == b"TAG":
        out = out[:-128]
    return out


ID3_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("version", StringType()),
        StructField("title", StringType()),
        StructField("artist", StringType()),
        StructField("album", StringType()),
        StructField("date", StringType()),
        StructField("track", StringType()),
        StructField("genre", StringType()),
        StructField("comment", StringType()),
    ]
)


def id3_extract(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> typed tag columns via Arrow
    mapInPandas; untagged payloads yield NULL fields."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                m = parse_id3(bytes(raw))
                rows.append((
                    mid, m.get("version"), m.get("title"),
                    m.get("artist"), m.get("album"), m.get("date"),
                    m.get("track"), m.get("genre"), m.get("comment"),
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in ID3_SCHEMA.fields]
            )

    return df.mapInPandas(batches, ID3_SCHEMA)


# --- writer (fixture generator) ----------------------------------------------


def encode_id3(frames: dict, version: int = 3, comment: str | None = None,
               encoding: int = 3, unsync: bool = False) -> bytes:
    """A real ID3v2.3/2.4 tag (fixture generator): ``frames`` maps
    4-byte ids (TIT2/TPE1/...) to text values; ``encoding`` picks the
    text encoding byte for every frame."""
    if version not in (3, 4):
        raise ValueError("writer emits v2.3 / v2.4 only")

    def enc_text(s: str) -> bytes:
        if encoding == 0:
            return s.encode("latin-1")
        if encoding == 1:
            return "﻿".join(["", s]).encode("utf-16-be").replace(
                b"\xfe\xff", b"\xff\xfe", 0) or s.encode("utf-16")
        if encoding == 2:
            return s.encode("utf-16-be")
        return s.encode("utf-8")

    body = bytearray()

    def add(fid: str, content: bytes):
        if version == 4:
            sz = bytes((len(content) >> s) & 0x7F for s in (21, 14, 7, 0))
        else:
            sz = struct.pack(">I", len(content))
        body.extend(fid.encode("latin-1") + sz + b"\x00\x00" + content)

    for fid, val in frames.items():
        if encoding == 1:
            add(fid, bytes([1]) + val.encode("utf-16"))  # BOM included
        else:
            add(fid, bytes([encoding]) + enc_text(val))
    if comment is not None:
        sep = b"\x00\x00" if encoding in (1, 2) else b"\x00"
        if encoding == 1:
            payload = (bytes([1]) + b"eng" + "".encode("utf-16") + sep
                       + comment.encode("utf-16"))
        else:
            payload = (bytes([encoding]) + b"eng" + sep
                       + enc_text(comment))
        add("COMM", payload)
    raw = bytes(body)
    flags = 0
    if unsync:
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        raw = bytes(out)
        flags |= 0x80
    size = len(raw)
    ss = bytes((size >> s) & 0x7F for s in (21, 14, 7, 0))
    return b"ID3" + bytes([version, 0, flags]) + ss + raw
