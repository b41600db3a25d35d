"""EXIF metadata extraction + redaction — JPEG APP1 / TIFF 6.0 IFD
structure, from scratch (the published TIFF/EXIF specs; no image
libraries exist in this container).

A 100 TB multimodal training pipeline needs this twice over:
1. EXTRACT — camera make/model/timestamps/orientation become filter
   and dedup keys (same-device burst detection, time-window joins);
2. REDACT — GPS coordinates in wild images are PII; stripping EXIF
   before training is a standard compliance gate, and it must not
   disturb the pixel data.

Covered: JPEG marker walk to APP1 ``Exif\\0\\0`` payloads; the TIFF
container inside (II/MM byte order, magic 42, chained IFDs); IFD
entries of types BYTE/ASCII/SHORT/LONG/RATIONAL/UNDEFINED/SLONG/
SRATIONAL with the inline-vs-offset value rule (≤4 bytes packs into
the entry); the Exif sub-IFD (tag 0x8769) and GPS IFD (0x8825);
GPS DMS→decimal conversion with hemisphere signs. Redaction drops
APPn/COM segments wholesale (the conservative PII stance — thumbnails
and maker notes can hide location data too) and is pinned to preserve
the entropy-coded stream byte-for-byte.

Spark surface: ``exif_extract`` (Arrow mapInPandas → typed metadata
columns) and ``strip_metadata`` (payload→payload, decode-preserving).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class ExifError(ValueError):
    """Typed EXIF/TIFF-structure error."""


#: TIFF value types -> (struct code, size); type 2 ASCII and 7
#: UNDEFINED handled as raw bytes
_TYPES = {1: ("B", 1), 2: (None, 1), 3: ("H", 2), 4: ("I", 4),
          5: (None, 8), 7: (None, 1), 9: ("i", 4), 10: (None, 8)}

_EXIF_IFD_TAG = 0x8769
_GPS_IFD_TAG = 0x8825


def _read_ifd(data: bytes, off: int, end: str) -> tuple[dict, int]:
    """One IFD at ``off`` -> ({tag: value}, next_ifd_offset). Values:
    ASCII -> str, RATIONAL(s) -> (num, den) tuple or list of tuples,
    scalars unwrapped from 1-element lists."""
    if off + 2 > len(data):
        raise ExifError("IFD offset beyond the TIFF payload")
    (n,) = struct.unpack_from(end + "H", data, off)
    entries = {}
    p = off + 2
    if p + 12 * n + 4 > len(data):
        raise ExifError("IFD entry table truncated")
    for _ in range(n):
        tag, typ, count = struct.unpack_from(end + "HHI", data, p)
        spec = _TYPES.get(typ)
        if spec is None:
            p += 12  # unknown type: skip the entry, stay robust
            continue
        code, size = spec
        total = size * count
        if total <= 4:
            voff = p + 8
        else:
            (voff,) = struct.unpack_from(end + "I", data, p + 8)
        if voff + total > len(data):
            raise ExifError(f"tag {tag:#06x} value overruns the payload")
        if typ == 2:
            val = data[voff:voff + count].split(b"\x00")[0].decode(
                "ascii", "replace"
            )
        elif typ == 7:
            val = data[voff:voff + count]
        elif typ in (5, 10):
            c = end + ("II" if typ == 5 else "ii")
            val = [struct.unpack_from(c, data, voff + 8 * i)
                   for i in range(count)]
            if count == 1:
                val = val[0]
        else:
            val = list(struct.unpack_from(end + code * count, data, voff))
            if count == 1:
                val = val[0]
        entries[tag] = val
        p += 12
    (nxt,) = struct.unpack_from(end + "I", data, p)
    return entries, nxt


def _walk_jpeg_app1(data: bytes) -> bytes | None:
    """The first APP1 Exif payload in a JPEG, or None."""
    if data[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG payload")
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ExifError(f"JPEG marker walk lost sync at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # scan / EOI: no EXIF past here
            return None
        if pos + 4 > len(data):
            raise ExifError("truncated segment header")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
            return data[pos + 10:pos + 2 + seglen]
        pos += 2 + seglen
    return None


def _rational(v) -> float | None:
    if not isinstance(v, tuple) or v[1] == 0:
        return None
    return v[0] / v[1]


def _dms(val, ref: str) -> float | None:
    """Three GPS RATIONALs + hemisphere ref -> signed decimal degrees."""
    if not isinstance(val, list) or len(val) != 3:
        return None
    parts = [_rational(v) for v in val]
    if any(p is None for p in parts):
        return None
    deg = parts[0] + parts[1] / 60 + parts[2] / 3600
    return -deg if ref in ("S", "W") else deg


def _walk_webp_exif(data: bytes) -> bytes | None:
    """The EXIF chunk payload of a VP8X-flagged WebP (container
    spec), or None. Some writers prefix the TIFF block with the JPEG
    'Exif\\x00\\x00' header — both layouts occur in the wild and both
    are handled."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ExifError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(data):
        cc = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise ExifError(f"WebP chunk {cc!r} truncated")
        if cc == b"EXIF":
            if body[:6] == b"Exif\x00\x00":
                body = body[6:]
            return body
        pos += 8 + clen + (clen & 1)
    return None


def parse_exif(data: bytes) -> dict:
    """Image bytes -> flat metadata dict (empty if no EXIF): make,
    model, orientation, datetime, datetime_original, iso,
    exposure_time, fnumber, focal_length, gps_lat, gps_lon,
    gps_altitude — missing fields absent. Dispatches on the payload
    magic: JPEG APP1 or a WebP EXIF chunk (r11 — the #2 web format
    carries the same TIFF-IFD block in its container)."""
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        tiff = _walk_webp_exif(data)
    else:
        tiff = _walk_jpeg_app1(data)
    if tiff is None:
        return {}
    if tiff[:2] == b"II":
        end = "<"
    elif tiff[:2] == b"MM":
        end = ">"
    else:
        raise ExifError(f"bad TIFF byte order {tiff[:2]!r}")
    (magic,) = struct.unpack_from(end + "H", tiff, 2)
    if magic != 42:
        raise ExifError(f"bad TIFF magic {magic}")
    (ifd0_off,) = struct.unpack_from(end + "I", tiff, 4)
    ifd0, _ = _read_ifd(tiff, ifd0_off, end)
    out: dict = {}
    if 0x010F in ifd0:
        out["make"] = ifd0[0x010F]
    if 0x0110 in ifd0:
        out["model"] = ifd0[0x0110]
    if 0x0112 in ifd0:
        out["orientation"] = int(ifd0[0x0112])
    if 0x0132 in ifd0:
        out["datetime"] = ifd0[0x0132]
    if _EXIF_IFD_TAG in ifd0:
        exif, _ = _read_ifd(tiff, int(ifd0[_EXIF_IFD_TAG]), end)
        if 0x9003 in exif:
            out["datetime_original"] = exif[0x9003]
        if 0x8827 in exif:
            v = exif[0x8827]
            out["iso"] = int(v[0] if isinstance(v, list) else v)
        for tag, name in ((0x829A, "exposure_time"), (0x829D, "fnumber"),
                          (0x920A, "focal_length")):
            if tag in exif:
                r = _rational(exif[tag])
                if r is not None:
                    out[name] = r
    if _GPS_IFD_TAG in ifd0:
        gps, _ = _read_ifd(tiff, int(ifd0[_GPS_IFD_TAG]), end)
        lat = _dms(gps.get(2), gps.get(1, ""))
        lon = _dms(gps.get(4), gps.get(3, ""))
        if lat is not None:
            out["gps_lat"] = lat
        if lon is not None:
            out["gps_lon"] = lon
        if 6 in gps:
            alt = _rational(gps[6])
            if alt is not None:
                out["gps_altitude"] = -alt if gps.get(5) == 1 else alt
    return out


def _strip_webp_metadata(data: bytes) -> bytes:
    """Drop EXIF/XMP /ICCP chunks from a WebP container; the image
    chunks (VP8/VP8L/ALPH/ANIM/ANMF) and VP8X pass through
    byte-for-byte with the VP8X metadata flag bits cleared — the
    decode is pinned unchanged."""
    out = bytearray()
    pos = 12
    while pos + 8 <= len(data):
        cc = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        end = pos + 8 + clen + (clen & 1)
        if pos + 8 + clen > len(data):
            raise ExifError(f"WebP chunk {cc!r} truncated")
        if cc not in (b"EXIF", b"XMP ", b"ICCP"):
            chunk = bytearray(data[pos:end])
            if cc == b"VP8X" and clen >= 1:
                chunk[8] &= ~0x2C  # clear ICC/EXIF/XMP flag bits
            out += chunk
        pos = end
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WEBP" + bytes(out)


def strip_metadata(data: bytes) -> bytes:
    """Drop every metadata segment from a JPEG (APPn/COM) or WebP
    (EXIF/XMP/ICCP chunks, r11) — the conservative PII redaction (GPS
    can hide in thumbnails and maker notes, so the whole metadata
    layer goes). The functional segments (DQT/DHT/SOF/SOS/DRI/DAC,
    restart markers, entropy data; WebP image chunks) pass through
    byte-for-byte, so the decode is pinned unchanged."""
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return _strip_webp_metadata(data)
    if data[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG or WebP payload")
    out = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ExifError(f"JPEG marker walk lost sync at {pos}")
        # T.81 B.1.1.2 fill bytes: 0xFF padding before the marker byte
        # is legal; the marker is the first non-0xFF. The padding is
        # dropped from the output (it carries nothing), which keeps the
        # functional segments and entropy stream byte-identical.
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            out += data[pos:pos + 2]
            pos += 2
            continue
        if marker == 0xDA:
            out += data[pos:]  # scan header + entropy data to EOI
            break
        if pos + 4 > len(data):
            raise ExifError("truncated segment header")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if not (0xE0 <= marker <= 0xEF or marker == 0xFE):
            out += data[pos:pos + 2 + seglen]
        pos += 2 + seglen
    return bytes(out)


EXIF_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("make", StringType()),
        StructField("model", StringType()),
        StructField("orientation", LongType()),
        StructField("datetime_original", StringType()),
        StructField("iso", LongType()),
        StructField("gps_lat", DoubleType()),
        StructField("gps_lon", DoubleType()),
        StructField("has_gps", BooleanType()),
    ]
)


def exif_extract(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> typed EXIF columns via Arrow
    mapInPandas; images without EXIF yield NULL fields and
    has_gps=false."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                m = parse_exif(bytes(raw))
                rows.append((
                    mid, m.get("make"), m.get("model"),
                    m.get("orientation"), m.get("datetime_original"),
                    m.get("iso"), m.get("gps_lat"), m.get("gps_lon"),
                    "gps_lat" in m or "gps_lon" in m,
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in EXIF_SCHEMA.fields]
            )

    return df.mapInPandas(batches, EXIF_SCHEMA)


def strip_metadata_df(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> (media_id, payload) with every APPn/COM
    segment removed — the distributed PII-redaction stage (Arrow
    mapInPandas, payload-to-payload, decode-preserving)."""
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (mid, bytearray(strip_metadata(bytes(raw))))
                for mid, raw in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return df.mapInPandas(batches, schema)


# --- writer (fixture generator) ----------------------------------------------


def encode_exif_app1(make: str | None = None, model: str | None = None,
                     orientation: int | None = None,
                     datetime_original: str | None = None,
                     iso: int | None = None,
                     gps: tuple | None = None,
                     byte_order: str = "<") -> bytes:
    """A real APP1 Exif segment (marker + length + TIFF IFD chain) —
    the fixture generator for :func:`parse_exif`. ``gps`` is
    (lat_ref, (d,m,s rationals), lon_ref, (d,m,s rationals)) with
    each rational a (num, den) pair."""
    end = byte_order
    if end not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")

    def build_ifd(entries: list[tuple], base: int) -> bytes:
        """entries: (tag, type, count, packed_value_or_data)."""
        n = len(entries)
        head = struct.pack(end + "H", n)
        table = b""
        extra = b""
        data_off = base + 2 + 12 * n + 4
        for tag, typ, count, payload in entries:
            if len(payload) <= 4:
                val = payload + bytes(4 - len(payload))
            else:
                val = struct.pack(end + "I", data_off + len(extra))
                extra += payload
            table += struct.pack(end + "HHI", tag, typ, count) + val
        return head + table + struct.pack(end + "I", 0) + extra

    def ascii_entry(tag, s):
        b = s.encode("ascii") + b"\x00"
        return (tag, 2, len(b), b)

    def rat(num, den):
        return struct.pack(end + "II", num, den)

    exif_entries = []
    if datetime_original:
        exif_entries.append(ascii_entry(0x9003, datetime_original))
    if iso is not None:
        exif_entries.append((0x8827, 3, 1, struct.pack(end + "H", iso)))
    gps_entries = []
    if gps:
        lat_ref, lat, lon_ref, lon = gps
        gps_entries = [
            ascii_entry(1, lat_ref),
            (2, 5, 3, b"".join(rat(*r) for r in lat)),
            ascii_entry(3, lon_ref),
            (4, 5, 3, b"".join(rat(*r) for r in lon)),
        ]
        gps_entries.sort(key=lambda e: e[0])

    ifd0_entries = []
    if make:
        ifd0_entries.append(ascii_entry(0x010F, make))
    if model:
        ifd0_entries.append(ascii_entry(0x0110, model))
    if orientation is not None:
        ifd0_entries.append(
            (0x0112, 3, 1, struct.pack(end + "H", orientation))
        )
    # sub-IFD pointers get patched once layout is known
    n0 = len(ifd0_entries) + (1 if exif_entries else 0) \
        + (1 if gps_entries else 0)
    ifd0_base = 8
    # size of IFD0 block incl. its extra data
    probe = build_ifd(
        ifd0_entries
        + ([(_EXIF_IFD_TAG, 4, 1, bytes(4))] if exif_entries else [])
        + ([(_GPS_IFD_TAG, 4, 1, bytes(4))] if gps_entries else []),
        ifd0_base,
    )
    exif_off = ifd0_base + len(probe)
    exif_blob = build_ifd(exif_entries, exif_off) if exif_entries else b""
    gps_off = exif_off + len(exif_blob)
    gps_blob = build_ifd(gps_entries, gps_off) if gps_entries else b""
    final_entries = list(ifd0_entries)
    if exif_entries:
        final_entries.append(
            (_EXIF_IFD_TAG, 4, 1, struct.pack(end + "I", exif_off))
        )
    if gps_entries:
        final_entries.append(
            (_GPS_IFD_TAG, 4, 1, struct.pack(end + "I", gps_off))
        )
    final_entries.sort(key=lambda e: e[0])
    ifd0 = build_ifd(final_entries, ifd0_base)
    assert len(ifd0) == len(probe), "IFD0 layout changed between passes"
    order = b"II" if end == "<" else b"MM"
    tiff = (order + struct.pack(end + "H", 42)
            + struct.pack(end + "I", ifd0_base) + ifd0
            + exif_blob + gps_blob)
    body = b"Exif\x00\x00" + tiff
    if len(body) + 2 > 0xFFFF:
        raise ValueError("EXIF segment too large")
    assert n0 == len(final_entries)
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI — how cameras lay out
    their files."""
    if jpeg[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]
