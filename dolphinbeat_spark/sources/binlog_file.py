"""Offline MySQL binlog FILE parser + replay source (from scratch).

Why this exists: the live socket path (sources/binlog_source.py) rides
``pymysqlreplication``, which this environment does not ship — so until
now every decode test drove duck-typed fakes. This module closes the
recorded-bytes gap with a real binary parser for the public binlog v4
FILE format (the bytes ``mysqlbinlog`` reads; MySQL internals manual,
"Binary Log Versions" / "Row Based Replication"; reference parity:
the reference's go-mysql dependency implements the same wire layout in
``replication/parser.go``). Everything the socket would deliver except
the network handshake is exercised on real bytes: event headers, CRC32
checksums, TABLE_MAP column metadata, ROWS v2 NULL bitmaps, multi-row
packing, packed temporals (DATETIME2/TIME2/TIMESTAMP2), NEWDECIMAL
base-10^9 packing, 2-byte VARCHAR lengths, UTF-8 charset decode, and
binary-JSONB payloads (decoded downstream via sources/mysql_jsonb).

It is also a real feature, not just a test shim: archived binlog files
are the standard CDC *backfill* medium (object-store retention outlives
server retention). ``binlog_file_provider`` plugs a directory of
recorded files into the SAME reader classes the live path uses —
LiveBinlogStreamReader driver-side or ArrowBinlogStreamReader
executor-side — so backfill replays through identical machinery and
offsets. At 100 TB scale each file parses independently (table-sharded
by the Arrow reader), and the format's per-event ``log_pos`` chaining
makes resume exact.

Column values surface with the Python types ``pymysqlreplication``
would produce (int/float/str/bytes/date/datetime/timedelta/Decimal),
positionally — column NAMES come from the engine's own schema registry
replaying the DDL recorded in the same file (the reference's design,
``schema/` tracking; pymysqlreplication instead queries the server's
information_schema, which an offline file cannot).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal
from pathlib import Path

BINLOG_MAGIC = b"\xfebin"

# event type codes (public enum Log_event_type)
EV_QUERY = 0x02
EV_ROTATE = 0x04
EV_FORMAT_DESCRIPTION = 0x0F
EV_XID = 0x10
EV_TABLE_MAP = 0x13
# v1 rows events (5.1-5.5 era archives): identical layout to v2 minus
# the extra-data block — still common in long-retention backfill sets
EV_WRITE_ROWS_V1 = 0x17
EV_UPDATE_ROWS_V1 = 0x18
EV_DELETE_ROWS_V1 = 0x19
EV_WRITE_ROWS_V2 = 0x1E
EV_UPDATE_ROWS_V2 = 0x1F
EV_DELETE_ROWS_V2 = 0x20
EV_GTID = 0x21
# MySQL 8 binlog_row_value_options=PARTIAL_JSON (WL#10570): UPDATE
# whose after-image may carry JSON *diffs* instead of full values
EV_PARTIAL_UPDATE_ROWS = 0x27
# MySQL 8.0.20+ binlog_transaction_compression (WL#3549): a whole
# transaction's events wrapped in one TLV-framed, optionally
# zstd-compressed payload
EV_TRANSACTION_PAYLOAD = 0x28
# gtid set executed BEFORE this file (5.6+; always first after the
# FDE) — the coordinate that makes an archived series resumability-
# checkable without the server's SHOW BINARY LOGS
EV_PREVIOUS_GTIDS = 0x23
EV_MARIADB_GTID = 0xA2  # MariaDB dialect: domain-server-seq
# MariaDB's PREVIOUS_GTIDS analog: the gtid state at file start
EV_MARIADB_GTID_LIST = 0xA3

# column type codes (public enum_field_types)
T_TINY, T_SHORT, T_LONG, T_FLOAT, T_DOUBLE = 1, 2, 3, 4, 5
T_LONGLONG, T_INT24, T_DATE, T_YEAR = 8, 9, 10, 13
T_VARCHAR, T_BIT = 15, 16
T_TIMESTAMP2, T_DATETIME2, T_TIME2 = 17, 18, 19
T_JSON, T_NEWDECIMAL = 245, 246
T_ENUM, T_SET = 247, 248
T_BLOB, T_VAR_STRING, T_STRING = 252, 253, 254
T_GEOMETRY = 255

#: bytes of TABLE_MAP metadata each column type carries
_META_LEN = {
    T_VARCHAR: 2, T_BIT: 2, T_NEWDECIMAL: 2, T_STRING: 2, T_VAR_STRING: 2,
    T_BLOB: 1, T_FLOAT: 1, T_DOUBLE: 1, T_JSON: 1, T_GEOMETRY: 1,
    T_TIMESTAMP2: 1, T_DATETIME2: 1, T_TIME2: 1,
}
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


class BinlogFormatError(ValueError):
    """Malformed binlog bytes (bad magic, truncated event, CRC mismatch)."""


# --- event objects, duck-typed for adapt_replication_event ------------------
# (dispatch there is by CLASS NAME; .packet.log_pos / .timestamp match
# the pymysqlreplication attribute shape)


class _Packet:
    __slots__ = ("log_pos",)

    def __init__(self, log_pos: int):
        self.log_pos = log_pos


class _Event:
    def __init__(self, timestamp: int, log_pos: int):
        self.timestamp = timestamp
        self.packet = _Packet(log_pos)


class RotateEvent(_Event):
    def __init__(self, ts, log_pos, next_binlog: str, position: int):
        super().__init__(ts, log_pos)
        self.next_binlog = next_binlog
        self.position = position


class GtidEvent(_Event):
    def __init__(self, ts, log_pos, gtid: str,
                 last_committed: int | None = None,
                 sequence_number: int | None = None):
        super().__init__(ts, log_pos)
        self.gtid = gtid
        # MySQL 5.7+ group-commit logical clock (None when the event
        # predates it or the dialect lacks it — MariaDB)
        self.last_committed = last_committed
        self.sequence_number = sequence_number


class QueryEvent(_Event):
    def __init__(self, ts, log_pos, schema: str, query: str):
        super().__init__(ts, log_pos)
        self.schema = schema
        self.query = query


class SchemaOnlyQueryEvent(QueryEvent):
    """A QueryEvent replayed from BELOW a seek offset purely to seed
    the schema registry: decode applies its DDL but emits no op (the
    envelope already carried it when the position was first read)."""


class PreviousGtidsEvent(_Event):
    """The gtid set executed before this file began (5.6+ writes one
    right after the FDE). Not an envelope op (adapt returns None for
    it) — it drives the archived-series resume helpers below."""

    def __init__(self, ts, log_pos, gtid_set: str):
        super().__init__(ts, log_pos)
        self.gtid_set = gtid_set


class XidEvent(_Event):
    def __init__(self, ts, log_pos, xid: int):
        super().__init__(ts, log_pos)
        self.xid = xid


class WriteRowsEvent(_Event):
    def __init__(self, ts, log_pos, schema, table, rows):
        super().__init__(ts, log_pos)
        self.schema, self.table = schema, table
        self.rows = [{"values": r} for r in rows]


class DeleteRowsEvent(_Event):
    def __init__(self, ts, log_pos, schema, table, rows):
        super().__init__(ts, log_pos)
        self.schema, self.table = schema, table
        self.rows = [{"values": r} for r in rows]


class UpdateRowsEvent(_Event):
    def __init__(self, ts, log_pos, schema, table, pairs):
        super().__init__(ts, log_pos)
        self.schema, self.table = schema, table
        self.rows = [{"before_values": b, "after_values": a} for b, a in pairs]


@dataclass
class _TableMap:
    schema: str
    table: str
    col_types: list
    col_metas: list


# --- low-level readers ------------------------------------------------------


def _lenenc(data: bytes, pos: int) -> tuple[int, int]:
    b = data[pos]
    if b < 0xFB:
        return b, pos + 1
    if b == 0xFC:
        return int.from_bytes(data[pos + 1:pos + 3], "little"), pos + 3
    if b == 0xFD:
        return int.from_bytes(data[pos + 1:pos + 4], "little"), pos + 4
    if b == 0xFE:
        return int.from_bytes(data[pos + 1:pos + 9], "little"), pos + 9
    raise BinlogFormatError(f"bad length-encoded integer prefix {b:#x}")


def _frac_micros(data: bytes, pos: int, fsp: int) -> tuple[int, int]:
    """Fractional-seconds part: ceil(fsp/2) big-endian bytes holding
    fsp decimal digits; scale to microseconds."""
    nb = (fsp + 1) // 2
    if nb == 0:
        return 0, pos
    frac = int.from_bytes(data[pos:pos + nb], "big")
    return frac * 10 ** (6 - 2 * nb), pos + nb


def _read_decimal(data: bytes, pos: int, precision: int, scale: int):
    """NEWDECIMAL: sign-flipped big-endian base-10^9 groups (public
    layout, strings/decimal.cc bin2decimal)."""
    intg = precision - scale
    intg0, frac0 = intg // 9, scale // 9
    intg0x, frac0x = intg - intg0 * 9, scale - frac0 * 9
    size = intg0 * 4 + _DIG2BYTES[intg0x] + frac0 * 4 + _DIG2BYTES[frac0x]
    buf = bytearray(data[pos:pos + size])
    if len(buf) != size:
        raise BinlogFormatError("truncated NEWDECIMAL value")
    negative = not (buf[0] & 0x80)
    buf[0] ^= 0x80
    if negative:
        buf = bytearray(b ^ 0xFF for b in buf)
    p = 0
    intpart = 0
    if intg0x:
        nb = _DIG2BYTES[intg0x]
        intpart = int.from_bytes(buf[p:p + nb], "big")
        p += nb
    for _ in range(intg0):
        intpart = intpart * 10**9 + int.from_bytes(buf[p:p + 4], "big")
        p += 4
    frac_digits = ""
    for _ in range(frac0):
        frac_digits += str(int.from_bytes(buf[p:p + 4], "big")).zfill(9)
        p += 4
    if frac0x:
        nb = _DIG2BYTES[frac0x]
        frac_digits += str(int.from_bytes(buf[p:p + nb], "big")).zfill(frac0x)
        p += nb
    text = ("-" if negative else "") + str(intpart)
    if scale:
        text += "." + frac_digits
    return Decimal(text), pos + size


def _read_value(data: bytes, pos: int, ctype: int, meta: int):
    """One non-NULL column value (signed reads, like pymysqlreplication
    without schema signedness hints; unsigned re-widening is the
    engine's D4 stage downstream)."""
    if ctype == T_TINY:
        return int.from_bytes(data[pos:pos + 1], "little", signed=True), pos + 1
    if ctype == T_SHORT:
        return int.from_bytes(data[pos:pos + 2], "little", signed=True), pos + 2
    if ctype == T_INT24:
        return int.from_bytes(data[pos:pos + 3], "little", signed=True), pos + 3
    if ctype == T_LONG:
        return int.from_bytes(data[pos:pos + 4], "little", signed=True), pos + 4
    if ctype == T_LONGLONG:
        return int.from_bytes(data[pos:pos + 8], "little", signed=True), pos + 8
    if ctype == T_FLOAT:
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if ctype == T_DOUBLE:
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if ctype == T_YEAR:
        v = data[pos]
        return (1900 + v if v else 0), pos + 1
    if ctype == T_DATE:
        v = int.from_bytes(data[pos:pos + 3], "little")
        if v == 0:
            return None, pos + 3  # zero-date sentinel, like the libraries
        return date(v >> 9, (v >> 5) & 0x0F, v & 0x1F), pos + 3
    if ctype == T_DATETIME2:
        fsp = meta
        intpart = int.from_bytes(data[pos:pos + 5], "big") - 0x8000000000
        pos += 5
        micros, pos = _frac_micros(data, pos, fsp)
        ymd = intpart >> 17
        ym = ymd >> 5
        hms = intpart & 0x1FFFF
        return (
            datetime(ym // 13, ym % 13, ymd & 0x1F,
                     hms >> 12, (hms >> 6) & 0x3F, hms & 0x3F, micros),
            pos,
        )
    if ctype == T_TIMESTAMP2:
        fsp = meta
        secs = int.from_bytes(data[pos:pos + 4], "big")
        pos += 4
        micros, pos = _frac_micros(data, pos, fsp)
        # naive UTC instant (deterministic; session tz handling is the
        # consumer's concern, mirroring the engine's UTC convention)
        dt = datetime.fromtimestamp(secs, tz=timezone.utc).replace(tzinfo=None)
        return dt.replace(microsecond=micros), pos
    if ctype == T_TIME2:
        # the (intpart, frac) ensemble is ONE sign-offset quantity over
        # 24 + 8*ceil(fsp/2) bits (MySQL internals "TIME encoding"):
        # non-negative stores offset + magnitude, negative stores
        # offset − magnitude — decoding the two parts separately
        # mis-reads every negative fractional TIME (the r6
        # NotImplementedError this replaces)
        fsp = meta
        nb = (fsp + 1) // 2
        width = 3 + nb
        raw = int.from_bytes(data[pos:pos + width], "big")
        pos += width
        signed = raw - (1 << (width * 8 - 1))
        sign = -1 if signed < 0 else 1
        mag = -signed if signed < 0 else signed
        frac = mag & ((1 << (8 * nb)) - 1) if nb else 0
        intpart = mag >> (8 * nb)
        micros = frac * 10 ** (6 - 2 * nb) if nb else 0
        td = timedelta(hours=(intpart >> 12) & 0x3FF, minutes=(intpart >> 6) & 0x3F,
                       seconds=intpart & 0x3F, microseconds=micros)
        return sign * td, pos
    if ctype == T_VARCHAR or ctype == T_VAR_STRING:
        if meta > 255:
            n = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:
            n = data[pos]
            pos += 1
        return data[pos:pos + n].decode("utf-8"), pos + n
    if ctype == T_STRING:
        # meta: (real_type, pack_length) — ENUM/SET ride this code too
        m0, m1 = meta >> 8, meta & 0xFF
        if m0 & 0x30 != 0x30:
            real, maxlen = m0 | 0x30, m1 | (((m0 & 0x30) ^ 0x30) << 4)
        else:
            real, maxlen = m0, m1
        if real == T_ENUM:
            # pack length (1 for <=255 labels, else 2), little-endian
            # 1-based label index; 0 = MySQL's invalid/empty member.
            # Surfaces as the raw index (the reference wire format,
            # sink/kafka/operation.go makeValue over go-mysql's int64);
            # the engine's decode stage maps index -> label via the
            # schema registry's column definition when known
            return int.from_bytes(data[pos:pos + maxlen], "little"), pos + maxlen
        if real == T_SET:
            # pack length 1..8 bytes, little-endian member bitmask
            return int.from_bytes(data[pos:pos + maxlen], "little"), pos + maxlen
        if maxlen > 255:
            n = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:
            n = data[pos]
            pos += 1
        return data[pos:pos + n].decode("utf-8"), pos + n
    if ctype == T_BIT:
        # TABLE_MAP meta bytes: (bits % 8, nbytes*8) packed little —
        # nbits = hi*8 + lo; value is big-endian over ceil(nbits/8)
        # bytes (public layout; pymysqlreplication column.py agrees)
        nbits = (meta >> 8) * 8 + (meta & 0xFF)
        nb = (nbits + 7) // 8
        return int.from_bytes(data[pos:pos + nb], "big"), pos + nb
    if ctype in (T_BLOB, T_GEOMETRY):
        # GEOMETRY rides the BLOB layout (pack-length meta + bytes);
        # the payload is SRID(4LE)+WKB, surfaced as raw bytes — the
        # reference maps it to bytes too (go-mysql []byte through
        # makeValue, sink/kafka/operation.go:158)
        n = int.from_bytes(data[pos:pos + meta], "little")
        pos += meta
        return bytes(data[pos:pos + n]), pos + n
    if ctype == T_JSON:
        n = int.from_bytes(data[pos:pos + meta], "little")
        pos += meta
        # raw binary-JSONB value (type byte + payload); the envelope
        # stringify decodes it via sources/mysql_jsonb per the schema
        # registry's json column tagging
        return bytes(data[pos:pos + n]), pos + n
    if ctype == T_NEWDECIMAL:
        return _read_decimal(data, pos, meta >> 8, meta & 0xFF)
    raise NotImplementedError(f"column type {ctype} not supported by the file parser")


class _Absent:
    """Sentinel for a column OMITTED from a row image — its present
    bit is cleared because the archive was written with
    binlog_row_image=MINIMAL (before = PK only, after = PK + changed)
    or NOBLOB (unchanged blob/text columns dropped). Distinct from
    SQL NULL: the column HAS a value on the server, the log just
    doesn't carry it. The envelope projection omits absent columns
    from the before/after maps entirely."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return "<absent>"


ABSENT = _Absent()


def _read_row_image(
    data: bytes, pos: int, tm: _TableMap, present: bytes | None = None
) -> tuple[tuple, int]:
    """One row image. ``present`` is the event's columns-present
    bitmap (None = all columns, the FULL row-image fast path). Per the
    MySQL rows-event layout, the null bitmap covers only the PRESENT
    columns — one bit per set present bit, indexed in present order —
    so MINIMAL/NOBLOB images are narrower than the TABLE_MAP width.
    Omitted columns decode as the ABSENT sentinel."""
    ncols = len(tm.col_types)
    if present is None:
        idx = range(ncols)
        npresent = ncols
    else:
        idx = [i for i in range(ncols) if present[i >> 3] & (1 << (i & 7))]
        npresent = len(idx)
    nb = (npresent + 7) // 8
    nullmap = data[pos:pos + nb]
    pos += nb
    vals: list = [ABSENT] * ncols
    for j, i in enumerate(idx):
        if nullmap[j >> 3] & (1 << (j & 7)):
            vals[i] = None
            continue
        v, pos = _read_value(data, pos, tm.col_types[i], tm.col_metas[i])
        vals[i] = v
    return tuple(vals), pos


# --- event-level parse ------------------------------------------------------


def _version_at_least(server_version: str, want: tuple) -> bool:
    """Parse the FDE's null-padded server-version string ("5.5.62-log",
    "8.0.32") into its leading numeric triple and compare."""
    import re

    m = re.match(r"(\d+)\.(\d+)\.(\d+)", server_version)
    if not m:
        return True  # unparseable → assume modern (trailer present)
    return tuple(int(g) for g in m.groups()) >= want


def _read_present(body: bytes, p: int, ncols: int) -> tuple[bytes | None, int]:
    """Consume a columns-present bitmap. Returns (None, p') when every
    bit is set (FULL row image — lets _read_row_image take the no-index
    fast path), else the bitmap itself (binlog_row_image=MINIMAL: before
    = PK columns only, after = PK + changed; NOBLOB: unchanged blob/text
    columns dropped). go-mysql's rows.go decodes the same way: values
    are indexed by the present bitmap, never positionally over the
    TABLE_MAP width."""
    nb = (ncols + 7) // 8
    bitmap = body[p:p + nb]
    full = all(
        bitmap[i >> 3] & (1 << (i & 7)) for i in range(ncols)
    )
    return (None if full else bytes(bitmap)), p + nb


def _present_or_raise(body: bytes, p: int, ncols: int, image: str) -> int:
    """Consume a columns-present bitmap, requiring a FULL row image —
    kept for the PARTIAL_UPDATE_ROWS path, whose partial-JSON bitmap
    indexing assumes the full column set (MINIMAL + PARTIAL_JSON in one
    event is not supported; fails loudly by name)."""
    bitmap, p2 = _read_present(body, p, ncols)
    if bitmap is not None:
        raise BinlogFormatError(
            f"PARTIAL_UPDATE_ROWS {image}-image omits columns "
            "(binlog_row_image=MINIMAL/NOBLOB combined with "
            "PARTIAL_JSON is not supported)"
        )
    return p2


#: WL#10570 row value_options bits — bit 0 = PARTIAL_JSON_UPDATES
_ROW_VALUE_OPTION_PARTIAL_JSON = 1

_JSON_DIFF_OPS = {0: "replace", 1: "insert", 2: "remove"}


def _read_json_diff(data: bytes, pos: int) -> tuple[dict, int]:
    """Partial-JSON after-image value (WL#10570): lenenc total length,
    then a sequence of diffs — op(1B: 0 replace / 1 insert / 2 remove),
    lenenc path, and (except remove) lenenc binary-JSONB value.

    Surfaces as ``{"$json_diff": [{"op","path","value"}...]}`` — an
    explicit diff marker, NOT a full value: a consumer that needs the
    materialized document must apply it to its own current image (the
    same contract MySQL replicas follow for PARTIAL_JSON binlogs)."""
    import json as _json

    from dolphinbeat_spark.sources.mysql_jsonb import decode_jsonb

    total, pos = _lenenc(data, pos)
    end = pos + total
    diffs = []
    while pos < end:
        op = data[pos]
        pos += 1
        if op not in _JSON_DIFF_OPS:
            raise BinlogFormatError(
                f"unknown JSON diff operation {op} in PARTIAL_JSON row image"
            )
        plen, pos = _lenenc(data, pos)
        path = data[pos:pos + plen].decode("utf-8")
        pos += plen
        entry = {"op": _JSON_DIFF_OPS[op], "path": path}
        if op != 2:  # remove carries no value
            vlen, pos = _lenenc(data, pos)
            entry["value"] = _json.loads(decode_jsonb(data[pos:pos + vlen]))
            pos += vlen
        diffs.append(entry)
    if pos != end:
        raise BinlogFormatError("JSON diff sequence overran its declared length")
    return {"$json_diff": diffs}, pos


def _read_row_image_partial(
    data: bytes, pos: int, tm: _TableMap, partial_json: bool
) -> tuple[tuple, int]:
    """After-image of a PARTIAL_UPDATE_ROWS event: when the row's
    value_options set PARTIAL_JSON, a partial-cols bitmap (one bit per
    JSON column) precedes the null bitmap, and flagged JSON columns
    hold diff sequences instead of full JSONB documents."""
    json_idx = [i for i, ct in enumerate(tm.col_types) if ct == T_JSON]
    partial_bits = b""
    if partial_json and json_idx:
        nb = (len(json_idx) + 7) // 8
        partial_bits = data[pos:pos + nb]
        pos += nb
    is_partial = {}
    for j, i in enumerate(json_idx):
        is_partial[i] = bool(partial_bits) and bool(
            partial_bits[j >> 3] & (1 << (j & 7))
        )
    ncols = len(tm.col_types)
    nullmap = data[pos:pos + (ncols + 7) // 8]
    pos += (ncols + 7) // 8
    vals = []
    for i, (ct, meta) in enumerate(zip(tm.col_types, tm.col_metas)):
        if nullmap[i >> 3] & (1 << (i & 7)):
            vals.append(None)
            continue
        if is_partial.get(i):
            v, pos = _read_json_diff(data, pos)
        else:
            v, pos = _read_value(data, pos, ct, meta)
        vals.append(v)
    return tuple(vals), pos


class BinlogEventDecoder:
    """Incremental event decoder: ONE event's raw bytes per call.

    The network replication stream (COM_BINLOG_DUMP) delivers exactly
    one event per packet with no file magic, so the cross-event state
    machine — the FDE's checksum-algorithm declaration and the
    TABLE_MAP registry rows events reference — lives here;
    :func:`parse_binlog_events` drives one instance over file bytes
    and ``sources/repl_client.py`` drives one over socket packets."""

    def __init__(self):
        self.checksum = 0  # set from the FDE
        self.tables: dict[int, _TableMap] = {}

    def feed(self, raw: bytes, at: int = 0) -> list:
        """``raw`` is one complete event (19-byte header + body).
        Returns the decoded duck-typed events — [] for bookkeeping
        types a CDC consumer ignores, several for TRANSACTION_PAYLOAD.
        ``at`` is a caller-side coordinate used only in messages."""
        if len(raw) < 19:
            raise BinlogFormatError(f"truncated event at offset {at}")
        ts, etype, _server_id, esize, log_pos, _flags = struct.unpack_from(
            "<IBIIIH", raw, 0
        )
        if esize < 19 or esize != len(raw):
            raise BinlogFormatError(f"truncated event at offset {at}")
        body = raw[19:]
        if etype == EV_FORMAT_DESCRIPTION:
            # trailer: [checksum_alg 1B][crc 4B] — written by 5.6.1+
            # servers only. A 5.1-5.5 archive (the ROWS v1 era this
            # parser also accepts) has NO trailer, so body[-5] there is
            # a post-header-length-table byte; gate on the declared
            # server version like go-mysql's parser does
            binlog_version = struct.unpack_from("<H", body, 0)[0]
            if binlog_version != 4:
                raise BinlogFormatError(
                    f"unsupported binlog version {binlog_version}")
            server_version = body[2:52].split(b"\x00", 1)[0].decode(
                "ascii", "replace")
            # MariaDB backported binlog checksums in 5.3, so a
            # "5.5.x-MariaDB" archive DOES carry the trailer even though
            # the numeric triple is pre-5.6.1 (ADVICE r7 finding)
            trailer_floor = (
                (5, 3, 0) if "-MariaDB" in server_version else (5, 6, 1)
            )
            self.checksum = (
                body[-5]
                if _version_at_least(server_version, trailer_floor)
                else 0
            )
            if self.checksum == 1:
                (crc,) = struct.unpack_from("<I", raw, esize - 4)
                if zlib.crc32(raw[: esize - 4]) & 0xFFFFFFFF != crc:
                    raise BinlogFormatError("FDE CRC mismatch")
            return []
        if self.checksum == 1:
            (crc,) = struct.unpack_from("<I", raw, esize - 4)
            if zlib.crc32(raw[: esize - 4]) & 0xFFFFFFFF != crc:
                raise BinlogFormatError(
                    f"event CRC mismatch at offset {at} (type {etype:#x})"
                )
            body = body[:-4]

        # any malformed body from here down must surface as the typed
        # BinlogFormatError (the loud-failure contract the fuzz test
        # pins) — reachable when the file was written without CRC32
        # (5.1-5.5, or binlog_checksum=NONE) so corruption has no
        # checksum to trip first
        try:
            if etype == EV_TRANSACTION_PAYLOAD:
                return _decode_transaction_payload(
                    body, ts, _server_id, log_pos, self.tables
                )
            ev = _decode_body(etype, ts, _server_id, log_pos, body,
                              self.tables)
            return [] if ev is None else [ev]
        except (BinlogFormatError, NotImplementedError):
            raise
        except Exception as ex:
            raise BinlogFormatError(
                f"malformed event body at offset {at} "
                f"(type {etype:#x}): {ex}"
            ) from ex


def parse_binlog_events(data: bytes):
    """Yield duck-typed events from the raw bytes of one binlog file.

    Validates the 4-byte magic and (when the FDE advertises CRC32)
    every event's checksum; maintains the TABLE_MAP registry the rows
    events reference. Unknown event types are skipped by size — the
    contract real replicas follow (a binlog contains many bookkeeping
    events a CDC consumer ignores)."""
    if data[:4] != BINLOG_MAGIC:
        raise BinlogFormatError("not a binlog file (bad magic)")
    pos = 4
    dec = BinlogEventDecoder()
    while pos + 19 <= len(data):
        esize = struct.unpack_from("<I", data, pos + 9)[0]
        if esize < 19 or pos + esize > len(data):
            raise BinlogFormatError(f"truncated event at offset {pos}")
        yield from dec.feed(data[pos:pos + esize], at=pos)
        pos += esize


# TRANSACTION_PAYLOAD TLV field types (WL#3549, public
# libbinlogevents/include/control_events.h)
_TPE_END_MARK = 0
_TPE_PAYLOAD_SIZE = 1
_TPE_COMPRESSION_TYPE = 2
_TPE_UNCOMPRESSED_SIZE = 3
_TPE_COMPRESS_ZSTD = 0
_TPE_COMPRESS_NONE = 255


def _decode_transaction_payload(body, ts, _server_id, log_pos, tables):
    """MySQL 8.0.20+ compressed-transaction wrapper: TLV header fields
    (each: lenenc type, lenenc length, value; numeric values are
    themselves lenenc) up to the end mark, then the payload — a
    concatenation of ordinary events WITHOUT per-event checksums
    (checksums apply to the outer event only). zstd payloads decode
    through the from-scratch RFC 8878 decoder in
    ``operators/zstd_frame.py`` (r9 — previously a named refusal)."""
    p = 0
    compression = _TPE_COMPRESS_NONE
    payload_size = None
    uncompressed_size = None
    while True:
        ftype, p = _lenenc(body, p)
        if ftype == _TPE_END_MARK:
            break
        flen, p = _lenenc(body, p)
        value = body[p:p + flen]
        p += flen
        if ftype == _TPE_PAYLOAD_SIZE:
            payload_size, _ = _lenenc(value, 0)
        elif ftype == _TPE_COMPRESSION_TYPE:
            compression, _ = _lenenc(value, 0)
        elif ftype == _TPE_UNCOMPRESSED_SIZE:
            uncompressed_size, _ = _lenenc(value, 0)
        # unknown field types are skipped by length (upstream contract)
    payload = body[p:p + payload_size] if payload_size is not None else body[p:]
    if compression == _TPE_COMPRESS_ZSTD:
        # from-scratch RFC 8878 decoder (operators/zstd_frame.py) — no
        # external package needed; the event's declared uncompressed
        # size caps the output so a hostile frame cannot balloon
        # executor memory
        from dolphinbeat_spark.operators.zstd_frame import ZstdError, decode_zstd

        try:
            payload = decode_zstd(
                payload,
                max_output=uncompressed_size
                if uncompressed_size is not None else None,
            )
        except ZstdError as ex:
            raise BinlogFormatError(
                f"malformed zstd transaction payload: {ex}"
            ) from ex
        if uncompressed_size is not None and len(payload) != uncompressed_size:
            raise BinlogFormatError(
                f"zstd payload decompressed to {len(payload)} bytes, "
                f"event declared {uncompressed_size}"
            )
    elif compression != _TPE_COMPRESS_NONE:
        raise BinlogFormatError(
            f"unknown transaction-payload compression type {compression}"
        )
    # inner events: plain v4 headers, no CRC trailer; real servers
    # write them with log_pos 0 (the transaction occupies ONE outer
    # position) — surface the outer coordinate so offset-based seek,
    # resume and ordering see the payload as a unit
    out = []
    ip = 0
    while ip + 19 <= len(payload):
        its, ietype, _isid, iesize, ilog_pos, _ = struct.unpack_from(
            "<IBIIIH", payload, ip
        )
        if iesize < 19 or ip + iesize > len(payload):
            raise BinlogFormatError("truncated event inside transaction payload")
        ibody = payload[ip + 19:ip + iesize]
        ip += iesize
        ev = _decode_body(ietype, its, _isid, ilog_pos or log_pos, ibody, tables)
        if ev is not None:
            if ev.packet.log_pos == 0:
                ev.packet.log_pos = log_pos
            out.append(ev)
    if ip != len(payload):
        raise BinlogFormatError("transaction payload has trailing bytes")
    return out


def _decode_body(etype, ts, _server_id, log_pos, body, tables):
    """Decode one post-CRC event body; returns the event or None (for
    TABLE_MAP, which mutates ``tables``, and skipped bookkeeping)."""
    if etype == EV_ROTATE:
        (position,) = struct.unpack_from("<Q", body, 0)
        return RotateEvent(ts, log_pos, body[8:].decode("utf-8"), position)
    elif etype == EV_GTID:
        # flags(1) sid(16) gno(8LE), then (5.7+) the group-commit
        # logical clock: lt_type(1)=2 (LOGICAL_TIMESTAMP_TYPECODE,
        # libbinlogevents control_events.h) + last_committed(8LE) +
        # sequence_number(8LE). Later 8.0 tail fields (immediate/
        # original commit timestamps, transaction_length) follow and
        # are ignored.
        sid = body[1:17]
        (gno,) = struct.unpack_from("<q", body, 17)
        uuid = "-".join(
            sid.hex()[a:b] for a, b in ((0, 8), (8, 12), (12, 16), (16, 20), (20, 32))
        )
        last_committed = sequence_number = None
        if len(body) >= 42 and body[25] == 2:
            last_committed, sequence_number = struct.unpack_from("<qq", body, 26)
        return GtidEvent(ts, log_pos, f"{uuid}:{gno}",
                         last_committed, sequence_number)
    elif etype == EV_QUERY:
        db_len = body[8]
        status_len = struct.unpack_from("<H", body, 11)[0]
        p = 13 + status_len
        schema = body[p:p + db_len].decode("utf-8")
        query = body[p + db_len + 1:].decode("utf-8")
        return QueryEvent(ts, log_pos, schema, query)
    elif etype == EV_XID:
        return XidEvent(ts, log_pos, struct.unpack_from("<Q", body, 0)[0])
    elif etype == EV_TABLE_MAP:
        table_id = int.from_bytes(body[0:6], "little")
        p = 8  # table_id(6) + flags(2)
        slen = body[p]
        schema = body[p + 1:p + 1 + slen].decode("utf-8")
        p += 2 + slen  # len + name + NUL
        tlen = body[p]
        table = body[p + 1:p + 1 + tlen].decode("utf-8")
        p += 2 + tlen
        ncols, p = _lenenc(body, p)
        ctypes = list(body[p:p + ncols])
        p += ncols
        mlen, p = _lenenc(body, p)
        mend = p + mlen
        metas = []
        for ct in ctypes:
            w = _META_LEN.get(ct, 0)
            if w == 0:
                metas.append(0)
            elif w == 1:
                metas.append(body[p])
                p += 1
            else:
                if ct in (T_VARCHAR, T_VAR_STRING, T_BIT):
                    metas.append(int.from_bytes(body[p:p + 2], "little"))
                else:  # STRING/NEWDECIMAL pack (hi, lo) big-endian-ish
                    metas.append((body[p] << 8) | body[p + 1])
                p += 2
        if p != mend:
            raise BinlogFormatError("TABLE_MAP metadata length mismatch")
        tables[table_id] = _TableMap(schema, table, ctypes, metas)
    elif etype == EV_MARIADB_GTID:
        # gno(8LE) domain(4LE) flags(1); gtid text form is
        # domain-server_id-seq (the dialect the offset algebra's
        # MariaDB branch consumes)
        (gno,) = struct.unpack_from("<Q", body, 0)
        (domain,) = struct.unpack_from("<I", body, 8)
        return GtidEvent(ts, log_pos, f"{domain}-{_server_id}-{gno}")
    elif etype == EV_MARIADB_GTID_LIST:
        # count(4LE, low 28 bits; high nibble = flags) then per gtid:
        # domain(4LE) server_id(4LE) seq(8LE); text form is the
        # MariaDB dialect the offset algebra consumes
        (count,) = struct.unpack_from("<I", body, 0)
        count &= (1 << 28) - 1
        parts = []
        p = 4
        for _ in range(count):
            domain, server, seq = struct.unpack_from("<IIQ", body, p)
            p += 16
            parts.append(f"{domain}-{server}-{seq}")
        return PreviousGtidsEvent(ts, log_pos, ",".join(parts))
    elif etype == EV_PREVIOUS_GTIDS:
        # encoded Gtid_set (public layout, rpl_gtid_set.cc encode):
        # n_sids(8LE), then per sid 16B uuid + n_intervals(8LE) +
        # intervals of (start 8LE, end-EXCLUSIVE 8LE)
        (n_sids,) = struct.unpack_from("<Q", body, 0)
        p = 8
        parts = []
        for _ in range(n_sids):
            sid = body[p:p + 16]
            p += 16
            uuid = "-".join(
                sid.hex()[a:b]
                for a, b in ((0, 8), (8, 12), (12, 16), (16, 20), (20, 32))
            )
            (n_iv,) = struct.unpack_from("<Q", body, p)
            p += 8
            ivs = []
            for _ in range(n_iv):
                start, end = struct.unpack_from("<QQ", body, p)
                p += 16
                ivs.append(str(start) if end == start + 1 else f"{start}-{end - 1}")
            parts.append(f"{uuid}:{':'.join(ivs)}")
        return PreviousGtidsEvent(ts, log_pos, ",".join(parts))
    elif etype in (
        EV_WRITE_ROWS_V2, EV_DELETE_ROWS_V2, EV_UPDATE_ROWS_V2,
        EV_WRITE_ROWS_V1, EV_DELETE_ROWS_V1, EV_UPDATE_ROWS_V1,
    ):
        table_id = int.from_bytes(body[0:6], "little")
        tm = tables.get(table_id)
        if tm is None:
            raise BinlogFormatError(f"rows event for unmapped table id {table_id}")
        p = 8
        if etype in (EV_WRITE_ROWS_V2, EV_DELETE_ROWS_V2, EV_UPDATE_ROWS_V2):
            extra_len = struct.unpack_from("<H", body, p)[0]
            p += extra_len  # includes its own 2 bytes
        ncols, p = _lenenc(body, p)
        if ncols != len(tm.col_types):
            raise BinlogFormatError("rows event width != TABLE_MAP width")
        present1, p = _read_present(body, p, ncols)
        if etype in (EV_UPDATE_ROWS_V2, EV_UPDATE_ROWS_V1):
            present2, p = _read_present(body, p, ncols)
            pairs = []
            while p < len(body):
                before, p = _read_row_image(body, p, tm, present1)
                after, p = _read_row_image(body, p, tm, present2)
                pairs.append((before, after))
            return UpdateRowsEvent(ts, log_pos, tm.schema, tm.table, pairs)
        else:
            rows = []
            while p < len(body):
                row, p = _read_row_image(body, p, tm, present1)
                rows.append(row)
            cls = (
                WriteRowsEvent
                if etype in (EV_WRITE_ROWS_V2, EV_WRITE_ROWS_V1)
                else DeleteRowsEvent
            )
            return cls(ts, log_pos, tm.schema, tm.table, rows)
    elif etype == EV_PARTIAL_UPDATE_ROWS:
        # WL#10570: UPDATE written under binlog_row_value_options=
        # PARTIAL_JSON. Before-images are ordinary; each after-image
        # is preceded by a lenenc value_options — bit 0 flags that
        # JSON columns may carry diff sequences (surfaced as
        # {"$json_diff": [...]}); any other bit is from a future
        # server and fails loudly by option name
        table_id = int.from_bytes(body[0:6], "little")
        tm = tables.get(table_id)
        if tm is None:
            raise BinlogFormatError(f"rows event for unmapped table id {table_id}")
        p = 8
        extra_len = struct.unpack_from("<H", body, p)[0]
        p += extra_len
        ncols, p = _lenenc(body, p)
        if ncols != len(tm.col_types):
            raise BinlogFormatError("rows event width != TABLE_MAP width")
        p = _present_or_raise(body, p, ncols, "before")
        p = _present_or_raise(body, p, ncols, "after")
        pairs = []
        while p < len(body):
            before, p = _read_row_image(body, p, tm)
            value_options, p = _lenenc(body, p)
            if value_options & ~_ROW_VALUE_OPTION_PARTIAL_JSON:
                raise BinlogFormatError(
                    f"unsupported binlog_row_value_options bits {value_options:#x} "
                    "in PARTIAL_UPDATE_ROWS event (only PARTIAL_JSON is known)"
                )
            after, p = _read_row_image_partial(
                body, p, tm, bool(value_options & _ROW_VALUE_OPTION_PARTIAL_JSON)
            )
            pairs.append((before, after))
        return UpdateRowsEvent(ts, log_pos, tm.schema, tm.table, pairs)
    # else: bookkeeping event types (PREVIOUS_GTIDS, ANONYMOUS_GTID,
    # HEARTBEAT, ...) — skipped by size, like real consumers
    return None


# --- replay provider: recorded files through the live reader classes --------


def binlog_file_provider(options: dict):
    """Provider for the binlog reader classes: (factory, latest) over
    recorded binlog bytes at ``binlog_file_path`` — one file, or a
    DIRECTORY holding an archived series (files replay in lexical
    order, the binlog naming convention). The log is immutable, so a
    factory seek is a filtered replay — the exact contract the
    scripted fake documents — and `latest` is the series' last event
    coordinate (availableNow drains everything in one batch).

    Series semantics: each archive normally ends with the rotate to
    its successor (servers write one), so log_name tracking flips
    naturally; a file missing its tail rotate (server crash) gets a
    synthetic one injected. A seek into file N replays files < N and
    the head of N schema-only (QueryEvents wrapped apply-only), so a
    resumed batch still decodes with the full DDL history's column
    names."""
    path = Path(options["binlog_file_path"])

    def _paths() -> list[Path]:
        if path.is_dir():
            files = sorted(p for p in path.iterdir() if p.is_file())
            if not files:
                raise FileNotFoundError(f"no binlog files in {path}")
            return files
        return [path]

    first_name = options.get("file") or _paths()[0].name

    def _events():
        """(file_name, event) across the series, synthetic rotates
        stitched between files that lack their tail rotate."""
        paths = _paths()
        out = []
        for i, p in enumerate(paths):
            data = p.read_bytes()
            evs = list(parse_binlog_events(data))
            out += [(p.name, e) for e in evs]
            if i + 1 < len(paths) and not (
                evs and isinstance(evs[-1], RotateEvent)
            ):
                out.append(
                    (p.name, RotateEvent(0, len(data), paths[i + 1].name, 4))
                )
        return out

    def factory(offset):
        off_file = offset.file
        # compat: a checkpoint written with a configured options['file']
        # alias that is NOT an on-disk name would compare lexically
        # against real file names and replay or skip events — map the
        # alias to the first series file instead (ADVICE r7)
        alias = options.get("file")
        if (
            off_file
            and alias
            and off_file == alias
            and off_file not in {p.name for p in _paths()}
        ):
            paths = _paths()
            off_file = paths[0].name
            if len(paths) > 1:
                # the remap can only anchor to the FIRST series file: a
                # checkpoint taken while reading a LATER file replays
                # every later-file event (safe direction, at-least-once
                # — but diagnosable duplicates, ADVICE r8)
                import warnings

                warnings.warn(
                    f"alias checkpoint file={alias!r} remapped to first "
                    f"series file {off_file!r} of a {len(paths)}-file "
                    "series: events from later files at-or-before the "
                    "checkpoint will replay (at-least-once)",
                    RuntimeWarning,
                    stacklevel=2,
                )
        start_key = (off_file, offset.pos) if off_file else ("", 0)
        fresh = not offset.file or offset.pos <= 4
        out = []
        for fname, e in _events():
            if (fname, e.packet.log_pos) > start_key or (
                fresh and isinstance(e, RotateEvent)
            ):
                out.append(e)
            elif isinstance(e, QueryEvent):
                # at/below the seek: replay DDL apply-only (registry
                # mutation, no re-emission) — without it a resumed
                # executor decodes rows with positional col_0..N names
                out.append(
                    SchemaOnlyQueryEvent(
                        e.timestamp, e.packet.log_pos, e.schema, e.query
                    )
                )
        return iter(out)

    def latest(opts: dict) -> dict:
        from dolphinbeat_spark.sources.binlog_source import BinlogOffset

        # default: a valid series holding only FDE/bookkeeping events
        # yields no parsed events — plan an empty batch at the
        # post-magic head position instead of raising from max()
        last_file, last_pos = max(
            ((f, e.packet.log_pos) for f, e in _events()),
            default=(first_name, 4),
        )
        return BinlogOffset(
            file=last_file, pos=last_pos, server_id=int(opts.get("server_id", "0"))
        ).to_json()

    return factory, latest


BINLOG_FILE_SOURCE_NAME = "dolphinbeat_binlog_file"


def register_binlog_file_source(spark) -> None:
    """Streaming DataSource over a recorded binlog file: the CDC
    backfill path. Options: ``binlog_file_path`` (required), plus the
    shared reader options (max_ops_per_batch, shard_count, ...)."""
    from pyspark.sql.datasource import DataSource

    from dolphinbeat_spark.envelope import ENVELOPE_SCHEMA
    from dolphinbeat_spark.sources.binlog_source import ArrowBinlogStreamReader

    class BinlogFileDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return BINLOG_FILE_SOURCE_NAME

        def schema(self):
            return ENVELOPE_SCHEMA

        def streamReader(self, schema):
            opts = dict(self.options)
            opts.setdefault(
                "provider", "dolphinbeat_spark.sources.binlog_file:binlog_file_provider"
            )
            return ArrowBinlogStreamReader(opts)

    spark.dataSource.register(BinlogFileDataSource)


# --- batch backfill: a DIRECTORY of archived binlog files -------------------


def read_binlog_files(spark, path: str, schema_snapshot_json: str = ""):
    """Batch-decode archived binlog files into the envelope schema —
    the 100 TB backfill shape: unlike the streaming readers (one
    ordered stream, table shards that each re-scan the log), archived
    files are independent units, so decode parallelizes PER FILE with
    zero redundancy — N files saturate min(N, cores) executors, and
    Spark's binaryFile source handles listing/distribution.

    Each file decodes with its own registry (seeded from
    ``schema_snapshot_json`` when given, else from the DDL recorded in
    the file itself) and emits rows ordered by its event stream;
    ``log_name`` carries the file's basename, so the total CDC order
    (log_name, log_pos, row_index) reconstructs across files from the
    binlog naming convention (lexically increasing). Memory note: one
    file materializes per task (binaryFile contract) — binlog files
    are bounded by the server's max_binlog_size (1 GiB default), which
    is the per-task budget to plan for."""
    from pathlib import PurePosixPath

    import pandas as pd

    from dolphinbeat_spark.envelope import ENVELOPE_SCHEMA
    from dolphinbeat_spark.schema.registry import SchemaRegistry
    from dolphinbeat_spark.sources.binlog_source import (
        DecodeContext,
        adapt_replication_event,
        decode_event,
    )

    names = [f.name for f in ENVELOPE_SCHEMA.fields]

    def batches(it):
        for pdf in it:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                registry = (
                    SchemaRegistry.loads(schema_snapshot_json)
                    if schema_snapshot_json
                    else SchemaRegistry()
                )
                ctx = DecodeContext(
                    registry=registry,
                    log_name=PurePosixPath(str(fpath)).name,
                )
                cols: dict[str, list] = {n: [] for n in names}
                for raw in parse_binlog_events(bytes(content)):
                    ev = adapt_replication_event(raw)
                    if ev is None:
                        continue
                    for op in decode_event(ev, ctx):
                        get = op.get
                        for n in names:
                            cols[n].append(get(n))
                if cols["op_type"]:
                    yield pd.DataFrame(cols)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(batches, ENVELOPE_SCHEMA)


# --- archived-series resumability (S5's retention check, file route) --------


def series_start_points(path: str) -> list[tuple[str, str | None]]:
    """(file_name, previous_gtid_set) per archived file in lexical
    order — the PREVIOUS_GTIDS coordinate 5.6+ servers write after
    every FDE. None for pre-5.6 files (no such event)."""
    p = Path(path)
    files = sorted(f for f in p.iterdir() if f.is_file()) if p.is_dir() else [p]
    out = []
    for f in files:
        prev = None
        for e in parse_binlog_events(f.read_bytes()):
            if isinstance(e, PreviousGtidsEvent):
                prev = e.gtid_set
                break
            if not isinstance(e, (RotateEvent,)):
                break  # data began with no PREVIOUS_GTIDS: pre-5.6 file
        out.append((f.name, prev))
    return out


def series_resume_file(path: str, executed_gtid_set: str) -> str | None:
    """Where to resume an archived series given a consumer's executed
    gtid set: the LAST file whose PREVIOUS_GTIDS is fully covered by
    ``executed_gtid_set`` (everything before it is already applied;
    replay from its head, deduping via resume/seq discipline like any
    replay). None when even the first file starts past the consumer's
    position — the gap case where the retention window has moved on and
    the right action is a fresh snapshot, the file-route analog of
    ``offset_is_resumable`` returning False."""
    from dolphinbeat_spark.sources.binlog_source import gtid_set_covers

    best = None
    for name, prev in series_start_points(path):
        if prev is None:
            # pre-5.6 file: no gtid coordinate — coverage past this
            # point is UNVERIFIABLE, so stop extending rather than
            # skip ahead (skipping could overshoot data the consumer
            # has not applied)
            break
        if gtid_set_covers(executed_gtid_set, prev):
            best = name
        else:
            break  # later files start even further ahead
    return best
