"""Build the recorded-binlog replay fixture (tests/fixtures/replay.binlog).

Writes a format-faithful MySQL binlog v4 FILE byte-by-byte per the
public layout (magic, CRC32-checksummed events, FDE trailer, TABLE_MAP
column metadata, ROWS v2 bitmaps, packed temporals, NEWDECIMAL
packing) — the bytes a real server would have produced for this DDL +
DML sequence. The committed fixture is parsed by the from-scratch
reader in sources/binlog_file.py; re-run this tool only to regenerate
after a deliberate fixture change (goldens in
tests/test_binlog_file_replay.py pin the decoded output).

Deliberately exercised: multi-row events, NULL bitmaps, 1- and 2-byte
VARCHAR lengths, UTF-8 multibyte text, binary BLOB bytes, binary-JSONB
payloads, DECIMAL sign/scale, DATETIME2 fractional seconds, TIME2,
TIMESTAMP2, YEAR, CHAR-as-STRING metadata, UPDATE before/after images.
"""

from __future__ import annotations

import struct
import sys
import zlib
from datetime import date, datetime, timedelta
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dolphinbeat_spark.sources import binlog_file as B  # noqa: E402

TS = 1_700_000_000
SERVER_ID = 33061
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def enc_decimal(v: Decimal, precision: int, scale: int) -> bytes:
    sign, _digits, _exp = v.as_tuple()
    # normalize into intg/frac digit strings at the declared scale.
    # copy_abs(), NOT abs(): abs is context arithmetic and silently
    # rounds to the default 28 significant digits — a 29-digit
    # DECIMAL(29,0) lost its last digit (caught by the hypothesis
    # roundtrip test); copy_abs is the exact, context-free form
    s = format(v.copy_abs(), "f")
    if "." in s:
        ip, fp = s.split(".")
    else:
        ip, fp = s, ""
    fp = (fp + "0" * scale)[:scale]
    intg = precision - scale
    ip = ip.zfill(intg)
    intg0, frac0 = intg // 9, scale // 9
    intg0x, frac0x = intg - intg0 * 9, scale - frac0 * 9
    out = bytearray()
    p = 0
    if intg0x:
        out += int(ip[:intg0x]).to_bytes(_DIG2BYTES[intg0x], "big")
        p = intg0x
    for _ in range(intg0):
        out += int(ip[p:p + 9]).to_bytes(4, "big")
        p += 9
    p = 0
    for _ in range(frac0):
        out += int(fp[p:p + 9]).to_bytes(4, "big")
        p += 9
    if frac0x:
        out += int(fp[p:p + frac0x]).to_bytes(_DIG2BYTES[frac0x], "big")
    out[0] ^= 0x80
    if sign:
        out = bytearray(b ^ 0xFF for b in out)
    return bytes(out)


def enc_value(ctype: int, meta: int, v) -> bytes:
    if v is None:
        raise ValueError("NULL rides the bitmap, not the value stream")
    if ctype == B.T_TINY:
        return int(v).to_bytes(1, "little", signed=True)
    if ctype == B.T_SHORT:
        return int(v).to_bytes(2, "little", signed=True)
    if ctype == B.T_LONG:
        return int(v).to_bytes(4, "little", signed=True)
    if ctype == B.T_LONGLONG:
        return int(v).to_bytes(8, "little", signed=True)
    if ctype == B.T_FLOAT:
        return struct.pack("<f", v)
    if ctype == B.T_DOUBLE:
        return struct.pack("<d", v)
    if ctype == B.T_YEAR:
        return bytes([0 if v == 0 else v - 1900])
    if ctype == B.T_DATE:
        return ((v.year << 9) | (v.month << 5) | v.day).to_bytes(3, "little")
    if ctype == B.T_DATETIME2:
        fsp = meta
        ymd = ((v.year * 13 + v.month) << 5) | v.day
        hms = (v.hour << 12) | (v.minute << 6) | v.second
        out = (0x8000000000 + ((ymd << 17) | hms)).to_bytes(5, "big")
        nb = (fsp + 1) // 2
        if nb:
            out += (v.microsecond // 10 ** (6 - 2 * nb)).to_bytes(nb, "big")
        return out
    if ctype == B.T_TIMESTAMP2:
        fsp = meta
        out = int(v).to_bytes(4, "big")  # epoch seconds
        nb = (fsp + 1) // 2
        if nb:
            out += bytes(nb)
        return out
    if ctype == B.T_TIME2:
        fsp = meta
        nb = (fsp + 1) // 2
        width = 3 + nb
        sign = 1 if v >= type(v)() else -1
        a = v if sign > 0 else -v
        secs = a.days * 86400 + a.seconds
        frac = a.microseconds // 10 ** (6 - 2 * nb) if nb else 0
        intpart = ((secs // 3600) << 12) | ((secs // 60 % 60) << 6) | (secs % 60)
        mag = (intpart << (8 * nb)) | frac
        return ((1 << (width * 8 - 1)) + sign * mag).to_bytes(width, "big")
    if ctype in (B.T_VARCHAR, B.T_VAR_STRING):
        raw = v.encode("utf-8")
        n = len(raw).to_bytes(2 if meta > 255 else 1, "little")
        return n + raw
    if ctype == B.T_STRING:
        real, size = meta >> 8, meta & 0xFF
        if real in (B.T_ENUM, B.T_SET):
            # ENUM: 1-based label index; SET: member bitmask — both
            # little-endian over the declared pack length
            return int(v).to_bytes(size, "little")
        raw = v.encode("utf-8")
        return len(raw).to_bytes(2 if size > 255 else 1, "little") + raw
    if ctype == B.T_BIT:
        nbits = (meta >> 8) * 8 + (meta & 0xFF)
        return int(v).to_bytes((nbits + 7) // 8, "big")
    if ctype in (B.T_BLOB, B.T_GEOMETRY):
        return len(v).to_bytes(meta, "little") + bytes(v)
    if ctype == B.T_JSON:
        return len(v).to_bytes(meta, "little") + bytes(v)
    if ctype == B.T_NEWDECIMAL:
        return enc_decimal(v, meta >> 8, meta & 0xFF)
    raise ValueError(f"no encoder for type {ctype}")


class Writer:
    def __init__(self):
        self.buf = bytearray(B.BINLOG_MAGIC)
        self.pos = 4

    def event(self, etype: int, body: bytes) -> None:
        esize = 19 + len(body) + 4  # header + body + CRC32
        self.pos += esize
        hdr = struct.pack("<IBIIIH", TS, etype, SERVER_ID, esize, self.pos, 0)
        ev = hdr + body
        self.buf += ev + (zlib.crc32(ev) & 0xFFFFFFFF).to_bytes(4, "little")

    def fde(self, server_version: str = "8.0.99-dolphinbeat-fixture") -> None:
        sv = server_version.encode().ljust(50, b"\x00")
        # post-header length table (one byte per event type, standard
        # 8.0 values for the types we write; zeros elsewhere)
        ph = bytearray(41)
        ph[B.EV_QUERY - 1] = 13
        ph[B.EV_ROTATE - 1] = 8
        ph[B.EV_FORMAT_DESCRIPTION - 1] = 84 + len(ph) - 78
        ph[B.EV_TABLE_MAP - 1] = 8
        ph[B.EV_WRITE_ROWS_V2 - 1] = 10
        ph[B.EV_UPDATE_ROWS_V2 - 1] = 10
        ph[B.EV_DELETE_ROWS_V2 - 1] = 10
        ph[B.EV_PARTIAL_UPDATE_ROWS - 1] = 10
        body = struct.pack("<H", 4) + sv + struct.pack("<I", TS) + bytes([19])
        body += bytes(ph) + bytes([1])  # checksum_alg = CRC32
        self.event(B.EV_FORMAT_DESCRIPTION, body)

    def query(self, db: str, sql: str) -> None:
        dbb, q = db.encode(), sql.encode()
        body = struct.pack("<IIBHH", 7, 0, len(dbb), 0, 0) + dbb + b"\x00" + q
        self.event(B.EV_QUERY, body)

    def gtid(self, sid_hex: str, gno: int,
             last_committed: int | None = None,
             sequence_number: int | None = None) -> None:
        """GTID event; pass both clock args to append the 5.7+ logical
        timestamp block (lt_type=2 + last_committed + sequence_number).
        Existing fixtures omit it — their bytes stay identical."""
        body = bytes([1]) + bytes.fromhex(sid_hex) + struct.pack("<q", gno)
        if last_committed is not None and sequence_number is not None:
            body += bytes([2]) + struct.pack("<qq", last_committed, sequence_number)
        self.event(B.EV_GTID, body)

    def previous_gtids(self, parts: list | None = None) -> None:
        """Encoded Gtid_set: [(sid_hex, [(start, end_inclusive)...])].
        5.6+ servers write one right after every FDE; empty list = the
        fresh-server first file."""
        parts = parts or []
        body = struct.pack("<Q", len(parts))
        for sid_hex, intervals in parts:
            body += bytes.fromhex(sid_hex) + struct.pack("<Q", len(intervals))
            for start, end in intervals:
                body += struct.pack("<QQ", start, end + 1)  # wire end is exclusive
        self.event(B.EV_PREVIOUS_GTIDS, body)

    def xid(self, n: int) -> None:
        self.event(B.EV_XID, struct.pack("<Q", n))

    def table_map(self, table_id: int, db: str, tbl: str, cols) -> None:
        body = table_id.to_bytes(6, "little") + b"\x01\x00"
        body += bytes([len(db)]) + db.encode() + b"\x00"
        body += bytes([len(tbl)]) + tbl.encode() + b"\x00"
        body += bytes([len(cols)]) + bytes(ct for ct, _ in cols)
        metas = bytearray()
        for ct, meta in cols:
            w = B._META_LEN.get(ct, 0)
            if w == 1:
                metas.append(meta)
            elif w == 2:
                if ct in (B.T_VARCHAR, B.T_VAR_STRING, B.T_BIT):
                    metas += int(meta).to_bytes(2, "little")
                else:
                    metas += bytes([meta >> 8, meta & 0xFF])
        body += bytes([len(metas)]) + bytes(metas)
        body += bytes((len(cols) + 7) // 8)  # nullability bitmap (all nullable=0)
        self.event(B.EV_TABLE_MAP, body)

    def _image(self, cols, row, present=None) -> bytes:
        """One row image. ``present`` (list[bool] or None=all) selects
        which columns the image carries — per the rows-event layout the
        null bitmap covers only the PRESENT columns, and absent
        columns' values are skipped entirely (binlog_row_image=
        MINIMAL/NOBLOB)."""
        idx = [
            i for i in range(len(cols)) if present is None or present[i]
        ]
        nullmap = bytearray((len(idx) + 7) // 8)
        vals = bytearray()
        for j, i in enumerate(idx):
            ct, meta = cols[i]
            v = row[i]
            if v is None:
                nullmap[j >> 3] |= 1 << (j & 7)
            else:
                vals += enc_value(ct, meta, v)
        return bytes(nullmap) + bytes(vals)

    @staticmethod
    def _present_bitmap(n: int, present=None) -> bytes:
        if present is None:
            # 0xFF-padded like real servers (and the committed fixture)
            return bytes([0xFF] * ((n + 7) // 8))
        b = bytearray((n + 7) // 8)
        for i, flag in enumerate(present):
            if flag:
                b[i >> 3] |= 1 << (i & 7)
        return bytes(b)

    def rows(
        self, etype: int, table_id: int, cols, rows,
        present=None, present_after=None,
    ) -> None:
        """``present`` narrows the (before-)image columns, and for
        updates ``present_after`` the after-image — how MINIMAL
        (before = PK only, after = PK + changed) and NOBLOB archives
        are written."""
        n = len(cols)
        body = table_id.to_bytes(6, "little") + b"\x01\x00"
        body += struct.pack("<H", 2)  # extra_data_len (just itself)
        body += bytes([n])  # lenenc width (< 251)
        body += self._present_bitmap(n, present)
        if etype == B.EV_UPDATE_ROWS_V2:
            body += self._present_bitmap(n, present_after)
            for before, after in rows:
                body += self._image(cols, before, present)
                body += self._image(cols, after, present_after)
        else:
            for row in rows:
                body += self._image(cols, row, present)
        self.event(etype, body)

    def partial_update_rows(self, table_id: int, cols, rows) -> None:
        """PARTIAL_UPDATE_ROWS (WL#10570): ``rows`` is a list of
        (before_tuple, after_tuple, partial) where ``partial`` maps
        column index -> encoded diff-sequence bytes (see json_diff) for
        JSON columns carried as diffs; empty/None partial writes the
        row with value_options=0 (full after-image)."""
        n = len(cols)
        json_idx = [i for i, (ct, _) in enumerate(cols) if ct == B.T_JSON]
        body = table_id.to_bytes(6, "little") + b"\x01\x00"
        body += struct.pack("<H", 2)
        body += bytes([n])
        present = bytes([0xFF] * ((n + 7) // 8))
        body += present + present
        for before, after, partial in rows:
            body += self._image(cols, before)
            if partial:
                body += bytes([1])  # value_options: PARTIAL_JSON
                pbits = bytearray((len(json_idx) + 7) // 8)
                for j, i in enumerate(json_idx):
                    if i in partial:
                        pbits[j >> 3] |= 1 << (j & 7)
                body += bytes(pbits)
                # after image with diff bytes substituted in place of
                # the flagged JSON columns' full values
                nullmap = bytearray((n + 7) // 8)
                vals = bytearray()
                for i, ((ct, meta), v) in enumerate(zip(cols, after)):
                    if i in partial:
                        vals += partial[i]
                    elif v is None:
                        nullmap[i >> 3] |= 1 << (i & 7)
                    else:
                        vals += enc_value(ct, meta, v)
                body += bytes(nullmap) + bytes(vals)
            else:
                body += bytes([0])  # value_options: none → plain image
                body += self._image(cols, after)
        self.event(B.EV_PARTIAL_UPDATE_ROWS, body)

    def transaction_payload(self, inner: bytes, compress: bool = False) -> None:
        """TRANSACTION_PAYLOAD (WL#3549): ``inner`` is a concatenation
        of checksum-less inner events (build with inner_event). TLV
        header: payload size, compression type, uncompressed size,
        end mark — then the payload."""
        comp_type = 0 if compress else 255  # ZSTD / NONE
        payload = inner
        if compress:
            # prefer the reference implementation (system zstd CLI) so
            # the committed fixture carries REAL compressed blocks;
            # fall back to the in-repo store-mode writer (still a
            # valid zstd frame) when the CLI is absent
            import shutil as _sh
            import subprocess as _sp

            cli = _sh.which("zstd")
            if cli:
                payload = _sp.run(
                    [cli, "-19", "-c"], input=inner,
                    capture_output=True, check=True,
                ).stdout
            else:
                from dolphinbeat_spark.operators.zstd_frame import (
                    encode_zstd_store,
                )

                payload = encode_zstd_store(inner)
        body = bytearray()
        for ftype, val in (
            (1, len(payload)), (2, comp_type), (3, len(inner)),
        ):
            enc = lenenc(val)
            body += lenenc(ftype) + lenenc(len(enc)) + enc
        body += lenenc(0)  # header end mark
        body += payload
        self.event(B.EV_TRANSACTION_PAYLOAD, bytes(body))

    def rotate(self, next_name: str, position: int = 4) -> None:
        self.event(B.EV_ROTATE, struct.pack("<Q", position) + next_name.encode())


def inner_event(etype: int, body: bytes, log_pos: int = 0) -> bytes:
    """One checksum-less event frame for a transaction payload (real
    servers write inner events with log_pos 0 — the transaction
    occupies a single outer position)."""
    hdr = struct.pack("<IBIIIH", TS, etype, SERVER_ID, 19 + len(body), log_pos, 0)
    return hdr + body


def inner_query(db: str, sql: str) -> bytes:
    dbb, q = db.encode(), sql.encode()
    return inner_event(
        B.EV_QUERY,
        struct.pack("<IIBHH", 7, 0, len(dbb), 0, 0) + dbb + b"\x00" + q,
    )


def inner_table_map(table_id: int, db: str, tbl: str, cols) -> bytes:
    w = Writer()
    start = len(w.buf)
    w.table_map(table_id, db, tbl, cols)
    # re-frame the CRC'd event as a checksum-less inner event
    body = bytes(w.buf[start + 19:-4])
    return inner_event(B.EV_TABLE_MAP, body)


def inner_rows(etype: int, table_id: int, cols, rows) -> bytes:
    w = Writer()
    start = len(w.buf)
    w.rows(etype, table_id, cols, rows)
    body = bytes(w.buf[start + 19:-4])
    return inner_event(etype, body)


def inner_xid(n: int) -> bytes:
    return inner_event(B.EV_XID, struct.pack("<Q", n))


def lenenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + n.to_bytes(2, "little")
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + n.to_bytes(8, "little")


def json_diff(entries) -> bytes:
    """Encode a WL#10570 diff sequence: (op, path, jsonb_value|None)
    triples -> lenenc(total) + [op(1) lenenc(path) path [lenenc(v) v]]."""
    seq = bytearray()
    for op, path, value in entries:
        p = path.encode("utf-8")
        seq += bytes([op]) + lenenc(len(p)) + p
        if value is not None:
            seq += lenenc(len(value)) + value
    return lenenc(len(seq)) + bytes(seq)


TYPED_COLS = [
    (B.T_LONG, 0),                 # id INT
    (B.T_LONGLONG, 0),             # big BIGINT
    (B.T_TINY, 0),                 # tiny TINYINT
    (B.T_NEWDECIMAL, (14 << 8) | 4),  # price DECIMAL(14,4)
    (B.T_DOUBLE, 8),               # ratio DOUBLE
    (B.T_FLOAT, 4),                # ratio_f FLOAT
    (B.T_VARCHAR, 40),             # name VARCHAR(40)  (1-byte length)
    (B.T_STRING, (B.T_STRING << 8) | 8),  # code CHAR(8)
    (B.T_BLOB, 2),                 # payload BLOB
    (B.T_JSON, 4),                 # doc JSON
    (B.T_DATE, 0),                 # d DATE
    (B.T_DATETIME2, 3),            # dt DATETIME(3)
    (B.T_TIME2, 0),                # t TIME
    (B.T_TIMESTAMP2, 0),           # ts TIMESTAMP
    (B.T_YEAR, 0),                 # y YEAR
]

T2_COLS = [(B.T_LONG, 0), (B.T_VARCHAR, 300)]  # note VARCHAR(300): 2-byte length

# binary-JSONB scalar string (type 0x0C + varlen + utf8): the minimal
# real JSONB value; container layouts are covered by test_mysql_jsonb
_JSONB_HELLO = b"\x0c\x0bhello jsonb"

TYPED_ROWS = [
    (1, 9223372036854775807, -5, Decimal("1234567890.1234"), 2.5, -0.5,
     "héllo wörld", "ABCD1234", b"\x00\xffbin\x01", _JSONB_HELLO,
     date(2024, 1, 15), datetime(2024, 1, 15, 10, 30, 45, 123000),
     timedelta(hours=10, minutes=30, seconds=45), 1_700_000_000, 2024),
    (2, -42, 7, Decimal("-0.5000"), -1.25, 1.5,
     None, None, None, None, None, None, None, 0, 0),
    (3, 0, 0, Decimal("0.0000"), 0.0, 0.0,
     "", "", b"", _JSONB_HELLO, date(1999, 12, 31),
     datetime(1999, 12, 31, 23, 59, 59, 0),
     timedelta(0), 946684799, 1999),
]

LONG_NOTE = ("длинная-замет ка-" * 20)[:280]  # multibyte, > 255 utf-8 bytes

# --- type-tail table: ENUM / SET / BIT / GEOMETRY / partial JSON ------------

TAILS_COLS = [
    (B.T_LONG, 0),                        # id INT
    (B.T_STRING, (B.T_ENUM << 8) | 1),    # status ENUM(3 labels, 1-byte index)
    (B.T_STRING, (B.T_SET << 8) | 1),     # flags SET(4 members, 1-byte mask)
    (B.T_BIT, (1 << 8) | 2),              # mask BIT(10): meta (bits%8=2, bytes=1)
    (B.T_GEOMETRY, 4),                    # geo GEOMETRY (4-byte pack length)
    (B.T_JSON, 4),                        # doc JSON
]

# SRID 0 + little-endian WKB POINT(1.5, -2.25)
GEO_POINT = (
    b"\x00\x00\x00\x00" + b"\x01" + (1).to_bytes(4, "little")
    + struct.pack("<dd", 1.5, -2.25)
)

TAILS_ROWS = [
    (1, 2, 0b0101, 0x2AB, GEO_POINT, _JSONB_HELLO),  # active; {a,c}; 683
    (2, 0, 0, 0, b"", _JSONB_HELLO),                 # enum 0 = invalid -> ""
    (3, None, None, None, None, None),               # NULL bitmap over the tail types
]


def main() -> None:
    w = Writer()
    w.fde()
    w.previous_gtids()  # fresh-server first file: empty executed set
    w.query("test", "CREATE TABLE test.typed ("
            "id INT PRIMARY KEY, big BIGINT, tiny TINYINT, "
            "price DECIMAL(14,4), ratio DOUBLE, ratio_f FLOAT, "
            "name VARCHAR(40), code CHAR(8), payload BLOB, doc JSON, "
            "d DATE, dt DATETIME(3), t TIME, ts TIMESTAMP, y YEAR)")
    w.query("test", "CREATE TABLE test.t2 (id INT PRIMARY KEY, note VARCHAR(300))")

    sid = "3e11fa47e3b24f2c90b1aa6d1d1f3e11"
    w.gtid(sid, 1)
    w.query("test", "BEGIN")
    w.table_map(101, "test", "typed", TYPED_COLS)
    w.rows(B.EV_WRITE_ROWS_V2, 101, TYPED_COLS, TYPED_ROWS)
    w.xid(1)

    w.gtid(sid, 2)
    w.query("test", "BEGIN")
    w.table_map(102, "test", "t2", T2_COLS)
    w.rows(B.EV_WRITE_ROWS_V2, 102, T2_COLS, [(1, LONG_NOTE), (2, "row two")])
    w.rows(B.EV_UPDATE_ROWS_V2, 102, T2_COLS,
           [((1, LONG_NOTE), (1, "short note ✓"))])
    w.rows(B.EV_DELETE_ROWS_V2, 102, T2_COLS, [(2, "row two")])
    w.xid(2)

    # trx 3: the r7 type tail — ENUM/SET/BIT/GEOMETRY inserts, then a
    # PARTIAL_UPDATE_ROWS event mixing a PARTIAL_JSON diff row with a
    # value_options=0 (plain) row
    w.query("test", "CREATE TABLE test.tails ("
            "id INT PRIMARY KEY, status ENUM('new','active','closed'), "
            "flags SET('a','b','c','d'), mask BIT(10), "
            "geo GEOMETRY, doc JSON)")
    w.gtid(sid, 3)
    w.query("test", "BEGIN")
    w.table_map(103, "test", "tails", TAILS_COLS)
    w.rows(B.EV_WRITE_ROWS_V2, 103, TAILS_COLS, TAILS_ROWS)
    diff = json_diff([
        (0, "$.k", b"\x0c\x07patched"),   # replace $.k with "patched"
        (2, "$.old", None),               # remove $.old
    ])
    w.table_map(103, "test", "tails", TAILS_COLS)
    w.partial_update_rows(103, TAILS_COLS, [
        ((1, 2, 0b0101, 0x2AB, GEO_POINT, _JSONB_HELLO),
         (1, 3, 0b0101, 0x2AB, GEO_POINT, None), {5: diff}),
        ((2, 0, 0, 0, b"", _JSONB_HELLO),
         (2, 1, 0b1111, 1023, b"", _JSONB_HELLO), None),
    ])
    w.xid(3)

    # trx 4: a TRANSACTION_PAYLOAD-wrapped (uncompressed) transaction —
    # the binlog_transaction_compression wire shape with the codec
    # removed — plus a negative fractional TIME2 exercising the
    # combined sign-offset packing
    t4_cols = [(B.T_LONG, 0), (B.T_TIME2, 3)]
    w.gtid(sid, 4)
    inner = (
        inner_query("test", "BEGIN")
        + inner_query("test", "CREATE TABLE test.t4 (id INT PRIMARY KEY, dur TIME(3))")
        + inner_table_map(104, "test", "t4", t4_cols)
        + inner_rows(B.EV_WRITE_ROWS_V2, 104, t4_cols, [
            (1, timedelta(hours=1, minutes=2, seconds=3, microseconds=456000)),
            (2, -timedelta(minutes=5, microseconds=250000)),
        ])
        + inner_xid(4)
    )
    w.transaction_payload(inner)

    w.rotate("replay.000002")
    out = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "replay.binlog"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(bytes(w.buf))
    print(f"wrote {out} ({len(w.buf)} bytes, end pos {w.pos})")
    write_minimal_fixture()


# --- MINIMAL/NOBLOB row-image fixture (VERDICT r7 #2) ------------------------

MINIMAL_COLS = [
    (B.T_LONG, 0),                    # id INT PK
    (B.T_VARCHAR, 32),                # name VARCHAR(32)
    (B.T_NEWDECIMAL, (10 << 8) | 2),  # bal DECIMAL(10,2)
    (B.T_BLOB, 2),                    # memo BLOB (2-byte pack length)
]


def write_minimal_fixture() -> None:
    """tests/fixtures/minimal.binlog: an archive written with
    binlog_row_image=MINIMAL / NOBLOB — row images narrower than the
    TABLE_MAP width. MINIMAL: update/delete before-image = PK columns
    only, update after-image = PK + changed columns (inserts stay
    full). NOBLOB: unchanged blob columns dropped from both images.
    The null bitmap covers only PRESENT columns, so decoding requires
    present-column indexing (sources/binlog_file._read_row_image)."""
    w = Writer()
    w.fde()
    w.previous_gtids()
    w.query("test", "CREATE TABLE test.acct (id INT PRIMARY KEY, "
            "name VARCHAR(32), bal DECIMAL(10,2), memo BLOB)")
    sid = "aa11fa47e3b24f2c90b1aa6d1d1f3e22"

    # trx 1: inserts are FULL even under MINIMAL
    w.gtid(sid, 1)
    w.query("test", "BEGIN")
    w.table_map(201, "test", "acct", MINIMAL_COLS)
    w.rows(B.EV_WRITE_ROWS_V2, 201, MINIMAL_COLS, [
        (1, "alice", Decimal("10.50"), b"m1"),
        (2, "bob", Decimal("0.00"), b"m2"),
    ])
    w.xid(1)

    # trx 2: MINIMAL update — before = PK only, after = PK + changed
    w.gtid(sid, 2)
    w.query("test", "BEGIN")
    w.table_map(201, "test", "acct", MINIMAL_COLS)
    w.rows(B.EV_UPDATE_ROWS_V2, 201, MINIMAL_COLS,
           [((1, None, None, None), (1, None, Decimal("99.25"), None))],
           present=[True, False, False, False],
           present_after=[True, False, True, False])
    w.xid(2)

    # trx 3: NOBLOB update — both images carry everything but the
    # unchanged blob
    w.gtid(sid, 3)
    w.query("test", "BEGIN")
    w.table_map(201, "test", "acct", MINIMAL_COLS)
    w.rows(B.EV_UPDATE_ROWS_V2, 201, MINIMAL_COLS,
           [((2, "bob", Decimal("0.00"), None),
             (2, "robert", Decimal("0.00"), None))],
           present=[True, True, True, False],
           present_after=[True, True, True, False])
    w.xid(3)

    # trx 4: full insert with a present-but-NULL column (null != absent),
    # then a MINIMAL delete (PK-only before-image)
    w.gtid(sid, 4)
    w.query("test", "BEGIN")
    w.table_map(201, "test", "acct", MINIMAL_COLS)
    w.rows(B.EV_WRITE_ROWS_V2, 201, MINIMAL_COLS,
           [(3, None, Decimal("1.00"), b"")])
    w.rows(B.EV_DELETE_ROWS_V2, 201, MINIMAL_COLS, [(2, None, None, None)],
           present=[True, False, False, False])
    w.xid(4)

    w.rotate("minimal.000002")
    out = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "minimal.binlog"
    out.write_bytes(bytes(w.buf))
    print(f"wrote {out} ({len(w.buf)} bytes, end pos {w.pos})")
    write_zstd_fixture()


# --- zstd-compressed TRANSACTION_PAYLOAD fixture (r9) ------------------------

ZSTD_COLS = [
    (B.T_LONG, 0),        # id INT PK
    (B.T_VARCHAR, 96),    # host VARCHAR(32)
    (B.T_LONGLONG, 0),    # val BIGINT
]


def write_zstd_fixture() -> None:
    """tests/fixtures/zstd_payload.binlog: an archive written with
    binlog_transaction_compression=zstd (MySQL 8.0.20+, WL#3549) — one
    GTID-framed transaction whose TRANSACTION_PAYLOAD carries a REAL
    zstd frame (compressed by the system zstd CLI at fixture-build
    time) wrapping CREATE TABLE + 40 formulaic inserts. Decoded at
    runtime by the from-scratch RFC 8878 decoder
    (operators/zstd_frame.py)."""
    w = Writer()
    w.fde()
    w.previous_gtids()
    sid = "bb22fb58f4c35a3da1c2bb7e2e204f33"
    w.gtid(sid, 1)
    rows = [
        (i, f"server-{i:03d}.dc1.example.com", i * 10 + 5) for i in range(40)
    ]
    inner = (
        inner_query("test", "BEGIN")
        + inner_query(
            "test",
            "CREATE TABLE test.metrics (id INT PRIMARY KEY, "
            "host VARCHAR(32), val BIGINT)",
        )
        + inner_table_map(105, "test", "metrics", ZSTD_COLS)
        + inner_rows(B.EV_WRITE_ROWS_V2, 105, ZSTD_COLS, rows)
        + inner_xid(1)
    )
    w.transaction_payload(inner, compress=True)
    w.rotate("zstd_payload.000002")
    out = (
        Path(__file__).resolve().parent.parent
        / "tests" / "fixtures" / "zstd_payload.binlog"
    )
    out.write_bytes(bytes(w.buf))
    print(f"wrote {out} ({len(w.buf)} bytes, inner {len(inner)} bytes)")


if __name__ == "__main__":
    main()


def write_synthetic(path: Path, n_trx: int, rows_per_trx: int, seed: int = 0) -> int:
    """A larger synthetic binlog file for throughput measurement
    (bench.py binlog_backfill section): one VARCHAR table, ``n_trx``
    GTID-framed transactions. Returns the op count a decode should
    yield (ddl + per-trx gtid/begin/commit + row ops)."""
    w = Writer()
    w.fde()
    w.query("test", "CREATE TABLE test.bf (id INT PRIMARY KEY, v VARCHAR(64))")
    sid = f"{seed:032x}"
    rid = seed * 10_000_000
    for t in range(n_trx):
        w.gtid(sid, t + 1)
        w.query("test", "BEGIN")
        rows = []
        for _ in range(rows_per_trx):
            rid += 1
            rows.append((rid, f"value-{rid:016d}-{seed}"))
        w.table_map(201, "test", "bf", [(B.T_LONG, 0), (B.T_VARCHAR, 64)])
        w.rows(B.EV_WRITE_ROWS_V2, 201, [(B.T_LONG, 0), (B.T_VARCHAR, 64)], rows)
        w.xid(t + 1)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(bytes(w.buf))
    # ops: 1 ddl + per trx (gtid + begin + rows_per_trx inserts + commit)
    return 1 + n_trx * (3 + rows_per_trx)
