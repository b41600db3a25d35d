"""Archive member readers from scratch — ZIP (APPNOTE.TXT, the
PKWARE public spec) and POSIX ustar TAR (+ gzip wrapper).

Training datasets ship as archive bundles at least as often as bare
files; a pipeline needs to enumerate and extract members WITHOUT
driver-side temp files — each (media_id, payload) row is one archive
and the member relation comes out of the same Arrow ``mapInPandas``
slot the codecs use.

ZIP: end-of-central-directory locate (back-scan tolerating a trailing
comment), central-directory walk (names, method, CRC-32, sizes,
local-header offsets), local-header re-parse for the actual data
start, STORED and DEFLATE members (stdlib zlib, raw window), CRC-32
verification of every extracted member, Zip64 (EOCD64 locator +
record, 0x0001 extended-information extras — bundles over 4 GiB or
65 535 members are routine at 100 TB scale), and traditional
ZipCrypto decryption with a supplied password (APPNOTE 6.1 — the
password-protected bundle format; wrong passwords fail loudly on the
crypto-header check byte). AES-encrypted members raise by name.

TAR: 512-byte ustar headers (octal sizes, checksum verification over
the space-filled checksum field, name+prefix joining, type flags),
content padding to block size, the two-zero-block terminator, and
transparent gzip / bzip2 / xz (.tar.gz / .tar.bz2 / .tar.xz)
unwrapping by magic.

Reference parity: the reference repo moves database rows; this
extends the ingest layer of the LLM-data-pipeline side it lacks.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class ArchiveError(ValueError):
    """Typed archive format error."""


_CRC_TABLE = [0] * 256
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0xEDB88320 if _c & 1 else _c >> 1
    _CRC_TABLE[_i] = _c


class _ZipCrypto:
    """The traditional PKWARE stream cipher (APPNOTE 6.1) — weak by
    modern standards but still the format password-protected dataset
    bundles ship in (stdlib ``zipfile`` reads it too, which is the
    cross-check in tests)."""

    def __init__(self, password: bytes):
        self.k0, self.k1, self.k2 = 0x12345678, 0x23456789, 0x34567890
        for b in password:
            self._update(b)

    def _update(self, b: int) -> None:
        self.k0 = (self.k0 >> 8) ^ _CRC_TABLE[(self.k0 ^ b) & 0xFF]
        self.k1 = ((self.k1 + (self.k0 & 0xFF)) * 134775813 + 1) \
            & 0xFFFFFFFF
        self.k2 = (self.k2 >> 8) ^ _CRC_TABLE[
            (self.k2 ^ (self.k1 >> 24)) & 0xFF
        ]

    def decrypt(self, data: bytes) -> bytes:
        out = bytearray(len(data))
        for i, c in enumerate(data):
            t = (self.k2 | 2) & 0xFFFF
            p = c ^ ((t * (t ^ 1)) >> 8) & 0xFF
            out[i] = p
            self._update(p)
        return bytes(out)

    def encrypt(self, data: bytes) -> bytes:
        out = bytearray(len(data))
        for i, p in enumerate(data):
            t = (self.k2 | 2) & 0xFFFF
            out[i] = p ^ ((t * (t ^ 1)) >> 8) & 0xFF
            self._update(p)
        return bytes(out)


def _zip64_extra(extra: bytes, usize: int, csize: int, lho: int,
                 name: str) -> tuple[int, int, int]:
    """Resolve 0xFFFFFFFF-maxed central-directory fields from the
    Zip64 extended-information extra field (APPNOTE 4.5.3, header ID
    0x0001): 8-byte values appear in the fixed order usize, csize,
    lho, disk — but ONLY for the fields that were maxed."""
    p = 0
    while p + 4 <= len(extra):
        (hid, hsz) = struct.unpack_from("<HH", extra, p)
        body = extra[p + 4:p + 4 + hsz]
        p += 4 + hsz
        if hid != 0x0001:
            continue
        q = 0
        if usize == 0xFFFFFFFF:
            if q + 8 > len(body):
                raise ArchiveError(f"member {name!r}: Zip64 extra truncated")
            (usize,) = struct.unpack_from("<Q", body, q)
            q += 8
        if csize == 0xFFFFFFFF:
            if q + 8 > len(body):
                raise ArchiveError(f"member {name!r}: Zip64 extra truncated")
            (csize,) = struct.unpack_from("<Q", body, q)
            q += 8
        if lho == 0xFFFFFFFF:
            if q + 8 > len(body):
                raise ArchiveError(f"member {name!r}: Zip64 extra truncated")
            (lho,) = struct.unpack_from("<Q", body, q)
            q += 8
        return usize, csize, lho
    if 0xFFFFFFFF in (usize, csize, lho):
        raise ArchiveError(
            f"member {name!r}: maxed central-directory field without a "
            "Zip64 extended-information extra"
        )
    return usize, csize, lho


def _aes_extra(extra: bytes) -> tuple[int, int, int] | None:
    """The WinZip AE-x record (header ID 0x9901) as (vendor_version,
    strength, actual_method), or None.  Walked as (id, size) records
    like ``_zip64_extra`` — a substring scan would false-positive on
    unrelated payload bytes."""
    p = 0
    while p + 4 <= len(extra):
        (hid, hsz) = struct.unpack_from("<HH", extra, p)
        if hid == 0x9901:
            body = extra[p + 4:p + 4 + hsz]
            if len(body) < 7:
                raise ArchiveError("AE-x extra record truncated")
            (ver,) = struct.unpack_from("<H", body, 0)
            if body[2:4] != b"AE":
                raise ArchiveError(
                    f"AE-x extra with bad vendor id {body[2:4]!r}"
                )
            strength = body[4]
            (method,) = struct.unpack_from("<H", body, 5)
            if ver not in (1, 2):
                raise ArchiveError(f"unknown AE vendor version {ver}")
            if strength not in (1, 2, 3):
                raise ArchiveError(f"unknown AE strength {strength}")
            return ver, strength, method
        p += 4 + hsz
    return None


def _aes_decrypt_member(raw: bytes, password: bytes, strength: int,
                        name: str) -> bytes:
    """WinZip AE-x member payload -> compressed bytes (the WinZip
    AES spec): salt + 2-byte password verifier + AES-CTR data
    (little-endian counter from 1, no nonce) + 10-byte HMAC-SHA1
    auth code over the ENCRYPTED bytes. Key material comes from
    PBKDF2-HMAC-SHA1(password, salt, 1000)."""
    import hashlib
    import hmac as _hmac

    from dolphinbeat_spark.operators.aes import aes_ctr

    key_len = 8 * (strength + 1)  # 16/24/32
    salt_len = key_len // 2       # 8/12/16
    if len(raw) < salt_len + 2 + 10:
        raise ArchiveError(f"member {name!r}: AE payload too short")
    salt = raw[:salt_len]
    verifier = raw[salt_len:salt_len + 2]
    body = raw[salt_len + 2:-10]
    auth = raw[-10:]
    dk = hashlib.pbkdf2_hmac("sha1", password, salt, 1000,
                             dklen=2 * key_len + 2)
    enc_key = dk[:key_len]
    auth_key = dk[key_len:2 * key_len]
    if dk[2 * key_len:] != verifier:
        raise ArchiveError(
            f"member {name!r}: wrong password (AE verifier mismatch)"
        )
    want = _hmac.new(auth_key, body, hashlib.sha1).digest()[:10]
    if want != auth:
        raise ArchiveError(
            f"member {name!r}: AE authentication code mismatch "
            "(corrupted ciphertext)"
        )
    return aes_ctr(enc_key, body, little_endian=True, initial=1)


def iter_zip_members(data: bytes, password: bytes | None = None,
                     errors: str = "strict"):
    """Yield (name, content) per ZIP member via the central
    directory; CRC-verified. Zip64 (APPNOTE 4.3.14/4.3.15: EOCD64
    locator + record, 0x0001 extended-information extras) is handled
    transparently — dataset bundles over 4 GiB or 65 535 members are
    routine at 100 TB scale. ``password`` decrypts traditional
    ZipCrypto members (APPNOTE 6.1, the password-protected bundle
    format; the 12-byte crypto header's check byte catches a wrong
    password before CRC); AES-encrypted members raise by name.

    ``errors="capture"`` yields (name, content, error) 3-tuples and
    isolates per-MEMBER failures (truncated data, CRC mismatch,
    unsupported method, wrong password): the central directory drives
    iteration, so one bad member costs one error tuple, not the
    archive. Directory-level failures still end iteration with one
    error tuple."""
    capture = errors == "capture"
    def _decode_member(name, flags, method, crc, csize, usize, lho,
                       extra_field):
        if flags & 0x1 and password is None:
            raise NotImplementedError(
                f"encrypted ZIP member {name!r} (pass password= for "
                "traditional ZipCrypto or WinZip AES)"
            )
        if data[lho:lho + 4] != b"PK\x03\x04":
            raise ArchiveError(f"local header missing for {name!r}")
        lnlen, lelen = struct.unpack_from("<HH", data, lho + 26)
        start = lho + 30 + lnlen + lelen
        raw = data[start:start + csize]
        if len(raw) != csize:
            raise ArchiveError(f"member {name!r} data truncated")
        if flags & 0x1:
            ae = _aes_extra(extra_field)
            if method == 99 and ae is None:
                raise ArchiveError(
                    f"member {name!r}: method 99 without an AE-x extra"
                )
            if ae is not None:
                ver, strength, method = ae
                raw = _aes_decrypt_member(raw, password, strength, name)
                if ver == 2:
                    crc = None  # AE-2 stores CRC 0 by design
            else:
                if len(raw) < 12:
                    raise ArchiveError(
                        f"member {name!r} lacks a crypto header"
                    )
                zc = _ZipCrypto(password)
                hdr = zc.decrypt(raw[:12])
                # APPNOTE 6.1.6: last header byte checks the CRC high
                # byte (or the DOS-time high byte when bit 3 defers)
                want = data[lho + 11] if flags & 0x8 \
                    else (crc >> 24) & 0xFF
                if hdr[11] != want:
                    raise ArchiveError(
                        f"member {name!r}: wrong password (crypto "
                        "header check failed)"
                    )
                raw = zc.decrypt(raw[12:])
        if method == 0:
            content = raw
        elif method == 8:
            # bounded at the DECLARED size + 1 (r13 zip-bomb guard): a
            # crafted stream claiming a small usize must not inflate
            # to gigabytes before the size check below sees it
            d = zlib.decompressobj(wbits=-15)
            try:
                content = d.decompress(raw, usize + 1)
            except zlib.error as ex:
                raise ArchiveError(
                    f"member {name!r} fails to inflate: {ex}"
                ) from ex
            if len(content) <= usize and not d.eof:
                raise ArchiveError(
                    f"member {name!r} fails to inflate: incomplete "
                    "deflate stream")
        else:
            raise NotImplementedError(
                f"ZIP compression method {method} not supported (0/8)"
            )
        if len(content) != usize:
            raise ArchiveError(
                f"member {name!r}: {len(content)} bytes, header says {usize}"
            )
        # AE-2 members store CRC 0 by design (the HMAC authenticated
        # the ciphertext instead); everything else is CRC-verified
        if crc is not None and zlib.crc32(content) & 0xFFFFFFFF != crc:
            raise ArchiveError(f"member {name!r} CRC-32 mismatch")
        return content

    try:
        # EOCD: scan back over ≤64 KiB of trailing comment
        lo = max(0, len(data) - 65536 - 22)
        eocd = data.rfind(b"PK\x05\x06", lo)
        if eocd < 0:
            raise ArchiveError("ZIP end-of-central-directory not found")
        ndisk, cddisk, nhere, ntotal, cdsize, cdoff, clen = \
            struct.unpack_from("<HHHHIIH", data, eocd + 4)
        # Zip64 EOCD locator sits immediately before the EOCD (4.3.15)
        if eocd >= 20 and data[eocd - 20:eocd - 16] == b"PK\x06\x07":
            locdisk, e64off, totdisks = struct.unpack_from(
                "<IQI", data, eocd - 16
            )
            if e64off + 56 > len(data) \
                    or data[e64off:e64off + 4] != b"PK\x06\x06":
                raise ArchiveError(
                    "Zip64 EOCD record missing at locator offset")
            (ndisk, cddisk, nhere, ntotal, cdsize, cdoff) = \
                struct.unpack_from("<IIQQQQ", data, e64off + 16)
        elif ntotal == 0xFFFF or cdoff == 0xFFFFFFFF or cdsize == 0xFFFFFFFF:
            raise ArchiveError(
                "EOCD fields are Zip64-maxed but no Zip64 EOCD locator found"
            )
        if ndisk or cddisk:
            raise NotImplementedError("multi-disk ZIP not supported")
    except (ArchiveError, NotImplementedError) as ex:
        if not capture:
            raise
        yield None, None, str(ex)
        return
    pos = cdoff
    for _ in range(ntotal):
        name = None
        try:
            if data[pos:pos + 4] != b"PK\x01\x02":
                raise ArchiveError(
                    f"central directory entry missing at {pos}")
            (method, crc, csize, usize, nlen, elen, klen) = struct.unpack(
                "<H I I I H H H",
                data[pos + 10:pos + 12] + data[pos + 16:pos + 32]
                + data[pos + 32:pos + 34],
            )
            flags = struct.unpack_from("<H", data, pos + 8)[0]
            (lho,) = struct.unpack_from("<I", data, pos + 42)
            name = data[pos + 46:pos + 46 + nlen].decode("utf-8", "replace")
            if 0xFFFFFFFF in (usize, csize, lho):
                extra = data[pos + 46 + nlen:pos + 46 + nlen + elen]
                usize, csize, lho = _zip64_extra(
                    extra, usize, csize, lho, name)
            extra_field = data[pos + 46 + nlen:pos + 46 + nlen + elen]
        except (ArchiveError, NotImplementedError, struct.error) as ex:
            # the central directory itself is unwalkable past here
            if not capture:
                raise
            yield name, None, str(ex)
            return
        pos += 46 + nlen + elen + klen
        try:
            content = _decode_member(name, flags, method, crc, csize,
                                     usize, lho, extra_field)
        except (ArchiveError, NotImplementedError) as ex:
            if not capture:
                raise
            yield name, None, str(ex)
            continue
        yield (name, content, None) if capture else (name, content)


def iter_tar_members(data: bytes, errors: str = "strict",
                     max_inflate: int | None = None):
    """Yield (name, content) per regular file in a ustar TAR, with
    transparent compression unwrap by magic: gzip (.tar.gz), bzip2
    (.tar.bz2) and xz (.tar.xz) — the three wrappers dataset bundles
    actually ship in (all stdlib decompressors).

    ``errors="capture"`` yields (name, content, error) 3-tuples; a
    corrupt header (bad checksum/size field) costs one error tuple
    and the walk RESYNCS by scanning forward one 512-byte block at a
    time for the next header whose checksum verifies — TAR framing is
    sequential, so this is the only recovery that exists."""
    capture = errors == "capture"
    from dolphinbeat_spark.sources.inflate import (
        InflateError, bz2_capped, gzip_multi_capped, inflation_cap,
        xz_capped,
    )
    cap = inflation_cap(len(data), max_inflate)
    try:
        if data[:2] == b"\x1f\x8b":
            try:
                data = gzip_multi_capped(data, cap)
            except InflateError as ex:
                raise ArchiveError(f"bad gzip wrapper: {ex}") from ex
        elif data[:3] == b"BZh":
            try:
                data = bz2_capped(data, cap)
            except InflateError as ex:
                raise ArchiveError(f"bad bzip2 wrapper: {ex}") from ex
        elif data[:6] == b"\xfd7zXZ\x00":
            try:
                data = xz_capped(data, cap)
            except InflateError as ex:
                raise ArchiveError(f"bad xz wrapper: {ex}") from ex
        elif data[:2] == b"\x1f\x9d":
            # tar.Z — the pre-gzip archive wrapper (r12)
            from dolphinbeat_spark.operators.lzw_z import (
                ZCompressError, decode_z,
            )

            try:
                data = decode_z(data, max_output=cap)
            except ZCompressError as ex:
                raise ArchiveError(
                    f"bad compress (.Z) wrapper: {ex}") from ex
    except ArchiveError as ex:
        if not capture:
            raise
        yield None, None, str(ex)
        return

    def _hdr_ok(block: bytes) -> bool:
        try:
            want = int(block[148:156].split(b"\x00")[0].strip() or b"0", 8)
        except ValueError:
            return False
        return sum(block[:148]) + 8 * 32 + sum(block[156:]) == want

    pos = 0
    while pos + 512 <= len(data):
        block = data[pos:pos + 512]
        if block == bytes(512):
            break  # terminator
        name = block[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        try:
            try:
                size = int(
                    block[124:136].split(b"\x00")[0].strip() or b"0", 8)
            except ValueError:
                raise ArchiveError(f"bad octal size field at {pos}") \
                    from None
            want = int(block[148:156].split(b"\x00")[0].strip() or b"0", 8)
            summed = sum(block[:148]) + 8 * 32 + sum(block[156:])
            if summed != want:
                raise ArchiveError(f"tar header checksum mismatch at {pos}")
        except ArchiveError as ex:
            if not capture:
                raise
            yield name or None, None, str(ex)
            # resync: scan block-by-block for the next valid header
            pos += 512
            while pos + 512 <= len(data):
                nxt = data[pos:pos + 512]
                if nxt == bytes(512) or _hdr_ok(nxt):
                    break
                pos += 512
            continue
        typeflag = block[156:157]
        prefix = block[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        pos += 512
        content = data[pos:pos + size]
        if len(content) != size:
            if capture:
                yield name, None, f"tar member {name!r} content truncated"
                return
            raise ArchiveError(f"tar member {name!r} content truncated")
        pos += (size + 511) // 512 * 512
        if typeflag in (b"0", b"\x00"):
            yield (name, content, None) if capture else (name, content)
        # directories / links / pax headers: skipped


ARCHIVE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("member_idx", LongType()),
        StructField("archive_fmt", StringType()),
        StructField("name", StringType()),
        StructField("size", LongType()),
        StructField("member_md5", StringType()),
        StructField("text", StringType()),
    ]
)

ARCHIVE_BINARY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("member_idx", LongType()),
        StructField("archive_fmt", StringType()),
        StructField("name", StringType()),
        StructField("size", LongType()),
        StructField("member_md5", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def read_archive(df: DataFrame, text_limit: int = 1 << 20,
                 binary: bool = False,
                 password: bytes | None = None,
                 errors: str = "strict",
                 max_inflate: int | None = None) -> DataFrame:
    """(media_id, payload) -> one row per archive member (ZIP or TAR
    by magic), with size and md5. Default mode renders members as a
    capped UTF-8 ``text`` column — shuffle-cheap, for text corpora.
    ``binary=True`` emits the member BYTES as ``payload`` instead —
    the decode-chain mode: the member relation feeds straight into
    the codec operators (pdf_extract / decode_media / demux_media),
    which is how a bundled corpus (tar of PDFs, zip of images)
    actually flows at 100 TB. Rows stay one-member-each, so Spark can
    repartition the decode stage independently of archive boundaries.
    ``password`` decrypts protected ZIP members (traditional
    ZipCrypto or WinZip AE-x AES — r11).

    ``errors="capture"`` (r12) isolates per-MEMBER failures for wild
    bundles: the output schema gains an ``error`` string column (null
    on good rows); a corrupt member (CRC mismatch, truncated, bad tar
    header) becomes one error row and the remaining members still
    flow. Default stays strict — one corrupt member raises.

    ``max_inflate`` caps tar-wrapper decompression (gz/bz2/xz/.Z) at
    an absolute byte count; default is sources/inflate.py's dynamic
    zip-bomb guard (r13). ZIP deflate members are always bounded at
    their declared uncompressed size."""

    schema = ARCHIVE_BINARY_SCHEMA if binary else ARCHIVE_SCHEMA
    capture = errors == "capture"
    if capture:
        schema = StructType(
            schema.fields + [StructField("error", StringType())])
    elif errors != "strict":
        raise ValueError(f"errors={errors!r}: expected strict|capture")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(raw)
                if b[:4] == b"PK\x03\x04" or b.rfind(b"PK\x05\x06") >= 0 \
                        and b[:2] == b"PK":
                    fmt, members = "zip", iter_zip_members(
                        b, password=password, errors=errors)
                else:
                    fmt, members = "tar", iter_tar_members(
                        b, errors=errors, max_inflate=max_inflate)
                for i, member in enumerate(members):
                    if capture:
                        name, content, err = member
                        if err is not None:
                            rows.append((mid, i, fmt, name, None, None,
                                         None, err))
                            continue
                    else:
                        name, content = member
                    tail = (
                        bytearray(content) if binary
                        else content[:text_limit].decode("utf-8", "replace")
                    )
                    row = (
                        mid, i, fmt, name, len(content),
                        hashlib.md5(content).hexdigest(), tail,
                    )
                    rows.append((row + (None,)) if capture else row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return df.mapInPandas(batches, schema)


# --- writers (fixture generators) ---------------------------------------------


def encode_zip(members: list[tuple[str, bytes]],
               deflate: bool = True, zip64: bool = False,
               password: bytes | None = None,
               aes: int | None = None) -> bytes:
    """Format-faithful ZIP writer (fixture generator). ``zip64=True``
    forces the full Zip64 layout regardless of actual sizes — maxed
    32-bit fields with 0x0001 extended-information extras, a Zip64
    EOCD record, and its locator (APPNOTE 4.3.14/4.3.15, 4.5.3) — the
    shape a >4 GiB or >65 535-member bundle has in the wild, testable
    without writing 4 GiB. ``password`` writes traditional-ZipCrypto
    members (deterministic 12-byte crypto headers, check byte = CRC
    high byte); ``aes`` = 1/2/3 writes WinZip AE-2 members instead
    (AES-128/192/256-CTR + HMAC-SHA1, method 99 with the 0x9901
    extra, deterministic per-member salts, stored CRC 0)."""
    if aes is not None and password is None:
        raise ValueError("aes members need a password")
    out = bytearray()
    central = bytearray()
    offsets = []
    sizes = []
    cd_info = []  # (method, crc, ae_extra) per member
    for name, content in members:
        nb = name.encode()
        crc = zlib.crc32(content) & 0xFFFFFFFF
        if deflate:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = co.compress(content) + co.flush()
            method = 8
        else:
            raw, method = content, 0
        flags = 0
        ae_extra = b""
        if aes is not None:
            import hashlib
            import hmac as _hmac

            from dolphinbeat_spark.operators.aes import aes_ctr

            key_len = 8 * (aes + 1)
            salt = bytes((13 * len(offsets) + i) % 256
                         for i in range(key_len // 2))
            dk = hashlib.pbkdf2_hmac("sha1", password, salt, 1000,
                                     dklen=2 * key_len + 2)
            body = aes_ctr(dk[:key_len], raw, little_endian=True,
                           initial=1)
            mac = _hmac.new(dk[key_len:2 * key_len], body,
                            hashlib.sha1).digest()[:10]
            raw = salt + dk[2 * key_len:] + body + mac
            ae_extra = (b"\x01\x99\x07\x00"
                        + struct.pack("<H", 2) + b"AE"
                        + bytes([aes]) + struct.pack("<H", method))
            method = 99
            crc = 0  # AE-2 stores CRC 0
            flags = 1
        elif password is not None:
            zc = _ZipCrypto(password)
            hdr = bytes(
                [(7 * len(offsets) + i) % 251 for i in range(11)]
            ) + bytes([(crc >> 24) & 0xFF])
            raw = zc.encrypt(hdr) + zc.encrypt(raw)
            flags = 1
        offsets.append(len(out))
        sizes.append(len(raw))
        cd_info.append((method, crc, ae_extra))
        if zip64:
            extra = b"\x01\x00\x10\x00" + struct.pack(
                "<QQ", len(content), len(raw)
            ) + ae_extra
            out += b"PK\x03\x04" + struct.pack(
                "<HHHHHIIIHH", 45, flags, method, 0, 0, crc,
                0xFFFFFFFF, 0xFFFFFFFF, len(nb), len(extra),
            ) + nb + extra + raw
        else:
            out += b"PK\x03\x04" + struct.pack(
                "<HHHHHIIIHH", 20, flags, method, 0, 0, crc, len(raw),
                len(content), len(nb), len(ae_extra),
            ) + nb + ae_extra + raw
    cflags = 1 if password is not None else 0
    for (name, content), off, csz, (method, crc, ae_extra) in zip(
            members, offsets, sizes, cd_info):
        nb = name.encode()
        if zip64:
            extra = b"\x01\x00\x18\x00" + struct.pack(
                "<QQQ", len(content), csz, off
            ) + ae_extra
            central += b"PK\x01\x02" + struct.pack(
                "<HHHHHHIIIHHHHHII", 45, 45, cflags, method, 0, 0, crc,
                0xFFFFFFFF, 0xFFFFFFFF, len(nb), len(extra), 0, 0, 0, 0,
                0xFFFFFFFF,
            ) + nb + extra
        else:
            central += b"PK\x01\x02" + struct.pack(
                "<HHHHHHIIIHHHHHII", 20, 20, cflags, method, 0, 0, crc,
                csz, len(content), len(nb), len(ae_extra), 0, 0, 0, 0,
                off,
            ) + nb + ae_extra
    cd_off = len(out)
    out += central
    if zip64:
        e64_off = len(out)
        out += b"PK\x06\x06" + struct.pack(
            "<QHHIIQQQQ", 44, 45, 45, 0, 0, len(members), len(members),
            len(central), cd_off,
        )
        out += b"PK\x06\x07" + struct.pack("<IQI", 0, e64_off, 1)
        out += b"PK\x05\x06" + struct.pack(
            "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0,
        )
    else:
        out += b"PK\x05\x06" + struct.pack(
            "<HHHHIIH", 0, 0, len(members), len(members), len(central),
            cd_off, 0,
        )
    return bytes(out)


def encode_tar(members: list[tuple[str, bytes]],
               gzip_wrap: bool = False) -> bytes:
    """Format-faithful ustar writer (fixture generator)."""
    out = bytearray()
    for name, content in members:
        nb = name.encode()
        if len(nb) > 100:
            raise ValueError("tar name longer than 100 bytes")
        hdr = bytearray(512)
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(content):011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8
        hdr[156:157] = b"0"
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chksum = sum(hdr)
        hdr[148:156] = f"{chksum:06o}\x00 ".encode()
        out += hdr + content
        pad = -len(content) % 512
        out += bytes(pad)
    out += bytes(1024)
    if gzip_wrap:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(bytes(out)) + co.flush()
    return bytes(out)
