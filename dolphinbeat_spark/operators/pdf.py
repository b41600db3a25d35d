"""PDF text extraction from scratch — the ISO 32000-1 (PDF 1.7)
subset a training-data pipeline needs, with no PDF libraries.

PDF is a top-3 document format in web-scale corpora; a pipeline that
cannot pull text out of one loses the whole document modality. This
module implements the honest read-side subset per the PUBLIC spec:

- COS object syntax (§7.3): numbers, booleans, null, literal strings
  with all escapes + balanced parens, hex strings, names with ``#xx``
  escapes, arrays, dictionaries, indirect references, comments;
- classic cross-reference tables (§7.5.4) with subsections and /Prev
  chains, AND cross-reference streams (§7.5.8: /W field widths,
  /Index, type 0/1/2 entries) — including hybrid files via /XRefStm;
- object streams (§7.5.7: /N, /First, offset pairs);
- stream filters (§7.4): FlateDecode (stdlib zlib) with the PNG
  predictors 10–15 of /DecodeParms (Sub/Up/Average/Paeth — xref
  streams in the wild are almost always Up-predicted),
  ASCIIHexDecode, ASCII85Decode, RunLengthDecode, and LZWDecode
  (§7.4.4 is the TIFF 6.0 LZW dialect — MSB-first, early code-width
  change — reused from operators/tiff.py; /EarlyChange 0 raises);
  DCTDecode/JPXDecode/CCITTFaxDecode/JBIG2Decode are TERMINAL image
  filters decoded by the in-repo codecs on the image surface
  (operators/jpeg, jpx — r14, ccitt, jbig2) and raise by name only
  on the text-stream path where pixel filters cannot appear;
- the page tree (§7.7.3): /Pages recursion with /Resources
  inheritance and cycle guards; per-page /Contents concatenation;
- the text-showing subset of content streams (§9.4): BT/ET, Tj, TJ,
  ' and ", with line assembly from Td/TD/T*/Tm — a TJ kerning
  adjustment ≤ -180/1000 em emits a space (the standard
  word-gap heuristic every extractor applies);
- simple fonts decode show-string bytes as Latin-1 (the Standard-14
  case); Type0/Identity-H composite fonts (r10) decode 2-byte CIDs
  through their /ToUnicode CMap (bfchar + both bfrange forms,
  multi-char UTF-16BE destinations incl. surrogate pairs) — the
  layout Word/Chrome-class writers emit for ANY non-Latin text, so
  without it the non-English share of a PDF corpus is unreadable. A
  Type0 font WITHOUT /ToUnicode recovers its text through the
  embedded font's own tables: a TrueType /FontFile2 cmap inverted
  via /CIDToGIDMap (r13, operators/truetype.py) or a non-CID CFF
  /FontFile3's charset glyph names through the Adobe Glyph List
  (r14, operators/cff.py — CID == GID per §9.7.4.2). Predefined
  CJK CMap encodings (GBK-EUC / RKSJ / EUC / B5 / UHC / Uni*-UCS2 /
  UTF16 families, r14) decode their show strings with the code
  space's own charset codec — the code->CID tables are a glyph
  concern, not a text one. Only CID-keyed CFF (no glyph names),
  unrecognized CMap names, and fonts with nothing embedded still
  raise by name;
- encryption (§7.6, r10): the Standard security handler with RC4
  V1/V2 R2/R3 and the EMPTY user password — the owner-locked layout
  (print/copy restrictions) every viewer opens, a real corpus share;
  per-object keys over streams and strings, /U validated per
  Algorithms 4/5, the RC4 primitive pinned by RFC 6229 vectors.
  USER-password-protected files (empty password fails /U) and AES
  (V≥4) raise by name;
- document metadata: /Info Title/Author when present.

Writer mirror ``encode_pdf`` generates format-faithful fixtures:
classic-xref/plain, FlateDecode, and xref-stream + object-stream
layouts (with a real Up predictor on the xref stream), so the reader
is exercised on every structural variant it claims.

Spark surface: ``pdf_extract`` — one page per row via Arrow
``mapInPandas`` (map-only; at 100 TB each payload is one fetched PDF
and the page relation feeds the text pipeline).

Reference parity: the reference repo (CDC row mover) has no document
modality; this extends the LLM-pipeline ingest layer per SURVEY §7.
"""

from __future__ import annotations

import base64
import hashlib
import re
import zlib
from dataclasses import dataclass, field
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


class PdfError(ValueError):
    """Typed PDF structure error."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Name(str):
    """A PDF name (/Foo) — distinct from a decoded string."""

    __slots__ = ()


@dataclass(frozen=True)
class _Ref:
    num: int
    gen: int


# --- COS object parsing ------------------------------------------------------


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # % comment to EOL
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
        else:
            break
    return pos


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+R(?![a-zA-Z0-9])")
_KEYWORD_RE = re.compile(rb"[A-Za-z'\"*]+")


def _parse_name(data: bytes, pos: int) -> tuple[_Name, int]:
    # pos at '/'
    pos += 1
    out = bytearray()
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS or c in _DELIM:
            break
        if c == 0x23 and pos + 2 < n:  # #xx escape
            try:
                out.append(int(data[pos + 1:pos + 3], 16))
                pos += 3
                continue
            except ValueError:
                pass
        out.append(c)
        pos += 1
    return _Name(out.decode("latin-1")), pos


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    # pos at '('
    pos += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            if pos + 1 >= n:
                break
            e = data[pos + 1]
            if e in b"nrtbf()\\":
                out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b",
                        0x66: b"\f", 0x28: b"(", 0x29: b")",
                        0x5C: b"\\"}[e]
                pos += 2
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                j = pos + 1
                oct_s = b""
                while j < n and len(oct_s) < 3 and 0x30 <= data[j] <= 0x37:
                    oct_s += data[j:j + 1]
                    j += 1
                out.append(int(oct_s, 8) & 0xFF)
                pos = j
            elif e in (0x0A, 0x0D):  # line continuation
                pos += 2
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:  # lone backslash: dropped per spec
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise PdfError("unterminated literal string")


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    # pos at '<' (single)
    end = data.find(b">", pos + 1)
    if end < 0:
        raise PdfError("unterminated hex string")
    hx = re.sub(rb"[\x00\t\n\x0c\r ]", b"", data[pos + 1:end])
    if len(hx) % 2:
        hx += b"0"  # odd final digit: implied 0 (§7.3.4.3)
    try:
        return bytes.fromhex(hx.decode("ascii")), end + 1
    except (ValueError, UnicodeDecodeError) as ex:
        raise PdfError(f"bad hex string: {ex}") from ex


def _parse_object(data: bytes, pos: int):
    """One COS object at ``pos`` -> (obj, new_pos). Collapses
    ``n g R`` into :class:`_Ref`."""
    pos = _skip_ws(data, pos)
    n = len(data)
    if pos >= n:
        raise PdfError("unexpected end of data")
    c = data[pos]
    if c == 0x2F:  # /
        return _parse_name(data, pos)
    if c == 0x28:  # (
        return _parse_literal_string(data, pos)
    if c == 0x3C:  # < or <<
        if data[pos:pos + 2] == b"<<":
            d: dict = {}
            pos += 2
            while True:
                pos = _skip_ws(data, pos)
                if data[pos:pos + 2] == b">>":
                    return d, pos + 2
                if pos >= n:
                    raise PdfError("unterminated dictionary")
                key, pos = _parse_object(data, pos)
                if not isinstance(key, _Name):
                    raise PdfError(f"dictionary key is not a name: {key!r}")
                val, pos = _parse_object(data, pos)
                d[str(key)] = val
        return _parse_hex_string(data, pos)
    if c == 0x5B:  # [
        arr: list = []
        pos += 1
        while True:
            pos = _skip_ws(data, pos)
            if pos >= n:
                raise PdfError("unterminated array")
            if data[pos] == 0x5D:
                return arr, pos + 1
            item, pos = _parse_object(data, pos)
            arr.append(item)
    m = _NUM_RE.match(data, pos)
    if m:
        tok = m.group(0)
        pos2 = m.end()
        if b"." not in tok:
            rm = _REF_RE.match(data, pos2)
            if rm:
                return _Ref(int(tok), int(rm.group(1))), rm.end()
            return int(tok), pos2
        return float(tok), pos2
    km = _KEYWORD_RE.match(data, pos)
    if km:
        kw = km.group(0)
        if kw == b"true":
            return True, km.end()
        if kw == b"false":
            return False, km.end()
        if kw == b"null":
            return None, km.end()
        raise PdfError(f"unexpected keyword {kw[:16]!r} at {pos}")
    raise PdfError(f"unparseable byte {data[pos:pos + 1]!r} at {pos}")


# --- filters -----------------------------------------------------------------


def _png_predictor(raw: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """PNG row predictors 10-15 (/Predictor >= 10): per-row filter
    byte then Sub/Up/Average/Paeth reconstruction — identical to the
    PNG spec the operators/multimodal.py decoder implements."""
    bpp = max((colors * bpc + 7) // 8, 1)
    stride = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    while pos < len(raw):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1:pos + 1 + stride])
        if len(row) < stride:
            raise PdfError("predictor row truncated")
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise PdfError(f"unknown predictor row filter {ftype}")
        out += row
        prev = bytes(row)
    return bytes(out)


def _rle_decode(raw: bytes) -> bytes:
    """RunLengthDecode (§7.4.5)."""
    out = bytearray()
    pos = 0
    while pos < len(raw):
        l = raw[pos]
        if l == 128:
            break
        if l < 128:
            out += raw[pos + 1:pos + 2 + l]
            pos += 2 + l
        else:
            if pos + 1 >= len(raw):
                raise PdfError("RunLength run truncated")
            out += raw[pos + 1:pos + 2] * (257 - l)
            pos += 2
    return bytes(out)


_UNSUPPORTED_FILTERS = frozenset((
    "DCTDecode", "JPXDecode", "CCITTFaxDecode", "JBIG2Decode", "Crypt",
))

#: LZW output cap — text/xref streams, not media (hostile-frame guard)
_LZW_CAP = 1 << 26


def _apply_filters(raw: bytes, filt, parms) -> bytes:
    if not isinstance(raw, (bytes, bytearray)):
        raise PdfError("stream carries no data")
    filters = [filt] if not isinstance(filt, list) else filt
    parms_list = parms if isinstance(parms, list) else [parms]
    for i, f in enumerate(filters):
        if f is None:
            continue
        name = str(f)
        p = parms_list[i] if i < len(parms_list) else None
        p = p or {}
        if name == "FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error as ex:
                raise PdfError(f"FlateDecode failed: {ex}") from ex
        elif name == "ASCIIHexDecode":
            body = raw.split(b">")[0]
            hx = re.sub(rb"[\x00\t\n\x0c\r ]", b"", body)
            if len(hx) % 2:
                hx += b"0"
            try:
                raw = bytes.fromhex(hx.decode("ascii"))
            except (ValueError, UnicodeDecodeError) as ex:
                raise PdfError(f"ASCIIHexDecode failed: {ex}") from ex
        elif name == "ASCII85Decode":
            body = raw.split(b"~>")[0]
            body = re.sub(rb"[\x00\t\n\x0c\r ]", b"", body)
            try:
                raw = base64.a85decode(body)
            except ValueError as ex:
                raise PdfError(f"ASCII85Decode failed: {ex}") from ex
        elif name == "RunLengthDecode":
            raw = _rle_decode(raw)
        elif name == "LZWDecode":
            # §7.4.4: the PDF LZW variant IS the TIFF 6.0 dialect the
            # engine already implements from scratch (MSB-first, 9-bit
            # start, Clear=256/EOD=257, EARLY code-width change) —
            # /EarlyChange 0 is the one legal divergence and raises
            from dolphinbeat_spark.operators.tiff import (
                TiffError,
                tiff_lzw_decode,
            )

            if isinstance(p, dict) and p.get("EarlyChange", 1) == 0:
                raise NotImplementedError(
                    "LZWDecode with /EarlyChange 0 not supported "
                    "(the TIFF-dialect early change is implemented)"
                )
            try:
                raw = tiff_lzw_decode(raw, _LZW_CAP)
            except TiffError as ex:
                raise PdfError(f"LZWDecode failed: {ex}") from ex
        elif name in _UNSUPPORTED_FILTERS:
            raise NotImplementedError(
                f"PDF filter {name} not supported (text-extraction "
                "subset: Flate/ASCIIHex/ASCII85/RunLength)"
            )
        else:
            raise PdfError(f"unknown PDF filter {name}")
        pred = p.get("Predictor", 1) if isinstance(p, dict) else 1
        if isinstance(pred, int) and pred >= 10:
            raw = _png_predictor(
                raw, int(p.get("Columns", 1)), int(p.get("Colors", 1)),
                int(p.get("BitsPerComponent", 8)),
            )
        elif pred not in (1, None):
            raise PdfError(f"unsupported predictor {pred}")
    return raw


# --- encryption (Standard security handler, §7.6) -----------------------------

#: §7.6.3.3 padding constant
_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (the published algorithm; pinned against the
    RFC 6229 test vectors in tests/test_pdf.py)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


from functools import lru_cache


@lru_cache(maxsize=64)
def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """PDF 2.0 Algorithm 2.B (R6 password hash): SHA-256 seeded, then
    ≥64 rounds of AES-128-CBC over 64 repeats with the digest
    algorithm hopping SHA-256/384/512 by the ciphertext sum mod 3,
    until round ≥ 64 and the last ciphertext byte ≤ round - 32.
    Cached: a corpus of same-credential documents derives the same
    hashes, and ~1 s of pure-Python AES per call must not repeat."""
    import hashlib as _hl

    from dolphinbeat_spark.operators.aes import aes_cbc_encrypt

    k = _hl.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, add_padding=False)
        mod = sum(e[:16]) % 3
        k = (_hl.sha256, _hl.sha384, _hl.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _std_encryption_key(pw: bytes, o: bytes, p: int, id0: bytes,
                        r: int, length: int) -> bytes:
    """§7.6.3.3 Algorithm 2: the file encryption key."""
    import hashlib as _hl

    h = _hl.md5(
        _pad_password(pw) + o[:32]
        + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = _hl.md5(h[:length]).digest()
    return h[:length]


def _check_user_password(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    """§7.6.3.4 Algorithms 4 (R2) / 5 (R3): recompute /U and compare."""
    import hashlib as _hl

    if r == 2:
        return _rc4(key, _PAD) == u[:32]
    h = _hl.md5(_PAD + id0).digest()
    h = _rc4(key, h)
    for i in range(1, 20):
        h = _rc4(bytes(b ^ i for b in key), h)
    return h == u[:16]


def _make_owner_value(owner_pw: bytes, user_pw: bytes, r: int,
                      length: int) -> bytes:
    """§7.6.3.4 Algorithm 3: the /O entry (writer mirror)."""
    import hashlib as _hl

    h = _hl.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = _hl.md5(h).digest()
    rc4_key = h[:length]
    o = _rc4(rc4_key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in rc4_key), o)
    return o


def _make_user_value(key: bytes, id0: bytes, r: int) -> bytes:
    """§7.6.3.4 Algorithms 4/5: the /U entry (writer mirror)."""
    import hashlib as _hl

    if r == 2:
        return _rc4(key, _PAD)
    h = _hl.md5(_PAD + id0).digest()
    h = _rc4(key, h)
    for i in range(1, 20):
        h = _rc4(bytes(b ^ i for b in key), h)
    return h + bytes(16)  # 32-byte entry, tail arbitrary per spec


# --- document ----------------------------------------------------------------


class PdfDocument:
    """Parsed xref map + lazy object loader over one PDF byte string."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PdfError("missing %PDF- header")
        self.data = data
        self.trailer: dict = {}
        #: obj num -> ("n", byte_offset) | ("o", objstm_num, idx)
        self.xref: dict[int, tuple] = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._enc_key: bytes | None = None
        self._enc_aes = False
        self._enc_v5 = False
        self._load_xref_chain()
        if "Encrypt" in self.trailer:
            self._enc_key = self._setup_encryption()

    def _setup_encryption(self) -> bytes:
        """Standard security handler (§7.6.3) with the EMPTY user
        password — owner-restricted documents every viewer opens:
        RC4 V1/V2 R2/R3, AESV2 (V4 R4, AES-128-CBC) and AESV3
        (V5 R5/R6, AES-256 with the Algorithm 2.B iterated hash) via
        the from-scratch FIPS-197 implementation in operators/aes.py
        (r11). Password-protected files raise by name. The /Encrypt dict itself and xref
        streams are never encrypted (§7.5.8.2), so resolving it here
        is safe."""
        enc = self.resolve(self.trailer["Encrypt"])
        if not isinstance(enc, dict):
            raise PdfError("/Encrypt is not a dictionary")
        filt = str(enc.get("Filter", ""))
        v = enc.get("V", 0)
        r = enc.get("R", 0)
        if filt == "Standard" and v == 5 and r in (5, 6):
            return self._setup_encryption_v5(enc, r)
        if filt == "Standard" and v == 4 and r == 4:
            cf = self.resolve(enc.get("CF"))
            std = self.resolve(cf.get("StdCF")) if isinstance(cf, dict) \
                else None
            cfm = str(std.get("CFM", "")) if isinstance(std, dict) else ""
            if cfm == "AESV2":
                self._enc_aes = True
                length = 16
            elif cfm == "V2":  # V4 container around plain RC4
                length = int(std.get("Length", 16))
                if length > 16:
                    length //= 8  # some writers store bits here
            else:
                raise NotImplementedError(
                    f"PDF crypt filter {cfm!r} not supported "
                    "(AESV2 and V2/RC4 under V4; AESV3 under V5)"
                )
            for slot in ("StmF", "StrF"):
                if str(enc.get(slot, "Identity")) != "StdCF":
                    raise NotImplementedError(
                        f"PDF /{slot} {enc.get(slot)!r} not supported "
                        "(single StdCF filter only)"
                    )
        elif filt != "Standard" or v not in (1, 2) or r not in (2, 3):
            raise NotImplementedError(
                f"PDF encryption Filter={filt!r} V={v} R={r} not "
                "supported (Standard-handler RC4 V1/V2 R2/R3, AESV2 "
                "V4 R4, AESV3 V5 R5/R6)"
            )
        else:
            length = int(enc.get("Length", 40)) // 8 if v == 2 else 5
        o = enc.get("O")
        u = enc.get("U")
        p = enc.get("P")
        if not isinstance(o, bytes) or not isinstance(u, bytes) \
                or not isinstance(p, int):
            raise PdfError("/Encrypt missing O/U/P entries")
        ids = self.resolve(self.trailer.get("ID"))
        id0 = ids[0] if isinstance(ids, list) and ids and \
            isinstance(ids[0], bytes) else b""
        extra = b""
        if v == 4 and self.resolve(enc.get("EncryptMetadata")) is False:
            extra = b"\xff\xff\xff\xff"  # Algorithm 2 step f
        key = _std_encryption_key(b"", o, p, id0 + extra, r, length)
        if not _check_user_password(key, u, id0, r):
            raise NotImplementedError(
                "password-protected PDF: the empty user password does "
                "not validate against /U"
            )
        return key

    def _setup_encryption_v5(self, enc: dict, r: int) -> bytes:
        """AESV3 (V5 R5/R6, AES-256): validate the EMPTY user password
        against /U (R6 via the Algorithm 2.B iterated hash, R5 via the
        deprecated plain SHA-256), then unwrap the file key from /UE
        with AES-256-CBC (zero IV, no padding). V5 uses the FILE key
        for every object — no per-object derivation."""
        import hashlib as _hl

        from dolphinbeat_spark.operators.aes import aes_cbc_decrypt

        cf = self.resolve(enc.get("CF"))
        std = self.resolve(cf.get("StdCF")) if isinstance(cf, dict) \
            else None
        cfm = str(std.get("CFM", "")) if isinstance(std, dict) else ""
        if cfm != "AESV3":
            raise NotImplementedError(
                f"V5 crypt filter {cfm!r} not supported (AESV3 only)"
            )
        u = enc.get("U")
        ue = enc.get("UE")
        if not isinstance(u, bytes) or len(u) < 48 \
                or not isinstance(ue, bytes) or len(ue) != 32:
            raise PdfError("/Encrypt V5 missing 48-byte /U or /UE")
        vsalt, ksalt = u[32:40], u[40:48]

        def pw_hash(salt: bytes) -> bytes:
            if r == 6:
                return _hash_2b(b"", salt, b"")
            return _hl.sha256(salt).digest()  # R5: sha256(pw + salt)

        if pw_hash(vsalt) != u[:32]:
            raise NotImplementedError(
                "password-protected PDF: the empty user password does "
                "not validate against /U (AESV3)"
            )
        key = aes_cbc_decrypt(pw_hash(ksalt), bytes(16), ue,
                              strip_padding=False)
        # /Perms sanity when present (AES-256-ECB of the perms block)
        perms = enc.get("Perms")
        if isinstance(perms, bytes) and len(perms) == 16:
            from dolphinbeat_spark.operators.aes import AES

            blk = AES(key).decrypt_block(perms)
            if blk[9:12] != b"adb":
                raise PdfError("/Perms block fails to decrypt (bad key)")
        self._enc_aes = True
        self._enc_v5 = True
        return key

    def _object_key(self, num: int, gen: int = 0) -> bytes:
        import hashlib as _hl

        if getattr(self, "_enc_v5", False):
            return self._enc_key  # V5: the file key, no derivation
        base = self._enc_key + num.to_bytes(3, "little") \
            + gen.to_bytes(2, "little")
        if self._enc_aes:
            base += b"sAlT"  # §7.6.2 AES salt
        return _hl.md5(base).digest()[:min(len(self._enc_key) + 5, 16)]

    def _decrypt_data(self, key: bytes, data: bytes) -> bytes:
        """One string/stream through the active cipher: RC4, or
        AESV2's IV-prefixed AES-128-CBC with PKCS#7 padding."""
        if not self._enc_aes:
            return _rc4(key, data)
        from dolphinbeat_spark.operators.aes import (
            AesError,
            aes_cbc_decrypt,
        )

        # wild AES-encrypted PDFs commonly store empty strings () as
        # zero length rather than IV + one padding block; an IV-only
        # 16-byte payload is the other observed empty-string shape
        if len(data) == 0 or len(data) == 16:
            return b""
        if len(data) < 32 or len(data) % 16:
            raise PdfError(
                f"AESV2 data length {len(data)} is not IV + blocks"
            )
        try:
            return aes_cbc_decrypt(key, data[:16], data[16:])
        except AesError as ex:
            raise PdfError(f"AESV2 decrypt failed: {ex}") from ex

    def _decrypt_obj(self, obj, key: bytes):
        """Recursively decrypt every string in a parsed object."""
        if isinstance(obj, bytes):
            return self._decrypt_data(key, obj)
        if isinstance(obj, list):
            return [self._decrypt_obj(x, key) for x in obj]
        if isinstance(obj, dict):
            return {k: self._decrypt_obj(v, key) for k, v in obj.items()}
        return obj

    # -- xref walk --
    def _load_xref_chain(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref[\x00\t\n\x0c\r ]+(\d+)", tail):
            pass
        if m is None:
            raise PdfError("startxref not found")
        offset = int(m.group(1))
        seen = set()
        while offset is not None:
            if offset in seen or offset >= len(self.data):
                raise PdfError("cyclic or out-of-range xref chain")
            seen.add(offset)
            offset = self._load_xref_section(offset)

    def _load_xref_section(self, offset: int) -> int | None:
        pos = _skip_ws(self.data, offset)
        if self.data[pos:pos + 4] == b"xref":
            trailer = self._load_xref_table(pos + 4)
        else:
            trailer = self._load_xref_stream(pos)
        for k, v in trailer.items():
            self.trailer.setdefault(k, v)  # newest section wins
        # hybrid-reference file: the classic table's trailer points at
        # an additional xref STREAM carrying the objstm entries
        if "XRefStm" in trailer:
            self._load_xref_section(int(trailer["XRefStm"]))
        prev = trailer.get("Prev")
        return int(prev) if prev is not None else None

    def _load_xref_table(self, pos: int) -> dict:
        data = self.data
        while True:
            pos = _skip_ws(data, pos)
            if data[pos:pos + 7] == b"trailer":
                t, _ = _parse_object(data, pos + 7)
                if not isinstance(t, dict):
                    raise PdfError("trailer is not a dictionary")
                return t
            m = re.match(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)", data[pos:pos + 40])
            if not m:
                raise PdfError(f"bad xref subsection header at {pos}")
            start, count = int(m.group(1)), int(m.group(2))
            pos = _skip_ws(data, pos + m.end())
            for i in range(count):
                ent = data[pos:pos + 20]
                em = re.match(rb"(\d{10})[\x00\t\n\x0c\r ](\d{5})[\x00\t\n\x0c\r ]([nf])", ent)
                if not em:
                    raise PdfError(f"bad xref entry at {pos}")
                if em.group(3) == b"n":
                    self.xref.setdefault(start + i, ("n", int(em.group(1))))
                pos += 20

    def _load_xref_stream(self, pos: int) -> dict:
        num, _gen, sdict, raw = self._parse_indirect_at(pos)
        if raw is None or not isinstance(sdict, dict) \
                or str(sdict.get("Type", "")) != "XRef":
            raise PdfError("expected an /XRef stream at xref offset")
        content = _apply_filters(
            raw, sdict.get("Filter"), sdict.get("DecodeParms")
        )
        w = [int(x) for x in sdict.get("W", [])]
        if len(w) != 3:
            raise PdfError(f"bad /W in xref stream: {w}")
        size = sdict.get("Size")
        if not isinstance(size, int):
            raise PdfError("xref stream missing /Size")
        index = [int(x) for x in sdict.get("Index", [0, size])]
        rowlen = sum(w)
        p = 0
        for si in range(0, len(index), 2):
            start, count = index[si], index[si + 1]
            for i in range(count):
                if p + rowlen > len(content):
                    raise PdfError("xref stream data truncated")
                fields = []
                for width in w:
                    fields.append(
                        int.from_bytes(content[p:p + width], "big")
                        if width else None
                    )
                    p += width
                ftype = fields[0] if w[0] else 1
                if ftype == 1:
                    self.xref.setdefault(start + i, ("n", fields[1]))
                elif ftype == 2:
                    self.xref.setdefault(
                        start + i, ("o", fields[1], fields[2])
                    )
                # type 0 (free): skipped
        return sdict

    # -- object loading --
    def _parse_indirect_at(self, pos: int):
        """``num gen obj`` at pos -> (num, gen, obj, stream_bytes|None);
        for non-stream objects stream_bytes is None and obj is the
        value.  The generation number participates in the per-object
        decryption key (Algorithm 1, §7.6.2), so it is carried out."""
        data = self.data
        m = re.match(
            rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj",
            data[pos:pos + 40],
        )
        if not m:
            raise PdfError(f"indirect object header missing at {pos}")
        num = int(m.group(1))
        gen = int(m.group(2))
        obj, p2 = _parse_object(data, pos + m.end())
        p2 = _skip_ws(data, p2)
        if data[p2:p2 + 6] == b"stream":
            if not isinstance(obj, dict):
                raise PdfError("stream keyword after a non-dictionary")
            p2 += 6
            if data[p2:p2 + 2] == b"\r\n":
                p2 += 2
            elif data[p2:p2 + 1] in (b"\n", b"\r"):
                p2 += 1
            length = self.resolve(obj.get("Length"))
            if not isinstance(length, int):
                raise PdfError("stream /Length missing or unresolvable")
            raw = data[p2:p2 + length]
            if len(raw) != length:
                raise PdfError("stream data truncated")
            return num, gen, obj, raw
        return num, gen, obj, None

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            return None  # per spec: missing object is null
        if ent[0] == "n":
            got_num, gen, obj, raw = self._parse_indirect_at(ent[1])
            if got_num != num:
                raise PdfError(
                    f"xref points object {num} at object {got_num}"
                )
            if self._enc_key is not None:
                # strings and stream bytes are encrypted per object
                # (§7.6.2); objects INSIDE object streams come out
                # plaintext once the objstm stream is decrypted
                key = self._object_key(num, gen)
                obj = self._decrypt_obj(obj, key)
                if raw is not None:
                    raw = self._decrypt_data(key, raw)
            val = ("stream", obj, raw) if raw is not None else obj
        else:
            _, stm_num, idx = ent
            val = self._objstm_object(stm_num, idx)
        self._cache[num] = val
        return val

    def _objstm_object(self, stm_num: int, idx: int):
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            stm = self.get_object(stm_num)
            if not (isinstance(stm, tuple) and stm[0] == "stream"):
                raise PdfError(f"object stream {stm_num} is not a stream")
            sdict, raw = stm[1], stm[2]
            if str(sdict.get("Type", "")) != "ObjStm":
                raise PdfError(f"object {stm_num} is not /Type /ObjStm")
            content = _apply_filters(
                raw, sdict.get("Filter"), sdict.get("DecodeParms")
            )
            n_objs = self.resolve(sdict.get("N"))
            first = self.resolve(sdict.get("First"))
            if not isinstance(n_objs, int) or not isinstance(first, int):
                raise PdfError("object stream missing /N or /First")
            pairs = []
            p = 0
            for _ in range(n_objs):
                onum, p = _parse_object(content, p)
                ooff, p = _parse_object(content, p)
                pairs.append((int(onum), int(ooff)))
            objs = []
            for onum, ooff in pairs:
                val, _ = _parse_object(content, first + ooff)
                objs.append(val)
            self._objstm_cache[stm_num] = objs
        if idx >= len(objs):
            raise PdfError(f"object-stream index {idx} out of range")
        return objs[idx]

    def resolve(self, obj, depth: int = 0):
        while isinstance(obj, _Ref):
            if depth > 32:
                raise PdfError("reference chain too deep")
            obj = self.get_object(obj.num)
            depth += 1
        return obj

    def stream_data(self, obj) -> bytes:
        obj = self.resolve(obj)
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise PdfError("expected a stream object")
        sdict, raw = obj[1], obj[2]
        return _apply_filters(
            raw, self.resolve(sdict.get("Filter")),
            self.resolve(sdict.get("DecodeParms")),
        )

    # -- page tree --
    def pages(self) -> list[tuple[dict, dict]]:
        """Depth-first page list -> [(page_dict, inherited_resources)]."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("trailer /Root missing or not a dictionary")
        top = self.resolve(root.get("Pages"))
        out: list[tuple[dict, dict]] = []
        seen: set[int] = set()

        def walk(node, resources, depth):
            if depth > 64:
                raise PdfError("page tree too deep")
            node = self.resolve(node)
            if isinstance(node, tuple) and node[0] == "stream":
                raise PdfError("stream object in the page tree")
            if not isinstance(node, dict):
                raise PdfError("page tree node is not a dictionary")
            nid = id(node)
            if nid in seen:
                raise PdfError("cycle in the page tree")
            seen.add(nid)
            res = self.resolve(node.get("Resources")) or resources
            t = str(node.get("Type", ""))
            if t == "Page" or ("Kids" not in node and t != "Pages"):
                out.append((node, res if isinstance(res, dict) else {}))
                return
            for kid in self.resolve(node.get("Kids")) or []:
                walk(kid, res, depth + 1)

        walk(top, {}, 0)
        return out


# --- content-stream text interpreter -----------------------------------------


_HEX_PAIR_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(
    rb"beginbfrange(.*?)endbfrange", re.S
)
_BFRANGE_ROW_RE = re.compile(
    rb"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*"
    rb"(<[0-9A-Fa-f\s]+>|\[[^\]]*\])", re.S
)


def _hex_bytes(h: bytes) -> bytes:
    hx = re.sub(rb"\s", b"", h)
    if len(hx) % 2:
        hx += b"0"  # odd final digit: implied 0, as in hex strings
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as ex:
        raise PdfError(f"bad CMap hex {h[:16]!r}: {ex}") from ex


def _dst_text(h: bytes) -> str:
    return _hex_bytes(h).decode("utf-16-be", "replace")


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """A /ToUnicode CMap stream -> {2-byte code: unicode string}.
    Handles bfchar pairs and bfrange (consecutive and array
    destination forms) per Adobe's CMap/ToUnicode specification —
    multi-char UTF-16BE destinations (ligatures, surrogate pairs)
    included."""
    out: dict[int, str] = {}
    for block in _BFCHAR_RE.findall(data):
        hexes = _HEX_PAIR_RE.findall(block)
        for i in range(0, len(hexes) - 1, 2):
            src = _hex_bytes(hexes[i])
            out[int.from_bytes(src, "big")] = _dst_text(hexes[i + 1])
    for block in _BFRANGE_RE.findall(data):
        for lo_h, hi_h, dst in _BFRANGE_ROW_RE.findall(block):
            lo = int.from_bytes(_hex_bytes(lo_h), "big")
            hi = int.from_bytes(_hex_bytes(hi_h), "big")
            if hi < lo or hi - lo > 0xFFFF:
                raise PdfError(f"bad bfrange {lo:#x}..{hi:#x}")
            if dst.startswith(b"["):
                dsts = _HEX_PAIR_RE.findall(dst)
                for k, d in enumerate(dsts):
                    if lo + k <= hi:
                        out[lo + k] = _dst_text(d)
            else:
                base = _hex_bytes(dst.strip(b"<>"))
                base_cp = base.decode("utf-16-be", "replace")
                for k in range(hi - lo + 1):
                    if len(base_cp) == 1:  # increment the code point
                        out[lo + k] = chr(ord(base_cp) + k)
                    else:  # multi-char base: spec increments last unit
                        out[lo + k] = base_cp[:-1] + chr(
                            ord(base_cp[-1]) + k
                        )
    return out


#: predefined CMap -> Python codec for TEXT recovery (r14). For text
#: extraction the published code->CID tables are unnecessary: each
#: legacy CMap's CODE SPACE is a standard character set the show
#: strings are literally encoded in (Adobe CMap resources name their
#: source charsets), so decoding the bytes with that codec IS the
#: code->unicode mapping; the CID step only matters for glyph lookup.
#: The Uni*-UCS2/UTF16 families make the identity explicit: their
#: codes ARE UTF-16BE units. Keys are base names; -H/-V strip first.
_PREDEFINED_CMAP_CODECS: dict[str, str] = {
    # Japanese (Adobe-Japan1)
    "90ms-RKSJ": "shift_jis", "90msp-RKSJ": "shift_jis",
    "90pv-RKSJ": "shift_jis", "83pv-RKSJ": "shift_jis",
    "Ext-RKSJ": "shift_jis", "Add-RKSJ": "shift_jis",
    "EUC": "euc_jp",
    "UniJIS-UCS2": "utf_16_be", "UniJIS-UCS2-HW": "utf_16_be",
    "UniJIS-UTF16": "utf_16_be", "UniJIS2004-UTF16": "utf_16_be",
    # Simplified Chinese (Adobe-GB1)
    "GB-EUC": "gb2312", "GBpc-EUC": "gb2312",
    "GBK-EUC": "gbk", "GBKp-EUC": "gbk", "GBK2K": "gb18030",
    "UniGB-UCS2": "utf_16_be", "UniGB-UTF16": "utf_16_be",
    # Traditional Chinese (Adobe-CNS1)
    "B5pc": "big5", "ETen-B5": "big5", "ETenms-B5": "big5",
    "HKscs-B5": "big5hkscs",
    "UniCNS-UCS2": "utf_16_be", "UniCNS-UTF16": "utf_16_be",
    # Korean (Adobe-Korea1/KR)
    "KSC-EUC": "euc_kr", "KSCms-UHC": "cp949",
    "KSCms-UHC-HW": "cp949",
    "UniKS-UCS2": "utf_16_be", "UniKS-UTF16": "utf_16_be",
}


def _predefined_cmap_codec(enc: str) -> str | None:
    """CMap name -> codec (module table), stripping the writing-mode
    suffix; None when the name is not a known predefined CMap."""
    base = enc
    if base.endswith(("-H", "-V")):
        base = base[:-2]
    return _PREDEFINED_CMAP_CODECS.get(base)


class _PartialCidCmap(dict):
    """CID→unicode map covering only the ordering's published ASCII
    slice of a CID-keyed CFF (no /ToUnicode, names unrecoverable past
    the slice). A show code outside the slice means the page's real
    text would degrade to replacement-character noise — raise by name
    instead of silently emitting it (ADVICE r15). CID 0 (.notdef)
    stays quiet: writers emit it for blank glyphs."""

    collection: str = ""


def _type0_cmap_from_font(doc: PdfDocument, f: dict,
                          fname: str) -> dict[int, str]:
    """A Type0 font WITHOUT /ToUnicode -> {2-byte code: unicode} via
    the embedded font's own tables: a TrueType /FontFile2's cmap
    inverted through /CIDToGIDMap (r13), or a CFF /FontFile3's
    charset glyph names resolved through the Adobe Glyph List (r14 —
    for a non-CID-keyed CFF the CIDs double as GIDs, PDF 32000-1
    §9.7.4.2). This is how CJK/Latin-subset PDFs from non-Adobe
    toolchains (which routinely omit /ToUnicode) keep their text
    recoverable. Boundaries stay named: CID-keyed CFF (glyphs carry
    no names; unicode needs the registry's published CID->Unicode
    resources) and fonts embedding nothing at all. Predefined
    non-Identity CMaps never reach here (_font_map decodes their
    show strings with the code space's own codec)."""
    from dolphinbeat_spark.operators.truetype import (
        TrueTypeError, parse_ttf_cmap,
    )

    enc = str(doc.resolve(f.get("Encoding", "")))
    if enc not in ("Identity-H", "Identity-V"):
        raise NotImplementedError(
            f"Type0 font {fname!r} without /ToUnicode uses the "
            f"unrecognized CMap {enc!r}: only Identity-H/V and the "
            "predefined CJK CMap families are supported"
        )
    dfs = doc.resolve(f.get("DescendantFonts"))
    df = doc.resolve(dfs[0]) if isinstance(dfs, list) and dfs else None
    fd = doc.resolve(df.get("FontDescriptor")) \
        if isinstance(df, dict) else None
    ff2 = fd.get("FontFile2") if isinstance(fd, dict) else None
    ff3 = fd.get("FontFile3") if isinstance(fd, dict) else None
    if ff2 is None and ff3 is not None:
        from dolphinbeat_spark.operators.cff import (
            CffError, cid_latin_slice, glyph_name_to_unicode,
            parse_cff,
        )

        try:
            cff = parse_cff(doc.stream_data(ff3))
        except CffError as ex:
            raise PdfError(
                f"Type0 font {fname!r} embedded CFF: {ex}") from ex
        if cff.is_cid:
            # r15: a CID-keyed CFF names no glyphs, but its ROS names
            # the character collection — the published orderings
            # (Adobe-Japan1/GB1/CNS1/Korea1/KR) assign their low CIDs
            # algorithmically to ASCII, so that slice recovers (via
            # Identity-H, code == CID). The CJK blocks need the
            # registry's full UCS2 CMap resources: a show code past
            # the slice stays unmapped, and Adobe-Identity ROS (CIDs
            # are font-private) keeps the named raise.
            ros = cff.ros_strings()
            lat = cid_latin_slice(ros)
            if lat is None:
                raise NotImplementedError(
                    f"Type0 font {fname!r} without /ToUnicode embeds "
                    "a CID-keyed CFF with an Adobe-Identity/unknown "
                    "ROS: CIDs are font-private, so unicode is not "
                    "recoverable"
                )
            strict = _PartialCidCmap(lat)
            strict.collection = "-".join(str(x) for x in ros[:2])
            return strict
        out: dict[int, str] = {}
        for gid in range(1, cff.n_glyphs):  # CID == GID (§9.7.4.2)
            u = glyph_name_to_unicode(cff.glyph_name(gid))
            if u is not None:
                out[gid] = u
        return out
    if ff2 is None:
        raise NotImplementedError(
            f"Type0/CMap composite font {fname!r} without /ToUnicode "
            "and with no embedded font: CID text is not recoverable"
        )
    try:
        fwd = parse_ttf_cmap(doc.stream_data(ff2))
    except TrueTypeError as ex:
        raise PdfError(
            f"Type0 font {fname!r} embedded TrueType: {ex}") from ex
    # invert glyph -> code point; the smallest code point wins so the
    # recovery is deterministic when several map to one glyph
    rev: dict[int, int] = {}
    for cp in sorted(fwd, reverse=True):
        rev[fwd[cp]] = cp
    c2g = doc.resolve(df.get("CIDToGIDMap", "Identity"))
    if isinstance(c2g, tuple) and c2g and c2g[0] == "stream":
        gm = doc.stream_data(df.get("CIDToGIDMap"))
        return {
            cid: chr(rev[gid])
            for cid in range(len(gm) // 2)
            if (gid := (gm[2 * cid] << 8) | gm[2 * cid + 1]) in rev
        }
    if str(c2g) != "Identity":
        raise PdfError(
            f"Type0 font {fname!r}: /CIDToGIDMap {c2g!r} is neither "
            "Identity nor a stream")
    return {gid: chr(cp) for gid, cp in rev.items()}


def _font_map(
    doc: PdfDocument, resources: dict,
) -> dict[str, dict | str | None]:
    """Resource fonts -> {name: decode rule}: a ToUnicode cmap dict
    (Type0), a CODEC NAME string (Type0 with a predefined CJK CMap
    and no /ToUnicode — the show strings are literally in that
    charset, r14), or None (simple font, Latin-1 assumption). A
    Type0 font WITHOUT /ToUnicode and with Identity encoding falls
    back to the embedded font's own tables (TrueType cmap r13 / CFF
    charset r14, _type0_cmap_from_font); only when no recovery path
    exists does it raise by name."""
    fonts = doc.resolve(resources.get("Font")) if resources else None
    out: dict[str, dict | str | tuple | None] = {}
    if not isinstance(fonts, dict):
        return out
    for fname, fobj in fonts.items():
        f = doc.resolve(fobj)
        if isinstance(f, dict) and str(f.get("Subtype", "")) == "Type0":
            tu = f.get("ToUnicode")
            if tu is not None:
                out[fname] = _parse_tounicode(doc.stream_data(tu))
                continue
            codec = _predefined_cmap_codec(
                str(doc.resolve(f.get("Encoding", ""))))
            if codec is not None:
                out[fname] = codec
            else:
                out[fname] = _type0_cmap_from_font(doc, f, fname)
        elif isinstance(f, dict):
            out[fname] = _simple_font_decode(doc, f)
        else:
            out[fname] = None
    return out


#: simple-font base encodings -> 1-byte Python codecs (§9.6.6 + D.2;
#: WinAnsi IS cp1252 and MacRoman IS mac_roman for the printable set)
_SIMPLE_BASE_CODECS = {
    "WinAnsiEncoding": "cp1252",
    "MacRomanEncoding": "mac_roman",
    "StandardEncoding": "latin-1",  # close enough for the ASCII run;
    # non-ASCII Standard-Encoding glyphs come via /Differences in
    # practice (writers emit explicit Differences for those)
    "PDFDocEncoding": "latin-1",
}


def _simple_font_decode(doc: PdfDocument, f: dict):
    """Simple (1-byte) font -> decode rule (r14): a /ToUnicode CMap
    if present (1-byte codes), else the /Encoding entry — a base
    codec name (WinAnsi = cp1252, MacRoman = mac_roman) and/or a
    /Differences array resolved through the Adobe Glyph List
    (operators/cff.py) — the TeX-class custom-encoding layout.
    None keeps the Latin-1 default."""
    tu = f.get("ToUnicode")
    if tu is not None:
        cmap = _parse_tounicode(doc.stream_data(tu))
        return ("diff", cmap, "latin-1")
    enc = doc.resolve(f.get("Encoding"))
    if enc is None:
        return None
    if not isinstance(enc, dict):
        codec = _SIMPLE_BASE_CODECS.get(str(enc))
        return codec if codec != "latin-1" else None
    from dolphinbeat_spark.operators.cff import glyph_name_to_unicode

    base = _SIMPLE_BASE_CODECS.get(
        str(doc.resolve(enc.get("BaseEncoding", ""))), "latin-1")
    diffs = doc.resolve(enc.get("Differences"))
    table: dict[int, str] = {}
    if isinstance(diffs, list):
        code = 0
        for item in diffs:
            item = doc.resolve(item)
            if isinstance(item, (int, float)):
                code = int(item)
            else:
                u = glyph_name_to_unicode(str(item))
                if u is not None:
                    table[code] = u
                code += 1
    if not table and base == "latin-1":
        return None
    return ("diff", table, base)


def _extract_page_text(doc: PdfDocument, content: bytes,
                       fonts: dict[str, dict | None] | None = None) -> str:
    """Run the text-showing operators over one page's content.
    ``fonts`` maps resource font names to a ToUnicode cmap (Type0) or
    None (simple font: Latin-1 bytes); Tf switches the active decode.
    Type-state save/restore (q/Q) is not tracked — Tf assignments are
    linear, which is how writers emit text in practice."""
    fonts = fonts or {}
    cur_cmap: dict | str | None = None
    lines: list[list[str]] = [[]]

    def show(b: bytes) -> None:
        if cur_cmap is None:
            lines[-1].append(b.decode("latin-1"))
            return
        if isinstance(cur_cmap, str):
            # predefined CJK CMap or 1-byte base codec: the show
            # string IS text in that charset (variable-length codes
            # come free with the codec's own segmentation)
            lines[-1].append(b.decode(cur_cmap, errors="replace"))
            return
        if isinstance(cur_cmap, tuple):
            # simple font with /Differences (and/or a 1-byte
            # /ToUnicode): per-byte table lookup over a base codec
            _, table, base = cur_cmap
            lines[-1].append("".join(
                table.get(code) or bytes([code]).decode(
                    base, errors="replace")
                for code in b))
            return
        chars = []
        for i in range(0, len(b) - 1, 2):  # Identity-H: 2-byte codes
            code = (b[i] << 8) | b[i + 1]
            u = cur_cmap.get(code)
            if u is None and code != 0 and \
                    isinstance(cur_cmap, _PartialCidCmap):
                raise NotImplementedError(
                    f"CID {code} of {cur_cmap.collection} is outside "
                    "the published ASCII slice and the font has no "
                    "/ToUnicode: CJK text needs the registry's full "
                    "UCS2 CMap resources")
            chars.append(u if u is not None else
                         ("" if code == 0 and
                          isinstance(cur_cmap, _PartialCidCmap)
                          else "�"))
        if len(b) % 2:  # stray trailing byte: replacement, not a crash
            chars.append("�")
        lines[-1].append("".join(chars))

    def newline() -> None:
        if lines[-1]:
            lines.append([])

    operands: list = []
    pos = 0
    n = len(content)
    while pos < n:
        pos = _skip_ws(content, pos)
        if pos >= n:
            break
        c = content[pos]
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B or \
                _NUM_RE.match(content, pos):
            try:
                obj, pos = _parse_object(content, pos)
            except PdfError:
                pos += 1  # tolerate junk operands in wild streams
                continue
            operands.append(obj)
            continue
        km = _KEYWORD_RE.match(content, pos)
        if not km:
            pos += 1
            continue
        op = km.group(0)
        pos = km.end()
        if op == b"BI":
            # inline image (§8.9.7): its binary data could fake
            # string/operator bytes — skip it whole
            try:
                _, _, pos = _scan_inline_image(content, pos)
            except PdfError:
                # malformed inline image in a wild file: resume AFTER
                # the next whitespace-delimited EI so the binary
                # payload is not re-tokenized as operators (it would
                # leak garbage bytes into extracted text)
                m = _WS_EI_RE.search(content, pos)
                pos = m.end() if m else len(content)
            operands = []
            continue
        if op == b"BT":
            newline()
        elif op == b"Tf":
            if len(operands) >= 2 and isinstance(operands[-2], _Name):
                cur_cmap = fonts.get(str(operands[-2]))
        elif op in (b"Td", b"TD"):
            if len(operands) >= 2 and operands[-1] != 0:
                newline()
        elif op in (b"T*", b"Tm"):
            newline()
        elif op == b"Tj":
            if operands and isinstance(operands[-1], bytes):
                show(operands[-1])
        elif op == b"'":
            newline()
            if operands and isinstance(operands[-1], bytes):
                show(operands[-1])
        elif op == b'"':
            newline()
            if operands and isinstance(operands[-1], bytes):
                show(operands[-1])
        elif op == b"TJ":
            if operands and isinstance(operands[-1], list):
                for item in operands[-1]:
                    if isinstance(item, bytes):
                        show(item)
                    elif isinstance(item, (int, float)) and item <= -180:
                        lines[-1].append(" ")  # word-gap kerning
        operands = []
    return "\n".join(
        "".join(parts).strip() for parts in lines if "".join(parts).strip()
    )


@dataclass
class PdfText:
    """Result of :func:`extract_pdf_text`."""

    n_pages: int
    pages: list[str]
    title: str | None = None
    author: str | None = None
    text: str = field(init=False)

    def __post_init__(self):
        self.text = "\n\n".join(p for p in self.pages if p)


def _info_str(doc: PdfDocument, info, key: str) -> str | None:
    if not isinstance(info, dict) or key not in info:
        return None
    v = doc.resolve(info[key])
    if not isinstance(v, bytes):
        return None
    if v.startswith(b"\xfe\xff"):  # UTF-16BE text string (§7.9.2.2)
        return v[2:].decode("utf-16-be", "replace")
    return v.decode("latin-1")  # PDFDocEncoding ~ Latin-1 subset


def extract_pdf_text(data: bytes) -> PdfText:
    """PDF bytes -> per-page extracted text + metadata. Raises
    :class:`PdfError` on structural corruption and
    ``NotImplementedError`` (by name) on encryption, Type0/CMap
    fonts, and unsupported filters."""
    doc = PdfDocument(data)
    pages_out: list[str] = []
    for page, resources in doc.pages():
        fonts = _font_map(doc, resources)
        contents = doc.resolve(page.get("Contents"))
        if contents is None:
            pages_out.append("")
            continue
        parts = contents if isinstance(contents, list) else [contents]
        blob = b"\n".join(doc.stream_data(p) for p in parts)
        pages_out.append(_extract_page_text(doc, blob, fonts))
    info = doc.resolve(doc.trailer.get("Info"))
    return PdfText(
        n_pages=len(pages_out),
        pages=pages_out,
        title=_info_str(doc, info, "Title"),
        author=_info_str(doc, info, "Author"),
    )


PDF_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("page_idx", LongType()),
        StructField("n_pages", LongType()),
        StructField("title", StringType()),
        StructField("page_text", StringType()),
    ]
)


def pdf_extract(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> one row per PDF page via Arrow
    ``mapInPandas`` (map-only). The page relation is what the text
    pipeline consumes; document metadata repeats per page."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                d = extract_pdf_text(bytes(raw))
                for i, page in enumerate(d.pages):
                    rows.append((mid, i, d.n_pages, d.title, page))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PDF_SCHEMA.fields]
            )

    return df.mapInPandas(batches, PDF_SCHEMA)


# --- embedded images (XObject /Image) -----------------------------------------


@dataclass
class PdfImage:
    """One decoded image XObject from :func:`extract_pdf_images`."""

    page_idx: int
    name: str
    width: int
    height: int
    n_components: int
    img_filter: str | None
    pixels: bytes  # row-major uint8 samples, n_components per pixel


def _unpack_rows(content: bytes, width: int, height: int, bpc: int,
                 ncomp: int, name: str):
    """§8.9.5.2 sample unpacking: MSB-first sub-byte samples with
    each ROW padded to a byte boundary -> uint8 array (height,
    width*ncomp) of RAW sample values (unscaled)."""
    import numpy as np

    row_bytes = (width * ncomp * bpc + 7) // 8
    if len(content) != row_bytes * height:
        raise PdfError(
            f"image {name!r}: {len(content)} sample bytes for "
            f"{width}x{height}x{ncomp} at {bpc} bpc"
        )
    a = np.frombuffer(bytes(content), np.uint8).reshape(height, row_bytes)
    if bpc == 8:
        return a[:, :width * ncomp]
    bits = np.unpackbits(a, axis=1)
    weights = (1 << np.arange(bpc - 1, -1, -1)).astype(np.uint8)
    vals = bits.reshape(height, -1, bpc) @ weights
    return vals[:, :width * ncomp].astype(np.uint8)


def _decode_image_data(doc: "PdfDocument", name: str, raw: bytes,
                       filters: list, parms_list: list, width, height,
                       bpc, cs, image_mask, pidx: int,
                       decode=None) -> PdfImage:
    """Shared image-payload decode for XObject AND inline images:
    terminal DCTDecode via operators/jpeg, CCITTFaxDecode via
    operators/ccitt, everything else through the common filter chain.
    r12: Indexed palettes (array colorspace with string/stream
    lookup), sub-8-bit (1/2/4) sample rows with §8.9.5.2 MSB-first
    row-padded unpacking, and /ImageMask stencils (emitted as 0/255
    gray honoring a reversed /Decode [1 0])."""
    from dolphinbeat_spark.operators.jpeg import JpegError, decode_jpeg

    if not isinstance(width, int) or not isinstance(height, int):
        raise PdfError(f"image {name!r} lacks /Width or /Height")
    last = str(filters[-1]) if filters and filters[-1] is not None \
        else None
    if last == "DCTDecode":
        pre = raw if len(filters) <= 1 else _apply_filters(
            raw, filters[:-1], parms_list[:-1]
        )
        try:
            w, h, arr = decode_jpeg(bytes(pre))
        except JpegError as ex:
            raise PdfError(f"DCTDecode image {name!r}: {ex}") from ex
        if (w, h) != (width, height):
            raise PdfError(
                f"image {name!r}: JPEG is {w}x{h}, dictionary "
                f"says {width}x{height}"
            )
        ncomp = 1 if arr.ndim == 2 else int(arr.shape[2])
        return PdfImage(pidx, name, width, height, ncomp,
                        "DCTDecode", arr.tobytes())
    if last == "CCITTFaxDecode":
        import numpy as _np

        from dolphinbeat_spark.operators.ccitt import (
            CcittError,
            ccitt_decode,
        )

        pre = raw if len(filters) <= 1 else _apply_filters(
            raw, filters[:-1], parms_list[:-1]
        )
        p = doc.resolve(parms_list[-1]) if parms_list else None
        p = p if isinstance(p, dict) else {}
        k = doc.resolve(p.get("K", 0))
        cols = doc.resolve(p.get("Columns", 1728))
        nrows = doc.resolve(p.get("Rows", height))
        ba = bool(doc.resolve(p.get("EncodedByteAlign", False)))
        black1 = bool(doc.resolve(p.get("BlackIs1", False)))
        if (cols, nrows) != (width, height):
            raise PdfError(
                f"image {name!r}: CCITT parms say {cols}x{nrows},"
                f" dictionary says {width}x{height}"
            )
        mode = "g4" if k < 0 else ("g3-2d" if k > 0 else "g3-1d")
        try:
            ink = ccitt_decode(bytes(pre), cols, nrows,
                               mode=mode, byte_align=ba)
        except CcittError as ex:
            raise PdfError(
                f"CCITTFaxDecode image {name!r}: {ex}"
            ) from ex
        # BlackIs1 picks the decoded bit sense (§7.4.6); the 1-bit
        # DeviceGray sample then IS the gray level
        sample_bits = ink if black1 else 1 - ink
        return PdfImage(
            pidx, name, width, height, 1, "CCITTFaxDecode",
            (sample_bits.astype(_np.uint8) * 255).tobytes(),
        )
    if last == "JBIG2Decode":
        import numpy as _np

        from dolphinbeat_spark.operators.jbig2 import (
            Jbig2Error,
            decode_jbig2_embedded,
        )

        pre = raw if len(filters) <= 1 else _apply_filters(
            raw, filters[:-1], parms_list[:-1]
        )
        p = doc.resolve(parms_list[-1]) if parms_list else None
        p = p if isinstance(p, dict) else {}
        gref = p.get("JBIG2Globals")
        gdata = doc.stream_data(gref) if gref is not None else None
        try:
            ink = decode_jbig2_embedded(bytes(pre), gdata)
        except Jbig2Error as ex:
            raise PdfError(f"JBIG2Decode image {name!r}: {ex}") from ex
        gh, gw = ink.shape
        if (gw, gh) != (width, height):
            raise PdfError(
                f"image {name!r}: JBIG2 page is {gw}x{gh}, "
                f"dictionary says {width}x{height}"
            )
        # §7.4.7: the filter's 1-bits are black; the 1-bit DeviceGray
        # sample is the gray level, so invert (same sense as the
        # CCITT default-BlackIs1=false path above)
        return PdfImage(
            pidx, name, width, height, 1, "JBIG2Decode",
            ((1 - ink).astype(_np.uint8) * 255).tobytes(),
        )
    if last == "JPXDecode":
        import numpy as _np

        from dolphinbeat_spark.operators.jpx import JpxError, decode_jpx

        pre = raw if len(filters) <= 1 else _apply_filters(
            raw, filters[:-1], parms_list[:-1]
        )
        try:
            w, h, arr = decode_jpx(bytes(pre))
        except JpxError as ex:
            raise PdfError(f"JPXDecode image {name!r}: {ex}") from ex
        if (w, h) != (width, height):
            raise PdfError(
                f"image {name!r}: JPX is {w}x{h}, dictionary "
                f"says {width}x{height}"
            )
        # §7.4.9: the JPX codestream's own geometry wins; component
        # count comes from the decoded image. PdfImage.pixels is
        # row-major uint8 samples by contract — 9-16-bit JPX
        # components come back as uint16, so mirror the raw-path
        # convention (r12): keep the high byte.
        if arr.dtype == _np.uint16:
            arr = (arr >> 8).astype(_np.uint8)
        return PdfImage(pidx, name, width, height,
                        int(arr.shape[2]), "JPXDecode",
                        arr.tobytes())
    content = _apply_filters(raw, filters, parms_list)
    import numpy as np

    if image_mask is True:
        # §8.9.6.2 stencil: 1 bit per sample by definition; /Decode
        # [0 1] (default) paints where the sample is 0 — emit the
        # painted bits as black (0) on white (255) gray
        if bpc not in (1, None):
            raise PdfError(
                f"image mask {name!r} declares {bpc} bits per component"
            )
        bits = _unpack_rows(content, width, height, 1, 1, name)
        dec = doc.resolve(decode) if decode is not None else None
        if isinstance(dec, list) and len(dec) == 2 \
                and [float(doc.resolve(v)) for v in dec] == [1.0, 0.0]:
            bits = 1 - bits
        return PdfImage(pidx, name, width, height, 1, last,
                        (bits * 255).astype(np.uint8).tobytes())
    if bpc not in (1, 2, 4, 8, 16):
        raise NotImplementedError(
            f"PDF image {name!r}: {bpc}-bit samples not "
            "supported (1/2/4/8/16)"
        )
    cs = doc.resolve(cs)
    if isinstance(cs, list) and cs and str(cs[0]) == "ICCBased":
        # §8.6.5.5: the ICC profile's /N names the component count;
        # the profile itself is presentation (we emit device samples
        # like every extraction pipeline does)
        if len(cs) < 2:
            raise PdfError(f"image {name!r}: ICCBased without a stream")
        icc = doc.resolve(cs[1])
        n = doc.resolve(icc[1].get("N")) if isinstance(icc, tuple) \
            and icc[0] == "stream" else None
        cs = {1: "DeviceGray", 3: "DeviceRGB", 4: "DeviceCMYK"}.get(n)
        if cs is None:
            raise PdfError(f"image {name!r}: ICCBased /N {n!r} invalid")
    if bpc == 16:
        # §8.9.5.2 allows 16-bit samples; emit the high byte (what
        # 8-bit rendering pipelines use)
        ncomp16 = {"DeviceGray": 1, "DeviceRGB": 3,
                   "DeviceCMYK": 4}.get(str(cs))
        if ncomp16 is None:
            raise NotImplementedError(
                f"image {name!r}: 16-bit samples only for device "
                "colorspaces"
            )
        if len(content) != width * height * ncomp16 * 2:
            raise PdfError(
                f"image {name!r}: {len(content)} bytes for 16-bit "
                f"{width}x{height}x{ncomp16}"
            )
        hi = bytes(content)[0::2]
        return PdfImage(pidx, name, width, height, ncomp16, last, hi)
    if isinstance(cs, list) and cs and str(cs[0]) in ("Indexed", "I"):
        # §8.6.6.3 [/Indexed base hival lookup]
        if len(cs) != 4:
            raise PdfError(f"image {name!r}: malformed Indexed colorspace")
        base = doc.resolve(cs[1])
        hival = doc.resolve(cs[2])
        lookup = doc.resolve(cs[3])
        bn = {"DeviceGray": 1, "DeviceRGB": 3, "DeviceCMYK": 4,
              "G": 1, "RGB": 3, "CMYK": 4}.get(str(base))
        if bn is None:
            raise NotImplementedError(
                f"image {name!r}: Indexed base colorspace {base!r} "
                "not supported (device colorspaces only)"
            )
        if isinstance(lookup, tuple) and lookup[0] == "stream":
            lookup = doc.stream_data(lookup)
        if not isinstance(lookup, (bytes, bytearray)):
            raise PdfError(
                f"image {name!r}: Indexed lookup is not a string/stream"
            )
        if not isinstance(hival, int) or hival < 0 or hival > 255:
            raise PdfError(f"image {name!r}: bad Indexed hival {hival!r}")
        if len(lookup) < (hival + 1) * bn:
            raise PdfError(
                f"image {name!r}: Indexed lookup has {len(lookup)} "
                f"bytes for hival {hival} x {bn}"
            )
        idx = _unpack_rows(content, width, height, bpc, 1, name)
        palette = np.frombuffer(
            bytes(lookup[:(hival + 1) * bn]), np.uint8
        ).reshape(hival + 1, bn)
        # §8.6.6.3: out-of-range index values use the nearest bound
        pixels = palette[np.minimum(idx, hival)]
        return PdfImage(pidx, name, width, height, bn, last,
                        pixels.tobytes())
    ncomp = {"DeviceGray": 1, "DeviceRGB": 3,
             "DeviceCMYK": 4}.get(str(cs))
    if ncomp is None:
        raise NotImplementedError(
            f"PDF image colorspace {cs!r} not supported "
            "(DeviceGray/DeviceRGB/DeviceCMYK/Indexed)"
        )
    if bpc == 8:
        if len(content) != width * height * ncomp:
            raise PdfError(
                f"image {name!r}: {len(content)} sample bytes for "
                f"{width}x{height}x{ncomp}"
            )
        return PdfImage(pidx, name, width, height, ncomp, last,
                        bytes(content))
    if ncomp != 1:
        raise NotImplementedError(
            f"image {name!r}: {bpc}-bit samples only supported for "
            "single-component colorspaces"
        )
    vals = _unpack_rows(content, width, height, bpc, 1, name)
    # exact §8.9.5.2 expansion to 8-bit: x * 255/(2^bpc - 1)
    scale = 255 // ((1 << bpc) - 1)
    return PdfImage(pidx, name, width, height, 1, last,
                    (vals * scale).astype(np.uint8).tobytes())


#: §8.9.7 abbreviated inline-image keys / filters / colorspaces
_INLINE_KEYS = {"W": "Width", "H": "Height", "BPC": "BitsPerComponent",
                "CS": "ColorSpace", "F": "Filter", "DP": "DecodeParms",
                "IM": "ImageMask", "D": "Decode", "I": "Interpolate"}
_INLINE_FILTERS = {"AHx": "ASCIIHexDecode", "A85": "ASCII85Decode",
                   "LZW": "LZWDecode", "Fl": "FlateDecode",
                   "RL": "RunLengthDecode", "CCF": "CCITTFaxDecode",
                   "DCT": "DCTDecode"}
_INLINE_CS = {"G": "DeviceGray", "RGB": "DeviceRGB", "CMYK": "DeviceCMYK",
              "I": "Indexed"}
_WS_EI_RE = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)")


def _scan_inline_image(content: bytes, pos: int):
    """Parse one inline image starting just after its ``BI`` keyword:
    -> (expanded dict, data bytes, position after EI)."""
    d: dict = {}
    while True:
        pos = _skip_ws(content, pos)
        if content[pos:pos + 2] == b"ID" and (
                pos + 2 >= len(content) or content[pos + 2] in _WS):
            pos += 3  # ID + exactly one whitespace byte (§8.9.7)
            break
        key, pos = _parse_object(content, pos)
        if not isinstance(key, _Name):
            raise PdfError(f"inline image key is not a name: {key!r}")
        val, pos = _parse_object(content, pos)
        d[_INLINE_KEYS.get(str(key), str(key))] = val
    filt = d.get("Filter")
    filters = filt if isinstance(filt, list) else (
        [filt] if filt is not None else [])
    filters = [_Name(_INLINE_FILTERS.get(str(f), str(f)))
               for f in filters if f is not None]
    d["Filter"] = filters
    cs = d.get("ColorSpace")
    if isinstance(cs, list):
        # inline Indexed: [/I base hival lookup] with abbreviated
        # names inside — expand them, keep the array shape
        d["ColorSpace"] = [
            _Name(_INLINE_CS.get(str(x), str(x)))
            if isinstance(x, _Name) else x for x in cs
        ]
    elif cs is not None:
        d["ColorSpace"] = _INLINE_CS.get(str(cs), str(cs))
    if not filters:
        # unfiltered: the data length is exact from the geometry
        w, h = d.get("Width"), d.get("Height")
        bpc = d.get("BitsPerComponent", 8)
        csv = d.get("ColorSpace", "")
        # Indexed (array form) and ImageMask carry ONE component
        ncomp = 1 if isinstance(csv, list) else {
            "DeviceGray": 1, "DeviceRGB": 3, "DeviceCMYK": 4,
        }.get(str(csv), 1)
        if not isinstance(w, int) or not isinstance(h, int):
            raise PdfError("inline image lacks /W or /H")
        nbytes = h * ((w * bpc * ncomp + 7) // 8)
        data = content[pos:pos + nbytes]
        if len(data) != nbytes:
            raise PdfError("inline image data truncated")
        pos += nbytes
        m = _WS_EI_RE.search(content, pos - 1, pos + 4)
        if m is None:
            raise PdfError("inline image: EI delimiter missing")
        return d, data, m.end()
    # filtered: scan for the whitespace-delimited EI (the §8.9.7
    # heuristic every reader applies — filter data is self-sizing)
    m = _WS_EI_RE.search(content, pos)
    if m is None:
        raise PdfError("inline image: EI delimiter missing")
    return d, content[pos:m.start()], m.end()


def _find_inline_images(content: bytes):
    """Yield (dict, data) per inline image in a content stream, using
    the same operator tokenization as the text extractor so a BI
    inside a string/comment is never misread."""
    pos = 0
    n = len(content)
    while pos < n:
        pos = _skip_ws(content, pos)
        if pos >= n:
            break
        c = content[pos]
        if c == 0x25:  # comment
            e = content.find(b"\n", pos)
            pos = n if e < 0 else e + 1
            continue
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B or \
                _NUM_RE.match(content, pos):
            try:
                _, pos = _parse_object(content, pos)
            except PdfError:
                pos += 1
            continue
        km = _KEYWORD_RE.match(content, pos)
        if not km:
            pos += 1
            continue
        if km.group(0) == b"BI":
            d, data, pos = _scan_inline_image(content, km.end())
            yield d, data
        else:
            pos = km.end()


def _decode_inline_image(doc: "PdfDocument", d: dict, data: bytes,
                         pidx: int, idx: int) -> PdfImage:
    filters = d.get("Filter") or [None]
    parms = d.get("DecodeParms")
    parms_list = parms if isinstance(parms, list) else [parms]
    return _decode_image_data(
        doc, f"BI{idx}", data, filters, parms_list,
        d.get("Width"), d.get("Height"), d.get("BitsPerComponent", 8),
        d.get("ColorSpace", "DeviceGray"), d.get("ImageMask"),
        pidx, decode=d.get("Decode"),
    )


def extract_pdf_images(data: bytes) -> list[PdfImage]:
    """PDF bytes -> decoded embedded images (XObject /Subtype /Image,
    §8.9.5), page order then resource-name order. DCTDecode payloads
    decode through the engine's own from-scratch JPEG decoder
    (operators/jpeg.py — baseline/progressive/arithmetic), so the
    scanned-document share of a PDF corpus is reachable; CCITTFaxDecode
    payloads decode through the engine's own T.4/T.6 fax codec
    (operators/ccitt.py — K selects G4/G3-1D/G3-2D, BlackIs1 and
    EncodedByteAlign honored, 1-bit samples emitted as 0/255 gray);
    Flate/LZW/ASCIIHex/ASCII85/RunLength sample streams decode via the
    common filter chain: 8-bit DeviceGray/RGB/CMYK, plus (r12)
    Indexed palettes (§8.6.6.3, string or stream lookups, out-of-range
    indices clamped), 1/2/4-bit sample rows with §8.9.5.2 MSB-first
    row-padded unpacking and the exact 255/(2^bpc-1) gray expansion,
    and /ImageMask stencils as 0/255 gray honoring /Decode [1 0].
    INLINE images (BI/ID/EI, §8.9.7 — the layout scanned faxes and
    small graphics actually use) decode through the same paths with
    the abbreviated key/filter/colorspace names expanded (r11).
    ICCBased colorspaces map to their /N device equivalent and
    16-bit samples emit the high byte (r12, the 8-bit rendering
    convention). JBIG2Decode images decode through the in-repo T.88
    generic-region decoder (operators/jbig2.py, r13), honoring
    /JBIG2Globals. JPXDecode images decode through the in-repo
    reversible Part-1 JPEG 2000 decoder (operators/jpx.py, r14);
    its named boundaries (9/7 irreversible, multi-tile) surface."""
    doc = PdfDocument(data)
    out: list[PdfImage] = []
    for pidx, (page, resources) in enumerate(doc.pages()):
        xobjs = doc.resolve(resources.get("XObject")) if resources else None
        if isinstance(xobjs, dict):
            for name in sorted(xobjs):
                x = doc.resolve(xobjs[name])
                if not (isinstance(x, tuple) and x[0] == "stream"):
                    continue
                sdict, raw = x[1], x[2]
                if str(sdict.get("Subtype", "")) != "Image":
                    continue
                filt = doc.resolve(sdict.get("Filter"))
                parms = doc.resolve(sdict.get("DecodeParms"))
                filters = filt if isinstance(filt, list) else [filt]
                parms_list = parms if isinstance(parms, list) else [parms]
                out.append(_decode_image_data(
                    doc, str(name), raw, filters, parms_list,
                    doc.resolve(sdict.get("Width")),
                    doc.resolve(sdict.get("Height")),
                    doc.resolve(sdict.get("BitsPerComponent", 8)),
                    doc.resolve(sdict.get("ColorSpace", "")),
                    doc.resolve(sdict.get("ImageMask")), pidx,
                    decode=doc.resolve(sdict.get("Decode")),
                ))
        # inline images (BI/ID/EI, §8.9.7) in the content stream(s)
        contents = doc.resolve(page.get("Contents"))
        parts = contents if isinstance(contents, list) else \
            ([contents] if contents is not None else [])
        blob = b"\n".join(doc.stream_data(pt) for pt in parts)
        for j, (idict, idata) in enumerate(_find_inline_images(blob)):
            out.append(_decode_inline_image(doc, idict, idata, pidx, j))
    return out


PDF_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("page_idx", LongType()),
        StructField("img_name", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_components", LongType()),
        StructField("img_filter", StringType()),
        StructField("pixel_sum", LongType()),
        StructField("pixel_md5", StringType()),
        StructField("pixels", BinaryType()),
    ]
)


def pdf_images(df: DataFrame, digest: str = "bytes") -> DataFrame:
    """(media_id, payload) -> one row per embedded PDF image via Arrow
    ``mapInPandas`` (map-only, same distribution slot as pdf_extract /
    decode_media): decoded pixel bytes + digest/sum, ready for the
    multimodal feature stage. ``digest="hex"`` md5s the lowercase-hex
    rendering instead (the SQL-oracle contract when pixels carry
    non-ASCII bytes, e.g. the 0/255 CCITT gray). At 100 TB the payload
    column is the raw PDF bytes of a crawl's application/pdf share."""
    if digest not in ("bytes", "hex"):
        raise ValueError(f"digest must be 'bytes' or 'hex', got {digest!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                for im in extract_pdf_images(bytes(raw)):
                    rows.append((
                        mid, im.page_idx, im.name, im.width, im.height,
                        im.n_components, im.img_filter,
                        int(sum(im.pixels)),
                        hashlib.md5(
                            im.pixels if digest == "bytes"
                            else im.pixels.hex().encode()
                        ).hexdigest(),
                        bytearray(im.pixels),
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PDF_IMAGE_SCHEMA.fields]
            )

    return df.mapInPandas(batches, PDF_IMAGE_SCHEMA)


# --- writer (fixture generator) ----------------------------------------------


def _esc_raw(b: bytes) -> bytes:
    """Literal-string escape over raw bytes (CR would be normalized
    by readers, so it is escaped too)."""
    return (
        b.replace(b"\\", b"\\\\").replace(b"(", b"\\(")
        .replace(b")", b"\\)").replace(b"\r", b"\\r")
    )


def _text_bytes(s: str) -> bytes:
    """PDF text-string bytes: Latin-1, or UTF-16BE with BOM
    (§7.9.2.2 — what the reader's _info_str decodes)."""
    try:
        return s.encode("latin-1")
    except UnicodeEncodeError:
        return b"\xfe\xff" + s.encode("utf-16-be")


def _esc(s: str) -> bytes:
    return _esc_raw(_text_bytes(s))


def _pack_rows(vals: bytes, w: int, h: int, bpc: int) -> bytes:
    """One byte per sample -> §8.9.5.2 MSB-first packed rows, each
    row padded to a byte boundary (fixture-writer mirror of
    _unpack_rows)."""
    import numpy as np

    a = np.frombuffer(vals, np.uint8).reshape(h, w)
    if bpc == 8:
        return a.tobytes()
    bits = ((a[:, :, None] >> np.arange(bpc - 1, -1, -1)) & 1) \
        .reshape(h, -1).astype(np.uint8)
    pad = -bits.shape[1] % 8
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((h, pad), np.uint8)], axis=1)
    return np.packbits(bits, axis=1).tobytes()


def _inline_image_ops(kind: str, iw: int, ih: int, ncomp: int,
                      payload: bytes) -> bytes:
    """BI/ID/EI operator bytes for one inline image (§8.9.7,
    abbreviated names as real writers emit them). ``payload``
    semantics per kind: 'inline-raw' = samples, 'inline-jpeg' = JPEG
    bytes, 'inline-ccitt-g4' = one INK byte per pixel."""
    cs = {1: b"/G", 3: b"/RGB", 4: b"/CMYK"}[ncomp]
    if kind == "inline-raw":
        head = b"BI /W %d /H %d /CS %s /BPC 8 ID " % (iw, ih, cs)
        if len(payload) != iw * ih * ncomp:
            raise ValueError("inline raw payload size mismatch")
        return head + payload + b" EI"
    if kind == "inline-jpeg":
        head = (b"BI /W %d /H %d /CS %s /BPC 8 /F /DCT ID "
                % (iw, ih, cs))
        return head + payload + b" EI"
    if kind == "inline-ccitt-g4":
        import numpy as _np

        from dolphinbeat_spark.operators.ccitt import ccitt_encode

        if ncomp != 1 or len(payload) != iw * ih:
            raise ValueError("inline ccitt wants 1 ink byte/pixel")
        ink = _np.frombuffer(payload, _np.uint8).reshape(ih, iw)
        head = (b"BI /W %d /H %d /CS /G /BPC 1 /F /CCF /DP "
                b"<< /K -1 /Columns %d /Rows %d >> ID " % (iw, ih, iw, ih))
        return head + ccitt_encode(ink, mode="g4") + b" EI"
    if kind == "inline-indexed":
        # payload = (bpc, palette bytes, one index byte per pixel)
        bpc_i, palette, idx = payload
        hival = len(palette) // ncomp - 1
        base = {1: b"/G", 3: b"/RGB", 4: b"/CMYK"}[ncomp]
        head = (b"BI /W %d /H %d /CS [/I %s %d <%s>] /BPC %d ID "
                % (iw, ih, base, hival, palette.hex().encode(), bpc_i))
        return head + _pack_rows(idx, iw, ih, bpc_i) + b" EI"
    if kind == "inline-mask":
        # payload = (one 0/1 byte per pixel, reverse_decode)
        bits, reverse = payload
        dec = b"/D [1 0] " if reverse else b""
        head = b"BI /W %d /H %d /IM true /BPC 1 %sID " % (iw, ih, dec)
        return head + _pack_rows(bits, iw, ih, 1) + b" EI"
    raise ValueError(f"unknown inline image kind {kind!r}")


def encode_pdf(pages: list[list[str]], title: str | None = None,
               flate: bool = True, xref_stream: bool = False,
               use_tj_array: bool = False,
               unicode_text: bool = False,
               encrypt: str | None = None,
               info_gen: int = 0,
               images: list[list[tuple]] | None = None) -> bytes:
    """Format-faithful PDF writer (fixture generator). ``pages`` is a
    list of pages, each a list of text lines. Layout variants:
    classic xref table (default) or cross-reference stream + object
    stream (``xref_stream=True``, with a real /Predictor 12 Up filter
    on the xref stream — the wild-file norm); content streams plain
    or FlateDecode; ``use_tj_array`` shows each line as a TJ array
    with a -250 word-gap kern between the first two words.
    ``unicode_text=True`` emits a Type0/Identity-H composite font with
    a generated /ToUnicode CMap (bfchar entries per distinct char) and
    2-byte-CID hex show strings — the layout Word/Chrome-class writers
    produce for any non-Latin text.
    ``encrypt="rc4-40"|"rc4-128"|"aes-128"`` produces a
    Standard-security-handler file (owner password ``owner``, EMPTY
    user password — the owner-locked layout every viewer opens):
    per-object RC4 — or AESV2 AES-128-CBC with IV-prefixed data and a
    /CF crypt-filter dictionary (V4 R4, r11) — over streams and
    strings, real /O //U //P entries and a file /ID. ``info_gen`` writes the /Info
    object (and its xref entry / trailer reference) at that generation
    number — exercises the per-object key's gen bytes (Algorithm 1);
    classic-xref layout only. ``images`` embeds image XObjects: one
    list per page of ``(kind, width, height, n_components, payload)``
    tuples — kind ``"jpeg"`` stores the payload under /DCTDecode,
    ``"raw"`` Flate-compresses 8-bit samples — painted after the text
    with a Do operator each."""
    if info_gen and (xref_stream or title is None):
        raise ValueError("info_gen needs classic xref + a title")
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    info_num = font_num + 1
    imgs = images if images is not None else [[] for _ in pages]
    if len(imgs) != n_pages:
        raise ValueError("images must have one entry list per page")
    img_base = info_num + 3  # clear of the optional desc/tou objects
    img_refs = []  # (resource name, object number) for XObject kinds
    k = 0
    for i, page_imgs in enumerate(imgs):
        for j, spec in enumerate(page_imgs):
            if spec[0].startswith("inline-"):
                continue  # inline images live IN the content stream
            img_refs.append((f"Im{i}_{j}", img_base + k))
            k += 1
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d"
        b" /Resources << /Font << /F1 %d 0 R >> >> >>" % (n_pages, font_num)
    )
    streams: dict[int, tuple[bytes, bytes]] = {}  # num -> (dict, data)
    n_globals = 0  # extra /JBIG2Globals streams past the image range
    codes: dict[str, int] = {}
    if unicode_text == "cff-cid":
        # CID-keyed CFF mode: codes ARE Adobe-Japan1 CIDs, and the
        # algorithmic slice is the ASCII run (CID = ord - 0x20 + 1)
        for lines in pages:
            for line in lines:
                for ch in line:
                    if not 0x20 <= ord(ch) <= 0x7E:
                        raise ValueError(
                            "cff-cid fixture text must stay in the "
                            "ordering's ASCII slice")
                    codes.setdefault(ch, ord(ch) - 0x20 + 1)
    elif unicode_text:
        for lines in pages:
            for line in lines:
                for ch in line:
                    codes.setdefault(ch, len(codes) + 1)

    cmap_codec = None
    if isinstance(unicode_text, str) and unicode_text.startswith("cmap:"):
        cmap_codec = _predefined_cmap_codec(unicode_text[5:])
        if cmap_codec is None:
            raise ValueError(
                f"unknown predefined CMap {unicode_text[5:]!r}")
    diff_codes: dict[str, int] = {}
    if unicode_text == "differences":
        # simple font + /Differences: non-Latin-1-identity chars get
        # codes from 128 up, named per the Adobe Glyph List
        for lines in pages:
            for line in lines:
                for ch in line:
                    if ord(ch) > 126 and ch not in diff_codes:
                        diff_codes[ch] = 128 + len(diff_codes)
        if len(diff_codes) > 128:
            raise ValueError("differences mode holds <= 128 chars")

    def show_str(text: str) -> bytes:
        if unicode_text == "differences":
            return b"<" + bytes(
                diff_codes.get(ch, ord(ch)) for ch in text
            ).hex().upper().encode() + b">"
        if cmap_codec is not None:
            # predefined-CMap mode: the show string is the text in
            # the CMap's code-space charset
            return b"<" + text.encode(cmap_codec).hex().upper().encode() \
                + b">"
        if unicode_text:
            return b"<" + b"".join(
                b"%04X" % codes[ch] for ch in text
            ) + b">"
        return b"(" + _esc(text) + b")"

    ref_by_page: dict[int, list[tuple[str, int]]] = {}
    for nm, num in img_refs:
        ref_by_page.setdefault(int(nm[2:].split("_")[0]), []).append(
            (nm, num)
        )
    for i, lines in enumerate(pages):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        # pages WITH images carry their own full Resources (a page
        # /Resources REPLACES the inherited one, §7.8.3 — so Font
        # rides along); pages without inherit the shared dict
        res_frag = b""
        if ref_by_page.get(i):
            xobj = b" ".join(
                b"/%s %d 0 R" % (nm.encode(), num)
                for nm, num in ref_by_page[i]
            )
            res_frag = (
                b" /Resources << /Font << /F1 %d 0 R >> /XObject << "
                % font_num + xobj + b" >> >>"
            )
        objs[pnum] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R" % cnum + res_frag + b" >>"
        )
        ops = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
        for j, line in enumerate(lines):
            if j > 0:
                ops.append(b"T*")
            if use_tj_array and " " in line:
                # the -250 kern IS the word gap (reader emits the
                # space via the ≤ -180/1000em rule), same in both
                # font modes
                first, rest = line.split(" ", 1)
                ops.append(
                    b"[" + show_str(first) + b" -250 "
                    + show_str(rest) + b"] TJ"
                )
            else:
                ops.append(show_str(line) + b" Tj")
        ops.append(b"ET")
        for j, spec in enumerate(imgs[i]):
            kind, iw, ih, incomp, ipayload = spec
            if kind.startswith("inline-"):
                ops.append(
                    b"q %d 0 0 %d 72 %d cm " % (iw, ih, 600 - 20 * j)
                    + _inline_image_ops(kind, iw, ih, incomp, ipayload)
                    + b" Q"
                )
            else:
                ops.append(
                    b"q %d 0 0 %d 72 %d cm /Im%d_%d Do Q"
                    % (iw, ih, 600 - 20 * j, i, j)
                )
        content = b" ".join(ops)
        if flate:
            streams[cnum] = (b"/Filter /FlateDecode", zlib.compress(content))
        else:
            streams[cnum] = (b"", content)
    k = 0
    n_lookups = 0
    for i, page_imgs in enumerate(imgs):
        for spec in page_imgs:
            kind, iw, ih, ncomp, payload = spec
            if kind.startswith("inline-"):
                continue
            num = img_base + k
            k += 1
            cs = {1: b"/DeviceGray", 3: b"/DeviceRGB",
                  4: b"/DeviceCMYK"}[ncomp]
            bpc = 1 if kind.startswith("ccitt") else 8
            common = (
                b"/Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace %s /BitsPerComponent %d" % (iw, ih, cs, bpc)
            )
            if kind == "jpeg":
                streams[num] = (common + b" /Filter /DCTDecode", payload)
            elif kind == "jpx":
                # payload = a ready JPEG 2000 codestream / JP2 file
                streams[num] = (common + b" /Filter /JPXDecode", payload)
            elif kind == "raw":
                if len(payload) != iw * ih * ncomp:
                    raise ValueError("raw image payload size mismatch")
                streams[num] = (
                    common + b" /Filter /FlateDecode",
                    zlib.compress(payload),
                )
            elif kind in ("ccitt-g4", "ccitt-g3", "ccitt-g3-2d"):
                # payload = one INK byte per pixel (1 = black)
                import numpy as _np

                from dolphinbeat_spark.operators.ccitt import ccitt_encode

                if ncomp != 1 or len(payload) != iw * ih:
                    raise ValueError("ccitt image wants 1 ink byte/pixel")
                ink = _np.frombuffer(payload, _np.uint8).reshape(ih, iw)
                kk = {"ccitt-g4": -1, "ccitt-g3": 0, "ccitt-g3-2d": 1}[kind]
                mode = {"ccitt-g4": "g4", "ccitt-g3": "g3-1d",
                        "ccitt-g3-2d": "g3-2d"}[kind]
                streams[num] = (
                    common + b" /Filter /CCITTFaxDecode /DecodeParms "
                    b"<< /K %d /Columns %d /Rows %d /BlackIs1 false >>"
                    % (kk, iw, ih),
                    ccitt_encode(ink, mode=mode),
                )
            elif kind in ("jbig2", "jbig2-globals"):
                # payload = one INK byte per pixel (1 = black); the
                # -globals form ships the page-information segment in
                # a separate /JBIG2Globals stream (the PDF two-stream
                # arrangement, r13)
                import numpy as _np

                from dolphinbeat_spark.operators.jbig2 import (
                    encode_jbig2_generic,
                )

                if ncomp != 1 or len(payload) != iw * ih:
                    raise ValueError("jbig2 image wants 1 ink byte/pixel")
                ink = _np.frombuffer(payload, _np.uint8).reshape(ih, iw)
                blob = encode_jbig2_generic(ink)
                if kind == "jbig2-globals":
                    # first segment is the page information (type 48,
                    # fixed 11-byte header + 19-byte payload)
                    cut = 11 + 19
                    gnum = img_base + len(img_refs) + n_globals
                    n_globals += 1
                    streams[gnum] = (b"", blob[:cut])
                    streams[num] = (
                        common + b" /Filter /JBIG2Decode /DecodeParms"
                        b" << /JBIG2Globals %d 0 R >>" % gnum,
                        blob[cut:],
                    )
                else:
                    streams[num] = (
                        common + b" /Filter /JBIG2Decode", blob)
            elif kind == "jbig2-raw":
                # payload = a pre-built embedded-profile JBIG2 stream
                # (e.g. symbol/text coded via encode_jbig2_text)
                streams[num] = (
                    common + b" /Filter /JBIG2Decode", payload)
            elif kind == "indexed":
                # payload = (bpc, palette bytes, index byte/pixel);
                # ncomp is the BASE colorspace's component count. The
                # lookup rides in its OWN stream object (the wild
                # layout, and under encryption only stream/string
                # OBJECTS get crypted — a hex string inline in the
                # dict would be double-handled)
                bpc_i, palette, idx = payload
                hival = len(palette) // ncomp - 1
                lk = img_base + len(img_refs) + n_lookups
                n_lookups += 1
                streams[lk] = (b"", palette)
                streams[num] = (
                    b"/Type /XObject /Subtype /Image /Width %d "
                    b"/Height %d /ColorSpace [/Indexed %s %d %d 0 R] "
                    b"/BitsPerComponent %d /Filter /FlateDecode"
                    % (iw, ih, cs, hival, lk, bpc_i),
                    zlib.compress(_pack_rows(idx, iw, ih, bpc_i)),
                )
            elif kind == "raw16":
                # payload = big-endian 16-bit samples
                if len(payload) != iw * ih * ncomp * 2:
                    raise ValueError("raw16 payload size mismatch")
                streams[num] = (
                    b"/Type /XObject /Subtype /Image /Width %d "
                    b"/Height %d /ColorSpace %s /BitsPerComponent 16 "
                    b"/Filter /FlateDecode" % (iw, ih, cs),
                    zlib.compress(payload),
                )
            elif kind == "icc":
                # payload = 8-bit samples; ColorSpace = [/ICCBased
                # stream] whose /N carries the component count (the
                # profile body is a placeholder — extraction treats
                # ICC as presentation, §8.6.5.5)
                if len(payload) != iw * ih * ncomp:
                    raise ValueError("icc payload size mismatch")
                lk = img_base + len(img_refs) + n_lookups
                n_lookups += 1
                streams[lk] = (b"/N %d" % ncomp, b"fake-icc-profile")
                streams[num] = (
                    b"/Type /XObject /Subtype /Image /Width %d "
                    b"/Height %d /ColorSpace [/ICCBased %d 0 R] "
                    b"/BitsPerComponent 8 /Filter /FlateDecode"
                    % (iw, ih, lk),
                    zlib.compress(payload),
                )
            elif kind == "gray-sub":
                # payload = (bpc, one sample byte per pixel)
                bpc_s, vals = payload
                streams[num] = (
                    b"/Type /XObject /Subtype /Image /Width %d "
                    b"/Height %d /ColorSpace /DeviceGray "
                    b"/BitsPerComponent %d /Filter /FlateDecode"
                    % (iw, ih, bpc_s),
                    zlib.compress(_pack_rows(vals, iw, ih, bpc_s)),
                )
            elif kind == "mask":
                # payload = (one 0/1 byte per pixel, reverse_decode);
                # §8.9.6.2: ImageMask has no ColorSpace entry
                bits, reverse = payload
                dec = b" /Decode [1 0]" if reverse else b""
                streams[num] = (
                    b"/Type /XObject /Subtype /Image /Width %d "
                    b"/Height %d /ImageMask true /BitsPerComponent 1%s "
                    b"/Filter /FlateDecode" % (iw, ih, dec),
                    zlib.compress(_pack_rows(bits, iw, ih, 1)),
                )
            else:
                raise ValueError(f"unknown image kind {kind!r}")
    if unicode_text in ("cff", "cff-cid"):
        # r14: a Type0 font WITHOUT /ToUnicode embedding a NON-CID
        # CFF (/FontFile3 /CIDFontType0C) — text is recoverable only
        # through the CFF charset's glyph names (CID == GID for a
        # non-CID CFF, PDF 32000-1 §9.7.4.2). Codes are assigned
        # densely from 1 in appearance order, so GID(=1+rank) == CID.
        # r15 "cff-cid": a CID-KEYED CFF with ROS Adobe-Japan1-7 —
        # no glyph names at all; recovery rides the ordering's
        # published ASCII slice (codes are the real Japan1 CIDs).
        from dolphinbeat_spark.operators.cff import encode_minimal_cff

        is_cid_fixture = unicode_text == "cff-cid"
        desc_num = info_num + 1
        fd_num = info_num + 2
        ff_num = img_base + len(img_refs) + n_globals
        n_globals += 1
        streams[ff_num] = (b"/Subtype /CIDFontType0C", encode_minimal_cff(
            {code: ch for ch, code in codes.items()},
            cid_keyed=is_cid_fixture,
            ros=("Adobe", "Japan1", 7) if is_cid_fixture else None))
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /DolphinbeatCFF "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] >>"
            % desc_num
        )
        ordering = b"Japan1" if is_cid_fixture else b"Identity"
        supplement = b"7" if is_cid_fixture else b"0"
        objs[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont"
            b" /DolphinbeatCFF /CIDSystemInfo << /Registry (Adobe)"
            b" /Ordering (" + ordering + b") /Supplement " + supplement
            + b" >> /FontDescriptor %d 0 R >>" % fd_num
        )
        objs[fd_num] = (
            b"<< /Type /FontDescriptor /FontName /DolphinbeatCFF"
            b" /Flags 4 /FontFile3 %d 0 R >>" % ff_num
        )
    elif cmap_codec is not None:
        # r14: a Type0 font with a PREDEFINED CJK CMap encoding and
        # no /ToUnicode — the show strings are in the CMap's code
        # space (Shift-JIS/EUC/GBK/Big5/UHC/UCS2); no embedded font
        # is needed for text recovery.
        desc_num = info_num + 1
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Dolphinbeat"
            b" /Encoding /" + unicode_text[5:].encode() +
            b" /DescendantFonts [%d 0 R] >>" % desc_num
        )
        objs[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont"
            b" /Dolphinbeat /CIDSystemInfo << /Registry (Adobe)"
            b" /Ordering (Japan1) /Supplement 7 >> >>"
        )
    elif unicode_text == "differences":
        # r14: a SIMPLE font with a custom /Encoding — /Differences
        # over a WinAnsi base (the TeX-toolchain layout); glyph names
        # per the Adobe Glyph List (agl names where they exist, the
        # productive uniXXXX form otherwise)
        from dolphinbeat_spark.operators.cff import _AGL

        agl_rev = {v: k for k, v in _AGL.items()}
        diffs = []
        for ch, code in sorted(diff_codes.items(), key=lambda kv: kv[1]):
            name = agl_rev.get(ch, "uni%04X" % ord(ch))
            diffs.append(b"%d /%s" % (code, name.encode("ascii")))
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding << /Type /Encoding /BaseEncoding"
            b" /WinAnsiEncoding /Differences [" + b" ".join(diffs)
            + b"] >> >>"
        )
    elif unicode_text in ("fontcmap", "fontcmap-gidmap"):
        # r13: a Type0 font WITHOUT /ToUnicode — text is recoverable
        # only through the embedded TrueType font's own cmap (the
        # non-Adobe CJK-toolchain layout). "fontcmap" uses
        # /CIDToGIDMap /Identity; "-gidmap" ships a real CIDToGIDMap
        # stream with gid = cid + 7 so the indirection is exercised.
        from dolphinbeat_spark.operators.truetype import (
            encode_minimal_ttf,
        )

        desc_num = info_num + 1
        fd_num = info_num + 2
        ff_num = img_base + len(img_refs) + n_globals
        n_globals += 1
        shift = 7 if unicode_text == "fontcmap-gidmap" else 0
        streams[ff_num] = (b"", encode_minimal_ttf(
            {ord(ch): code + shift for ch, code in codes.items()}))
        if shift:
            gid_num = img_base + len(img_refs) + n_globals
            n_globals += 1
            max_cid = max(codes.values())
            gm = bytearray(2 * (max_cid + 1))
            for code in codes.values():
                gm[2 * code:2 * code + 2] = \
                    (code + shift).to_bytes(2, "big")
            streams[gid_num] = (b"", bytes(gm))
            c2g = b"%d 0 R" % gid_num
        else:
            c2g = b"/Identity"
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /DejaVuSans "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] >>"
            % desc_num
        )
        objs[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /DejaVuSans"
            b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
            b" /Supplement 0 >> /CIDToGIDMap " + c2g +
            b" /FontDescriptor %d 0 R >>" % fd_num
        )
        objs[fd_num] = (
            b"<< /Type /FontDescriptor /FontName /DejaVuSans /Flags 4"
            b" /FontFile2 %d 0 R >>" % ff_num
        )
    elif unicode_text:
        desc_num = info_num + 1
        tou_num = info_num + 2
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /DejaVuSans "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc_num, tou_num)
        )
        objs[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /DejaVuSans"
            b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
            b" /Supplement 0 >> >>"
        )
        rows = b"\n".join(
            b"<%04X> <%s>" % (
                code, ch.encode("utf-16-be").hex().upper().encode()
            )
            for ch, code in sorted(codes.items(), key=lambda kv: kv[1])
        )
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
            b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
            b"endcodespacerange\n%d beginbfchar\n" % len(codes)
            + rows + b"\nendbfchar\nendcmap\nend\nend\n"
        )
        streams[tou_num] = (b"", cmap)
    else:
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
    if title is not None:
        objs[info_num] = b"<< /Title (" + _esc(title) + b") >>"

    #: objects that must live top-level in BOTH layouts (the /Encrypt
    #: dict may not ride in an object stream; an encrypted /Info's
    #: strings need their own object key)
    top_plain: dict[int, bytes] = {}
    enc_num = None
    id0 = b""
    if encrypt is not None:
        import hashlib as _hl

        r_, v_, length = {"rc4-40": (2, 1, 5),
                          "rc4-128": (3, 2, 16),
                          "aes-128": (4, 4, 16),
                          "aes-256": (6, 5, 32)}[encrypt]
        use_aes = encrypt in ("aes-128", "aes-256")
        use_v5 = encrypt == "aes-256"
        id0 = _hl.md5(b"dolphinbeat-pdf-id" + str(n_pages).encode()
                      + (title or "").encode("utf-8")).digest()
        p_val = -44
        if use_v5:
            from dolphinbeat_spark.operators.aes import (
                AES as _AES,
                aes_cbc_encrypt as _cbc_enc,
            )

            # deterministic fixture material (AESV3, PDF 2.0
            # §7.6.4); CONSTANT salts so the cached Algorithm 2.B
            # hash is shared across a fixture corpus (the file key
            # still differs per document via id0)
            key = _hl.sha256(b"dolphinbeat-filekey" + id0).digest()
            vsalt = b"dolphvs1"
            ksalt = b"dolphks1"
            u_val = _hash_2b(b"", vsalt, b"") + vsalt + ksalt
            ue_val = _cbc_enc(_hash_2b(b"", ksalt, b""), bytes(16),
                              key, add_padding=False)
            ovs, oks = b"dolphvo1", b"dolphko1"
            o_val = _hash_2b(b"owner", ovs, u_val) + ovs + oks
            oe_val = _cbc_enc(_hash_2b(b"owner", oks, u_val), bytes(16),
                              key, add_padding=False)
            perms = ((p_val & 0xFFFFFFFF).to_bytes(4, "little")
                     + b"\xff\xff\xff\xffTadb" + id0[:4])
            perms_val = _AES(key).encrypt_block(perms)
        else:
            o_val = _make_owner_value(b"owner", b"", r_, length)
            key = _std_encryption_key(b"", o_val, p_val, id0, r_, length)
            u_val = _make_user_value(key, id0, r_)

        def okey(num: int, gen: int = 0) -> bytes:
            if use_v5:
                return key  # V5 uses the file key for every object
            base = (key + num.to_bytes(3, "little")
                    + gen.to_bytes(2, "little"))
            if use_aes:
                base += b"sAlT"
            return _hl.md5(base).digest()[:min(length + 5, 16)]

        def crypt(num: int, data: bytes, gen: int = 0) -> bytes:
            if not use_aes:
                return _rc4(okey(num, gen), data)
            from dolphinbeat_spark.operators.aes import aes_cbc_encrypt

            # deterministic per-object IV keeps fixtures reproducible
            iv = _hl.md5(b"dolphinbeat-iv-%d-%d" % (num, gen)).digest()
            return iv + aes_cbc_encrypt(okey(num, gen), iv, data)

        for num in list(streams):  # encrypt AFTER compression (§7.6.2)
            fdict, sdata = streams[num]
            streams[num] = (fdict, crypt(num, sdata))
        if unicode_text in ("fontcmap", "fontcmap-gidmap"):
            # the reader RESOLVES the descendant font in this mode, so
            # its CIDSystemInfo strings must be really encrypted
            # (§7.6.2 covers every string object)
            objs[desc_num] = (
                b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont"
                b" /DejaVuSans /CIDSystemInfo << /Registry ("
                + _esc_raw(crypt(desc_num, b"Adobe"))
                + b") /Ordering ("
                + _esc_raw(crypt(desc_num, b"Identity"))
                + b") /Supplement 0 >> /CIDToGIDMap " + c2g
                + b" /FontDescriptor %d 0 R >>" % fd_num
            )
        elif unicode_text in ("cff", "cff-cid"):
            objs[desc_num] = (
                b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont"
                b" /DolphinbeatCFF /CIDSystemInfo << /Registry ("
                + _esc_raw(crypt(desc_num, b"Adobe"))
                + b") /Ordering ("
                + _esc_raw(crypt(
                    desc_num,
                    b"Japan1" if unicode_text == "cff-cid"
                    else b"Identity"))
                + b") /Supplement "
                + (b"7" if unicode_text == "cff-cid" else b"0")
                + b" >> /FontDescriptor %d 0 R >>" % fd_num
            )
        if title is not None:
            del objs[info_num]
            top_plain[info_num] = (
                b"<< /Title ("
                + _esc_raw(crypt(info_num, _text_bytes(title), info_gen))
                + b") >>"
            )
        enc_num = max(list(objs) + list(streams) + list(top_plain)) + 1
        cf_frag = b""
        if use_v5:
            cf_frag = (
                b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
                b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF"
            )
        elif use_aes:
            cf_frag = (
                b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF"
            )
        v5_frag = b""
        if use_v5:
            v5_frag = (
                b" /UE (" + _esc_raw(ue_val) + b") /OE ("
                + _esc_raw(oe_val) + b") /Perms ("
                + _esc_raw(perms_val) + b")"
            )
        top_plain[enc_num] = (
            b"<< /Filter /Standard /V %d /R %d /Length %d /P %d"
            % (v_, r_, length * 8, p_val)
            + cf_frag
            + b" /O (" + _esc_raw(o_val) + b") /U ("
            + _esc_raw(u_val) + b")" + v5_frag + b" >>"
        )

    def trailer_extra() -> bytes:
        if enc_num is None:
            return b""
        return (b" /Encrypt %d 0 R /ID [<%s> <%s>]"
                % (enc_num, id0.hex().encode(), id0.hex().encode()))

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    gens: dict[int, int] = {info_num: info_gen} if info_gen else {}

    def write_obj(num: int, body: bytes, stream: bytes | None = None):
        offsets[num] = len(out)
        out.extend(b"%d %d obj\n" % (num, gens.get(num, 0)))
        out.extend(body)
        if stream is not None:
            out.extend(b"\nstream\n")
            out.extend(stream)
            out.extend(b"\nendstream")
        out.extend(b"\nendobj\n")

    if not xref_stream:
        for num in sorted(objs):
            write_obj(num, objs[num])
        for num in sorted(top_plain):
            write_obj(num, top_plain[num])
        for num, (fdict, data) in sorted(streams.items()):
            write_obj(
                num, b"<< %s /Length %d >>" % (fdict, len(data)), data
            )
        max_num = max(list(objs) + list(streams) + list(top_plain))
        xref_off = len(out)
        out.extend(b"xref\n0 %d\n" % (max_num + 1))
        out.extend(b"0000000000 65535 f \n")
        for num in range(1, max_num + 1):
            out.extend(b"%010d %05d n \n"
                       % (offsets.get(num, 0), gens.get(num, 0)))
        trailer = b"<< /Size %d /Root 1 0 R" % (max_num + 1)
        if title is not None:
            trailer += b" /Info %d %d R" % (info_num, info_gen)
        trailer += trailer_extra()
        trailer += b" >>"
        out.extend(b"trailer\n" + trailer + b"\n")
    else:
        # non-stream objects ride in ONE object stream; content
        # streams and the xref stream stay top-level (§7.5.7)
        stm_num = max(list(objs) + list(streams)
                      + list(top_plain)) + 1
        xref_num = stm_num + 1
        for num in sorted(top_plain):
            write_obj(num, top_plain[num])
        inner = bytearray()
        pairs = []
        for num in sorted(objs):
            pairs.append((num, len(inner)))
            inner.extend(objs[num])
            inner.extend(b" ")
        header = b" ".join(b"%d %d" % p for p in pairs) + b" "
        objstm_payload = header + bytes(inner)
        comp = zlib.compress(objstm_payload)
        if enc_num is not None:
            comp = crypt(stm_num, comp)
        offsets[stm_num] = len(out)
        out.extend(b"%d 0 obj\n" % stm_num)
        out.extend(
            b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
            b"/Length %d >>\nstream\n" % (len(pairs), len(header), len(comp))
        )
        out.extend(comp)
        out.extend(b"\nendstream\nendobj\n")
        for num, (fdict, data) in sorted(streams.items()):
            write_obj(
                num, b"<< %s /Length %d >>" % (fdict, len(data)), data
            )
        size = xref_num + 1
        # xref stream rows: W = [1 4 2], Up-predicted (Predictor 12)
        rows = []
        for num in range(size):
            if num == 0:
                rows.append(bytes([0]) + (0).to_bytes(4, "big")
                            + (65535).to_bytes(2, "big"))
            elif num in offsets:
                rows.append(bytes([1]) + offsets[num].to_bytes(4, "big")
                            + (0).to_bytes(2, "big"))
            elif num in objs:  # lives in the object stream
                idx = [p[0] for p in pairs].index(num)
                rows.append(bytes([2]) + stm_num.to_bytes(4, "big")
                            + idx.to_bytes(2, "big"))
            else:
                rows.append(bytes(7))
        # xref stream offset row for itself gets patched below
        xref_off = len(out)
        rows[xref_num] = (bytes([1]) + xref_off.to_bytes(4, "big")
                          + (0).to_bytes(2, "big"))
        stride = 7
        pred = bytearray()
        prev = bytes(stride)
        for r in rows:
            pred.append(2)  # Up filter
            pred.extend(((r[i] - prev[i]) & 0xFF) for i in range(stride))
            prev = r
        comp = zlib.compress(bytes(pred))
        trailer_bits = b"/Root 1 0 R"
        if title is not None:
            trailer_bits += b" /Info %d 0 R" % info_num
        trailer_bits += trailer_extra()
        out.extend(b"%d 0 obj\n" % xref_num)
        out.extend(
            b"<< /Type /XRef /Size %d /W [1 4 2] /Index [0 %d] "
            b"/Filter /FlateDecode /DecodeParms << /Predictor 12 "
            b"/Columns 7 >> /Length %d %s >>\nstream\n"
            % (size, size, len(comp), trailer_bits)
        )
        out.extend(comp)
        out.extend(b"\nendstream\nendobj\n")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_off)
    return bytes(out)
