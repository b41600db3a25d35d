"""From-scratch Zstandard (RFC 8878) frame decoder — pure Python.

Why this exists: MySQL 8.0.20+ can write
``binlog_transaction_compression=zstd`` TRANSACTION_PAYLOAD events
(WL#3549), and this environment has no ``zstandard`` package, so the
binlog file parser previously raised by name on such archives
(`sources/binlog_file.py`). Like the repo's other codecs (baseline +
progressive JPEG per ITU-T T.81, GIF LZW, PNG, binary JSONB per
WL#8132), the fix is a from-scratch implementation of the PUBLIC
format spec: RFC 8878 / the zstd format documentation. No reference
to any implementation's source — structure follows the RFC's own
decoding description.

Scope (decode only — the engine never needs to write zstd):
- frames: magic, frame header (FCS sizes 0/1/2/4/8, single-segment,
  window descriptor, checksum flag), XXH64 content checksum (also
  from scratch, validated against published test vectors)
- blocks: raw, RLE, compressed
- literals: raw, RLE, Huffman-compressed (direct or FSE-compressed
  weights; 1-stream and 4-stream), treeless (table reuse)
- sequences: predefined / RLE / FSE-compressed / repeat table modes
  for all three codes, repeat-offset history incl. the
  litLength==0 corner, overlapping match copies
- skippable frames (0x184D2A5?) are skipped per spec
- dictionaries (RFC 8878 §5, r10): formatted dictionaries (magic
  0xEC30A437 — entropy tables seed the treeless/repeat modes, the 3
  initial repeat offsets replace 1/4/8, content prefixes the match
  window) AND raw content dictionaries; golden-tested against the
  reference CLI's ``--train`` output at levels 1/7/19
  (tests/fixtures/zstd/dict/, tools/make_zstd_dict_fixtures.py)

Not in scope, loud by name: window sizes above ``MAX_WINDOW`` (a
100 TB-job guard: a hostile frame header must not make an executor
allocate gigabytes).

Reference parity note: the reference engine gets zstd from a Go
library; this decoder plus `sources/binlog_file.py`'s
TRANSACTION_PAYLOAD path closes the last compression gap vs
`canal/` binlog handling.
"""

from __future__ import annotations

import struct

__all__ = ["ZstdError", "decode_zstd", "xxh64", "encode_zstd_store"]


class ZstdError(ValueError):
    """Typed decode failure: malformed or unsupported zstd payload."""


ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F
MAX_WINDOW = 1 << 27  # 128 MiB guard for hostile frame headers


# --- XXH64 (public algorithm, Y. Collet; vectors in tests) ----------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 digest of ``data`` — zstd's content checksum hash."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (v + lane * _P2) & _M64
                v = (_rotl(v, 31) * _P1) & _M64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((lane * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h ^= (lane * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# --- bit readers -----------------------------------------------------------


class _BackwardBits:
    """zstd's FSE/Huffman bitstreams are written LSB-first and read
    BACKWARD from a 1-bit sentinel at the top of the last byte. With
    the buffer as one little-endian integer, reading n bits below the
    cursor reproduces the written values (RFC 8878 §4.1)."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("empty bitstream")
        self.val = int.from_bytes(data, "little")
        bl = self.val.bit_length()
        if bl == 0:
            raise ZstdError("bitstream has no sentinel bit")
        self.pos = bl - 1  # drop the sentinel

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        if self.pos < 0:
            raise ZstdError("bitstream over-read")
        return (self.val >> self.pos) & ((1 << n) - 1)

    def peek_pad(self, n: int) -> int:
        """Top n bits below the cursor, zero-padded past the end —
        Huffman decode may legally consume padding on the final
        symbol."""
        if self.pos >= n:
            return (self.val >> (self.pos - n)) & ((1 << n) - 1)
        return (self.val << (n - self.pos)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos -= n  # may go negative only via Huffman padding

    @property
    def empty(self) -> bool:
        return self.pos <= 0


class _ForwardBits:
    """Forward LSB-first reader for FSE table descriptions
    (RFC 8878 §4.1.1: normalized counts are a forward bitstream)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def peek(self, n: int) -> int:
        """n bits at the cursor without advancing, zero-padded past
        the end (the count reader peeks max-width then consumes the
        actual width)."""
        start = self.bitpos // 8
        chunk = int.from_bytes(self.data[start:start + (n // 8) + 2], "little")
        return (chunk >> (self.bitpos % 8)) & ((1 << n) - 1)

    def consume(self, n: int) -> None:
        self.bitpos += n
        if self.bitpos > 8 * len(self.data):
            raise ZstdError("FSE table description over-read")

    def read(self, n: int) -> int:
        out = self.peek(n)
        self.consume(n)
        return out

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) // 8


# --- FSE -------------------------------------------------------------------


class _FseTable:
    __slots__ = ("accuracy_log", "symbol", "nb_bits", "new_state")

    def __init__(self, accuracy_log: int, counts: list[int]):
        """Build the decode table from normalized counts (may include
        -1 for less-than-one probabilities) per RFC 8878 §4.1.1."""
        self.accuracy_log = accuracy_log
        size = 1 << accuracy_log
        symbol = [0] * size
        high = size - 1
        next_state = {}
        for s, c in enumerate(counts):
            if c == -1:
                symbol[high] = s
                high -= 1
                next_state[s] = 1
            elif c > 0:
                next_state[s] = c
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, c in enumerate(counts):
            if c <= 0:
                continue
            for _ in range(c):
                symbol[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ZstdError("FSE table spread did not close")
        nb_bits = [0] * size
        new_state = [0] * size
        for i in range(size):
            s = symbol[i]
            x = next_state[s]
            next_state[s] = x + 1
            nb = accuracy_log - (x.bit_length() - 1)
            nb_bits[i] = nb
            new_state[i] = (x << nb) - size
        self.symbol = symbol
        self.nb_bits = nb_bits
        self.new_state = new_state


def _read_fse_counts(data: bytes, max_symbol: int, max_log: int):
    """Parse an FSE table description. Returns (accuracy_log, counts,
    bytes_consumed)."""
    br = _ForwardBits(data)
    accuracy_log = br.read(4) + 5
    if accuracy_log > max_log:
        raise ZstdError(
            f"FSE accuracy log {accuracy_log} exceeds format max {max_log}"
        )
    remaining = (1 << accuracy_log) + 1
    counts: list[int] = []
    while remaining > 1:
        if len(counts) > max_symbol:
            raise ZstdError("FSE table describes too many symbols")
        # a value in [0, remaining] (0 encodes probability -1); read
        # log2(remaining)+1 bits max, low values use one bit fewer —
        # the RFC's threshold scheme
        nbits = remaining.bit_length()
        low_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - remaining
        v = br.peek(nbits)
        if (v & low_mask) < threshold:
            br.consume(nbits - 1)
            v &= low_mask
        else:
            br.consume(nbits)
            if v > low_mask:
                v -= threshold
        prob = v - 1
        counts.append(prob)
        remaining -= -prob if prob < 0 else prob
        if prob == 0:
            # repeat flags: 2 bits, value 3 chains
            while True:
                rep = br.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 1:
        raise ZstdError("FSE normalized counts do not sum to table size")
    return accuracy_log, counts, br.bytes_consumed()


# --- Huffman ---------------------------------------------------------------


class _HuffTable:
    __slots__ = ("max_bits", "symbol", "nb_bits")

    def __init__(self, weights: list[int]):
        """Canonical table from explicit weights; the LAST weight is
        implicit and completes the kraft sum to a power of two
        (RFC 8878 §4.2.1)."""
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ZstdError("Huffman weights are all zero")
        # smallest power of two STRICTLY above total: the implicit last
        # weight completes the kraft sum to it (so it is always >= 1)
        p2 = 1 << total.bit_length()
        last_w = (p2 - total).bit_length()
        if (1 << (last_w - 1)) != p2 - total:
            raise ZstdError("Huffman weights do not complete a power of two")
        weights = weights + [last_w]
        max_bits = p2.bit_length() - 1
        size = 1 << max_bits
        table_sym = [0] * size
        table_nb = [0] * size
        pos = 0
        for w in range(1, max_bits + 1):
            span = 1 << (w - 1)
            for s, sw in enumerate(weights):
                if sw == w:
                    nb = max_bits + 1 - w
                    for _ in range(span):
                        table_sym[pos] = s
                        table_nb[pos] = nb
                        pos += 1
        if pos != size:
            raise ZstdError("Huffman table not fully populated")
        self.max_bits = max_bits
        self.symbol = table_sym
        self.nb_bits = table_nb

    def decode_stream(self, data: bytes, n_out: int) -> bytes:
        bits = _BackwardBits(data)
        out = bytearray()
        mb = self.max_bits
        while len(out) < n_out:
            v = bits.peek_pad(mb)
            out.append(self.symbol[v])
            bits.skip(self.nb_bits[v])
            if bits.pos < 0 and len(out) < n_out:
                raise ZstdError("Huffman literal stream exhausted early")
        return bytes(out)


def _read_huffman(data: bytes):
    """Parse a Huffman tree description; returns (table, consumed)."""
    if not data:
        raise ZstdError("missing Huffman tree description")
    hb = data[0]
    if hb >= 128:  # direct 4-bit weights
        n = hb - 127
        nbytes = (n + 1) // 2
        if len(data) < 1 + nbytes:
            raise ZstdError("truncated direct Huffman weights")
        weights = []
        for i in range(n):
            byte = data[1 + i // 2]
            weights.append((byte >> 4) if i % 2 == 0 else (byte & 0xF))
        return _HuffTable(weights), 1 + nbytes
    # FSE-compressed weights: hb = compressed size
    comp = data[1:1 + hb]
    if len(comp) < hb:
        raise ZstdError("truncated FSE-compressed Huffman weights")
    al, counts, consumed = _read_fse_counts(comp, 255, 6)
    table = _FseTable(al, counts)
    bits = _BackwardBits(comp[consumed:])
    # two interleaved states (RFC 8878 §4.2.1.2): each emits its
    # current symbol then updates; when an update would over-read, the
    # OTHER state emits one final symbol and decoding stops
    even = bits.read(al)
    odd = bits.read(al)
    weights: list[int] = []
    while True:
        weights.append(table.symbol[even])
        nb = table.nb_bits[even]
        if bits.pos < nb:
            weights.append(table.symbol[odd])
            break
        even = table.new_state[even] + bits.read(nb)
        weights.append(table.symbol[odd])
        nb = table.nb_bits[odd]
        if bits.pos < nb:
            weights.append(table.symbol[even])
            break
        odd = table.new_state[odd] + bits.read(nb)
        if len(weights) > 255:
            raise ZstdError("more than 255 Huffman weights")
    if len(weights) > 255:
        raise ZstdError("more than 255 Huffman weights")
    return _HuffTable(weights), 1 + hb


# --- predefined sequence tables (RFC 8878 §3.1.1.3.2.2) --------------------

_LL_BASE = (
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 18, 20, 22,
    24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
    32768, 65536,
)
_LL_BITS = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
)
_LL_DEFAULT = (
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
)
_LL_DEFAULT_LOG = 6

_ML_BASE = (
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22,
    23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37, 39, 41, 43, 47,
    51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051, 4099, 8195, 16387, 32771,
    65539,
)
_ML_BITS = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
    11, 12, 13, 14, 15, 16,
)
_ML_DEFAULT = (
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1,
    -1, -1, -1, -1, -1, -1,
)
_ML_DEFAULT_LOG = 6

_OF_DEFAULT = (
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    -1, -1, -1, -1, -1,
)
_OF_DEFAULT_LOG = 5

_LL_MAX_LOG, _ML_MAX_LOG, _OF_MAX_LOG = 9, 9, 8


# --- literals + sequences + block decode -----------------------------------


class _FrameState:
    """Cross-block state within one frame: Huffman table for treeless
    literals, FSE tables for repeat mode, repeat offsets."""

    __slots__ = ("huff", "ll", "ml", "of", "reps")

    def __init__(self):
        self.huff = None
        self.ll = None
        self.ml = None
        self.of = None
        self.reps = [1, 4, 8]


def _decode_literals(block: bytes, st: _FrameState):
    """Returns (literals, bytes_consumed)."""
    if not block:
        raise ZstdError("empty compressed block")
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            regen = b0 >> 3
            hdr = 1
        elif sf == 1:
            if len(block) < 2:
                raise ZstdError("truncated literals header")
            regen = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            if len(block) < 3:
                raise ZstdError("truncated literals header")
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            if len(block) < hdr + regen:
                raise ZstdError("truncated raw literals")
            return bytes(block[hdr:hdr + regen]), hdr + regen
        if len(block) < hdr + 1:
            raise ZstdError("truncated RLE literals")
        return bytes([block[hdr]]) * regen, hdr + 1
    # compressed (2) / treeless (3)
    if sf == 0:
        streams, hdr = 1, 3
        if len(block) < 3:
            raise ZstdError("truncated literals header")
        v = b0 | (block[1] << 8) | (block[2] << 16)
        regen = (v >> 4) & 0x3FF
        comp = (v >> 14) & 0x3FF
    elif sf == 1:
        streams, hdr = 4, 3
        v = int.from_bytes(block[:3], "little")
        regen = (v >> 4) & 0x3FF
        comp = (v >> 14) & 0x3FF
    elif sf == 2:
        streams, hdr = 4, 4
        if len(block) < 4:
            raise ZstdError("truncated literals header")
        v = int.from_bytes(block[:4], "little")
        regen = (v >> 4) & 0x3FFF
        comp = (v >> 18) & 0x3FFF
    else:
        streams, hdr = 4, 5
        if len(block) < 5:
            raise ZstdError("truncated literals header")
        v = int.from_bytes(block[:5], "little")
        regen = (v >> 4) & 0x3FFFF
        comp = (v >> 22) & 0x3FFFF
    body = block[hdr:hdr + comp]
    if len(body) < comp:
        raise ZstdError("truncated compressed literals")
    if ltype == 2:
        table, used = _read_huffman(body)
        st.huff = table
        body = body[used:]
    else:
        table = st.huff
        if table is None:
            raise ZstdError("treeless literals with no previous Huffman table")
    if streams == 1:
        lit = table.decode_stream(body, regen)
    else:
        if len(body) < 6:
            raise ZstdError("4-stream literals missing jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
        rest = body[6:]
        if s1 + s2 + s3 > len(rest):
            raise ZstdError("4-stream jump table exceeds literal section")
        part = (regen + 3) // 4
        sizes_out = [part, part, part, regen - 3 * part]
        if sizes_out[3] < 0:
            raise ZstdError("4-stream regenerated size underflow")
        chunks = [
            rest[:s1], rest[s1:s1 + s2], rest[s1 + s2:s1 + s2 + s3],
            rest[s1 + s2 + s3:],
        ]
        lit = b"".join(
            table.decode_stream(c, n) for c, n in zip(chunks, sizes_out)
        )
    return lit, hdr + comp


def _seq_table(mode: int, body: bytes, pos: int, default_table,
               max_symbol: int, max_log: int, bits: str, prev):
    """Resolve one of the three sequence code tables per its 2-bit
    compression mode. Returns (table_or_rle_symbol, new_pos)."""
    if mode == 0:
        return default_table, pos
    if mode == 1:  # RLE: single byte symbol
        if pos >= len(body):
            raise ZstdError("truncated RLE sequence table")
        sym = body[pos]
        if sym > max_symbol:
            raise ZstdError(f"RLE {bits} symbol {sym} out of range")
        return ("rle", sym), pos + 1
    if mode == 2:
        al, counts, used = _read_fse_counts(body[pos:], max_symbol, max_log)
        return _FseTable(al, counts), pos + used
    if prev is None:
        raise ZstdError(f"repeat mode for {bits} with no previous table")
    return prev, pos


_PREDEF = {}


def _predefined(kind: str):
    if kind not in _PREDEF:
        if kind == "ll":
            _PREDEF[kind] = _FseTable(_LL_DEFAULT_LOG, list(_LL_DEFAULT))
        elif kind == "ml":
            _PREDEF[kind] = _FseTable(_ML_DEFAULT_LOG, list(_ML_DEFAULT))
        else:
            _PREDEF[kind] = _FseTable(_OF_DEFAULT_LOG, list(_OF_DEFAULT))
    return _PREDEF[kind]


class _SeqState:
    """One FSE decoding state over the shared backward bitstream,
    degrading to a constant for RLE mode."""

    __slots__ = ("table", "state")

    def __init__(self, table, bits: _BackwardBits):
        self.table = table
        if isinstance(table, tuple):  # ("rle", symbol)
            self.state = 0
        else:
            self.state = bits.read(table.accuracy_log)

    @property
    def symbol(self) -> int:
        if isinstance(self.table, tuple):
            return self.table[1]
        return self.table.symbol[self.state]

    def update(self, bits: _BackwardBits) -> None:
        if isinstance(self.table, tuple):
            return
        t = self.table
        self.state = t.new_state[self.state] + bits.read(t.nb_bits[self.state])


def _decode_sequences(body: bytes, st: _FrameState):
    """Parse the sequences section; returns list of
    (lit_len, match_len, offset_value) with offsets still in
    offset-value space (repeat resolution happens in execution)."""
    if not body:
        raise ZstdError("missing sequences section")
    b0 = body[0]
    pos = 1
    if b0 == 0:
        return []
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        if len(body) < 2:
            raise ZstdError("truncated sequence count")
        nseq = ((b0 - 128) << 8) + body[1]
        pos = 2
    else:
        if len(body) < 3:
            raise ZstdError("truncated sequence count")
        nseq = body[1] + (body[2] << 8) + 0x7F00
        pos = 3
    if pos >= len(body):
        raise ZstdError("missing sequence compression modes")
    modes = body[pos]
    pos += 1
    if modes & 3:
        raise ZstdError("reserved sequence mode bits set")
    ll_mode = (modes >> 6) & 3
    of_mode = (modes >> 4) & 3
    ml_mode = (modes >> 2) & 3
    ll_t, pos = _seq_table(ll_mode, body, pos, _predefined("ll"), 35,
                           _LL_MAX_LOG, "literal-length", st.ll)
    of_t, pos = _seq_table(of_mode, body, pos, _predefined("of"), 31,
                           _OF_MAX_LOG, "offset", st.of)
    ml_t, pos = _seq_table(ml_mode, body, pos, _predefined("ml"), 52,
                           _ML_MAX_LOG, "match-length", st.ml)
    st.ll, st.of, st.ml = ll_t, of_t, ml_t
    bits = _BackwardBits(body[pos:])
    ll_s = _SeqState(ll_t, bits)
    of_s = _SeqState(of_t, bits)
    ml_s = _SeqState(ml_t, bits)
    out = []
    for i in range(nseq):
        of_code = of_s.symbol
        if of_code > 31:
            raise ZstdError(f"offset code {of_code} out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_s.symbol
        ml = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = ll_s.symbol
        ll = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        out.append((ll, ml, offset_value))
        if i != nseq - 1:
            ll_s.update(bits)
            ml_s.update(bits)
            of_s.update(bits)
    if bits.pos != 0:
        raise ZstdError(
            f"sequence bitstream not fully consumed ({bits.pos} bits left)"
        )
    return out


def _execute(literals: bytes, seqs, out: bytearray, st: _FrameState,
             cap: int) -> None:
    """Sequence execution with the 3-slot repeat-offset history
    (RFC 8878 §3.1.1.4). ``cap`` bounds the output DURING execution —
    a hostile block can declare gigabytes of matches, and the guard
    must fire before the allocation, not after."""
    reps = st.reps
    lit_pos = 0
    for ll, ml, offset_value in seqs:
        if len(out) + ll + ml > cap:
            raise ZstdError(
                f"decompressed output exceeds cap {cap} mid-block — "
                "either a hostile frame or a payload larger than the "
                "default MAX_WINDOW cap (pass max_output= to raise it)"
            )
        if lit_pos + ll > len(literals):
            raise ZstdError("sequence literal length exceeds literals")
        out += literals[lit_pos:lit_pos + ll]
        lit_pos += ll
        if offset_value > 3:
            offset = offset_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = offset_value - 1 if ll != 0 else offset_value
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # idx == 3: litLength==0, offset_value==3 → rep1 - 1
                offset = reps[0] - 1
                if offset <= 0:
                    raise ZstdError("repeat offset underflow")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if offset > len(out):
            raise ZstdError(
                f"match offset {offset} reaches before window start"
            )
        if offset >= ml:
            start = len(out) - offset
            out += out[start:start + ml]
        else:  # overlapping copy — byte-at-a-time semantics
            start = len(out) - offset
            for k in range(ml):
                out.append(out[start + k])
    out += literals[lit_pos:]


def _decode_block(block: bytes, st: _FrameState, out: bytearray,
                  cap: int) -> None:
    literals, used = _decode_literals(block, st)
    seqs = _decode_sequences(block[used:], st)
    _execute(literals, seqs, out, st, cap)


# --- frame -----------------------------------------------------------------


DICT_MAGIC = 0xEC30A437


class ZstdDictionary:
    """A parsed zstd dictionary (RFC 8878 §5): entropy tables that
    seed the frame's treeless/repeat modes, the three initial repeat
    offsets, and the content that prefixes the match window. A blob
    without the dictionary magic is a RAW CONTENT dictionary (id 0,
    window prefix only) per the reference implementation."""

    __slots__ = ("dict_id", "content", "huff", "ll", "of", "ml", "reps")

    def __init__(self, dict_id, content, huff, ll, of, ml, reps):
        self.dict_id = dict_id
        self.content = content
        self.huff = huff
        self.ll = ll
        self.of = of
        self.ml = ml
        self.reps = reps


def parse_zstd_dictionary(data: bytes) -> ZstdDictionary:
    """Parse a dictionary blob. Formatted layout (magic 0xEC30A437):
    magic(4) dict_id(4), entropy tables in the order Huffman-literals
    / OF / ML / LL (same descriptions as compressed blocks), the three
    4-byte little-endian initial repeat offsets, then content."""
    data = bytes(data)
    if len(data) < 8 or int.from_bytes(data[:4], "little") != DICT_MAGIC:
        return ZstdDictionary(0, data, None, None, None, None, [1, 4, 8])
    did = int.from_bytes(data[4:8], "little")
    pos = 8
    try:
        huff, used = _read_huffman(data[pos:])
        pos += used
        al, counts, used = _read_fse_counts(data[pos:], 31, _OF_MAX_LOG)
        of = _FseTable(al, counts)
        pos += used
        al, counts, used = _read_fse_counts(data[pos:], 52, _ML_MAX_LOG)
        ml = _FseTable(al, counts)
        pos += used
        al, counts, used = _read_fse_counts(data[pos:], 35, _LL_MAX_LOG)
        ll = _FseTable(al, counts)
        pos += used
    except ZstdError as ex:
        raise ZstdError(f"bad dictionary entropy tables: {ex}") from ex
    if pos + 12 > len(data):
        raise ZstdError("dictionary truncated before repeat offsets")
    reps = [int.from_bytes(data[pos + 4 * i:pos + 4 * i + 4], "little")
            for i in range(3)]
    pos += 12
    if any(r == 0 for r in reps):
        raise ZstdError(f"dictionary repeat offset is zero: {reps}")
    return ZstdDictionary(did, data[pos:], huff, ll, of, ml, reps)


def decode_zstd(data: bytes, max_output: int | None = None,
                dictionary: bytes | ZstdDictionary | None = None) -> bytes:
    """Decode a zstd payload (one or more frames, skippable frames
    skipped). ``max_output`` caps the decompressed size — callers that
    know the declared uncompressed size (the binlog
    TRANSACTION_PAYLOAD carries it) should pass it so a hostile frame
    cannot balloon executor memory.

    When ``max_output`` is None, a DEFAULT cap of ``MAX_WINDOW``
    (128 MiB) applies to the total decompressed output: valid payloads
    larger than that fail with a "default output cap" error naming
    this parameter, not a message blaming the input. Pass an explicit
    ``max_output`` to decode larger payloads.

    ``dictionary`` enables dictionary frames (RFC 8878 §5): entropy
    tables seed each frame's treeless-literals/repeat-FSE state, the
    dictionary's repeat offsets replace the 1/4/8 defaults, and its
    content prefixes the match window (stripped from the output).
    Pass raw dictionary bytes (parsed once here) or a pre-parsed
    :class:`ZstdDictionary` when decoding many frames."""
    if dictionary is not None and not isinstance(dictionary, ZstdDictionary):
        dictionary = parse_zstd_dictionary(dictionary)
    out_all = bytearray()
    pos = 0
    n = len(data)
    saw_frame = False
    while pos < n:
        if n - pos < 4:
            raise ZstdError("truncated frame magic")
        magic = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        if SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
            if n - pos < 4:
                raise ZstdError("truncated skippable frame header")
            sz = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4 + sz
            if pos > n:
                raise ZstdError("skippable frame exceeds payload")
            continue
        if magic != ZSTD_MAGIC:
            raise ZstdError(f"bad zstd magic {magic:#010x}")
        saw_frame = True
        if pos >= n:
            raise ZstdError("missing frame header descriptor")
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single_segment = (fhd >> 5) & 1
        if (fhd >> 3) & 1:
            raise ZstdError("reserved frame header bit set")
        checksum_flag = (fhd >> 2) & 1
        did_flag = fhd & 3
        window_size = None
        if not single_segment:
            if pos >= n:
                raise ZstdError("missing window descriptor")
            wd = data[pos]
            pos += 1
            exponent = wd >> 3
            mantissa = wd & 7
            base = 1 << (10 + exponent)
            window_size = base + (base // 8) * mantissa
        did_len = (0, 1, 2, 4)[did_flag]
        did = 0
        if did_len:
            did = int.from_bytes(data[pos:pos + did_len], "little")
            pos += did_len
        if did != 0:
            if dictionary is None:
                raise ZstdError(
                    f"frame requires dictionary {did} — pass dictionary="
                )
            if dictionary.dict_id not in (0, did):
                raise ZstdError(
                    f"frame requires dictionary {did}, got "
                    f"{dictionary.dict_id}"
                )
        fcs_len = (0, 2, 4, 8)[fcs_flag] if not single_segment else \
            (1, 2, 4, 8)[fcs_flag]
        content_size = None
        if fcs_len:
            if n - pos < fcs_len:
                raise ZstdError("truncated frame content size")
            content_size = int.from_bytes(data[pos:pos + fcs_len], "little")
            if fcs_len == 2:
                content_size += 256
            pos += fcs_len
        if single_segment:
            window_size = content_size if content_size is not None else 0
        if window_size is not None and window_size > MAX_WINDOW:
            raise ZstdError(
                f"window size {window_size} exceeds the {MAX_WINDOW} guard"
            )
        cap_is_default = max_output is None
        cap = max_output if max_output is not None else MAX_WINDOW
        st = _FrameState()
        prefix_len = 0
        if dictionary is not None:
            st.huff = dictionary.huff
            st.ll, st.of, st.ml = (dictionary.ll, dictionary.of,
                                   dictionary.ml)
            st.reps = list(dictionary.reps)
            prefix_len = len(dictionary.content)
            frame_out = bytearray(dictionary.content)
        else:
            frame_out = bytearray()
        cap += prefix_len  # the window prefix is stripped, not output
        while True:
            if n - pos < 3:
                raise ZstdError("truncated block header")
            bh = int.from_bytes(data[pos:pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # raw
                if n - pos < bsize:
                    raise ZstdError("truncated raw block")
                frame_out += data[pos:pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                if pos >= n:
                    raise ZstdError("truncated RLE block")
                frame_out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                if n - pos < bsize:
                    raise ZstdError("truncated compressed block")
                _decode_block(
                    data[pos:pos + bsize], st, frame_out,
                    cap - len(out_all),
                )
                pos += bsize
            else:
                raise ZstdError("reserved block type 3")
            if len(frame_out) + len(out_all) > cap:
                if cap_is_default:
                    raise ZstdError(
                        f"decompressed output exceeds the default "
                        f"{cap}-byte cap (MAX_WINDOW) — pass "
                        "max_output= to decode_zstd for larger payloads"
                    )
                raise ZstdError(
                    f"decompressed output exceeds max_output={cap} "
                    "(declared size lied)"
                )
            if last:
                break
        if prefix_len:
            del frame_out[:prefix_len]  # window prefix is not output
            cap -= prefix_len
        if content_size is not None and len(frame_out) != content_size:
            raise ZstdError(
                f"frame declared {content_size} bytes, decoded "
                f"{len(frame_out)}"
            )
        if checksum_flag:
            if n - pos < 4:
                raise ZstdError("truncated content checksum")
            want = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
            got = xxh64(bytes(frame_out)) & 0xFFFFFFFF
            if got != want:
                raise ZstdError(
                    f"content checksum mismatch: {got:#010x} != {want:#010x}"
                )
        out_all += frame_out
    if not saw_frame:
        raise ZstdError("no zstd frame in payload")
    return bytes(out_all)


def encode_zstd_store(data: bytes, with_checksum: bool = True) -> bytes:
    """Minimal VALID zstd writer using raw (stored) blocks only — the
    format's store mode, analogous to zlib level 0. Used by tests and
    fixture writers to produce real frames without the zstd CLI; any
    conformant decoder (including :func:`decode_zstd`) reads it."""
    fhd = (3 << 6) | (1 << 5) | ((1 if with_checksum else 0) << 2)
    out = bytearray(struct.pack("<IB", ZSTD_MAGIC, fhd))
    out += struct.pack("<Q", len(data))
    max_block = (1 << 21) - 1  # fits the 21-bit block size field
    chunks = [data[i:i + max_block] for i in range(0, len(data), max_block)] \
        or [b""]
    for i, c in enumerate(chunks):
        last = 1 if i == len(chunks) - 1 else 0
        out += struct.pack("<I", last | (0 << 1) | (len(c) << 3))[:3]
        out += c
    if with_checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)
