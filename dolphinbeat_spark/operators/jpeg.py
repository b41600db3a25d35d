"""JPEG (ITU-T T.81) codec from scratch — no codec libraries.

De-stubs the last image-decode slot: sequential baseline DCT,
extended sequential (SOF1), AND progressive (SOF2, Annex G: spectral
selection + successive approximation — most wild JPEGs are
progressive), 8-bit and 12-bit precision (12-bit: 16-bit DQT entries,
level shift 2048, uint16 output — the medical/scientific-imaging
shape; T.81 forbids 12-bit in baseline SOF0 and the decoder rejects
it as malformed), grayscale or YCbCr, built entirely from the PUBLIC
spec — Annex K reference
quantization + Huffman tables (typed below straight from the
standard, reviewable against it), Annex C canonical Huffman code
construction, F.2 entropy decoding (EXTEND, run/size, EOB/ZRL), G.1.2
progressive scan decoding (DC first/refine, AC first/refine with EOB
runs), A.3.3 DCT via the orthonormal 8x8 DCT-II matrix (whose row
scaling a(0)=1/(2*sqrt(2)), a(u>0)=1/2 equals the spec's C(u)/2
factors), and the JFIF YCbCr <-> RGB transform.

Verification strategy (tests/test_multimodal.py):
- the DECODER is pinned independently of the encoder by hand-built
  bitstreams whose decoded values are computable by hand (a DC-only
  baseline block; an AC successive-approximation refinement scan);
- flat images decode to a CLOSED-FORM value (quantize/dequantize of
  the lone DC coefficient), which is also what makes an oracle-checked
  spec possible (mm_decode_jpeg / mm_decode_jpeg_progressive: DuckDB
  recomputes the same formula);
- textured roundtrips bound the reconstruction error (JPEG is lossy;
  error comes from quantization, not parsing), and the progressive
  re-encoding of an image must decode BIT-IDENTICAL to the baseline
  encoding (same coefficients, different scan order).

Restart intervals (DRI + RSTn) decode in both baseline and
progressive scans: predictors/EOB runs reset at each marker, and a
missing, misplaced, or out-of-sequence RSTn raises a typed JpegError
naming the expected marker. ARITHMETIC-coded JPEGs — sequential SOF9
AND progressive SOF10 (T.81 Annex D QM-coder + DAC conditioning;
Annex G.2 scan procedures) — decode via jpeg_arith.py, cross-pinned
bit-for-bit against libjpeg at the coefficient level.
Unsupported-but-detected shapes raise honestly by name:
lossless/extended SOFs, sampling factors beyond 1/2 (4:4:4, 4:2:2 and
4:2:0 all decode).

At 100 TB this decode runs inside the same Arrow ``mapInPandas`` slot
as the other codecs (operators/multimodal.py::decode_media) — one
image per row, distributed, payload column pruned unless scanned.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K reference tables (ITU-T T.81) ---------------------------------

#: K.1 luminance quantization table, natural (row-major) order
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

#: K.2 chrominance quantization table
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

#: zig-zag scan order (Figure A.6): ZIGZAG[k] = natural index of the
#: k-th zig-zag coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: progressive AC table: every run/size symbol plus the EOBn symbols
#: (0x10..0xE0) progressive scans emit for EOB runs — all at a flat 9
#: bits (176 codes < 2^9, valid canonical table; compression is not
#: the fixture generator's job)
_AC_PROG_SYMS = sorted(
    {(r << 4) | sz for r in range(16) for sz in range(1, 11)}
    | {r << 4 for r in range(15)} | {0xF0}
)
HUFF_AC_PROGRESSIVE = (
    [0] * 8 + [len(_AC_PROG_SYMS)] + [0] * 7,
    _AC_PROG_SYMS,
)

# orthonormal 8x8 DCT-II basis (== the spec's C(u)/2 scaling)
_DCT_M = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


class JpegError(ValueError):
    """Malformed JPEG bytes (bad markers, truncated stream, bad codes)."""


# --- Huffman (Annex C canonical codes) -------------------------------------


def _build_codes(bits, huffval):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per Annex C."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits, huffval):
    """(BITS, HUFFVAL) -> {(length, code): symbol}."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, huffval).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0
        return bytes(self.out)

    def put_restart(self, n: int) -> None:
        """Byte-align (1-padding per B.1.1.5) and emit RSTn."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n % 8)])


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 de-stuffing;
    a bare FF marker inside the scan is a loud error."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            elif 0xD0 <= nxt <= 0xD7:
                # a restart marker is only legal at a restart-interval
                # boundary, where decode consumes it via restart() —
                # hitting one mid-entropy-data means the stream lost
                # sync (or carries a bogus/missing DRI)
                raise JpegError(
                    f"misplaced restart marker RST{nxt - 0xD0} inside "
                    "entropy data (before the restart interval elapsed)"
                )
            else:
                raise JpegError(f"unexpected marker FF{nxt:02X} inside scan")
        # mask consumed bits before shifting: stale high bits are
        # never read but make acc a growing bignum — O(scan length)
        # per shift, quadratic over a long restart-free scan (caught
        # by the r13 codec-throughput bench)
        self.acc = ((self.acc & ((1 << self.n) - 1)) << 8) | b
        self.n += 8

    def restart(self, expected: int) -> None:
        """Consume the RSTn due at a restart-interval boundary
        (B.2.1.2): drop padding bits, expect FF D0+(expected%8);
        anything else — entropy bytes where the marker belongs
        (missing RSTn) or the wrong index (dropped/duplicated
        interval) — is a typed error."""
        self.acc = 0
        self.n = 0
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise JpegError(
                f"missing restart marker RST{expected % 8} at interval "
                "boundary (found entropy data)"
            )
        nxt = self.data[self.pos + 1]
        if not (0xD0 <= nxt <= 0xD7):
            raise JpegError(
                f"expected RST{expected % 8} at restart boundary, "
                f"found marker FF{nxt:02X}"
            )
        if nxt - 0xD0 != expected % 8:
            raise JpegError(
                f"restart marker out of sequence: RST{nxt - 0xD0} where "
                f"RST{expected % 8} expected"
            )
        self.pos += 2

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code in scan")


def _extend(r: int, s: int) -> int:
    """F.2.2.1 EXTEND: received magnitude bits -> signed value."""
    if s == 0:
        return 0
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --- encoder (test glue; spec-valid baseline 4:4:4 / grayscale) -------------


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _encode_block(bw: _BitWriter, block: np.ndarray, quant: np.ndarray,
                  dc_codes, ac_codes, pred: int,
                  level: float = 128.0) -> int:
    coef = _DCT_M @ (block - level) @ _DCT_M.T
    q = np.round(coef / quant).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return int(zz[0])


def encode_jpeg(width: int, height: int, pixels: bytes, gray: bool = False,
                subsample: str = "444", restart_interval: int = 0,
                precision: int = 8) -> bytes:
    """Baseline JFIF writer: grayscale (1 byte/px) or RGB (3 bytes/px)
    YCbCr at 4:4:4 or 4:2:0 (``subsample="420"``: luma 2x2, chroma
    box-mean downsampled — the wild-JPEG default), Annex K tables,
    edge-replicated padding. ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that-many MCUs (camera-origin JPEGs
    routinely carry them for error resilience).

    ``precision=12`` writes EXTENDED SEQUENTIAL (SOF1 — T.81 forbids
    12-bit baseline): grayscale only, pixels as little-endian uint16
    (2 bytes/px, values 0..4095), 16-bit DQT entries (Pq=1), level
    shift 2048 — the medical/scientific-imaging shape."""
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be 444 or 420, got {subsample!r}")
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    if precision == 12 and not gray:
        raise NotImplementedError("12-bit encode: grayscale only")
    if gray:
        subsample = "444"
    ch = 1 if gray else 3
    px_bytes = 1 if precision == 8 else 2
    if len(pixels) != width * height * ch * px_bytes:
        raise ValueError(
            f"need {width * height * ch * px_bytes} bytes, got {len(pixels)}"
        )
    img = np.frombuffer(
        pixels, np.uint8 if precision == 8 else np.dtype("<u2")
    ).reshape(height, width, ch).astype(np.float64)
    level = float(1 << (precision - 1))
    if gray:
        planes = [img[:, :, 0]]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    mcu = 16 if subsample == "420" else 8
    ph = (height + mcu - 1) // mcu * mcu
    pw = (width + mcu - 1) // mcu * mcu
    planes = [
        np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge") for p in planes
    ]
    if subsample == "420":
        # chroma planes: 2x2 box mean at half resolution
        for c in (1, 2):
            q4 = planes[c].reshape(ph // 2, 2, pw // 2, 2)
            planes[c] = q4.mean(axis=(1, 3))
    quants = [QUANT_LUMA] + [QUANT_CHROMA] * (ch - 1)
    if precision == 12:  # Pq=1: 16-bit big-endian table entries
        dqt = _seg(0xDB, bytes([0x10]) + QUANT_LUMA.reshape(64)[ZIGZAG]
                   .astype(">u2").tobytes())
    else:
        dqt = _seg(0xDB, bytes([0x00]) + QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8).tobytes())
    if ch == 3:
        dqt += _seg(0xDB, bytes([0x01]) + QUANT_CHROMA.reshape(64)[ZIGZAG].astype(np.uint8).tobytes())
    luma_samp = 0x22 if subsample == "420" else 0x11
    comp = b"".join(
        bytes([cid + 1, luma_samp if cid == 0 else 0x11, 0 if cid == 0 else 1])
        for cid in range(ch)
    )
    sof = _seg(0xC0 if precision == 8 else 0xC1,
               struct.pack(">BHHB", precision, height, width, ch) + comp)
    def dht(cls, tid, tbl):
        bits, vals = tbl
        return _seg(0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))
    dhts = dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if ch == 3:
        dhts += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)
    scomp = b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11]) for cid in range(ch)
    )
    sos = _seg(0xDA, bytes([ch]) + scomp + bytes([0, 63, 0]))
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    dc_tabs = [_build_codes(*HUFF_DC_LUMA)] + [_build_codes(*HUFF_DC_CHROMA)] * (ch - 1)
    ac_tabs = [_build_codes(*HUFF_AC_LUMA)] + [_build_codes(*HUFF_AC_CHROMA)] * (ch - 1)
    bw = _BitWriter()
    preds = [0] * ch

    def maybe_restart(mcu_i: int) -> None:
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            bw.put_restart(mcu_i // restart_interval - 1)
            preds[:] = [0] * ch

    if subsample == "420" and ch == 3:
        for my in range(ph // 16):
            for mx in range(pw // 16):
                maybe_restart(my * (pw // 16) + mx)
                for byi in range(2):
                    for bxi in range(2):
                        y0, x0 = my * 16 + byi * 8, mx * 16 + bxi * 8
                        blk = planes[0][y0:y0 + 8, x0:x0 + 8]
                        preds[0] = _encode_block(
                            bw, blk, quants[0], dc_tabs[0], ac_tabs[0],
                            preds[0], level
                        )
                for c in (1, 2):
                    blk = planes[c][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                    preds[c] = _encode_block(
                        bw, blk, quants[c], dc_tabs[c], ac_tabs[c],
                        preds[c], level
                    )
    else:
        for by in range(ph // 8):
            for bx in range(pw // 8):
                maybe_restart(by * (pw // 8) + bx)
                for c in range(ch):
                    blk = planes[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    preds[c] = _encode_block(
                        bw, blk, quants[c], dc_tabs[c], ac_tabs[c],
                        preds[c], level
                    )
    return (
        b"\xff\xd8" + dqt + sof + dhts + dri + sos + bw.flush() + b"\xff\xd9"
    )


def encode_jpeg_progressive(width: int, height: int, pixels: bytes,
                            gray: bool = False,
                            subsample: str = "444",
                            restart_interval: int = 0) -> bytes:
    """Progressive (SOF2) JFIF writer — the fixture generator for the
    progressive decoder. Scan script (a cjpeg-like simple progression):

    1. DC first, interleaved, successive approximation Al=1
    2. per component: AC first Ss=1..5 then Ss=6..63 (Al=0)
    3. DC refinement Ah=1, Al=0 (one raw bit per block)

    This exercises DC first/refine, non-interleaved AC with EOB runs
    and ZRL on decode; AC successive approximation is covered by the
    hand-built refinement vector in tests (its encoder would only
    re-derive what the hand vector pins independently)."""
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be 444 or 420, got {subsample!r}")
    if gray:
        subsample = "444"
    ch = 1 if gray else 3
    if len(pixels) != width * height * ch:
        raise ValueError(f"need {width * height * ch} bytes, got {len(pixels)}")
    img = np.frombuffer(pixels, np.uint8).reshape(height, width, ch).astype(np.float64)
    if gray:
        planes = [img[:, :, 0]]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    mcu = 16 if subsample == "420" else 8
    ph = (height + mcu - 1) // mcu * mcu
    pw = (width + mcu - 1) // mcu * mcu
    planes = [
        np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge") for p in planes
    ]
    samp = [(1, 1)] * ch
    if subsample == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
        for c in (1, 2):
            q4 = planes[c].reshape(ph // 2, 2, pw // 2, 2)
            planes[c] = q4.mean(axis=(1, 3))
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    quants = [QUANT_LUMA] + [QUANT_CHROMA] * (ch - 1)
    # quantized zigzag coefficients over each plane's padded grid
    coefs = []
    true_bdims = []
    for c in range(ch):
        pl = planes[c]
        bh_b, bw_b = pl.shape[0] // 8, pl.shape[1] // 8
        arr = np.zeros((bh_b, bw_b, 64), np.int64)
        for by in range(bh_b):
            for bx in range(bw_b):
                blk = pl[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                q = np.round(
                    (_DCT_M @ (blk - 128.0) @ _DCT_M.T) / quants[c]
                ).astype(np.int64)
                arr[by, bx] = q.reshape(64)[ZIGZAG]
        coefs.append(arr)
        hs, vs = samp[c]
        cw = (width * hs + hmax - 1) // hmax
        chh = (height * vs + vmax - 1) // vmax
        true_bdims.append(((cw + 7) // 8, (chh + 7) // 8))

    dqt = _seg(0xDB, bytes([0x00]) + QUANT_LUMA.reshape(64)[ZIGZAG]
               .astype(np.uint8).tobytes())
    if ch == 3:
        dqt += _seg(0xDB, bytes([0x01]) + QUANT_CHROMA.reshape(64)[ZIGZAG]
                    .astype(np.uint8).tobytes())
    comp = b"".join(
        bytes([c + 1, samp[c][0] << 4 | samp[c][1], 0 if c == 0 else 1])
        for c in range(ch)
    )
    sof = _seg(0xC2, struct.pack(">BHHB", 8, height, width, ch) + comp)

    def dht(cls, tid, tbl):
        bits, vals = tbl
        return _seg(0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))

    # progressive AC scans need EOBn symbols (0x10..0xE0) that the
    # Annex K baseline tables don't define — ship the flat custom
    # table as AC id 2
    dhts = dht(0, 0, HUFF_DC_LUMA) + dht(1, 2, HUFF_AC_PROGRESSIVE)
    if ch == 3:
        dhts += dht(0, 1, HUFF_DC_CHROMA)
    dc_tabs = [_build_codes(*HUFF_DC_LUMA)] + [_build_codes(*HUFF_DC_CHROMA)] * (ch - 1)
    ac_tabs = [_build_codes(*HUFF_AC_PROGRESSIVE)] * ch

    def sos_hdr(sel, ss, se, ah, al):
        # sel: list of (comp_index, dc_tid, ac_tid)
        body = bytes([len(sel)])
        for c, dct, act in sel:
            body += bytes([c + 1, dct << 4 | act])
        return _seg(0xDA, body + bytes([ss, se, ah << 4 | al]))

    out = b"\xff\xd8" + dqt + sof + dhts
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    # scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    preds = [0] * ch
    mcux, mcuy = pw // (8 * hmax), ph // (8 * vmax)
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.put_restart(mcu_i // restart_interval - 1)
                preds = [0] * ch
            for c in range(ch):
                hs, vs = samp[c]
                for byi in range(vs):
                    for bxi in range(hs):
                        v = int(coefs[c][my * vs + byi, mx * hs + bxi, 0]) >> 1
                        diff = v - preds[c]
                        preds[c] = v
                        s = _category(diff)
                        code, ln = dc_tabs[c][s]
                        bw.put(code, ln)
                        if s:
                            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    out += sos_hdr(
        [(c, 0 if c == 0 else 1, 0) for c in range(ch)], 0, 0, 0, 1
    ) + bw.flush()

    # scans 2..: AC first per component, two spectral bands
    for c in range(ch):
        for ss, se in ((1, 5), (6, 63)):
            bw = _BitWriter()
            ac = ac_tabs[c]
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    code, ln = ac[r << 4]
                    bw.put(code, ln)
                    if r:
                        bw.put(eobrun - (1 << r), r)
                    eobrun = 0

            bw_c, bh_c = true_bdims[c]
            for by in range(bh_c):
                for bx in range(bw_c):
                    unit = by * bw_c + bx
                    if restart_interval and unit and unit % restart_interval == 0:
                        flush_eob()  # EOB runs never cross a restart
                        bw.put_restart(unit // restart_interval - 1)
                    zz = coefs[c][by, bx]
                    ks = [k for k in range(ss, se + 1) if zz[k]]
                    if not ks:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                        continue
                    flush_eob()
                    run = 0
                    for k in range(ss, se + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac[0xF0]
                            bw.put(code, ln)
                            run -= 16
                        s = _category(v)
                        code, ln = ac[(run << 4) | s]
                        bw.put(code, ln)
                        bw.put(v if v > 0 else v + (1 << s) - 1, s)
                        run = 0
                    if run:
                        eobrun = 1
            flush_eob()
            out += sos_hdr([(c, 0, 2)], ss, se, 0, 0)
            out += bw.flush()

    # final scan: DC refinement (Ah=1, Al=0) — one raw bit per block
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.put_restart(mcu_i // restart_interval - 1)
            for c in range(ch):
                hs, vs = samp[c]
                for byi in range(vs):
                    for bxi in range(hs):
                        bw.put(int(coefs[c][my * vs + byi, mx * hs + bxi, 0]) & 1, 1)
    out += sos_hdr(
        [(c, 0 if c == 0 else 1, 0) for c in range(ch)], 0, 0, 1, 0
    ) + bw.flush()
    return out + b"\xff\xd9"


# --- decoder ----------------------------------------------------------------


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """JPEG → (width, height, HxWxC uint8; C = 1 gray, 3 RGB).

    Marker walk (APPn/COM skipped), multi-table DQT/DHT, SOF0/1
    baseline with a single interleaved SOS, and SOF2 PROGRESSIVE
    (spectral selection + successive approximation, T.81 Annex G:
    multi-scan coefficient accumulation, DC first/refine, AC
    first/refine with EOB runs), F.2 entropy decode, dequant +
    dezigzag + IDCT per block, JFIF YCbCr→RGB. Restart intervals
    (DRI/RSTn) decode in all modes with typed errors for
    missing/misplaced/out-of-sequence markers. ARITHMETIC scans —
    SOF9 sequential and SOF10 progressive — decode via the jpeg_arith
    QM-coder with DAC conditioning honored; lossless/differential
    shapes and sampling factors beyond 2
    raise honestly by name; any malformed byte surfaces as the typed
    JpegError, never a foreign IndexError/struct.error (note the lossy
    caveat: a bit flip INSIDE valid entropy data decodes to different
    pixels — JPEG carries no integrity check to catch it)."""
    try:
        return _decode_jpeg(data)
    except (JpegError, NotImplementedError):
        raise
    except (IndexError, struct.error, ValueError) as ex:
        raise JpegError(f"malformed JPEG: {ex}") from ex


def _decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    comps = None  # list of (comp_id, quant_tid, hs, vs)
    w = h = None
    precision = 8
    progressive = False
    arith = False  # SOF9: QM-coded extended sequential (jpeg_arith.py)
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC DC conditioning (L, U)
    ac_cond: dict[int, int] = {}              # DAC AC conditioning Kx
    prog = None  # _ProgState once the first SOF2 scan arrives
    scan = None  # baseline: list of (comp_index, dc_tid, ac_tid)
    restart_interval = 0  # DRI; 0 = no restarts (last DRI before a scan wins)
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # length-less standalone markers (TEM, stray RSTn between
            # scans) — parsing them as length-prefixed would read two
            # arbitrary bytes as a segment length and mis-skip
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per marker)
            p = 0
            while p < len(body):
                pq, tid = body[p] >> 4, body[p] & 0x0F
                if pq not in (0, 1):
                    raise JpegError(f"DQT precision field {pq} invalid")
                tbl = np.zeros(64, np.int32)
                if pq:  # 16-bit big-endian entries (12-bit streams)
                    tbl[ZIGZAG] = np.frombuffer(body, ">u2", 64, p + 1)
                    p += 129
                else:
                    tbl[ZIGZAG] = np.frombuffer(body, np.uint8, 64, p + 1)
                    p += 65
                quant[tid] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                (dc_dec if cls == 0 else ac_dec)[tid] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):  # seq/prog, Huff+arith
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            if prec == 12 and marker == 0xC0:
                # T.81 Table B.2: baseline is 8-bit only — a 12-bit
                # SOF0 is a malformed stream, not a capability gap
                raise JpegError("12-bit precision is invalid in baseline SOF0")
            precision = prec
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            comps = []
            for i in range(nc):
                cid, samp, qtid = body[6 + 3 * i:9 + 3 * i]
                hs, vs = samp >> 4, samp & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hs}x{vs} not supported "
                        "(1 and 2 only: 4:4:4 / 4:2:2 / 4:2:0)"
                    )
                comps.append((cid, qtid, hs, vs))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("extended/lossless JPEG not supported")
        elif marker in (0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/differential arithmetic JPEG not supported "
                "(sequential SOF9 and progressive SOF10 decode)"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            from .jpeg_arith import parse_dac

            new_dc, new_ac = parse_dac(body)
            dc_cond.update(new_dc)
            ac_cond.update(new_ac)
        elif marker == 0xDD:  # DRI (B.2.4.4): MCUs between RSTn markers
            if len(body) != 2:
                raise JpegError(f"DRI segment length {len(body) + 4} != 6")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: entropy data follows the header
            if comps is None:
                raise JpegError("SOS before SOF")
            if progressive:
                if prog is None:
                    prog = _ProgState(comps, w, h)
                if arith:
                    pos = prog.decode_scan_arith(data, pos, body, dc_cond,
                                                 ac_cond, restart_interval)
                else:
                    pos = prog.decode_scan(data, pos, body, dc_dec, ac_dec,
                                           restart_interval)
                continue  # keep walking: more scans / DHT redefinitions
            ns = body[0]
            scan = []
            for i in range(ns):
                sid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                ci = next(
                    (j for j, c in enumerate(comps) if c[0] == sid), None
                )
                if ci is None:
                    raise JpegError(f"SOS references unknown component {sid}")
                scan.append((ci, tabs >> 4, tabs & 0x0F))
            break
        # else: APPn / COM / others skipped by length
    if progressive:
        if prog is None:
            raise JpegError("progressive JPEG with no scan")
        return prog.reconstruct(quant, precision)
    if scan is None or w is None:
        raise JpegError("JPEG missing SOF/SOS")
    level = float(1 << (precision - 1))
    maxval = (1 << precision) - 1
    if arith:
        from .jpeg_arith import SeqArithScan

        arith_scan = SeqArithScan(data, pos, len(scan), dc_cond, ac_cond)
    else:
        br = _BitReader(data, pos)
    # MCU geometry from the max sampling factors (A.2.3): each MCU
    # holds hs*vs blocks per component; lower-sampled planes decode at
    # reduced resolution and upsample by replication afterwards
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * comps[ci][3], mcux * 8 * comps[ci][2]), np.float64)
        for ci, _, _ in scan
    ]
    preds = [0] * len(scan)

    def read_block(dc_tab, ac_tab, q, si):
        zz = np.zeros(64, np.int64)
        s = br.decode(dc_tab)
        preds[si] += _extend(br.bits(s), s)
        zz[0] = preds[si]
        k = 1
        while k < 64:
            rs = br.decode(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise JpegError("AC run past the end of the block")
            zz[k] = _extend(br.bits(s), s)
            k += 1
        coef = np.zeros(64, np.float64)
        coef[ZIGZAG] = zz * q.reshape(64)[ZIGZAG]
        return _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + level

    def read_block_arith(si, dct, act, q):
        zz = arith_scan.read_zz(si, dct, act)
        coef = np.zeros(64, np.float64)
        coef[ZIGZAG] = zz * q.reshape(64)[ZIGZAG]
        return _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + level

    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # RSTn due (B.2.1.2): consume it, verify its modulo-8
                # sequence index, reset every DC predictor (and, for
                # arithmetic scans, all statistics — F.2.4.3)
                if arith:
                    arith_scan.restart(mcu_i // restart_interval - 1)
                else:
                    br.restart(mcu_i // restart_interval - 1)
                    preds = [0] * len(scan)
            for si, (ci, dct, act) in enumerate(scan):
                _, qtid, hs, vs = comps[ci]
                try:
                    q = quant[qtid]
                    if not arith:
                        dc_tab, ac_tab = dc_dec[dct], ac_dec[act]
                except KeyError as ex:
                    raise JpegError(f"scan references missing table {ex}") from ex
                for byi in range(vs):
                    for bxi in range(hs):
                        if arith:
                            blk = read_block_arith(si, dct, act, q)
                        else:
                            blk = read_block(dc_tab, ac_tab, q, si)
                        y0 = (my * vs + byi) * 8
                        x0 = (mx * hs + bxi) * 8
                        planes[si][y0:y0 + 8, x0:x0 + 8] = blk
    # upsample to full resolution, then crop
    up = []
    for si, (ci, _, _) in enumerate(scan):
        _, _, hs, vs = comps[ci]
        # T.81 F.2.1.5: IDCT output is clamped to the sample range
        # BEFORE upsampling/color conversion (libjpeg's range-limit
        # table does the same) — without this, out-of-gamut component
        # overshoot on noisy blocks leaks through the color matrix at
        # up to ~30 counts vs a conformant decoder (r14)
        pl = np.clip(np.round(planes[si]), 0, maxval)
        if vs < vmax:
            pl = np.repeat(pl, vmax // vs, axis=0)
        if hs < hmax:
            pl = np.repeat(pl, hmax // hs, axis=1)
        up.append(pl[:h, :w])
    planes = up
    dtype = np.uint8 if precision == 8 else np.uint16
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, maxval).astype(dtype)
        return w, h, out.reshape(h, w, 1)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG not supported")
    y, cb, cr = planes[0], planes[1] - level, planes[2] - level
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, maxval).astype(dtype)


# --- progressive (SOF2, T.81 Annex G) ---------------------------------------


def _refine_ac(br: _BitReader, zz, ss: int, se: int, p1: int, m1: int,
               ac_tab: dict, eobrun: int) -> int:
    """One block of an AC successive-approximation refinement scan
    (G.1.2.3): correction bits for already-nonzero coefficients, plus
    newly-significant coefficients at magnitude 1<<Al. The EOB-run
    convention differs from first scans: the CURRENT block still
    consumes its correction bits before the run decrements."""
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("invalid size in AC refinement scan")
                newval = p1 if br.bit() else m1
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        zz[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0:
                if br.bit() and (c & p1) == 0:
                    zz[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


class _ProgState:
    """Coefficient accumulator for a progressive JPEG: one
    zigzag-order int32 array per component, filled across scans
    (spectral selection splits the k-range, successive approximation
    splits the bit-planes), then dequantized + IDCTed once at EOI."""

    def __init__(self, comps, w: int, h: int):
        self.comps = comps
        self.w, self.h = w, h
        self.hmax = max(c[2] for c in comps)
        self.vmax = max(c[3] for c in comps)
        self.mcux = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coefs = []
        self.bdims = []  # per-comp true (non-interleaved) block grid
        for _, _, hs, vs in comps:
            self.coefs.append(
                np.zeros((self.mcuy * vs, self.mcux * hs, 64), np.int32)
            )
            cw = (w * hs + self.hmax - 1) // self.hmax
            ch = (h * vs + self.vmax - 1) // self.vmax
            self.bdims.append(((cw + 7) // 8, (ch + 7) // 8))

    def _scan_header(self, body: bytes):
        ns = body[0]
        sel = []
        for i in range(ns):
            sid, tabs = body[1 + 2 * i], body[2 + 2 * i]
            ci = next(
                (j for j, c in enumerate(self.comps) if c[0] == sid), None
            )
            if ci is None:
                raise JpegError(f"SOS references unknown component {sid}")
            sel.append((ci, tabs >> 4, tabs & 0x0F))
        p = 1 + 2 * ns
        ss, se = body[p], body[p + 1]
        ah, al = body[p + 2] >> 4, body[p + 2] & 0x0F
        return sel, ss, se, ah, al

    @staticmethod
    def _resync(data: bytes, pos: int) -> int:
        # the scan's last byte may hold padding bits; advance to the
        # next marker (FF followed by a non-stuffing byte)
        while pos + 1 < len(data) and not (
            data[pos] == 0xFF and data[pos + 1] != 0x00
        ):
            pos += 1
        return pos

    def decode_scan(self, data: bytes, pos: int, body: bytes,
                    dc_dec: dict, ac_dec: dict, ri: int = 0) -> int:
        sel, ss, se, ah, al = self._scan_header(body)
        br = _BitReader(data, pos)
        if ss == 0:
            self._dc_scan(br, sel, se, ah, al, dc_dec, ri)
        else:
            self._ac_scan(br, sel, ss, se, ah, al, ac_dec, ri)
        return self._resync(data, br.pos)

    def decode_scan_arith(self, data: bytes, pos: int, body: bytes,
                          dc_cond: dict, ac_cond: dict, ri: int = 0) -> int:
        """One progressive ARITHMETIC scan (T.81 Annex G.2): same scan
        geometry as the Huffman path, decisions from the Annex D QM
        decoder (jpeg_arith.ProgArithScan — statistics live per scan,
        reset again at every restart marker)."""
        from .jpeg_arith import ProgArithScan

        sel, ss, se, ah, al = self._scan_header(body)
        sc = ProgArithScan(data, pos, len(sel), dc_cond, ac_cond)
        if ss == 0:
            if se != 0:
                raise JpegError("progressive DC scan with Se != 0")
            first = ah == 0

            def block(si, ci, by, bx):
                c = self.coefs[ci]
                if first:
                    c[by, bx, 0] = sc.dc_first(si, sel[si][1]) << al
                elif sc.dc_refine_bit():
                    c[by, bx, 0] |= 1 << al

            if len(sel) > 1:  # interleaved over MCUs
                for my in range(self.mcuy):
                    for mx in range(self.mcux):
                        unit = my * self.mcux + mx
                        if ri and unit and unit % ri == 0:
                            sc.restart(unit // ri - 1)
                        for si, (ci, _, _) in enumerate(sel):
                            _, _, hs, vs = self.comps[ci]
                            for byi in range(vs):
                                for bxi in range(hs):
                                    block(si, ci, my * vs + byi,
                                          mx * hs + bxi)
            else:  # single-component scan: the component's own grid
                ci = sel[0][0]
                bw_c, bh_c = self.bdims[ci]
                for by in range(bh_c):
                    for bx in range(bw_c):
                        unit = by * bw_c + bx
                        if ri and unit and unit % ri == 0:
                            sc.restart(unit // ri - 1)
                        block(0, ci, by, bx)
        else:
            if len(sel) != 1:
                raise JpegError("progressive AC scan must be single-component")
            if se > 63 or ss > se:
                raise JpegError(f"bad spectral range {ss}..{se}")
            ci, _, act = sel[0]
            bw_c, bh_c = self.bdims[ci]
            carr = self.coefs[ci]
            for by in range(bh_c):
                for bx in range(bw_c):
                    unit = by * bw_c + bx
                    if ri and unit and unit % ri == 0:
                        sc.restart(unit // ri - 1)
                    zz = carr[by, bx]
                    if ah:
                        sc.ac_refine(act, zz, ss, se, al)
                    else:
                        sc.ac_first(act, zz, ss, se, al)
        return self._resync(data, sc.qm.bp)

    def _dc_scan(self, br, sel, se, ah, al, dc_dec, ri=0):
        if se != 0:
            raise JpegError("progressive DC scan with Se != 0")
        first = ah == 0
        tabs = {}
        if first:
            for ci, dct, _ in sel:
                t = dc_dec.get(dct)
                if t is None:
                    raise JpegError(f"scan references missing DC table {dct}")
                tabs[ci] = t
        preds = {ci: 0 for ci, _, _ in sel}

        def maybe_restart(unit):
            # RSTn every ri MCUs (a progressive DRI applies per scan;
            # non-interleaved scans count their own blocks as MCUs):
            # byte-align, verify sequence, reset the DC predictors
            if ri and unit and unit % ri == 0:
                br.restart(unit // ri - 1)
                for k in preds:
                    preds[k] = 0

        def block(ci, by, bx):
            c = self.coefs[ci]
            if first:
                s = br.decode(tabs[ci])
                preds[ci] += _extend(br.bits(s), s)
                c[by, bx, 0] = preds[ci] << al
            elif br.bit():
                c[by, bx, 0] |= 1 << al

        if len(sel) > 1:  # interleaved over MCUs
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    maybe_restart(my * self.mcux + mx)
                    for ci, _, _ in sel:
                        _, _, hs, vs = self.comps[ci]
                        for byi in range(vs):
                            for bxi in range(hs):
                                block(ci, my * vs + byi, mx * hs + bxi)
        else:  # single-component scan: the component's own grid
            ci = sel[0][0]
            bw_c, bh_c = self.bdims[ci]
            for by in range(bh_c):
                for bx in range(bw_c):
                    maybe_restart(by * bw_c + bx)
                    block(ci, by, bx)

    def _ac_scan(self, br, sel, ss, se, ah, al, ac_dec, ri=0):
        if len(sel) != 1:
            raise JpegError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise JpegError(f"bad spectral range {ss}..{se}")
        ci, _, act = sel[0]
        ac_tab = ac_dec.get(act)
        if ac_tab is None:
            raise JpegError(f"scan references missing AC table {act}")
        bw_c, bh_c = self.bdims[ci]
        carr = self.coefs[ci]
        eobrun = 0
        p1, m1 = 1 << al, -(1 << al)
        for by in range(bh_c):
            for bx in range(bw_c):
                unit = by * bw_c + bx
                if ri and unit and unit % ri == 0:
                    # G.1.2.2/B.2.1.2: a restart resets the entropy
                    # state — EOB runs shall not cross the boundary, so
                    # any pending run is discarded with the marker
                    br.restart(unit // ri - 1)
                    eobrun = 0
                zz = carr[by, bx]
                if ah != 0:
                    eobrun = _refine_ac(br, zz, ss, se, p1, m1, ac_tab, eobrun)
                    continue
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.decode(ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > se:
                        raise JpegError("AC run past Se in progressive scan")
                    zz[k] = _extend(br.bits(s), s) * p1
                    k += 1

    def reconstruct(self, quant: dict,
                    precision: int = 8) -> tuple[int, int, np.ndarray]:
        w, h = self.w, self.h
        level = float(1 << (precision - 1))
        maxval = (1 << precision) - 1
        dtype = np.uint8 if precision == 8 else np.uint16
        planes = []
        for ci, (_, qtid, hs, vs) in enumerate(self.comps):
            q = quant.get(qtid)
            if q is None:
                raise JpegError(f"component references missing quant table {qtid}")
            qzz = q.reshape(64)[ZIGZAG].astype(np.int64)
            carr = self.coefs[ci]
            bh_b, bw_b = carr.shape[:2]
            pl = np.zeros((bh_b * 8, bw_b * 8), np.float64)
            for by in range(bh_b):
                for bx in range(bw_b):
                    nat = np.zeros(64, np.float64)
                    nat[ZIGZAG] = carr[by, bx] * qzz
                    pl[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                        _DCT_M.T @ nat.reshape(8, 8) @ _DCT_M + level
                    )
            # same T.81 F.2.1.5 sample-range clamp as the sequential
            # path (see _decode_jpeg) before upsample/color transform
            pl = np.clip(np.round(pl), 0, maxval)
            if vs < self.vmax:
                pl = np.repeat(pl, self.vmax // vs, axis=0)
            if hs < self.hmax:
                pl = np.repeat(pl, self.hmax // hs, axis=1)
            planes.append(pl[:h, :w])
        if len(planes) == 1:
            out = np.clip(np.round(planes[0]), 0, maxval).astype(dtype)
            return w, h, out.reshape(h, w, 1)
        if len(planes) != 3:
            raise NotImplementedError(
                f"{len(planes)}-component JPEG not supported"
            )
        y, cb, cr = planes[0], planes[1] - level, planes[2] - level
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
        return w, h, np.clip(np.round(rgb), 0, maxval).astype(dtype)
