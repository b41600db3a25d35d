"""CCITT Group 3 / Group 4 fax codecs from scratch — ITU-T T.4
(MH 1D + MR 2D) and T.6 (MMR), the bilevel compression scanned/fax
document archives ship in (TIFF Compression 2/3/4, PDF
CCITTFaxDecode).

A real scanned-document corpus slice is CCITT-coded TIFF or PDF; a
pipeline that cannot open it loses that share of the data. Covered:

- the published T.4 run-length code tables: white/black terminating
  codes (runs 0-63), per-colour make-up codes (64-1728), the shared
  extended make-up codes (1792-2560), EOL;
- **MH** (modified Huffman, TIFF Compression 2): 1D rows, each
  starting on a byte boundary, no EOLs;
- **Group 3 1D** (T.4 §4.1): EOL-delimited 1D rows, fill bits
  tolerated, optional byte-aligned EOLs (TIFF T4Options bit 2 / PDF
  EncodedByteAlign);
- **Group 3 2D** (T.4 §4.2): EOL + tag bit per row selecting 1D or 2D
  coding, vertical/horizontal/pass modes against the reference line;
- **Group 4** (T.6 §2): pure 2D against an all-white first reference
  line, no EOLs, optional EOFB tolerated.

Decode returns a (rows, columns) uint8 array with 1 = BLACK (ink) —
the photometric/BlackIs1 mapping is the caller's (tiff.py / pdf.py).
The encoder mirror writes all four layouts for fixtures; hand-
assembled bitstream vectors in tests/test_multimodal.py pin the code
tables independently of the mirror.

2D extension codes and uncompressed mode (T.4 §4.2.1.3.4) raise by
name. Reference parity: the reference repo has no media decode; this
extends the multimodal layer per SURVEY §7.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np


class CcittError(ValueError):
    """Typed CCITT T.4/T.6 bitstream error."""


# --- published T.4 code tables -------------------------------------------------
# (code string, run) — terminating codes 0..63
_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
#: extended make-up codes, shared by both colours (T.4 table 3)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}
_EOL = "000000000001"

# 2D mode codes (T.4 table 4 / T.6): value = ("pass"|"horiz"|delta)
_MODE_CODES = {
    "1": 0,          # V0
    "011": 1,        # VR1
    "000011": 2,     # VR2
    "0000011": 3,    # VR3
    "010": -1,       # VL1
    "000010": -2,    # VL2
    "0000010": -3,   # VL3
    "001": "horiz",
    "0001": "pass",
}


def _build_decoder(*tables: dict[int, str]) -> dict[tuple[int, int], int]:
    out: dict[tuple[int, int], int] = {}
    for table in tables:
        for run, code in table.items():
            key = (len(code), int(code, 2))
            if key in out:
                raise AssertionError(f"duplicate CCITT code {code}")
            out[key] = run
    return out


_WHITE_DEC = _build_decoder(_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP)
_BLACK_DEC = _build_decoder(_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP)
_MODE_DEC = {(len(c), int(c, 2)): v for c, v in _MODE_CODES.items()}


class _BitReader:
    __slots__ = ("data", "pos")  # pos in bits

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= 8 * len(self.data)

    def bit(self) -> int:
        if self.eof():
            raise CcittError("CCITT stream truncated mid-code")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def peek_eol(self) -> bool:
        """True if the next 12 bits are an EOL (without consuming)."""
        save = self.pos
        try:
            v = 0
            for _ in range(12):
                v = (v << 1) | self.bit()
            return v == 1
        except CcittError:
            return False
        finally:
            self.pos = save


def _read_run(br: _BitReader, color: int) -> int:
    """One complete run (make-up codes + the terminating code)."""
    table = _BLACK_DEC if color else _WHITE_DEC
    total = 0
    while True:
        width = 0
        acc = 0
        run = None
        while width < 14:
            acc = (acc << 1) | br.bit()
            width += 1
            run = table.get((width, acc))
            if run is not None:
                break
        if run is None:
            raise CcittError(
                f"invalid {'black' if color else 'white'} run code "
                f"{acc:0{width}b}"
            )
        total += run
        if run < 64:  # terminating code ends the run
            return total
        # make-up code: the same-colour sequence continues


def _skip_eol(br: _BitReader, byte_align: bool) -> bool:
    """Consume fill bits + one EOL; returns False at clean stream end
    (RTC / EOFB trailers and trailing fill are accepted)."""
    if byte_align:
        br.align()
    zeros = 0
    while True:
        if br.eof():
            return False
        b = br.bit()
        if b == 1:
            if zeros < 11:
                raise CcittError(
                    f"expected an EOL, got a 1 after {zeros} zeros"
                )
            return True
        zeros += 1
        if zeros > 64 * 8:
            raise CcittError("EOL fill run too long")


def _decode_1d_row(br: _BitReader, columns: int) -> list[int]:
    """One 1D-coded row -> changing-element positions (transitions)."""
    transitions: list[int] = []
    pos = 0
    color = 0
    while pos < columns:
        run = _read_run(br, color)
        pos += run
        if pos > columns:
            raise CcittError(
                f"1D row overruns: {pos} pixels for {columns} columns"
            )
        transitions.append(pos)
        color ^= 1
    return transitions


def _decode_2d_row(br: _BitReader, ref: list[int],
                   columns: int) -> list[int]:
    """One 2D-coded row against the reference line's transitions."""
    cur: list[int] = []
    a0 = -1
    color = 0
    while a0 < columns:
        # b1: first ref transition > a0 whose colour change matches
        # (even index = white->black); b2: the next one after b1.
        # bisect_right also serves the imaginary a0 = -1 row start.
        i = bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns
        # read one mode code
        width = 0
        acc = 0
        mode = None
        while width < 8:
            acc = (acc << 1) | br.bit()
            width += 1
            mode = _MODE_DEC.get((width, acc))
            if mode is not None:
                break
        if mode is None:
            if acc == 0:  # 7+ zeros: extension / uncompressed territory
                raise NotImplementedError(
                    "CCITT 2D extension/uncompressed mode not supported"
                )
            raise CcittError(f"invalid 2D mode code {acc:0{width}b}")
        if mode == "pass":
            a0 = b2
        elif mode == "horiz":
            start = max(a0, 0)
            r1 = _read_run(br, color)
            r2 = _read_run(br, color ^ 1)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > columns:
                raise CcittError("2D horizontal runs overrun the row")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
        else:  # vertical
            a1 = b1 + mode
            if not 0 <= a1 <= columns:
                raise CcittError(f"2D vertical lands at {a1}")
            cur.append(a1)
            color ^= 1
            a0 = a1
    if cur and cur[-1] > columns:
        raise CcittError("2D row overruns the declared columns")
    return cur


def _expand(transitions: list[int], columns: int,
            row: np.ndarray) -> None:
    """Transitions -> pixels (1 = black) into a preallocated row."""
    pos = 0
    color = 0
    for tr in transitions:
        if color:
            row[pos:tr] = 1
        pos = tr
        color ^= 1
    if color and pos < columns:
        row[pos:] = 1


def ccitt_decode(data: bytes, columns: int, rows: int,
                 mode: str = "g4", byte_align: bool = False) -> np.ndarray:
    """CCITT bitstream -> (rows, columns) uint8 array, 1 = black.

    ``mode``: ``"mh"`` (1D, byte-aligned rows, no EOL — TIFF
    Compression 2), ``"g3-1d"`` / ``"g3-2d"`` (T.4 with EOLs, the 2D
    form reading the tag bit after each EOL), ``"g4"`` (T.6 MMR).
    ``byte_align``: EOLs/rows start byte-aligned (T4Options bit 2 /
    PDF EncodedByteAlign)."""
    if columns <= 0 or rows <= 0:
        raise CcittError(f"bad CCITT geometry {columns}x{rows}")
    if mode not in ("mh", "g3-1d", "g3-2d", "g4"):
        raise CcittError(f"unknown CCITT mode {mode!r}")
    br = _BitReader(data)
    out = np.zeros((rows, columns), dtype=np.uint8)
    ref: list[int] = []  # all-white reference line (no transitions)
    for y in range(rows):
        if mode == "mh":
            if y:
                br.align()
            transitions = _decode_1d_row(br, columns)
        elif mode == "g4":
            transitions = _decode_2d_row(br, ref, columns)
        else:
            # T.4: an EOL precedes every row (the first is customary);
            # tolerate a missing leading EOL from lenient writers
            if y == 0 and not br.peek_eol():
                pass  # row data starts immediately
            elif not _skip_eol(br, byte_align):
                raise CcittError(f"G3 stream ends before row {y}")
            if mode == "g3-2d":
                one_d = br.bit()  # tag bit: 1 = 1D row, 0 = 2D row
                transitions = (
                    _decode_1d_row(br, columns) if one_d
                    else _decode_2d_row(br, ref, columns)
                )
            else:
                transitions = _decode_1d_row(br, columns)
        _expand(transitions, columns, out[y])
        ref = transitions
    return out


# --- encoder (fixture generator) -----------------------------------------------


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[str] = []

    def put(self, code: str) -> None:
        self.bits.append(code)

    def align(self) -> None:
        n = sum(len(c) for c in self.bits) & 7
        if n:
            self.bits.append("0" * (8 - n))

    def done(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(
            int(s[i:i + 8], 2) for i in range(0, len(s), 8)
        )


def _put_run(bw: _BitWriter, run: int, color: int) -> None:
    term = _BLACK_TERM if color else _WHITE_TERM
    makeup = _BLACK_MAKEUP if color else _WHITE_MAKEUP
    while run >= 2624:  # 2560 + 63: repeated extended make-ups
        bw.put(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        if m > 1728:
            bw.put(_EXT_MAKEUP[m])
        else:
            bw.put(makeup[m])
        run -= m
    bw.put(term[run])


def _transitions(row: np.ndarray) -> list[int]:
    """Changing-element positions: even index = white->black (a row
    starting black gets a transition at 0)."""
    (idx,) = np.nonzero(np.diff(row.astype(np.int8)))
    out = [int(i) + 1 for i in idx]
    if row[0]:
        out.insert(0, 0)
    return out


def _runs(row: np.ndarray) -> list[int]:
    """Alternating run lengths starting WHITE (first may be 0)."""
    n = len(row)
    changes = [int(i) + 1
               for i in np.nonzero(np.diff(row.astype(np.int8)))[0]]
    changes.append(n)
    runs = [0] if row[0] else []
    pos = 0
    for c in changes:
        runs.append(c - pos)
        pos = c
    return runs


def _put_1d_row(bw: _BitWriter, row: np.ndarray) -> None:
    for i, r in enumerate(_runs(row)):
        _put_run(bw, r, i & 1)


def _put_2d_row(bw: _BitWriter, row: np.ndarray, ref: list[int]) -> None:
    columns = len(row)
    cur = _transitions(row)
    a0 = -1
    color = 0
    ci = 0
    _VERT = {0: "1", 1: "011", 2: "000011", 3: "0000011",
             -1: "010", -2: "000010", -3: "0000010"}
    while a0 < columns:
        a1 = cur[ci] if ci < len(cur) else columns
        a2 = cur[ci + 1] if ci + 1 < len(cur) else columns
        i = bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns
        if b2 < a1:
            bw.put("0001")  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.put(_VERT[a1 - b1])
            a0 = a1
            color ^= 1
            ci += 1
        else:
            bw.put("001")  # horizontal
            start = max(a0, 0)
            _put_run(bw, a1 - start, color)
            _put_run(bw, a2 - a1, color ^ 1)
            a0 = a2
            ci += 2


def ccitt_encode(img: np.ndarray, mode: str = "g4",
                 byte_align: bool = False) -> bytes:
    """(rows, columns) array (nonzero = black) -> CCITT bitstream in
    the chosen layout — the fixture mirror for :func:`ccitt_decode`.
    ``g3-2d`` writes the first row 1D (tag 1) and the rest 2D."""
    img = (np.asarray(img) != 0).astype(np.uint8)
    if img.ndim != 2 or not img.size:
        raise ValueError("ccitt_encode wants a non-empty 2D array")
    bw = _BitWriter()
    ref: list[int] = []
    for y in range(img.shape[0]):
        row = img[y]
        if mode == "mh":
            if y:
                bw.align()
            _put_1d_row(bw, row)
        elif mode == "g3-1d":
            if byte_align:
                bw.align()
            bw.put(_EOL)
            _put_1d_row(bw, row)
        elif mode == "g3-2d":
            if byte_align:
                bw.align()
            bw.put(_EOL)
            if y == 0:
                bw.put("1")
                _put_1d_row(bw, row)
            else:
                bw.put("0")
                _put_2d_row(bw, row, ref)
        elif mode == "g4":
            _put_2d_row(bw, row, ref)
        else:
            raise ValueError(f"unknown CCITT mode {mode!r}")
        ref = _transitions(row)
    if mode == "g4":
        bw.put(_EOL + _EOL)  # EOFB
    elif mode.startswith("g3"):
        for _ in range(6):  # RTC
            bw.put(_EOL + ("1" if mode == "g3-2d" else ""))
    return bw.done()
