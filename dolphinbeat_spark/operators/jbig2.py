"""JBIG2 (ITU-T T.88) from scratch — the MQ arithmetic coder and
generic-region decoding for the embedded-in-PDF profile
(``JBIG2Decode`` filter with ``/JBIG2Globals``), closing the largest
remaining scanned-document boundary after r11's CCITT work: JBIG2 is
the other half of the bilevel world (next to CCITT G3/G4), and
scanned-PDF corpora use it heavily because it compresses ~2-5×
tighter than G4.

Covered (r13):
- the **MQ arithmetic decoder and encoder** (T.88 Annex E, the same
  coder JPEG 2000 shares): 47-state Qe table, BYTEIN/BYTEOUT with
  0xFF stuffing, INITDEC/INITENC/FLUSH. Pinned against the SPEC'S OWN
  published test sequence (T.88 Annex H.2: the 32-byte input whose
  encoding is the published 30-byte stream) — the
  third-implementation evidence for this environment, where no
  jbig2dec/Pillow exists (per the r12 conformance lesson:
  self-roundtrips alone are not evidence);
- **generic region decoding** (T.88 §6.2): templates GB0-GB3 with
  arbitrary AT pixel placement at the spec's FIXED context bit
  positions (a real stream's non-nominal AT must land on the same
  state indices the encoder used), and TPGDON typical-prediction
  with the per-template pseudo-contexts (0x9B25/0x0795/0xE5/0x195);
- **MMR generic regions** (flags bit 0): T.6 payload routed through
  the in-repo CCITT decoder (operators/ccitt.py, mode="g4") — JBIG2
  MMR *is* T.6;
- **symbol dictionaries and text regions** (§6.5/§6.4, arithmetic
  profile — the scanned-TEXT layout jbig2enc/LuraDocument emit):
  Annex A arithmetic integer decoding (IADH/IADW/IAEX/IADT/IAFS/
  IADS/IAIT context trees + fixed-length IAID), height-class symbol
  decoding sharing one coder and one GB context set per segment,
  export-run flags, strip-based instance placement with all four
  reference corners, both orientations (TRANSPOSED), SBDSOFFSET and
  the strip CURT form, symbols composed with the region SBCOMBOP,
  and symbol accumulation across referred dictionary chains;
- the **embedded segment layer**: segment headers (short and long
  referred-to forms), page information (type 48, incl. the
  unknown-height striped form grown by end-of-stripe), immediate /
  immediate-lossless / intermediate generic regions (36/38/39),
  end-of-stripe/page/file (50/49/51), external combination operators
  (OR/AND/XOR/XNOR/REPLACE), and the PDF two-stream arrangement
  (globals segments first, then the page stream);
- **encoder mirrors** (generic region, symbol dictionary + text
  region) for fixtures and roundtrip/fuzz pinning.

- **pattern dictionaries and halftone regions** (§6.7/§6.6, r13):
  collective-bitmap pattern decode with the fixed (-HDPW, 0) AT
  placement, Annex C gray-scale images (Gray-coded bitplanes MSB
  first through one shared arithmetic stream), and the skewed
  1/256-pixel fixed-point grid stamping with all combination
  operators;
- **generic refinement** (§6.3, r13): both GRTEMPLATE forms at the
  reference decoder's fixed context layout, TPGRON typical
  prediction, immediate refinement region segments (41/42) refining
  the page content in place, SDREFAGG single-instance aggregate
  symbol coding, and SBREFINE per-instance text touch-ups (incl.
  size-changing RDW/RDH with the §6.4.11 floor offset).

- **Huffman profile** (T.88 Annex B, r14): standard tables B.1-B.15
  (transcription pinned structurally at import: canonical prefix
  assignment + contiguous range tiling), custom code-table segments
  (type 53), SDHUFF=1 symbol dictionaries with raw (BMSIZE=0) and
  MMR collective bitmaps split by width chains, and SBHUFF=1 text
  regions with the §7.4.4.4.1 runcoded symbol-ID prefix table — the
  ancient-Xerox-class encoder family.

Named boundaries (fail loud, fuzz-pinned): Huffman + refinement
combinations (SDHUFF&SDREFAGG, SBHUFF&SBREFINE — the arithmetic
refinement layer covers wild touch-ups),
multi-instance aggregation (REFAGGNINST > 1, a
recursive text region), MMR-coded halftone BITPLANES and
HENABLESKIP (MMR pattern dictionaries decode via the T.6 codec),
intermediate regions (types 4/20/40 retained-buffer
forms beyond 36's inline decode), unknown-length generic regions
(0xFFFFFFFF data length), and file-header (non-embedded) streams. Conformance caveat:
no jbig2dec exists in this container, so the symbol/text/refinement
layers are pinned by the spec's own H.2 MQ vector,
geometry-invariant roundtrips across every corner × orientation, and
hostile fuzz — the generic-region layer carries the published-vector
pin for the shared coder.

Bitmaps are (rows, cols) uint8 with 1 = BLACK ink, matching
operators/ccitt.py; the photometric mapping is the caller's
(pdf.py inverts to its 0=black gray convention).

Scale note: decodes run per-payload inside the same Arrow
``mapInPandas`` slot as every other codec here — partition-parallel
across a crawl; ``max_pixels`` bounds hostile region declarations.

Reference parity: the reference repo has no media layer; this
extends the multimodal decode surface per SURVEY §7.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "Jbig2Error", "decode_jbig2_embedded", "encode_jbig2_generic",
    "decode_generic_region", "MQDecoder", "MQEncoder",
]


class Jbig2Error(ValueError):
    """Typed JBIG2 (T.88) format error."""


# T.88 Table E.1 — Qe values and state transitions.
# (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 Annex E MQ arithmetic decoder. Context state lives in the
    caller-owned ``icx``/``mps`` arrays (one adaptive slot per
    context index), so one decoder can serve several context sets.
    Reads beyond the stream return 0xFF bytes per E.3.4's marker
    semantics (1-bits feed in), which is how terminated segments
    drain."""

    __slots__ = ("data", "n", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        # INITDEC (E.3.5)
        self.bp = 0
        self.c = self._byte(0) << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.data[i] if i < self.n else 0xFF

    def _bytein(self) -> None:
        # E.3.4: 0xFF stuffing — after an 0xFF byte only 7 bits enter,
        # and a following byte > 0x8F means "past the end": feed 1s
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, icx: list, mps: list, cx: int) -> int:
        """DECODE (E.3.2) with MPS/LPS conditional exchange."""
        i = icx[cx]
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange path (E.3.2 figure: chigh < Qe)
            if self.a < qe:
                d = mps[cx]
                icx[cx] = nmps
            else:
                d = 1 - mps[cx]
                if switch:
                    mps[cx] = 1 - mps[cx]
                icx[cx] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return mps[cx]
            if self.a < qe:
                d = 1 - mps[cx]
                if switch:
                    mps[cx] = 1 - mps[cx]
                icx[cx] = nlps
            else:
                d = mps[cx]
                icx[cx] = nmps
        # RENORMD (E.3.3)
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E MQ arithmetic encoder (the fixture mirror)."""

    __slots__ = ("out", "c", "a", "ct")

    def __init__(self):
        self.out = bytearray()
        # INITENC (E.3.6)
        self.c = 0
        self.a = 0x8000
        self.ct = 12

    def encode(self, icx: list, mps: list, cx: int, d: int) -> None:
        i = icx[cx]
        qe, nmps, nlps, switch = _QE[i]
        if d == mps[cx]:  # CODEMPS (E.3.7)
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            icx[cx] = nmps
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                mps[cx] = 1 - mps[cx]
            icx[cx] = nlps
        # RENORME
        while True:
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        # E.3.7 BYTEOUT with carry propagation and 0xFF stuffing
        if self.out and self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
            return
        if self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
            return
        # carry into the previous byte (a carry before any byte is
        # emitted propagates into the discarded BPST-1 position)
        if self.out:
            self.out[-1] += 1
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
                return
        self.c &= 0x7FFFFFF
        self.out.append((self.c >> 19) & 0xFF)
        self.c &= 0x7FFFF
        self.ct = 8

    def flush(self) -> bytes:
        # E.3.8 FLUSH: SETBITS (set as many low 1-bits as fit inside
        # the final interval [C, C+A)), two byteouts, 0xFF 0xAC
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if not self.out or self.out[-1] != 0xFF:
            self.out.append(0xFF)
        self.out.append(0xAC)
        return bytes(self.out)


# Generic-region context templates (T.88 §6.2.5.3, figures 4-7), as
# FIXED bit positions (LSB-relative): (dx, dy, bit) for the static
# pixels; AT slots listed separately with their nominal positions and
# their fixed bit indices. Matching the spec's bit packing matters
# for two reasons: the TPGDON pseudo-contexts below are absolute
# values under this packing, and a real stream with NON-nominal AT
# pixels keeps the AT contribution at the same bit slot.
_TEMPLATES = {
    0: {
        "fixed": [(-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
                  (2, -1, 5), (1, -1, 6), (0, -1, 7), (-1, -1, 8),
                  (-2, -1, 9),
                  (1, -2, 12), (0, -2, 13), (-1, -2, 14)],
        "at": [((3, -1), 4), ((-3, -1), 10), ((2, -2), 11),
               ((-2, -2), 15)],
        "pseudo": 0x9B25,
    },
    1: {
        "fixed": [(-1, 0, 0), (-2, 0, 1), (-3, 0, 2),
                  (2, -1, 4), (1, -1, 5), (0, -1, 6), (-1, -1, 7),
                  (-2, -1, 8),
                  (2, -2, 9), (1, -2, 10), (0, -2, 11), (-1, -2, 12)],
        "at": [((3, -1), 3)],
        "pseudo": 0x0795,
    },
    2: {
        "fixed": [(-1, 0, 0), (-2, 0, 1),
                  (1, -1, 3), (0, -1, 4), (-1, -1, 5), (-2, -1, 6),
                  (1, -2, 7), (0, -2, 8), (-1, -2, 9)],
        "at": [((2, -1), 2)],
        "pseudo": 0x00E5,
    },
    3: {
        "fixed": [(-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
                  (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8),
                  (-3, -1, 9)],
        "at": [((2, -1), 4)],
        "pseudo": 0x0195,
    },
}


def _template_offsets(template: int,
                      at: list[tuple[int, int]]) -> list[tuple]:
    spec = _TEMPLATES[template]
    if len(at) != len(spec["at"]):
        raise Jbig2Error(
            f"template {template} needs {len(spec['at'])} AT pixels, "
            f"got {len(at)}")
    offs = list(spec["fixed"])
    for (ax, ay), (_, bit) in zip(at, spec["at"]):
        if ay > 0 or (ay == 0 and ax >= 0):
            raise Jbig2Error(
                f"AT pixel ({ax},{ay}) is not strictly before the "
                "current pixel in raster order")
        offs.append((ax, ay, bit))
    return offs


def decode_generic_region(data: bytes, width: int, height: int,
                          template: int = 0,
                          at: list[tuple[int, int]] | None = None,
                          tpgdon: bool = False,
                          mmr: bool = False,
                          decoder: "MQDecoder | None" = None,
                          icx: list | None = None,
                          mps: list | None = None) -> np.ndarray:
    """One generic region -> (height, width) uint8 bitmap, 1 = black
    (T.88 §6.2). ``mmr=True`` routes the payload through the in-repo
    T.6 decoder instead of arithmetic coding. A caller running
    several regions in one arithmetic context (T.88 allows it within
    a page stream only via retained intermediates — rare) can pass
    its own decoder/state arrays."""
    if mmr:
        from dolphinbeat_spark.operators.ccitt import (
            CcittError, ccitt_decode,
        )
        try:
            return ccitt_decode(data, width, height, mode="g4")
        except CcittError as ex:
            raise Jbig2Error(f"MMR generic region: {ex}") from ex
    if template not in _TEMPLATES:
        raise Jbig2Error(f"generic template {template} outside 0..3")
    if at is None:
        at = [a for a, _ in _TEMPLATES[template]["at"]]
    offs = _template_offsets(template, at)
    pseudo = _TEMPLATES[template]["pseudo"]
    pad_top = max(-dy for _, dy, _ in offs)
    pad_l = max(max(-dx for dx, _, _ in offs), 0)
    pad_r = max(max(dx for dx, _, _ in offs), 0)
    bmp = np.zeros((height + pad_top, width + pad_l + pad_r), np.uint8)
    if decoder is None:
        decoder = MQDecoder(data)
    nstates = 1 << (max(b for _, _, b in offs) + 1)
    if icx is None:
        icx = [0] * nstates
        mps = [0] * nstates
    dec = decoder.decode
    # column offsets rebased to the padded array (rows use yy + dy
    # directly: yy already carries pad_top), hoisted for the hot loop
    offp = [(dx + pad_l, dy, bit) for dx, dy, bit in offs]
    ltp = 0
    for y in range(height):
        if tpgdon:
            if dec(icx, mps, pseudo):
                ltp ^= 1
            if ltp:
                if y:
                    bmp[y + pad_top - 1 + 1] = bmp[y + pad_top - 1]
                continue
        yy = y + pad_top
        row = bmp[yy]
        for x in range(width):
            ctx = 0
            for dx, dy, bit in offp:
                if bmp[yy + dy, x + dx]:
                    ctx |= 1 << bit
            row[x + pad_l] = dec(icx, mps, ctx)
    return bmp[pad_top:, pad_l:width + pad_l].copy()


def _encode_generic_region(bmp: np.ndarray, template: int = 0,
                           tpgdon: bool = False,
                           at: list | None = None) -> bytes:
    """Mirror of decode_generic_region (arithmetic coding) for
    fixtures; ``at`` overrides the nominal AT placement (the pattern
    dictionary and grayscale-plane forms use fixed non-nominal
    positions)."""
    height, width = bmp.shape
    if at is None:
        at = [a for a, _ in _TEMPLATES[template]["at"]]
    offs = _template_offsets(template, at)
    pseudo = _TEMPLATES[template]["pseudo"]
    pad_top = max(-dy for _, dy, _ in offs)
    pad_l = max(max(-dx for dx, _, _ in offs), 0)
    pad_r = max(max(dx for dx, _, _ in offs), 0)
    padded = np.zeros((height + pad_top, width + pad_l + pad_r),
                      np.uint8)
    nstates = 1 << (max(b for _, _, b in offs) + 1)
    icx = [0] * nstates
    mps = [0] * nstates
    enc = MQEncoder()
    offp = [(dx + pad_l, dy, bit) for dx, dy, bit in offs]
    ltp = 0
    for y in range(height):
        yy = y + pad_top
        if tpgdon:
            typical = y > 0 and bool(
                (bmp[y] == bmp[y - 1]).all()) or (y == 0 and not
                                                  bmp[y].any())
            # SLTP flips LTP whenever the typicality CHANGES
            sltp = 1 if typical != bool(ltp) else 0
            enc.encode(icx, mps, pseudo, sltp)
            if sltp:
                ltp ^= 1
            if ltp:
                padded[yy] = padded[yy - 1] if y else 0
                continue
        for x in range(width):
            ctx = 0
            for dx, dy, bit in offp:
                if padded[yy + dy, x + dx]:
                    ctx |= 1 << bit
            bit_v = int(bmp[y, x] & 1)
            enc.encode(icx, mps, ctx, bit_v)
            padded[yy, x + pad_l] = bit_v
    return enc.flush()


class _IntCtx:
    """Adaptive context state for ONE arithmetic integer procedure
    (T.88 Annex A: IADH, IADW, IAEX, IAAI, IADT, IAFS, IADS, IAIT
    each own a 512-slot tree indexed by PREV)."""

    __slots__ = ("icx", "mps")

    def __init__(self, size: int = 512):
        self.icx = [0] * size
        self.mps = [0] * size


_INT_RANGES = ((2, 0), (4, 4), (6, 20), (8, 84), (12, 340),
               (32, 4436))


def _decode_int(dec: MQDecoder, ctx: _IntCtx) -> int | None:
    """T.88 A.2 arithmetic integer decoding. None = OOB."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(ctx.icx, ctx.mps, prev)
        prev = ((prev << 1) | b) if prev < 256             else ((((prev << 1) | b) & 511) | 256)
        return b

    s = bit()
    for i, (nbits, offset) in enumerate(_INT_RANGES):
        if i == len(_INT_RANGES) - 1 or not bit():
            v = 0
            for _ in range(nbits):
                v = (v << 1) | bit()
            v += offset
            break
    if s and v == 0:
        return None  # OOB
    return -v if s else v


def _encode_int(enc: MQEncoder, ctx: _IntCtx,
                value: int | None) -> None:
    """Mirror of _decode_int; ``None`` encodes OOB (S=1, V=0)."""
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(ctx.icx, ctx.mps, prev, b)
        prev = ((prev << 1) | b) if prev < 256             else ((((prev << 1) | b) & 511) | 256)

    if value is None:
        s, v = 1, 0
    else:
        s = 1 if value < 0 else 0
        v = -value if value < 0 else value
    bit(s)
    for i, (nbits, offset) in enumerate(_INT_RANGES):
        top = offset + (1 << nbits)
        last = i == len(_INT_RANGES) - 1
        if v < top or last:
            if not last:
                bit(0)
            rem = v - offset
            for k in range(nbits - 1, -1, -1):
                bit((rem >> k) & 1)
            return
        bit(1)


def _decode_iaid(dec: MQDecoder, ctx: _IntCtx, code_len: int) -> int:
    """T.88 A.3 IAID: fixed-length symbol-id decoding through a
    (1 << (code_len + 1))-slot PREV tree."""
    prev = 1
    for _ in range(code_len):
        b = dec.decode(ctx.icx, ctx.mps, prev)
        prev = (prev << 1) | b
    return prev - (1 << code_len)


def _encode_iaid(enc: MQEncoder, ctx: _IntCtx, code_len: int,
                 value: int) -> None:
    prev = 1
    v = value + (1 << code_len)
    for k in range(code_len - 1, -1, -1):
        b = (v >> k) & 1
        enc.encode(ctx.icx, ctx.mps, prev, b)
        prev = (prev << 1) | b


def _sym_code_len(n_syms: int) -> int:
    return max(1, (n_syms - 1).bit_length()) if n_syms > 1 else 0


# Generic refinement region templates (T.88 §6.3.5.3), as fixed bit
# positions mirroring the published reference decoder's layout:
# (is_ref, dx, dy, bit). GRTEMPLATE 0 carries two AT pixels (A1 in
# the current bitmap at nominal (-1,-1), A2 in the reference at
# nominal (-1,-1)); GRTEMPLATE 1 has none.
_REF_TEMPLATES = {
    0: {
        "cur": [(-1, 0, 0), (1, -1, 1), (0, -1, 2)],
        "ref": [(1, 1, 4), (0, 1, 5), (-1, 1, 6), (1, 0, 8),
                (0, 0, 9), (-1, 0, 10), (1, -1, 11), (0, -1, 12)],
        "at_cur": ((-1, -1), 3),
        "at_ref": ((-1, -1), 7),
        "pseudo": 0x0100,
    },
    1: {
        "cur": [(-1, 0, 0), (1, -1, 1), (0, -1, 2), (-1, -1, 3)],
        "ref": [(1, 1, 4), (0, 1, 5), (1, 0, 6), (0, 0, 7),
                (-1, 0, 8), (0, -1, 9)],
        "at_cur": None,
        "at_ref": None,
        "pseudo": 0x0080,
    },
}


def _refinement_offsets(template: int, at):
    spec = _REF_TEMPLATES[template]
    cur = list(spec["cur"])
    ref = list(spec["ref"])
    if template == 0:
        a1 = at[0] if at else spec["at_cur"][0]
        a2 = at[1] if at and len(at) > 1 else spec["at_ref"][0]
        cur.append((a1[0], a1[1], spec["at_cur"][1]))
        ref.append((a2[0], a2[1], spec["at_ref"][1]))
    elif at:
        raise Jbig2Error("refinement template 1 takes no AT pixels")
    return cur, ref, spec["pseudo"]


def decode_refinement_region(width: int, height: int,
                             reference: np.ndarray,
                             dx: int = 0, dy: int = 0,
                             template: int = 0,
                             at=None, tpgron: bool = False,
                             decoder: "MQDecoder | None" = None,
                             data: bytes = b"",
                             icx: list | None = None,
                             mps: list | None = None) -> np.ndarray:
    """Generic refinement region (T.88 §6.3): decode a bitmap against
    ``reference`` shifted by (dx, dy) — current-bitmap and
    reference-bitmap neighborhoods feed one context. TPGRON typical
    prediction skips pixels whose shifted reference 3x3 neighborhood
    is uniform. Conformance caveat (module docstring): pinned by
    mirror roundtrips and fuzz; no third implementation in this
    container."""
    if template not in _REF_TEMPLATES:
        raise Jbig2Error(f"refinement template {template} outside 0..1")
    cur_offs, ref_offs, pseudo = _refinement_offsets(template, at)
    if decoder is None:
        decoder = MQDecoder(data)
    if icx is None:
        icx = [0] * 8192
        mps = [0] * 8192
    rh, rw = reference.shape
    out = np.zeros((height, width), np.uint8)
    dec = decoder.decode

    def refpx(yy: int, xx: int) -> int:
        return int(reference[yy, xx])             if 0 <= yy < rh and 0 <= xx < rw else 0

    ltp = 0
    for y in range(height):
        if tpgron:
            if dec(icx, mps, pseudo):
                ltp ^= 1
        ry = y - dy
        for x in range(width):
            rx = x - dx
            if ltp:
                # §6.3.5.6: uniform shifted 3x3 reference wins
                s = sum(refpx(ry + j, rx + i)
                        for j in (-1, 0, 1) for i in (-1, 0, 1))
                if s == 0:
                    continue
                if s == 9:
                    out[y, x] = 1
                    continue
            ctx = 0
            for ox, oy, bit in cur_offs:
                xx, yy = x + ox, y + oy
                if 0 <= yy < height and 0 <= xx < width \
                        and out[yy, xx]:
                    ctx |= 1 << bit
            for ox, oy, bit in ref_offs:
                if refpx(ry + oy, rx + ox):
                    ctx |= 1 << bit
            out[y, x] = dec(icx, mps, ctx)
    return out


def _encode_refinement_region(bmp: np.ndarray, reference: np.ndarray,
                              dx: int = 0, dy: int = 0,
                              template: int = 0,
                              tpgron: bool = False,
                              encoder: "MQEncoder | None" = None,
                              icx: list | None = None,
                              mps: list | None = None) -> bytes | None:
    """Mirror of decode_refinement_region. Returns the flushed bytes
    when it owns the encoder, else None (caller flushes)."""
    cur_offs, ref_offs, pseudo = _refinement_offsets(template, None)
    own = encoder is None
    if own:
        encoder = MQEncoder()
    if icx is None:
        icx = [0] * 8192
        mps = [0] * 8192
    height, width = bmp.shape
    rh, rw = reference.shape

    def refpx(yy: int, xx: int) -> int:
        return int(reference[yy, xx]) \
            if 0 <= yy < rh and 0 <= xx < rw else 0

    ltp = 0
    for y in range(height):
        ry = y - dy
        if tpgron:
            # a row is "typical" when every pixel with a uniform
            # shifted reference neighborhood equals that value
            typical = True
            for x in range(width):
                rx = x - dx
                s = sum(refpx(ry + j, rx + i)
                        for j in (-1, 0, 1) for i in (-1, 0, 1))
                if (s == 0 and bmp[y, x]) or (s == 9 and not bmp[y, x]):
                    typical = False
                    break
            sltp = 1 if typical != bool(ltp) else 0
            encoder.encode(icx, mps, pseudo, sltp)
            ltp ^= sltp
        for x in range(width):
            rx = x - dx
            if ltp:
                s = sum(refpx(ry + j, rx + i)
                        for j in (-1, 0, 1) for i in (-1, 0, 1))
                if s in (0, 9):
                    continue
            ctx = 0
            for ox, oy, bit in cur_offs:
                xx, yy = x + ox, y + oy
                if 0 <= yy < height and 0 <= xx < width \
                        and bmp[yy, xx]:
                    ctx |= 1 << bit
            for ox, oy, bit in ref_offs:
                if refpx(ry + oy, rx + ox):
                    ctx |= 1 << bit
            encoder.encode(icx, mps, ctx, int(bmp[y, x]))
    return encoder.flush() if own else None


# ---------------------------------------------------------------
# Embedded segment layer


_COMB_OPS = {0: "or", 1: "and", 2: "xor", 3: "xnor", 4: "replace"}


# --- Huffman profile (T.88 Annex B, §6.5.5/§6.4 SDHUFF/SBHUFF, r14) --------


class _MsbReader:
    """MSB-first bit reader over a segment payload (Huffman-coded
    segments; the arithmetic profile uses MQDecoder instead)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.bitpos = byte_pos * 8

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise Jbig2Error("Huffman bitstream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.bitpos & 7)))
                            & 1)
            self.bitpos += 1
        return v

    def byte_align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def byte_pos(self) -> int:
        return (self.bitpos + 7) >> 3


class _MsbWriter:
    """MSB-first bit writer (fixture mirror of _MsbReader)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def byte_align(self) -> None:
        if self.nbits:
            self.out.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0

    def getvalue(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


class _HuffTable:
    """One T.88 Annex-B Huffman table: lines of (prefix length,
    range length, range low, kind) with kind in {"n" (normal), "l"
    (lower range, value = low - offset), "o" (out of band)}. Prefix
    codes are assigned canonically per B.3: ascending prefix length,
    table order within one length. Decode returns the integer value
    or None for OOB; encode is the fixture mirror."""

    __slots__ = ("lines", "by_code", "max_len", "oob")

    def __init__(self, lines):
        self.lines = [
            ln if len(ln) == 4 else (*ln, "n") for ln in lines
            if ln[0] > 0
        ]
        if not self.lines:
            raise Jbig2Error("Huffman table with no coded lines")
        self.max_len = max(ln[0] for ln in self.lines)
        if self.max_len > 32:
            raise Jbig2Error(f"Huffman prefix length {self.max_len}")
        self.by_code: dict[tuple[int, int], tuple] = {}
        code = 0
        for length in range(1, self.max_len + 1):
            code <<= 1 if length > 1 else 0
            for ln in self.lines:
                if ln[0] == length:
                    if code >= 1 << length:
                        raise Jbig2Error(
                            "over-subscribed Huffman table")
                    self.by_code[(length, code)] = ln
                    code += 1
        self.oob = any(ln[3] == "o" for ln in self.lines)

    def decode(self, r: _MsbReader) -> int | None:
        length = 0
        code = 0
        while length < self.max_len:
            code = (code << 1) | r.read(1)
            length += 1
            ln = self.by_code.get((length, code))
            if ln is not None:
                preflen, rangelen, low, kind = ln
                del preflen
                if kind == "o":
                    return None
                if kind == "l":
                    return low - r.read(rangelen)
                return low + r.read(rangelen)
        raise Jbig2Error("invalid Huffman prefix code")

    # --- fixture-mirror emission ---

    def _code_of(self, target) -> tuple[int, int]:
        for (length, code), ln in self.by_code.items():
            if ln is target:
                return length, code
        raise Jbig2Error("line has no assigned code")  # pragma: no cover

    def encode(self, w: _MsbWriter, value: int) -> None:
        for ln in self.lines:
            preflen, rangelen, low, kind = ln
            if kind == "n" and low <= value < low + (1 << rangelen):
                length, code = self._code_of(ln)
                w.write(code, length)
                w.write(value - low, rangelen)
                return
        for ln in self.lines:  # lower range as a fallback
            preflen, rangelen, low, kind = ln
            if kind == "l" and value <= low:
                length, code = self._code_of(ln)
                w.write(code, length)
                w.write(low - value, rangelen)
                return
        raise Jbig2Error(f"value {value} outside the Huffman table")

    def encode_oob(self, w: _MsbWriter) -> None:
        for ln in self.lines:
            if ln[3] == "o":
                length, code = self._code_of(ln)
                w.write(code, length)
                return
        raise Jbig2Error("table has no OOB code")


#: T.88 Annex B standard tables B.1-B.15 as (preflen, rangelen,
#: rangelow[, kind]) lines. Transcription is pinned structurally at
#: import: canonical assignment must not over-subscribe, and every
#: table's normal ranges must tile contiguously (each line starts
#: where the previous one's range ends) — the property the published
#: tables all share, which catches range-column transposition errors.
_STD_TABLE_LINES = {
    1: [(1, 4, 0), (2, 8, 16), (3, 16, 272), (3, 32, 65808)],
    2: [(1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3), (5, 6, 11),
        (6, 32, 75), (6, 0, 0, "o")],
    3: [(8, 8, -256), (1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3),
        (5, 6, 11), (8, 32, -257, "l"), (7, 32, 75), (6, 0, 0, "o")],
    4: [(1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4), (5, 6, 12),
        (5, 32, 76)],
    5: [(7, 8, -255), (1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4),
        (5, 6, 12), (7, 32, -256, "l"), (6, 32, 76)],
    6: [(5, 10, -2048), (4, 9, -1024), (4, 8, -512), (4, 7, -256),
        (5, 6, -128), (5, 5, -64), (4, 5, -32), (2, 7, 0),
        (3, 7, 128), (3, 8, 256), (4, 9, 512), (4, 10, 1024),
        (6, 32, -2049, "l"), (6, 32, 2048)],
    7: [(4, 9, -1024), (3, 8, -512), (4, 7, -256), (5, 6, -128),
        (5, 5, -64), (4, 5, -32), (4, 5, 0), (5, 5, 32), (5, 6, 64),
        (4, 7, 128), (3, 8, 256), (3, 9, 512), (3, 10, 1024),
        (5, 32, -1025, "l"), (5, 32, 2048)],
    8: [(8, 3, -15), (9, 1, -7), (8, 1, -5), (9, 0, -3), (7, 0, -2),
        (4, 0, -1), (2, 1, 0), (5, 0, 2), (6, 0, 3), (3, 4, 4),
        (6, 1, 20), (4, 4, 22), (4, 5, 38), (5, 6, 70), (5, 7, 134),
        (6, 7, 262), (7, 8, 390), (6, 10, 646), (9, 32, -16, "l"),
        (9, 32, 1670), (2, 0, 0, "o")],
    9: [(8, 4, -31), (9, 2, -15), (8, 2, -11), (9, 1, -7), (7, 1, -5),
        (4, 1, -3), (3, 1, -1), (3, 1, 1), (5, 1, 3), (6, 1, 5),
        (3, 5, 7), (6, 2, 39), (4, 5, 43), (4, 6, 75), (5, 7, 139),
        (5, 8, 267), (6, 8, 523), (7, 9, 779), (6, 11, 1291),
        (9, 32, -32, "l"), (9, 32, 3339), (2, 0, 0, "o")],
    10: [(7, 4, -21), (8, 0, -5), (7, 0, -4), (5, 0, -3), (2, 2, -2),
         (5, 0, 2), (6, 0, 3), (7, 0, 4), (8, 0, 5), (2, 6, 6),
         (5, 5, 70), (6, 5, 102), (7, 6, 134), (8, 7, 198),
         (8, 8, 326), (8, 9, 582), (8, 10, 1094), (7, 11, 2118),
         (8, 32, -22, "l"), (8, 32, 4166), (2, 0, 0, "o")],
    11: [(1, 0, 1), (2, 1, 2), (4, 0, 4), (4, 1, 5), (5, 1, 7),
         (5, 2, 9), (6, 2, 13), (7, 2, 17), (7, 3, 21), (7, 4, 29),
         (7, 5, 45), (7, 6, 77), (7, 32, 141)],
    12: [(1, 0, 1), (2, 0, 2), (3, 1, 3), (5, 0, 5), (5, 1, 6),
         (6, 1, 8), (7, 0, 10), (7, 1, 11), (7, 2, 13), (7, 3, 17),
         (7, 4, 25), (8, 5, 41), (8, 32, 73)],
    13: [(1, 0, 1), (3, 0, 2), (4, 0, 3), (5, 0, 4), (4, 1, 5),
         (3, 3, 7), (6, 1, 15), (6, 2, 17), (6, 3, 21), (6, 4, 29),
         (6, 5, 45), (7, 6, 77), (7, 32, 141)],
    14: [(3, 0, -2), (3, 0, -1), (1, 0, 0), (3, 0, 1), (3, 0, 2)],
    15: [(7, 4, -24), (6, 2, -8), (5, 1, -4), (4, 0, -2), (3, 0, -1),
         (1, 0, 0), (3, 0, 1), (4, 0, 2), (5, 1, 3), (6, 2, 5),
         (7, 4, 9), (7, 32, -25, "l"), (7, 32, 25)],
}

_STD_TABLE_CACHE: dict[int, _HuffTable] = {}


def _std_table(n: int) -> _HuffTable:
    t = _STD_TABLE_CACHE.get(n)
    if t is None:
        t = _STD_TABLE_CACHE[n] = _HuffTable(_STD_TABLE_LINES[n])
    return t


def _check_std_tables() -> None:
    """Import-time structural pin of the Annex-B transcription: every
    table must assign prefix codes without over-subscription (the
    _HuffTable constructor raises) and its normal ranges must tile
    contiguously from the lowest bound up to the 32-bit upper line."""
    for n, lines in _STD_TABLE_LINES.items():
        _std_table(n)
        normals = sorted(
            (ln for ln in lines if len(ln) == 3),
            key=lambda ln: ln[2])
        for a, b in zip(normals, normals[1:]):
            if b[1] == 32:  # the upper line starts where coverage ends
                expected = a[2] + (1 << a[1]) if a[1] < 32 else None
                if expected is not None and b[2] != expected:
                    raise AssertionError(
                        f"table B.{n}: upper line at {b[2]}, "
                        f"coverage ends at {expected}")
                continue
            if a[2] + (1 << a[1]) != b[2]:
                raise AssertionError(
                    f"table B.{n}: range gap between {a} and {b}")


_check_std_tables()


def _parse_table_segment(d: bytes) -> _HuffTable:
    """Custom code-table segment (type 53, T.88 §7.4.13 / B.2)."""
    if len(d) < 9:
        raise Jbig2Error("code table segment truncated")
    flags = d[0]
    htoob = flags & 1
    htps = ((flags >> 1) & 7) + 1
    htrs = ((flags >> 4) & 7) + 1
    low, high = struct.unpack_from(">ii", d, 1)
    if high <= low:
        raise Jbig2Error(f"code table range [{low}, {high}) empty")
    r = _MsbReader(d, 9)
    lines = []
    cur = low
    while cur < high:
        preflen = r.read(htps)
        rangelen = r.read(htrs)
        if rangelen > 32:
            raise Jbig2Error(f"code table range length {rangelen}")
        lines.append((preflen, rangelen, cur, "n"))
        if (1 << rangelen) > high - cur and rangelen == 32:
            break
        cur += 1 << rangelen
    lines.append((r.read(htps), 32, low - 1, "l"))
    lines.append((r.read(htps), 32, high, "n"))
    if htoob:
        lines.append((r.read(htps), 0, 0, "o"))
    return _HuffTable(lines)


def _encode_table_segment(lines, htoob: bool = False,
                          lower_preflen: int = 0,
                          upper_preflen: int | None = None,
                          oob_preflen: int = 0) -> bytes:
    """Fixture mirror of _parse_table_segment: normal lines
    (preflen, rangelen, rangelow) must tile contiguously; the upper
    line defaults to the table's own last 32-bit entry."""
    normals = [ln for ln in lines if len(ln) == 3 or ln[3] == "n"]
    normals = sorted(normals, key=lambda ln: ln[2])
    body = [ln for ln in normals if ln[1] < 32]
    upper = [ln for ln in normals if ln[1] == 32]
    low = body[0][2]
    high = body[-1][2] + (1 << body[-1][1])
    htps = max(4, max(ln[0] for ln in lines).bit_length())
    htrs = 6
    w = _MsbWriter()
    for ln in body:
        w.write(ln[0], htps)
        w.write(ln[1], htrs)
    if upper_preflen is None:
        upper_preflen = upper[0][0] if upper else 0
    w.write(lower_preflen, htps)
    w.write(upper_preflen, htps)
    if htoob:
        w.write(oob_preflen, htps)
    flags = (1 if htoob else 0) | ((htps - 1) << 1) | ((htrs - 1) << 4)
    return bytes([flags]) + struct.pack(">ii", low, high) + w.getvalue()


def _parse_segment_header(data: bytes, pos: int) -> tuple[dict, int]:
    n = len(data)
    if pos + 11 > n:
        raise Jbig2Error("JBIG2 segment header truncated")
    number, flags = struct.unpack_from(">IB", data, pos)
    pos += 5
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    rts = data[pos]
    count = rts >> 5
    if count == 7:
        count = struct.unpack_from(">I", data, pos)[0] & 0x1FFFFFFF
        pos += 4 + (count + 8) // 8  # retain-bit array
    else:
        pos += 1
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    refs = []
    for _ in range(count):
        if pos + ref_size > n:
            raise Jbig2Error("JBIG2 referred-to list truncated")
        refs.append(int.from_bytes(data[pos:pos + ref_size], "big"))
        pos += ref_size
    if page_assoc_4:
        if pos + 4 > n:
            raise Jbig2Error("JBIG2 page association truncated")
        page = struct.unpack_from(">I", data, pos)[0]
        pos += 4
    else:
        if pos >= n:
            raise Jbig2Error("JBIG2 page association truncated")
        page = data[pos]
        pos += 1
    if pos + 4 > n:
        raise Jbig2Error("JBIG2 data length truncated")
    length = struct.unpack_from(">I", data, pos)[0]
    pos += 4
    if length == 0xFFFFFFFF:
        raise NotImplementedError(
            "JBIG2 unknown-length segment (0xFFFFFFFF) not supported")
    if pos + length > n:
        raise Jbig2Error(
            f"JBIG2 segment {number} data truncated "
            f"({length} declared, {n - pos} left)")
    return {
        "number": number, "type": seg_type, "refs": refs,
        "page": page, "data": data[pos:pos + length],
    }, pos + length


def iter_jbig2_segments(data: bytes):
    """Walk an embedded-profile (headerless) segment stream."""
    if data[:8] == b"\x97JB2\r\n\x1a\n":
        raise NotImplementedError(
            "JBIG2 file-header (sequential file) organisation not "
            "supported; the embedded/PDF profile is")
    pos = 0
    while pos < len(data):
        seg, pos = _parse_segment_header(data, pos)
        yield seg


def _parse_region_info(d: bytes) -> dict:
    if len(d) < 17:
        raise Jbig2Error("region segment information truncated")
    w, h, x, y = struct.unpack_from(">IIII", d, 0)
    comb = d[16] & 0x07
    if comb not in _COMB_OPS:
        raise Jbig2Error(f"external combination operator {comb}")
    return {"w": w, "h": h, "x": x, "y": y, "comb": comb}


def _export_runs(read_run, pool: list, n_ex: int) -> list:
    """§6.5.10 export flags: alternating no-export/export runs over
    input symbols followed by new symbols (shared by the arithmetic
    and Huffman profiles; ``read_run`` hides the coder)."""
    exported: list = []
    i = 0
    exflag = 0
    runs = 0
    while i < len(pool):
        run = read_run()
        if run is None or run < 0:
            raise Jbig2Error("bad export run in symbol dictionary")
        runs += 1
        if runs > 2 * len(pool) + 2:  # zero-length-run spin guard
            raise Jbig2Error(
                "export runs fail to cover the symbol pool")
        if exflag:
            exported.extend(pool[i:i + run])
        i += run
        exflag ^= 1
    if len(exported) != n_ex:
        raise Jbig2Error(
            f"symbol dictionary exports {len(exported)}, declared "
            f"{n_ex}")
    return exported


def _decode_symbol_dict_huffman(d: bytes, flags: int, input_syms: list,
                                tables: list,
                                max_pixels: int) -> list:
    """SDHUFF=1 symbol dictionary (T.88 §6.5.5/§7.4.3.1.1, r14):
    heights/widths decode as Huffman delta chains (standard tables
    B.4/B.5 and B.2/B.3, or referred custom table segments) and each
    height class's symbols arrive as ONE collective bitmap — raw
    (BMSIZE=0, byte-aligned rows) or MMR-coded (the T.6 payload
    routed through operators/ccitt.py) — split by the decoded
    widths. SDHUFF+SDREFAGG (r16): each symbol instead decodes via
    §6.5.8.2 single-instance refinement — the symbol ID read as
    SBSYMCODELEN raw bits, RDX/RDY from table B.15, BMSIZE from
    table B.1, then an arithmetic refinement stream over the next
    BMSIZE byte-aligned bytes (GR contexts persist across the
    dictionary; each window gets a fresh MQ decoder). REFAGGNINST >
    1 (recursive text region) stays a named boundary, same as the
    arithmetic profile."""
    if (flags >> 8) & 1:
        raise NotImplementedError(
            "JBIG2 imported bitmap coding contexts (segment flag bit "
            "8) not supported")
    sdrefagg = (flags >> 1) & 1
    rtemplate = (flags >> 12) & 1
    dh_sel = (flags >> 2) & 3
    dw_sel = (flags >> 4) & 3
    bm_sel = (flags >> 6) & 1
    agg_sel = (flags >> 7) & 1
    ti = iter(tables)

    def pick(sel, std: dict, what: str) -> _HuffTable:
        if sel in std:
            return _std_table(std[sel])
        try:
            return next(ti)
        except StopIteration:
            raise Jbig2Error(
                f"symbol dictionary selects a custom {what} table "
                "but refers to no more table segments") from None

    dh_tab = pick(dh_sel, {0: 4, 1: 5}, "DH") if dh_sel != 2 else None
    if dh_tab is None:
        raise Jbig2Error("reserved SDHUFFDH value 2")
    dw_tab = pick(dw_sel, {0: 2, 1: 3}, "DW") if dw_sel != 2 else None
    if dw_tab is None:
        raise Jbig2Error("reserved SDHUFFDW value 2")
    bm_tab = pick(bm_sel, {0: 1}, "BMSIZE")
    agg_tab = pick(agg_sel, {0: 1}, "AGGINST") if sdrefagg else None
    ex_tab = _std_table(1)
    # §6.5.8.2.2 fixed tables for the refinement fields
    rd_tab = _std_table(15)
    rsize_tab = _std_table(1)
    pos = 2  # SDHUFF reads no generic AT pixels (§7.4.3.1.2)
    rat = None
    if sdrefagg and rtemplate == 0:
        rat = []
        for _ in range(2):
            if pos + 2 > len(d):
                raise Jbig2Error(
                    "symbol dictionary refinement AT truncated")
            rat.append((int.from_bytes(d[pos:pos + 1], "big",
                                       signed=True),
                        int.from_bytes(d[pos + 1:pos + 2], "big",
                                       signed=True)))
            pos += 2
    if pos + 8 > len(d):
        raise Jbig2Error("symbol dictionary counts truncated")
    n_ex, n_new = struct.unpack_from(">II", d, pos)
    pos += 8
    if n_new > 1 << 20 or n_ex > 1 << 20:
        raise Jbig2Error(
            f"symbol dictionary declares {n_new} new / {n_ex} "
            "exported symbols")
    r = _MsbReader(d, pos)
    code_len = _sym_code_len(len(input_syms) + n_new)
    gr_icx = [0] * 8192
    gr_mps = [0] * 8192
    new_syms: list = []
    hc_height = 0
    area = 0
    classes = 0
    while len(new_syms) < n_new:
        classes += 1
        if classes > n_new + 64:
            raise Jbig2Error(
                "symbol dictionary height classes never reach "
                "SDNUMNEWSYMS")
        dh = dh_tab.decode(r)
        if dh is None:
            raise Jbig2Error("OOB height-class delta in symbol "
                             "dictionary")
        hc_height += dh
        if hc_height <= 0 or hc_height > 1 << 14:
            raise Jbig2Error(f"symbol height class {hc_height}")
        sym_width = 0
        widths: list[int] = []
        while True:
            dw = dw_tab.decode(r)
            if dw is None:
                break  # end of height class
            sym_width += dw
            if sym_width <= 0 or sym_width > 1 << 14:
                raise Jbig2Error(f"symbol width {sym_width}")
            if len(new_syms) + len(widths) >= n_new:
                raise Jbig2Error(
                    "height class continues past SDNUMNEWSYMS")
            area += sym_width * hc_height
            if area > max_pixels:
                raise Jbig2Error(
                    f"symbol dictionary exceeds max_pixels="
                    f"{max_pixels}")
            if sdrefagg:
                # §6.5.8.2: refinement/aggregate coding replaces the
                # collective bitmap — every symbol decodes here
                n_inst = agg_tab.decode(r)
                if n_inst is None or n_inst < 1:
                    raise Jbig2Error(
                        f"bad aggregate instance count {n_inst}")
                if n_inst != 1:
                    raise NotImplementedError(
                        "JBIG2 multi-instance symbol aggregation "
                        "(REFAGGNINST > 1, recursive text region) "
                        "not supported")
                sid = r.read(code_len)
                pool0 = input_syms + new_syms
                if sid >= len(pool0):
                    raise Jbig2Error(
                        f"aggregate refers to symbol {sid} of "
                        f"{len(pool0)}")
                rdx = rd_tab.decode(r)
                rdy = rd_tab.decode(r)
                bmsize = rsize_tab.decode(r)
                if rdx is None or rdy is None or bmsize is None \
                        or bmsize <= 0:
                    raise Jbig2Error(
                        "bad RDX/RDY/BMSIZE in Huffman aggregate")
                r.byte_align()
                start = r.byte_pos()
                if start + bmsize > len(d):
                    raise Jbig2Error(
                        "Huffman aggregate refinement truncated")
                new_syms.append(decode_refinement_region(
                    sym_width, hc_height, pool0[sid], rdx, rdy,
                    template=rtemplate, at=rat,
                    decoder=MQDecoder(d[start:start + bmsize]),
                    icx=gr_icx, mps=gr_mps))
                r.bitpos = (start + bmsize) * 8
                continue
            widths.append(sym_width)
        if sdrefagg or not widths:
            continue
        tot = sum(widths)
        bmsize = bm_tab.decode(r)
        if bmsize is None or bmsize < 0:
            raise Jbig2Error("bad collective-bitmap BMSIZE")
        r.byte_align()
        start = r.byte_pos()
        if bmsize == 0:
            # §6.5.9: uncompressed, each row padded to a byte
            rowbytes = (tot + 7) // 8
            need = rowbytes * hc_height
            if start + need > len(d):
                raise Jbig2Error("raw collective bitmap truncated")
            raw = np.frombuffer(
                d[start:start + need], np.uint8
            ).reshape(hc_height, rowbytes)
            collective = np.unpackbits(raw, axis=1)[:, :tot]
            r.bitpos = (start + need) * 8
        else:
            if start + bmsize > len(d):
                raise Jbig2Error("MMR collective bitmap truncated")
            collective = decode_generic_region(
                d[start:start + bmsize], tot, hc_height, mmr=True)
            r.bitpos = (start + bmsize) * 8
        x = 0
        for wd in widths:
            new_syms.append(
                np.ascontiguousarray(collective[:, x:x + wd]))
            x += wd
    pool = list(input_syms) + new_syms
    return _export_runs(lambda: ex_tab.decode(r), pool, n_ex)


def _decode_symbol_dict(d: bytes, input_syms: list,
                        max_pixels: int = 1 << 26,
                        tables: list | None = None) -> list:
    """Symbol dictionary segment (T.88 §6.5/§7.4.3) -> the exported
    symbol list. Arithmetic profile: height classes decode as
    IADH/IADW delta chains; each new symbol is a generic region
    sharing ONE arithmetic decoder and ONE GB context set across the
    whole segment. SDHUFF=1 routes to the Huffman profile (r14);
    Huffman+refinement-aggregate dictionaries raise by name."""
    if len(d) < 2:
        raise Jbig2Error("symbol dictionary flags truncated")
    flags = struct.unpack_from(">H", d, 0)[0]
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    ctx_used = (flags >> 8) & 1
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    if sdhuff:
        return _decode_symbol_dict_huffman(
            d, flags, input_syms, tables or [], max_pixels)
    if ctx_used:
        raise NotImplementedError(
            "JBIG2 imported bitmap coding contexts (segment flag bit "
            "8) not supported")
    pos = 2
    n_at = 4 if template == 0 else 1
    at = []
    for _ in range(n_at):
        if pos + 2 > len(d):
            raise Jbig2Error("symbol dictionary AT pixels truncated")
        at.append((int.from_bytes(d[pos:pos + 1], "big", signed=True),
                   int.from_bytes(d[pos + 1:pos + 2], "big",
                                  signed=True)))
        pos += 2
    rat = None
    if sdrefagg and rtemplate == 0:
        rat = []
        for _ in range(2):
            if pos + 2 > len(d):
                raise Jbig2Error(
                    "symbol dictionary refinement AT truncated")
            rat.append((int.from_bytes(d[pos:pos + 1], "big",
                                       signed=True),
                        int.from_bytes(d[pos + 1:pos + 2], "big",
                                       signed=True)))
            pos += 2
    if pos + 8 > len(d):
        raise Jbig2Error("symbol dictionary counts truncated")
    n_ex, n_new = struct.unpack_from(">II", d, pos)
    pos += 8
    if n_new > 1 << 20 or n_ex > 1 << 20:
        raise Jbig2Error(
            f"symbol dictionary declares {n_new} new / {n_ex} "
            "exported symbols")
    dec = MQDecoder(d[pos:])
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    iaai, iardx, iardy = _IntCtx(), _IntCtx(), _IntCtx()
    code_len = _sym_code_len(len(input_syms) + n_new)
    iaid = _IntCtx(1 << (code_len + 1))
    offs = _template_offsets(template, at)
    nstates = 1 << (max(b for _, _, b in offs) + 1)
    gb_icx = [0] * nstates
    gb_mps = [0] * nstates
    gr_icx = [0] * 8192
    gr_mps = [0] * 8192
    new_syms: list = []
    hc_height = 0
    area = 0
    classes = 0
    while len(new_syms) < n_new:
        classes += 1
        if classes > n_new + 64:  # empty-height-class spin guard
            raise Jbig2Error(
                "symbol dictionary height classes never reach "
                "SDNUMNEWSYMS")
        dh = _decode_int(dec, iadh)
        if dh is None:
            raise Jbig2Error("OOB height-class delta in symbol "
                             "dictionary")
        hc_height += dh
        if hc_height <= 0 or hc_height > 1 << 14:
            raise Jbig2Error(f"symbol height class {hc_height}")
        sym_width = 0
        while True:
            dw = _decode_int(dec, iadw)
            if dw is None:
                break  # end of height class
            sym_width += dw
            if sym_width <= 0 or sym_width > 1 << 14:
                raise Jbig2Error(f"symbol width {sym_width}")
            if len(new_syms) >= n_new:
                raise Jbig2Error(
                    "height class continues past SDNUMNEWSYMS")
            area += sym_width * hc_height
            if area > max_pixels:  # hostile-header decode-cost guard
                raise Jbig2Error(
                    f"symbol dictionary exceeds max_pixels="
                    f"{max_pixels}")
            if sdrefagg:
                # §6.5.8.2 refinement/aggregate coding (r13): the
                # single-instance form refines an already-decoded
                # symbol; multi-instance aggregates recurse into a
                # text region and stay a named boundary
                n_inst = _decode_int(dec, iaai)
                if n_inst is None or n_inst < 1:
                    raise Jbig2Error(
                        f"bad aggregate instance count {n_inst}")
                if n_inst != 1:
                    raise NotImplementedError(
                        "JBIG2 multi-instance symbol aggregation "
                        "(REFAGGNINST > 1, recursive text region) "
                        "not supported")
                sid = _decode_iaid(dec, iaid, code_len)
                pool0 = input_syms + new_syms
                if sid >= len(pool0):
                    raise Jbig2Error(
                        f"aggregate refers to symbol {sid} of "
                        f"{len(pool0)}")
                rdx = _decode_int(dec, iardx)
                rdy = _decode_int(dec, iardy)
                if rdx is None or rdy is None:
                    raise Jbig2Error("OOB RDX/RDY in aggregate")
                new_syms.append(decode_refinement_region(
                    sym_width, hc_height, pool0[sid], rdx, rdy,
                    template=rtemplate, at=rat, decoder=dec,
                    icx=gr_icx, mps=gr_mps))
            else:
                new_syms.append(decode_generic_region(
                    b"", sym_width, hc_height, template=template,
                    at=at, decoder=dec, icx=gb_icx, mps=gb_mps))
    pool = list(input_syms) + new_syms
    return _export_runs(lambda: _decode_int(dec, iaex), pool, n_ex)


def _decode_text_instances(info, syms, n_instances, strips, ds_offset,
                           ref_corner, transposed, comb_op, def_pixel,
                           read_dt, read_fs, read_ds, read_curt,
                           read_id, refine) -> np.ndarray:
    """§6.4.5 strip decoding, shared by the arithmetic and Huffman
    profiles — the callbacks hide the coder; geometry (all four
    reference corners × orientation × SBCOMBOP) is identical."""
    w, h = info["w"], info["h"]
    bmp = np.full((h, w), def_pixel, np.uint8)

    def draw(sym: np.ndarray, x: int, y: int) -> None:
        sh, sw = sym.shape
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + sw, w), min(y + sh, h)
        if x0 >= x1 or y0 >= y1:
            return
        dst = bmp[y0:y1, x0:x1]
        src = sym[y0 - y:y1 - y, x0 - x:x1 - x]
        if comb_op == 0:
            dst |= src
        elif comb_op == 1:
            dst &= src
        elif comb_op == 2:
            dst ^= src
        else:
            dst[:] = 1 - (dst ^ src)

    dt0 = read_dt()
    if dt0 is None:
        raise Jbig2Error("OOB initial DT in text region")
    strip_t = -dt0 * strips
    first_s = 0
    n_done = 0
    while n_done < n_instances:
        dt = read_dt()
        if dt is None:
            raise Jbig2Error("OOB strip DT in text region")
        strip_t += dt * strips
        first = True
        cur_s = 0
        while True:
            if first:
                dfs = read_fs()
                if dfs is None:
                    raise Jbig2Error("OOB first-S in text region")
                first_s += dfs
                cur_s = first_s
                first = False
            else:
                ids = read_ds()
                if ids is None:
                    break  # end of strip
                cur_s += ids + ds_offset
            if n_done >= n_instances:
                raise Jbig2Error(
                    "text region strip continues past "
                    "SBNUMINSTANCES")
            cur_t = read_curt() if strips > 1 else 0
            if cur_t is None:
                raise Jbig2Error("OOB CURT in text region")
            t = strip_t + cur_t
            sid = read_id()
            if sid >= len(syms):
                raise Jbig2Error(
                    f"symbol id {sid} outside the {len(syms)}-symbol "
                    "dictionary scope")
            sym = refine(syms[sid])
            sh, sw = sym.shape
            if not transposed:
                if ref_corner in (2, 3):  # BOTTOMRIGHT / TOPRIGHT
                    cur_s += sw - 1
                    x = cur_s - sw + 1
                else:
                    x = cur_s
                y = t if ref_corner in (1, 3) else t - sh + 1
                draw(sym, x, y)
                if ref_corner in (0, 1):  # LEFT corners advance after
                    cur_s += sw - 1
            else:
                if ref_corner in (0, 2):  # BOTTOM corners
                    cur_s += sh - 1
                    y = cur_s - sh + 1
                else:
                    y = cur_s
                x = t if ref_corner in (0, 1) else t - sw + 1
                draw(sym, x, y)
                if ref_corner in (1, 3):  # TOP corners advance after
                    cur_s += sh - 1
            n_done += 1
    return bmp


def _decode_text_region(d: bytes, syms: list,
                        max_pixels: int = 1 << 26,
                        tables: list | None = None) -> tuple[dict,
                                                             np.ndarray]:
    """Text region segment (T.88 §6.4/§7.4.4) -> (region info,
    bitmap). Arithmetic profile: IADT/IAFS/IADS/IAIT with IAID
    symbol ids. SBHUFF=1 (r14): standard/custom Huffman tables for
    the deltas and the §7.4.4.4.1 runcoded symbol-ID prefix table.
    All four reference corners and the transposed orientation
    compose with the region's SBCOMBOP. Huffman+refinement raises by
    name."""
    info = _parse_region_info(d)
    if len(d) < 19:
        raise Jbig2Error("text region flags truncated")
    flags = struct.unpack_from(">H", d, 17)[0]
    sbhuff = flags & 1
    sbrefine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    ref_corner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    comb_op = (flags >> 7) & 3
    def_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32  # signed 5-bit
    rtemplate = (flags >> 15) & 1
    if sbhuff:
        return _decode_text_region_huffman(
            d, syms, info, flags, tables or [], max_pixels)
    pos = 19
    rat = None
    if sbrefine and rtemplate == 0:
        rat = []
        for _ in range(2):
            if pos + 2 > len(d):
                raise Jbig2Error("text region refinement AT truncated")
            rat.append((int.from_bytes(d[pos:pos + 1], "big",
                                       signed=True),
                        int.from_bytes(d[pos + 1:pos + 2], "big",
                                       signed=True)))
            pos += 2
    if pos + 4 > len(d):
        raise Jbig2Error("text region instance count truncated")
    (n_instances,) = struct.unpack_from(">I", d, pos)
    pos += 4
    if n_instances > 1 << 22:
        raise Jbig2Error(f"text region declares {n_instances} "
                         "instances")
    if not syms:
        raise Jbig2Error("text region with no symbols in scope")
    if info["w"] * info["h"] > max_pixels:
        raise Jbig2Error(
            f"text region {info['w']}x{info['h']} exceeds "
            f"max_pixels={max_pixels}")
    strips = 1 << log_strips
    code_len = _sym_code_len(len(syms))
    dec = MQDecoder(d[pos:])
    iadt, iafs, iads, iait = (_IntCtx(), _IntCtx(), _IntCtx(),
                              _IntCtx())
    iari, iardw, iardh = _IntCtx(), _IntCtx(), _IntCtx()
    iardx, iardy = _IntCtx(), _IntCtx()
    iaid = _IntCtx(1 << (code_len + 1))
    gr_icx = [0] * 8192
    gr_mps = [0] * 8192

    def refine(sym: np.ndarray) -> np.ndarray:
        if not sbrefine:
            return sym
        ri = _decode_int(dec, iari)
        if ri is None:
            raise Jbig2Error("OOB RI in refined text region")
        if not ri:
            return sym
        rdw = _decode_int(dec, iardw)
        rdh = _decode_int(dec, iardh)
        rdx = _decode_int(dec, iardx)
        rdy = _decode_int(dec, iardy)
        if None in (rdw, rdh, rdx, rdy):
            raise Jbig2Error("OOB refinement deltas in text region")
        wi = sym.shape[1] + rdw
        hi = sym.shape[0] + rdh
        if wi <= 0 or hi <= 0 or wi * hi > max_pixels:
            raise Jbig2Error(
                f"refined instance {wi}x{hi} out of range")
        # §6.4.11: reference offset floors the size delta
        return decode_refinement_region(
            wi, hi, sym, (rdw >> 1) + rdx, (rdh >> 1) + rdy,
            template=rtemplate, at=rat, decoder=dec,
            icx=gr_icx, mps=gr_mps)

    bmp = _decode_text_instances(
        info, syms, n_instances, strips, ds_offset, ref_corner,
        transposed, comb_op, def_pixel,
        read_dt=lambda: _decode_int(dec, iadt),
        read_fs=lambda: _decode_int(dec, iafs),
        read_ds=lambda: _decode_int(dec, iads),
        read_curt=lambda: _decode_int(dec, iait),
        read_id=lambda: _decode_iaid(dec, iaid, code_len),
        refine=refine)
    return info, bmp


def _decode_text_region_huffman(d: bytes, syms: list, info: dict,
                                flags: int, tables: list,
                                max_pixels: int) -> tuple[dict,
                                                          np.ndarray]:
    """SBHUFF=1 text region (T.88 §7.4.4.1.1 + §7.4.4.4.1, r14):
    delta fields read standard/custom Huffman tables; symbol IDs
    read the per-region runcoded prefix table (35 runcodes, repeat
    semantics, then byte alignment); CURT reads log2(SBSTRIPS) raw
    bits. SBREFINE=1 (r16): RI is one raw bit per instance; a set
    bit reads RDW/RDH/RDX/RDY from tables B.14/B.15 and BMSIZE from
    SBHUFFRSIZE, then decodes an arithmetic refinement stream over
    the next BMSIZE byte-aligned bytes (§6.4.11), GR contexts
    persisting across the region."""
    sbrefine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    ref_corner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    comb_op = (flags >> 7) & 3
    def_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32
    rtemplate = (flags >> 15) & 1
    if len(d) < 21:
        raise Jbig2Error("text region Huffman flags truncated")
    hflags = struct.unpack_from(">H", d, 19)[0]
    fs_sel = hflags & 3
    ds_sel = (hflags >> 2) & 3
    dt_sel = (hflags >> 4) & 3
    rdw_sel = (hflags >> 6) & 3
    rdh_sel = (hflags >> 8) & 3
    rdx_sel = (hflags >> 10) & 3
    rdy_sel = (hflags >> 12) & 3
    rsize_sel = (hflags >> 14) & 1
    pos = 21
    ti = iter(tables)

    def pick(sel, std: dict, what: str) -> _HuffTable:
        if sel in std:
            return _std_table(std[sel])
        if sel == 3:
            try:
                return next(ti)
            except StopIteration:
                raise Jbig2Error(
                    f"text region selects a custom {what} table but "
                    "refers to no more table segments") from None
        raise Jbig2Error(f"reserved {what} table selector {sel}")

    fs_tab = pick(fs_sel, {0: 6, 1: 7}, "FS")
    ds_tab = pick(ds_sel, {0: 8, 1: 9, 2: 10}, "DS")
    dt_tab = pick(dt_sel, {0: 11, 1: 12, 2: 13}, "DT")
    # §7.4.4.1.1 table assignment order continues RDW, RDH, RDX,
    # RDY, RSIZE even though the fields only decode when SBREFINE=1
    rdw_tab = pick(rdw_sel, {0: 14, 1: 15}, "RDW") if sbrefine else None
    rdh_tab = pick(rdh_sel, {0: 14, 1: 15}, "RDH") if sbrefine else None
    rdx_tab = pick(rdx_sel, {0: 14, 1: 15}, "RDX") if sbrefine else None
    rdy_tab = pick(rdy_sel, {0: 14, 1: 15}, "RDY") if sbrefine else None
    rsize_tab = (pick(3 if rsize_sel else 0, {0: 1}, "RSIZE")
                 if sbrefine else None)
    rat = None
    if sbrefine and rtemplate == 0:
        if pos + 4 > len(d):
            raise Jbig2Error("text region refinement AT truncated")
        rat = [(int.from_bytes(d[pos:pos + 1], "big", signed=True),
                int.from_bytes(d[pos + 1:pos + 2], "big", signed=True)),
               (int.from_bytes(d[pos + 2:pos + 3], "big", signed=True),
                int.from_bytes(d[pos + 3:pos + 4], "big",
                               signed=True))]
        pos += 4
    if pos + 4 > len(d):
        raise Jbig2Error("text region instance count truncated")
    (n_instances,) = struct.unpack_from(">I", d, pos)
    pos += 4
    if n_instances > 1 << 22:
        raise Jbig2Error(f"text region declares {n_instances} "
                         "instances")
    if not syms:
        raise Jbig2Error("text region with no symbols in scope")
    if info["w"] * info["h"] > max_pixels:
        raise Jbig2Error(
            f"text region {info['w']}x{info['h']} exceeds "
            f"max_pixels={max_pixels}")
    r = _MsbReader(d, pos)
    # §7.4.4.4.1: runcoded symbol-ID code lengths
    runlens = [r.read(4) for _ in range(35)]
    run_tab = _HuffTable(
        [(ln, 0, i) for i, ln in enumerate(runlens) if ln])
    lens: list[int] = []
    prev = 0
    while len(lens) < len(syms):
        code = run_tab.decode(r)
        if code is None or code > 34:
            raise Jbig2Error(f"bad symbol-ID runcode {code}")
        if code < 32:
            lens.append(code)
            prev = code
        elif code == 32:
            if not lens:
                raise Jbig2Error("runcode 32 with no previous length")
            lens.extend([prev] * (r.read(2) + 3))
        elif code == 33:
            lens.extend([0] * (r.read(3) + 3))
        else:
            lens.extend([0] * (r.read(7) + 11))
    if len(lens) > len(syms):
        raise Jbig2Error("symbol-ID length runs overrun SBNUMSYMS")
    id_tab = _HuffTable(
        [(ln, 0, i) for i, ln in enumerate(lens) if ln])
    r.byte_align()
    strips = 1 << log_strips

    def read_id() -> int:
        sid = id_tab.decode(r)
        if sid is None:
            raise Jbig2Error("OOB symbol id")
        return sid

    gr_icx = [0] * 8192
    gr_mps = [0] * 8192

    def refine(sym: np.ndarray) -> np.ndarray:
        if not sbrefine:
            return sym
        if not r.read(1):  # RI: one raw bit in the Huffman profile
            return sym
        rdw = rdw_tab.decode(r)
        rdh = rdh_tab.decode(r)
        rdx = rdx_tab.decode(r)
        rdy = rdy_tab.decode(r)
        bmsize = rsize_tab.decode(r)
        if None in (rdw, rdh, rdx, rdy, bmsize) or bmsize <= 0:
            raise Jbig2Error(
                "OOB refinement fields in Huffman text region")
        wi = sym.shape[1] + rdw
        hi = sym.shape[0] + rdh
        if not (0 < wi <= 1 << 14 and 0 < hi <= 1 << 14):
            raise Jbig2Error(
                f"refined instance {wi}x{hi} out of range")
        r.byte_align()
        start = r.byte_pos()
        if start + bmsize > len(d):
            raise Jbig2Error("Huffman text refinement truncated")
        out = decode_refinement_region(
            wi, hi, sym, (rdw >> 1) + rdx, (rdh >> 1) + rdy,
            template=rtemplate, at=rat,
            decoder=MQDecoder(d[start:start + bmsize]),
            icx=gr_icx, mps=gr_mps)
        r.bitpos = (start + bmsize) * 8
        return out

    bmp = _decode_text_instances(
        info, syms, n_instances, strips, ds_offset, ref_corner,
        transposed, comb_op, def_pixel,
        read_dt=lambda: dt_tab.decode(r),
        read_fs=lambda: fs_tab.decode(r),
        read_ds=lambda: ds_tab.decode(r),
        read_curt=lambda: r.read(log_strips),
        read_id=read_id,
        refine=refine)
    return info, bmp


def _decode_pattern_dict(d: bytes,
                         max_pixels: int = 1 << 26) -> list:
    """Pattern dictionary segment (T.88 §6.7/§7.4.4): one collective
    region of (GRAYMAX+1) side-by-side HDPW x HDPH cells — arithmetic
    (fixed AT, A1 keyed to the cell width) or MMR (HDMMR=1, one T.6
    stream through the in-repo CCITT codec) — split into the pattern
    list."""
    if len(d) < 7:
        raise Jbig2Error("pattern dictionary header truncated")
    flags = d[0]
    hdmmr = flags & 1
    template = (flags >> 1) & 3
    hdpw, hdph = d[1], d[2]
    (graymax,) = struct.unpack_from(">I", d, 3)
    if not hdpw or not hdph:
        raise Jbig2Error(f"pattern cell {hdpw}x{hdph}")
    if graymax > 1 << 16:
        raise Jbig2Error(f"pattern dictionary GRAYMAX {graymax}")
    total_w = (graymax + 1) * hdpw
    if total_w * hdph > max_pixels:
        raise Jbig2Error(
            f"pattern dictionary {total_w}x{hdph} exceeds "
            f"max_pixels={max_pixels}")
    if hdmmr:
        # §6.7.5: the collective bitmap is one MMR (T.6) stream —
        # the fax-pipeline form, through the in-repo CCITT codec
        collective = decode_generic_region(
            d[7:], total_w, hdph, mmr=True)
    else:
        # §6.7.5: fixed AT placement, A1 keyed to the cell width
        at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)]
        if template:
            at = at[:1]
        collective = decode_generic_region(
            d[7:], total_w, hdph, template=template, at=at)
    return [collective[:, k * hdpw:(k + 1) * hdpw].copy()
            for k in range(graymax + 1)]


def _decode_halftone_region(d: bytes, patterns: list,
                            max_pixels: int = 1 << 26) -> tuple[dict,
                                                                np.ndarray]:
    """Halftone region segment (T.88 §6.6): Annex C gray-scale image
    decoding (Gray-coded bitplanes through one shared arithmetic
    stream, MSB first) rendered by stamping each grid cell's pattern
    at the skewed fixed-point grid position. HENABLESKIP and MMR
    forms raise by name."""
    info = _parse_region_info(d)
    if len(d) < 18:
        raise Jbig2Error("halftone region segment truncated")
    flags = d[17]
    hmmr = flags & 1
    template = (flags >> 1) & 3
    enable_skip = (flags >> 3) & 1
    comb_op = (flags >> 4) & 7
    def_pixel = (flags >> 7) & 1
    if hmmr:
        raise NotImplementedError(
            "JBIG2 MMR-coded halftone region (HMMR=1) not supported "
            "— arithmetic form only")
    if enable_skip:
        raise NotImplementedError(
            "JBIG2 halftone skip decoding (HENABLESKIP=1) not "
            "supported")
    if len(d) < 18 + 16 + 4:
        raise Jbig2Error("halftone grid parameters truncated")
    hgw, hgh, hgx, hgy = struct.unpack_from(">IIii", d, 18)
    hrx, hry = struct.unpack_from(">HH", d, 34)
    if not patterns:
        raise Jbig2Error("halftone region with no pattern dictionary")
    if hgw * hgh > max_pixels:
        raise Jbig2Error(
            f"halftone grid {hgw}x{hgh} exceeds max_pixels="
            f"{max_pixels}")
    w, h = info["w"], info["h"]
    if w * h > max_pixels:
        raise Jbig2Error(
            f"halftone region {w}x{h} exceeds max_pixels="
            f"{max_pixels}")
    n_pats = len(patterns)
    bpp = max(1, (n_pats - 1).bit_length())
    # Annex C.5: bitplanes MSB-first through ONE arithmetic stream
    # sharing the GB contexts; grayscale AT placement per §C.5
    at = [(template <= 1 and 3 or 2, -1), (-3, -1), (2, -2), (-2, -2)]
    if template:
        at = at[:1]
    dec = MQDecoder(d[38:])
    offs = _template_offsets(template, at)
    nstates = 1 << (max(b for _, _, b in offs) + 1)
    gb_icx = [0] * nstates
    gb_mps = [0] * nstates
    planes = [decode_generic_region(
        b"", hgw, hgh, template=template, at=at, decoder=dec,
        icx=gb_icx, mps=gb_mps) for _ in range(bpp)]
    # Gray decode: bit J = plane_J XOR bit_{J+1}, J from MSB down
    gray = planes[0].astype(np.int32)  # planes[0] is the MSB
    vals = gray.copy()
    prev = gray
    for j in range(1, bpp):
        bit = planes[j] ^ prev
        vals = (vals << 1) | bit
        prev = bit
    if int(vals.max(initial=0)) >= n_pats:
        raise Jbig2Error(
            f"halftone gray value {int(vals.max())} outside the "
            f"{n_pats}-pattern dictionary")
    ph, pw = patterns[0].shape
    bmp = np.full((h, w), def_pixel, np.uint8)

    def stamp(pat: np.ndarray, x: int, y: int) -> None:
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + pw, w), min(y + ph, h)
        if x0 >= x1 or y0 >= y1:
            return
        dst = bmp[y0:y1, x0:x1]
        src = pat[y0 - y:y1 - y, x0 - x:x1 - x]
        if comb_op == 0:
            dst |= src
        elif comb_op == 1:
            dst &= src
        elif comb_op == 2:
            dst ^= src
        elif comb_op == 3:
            dst[:] = 1 - (dst ^ src)
        else:
            dst[:] = src

    # §6.6.5.1: skewed grid at 1/256-pixel fixed point
    for mg in range(hgh):
        for ng in range(hgw):
            x = (hgx + mg * hry + ng * hrx) >> 8
            y = (hgy + mg * hrx - ng * hry) >> 8
            stamp(patterns[int(vals[mg, ng])], x, y)
    return info, bmp


def decode_jbig2_embedded(data: bytes,
                          globals_data: bytes | None = None,
                          max_pixels: int = 1 << 26) -> np.ndarray:
    """Embedded-profile JBIG2 (the PDF ``JBIG2Decode`` arrangement:
    optional globals stream + page stream) -> (H, W) uint8 bitmap of
    the first page, 1 = black. ``max_pixels`` bounds hostile page /
    region declarations (decode cost is per-pixel)."""
    segments = []
    if globals_data:
        segments += list(iter_jbig2_segments(globals_data))
    segments += list(iter_jbig2_segments(data))

    page = None
    page_h_known = True
    page_default = 0
    max_y_seen = 0
    sym_store: dict[int, list] = {}  # segment number -> exported syms
    table_store: dict[int, _HuffTable] = {}  # -> custom code tables

    def compose(info: dict, region: np.ndarray) -> None:
        nonlocal page, max_y_seen
        if page is None:
            raise Jbig2Error(
                "region segment before any page information")
        h, w = region.shape
        y1, x1 = info["y"], info["x"]
        if not page_h_known and y1 + h > page.shape[0]:
            grow = np.full((y1 + h - page.shape[0], page.shape[1]),
                           page_default, np.uint8)
            if (y1 + h) * page.shape[1] > max_pixels:
                raise Jbig2Error(
                    f"striped page grows past max_pixels={max_pixels}")
            page = np.vstack([page, grow])
        if y1 + h > page.shape[0] or x1 + w > page.shape[1]:
            raise Jbig2Error(
                f"region {w}x{h}@{x1},{y1} exceeds the "
                f"{page.shape[1]}x{page.shape[0]} page")
        dst = page[y1:y1 + h, x1:x1 + w]
        op = _COMB_OPS[info["comb"]]
        if op == "or":
            dst |= region
        elif op == "and":
            dst &= region
        elif op == "xor":
            dst ^= region
        elif op == "xnor":
            dst[:] = 1 - (dst ^ region)
        else:
            dst[:] = region
        max_y_seen = max(max_y_seen, y1 + h)

    for seg in segments:
        t = seg["type"]
        d = seg["data"]
        if t == 48:  # page information
            if len(d) < 19:
                raise Jbig2Error("page information segment truncated")
            pw, ph = struct.unpack_from(">II", d, 0)
            flags = d[16]
            page_default = (flags >> 2) & 1
            if ph == 0xFFFFFFFF:
                page_h_known = False
                ph = 0  # grown by stripes / region extents
            if pw * max(ph, 1) > max_pixels:
                raise Jbig2Error(
                    f"page {pw}x{ph} exceeds max_pixels={max_pixels}")
            page = np.full((ph, pw), page_default, np.uint8)
        elif t in (36, 38, 39):  # generic region
            info = _parse_region_info(d)
            if len(d) < 18:
                raise Jbig2Error("generic region segment truncated")
            gflags = d[17]
            mmr = gflags & 1
            template = (gflags >> 1) & 3
            tpgdon = bool(gflags & 8)
            pos = 18
            at = []
            if not mmr:
                n_at = 4 if template == 0 else 1
                if len(d) < pos + 2 * n_at:
                    raise Jbig2Error("generic region AT pixels truncated")
                for _ in range(n_at):
                    ax = int.from_bytes(d[pos:pos + 1], "big",
                                        signed=True)
                    ay = int.from_bytes(d[pos + 1:pos + 2], "big",
                                        signed=True)
                    at.append((ax, ay))
                    pos += 2
            w, h = info["w"], info["h"]
            if w * h > max_pixels:
                raise Jbig2Error(
                    f"region {w}x{h} exceeds max_pixels={max_pixels}")
            region = decode_generic_region(
                d[pos:], w, h, template=template, at=at or None,
                tpgdon=tpgdon, mmr=bool(mmr))
            compose(info, region)
        elif t == 0:  # symbol dictionary
            inputs = [sym for r in seg["refs"]
                      for sym in sym_store.get(r, [])]
            tabs = [table_store[r] for r in seg["refs"]
                    if r in table_store]
            sym_store[seg["number"]] = _decode_symbol_dict(
                d, inputs, max_pixels=max_pixels, tables=tabs)
        elif t in (6, 7):  # immediate (lossless) text region
            syms = [sym for r in seg["refs"]
                    for sym in sym_store.get(r, [])]
            tabs = [table_store[r] for r in seg["refs"]
                    if r in table_store]
            info, region = _decode_text_region(
                d, syms, max_pixels=max_pixels, tables=tabs)
            compose(info, region)
        elif t == 53:  # custom Huffman code table
            table_store[seg["number"]] = _parse_table_segment(d)
        elif t == 4:
            raise NotImplementedError(
                "JBIG2 intermediate text region (type 4, retained "
                "auxiliary buffers) not supported — immediate text "
                "regions (6/7) are")
        elif t in (41, 42):  # immediate (lossless) refinement region
            info = _parse_region_info(d)
            if len(d) < 18:
                raise Jbig2Error("refinement region segment truncated")
            rflags = d[17]
            rtmpl = rflags & 1
            tpgron = bool(rflags & 2)
            pos = 18
            rat = None
            if rtmpl == 0:
                if len(d) < pos + 4:
                    raise Jbig2Error("refinement region AT truncated")
                rat = []
                for _ in range(2):
                    rat.append((int.from_bytes(d[pos:pos + 1], "big",
                                               signed=True),
                                int.from_bytes(d[pos + 1:pos + 2],
                                               "big", signed=True)))
                    pos += 2
            w, h = info["w"], info["h"]
            if w * h > max_pixels:
                raise Jbig2Error(
                    f"refinement region {w}x{h} exceeds max_pixels="
                    f"{max_pixels}")
            if page is None:
                raise Jbig2Error(
                    "refinement region before any page information")
            y1, x1 = info["y"], info["x"]
            if y1 + h > page.shape[0] or x1 + w > page.shape[1]:
                raise Jbig2Error(
                    f"refinement region {w}x{h}@{x1},{y1} exceeds "
                    "the page")
            # §6.3.2: the reference is the page's current content
            # under the region rectangle
            reference = page[y1:y1 + h, x1:x1 + w].copy()
            region = decode_refinement_region(
                w, h, reference, 0, 0, template=rtmpl, at=rat,
                tpgron=tpgron, data=d[pos:])
            compose(info, region)
        elif t == 40:
            raise NotImplementedError(
                "JBIG2 intermediate refinement region (type 40, "
                "retained auxiliary buffers) not supported — "
                "immediate refinement regions (41/42) are")
        elif t == 50:  # end of stripe
            if len(d) >= 4:
                max_y_seen = max(
                    max_y_seen, struct.unpack_from(">I", d, 0)[0] + 1)
        elif t in (49, 51):  # end of page / file
            continue
        elif t in (52, 62):  # profiles / extension: skippable
            continue
        elif t == 5:
            raise Jbig2Error("reserved JBIG2 segment type 5")
        elif t == 16:  # pattern dictionary
            sym_store[seg["number"]] = _decode_pattern_dict(
                d, max_pixels=max_pixels)
        elif t in (22, 23):  # immediate (lossless) halftone region
            pats = [p for r in seg["refs"]
                    for p in sym_store.get(r, [])]
            info, region = _decode_halftone_region(
                d, pats, max_pixels=max_pixels)
            compose(info, region)
        elif t == 20:
            raise NotImplementedError(
                "JBIG2 intermediate halftone region (type 20, "
                "retained auxiliary buffers) not supported — "
                "immediate halftone regions (22/23) are")
        elif 16 <= t <= 43:
            raise NotImplementedError(
                f"JBIG2 segment type {t} not supported")
        else:
            raise Jbig2Error(f"unknown JBIG2 segment type {t}")
    if page is None:
        raise Jbig2Error("JBIG2 stream has no page information segment")
    if not page_h_known and max_y_seen:
        page = page[:max_y_seen]
    return page


def encode_jbig2_generic(bmp: np.ndarray, template: int = 0,
                         tpgdon: bool = False,
                         split_stripes: int | None = None) -> bytes:
    """Bitmap -> embedded-profile JBIG2 stream (page info + one
    immediate generic region per stripe + end-of-page): the fixture
    generator for the decoder's tests and pdf.py's. ``split_stripes``
    emits the page as N horizontal bands composed with OR, exercising
    the multi-region page-composition path."""
    bmp = (np.asarray(bmp) & 1).astype(np.uint8)
    h, w = bmp.shape
    segs = []
    num = 0

    def seg(seg_type: int, payload: bytes, page: int = 1) -> None:
        nonlocal num
        hdr = struct.pack(">IB", num, seg_type) + b"\x00" \
            + bytes([page]) + struct.pack(">I", len(payload))
        segs.append(hdr + payload)
        num += 1

    seg(48, struct.pack(">IIIIBH", w, h, 0, 0, 0, 0))
    bands = split_stripes or 1
    rows_per = (h + bands - 1) // bands
    for b in range(bands):
        y0 = b * rows_per
        band = bmp[y0:y0 + rows_per]
        if band.size == 0:
            continue
        at = [a for a, _ in _TEMPLATES[template]["at"]]
        at_bytes = b"".join(
            ax.to_bytes(1, "big", signed=True)
            + ay.to_bytes(1, "big", signed=True) for ax, ay in at)
        body = struct.pack(">IIIIB", w, band.shape[0], 0, y0, 0) \
            + bytes([(template << 1) | (8 if tpgdon else 0)]) \
            + at_bytes \
            + _encode_generic_region(band, template, tpgdon)
        seg(38, body)
    seg(49, b"")
    return b"".join(segs)


def _encode_symbol_dict_payload(syms: list, refagg_refs=None,
                                input_syms: list = ()) -> bytes:
    """Symbols (sorted by height class) -> arithmetic symbol
    dictionary segment payload exporting all of them, mirroring
    _decode_symbol_dict. ``refagg_refs`` switches the dictionary to
    SDREFAGG=1 single-instance aggregate coding: entry i gives the
    pool index (input symbols first, then this dict's own new
    symbols) whose bitmap symbol i refines; ``input_syms`` are the
    referred dictionaries' exported bitmaps (needed both for the
    IAID code length and as refinement references)."""
    template = 0
    at = [a for a, _ in _TEMPLATES[template]["at"]]
    refagg = refagg_refs is not None
    flags = (template << 10) | (2 if refagg else 0)
    out = bytearray(struct.pack(">H", flags))
    for ax, ay in at:
        out += ax.to_bytes(1, "big", signed=True)
        out += ay.to_bytes(1, "big", signed=True)
    if refagg:  # SDRTEMPLATE=0: two refinement AT pairs (nominal)
        out += b"\xff\xff\xff\xff"
    out += struct.pack(">II", len(syms), len(syms))
    enc = MQEncoder()
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    iaai, iardx, iardy = _IntCtx(), _IntCtx(), _IntCtx()
    n_input = len(input_syms)
    code_len = _sym_code_len(n_input + len(syms))
    iaid = _IntCtx(1 << (code_len + 1))
    gr_icx = [0] * 8192
    gr_mps = [0] * 8192
    pool = list(input_syms) + list(syms)
    offs = _template_offsets(template, at)
    nstates = 1 << (max(b for _, _, b in offs) + 1)
    gb_icx = [0] * nstates
    gb_mps = [0] * nstates
    pad_top = max(-dy for _, dy, _ in offs)
    pad_l = max(max(-dx for dx, _, _ in offs), 0)
    pad_r = max(max(dx for dx, _, _ in offs), 0)
    offp = [(dx + pad_l, dy, bit) for dx, dy, bit in offs]

    def encode_bitmap(bmp: np.ndarray) -> None:
        hh, ww = bmp.shape
        padded = np.zeros((hh + pad_top, ww + pad_l + pad_r), np.uint8)
        for y in range(hh):
            yy = y + pad_top
            for x in range(ww):
                ctx = 0
                for dx, dy, bit in offp:
                    if padded[yy + dy, x + dx]:
                        ctx |= 1 << bit
                b = int(bmp[y, x] & 1)
                enc.encode(gb_icx, gb_mps, ctx, b)
                padded[yy, x + pad_l] = b

    hc_height = 0
    i = 0
    while i < len(syms):
        h = syms[i].shape[0]
        _encode_int(enc, iadh, h - hc_height)
        hc_height = h
        sym_width = 0
        while i < len(syms) and syms[i].shape[0] == h:
            w = syms[i].shape[1]
            _encode_int(enc, iadw, w - sym_width)
            sym_width = w
            if refagg:
                ref_idx = refagg_refs[i]
                _encode_int(enc, iaai, 1)
                _encode_iaid(enc, iaid, code_len, ref_idx)
                _encode_int(enc, iardx, 0)
                _encode_int(enc, iardy, 0)
                # pool = input symbols then new: callers refine only
                # already-available bitmaps
                ref_bmp = pool[ref_idx]
                _encode_refinement_region(
                    syms[i], ref_bmp, 0, 0, template=0,
                    encoder=enc, icx=gr_icx, mps=gr_mps)
            else:
                encode_bitmap(syms[i])
            i += 1
        _encode_int(enc, iadw, None)  # OOB: end of height class
    _encode_int(enc, iaex, n_input)    # skip the imported symbols
    _encode_int(enc, iaex, len(syms))  # export this dict's own
    return bytes(out) + enc.flush()


def encode_jbig2_refined(base: np.ndarray,
                         refined: np.ndarray,
                         template: int = 0,
                         tpgron: bool = False) -> bytes:
    """Embedded-profile page: a generic region carrying ``base``,
    then an immediate refinement region (type 41) REPLACE-composing
    ``refined`` against the page content — the progressive/touch-up
    layout (T.88 §6.3). Fixture mirror for the segment 41/42 path."""
    base = (np.asarray(base) & 1).astype(np.uint8)
    refined = (np.asarray(refined) & 1).astype(np.uint8)
    if base.shape != refined.shape:
        raise ValueError("refinement fixture wants matching shapes")
    h, w = base.shape
    generic = encode_jbig2_generic(base)
    # strip the end-of-page segment (last 11 bytes: empty payload)
    body = generic[:-11]
    rflags = bytes([(template & 1) | (2 if tpgron else 0)])
    rat = b"\xff\xff\xff\xff" if template == 0 else b""
    payload = struct.pack(">IIIIB", w, h, 0, 0, 4) \
        + rflags + rat \
        + _encode_refinement_region(refined, base, 0, 0,
                                    template=template, tpgron=tpgron)
    num = generic[:4]  # reuse numbering space: next free = 2
    seg41 = struct.pack(">IB", 2, 41) + b"\x00\x01" \
        + struct.pack(">I", len(payload)) + payload
    seg49 = struct.pack(">IB", 3, 49) + b"\x00\x01" \
        + struct.pack(">I", 0)
    del num
    return body + seg41 + seg49


def encode_jbig2_halftone(gray: np.ndarray,
                          patterns: list,
                          mmr_patterns: bool = False) -> bytes:
    """Embedded-profile page: pattern dictionary (type 16) + one
    immediate halftone region (type 22) stamping ``patterns[v]`` per
    grid cell of the (HGH, HGW) ``gray`` value array — unskewed grid
    at the patterns' pitch. Fixture mirror for _decode_pattern_dict /
    _decode_halftone_region (square patterns: the grid pitch HRX
    drives both axes)."""
    patterns = [(np.asarray(p) & 1).astype(np.uint8) for p in patterns]
    gray = np.asarray(gray, np.int64)
    ph, pw = patterns[0].shape
    if ph != pw:
        raise ValueError("halftone fixture wants square patterns")
    if any(p.shape != (ph, pw) for p in patterns):
        raise ValueError("patterns must share one cell size")
    if int(gray.max(initial=0)) >= len(patterns):
        raise ValueError("gray value outside the pattern dictionary")
    hgh, hgw = gray.shape
    w, h = hgw * pw, hgh * ph
    # pattern dictionary: collective bitmap, A1 = (-HDPW, 0); the
    # MMR form routes through the in-repo T.6 encoder (HDMMR=1)
    collective = np.concatenate(patterns, axis=1)
    if mmr_patterns:
        from dolphinbeat_spark.operators.ccitt import ccitt_encode
        pd_body = ccitt_encode(collective, mode="g4")
        pd_flags = 1
    else:
        pd_at = [(-pw, 0), (-3, -1), (2, -2), (-2, -2)]
        pd_body = _encode_generic_region(collective, template=0,
                                         at=pd_at)
        pd_flags = 0
    pd_payload = bytes([pd_flags]) + bytes([pw, ph]) \
        + struct.pack(">I", len(patterns) - 1) + pd_body
    # halftone region: Gray-coded bitplanes MSB-first, one stream
    bpp = max(1, (len(patterns) - 1).bit_length())
    gs_at = [(3, -1), (-3, -1), (2, -2), (-2, -2)]
    offs = _template_offsets(0, gs_at)
    nstates = 1 << (max(b for _, _, b in offs) + 1)
    gb_icx = [0] * nstates
    gb_mps = [0] * nstates
    enc = MQEncoder()
    pad_top = max(-dy for _, dy, _ in offs)
    pad_l = max(max(-dx for dx, _, _ in offs), 0)
    pad_r = max(max(dx for dx, _, _ in offs), 0)
    offp = [(dx + pad_l, dy, bit) for dx, dy, bit in offs]

    def encode_plane(plane: np.ndarray) -> None:
        padded = np.zeros((hgh + pad_top, hgw + pad_l + pad_r),
                          np.uint8)
        for y in range(hgh):
            yy = y + pad_top
            for x in range(hgw):
                ctx = 0
                for dx, dy, bit in offp:
                    if padded[yy + dy, x + dx]:
                        ctx |= 1 << bit
                b = int(plane[y, x])
                enc.encode(gb_icx, gb_mps, ctx, b)
                padded[yy, x + pad_l] = b

    prev = np.zeros_like(gray)
    for j in range(bpp - 1, -1, -1):  # MSB first
        bit = (gray >> j) & 1
        encode_plane((bit ^ prev).astype(np.uint8))
        prev = bit
    ht_payload = struct.pack(">IIIIB", w, h, 0, 0, 0) \
        + bytes([0]) \
        + struct.pack(">IIii", hgw, hgh, 0, 0) \
        + struct.pack(">HH", pw << 8, 0) \
        + enc.flush()

    segs = []

    def seg(num, seg_type, payload, refs=()):
        ref_blob = bytes([len(refs) << 5]) + bytes(refs)
        return (struct.pack(">IB", num, seg_type) + ref_blob
                + b"\x01" + struct.pack(">I", len(payload)) + payload)

    segs.append(seg(0, 48, struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)))
    segs.append(seg(1, 16, pd_payload))
    segs.append(seg(2, 22, ht_payload, refs=(1,)))
    segs.append(seg(3, 49, b""))
    return b"".join(segs)


def encode_jbig2_text(symbols: list, instances: list,
                      page_size: tuple[int, int] | None = None,
                      ref_corner: int = 1,
                      transposed: bool = False) -> bytes:
    """Embedded-profile JBIG2 page built from a symbol dictionary +
    one immediate text region (the scanned-TEXT layout jbig2enc
    emits): ``symbols`` is a list of (h, w) ink bitmaps, ``instances``
    a list of (symbol_index, x, y) placements (top-left coordinates)
    — or (symbol_index, x, y, refined_bitmap) entries, which switch
    the region to SBREFINE=1 and code that instance as a refinement
    of its symbol (the per-instance touch-up form).
    ``ref_corner`` (0 BL / 1 TL / 2 BR / 3 TR) and ``transposed``
    pick the wire form — the GEOMETRY stays (x, y) regardless, so a
    decoded page must match the same raster for every corner. The
    fixture mirror for _decode_text_region / _decode_symbol_dict."""
    symbols = [(np.asarray(b) & 1).astype(np.uint8) for b in symbols]
    instances = [
        (inst[0], inst[1], inst[2],
         (np.asarray(inst[3]) & 1).astype(np.uint8)
         if len(inst) > 3 and inst[3] is not None else None)
        for inst in instances]
    sbrefine = any(r is not None for _, _, _, r in instances)
    order = sorted(range(len(symbols)),
                   key=lambda i: (symbols[i].shape[0],
                                  symbols[i].shape[1], i))
    dict_syms = [symbols[i] for i in order]
    remap = {orig: new for new, orig in enumerate(order)}
    def eff(inst):
        sid, _, _, r = inst
        return r if r is not None else symbols[sid]

    if page_size is None:
        pw = max(x + eff(i_).shape[1] for i_ in instances
                 for _, x, _, _ in [i_])
        ph = max(y + eff(i_).shape[0] for i_ in instances
                 for _, _, y, _ in [i_])
    else:
        pw, ph = page_size
    code_len = _sym_code_len(len(dict_syms))

    enc = MQEncoder()
    iadt, iafs, iads, iait = (_IntCtx(), _IntCtx(), _IntCtx(),
                              _IntCtx())
    del iait  # SBSTRIPS == 1: CURT never coded
    iari, iardw, iardh = _IntCtx(), _IntCtx(), _IntCtx()
    iardx, iardy = _IntCtx(), _IntCtx()
    gr_icx = [0] * 8192
    gr_mps = [0] * 8192
    iaid = _IntCtx(1 << (code_len + 1))

    # wire S/T per the reference-corner definition: the corner pixel
    # of the placed (possibly refined) bitmap, S along the strip axis
    def s_t(inst) -> tuple[int, int]:
        _, x, y, _ = inst
        hh, ww = eff(inst).shape
        if not transposed:
            sx = x + ww - 1 if ref_corner in (2, 3) else x
            ty = y if ref_corner in (1, 3) else y + hh - 1
            return sx, ty
        sy = y + hh - 1 if ref_corner in (0, 2) else y
        tx = x if ref_corner in (0, 1) else x + ww - 1
        return sy, tx

    wire = sorted(
        ((s_t(inst), inst) for inst in instances),
        key=lambda e: (e[0][1], e[0][0]))
    _encode_int(enc, iadt, 0)  # STRIPT starts at 0
    strip_t = 0
    first_s = 0
    i = 0
    n = len(wire)
    while i < n:
        t = wire[i][0][1]
        _encode_int(enc, iadt, t - strip_t)
        strip_t = t
        first = True
        cur_s = 0
        while i < n and wire[i][0][1] == t:
            (s_val, _), inst = wire[i]
            sid = inst[0]
            hh, ww = eff(inst).shape
            adv = (ww if not transposed else hh) - 1
            # the decoder pre-advances CURS by adv for right/bottom
            # corners BEFORE drawing, so the coded value targets
            # c0 = S - pre, and its post-symbol CURS is c0 + adv
            pre = adv if (not transposed and ref_corner in (2, 3)) \
                or (transposed and ref_corner in (0, 2)) else 0
            c0 = s_val - pre
            if first:
                _encode_int(enc, iafs, c0 - first_s)
                first_s = c0
                first = False
            else:
                _encode_int(enc, iads, c0 - cur_s)
            _encode_iaid(enc, iaid, code_len, remap[sid])
            if sbrefine:
                refined = inst[3]
                if refined is None:
                    _encode_int(enc, iari, 0)
                else:
                    _encode_int(enc, iari, 1)
                    sym = symbols[sid]
                    rdw = refined.shape[1] - sym.shape[1]
                    rdh = refined.shape[0] - sym.shape[0]
                    # pick RDX/RDY so the decoder's reference offset
                    # (rd>>1) + rdx lands at the refined origin
                    _encode_int(enc, iardw, rdw)
                    _encode_int(enc, iardh, rdh)
                    _encode_int(enc, iardx, -(rdw >> 1))
                    _encode_int(enc, iardy, -(rdh >> 1))
                    _encode_refinement_region(
                        refined, sym, 0, 0, template=0,
                        encoder=enc, icx=gr_icx, mps=gr_mps)
            cur_s = c0 + adv
            i += 1
        _encode_int(enc, iads, None)  # OOB: end of strip
    data = enc.flush()

    flags = (ref_corner << 4) | ((1 if transposed else 0) << 6) \
        | (2 if sbrefine else 0)
    rat = b"\xff\xff\xff\xff" if sbrefine else b""
    body = struct.pack(">IIIIB", pw, ph, 0, 0, 0) \
        + struct.pack(">H", flags) + rat \
        + struct.pack(">I", n) + data

    segs = []
    num = 0

    def seg(seg_type: int, payload: bytes, refs=()) -> None:
        nonlocal num
        ref_blob = bytes([len(refs) << 5])             + b"".join(r.to_bytes(1, "big") for r in refs)
        hdr = struct.pack(">IB", num, seg_type) + ref_blob             + b"\x01" + struct.pack(">I", len(payload))
        segs.append(hdr + payload)
        num += 1

    seg(48, struct.pack(">IIIIBH", pw, ph, 0, 0, 0, 0))
    seg(0, _encode_symbol_dict_payload(dict_syms))
    seg(6, body, refs=(1,))
    seg(49, b"")
    return b"".join(segs)


def encode_jbig2_text_huffman(symbols: list, instances: list,
                              page_size: tuple[int, int] | None = None,
                              ref_corner: int = 1,
                              transposed: bool = False,
                              mmr_collective: bool = False,
                              custom_dt: bool = False,
                              refagg: bool = False) -> bytes:
    """Embedded-profile JBIG2 page in the HUFFMAN profile (r14): the
    SDHUFF=1 symbol dictionary ships each height class as a
    collective bitmap (raw BMSIZE=0 rows, or one T.6/MMR stream with
    ``mmr_collective=True``) keyed by B.4/B.2 delta chains, and the
    SBHUFF=1 text region codes deltas with B.6/B.8/B.11 plus the
    §7.4.4.4.1 runcoded symbol-ID prefix table. ``custom_dt=True``
    ships DT as a CUSTOM code-table segment (type 53) replicating
    B.11, exercising the referred-table path. ``refagg=True`` (r16)
    ships TWO dictionaries: a collective base dictionary holding
    corner-flipped variants, then an SDHUFF+SDREFAGG dictionary
    whose symbols each decode as a §6.5.8.2 single-instance
    arithmetic refinement of the imported variant — the Huffman
    refinement/aggregation form. Instances given as 4-tuples
    (sid, x, y, refined_bitmap|None) turn on SBREFINE in the text
    region (RI raw bits + B.15-coded deltas + per-instance
    arithmetic refinement windows). The ancient-Xerox-class
    layout; fixture mirror for _decode_symbol_dict_huffman /
    _decode_text_region_huffman."""
    sbrefine = any(len(inst) > 3 and inst[3] is not None
                   for inst in instances)
    refined_of = [inst[3] if len(inst) > 3 else None
                  for inst in instances]
    instances = [tuple(inst[:3]) for inst in instances]
    symbols = [(np.asarray(b) & 1).astype(np.uint8) for b in symbols]
    order = sorted(range(len(symbols)),
                   key=lambda i: (symbols[i].shape[0],
                                  symbols[i].shape[1], i))
    dict_syms = [symbols[i] for i in order]
    remap = {orig: new for new, orig in enumerate(order)}
    if page_size is None:
        pw = max(x + symbols[s].shape[1] for s, x, _ in instances)
        ph = max(y + symbols[s].shape[0] for s, _, y in instances)
    else:
        pw, ph = page_size

    # --- symbol dictionary payload (SDHUFF=1) ---
    dh_tab, dw_tab, bm_tab, ex_tab = (_std_table(4), _std_table(2),
                                      _std_table(1), _std_table(1))

    def collective_payload(syms_list: list) -> bytes:
        out = bytearray(struct.pack(">H", 1))  # SDHUFF, std, T0
        out += struct.pack(">II", len(syms_list), len(syms_list))
        w = _MsbWriter()
        hc_height = 0
        i = 0
        while i < len(syms_list):
            h = syms_list[i].shape[0]
            dh_tab.encode(w, h - hc_height)
            hc_height = h
            sym_width = 0
            cls = []
            while i < len(syms_list) and syms_list[i].shape[0] == h:
                wd = syms_list[i].shape[1]
                dw_tab.encode(w, wd - sym_width)
                sym_width = wd
                cls.append(syms_list[i])
                i += 1
            dw_tab.encode_oob(w)  # end of height class
            collective = np.concatenate(cls, axis=1)
            if mmr_collective:
                from dolphinbeat_spark.operators.ccitt import ccitt_encode

                blob = ccitt_encode(collective, mode="g4")
                bm_tab.encode(w, len(blob))
                w.byte_align()
                for byte in blob:
                    w.write(byte, 8)
            else:
                bm_tab.encode(w, 0)  # BMSIZE=0: raw, aligned rows
                w.byte_align()
                packed = np.packbits(collective, axis=1)
                for byte in packed.reshape(-1):
                    w.write(int(byte), 8)
        ex_tab.encode(w, 0)               # no-export run (no inputs)
        ex_tab.encode(w, len(syms_list))  # export this dict's own
        return bytes(out) + w.getvalue()

    def refagg_payload(bases: list, syms_list: list) -> bytes:
        """SDHUFF=1 & SDREFAGG=1 (§6.5.8.2): symbol i is a
        single-instance arithmetic refinement of imported base i."""
        # flags: SDHUFF | SDREFAGG, std tables, SDRTEMPLATE=0
        out = bytearray(struct.pack(">H", 3))
        out += b"\xff\xff\xff\xff"  # SDRAT nominal (-1,-1) x2
        out += struct.pack(">II", len(syms_list), len(syms_list))
        w = _MsbWriter()
        agg_tab, rd_tab = _std_table(1), _std_table(15)
        code_len = _sym_code_len(len(bases) + len(syms_list))
        gr_icx = [0] * 8192
        gr_mps = [0] * 8192
        hc_height = 0
        i = 0
        while i < len(syms_list):
            h = syms_list[i].shape[0]
            dh_tab.encode(w, h - hc_height)
            hc_height = h
            sym_width = 0
            while i < len(syms_list) and syms_list[i].shape[0] == h:
                wd = syms_list[i].shape[1]
                dw_tab.encode(w, wd - sym_width)
                sym_width = wd
                # AGGINST=1 (B.1), ID raw bits, RDX/RDY (B.15),
                # BMSIZE (B.1), byte-aligned refinement window
                agg_tab.encode(w, 1)
                w.write(i, code_len)
                rd_tab.encode(w, 0)
                rd_tab.encode(w, 0)
                blob = _encode_refinement_region(
                    syms_list[i], bases[i], 0, 0, template=0,
                    icx=gr_icx, mps=gr_mps)
                bm_tab.encode(w, len(blob))
                w.byte_align()
                for byte in blob:
                    w.write(byte, 8)
                i += 1
            dw_tab.encode_oob(w)  # end of height class
        ex_tab.encode(w, len(bases))      # skip the imported bases
        ex_tab.encode(w, len(syms_list))  # export the refined set
        return bytes(out) + w.getvalue()

    if refagg:
        base_syms = []
        for s in dict_syms:
            b = s.copy()
            b[0, 0] ^= 1  # corner flip: refinement must repair it
            base_syms.append(b)
        dict_payload = collective_payload(base_syms)
        refagg_dict_payload = refagg_payload(base_syms, dict_syms)
    else:
        dict_payload = collective_payload(dict_syms)
        refagg_dict_payload = None

    # --- text region payload (SBHUFF=1) ---
    n_syms = len(dict_syms)
    id_len = max(1, (n_syms - 1).bit_length())
    fs_tab, ds_tab = _std_table(6), _std_table(8)
    dt_tab = _std_table(11)
    rd_tab, rsize_tab = _std_table(15), _std_table(1)
    gr_icx_r = [0] * 8192
    gr_mps_r = [0] * 8192
    w = _MsbWriter()
    for rc in range(35):  # runcode lengths: only `id_len` is used
        w.write(1 if rc == id_len else 0, 4)
    for _ in range(n_syms):  # every symbol id is `id_len` bits
        w.write(0, 1)  # the single runcode's 1-bit prefix
    w.byte_align()

    def eff(idx: int) -> np.ndarray:
        ref = refined_of[idx]
        return ref if ref is not None else symbols[instances[idx][0]]

    def s_t(idx: int) -> tuple[int, int]:
        _sid, x, y = instances[idx]
        hh, ww = eff(idx).shape
        if not transposed:
            sx = x + ww - 1 if ref_corner in (2, 3) else x
            ty = y if ref_corner in (1, 3) else y + hh - 1
            return sx, ty
        sy = y + hh - 1 if ref_corner in (0, 2) else y
        tx = x if ref_corner in (0, 1) else x + ww - 1
        return sy, tx

    wire = sorted(((s_t(idx), instances[idx], idx)
                   for idx in range(len(instances))),
                  key=lambda e: (e[0][1], e[0][0]))
    dt_tab.encode(w, 1)  # STRIPT = -1 (B.11 codes 1+; first dt adds back)
    strip_t = -1
    first_s = 0
    i = 0
    n = len(wire)
    while i < n:
        t = wire[i][0][1]
        dt_tab.encode(w, t - strip_t)
        strip_t = t
        first = True
        cur_s = 0
        while i < n and wire[i][0][1] == t:
            (s_val, _), inst, idx = wire[i]
            sid, _, _ = inst
            hh, ww = eff(idx).shape
            adv = (ww if not transposed else hh) - 1
            pre = adv if (not transposed and ref_corner in (2, 3)) \
                or (transposed and ref_corner in (0, 2)) else 0
            c0 = s_val - pre
            if first:
                fs_tab.encode(w, c0 - first_s)
                first_s = c0
                first = False
            else:
                ds_tab.encode(w, c0 - cur_s)
            w.write(remap[sid], id_len)
            if sbrefine:
                refined = refined_of[idx]
                if refined is None:
                    w.write(0, 1)  # RI: raw bit in the Huffman form
                else:
                    w.write(1, 1)
                    sym = symbols[sid]
                    rdw = refined.shape[1] - sym.shape[1]
                    rdh = refined.shape[0] - sym.shape[0]
                    rd_tab.encode(w, rdw)
                    rd_tab.encode(w, rdh)
                    rd_tab.encode(w, -(rdw >> 1))
                    rd_tab.encode(w, -(rdh >> 1))
                    blob = _encode_refinement_region(
                        refined, sym, 0, 0, template=0,
                        icx=gr_icx_r, mps=gr_mps_r)
                    rsize_tab.encode(w, len(blob))
                    w.byte_align()
                    for byte in blob:
                        w.write(byte, 8)
            cur_s = c0 + adv
            i += 1
        ds_tab.encode_oob(w)  # end of strip
    data = w.getvalue()

    flags = 1 | (ref_corner << 4) | ((1 if transposed else 0) << 6) \
        | (2 if sbrefine else 0)
    hflags = (3 << 4) if custom_dt else 0  # DT: custom vs B.11
    if sbrefine:
        # RDW/RDH/RDX/RDY read table B.15 (selector 1); RSIZE B.1
        hflags |= (1 << 6) | (1 << 8) | (1 << 10) | (1 << 12)
    rat = b"\xff\xff\xff\xff" if sbrefine else b""
    body = struct.pack(">IIIIB", pw, ph, 0, 0, 0) \
        + struct.pack(">H", flags) + struct.pack(">H", hflags) \
        + rat + struct.pack(">I", n) + data

    segs = []
    num = 0

    def seg(seg_type: int, payload: bytes, refs=()) -> None:
        nonlocal num
        ref_blob = bytes([len(refs) << 5]) \
            + b"".join(r.to_bytes(1, "big") for r in refs)
        hdr = struct.pack(">IB", num, seg_type) + ref_blob \
            + b"\x01" + struct.pack(">I", len(payload))
        segs.append(hdr + payload)
        num += 1

    seg(48, struct.pack(">IIIIBH", pw, ph, 0, 0, 0, 0))
    seg(0, dict_payload)
    dict_num = 1
    if refagg:
        seg(0, refagg_dict_payload, refs=(1,))
        dict_num = 2
    if custom_dt:
        seg(53, _encode_table_segment(_STD_TABLE_LINES[11]))
        seg(6, body, refs=(dict_num, dict_num + 1))
    else:
        seg(6, body, refs=(dict_num,))
    seg(49, b"")
    return b"".join(segs)
