"""JPEG 2000 (JPX / ISO 15444-1, ITU T.800) decode from scratch —
the Part-1 profiles PDF's last named image filter needs: /JPXDecode
streams carry either a raw codestream or a JP2 box wrapper. r14
landed the REVERSIBLE 5/3 path (OpenJPEG-class archival scans,
lossless mode); r15 adds the IRREVERSIBLE 9/7 path (scalar
quantization styles 1 derived / 2 expounded, ICT) — the dominant
wild form for photographic PDFs.

Covered:
- JP2 signature/ftyp box walk down to the ``jp2c`` codestream box,
  or a bare SOC..EOC codestream;
- main header: SIZ (single tile, no subsampling), COD (progression
  orders LRCP/RLCP/RPCL/PCRL/CPRL in spec packet order — the layer
  loop sits innermost for RPCL/PCRL/CPRL — with default
  whole-resolution precincts, 1..N quality layers, decomposition
  levels, code-block geometry, optional SOP/EPH markers,
  segmentation symbols), QCD styles 0/1/2, COC/QCC per-component
  overrides THREADED through decode (per-component levels,
  code-block geometry, transform, quantization — a COC that changes
  a component's level count reshapes its packet sequence per
  B.12.1.3), COM/TLM/PLT skipped;
- packet decoding (B.10): inclusion + zero-bitplane TAG TREES (the
  inclusion trees incremental across quality layers), the
  coding-pass count codeword, Lblock length signaling, header bit
  stuffing, SOP/EPH handling;
- Tier-1 (Annex D): the three-pass (significance / refinement /
  cleanup) bitplane coder over 4-row stripes with the full context
  model — orientation-dependent significance contexts, sign
  prediction with XOR bit, magnitude-refinement contexts, cleanup
  run-length mode, optional segmentation symbols. The MQ coder is
  operators/jbig2's (T.88 Annex E == T.800 Annex C, one shared
  published coder, pinned there by the spec's own test vector);
- inverse 5/3 reversible DWT (integer lifting, symmetric extension,
  any geometry) + RCT for transform 1; inverse 9/7 irreversible DWT
  (float lifting per F.4.8.2 with the K / 1/K descaling), scalar
  dequantization (E.1.1.2, midpoint reconstruction r=0.5, derived
  exponents per eq E-5) + ICT for transform 0; DC level shift.

Multi-tile codestreams decode since r15: raster-order SOT segments
with tile-parts joined by TPsot, per-tile packet/T1/DWT runs stitched
onto the canvas — for tile grids whose pitch is a multiple of
2^levels (the wild power-of-two grids: 256/512/1024), where per-tile
0-anchored lifting coincides with T.800's absolute-coordinate
anchoring. Unaligned grids raise by name.

All six A.6.1 code-block styles decode since r16: selective
arithmetic bypass (raw spp/mrp segments from the 5th bit-plane, D.6
stuffing), per-pass context reset, termination on every pass (with
B.10.7.2 per-segment length signaling on the 10/2/1 segment
structure), vertically causal contexts, predictable termination
(decode-neutral) and segmentation symbols.

Packed packet headers decode since r16 (B.7/B.8): PPM main-header
segments split into per-tile-part Nppm chunks, PPT tile-part
segments concatenated in Zppt order; one persistent header reader
walks the packed stream (EPH included) while packet bodies and SOP
stay in the tile bitstream.

Named boundaries (fail loud): unaligned tile grids, component
subsampling, POC progression changes, ROI (RGN), tile-part
COD/COC/QCD/QCC overrides.
Typed-error boundary: decode_jpx re-raises every parser failure mode
as JpxError (hostile-input posture, same as cff.parse_cff).

Conformance caveat: no OpenJPEG/Kakadu exists in this container, so
the Tier-1 layer is pinned by the shared MQ coder's published
vector, component-level unit tests (tag trees, pass-count
codewords, DWT perfect reconstruction against the direct lifting
formulas), encoder-mirror roundtrips across the geometry/progression
matrix, and hostile fuzz — the same posture jbig2.py documents for
its symbol layers.

Reference parity: the reference repo has no media layer; this
extends the multimodal decode surface per SURVEY §7.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from dolphinbeat_spark.operators.jbig2 import MQDecoder, MQEncoder

__all__ = ["JpxError", "decode_jpx", "encode_jpx"]


class JpxError(ValueError):
    """Typed JPEG 2000 format error."""


# ------------------------------------------------------------ bit I/O

class _HdrReader:
    """Packet-header bit reader (B.10.1): MSB first; after an 0xFF
    byte the next byte carries only 7 bits."""

    __slots__ = ("data", "pos", "acc", "nbits", "last")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.last = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise JpxError("packet header truncated")
            if self.last == 0xFF:
                self.acc = self.data[self.pos] & 0x7F
                self.nbits = 7
            else:
                self.acc = self.data[self.pos]
                self.nbits = 8
            self.last = self.data[self.pos]
            self.pos += 1
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """End of packet header: skip to the byte boundary (a final
        0xFF carries a stuffed 0 byte after it)."""
        self.nbits = 0
        if self.last == 0xFF:
            if self.pos >= len(self.data):
                raise JpxError("packet header stuffing truncated")
            self.pos += 1
            self.last = 0
        return self.pos


class _HdrWriter:
    """Mirror of _HdrReader."""

    __slots__ = ("out", "acc", "nbits", "cap")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self.cap = 8

    def bit(self, b: int) -> None:
        self.acc = (self.acc << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == self.cap:
            self.out.append(self.acc)
            self.cap = 7 if self.acc == 0xFF else 8
            self.acc = 0
            self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def getvalue(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc << (self.cap - self.nbits))
            self.acc = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)
        return bytes(self.out)


# ----------------------------------------------------------- tag trees

class _TagTree:
    """B.10.2 tag tree over a w x h leaf grid."""

    def __init__(self, w: int, h: int):
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w <= 1 and h <= 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2
        self.low = [np.zeros((hh, ww), np.int64) for ww, hh in self.dims]
        self.done = [np.zeros((hh, ww), bool) for ww, hh in self.dims]

    def _path(self, x: int, y: int):
        out = []
        for lvl in range(len(self.dims) - 1, -1, -1):
            shift = lvl
            out.append((lvl, x >> shift, y >> shift))
        return out

    def decode(self, r: _HdrReader, x: int, y: int,
               threshold: int) -> bool:
        """Decode toward leaf (x, y) until its value is known to be
        < threshold (returns True) or >= threshold (False)."""
        cur = 0
        for lvl, xx, yy in self._path(x, y):
            if self.low[lvl][yy, xx] < cur:
                self.low[lvl][yy, xx] = cur
            while not self.done[lvl][yy, xx] \
                    and self.low[lvl][yy, xx] < threshold:
                if r.bit():
                    self.done[lvl][yy, xx] = True
                else:
                    self.low[lvl][yy, xx] += 1
            cur = self.low[lvl][yy, xx]
            if not self.done[lvl][yy, xx]:
                return False  # value >= threshold
        return cur < threshold

    def value(self, r: _HdrReader, x: int, y: int) -> int:
        """Decode the leaf's exact value (zero-bitplane trees)."""
        t = 1
        while not self.decode(r, x, y, t):
            t += 1
        return self.low[0][y, x]

    def encode(self, w: _HdrWriter, x: int, y: int,
               threshold: int, values) -> None:
        """Emit bits so decode(..., threshold) reproduces the state;
        ``values`` maps (lvl, x, y) -> node value (min over the
        subtree leaves)."""
        cur = 0
        for lvl, xx, yy in self._path(x, y):
            if self.low[lvl][yy, xx] < cur:
                self.low[lvl][yy, xx] = cur
            val = values[(lvl, xx, yy)]
            while not self.done[lvl][yy, xx] \
                    and self.low[lvl][yy, xx] < threshold:
                if self.low[lvl][yy, xx] == val:
                    w.bit(1)
                    self.done[lvl][yy, xx] = True
                else:
                    w.bit(0)
                    self.low[lvl][yy, xx] += 1
            cur = self.low[lvl][yy, xx]
            if not self.done[lvl][yy, xx]:
                return

    @staticmethod
    def node_values(leaves: np.ndarray) -> dict:
        """Leaf grid -> {(lvl, x, y): min over covered leaves}."""
        vals = {}
        cur = leaves.astype(np.int64)
        lvl = 0
        while True:
            h, w = cur.shape
            for y in range(h):
                for x in range(w):
                    vals[(lvl, x, y)] = int(cur[y, x])
            if w <= 1 and h <= 1:
                break
            nh, nw = (h + 1) // 2, (w + 1) // 2
            nxt = np.full((nh, nw), np.iinfo(np.int64).max, np.int64)
            for y in range(h):
                for x in range(w):
                    nxt[y // 2, x // 2] = min(nxt[y // 2, x // 2],
                                              cur[y, x])
            cur = nxt
            lvl += 1
        return vals


# ------------------------------------------------- pass-count codeword

def _read_npasses(r: _HdrReader) -> int:
    if not r.bit():
        return 1
    if not r.bit():
        return 2
    v = r.bits(2)
    if v < 3:
        return 3 + v
    v = r.bits(5)
    if v < 31:
        return 6 + v
    return 37 + r.bits(7)


def _write_npasses(w: _HdrWriter, n: int) -> None:
    if n == 1:
        w.bit(0)
    elif n == 2:
        w.bits(0b10, 2)
    elif n <= 5:
        w.bits(0b11, 2)
        w.bits(n - 3, 2)
    elif n <= 36:
        w.bits(0b1111, 4)
        w.bits(n - 6, 5)
    elif n <= 164:
        w.bits(0b1111, 4)
        w.bits(31, 5)
        w.bits(n - 37, 7)
    else:
        raise JpxError(f"{n} coding passes exceeds the codeword range")


# --------------------------------------------------- Tier-1 (Annex D)

# significance-context lookup per orientation: index by (h, v, d)
def _sig_ctx(h: int, v: int, d: int, band: str) -> int:
    if band == "HL":  # transposed role of h/v
        h, v = v, h
    if band != "HH":
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else d
    if d >= 3:
        return 8
    hv = h + v
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else (1 if hv == 1 else 0)


_CTX_RL = 17
_CTX_UNI = 18
_N_CTX = 19


def _fresh_ctx() -> tuple[list, list]:
    icx = [0] * _N_CTX
    mps = [0] * _N_CTX
    icx[0] = 4       # all-zero significance context starts at state 4
    icx[_CTX_RL] = 3
    icx[_CTX_UNI] = 46
    return icx, mps


# ------------------------------------- code-block styles (T.800 A.6.1)
# SPcod/SPcoc style byte, Table A.19: the six coding-style flags.
_STY_BYPASS = 0x01   # selective arithmetic coding bypass (lazy)
_STY_RESET = 0x02    # context probabilities reset on pass boundaries
_STY_TERMALL = 0x04  # termination on each coding pass
_STY_VSC = 0x08      # vertically causal context formation
_STY_PTERM = 0x10    # predictable termination (error-resilience only:
#                      changes how the ENCODER pads terminations, not
#                      where they fall — a decoder that does not check
#                      for corruption decodes the stream identically)
_STY_SEGSYM = 0x20   # segmentation symbols at cleanup-pass ends


class _RawDecoder:
    """T.800 D.6 raw (arithmetic-bypass) codeword-segment reader:
    MSB-first bits; after an 0xFF byte the next byte carries only 7
    payload bits (its stuffed MSB is 0), and a byte > 0x8F after an
    0xFF means the segment has drained — 1-bits feed in from then on,
    mirroring the MQ coder's E.3.4 marker semantics."""

    __slots__ = ("data", "pos", "c", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.c = 0
        self.ct = 0

    def bit(self) -> int:
        if self.ct == 0:
            if self.c == 0xFF:
                nxt = (self.data[self.pos] if self.pos < len(self.data)
                       else 0xFF)
                if nxt > 0x8F:
                    self.c = 0xFF
                    self.ct = 8
                else:
                    self.c = nxt
                    self.pos += 1
                    self.ct = 7
            else:
                self.c = (self.data[self.pos] if self.pos < len(self.data)
                          else 0xFF)
                self.pos += 1
                self.ct = 8
        self.ct -= 1
        return (self.c >> self.ct) & 1


class _RawEncoder:
    """Mirror of _RawDecoder for the fixture encoder: packs bits
    MSB-first with the D.6 stuffing rule (a byte emitted as 0xFF
    leaves only 7 slots in the next byte, whose MSB stays 0)."""

    __slots__ = ("out", "acc", "nbits", "nslots")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self.nslots = 8

    def bit(self, b: int) -> None:
        self.acc = (self.acc << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == self.nslots:
            self.out.append(self.acc)
            self.nslots = 7 if self.acc == 0xFF else 8
            self.acc = 0
            self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc << (self.nslots - self.nbits))
        # B.10.7: a terminated segment must not end in 0xFF. Zero
        # padding makes that impossible for a partial byte (and a
        # stuffed 7-slot byte caps at 0x7F); guard the exact-0xFF
        # full-byte tail anyway.
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)
        return bytes(self.out)


def _pass_plan(numbps: int, style: int):
    """Yield (kind, plane, is_raw) in coding order: pass 0 is the MSB
    cleanup, then (spp, mrp, cleanup) per bit-plane. With bypass, the
    significance and refinement passes switch to raw coding from the
    fifth most significant bit-plane down (plane + 1 <= numbps - 4,
    D.6); cleanup passes stay MQ-coded."""
    plane = numbps - 1
    yield ("cleanup", plane, False)
    plane -= 1
    while plane >= 0:
        raw = bool(style & _STY_BYPASS) and (plane + 1 <= numbps - 4)
        yield ("spp", plane, raw)
        yield ("mrp", plane, raw)
        yield ("cleanup", plane, False)
        plane -= 1


def _term_after(kind: str, plane: int, numbps: int, style: int) -> bool:
    """Does a codeword segment end after this pass? (D.4.2 / B.10.7.)
    termall terminates every pass; bypass terminates the cleanup pass
    just before the first raw pass and then every mrp/cleanup below
    it (so raw spp+mrp pairs and MQ cleanups alternate as separate
    segments)."""
    if style & _STY_TERMALL:
        return True
    if style & _STY_BYPASS:
        if plane + 1 == numbps - 3 and kind == "cleanup":
            return True
        if plane + 1 <= numbps - 4 and kind in ("mrp", "cleanup"):
            return True
    return False


def _seg_maxpasses(style: int, prev_maxp: int | None) -> int:
    """Maximum passes the next codeword segment may hold — the
    packet parser's side of the same termination structure (it must
    split a contribution's length signaling per segment BEFORE any
    Tier-1 state exists). The first lazy segment holds the 10
    MQ-coded passes of the top four bit-planes, then raw (2-pass)
    and MQ-cleanup (1-pass) segments alternate; the alternation is
    keyed off the previous segment's capacity."""
    if style & _STY_TERMALL:
        return 1
    if style & _STY_BYPASS:
        if prev_maxp is None:
            return 10
        return 2 if prev_maxp in (1, 10) else 1
    return 109


class _CblkCoder:
    """Shared Tier-1 state machine: the pass structure and context
    computation are identical for decode and encode; the ``bitio``
    closure hides the MQ direction (decode returns the bit, encode
    consumes the known bit and returns it)."""

    def __init__(self, h: int, w: int, band: str, segsym: bool,
                 vsc: bool = False):
        self.h, self.w, self.band = h, w, band
        self.segsym = segsym
        self.vsc = vsc
        self.sig = np.zeros((h + 2, w + 2), np.int8)   # 1-padded
        self.sgn = np.zeros((h + 2, w + 2), np.int8)   # -1/+1
        self.visited = np.zeros((h, w), bool)
        self.refined = np.zeros((h, w), bool)
        self.mag = np.zeros((h, w), np.int64)
        self.icx, self.mps = _fresh_ctx()

    def _nbrs(self, y: int, x: int) -> tuple[int, int, int]:
        s = self.sig
        yy, xx = y + 1, x + 1
        # vertically causal (D.7): on a stripe's last row the three
        # southern neighbours (next stripe) read as insignificant
        below = 0 if (self.vsc and (y & 3) == 3) else 1
        hh = int(s[yy, xx - 1]) + int(s[yy, xx + 1])
        vv = int(s[yy - 1, xx]) + below * int(s[yy + 1, xx])
        dd = (int(s[yy - 1, xx - 1]) + int(s[yy - 1, xx + 1])
              + below * (int(s[yy + 1, xx - 1])
                         + int(s[yy + 1, xx + 1])))
        return hh, vv, dd

    def _sign_ctx(self, y: int, x: int) -> tuple[int, int]:
        s, g = self.sig, self.sgn
        yy, xx = y + 1, x + 1
        below = 0 if (self.vsc and (y & 3) == 3) else 1
        hc = max(-1, min(1, int(s[yy, xx - 1]) * int(g[yy, xx - 1])
                         + int(s[yy, xx + 1]) * int(g[yy, xx + 1])))
        vc = max(-1, min(1, int(s[yy - 1, xx]) * int(g[yy - 1, xx])
                         + below * int(s[yy + 1, xx])
                         * int(g[yy + 1, xx])))
        if hc == 1:
            return (13, 0) if vc == 1 else ((12, 0) if vc == 0
                                            else (11, 0))
        if hc == 0:
            return (10, 0) if vc == 1 else ((9, 0) if vc == 0
                                            else (10, 1))
        return (11, 1) if vc == 1 else ((12, 1) if vc == 0
                                        else (13, 1))

    def _set_sig(self, y: int, x: int, sign: int, plane: int) -> None:
        self.sig[y + 1, x + 1] = 1
        self.sgn[y + 1, x + 1] = 1 if sign == 0 else -1
        self.mag[y, x] |= 1 << plane

    # each pass walks 4-row stripes, column-major inside the stripe
    def _stripes(self):
        for y0 in range(0, self.h, 4):
            for x in range(self.w):
                for y in range(y0, min(y0 + 4, self.h)):
                    yield y0, y, x

    def spp(self, bitio, plane: int) -> None:
        self.visited[:] = False
        for _, y, x in self._stripes():
            if self.sig[y + 1, x + 1]:
                continue
            hh, vv, dd = self._nbrs(y, x)
            if hh + vv + dd == 0:
                continue
            ctx = _sig_ctx(hh, vv, dd, self.band)
            self.visited[y, x] = True
            if bitio(ctx, "sig", y, x, plane):
                sc, xb = self._sign_ctx(y, x)
                sbit = bitio(sc, "sign", y, x, plane) ^ xb
                self._set_sig(y, x, sbit, plane)
                self.sgn[y + 1, x + 1] = 1 if sbit == 0 else -1

    def mrp(self, bitio, plane: int) -> None:
        for _, y, x in self._stripes():
            if not self.sig[y + 1, x + 1] or self.visited[y, x]:
                continue
            # visited marks coefficients that became significant in
            # THIS plane's SPP; everything else significant refines
            if self.mag[y, x] >> (plane + 1) == 0:
                continue  # became significant this plane (in CP path)
            if not self.refined[y, x]:
                hh, vv, dd = self._nbrs(y, x)
                ctx = 15 if hh + vv + dd else 14
                self.refined[y, x] = True
            else:
                ctx = 16
            if bitio(ctx, "ref", y, x, plane):
                self.mag[y, x] |= 1 << plane

    def cleanup(self, bitio, plane: int) -> None:
        for y0 in range(0, self.h, 4):
            x = 0
            while x < self.w:
                run = False
                if y0 + 4 <= self.h:
                    run = True
                    for y in range(y0, y0 + 4):
                        if self.sig[y + 1, x + 1] or self.visited[y, x]:
                            run = False
                            break
                        hh, vv, dd = self._nbrs(y, x)
                        if hh + vv + dd:
                            run = False
                            break
                start = y0
                if run:
                    if not bitio(_CTX_RL, "rl", y0, x, plane):
                        x += 1
                        continue
                    idx = (bitio(_CTX_UNI, "uni", y0, x, plane) << 1) \
                        | bitio(_CTX_UNI, "uni", y0, x, plane)
                    y = y0 + idx
                    sc, xb = self._sign_ctx(y, x)
                    sbit = bitio(sc, "sign", y, x, plane) ^ xb
                    self._set_sig(y, x, sbit, plane)
                    start = y + 1
                for y in range(start, min(y0 + 4, self.h)):
                    if self.sig[y + 1, x + 1] or self.visited[y, x]:
                        continue
                    hh, vv, dd = self._nbrs(y, x)
                    ctx = _sig_ctx(hh, vv, dd, self.band)
                    if bitio(ctx, "sig", y, x, plane):
                        sc, xb = self._sign_ctx(y, x)
                        sbit = bitio(sc, "sign", y, x, plane) ^ xb
                        self._set_sig(y, x, sbit, plane)
                x += 1
        if self.segsym:
            got = 0
            for _ in range(4):
                got = (got << 1) | bitio(_CTX_UNI, "seg", 0, 0, plane)
            if got != 0b1010:
                raise JpxError("segmentation symbol mismatch")


def _t1_decode(segs: list[tuple[bytes, int]], h: int, w: int,
               band: str, numbps: int, style: int) -> np.ndarray:
    """Codeword segments [(bytes, npasses), ...] -> signed
    coefficients. Each terminated segment gets a fresh coder (MQ for
    cleanup/plain passes, raw for bypassed spp/mrp); context states
    persist across segments unless the RESET style re-initialises
    them at every pass boundary (D.5)."""
    cb = _CblkCoder(h, w, band, bool(style & _STY_SEGSYM),
                    vsc=bool(style & _STY_VSC))
    npasses = sum(n for _, n in segs)
    seg_iter = iter(segs)
    cur_data: bytes = b""
    cur_left = 0
    dec: MQDecoder | None = None
    raw: _RawDecoder | None = None

    def bitio(ctx, kind, y, x, plane):
        if raw is not None:
            b = raw.bit()
            if kind == "sign":
                # raw mode codes the sign DIRECTLY (no prediction);
                # the caller xors with the prediction bit, so cancel
                # it here to keep one shared pass implementation
                b ^= cb._sign_ctx(y, x)[1]
            return b
        return dec.decode(cb.icx, cb.mps, ctx)

    p = 0
    for kind, plane, is_raw in _pass_plan(numbps, style):
        if p >= npasses:
            break
        while cur_left == 0:
            nxt = next(seg_iter, None)
            if nxt is None:
                break
            cur_data, cur_left = nxt
            dec = raw = None
        if cur_left == 0:
            break
        if dec is None and raw is None:
            if is_raw:
                raw = _RawDecoder(cur_data)
            else:
                dec = MQDecoder(cur_data)
        if kind == "cleanup":
            cb.cleanup(bitio, plane)
        elif kind == "spp":
            cb.spp(bitio, plane)
        else:
            cb.mrp(bitio, plane)
        p += 1
        cur_left -= 1
        if style & _STY_RESET:
            cb.icx, cb.mps = _fresh_ctx()
    out = cb.mag * np.where(cb.sgn[1:-1, 1:-1] < 0, -1, 1)
    return out


def _t1_encode(coefs: np.ndarray, band: str,
               style: int) -> tuple[list[tuple[bytes, int]], int]:
    """Signed coefficients -> ([(codeword segment bytes, passes),
    ...], numbps). All passes of every nonzero bitplane are emitted
    (single quality layer); the style byte drives bypass/termall/
    reset/causal/segsym exactly as the decoder consumes them, so the
    segment list mirrors the decoder's _seg_maxpasses structure."""
    h, w = coefs.shape
    mag_true = np.abs(coefs).astype(np.int64)
    sign_true = (coefs < 0).astype(np.int8)
    numbps = int(mag_true.max()).bit_length()
    if numbps == 0:
        return [], 0
    cb = _CblkCoder(h, w, band, bool(style & _STY_SEGSYM),
                    vsc=bool(style & _STY_VSC))
    mq: MQEncoder | None = None
    rw: _RawEncoder | None = None
    segs: list[tuple[bytes, int]] = []
    seg_passes = 0

    def bitio(ctx, kind, y, x, plane):
        if kind == "sig" or kind == "ref":
            b = int((mag_true[y, x] >> plane) & 1)
        elif kind == "sign":
            _sc, xb = cb._sign_ctx(y, x)
            b = int(sign_true[y, x]) ^ xb
        elif kind == "rl":
            b = 0
            for yy in range(y, y + 4):
                if (mag_true[yy, x] >> plane) & 1:
                    b = 1
                    # queue the 2 uniform bits locating the first
                    # significant row of the run
                    idx = yy - y
                    bitio.uni_queue.extend([(idx >> 1) & 1, idx & 1])
                    break
        elif kind == "uni":
            b = bitio.uni_queue.pop(0)
        else:  # seg
            if not bitio.seg_queue:
                bitio.seg_queue.extend([1, 0, 1, 0])
            b = bitio.seg_queue.pop(0)
        if rw is not None:
            if kind == "sign":
                # raw mode codes the sign unpredicted: cancel the xor
                rw.bit(b ^ cb._sign_ctx(y, x)[1])
            else:
                rw.bit(b)
        else:
            mq.encode(cb.icx, cb.mps, ctx, b)
        return b

    bitio.uni_queue = []
    bitio.seg_queue = []

    for kind, plane, is_raw in _pass_plan(numbps, style):
        if mq is None and rw is None:
            if is_raw:
                rw = _RawEncoder()
            else:
                mq = MQEncoder()
        if kind == "cleanup":
            cb.cleanup(bitio, plane)
        elif kind == "spp":
            cb.spp(bitio, plane)
        else:
            cb.mrp(bitio, plane)
        seg_passes += 1
        if style & _STY_RESET:
            cb.icx, cb.mps = _fresh_ctx()
        if _term_after(kind, plane, numbps, style):
            segs.append(((mq or rw).flush(), seg_passes))
            mq = rw = None
            seg_passes = 0
    if seg_passes:
        segs.append(((mq or rw).flush(), seg_passes))
    return segs, numbps


# ---------------------------------------------------- 5/3 lifting DWT

def _idwt53_1d(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Inverse 1D 5/3 along axis 0 (T.800 F.3.8.2, even-anchored)."""
    n = low.shape[0] + high.shape[0]
    out = np.zeros((n,) + low.shape[1:], np.int64)
    if n == 1:
        out[0] = low[0] if low.shape[0] else high[0] // 2
        return out
    le, he = low.shape[0], high.shape[0]
    # symmetric extension via index clamping
    hi = lambda i: high[min(max(i, 0), he - 1)]  # noqa: E731
    for i in range(le):
        out[2 * i] = low[i] - ((hi(i - 1) + hi(i) + 2) >> 2)
    ev = lambda i: out[2 * min(max(i, 0), le - 1)]  # noqa: E731
    for i in range(he):
        out[2 * i + 1] = high[i] + ((ev(i) + ev(i + 1)) >> 1)
    return out


def _fdwt53_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = x.shape[0]
    if n == 1:
        return x.astype(np.int64), x[:0].astype(np.int64)
    ev = x[0::2].astype(np.int64)
    od = x[1::2].astype(np.int64)
    le, he = ev.shape[0], od.shape[0]
    evx = lambda i: ev[min(max(i, 0), le - 1)]  # noqa: E731
    high = np.array([od[i] - ((evx(i) + evx(i + 1)) >> 1)
                     for i in range(he)], np.int64).reshape(
        (he,) + x.shape[1:])
    hix = lambda i: high[min(max(i, 0), he - 1)] if he else 0  # noqa: E731
    low = np.array([ev[i] + ((hix(i - 1) + hix(i) + 2) >> 2)
                    for i in range(le)], np.int64).reshape(
        (le,) + x.shape[1:])
    return low, high


def _idwt53_2d(ll, hl, lh, hh) -> np.ndarray:
    # columns first: (LL over HL) and (LH over HH) -> L and H halves
    left = _idwt53_1d(ll, lh)
    right = _idwt53_1d(hl, hh)
    # then rows
    return _idwt53_1d(left.T, right.T).T


def _fdwt53_2d(img: np.ndarray):
    low, high = _fdwt53_1d(img.T)
    low, high = low.T, high.T
    ll, lh = _fdwt53_1d(low)
    hl, hh = _fdwt53_1d(high)
    return ll, hl, lh, hh


# ---------------------------------------------------- 9/7 lifting DWT

# T.800 F.4.8.1 lifting constants (irreversible CDF 9/7).  After the
# four lifting steps the low branch carries DC gain K and the high
# branch Nyquist gain 2/K; the F-12/F-13 scaling (high x K, low x 1/K)
# lands the nominal per-band ranges Table E.1 assumes (LL gain 0,
# HL/LH gain 1, HH gain 2).
_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _reflect(idx: np.ndarray, n: int) -> np.ndarray:
    """Whole-sample symmetric extension for +/-1 neighbors."""
    return (n - 1) - np.abs((n - 1) - np.abs(idx))


def _idwt97_1d(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Inverse 1D 9/7 along axis 0 (T.800 F.4.8.2): descale, then the
    four lifting steps in reverse with subtraction."""
    le, he = low.shape[0], high.shape[0]
    n = le + he
    if n == 1:
        return (low.astype(np.float64) if le
                else high.astype(np.float64) * 0.5)
    y = np.zeros((n,) + low.shape[1:], np.float64)
    y[0::2] = low * _K97
    y[1::2] = high * (1.0 / _K97)
    for coef, parity in ((_D97, 0), (_G97, 1), (_B97, 0), (_A97, 1)):
        idx = np.arange(parity, n, 2)
        y[idx] -= coef * (y[_reflect(idx - 1, n)]
                          + y[_reflect(idx + 1, n)])
    return y


def _fdwt97_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = x.shape[0]
    if n == 1:
        return x.astype(np.float64), x[:0].astype(np.float64)
    y = x.astype(np.float64).copy()
    for coef, parity in ((_A97, 1), (_B97, 0), (_G97, 1), (_D97, 0)):
        idx = np.arange(parity, n, 2)
        y[idx] += coef * (y[_reflect(idx - 1, n)]
                          + y[_reflect(idx + 1, n)])
    return y[0::2] * (1.0 / _K97), y[1::2] * _K97


def _idwt97_2d(ll, hl, lh, hh) -> np.ndarray:
    left = _idwt97_1d(ll, lh)
    right = _idwt97_1d(hl, hh)
    return _idwt97_1d(left.T, right.T).T


def _fdwt97_2d(img: np.ndarray):
    low, high = _fdwt97_1d(img.T)
    low, high = low.T, high.T
    ll, lh = _fdwt97_1d(low)
    hl, hh = _fdwt97_1d(high)
    return ll, hl, lh, hh


# irreversible component transform (T.800 G.2/G.3) — the 9/7
# counterpart of the RCT; float in, float out
def _ict_forward(r, g, b):
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _ict_inverse(y, cb, cr):
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return r, g, b


# ----------------------------------------------------- codestream I/O

def _band_dims(w: int, h: int, level: int, band: str) -> tuple[int, int]:
    """Subband dimensions after `level` decompositions (anchored at
    0: low band gets the ceil half at each split)."""
    for _ in range(level - (0 if band == "LL" else 1)):
        w = (w + 1) // 2
        h = (h + 1) // 2
    if band == "LL":
        return w, h
    lw, lh = (w + 1) // 2, (h + 1) // 2
    hw, hh = w - lw, h - lh
    return {"HL": (hw, lh), "LH": (lw, hh), "HH": (hw, hh)}[band]


def _cblk_grid(bw: int, bh: int, cw: int, ch: int) -> tuple[int, int]:
    return (bw + cw - 1) // cw if bw else 0, \
        (bh + ch - 1) // ch if bh else 0


def _cblk_cells(b0: int, bn: int, cs: int) -> list[tuple[int, int]]:
    """Cut band interval [b0, b0+bn) by the code-block partition
    anchored at ABSOLUTE multiples of ``cs`` (T.800 B.7: the
    partition lives in the band coordinate system, origin 0 — not at
    the tile's band origin). Returns [(band-local offset, extent)]
    per intersecting cell; an interior tile whose band origin is not
    a cell multiple gets a partial FIRST cell (r16, ADVICE fix)."""
    if not bn:
        return []
    out = []
    x, end = b0, b0 + bn
    while x < end:
        nxt = min((x // cs + 1) * cs, end)
        out.append((x - b0, nxt - x))
        x = nxt
    return out


def _packet_order(progression: int, layers: int,
                  levels_list: list[int] | tuple[int, ...]):
    """(layer, resolution, component) triples in progression order
    (B.12: LRCP / RLCP / RPCL / PCRL / CPRL) — one precinct per
    (r, c), so the position loop is implicit and the spec's layer
    position holds: RPCL is r,p,c,l and PCRL/CPRL put the layer
    innermost after c/r.  `levels_list` is per-component (COC can
    lower a component's decomposition count; packets only exist for
    resolutions the component has, B.12.1.3)."""
    ncomps = len(levels_list)
    max_r = max(levels_list) + 1
    if progression == 0:  # LRCP
        for layer in range(layers):
            for r in range(max_r):
                for c in range(ncomps):
                    if r <= levels_list[c]:
                        yield layer, r, c
    elif progression == 1:  # RLCP
        for r in range(max_r):
            for layer in range(layers):
                for c in range(ncomps):
                    if r <= levels_list[c]:
                        yield layer, r, c
    elif progression == 2:  # RPCL: r, p, c, l
        for r in range(max_r):
            for c in range(ncomps):
                if r <= levels_list[c]:
                    for layer in range(layers):
                        yield layer, r, c
    elif progression == 3:  # PCRL: p, c, r, l
        for c in range(ncomps):
            for r in range(levels_list[c] + 1):
                for layer in range(layers):
                    yield layer, r, c
    elif progression == 4:  # CPRL: c, p, r, l
        for c in range(ncomps):
            for r in range(levels_list[c] + 1):
                for layer in range(layers):
                    yield layer, r, c
    else:
        raise JpxError(f"reserved progression order {progression}")


def _res_bands(r: int, levels: int):
    """Resolution r -> [(band, decomposition level)]."""
    if r == 0:
        return [("LL", levels)]
    return [(b, levels - r + 1) for b in ("HL", "LH", "HH")]


def decode_jpx(data: bytes,
               max_pixels: int = 1 << 26) -> tuple[int, int, np.ndarray]:
    """JPX/JP2/raw-codestream bytes -> (w, h, HxWxC uint8/uint16).

    Typed-error boundary: every malformed-stream failure mode inside
    the parser (short reads, bad indices, struct underruns on bodies
    whose length field still matched) re-raises as JpxError so
    callers' ``except JpxError`` holds on hostile input; named
    NotImplementedError boundaries pass through untouched."""
    try:
        return _decode(data, max_pixels)
    except (JpxError, NotImplementedError):
        raise
    except (IndexError, KeyError, ValueError, OverflowError,
            ZeroDivisionError, struct.error) as ex:
        raise JpxError(
            f"malformed JPEG 2000 stream: {type(ex).__name__}: {ex}"
        ) from ex


def _decode(data: bytes, max_pixels: int) -> tuple[int, int, np.ndarray]:
    cs = _find_codestream(data)
    if cs[:4] != b"\xff\x4f\xff\x51":
        raise JpxError("codestream does not open with SOC+SIZ")
    pos = 2
    siz = cod = qcd = None
    tile_parts: dict[int, list[tuple[int, bytes]]] = {}
    coc: dict[int, dict] = {}
    qcc: dict[int, dict] = {}
    ppm_store: list[tuple[int, bytes]] = []        # (Zppm, body)
    ppt_store: dict[int, list[tuple[int, bytes]]] = {}  # tile -> (Zppt, body)
    sot_order: list[int] = []  # tile-part appearance order (PPM map)

    def comp_index(body: bytes) -> tuple[int, bytes]:
        # Ccoc/Cqcc is 1 byte when Csiz < 257, else 2 (A.6.2/A.6.5)
        if siz is None:
            raise JpxError("COC/QCC before SIZ")
        if siz["ncomps"] < 257:
            return body[0], body[1:]
        return struct.unpack_from(">H", body, 0)[0], body[2:]

    while pos + 4 <= len(cs):
        marker, ln = struct.unpack_from(">HH", cs, pos)
        if marker == 0xFF93:  # SOD: data runs to EOC
            raise JpxError("SOD before SOT")
        body = cs[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise JpxError(f"marker {marker:#06x} truncated")
        if marker == 0xFF51:
            siz = _parse_siz(body, max_pixels)
        elif marker == 0xFF52:
            cod = _parse_cod(body)
        elif marker == 0xFF53:
            c, rest = comp_index(body)
            coc[c] = _parse_cod(rest, is_coc=True)
        elif marker == 0xFF5C:
            qcd = _parse_qcd(body)
        elif marker == 0xFF5D:
            c, rest = comp_index(body)
            qcc[c] = _parse_qcd(rest)
        elif marker == 0xFF60:
            # PPM (r16): packed packet headers, main header form —
            # Zppm-indexed segments concatenate into (Nppm u32, data)
            # chunks, one per tile-part in codestream order
            if not body:
                raise JpxError("PPM without Zppm index")
            ppm_store.append((body[0], body[1:]))
        elif marker == 0xFF61:
            raise JpxError("PPT marker in the main header")
        elif marker in (0xFF55, 0xFF57, 0xFF58, 0xFF63, 0xFF64):
            pass  # TLM/PLM/PLT/CRG/COM: informational
        elif marker == 0xFF5E:
            raise NotImplementedError(
                "JPX RGN (ROI shift) not supported")
        elif marker == 0xFF5F:
            raise NotImplementedError(
                "JPX POC progression-order changes not supported")
        elif marker == 0xFF90:  # SOT
            isot, = struct.unpack_from(">H", body, 0)
            psot, = struct.unpack_from(">I", body, 2)
            tpsot = body[6]
            # tile-part header markers between SOT and SOD (r16):
            # PPT packed headers and informational PLT/COM decode;
            # tile-scoped coding-style overrides raise by name
            hp = pos + 2 + ln
            while cs[hp:hp + 2] != b"\xff\x93":
                if hp + 4 > len(cs):
                    raise JpxError("tile-part header runs off the "
                                   "codestream without SOD")
                m2, l2 = struct.unpack_from(">HH", cs, hp)
                b2 = cs[hp + 4:hp + 2 + l2]
                if len(b2) != l2 - 2:
                    raise JpxError(
                        f"tile-part marker {m2:#06x} truncated")
                if m2 == 0xFF61:
                    if not b2:
                        raise JpxError("PPT without Zppt index")
                    ppt_store.setdefault(isot, []).append(
                        (b2[0], b2[1:]))
                elif m2 in (0xFF58, 0xFF64):  # PLT/COM
                    pass
                elif m2 in (0xFF52, 0xFF53, 0xFF5C, 0xFF5D):
                    raise NotImplementedError(
                        "JPX tile-part COD/COC/QCD/QCC overrides "
                        "not supported")
                elif m2 == 0xFF5E:
                    raise NotImplementedError(
                        "JPX RGN (ROI shift) not supported")
                elif m2 == 0xFF5F:
                    raise NotImplementedError(
                        "JPX POC progression-order changes not "
                        "supported")
                else:
                    raise JpxError(
                        f"unexpected tile-part marker {m2:#06x}")
                hp += 2 + l2
            sod_at = hp
            end = pos + psot if psot else len(cs) - 2
            if end > len(cs) or end <= sod_at:
                raise JpxError("SOT Psot overruns the codestream")
            tile_parts.setdefault(isot, []).append(
                (tpsot, cs[sod_at + 2:end]))
            sot_order.append(isot)
            pos = end
            continue
        elif marker == 0xFFD9:
            break
        pos += 2 + ln
    if siz is None or cod is None or qcd is None or not tile_parts:
        raise JpxError("codestream missing SIZ/COD/QCD/tile data")

    w, h, nc = siz["w"], siz["h"], siz["ncomps"]
    xt, yt = siz["xt"], siz["yt"]
    ntx = (w + xt - 1) // xt
    nty = (h + yt - 1) // yt
    ntiles = ntx * nty
    if any(i >= ntiles for i in tile_parts):
        raise JpxError("SOT tile index beyond the SIZ tile grid")
    if len(tile_parts) != ntiles:
        raise JpxError(
            f"{len(tile_parts)} tiles present, grid wants {ntiles}")

    # packed-packet-header assembly (r16, B.7/B.8): PPM chunks map
    # to tile-parts in codestream order; PPT segments concatenate in
    # Zppt order within their tile. Either form replaces the in-band
    # packet headers with a per-tile header stream.
    pph_tiles: dict[int, bytes] | None = None
    if ppm_store and ppt_store:
        raise JpxError("codestream mixes PPM and PPT packed headers")
    if ppm_store:
        full = b"".join(
            d for _, d in sorted(ppm_store, key=lambda e: e[0]))
        chunks = []
        p2 = 0
        while p2 < len(full):
            if p2 + 4 > len(full):
                raise JpxError("PPM Nppm length truncated")
            nppm, = struct.unpack_from(">I", full, p2)
            p2 += 4
            if p2 + nppm > len(full):
                raise JpxError("PPM packed-header chunk truncated")
            chunks.append(full[p2:p2 + nppm])
            p2 += nppm
        if len(chunks) != len(sot_order):
            raise JpxError(
                f"PPM carries {len(chunks)} tile-part chunks, the "
                f"codestream has {len(sot_order)} tile-parts")
        per_tile: dict[int, bytearray] = {}
        for isot, chunk in zip(sot_order, chunks):
            per_tile.setdefault(isot, bytearray()).extend(chunk)
        pph_tiles = {i: bytes(v) for i, v in per_tile.items()}
    elif ppt_store:
        pph_tiles = {
            i: b"".join(d for _, d in sorted(v, key=lambda e: e[0]))
            for i, v in ppt_store.items()}

    if ntiles == 1:
        tdata = b"".join(d for _, d in sorted(tile_parts[0]))
        return _decode_tile(siz, cod, qcd, coc, qcc, tdata, max_pixels,
                            pph=pph_tiles.get(0, b"")
                            if pph_tiles is not None else None)

    # multiple tiles (r15): T.800 anchors the DWT at ABSOLUTE image
    # coordinates, so per-tile 0-anchored decode is exact only when
    # every tile origin is even at every decomposition level — i.e.
    # the tile size is a multiple of 2^levels (the wild power-of-two
    # tile grids: 256/512/1024). Other grids raise by name.
    max_levels = max([cod["levels"]] + [o["levels"] for o in coc.values()])
    if xt % (1 << max_levels) or yt % (1 << max_levels):
        raise NotImplementedError(
            f"JPX tile grid {xt}x{yt} not a multiple of 2^levels "
            f"(2^{max_levels}) — unaligned tile anchoring not "
            "supported")
    # r16 (ADVICE): T.800 additionally anchors the CODE-BLOCK
    # partition at absolute band coordinates — an interior tile's
    # band origin tbx0 = k*(xt >> n) need not be a block multiple
    # (256-pitch tiles, 5 levels, 64-wide blocks -> tbx0 = 8k), so
    # the tile's first block per band can be partial. _decode_tile
    # takes the tile origin and cuts its block grid on the absolute
    # partition (_cblk_cells), so conformant interior tiles decode
    # exactly; no alignment guard is needed beyond DWT parity.
    canvas = None
    for i in range(ntiles):
        tx, ty = i % ntx, i // ntx
        tw = min(xt, w - tx * xt)
        th = min(yt, h - ty * yt)
        tsiz = dict(siz)
        tsiz["w"], tsiz["h"] = tw, th
        tdata = b"".join(d for _, d in sorted(tile_parts[i]))
        _, _, px = _decode_tile(tsiz, cod, qcd, coc, qcc, tdata,
                                max_pixels, org=(tx * xt, ty * yt),
                                pph=pph_tiles.get(i, b"")
                                if pph_tiles is not None else None)
        if canvas is None:
            canvas = np.zeros((h, w, px.shape[2]), px.dtype)
        canvas[ty * yt:ty * yt + th, tx * xt:tx * xt + tw] = px
    return w, h, canvas


def _find_codestream(data: bytes) -> bytes:
    if data[:2] == b"\xff\x4f":
        return data
    if data[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n":
        pos = 12
        while pos + 8 <= len(data):
            (box_len,) = struct.unpack_from(">I", data, pos)
            btype = data[pos + 4:pos + 8]
            hdr = 8
            if box_len == 1:
                (box_len,) = struct.unpack_from(">Q", data, pos + 8)
                hdr = 16
            elif box_len == 0:
                box_len = len(data) - pos
            if btype == b"jp2c":
                return data[pos + hdr:pos + box_len]
            if box_len < hdr:
                raise JpxError("malformed JP2 box length")
            pos += box_len
        raise JpxError("JP2 file without a jp2c codestream box")
    raise JpxError("not a JPEG 2000 payload (no SOC or JP2 signature)")


def _parse_siz(b: bytes, max_pixels: int) -> dict:
    (rsiz, xs, ys, xo, yo, xt, yt, xto, yto, nc) = struct.unpack_from(
        ">HIIIIIIIIH", b, 0)
    del rsiz
    if xo or yo or xto or yto:
        raise NotImplementedError("JPX image/tile offsets not supported")
    w, h = xs, ys
    if xt <= 0 or yt <= 0:
        raise JpxError("JPX tile size must be positive")
    if w * h * max(nc, 1) > max_pixels:
        raise JpxError(f"JPX geometry {w}x{h}x{nc} exceeds the cap")
    if ((w + xt - 1) // xt) * ((h + yt - 1) // yt) > 4096:
        raise JpxError("JPX tile grid exceeds the decode cap")
    comps = []
    for c in range(nc):
        ssiz, xr, yr = b[36 + 3 * c], b[37 + 3 * c], b[38 + 3 * c]
        if xr != 1 or yr != 1:
            raise NotImplementedError(
                "JPX component subsampling not supported")
        comps.append({"depth": (ssiz & 0x7F) + 1,
                      "signed": bool(ssiz & 0x80)})
        if comps[-1]["depth"] > 16:
            raise NotImplementedError("JPX depths beyond 16 bits")
    return {"w": w, "h": h, "xt": min(xt, w), "yt": min(yt, h),
            "ncomps": nc, "comps": comps}


def _parse_cod(b: bytes, is_coc: bool = False) -> dict:
    pos = 0
    scod = b[pos]
    pos += 1
    out: dict = {"precincts_defined": bool(scod & 1),
                 "sop": bool(scod & 2), "eph": bool(scod & 4)}
    if not is_coc:
        out["progression"] = b[pos]
        out["layers"], = struct.unpack_from(">H", b, pos + 1)
        out["mct"] = b[pos + 3]
        pos += 4
    out["levels"] = b[pos]
    out["xcb"] = (b[pos + 1] & 0xF) + 2
    out["ycb"] = (b[pos + 2] & 0xF) + 2
    style = b[pos + 3]
    out["transform"] = b[pos + 4]
    if style & 0xC0:
        raise NotImplementedError(
            f"reserved JPX code-block style bits {style:#04x}")
    # bypass/reset/termall/causal/predictable (supported since r16);
    # predictable termination (0x10) only constrains how the encoder
    # pads terminations — decode is unchanged
    out["cblk_style"] = style & 0x1F
    out["segsym"] = bool(style & 0x20)
    if out["transform"] not in (0, 1):
        raise JpxError(
            f"reserved wavelet transformation {out['transform']}")
    if out["precincts_defined"]:
        pps = list(b[pos + 5:])
        if any(p != 0xFF and ((p & 0xF) < 15 or (p >> 4) < 15)
               and p != 0xEE for p in pps):
            # any precinct smaller than the full resolution changes
            # the packet structure; only maximal precincts supported
            if any(((p & 0xF), (p >> 4)) != (15, 15) for p in pps):
                raise NotImplementedError(
                    "JPX non-default precinct sizes not supported")
    return out


def _parse_qcd(b: bytes) -> dict:
    """QCD/QCC body -> quantization params (A.6.4/A.6.5, E.1):
    style 0 = no quantization (reversible; 8-bit exponents), style 1 =
    scalar derived (one 16-bit (exp, mant) pair, other bands derived
    per E-5), style 2 = scalar expounded (one pair per subband)."""
    sqcd = b[0]
    style = sqcd & 0x1F
    guard = sqcd >> 5
    if style == 0:
        return {"style": 0, "guard": guard,
                "pairs": [(v >> 3, 0) for v in b[1:]]}
    if style in (1, 2):
        n = (len(b) - 1) // 2
        if n < 1 or (len(b) - 1) % 2:
            raise JpxError("QCD style 1/2 body is not 16-bit pairs")
        pairs = []
        for i in range(n):
            v, = struct.unpack_from(">H", b, 1 + 2 * i)
            pairs.append((v >> 11, v & 0x7FF))
        return {"style": style, "guard": guard, "pairs": pairs}
    raise JpxError(f"reserved quantization style {style}")


_BAND_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def _qparams(q: dict, r: int, band: str) -> tuple[int, int]:
    """-> (epsilon_b, mu_b) for the subband at resolution r (E.1.1;
    derived style: eps_b = eps_0 - (r - 1) for r >= 1, eq E-5)."""
    if q["style"] == 1:
        e0, m0 = q["pairs"][0]
        return (e0 if r == 0 else max(e0 - (r - 1), 0)), m0
    idx = 0 if r == 0 else 1 + 3 * (r - 1) + ("HL", "LH", "HH").index(band)
    pairs = q["pairs"]
    if not pairs:
        return 8, 0
    return pairs[idx] if idx < len(pairs) else pairs[-1]


def _merge_coc(cod: dict, ov: dict) -> dict:
    """COD defaults + a COC override (A.6.2: COC carries only the
    per-component SPcod tail — levels, code-block geometry, style,
    transform; progression/layers/MCT/SOP/EPH stay with COD)."""
    out = dict(cod)
    for k in ("levels", "xcb", "ycb", "transform", "segsym",
              "cblk_style"):
        out[k] = ov[k]
    return out


def _decode_tile(siz, cod, qcd, coc, qcc, tdata: bytes,
                 max_pixels: int,
                 org: tuple[int, int] = (0, 0),
                 pph: bytes | None = None
                 ) -> tuple[int, int, np.ndarray]:
    w, h, nc = siz["w"], siz["h"], siz["ncomps"]
    tx0, ty0 = org  # absolute canvas origin: anchors the block grid
    layers = cod["layers"]
    ccod = [(_merge_coc(cod, coc[c]) if c in coc else cod)
            for c in range(nc)]
    cq = [qcc.get(c, qcd) for c in range(nc)]
    for c in range(nc):
        t, qs = ccod[c]["transform"], cq[c]["style"]
        if t == 1 and qs != 0:
            raise JpxError(
                "quantized QCD/QCC style with the reversible 5/3 "
                "transform")
        if t == 0 and qs == 0:
            raise JpxError(
                "no-quantization QCD/QCC style with the irreversible "
                "9/7 transform")
    levels_list = [ccod[c]["levels"] for c in range(nc)]

    # per-component, per-band coefficient arrays + codeblock registry
    bands: dict[tuple[int, int, str], np.ndarray] = {}
    cells: dict[tuple[int, int, str],
                tuple[list[tuple[int, int]], list[tuple[int, int]]]] = {}
    cblks: dict[tuple, dict] = {}
    incl_trees: dict[tuple, _TagTree] = {}
    zbp_trees: dict[tuple, _TagTree] = {}
    for c in range(nc):
        levels = levels_list[c]
        cw, ch = 1 << ccod[c]["xcb"], 1 << ccod[c]["ycb"]
        for r in range(levels + 1):
            for band, lvl in _res_bands(r, levels):
                bw, bh = _band_dims(w, h, lvl, band)
                bands[(c, r, band)] = np.zeros((bh, bw), np.int64)
                xs = _cblk_cells(tx0 >> lvl, bw, cw)
                ys = _cblk_cells(ty0 >> lvl, bh, ch)
                cells[(c, r, band)] = (xs, ys)
                gx, gy = len(xs), len(ys)
                if gx and gy:
                    incl_trees[(c, r, band)] = _TagTree(gx, gy)
                    zbp_trees[(c, r, band)] = _TagTree(gx, gy)
                for cy in range(gy):
                    for cx in range(gx):
                        cblks[(c, r, band, cx, cy)] = {
                            "included": False, "lblock": 3,
                            "npasses": 0, "zbp": 0, "segs": [],
                        }

    pos = 0
    # packed packet headers (r16): one persistent reader walks the
    # PPM/PPT stream — headers (and EPH) live there, while packet
    # BODIES (and SOP) stay in the tile bitstream at `pos`
    pph_hr = _HdrReader(pph, 0) if pph is not None else None

    def end_header(hr) -> None:
        nonlocal pos
        if pph_hr is None:
            pos = hr.align()
            if cod["eph"]:
                if tdata[pos:pos + 2] != b"\xff\x92":
                    raise JpxError("missing EPH after packet header")
                pos += 2
        else:
            hend = hr.align()
            if cod["eph"]:
                if pph[hend:hend + 2] != b"\xff\x92":
                    raise JpxError(
                        "missing EPH in the packed header stream")
                hr.pos += 2
            hr.last = 0  # headers are independent byte-aligned units

    for layer, r, c in _packet_order(cod["progression"], layers,
                                     levels_list):
        levels = levels_list[c]
        cw, ch = 1 << ccod[c]["xcb"], 1 << ccod[c]["ycb"]
        if cod["sop"]:
            if tdata[pos:pos + 2] == b"\xff\x91":
                pos += 6  # SOP marker segment (fixed length 4 + 2)
        hr = pph_hr if pph_hr is not None else _HdrReader(tdata, pos)
        contribs = []
        if not hr.bit():  # empty packet
            end_header(hr)
            continue
        for band, lvl in _res_bands(r, levels):
            xs, ys = cells[(c, r, band)]
            gx, gy = len(xs), len(ys)
            for cy in range(gy):
                for cx in range(gx):
                    cb = cblks[(c, r, band, cx, cy)]
                    if not cb["included"]:
                        inc = incl_trees[(c, r, band)].decode(
                            hr, cx, cy, layer + 1)
                    else:
                        inc = bool(hr.bit())
                    if not inc:
                        continue
                    first = not cb["included"]
                    if first:
                        cb["zbp"] = zbp_trees[(c, r, band)].value(
                            hr, cx, cy)
                        cb["included"] = True
                    npasses = _read_npasses(hr)
                    while hr.bit():
                        cb["lblock"] += 1
                    # B.10.7.2: a contribution spanning several
                    # terminated codeword segments signals one length
                    # per segment, each with lblock + floor(log2(that
                    # segment's new passes)) bits; the split follows
                    # the same 10/2/1 structure the encoder's
                    # termination rules produce
                    sty = ccod[c]["cblk_style"]
                    chunks = []
                    rem = npasses
                    while rem > 0:
                        if not cb["segs"] or cb["segs"][-1]["passes"] \
                                >= cb["segs"][-1]["maxp"]:
                            prev = (cb["segs"][-1]["maxp"]
                                    if cb["segs"] else None)
                            cb["segs"].append(
                                {"maxp": _seg_maxpasses(sty, prev),
                                 "passes": 0, "data": bytearray()})
                        seg = cb["segs"][-1]
                        take = min(seg["maxp"] - seg["passes"], rem)
                        nbits = cb["lblock"] + int(math.log2(take))
                        chunks.append((len(cb["segs"]) - 1, take,
                                       hr.bits(nbits)))
                        seg["passes"] += take
                        rem -= take
                    contribs.append((band, lvl, cx, cy, chunks))
        end_header(hr)
        for band, lvl, cx, cy, chunks in contribs:
            cb = cblks[(c, r, band, cx, cy)]
            for seg_idx, take, seg_len in chunks:
                chunk = tdata[pos:pos + seg_len]
                if len(chunk) != seg_len:
                    raise JpxError("packet body truncated")
                pos += seg_len
                cb["segs"][seg_idx]["data"] += chunk
                cb["npasses"] += take

    # Tier-1 decode every included codeblock and scatter into bands
    for (c, r, band, cx, cy), cb in cblks.items():
        if not cb["included"] or cb["npasses"] == 0:
            continue
        xs, ys = cells[(c, r, band)]
        x0, ww = xs[cx]
        y0, hh = ys[cy]
        eps, _mu = _qparams(cq[c], r, band)
        mb = cq[c]["guard"] + eps - 1
        numbps = mb - cb["zbp"]
        if numbps < 0:
            raise JpxError("zero-bitplane count exceeds Mb")
        if numbps == 0:
            continue
        sty = ccod[c]["cblk_style"] | (
            _STY_SEGSYM if ccod[c]["segsym"] else 0)
        coefs = _t1_decode(
            [(bytes(s["data"]), s["passes"]) for s in cb["segs"]],
            hh, ww, band, numbps, sty)
        bands[(c, r, band)][y0:y0 + hh, x0:x0 + ww] = coefs

    # inverse DWT per component: integer 5/3 for transform 1,
    # dequantize (E.1.1.2, midpoint r=0.5) + float 9/7 for transform 0
    comps_out = []
    for c in range(nc):
        levels = levels_list[c]
        depth = siz["comps"][c]["depth"]
        if ccod[c]["transform"] == 1:
            cur = bands[(c, 0, "LL")]
            for r in range(1, levels + 1):
                cur = _idwt53_2d(cur, bands[(c, r, "HL")],
                                 bands[(c, r, "LH")],
                                 bands[(c, r, "HH")])
        else:
            def deq(r: int, band: str) -> np.ndarray:
                eps, mu = _qparams(cq[c], r, band)
                delta = (2.0 ** (depth + _BAND_GAIN[band] - eps)
                         * (1.0 + mu / 2048.0))
                q = bands[(c, r, band)]
                return np.where(
                    q == 0, 0.0,
                    np.sign(q) * (np.abs(q) + 0.5) * delta)
            cur = deq(0, "LL")
            for r in range(1, levels + 1):
                cur = _idwt97_2d(cur, deq(r, "HL"), deq(r, "LH"),
                                 deq(r, "HH"))
        comps_out.append(cur[:h, :w])

    if cod.get("mct") and nc >= 3:
        tset = {ccod[c]["transform"] for c in range(3)}
        if len(tset) != 1:
            raise NotImplementedError(
                "JPX MCT over components with mixed COC wavelet "
                "transforms not supported")
        if tset == {1}:  # inverse RCT (reversible)
            y0, cb_, cr_ = comps_out[0], comps_out[1], comps_out[2]
            g = y0 - ((cb_ + cr_) >> 2)
            comps_out[0] = cr_ + g
            comps_out[1] = g
            comps_out[2] = cb_ + g
        else:  # inverse ICT (irreversible)
            comps_out[0], comps_out[1], comps_out[2] = _ict_inverse(
                comps_out[0], comps_out[1], comps_out[2])

    planes = []
    depth = siz["comps"][0]["depth"]
    dtype = np.uint8 if depth <= 8 else np.uint16
    for c in range(nc):
        info = siz["comps"][c]
        vals = comps_out[c]
        if vals.dtype != np.int64:
            vals = np.rint(vals).astype(np.int64)
        if not info["signed"]:
            vals = vals + (1 << (info["depth"] - 1))
        planes.append(np.clip(vals, 0, (1 << info["depth"]) - 1))
    px = np.stack(planes, axis=-1).astype(dtype)
    return w, h, px


# ------------------------------------------------------ encoder mirror

def _enc_qpairs(qstyle: int, depth: int, levels: int) -> list:
    """Fixture-mirror quantization signalling: style 0 = reversible
    ranging exponents (R_b), style 1 = derived from (depth, 0), style
    2 = expounded with eps_b = R_b, mu = 0 (step size 1.0)."""
    if qstyle == 1:
        return [(depth, 0)]
    pairs = []
    for r in range(levels + 1):
        for band, _ in _res_bands(r, levels):
            pairs.append((depth + _BAND_GAIN[band], 0))
    return pairs


def _qcx_body(qstyle: int, guard: int, pairs: list) -> bytes:
    body = bytes([(guard << 5) | qstyle])
    if qstyle == 0:
        return body + bytes((e << 3) for e, _ in pairs)
    return body + b"".join(struct.pack(">H", (e << 11) | m)
                           for e, m in pairs)


def encode_jpx(px: np.ndarray, levels: int = 2, mct: bool = False,
               progression: int = 0, cblk_exp: tuple[int, int] = (6, 6),
               sop: bool = False, eph: bool = False,
               segsym: bool = False, jp2: bool = False,
               transform: int = 1, qstyle: int | None = None,
               layers: int = 1, coc: dict | None = None,
               qcc: dict | None = None,
               tile: tuple[int, int] | None = None,
               tile_parts: int = 1,
               cblk_style: int = 0,
               ppt: bool = False, ppm: bool = False) -> bytes:
    """Image -> Part-1 codestream (fixture mirror): one tile, 5/3
    reversible (``transform=1``, lossless) or 9/7 irreversible
    (``transform=0`` with quantization style 1 derived / 2 expounded,
    near-lossless step sizes). ``layers`` > 1 spreads code-blocks
    across quality layers ((cx+cy) mod layers picks each block's
    layer; every block's passes travel whole in its layer), which
    exercises the decoder's incremental inclusion tag trees on the
    spec packet order. ``coc``/``qcc`` emit per-component COC/QCC
    overrides: ``coc={c: {"levels": int, "cblk_exp": (a, b)}}``,
    ``qcc={c: qstyle}``. ``tile=(xt, yt)`` writes a MULTI-TILE
    codestream (raster-order SOT segments; sizes must be multiples of
    2^levels so per-tile anchoring matches the decoder's supported
    grid); ``tile_parts`` > 1 splits each tile's data into that many
    SOT tile-parts at byte boundaries (the decoder joins by TPsot).
    ``jp2=True`` wraps the codestream in the JP2 box
    signature/ftyp/jp2h/jp2c layout. ``cblk_style`` ORs the T.800
    A.6.1 coding-style flags (0x01 bypass, 0x02 reset, 0x04 termall,
    0x08 vertically causal, 0x10 predictable termination — accepted
    but termination padding is the standard flush). ``ppt`` moves
    every packet header (and EPH) into PPT tile-part-header
    segments; ``ppm`` into main-header PPM segments with per-
    tile-part Nppm chunks — packet bodies (and SOP) stay in the
    bitstream (B.7/B.8)."""
    px = np.asarray(px)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    depth = 8 if px.dtype == np.uint8 else 16
    if transform not in (0, 1):
        raise JpxError("transform must be 0 (9/7) or 1 (5/3)")
    if cblk_style & ~0x1F:
        raise JpxError("cblk_style accepts only the low five "
                       "A.6.1 flags (segsym has its own parameter)")
    if ppt and ppm:
        raise JpxError("ppt and ppm are mutually exclusive")
    t1_style = cblk_style | (_STY_SEGSYM if segsym else 0)
    if qstyle is None:
        qstyle = 0 if transform == 1 else 2
    if (qstyle == 0) != (transform == 1):
        raise JpxError("qstyle 0 pairs with 5/3, styles 1/2 with 9/7")
    coc = coc or {}
    qcc = qcc or {}

    cw_exp, ch_exp = cblk_exp
    guard = 2
    levels_list = [coc.get(c, {}).get("levels", levels)
                   for c in range(nc)]
    cblk_list = [coc.get(c, {}).get("cblk_exp", (cw_exp, ch_exp))
                 for c in range(nc)]
    qstyle_list = [qcc.get(c, qstyle) for c in range(nc)]
    qpairs_list = [_enc_qpairs(qstyle_list[c], depth, levels_list[c])
                   for c in range(nc)]

    def tile_body(pxt: np.ndarray,
                  org: tuple[int, int] = (0, 0)) -> bytes:
        h, w = pxt.shape[0], pxt.shape[1]
        if transform == 1:
            comps = [pxt[:, :, c].astype(np.int64) - (1 << (depth - 1))
                     for c in range(nc)]
            if mct:
                if nc < 3:
                    raise JpxError("RCT needs 3 components")
                r_, g_, b_ = comps[0], comps[1], comps[2]
                yy = (r_ + 2 * g_ + b_) >> 2
                comps[0], comps[1], comps[2] = yy, b_ - g_, r_ - g_
        else:
            comps = [pxt[:, :, c].astype(np.float64) - (1 << (depth - 1))
                     for c in range(nc)]
            if mct:
                if nc < 3:
                    raise JpxError("ICT needs 3 components")
                comps[0], comps[1], comps[2] = _ict_forward(
                    comps[0], comps[1], comps[2])

        # forward DWT (+ quantization on the irreversible path)
        bands: dict[tuple[int, int, str], np.ndarray] = {}
        for c in range(nc):
            lv = levels_list[c]
            cur = comps[c]
            raw: dict[tuple[int, str], np.ndarray] = {}
            for r in range(lv, 0, -1):
                if transform == 1:
                    ll, hl, lh, hh = _fdwt53_2d(cur)
                else:
                    ll, hl, lh, hh = _fdwt97_2d(cur)
                raw[(r, "HL")], raw[(r, "LH")], raw[(r, "HH")] = hl, lh, hh
                cur = ll
            raw[(0, "LL")] = cur
            q = {"style": qstyle_list[c], "guard": guard,
                 "pairs": qpairs_list[c]}
            for (r, band), arr in raw.items():
                if transform == 1:
                    bands[(c, r, band)] = arr
                else:
                    eps, mu = _qparams(q, r, band)
                    delta = (2.0 ** (depth + _BAND_GAIN[band] - eps)
                             * (1.0 + mu / 2048.0))
                    bands[(c, r, band)] = (
                        np.sign(arr)
                        * np.floor(np.abs(arr) / delta)).astype(np.int64)

        # absolute-anchored block grid per band (mirrors the decoder:
        # T.800 B.7 anchors the partition at band origin 0, so an
        # interior tile's first cell can be partial)
        cells: dict[tuple, tuple[list, list]] = {}
        for (c, r, band), arr in bands.items():
            cw, ch = 1 << cblk_list[c][0], 1 << cblk_list[c][1]
            lvl = levels_list[c] if r == 0 else levels_list[c] - r + 1
            bh, bw = arr.shape
            cells[(c, r, band)] = (_cblk_cells(org[0] >> lvl, bw, cw),
                                   _cblk_cells(org[1] >> lvl, bh, ch))

        # Tier-1 encode every codeblock
        enc_blocks: dict[tuple, tuple[bytes, int, int]] = {}
        for (c, r, band), arr in bands.items():
            xs, ys = cells[(c, r, band)]
            q = {"style": qstyle_list[c], "guard": guard,
                 "pairs": qpairs_list[c]}
            eps, _mu = _qparams(q, r, band)
            mb = guard + eps - 1
            for cy, (y0, hh) in enumerate(ys):
                for cx, (x0, ww) in enumerate(xs):
                    blk = arr[y0:y0 + hh, x0:x0 + ww]
                    seg_list, numbps = _t1_encode(blk, band, t1_style)
                    if numbps > mb:
                        raise JpxError("coefficient exceeds Mb range")
                    enc_blocks[(c, r, band, cx, cy)] = (seg_list,
                                                        numbps)

        # persistent per-band tag trees + node values (multi-layer safe)
        incl_trees: dict[tuple, _TagTree] = {}
        zbp_trees: dict[tuple, _TagTree] = {}
        incl_vals: dict[tuple, dict] = {}
        zbp_vals: dict[tuple, dict] = {}
        zbp_grids: dict[tuple, np.ndarray] = {}
        for (c, r, band), arr in bands.items():
            xs, ys = cells[(c, r, band)]
            gx, gy = len(xs), len(ys)
            if not (gx and gy):
                continue
            q = {"style": qstyle_list[c], "guard": guard,
                 "pairs": qpairs_list[c]}
            eps, _mu = _qparams(q, r, band)
            mb = guard + eps - 1
            numbps_grid = np.zeros((gy, gx), np.int64)
            layer_grid = np.zeros((gy, gx), np.int64)
            for cy in range(gy):
                for cx in range(gx):
                    numbps_grid[cy, cx] = enc_blocks[(c, r, band, cx, cy)][1]
                    layer_grid[cy, cx] = (cx + cy) % layers
            zbp_grids[(c, r, band)] = mb - numbps_grid
            incl_trees[(c, r, band)] = _TagTree(gx, gy)
            zbp_trees[(c, r, band)] = _TagTree(gx, gy)
            incl_vals[(c, r, band)] = _TagTree.node_values(layer_grid)
            zbp_vals[(c, r, band)] = _TagTree.node_values(
                zbp_grids[(c, r, band)])

        # packets
        body = bytearray()
        pph_acc = bytearray() if (ppt or ppm) else None
        done: set[tuple] = set()
        nsop = 0
        for layer, r, c in _packet_order(progression, layers, levels_list):
            lv = levels_list[c]
            if sop:
                body += struct.pack(">HHH", 0xFF91, 4, nsop & 0xFFFF)
                nsop += 1
            hw = _HdrWriter()
            hw.bit(1)  # non-empty
            payload = bytearray()
            for band, _lvl in _res_bands(r, lv):
                xs, ys = cells[(c, r, band)]
                gx, gy = len(xs), len(ys)
                if not (gx and gy):
                    continue
                incl = incl_trees[(c, r, band)]
                zt = zbp_trees[(c, r, band)]
                ivals = incl_vals[(c, r, band)]
                zvals = zbp_vals[(c, r, band)]
                zgrid = zbp_grids[(c, r, band)]
                for cy in range(gy):
                    for cx in range(gx):
                        key = (c, r, band, cx, cy)
                        if key in done:
                            hw.bit(0)  # included before; nothing new here
                            continue
                        incl.encode(hw, cx, cy, layer + 1, ivals)
                        if (cx + cy) % layers > layer:
                            continue  # first inclusion is a later layer
                        seg_list, numbps = enc_blocks[key]
                        # zero-bitplane tree: encode until leaf resolves
                        t = 1
                        while True:
                            before = zt.done[0][cy, cx]
                            zt.encode(hw, cx, cy, t, zvals)
                            if zt.done[0][cy, cx]:
                                break
                            if before == zt.done[0][cy, cx] \
                                    and t > int(zgrid[cy, cx]) + 2:
                                raise JpxError(
                                    "zbp tag tree failed to resolve")
                            t += 1
                        if not seg_list:  # all-zero block: 1 empty pass
                            seg_list = [(b"", 1)]
                        npasses = sum(np_ for _, np_ in seg_list)
                        _write_npasses(hw, npasses)
                        # lblock: smallest value >= 3 that fits EVERY
                        # segment's length in its own field (B.10.7.2
                        # signals one length per terminated segment,
                        # lblock + floor(log2(segment passes)) bits)
                        lb = 3
                        for d, np_ in seg_list:
                            fl = int(math.log2(np_))
                            lb = max(lb, len(d).bit_length() - fl)
                        for _ in range(lb - 3):
                            hw.bit(1)
                        hw.bit(0)
                        for d, np_ in seg_list:
                            hw.bits(len(d), lb + int(math.log2(np_)))
                            payload += d
                        done.add(key)
            if pph_acc is not None:
                pph_acc += hw.getvalue()
                if eph:
                    pph_acc += b"\xff\x92"
                body += payload
            else:
                body += hw.getvalue()
                if eph:
                    body += b"\xff\x92"
                body += payload
        return bytes(body), (bytes(pph_acc)
                             if pph_acc is not None else None)

    # markers
    xt, yt = tile if tile is not None else (w, h)
    siz = struct.pack(">HH", 0xFF51, 38 + 3 * nc) + struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, xt, yt, 0, 0, nc) \
        + b"".join(bytes([depth - 1, 1, 1]) for _ in range(nc))
    scod = (2 if sop else 0) | (4 if eph else 0)
    style_byte = (0x20 if segsym else 0) | cblk_style
    cod = struct.pack(">HH", 0xFF52, 12) + bytes([
        scod, progression]) + struct.pack(">H", layers) + bytes([
            1 if mct else 0, levels, cw_exp - 2, ch_exp - 2,
            style_byte, transform])
    markers = siz + cod
    for c in sorted(coc):
        spcoc = bytes([levels_list[c], cblk_list[c][0] - 2,
                       cblk_list[c][1] - 2, style_byte,
                       transform])
        cbody = bytes([c, 0]) + spcoc  # Ccoc (nc < 257) + Scoc
        markers += struct.pack(">HH", 0xFF53, 2 + len(cbody)) + cbody
    markers += struct.pack(">HH", 0xFF5C, 2 + len(
        _qcx_body(qstyle, guard, _enc_qpairs(qstyle, depth, levels)))) \
        + _qcx_body(qstyle, guard, _enc_qpairs(qstyle, depth, levels))
    # a COC that changes a component's decomposition count needs its
    # own subband exponent list — emit a QCC alongside explicit ones
    for c in sorted(set(qcc) | {c for c in range(nc)
                                if levels_list[c] != levels}):
        qbody = bytes([c]) + _qcx_body(qstyle_list[c], guard,
                                       qpairs_list[c])
        markers += struct.pack(">HH", 0xFF5D, 2 + len(qbody)) + qbody
    ntx = (w + xt - 1) // xt
    nty = (h + yt - 1) // yt
    tiles = []
    for i in range(ntx * nty):
        tx, ty = i % ntx, i // ntx
        tiles.append(tile_body(
            px[ty * yt:ty * yt + yt, tx * xt:tx * xt + xt],
            org=(tx * xt, ty * yt)))
    if ppm:
        # one Nppm chunk per tile-part, codestream order: the whole
        # tile's headers ride its FIRST part, later parts get
        # zero-length chunks (B.7)
        blob = bytearray()
        for body, tile_pph in tiles:
            n_parts = max(1, min(tile_parts, len(body) or 1))
            blob += struct.pack(">I", len(tile_pph)) + tile_pph
            for _ in range(n_parts - 1):
                blob += struct.pack(">I", 0)
        z = 0
        off = 0
        while True:
            chunk = bytes(blob[off:off + 65532])
            markers += struct.pack(">HH", 0xFF60, 3 + len(chunk)) \
                + bytes([z]) + chunk
            off += len(chunk)
            z += 1
            if off >= len(blob):
                break
    stream = bytearray(b"\xff\x4f" + markers)
    for i, (body, tile_pph) in enumerate(tiles):
        n_parts = max(1, min(tile_parts, len(body) or 1))
        cut = max(1, len(body) // n_parts) if body else 0
        pieces = [body[k * cut:(k + 1) * cut] for k in range(n_parts - 1)]
        pieces.append(body[(n_parts - 1) * cut:])
        for tp, piece in enumerate(pieces):
            ppt_seg = b""
            if ppt and tp == 0:
                z = 0
                off = 0
                while True:
                    chunk = tile_pph[off:off + 65532]
                    ppt_seg += struct.pack(
                        ">HH", 0xFF61, 3 + len(chunk)) \
                        + bytes([z]) + chunk
                    off += len(chunk)
                    z += 1
                    if off >= len(tile_pph):
                        break
            stream += struct.pack(">HHHIBB", 0xFF90, 10, i,
                                  12 + len(ppt_seg) + len(piece) + 2,
                                  tp, n_parts)
            stream += ppt_seg + b"\xff\x93" + piece
    cs = bytes(stream) + b"\xff\xd9"
    if not jp2:
        return cs
    ihdr = struct.pack(">IIHBBBB", h, w, nc, depth - 1, 7, 0, 0)

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    jp2h = box(b"jp2h", box(b"ihdr", ihdr)
               + box(b"colr", bytes([1, 0, 0]) + struct.pack(
                   ">I", 16 if nc >= 3 else 17)))
    return (b"\x00\x00\x00\x0cjP  \r\n\x87\n" + box(b"ftyp",
            b"jp2 \x00\x00\x00\x00jp2 ") + jp2h + box(b"jp2c", cs))
