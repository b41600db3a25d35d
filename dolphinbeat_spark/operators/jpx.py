"""JPEG 2000 (JPX / ISO 15444-1, ITU T.800) decode from scratch —
the REVERSIBLE Part-1 profile PDF's last named image filter needs
(r14): /JPXDecode streams carry either a raw codestream or a JP2 box
wrapper, and the dominant wild encoder output (OpenJPEG-class
archival scans, lossless mode) is exactly this subset.

Covered:
- JP2 signature/ftyp box walk down to the ``jp2c`` codestream box,
  or a bare SOC..EOC codestream;
- main header: SIZ (single tile, no subsampling), COD (progression
  orders LRCP/RLCP/RPCL/PCRL/CPRL with default whole-resolution
  precincts, 1..N quality layers, decomposition levels, code-block
  geometry, optional SOP/EPH markers, segmentation symbols), QCD
  (style 0 "no quantization" — the reversible form), COC/QCC
  per-component overrides, COM/TLM/PLT skipped;
- packet decoding (B.10): inclusion + zero-bitplane TAG TREES, the
  coding-pass count codeword, Lblock length signaling, header bit
  stuffing, SOP/EPH handling;
- Tier-1 (Annex D): the three-pass (significance / refinement /
  cleanup) bitplane coder over 4-row stripes with the full context
  model — orientation-dependent significance contexts, sign
  prediction with XOR bit, magnitude-refinement contexts, cleanup
  run-length mode, optional segmentation symbols. The MQ coder is
  operators/jbig2's (T.88 Annex E == T.800 Annex C, one shared
  published coder, pinned there by the spec's own test vector);
- inverse 5/3 reversible DWT (lifting, symmetric extension, any
  geometry), reversible color transform (RCT), DC level shift.

Named boundaries (fail loud): the 9/7 irreversible path (Qcd style
1/2, COD transformation 0 — lossy wild files), multiple tiles /
tile-parts, component subsampling, POC progression changes, ROI
(RGN), and the bypass/termall/reset/causal code-block styles.

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


class _CblkCoder:
    """Shared Tier-1 state machine: the pass structure and context
    computation are identical for decode and encode; the ``bitio``
    closure hides the MQ direction (decode returns the bit, encode
    consumes the known bit and returns it)."""

    def __init__(self, h: int, w: int, band: str, segsym: bool):
        self.h, self.w, self.band = h, w, band
        self.segsym = segsym
        self.sig = np.zeros((h + 2, w + 2), np.int8)   # 1-padded
        self.sgn = np.zeros((h + 2, w + 2), np.int8)   # -1/+1
        self.visited = np.zeros((h, w), bool)
        self.refined = np.zeros((h, w), bool)
        self.mag = np.zeros((h, w), np.int64)
        self.icx, self.mps = _fresh_ctx()

    def _nbrs(self, y: int, x: int) -> tuple[int, int, int]:
        s = self.sig
        yy, xx = y + 1, x + 1
        hh = int(s[yy, xx - 1]) + int(s[yy, xx + 1])
        vv = int(s[yy - 1, xx]) + int(s[yy + 1, xx])
        dd = (int(s[yy - 1, xx - 1]) + int(s[yy - 1, xx + 1])
              + int(s[yy + 1, xx - 1]) + int(s[yy + 1, xx + 1]))
        return hh, vv, dd

    def _sign_ctx(self, y: int, x: int) -> tuple[int, int]:
        s, g = self.sig, self.sgn
        yy, xx = y + 1, x + 1
        hc = max(-1, min(1, int(s[yy, xx - 1]) * int(g[yy, xx - 1])
                         + int(s[yy, xx + 1]) * int(g[yy, xx + 1])))
        vc = max(-1, min(1, int(s[yy - 1, xx]) * int(g[yy - 1, xx])
                         + int(s[yy + 1, xx]) * int(g[yy + 1, xx])))
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


def _t1_decode(data: bytes, h: int, w: int, band: str, numbps: int,
               npasses: int, segsym: bool) -> np.ndarray:
    """Code-block bytes -> signed coefficients."""
    cb = _CblkCoder(h, w, band, segsym)
    dec = MQDecoder(data)

    def bitio(ctx, kind, y, x, plane):
        return dec.decode(cb.icx, cb.mps, ctx)

    plane = numbps - 1
    p = 0
    first = True
    while p < npasses and plane >= 0:
        if first:
            cb.cleanup(bitio, plane)
            p += 1
            first = False
            plane -= 1
            continue
        cb.spp(bitio, plane)
        p += 1
        if p >= npasses:
            break
        cb.mrp(bitio, plane)
        p += 1
        if p >= npasses:
            break
        cb.cleanup(bitio, plane)
        p += 1
        plane -= 1
    out = cb.mag * np.where(cb.sgn[1:-1, 1:-1] < 0, -1, 1)
    return out


def _t1_encode(coefs: np.ndarray, band: str,
               segsym: bool) -> tuple[bytes, int, int]:
    """Signed coefficients -> (bytes, numbps, npasses). All passes of
    every nonzero bitplane are emitted (single quality layer)."""
    h, w = coefs.shape
    mag_true = np.abs(coefs).astype(np.int64)
    sign_true = (coefs < 0).astype(np.int8)
    numbps = int(mag_true.max()).bit_length()
    if numbps == 0:
        return b"", 0, 0
    cb = _CblkCoder(h, w, band, segsym)
    enc = MQEncoder()

    def bitio(ctx, kind, y, x, plane):
        if kind == "sig":
            b = (mag_true[y, x] >> plane) & 1
        elif kind == "sign":
            # the encoder must emit sign ^ xorbit
            sc, xb = cb._sign_ctx(y, x)
            b = int(sign_true[y, x]) ^ xb
        elif kind == "ref":
            b = (mag_true[y, x] >> plane) & 1
        elif kind == "rl":
            b = 0
            for yy in range(y, y + 4):
                if (mag_true[yy, x] >> plane) & 1:
                    b = 1
                    break
        elif kind == "uni":
            b = bitio.uni_queue.pop(0)
        else:  # seg
            b = bitio.seg_queue.pop(0)
        enc.encode(cb.icx, cb.mps, ctx, b)
        return b

    bitio.uni_queue = []
    bitio.seg_queue = []

    # wrap run-length: when rl fires 1 we must queue the 2 uniform
    # bits for the first significant row
    orig_bitio = bitio

    def bitio2(ctx, kind, y, x, plane):
        if kind == "rl":
            b = orig_bitio(ctx, kind, y, x, plane)
            if b:
                for yy in range(y, y + 4):
                    if (mag_true[yy, x] >> plane) & 1:
                        idx = yy - y
                        orig_bitio.uni_queue.extend(
                            [(idx >> 1) & 1, idx & 1])
                        break
            return b
        if kind == "seg":
            if not orig_bitio.seg_queue:
                orig_bitio.seg_queue.extend([1, 0, 1, 0])
            return orig_bitio(ctx, kind, y, x, plane)
        return orig_bitio(ctx, kind, y, x, plane)

    plane = numbps - 1
    npasses = 0
    first = True
    while plane >= 0:
        if first:
            cb.cleanup(bitio2, plane)
            npasses += 1
            first = False
        else:
            cb.spp(bitio2, plane)
            cb.mrp(bitio2, plane)
            cb.cleanup(bitio2, plane)
            npasses += 3
        plane -= 1
    return enc.flush(), numbps, npasses


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


def _packet_order(progression: int, layers: int, levels: int,
                  ncomps: int):
    """(layer, resolution, component) triples in progression order —
    one precinct per (r, c), so the precinct loop is implicit."""
    if progression == 0:  # LRCP
        for layer in range(layers):
            for r in range(levels + 1):
                for c in range(ncomps):
                    yield layer, r, c
    elif progression == 1:  # RLCP
        for r in range(levels + 1):
            for layer in range(layers):
                for c in range(ncomps):
                    yield layer, r, c
    elif progression == 2:  # RPCL
        for r in range(levels + 1):
            for layer in range(layers):
                for c in range(ncomps):
                    yield layer, r, c
    elif progression == 3:  # PCRL (single precinct/position)
        for layer in range(layers):
            for c in range(ncomps):
                for r in range(levels + 1):
                    yield layer, r, c
    elif progression == 4:  # CPRL
        for c in range(ncomps):
            for layer in range(layers):
                for r in range(levels + 1):
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
    """JPX/JP2/raw-codestream bytes -> (w, h, HxWxC uint8/uint16)."""
    cs = _find_codestream(data)
    if cs[:4] != b"\xff\x4f\xff\x51":
        raise JpxError("codestream does not open with SOC+SIZ")
    pos = 2
    siz = cod = qcd = None
    tile_data = None
    coc: dict[int, dict] = {}
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
            c = body[0] if siz and siz["ncomps"] < 257 else body[0]
            coc[c] = _parse_cod(body[1:], is_coc=True)
        elif marker == 0xFF5C:
            qcd = _parse_qcd(body)
        elif marker == 0xFF5D:
            pass  # QCC: per-component quantization — reversible path
            # reads only guard bits/exponents from QCD; tolerated
        elif marker in (0xFF60, 0xFF61):
            raise NotImplementedError(
                "JPX packed packet headers (PPM/PPT) not supported")
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
            tpsot, tnsot = body[6], body[7]
            if isot != 0 or tpsot != 0 or tnsot not in (0, 1):
                raise NotImplementedError(
                    "JPX multiple tiles / tile-parts not supported")
            sod_at = pos + 2 + ln
            if cs[sod_at:sod_at + 2] != b"\xff\x93":
                raise JpxError("SOT not followed by SOD")
            end = pos + psot if psot else len(cs) - 2
            tile_data = cs[sod_at + 2:end]
            pos = end
            continue
        elif marker == 0xFFD9:
            break
        pos += 2 + ln
    if siz is None or cod is None or qcd is None or tile_data is None:
        raise JpxError("codestream missing SIZ/COD/QCD/tile data")
    return _decode_tile(siz, cod, qcd, tile_data, max_pixels)


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
    if xt < xs or yt < ys:
        raise NotImplementedError("JPX multiple tiles not supported")
    w, h = xs, ys
    if w * h * max(nc, 1) > max_pixels:
        raise JpxError(f"JPX geometry {w}x{h}x{nc} exceeds the cap")
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
    return {"w": w, "h": h, "ncomps": nc, "comps": comps}


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
    if style & 0b11111:
        raise NotImplementedError(
            f"JPX code-block style {style:#04x} (bypass/reset/"
            "termall/causal/predictable) not supported")
    out["segsym"] = bool(style & 0x20)
    if out["transform"] != 1:
        raise NotImplementedError(
            "JPX irreversible 9/7 wavelet not supported — the "
            "reversible 5/3 Part-1 path is")
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
    sqcd = b[0]
    style = sqcd & 0x1F
    guard = sqcd >> 5
    if style != 0:
        raise NotImplementedError(
            "JPX quantized (irreversible) QCD styles not supported — "
            "reversible style 0 is")
    exps = [v >> 3 for v in b[1:]]
    return {"guard": guard, "exps": exps}


def _decode_tile(siz, cod, qcd, tdata: bytes,
                 max_pixels: int) -> tuple[int, int, np.ndarray]:
    w, h, nc = siz["w"], siz["h"], siz["ncomps"]
    levels = cod["levels"]
    layers = cod["layers"]
    cw, ch = 1 << cod["xcb"], 1 << cod["ycb"]
    segsym = cod["segsym"]
    guard = qcd["guard"]
    exps = qcd["exps"]

    # per-component, per-band coefficient arrays + codeblock registry
    bands: dict[tuple[int, int, str], np.ndarray] = {}
    cblks: dict[tuple, dict] = {}
    incl_trees: dict[tuple, _TagTree] = {}
    zbp_trees: dict[tuple, _TagTree] = {}
    for c in range(nc):
        for r in range(levels + 1):
            for band, lvl in _res_bands(r, levels):
                bw, bh = _band_dims(w, h, lvl, band)
                bands[(c, r, band)] = np.zeros((bh, bw), np.int64)
                gx, gy = _cblk_grid(bw, bh, cw, ch)
                if gx and gy:
                    incl_trees[(c, r, band)] = _TagTree(gx, gy)
                    zbp_trees[(c, r, band)] = _TagTree(gx, gy)
                for cy in range(gy):
                    for cx in range(gx):
                        cblks[(c, r, band, cx, cy)] = {
                            "included": False, "lblock": 3,
                            "npasses": 0, "zbp": 0, "segments": [],
                        }

    # band index -> QCD exponent position (B.12.3: LL, then per
    # resolution HL, LH, HH)
    def band_exp(r: int, band: str) -> int:
        if r == 0:
            idx = 0
        else:
            idx = 1 + 3 * (r - 1) + ("HL", "LH", "HH").index(band)
        return exps[idx] if idx < len(exps) else exps[-1] if exps else 8

    pos = 0
    for layer, r, c in _packet_order(cod["progression"], layers,
                                     levels, nc):
        if cod["sop"]:
            if tdata[pos:pos + 2] == b"\xff\x91":
                pos += 6  # SOP marker segment (fixed length 4 + 2)
        hr = _HdrReader(tdata, pos)
        contribs = []
        if not hr.bit():  # empty packet
            pos = hr.align()
            if cod["eph"]:
                if tdata[pos:pos + 2] != b"\xff\x92":
                    raise JpxError("missing EPH after packet header")
                pos += 2
            continue
        for band, lvl in _res_bands(r, levels):
            bw, bh = _band_dims(w, h, lvl, band)
            gx, gy = _cblk_grid(bw, bh, cw, ch)
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
                    nbits = cb["lblock"] + int(math.log2(npasses))
                    seg_len = hr.bits(nbits)
                    contribs.append((band, lvl, cx, cy, npasses,
                                     seg_len))
        pos = hr.align()
        if cod["eph"]:
            if tdata[pos:pos + 2] != b"\xff\x92":
                raise JpxError("missing EPH after packet header")
            pos += 2
        for band, lvl, cx, cy, npasses, seg_len in contribs:
            cb = cblks[(c, r, band, cx, cy)]
            seg = tdata[pos:pos + seg_len]
            if len(seg) != seg_len:
                raise JpxError("packet body truncated")
            pos += seg_len
            cb["segments"].append(seg)
            cb["npasses"] += npasses

    # Tier-1 decode every included codeblock and scatter into bands
    for (c, r, band, cx, cy), cb in cblks.items():
        if not cb["included"] or cb["npasses"] == 0:
            continue
        _, lvl = next((bn, lv) for bn, lv in _res_bands(r, levels)
                      if bn == band)
        bw, bh = _band_dims(w, h, lvl, band)
        x0, y0 = cx * cw, cy * ch
        ww = min(cw, bw - x0)
        hh = min(ch, bh - y0)
        mb = guard + band_exp(r, band) - 1
        numbps = mb - cb["zbp"]
        if numbps < 0:
            raise JpxError("zero-bitplane count exceeds Mb")
        if numbps == 0:
            continue
        coefs = _t1_decode(b"".join(cb["segments"]), hh, ww, band,
                           numbps, cb["npasses"], segsym)
        bands[(c, r, band)][y0:y0 + hh, x0:x0 + ww] = coefs

    # inverse DWT per component
    comps_out = []
    for c in range(nc):
        cur = bands[(c, 0, "LL")]
        for r in range(1, levels + 1):
            cur = _idwt53_2d(cur, bands[(c, r, "HL")],
                             bands[(c, r, "LH")], bands[(c, r, "HH")])
        comps_out.append(cur[:h, :w])

    if cod.get("mct") and nc >= 3:  # inverse RCT (reversible)
        y0, cb_, cr_ = comps_out[0], comps_out[1], comps_out[2]
        g = y0 - ((cb_ + cr_) >> 2)
        comps_out[0] = cr_ + g
        comps_out[1] = g
        comps_out[2] = cb_ + g

    planes = []
    depth = siz["comps"][0]["depth"]
    dtype = np.uint8 if depth <= 8 else np.uint16
    for c in range(nc):
        info = siz["comps"][c]
        vals = comps_out[c]
        if not info["signed"]:
            vals = vals + (1 << (info["depth"] - 1))
        planes.append(np.clip(vals, 0, (1 << info["depth"]) - 1))
    px = np.stack(planes, axis=-1).astype(dtype)
    return w, h, px


# ------------------------------------------------------ encoder mirror

def encode_jpx(px: np.ndarray, levels: int = 2, mct: bool = False,
               progression: int = 0, cblk_exp: tuple[int, int] = (6, 6),
               sop: bool = False, eph: bool = False,
               segsym: bool = False, jp2: bool = False) -> bytes:
    """Image -> reversible Part-1 codestream (fixture mirror): one
    tile, one quality layer, 5/3 transform, all coding passes
    included. ``jp2=True`` wraps the codestream in the JP2 box
    signature/ftyp/jp2h/jp2c layout."""
    px = np.asarray(px)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    depth = 8 if px.dtype == np.uint8 else 16
    comps = [px[:, :, c].astype(np.int64) - (1 << (depth - 1))
             for c in range(nc)]
    if mct:
        if nc < 3:
            raise JpxError("RCT needs 3 components")
        r_, g_, b_ = comps[0], comps[1], comps[2]
        yy = (r_ + 2 * g_ + b_) >> 2
        comps[0], comps[1], comps[2] = yy, b_ - g_, r_ - g_

    cw_exp, ch_exp = cblk_exp
    cw, ch = 1 << cw_exp, 1 << ch_exp
    guard = 2

    # forward DWT
    bands: dict[tuple[int, int, str], np.ndarray] = {}
    for c in range(nc):
        cur = comps[c]
        for r in range(levels, 0, -1):
            ll, hl, lh, hh = _fdwt53_2d(cur)
            bands[(c, r, "HL")] = hl
            bands[(c, r, "LH")] = lh
            bands[(c, r, "HH")] = hh
            cur = ll
        bands[(c, 0, "LL")] = cur

    def band_exp(r: int, band: str) -> int:
        # nominal range: depth + analysis gain (T.800 E.1.1)
        gain = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}[band]
        return depth + gain

    # Tier-1 encode every codeblock
    enc_blocks: dict[tuple, tuple[bytes, int, int]] = {}
    for (c, r, band), arr in bands.items():
        bh, bw = arr.shape
        gx, gy = _cblk_grid(bw, bh, cw, ch)
        mb = guard + band_exp(r, band) - 1
        for cy in range(gy):
            for cx in range(gx):
                blk = arr[cy * ch:(cy + 1) * ch, cx * cw:(cx + 1) * cw]
                data, numbps, npasses = _t1_encode(blk, band, segsym)
                if numbps > mb:
                    raise JpxError("coefficient exceeds Mb range")
                enc_blocks[(c, r, band, cx, cy)] = (data, numbps,
                                                    npasses)

    # packets: single layer
    body = bytearray()
    for layer, r, c in _packet_order(progression, 1, levels, nc):
        if sop:
            body += struct.pack(">HHH", 0xFF91, 4, 0)
        hw = _HdrWriter()
        hw.bit(1)  # non-empty
        payload = bytearray()
        for band, lvl in _res_bands(r, levels):
            arr = bands[(c, r, band)]
            bh, bw = arr.shape
            gx, gy = _cblk_grid(bw, bh, cw, ch)
            if not (gx and gy):
                continue
            mb = guard + band_exp(r, band) - 1
            numbps_grid = np.zeros((gy, gx), np.int64)
            for cy in range(gy):
                for cx in range(gx):
                    numbps_grid[cy, cx] = enc_blocks[
                        (c, r, band, cx, cy)][1]
            zbp_grid = mb - numbps_grid
            incl = _TagTree(gx, gy)
            zbp = _TagTree(gx, gy)
            incl_vals = _TagTree.node_values(
                np.zeros((gy, gx), np.int64))  # all in layer 0
            zbp_vals = _TagTree.node_values(zbp_grid)
            for cy in range(gy):
                for cx in range(gx):
                    data, numbps, npasses = enc_blocks[
                        (c, r, band, cx, cy)]
                    incl.encode(hw, cx, cy, 1, incl_vals)
                    zt = zbp
                    # zero-bitplane tree: encode until leaf resolves
                    t = 1
                    while True:
                        before = zt.done[0][cy, cx]
                        zt.encode(hw, cx, cy, t, zbp_vals)
                        if zt.done[0][cy, cx]:
                            break
                        if before == zt.done[0][cy, cx] \
                                and t > int(zbp_grid[cy, cx]) + 2:
                            raise JpxError(
                                "zbp tag tree failed to resolve")
                        t += 1
                    _write_npasses(hw, max(npasses, 1))
                    # lblock stays 3 unless the segment needs more
                    nbits = 3 + int(math.log2(max(npasses, 1)))
                    if len(data) >= 1 << nbits:
                        extra = (len(data).bit_length()) - nbits
                        for _ in range(extra):
                            hw.bit(1)
                        nbits += extra
                    hw.bit(0)
                    hw.bits(len(data), nbits)
                    payload += data
        body += hw.getvalue()
        if eph:
            body += b"\xff\x92"
        body += payload

    # markers
    siz = struct.pack(">HH", 0xFF51, 38 + 3 * nc) + struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, nc) \
        + b"".join(bytes([depth - 1, 1, 1]) for _ in range(nc))
    scod = (2 if sop else 0) | (4 if eph else 0)
    cod = struct.pack(">HH", 0xFF52, 12) + bytes([
        scod, progression]) + struct.pack(">H", 1) + bytes([
            1 if mct else 0, levels, cw_exp - 2, ch_exp - 2,
            0x20 if segsym else 0, 1])
    n_exp = 1 + 3 * levels
    qcd = struct.pack(">HH", 0xFF5C, 3 + n_exp) \
        + bytes([guard << 5])
    exps = []
    for r in range(levels + 1):
        for band, _ in _res_bands(r, levels):
            exps.append(band_exp(r, band) << 3)
    qcd += bytes(exps)
    sot = struct.pack(">HHHIBB", 0xFF90, 10, 0, 12 + len(body) + 2,
                      0, 1)
    cs = (b"\xff\x4f" + siz + cod + qcd + sot + b"\xff\x93"
          + bytes(body) + b"\xff\xd9")
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
