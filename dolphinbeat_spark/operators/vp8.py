"""VP8 lossy still-image decode from scratch — RFC 6386 (the
published VP8 Data Format and Decoding Guide), keyframe/intra subset:
the payload of a WebP ``VP8 `` chunk is exactly one VP8 key frame.

Covered, all per the RFC's reference listings:
- the boolean arithmetic decoder (§7) and encoder (§8);
- keyframe headers: frame tag, start code, scaled dimensions (§9.1),
  segmentation (§9.3), loop-filter setup (§9.4), token partitions
  (§9.5), quantizer indices (§9.6), coefficient-probability updates
  (§9.9, gated by COEFF_UPDATE_PROBS), mb_no_coeff_skip (§9.10);
- per-MB intra modes: keyframe 16x16 tree, B_PRED with the full
  above/left-context KF_BMODE_PROBS table, chroma modes (§11);
- DCT/WHT coefficient tokens: tree decode with band/context
  probabilities, category extra bits, the no-EOB-after-zero rule,
  zigzag, per-plane dequantization (§13, §14.1);
- the exact integer inverse WHT and inverse DCT (§14.3/§14.4);
- intra prediction: 16x16 and chroma DC/V/H/TM with the 127/129
  borders, all ten 4x4 B modes with the above-right edge rules (§12);
- both loop filters (simple and normal) with the per-level limits,
  high-edge-variance logic and macroblock/subblock variants (§15).

The encoder mirror writes real keyframes (restricted: one segment, no
probability updates) — fixtures for the oracle specs. The decoder is
CONFORMANCE-PINNED against the reference library (r12): four
committed libwebp-encoded goldens decode to BIT-EXACT YUV planes
(tests/fixtures/golden/vp8_conformance_pins.json), the big
probability tables are verified byte-for-byte against the reference
library's copies (tools/check_vp8_tables.py — which caught the r11
transcription's one-band shift of the coefficient table and the
libwebp-vs-RFC bmode enum permutation), and
tools/vp8_conformance.py decodes ~200 streams (libwebp-encoded
corpus + own-encoder targeted mode/filter streams) bit-exactly.
Self-referential roundtrips alone proved insufficient: encoder and
decoder shared three mirrored bugs (tables, sub-block mode context,
sub-block filter hev semantics) that only the external differential
exposed.

Interframes (golden/altref reference buffers, motion compensation)
raise by name — and this is NOT a coverage gap for a web image
corpus: the WebP container never carries them. Every ANMF animation
frame's payload is a complete still VP8/VP8L bitstream (WebP
container spec, "Animation" section — inter-frame compression is
achieved by coding only the changed RECTANGLE plus blend/dispose
compositing, which webp_anim_composite implements), and the
reference decoder enforces it: libwebp's VP8 frame-header parser
rejects any non-keyframe with the literal error "Not a key frame."
(visible in the system libwebp.so.7 string table). VP8 interframes
exist only in WebM/video streams, which are out of scope for an
image decode slot (mkv_demux surfaces them as opaque track
payloads).
Output is the coded YUV 4:2:0 (BT.601) sample planes; RGB conversion
policy belongs to the consumer (webp.py upsamples + converts).
"""

from __future__ import annotations

import struct

import numpy as np

from dolphinbeat_spark.operators import vp8_tables as T


class Vp8Error(ValueError):
    """Typed VP8 bitstream error."""


# --- boolean coder (§7 / §8) ----------------------------------------------------


class BoolDec:
    """The RFC 6386 §7.3 boolean decoder (bit_count bookkeeping
    folded into a single bit cursor)."""

    __slots__ = ("data", "value", "range", "bits_avail", "pos")

    def __init__(self, data: bytes):
        if len(data) < 1:
            raise Vp8Error("empty boolean-coder partition")
        self.data = data
        self.value = 0
        self.range = 255
        self.pos = 0
        self.bits_avail = 0
        for _ in range(2):  # value = first two input bytes
            self.value = (self.value << 8) | self._next_byte()

    def _next_byte(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        if self.pos > len(self.data) + 8:
            raise Vp8Error("boolean decoder ran off the partition end")
        return b

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bits_avail += 1
            if self.bits_avail == 8:
                self.bits_avail = 0
                self.value |= self._next_byte()
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def flagged_delta(self, n: int) -> int:
        """flag ? signed n-bit literal : 0 (the header delta idiom)."""
        return self.signed_literal(n) if self.get(128) else 0

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEnc:
    """The RFC 6386 §8.1 boolean encoder (carry-propagating)."""

    __slots__ = ("out", "range", "bottom", "bit_count")

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, boolean: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if boolean:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def tree(self, tree: tuple, probs, value: int, start: int = 0) -> None:
        # walk to the leaf emitting branch bits; tree entries <= 0 are
        # leaves ONLY when stepped into (index 0 is the root node)
        path = []

        def walk(i: int) -> bool:
            for b in (0, 1):
                nxt = tree[i + b]
                path.append((i >> 1, b))
                if nxt <= 0:
                    if -nxt == value:
                        return True
                elif walk(nxt):
                    return True
                path.pop()
            return False

        if not walk(start):
            raise ValueError(f"value {value} not in tree")
        for pi, b in path:
            self.put(b, probs[pi])

    def done(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


# --- dequantization (§14.1) -----------------------------------------------------


def _clamp_q(i: int) -> int:
    return 0 if i < 0 else (127 if i > 127 else i)


def _dequant_factors(qi: int, deltas: dict) -> dict:
    dc = T.DC_QLOOKUP
    ac = T.AC_QLOOKUP
    y2ac = ac[_clamp_q(qi + deltas["y2ac"])] * 155 // 100
    uvdc = dc[_clamp_q(qi + deltas["uvdc"])]
    return {
        "ydc": dc[_clamp_q(qi + deltas["ydc"])],
        "yac": ac[_clamp_q(qi)],
        "y2dc": dc[_clamp_q(qi + deltas["y2dc"])] * 2,
        "y2ac": y2ac if y2ac >= 8 else 8,
        "uvdc": uvdc if uvdc <= 132 else 132,
        "uvac": ac[_clamp_q(qi + deltas["uvac"])],
    }


# --- transforms (§14.3 / §14.4) -------------------------------------------------


def iwht4x4(coeffs: list[int]) -> list[int]:
    """Inverse Walsh-Hadamard for the Y2 block — exact §14.3."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 3]
        b1 = tmp[base + 1] + tmp[base + 2]
        c1 = tmp[base + 1] - tmp[base + 2]
        d1 = tmp[base] - tmp[base + 3]
        out[base] = (a1 + b1 + 3) >> 3
        out[base + 1] = (c1 + d1 + 3) >> 3
        out[base + 2] = (a1 - b1 + 3) >> 3
        out[base + 3] = (d1 - c1 + 3) >> 3
    return out


_COS = 20091  # cospi8sqrt2 - 1 in Q16 (§14.4)
_SIN = 35468  # sinpi8sqrt2 in Q16


def idct4x4(coeffs: list[int]) -> list[int]:
    """Exact integer inverse DCT (§14.4); Python's arithmetic right
    shift matches the reference C behavior for negatives."""
    ip = coeffs
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _SIN) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _COS) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _COS) >> 16)
        t2 = (ip[12 + i] * _SIN) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 2]
        b1 = tmp[base] - tmp[base + 2]
        t1 = (tmp[base + 1] * _SIN) >> 16
        t2 = tmp[base + 3] + ((tmp[base + 3] * _COS) >> 16)
        c1 = t1 - t2
        t1 = tmp[base + 1] + ((tmp[base + 1] * _COS) >> 16)
        t2 = (tmp[base + 3] * _SIN) >> 16
        d1 = t1 + t2
        out[base] = (a1 + d1 + 4) >> 3
        out[base + 3] = (a1 - d1 + 4) >> 3
        out[base + 1] = (b1 + c1 + 4) >> 3
        out[base + 2] = (b1 - c1 + 4) >> 3
    return out


# --- coefficient tokens (§13) ---------------------------------------------------


def _decode_coeffs(bd: BoolDec, probs, block_type: int, first: int,
                   ctx: int, dcf: int, acf: int) -> list[int] | None:
    """One 4x4 block's dequantized coefficients in raster order, or
    None when the block is entirely zero (EOB at the first position).
    ``ctx`` is the above+left nonzero context (0..2)."""
    out = [0] * 16
    i = first
    nonzero = False
    skip_eob = False
    while i < 16:
        band = T.COEFF_BANDS[i]
        p = probs[block_type][band][ctx]
        token = bd.tree(T.COEFF_TREE, p, start=2 if skip_eob else 0)
        if token == T.DCT_EOB:
            break
        if token == T.DCT_0:
            ctx = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        if token <= T.DCT_4:
            v = token - 1  # DCT_1..DCT_4 -> 1..4
        else:
            base = T.CAT_BASE[token]
            extra = 0
            for pb in T.CAT_PROBS[token]:
                extra = (extra << 1) | bd.get(pb)
            v = base + extra
        ctx = 1 if v == 1 else 2
        if bd.get(128):
            v = -v
        out[T.ZIGZAG[i]] = v * (dcf if i == 0 else acf)
        nonzero = True
        i += 1
    return out if nonzero else None


# --- intra prediction (§12) -----------------------------------------------------


def _clamp255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict_block(plane: np.ndarray, x0: int, y0: int, size: int,
                   mode: int, mb_x: int, mb_y: int) -> np.ndarray:
    """DC/V/H/TM prediction for a 16x16 or 8x8 block. ``plane`` is the
    padded reconstruction buffer (1 border row/col at index 0: row 0 =
    127, col 0 = 129, corner 127); x0/y0 are PADDED coordinates of the
    block's top-left pixel."""
    above = plane[y0 - 1, x0:x0 + size].astype(np.int32)
    left = plane[y0:y0 + size, x0 - 1].astype(np.int32)
    if mode == T.DC_PRED:
        have_a = mb_y > 0
        have_l = mb_x > 0
        if not have_a and not have_l:
            val = 128
        else:
            total = 0
            count = 0
            if have_a:
                total += int(above.sum())
                count += size
            if have_l:
                total += int(left.sum())
                count += size
            shift = count.bit_length() - 1
            val = (total + (count >> 1)) >> shift
        return np.full((size, size), val, np.int32)
    if mode == T.V_PRED:
        return np.tile(above, (size, 1))
    if mode == T.H_PRED:
        return np.tile(left.reshape(size, 1), (1, size))
    # TM_PRED
    p = int(plane[y0 - 1, x0 - 1])
    pred = left.reshape(size, 1) + above.reshape(1, size) - p
    return np.clip(pred, 0, 255)


def _predict_b(plane: np.ndarray, x0: int, y0: int, mode: int,
               ar: np.ndarray) -> np.ndarray:
    """One 4x4 subblock prediction. ``ar`` = the 4 above-right pixels
    (already edge-resolved by the caller)."""
    a = plane[y0 - 1, x0:x0 + 4].astype(np.int32)
    la = list(a) + list(ar.astype(np.int32))  # A[0..7]
    le = plane[y0:y0 + 4, x0 - 1].astype(np.int32)
    p = int(plane[y0 - 1, x0 - 1])
    o = np.zeros((4, 4), np.int32)
    A, L = la, list(le)
    if mode == T.B_DC_PRED:
        o[:, :] = (sum(A[:4]) + sum(L) + 4) >> 3
    elif mode == T.B_TM_PRED:
        for r in range(4):
            for c in range(4):
                o[r, c] = _clamp255(L[r] + A[c] - p)
    elif mode == T.B_VE_PRED:
        e = [p] + A[:5]
        row = [(e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2 for i in range(4)]
        o[:, :] = row
    elif mode == T.B_HE_PRED:
        e = [p] + L + [L[3]]
        for r in range(4):
            o[r, :] = (e[r] + 2 * e[r + 1] + e[r + 2] + 2) >> 2
    elif mode == T.B_LD_PRED:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    o[r, c] = (A[i] + 2 * A[i + 1] + A[i + 2] + 2) >> 2
                else:
                    o[r, c] = (A[6] + 3 * A[7] + 2) >> 2
    elif mode == T.B_RD_PRED:
        e = [L[3], L[2], L[1], L[0], p, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                o[r, c] = (e[i - 1] + 2 * e[i] + e[i + 1] + 2) >> 2
    elif mode == T.B_VR_PRED:
        o[3, 0] = (L[2] + 2 * L[1] + L[0] + 2) >> 2
        o[2, 0] = (L[1] + 2 * L[0] + p + 2) >> 2
        o[3, 1] = o[1, 0] = (L[0] + 2 * p + A[0] + 2) >> 2
        o[2, 1] = o[0, 0] = (p + A[0] + 1) >> 1
        o[3, 2] = o[1, 1] = (p + 2 * A[0] + A[1] + 2) >> 2
        o[2, 2] = o[0, 1] = (A[0] + A[1] + 1) >> 1
        o[3, 3] = o[1, 2] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
        o[2, 3] = o[0, 2] = (A[1] + A[2] + 1) >> 1
        o[1, 3] = (A[1] + 2 * A[2] + A[3] + 2) >> 2
        o[0, 3] = (A[2] + A[3] + 1) >> 1
    elif mode == T.B_VL_PRED:
        o[0, 0] = (A[0] + A[1] + 1) >> 1
        o[1, 0] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
        o[2, 0] = o[0, 1] = (A[1] + A[2] + 1) >> 1
        o[1, 1] = o[3, 0] = (A[1] + 2 * A[2] + A[3] + 2) >> 2
        o[2, 1] = o[0, 2] = (A[2] + A[3] + 1) >> 1
        o[3, 1] = o[1, 2] = (A[2] + 2 * A[3] + A[4] + 2) >> 2
        o[2, 2] = o[0, 3] = (A[3] + A[4] + 1) >> 1
        o[3, 2] = o[1, 3] = (A[3] + 2 * A[4] + A[5] + 2) >> 2
        o[2, 3] = (A[4] + 2 * A[5] + A[6] + 2) >> 2
        o[3, 3] = (A[5] + 2 * A[6] + A[7] + 2) >> 2
    elif mode == T.B_HD_PRED:
        o[3, 0] = (L[3] + L[2] + 1) >> 1
        o[3, 1] = (L[3] + 2 * L[2] + L[1] + 2) >> 2
        o[2, 0] = o[3, 2] = (L[2] + L[1] + 1) >> 1
        o[2, 1] = o[3, 3] = (L[2] + 2 * L[1] + L[0] + 2) >> 2
        o[2, 2] = o[1, 0] = (L[1] + L[0] + 1) >> 1
        o[2, 3] = o[1, 1] = (L[1] + 2 * L[0] + p + 2) >> 2
        o[1, 2] = o[0, 0] = (L[0] + p + 1) >> 1
        o[1, 3] = o[0, 1] = (L[0] + 2 * p + A[0] + 2) >> 2
        o[0, 2] = (p + 2 * A[0] + A[1] + 2) >> 2
        o[0, 3] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
    elif mode == T.B_HU_PRED:
        o[0, 0] = (L[0] + L[1] + 1) >> 1
        o[0, 1] = (L[0] + 2 * L[1] + L[2] + 2) >> 2
        o[0, 2] = o[1, 0] = (L[1] + L[2] + 1) >> 1
        o[0, 3] = o[1, 1] = (L[1] + 2 * L[2] + L[3] + 2) >> 2
        o[1, 2] = o[2, 0] = (L[2] + L[3] + 1) >> 1
        o[1, 3] = o[2, 1] = (L[2] + 3 * L[3] + 2) >> 2
        o[2, 2] = o[2, 3] = L[3]
        o[3, :] = L[3]
    else:
        raise Vp8Error(f"unknown B mode {mode}")
    return o


#: 16x16-mode -> implied subblock mode for B_PRED context (§11.3)
_MODE_TO_B = {T.DC_PRED: T.B_DC_PRED, T.V_PRED: T.B_VE_PRED,
              T.H_PRED: T.B_HE_PRED, T.TM_PRED: T.B_TM_PRED}

# --- loop filter (§15) -----------------------------------------------------------


def _c128(v: int) -> int:
    return -128 if v < -128 else (127 if v > 127 else v)


def _u2s(v) -> int:
    return int(v) - 128


def _s2u(v: int) -> int:
    return _clamp255(v + 128)


def _filter_common(pix, offs, pos, stride, use_outer: bool) -> None:
    """common_adjust (§15.2) on the 4 pixels around the edge at
    ``pos`` (p1 p0 | q0 q1 along ``stride``)."""
    p1 = _u2s(pix[pos - 2 * stride])
    p0 = _u2s(pix[pos - stride])
    q0 = _u2s(pix[pos])
    q1 = _u2s(pix[pos + stride])
    a = _c128((_c128(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _c128(a + 4) >> 3
    f2 = _c128(a + 3) >> 3
    pix[pos] = _s2u(q0 - f1)
    pix[pos - stride] = _s2u(p0 + f2)
    if not use_outer:
        a = (f1 + 1) >> 1
        pix[pos + stride] = _s2u(q1 - a)
        pix[pos - 2 * stride] = _s2u(p1 + a)


def _simple_mask(pix, pos, stride, limit: int) -> bool:
    p1 = int(pix[pos - 2 * stride])
    p0 = int(pix[pos - stride])
    q0 = int(pix[pos])
    q1 = int(pix[pos + stride])
    return abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= limit


def _normal_mask(pix, pos, stride, edge: int, interior: int) -> bool:
    vals = [int(pix[pos + k * stride]) for k in range(-4, 4)]
    p3, p2, p1, p0, q0, q1, q2, q3 = vals
    return (abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= edge
            and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
            and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
            and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior)


def _hev(pix, pos, stride, thresh: int) -> bool:
    return (abs(int(pix[pos - 2 * stride]) - int(pix[pos - stride]))
            > thresh
            or abs(int(pix[pos + stride]) - int(pix[pos])) > thresh)


def _mb_filter(pix, pos, stride) -> None:
    """The 6-tap macroblock-edge filter (§15.3), non-hev branch."""
    v = [_u2s(pix[pos + k * stride]) for k in range(-3, 3)]
    p2, p1, p0, q0, q1, q2 = v
    w = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
    a = (27 * w + 63) >> 7
    pix[pos] = _s2u(q0 - a)
    pix[pos - stride] = _s2u(p0 + a)
    a = (18 * w + 63) >> 7
    pix[pos + stride] = _s2u(q1 - a)
    pix[pos - 2 * stride] = _s2u(p1 + a)
    a = (9 * w + 63) >> 7
    pix[pos + 2 * stride] = _s2u(q2 - a)
    pix[pos - 3 * stride] = _s2u(p2 + a)


class _LoopFilter:
    """Per-frame loop-filter driver. Planes are the UNPADDED
    reconstruction arrays (flattened views used for pixel access)."""

    def __init__(self, level: int, sharpness: int, simple: bool,
                 keyframe: bool = True):
        self.simple = simple
        self.level = level
        interior = level
        if sharpness:
            interior >>= 2 if sharpness > 4 else 1
            if interior > 9 - sharpness:
                interior = 9 - sharpness
        if interior < 1:
            interior = 1
        self.interior = interior
        self.hev_thresh = 2 if level >= 40 else (1 if level >= 15 else 0)
        self.mb_edge = (level + 2) * 2 + interior
        self.sub_edge = level * 2 + interior

    def _edge(self, plane, x0, y0, n, dx, dy, stride, mb_edge: bool,
              w, h) -> None:
        """Filter one edge of n pixels starting at (x0, y0), the edge
        normal along ``stride`` (+1 horizontal-neighbour / +w
        vertical-neighbour in the flat view)."""
        flat = plane.reshape(-1)
        limit = self.mb_edge if mb_edge else self.sub_edge
        for k in range(n):
            x = x0 + dx * k
            y = y0 + dy * k
            pos = y * w + x
            if self.simple:
                if _simple_mask(flat, pos, stride, limit):
                    _filter_common(flat, None, pos, stride, True)
                continue
            if not _normal_mask(flat, pos, stride, limit, self.interior):
                continue
            hev = _hev(flat, pos, stride, self.hev_thresh)
            if mb_edge:
                if hev:
                    _filter_common(flat, None, pos, stride, True)
                else:
                    _mb_filter(flat, pos, stride)
            else:
                # §15.2 subblock_filter: common_adjust(use_outer_taps
                # = hev); the outer p1/q1 half-step applies only
                # WITHOUT hev (r12 fix — the args were inverted,
                # caught by the libwebp differential harness)
                _filter_common(flat, None, pos, stride, hev)

    def filter_mb(self, y, u, v, mb_x, mb_y, has_coeffs: bool,
                  is_bpred: bool) -> None:
        if self.level == 0:
            return
        yw, yh = y.shape[1], y.shape[0]
        cw, chh = u.shape[1], u.shape[0]
        x0, y0 = mb_x * 16, mb_y * 16
        cx, cy = mb_x * 8, mb_y * 8
        inner = has_coeffs or is_bpred
        if mb_x > 0:  # left MB edge (vertical edge, stride 1)
            self._edge(y, x0, y0, 16, 0, 1, 1, True, yw, yh)
            if not self.simple:
                self._edge(u, cx, cy, 8, 0, 1, 1, True, cw, chh)
                self._edge(v, cx, cy, 8, 0, 1, 1, True, cw, chh)
        if inner:
            for dx in (4, 8, 12):
                self._edge(y, x0 + dx, y0, 16, 0, 1, 1, False, yw, yh)
            if not self.simple:
                self._edge(u, cx + 4, cy, 8, 0, 1, 1, False, cw, chh)
                self._edge(v, cx + 4, cy, 8, 0, 1, 1, False, cw, chh)
        if mb_y > 0:  # top MB edge (horizontal edge, stride = width)
            self._edge(y, x0, y0, 16, 1, 0, yw, True, yw, yh)
            if not self.simple:
                self._edge(u, cx, cy, 8, 1, 0, cw, True, cw, chh)
                self._edge(v, cx, cy, 8, 1, 0, cw, True, cw, chh)
        if inner:
            for dy in (4, 8, 12):
                self._edge(y, x0, y0 + dy, 16, 1, 0, yw, False, yw, yh)
            if not self.simple:
                self._edge(u, cx, cy + 4, 8, 1, 0, cw, False, cw, chh)
                self._edge(v, cx, cy + 4, 8, 1, 0, cw, False, cw, chh)


# --- frame decode ----------------------------------------------------------------


def decode_vp8(data: bytes) -> tuple[int, int, np.ndarray, np.ndarray,
                                     np.ndarray]:
    """One VP8 KEY frame -> (width, height, Y, U, V) uint8 planes
    (4:2:0). Interframes raise by name."""
    if len(data) < 10:
        raise Vp8Error("VP8 payload shorter than the frame header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "VP8 interframe: the WebP container never carries one "
            "(ANMF animation frames are each a complete keyframe "
            "over the changed rectangle; libwebp likewise rejects "
            "non-keyframes with 'Not a key frame.') — only WebM "
            "video streams code interframes"
        )
    version = (tag >> 1) & 7
    if version > 3:
        raise Vp8Error(f"reserved VP8 version {version}")
    first_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise Vp8Error("VP8 keyframe start code missing")
    (wtag,) = struct.unpack_from("<H", data, 6)
    (htag,) = struct.unpack_from("<H", data, 8)
    width, height = wtag & 0x3FFF, htag & 0x3FFF
    if width == 0 or height == 0:
        raise Vp8Error(f"bad VP8 dimensions {width}x{height}")
    if width * height > (1 << 26):
        raise Vp8Error("VP8 dimensions exceed the decode cap")
    part1 = data[10:10 + first_size]
    if len(part1) != first_size:
        raise Vp8Error("first partition truncated")
    bd = BoolDec(part1)

    bd.literal(1)  # color space (0 = BT.601)
    bd.literal(1)  # clamping type

    # segmentation (§9.3)
    seg_enabled = bd.get(128)
    seg_tree_probs = [255, 255, 255]
    seg_update_map = 0
    seg_abs = 0
    seg_q = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    if seg_enabled:
        seg_update_map = bd.get(128)
        update_data = bd.get(128)
        if update_data:
            seg_abs = bd.get(128)
            for i in range(4):
                seg_q[i] = bd.flagged_delta(7)
            for i in range(4):
                seg_lf[i] = bd.flagged_delta(6)
        if seg_update_map:
            for i in range(3):
                seg_tree_probs[i] = bd.literal(8) if bd.get(128) else 255

    # loop filter (§9.4)
    simple_filter = bd.get(128)
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bd.get(128)
    ref_lf_deltas = [0, 0, 0, 0]
    mode_lf_deltas = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.get(128):  # deltas updated this frame
            for i in range(4):
                ref_lf_deltas[i] = bd.flagged_delta(6)
            for i in range(4):
                mode_lf_deltas[i] = bd.flagged_delta(6)

    # token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    rest = data[10 + first_size:]
    part_sizes = []
    off = 3 * (n_parts - 1)
    if len(rest) < off:
        raise Vp8Error("token partition size table truncated")
    for i in range(n_parts - 1):
        sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        part_sizes.append(sz)
    parts = []
    for i in range(n_parts):
        if i < n_parts - 1:
            chunk = rest[off:off + part_sizes[i]]
            if len(chunk) != part_sizes[i]:
                raise Vp8Error(f"token partition {i} truncated")
            off += part_sizes[i]
        else:
            chunk = rest[off:]
            if not chunk:
                raise Vp8Error("final token partition empty")
        parts.append(BoolDec(chunk))

    # quantizers (§9.6)
    y_ac_qi = bd.literal(7)
    deltas = {
        "ydc": bd.flagged_delta(4),
        "y2dc": bd.flagged_delta(4),
        "y2ac": bd.flagged_delta(4),
        "uvdc": bd.flagged_delta(4),
        "uvac": bd.flagged_delta(4),
    }

    bd.get(128)  # refresh entropy probs (keyframe: state is per-image)

    # coefficient probability updates (§9.9 / §13.4)
    probs = [[[list(ctx) for ctx in band] for band in bt]
             for bt in T.DEFAULT_COEFF_PROBS]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if bd.get(T.COEFF_UPDATE_PROBS[i][j][k][l]):
                        probs[i][j][k][l] = bd.literal(8)

    mb_no_skip = bd.get(128)
    prob_skip_false = bd.literal(8) if mb_no_skip else 0

    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    cw = (width + 1) // 2
    ch = (height + 1) // 2

    # padded reconstruction planes: index 0 = border (row 127/col 129)
    yp = np.empty((mb_h * 16 + 1, mb_w * 16 + 1 + 4), np.uint8)
    up = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), np.uint8)
    vp = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), np.uint8)
    for pl in (yp, up, vp):
        pl[0, :] = 127
        pl[1:, 0] = 129

    # --- pass 1: mode parsing (all mode data lives in partition 1,
    # MB raster order) ---
    mbs = []
    above_sub = [[T.B_DC_PRED] * 4 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        left_sub = [T.B_DC_PRED] * 4
        for mb_x in range(mb_w):
            seg = 0
            if seg_enabled and seg_update_map:
                if bd.get(seg_tree_probs[0]):
                    seg = 2 + bd.get(seg_tree_probs[2])
                else:
                    seg = bd.get(seg_tree_probs[1])
            skip = bd.get(prob_skip_false) if mb_no_skip else 0
            ymode = bd.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROBS)
            if ymode == T.B_PRED:
                sub = []
                for r in range(4):
                    for c in range(4):
                        # §11.3: the above context for rows > 0 is the
                        # sub-block directly above WITHIN this MB (r12
                        # fix — caught by the bright-natural libwebp
                        # golden; the old code reused the above-MB's
                        # bottom row for all four rows, and the
                        # encoder mirrored it so roundtrips stayed
                        # green)
                        above_m = above_sub[mb_x][c] if r == 0 \
                            else sub[(r - 1) * 4 + c]
                        left_m = left_sub[r] if c == 0 else sub[r * 4 + c - 1]
                        m = bd.tree(
                            T.BMODE_TREE,
                            T.KF_BMODE_PROBS[above_m][left_m],
                        )
                        sub.append(m)
                above_sub[mb_x] = sub[12:16]
                left_sub = [sub[3], sub[7], sub[11], sub[15]]
            else:
                b = _MODE_TO_B[ymode]
                sub = [b] * 16
                above_sub[mb_x] = [b] * 4
                left_sub = [b] * 4
            uvmode = bd.tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROBS)
            mbs.append({"seg": seg, "skip": skip, "ymode": ymode,
                        "sub": sub, "uvmode": uvmode})

    # --- pass 2: residual tokens + reconstruction, MB raster order ---
    nz_above = np.zeros((mb_w, 9), np.int8)  # 4 Y, 2 U, 2 V, 1 Y2
    base_qi = _clamp_q(y_ac_qi)
    lf = _LoopFilter(filter_level, sharpness, bool(simple_filter))
    mb_flags = []
    for mb_y in range(mb_h):
        nz_left = np.zeros(9, np.int8)
        tok = parts[mb_y % n_parts]
        for mb_x in range(mb_w):
            mb = mbs[mb_y * mb_w + mb_x]
            if seg_enabled:
                qi = seg_q[mb["seg"]] if seg_abs \
                    else base_qi + seg_q[mb["seg"]]
            else:
                qi = base_qi
            q = _dequant_factors(_clamp_q(qi), deltas)
            has_y2 = mb["ymode"] != T.B_PRED
            blocks = [None] * 25  # 16 Y, 4 U, 4 V, [24] = Y2
            if mb["skip"]:
                nz_left[:8] = 0
                nz_above[mb_x][:8] = 0
                if has_y2:
                    nz_left[8] = 0
                    nz_above[mb_x][8] = 0
            else:
                if has_y2:
                    ctx = int(nz_above[mb_x][8] + nz_left[8])
                    out = _decode_coeffs(tok, probs, 1, 0, ctx,
                                         q["y2dc"], q["y2ac"])
                    blocks[24] = out
                    nz_above[mb_x][8] = nz_left[8] = int(out is not None)
                ytype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for r in range(4):
                    for c in range(4):
                        ctx = int(nz_above[mb_x][c] + nz_left[r])
                        out = _decode_coeffs(tok, probs, ytype, first,
                                             ctx, q["ydc"], q["yac"])
                        blocks[r * 4 + c] = out
                        nz = int(out is not None)
                        nz_above[mb_x][c] = nz_left[r] = nz
                for pi, base in ((0, 16), (1, 20)):  # U then V
                    for r in range(2):
                        for c in range(2):
                            ai = 4 + pi * 2 + c
                            li = 4 + pi * 2 + r
                            ctx = int(nz_above[mb_x][ai] + nz_left[li])
                            out = _decode_coeffs(tok, probs, 2, 0, ctx,
                                                 q["uvdc"], q["uvac"])
                            blocks[base + r * 2 + c] = out
                            nz = int(out is not None)
                            nz_above[mb_x][ai] = nz_left[li] = nz
            has_coeffs = any(b is not None for b in blocks)
            mb_flags.append((has_coeffs, not has_y2))

            # reconstruction
            x0, y0 = mb_x * 16 + 1, mb_y * 16 + 1
            if has_y2:
                pred = _predict_block(yp, x0, y0, 16, mb["ymode"],
                                      mb_x, mb_y)
                y2 = iwht4x4(blocks[24]) if blocks[24] is not None \
                    else [0] * 16
                for r in range(4):
                    for c in range(4):
                        co = blocks[r * 4 + c]
                        co = list(co) if co is not None else [0] * 16
                        co[0] = y2[r * 4 + c]
                        res = np.array(idct4x4(co), np.int32).reshape(4, 4)
                        blk = pred[r * 4:r * 4 + 4, c * 4:c * 4 + 4] + res
                        yp[y0 + r * 4:y0 + r * 4 + 4,
                           x0 + c * 4:x0 + c * 4 + 4] = \
                            np.clip(blk, 0, 255).astype(np.uint8)
            else:
                # B_PRED: subblocks predict from reconstructed
                # neighbours, including inside this MB
                top_row = yp[y0 - 1]
                for r in range(4):
                    for c in range(4):
                        bx, by = x0 + c * 4, y0 + r * 4
                        if c < 3:
                            if r == 0:
                                ar = top_row[bx + 4:bx + 8]
                            else:
                                ar = yp[by - 1, bx + 4:bx + 8]
                        else:
                            # right column: above-right always comes
                            # from the row above the MACROBLOCK (§12.3)
                            if mb_x == mb_w - 1:
                                ar = np.full(4, top_row[x0 + 15], np.uint8)
                            else:
                                ar = top_row[x0 + 16:x0 + 20]
                        pred = _predict_b(yp, bx, by, mb["sub"][r * 4 + c],
                                          ar)
                        co = blocks[r * 4 + c]
                        if co is not None:
                            pred = pred + np.array(idct4x4(list(co)),
                                                   np.int32).reshape(4, 4)
                        yp[by:by + 4, bx:bx + 4] = \
                            np.clip(pred, 0, 255).astype(np.uint8)
            cx, cy = mb_x * 8 + 1, mb_y * 8 + 1
            for pl, base in ((up, 16), (vp, 20)):
                pred = _predict_block(pl, cx, cy, 8, mb["uvmode"],
                                      mb_x, mb_y)
                out = pred.copy()
                for r in range(2):
                    for c in range(2):
                        co = blocks[base + r * 2 + c]
                        if co is not None:
                            res = np.array(idct4x4(list(co)),
                                           np.int32).reshape(4, 4)
                            out[r * 4:r * 4 + 4, c * 4:c * 4 + 4] += res
                pl[cy:cy + 8, cx:cx + 8] = \
                    np.clip(out, 0, 255).astype(np.uint8)
        # replicate the rightmost reconstructed column into the
        # above-right overhang used by next row's B_PRED right edges
        yp[y0:y0 + 16, mb_w * 16 + 1:] = \
            yp[y0:y0 + 16, mb_w * 16:mb_w * 16 + 1]

    # loop filter (§15), MB raster order over the unpadded planes
    yimg = np.ascontiguousarray(yp[1:mb_h * 16 + 1, 1:mb_w * 16 + 1])
    uimg = np.ascontiguousarray(up[1:, 1:])
    vimg = np.ascontiguousarray(vp[1:, 1:])
    if filter_level:
        for mb_y in range(mb_h):
            for mb_x in range(mb_w):
                has_coeffs, is_bpred = mb_flags[mb_y * mb_w + mb_x]
                lvl = filter_level
                if seg_enabled:
                    mb = mbs[mb_y * mb_w + mb_x]
                    lvl = seg_lf[mb["seg"]] if seg_abs \
                        else filter_level + seg_lf[mb["seg"]]
                    lvl = max(0, min(63, lvl))
                if lf_delta_enabled:
                    lvl += ref_lf_deltas[0]  # intra frame
                    if is_bpred:
                        lvl += mode_lf_deltas[0]
                    lvl = max(0, min(63, lvl))
                if lvl:
                    mb_lf = _LoopFilter(lvl, sharpness,
                                        bool(simple_filter))
                    mb_lf.filter_mb(yimg, uimg, vimg, mb_x, mb_y,
                                    has_coeffs, is_bpred)

    return (width, height, yimg[:height, :width],
            uimg[:ch, :cw], vimg[:ch, :cw])


# --- encoder mirror (fixture generator) -------------------------------------------


def _put_token(be: BoolEnc, probs, level: int, skip_eob: bool) -> None:
    start = 2 if skip_eob else 0
    v = abs(level)
    if v == 0:
        be.tree(T.COEFF_TREE, probs, T.DCT_0, start=start)
        return
    if v <= 4:
        be.tree(T.COEFF_TREE, probs, T.DCT_1 + v - 1, start=start)
    else:
        for cat in (T.DCT_CAT1, T.DCT_CAT2, T.DCT_CAT3, T.DCT_CAT4,
                    T.DCT_CAT5, T.DCT_CAT6):
            nbits = len(T.CAT_PROBS[cat])
            base = T.CAT_BASE[cat]
            if v < base + (1 << nbits) or cat == T.DCT_CAT6:
                if v >= base + (1 << nbits):
                    raise ValueError(f"coefficient level {v} too large")
                be.tree(T.COEFF_TREE, probs, cat, start=start)
                extra = v - base
                for k, pb in enumerate(T.CAT_PROBS[cat]):
                    be.put((extra >> (nbits - 1 - k)) & 1, pb)
                break
    be.put(1 if level < 0 else 0, 128)


def _put_block(be: BoolEnc, probs, block_type: int, first: int,
               ctx: int, levels: list[int] | None) -> int:
    """Write one block's scan-ordered levels; returns the nonzero
    flag for context tracking."""
    lv = levels or [0] * 16
    last = -1
    for i in range(first, 16):
        if lv[i]:
            last = i
    if last < 0:
        band = T.COEFF_BANDS[first]
        be.tree(T.COEFF_TREE, probs[block_type][band][ctx], T.DCT_EOB)
        return 0
    skip_eob = False
    i = first
    while i <= last:
        band = T.COEFF_BANDS[i]
        p = probs[block_type][band][ctx]
        _put_token(be, p, lv[i], skip_eob)
        skip_eob = lv[i] == 0
        ctx = 0 if lv[i] == 0 else (1 if abs(lv[i]) == 1 else 2)
        i += 1
    if last < 15:
        band = T.COEFF_BANDS[last + 1]
        be.tree(T.COEFF_TREE, probs[block_type][band][ctx], T.DCT_EOB)
    return 1


def encode_vp8(width: int, height: int, mbs: list[dict],
               qi: int = 20, filter_level: int = 0,
               simple_filter: bool = False,
               sharpness: int = 0) -> bytes:
    """Restricted VP8 keyframe writer — the fixture mirror for
    :func:`decode_vp8`: one segment, a single token partition,
    default probabilities, selectable loop filter
    (``filter_level``/``simple_filter``/``sharpness``). ``mbs`` is raster order, one
    dict per macroblock: ymode/uvmode (+ ``sub`` 16-list for B_PRED),
    optional scan-ordered quantized levels ``y2`` (16), ``y`` (16
    lists of 16), ``u``/``v`` (4 lists of 16); omitted blocks are
    all-zero. Levels are written against the default coefficient
    probabilities, exactly as the decoder reads them."""
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    if len(mbs) != mb_w * mb_h:
        raise ValueError(f"want {mb_w * mb_h} macroblocks, got {len(mbs)}")
    be = BoolEnc()
    be.literal(0, 1)  # color space
    be.literal(0, 1)  # clamping
    be.put(0, 128)    # segmentation disabled
    be.put(1 if simple_filter else 0, 128)
    be.literal(filter_level, 6)
    be.literal(sharpness, 3)
    be.put(0, 128)    # lf deltas disabled
    be.literal(0, 2)  # log2(token partitions) = 0 -> 1 partition
    be.literal(qi, 7)
    for _ in range(5):
        be.put(0, 128)  # quantizer deltas absent
    be.put(1, 128)    # refresh entropy probs
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    be.put(0, T.COEFF_UPDATE_PROBS[i][j][k][l])
    be.put(1, 128)        # mb_no_coeff_skip enabled
    be.literal(128, 8)    # prob_skip_false

    above_sub = [[T.B_DC_PRED] * 4 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        left_sub = [T.B_DC_PRED] * 4
        for mb_x in range(mb_w):
            mb = mbs[mb_y * mb_w + mb_x]
            be.put(1 if mb.get("skip") else 0, 128)
            ymode = mb["ymode"]
            be.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROBS, ymode)
            if ymode == T.B_PRED:
                sub = mb["sub"]
                for r in range(4):
                    for c in range(4):
                        # §11.3 within-MB above context (r12 fix,
                        # mirrors the decoder)
                        above_m = above_sub[mb_x][c] if r == 0 \
                            else sub[(r - 1) * 4 + c]
                        left_m = left_sub[r] if c == 0 \
                            else sub[r * 4 + c - 1]
                        be.tree(T.BMODE_TREE,
                                T.KF_BMODE_PROBS[above_m][left_m],
                                sub[r * 4 + c])
                above_sub[mb_x] = sub[12:16]
                left_sub = [sub[3], sub[7], sub[11], sub[15]]
            else:
                b = _MODE_TO_B[ymode]
                above_sub[mb_x] = [b] * 4
                left_sub = [b] * 4
            be.tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROBS, mb["uvmode"])
    part1 = be.done()

    probs = T.DEFAULT_COEFF_PROBS
    te = BoolEnc()
    nz_above = [[0] * 9 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        nz_left = [0] * 9
        for mb_x in range(mb_w):
            mb = mbs[mb_y * mb_w + mb_x]
            has_y2 = mb["ymode"] != T.B_PRED
            if mb.get("skip"):
                nz_left[:8] = [0] * 8
                nz_above[mb_x][:8] = [0] * 8
                if has_y2:
                    nz_left[8] = nz_above[mb_x][8] = 0
                continue
            if has_y2:
                ctx = nz_above[mb_x][8] + nz_left[8]
                nz = _put_block(te, probs, 1, 0, ctx, mb.get("y2"))
                nz_above[mb_x][8] = nz_left[8] = nz
            ytype = 0 if has_y2 else 3
            first = 1 if has_y2 else 0
            ylv = mb.get("y") or [None] * 16
            for r in range(4):
                for c in range(4):
                    ctx = nz_above[mb_x][c] + nz_left[r]
                    nz = _put_block(te, probs, ytype, first, ctx,
                                    ylv[r * 4 + c])
                    nz_above[mb_x][c] = nz_left[r] = nz
            for pi, key in ((0, "u"), (1, "v")):
                lv = mb.get(key) or [None] * 4
                for r in range(2):
                    for c in range(2):
                        ai = 4 + pi * 2 + c
                        li = 4 + pi * 2 + r
                        ctx = nz_above[mb_x][ai] + nz_left[li]
                        nz = _put_block(te, probs, 2, 0, ctx,
                                        lv[r * 2 + c])
                        nz_above[mb_x][ai] = nz_left[li] = nz
    tokens = te.done()

    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    header = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    header += b"\x9d\x01\x2a"
    header += struct.pack("<HH", width, height)
    return header + part1 + tokens
