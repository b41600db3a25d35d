"""WebP lossless (VP8L) decode from scratch — the public "WebP
Lossless Bitstream Specification" (RFC 9649 container + VP8L spec).

WebP is the second-most-common wild-web image format after JPEG; the
LOSSLESS profile (VP8L) is fully decodable without codec libraries:
canonical prefix codes (DEFLATE-style, LSB-first bits), LZ77
backward references with the 120-entry 2D distance neighbor map, the
color cache (0x1e35a7bd multiplicative hash), meta prefix-code
groups selected by an entropy sub-image, and all four inverse
transforms — PREDICTOR (14 spatial modes, per-block mode sub-image),
COLOR (per-block signed 3.5-fixed-point cross-channel multipliers),
SUBTRACT-GREEN, and COLOR-INDEXING (palette with sub-byte pixel
packing for palettes ≤ 16 entries).

The LOSSY VP8 profile — the dominant WebP form on the real web —
decodes too (r11): keyframe DCT entropy coding via the from-scratch
RFC 6386 implementation in operators/vp8.py, with FANCY chroma
upsampling (the libwebp default) + the fixed-point BT.601 YUV→RGB
with truncating VP8Clip8 — bit-exact against WebPDecodeRGBA over the
196-stream conformance corpus since r13 — and ALPH transparency
planes (raw or headerless-VP8L compressed, PNG-style prediction
filters). Animated WebP: ``decode_webp`` on a
single image raises by name; ``webp_anim_frames`` /
``webp_anim_demux`` (r11) demux ANMF frames with their
placement/timing metadata, and ``webp_anim_composite`` /
``webp_anim_canvas`` (r12) assemble the full per-frame canvases
(background color, blend methods, dispose-to-background) per the
container spec.

Verification (tests/test_multimodal.py, tests/test_vp8.py): the
decoder is pinned by hand-assembled bitstreams computed from the spec
(prefix-code decode, LZ77 copy, cache hit) independent of the
encoder, encoder->decoder roundtrips across literals / LZ77 / color
cache / subtract-green / palette shapes, and for the lossy path a
REAL libwebp-encoded file from the stdlib test corpus (decoded logo
alpha shape + coherent chroma tokens).

At 100 TB the decode runs one-image-per-row inside the same Arrow
``mapInPandas`` slot as the other codecs
(operators/multimodal.py::decode_media).
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    """Typed WebP/VP8L format error."""


class _LsbBits:
    """LSB-first bit reader (VP8L reads bits DEFLATE-style)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise WebpError("VP8L bitstream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


class _Prefix:
    """Canonical prefix code decoder built from code lengths (the
    same canonical construction as DEFLATE, bits read LSB-first —
    decoded by walking bit by bit through per-length first-code
    tables; fixture-scale images keep this fast enough)."""

    __slots__ = ("counts", "symbols", "single")

    def __init__(self, lengths: list[int]):
        maxlen = max(lengths) if lengths else 0
        nonzero = [(ln, s) for s, ln in enumerate(lengths) if ln]
        if not nonzero:
            raise WebpError("prefix code with no symbols")
        if len(nonzero) == 1:
            self.single = nonzero[0][1]
            self.counts = self.symbols = None
            return
        self.single = None
        counts = [0] * (maxlen + 1)
        for ln, _ in nonzero:
            counts[ln] += 1
        # Kraft check both ways: over-subscribed codes are ambiguous,
        # INCOMPLETE ones are spec-invalid and libwebp's
        # BuildHuffmanTable rejects them (r14: matching that strictness
        # is what exposed the encoder emitting incomplete flat codes)
        total = 0
        for ln in range(1, maxlen + 1):
            total = (total << 1) + counts[ln]
            if total > (1 << ln):
                raise WebpError("over-subscribed prefix code")
        if total != 1 << maxlen:
            raise WebpError("incomplete prefix code (Kraft sum < 1)")
        self.counts = counts
        self.symbols = [s for ln, s in sorted(nonzero)]

    def _walk(self, br: _LsbBits) -> int:
        """Canonical decode: code VALUES are MSB-first while the
        stream delivers bits LSB-first — walk one bit at a time
        through the per-length first-code ladder."""
        if self.single is not None:
            return self.single
        code = 0
        first = 0
        index = 0
        for ln in range(1, len(self.counts)):
            code = (code << 1) | br.read(1)
            count = self.counts[ln]
            if code - first < count:
                return self.symbols[index + (code - first)]
            index += count
            first = (first + count) << 1
        raise WebpError("invalid prefix code in VP8L stream")


#: code-length-code read order (VP8L spec §6.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
              14, 15)

#: the 120-entry distance neighbor map (VP8L spec §5.2.3): (dx, dy)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (-8, 5), (6, 7), (-6, 7),
]
# (entries beyond are synthesized as plain distances)


def _lz77_value(br: _LsbBits, code: int) -> int:
    """Length/distance prefix value + extra bits (VP8L §5.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _read_code_lengths(br: _LsbBits, n_symbols: int) -> list[int]:
    """One prefix code's lengths (VP8L §6.2.2): simple (1-2 symbol)
    form or the code-length-coded normal form."""
    if br.read(1):  # simple code
        nsym = br.read(1) + 1
        first_wide = br.read(1)
        lengths = [0] * n_symbols
        s0 = br.read(8 if first_wide else 1)
        if s0 >= n_symbols:
            raise WebpError("simple prefix symbol out of range")
        lengths[s0] = 1
        if nsym == 2:
            s1 = br.read(8)
            if s1 >= n_symbols:
                raise WebpError("simple prefix symbol out of range")
            lengths[s1] = 1
        return lengths
    num_codes = br.read(4) + 4
    if num_codes > 19:
        raise WebpError("too many code-length codes")
    clc = [0] * 19
    for i in range(num_codes):
        clc[_CLC_ORDER[i]] = br.read(3)
    clc_tree = _Prefix(clc)
    if br.read(1):  # explicit max-symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = n_symbols
    lengths = [0] * n_symbols
    prev = 8
    i = 0
    while i < n_symbols:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code = clc_tree._walk(br)
        if code < 16:
            lengths[i] = code
            i += 1
            if code:
                prev = code
        elif code == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i >= n_symbols:
                    raise WebpError("code-length repeat overruns symbols")
                lengths[i] = prev
                i += 1
        elif code == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
        if i > n_symbols:
            raise WebpError("code-length run overruns symbols")
    return lengths


class _Group:
    """One meta group: the 5 prefix codes (green+len+cache, red,
    blue, alpha, distance)."""

    __slots__ = ("g", "r", "b", "a", "d")

    def __init__(self, br: _LsbBits, cache_bits: int):
        ng = 256 + 24 + (1 << cache_bits if cache_bits else 0)
        self.g = _Prefix(_read_code_lengths(br, ng))
        self.r = _Prefix(_read_code_lengths(br, 256))
        self.b = _Prefix(_read_code_lengths(br, 256))
        self.a = _Prefix(_read_code_lengths(br, 256))
        self.d = _Prefix(_read_code_lengths(br, 40))


def _decode_image(br: _LsbBits, w: int, h: int,
                  allow_meta: bool) -> np.ndarray:
    """The VP8L entropy-coded image decoder -> (h, w) uint32 ARGB.
    ``allow_meta``: the main image may carry meta prefix groups and a
    color cache; transform/entropy sub-images may carry a cache too
    but no meta groups (spec §6.2.4)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError(f"color cache bits {cache_bits} out of range")
    meta = None
    meta_shift = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_shift = br.read(3) + 2
        mw = (w + (1 << meta_shift) - 1) >> meta_shift
        mh = (h + (1 << meta_shift) - 1) >> meta_shift
        meta_img = _decode_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    groups = [_Group(br, cache_bits) for _ in range(n_groups)]
    cache = [0] * (1 << cache_bits) if cache_bits else None
    out = np.zeros(w * h, np.uint32)
    pos = 0
    total = w * h

    def insert(px: int):
        if cache is not None:
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            grp = groups[int(meta[y >> meta_shift, x >> meta_shift])]
        else:
            grp = groups[0]
        s = grp.g._walk(br)
        if s < 256:  # literal: green, then red, blue, alpha
            g = s
            r = grp.r._walk(br)
            b = grp.b._walk(br)
            a = grp.a._walk(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            insert(px)
            pos += 1
        elif s < 280:  # LZ77 backward reference
            length = _lz77_value(br, s - 256)
            dcode = grp.d._walk(br)
            dist = _lz77_value(br, dcode)
            if dist <= 120:
                dx, dy = _DIST_MAP[dist - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist -= 120
            if dist > pos:
                raise WebpError("LZ77 distance reaches before the image")
            if pos + length > total:
                raise WebpError("LZ77 copy runs past the image")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                insert(px)
                pos += 1
        else:  # color cache reference
            if cache is None:
                raise WebpError("cache symbol without a color cache")
            idx = s - 280
            if idx >= len(cache):
                raise WebpError("color cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out.reshape(h, w)


# --- inverse transforms ------------------------------------------------------


def _chans(px) -> np.ndarray:
    px = int(px)
    return np.array([(px >> 24) & 255, (px >> 16) & 255,
                     (px >> 8) & 255, px & 255], np.int64)


def _predict_px(img: np.ndarray, y: int, x: int, mode: int,
                w: int) -> np.ndarray:
    """The spec §4.1 prediction for pixel (y, x) from its already-
    final neighbors — shared by the inverse transform and the fixture
    writer's forward pass. Edge rules: (0,0) predicts 0xff000000, the
    top row predicts L, the left column predicts T, and the top-right
    neighbor of a last-column pixel is the leftmost pixel of the row
    above."""
    if x == 0 and y == 0:
        return np.array([255, 0, 0, 0], np.int64)
    if y == 0:
        return _chans(img[y, x - 1])
    if x == 0:
        return _chans(img[y - 1, x])
    L = _chans(img[y, x - 1])
    T = _chans(img[y - 1, x])
    TL = _chans(img[y - 1, x - 1])
    TR = _chans(img[y - 1, x + 1]) if x + 1 < w else _chans(img[y - 1, 0])
    if mode == 0:
        return np.array([255, 0, 0, 0], np.int64)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return (((L + TR) // 2) + T) // 2
    if mode == 6:
        return (L + TL) // 2
    if mode == 7:
        return (L + T) // 2
    if mode == 8:
        return (TL + T) // 2
    if mode == 9:
        return (T + TR) // 2
    if mode == 10:
        return (((L + TL) // 2) + ((T + TR) // 2)) // 2
    if mode == 11:  # Select
        pm = L + T - TL
        pl = int(np.abs(pm - L).sum())
        pt = int(np.abs(pm - T).sum())
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:  # ClampAddSubtractHalf (C trunc-toward-0 halving)
        ave = (L + T) // 2
        d = ave - TL
        return np.clip(ave + np.sign(d) * (np.abs(d) // 2), 0, 255)
    raise WebpError(f"predictor mode {mode} out of range")


def _unpredict(img: np.ndarray, modes: np.ndarray, shift: int) -> None:
    """PREDICTOR inverse transform (spec §4.1): add the predicted
    pixel (per-channel, mod 256) to each residual, scanline order."""
    h, w = img.shape
    for y in range(h):
        for x in range(w):
            mode = int(modes[y >> shift, x >> shift]) \
                if (x and y) else 0  # edges use their fixed rules
            pred = _predict_px(img, y, x, mode, w)
            c = (_chans(img[y, x]) + pred) & 255
            img[y, x] = ((int(c[0]) << 24) | (int(c[1]) << 16)
                         | (int(c[2]) << 8) | int(c[3]))


def _to_signed8(v):
    return v - 256 if v >= 128 else v


def _color_transform_delta(t: int, c: int) -> int:
    return (_to_signed8(t) * _to_signed8(c)) >> 5


def _uncolor(img: np.ndarray, data: np.ndarray, shift: int) -> None:
    """COLOR inverse transform (spec §4.2)."""
    h, w = img.shape
    for y in range(h):
        for x in range(w):
            cte = int(data[y >> shift, x >> shift])
            # multipliers ride the B/G/R channels (spec §4.2)
            g2r = cte & 255
            g2b = (cte >> 8) & 255
            r2b = (cte >> 16) & 255
            px = int(img[y, x])
            a = (px >> 24) & 255
            r = (px >> 16) & 255
            g = (px >> 8) & 255
            b = px & 255
            r = (r + _color_transform_delta(g2r, g)) & 255
            b = (b + _color_transform_delta(g2b, g)
                 + _color_transform_delta(r2b, r)) & 255
            img[y, x] = (a << 24) | (r << 16) | (g << 8) | b


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray,
                v: np.ndarray) -> np.ndarray:
    """libwebp's published fixed-point BT.601 limited-range
    conversion (yuv.h: MultHi Q8 coefficients, VP8Clip8's TRUNCATING
    >> 6 — r13: the former +32 rounding was a one-count deviation
    from libwebp; the conformance harness now pins full RGB output
    bit-exactly against WebPDecodeRGBA)."""
    y = y.astype(np.int32)
    u = u.astype(np.int32)
    v = v.astype(np.int32)

    def mh(a, c):
        return (a * c) >> 8

    r = mh(y, 19077) + mh(v, 26149) - 14234
    g = mh(y, 19077) - mh(u, 6419) - mh(v, 13320) + 8708
    b = mh(y, 19077) + mh(u, 33050) - 17685
    out = np.stack([r, g, b], axis=-1)
    return np.clip(out >> 6, 0, 255).astype(np.uint8)


def _fancy_upsample(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    """libwebp's FANCY chroma upsampler (upsampling.c, r13): each
    output pixel blends its four nearest chroma samples with
    (9, 3, 3, 1)/16 weights through the library's exact staged
    integer rounding ((tl+3t+3l+c+8)>>3, then (diag+nearest)>>1);
    edge rows/columns collapse to the one-sided (3a+b+2)>>2 form.
    Bit-exact against WebPDecodeRGBA over the conformance corpus."""
    ch, cw = plane.shape
    u = plane.astype(np.int32)
    out = np.empty((h, w), np.int32)

    def pair(top, cur):
        tr = np.empty(w, np.int32)
        br = np.empty(w, np.int32)
        tr[0] = (3 * top[0] + cur[0] + 2) >> 2
        br[0] = (3 * cur[0] + top[0] + 2) >> 2
        if cw > 1:
            tl, t = top[:-1], top[1:]
            left, c = cur[:-1], cur[1:]
            avg = tl + t + left + c + 8
            d12 = (avg + 2 * (t + left)) >> 3
            d03 = (avg + 2 * (tl + c)) >> 3
            tr[1:2 * cw - 2:2] = (d12 + tl) >> 1
            tr[2:2 * cw - 1:2] = (d03 + t) >> 1
            br[1:2 * cw - 2:2] = (d03 + left) >> 1
            br[2:2 * cw - 1:2] = (d12 + c) >> 1
        if w % 2 == 0:
            tr[w - 1] = (3 * top[-1] + cur[-1] + 2) >> 2
            br[w - 1] = (3 * cur[-1] + top[-1] + 2) >> 2
        return tr, br

    out[0] = pair(u[0], u[0])[0]
    for j in range(1, ch):
        tr, br = pair(u[j - 1], u[j])
        out[2 * j - 1] = tr
        if 2 * j < h:
            out[2 * j] = br
    if h % 2 == 0 and h > 1:
        out[h - 1] = pair(u[ch - 1], u[ch - 1])[0]
    return out.astype(np.uint8)


def _decode_alpha(body: bytes, w: int, h: int) -> np.ndarray:
    """The ALPH chunk (WebP container spec): 1-byte header
    (compression 0 = raw / 1 = headerless VP8L image stream, a
    prediction filter 0-3, level-reduction preprocessing), then the
    alpha plane. Alpha rides the GREEN channel in the lossless
    form."""
    if not body:
        raise WebpError("empty ALPH chunk")
    hdr = body[0]
    method = hdr & 3
    filt = (hdr >> 2) & 3
    pre = (hdr >> 4) & 3
    if pre:
        raise NotImplementedError(
            "ALPH level-reduction preprocessing not supported"
        )
    if method == 0:
        raw = np.frombuffer(body[1:1 + w * h], np.uint8)
        if raw.size != w * h:
            raise WebpError("raw ALPH plane truncated")
        a = raw.reshape(h, w).astype(np.int32)
    elif method == 1:
        br = _LsbBits(body[1:])
        img = _decode_spatial(br, w, h)
        a = ((img >> 8) & 0xFF).astype(np.int32)
    else:
        raise WebpError(f"reserved ALPH compression method {method}")
    if filt:  # PNG-style prediction filters over the whole plane
        out = np.zeros((h, w), np.int32)
        for yy in range(h):
            for xx in range(w):
                left = out[yy, xx - 1] if xx else (out[yy - 1, 0]
                                                   if yy else 0)
                top = out[yy - 1, xx] if yy else (out[yy, xx - 1]
                                                  if xx else 0)
                if filt == 1:
                    p = left
                elif filt == 2:
                    p = top
                else:
                    tl = out[yy - 1, xx - 1] if (xx and yy) else \
                        (left if not yy else top)
                    p = min(255, max(0, left + top - tl))
                out[yy, xx] = (a[yy, xx] + p) & 0xFF
        a = out
    return a.astype(np.uint8)


def _decode_lossy(vp8: bytes, alph: bytes | None) -> tuple[int, int,
                                                           np.ndarray]:
    """VP8 keyframe (+ optional ALPH plane) -> (w, h, RGBA): chroma
    FANCY-upsampled (libwebp default), fixed-point BT.601 to RGB —
    bit-exact against WebPDecodeRGBA since r13."""
    from dolphinbeat_spark.operators.vp8 import decode_vp8

    w, h, y, u, v = decode_vp8(vp8)
    uf = _fancy_upsample(u, h, w)
    vf = _fancy_upsample(v, h, w)
    rgb = _yuv_to_rgb(y, uf, vf)
    a = _decode_alpha(alph, w, h) if alph is not None else \
        np.full((h, w), 255, np.uint8)
    return w, h, np.dstack([rgb, a])


def decode_webp(data: bytes) -> tuple[int, int, np.ndarray]:
    """WebP -> (width, height, HxWx4 RGBA uint8). Lossless (VP8L)
    and LOSSY (VP8 keyframe via operators/vp8.py, r11) both decode,
    incl. VP8X-wrapped layouts with an ALPH transparency plane;
    animations (ANMF) raise by name here — use webp_anim_frames for
    the demux.

    The lossy path is BIT-EXACT against libwebp end-to-end since
    r13: fancy chroma upsampling (the library default) and the
    truncating VP8Clip8 conversion match WebPDecodeRGBA byte-for-byte
    over the 196-stream conformance corpus (tools/vp8_conformance.py
    compares RGB, not just YUV planes)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WebP payload (RIFF/WEBP)")
    pos = 12
    vp8l = None
    vp8 = None
    alph = None
    while pos + 8 <= len(data):
        cc = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise WebpError(f"WebP chunk {cc!r} truncated")
        if cc == b"VP8L":
            vp8l = body
            break
        if cc == b"VP8 ":
            vp8 = body
            break
        if cc == b"ALPH":
            alph = body
        if cc == b"ANMF" or cc == b"ANIM":
            raise NotImplementedError("animated WebP not supported")
        pos += 8 + clen + (clen & 1)
    if vp8 is not None:
        return _decode_lossy(vp8, alph)
    if vp8l is None:
        raise WebpError("WebP without a VP8L or VP8 chunk")
    if not vp8l or vp8l[0] != 0x2F:
        raise WebpError("bad VP8L signature byte")
    br = _LsbBits(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise WebpError("unknown VP8L version")
    img = _decode_spatial(br, w, h)
    a = ((img >> 24) & 0xFF).astype(np.uint8)
    r = ((img >> 16) & 0xFF).astype(np.uint8)
    g = ((img >> 8) & 0xFF).astype(np.uint8)
    b = (img & 0xFF).astype(np.uint8)
    return w, h, np.stack([r, g, b, a], axis=-1)


def _decode_spatial(br: _LsbBits, w: int, h: int) -> np.ndarray:
    """One level-0 spatially-coded VP8L image (spec §4-§6): the
    transform loop + entropy-coded image + reverse transform
    application. Shared by the main VP8L image and the headerless
    ALPH method-1 stream (whose dimensions are implicit)."""
    # transforms, outermost first in the stream; applied in reverse.
    # Color-indexing reduces the coded width (sub-byte pixel packing),
    # so xsize tracks the CURRENT coded width as transforms are read.
    transforms = []
    seen = set()
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise WebpError(f"transform {ttype} declared twice")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color: per-block sub-image
            shift = br.read(3) + 2
            bw = (xsize + (1 << shift) - 1) >> shift
            bh = (h + (1 << shift) - 1) >> shift
            sub = _decode_image(br, bw, bh, False)
            transforms.append((ttype, shift, (sub >> 8) & 0xFF)
                              if ttype == 0 else (ttype, shift, sub))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        else:  # color indexing: delta-coded palette + pixel packing
            n_colors = br.read(8) + 1
            raw = _decode_image(br, n_colors, 1, False)[0]
            pal = np.zeros(n_colors, np.uint32)
            prev = 0
            for i in range(n_colors):
                cur = int(raw[i])
                e = 0
                for sh in (0, 8, 16, 24):  # per-channel mod-256 add
                    e |= ((((prev >> sh) & 255) + ((cur >> sh) & 255))
                          & 255) << sh
                pal[i] = e
                prev = e
            if n_colors <= 2:
                wbits = 3
            elif n_colors <= 4:
                wbits = 2
            elif n_colors <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append((3, wbits, pal))
            xsize = (xsize + (1 << wbits) - 1) >> wbits
    img = _decode_image(br, xsize, h, True)

    for ttype, p1, p2 in reversed(transforms):
        if ttype == 0:
            _unpredict(img, p2, p1)
        elif ttype == 1:
            _uncolor(img, p2, p1)
        elif ttype == 2:  # add green back to red and blue
            g = (img >> 8) & 0xFF
            r = (((img >> 16) & 0xFF) + g) & 0xFF
            b = ((img & 0xFF) + g) & 0xFF
            img = (img & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
        else:  # palette lookup with sub-byte unpacking (LSB-first)
            wbits, pal = p1, p2
            ppb = 1 << wbits         # pixels per packed unit
            ibits = 8 >> wbits       # bits per index
            idx = np.zeros((h, w), np.int64)
            packed = (img >> 8) & 0xFF  # indices ride the green channel
            for x in range(w):
                unit = packed[:, x >> wbits]
                idx[:, x] = (unit >> (ibits * (x & (ppb - 1)))) \
                    & ((1 << ibits) - 1)
            if int(idx.max(initial=0)) >= len(pal):
                raise WebpError("palette index beyond the color table")
            img = pal[idx].astype(np.uint32)

    return img


# --- writer (fixture generator) ----------------------------------------------


class _LsbWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """lengths -> {symbol: (code_value, length)} canonical (same
    construction the decoder walks)."""
    nonzero = sorted((ln, s) for s, ln in enumerate(lengths) if ln)
    codes = {}
    code = 0
    prev_len = 0
    for ln, s in nonzero:
        code <<= ln - prev_len
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return codes


def _put_code(bw: _LsbWriter, code: int, ln: int) -> None:
    """Emit a canonical code value MSB-first (the decoder walks bits
    in stream order building the value MSB-first)."""
    for i in range(ln - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _write_flat_code(bw: _LsbWriter, n_symbols: int, length: int):
    """Write a COMPLETE prefix code covering the whole alphabet.

    When ``n_symbols == 2**length`` every symbol gets the same length
    through a single-symbol code-length code (zero bits per symbol).
    Otherwise a flat code would be Kraft-incomplete — libwebp's
    BuildHuffmanTable rejects incomplete codes (r14: every stream
    this encoder produced for a non-power-of-two alphabet, i.e. the
    green and distance codes, failed to decode in libwebp; our
    decoder was too lax to notice) — so the first ``2**length -
    n_symbols`` symbols are promoted to ``length - 1`` bits, which
    closes the Kraft sum exactly. The two lengths are declared
    through a 2-symbol code-length code at one bit per symbol.
    Returns the symbol->(code, len) map."""
    if not 0 < n_symbols <= 1 << length:
        raise ValueError(
            f"flat code: {n_symbols} symbols do not fit {length} bits")
    short = (1 << length) - n_symbols  # symbols promoted to length-1
    if short >= n_symbols or (short and length < 2):
        raise ValueError(
            f"flat code: alphabet {n_symbols} needs length "
            f"{(n_symbols - 1).bit_length()}, got {length}")
    bw.write(0, 1)           # normal (not simple) code
    bw.write(15, 4)          # 19 code-length codes present
    if short == 0:
        for sym in _CLC_ORDER:
            bw.write(1 if sym == length else 0, 3)
        bw.write(0, 1)       # no explicit max-symbol
        # single-symbol CLC: `length` n_symbols times with zero bits
        return _canonical_codes([length] * n_symbols)
    for sym in _CLC_ORDER:
        bw.write(1 if sym in (length - 1, length) else 0, 3)
    bw.write(0, 1)           # no explicit max-symbol
    # 2-symbol CLC, canonical: the smaller length-symbol codes as 0
    for s in range(n_symbols):
        bw.write(0 if s < short else 1, 1)
    return _canonical_codes(
        [length - 1] * short + [length] * (n_symbols - short))


def _write_single_code(bw: _LsbWriter, symbol: int):
    """Simple-form prefix code with one symbol (zero bits per use)."""
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # 1 symbol
    if symbol < 2:
        bw.write(0, 1)  # 1-bit first symbol
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


def _lz77_code(v: int) -> tuple[int, int, int]:
    """value -> (prefix code, extra bits value, extra bit count):
    inverse of _lz77_value."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    e = x.bit_length() - 2
    if x >= 3 << e:
        return 2 * e + 3, x - (3 << e), e
    return 2 * e + 2, x - (2 << e), e


def encode_webp_vp8(width: int, height: int, mbs: list[dict],
                    qi: int = 20) -> bytes:
    """RIFF/WEBP container around a restricted VP8 keyframe
    (operators/vp8.py::encode_vp8) — the lossy fixture mirror."""
    from dolphinbeat_spark.operators.vp8 import encode_vp8

    payload = encode_vp8(width, height, mbs, qi=qi)
    if len(payload) & 1:
        padded = payload + b"\x00"
    else:
        padded = payload
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + padded
    return (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP"
            + chunk)


def add_webp_exif(webp: bytes, exif_tiff: bytes,
                  canvas: tuple[int, int]) -> bytes:
    """Rewrap a simple VP8/VP8L WebP into the VP8X extended layout
    carrying an EXIF chunk (container spec: VP8X flags bit 3) — the
    fixture generator for WebP metadata extraction. ``exif_tiff`` is
    the raw TIFF-IFD block (no JPEG 'Exif\\x00\\x00' prefix needed;
    writers emit both layouts and the reader handles both)."""
    if webp[:4] != b"RIFF" or webp[8:12] != b"WEBP":
        raise WebpError("not a WebP payload")
    image_chunks = webp[12:]
    w, h = canvas
    vp8x = (b"VP8X" + struct.pack("<I", 10)
            + bytes([0x08]) + bytes(3)
            + struct.pack("<I", w - 1)[:3]
            + struct.pack("<I", h - 1)[:3])
    exif = b"EXIF" + struct.pack("<I", len(exif_tiff)) + exif_tiff
    if len(exif_tiff) & 1:
        exif += b"\x00"
    body = b"WEBP" + vp8x + image_chunks + exif
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_webp_lossless(rgba: np.ndarray, use_cache_bits: int = 0,
                         lz77_min: int = 0,
                         subtract_green: bool = False,
                         palette: bool = False,
                         predictor: tuple[int, int] | None = None,
                         color: tuple[int, int, int, int] | None = None
                         ) -> bytes:
    """Format-faithful VP8L writer (fixture generator): flat prefix
    codes (every symbol the same length, declared through a
    single-symbol code-length code), optional color cache, optional
    greedy dist-1/dist-w LZ77 runs (``lz77_min`` = minimum run worth
    coding, 0 disables), optional subtract-green transform, optional
    color-indexing (palette) with sub-byte packing, optional
    PREDICTOR transform ``(mode, block_shift)`` and COLOR transform
    ``(g2r, g2b, r2b, block_shift)`` with fixed parameters per
    block."""
    rgba = np.asarray(rgba, np.uint8)
    h, w = rgba.shape[:2]
    argb = ((rgba[:, :, 3].astype(np.uint32) << 24)
            | (rgba[:, :, 0].astype(np.uint32) << 16)
            | (rgba[:, :, 1].astype(np.uint32) << 8)
            | rgba[:, :, 2].astype(np.uint32))
    bw = _LsbWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    def emit_entropy_image(px: np.ndarray, cache_bits: int, lz_min: int):
        """One entropy-coded image over the flat-code model."""
        hh, ww = px.shape
        bw.write(1 if cache_bits else 0, 1)
        if cache_bits:
            bw.write(cache_bits, 4)
        # (caller writes the meta bit for the main image)
        ng = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
        gl = max(2, (ng - 1).bit_length())
        gcodes = _write_flat_code(bw, ng, gl)
        ccodes = _write_flat_code(bw, 256, 8)
        # red/blue/alpha share the same flat 8-bit canonical map
        _write_flat_code(bw, 256, 8)
        _write_flat_code(bw, 256, 8)
        dcodes = _write_flat_code(bw, 40, 6)
        cache = [None] * (1 << cache_bits) if cache_bits else None
        flat = px.reshape(-1)
        n = flat.size
        i = 0
        while i < n:
            v = int(flat[i])
            # greedy LZ77: try dist-1 and dist-ww runs
            if lz_min:
                best_len = 0
                best_dist = 0
                for dist in (1, ww):
                    if i < dist:
                        continue
                    ln = 0
                    while (i + ln < n and ln < 4096
                           and flat[i + ln] == flat[i + ln - dist]):
                        ln += 1
                    if ln > best_len:
                        best_len, best_dist = ln, dist
                if best_len >= lz_min:
                    lc, lev, lnb = _lz77_code(best_len)
                    code, ln_ = gcodes[256 + lc]
                    _put_code(bw, code, ln_)
                    bw.write(lev, lnb)
                    # emit the PLAIN distance form (value dist + 120)
                    dc, dev, dnb = _lz77_code(best_dist + 120)
                    code, ln_ = dcodes[dc]
                    _put_code(bw, code, ln_)
                    bw.write(dev, dnb)
                    if cache is not None:
                        for k in range(best_len):
                            pxv = int(flat[i + k])
                            cache[(0x1E35A7BD * pxv & 0xFFFFFFFF)
                                  >> (32 - cache_bits)] = pxv
                    i += best_len
                    continue
            if cache is not None:
                slot = (0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)
                if cache[slot] == v:
                    code, ln_ = gcodes[280 + slot]
                    _put_code(bw, code, ln_)
                    i += 1
                    continue
                cache[slot] = v
            g = (v >> 8) & 255
            code, ln_ = gcodes[g]
            _put_code(bw, code, ln_)
            for ch in ((v >> 16) & 255, v & 255, (v >> 24) & 255):
                code, ln_ = ccodes[ch]
                _put_code(bw, code, ln_)
            i += 1

    if predictor is not None:
        # a single fixed mode over 16px blocks: mode sub-image is
        # constant; residual = pixel - predicted(final neighbors)
        mode, shift = predictor
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(shift - 2, 3)
        bw_blocks = ((w + (1 << shift) - 1) >> shift,
                     (h + (1 << shift) - 1) >> shift)
        sub = np.full((bw_blocks[1], bw_blocks[0]),
                      np.uint32(0xFF000000) | np.uint32(mode << 8),
                      np.uint32)
        emit_entropy_image(sub, 0, 0)
        # forward pass: residual = pixel - prediction(final neighbors)
        # — the final pixels ARE the original image, so predict on it
        res = argb.copy()
        for y in range(h):
            for x in range(w):
                m = mode if (x and y) else 0
                pr = _predict_px(argb, y, x, m, w)
                d = (_chans(argb[y, x]) - pr) & 255
                res[y, x] = ((int(d[0]) << 24) | (int(d[1]) << 16)
                             | (int(d[2]) << 8) | int(d[3]))
        argb = res
    if color is not None:
        g2r, g2b, r2b, shift = color
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(shift - 2, 3)
        cw = (w + (1 << shift) - 1) >> shift
        chh = (h + (1 << shift) - 1) >> shift
        cte = np.uint32(0xFF000000) | np.uint32(
            (r2b << 16) | (g2b << 8) | g2r
        )
        emit_entropy_image(np.full((chh, cw), cte, np.uint32), 0, 0)
        res = argb.copy()
        for y in range(h):
            for x in range(w):
                px = int(argb[y, x])
                a = (px >> 24) & 255
                r = (px >> 16) & 255
                g = (px >> 8) & 255
                b = px & 255
                nr = (r - _color_transform_delta(g2r, g)) & 255
                nb = (b - _color_transform_delta(g2b, g)
                      - _color_transform_delta(r2b, r)) & 255
                res[y, x] = (a << 24) | (nr << 16) | (g << 8) | nb
        argb = res
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        argb = (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
    if palette:
        colors = sorted(set(int(v) for v in argb.reshape(-1)))
        if len(colors) > 256:
            raise ValueError("palette mode needs <= 256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        # delta-code the palette entries per channel
        deltas = []
        prev = 0
        for c in colors:
            e = 0
            for sh in (0, 8, 16, 24):
                e |= ((((c >> sh) & 255) - ((prev >> sh) & 255)) & 255) << sh
            deltas.append(e)
            prev = c
        emit_entropy_image(np.array([deltas], np.uint32), 0, 0)
        lut = {c: i for i, c in enumerate(colors)}
        nc = len(colors)
        wbits = 3 if nc <= 2 else 2 if nc <= 4 else 1 if nc <= 16 else 0
        ppb = 1 << wbits
        ibits = 8 >> wbits
        pw = (w + ppb - 1) // ppb
        packed = np.zeros((h, pw), np.uint32)
        for x in range(w):
            idx = np.array([lut[int(v)] for v in argb[:, x]], np.uint32)
            packed[:, x >> wbits] |= idx << np.uint32(ibits * (x & (ppb - 1)))
        argb = np.uint32(0xFF000000) | (packed << np.uint32(8))
    bw.write(0, 1)  # no more transforms
    # main image: no meta groups (flat codes don't need them)
    hh, ww = argb.shape
    # the main image header order is: cache bit [+bits], meta bit
    bw.write(1 if use_cache_bits else 0, 1)
    if use_cache_bits:
        bw.write(use_cache_bits, 4)
    bw.write(0, 1)  # no meta prefix image

    # re-emit codes + pixels via the shared helper body (inline here
    # because the cache/meta header order differs for the main image)
    ng = 256 + 24 + ((1 << use_cache_bits) if use_cache_bits else 0)
    gl = max(2, (ng - 1).bit_length())
    gcodes = _write_flat_code(bw, ng, gl)
    ccodes = _write_flat_code(bw, 256, 8)
    _write_flat_code(bw, 256, 8)
    _write_flat_code(bw, 256, 8)
    dcodes = _write_flat_code(bw, 40, 6)
    cache = [None] * (1 << use_cache_bits) if use_cache_bits else None
    flat = argb.reshape(-1)
    n = flat.size
    i = 0
    while i < n:
        v = int(flat[i])
        if lz77_min:
            best_len = 0
            best_dist = 0
            for dist in (1, ww):
                if i < dist:
                    continue
                ln = 0
                while (i + ln < n and ln < 4000
                       and flat[i + ln] == flat[i + ln - dist]):
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= lz77_min:
                lc, lev, lnb = _lz77_code(best_len)
                code, ln_ = gcodes[256 + lc]
                _put_code(bw, code, ln_)
                bw.write(lev, lnb)
                dc, dev, dnb = _lz77_code(best_dist + 120)
                code, ln_ = dcodes[dc]
                _put_code(bw, code, ln_)
                bw.write(dev, dnb)
                if cache is not None:
                    for k in range(best_len):
                        pxv = int(flat[i + k])
                        cache[(0x1E35A7BD * pxv & 0xFFFFFFFF)
                              >> (32 - use_cache_bits)] = pxv
                i += best_len
                continue
        if cache is not None:
            slot = (0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - use_cache_bits)
            if cache[slot] == v:
                code, ln_ = gcodes[280 + slot]
                _put_code(bw, code, ln_)
                i += 1
                continue
            cache[slot] = v
        g = (v >> 8) & 255
        code, ln_ = gcodes[g]
        _put_code(bw, code, ln_)
        for ch in ((v >> 16) & 255, v & 255, (v >> 24) & 255):
            code, ln_ = ccodes[ch]
            _put_code(bw, code, ln_)
        i += 1

    payload = b"\x2f" + bw.flush()
    riff = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff


# --- animated WebP (ANIM/ANMF) -------------------------------------------------


def webp_anim_frames(data: bytes) -> list[dict]:
    """Animated WebP -> one dict per ANMF frame: frame_idx, x, y,
    width, height, duration_ms, dispose, blend, and the decoded RGBA
    pixels (container spec: 24-bit LE minus-one geometry fields, the
    sub-chunks are a normal ALPH?+VP8/VP8L still image). This is the
    frame-sampling primitive for the animated share of a crawl —
    compositing onto the canvas is a presentation concern left to the
    consumer, like video players past demux."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WebP payload (RIFF/WEBP)")
    pos = 12
    frames: list[dict] = []
    saw_anim = False
    while pos + 8 <= len(data):
        cc = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise WebpError(f"WebP chunk {cc!r} truncated")
        if cc == b"ANIM":
            saw_anim = True
        elif cc == b"ANMF":
            if len(body) < 16:
                raise WebpError("ANMF header truncated")
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            sub = b"RIFF" + struct.pack("<I", 4 + len(body) - 16) \
                + b"WEBP" + body[16:]
            w, h, px = decode_webp(sub)
            if (w, h) != (fw, fh):
                raise WebpError(
                    f"ANMF frame {len(frames)}: image is {w}x{h}, "
                    f"header says {fw}x{fh}"
                )
            frames.append({
                "frame_idx": len(frames), "x": fx, "y": fy,
                "width": fw, "height": fh, "duration_ms": dur,
                "dispose": flags & 1, "blend": (flags >> 1) & 1,
                "rgba": px,
            })
        pos += 8 + clen + (clen & 1)
    if not saw_anim and not frames:
        raise WebpError("WebP without ANIM/ANMF chunks is not animated")
    return frames


def encode_webp_anim(frames: list[dict], canvas: tuple[int, int],
                     loop_count: int = 0,
                     bgcolor: int = 0) -> bytes:
    """Animated-WebP writer (fixture mirror): each frame dict carries
    x, y, duration_ms and EITHER ``vp8`` (a bare VP8 chunk payload
    from encode_vp8) or ``rgba`` (lossless-coded via
    encode_webp_lossless)."""
    body = bytearray()
    w, h = canvas
    vp8x = (b"VP8X" + struct.pack("<I", 10)
            + bytes([0x02]) + bytes(3)      # animation flag
            + struct.pack("<I", w - 1)[:3]
            + struct.pack("<I", h - 1)[:3])
    body += vp8x
    body += (b"ANIM" + struct.pack("<I", 6)
             + struct.pack("<I", bgcolor)
             + struct.pack("<H", loop_count))
    for fr in frames:
        if "vp8" in fr:
            payload = fr["vp8"]
            chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
            if len(payload) & 1:
                chunk += b"\x00"
            fw = struct.unpack_from("<H", payload, 6)[0] & 0x3FFF
            fh = struct.unpack_from("<H", payload, 8)[0] & 0x3FFF
        else:
            sub = encode_webp_lossless(fr["rgba"])
            chunk = sub[12:]  # the VP8L chunk with header
            fh, fw = fr["rgba"].shape[:2]
        if fr.get("x", 0) % 2 or fr.get("y", 0) % 2:
            raise ValueError("ANMF offsets must be even")
        hdr = (int(fr.get("x", 0) // 2).to_bytes(3, "little")
               + int(fr.get("y", 0) // 2).to_bytes(3, "little")
               + (fw - 1).to_bytes(3, "little")
               + (fh - 1).to_bytes(3, "little")
               + int(fr.get("duration_ms", 100)).to_bytes(3, "little")
               + bytes([fr.get("dispose", 0) | (fr.get("blend", 0) << 1)]))
        anmf = hdr + chunk
        body += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) & 1:
            body += b"\x00"
    return (b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP"
            + bytes(body))


def webp_anim_demux(df):
    """(media_id, payload) -> one row per animated-WebP frame via
    Arrow ``mapInPandas`` (map-only): geometry, timing, blend/dispose
    flags, decoded-pixel stats (hex-digest contract). The animated
    share of a crawl becomes frame rows the multimodal stages consume,
    exactly like demux_media does for video containers."""
    import hashlib

    from pyspark.sql.types import LongType, StructField, StructType

    import pandas as pd

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
        StructField("blend", LongType()),
        StructField("pixel_sum", LongType()),
    ])

    def batches(it):
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                for fr in webp_anim_frames(bytes(raw)):
                    px = fr["rgba"]
                    rows.append((
                        mid, fr["frame_idx"], fr["x"], fr["y"],
                        fr["width"], fr["height"], fr["duration_ms"],
                        fr["blend"],
                        int(px.astype(np.int64).sum()),
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return df.mapInPandas(batches, schema)


def webp_anim_composite(data: bytes) -> tuple[int, int, "Iterator[dict]"]:
    """Animated WebP -> (canvas_w, canvas_h, GENERATOR of frame dicts
    with the FULL composited canvas), per the container spec's (RFC 9649)
    canvas assembly: the canvas starts as the ANIM background color,
    each frame is placed at its (x, y) rectangle with its BLEND
    method (0 = alpha-blend over the canvas with the spec's
    source-over formula, 1 = overwrite the rectangle), and a frame's
    DISPOSE method 1 fills ITS rectangle with the background color
    before the next frame is placed. r12 — closes the r11 boundary
    where ANMF frames were decoded but not composited, so
    frame-sampling an animation yields presentable canvases, not
    patches.

    Alpha blending uses the spec's real-arithmetic source-over
    formula rounded to nearest (documented deviation: libwebp's demux
    uses its own integer approximation; oracles pin THIS formula).
    Each output dict: frame_idx, duration_ms, canvas (HxWx4 RGBA).

    Frames are YIELDED one composited canvas at a time (r13, ADVICE):
    memory stays O(canvas_area), not O(n_frames × canvas_area) — a
    wild animation with hundreds of frames at a large canvas streams
    through a consumer (webp_anim_canvas hashes one canvas per row)
    without holding every copy simultaneously. Container parsing and
    geometry validation happen EAGERLY (errors raise at call time);
    only per-frame compositing is lazy."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WebP payload (RIFF/WEBP)")
    cw = ch = None
    bg = (0, 0, 0, 0)
    pos = 12
    while pos + 8 <= len(data):
        cc = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise WebpError(f"WebP chunk {cc!r} truncated")
        if cc == b"VP8X":
            if clen < 10:
                raise WebpError("VP8X chunk truncated")
            cw = int.from_bytes(body[4:7], "little") + 1
            ch = int.from_bytes(body[7:10], "little") + 1
        elif cc == b"ANIM":
            if clen < 6:
                raise WebpError("ANIM chunk truncated")
            # spec: 32-bit background color in B,G,R,A byte order
            bg = (body[2], body[1], body[0], body[3])
        pos += 8 + clen + (clen & 1)
    if cw is None:
        raise WebpError("animated WebP lacks a VP8X canvas size")
    frames = webp_anim_frames(data)
    # validate geometry eagerly so callers get typed errors at call
    # time, before consuming the lazy composite
    for fr in frames:
        x, y, w, h = fr["x"], fr["y"], fr["width"], fr["height"]
        if x + w > cw or y + h > ch:
            raise WebpError(
                f"ANMF frame {fr['frame_idx']} rectangle "
                f"{w}x{h}@{x},{y} exceeds the {cw}x{ch} canvas"
            )

    def composite():
        canvas = np.empty((ch, cw, 4), np.uint8)
        canvas[:, :] = bg
        prev_rect = None
        prev_dispose = 0
        for fr in frames:
            if prev_dispose == 1 and prev_rect is not None:
                px0, py0, pw, phh = prev_rect
                canvas[py0:py0 + phh, px0:px0 + pw] = bg
            x, y, w, h = fr["x"], fr["y"], fr["width"], fr["height"]
            src = fr["rgba"].astype(np.float64)
            if fr["blend"] == 1:
                canvas[y:y + h, x:x + w] = fr["rgba"]
            else:
                dst = canvas[y:y + h, x:x + w].astype(np.float64)
                a_s = src[:, :, 3:4] / 255.0
                a_d = dst[:, :, 3:4] / 255.0
                a_o = a_s + a_d * (1.0 - a_s)
                rgb = np.where(
                    a_o > 0,
                    (src[:, :, :3] * a_s + dst[:, :, :3] * a_d * (1.0 - a_s))
                    / np.where(a_o > 0, a_o, 1.0),
                    0.0,
                )
                blended = np.concatenate([rgb, a_o * 255.0], axis=2)
                canvas[y:y + h, x:x + w] = \
                    np.rint(blended).clip(0, 255).astype(np.uint8)
            yield {
                "frame_idx": fr["frame_idx"],
                "duration_ms": fr["duration_ms"],
                "canvas": canvas.copy(),
            }
            prev_rect = (x, y, w, h)
            prev_dispose = fr["dispose"]

    return cw, ch, composite()


def webp_anim_canvas(df):
    """(media_id, payload) -> one row per COMPOSITED animation frame
    via Arrow ``mapInPandas`` (map-only): full-canvas geometry,
    timing, and the canvas digest under the hex contract (RGBA bytes
    are non-ASCII). This is what mm_frame_sample-style sampling
    consumes for the animated share of a crawl — canvases, not
    patches."""
    import hashlib

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    import pandas as pd

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("duration_ms", LongType()),
        StructField("canvas_w", LongType()),
        StructField("canvas_h", LongType()),
        StructField("canvas_sum", LongType()),
        StructField("canvas_md5", StringType()),
    ])

    def batches(it):
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                cw, ch, frames = webp_anim_composite(bytes(raw))
                for fr in frames:
                    cv = fr["canvas"]
                    rows.append((
                        mid, fr["frame_idx"], fr["duration_ms"], cw, ch,
                        int(cv.astype(np.int64).sum()),
                        hashlib.md5(
                            cv.tobytes().hex().encode()).hexdigest(),
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return df.mapInPandas(batches, schema)
