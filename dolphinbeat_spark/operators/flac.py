"""FLAC decode from scratch — RFC 9639 / the xiph FLAC format spec.

Closes the "perceptual codecs raise by name" boundary for the one
LOSSLESS audio codec whose format is fully public and whose decode
needs no entropy library: Rice-coded linear prediction over raw bits.
Covered: STREAMINFO + metadata-block walk, frame headers (all block
size / sample rate / sample size codes, UTF-8-style coded frame and
sample numbers, CRC-8), subframes CONSTANT / VERBATIM / FIXED orders
0-4 / LPC orders 1-32 (quantized coefficients, signed shift), Rice
residual partitions (4- and 5-bit parameters, escape-to-raw
partitions), wasted bits, stereo decorrelation (left-side /
right-side / mid-side with the side channel's extra bit), frame
CRC-16, and the STREAMINFO MD5 self-check over the decoded samples —
so ANY real-world file verifies itself end to end at decode time.

No FLAC tooling exists in this container (no flac/ffmpeg/libsndfile),
so the verification stance is the GIF one (tests/test_multimodal.py):
the decoder is pinned by hand-assembled bit vectors computed from the
spec (Rice zigzag, fixed predictor recurrences, mid-side
reconstruction) independent of the encoder, plus encoder->decoder
roundtrips across every subframe type / stereo mode / partition
shape, and the embedded-MD5 check rejects any divergence loudly.

Reference parity: the reference repo ships no audio codecs (its sinks
move bytes); this sits on the multimodal decode path the reference
lacks. At 100 TB the decode runs one-clip-per-row inside the same
Arrow ``mapInPandas`` slot as the other codecs
(operators/multimodal.py::decode_audio).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacError(ValueError):
    """Typed FLAC format error — every malformed byte surfaces as this
    (or NotImplementedError for honest capability boundaries)."""


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8 = _crc_table(0x07, 8)        # x^8 + x^2 + x + 1, init 0
_CRC16 = _crc_table(0x8005, 16)    # x^16 + x^15 + x^2 + 1, init 0


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16[(r >> 8) ^ b] ^ ((r << 8) & 0xFFFF)
    return r


class _Bits:
    """MSB-first bit reader with byte-offset access for the CRC spans
    (frame headers and frames are byte-aligned by construction)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte offset
        self.bit = 0    # bits consumed within data[pos]

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.data):
                raise FlacError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise FlacError("FLAC unary run absurdly long")
        return q

    def align(self) -> None:
        if self.bit:
            if self.read(8 - self.bit):
                raise FlacError("FLAC frame padding bits not zero")


def _coded_number(br: _Bits) -> int:
    """The UTF-8-style frame/sample number (RFC 9639 §9.1.5: like
    UTF-8 but up to 36 bits in 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    ncont = 0
    mask = 0x40
    while b0 & mask:
        ncont += 1
        mask >>= 1
    if ncont < 1 or ncont > 6:
        raise FlacError(f"invalid coded-number lead byte {b0:#04x}")
    v = b0 & (mask - 1)
    for _ in range(ncont):
        c = br.read(8)
        if c >> 6 != 0b10:
            raise FlacError(f"invalid coded-number continuation {c:#04x}")
        v = (v << 6) | (c & 0x3F)
    return v


#: frame-header sample-rate code -> Hz (None = read from stream side)
_RATES = {0x1: 88200, 0x2: 176400, 0x3: 192000, 0x4: 8000, 0x5: 16000,
          0x6: 22050, 0x7: 24000, 0x8: 32000, 0x9: 44100, 0xA: 48000,
          0xB: 96000}
#: frame-header sample-size code -> bits
_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: fixed-predictor coefficients by order (RFC 9639 §9.2.4)
_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_residual(br: _Bits, bs: int, order: int) -> list[int]:
    """One coded residual (RFC 9639 §9.2.7): Rice partitions with
    4- or 5-bit parameters and escape-to-raw partitions."""
    method = br.read(2)
    if method > 1:
        raise FlacError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise FlacError("block size not divisible by partition count")
    out: list[int] = []
    for p in range(nparts):
        n = (bs >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise FlacError("predictor order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw:
                out.extend(br.sread(raw) for _ in range(n))
            else:
                out.extend(0 for _ in range(n))
        else:
            for _ in range(n):
                q = br.unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _read_subframe(br: _Bits, bs: int, bps: int) -> list[int]:
    if br.read(1):
        raise FlacError("subframe header padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    bps -= wasted
    if bps <= 0:
        raise FlacError("wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        samples = [br.sread(bps)] * bs
    elif stype == 1:  # VERBATIM
        samples = [br.sread(bps) for _ in range(bs)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        samples = [br.sread(bps) for _ in range(order)]
        res = _read_residual(br, bs, order)
        coefs = _FIXED[order]
        for r in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        samples = [br.sread(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise FlacError("invalid LPC coefficient precision code 1111")
        shift = br.sread(5)
        if shift < 0:
            raise FlacError("negative LPC shift is forbidden (RFC 9639)")
        coefs = [br.sread(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        for r in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + (pred >> shift))
    else:
        raise FlacError(f"reserved subframe type {stype:#08b}")
    if len(samples) != bs:
        raise FlacError("subframe sample count mismatch")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """FLAC → (sample_rate, channels, n_interleaved, samples): the
    same contract as multimodal.decode_wav — a 1-D channel-interleaved
    int16 (bps ≤ 16) or int32 array. Verifies frame CRC-8/CRC-16 and,
    when the header carries one, the STREAMINFO MD5 of the decoded
    samples — a real-world file self-checks end to end."""
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("FLAC metadata truncated")
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise FlacError("FLAC metadata block truncated")
        pos += 4 + blen
        if btype == 0:
            if blen != 34:
                raise FlacError(f"STREAMINFO length {blen} != 34")
            info = body
        elif btype == 127:
            raise FlacError("invalid metadata block type 127")
        if last:
            break
    if info is None:
        raise FlacError("FLAC stream missing STREAMINFO")
    b = _Bits(info)
    b.read(16)  # min block size
    b.read(16)  # max block size
    b.read(24)  # min frame size
    b.read(24)  # max frame size
    si_rate = b.read(20)
    si_nch = b.read(3) + 1
    si_bps = b.read(5) + 1
    total = b.read(36)
    md5_want = info[18:34]

    chans: list[list[int]] = [[] for _ in range(si_nch)]
    rate = si_rate
    while pos < len(data):
        fstart = pos
        br = _Bits(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise FlacError(f"bad frame sync {sync:#06x} at byte {fstart}")
        if br.read(1):
            raise FlacError("frame header reserved bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        sz_code = br.read(3)
        if br.read(1):
            raise FlacError("frame header reserved bit set")
        _coded_number(br)
        if bs_code == 0:
            raise FlacError("reserved block size code 0000")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            pass  # streaminfo rate
        elif sr_code in _RATES:
            rate = _RATES[sr_code]
        elif sr_code == 0xC:
            rate = br.read(8) * 1000
        elif sr_code == 0xD:
            rate = br.read(16)
        elif sr_code == 0xE:
            rate = br.read(16) * 10
        else:
            raise FlacError("invalid sample rate code 1111")
        if ch_code <= 7:
            nch, decor = ch_code + 1, None
        elif ch_code <= 10:
            nch, decor = 2, ("left", "right", "mid")[ch_code - 8]
        else:
            raise FlacError(f"reserved channel assignment {ch_code}")
        if nch != si_nch:
            raise FlacError("frame channel count differs from STREAMINFO")
        if sz_code == 0:
            bps = si_bps
        elif sz_code in _SIZES:
            bps = _SIZES[sz_code]
        else:
            raise FlacError("reserved sample size code 011")
        if _crc8(data[fstart:br.pos]) != br.read(8):
            raise FlacError("frame header CRC-8 mismatch")
        subs = []
        for c in range(nch):
            extra = int(
                decor == "left" and c == 1
                or decor == "right" and c == 0
                or decor == "mid" and c == 1
            )
            subs.append(_read_subframe(br, bs, bps + extra))
        br.align()
        if _crc16(data[fstart:br.pos]) != br.read(16):
            raise FlacError("frame CRC-16 mismatch")
        pos = br.pos
        if decor == "left":  # ch0 = left, ch1 = side = left - right
            left, side = subs
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif decor == "right":  # ch0 = side, ch1 = right
            side, right = subs
            subs = [[s + r for s, r in zip(side, right)], right]
        elif decor == "mid":  # RFC 9639 §9.2.2 reconstruction
            mid, side = subs
            rebuilt_l, rebuilt_r = [], []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                rebuilt_l.append((m + s) >> 1)
                rebuilt_r.append((m - s) >> 1)
            subs = [rebuilt_l, rebuilt_r]
        for c in range(nch):
            chans[c].extend(subs[c])
    nframes = len(chans[0])
    if total and nframes != total:
        raise FlacError(
            f"decoded {nframes} samples/channel, STREAMINFO says {total}"
        )
    # explicit little-endian so downstream digests are platform-stable
    dtype = np.dtype("<i2") if si_bps <= 16 else np.dtype("<i4")
    out = np.empty(nframes * si_nch, dtype)
    for c in range(si_nch):
        out[c::si_nch] = np.asarray(chans[c], np.int64).astype(dtype)
    if md5_want != bytes(16):
        nbytes = (si_bps + 7) // 8
        le = out.astype(np.int64)
        buf = np.zeros((le.size, nbytes), np.uint8)
        for i in range(nbytes):
            buf[:, i] = (le >> (8 * i)) & 0xFF
        if hashlib.md5(buf.tobytes()).digest() != md5_want:
            raise FlacError("decoded samples fail the STREAMINFO MD5 check")
    return rate, si_nch, out.size, out


# --- encoder (fixture generator) --------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _write_coded_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    conts = []
    nbits = v.bit_length()
    ncont = 1
    while nbits > 6 - ncont + 6 * ncont:
        ncont += 1
    for i in range(ncont):
        conts.append(0x80 | ((v >> (6 * (ncont - 1 - i))) & 0x3F))
    lead_bits = 6 - ncont
    lead = (0xFF << (lead_bits + 1)) & 0xFF | (v >> (6 * ncont))
    bw.write(lead, 8)
    for c in conts:
        bw.write(c, 8)


def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum((v << 1) ^ (v >> 63) if v < 0 else v << 1 for v in res)
    mean = max(1, mean // len(res))
    return min(14, max(0, mean.bit_length() - 1))


def _write_residual(bw: _BitWriter, res: list[int], order: int, bs: int,
                    porder: int, escape_parts: set[int] | None = None) -> None:
    bw.write(0, 2)  # 4-bit Rice parameters
    bw.write(porder, 4)
    nparts = 1 << porder
    off = 0
    for p in range(nparts):
        n = (bs >> porder) - (order if p == 0 else 0)
        part = res[off:off + n]
        off += n
        if escape_parts and p in escape_parts:
            raw = max((abs(v).bit_length() + 1 for v in part), default=1)
            bw.write(0xF, 4)
            bw.write(raw, 5)
            for v in part:
                bw.write(v, raw)
            continue
        param = _rice_param(part)
        bw.write(param, 4)
        for v in part:
            u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
            q = u >> param
            bw.write(0, q)
            bw.write(1, 1)
            bw.write(u, param)


def _write_subframe(bw: _BitWriter, s: list[int], bps: int, force,
                    porder: int, escape_parts) -> None:
    bs = len(s)
    if force == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in s:
            bw.write(v, bps)
        return
    if (force == "constant" or force is None) and len(set(s)) == 1:
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(s[0], bps)
        return
    if force == "constant":
        raise ValueError("constant subframe forced on non-constant data")
    if isinstance(force, tuple) and force[0] == "lpc":
        _, coefs, prec, shift = force
        order = len(coefs)
        if bs <= order:
            raise ValueError("block shorter than LPC order")
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write(v, bps)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, prec)
        res = []
        for i in range(order, bs):
            pred = sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
            res.append(s[i] - (pred >> shift))
        _write_residual(bw, res, order, bs, porder, escape_parts)
        return
    # FIXED: forced order or the best of 0..4 by absolute residual sum
    if isinstance(force, tuple) and force[0] == "fixed":
        orders = [force[1]]
    else:
        orders = [o for o in range(5) if bs > o]
    best = None
    for o in orders:
        coefs = _FIXED[o]
        res = [
            s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(o, bs)
        ]
        cost = sum(abs(r) for r in res)
        if best is None or cost < best[2]:
            best = (o, res, cost)
    order, res, _ = best
    bw.write(0, 1)
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for v in s[:order]:
        bw.write(v, bps)
    _write_residual(bw, res, order, bs, porder, escape_parts)


def encode_flac(samples: np.ndarray, sample_rate: int, bits: int = 16,
                block_size: int = 4096, stereo_mode: str | None = None,
                force=None, partition_order: int = 0,
                escape_parts: set[int] | None = None) -> bytes:
    """Format-faithful FLAC writer — the fixture generator for
    :func:`decode_flac` (same stance as the GIF/JPEG writers: the
    DECODER is the operator under test; hand-built vectors pin it
    independently). ``samples`` is (n, channels) int. ``stereo_mode``
    in {None/'independent', 'left-side', 'right-side', 'mid-side'};
    ``force`` in {None, 'verbatim', 'constant', ('fixed', order),
    ('lpc', coefs, precision, shift)}; ``partition_order`` /
    ``escape_parts`` shape the Rice partitions."""
    samples = np.asarray(samples, np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    lim = 1 << (bits - 1)
    if samples.min(initial=0) < -lim or samples.max(initial=0) >= lim:
        raise ValueError(f"samples exceed {bits}-bit range")
    if stereo_mode in (None, "independent"):
        stereo_mode = None
    elif nch != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")

    # STREAMINFO MD5: interleaved LE, ceil(bits/8) bytes per sample
    nbytes = (bits + 7) // 8
    inter = samples.reshape(-1)
    buf = np.zeros((inter.size, nbytes), np.uint8)
    for i in range(nbytes):
        buf[:, i] = (inter >> (8 * i)) & 0xFF
    md5 = hashlib.md5(buf.tobytes()).digest()

    tail = n % block_size
    si = _BitWriter()
    si.write(min(block_size, tail or block_size), 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    info = bytes(si.out) + md5
    out = bytearray(b"fLaC")
    out.append(0x80)  # last block, STREAMINFO
    out += struct.pack(">I", len(info))[1:]
    out += info

    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start:start + block_size]
        bs = blk.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed block size strategy
        if bs == 192:
            bs_code, bs_extra = 1, None
        elif bs in (576, 1152, 2304, 4608):
            bs_code, bs_extra = 2 + (bs // 576).bit_length() - 1, None
        elif bs in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bs_code, bs_extra = 8 + (bs // 256).bit_length() - 1, None
        elif bs <= 256:
            bs_code, bs_extra = 6, (bs - 1, 8)
        else:
            bs_code, bs_extra = 7, (bs - 1, 16)
        bw.write(bs_code, 4)
        sr_code = next(
            (k for k, v in _RATES.items() if v == sample_rate), None
        )
        sr_extra = None
        if sr_code is None:
            if sample_rate < 65536:
                sr_code, sr_extra = 0xD, (sample_rate, 16)
            else:
                sr_code = 0
        bw.write(sr_code, 4)
        if stereo_mode is None:
            bw.write(nch - 1, 4)
        else:
            bw.write({"left-side": 8, "right-side": 9, "mid-side": 10}
                     [stereo_mode], 4)
        sz_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits]
        bw.write(sz_code, 3)
        bw.write(0, 1)
        _write_coded_number(bw, frame_no)
        if bs_extra:
            bw.write(*bs_extra)
        if sr_extra:
            bw.write(*sr_extra)
        hdr = bytes(bw.out)
        if bw.nbits:
            raise AssertionError("frame header must be byte-aligned")
        bw.write(_crc8(hdr), 8)
        if stereo_mode is None:
            chans = [(blk[:, c].tolist(), bits) for c in range(nch)]
        else:
            left, right = blk[:, 0].tolist(), blk[:, 1].tolist()
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left-side":
                chans = [(left, bits), (side, bits + 1)]
            elif stereo_mode == "right-side":
                chans = [(side, bits + 1), (right, bits)]
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                chans = [(mid, bits), (side, bits + 1)]
        for s, bps in chans:
            _write_subframe(bw, s, bps, force, partition_order, escape_parts)
        bw.align()
        frame = bytes(bw.out)
        bw.write(_crc16(frame), 16)
        out += bw.out
        frame_no += 1
    return bytes(out)
