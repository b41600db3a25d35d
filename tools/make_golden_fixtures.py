#!/usr/bin/env python3
"""Generate tests/fixtures/golden/* — INDEPENDENT golden fixtures for
the round-9 codecs (ADVICE r9, medium): every byte here is derived
directly from the PUBLIC specs inside this tool, which imports
NOTHING from dolphinbeat_spark — so a matched encoder/decoder
deviation in the repo's writer mirrors cannot leak into these pins.

Fixtures:
  golden/const_verbatim_fixed.flac  — hand-assembled per RFC 9639:
      STREAMINFO (with the real MD5 of the unencoded samples),
      one frame with CONSTANT + VERBATIM subframes and a second
      frame with a FIXED order-1 subframe under Rice coding;
      CRC-8/CRC-16 computed bit-by-bit from the spec polynomials.
  golden/solid.webp / checker.webp  — hand-assembled VP8L (RFC 9649):
      simple prefix codes (1- and 2-symbol), LSB-first bit writer.
  golden/plain.tiff / packbits.tiff — hand-assembled TIFF 6.0 IFDs;
      the PackBits strip is the SPEC'S OWN §9 worked example bytes.
  golden/rle8.bmp                   — hand-assembled BI_RLE8 runs per
      the public BITMAPINFOHEADER docs (runs, absolute mode, EOL,
      EOB), bottom-up.
  golden/stdlib.aiff / stdlib.aifc  — written by the STDLIB ``aifc``
      module (an independent implementation of AIFF-1.3/AIFF-C).
  golden/lacing.ogg                 — hand-assembled RFC 3533 pages
      with a bit-by-bit CRC (poly 0x04C11DB7, unreflected).
  golden/hand.mkv                   — hand-assembled Matroska EBML
      (vints, Info/Tracks/Cluster/SimpleBlock) per the public spec.
  golden/hand.mp3                   — hand-assembled MPEG-1 Layer III
      frame headers (ISO 11172-3 length formula) + an ID3v2.3 tag.

Expected decode values are printed at generation time and pinned in
tests/test_golden_fixtures.py.
"""

from __future__ import annotations

import hashlib
import pathlib
import struct

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "golden"


# --- bit writers ---------------------------------------------------------------


class MsbWriter:
    """MSB-first bit accumulator (FLAC)."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_unary(self, q: int):
        self.bits.extend([0] * q + [1])

    def pad_to_byte(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class LsbWriter:
    """LSB-first bit accumulator (VP8L)."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def crc8_flac(data: bytes) -> int:
    """CRC-8 poly 0x07, init 0 — bit-by-bit per the FLAC spec."""
    r = 0
    for byte in data:
        r ^= byte
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def crc16_flac(data: bytes) -> int:
    """CRC-16 poly 0x8005, init 0 — bit-by-bit."""
    r = 0
    for byte in data:
        r ^= byte << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 \
                else (r << 1) & 0xFFFF
    return r


# --- FLAC ----------------------------------------------------------------------

BLOCK = 16
RATE = 44100
CONST_VAL = -1234
VERB = [100, -100, 2000, -2000, 7, -7, 32000, -32000,
        1, 2, 3, 4, -1, -2, -3, -4]
FIX_SAMPLES = [10, 13, 17, 20, 22, 25, 29, 30, 28, 25, 21, 20, 18, 15, 11, 10]
CONST2 = 555


def flac_frame(frame_no: int, subframes) -> bytes:
    """One fixed-blocksize frame: header + subframes + CRC-16."""
    hdr = bytearray(b"\xff\xf8")  # sync 11111111 111110, reserved 0, fixed
    hdr.append((0b0110 << 4) | 0b1001)  # blocksize: 8-bit at end; 44.1 kHz
    hdr.append((0b0001 << 4) | (0b100 << 1))  # stereo independent; 16 bps
    hdr.append(frame_no)  # UTF-8 coded number (frame_no < 128)
    hdr.append(BLOCK - 1)  # 8-bit blocksize-1
    hdr.append(crc8_flac(bytes(hdr)))
    w = MsbWriter()
    for kind, payload in subframes:
        if kind == "constant":
            w.write(0, 1)
            w.write(0b000000, 6)
            w.write(0, 1)
            w.write(payload & 0xFFFF, 16)
        elif kind == "verbatim":
            w.write(0, 1)
            w.write(0b000001, 6)
            w.write(0, 1)
            for s in payload:
                w.write(s & 0xFFFF, 16)
        elif kind == "fixed1":
            # FIXED order 1: type 001000|order(1) = 0b001001
            w.write(0, 1)
            w.write(0b001001, 6)
            w.write(0, 1)
            w.write(payload[0] & 0xFFFF, 16)  # warmup sample
            # residual: method 00 (4-bit Rice), partition order 0
            w.write(0b00, 2)
            w.write(0, 4)
            k = 2
            w.write(k, 4)  # Rice parameter for the single partition
            for i in range(1, BLOCK):
                r = payload[i] - payload[i - 1]
                zz = 2 * r if r >= 0 else -2 * r - 1
                w.write_unary(zz >> k)
                w.write(zz & ((1 << k) - 1), k)
        else:  # pragma: no cover
            raise AssertionError(kind)
    w.pad_to_byte()
    body = bytes(hdr) + w.bytes()
    return body + struct.pack(">H", crc16_flac(body))


def build_flac() -> tuple[bytes, list[int]]:
    # interleaved expected samples: frame 0 (const, verbatim),
    # frame 1 (fixed1, const2)
    inter: list[int] = []
    for i in range(BLOCK):
        inter += [CONST_VAL, VERB[i]]
    for i in range(BLOCK):
        inter += [FIX_SAMPLES[i], CONST2]
    raw = b"".join(struct.pack("<h", s) for s in inter)
    md5 = hashlib.md5(raw).digest()
    si = MsbWriter()
    si.write(BLOCK, 16)  # min blocksize
    si.write(BLOCK, 16)  # max blocksize
    si.write(0, 24)      # min frame size unknown
    si.write(0, 24)      # max frame size unknown
    si.write(RATE, 20)
    si.write(1, 3)       # channels - 1
    si.write(15, 5)      # bps - 1
    si.write(2 * BLOCK, 36)  # total samples per channel
    streaminfo = si.bytes() + md5
    assert len(streaminfo) == 34
    out = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") \
        + streaminfo
    out += flac_frame(0, [("constant", CONST_VAL), ("verbatim", VERB)])
    out += flac_frame(1, [("fixed1", FIX_SAMPLES), ("constant", CONST2)])
    return out, inter


# --- VP8L WebP -------------------------------------------------------------------


def _vp8l_simple_tree(w: LsbWriter, symbols: list[int]):
    """RFC 9649 'simple code length code': 1-2 symbols."""
    w.write(1, 1)  # simple
    w.write(len(symbols) - 1, 1)
    w.write(1, 1)  # first symbol in 8 bits
    w.write(symbols[0], 8)
    if len(symbols) == 2:
        w.write(symbols[1], 8)


def build_webp_solid(width: int, height: int, rgba) -> bytes:
    r, g, b, a = rgba
    w = LsbWriter()
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta prefix codes
    _vp8l_simple_tree(w, [g])  # green / literal
    _vp8l_simple_tree(w, [r])
    _vp8l_simple_tree(w, [b])
    _vp8l_simple_tree(w, [a])
    _vp8l_simple_tree(w, [0])  # distance
    payload = b"\x2f" + w.bytes()
    riff = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff


def build_webp_checker(width: int, height: int, g0: int, g1: int,
                       rba) -> bytes:
    """Two-symbol green tree: pixel (x+y) even -> g0, odd -> g1
    (1-bit codes: symbol order as written)."""
    r, b, a = rba
    w = LsbWriter()
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)
    w.write(0, 3)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 1)
    _vp8l_simple_tree(w, [g0, g1])
    _vp8l_simple_tree(w, [r])
    _vp8l_simple_tree(w, [b])
    _vp8l_simple_tree(w, [a])
    _vp8l_simple_tree(w, [0])
    for y in range(height):
        for x in range(width):
            w.write(0 if (x + y) % 2 == 0 else 1, 1)
    payload = b"\x2f" + w.bytes()
    riff = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff


# --- TIFF ----------------------------------------------------------------------

#: the TIFF 6.0 §9 PackBits worked example: compressed -> unpacked
PACKBITS_SPEC_COMPRESSED = bytes.fromhex(
    "FEAA02800A2AFDAA03800A2A22F7AA"
)
PACKBITS_SPEC_UNPACKED = bytes.fromhex(
    "AAAAAA800A2AAAAAAAAA800A2A22AAAAAAAAAAAAAAAAAAAA"
)


def _tiff(entries: list[tuple[int, int, int, bytes]],
          strip: bytes) -> bytes:
    """Minimal little-endian TIFF: IFD + one strip. ``entries``:
    (tag, type, count, packed_value_or_payload)."""
    n = len(entries) + 2  # + StripOffsets, StripByteCounts
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    extra = bytearray()
    rows = []
    for tag, typ, count, payload in entries:
        if len(payload) <= 4:
            val = payload + bytes(4 - len(payload))
        else:
            val = struct.pack("<I", data_off + len(extra))
            extra += payload
        rows.append((tag, typ, count, val))
    strip_off = data_off + len(extra)
    rows.append((273, 4, 1, struct.pack("<I", strip_off)))
    rows.append((279, 4, 1, struct.pack("<I", len(strip))))
    rows.sort(key=lambda e: e[0])
    table = b"".join(struct.pack("<HHI", t, ty, c) + v
                     for t, ty, c, v in rows)
    return (b"II*\x00" + struct.pack("<I", ifd_off)
            + struct.pack("<H", n) + table + struct.pack("<I", 0)
            + bytes(extra) + strip)


def build_tiff_plain() -> tuple[bytes, bytes]:
    px = bytes(range(2 * 3 * 3))  # 2 wide, 3 tall, RGB
    t = _tiff([
        (256, 4, 1, struct.pack("<I", 2)),
        (257, 4, 1, struct.pack("<I", 3)),
        (258, 3, 3, struct.pack("<HHH", 8, 8, 8)),
        (259, 3, 1, struct.pack("<H", 1)),
        (262, 3, 1, struct.pack("<H", 2)),
        (277, 3, 1, struct.pack("<H", 3)),
        (278, 4, 1, struct.pack("<I", 3)),
    ], px)
    return t, px


def build_tiff_packbits() -> tuple[bytes, bytes]:
    # the spec's unpacked example is 24 bytes -> a 24x1 gray image
    t = _tiff([
        (256, 4, 1, struct.pack("<I", 24)),
        (257, 4, 1, struct.pack("<I", 1)),
        (258, 3, 1, struct.pack("<H", 8)),
        (259, 3, 1, struct.pack("<H", 32773)),
        (262, 3, 1, struct.pack("<H", 1)),
        (277, 3, 1, struct.pack("<H", 1)),
        (278, 4, 1, struct.pack("<I", 1)),
    ], PACKBITS_SPEC_COMPRESSED)
    return t, PACKBITS_SPEC_UNPACKED


# --- BMP (BI_RLE8) --------------------------------------------------------------


def build_bmp_rle8() -> tuple[bytes, list[list[int]]]:
    """6x2 8-bit BI_RLE8: encoded run [03 1F] + absolute [00 03 41 42
    43 + pad] + EOL for the BOTTOM row, [02 07][04 09] + EOL for the
    top row, then EOB — the three escape modes of the public spec."""
    rle = bytes([
        0x03, 0x1F, 0x00, 0x03, 0x41, 0x42, 0x43, 0x00, 0x00, 0x00,
        0x02, 0x07, 0x04, 0x09, 0x00, 0x00,
        0x00, 0x01,
    ])
    # palette: index i -> (B,G,R,0) = (i, 255-i, i^0x5A, 0)
    pal = b"".join(bytes([i, 255 - i, i ^ 0x5A, 0]) for i in range(256))
    ihdr = struct.pack("<IiiHHIIiiII", 40, 6, 2, 1, 8, 1, len(rle),
                       0, 0, 256, 0)
    pix_off = 14 + 40 + len(pal)
    fhdr = struct.pack("<2sIHHI", b"BM", pix_off + len(rle), 0, 0, pix_off)
    # expected indices: bottom row first in the stream
    bottom = [0x1F, 0x1F, 0x1F, 0x41, 0x42, 0x43]
    top = [0x07, 0x07, 0x09, 0x09, 0x09, 0x09]
    return fhdr + ihdr + pal + rle, [top, bottom]


# --- Ogg ------------------------------------------------------------------------


def ogg_crc_bitwise(data: bytes) -> int:
    """RFC 3533 CRC: poly 0x04C11DB7, unreflected, init/xorout 0 —
    bit-by-bit (no table), an independent implementation shape."""
    r = 0
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            top = (r >> 31) & 1
            r = ((r << 1) & 0xFFFFFFFF) | bit
            if top:
                r ^= 0x04C11DB7
    # push 32 zero bits through (the MSB-first shift formulation)
    for _ in range(32):
        top = (r >> 31) & 1
        r = (r << 1) & 0xFFFFFFFF
        if top:
            r ^= 0x04C11DB7
    return r


def build_ogg() -> tuple[bytes, list[bytes]]:
    """Two pages, one stream: BOS page with a 255*2+5-byte packet
    (lacing [255,255,5]) + a 255-byte packet needing the terminating
    0 on the same page; EOS page with a short packet."""
    p0 = bytes((i * 3) % 256 for i in range(515))
    p1 = b"Q" * 255
    p2 = b"eos packet"

    def page(htype, seq, granule, packets_laces, body):
        hdr = bytearray(b"OggS") + bytes([0, htype])
        hdr += struct.pack("<qIIIB", granule, 0x5150, seq, 0,
                           len(packets_laces))
        hdr += bytes(packets_laces)
        pg = bytearray(hdr + body)
        pg[22:26] = struct.pack("<I", ogg_crc_bitwise(bytes(pg)))
        return bytes(pg)

    pg0 = page(0x02, 0, 2, [255, 255, 5, 255, 0], p0 + p1)
    pg1 = page(0x04, 1, 3, [len(p2)], p2)
    return pg0 + pg1, [p0, p1, p2]


# --- Matroska -------------------------------------------------------------------


def _vint(value: int, length: int | None = None) -> bytes:
    """EBML vint with the length marker bit."""
    if length is None:
        length = 1
        while value >= (1 << (7 * length)) - 1:
            length += 1
    out = value | (1 << (7 * length))
    return out.to_bytes(length, "big")


def _el(eid: int, content: bytes) -> bytes:
    nid = eid.bit_length() + 7 >> 3
    return eid.to_bytes(nid, "big") + _vint(len(content)) + content


def _uint(v: int) -> bytes:
    n = max((v.bit_length() + 7) // 8, 1)
    return v.to_bytes(n, "big")


def build_mkv() -> tuple[bytes, list[bytes]]:
    frames = [b"frame-zero!", b"frame-one", b"frame-2"]
    ebml = _el(0x1A45DFA3,
               _el(0x4286, _uint(1)) + _el(0x42F7, _uint(1))
               + _el(0x42F2, _uint(4)) + _el(0x42F3, _uint(8))
               + _el(0x4282, b"matroska")
               + _el(0x4287, _uint(4)) + _el(0x4285, _uint(2)))
    info = _el(0x1549A966, _el(0x2AD7B1, _uint(1_000_000)))
    track = _el(0xAE,
                _el(0xD7, _uint(1)) + _el(0x73C5, _uint(0xDEAD))
                + _el(0x83, _uint(2))  # audio
                + _el(0x86, b"A_OPUS"))
    tracks = _el(0x1654AE6B, track)
    blocks = b""
    for i, fr in enumerate(frames):
        # SimpleBlock: track vint 1, 16-bit rel timestamp, flags 0x80
        blocks += _el(0xA3, _vint(1) + struct.pack(">h", i * 20)
                      + bytes([0x80]) + fr)
    cluster = _el(0x1F43B675, _el(0xE7, _uint(1000)) + blocks)
    segment = _el(0x18538067, info + tracks + cluster)
    return ebml + segment, frames


# --- MP3 ------------------------------------------------------------------------


def build_mp3() -> tuple[bytes, list[int]]:
    """Two MPEG-1 Layer III frames (128 kbps / 44100 Hz -> 417 bytes;
    192 kbps padded -> 627+1) behind an ID3v2.3 tag with a TIT2
    frame."""
    def frame(bitrate_idx: int, padding: int, fill: int) -> bytes:
        # ISO 11172-3: AAAAAAAA AAABBCCD EEEEFFGH ........
        b1 = 0xFF
        b2 = 0xFB  # MPEG1, Layer III, no CRC
        b3 = (bitrate_idx << 4) | (0 << 2) | (padding << 1)
        b4 = 0
        bitrates = {9: 128000, 11: 192000}
        length = 144 * bitrates[bitrate_idx] // 44100 + padding
        body = bytes([b1, b2, b3, b4]) + bytes([fill]) * (length - 4)
        return body

    title = "Golden"
    tit2 = b"TIT2" + struct.pack(">I", 1 + len(title)) + b"\x00\x00" \
        + b"\x00" + title.encode("latin-1")
    tag_body = tit2
    n = len(tag_body)
    syncsafe = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                      (n >> 7) & 0x7F, n & 0x7F])
    id3 = b"ID3\x03\x00\x00" + syncsafe + tag_body
    f0 = frame(9, 0, 0x11)
    f1 = frame(11, 1, 0x22)
    return id3 + f0 + f1, [len(f0), len(f1)]


# --- AIFF (stdlib writer) -------------------------------------------------------


def build_aiff(path: pathlib.Path, aifc_mode: bool) -> list[int]:
    import aifc

    samples = [0, 1000, -1000, 32000, -32000, 7, -7, 12345]
    f = aifc.open(str(path), "wb")
    if not aifc_mode:
        f.aiff()
    f.setnchannels(2)
    f.setsampwidth(2)
    f.setframerate(8000)
    if aifc_mode:
        f.setcomptype(b"NONE", b"not compressed")
    inter = []
    for i in range(0, len(samples), 2):
        inter += [samples[i], samples[i + 1]]
    f.writeframes(b"".join(struct.pack(">h", s) for s in inter))
    f.close()
    return inter


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    flac, flac_samples = build_flac()
    (OUT / "const_verbatim_fixed.flac").write_bytes(flac)
    print("flac:", len(flac), "bytes,", len(flac_samples), "samples")

    (OUT / "solid.webp").write_bytes(build_webp_solid(5, 3, (0x20, 0x42, 0x99, 0xFF)))
    (OUT / "checker.webp").write_bytes(
        build_webp_checker(4, 4, 0x10, 0xF0, (7, 8, 255))
    )
    tp, tp_px = build_tiff_plain()
    (OUT / "plain.tiff").write_bytes(tp)
    tpb, tpb_px = build_tiff_packbits()
    (OUT / "packbits.tiff").write_bytes(tpb)
    bmp, bmp_rows = build_bmp_rle8()
    (OUT / "rle8.bmp").write_bytes(bmp)
    ogg, ogg_packets = build_ogg()
    (OUT / "lacing.ogg").write_bytes(ogg)
    mkv, mkv_frames = build_mkv()
    (OUT / "hand.mkv").write_bytes(mkv)
    mp3, mp3_lens = build_mp3()
    (OUT / "hand.mp3").write_bytes(mp3)
    build_aiff(OUT / "stdlib.aiff", aifc_mode=False)
    build_aiff(OUT / "stdlib.aifc", aifc_mode=True)
    for p in sorted(OUT.iterdir()):
        print(f"{p.name}: {p.stat().st_size} bytes "
              f"md5={hashlib.md5(p.read_bytes()).hexdigest()}")
