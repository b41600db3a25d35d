"""H.264/AVC Annex-B elementary-stream demux from scratch — ITU-T
H.264 §B.1 (byte-stream framing), §7.3/7.4 (NAL headers, SPS).

Raw ``.h264`` elementary streams (and the samples inside the MP4/
Matroska tracks the sibling demuxers expose) frame as start-code-
delimited NAL units. The demux a training pipeline needs — split
units, classify them, find the random-access points, recover the
coded picture size — is all header-level and fully public:

- start-code scan (3- and 4-byte codes, leading/trailing zero
  padding), one row per NAL unit with its byte range;
- the NAL header (forbidden bit, nal_ref_idc, nal_unit_type) and the
  published type names; IDR slices mark the keyframes frame-sampling
  cuts at;
- emulation-prevention removal (00 00 03 -> 00 00) for RBSP payloads;
- a real SPS parser: Exp-Golomb decode, profile/level, chroma format
  (incl. the high-profile extra fields and scaling-list skip),
  pic-width/height in MBs, frame cropping -> the actual pixel
  dimensions.

Slice-data DECODE (CABAC/CAVLC entropy + inter prediction) is a
full video decoder — raises by name, the same stance as decode_video
_frames in mp4_demux.py.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class H264Error(ValueError):
    """Typed Annex-B / NAL framing error."""


#: nal_unit_type -> name (ITU-T H.264 Table 7-1)
NAL_NAMES = {
    1: "slice", 2: "dpa", 3: "dpb", 4: "dpc", 5: "idr", 6: "sei",
    7: "sps", 8: "pps", 9: "aud", 10: "end_seq", 11: "end_stream",
    12: "filler", 13: "sps_ext", 14: "prefix", 15: "subset_sps",
    19: "aux_slice", 20: "slice_ext",
}


def split_annexb(data: bytes) -> list[tuple[int, int]]:
    """Start-code scan -> [(payload_offset, payload_size)] per NAL
    unit (offsets point at the NAL header byte, start codes
    excluded)."""
    n = len(data)
    starts = []
    i = 0
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append(i + 3)
                i += 3
                continue
            if i + 4 <= n and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append(i + 4)
                i += 4
                continue
        i += 1
    if not starts:
        raise H264Error("no Annex-B start codes found")
    if any(data[:starts[0] - 3].strip(b"\x00")):
        raise H264Error("garbage before the first start code")
    units = []
    for k, s in enumerate(starts):
        e = n if k + 1 == len(starts) else starts[k + 1] - 3
        # the next start code may be 4 bytes: trim one more zero
        while e > s and data[e - 1] == 0 and k + 1 < len(starts):
            e -= 1
        if e <= s:
            raise H264Error("empty NAL unit")
        units.append((s, e - s))
    return units


def ebsp_to_rbsp(ebsp: bytes) -> bytes:
    """Remove emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


class _ExpGolomb:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise H264Error("SPS bitstream truncated")
        v = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def ue(self) -> int:
        zeros = 0
        while self.bit() == 0:
            zeros += 1
            if zeros > 31:
                raise H264Error("Exp-Golomb run too long")
        return (1 << zeros) - 1 + (self.bits(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k & 1 else -(k // 2)


def parse_sps(rbsp: bytes) -> dict:
    """The SPS fields a pipeline filters on (§7.3.2.1.1): profile,
    level, chroma format, and the cropped pixel dimensions."""
    if not rbsp or rbsp[0] & 0x1F != 7:
        raise H264Error("not an SPS NAL unit")
    g = _ExpGolomb(rbsp[1:])
    profile = g.bits(8)
    g.bits(8)  # constraint flags + reserved
    level = g.bits(8)
    g.ue()     # seq_parameter_set_id
    chroma = 1
    separate_planes = 0
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
                   134, 135):
        chroma = g.ue()
        if chroma == 3:
            separate_planes = g.bit()
        g.ue()  # bit_depth_luma_minus8
        g.ue()  # bit_depth_chroma_minus8
        g.bit()  # qpprime_y_zero_transform_bypass
        if g.bit():  # seq_scaling_matrix_present
            for i in range(12 if chroma == 3 else 8):
                if g.bit():  # scaling list present: skip the deltas
                    size = 16 if i < 6 else 64
                    last = 8
                    nxt = 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + g.se() + 256) % 256
                        if nxt:
                            last = nxt
    g.ue()  # log2_max_frame_num_minus4
    poc_type = g.ue()
    if poc_type == 0:
        g.ue()
    elif poc_type == 1:
        g.bit()
        g.se()
        g.se()
        for _ in range(g.ue()):
            g.se()
    g.ue()  # max_num_ref_frames
    g.bit()  # gaps_in_frame_num_value_allowed
    pic_w_mbs = g.ue() + 1
    pic_h_units = g.ue() + 1
    frame_mbs_only = g.bit()
    if not frame_mbs_only:
        g.bit()  # mb_adaptive_frame_field
    g.bit()  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if g.bit():  # frame_cropping
        crop_l, crop_r = g.ue(), g.ue()
        crop_t, crop_b = g.ue(), g.ue()
    # crop units (Table 6-1): chroma 4:2:0 halves both axes
    sub_w = 2 if chroma in (1, 2) and not separate_planes else 1
    sub_h = 2 if chroma == 1 and not separate_planes else 1
    height_mult = 2 - frame_mbs_only
    width = pic_w_mbs * 16 - sub_w * (crop_l + crop_r)
    height = height_mult * pic_h_units * 16 - sub_h * height_mult \
        * (crop_t + crop_b)
    return {
        "profile_idc": profile,
        "level_idc": level,
        "chroma_format_idc": chroma,
        "width": width,
        "height": height,
    }


NAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("nal_idx", LongType()),
        StructField("nal_type", LongType()),
        StructField("type_name", StringType()),
        StructField("ref_idc", LongType()),
        StructField("is_keyframe", BooleanType()),
        StructField("byte_offset", LongType()),
        StructField("nal_bytes", LongType()),
        StructField("nal_md5", StringType()),
        StructField("sps_width", LongType()),
        StructField("sps_height", LongType()),
    ]
)


def nal_units(df: DataFrame, digest: str = "bytes") -> DataFrame:
    """(media_id, payload) -> one row per Annex-B NAL unit: type,
    reference class, keyframe flag (IDR), byte range + digest, and —
    for SPS units — the parsed pixel dimensions. The frame-sampling
    primitive for raw H.264 elementary streams; slice decode stays
    honestly stubbed."""
    if digest not in ("bytes", "hex"):
        raise ValueError(f"digest must be 'bytes' or 'hex', got {digest!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(raw)
                for i, (off, size) in enumerate(split_annexb(b)):
                    hdr = b[off]
                    if hdr & 0x80:
                        raise H264Error(
                            f"forbidden_zero_bit set in NAL {i}"
                        )
                    ntype = hdr & 0x1F
                    w = h = None
                    if ntype == 7:
                        sps = parse_sps(ebsp_to_rbsp(b[off:off + size]))
                        w, h = sps["width"], sps["height"]
                    nb = b[off:off + size]
                    rows.append((
                        mid, i, ntype, NAL_NAMES.get(ntype, f"type{ntype}"),
                        (hdr >> 5) & 3, ntype == 5, off, size,
                        hashlib.md5(
                            nb if digest == "bytes" else nb.hex().encode()
                        ).hexdigest(),
                        w, h,
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in NAL_SCHEMA.fields]
            )

    return df.mapInPandas(batches, NAL_SCHEMA)


# --- writer (fixture generator) ----------------------------------------------


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (00 00 {00,01,02,03} ->
    00 00 03 xx)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def build_annexb(units: list[tuple[int, int, bytes]],
                 long_first: bool = True) -> bytes:
    """[(nal_type, ref_idc, rbsp payload)] -> Annex-B byte stream
    (4-byte start code on the first unit per convention, 3-byte
    after; emulation prevention applied)."""
    out = bytearray()
    for i, (ntype, ref, payload) in enumerate(units):
        out += b"\x00\x00\x00\x01" if (i == 0 and long_first) \
            else b"\x00\x00\x01"
        out.append((ref & 3) << 5 | (ntype & 0x1F))
        out += rbsp_to_ebsp(payload)
    return bytes(out)


class _BitBuilder:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int):
        k = v + 1
        nbits = k.bit_length()
        self.u(0, nbits - 1)
        self.u(k, nbits)

    def bytes_(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        return bytes(
            int("".join(map(str, bits[i:i + 8])), 2)
            for i in range(0, len(bits), 8)
        )


def build_sps(width_mbs: int, height_mbs: int, profile: int = 66,
              level: int = 30) -> bytes:
    """A minimal baseline-profile SPS RBSP (without the NAL header)
    for ``width_mbs*16 x height_mbs*16`` frames — the fixture
    generator for parse_sps."""
    g = _BitBuilder()
    g.u(profile, 8)
    g.u(0, 8)   # constraint flags
    g.u(level, 8)
    g.ue(0)     # sps id
    g.ue(0)     # log2_max_frame_num_minus4
    g.ue(0)     # poc type 0
    g.ue(0)     # log2_max_poc_lsb_minus4
    g.ue(1)     # max_num_ref_frames
    g.u(0, 1)   # gaps allowed
    g.ue(width_mbs - 1)
    g.ue(height_mbs - 1)
    g.u(1, 1)   # frame_mbs_only
    g.u(0, 1)   # direct_8x8
    g.u(0, 1)   # no cropping
    g.u(0, 1)   # no VUI
    return g.bytes_()
