"""MPEG audio (MP3) frame demux from scratch — ISO/IEC 11172-3 /
13818-3 frame headers.

The audio analog of the MP4/Matroska demuxers: MP3 is the layout a
huge share of wild audio actually ships in, and the per-frame byte
ranges + timestamps are the sampling/dedup primitive a 100 TB
pipeline needs even when the DCT-domain BITSTREAM decode (which needs
codec libraries this container doesn't have) stays honestly stubbed.

Covered: the 4-byte frame header matrix — MPEG-1/2/2.5, Layers
I/II/III, the full per-(version, layer) bitrate tables, sample-rate
tables, padding, CRC-protection flag (the 16-bit CRC is counted into
the frame, not verified — it covers side info the demux doesn't
parse), channel modes — plus ID3v2 prefix skip (syncsafe size,
footer flag) and the ID3v1 128-byte trailer. Frame length per the
published formula (samples/8 * bitrate / samplerate + padding;
Layer I in 4-byte slots). VBR streams demux naturally since every
header is read independently. Free-format bitrate (index 0, r10):
the stream-constant frame length is discovered from the distance to
the next sync with identical version/layer/rate fields (ISO 11172-3
§2.4.2.3 — the length is encoder-defined but constant); a
single-frame free stream raises by name (undiscoverable).

Emits the same track-dict shape as parse_mp4/parse_mkv, so
``demux_media`` dispatches on the payload magic; dts is in SAMPLES
(timescale = the stream sample rate).
"""

from __future__ import annotations


class Mp3Error(ValueError):
    """Typed MPEG-audio framing error."""


#: bitrate tables in kbit/s, index 1..14 (0 = free format, 15 = bad)
_BITRATES = {
    # (mpeg1?, layer) -> table
    (True, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                384, 416, 448),
    (True, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
                320, 384),
    (True, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320),
    (False, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
                 224, 256),
    (False, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                 160),
    (False, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                 160),
}
#: sample-rate tables by version code (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_RATES = {0: (11025, 12000, 8000), 2: (22050, 24000, 16000),
          3: (44100, 48000, 32000)}
_VERSION_NAMES = {0: "2.5", 2: "2", 3: "1"}


def _id3v2_size(data: bytes) -> int:
    """Length of a leading ID3v2 tag (header + syncsafe size +
    optional footer), 0 if absent."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise Mp3Error("ID3v2 size bytes are not syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    footer = 10 if data[5] & 0x10 else 0
    return 10 + size + footer


#: free-format discovery scan cap — no real frame is this long
_FREE_MAX_SCAN = 1 << 16


def _third_sync_ok(data: bytes, second: int, b1: int, sr_bits: int,
                   base: int, slot: int) -> bool:
    """Confirm the candidate base length by locating a THIRD matching
    sync one frame past the second — a coincidental 0xFF pattern
    inside the first frame's audio data fails this check.  A stream
    that ends before a third frame could exist is accepted (two-frame
    streams are legal)."""
    pad2 = (data[second + 2] >> 1) & 1
    third = second + base + pad2 * slot
    if third + 4 > len(data):
        return True  # stream too short for a third frame
    if data[third:third + 3] == b"TAG" and len(data) - third == 128:
        return True  # two frames + ID3v1 trailer
    return (data[third] == 0xFF and data[third + 1] == b1
            and (data[third + 2] >> 4) == 0
            and (data[third + 2] & 0x0C) == sr_bits)


def _free_format_length(data: bytes, pos: int, b1: int, sr_bits: int,
                        padding: int, slot: int) -> int:
    """Distance from this free-format frame's sync to the NEXT sync
    whose version/layer/bitrate=0/samplerate fields match, minus this
    frame's padding slot — the stream-constant base frame length."""
    limit = min(len(data) - 3, pos + _FREE_MAX_SCAN)
    p = pos + 4
    while p < limit:
        p = data.find(b"\xff", p, limit)
        if p < 0:
            break
        if (data[p + 1] == b1 and (data[p + 2] >> 4) == 0
                and (data[p + 2] & 0x0C) == sr_bits):
            base = p - pos - padding * slot
            if base >= 4 * slot and _third_sync_ok(
                    data, p, b1, sr_bits, base, slot):
                return base
        p += 1
    raise Mp3Error(
        "free-format stream: no second matching sync within "
        f"{_FREE_MAX_SCAN} bytes — frame length undiscoverable"
    )


def parse_mp3(data: bytes) -> list[dict]:
    """MP3 -> the parse_mp4/parse_mkv track-dict shape: one 'soun'
    track, samples = [(idx, dts_in_samples, byte_off, frame_size)]
    over every MPEG audio frame. Consistency (sample rate / version /
    layer constant across frames) is enforced; trailing ID3v1 tags
    and an optional leading ID3v2 tag are skipped."""
    pos = _id3v2_size(data)
    if pos >= len(data):
        raise Mp3Error("MP3 payload is only an ID3 tag")
    samples = []
    stream = None  # (version_code, layer, samplerate)
    free_base = None  # free-format slot length (without padding)
    dts = 0
    idx = 0
    while pos < len(data):
        if data[pos:pos + 3] == b"TAG" and len(data) - pos == 128:
            break  # ID3v1 trailer
        if pos + 4 > len(data):
            raise Mp3Error(f"trailing {len(data) - pos} bytes are not a frame")
        b0, b1, b2, _b3 = data[pos:pos + 4]
        if b0 != 0xFF or b1 >> 5 != 0b111:
            raise Mp3Error(f"lost frame sync at byte {pos}")
        vcode = (b1 >> 3) & 3
        if vcode == 1:
            raise Mp3Error("reserved MPEG version code")
        lcode = (b1 >> 1) & 3
        if lcode == 0:
            raise Mp3Error("reserved MPEG layer code")
        layer = 4 - lcode  # 11->I, 10->II, 01->III
        br_idx = (b2 >> 4) & 0xF
        if br_idx == 15:
            raise Mp3Error("invalid bitrate index 1111")
        sr_idx = (b2 >> 2) & 3
        if sr_idx == 3:
            raise Mp3Error("reserved sample rate index")
        mpeg1 = vcode == 3
        samplerate = _RATES[vcode][sr_idx]
        padding = (b2 >> 1) & 1
        slot = 4 if layer == 1 else 1
        if layer == 1:
            spf = 384
        else:
            spf = 1152 if (layer == 2 or mpeg1) else 576
        if br_idx == 0:
            # free format (ISO 11172-3 §2.4.2.3): a constant bitrate
            # outside the table — the frame length is CONSTANT for
            # the stream and must be discovered from the distance to
            # the next sync with identical version/layer/rate fields
            if free_base is None:
                free_base = _free_format_length(
                    data, pos, b1, b2 & 0x0C, padding, slot
                )
            frame_len = free_base + padding * slot
        else:
            bitrate = _BITRATES[(mpeg1, layer)][br_idx - 1] * 1000
            if layer == 1:
                frame_len = (12 * bitrate // samplerate + padding) * 4
            else:
                frame_len = spf // 8 * bitrate // samplerate + padding
        if frame_len < 4 or pos + frame_len > len(data):
            raise Mp3Error(
                f"frame at {pos} ({frame_len} bytes) overruns the payload"
            )
        key = (vcode, layer, samplerate)
        if stream is None:
            stream = key
        elif stream != key:
            raise Mp3Error(
                f"inconsistent stream parameters at byte {pos}: "
                f"{key} after {stream}"
            )
        samples.append((idx, dts, pos, frame_len))
        dts += spf
        idx += 1
        pos += frame_len
    if not samples:
        raise Mp3Error("no MPEG audio frames found")
    vcode, layer, samplerate = stream
    return [{
        "track_id": 1,
        "handler": "soun",
        "codec": f"mpeg{_VERSION_NAMES[vcode]}-layer{layer}",
        "timescale": samplerate,
        "samples": samples,
    }]


def encode_mp3_frames(n_frames: int, fill: bytes, version: str = "1",
                      layer: int = 3, bitrate_idx: int = 9,
                      samplerate_idx: int = 0, paddings=None,
                      id3v2: bytes | None = None,
                      id3v1: bool = False,
                      free_frame_len: int | None = None) -> bytes:
    """Format-faithful MPEG-audio frame writer (fixture generator):
    headers per the published matrix, frame bodies drawn round-robin
    from ``fill``. ``paddings`` optionally sets the padding bit per
    frame (exercises per-frame length changes, the VBR mechanism).
    ``bitrate_idx=0`` + ``free_frame_len`` writes a FREE-FORMAT stream
    (constant off-table frame length; padding adds a slot)."""
    vcode = {"2.5": 0, "2": 2, "1": 3}[version]
    mpeg1 = vcode == 3
    if bitrate_idx == 0:
        if free_frame_len is None:
            raise ValueError("bitrate_idx=0 needs free_frame_len")
        bitrate = None
    else:
        bitrate = _BITRATES[(mpeg1, layer)][bitrate_idx - 1] * 1000
    samplerate = _RATES[vcode][samplerate_idx]
    out = bytearray(id3v2 or b"")
    fp = 0
    for i in range(n_frames):
        padding = int(paddings[i]) if paddings else 0
        if bitrate is None:
            frame_len = free_frame_len + padding * (4 if layer == 1 else 1)
        elif layer == 1:
            frame_len = (12 * bitrate // samplerate + padding) * 4
        else:
            spf = 1152 if (layer == 2 or mpeg1) else 576
            frame_len = spf // 8 * bitrate // samplerate + padding
        b1 = 0xE0 | (vcode << 3) | ((4 - layer) << 1) | 1  # no CRC
        b2 = (bitrate_idx << 4) | (samplerate_idx << 2) | (padding << 1)
        b3 = 0xC0  # mono
        out += bytes([0xFF, b1, b2, b3])
        for _ in range(frame_len - 4):
            out.append(fill[fp % len(fill)])
            fp += 1
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)
