"""Multimodal column plumbing (north-star; absent in the reference).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, Arrow batch
shape, mapInPandas signatures, frame-index explosion — is real and
oracle-tested. The decode slot:

- ``decode_media`` REALLY decodes with the zero-dependency codecs
  below and in ``operators/jpeg.py``: PPM P6, 24-bit BI_RGB BMP, PNG
  (stdlib zlib inflate + full scanline unfilter + PLTE indirection),
  GIF (from-scratch LZW), baseline + progressive JPEG (ITU-T T.81
  from scratch) — actual pixel parsing, oracle-checked by md5 of the
  decoded bytes.
- ``decode_audio`` decodes real WAV containers: PCM 8/16/24/32-bit,
  IEEE float, WAVE_FORMAT_EXTENSIBLE, and IMA/DVI ADPCM from scratch.
- video containers demux for real in ``operators/mp4_demux.py``; only
  perceptual codec BITSTREAMS (H.264/AAC/MP3) still raise by name —
  no codec libraries exist in this container. ``decode_media_stub``
  keeps the deterministic fake for exercising pipelines over such
  payloads.
- ``extract_binary_features`` is a REAL Arrow-batched feature pass
  (byte length + sha256) whose output the DuckDB oracle reproduces.

At 100 TB: media payloads dominate row size — keep them in their own
column so column pruning skips the bytes unless a stage needs them,
and size ``maxPartitionBytes``/batch counts for payload width, not
row count (mapInPandas streams Arrow batches, never whole partitions).
"""

from __future__ import annotations

import hashlib
import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
        StructField("meta_duration_ms", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256_16", StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Documents → media-shaped rows: the text bytes stand in for an
    opaque payload (the schema/partitioning are what's under test)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.length(F.col(text_col)).cast("bigint").alias("meta_width"),
        F.lit(1).cast("bigint").alias("meta_height"),
        F.lit(None).cast("bigint").alias("meta_duration_ms"),
    )


def extract_binary_features(df: DataFrame) -> DataFrame:
    """REAL Arrow path: mapInPandas over binary payloads computing
    deterministic features (length, sha256 prefix)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha256_16": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                    ),
                }
            )

    return df.mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, frame_bytes: int = 32, every: int = 4) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame offset
    (every-N frame of ``frame_bytes`` chunks). The decode of each
    frame is where a codec would slot in (see decode_media_stub)."""
    n_frames = F.floor(F.col("meta_width") / frame_bytes).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every == 0,
    )
    return df.select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
    ).select(
        "media_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        (F.col("frame_idx") * frame_bytes).cast("bigint").alias("byte_offset"),
    )


# ---------------------------------------------------------------------------
# REAL zero-dependency codecs: PPM (P6), 24-bit uncompressed BMP, PNG
# (zlib DEFLATE + unfilter + palette), GIF (from-scratch LZW), WAV
# (PCM/float/extensible + IMA ADPCM + G.711 companding). JPEG lives in
# operators/jpeg.py, MP4 demux in operators/mp4_demux.py — all public
# byte-layout formats decodable with numpy + stdlib alone.
# ---------------------------------------------------------------------------

# PPM allows ANY number of consecutive comment lines before each
# header token, not just one — hence the * on the comment group.
_PPM_HEADER_RE = re.compile(
    rb"^P6\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)\s"
)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6): ASCII header + raw interleaved RGB rows."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(data: bytes) -> tuple[int, int, np.ndarray]:
    """PPM (P6) → (width, height, HxWx3 uint8 array). Comment-tolerant
    header parse; exactly one whitespace byte separates maxval from the
    pixel stream (the spec's rule — pixel bytes may themselves be
    whitespace-valued)."""
    m = _PPM_HEADER_RE.match(data)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    px = np.frombuffer(data, np.uint8, count=w * h * 3, offset=m.end())
    px = px.reshape(h, w, 3)
    if maxval != 255:
        # rescale to full range so pixel_sum/pixel_md5 semantics are
        # uniform across maxval (spec: samples are 0..maxval)
        px = (px.astype(np.uint32) * 255 // maxval).astype(np.uint8)
    return w, h, px


_PBM_HEADER_RE = re.compile(
    rb"^P4\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)\s"
)
_PGM_HEADER_RE = re.compile(
    rb"^P5\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)\s+"
    rb"(?:#[^\n]*\s+)*(\d+)\s"
)


def encode_pbm(width: int, height: int, bits: np.ndarray) -> bytes:
    """Packed bilevel PBM (P4): rows packed MSB-first, each row
    padded to a byte boundary. 1 = black per the netpbm spec."""
    bits = (np.asarray(bits) & 1).astype(np.uint8).reshape(height, width)
    packed = np.packbits(bits, axis=1)
    return b"P4\n%d %d\n" % (width, height) + packed.tobytes()


def encode_pgm(width: int, height: int, gray: bytes) -> bytes:
    """Binary graymap PGM (P5): ASCII header + raw sample rows."""
    if len(gray) != width * height:
        raise ValueError(
            f"need {width * height} gray bytes, got {len(gray)}")
    return b"P5\n%d %d\n255\n" % (width, height) + gray


def decode_pbm(data: bytes) -> tuple[int, int, np.ndarray]:
    """PBM (P4, packed) -> (width, height, HxW uint8 of 0/1 bits,
    1 = black). Comment-tolerant header; rows are packed MSB-first
    and padded to byte boundaries (r16, the netpbm binary family
    alongside decode_ppm)."""
    m = _PBM_HEADER_RE.match(data)
    if not m:
        raise ValueError("not a P4 PBM payload")
    w, h = int(m.group(1)), int(m.group(2))
    rowbytes = (w + 7) // 8
    raw = np.frombuffer(data, np.uint8, count=rowbytes * h,
                        offset=m.end()).reshape(h, rowbytes)
    return w, h, np.unpackbits(raw, axis=1)[:, :w]


def decode_pgm(data: bytes) -> tuple[int, int, np.ndarray]:
    """PGM (P5, binary) -> (width, height, HxW uint8). Maxval is
    rescaled to 0..255 like decode_ppm; 16-bit samples raise."""
    m = _PGM_HEADER_RE.match(data)
    if not m:
        raise ValueError("not a P5 PGM payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval > 255:
        raise NotImplementedError("16-bit PGM not supported")
    px = np.frombuffer(data, np.uint8, count=w * h,
                       offset=m.end()).reshape(h, w)
    if maxval != 255:
        px = (px.astype(np.uint32) * 255 // maxval).astype(np.uint8)
    return w, h, px


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER, rows bottom-up, BGR order, 4-byte row padding."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    pad = (4 - (width * 3) % 4) % 4
    bgr = np.frombuffer(rgb, np.uint8).reshape(height, width, 3)[::-1, :, ::-1]
    rows = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(height))
    pixel_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(rows), 0, 0, pixel_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return header + info + rows


def _bmp_rle_decode(data: bytes, w: int, h: int, four_bit: bool
                    ) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 (the Windows BMP spec): encoded runs,
    escapes (0 end-of-line, 1 end-of-bitmap, 2 position delta),
    word-aligned absolute runs; 4-bit mode alternates nibbles.
    Returns the (h, w) palette-index grid in BOTTOM-UP row order."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    p = 0
    while p + 1 < len(data):
        n, v = data[p], data[p + 1]
        p += 2
        if n:  # encoded run
            if four_bit:
                vals = [(v >> 4, v & 0x0F)[k & 1] for k in range(n)]
            else:
                vals = [v] * n
            if y >= h or x + n > w:
                raise ValueError("BMP RLE run overflows the row")
            out[y, x:x + n] = vals
            x += n
            continue
        if v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta
            if p + 2 > len(data):
                raise ValueError("BMP RLE delta truncated")
            x += data[p]
            y += data[p + 1]
            p += 2
        else:  # absolute mode: v literal pixels, word-aligned
            count = v
            nbytes = ((count + 1) // 2 if four_bit else count)
            pad = (nbytes & 1)
            if p + nbytes + pad > len(data):
                raise ValueError("BMP RLE absolute run truncated")
            if four_bit:
                vals = []
                for k in range(count):
                    b = data[p + (k >> 1)]
                    vals.append(b >> 4 if k % 2 == 0 else b & 0x0F)
            else:
                vals = list(data[p:p + count])
            if y >= h or x + count > w:
                raise ValueError("BMP RLE absolute run overflows the row")
            out[y, x:x + count] = vals
            x += count
            p += nbytes + pad
    raise ValueError("BMP RLE stream missing the end-of-bitmap escape")


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """BMP → (width, height, HxWx3 uint8 RGB array). BI_RGB at
    1/4/8-bit (palette), 16-bit (the 5-5-5 default), 24-bit and
    32-bit (alpha byte dropped — BMP alpha is historically junk),
    BI_RLE8/BI_RLE4 run-length palette images, and BI_BITFIELDS with
    arbitrary 16/32-bit channel masks (5-6-5 et al., exact
    round-half-up 8-bit expansion). Handles bottom-up (positive
    height) and top-down (negative) layouts, row padding, and
    truncated-palette ``biClrUsed``. Embedded PNG/JPEG raise by
    name."""
    magic, _, _, _, off = struct.unpack_from("<2sIHHI", data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hsz, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    clr_used = struct.unpack_from("<I", data, 46)[0] if hsz >= 40 else 0
    top_down, h = h < 0, abs(h)
    if comp not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"BMP compression {comp} not supported "
            "(BI_RGB/RLE8/RLE4/BITFIELDS)"
        )
    if bpp == 16 or comp == 3:
        # BI_BITFIELDS (and the 16-bit BI_RGB default 5-5-5): channel
        # masks follow the 40-byte header (same file offset in the
        # V4/V5 headers, whose mask FIELDS start at struct offset 40);
        # each channel is (pixel & mask) >> trailing_zeros, scaled to
        # 8-bit with exact round-half-up; the alpha mask is dropped
        # like the 32-bit BI_RGB alpha byte
        if comp == 3:
            if bpp not in (16, 32):
                raise ValueError(f"BI_BITFIELDS with bpp={bpp}")
            r_m, g_m, b_m = struct.unpack_from("<III", data, 14 + 40)
        else:
            r_m, g_m, b_m = 0x7C00, 0x03E0, 0x001F
        unit = bpp // 8
        stride = (w * unit + 3) // 4 * 4
        rows = np.frombuffer(data, np.uint8, count=stride * h,
                             offset=off).reshape(h, stride)
        raw = rows[:, :w * unit].reshape(h, w, unit).astype(np.uint64)
        val = sum(raw[:, :, i] << (8 * i) for i in range(unit))
        chans = []
        for m in (r_m, g_m, b_m):
            if m == 0:
                chans.append(np.zeros((h, w), np.uint8))
                continue
            shift = (m & -m).bit_length() - 1
            maxv = m >> shift
            v = (val & m) >> shift
            chans.append(((v * 255 + maxv // 2) // maxv).astype(np.uint8))
        px = np.stack(chans, axis=2)
        if not top_down:
            px = px[::-1]
        return w, h, px
    if bpp in (1, 4, 8):
        ncolors = clr_used or (1 << bpp)
        pal_off = 14 + hsz
        quads = np.frombuffer(data, np.uint8, count=4 * ncolors,
                              offset=pal_off).reshape(-1, 4)
        pal = quads[:, :3][:, ::-1]  # BGRA quads -> RGB
        if comp in (1, 2):
            if (comp == 1) != (bpp == 8):
                raise ValueError(
                    f"BI_RLE{'8' if comp == 1 else '4'} with bpp={bpp}"
                )
            if top_down:
                raise ValueError("RLE BMP cannot be top-down")
            idx = _bmp_rle_decode(data[off:], w, h, comp == 2)[::-1]
        else:
            stride = ((w * bpp + 7) // 8 + 3) // 4 * 4
            rows = np.frombuffer(data, np.uint8, count=stride * h,
                                 offset=off).reshape(h, stride)
            if bpp == 8:
                idx = rows[:, :w].copy()
            else:
                bits = np.unpackbits(rows, axis=1)
                spp = bits[:, :w * bpp].reshape(h, w, bpp)
                weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
                idx = (spp * weights).sum(axis=2).astype(np.uint8)
            if not top_down:
                idx = idx[::-1]
        if int(idx.max(initial=0)) >= ncolors:
            raise ValueError("BMP palette index beyond the color table")
        return w, h, pal[idx]
    if bpp in (24, 32):
        if comp != 0:
            raise ValueError(f"RLE is palette-only (bpp={bpp})")
        unit = bpp // 8
        stride = (w * unit + 3) // 4 * 4
        rows = np.frombuffer(data, np.uint8, count=stride * h, offset=off)
        px = rows.reshape(h, stride)[:, :w * unit].reshape(h, w, unit)
        if not top_down:
            px = px[::-1]
        return w, h, px[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    raise NotImplementedError(f"{bpp}-bit BMP not supported")


# ---------------------------------------------------------------------------
# REAL PNG codec: stdlib zlib + numpy only (PNG's entropy coding IS
# zlib/DEFLATE, which the stdlib ships — so unlike JPEG, PNG is fully
# decodable here). Every spec-valid IHDR shape decodes: color types
# 0/2/3/4/6 at their legal bit depths (1/2/4/8/16 grey, 1/2/4/8
# indexed, 8/16 truecolor / grey+alpha / truecolor+alpha), both
# non-interlaced and Adam7, all 5 scanline filters, CRC-validated
# chunks. 16-bit emits uint16 samples (decode_media digest='hex');
# sub-byte grey scales to the full 8-bit range by the spec's exact
# integer factor (255/(2^d-1)); indexed keeps raw PLTE indices.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples per pixel
#: spec-legal bit depths per color type (PNG spec Table 11.1)
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_pack_rows(sub: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, ch) int samples -> (h, stride) packed scanline bytes:
    BE pairs at depth 16, MSB-first bit packing (zero row padding)
    at the sub-byte depths."""
    hh, ww, ch = sub.shape
    if depth == 8:
        return sub.astype(np.uint8).reshape(hh, ww * ch)
    if depth == 16:
        u = sub.astype(np.uint16)
        return np.stack([(u >> 8) & 0xFF, u & 0xFF], axis=-1).astype(
            np.uint8
        ).reshape(hh, ww * ch * 2)
    bits = np.unpackbits(sub.astype(np.uint8).reshape(hh, -1), axis=1)
    bits = bits.reshape(hh, ww * ch, 8)[:, :, 8 - depth:].reshape(hh, -1)
    pad = -bits.shape[1] % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1)


def encode_png(
    width: int, height: int, pixels: bytes, color_type: int = 2, row_filters=None,
    palette: bytes | None = None, interlace: bool = False, depth: int = 8,
) -> bytes:
    """Minimal real PNG writer covering every decode shape.
    ``row_filters`` optionally sets the filter type per scanline (int
    or per-row list, default 0/None) — used by tests to force every
    unfilter path in :func:`decode_png` to actually execute.
    ``color_type=3`` writes an indexed image: ``pixels`` are palette
    indices and ``palette`` is the PLTE RGB-triple bytes. ``depth``
    follows the spec's legality matrix; 16-bit takes big-endian
    sample pairs, sub-byte depths take one byte per sample (values
    must fit the depth) and pack MSB-first."""
    import zlib

    if color_type == 3:
        if palette is None or len(palette) % 3 or not palette:
            raise ValueError("color_type 3 needs an RGB-triple palette")
        ch = 1
    else:
        ch = _PNG_CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color_type {color_type}")
    if depth not in _PNG_DEPTHS[color_type]:
        raise ValueError(
            f"invalid PNG bit depth {depth} for color type {color_type}"
        )
    nsamp = width * height * ch
    if depth == 16:
        if len(pixels) != nsamp * 2:
            raise ValueError(f"need {nsamp * 2} bytes, got {len(pixels)}")
        samples = np.frombuffer(pixels, ">u2").reshape(height, width, ch)
        samples = samples.astype(np.int32)
    else:
        if len(pixels) != nsamp:
            raise ValueError(f"need {nsamp} bytes, got {len(pixels)}")
        samples = np.frombuffer(pixels, np.uint8).reshape(height, width, ch)
        samples = samples.astype(np.int32)
        if depth < 8 and int(samples.max(initial=0)) >> depth:
            raise ValueError(f"sample value exceeds {depth}-bit depth")
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0,
                       1 if interlace else 0)
    plte = _png_chunk(b"PLTE", palette) if color_type == 3 else b""
    if interlace:
        # Adam7 writer (filter 0 rows): each non-empty pass is its own
        # filtered sub-image in pass order
        raw7 = bytearray()
        for x0, y0, dx, dy in _ADAM7_PASSES:
            sub = samples[y0::dy, x0::dx, :]
            if sub.size == 0:
                continue
            packed = _png_pack_rows(sub, depth)
            for r in range(packed.shape[0]):
                raw7.append(0)
                raw7.extend(packed[r].tobytes())
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + plte
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw7)))
            + _png_chunk(b"IEND", b"")
        )
    if row_filters is None:
        row_filters = [0] * height
    elif isinstance(row_filters, int):
        row_filters = [row_filters] * height
    px = _png_pack_rows(samples, depth).astype(np.int32)
    bpp = max(1, ch * depth // 8)  # filter distance, whole bytes
    raw = bytearray()
    stride = px.shape[1]
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(height):
        cur = px[r]
        ft = int(row_filters[r])
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - (left + prev) // 2
        elif ft == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        else:
            raise ValueError(f"bad filter {ft}")
        raw.append(ft)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + plte
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


#: Adam7 pass pattern: (x0, y0, dx, dy) per the PNG spec
_ADAM7_PASSES = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the per-scanline filters over one (sub-)image: each row is
    [filter_type][stride bytes]; returns an (h, stride) int32 array."""
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = int(rows[r, 0])
        cur = rows[r, 1:].astype(np.int32)
        if ft == 0:
            pass
        elif ft == 2:  # Up: fully vectorized
            cur = (cur + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub/Average/Paeth: left-sequential
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ft == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif ft == 3:
                    cur[i] = (cur[i] + (a + b) // 2) & 0xFF
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG scanline filter {ft}")
        out[r] = cur
        prev = cur
    return out


def _png_samples(sub: np.ndarray, wp: int, ch: int, depth: int) -> np.ndarray:
    """Unfiltered scanline bytes (h, stride) -> (h, wp, ch) int32
    samples: big-endian pairs at depth 16, MSB-first bit unpacking at
    the sub-byte depths (row padding bits discarded per the spec)."""
    hgt = sub.shape[0]
    b = sub.astype(np.uint8)
    if depth == 8:
        return b[:, :wp * ch].astype(np.int32).reshape(hgt, wp, ch)
    if depth == 16:
        u = b[:, :wp * ch * 2].reshape(hgt, wp, ch, 2).astype(np.int32)
        return (u[..., 0] << 8) | u[..., 1]
    bits = np.unpackbits(b, axis=1)
    spp = wp * ch  # sub-byte depths only occur at ch == 1
    vals = bits[:, :spp * depth].reshape(hgt, spp, depth).astype(np.int32)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int32)
    return (vals * weights).sum(axis=2).reshape(hgt, wp, ch)


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """PNG → (width, height, HxWxC uint8/uint16 array). Real decode:
    chunk walk with CRC validation, concatenated-IDAT zlib inflate,
    the full scanline unfilter (None/Sub/Up/Average/Paeth — Paeth per
    the spec's integer predictor), PLTE indirection for indexed
    images, and Adam7 deinterlacing (7 independently-filtered
    sub-images scattered onto the pass grid). Every spec-legal
    IHDR shape: color types 0/2/3/4/6 at depths 1/2/4/8/16 per Table
    11.1 — 16-bit decodes to uint16 (BE sample pairs; filters stay
    byte-wise with bpp doubled), sub-byte grey scales to 0..255 by
    the exact integer factor 255/(2^d-1), sub-byte indexed keeps raw
    palette indices. tRNS transparency is ignored (stats/digest are
    over the color samples)."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    off = 8
    w = h = None
    color_type = None
    plte = None
    idat = bytearray()
    while off + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, off)
        ctype = data[off + 4:off + 8]
        body = data[off + 8:off + 8 + clen]
        (crc,) = struct.unpack_from(">I", data, off + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        off += 12 + clen
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if color_type not in _PNG_DEPTHS:
                raise ValueError(f"invalid PNG color type {color_type}")
            if depth not in _PNG_DEPTHS[color_type]:
                raise ValueError(
                    f"invalid PNG bit depth {depth} for color type "
                    f"{color_type}"
                )
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"invalid PNG interlace method {interlace}")
        elif ctype == b"PLTE":
            if len(body) % 3 or not body:
                raise ValueError("PNG PLTE length must be a positive multiple of 3")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    bits_pp = depth * ch  # bits per pixel; rows are byte-padded
    stride = (w * bits_pp + 7) // 8
    fbpp = max(1, bits_pp // 8)  # filter distance, whole bytes
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        if len(raw) != h * (stride + 1):
            raise ValueError(
                f"PNG pixel stream: expected {h * (stride + 1)} bytes, got {len(raw)}"
            )
        px = _png_samples(_png_unfilter(raw, h, stride, fbpp), w, ch, depth)
    else:
        # Adam7: the stream is 7 independently-filtered sub-images
        # (empty passes contribute nothing), scattered onto the
        # (x0 + j*dx, y0 + i*dy) grid per the spec's pass pattern
        px = np.zeros((h, w, ch), dtype=np.int32)
        pos = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            wp = (w - x0 + dx - 1) // dx if w > x0 else 0
            hp = (h - y0 + dy - 1) // dy if h > y0 else 0
            if wp == 0 or hp == 0:
                continue
            pstride = (wp * bits_pp + 7) // 8
            need = hp * (pstride + 1)
            if pos + need > len(raw):
                raise ValueError("PNG interlaced pixel stream truncated")
            sub = _png_unfilter(raw[pos:pos + need], hp, pstride, fbpp)
            pos += need
            px[y0::dy, x0::dx, :] = _png_samples(sub, wp, ch, depth)
        if pos != len(raw):
            raise ValueError("PNG interlaced pixel stream has trailing bytes")
    if depth == 16:
        px = px.astype(np.uint16)
    elif color_type == 0 and depth < 8:
        # exact integer range expansion (255 is divisible by 2^d - 1)
        px = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
    else:
        px = px.astype(np.uint8)
    if color_type == 3:
        # indexed image: PLTE indirection maps each index to its RGB
        # triple (the branch that previously raised honestly)
        if plte is None:
            raise ValueError("indexed PNG missing its PLTE chunk")
        idx = px.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index beyond PLTE")
        px = plte[idx]
    return w, h, px


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fmt", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("pixel_md5", StringType()),
    ]
)


# IMA/DVI ADPCM tables (public: IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility", also RFC 3551 §4.5.1 and the
# Microsoft WAVE DVI/IMA registration, wFormatTag 0x0011)
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def _g711_tables():
    """ITU-T G.711 companding expansion tables (also RFC 3551 §4.5.14):
    256-entry u8 → int16 for µ-law (wFormatTag 7) and A-law (6)."""
    ulaw = np.empty(256, np.int16)
    alaw = np.empty(256, np.int16)
    for b in range(256):
        u = ~b & 0xFF
        exp = (u >> 4) & 7
        mant = u & 0xF
        x = (((mant << 3) + 0x84) << exp) - 0x84
        ulaw[b] = -x if u & 0x80 else x
        a = b ^ 0x55
        exp = (a >> 4) & 7
        mant = a & 0xF
        x = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (exp - 1)
        # A-law's sign convention is INVERTED vs µ-law: bit 7 set means
        # positive (G.711 Table 2 / the public-domain g711.c reference)
        alaw[b] = x if a & 0x80 else -x
    return ulaw, alaw


_ULAW_TABLE, _ALAW_TABLE = _g711_tables()

# WAVE_FORMAT_EXTENSIBLE SubFormat GUID tail shared by all registered
# formats ({...-0000-0010-8000-00AA00389B71}); the leading u16 is the
# actual wFormatTag
_WAVE_GUID_TAIL = bytes.fromhex("000000001000800000aa00389b71")


def _ima_decode_nibbles(nibbles, pred: int, idx: int):
    """Straight IMA ADPCM inner loop over a nibble sequence with the
    given initial predictor/step-index state. Returns (decoded int16
    samples — one per nibble, end predictor, end step index).
    Sequential by nature — runs inside the per-clip mapInPandas slot,
    never in a row-at-a-time UDF."""
    out = []
    for nb in nibbles:
        step = _IMA_STEPS[idx]
        diff = step >> 3
        if nb & 1:
            diff += step >> 2
        if nb & 2:
            diff += step >> 1
        if nb & 4:
            diff += step
        if nb & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        idx = max(0, min(88, idx + _IMA_INDEX[nb]))
        out.append(pred)
    return out, pred, idx


def _ima_decode_data(data: bytes, channels: int, block_align: int,
                     samples_per_block: int) -> np.ndarray:
    """Decode the full data chunk of an IMA-in-WAV stream: per
    ``block_align``-byte block, a 4-byte header per channel (int16
    initial predictor, step index, reserved) whose predictor IS sample
    0, then 4-byte words of 8 nibbles interleaved per channel
    (low nibble first). Returns interleaved int16 samples."""
    n_blocks = len(data) // block_align
    frames = []
    for b in range(n_blocks):
        block = data[b * block_align:(b + 1) * block_align]
        chans = []
        states = []
        for c in range(channels):
            pred = int.from_bytes(block[4 * c:4 * c + 2], "little", signed=True)
            idx = block[4 * c + 2]
            if idx > 88:
                raise ValueError(f"IMA ADPCM block header step index {idx} > 88")
            states.append((pred, idx))
            chans.append([pred])
        body = block[4 * channels:]
        # words interleave across channels in groups of 4 bytes
        for w in range(0, len(body), 4 * channels):
            for c in range(channels):
                word = body[w + 4 * c:w + 4 * (c + 1)]
                nibbles = []
                for byte in word:
                    nibbles.append(byte & 0xF)
                    nibbles.append(byte >> 4)
                decoded, pred, idx = _ima_decode_nibbles(nibbles, *states[c])
                states[c] = (pred, idx)
                chans[c].extend(decoded)
        for c in range(channels):
            del chans[c][samples_per_block:]  # trailing pad nibbles
        frames.append(
            np.stack([np.asarray(ch, dtype=np.int16) for ch in chans], axis=1)
        )
    return np.concatenate(frames, axis=0).reshape(-1)


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Pure-numpy RIFF/WAVE decoder — audio's analog of
    :func:`decode_ppm`. Walks the real chunk structure (fmt / fact /
    data, unknown chunks skipped by length per the RIFF spec) and
    decodes:

    - PCM (wFormatTag 1): 8-bit unsigned, 16/24/32-bit little-endian
      signed (24-bit frames widened to int32)
    - IEEE float (wFormatTag 3): float32 / float64
    - IMA/DVI ADPCM (wFormatTag 0x11): 4-bit block-coded, mono/stereo
      — decoded from scratch per the public IMA recursion (IMA RP /
      RFC 3551 §4.5.1)
    - G.711 µ-law (7) and A-law (6) telephony companding — table
      expansion per G.711 (validated against the stdlib audioop
      reference)
    - WAVE_FORMAT_EXTENSIBLE (0xFFFE): unwrapped via the SubFormat
      GUID to one of the above

    Returns (sample_rate, n_channels, n_samples, samples) with
    n_samples = total interleaved samples (frames × channels).
    Perceptual codecs (MP3/AAC in WAV, MS-ADPCM) raise by name,
    honestly."""
    import struct as _s

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(data)
    fmt_fields = None
    fact_frames = None
    payload = None
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        clen = _s.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError(f"fmt chunk too short ({clen} bytes)")
            fmt_fields = _s.unpack_from("<HHIIHH", body, 0) + (body[16:],)
        elif cid == b"fact" and clen >= 4:
            fact_frames = _s.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            if len(body) < clen:
                raise ValueError(
                    f"data chunk truncated: declared {clen}, have {len(body)}"
                )
            payload = body
            break  # everything needed is parsed
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_fields is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, channels, rate, byte_rate, block_align, bits = fmt_fields[:6]
    ext = fmt_fields[6]
    if rate <= 0:
        raise ValueError(f"invalid WAV sample rate {rate}")
    if not 1 <= channels <= 8:
        raise NotImplementedError(f"{channels}-channel WAV not supported")
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        if len(ext) < 24 or ext[:2] != b"\x16\x00":
            raise ValueError("malformed WAVE_FORMAT_EXTENSIBLE fmt chunk")
        guid = ext[8:24]
        if guid[2:] != _WAVE_GUID_TAIL:
            raise NotImplementedError(
                f"extensible WAV with unregistered SubFormat GUID {guid.hex()}"
            )
        audio_fmt = _s.unpack_from("<H", guid, 0)[0]

    if audio_fmt in (1, 3):
        if audio_fmt == 1:
            dtypes = {8: np.dtype(np.uint8), 16: np.dtype("<i2"),
                      24: None, 32: np.dtype("<i4")}
        else:
            dtypes = {32: np.dtype("<f4"), 64: np.dtype("<f8")}
        if bits not in dtypes:
            kind = "PCM" if audio_fmt == 1 else "IEEE-float"
            raise NotImplementedError(f"{bits}-bit {kind} WAV not supported")
        width = bits // 8
        if block_align != channels * width or byte_rate != rate * block_align:
            raise ValueError(
                f"inconsistent WAV header: block_align {block_align} / "
                f"byte_rate {byte_rate} vs {channels}ch x {bits}bit @ {rate}Hz"
            )
        n = len(payload)
        if n % block_align:
            raise ValueError(
                f"data chunk {n} not a multiple of the {block_align}-byte frame"
            )
        if bits == 24:  # widen 3-byte frames to int32 (sign-extended)
            raw = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
            samples = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int8).astype(np.int32) << 16)
            )
        else:
            samples = np.frombuffer(payload, dtype=dtypes[bits])
        return rate, channels, n // width, samples

    if audio_fmt in (6, 7):  # G.711 A-law / µ-law telephony companding
        if bits != 8:
            raise ValueError(
                f"G.711 WAV declares {bits} bits/sample (want 8)"
            )
        if block_align != channels:
            raise ValueError(
                f"inconsistent G.711 header: block_align {block_align} "
                f"vs {channels} channel(s) x 1 byte"
            )
        table = _ALAW_TABLE if audio_fmt == 6 else _ULAW_TABLE
        samples = table[np.frombuffer(payload, np.uint8)]
        return rate, channels, len(samples), samples

    if audio_fmt == 0x11:  # IMA/DVI ADPCM
        if bits != 4:
            raise ValueError(f"IMA ADPCM declares {bits} bits/sample (want 4)")
        if channels not in (1, 2):
            raise NotImplementedError(
                f"{channels}-channel IMA ADPCM not supported"
            )
        if len(ext) < 4 or ext[:2] != b"\x02\x00":
            raise ValueError("IMA ADPCM fmt chunk missing wSamplesPerBlock")
        samples_per_block = _s.unpack_from("<H", ext, 2)[0]
        expect = (block_align - 4 * channels) * 2 // channels + 1
        if block_align < 4 * channels + 4 * channels or samples_per_block > expect:
            raise ValueError(
                f"inconsistent IMA ADPCM header: block_align {block_align} "
                f"holds {expect} samples/block, declared {samples_per_block}"
            )
        if (block_align - 4 * channels) % (4 * channels):
            raise ValueError(
                f"IMA ADPCM block body {block_align - 4 * channels} bytes "
                f"not a multiple of the {4 * channels}-byte word group"
            )
        if len(payload) % block_align:
            raise ValueError(
                f"data chunk {len(payload)} not a multiple of the "
                f"{block_align}-byte ADPCM block"
            )
        samples = _ima_decode_data(
            payload, channels, block_align, samples_per_block
        )
        if fact_frames is not None:  # last block may be logically short
            if fact_frames * channels > len(samples):
                raise ValueError(
                    f"fact chunk declares {fact_frames} frames but data "
                    f"decodes to {len(samples) // channels}"
                )
            samples = samples[:fact_frames * channels]
        return rate, channels, len(samples), samples

    raise NotImplementedError(
        f"non-PCM WAV (format {audio_fmt:#x}) needs codec libs"
    )


def _f80(b: bytes) -> int:
    """The 80-bit IEEE 754 extended float AIFF stores its sample rate
    in (sign 1, exponent 15, EXPLICIT-integer-bit mantissa 64) ->
    nearest int Hz."""
    if len(b) != 10:
        raise ValueError("extended float must be 10 bytes")
    sign = b[0] >> 7
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0
    if exp == 0x7FFF:
        raise ValueError("non-finite AIFF sample rate")
    val = mant * 2.0 ** (exp - 16383 - 63)
    return int(round(-val if sign else val))


def encode_aiff(samples: np.ndarray, rate: int, bits: int = 16,
                compression: bytes | None = None) -> bytes:
    """Format-faithful AIFF/AIFF-C writer (fixture generator):
    ``samples`` is (n_frames, channels) int; ``compression`` of
    b'sowt' writes the little-endian AIFF-C variant."""
    import struct as _s

    arr = np.asarray(samples, np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    nframes, ch = arr.shape
    bl = rate.bit_length()
    f80 = _s.pack(">HQ", 16383 + bl - 1, (rate << (64 - bl))
                  & 0xFFFFFFFFFFFFFFFF) if rate else bytes(10)
    inter = arr.reshape(-1)
    if bits == 8:
        body = inter.astype(np.int8).tobytes()
    elif bits == 16:
        e = "<i2" if compression == b"sowt" else ">i2"
        body = inter.astype(e).tobytes()
    elif bits == 24:
        v = inter.astype(np.int64) & 0xFFFFFF
        body = b"".join(int(x).to_bytes(3, "big") for x in v)
    elif bits == 32:
        body = inter.astype(">i4").tobytes()
    else:
        raise ValueError(f"unsupported bit width {bits}")
    comm = _s.pack(">HIH", ch, nframes, bits) + f80
    form_type = b"AIFF"
    if compression:
        form_type = b"AIFC"
        comm += compression + b"\x00\x00"  # pstring name: empty, padded
    ssnd = _s.pack(">II", 0, 0) + body
    out = bytearray()
    for cid, cbody in ((b"COMM", comm), (b"SSND", ssnd)):
        out += cid + _s.pack(">I", len(cbody)) + cbody
        if len(cbody) & 1:
            out += b"\x00"
    return (b"FORM" + _s.pack(">I", 4 + len(out)) + form_type + bytes(out))


def decode_aiff(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Pure-numpy AIFF/AIFF-C decoder (Apple's published IFF audio
    container — the big-endian sibling of decode_wav): FORM/AIFF
    chunk walk (odd-length chunks padded per IFF), COMM with the
    80-bit extended-float sample rate, SSND offset/blockSize header,
    8-bit SIGNED (unlike WAV) / 16 / 24 / 32-bit big-endian PCM, and
    AIFF-C with the 'NONE' (big-endian) and 'sowt' (byte-swapped,
    i.e. little-endian 16-bit) compression types. Anything perceptual
    raises by name. Same return contract as decode_wav."""
    import struct as _s

    if len(data) < 12 or data[:4] != b"FORM" or data[8:12] not in (
        b"AIFF", b"AIFC"
    ):
        raise ValueError("not an AIFF payload")
    aifc = data[8:12] == b"AIFC"
    pos = 12
    comm = ssnd = None
    comp = b"NONE"
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = _s.unpack_from(">I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"AIFF chunk {cid!r} truncated")
        if cid == b"COMM":
            ch, nframes, bits = _s.unpack_from(">HIH", body, 0)
            rate = _f80(body[8:18])
            if aifc:
                comp = body[18:22]
            comm = (ch, nframes, bits, rate)
        elif cid == b"SSND":
            off, _blk = _s.unpack_from(">II", body, 0)
            ssnd = body[8 + off:]
        pos += 8 + clen + (clen & 1)  # IFF pads odd chunks
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND")
    ch, nframes, bits, rate = comm
    if comp not in (b"NONE", b"sowt"):
        raise NotImplementedError(
            f"AIFF-C compression {comp!r} not supported (NONE/sowt decode)"
        )
    n = nframes * ch
    if bits == 8:
        samples = np.frombuffer(ssnd[:n], np.int8)
    elif bits == 16:
        e = "<i2" if comp == b"sowt" else ">i2"
        samples = np.frombuffer(ssnd[:2 * n], e).astype("<i2")
    elif bits == 24:
        raw = np.frombuffer(ssnd[:3 * n], np.uint8).reshape(-1, 3)
        v = ((raw[:, 0].astype(np.int32) << 16)
             | (raw[:, 1].astype(np.int32) << 8) | raw[:, 2])
        samples = (v - ((v >> 23) << 24)).astype("<i4")
    elif bits == 32:
        samples = np.frombuffer(ssnd[:4 * n], ">i4").astype("<i4")
    else:
        raise NotImplementedError(f"{bits}-bit AIFF not supported")
    if samples.size != n:
        raise ValueError(
            f"AIFF sound data holds {samples.size} samples, COMM says {n}"
        )
    return rate, ch, n, samples


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fmt", StringType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("sample_sum", LongType()),
        StructField("sample_md5", StringType()),
    ]
)


def decode_audio(df: DataFrame, digest: str = "bytes") -> DataFrame:
    """REAL audio decode for WAV (PCM/float/IMA-ADPCM/G.711 — see
    :func:`decode_wav`) and FLAC payloads (the from-scratch RFC 9639
    decoder in operators/flac.py, self-checking against the stream's
    embedded MD5): per-clip sample stats + the md5 of the decoded
    samples, Arrow-batched mapInPandas (the slot an ffmpeg decode
    would fill for perceptual codecs).

    ``digest="bytes"`` (default) md5s the raw little-endian sample
    bytes; ``digest="hex"`` md5s their lowercase-hex rendering — the
    same digest a SQL oracle can recompute with ``md5(string_agg(
    printf('%02x...'), ...))``, since DuckDB's md5 only takes VARCHAR.
    For float formats sample_sum is the rounded sample total."""
    if digest not in ("bytes", "hex"):
        raise ValueError(f"digest must be 'bytes' or 'hex', got {digest!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(raw)
                if b[:4] == b"fLaC":
                    from dolphinbeat_spark.operators.flac import decode_flac

                    fmt, (rate, ch, n, samples) = "flac", decode_flac(b)
                elif b[:4] == b"FORM":
                    fmt, (rate, ch, n, samples) = "aiff", decode_aiff(b)
                else:
                    fmt, (rate, ch, n, samples) = "wav", decode_wav(b)
                if samples.dtype.kind == "f":
                    total = int(round(float(samples.sum())))
                else:
                    total = int(samples.astype(np.int64).sum())
                sb = samples.tobytes()
                rows.append(
                    (
                        mid, fmt, rate, n,
                        # duration = frames / rate (stereo interleaves 2
                        # samples per frame)
                        float(n) / ch / rate,
                        total,
                        hashlib.md5(
                            sb if digest == "bytes" else sb.hex().encode()
                        ).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "fmt", "sample_rate", "n_samples",
                    "duration_s", "sample_sum", "sample_md5",
                ],
            )

    return df.mapInPandas(batches, AUDIO_SCHEMA)


def sniff_decode_image(
    b: bytes, native: bool | None = None,
) -> tuple[str, int, int, np.ndarray]:
    """Magic-sniff one image payload -> (fmt, w, h, pixel array) —
    the shared decode slot behind decode_media and
    operators/imagehash.py.

    JPEG/WebP/TIFF prefer the NATIVE decoders
    (operators/native_codecs.py: libjpeg-turbo shim / libwebp /
    libtiff, 100-1000x the pure-Python throughput) and fall back to
    the from-scratch codecs when the library is absent or the payload
    is outside the plug's bit-exact scope. WebP and in-scope TIFF are
    bit-identical across the two paths; JPEG agrees within the +-3
    IDCT tolerance (exact on DC-only blocks) — the differential is
    pinned by tests/test_native_codecs.py. ``native=False`` forces
    the pure path (conformance oracles, md5-pinned fixtures);
    ``native=None`` follows env ``SPARK_GRAFT_NATIVE_CODECS``
    (default auto)."""
    from dolphinbeat_spark.operators import native_codecs as _nc

    if b[:2] == b"P6":
        fmt, (w, h, px) = "ppm", decode_ppm(b)
    elif b[:2] == b"P4":
        fmt, (w, h, px) = "pbm", decode_pbm(b)
    elif b[:2] == b"P5":
        fmt, (w, h, px) = "pgm", decode_pgm(b)
    elif b[:2] == b"BM":
        fmt, (w, h, px) = "bmp", decode_bmp(b)
    elif b[:8] == _PNG_SIG:
        fmt, (w, h, px) = "png", decode_png(b)
    elif b[:4] == b"GIF8":
        fmt, (w, h, px) = "gif", decode_gif(b)
    elif b[:2] == b"\xff\xd8":
        got = _nc.maybe_decode("jpeg", b, native)
        if got is None:
            from dolphinbeat_spark.operators.jpeg import decode_jpeg

            got = decode_jpeg(b)
        fmt, (w, h, px) = "jpeg", got
    elif b[:4] in (b"II*\x00", b"MM\x00*"):
        got = _nc.maybe_decode("tiff", b, native)
        if got is None:
            from dolphinbeat_spark.operators.tiff import decode_tiff

            got = decode_tiff(b)
        fmt, (w, h, px) = "tiff", got
    elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        got = _nc.maybe_decode("webp", b, native)
        if got is None:
            from dolphinbeat_spark.operators.webp import decode_webp

            got = decode_webp(b)
        fmt, (w, h, px) = "webp", got
    elif b[:4] == b"\x00\x00\x01\x00":
        fmt, (w, h, px) = "ico", decode_ico(b)
    else:
        raise NotImplementedError(
            "media formats beyond PPM/BMP/PNG/GIF/JPEG need "
            "codec libraries not present in this environment"
        )
    return fmt, w, h, px


def decode_media(
    df: DataFrame, digest: str = "bytes", native: bool | None = None,
) -> DataFrame:
    """REAL media decode: sniffs the payload magic and decodes actual
    pixel data with the from-scratch codecs (PPM, BMP, PNG, GIF,
    baseline/extended/progressive JPEG incl. 12-bit), emitting
    per-image stats + the md5 of the decoded bytes. Arrow-batched
    mapInPandas — the signature a PIL/ffmpeg decode would slot into;
    unknown formats raise NotImplementedError by name.

    ``digest="hex"`` md5s the lowercase-hex rendering of the decoded
    little-endian sample bytes instead of the raw bytes — the form a
    SQL oracle can recompute when samples are wider than one byte
    (12-bit JPEG → uint16; DuckDB's md5 takes VARCHAR only).

    ``native`` threads through to :func:`sniff_decode_image`: None
    (default) prefers the native libjpeg/libwebp/libtiff plugs with
    pure-Python fallback; False forces the from-scratch decoders
    (the conformance-oracle path)."""
    if digest not in ("bytes", "hex"):
        raise ValueError(f"digest must be 'bytes' or 'hex', got {digest!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return decode_media_batches(it, digest=digest, native=native)

    return df.mapInPandas(batches, DECODED_SCHEMA)


def decode_media_batches(
    it: Iterator[pd.DataFrame], digest: str = "bytes", native: bool | None = None
) -> Iterator[pd.DataFrame]:
    """The per-batch transform behind :func:`decode_media`, exposed so
    a producer of (media_id, payload) batches can COMPOSE with the
    decode inside ONE ``mapInPandas`` (r16, guide §4.1): chaining two
    mapInPandas nodes ships every payload byte Python->JVM->Python
    through two Arrow boundaries; composing the generators keeps the
    bytes in the Python worker and crosses the boundary once."""
    for pdf in it:
        rows = []
        for mid, raw in zip(pdf["media_id"], pdf["payload"]):
            fmt, w, h, px = sniff_decode_image(bytes(raw), native)
            px = np.ascontiguousarray(px)
            if px.dtype.itemsize > 1:  # explicit LE for the digest
                px = px.astype(px.dtype.newbyteorder("<"))
            sb = px.tobytes()
            rows.append(
                (
                    mid, fmt, w, h,
                    int(px.astype(np.int64).sum()),
                    hashlib.md5(
                        sb if digest == "bytes" else sb.hex().encode()
                    ).hexdigest(),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["media_id", "fmt", "width", "height", "pixel_sum", "pixel_md5"],
        )


def decode_media_stub(df: DataFrame, allow_fake: bool = False) -> DataFrame:
    """STUB: media decode requires codec libraries (PIL/ffmpeg/...)
    that are not available here. With ``allow_fake=True`` it emits a
    deterministic fake 'decoded' row (payload hash as pixels) so the
    surrounding pipeline is testable; otherwise it raises."""
    if not allow_fake:
        raise NotImplementedError(
            "media decode needs codec libraries (not present in this "
            "environment); pass allow_fake=True for the deterministic "
            "fake decode used in tests"
        )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("fake_pixel_checksum", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fake_pixel_checksum": pdf["payload"].map(
                        lambda b: int.from_bytes(
                            hashlib.sha256(bytes(b)).digest()[:6], "big"
                        )
                    ),
                }
            )

    return df.mapInPandas(batches, out_schema)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
        StructField("resized_payload", BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, target_width: int, target_height: int, allow_fake: bool = False
) -> DataFrame:
    """Resize plumbing (north-star op): Arrow-batched mapInPandas with
    the (payload, meta) → (resized payload, new dims) signature a real
    PIL/ffmpeg resize would have. The pixel work is STUBBED like
    decode_media_stub — without codecs the deterministic fake
    byte-stride-downsamples the payload to ~target_width bytes, so
    batch shapes, output schema, and payload-size reduction are all
    real and testable.

    At 100 TB resize is the canonical payload-shrinking map stage: run
    it EARLY (before any shuffle) so exchanges carry thumbnails, not
    originals."""
    if not allow_fake:
        raise NotImplementedError(
            "media resize needs codec libraries (not present in this "
            "environment); pass allow_fake=True for the deterministic "
            "byte-stride fake used in tests"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"].map(bytes)
            stride = payloads.map(
                lambda b: max(1, len(b) // max(1, target_width))
            )
            resized = [
                b[::s] if len(b) else b for b, s in zip(payloads, stride)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": [min(target_width, len(r)) for r in resized],
                    "out_height": target_height,
                    "resized_payload": resized,
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


# --- GIF: from-scratch LZW codec (public GIF87a/89a spec) -------------------


def encode_gif(width: int, height: int, indices: bytes) -> bytes:
    """Minimal real GIF87a writer: 256-entry grayscale global color
    table (palette[i] = (i,i,i)) + REAL LZW compression of the pixel
    index stream. The bit-width bookkeeping mirrors the decoder's
    exactly: the width grows after the i-th non-clear code when the
    DECODER's table (which trails the encoder's by one entry — it
    cannot append until it has a previous code) reaches the width
    limit, and both sides freeze appends at 4096 entries."""
    if len(indices) != width * height:
        raise ValueError(f"need {width * height} indices, got {len(indices)}")
    mcs = 8  # 256-color image: min code size 8
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    s0 = eoi + 1

    out = bytearray()
    state = {"acc": 0, "nbits": 0, "cs": mcs + 1, "dlen": s0, "first": True}

    def write(code: int) -> None:
        state["acc"] |= code << state["nbits"]
        state["nbits"] += state["cs"]
        while state["nbits"] >= 8:
            out.append(state["acc"] & 0xFF)
            state["acc"] >>= 8
            state["nbits"] -= 8

    def write_data(code: int) -> None:
        # decoder-mirrored width step: after reading a non-clear code
        # the decoder appends (except for the first after clear) and
        # widens when its table hits the limit — apply the same AFTER
        # writing, so the NEXT code uses the decoder's read width
        write(code)
        if state["first"]:
            state["first"] = False
            return
        if state["dlen"] < 4096:
            state["dlen"] += 1
            if state["dlen"] == (1 << state["cs"]) and state["cs"] < 12:
                state["cs"] += 1

    def write_clear() -> None:
        write(clear)
        state.update(cs=mcs + 1, dlen=s0, first=True)

    write_clear()
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = s0
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        write_data(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:  # dictionary full: reset, like real encoders
            write_clear()
            table = {bytes([i]): i for i in range(clear)}
            next_code = s0
        w = bytes([k])
    if w:
        write_data(table[w])
    write(eoi)
    if state["nbits"]:
        out.append(state["acc"] & 0xFF)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    hdr = b"GIF87a" + struct.pack("<HH", width, height)
    hdr += bytes([0xF7, 0, 0])  # GCT present, 8 bpp, 256 entries
    gct = bytes(v for i in range(256) for v in (i, i, i))
    img = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    return hdr + gct + img + bytes([mcs]) + bytes(blocks) + b"\x3b"


def decode_ico(data: bytes) -> tuple[int, int, np.ndarray]:
    """ICO (favicon) → the LARGEST contained image as HxWx4 RGBA.
    Each directory entry is either an embedded PNG (sniffed by magic
    — the modern high-res layout; missing channels normalized to
    RGBA) or a headerless DIB whose BITMAPINFOHEADER declares DOUBLED
    height: XOR color rows (decoded by wrapping the DIB in a
    synthetic BMP header with the height patched back, reusing
    decode_bmp's full palette/RLE/depth matrix) followed by the 1-bit
    AND transparency mask, which becomes the alpha plane (mask bit 1
    = transparent) — so favicon dedup never hashes away transparency
    differences. A truncated/absent mask degrades to opaque."""
    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO payload")
    (count,) = struct.unpack_from("<H", data, 4)
    if count == 0:
        raise ValueError("ICO with no images")
    best = None
    for i in range(count):
        e = 6 + 16 * i
        if e + 16 > len(data):
            raise ValueError("ICO directory truncated")
        w, h = data[e] or 256, data[e + 1] or 256
        size, off = struct.unpack_from("<II", data, e + 8)
        if off + size > len(data):
            raise ValueError(f"ICO entry {i} overruns the payload")
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, off, size)
    _, _, off, size = best
    blob = data[off:off + size]

    def rgba(w: int, h: int, px: np.ndarray,
             alpha: np.ndarray | None) -> tuple[int, int, np.ndarray]:
        full = 65535 if px.dtype.itemsize > 1 else 255
        c = px.shape[2]
        if c == 1:  # gray
            px = np.repeat(px, 3, axis=2)
        elif c == 2:  # gray + alpha
            alpha = px[:, :, 1:]
            px = np.repeat(px[:, :, :1], 3, axis=2)
        elif c == 4:  # alpha already present wins over the AND mask
            alpha = px[:, :, 3:]
            px = px[:, :, :3]
        if alpha is None:
            alpha = np.full((h, w, 1), full, dtype=px.dtype)
        return w, h, np.concatenate(
            [px, alpha.astype(px.dtype)], axis=2
        )

    if blob[:8] == _PNG_SIG:
        w, h, px = decode_png(blob)
        return rgba(w, h, px, None)
    # headerless DIB: patch the doubled height, wrap in a BM header
    if len(blob) < 40:
        raise ValueError("ICO DIB truncated")
    hsz, w, h2 = struct.unpack_from("<Iii", blob, 0)
    if hsz != 40:
        raise ValueError(f"ICO DIB header size {hsz} unsupported")
    h = h2 // 2
    bpp, comp = struct.unpack_from("<HI", blob, 14)
    clr_used = struct.unpack_from("<I", blob, 32)[0]
    ncolors = clr_used or ((1 << bpp) if bpp <= 8 else 0)
    pix_off = 14 + 40 + 4 * ncolors
    patched = bytearray(blob)
    patched[8:12] = struct.pack("<i", h)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + len(blob), 0, 0, pix_off)
    w, h, px = decode_bmp(hdr + bytes(patched))
    # the AND mask: 1-bit rows padded to 32-bit boundaries, bottom-up,
    # AFTER the XOR rows (only reachable for uncompressed DIBs — RLE
    # sizes vary, and wild RLE icons are essentially extinct)
    alpha = None
    if comp == 0 and bpp in (1, 4, 8, 16, 24, 32):
        xor_stride = (w * bpp + 31) // 32 * 4
        mask_off = pix_off - 14 + xor_stride * h
        mask_stride = (w + 31) // 32 * 4
        if mask_off + mask_stride * h <= len(blob):
            rows = np.frombuffer(
                blob, np.uint8, count=mask_stride * h, offset=mask_off
            ).reshape(h, mask_stride)
            bits = np.unpackbits(rows, axis=1)[:, :w]  # MSB-first
            alpha = np.where(bits[::-1], 0, 255).astype(np.uint8)
            alpha = alpha.reshape(h, w, 1)
    return rgba(w, h, px, alpha)


def decode_gif(data: bytes) -> tuple[int, int, np.ndarray]:
    """GIF → (width, height, HxWx3 uint8 RGB via the color table).
    Real decode: logical-screen parse, global/local color tables,
    full LZW decompression (variable code width LSB-first, clear/EOI,
    KwKwK case, dictionary growth to 12 bits, reset) and the 4-pass
    interlace row reorder, per the public spec. Animation extension
    blocks are skipped (first frame decodes); any malformed byte
    surfaces as a typed ValueError, never a foreign IndexError."""
    try:
        return _decode_gif(data)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, struct.error) as ex:
        raise ValueError(f"malformed GIF: {ex}") from ex


def _decode_gif(data: bytes) -> tuple[int, int, np.ndarray]:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    if not packed & 0x80:
        raise NotImplementedError("GIF without a global color table")
    gct_n = 2 << (packed & 0x07)
    pos = 13
    gct = np.frombuffer(data, np.uint8, count=gct_n * 3, offset=pos).reshape(gct_n, 3)
    pos += gct_n * 3
    # skip 89a extension blocks until the image descriptor
    while pos < len(data) and data[pos] == 0x21:
        pos += 2
        while data[pos]:
            pos += 1 + data[pos]
        pos += 1
    if pos >= len(data) or data[pos] != 0x2C:
        raise ValueError("GIF image descriptor not found")
    left, top, w, h = struct.unpack_from("<HHHH", data, pos + 1)
    ipacked = data[pos + 9]
    pos += 10
    if ipacked & 0x80:
        # local color table overrides the global one for this image
        lct_n = 2 << (ipacked & 0x07)
        gct = np.frombuffer(data, np.uint8, count=lct_n * 3, offset=pos).reshape(
            lct_n, 3
        )
        gct_n = lct_n
        pos += lct_n * 3
    interlaced = bool(ipacked & 0x40)
    if pos >= len(data):
        raise ValueError("truncated GIF: missing LZW minimum code size")
    mcs = data[pos]
    pos += 1
    stream = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: unterminated data sub-blocks")
        n = data[pos]
        if n == 0:
            break
        if pos + 1 + n > len(data):
            raise ValueError("truncated GIF: short data sub-block")
        stream += data[pos + 1:pos + 1 + n]
        pos += 1 + n
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    code_size = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    bi = 0
    while True:
        while nbits < code_size:
            if bi >= len(stream):
                raise ValueError("GIF LZW stream ended without EOI")
            acc |= stream[bi] << nbits
            bi += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) != w * h:
        raise ValueError(f"GIF pixel stream: expected {w * h}, got {len(out)}")
    idx = np.frombuffer(bytes(out), np.uint8)
    if int(idx.max(initial=0)) >= gct_n:
        raise ValueError("GIF pixel index beyond the color table")
    px = idx.reshape(h, w)
    if interlaced:
        # GIF 4-pass interlace: rows arrive as 0::8, 4::8, 2::4, 1::2
        out_rows = np.zeros_like(px)
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        for src, dst in enumerate(order):
            out_rows[dst] = px[src]
        px = out_rows
    return w, h, gct[px.reshape(-1)].reshape(h, w, 3)
