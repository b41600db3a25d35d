"""TIFF decode from scratch — the public TIFF 6.0 specification.

The scanned-document / scientific-imaging format: baseline TIFF in
both byte orders with strip organization, uncompressed / PackBits /
LZW compression (the TIFF LZW variant: MSB-first codes, 9-bit start,
Clear=256, EOI=257, and the spec's EARLY code-width change at table
sizes 511/1023/2047 — one code earlier than GIF's LSB-first LZW,
which operators/multimodal.py implements separately), the horizontal
differencing predictor, photometric interpretations WhiteIsZero /
BlackIsZero / RGB / Palette (ColorMap 16-bit entries scaled to
8-bit), 8- and 16-bit samples, multi-strip images, TILED organization
(§15: TileWidth/TileLength/TileOffsets walk with edge-tile cropping —
satellite/scan imagery is predominantly tiled), and planar
configuration 2 (§14: per-plane strips/tiles, plane-major order).

Bilevel CCITT TIFF (Compression 2/3/4 = MH/T.4/T.6) decodes via
operators/ccitt.py (r11), new-style JPEG-in-TIFF (Compression 7,
TechNote 2 — scanned/archival TIFFs use it heavily) via
operators/jpeg.py with the shared JPEGTables tag honored (r13), in
strip and tile organization, and OLD-style JPEG (Compression 6,
TIFF 6.0 §22, withdrawn but alive in scanner/early-digicam output)
in both wild layouts — the embedded interchange stream (513/514) and
the raw-table tags (519/520/521) with bare entropy strips rebuilt
into standalone JPEGs (r15). Honest boundaries raise by name:
floating-point samples, §22 lossless proc 14, §22 subsampled-YCbCr
tables form.

Verification stance (tests/test_multimodal.py +
tools/tiff_conformance.py): decoder pinned by a hand-assembled LZW
code stream computed from the spec's own algorithm walk-through,
independent of the writer; writer->decoder roundtrips across the
compression × predictor × photometric matrix; and the system libtiff
as the third implementation over the full matrix (incl. CCITT and
JPEG-in-TIFF, where agreement is within ±1 gray level of libjpeg's
IDCT).

At 100 TB the decode runs one-image-per-row inside the same Arrow
``mapInPandas`` slot as the other codecs
(operators/multimodal.py::decode_media).
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    """Typed TIFF format error."""


_TYPES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1}  # type -> size


def _read_ifd_values(data: bytes, end: str, off: int) -> dict[int, list[int]]:
    """IFD0 -> {tag: [int values]} for the integer types the baseline
    needs (BYTE/SHORT/LONG; RATIONAL read as num/den pairs)."""
    if off + 2 > len(data):
        raise TiffError("IFD offset beyond the payload")
    (n,) = struct.unpack_from(end + "H", data, off)
    out: dict[int, list[int]] = {}
    p = off + 2
    if p + 12 * n > len(data):
        raise TiffError("IFD entry table truncated")
    for _ in range(n):
        tag, typ, count = struct.unpack_from(end + "HHI", data, p)
        size = _TYPES.get(typ)
        if size is None:
            p += 12
            continue
        total = size * count
        voff = p + 8
        if total > 4:
            (voff,) = struct.unpack_from(end + "I", data, p + 8)
        if voff + total > len(data):
            raise TiffError(f"tag {tag} value overruns the payload")
        if typ in (1, 2, 6, 7):  # BYTE/ASCII/SBYTE/UNDEFINED
            vals = list(data[voff:voff + count])
        elif typ == 3:
            vals = list(struct.unpack_from(end + "H" * count, data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(end + "I" * count, data, voff))
        else:  # RATIONAL: flatten num/den
            vals = list(struct.unpack_from(end + "I" * (2 * count), data,
                                           voff))
        out[tag] = vals
        p += 12
    return out


def tiff_lzw_decode(data: bytes, limit: int) -> bytes:
    """The TIFF 6.0 LZW variant: MSB-first bit order, 9-bit initial
    width, ClearCode 256 / EOI 257, dictionary growth with the EARLY
    width change (at 511/1023/2047 entries, i.e. one code before the
    table actually fills — TIFF spec §13)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    tlen = len(table)
    outlen = 0
    while True:
        while nbits < width:
            if pos >= n:
                raise TiffError("LZW stream ended without EOI")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = acc >> nbits
        # mask the consumed bits out — an unmasked accumulator grows
        # into a bignum and turns every shift O(stream length) (the
        # r13 codec-throughput bench caught this at 0.12 MB/s)
        acc &= (1 << nbits) - 1
        if code == 256:  # Clear
            reset()
            tlen = len(table)
            prev = None
            continue
        if code == 257:  # EOI
            return bytes(out)
        if prev is None:
            if code >= tlen:
                raise TiffError("LZW first code after clear out of range")
            entry = table[code]
        elif code < tlen:
            entry = table[code]
            table.append(prev + entry[:1])
            tlen += 1
        elif code == tlen:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
            tlen += 1
        else:
            raise TiffError(f"LZW code {code} beyond table size {tlen}")
        out += entry
        outlen += len(entry)
        if outlen > limit:
            raise TiffError("LZW output exceeds the declared strip size")
        prev = entry
        # EARLY change: width grows one code before the table fills
        if tlen == 511 or tlen == 1023 or tlen == 2047:
            width += 1
    raise TiffError("unreachable")


def _packbits_decode(data: bytes, limit: int) -> bytes:
    out = bytearray()
    p = 0
    while p < len(data):
        n = data[p]
        p += 1
        if n == 128:
            continue
        if n < 128:
            if p + n + 1 > len(data):
                raise TiffError("PackBits literal run truncated")
            out += data[p:p + n + 1]
            p += n + 1
        else:
            if p >= len(data):
                raise TiffError("PackBits repeat run truncated")
            out += bytes([data[p]]) * (257 - n)
            p += 1
        if len(out) > limit:
            raise TiffError("PackBits output exceeds the declared strip size")
    return bytes(out)


def _decode_chunk(chunk: bytes, comp: int, limit: int, what: str) -> bytes:
    """One strip/tile through the declared compression; exact size."""
    if comp == 1:
        dec = chunk
    elif comp == 5:
        dec = tiff_lzw_decode(chunk, limit)
    elif comp == 32773:
        dec = _packbits_decode(chunk, limit)
    else:
        raise NotImplementedError(
            f"TIFF compression {comp} not supported "
            "(1/5/32773 = none/LZW/PackBits decode)"
        )
    if len(dec) != limit:
        raise TiffError(
            f"{what} decodes to {len(dec)} bytes, expected {limit}"
        )
    return dec


def _decode_tiff_ccitt(data: bytes, t: dict, w: int, h: int,
                       one) -> tuple[int, int, np.ndarray]:
    """CCITT-compressed bilevel TIFF (Compression 2/3/4) -> 8-bit
    grayscale (black 0 / white 255). Strips restart the coder. T4/T6
    uncompressed-mode option bits raise by name."""
    from dolphinbeat_spark.operators.ccitt import CcittError, ccitt_decode

    spp = one(277, 1)
    depth = t.get(258, [1])[0]
    if spp != 1 or depth != 1:
        raise TiffError(
            f"CCITT TIFF must be 1-bit single-sample, got {depth}-bit "
            f"x{spp}"
        )
    comp = one(259, 1)
    photo = one(262, 0)  # the fax norm: WhiteIsZero
    if photo not in (0, 1):
        raise TiffError(f"CCITT TIFF photometric {photo} is not bilevel")
    if comp == 2:
        mode, ba = "mh", False
    elif comp == 3:
        opts = one(292, 0)
        if opts & 2:
            raise NotImplementedError(
                "T.4 uncompressed mode (T4Options bit 1) not supported"
            )
        mode, ba = ("g3-2d" if opts & 1 else "g3-1d"), bool(opts & 4)
    else:
        opts = one(293, 0)
        if opts & 2:
            raise NotImplementedError(
                "T.6 uncompressed mode (T6Options bit 1) not supported"
            )
        mode, ba = "g4", False
    offsets, counts = t.get(273), t.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("TIFF strip offsets/byte-counts missing or unequal")
    rps = one(278, h)
    if rps <= 0:
        raise TiffError(f"bad RowsPerStrip {rps}")
    if len(offsets) != (h + rps - 1) // rps:
        raise TiffError(
            f"{len(offsets)} strips, geometry wants {(h + rps - 1) // rps}"
        )
    out = np.zeros((h, w), np.uint8)
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise TiffError(f"strip {si} overruns the payload")
        nrows = min(rps, h - si * rps)
        try:
            blk = ccitt_decode(data[off:off + cnt], w, nrows,
                               mode=mode, byte_align=ba)
        except CcittError as ex:
            raise TiffError(f"CCITT strip {si}: {ex}") from ex
        out[si * rps:si * rps + nrows] = blk
    # decompressed bit 1: black under WhiteIsZero, white under
    # MinIsBlack (rare, but libtiff honors the inversion)
    gray = (1 - out) * 255 if photo == 0 else out * 255
    return w, h, gray.astype(np.uint8).reshape(h, w, 1)


def _merge_jpegtables(tables: bytes, strip: bytes, what: str) -> bytes:
    """TIFF TechNote 2: an abbreviated strip/tile stream + the shared
    JPEGTables blob -> one standalone JPEG (tables spliced between
    the strip's SOI and its frame markers)."""
    if strip[:2] != b"\xff\xd8":
        raise TiffError(f"{what} JPEG stream lacks SOI")
    if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
        raise TiffError("JPEGTables blob is not SOI .. EOI framed")
    return b"\xff\xd8" + tables[2:-2] + strip[2:]


def _decode_tiff_jpeg(data: bytes, t: dict, w: int, h: int,
                      one) -> tuple[int, int, np.ndarray]:
    """JPEG-in-TIFF (Compression 7, the TechNote 2 'new-style' JPEG
    scanned/archival TIFFs use) -> 8-bit pixels via the in-repo JPEG
    decoder (operators/jpeg.py — the same reuse as r11's
    DCTDecode-in-PDF). Strips/tiles are independent JPEG streams,
    abbreviated against the shared JPEGTables tag (347) when
    present; MCU-padded segment edges crop to the declared
    geometry."""
    from dolphinbeat_spark.operators.jpeg import JpegError, decode_jpeg

    spp = one(277, 1)
    depth = t.get(258, [8])[0]
    photo = one(262, 6)
    if depth != 8:
        raise TiffError(f"JPEG TIFF must be 8-bit, got {depth}")
    if spp not in (1, 3):
        raise TiffError(f"JPEG TIFF wants 1 or 3 samples, got {spp}")
    if photo not in (1, 2, 6):
        raise NotImplementedError(
            f"JPEG TIFF photometric {photo} not supported "
            "(1/2/6 = gray/RGB/YCbCr; the decoder emits RGB)")
    if one(284, 1) != 1:
        raise NotImplementedError(
            "JPEG TIFF planar configuration 2 not supported")
    tables = bytes(t[347]) if 347 in t else None

    def one_jpeg(chunk: bytes, cw: int, chh: int, what: str):
        blob = _merge_jpegtables(tables, chunk, what) if tables \
            else chunk
        try:
            jw, jh, arr = decode_jpeg(blob)
        except JpegError as ex:
            raise TiffError(f"{what}: {ex}") from ex
        if arr.shape[2] != spp:
            raise TiffError(
                f"{what} decodes {arr.shape[2]} components, "
                f"TIFF says {spp}")
        # writers pad segments to MCU multiples: crop, never stretch
        if jw < cw or jh < chh:
            raise TiffError(
                f"{what} is {jw}x{jh}, geometry wants {cw}x{chh}")
        return arr[:chh, :cw]

    px = np.zeros((h, w, spp), np.uint8)
    if 322 in t or 323 in t:  # tiled
        tw, th = one(322), one(323)
        if not tw or not th:
            raise TiffError("tile geometry tags missing")
        offsets, counts = t.get(324), t.get(325)
        tx = (w + tw - 1) // tw
        ty = (h + th - 1) // th
        if not offsets or len(offsets) != tx * ty \
                or len(counts or []) != tx * ty:
            raise TiffError(
                f"{len(offsets or [])} tiles, geometry wants {tx * ty}")
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise TiffError(f"tile {i} overruns the payload")
            y0 = (i // tx) * th
            x0 = (i % tx) * tw
            cw = min(tw, w - x0)
            chh = min(th, h - y0)
            px[y0:y0 + chh, x0:x0 + cw] = one_jpeg(
                data[off:off + cnt], cw, chh, f"tile {i}")
    else:
        offsets, counts = t.get(273), t.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TiffError(
                "TIFF strip offsets/byte-counts missing or unequal")
        rps = one(278, h)
        if rps <= 0:
            raise TiffError(f"bad RowsPerStrip {rps}")
        if len(offsets) != (h + rps - 1) // rps:
            raise TiffError(
                f"{len(offsets)} strips, geometry wants "
                f"{(h + rps - 1) // rps}")
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise TiffError(f"strip {si} overruns the payload")
            nrows = min(rps, h - si * rps)
            px[si * rps:si * rps + nrows] = one_jpeg(
                data[off:off + cnt], w, nrows, f"strip {si}")
    return w, h, px


def _decode_tiff_ojpeg(data: bytes, t: dict, w: int, h: int,
                       one) -> tuple[int, int, np.ndarray]:
    """Old-style JPEG-in-TIFF (Compression 6, TIFF 6.0 §22 —
    withdrawn by TechNote 2 but alive in scanner/early-digicam
    output). Two wild layouts:

    1. JPEGInterchangeFormat (513) + ...Length (514): a COMPLETE
       SOI..EOI interchange stream embedded in the file — the
       dominant form; decode it directly.
    2. the raw-tables form: JPEGQTables (519) points at 64-byte
       quantization tables, JPEGDC/ACTables (520/521) at DHT payloads
       (16 counts + values, no Tc/Th byte), one pointer per
       component; strips carry BARE entropy-coded data. Rebuild a
       standalone baseline JPEG per strip (SOI + DQT/DHT + SOF0 +
       optional DRI from JPEGRestartInterval 515 + SOS + data + EOI)
       and decode with the shared operators/jpeg.py path.

    Named boundaries: JPEGProc != 1 (lossless proc 14), planar
    configuration 2, subsampled YCbCr in the tables form (the
    interchange form carries its own sampling factors and is fully
    covered by the JPEG decoder)."""
    from dolphinbeat_spark.operators.jpeg import JpegError, decode_jpeg

    spp = one(277, 1)
    if one(284, 1) != 1:
        raise NotImplementedError(
            "old-style JPEG TIFF planar configuration 2 not supported")

    if 513 in t:  # layout 1: embedded interchange stream
        off = one(513)
        ln = one(514, len(data) - off)
        if off + ln > len(data) or off < 0:
            raise TiffError("JPEGInterchangeFormat overruns the payload")
        blob = data[off:off + ln]
        if blob[:2] != b"\xff\xd8":
            raise TiffError("JPEGInterchangeFormat stream lacks SOI")
        try:
            jw, jh, arr = decode_jpeg(blob)
        except JpegError as ex:
            raise TiffError(f"old-style JPEG stream: {ex}") from ex
        if jw < w or jh < h:
            raise TiffError(
                f"old-style JPEG is {jw}x{jh}, geometry wants {w}x{h}")
        if arr.shape[2] != spp:
            raise TiffError(
                f"old-style JPEG stream decodes {arr.shape[2]} "
                f"components, IFD SamplesPerPixel says {spp}")
        return w, h, arr[:h, :w]

    if 519 not in t or 520 not in t or 521 not in t:
        raise NotImplementedError(
            "old-style JPEG TIFF without JPEGInterchangeFormat needs "
            "the JPEGQTables/JPEGDCTables/JPEGACTables form")
    if one(512, 1) != 1:
        raise NotImplementedError(
            f"old-style JPEG proc {one(512)} (lossless) not supported"
            " — baseline proc 1 is")
    photo = one(262, 6)
    if photo == 6:
        sub = t.get(530, [2, 2])  # YCbCrSubSampling defaults to 2,2
        if list(sub) != [1, 1]:
            raise NotImplementedError(
                "old-style JPEG tables form with subsampled YCbCr "
                f"{list(sub)} not supported; [1, 1] is")
    elif photo != 1:
        raise NotImplementedError(
            f"old-style JPEG tables form photometric {photo} not "
            "supported (1 gray / 6 YCbCr are; the shared JPEG decoder "
            "color-converts 3-component scans as YCbCr)")
    if len(t[519]) < spp or len(t[520]) < spp or len(t[521]) < spp:
        raise TiffError("old-style JPEG table pointer count < SamplesPerPixel")

    def qtable(i: int) -> bytes:
        off = t[519][i]
        if off + 64 > len(data):
            raise TiffError(f"JPEGQTables[{i}] overruns the payload")
        return bytes([0 << 4 | i]) + data[off:off + 64]

    def htable(tag: int, cls: int, i: int) -> bytes:
        off = t[tag][i]
        if off + 16 > len(data):
            raise TiffError(f"DHT pointer [{i}] overruns the payload")
        counts = data[off:off + 16]
        n = sum(counts)
        if off + 16 + n > len(data):
            raise TiffError(f"DHT values [{i}] overrun the payload")
        return bytes([cls << 4 | i]) + data[off:off + 16 + n]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    tables = b"".join(seg(0xFFDB, qtable(i)) for i in range(spp))
    tables += b"".join(seg(0xFFC4, htable(520, 0, i)) for i in range(spp))
    tables += b"".join(seg(0xFFC4, htable(521, 1, i)) for i in range(spp))
    ri = one(515, 0)
    if ri:
        tables += seg(0xFFDD, struct.pack(">H", ri))

    offsets, counts = t.get(273), t.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("TIFF strip offsets/byte-counts missing or unequal")
    rps = one(278, h)
    if rps <= 0 or len(offsets) != (h + rps - 1) // rps:
        raise TiffError(
            f"{len(offsets)} strips, geometry wants {(h + rps - 1) // rps}")

    px = np.zeros((h, w, spp), np.uint8)
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise TiffError(f"strip {si} overruns the payload")
        nrows = min(rps, h - si * rps)
        sof = struct.pack(">BHHB", 8, nrows, w, spp) + b"".join(
            bytes([i + 1, 0x11, i]) for i in range(spp))
        sos = bytes([spp]) + b"".join(
            bytes([i + 1, i << 4 | i]) for i in range(spp)) \
            + bytes([0, 63, 0])
        blob = (b"\xff\xd8" + tables + seg(0xFFC0, sof)
                + seg(0xFFDA, sos) + data[off:off + cnt] + b"\xff\xd9")
        try:
            jw, jh, arr = decode_jpeg(blob)
        except JpegError as ex:
            raise TiffError(f"old-style JPEG strip {si}: {ex}") from ex
        if arr.shape[2] != spp or jw < w or jh < nrows:
            raise TiffError(
                f"strip {si} decodes {jw}x{jh}x{arr.shape[2]}, "
                f"geometry wants {w}x{nrows}x{spp}")
        px[si * rps:si * rps + nrows] = arr[:nrows, :w]
    return w, h, px


def decode_tiff(data: bytes) -> tuple[int, int, np.ndarray]:
    """TIFF -> (width, height, HxWxC uint8/uint16 array). Handles
    strip AND tile organization (TIFF 6.0 §15 — satellite/scan
    imagery is predominantly tiled) and both planar configurations
    (chunky and per-plane separate, §14)."""
    if data[:2] == b"II":
        end = "<"
    elif data[:2] == b"MM":
        end = ">"
    else:
        raise TiffError("not a TIFF payload (no II/MM byte order)")
    (magic,) = struct.unpack_from(end + "H", data, 2)
    if magic != 42:
        raise TiffError(f"bad TIFF magic {magic}")
    (ifd_off,) = struct.unpack_from(end + "I", data, 4)
    t = _read_ifd_values(data, end, ifd_off)

    def one(tag, default=None):
        v = t.get(tag)
        if not v:  # absent OR a corrupt zero-count entry
            if default is None:
                raise TiffError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if w <= 0 or h <= 0:
        raise TiffError(f"bad TIFF geometry {w}x{h}")
    spp = one(277, 1)
    if w * h * max(spp, 1) > (1 << 29):  # hostile-header allocation guard
        raise TiffError(f"TIFF geometry {w}x{h}x{spp} exceeds the decode cap")
    bits = t.get(258, [8])
    if len(set(bits)) != 1:
        raise NotImplementedError("mixed bits-per-sample not supported")
    depth = bits[0]
    comp = one(259, 1)
    photo = one(262, 1)
    if comp in (2, 3, 4):  # CCITT bilevel (MH / T.4 / T.6)
        return _decode_tiff_ccitt(data, t, w, h, one)
    if comp == 7:  # new-style JPEG (TechNote 2)
        return _decode_tiff_jpeg(data, t, w, h, one)
    if comp == 6:  # old-style JPEG (TIFF 6.0 §22, withdrawn) — r15
        return _decode_tiff_ojpeg(data, t, w, h, one)
    if depth not in (8, 16):
        raise NotImplementedError(f"{depth}-bit TIFF samples not supported")
    planar = one(284, 1)
    predictor = one(317, 1)
    if planar not in (1, 2):
        raise TiffError(f"bad planar configuration {planar}")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    if comp != 5:
        # TIFF 6.0 §14 defines Predictor FOR LZW; the reference
        # reader ignores the tag for other codecs (wild files carry
        # stray Predictor=2 next to PackBits) — match it (r12,
        # caught by the libtiff differential harness)
        predictor = 1
    unit = depth // 8
    dt = np.uint8 if depth == 8 else end + "u2"
    work = np.int32 if depth == 8 else np.int64
    maxval = (1 << depth) - 1
    planes = spp if planar == 2 else 1
    ch = 1 if planar == 2 else spp  # interleaved samples per segment

    def undiff(a: np.ndarray) -> np.ndarray:
        # horizontal differencing restarts at every segment row start
        return np.cumsum(a, axis=1) & maxval if predictor == 2 else a

    px = np.zeros((h, w, spp), dtype=work)
    if 322 in t or 324 in t:  # TileWidth / TileOffsets: tiled (§15)
        tw, th = one(322), one(323)
        if tw <= 0 or th <= 0:
            raise TiffError(f"bad tile geometry {tw}x{th}")
        toffs, tcnts = t.get(324), t.get(325)
        if not toffs or not tcnts or len(toffs) != len(tcnts):
            raise TiffError("tile offsets/byte-counts missing or unequal")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if len(toffs) != across * down * planes:
            raise TiffError(
                f"{len(toffs)} tiles, geometry wants {across * down * planes}"
            )
        limit = tw * th * ch * unit
        i = 0
        for plane in range(planes):
            for ty in range(down):
                for tx in range(across):
                    off, cnt = toffs[i], tcnts[i]
                    if off + cnt > len(data):
                        raise TiffError(f"tile {i} overruns the payload")
                    dec = _decode_chunk(
                        data[off:off + cnt], comp, limit, f"tile {i}"
                    )
                    tile = np.frombuffer(dec, dt).reshape(th, tw, ch)
                    tile = undiff(tile.astype(work))
                    y0, x0 = ty * th, tx * tw
                    ny, nx = min(th, h - y0), min(tw, w - x0)
                    dst = px[y0:y0 + ny, x0:x0 + nx]
                    if planar == 2:
                        dst[:, :, plane] = tile[:ny, :nx, 0]
                    else:
                        dst[:, :, :] = tile[:ny, :nx]
                    i += 1
    else:  # strips
        offsets = t.get(273)
        counts = t.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TiffError(
                "TIFF strip offsets/byte-counts missing or unequal"
            )
        rps = one(278, h)
        if rps <= 0:
            raise TiffError(f"bad RowsPerStrip {rps}")
        per_plane = (h + rps - 1) // rps
        if len(offsets) != per_plane * planes:
            raise TiffError(
                f"{len(offsets)} strips, geometry wants {per_plane * planes}"
            )
        row_bytes = w * ch * unit
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            plane, si = divmod(i, per_plane)
            if off + cnt > len(data):
                raise TiffError(f"strip {i} overruns the payload")
            nrows = min(rps, h - si * rps)
            dec = _decode_chunk(
                data[off:off + cnt], comp, nrows * row_bytes, f"strip {i}"
            )
            seg = np.frombuffer(dec, dt).reshape(nrows, w, ch)
            seg = undiff(seg.astype(work))
            y0 = si * rps
            if planar == 2:
                px[y0:y0 + nrows, :, plane] = seg[:, :, 0]
            else:
                px[y0:y0 + nrows] = seg
    if photo == 0:  # WhiteIsZero
        px = maxval - px
    elif photo == 3:  # Palette
        cmap = t.get(320)
        nc = 1 << depth
        if not cmap or len(cmap) != 3 * nc:
            raise TiffError("palette TIFF missing a full ColorMap")
        if spp != 1:
            raise TiffError("palette TIFF must have one sample per pixel")
        lut = np.array(cmap, np.int64).reshape(3, nc).T >> 8  # 16->8 bit
        px = lut[px.reshape(h, w)]
        return w, h, px.astype(np.uint8)
    elif photo == 2:
        if spp < 3:
            raise TiffError("RGB TIFF with fewer than 3 samples")
    elif photo != 1:
        raise NotImplementedError(
            f"TIFF photometric interpretation {photo} not supported"
        )
    dtype = np.uint8 if depth == 8 else np.uint16
    return w, h, px.astype(dtype)


# --- writer (fixture generator) ----------------------------------------------


def tiff_lzw_encode(data: bytes) -> bytes:
    """Greedy TIFF-LZW writer with the spec's early width change —
    the encoder mirror for fixtures."""
    out = bytearray()
    acc = nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    put(256, width)  # leading Clear, as libtiff writes
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        table[cand] = nxt
        nxt += 1
        if nxt in (512, 1024, 2048):
            width += 1
        if nxt == 4094:  # near-full: clear, as the spec recommends
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        run = bytes([b])
    if run:
        put(table[run], width)
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:  # repeat run
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        j = i
        while (j + 1 < n and data[j + 1] != data[j] and j - i < 127):
            j += 1
        if j + 1 >= n:
            j = min(n - 1, i + 127)
        out.append(j - i)
        out += data[i:j + 1]
        i = j + 1
    return bytes(out)


def encode_tiff(width: int, height: int, pixels: bytes, spp: int = 1,
                depth: int = 8, compression: int = 1, photometric=None,
                predictor: int = 1, rows_per_strip: int | None = None,
                byte_order: str = "<",
                colormap: list[int] | None = None,
                planar: int = 1,
                tile: tuple[int, int] | None = None) -> bytes:
    """Format-faithful baseline TIFF writer (fixture generator).
    ``pixels``: row-major samples, 1 byte each at depth 8, 2 bytes in
    ``byte_order`` at depth 16. ``tile=(tw, th)`` switches to tiled
    organization (§15, zero-padded edge tiles); ``planar=2`` writes
    per-plane segments in plane-major order (§14)."""
    end = byte_order
    if photometric is None:
        photometric = 2 if spp >= 3 else 1
    unit = depth // 8
    if len(pixels) != width * height * spp * unit:
        raise ValueError("pixel byte count does not match the geometry")
    if planar not in (1, 2):
        raise ValueError(f"bad planar configuration {planar}")
    rps = rows_per_strip or height
    if depth == 8:
        arr = np.frombuffer(pixels, np.uint8).reshape(height, width, spp)
        arr = arr.astype(np.int64)
        maxval = 255
    else:
        arr = np.frombuffer(pixels, end + "u2").reshape(height, width, spp)
        arr = arr.astype(np.int64)
        maxval = 65535

    if predictor == 2 and compression != 5:
        raise ValueError(
            "Predictor=2 is defined for LZW only (TIFF 6.0 §14); "
            "readers ignore it for other codecs"
        )

    def pack(a: np.ndarray) -> bytes:
        if predictor == 2:  # differencing restarts per segment row
            a = np.concatenate(
                [a[:, :1], (a[:, 1:] - a[:, :-1]) & maxval], axis=1
            )
        if depth == 8:
            return a.astype(np.uint8).tobytes()
        return a.astype(end + "u2").tobytes()

    def compress(chunk: bytes) -> bytes:
        if compression == 5:
            return tiff_lzw_encode(chunk)
        if compression == 32773:
            return _packbits_encode(chunk)
        if compression != 1:
            raise ValueError(f"unsupported compression {compression}")
        return chunk

    plane_arrs = (
        [arr[:, :, p:p + 1] for p in range(spp)] if planar == 2 else [arr]
    )
    strips = []
    if tile is not None:
        tw, th = tile
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        for pa in plane_arrs:
            padded = np.zeros((down * th, across * tw, pa.shape[2]),
                              dtype=np.int64)
            padded[:height, :width] = pa
            for ty in range(down):
                for tx in range(across):
                    t_arr = padded[ty * th:(ty + 1) * th,
                                   tx * tw:(tx + 1) * tw]
                    strips.append(compress(pack(t_arr)))
    else:
        for pa in plane_arrs:
            for r0 in range(0, height, rps):
                strips.append(compress(pack(pa[r0:r0 + rps])))

    entries = []  # (tag, type, count, values)
    entries.append((256, 4, 1, [width]))
    entries.append((257, 4, 1, [height]))
    entries.append((258, 3, spp, [depth] * spp))
    entries.append((259, 3, 1, [compression]))
    entries.append((262, 3, 1, [photometric]))
    entries.append((277, 3, 1, [spp]))
    if planar != 1:
        entries.append((284, 3, 1, [planar]))
    if tile is not None:
        entries.append((322, 4, 1, [tile[0]]))
        entries.append((323, 4, 1, [tile[1]]))
        entries.append((325, 4, len(strips), [len(s) for s in strips]))
        entries.append((324, 4, len(strips), [0] * len(strips)))  # patched
    else:
        entries.append((278, 4, 1, [rps]))
        entries.append((279, 4, len(strips), [len(s) for s in strips]))
        entries.append((273, 4, len(strips), [0] * len(strips)))  # patched
    if predictor != 1:
        entries.append((317, 3, 1, [predictor]))
    if colormap is not None:
        entries.append((320, 3, len(colormap), list(colormap)))
    entries.sort(key=lambda e: e[0])
    return _assemble_tiff(entries, strips, end,
                          off_tag=324 if tile is not None else 273)


def _assemble_tiff(entries: list, strips: list[bytes], end: str,
                   off_tag: int) -> bytes:
    """IFD + data assembly shared by the fixture writers: ``entries``
    = (tag, type, count, values) sorted by tag; ``off_tag`` (273/324)
    gets patched with the final strip/tile offsets."""
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    extra = bytearray()
    table = bytearray()
    packed = {}
    for tag, typ, count, vals in entries:
        if typ in (1, 7):  # BYTE / UNDEFINED
            payload = bytes(vals)
        else:
            code = "H" if typ == 3 else "I"
            payload = b"".join(struct.pack(end + code, v) for v in vals)
        if len(payload) <= 4:
            packed[tag] = ("inline", None)
            val = payload + bytes(4 - len(payload))
        else:
            packed[tag] = ("extra", data_off + len(extra))
            val = struct.pack(end + "I", data_off + len(extra))
            extra += payload
        table += struct.pack(end + "HHI", tag, typ, count) + val
    strips_off = data_off + len(extra)
    # patch offset tags now the layout is known. ``off_tag`` is a
    # single tag covering every chunk (273/324), or a {tag: [chunk
    # index, ...]} map when several tags point into the data area
    # (the old-style-JPEG writer patches 273 + 519/520/521 at once)
    offs = []
    acc_off = strips_off
    for s in strips:
        offs.append(acc_off)
        acc_off += len(s)
    off_map = off_tag if isinstance(off_tag, dict) \
        else {off_tag: list(range(len(strips)))}
    table = bytearray(table)
    for otag, idxs in off_map.items():
        kind, where = packed[otag]
        payload = b"".join(struct.pack(end + "I", offs[i]) for i in idxs)
        for i, (tag, typ, count, vals) in enumerate(entries):
            if tag != otag:
                continue
            base = 12 * i + 8
            if kind == "inline":
                table[base:base + 4] = payload + bytes(4 - len(payload))
            else:
                extra[where - data_off:where - data_off + len(payload)] \
                    = payload
    order = b"II" if end == "<" else b"MM"
    out = (order + struct.pack(end + "H", 42)
           + struct.pack(end + "I", ifd_off)
           + struct.pack(end + "H", n) + bytes(table)
           + struct.pack(end + "I", 0) + bytes(extra))
    assert len(out) == strips_off
    return out + b"".join(strips)


def encode_tiff_ccitt(img, compression: int = 4, t4_2d: bool = False,
                      byte_align: bool = False,
                      rows_per_strip: int | None = None,
                      byte_order: str = "<",
                      photometric: int = 0) -> bytes:
    """Bilevel CCITT TIFF writer (fixture generator): ``img`` is a
    (rows, cols) array, nonzero = BLACK ink. ``compression`` 2 (MH) /
    3 (T.4, ``t4_2d`` selects 2D rows, ``byte_align`` sets T4Options
    bit 2) / 4 (T.6). Strips restart the coder (ref line resets), per
    the TIFF 6.0 §2 strip independence rule."""
    from dolphinbeat_spark.operators.ccitt import ccitt_encode

    if compression not in (2, 3, 4):
        raise ValueError(f"not a CCITT compression code: {compression}")
    ink = (np.asarray(img) != 0).astype(np.uint8)
    h, w = ink.shape
    # stored bit semantics follow the photometric: under WhiteIsZero
    # (0, the fax norm) bit 1 = black = the ink; under MinIsBlack the
    # sense inverts
    bits = ink if photometric == 0 else 1 - ink
    if compression == 2:
        mode, ba = "mh", False
    elif compression == 3:
        mode, ba = ("g3-2d" if t4_2d else "g3-1d"), byte_align
    else:
        mode, ba = "g4", False
    end = byte_order
    rps = rows_per_strip or h
    strips = [
        ccitt_encode(bits[r0:r0 + rps], mode=mode, byte_align=ba)
        for r0 in range(0, h, rps)
    ]
    entries = [
        (256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, 1, [1]),
        (259, 3, 1, [compression]), (262, 3, 1, [photometric]),
        (277, 3, 1, [1]), (278, 4, 1, [rps]),
        (279, 4, len(strips), [len(s) for s in strips]),
        (273, 4, len(strips), [0] * len(strips)),  # patched
    ]
    if compression == 3:
        entries.append(
            (292, 4, 1, [(1 if t4_2d else 0) | (4 if byte_align else 0)])
        )
    elif compression == 4:
        entries.append((293, 4, 1, [0]))
    entries.sort(key=lambda e: e[0])
    return _assemble_tiff(entries, strips, end, off_tag=273)


def _split_jpeg_tables(blob: bytes) -> tuple[bytes, bytes]:
    """One standalone JPEG -> (JPEGTables blob, abbreviated stream):
    DQT/DHT segments move into an SOI..EOI tables stream (TechNote 2
    layout), everything else stays."""
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            raise ValueError("marker walk desync in JPEG splitter")
        marker = blob[pos + 1]
        if marker == 0xD9:
            rest += blob[pos:]
            break
        (seglen,) = struct.unpack_from(">H", blob, pos + 2)
        seg = blob[pos:pos + 2 + seglen]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            rest += seg
        pos += 2 + seglen
        if marker == 0xDA:  # SOS: entropy data runs to EOI
            rest += blob[pos:]
            break
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def encode_tiff_jpeg(width: int, height: int, pixels: bytes,
                     gray: bool = False,
                     rows_per_strip: int | None = None,
                     tiles: tuple[int, int] | None = None,
                     split_tables: bool = False,
                     subsample: str = "444",
                     byte_order: str = "<") -> bytes:
    """JPEG-in-TIFF writer (Compression 7 fixture generator): each
    strip — or each tile with ``tiles=(tw, th)`` — is its own JPEG
    from the in-repo encoder; ``split_tables`` moves the shared
    DQT/DHT segments into the JPEGTables tag (the abbreviated-stream
    layout real writers emit)."""
    from dolphinbeat_spark.operators.jpeg import encode_jpeg

    spp = 1 if gray else 3
    if len(pixels) != width * height * spp:
        raise ValueError("pixel payload size mismatch")
    px = np.frombuffer(pixels, np.uint8).reshape(height, width, spp)
    end = byte_order
    photometric = 1 if gray else 6  # JPEG stores YCbCr for color

    def jpeg_of(block: np.ndarray) -> bytes:
        bh, bw = block.shape[:2]
        return encode_jpeg(bw, bh, block.tobytes(), gray=gray,
                           subsample=subsample)

    chunks: list[bytes] = []
    if tiles:
        tw, th = tiles
        for y0 in range(0, height, th):
            for x0 in range(0, width, tw):
                # tiles are FULL size; edge tiles pad by replication
                block = px[y0:y0 + th, x0:x0 + tw]
                pad_y = th - block.shape[0]
                pad_x = tw - block.shape[1]
                if pad_y or pad_x:
                    block = np.pad(block,
                                   ((0, pad_y), (0, pad_x), (0, 0)),
                                   mode="edge")
                chunks.append(jpeg_of(block))
    else:
        rps = rows_per_strip or height
        for r0 in range(0, height, rps):
            chunks.append(jpeg_of(px[r0:r0 + rps]))
    tables_blob = None
    if split_tables:
        splits = [_split_jpeg_tables(c) for c in chunks]
        tables_blob = splits[0][0]
        if any(t != tables_blob for t, _ in splits):
            raise ValueError("strips disagree on their JPEG tables")
        chunks = [r for _, r in splits]
    entries = [
        (256, 4, 1, [width]), (257, 4, 1, [height]),
        (258, 3, spp, [8] * spp), (259, 3, 1, [7]),
        (262, 3, 1, [photometric]), (277, 3, 1, [spp]),
    ]
    if tiles:
        tw, th = tiles
        entries += [
            (322, 4, 1, [tw]), (323, 4, 1, [th]),
            (325, 4, len(chunks), [len(c) for c in chunks]),
            (324, 4, len(chunks), [0] * len(chunks)),  # patched
        ]
        off_tag = 324
    else:
        rps = rows_per_strip or height
        entries += [
            (278, 4, 1, [rps]),
            (279, 4, len(chunks), [len(c) for c in chunks]),
            (273, 4, len(chunks), [0] * len(chunks)),  # patched
        ]
        off_tag = 273
    if tables_blob is not None:
        entries.append((347, 7, len(tables_blob), list(tables_blob)))
    entries.sort(key=lambda e: e[0])
    return _assemble_tiff(entries, chunks, end, off_tag=off_tag)


def _split_jpeg_stream(blob: bytes) -> dict:
    """Walk a baseline JPEG's markers -> {``q``: [64-byte tables],
    ``dc``/``ac``: [DHT payloads without Tc/Th], ``entropy``: the
    SOS-to-EOI scan bytes, ``ri``: restart interval} — the pieces the
    old-style tables form stores behind separate tags."""
    out: dict = {"q": [], "dc": [], "ac": [], "entropy": b"", "ri": 0}
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            raise ValueError(f"bad marker alignment at {i}")
        marker = blob[i + 1]
        (ln,) = struct.unpack_from(">H", blob, i + 2)
        body = blob[i + 4:i + 2 + ln]
        if marker == 0xDB:  # DQT: one or more (PqTq + 64) runs
            p = 0
            while p < len(body):
                if body[p] >> 4 != 0:
                    raise ValueError("16-bit DQT in an 8-bit fixture")
                out["q"].append(body[p + 1:p + 65])
                p += 65
        elif marker == 0xC4:  # DHT: one or more (TcTh + 16 + n) runs
            p = 0
            while p < len(body):
                n = sum(body[p + 1:p + 17])
                (out["dc"] if body[p] >> 4 == 0 else out["ac"]) \
                    .append(body[p + 1:p + 17 + n])
                p += 17 + n
        elif marker == 0xDD:
            (out["ri"],) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            out["entropy"] = blob[i + 2 + ln:-2]  # to EOI
            return out
        i += 2 + ln
    raise ValueError("JPEG stream without SOS")


def encode_tiff_ojpeg(width: int, height: int, pixels: bytes,
                      gray: bool = False, layout: str = "interchange",
                      rows_per_strip: int | None = None,
                      byte_order: str = "<") -> bytes:
    """Old-style JPEG TIFF writer (fixture mirror of
    _decode_tiff_ojpeg): ``layout="interchange"`` embeds one complete
    SOI..EOI stream behind JPEGInterchangeFormat/Length (513/514);
    ``layout="tables"`` splits per-strip baseline JPEGs into the §22
    raw-table tags (512 proc, 519/520/521 pointers, bare entropy
    strips, 530=[1,1] for color). ``pixels``: gray 1 byte/px or RGB 3
    bytes/px, same contract as operators/jpeg.encode_jpeg."""
    from dolphinbeat_spark.operators.jpeg import encode_jpeg

    end = byte_order
    spp = 1 if gray else 3
    photometric = 1 if gray else 6
    base = [
        (256, 4, 1, [width]), (257, 4, 1, [height]),
        (258, 3, spp, [8] * spp), (259, 3, 1, [6]),
        (262, 3, 1, [photometric]), (277, 3, 1, [spp]),
    ]
    if layout == "interchange":
        blob = encode_jpeg(width, height, pixels, gray=gray)
        entries = base + [
            (513, 4, 1, [0]),  # patched
            (514, 4, 1, [len(blob)]),
        ]
        entries.sort(key=lambda e: e[0])
        return _assemble_tiff(entries, [blob], end, off_tag={513: [0]})
    if layout != "tables":
        raise ValueError(f"layout must be interchange or tables, got {layout!r}")

    rps = rows_per_strip or height
    unit = spp
    strips_px = [
        pixels[r0 * width * unit:(r0 + min(rps, height - r0)) * width * unit]
        for r0 in range(0, height, rps)
    ]
    split0 = None
    entropy: list[bytes] = []
    for r0, spx in zip(range(0, height, rps), strips_px):
        nrows = min(rps, height - r0)
        s = _split_jpeg_stream(encode_jpeg(width, nrows, spx, gray=gray))
        if split0 is None:
            split0 = s
        entropy.append(s["entropy"])
    # chunks: entropy strips first, then q tables, then dc, then ac —
    # the offset map routes each tag at its chunk indices. Annex K
    # writers reuse the luma table for chroma; §22 wants ONE pointer
    # per component, so duplicate the last table out to spp.
    def upto(lst: list[bytes]) -> list[bytes]:
        return [bytes(lst[min(i, len(lst) - 1)]) for i in range(spp)]

    q, dc, ac = upto(split0["q"]), upto(split0["dc"]), upto(split0["ac"])
    chunks = entropy + q + dc + ac
    nq0 = len(entropy)
    entries = base + [
        (278, 4, 1, [rps]),
        (279, 4, len(entropy), [len(c) for c in entropy]),
        (273, 4, len(entropy), [0] * len(entropy)),  # patched
        (512, 3, 1, [1]),
        (519, 4, spp, [0] * spp),  # patched
        (520, 4, spp, [0] * spp),  # patched
        (521, 4, spp, [0] * spp),  # patched
    ]
    if not gray:
        entries.append((530, 3, 2, [1, 1]))
    entries.sort(key=lambda e: e[0])
    return _assemble_tiff(
        entries, chunks, end,
        off_tag={
            273: list(range(len(entropy))),
            519: list(range(nq0, nq0 + spp)),
            520: list(range(nq0 + spp, nq0 + 2 * spp)),
            521: list(range(nq0 + 2 * spp, nq0 + 3 * spp)),
        })
