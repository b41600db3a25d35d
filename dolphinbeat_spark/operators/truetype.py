"""Minimal TrueType ``cmap`` parsing — the piece of the sfnt format
PDF text recovery needs (r13): CJK PDFs from non-Adobe toolchains
routinely embed a Type0/CIDFontType2 font WITHOUT /ToUnicode; the
text is still recoverable by inverting the embedded font's own
character-to-glyph table (code point -> glyph id) through
/CIDToGIDMap. This module reads exactly that table.

Covered: the sfnt table directory (TrueType 0x00010000 and the
``true`` Apple tag), the ``cmap`` encoding-record walk with the
standard preference order (UCS-4 formats first: platform 3 encoding
10 and platform 0 encoding 4/6 format 12; then BMP: platform 3
encoding 1 / platform 0 format 4; last the format 6 trimmed table),
and subtable formats 4, 6 and 12. OpenType/CFF outlines inside an
sfnt wrapper work unchanged (the cmap table is outline-agnostic);
bare CFF (PDF /FontFile3 /Type1C) has no cmap and stays a named
boundary in pdf.py.

The fixture mirror ``encode_minimal_ttf`` emits a structurally valid
sfnt holding just a cmap (format 4 or 12) — enough for any cmap
reader, checksums included.

Reference parity: the reference repo has no document layer; this
extends the PDF text surface (SURVEY §7 multimodal mandate).
"""

from __future__ import annotations

import struct

__all__ = ["TrueTypeError", "parse_ttf_cmap", "encode_minimal_ttf"]


class TrueTypeError(ValueError):
    """Typed sfnt/TrueType format error."""


def _u16(d: bytes, o: int) -> int:
    return struct.unpack_from(">H", d, o)[0]


def _u32(d: bytes, o: int) -> int:
    return struct.unpack_from(">I", d, o)[0]


# Hard ceiling on the total mapping size a hostile font can force.
# Fonts arrive from untrusted PDFs (pdf.py _type0_cmap_from_font), so
# the expansion cap mirrors jbig2.max_pixels / inflate's caps: a real
# pan-Unicode font (Noto-class) maps ~6e4 glyphs; 2^20 entries is
# ~16x any legitimate font while a crafted format-12 table could
# otherwise demand ~10^12 dict insertions from a ~1 MB payload.
MAX_CMAP_MAPPINGS = 1 << 20


def parse_ttf_cmap(data: bytes) -> dict[int, int]:
    """sfnt bytes -> {unicode code point: glyph id} from the best
    Unicode cmap subtable (preference order in the module
    docstring). Raises typed when no Unicode subtable exists or the
    mapping would exceed ``MAX_CMAP_MAPPINGS`` entries (hostile-font
    expansion cap)."""
    if len(data) < 12:
        raise TrueTypeError("sfnt header truncated")
    tag = data[:4]
    if tag not in (b"\x00\x01\x00\x00", b"true", b"OTTO", b"ttcf"):
        raise TrueTypeError(f"not an sfnt font (tag {tag!r})")
    base = 0
    if tag == b"ttcf":  # collection: first font's offset table
        if len(data) < 16:
            raise TrueTypeError("ttc header truncated")
        base = _u32(data, 12)
        if base + 12 > len(data):
            raise TrueTypeError("ttc first-font offset out of range")
    num_tables = _u16(data, base + 4)
    cmap_off = None
    for i in range(num_tables):
        rec = base + 12 + 16 * i
        if rec + 16 > len(data):
            raise TrueTypeError("sfnt table directory truncated")
        if data[rec:rec + 4] == b"cmap":
            cmap_off = _u32(data, rec + 8)
            break
    if cmap_off is None or cmap_off + 4 > len(data):
        raise TrueTypeError("sfnt has no cmap table")
    n_enc = _u16(data, cmap_off + 2)
    # (platform, encoding) preference: UCS-4 first, then BMP
    prefs = {(3, 10): 0, (0, 6): 1, (0, 4): 2, (3, 1): 3, (0, 3): 4,
             (0, 2): 5, (0, 1): 6, (0, 0): 7}
    best = None
    for i in range(n_enc):
        rec = cmap_off + 4 + 8 * i
        if rec + 8 > len(data):
            raise TrueTypeError("cmap encoding records truncated")
        plat, enc = _u16(data, rec), _u16(data, rec + 2)
        off = _u32(data, rec + 4)
        rank = prefs.get((plat, enc))
        if rank is not None and (best is None or rank < best[0]):
            best = (rank, cmap_off + off)
    if best is None:
        raise TrueTypeError(
            "cmap has no Unicode subtable (platform 0 or 3/1, 3/10)")
    sub = best[1]
    if sub + 2 > len(data):
        raise TrueTypeError("cmap subtable offset out of range")
    fmt = _u16(data, sub)
    out: dict[int, int] = {}
    work = 0  # total code points scanned — overlapping segments
    # dedup in `out`, so the cap must count iterations, not entries
    if fmt == 4:
        seg_x2 = _u16(data, sub + 6)
        segs = seg_x2 // 2
        ends = sub + 14
        starts = ends + seg_x2 + 2  # +2: reservedPad
        deltas = starts + seg_x2
        ranges = deltas + seg_x2
        if ranges + seg_x2 > len(data):
            raise TrueTypeError("cmap format 4 arrays truncated")
        for i in range(segs):
            end = _u16(data, ends + 2 * i)
            start = _u16(data, starts + 2 * i)
            delta = _u16(data, deltas + 2 * i)
            roff = _u16(data, ranges + 2 * i)
            if start > end:
                raise TrueTypeError(
                    f"cmap format 4 segment {i}: start > end")
            work += end - start + 1
            if work > MAX_CMAP_MAPPINGS:
                raise TrueTypeError(
                    f"cmap format 4 mapping exceeds "
                    f"{MAX_CMAP_MAPPINGS} entries (hostile-font cap)")
            for c in range(start, end + 1):
                if c == 0xFFFF:
                    continue
                if roff == 0:
                    gid = (c + delta) & 0xFFFF
                else:
                    addr = ranges + 2 * i + roff + 2 * (c - start)
                    if addr + 2 > len(data):
                        raise TrueTypeError(
                            "cmap format 4 glyphIdArray overrun")
                    gid = _u16(data, addr)
                    if gid:
                        gid = (gid + delta) & 0xFFFF
                if gid:
                    out[c] = gid
    elif fmt == 6:
        first = _u16(data, sub + 6)
        count = _u16(data, sub + 8)
        if sub + 10 + 2 * count > len(data):
            raise TrueTypeError("cmap format 6 glyph array truncated")
        for k in range(count):
            gid = _u16(data, sub + 10 + 2 * k)
            if gid:
                out[first + k] = gid
    elif fmt == 12:
        n_groups = _u32(data, sub + 12)
        if sub + 16 + 12 * n_groups > len(data):
            raise TrueTypeError("cmap format 12 groups truncated")
        if n_groups > 1 << 20:
            raise TrueTypeError(f"cmap format 12: {n_groups} groups")
        for g in range(n_groups):
            o = sub + 16 + 12 * g
            c0, c1, g0 = struct.unpack_from(">III", data, o)
            if c1 < c0 or c1 - c0 > 0x10FFFF:
                raise TrueTypeError(
                    f"cmap format 12 group {g}: bad range")
            work += c1 - c0 + 1
            if work > MAX_CMAP_MAPPINGS:
                raise TrueTypeError(
                    f"cmap format 12 mapping exceeds "
                    f"{MAX_CMAP_MAPPINGS} entries (hostile-font cap)")
            for k in range(c1 - c0 + 1):
                out[c0 + k] = g0 + k
    else:
        raise TrueTypeError(f"cmap subtable format {fmt} not supported "
                            "(4/6/12)")
    return out


def _sfnt(tables: list[tuple[bytes, bytes]]) -> bytes:
    """Assemble an sfnt from (tag, data) with correct checksums and
    the binary-search header fields."""
    n = len(tables)
    search_range = 1
    entry_selector = 0
    while search_range * 2 <= n:
        search_range *= 2
        entry_selector += 1
    search_range *= 16
    header = struct.pack(">IHHHH", 0x00010000, n, search_range,
                         entry_selector, n * 16 - search_range)
    offset = 12 + 16 * n
    dir_rows = []
    blobs = []
    for tag, blob in sorted(tables):
        pad = blob + b"\x00" * (-len(blob) % 4)
        csum = sum(struct.unpack(f">{len(pad) // 4}I", pad)) \
            & 0xFFFFFFFF
        dir_rows.append(struct.pack(">4sIII", tag, csum, offset,
                                    len(blob)))
        blobs.append(pad)
        offset += len(pad)
    return header + b"".join(dir_rows) + b"".join(blobs)


def encode_minimal_ttf(mapping: dict[int, int],
                       fmt: int = 4) -> bytes:
    """{code point: glyph id} -> minimal sfnt with one Unicode cmap
    subtable (format 4 under platform 3/1, or format 12 under
    platform 3/10) — the fixture mirror for parse_ttf_cmap and
    pdf.py's embedded-font text recovery."""
    if fmt == 4:
        if any(c > 0xFFFE for c in mapping):
            raise ValueError("format 4 holds BMP code points only")
        # one segment per code point via the glyphIdArray form (no
        # delta arithmetic to get subtly wrong), plus the required
        # terminal 0xFFFF segment in the delta form. The byte
        # distance from &idRangeOffset[i] to glyphIdArray[i] is
        # 2*(n-i) remaining offsets + 2*i preceding glyph entries
        # = 2n, constant.
        cps = sorted(mapping)
        n = len(cps) + 1
        seg_x2 = 2 * n
        ends = b"".join(struct.pack(">H", c) for c in cps) \
            + struct.pack(">H", 0xFFFF)
        starts = ends
        deltas = struct.pack(">H", 0) * (n - 1) + struct.pack(">H", 1)
        ranges = struct.pack(">H", 2 * n) * (n - 1) \
            + struct.pack(">H", 0)
        glyphs = b"".join(struct.pack(">H", mapping[c]) for c in cps)
        length = 16 + 4 * seg_x2 + len(glyphs)
        sub = struct.pack(">HHHHHHH", 4, length, 0, seg_x2, 0, 0, 0) \
            + ends + b"\x00\x00" + starts + deltas + ranges + glyphs
        cmap = struct.pack(">HHHHI", 0, 1, 3, 1, 12) + sub
    elif fmt == 12:
        groups = []
        for c in sorted(mapping):
            if groups and groups[-1][1] == c - 1 \
                    and groups[-1][2] + (c - groups[-1][0]) \
                    == mapping[c]:
                groups[-1] = (groups[-1][0], c, groups[-1][2])
            else:
                groups.append((c, c, mapping[c]))
        sub = struct.pack(">HHIII", 12, 0, 16 + 12 * len(groups), 0,
                          len(groups)) \
            + b"".join(struct.pack(">III", a, b, g)
                       for a, b, g in groups)
        cmap = struct.pack(">HHHHI", 0, 1, 3, 10, 12) + sub
    else:
        raise ValueError(f"fmt {fmt}: expected 4 or 12")
    return _sfnt([(b"cmap", cmap)])
