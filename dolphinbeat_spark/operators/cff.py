"""Compact Font Format (CFF / Type1C) parsing — the piece of the
Adobe CFF spec (TN #5176, public) that PDF text recovery needs
(r14): wild Type0 PDFs embed their CID font as either TrueType
(/FontFile2, handled by operators/truetype.py since r13) or CFF
(/FontFile3 /Subtype /CIDFontType0C or /Type1C). For a NON-CID-keyed
CFF the glyph identifiers double as CIDs (PDF 32000-1 §9.7.4.2) and
every glyph has a NAME through the charset's SIDs — so code -> GID
-> glyph name -> Unicode (Adobe Glyph List conventions) recovers the
text with no /ToUnicode present.

Covered: header, INDEX and DICT structures (all integer operand
forms + real numbers), the Standard Strings table (391 SIDs,
Appendix A verbatim), charset formats 0/1/2 (including the ISOAdobe
predefined default), encoding formats 0/1, and the CID-keyed
detection via the ROS operator. CID-keyed charsets parse (GID ->
CID) but carry no glyph names — text recovery for those needs the
registry's CID -> Unicode resources and stays a named boundary in
pdf.py.

``glyph_name_to_unicode`` implements the AGL algorithm's productive
forms (uniXXXX / uXXXX[XX], AGL specification §3) plus the name ->
code-point entries for every Standard String glyph — which covers
the Latin subset-font case (dvipdfmx/LaTeX-class writers name
subsetted glyphs with standard names).

The fixture mirror ``encode_minimal_cff`` emits a structurally valid
CFF holding real Name/Top-DICT/String/CharStrings INDEXes, a
format-0 charset and a format-0 encoding (or ROS + FDArray/FDSelect
for the CID-keyed variant) — enough for any CFF reader.

Reference parity: the reference repo has no document layer; this
extends the PDF text surface (SURVEY §7 multimodal mandate).
"""

from __future__ import annotations

import struct

__all__ = [
    "CffError",
    "CffFont",
    "parse_cff",
    "glyph_name_to_unicode",
    "cid_latin_slice",
    "encode_minimal_cff",
    "STANDARD_STRINGS",
]


class CffError(ValueError):
    """Typed CFF format error."""


# Appendix A of the CFF spec: the 391 predefined strings, SID order.
STANDARD_STRINGS: tuple[str, ...] = (
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero",
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "colon", "semicolon", "less", "equal", "greater",
    "question", "at",
    *(chr(c) for c in range(ord("A"), ord("Z") + 1)),
    "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "quoteleft",
    *(chr(c) for c in range(ord("a"), ord("z") + 1)),
    "braceleft", "bar", "braceright", "asciitilde", "exclamdown",
    "cent", "sterling", "fraction", "yen", "florin", "section",
    "currency", "quotesingle", "quotedblleft", "guillemotleft",
    "guilsinglleft", "guilsinglright", "fi", "fl", "endash", "dagger",
    "daggerdbl", "periodcentered", "paragraph", "bullet",
    "quotesinglbase", "quotedblbase", "quotedblright",
    "guillemotright", "ellipsis", "perthousand", "questiondown",
    "grave", "acute", "circumflex", "tilde", "macron", "breve",
    "dotaccent", "dieresis", "ring", "cedilla", "hungarumlaut",
    "ogonek", "caron", "emdash", "AE", "ordfeminine", "Lslash",
    "Oslash", "OE", "ordmasculine", "ae", "dotlessi", "lslash",
    "oslash", "oe", "germandbls", "onesuperior", "logicalnot", "mu",
    "trademark", "Eth", "onehalf", "plusminus", "Thorn", "onequarter",
    "divide", "brokenbar", "degree", "thorn", "threequarters",
    "twosuperior", "registered", "minus", "eth", "multiply",
    "threesuperior", "copyright", "Aacute", "Acircumflex",
    "Adieresis", "Agrave", "Aring", "Atilde", "Ccedilla", "Eacute",
    "Ecircumflex", "Edieresis", "Egrave", "Iacute", "Icircumflex",
    "Idieresis", "Igrave", "Ntilde", "Oacute", "Ocircumflex",
    "Odieresis", "Ograve", "Otilde", "Scaron", "Uacute",
    "Ucircumflex", "Udieresis", "Ugrave", "Yacute", "Ydieresis",
    "Zcaron", "aacute", "acircumflex", "adieresis", "agrave", "aring",
    "atilde", "ccedilla", "eacute", "ecircumflex", "edieresis",
    "egrave", "iacute", "icircumflex", "idieresis", "igrave",
    "ntilde", "oacute", "ocircumflex", "odieresis", "ograve",
    "otilde", "scaron", "uacute", "ucircumflex", "udieresis",
    "ugrave", "yacute", "ydieresis", "zcaron", "exclamsmall",
    "Hungarumlautsmall", "dollaroldstyle", "dollarsuperior",
    "ampersandsmall", "Acutesmall", "parenleftsuperior",
    "parenrightsuperior", "twodotenleader", "onedotenleader",
    "zerooldstyle", "oneoldstyle", "twooldstyle", "threeoldstyle",
    "fouroldstyle", "fiveoldstyle", "sixoldstyle", "sevenoldstyle",
    "eightoldstyle", "nineoldstyle", "commasuperior",
    "threequartersemdash", "periodsuperior", "questionsmall",
    "asuperior", "bsuperior", "centsuperior", "dsuperior",
    "esuperior", "isuperior", "lsuperior", "msuperior", "nsuperior",
    "osuperior", "rsuperior", "ssuperior", "tsuperior", "ff", "ffi",
    "ffl", "parenleftinferior", "parenrightinferior",
    "Circumflexsmall", "hyphensuperior", "Gravesmall", "Asmall",
    "Bsmall", "Csmall", "Dsmall", "Esmall", "Fsmall", "Gsmall",
    "Hsmall", "Ismall", "Jsmall", "Ksmall", "Lsmall", "Msmall",
    "Nsmall", "Osmall", "Psmall", "Qsmall", "Rsmall", "Ssmall",
    "Tsmall", "Usmall", "Vsmall", "Wsmall", "Xsmall", "Ysmall",
    "Zsmall", "colonmonetary", "onefitted", "rupiah", "Tildesmall",
    "exclamdownsmall", "centoldstyle", "Lslashsmall", "Scaronsmall",
    "Zcaronsmall", "Dieresissmall", "Brevesmall", "Caronsmall",
    "Dotaccentsmall", "Macronsmall", "figuredash", "hypheninferior",
    "Ogoneksmall", "Ringsmall", "Cedillasmall", "questiondownsmall",
    "oneeighth", "threeeighths", "fiveeighths", "seveneighths",
    "onethird", "twothirds", "zerosuperior", "foursuperior",
    "fivesuperior", "sixsuperior", "sevensuperior", "eightsuperior",
    "ninesuperior", "zeroinferior", "oneinferior", "twoinferior",
    "threeinferior", "fourinferior", "fiveinferior", "sixinferior",
    "seveninferior", "eightinferior", "nineinferior", "centinferior",
    "dollarinferior", "periodinferior", "commainferior",
    "Agravesmall", "Aacutesmall", "Acircumflexsmall", "Atildesmall",
    "Adieresissmall", "Aringsmall", "AEsmall", "Ccedillasmall",
    "Egravesmall", "Eacutesmall", "Ecircumflexsmall",
    "Edieresissmall", "Igravesmall", "Iacutesmall",
    "Icircumflexsmall", "Idieresissmall", "Ethsmall", "Ntildesmall",
    "Ogravesmall", "Oacutesmall", "Ocircumflexsmall", "Otildesmall",
    "Odieresissmall", "OEsmall", "Oslashsmall", "Ugravesmall",
    "Uacutesmall", "Ucircumflexsmall", "Udieresissmall",
    "Yacutesmall", "Thornsmall", "Ydieresissmall", "001.000",
    "001.001", "001.002", "001.003", "Black", "Bold", "Book", "Light",
    "Medium", "Regular", "Roman", "Semibold",
)
assert len(STANDARD_STRINGS) == 391

# name -> code point for the glyph names whose unicode is NOT
# derivable from the name itself (AGL entries for the Standard
# Strings; letters/digits/ASCII punctuation resolve structurally)
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&",
    "quotesingle": "'", "parenleft": "(", "parenright": ")",
    "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2",
    "three": "3", "four": "4", "five": "5", "six": "6", "seven": "7",
    "eight": "8", "nine": "9", "colon": ":", "semicolon": ";",
    "less": "<", "equal": "=", "greater": ">", "question": "?",
    "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "asciicircum": "^", "underscore": "_",
    "grave": "`", "braceleft": "{", "bar": "|", "braceright": "}",
    "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "dagger": "†",
    "daggerdbl": "‡", "bullet": "•", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "fraction": "⁄",
    "minus": "−", "trademark": "™", "fi": "ﬁ",
    "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ",
    "exclamdown": "\xa1", "cent": "\xa2", "sterling": "\xa3",
    "currency": "\xa4", "yen": "\xa5", "brokenbar": "\xa6",
    "section": "\xa7", "dieresis": "\xa8", "copyright": "\xa9",
    "ordfeminine": "\xaa", "guillemotleft": "\xab",
    "logicalnot": "\xac", "registered": "\xae", "macron": "\xaf",
    "degree": "\xb0", "plusminus": "\xb1", "twosuperior": "\xb2",
    "threesuperior": "\xb3", "acute": "\xb4", "mu": "\xb5",
    "paragraph": "\xb6", "periodcentered": "\xb7", "cedilla": "\xb8",
    "onesuperior": "\xb9", "ordmasculine": "\xba",
    "guillemotright": "\xbb", "onequarter": "\xbc", "onehalf": "\xbd",
    "threequarters": "\xbe", "questiondown": "\xbf",
    "multiply": "\xd7", "divide": "\xf7", "AE": "\xc6", "ae": "\xe6",
    "Eth": "\xd0", "eth": "\xf0", "Thorn": "\xde", "thorn": "\xfe",
    "germandbls": "\xdf", "Oslash": "\xd8", "oslash": "\xf8",
    "Agrave": "\xc0", "Aacute": "\xc1", "Acircumflex": "\xc2",
    "Atilde": "\xc3", "Adieresis": "\xc4", "Aring": "\xc5",
    "Ccedilla": "\xc7", "Egrave": "\xc8", "Eacute": "\xc9",
    "Ecircumflex": "\xca", "Edieresis": "\xcb", "Igrave": "\xcc",
    "Iacute": "\xcd", "Icircumflex": "\xce", "Idieresis": "\xcf",
    "Ntilde": "\xd1", "Ograve": "\xd2", "Oacute": "\xd3",
    "Ocircumflex": "\xd4", "Otilde": "\xd5", "Odieresis": "\xd6",
    "Ugrave": "\xd9", "Uacute": "\xda", "Ucircumflex": "\xdb",
    "Udieresis": "\xdc", "Yacute": "\xdd",
    "agrave": "\xe0", "aacute": "\xe1", "acircumflex": "\xe2",
    "atilde": "\xe3", "adieresis": "\xe4", "aring": "\xe5",
    "ccedilla": "\xe7", "egrave": "\xe8", "eacute": "\xe9",
    "ecircumflex": "\xea", "edieresis": "\xeb", "igrave": "\xec",
    "iacute": "\xed", "icircumflex": "\xee", "idieresis": "\xef",
    "ntilde": "\xf1", "ograve": "\xf2", "oacute": "\xf3",
    "ocircumflex": "\xf4", "otilde": "\xf5", "odieresis": "\xf6",
    "ugrave": "\xf9", "uacute": "\xfa", "ucircumflex": "\xfb",
    "udieresis": "\xfc", "yacute": "\xfd", "ydieresis": "\xff",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž",
    "zcaron": "ž", "OE": "Œ", "oe": "œ",
    "Ydieresis": "Ÿ", "Lslash": "Ł", "lslash": "ł",
    "dotlessi": "ı", "florin": "ƒ",
    "circumflex": "ˆ", "tilde": "˜", "breve": "˘",
    "dotaccent": "˙", "ring": "˚",
    "hungarumlaut": "˝", "ogonek": "˛", "caron": "ˇ",
    "figuredash": "‒",
}


def glyph_name_to_unicode(name: str) -> str | None:
    """AGL resolution: explicit table entry, single letter/digit, or
    the productive uniXXXX / uXXXX[XX] forms (AGL spec §3). None for
    names with no derivable unicode (ornaments, CID-less .notdef,
    the smallcaps/oldstyle variant strings)."""
    if name in _AGL:
        return _AGL[name]
    if len(name) == 1 and name.isascii() and name.isalnum():
        return name
    base = name.split(".", 1)[0]  # glyph variants: name.smcp etc.
    if base != name and base:
        got = glyph_name_to_unicode(base)
        if got is not None:
            return got
    if base.startswith("uni") and len(base) >= 7:
        try:  # uniXXXX[XXXX...]: sequence of UTF-16 code units
            units = [int(base[i:i + 4], 16)
                     for i in range(3, len(base) - 3, 4)]
            if len(base) != 3 + 4 * len(units):
                return None
            return b"".join(
                u.to_bytes(2, "big") for u in units
            ).decode("utf-16-be")
        except (ValueError, UnicodeDecodeError):
            return None
    if base.startswith("u") and 5 <= len(base) <= 7:
        try:
            cp = int(base[1:], 16)
            return chr(cp) if cp <= 0x10FFFF else None
        except ValueError:
            return None
    return None


# ------------------------------------------------------------- reading

def _read_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """One INDEX at ``pos`` -> (items, next offset)."""
    if pos + 2 > len(data):
        raise CffError("INDEX header truncated")
    (count,) = struct.unpack_from(">H", data, pos)
    pos += 2
    if count == 0:
        return [], pos
    if pos >= len(data):
        raise CffError("INDEX offSize truncated")
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise CffError(f"INDEX offSize {off_size} out of range")
    need = (count + 1) * off_size
    if pos + need > len(data):
        raise CffError("INDEX offset array truncated")
    offs = []
    for i in range(count + 1):
        v = 0
        for b in data[pos + i * off_size:pos + (i + 1) * off_size]:
            v = (v << 8) | b
        offs.append(v)
    pos += need
    base = pos - 1  # offsets are 1-based from the byte before data
    if offs[0] != 1 or any(a > b for a, b in zip(offs, offs[1:])):
        raise CffError("INDEX offsets not monotonically increasing from 1")
    end = base + offs[-1]
    if end > len(data):
        raise CffError("INDEX data truncated")
    items = [data[base + offs[i]:base + offs[i + 1]] for i in range(count)]
    return items, end


def _parse_dict(data: bytes) -> dict[int, list]:
    """DICT bytes -> {op: operands}; two-byte (12 x) ops key as
    1200+x."""
    out: dict[int, list] = {}
    operands: list = []
    i = 0
    n = len(data)
    while i < n:
        b0 = data[i]
        if b0 <= 21:  # operator
            if b0 == 12:
                if i + 1 >= n:
                    raise CffError("DICT escape operator truncated")
                out[1200 + data[i + 1]] = operands
                i += 2
            else:
                out[b0] = operands
                i += 1
            operands = []
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            if i + 1 >= n:
                raise CffError("DICT operand truncated")
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            if i + 1 >= n:
                raise CffError("DICT operand truncated")
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28:
            if i + 2 >= n:
                raise CffError("DICT operand truncated")
            operands.append(struct.unpack_from(">h", data, i + 1)[0])
            i += 3
        elif b0 == 29:
            if i + 4 >= n:
                raise CffError("DICT operand truncated")
            operands.append(struct.unpack_from(">i", data, i + 1)[0])
            i += 5
        elif b0 == 30:  # real number, nibble-coded
            i += 1
            txt = []
            nibmap = "0123456789.EE?-?"
            done = False
            while i < n and not done:
                for nib in (data[i] >> 4, data[i] & 15):
                    if nib == 0xF:
                        done = True
                        break
                    if nib == 0xC:
                        txt.append("E-")
                    else:
                        txt.append(nibmap[nib])
                i += 1
            try:
                operands.append(float("".join(txt) or "0"))
            except ValueError as ex:
                raise CffError(f"bad real operand: {ex}") from ex
        else:
            raise CffError(f"reserved DICT byte {b0}")
    return out


class CffFont:
    """Parsed CFF essentials for text recovery."""

    __slots__ = ("name", "top", "strings", "n_glyphs", "charset",
                 "encoding", "is_cid", "ros")

    def __init__(self, name, top, strings, n_glyphs, charset,
                 encoding, is_cid, ros):
        self.name = name
        self.top = top
        self.strings = strings
        self.n_glyphs = n_glyphs
        self.charset = charset      # gid -> SID (or CID when is_cid)
        self.encoding = encoding    # code -> gid (non-CID only)
        self.is_cid = is_cid
        self.ros = ros

    def sid_str(self, sid: int) -> str:
        if sid < 391:
            return STANDARD_STRINGS[sid]
        i = sid - 391
        if i >= len(self.strings):
            raise CffError(f"SID {sid} beyond the String INDEX")
        return self.strings[i].decode("latin-1")

    def glyph_name(self, gid: int) -> str:
        if self.is_cid:
            raise CffError("CID-keyed CFF glyphs have no names")
        if not 0 <= gid < self.n_glyphs:
            raise CffError(f"GID {gid} out of range")
        return self.sid_str(self.charset[gid])

    def ros_strings(self) -> tuple[str, str, int] | None:
        """ROS operands -> (registry, ordering, supplement) with the
        two SIDs resolved through the String INDEX."""
        if self.ros is None:
            return None
        reg, orde, sup = self.ros
        return (self.sid_str(int(reg)), self.sid_str(int(orde)),
                int(sup))


#: Published Latin slices of the Adobe CJK character collections
#: (Adobe Tech Notes 5078/5079/5080/5093 + the Adobe-KR spec): in
#: each ordering the low CIDs are the proportional ASCII run, CID 1 =
#: space. Japan1/GB1/Korea1/KR assign CIDs 1..95 to U+0020..U+007E;
#: CNS1 agrees on the 1..94 prefix (its top of slice diverges, so the
#: conservative prefix is used). These are the only ALGORITHMIC
#: CID->Unicode ranges; the CJK blocks need the registry's full UCS2
#:  CMap resources and stay a named boundary.
_CID_LATIN_SLICES = {
    "Japan1": 95, "GB1": 95, "Korea1": 95, "KR": 95, "CNS1": 94,
}


def cid_latin_slice(ros: tuple[str, str, int] | None) \
        -> dict[int, str] | None:
    """(registry, ordering, supplement) -> {CID: unicode} for the
    ordering's published ASCII slice, or None when the ordering
    carries no algorithmic mapping (Adobe-Identity / unknown)."""
    if ros is None or ros[0] != "Adobe":
        return None
    n = _CID_LATIN_SLICES.get(ros[1])
    if n is None:
        return None
    return {1 + i: chr(0x20 + i) for i in range(n)}


MAX_GLYPHS = 1 << 16  # CFF GIDs/SIDs are 16-bit by construction


def parse_cff(data: bytes) -> CffFont:
    """CFF bytes -> CffFont (first font of the FontSet; PDF embeds
    exactly one). Any malformed byte surfaces as the typed CffError,
    never a foreign IndexError/struct.error."""
    try:
        return _parse_cff(data)
    except CffError:
        raise
    except (IndexError, KeyError, TypeError, ValueError,
            struct.error, OverflowError) as ex:
        raise CffError(f"malformed CFF: {ex}") from ex


def _parse_cff(data: bytes) -> CffFont:
    if len(data) < 4:
        raise CffError("CFF header truncated")
    major, _minor, hdr_size, _off_size = data[0], data[1], data[2], data[3]
    if major != 1:
        raise CffError(f"CFF major version {major} not supported")
    if hdr_size < 4 or hdr_size > len(data):
        raise CffError(f"bad CFF hdrSize {hdr_size}")
    names, pos = _read_index(data, hdr_size)
    tops, pos = _read_index(data, pos)
    strings, pos = _read_index(data, pos)
    if not tops:
        raise CffError("CFF without a Top DICT")
    top = _parse_dict(tops[0])
    name = names[0].decode("latin-1") if names else ""

    cs_off = top.get(17)
    if not cs_off:
        raise CffError("Top DICT missing CharStrings (op 17)")
    charstrings, _ = _read_index(data, int(cs_off[0]))
    n_glyphs = len(charstrings)
    if n_glyphs == 0:
        raise CffError("empty CharStrings INDEX")
    if n_glyphs > MAX_GLYPHS:
        raise CffError(f"{n_glyphs} glyphs exceeds the CFF cap")

    ros = top.get(1230)
    is_cid = ros is not None

    # charset (op 15): offset or predefined 0/1/2
    charset = list(range(n_glyphs))  # ISOAdobe default: SID = GID
    cso = top.get(15)
    if cso and int(cso[0]) not in (0, 1, 2):
        o = int(cso[0])
        if o >= len(data):
            raise CffError("charset offset out of range")
        fmt = data[o]
        charset = [0]
        o += 1
        if fmt == 0:
            need = 2 * (n_glyphs - 1)
            if o + need > len(data):
                raise CffError("charset format 0 truncated")
            for i in range(n_glyphs - 1):
                charset.append(struct.unpack_from(">H", data, o + 2 * i)[0])
        elif fmt in (1, 2):
            step = 3 if fmt == 1 else 4
            while len(charset) < n_glyphs:
                if o + step > len(data):
                    raise CffError(f"charset format {fmt} truncated")
                (first,) = struct.unpack_from(">H", data, o)
                n_left = data[o + 2] if fmt == 1 else \
                    struct.unpack_from(">H", data, o + 2)[0]
                for k in range(n_left + 1):
                    if len(charset) >= n_glyphs:
                        break
                    charset.append(first + k)
                o += step
        else:
            raise CffError(f"charset format {fmt} not supported")

    # encoding (op 16): offset or predefined 0 (Standard) /1 (Expert)
    encoding: dict[int, int] | None = None
    if not is_cid:
        eo = top.get(16)
        if eo and int(eo[0]) not in (0, 1):
            o = int(eo[0])
            if o >= len(data):
                raise CffError("encoding offset out of range")
            fmt = data[o]
            encoding = {}
            o += 1
            if fmt & 0x7F == 0:
                n_codes = data[o]
                o += 1
                if o + n_codes > len(data):
                    raise CffError("encoding format 0 truncated")
                for i in range(n_codes):
                    encoding[data[o + i]] = i + 1
            elif fmt & 0x7F == 1:
                n_ranges = data[o]
                o += 1
                gid = 1
                for r in range(n_ranges):
                    if o + 2 > len(data):
                        raise CffError("encoding format 1 truncated")
                    first, n_left = data[o], data[o + 1]
                    for k in range(n_left + 1):
                        encoding[first + k] = gid
                        gid += 1
                    o += 2
            else:
                raise CffError(f"encoding format {fmt} not supported")
        elif eo is None or int(eo[0]) == 0:
            # Standard Encoding: code -> standard name -> this font's
            # gid via the charset
            sid_to_gid = {sid: gid for gid, sid in enumerate(charset)}
            encoding = {}
            for code, sid in _STANDARD_ENCODING.items():
                gid = sid_to_gid.get(sid)
                if gid is not None:
                    encoding[code] = gid
    return CffFont(name, top, strings, n_glyphs, charset, encoding,
                   is_cid, tuple(ros) if ros else None)


# Standard Encoding (Appendix B): code -> SID for the codes that map.
# Codes 32..126 are the ASCII run (SIDs 1..95 in order); the upper
# range maps the Latin punctuation/accent SIDs.
_STANDARD_ENCODING: dict[int, int] = {
    **{32 + i: 1 + i for i in range(95)},
    161: 96, 162: 97, 163: 98, 164: 99, 165: 100, 166: 101, 167: 102,
    168: 103, 169: 104, 170: 105, 171: 106, 172: 107, 173: 108,
    174: 109, 175: 110, 177: 111, 178: 112, 179: 113, 180: 114,
    182: 115, 183: 116, 184: 117, 185: 118, 186: 119, 187: 120,
    188: 121, 189: 122, 191: 123, 193: 124, 194: 125, 195: 126,
    196: 127, 197: 128, 198: 129, 199: 130, 200: 131, 202: 132,
    203: 133, 205: 134, 206: 135, 207: 136, 208: 137, 225: 138,
    227: 139, 232: 140, 233: 141, 234: 142, 235: 143, 241: 144,
    245: 145, 248: 146, 249: 147, 250: 148, 251: 149,
}


# ------------------------------------------------------------- writing

def _index(items: list[bytes]) -> bytes:
    if not items:
        return struct.pack(">H", 0)
    off_size = 4
    out = [struct.pack(">HB", len(items), off_size)]
    off = 1
    offs = []
    for it in items:
        offs.append(off)
        off += len(it)
    offs.append(off)
    out.extend(struct.pack(">I", o) for o in offs)
    out.extend(items)
    return b"".join(out)


def _dict_int(v: int) -> bytes:
    return b"\x1d" + struct.pack(">i", v)  # fixed 5-byte form


def encode_minimal_cff(mapping: dict[int, str],
                       cid_keyed: bool = False,
                       standard_names: bool = False,
                       ros: tuple[str, str, int] | None = None) -> bytes:
    """Fixture mirror. ``mapping``: {code/CID: unicode char}, one
    glyph per entry (GID = 1 + rank of the key).

    non-CID: glyph names are ``uniXXXX`` custom strings (or AGL
    standard names with ``standard_names=True`` where one exists),
    charset format 0, encoding format 0 over the low-byte codes.
    CID-keyed: ROS (``ros`` or Adobe-Identity-0), charset format 0
    mapping GID -> CID, FDArray/FDSelect present so real parsers
    accept it. CharStrings are minimal Type2 ``endchar`` bodies."""
    keys = sorted(mapping)
    n_glyphs = len(keys) + 1
    charstrings = _index([b"\x0e"] * n_glyphs)

    custom: list[bytes] = []
    rev_std = {v: k for k, v in enumerate(STANDARD_STRINGS)}

    def intern(name: str) -> int:
        if name in rev_std:
            return rev_std[name]
        b = name.encode("latin-1")
        if b not in custom:
            custom.append(b)
        return 391 + custom.index(b)

    if cid_keyed:
        if ros is None:
            ros = ("Adobe", "Identity", 0)
        reg = intern(ros[0])
        orde = intern(ros[1])
        ros_sup = int(ros[2])
        charset_sids = keys  # CID per glyph
    else:
        names = []
        agl_rev = {v: k for k, v in _AGL.items()}
        for k in keys:
            ch = mapping[k]
            if standard_names and ch in agl_rev:
                names.append(agl_rev[ch])
            elif standard_names and len(ch) == 1 and ch.isascii() \
                    and ch.isalnum():
                names.append(ch)
            else:
                names.append("uni%04X" % ord(ch))
        charset_sids = [intern(nm) for nm in names]

    charset = b"\x00" + b"".join(
        struct.pack(">H", s) for s in charset_sids)
    encoding = b"\x00" + bytes([len(keys)]) + bytes(
        k & 0xFF for k in keys)

    name_index = _index([b"DolphinbeatCFF"])
    private = b""  # empty Private DICT (size 0)

    # Top DICT with fixed-width offset operands, assembled in two
    # passes (sizes are deterministic with the 5-byte int form)
    def top_dict(cs_off, enc_off, chs_off, fda_off, fds_off,
                 priv_off) -> bytes:
        d = b""
        if cid_keyed:
            d += _dict_int(reg) + _dict_int(orde) + _dict_int(ros_sup) \
                + b"\x0c\x1e"  # ROS
        d += _dict_int(chs_off) + b"\x0f"          # charset
        if not cid_keyed:
            d += _dict_int(enc_off) + b"\x10"      # Encoding
        d += _dict_int(cs_off) + b"\x11"           # CharStrings
        if cid_keyed:
            d += _dict_int(fda_off) + b"\x0c\x24"  # FDArray
            d += _dict_int(fds_off) + b"\x0c\x25"  # FDSelect
        else:
            d += _dict_int(len(private)) + _dict_int(priv_off) \
                + b"\x12"                          # Private
        return d

    fd_dict = _dict_int(0) + _dict_int(0) + b"\x12"  # Private(0, 0)
    fd_array = _index([fd_dict])
    fd_select = b"\x03" + struct.pack(">H", 1) + struct.pack(">H", 0) \
        + b"\x00" + struct.pack(">H", n_glyphs)  # format 3, 1 range

    header = b"\x01\x00\x04\x04"
    probe = top_dict(0, 0, 0, 0, 0, 0)
    top_index_size = len(_index([probe]))
    string_index = _index(custom)
    gsubr_index = _index([])
    fixed = len(header) + len(name_index) + top_index_size \
        + len(string_index) + len(gsubr_index)
    chs_off = fixed
    enc_off = chs_off + len(charset)
    cs_off = enc_off + (0 if cid_keyed else len(encoding))
    fda_off = cs_off + len(charstrings)
    fds_off = fda_off + len(fd_array)
    priv_off = cs_off + len(charstrings)
    top = top_dict(cs_off, enc_off, chs_off, fda_off, fds_off, priv_off)
    assert len(_index([top])) == top_index_size
    body = charset
    if not cid_keyed:
        body += encoding
    body += charstrings
    if cid_keyed:
        body += fd_array + fd_select
    else:
        body += private
    return header + name_index + _index([top]) + string_index \
        + gsubr_index + body
