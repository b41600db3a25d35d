#!/usr/bin/env python3
"""Recover the RFC 7932 static-dictionary data and transform list
from the SYSTEM brotli library (public reference implementation of
the public spec), for the from-scratch decoder in
dolphinbeat_spark/operators/brotli.py.

Imports NOTHING from the package (the golden-fixture rule): the
outputs are pinned INPUTS to the decoder, not products of it.

Outputs:
- dolphinbeat_spark/operators/brotli_dict.bin — the 122,784-byte
  static dictionary DATA of RFC 7932 Appendix A, obtained via
  ``BrotliGetDictionary()`` from libbrotlicommon (the library ships
  the Appendix A bytes verbatim; the word-count-per-length geometry
  is cross-checked against the RFC §8 NDBITS values hardcoded here,
  and the blob's sha256 is pinned in tests/test_brotli.py).
- dolphinbeat_spark/operators/brotli_transforms.py — the 121 word
  transforms of RFC 7932 Appendix B as (prefix, kind, param, suffix)
  literals. These are DERIVED BEHAVIORALLY: each transform is applied
  to probe words through the library's public
  ``BrotliTransformDictionaryWord`` entry point and the
  (prefix, elementwise-kind, suffix) decomposition is inferred from
  the outputs — no library internals or source files are read.

Run: python tools/make_brotli_tables.py
"""

from __future__ import annotations

import ctypes
import ctypes.util
import hashlib
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OPS = os.path.join(HERE, "..", "dolphinbeat_spark", "operators")

# RFC 7932 §8: number of dictionary words per length is 1 << NDBITS;
# lengths 4..24 (0 for lengths < 4).
NDBITS = [0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8,
          7, 7, 8, 7, 7, 6, 6, 5, 5]


def _load_lib() -> ctypes.CDLL:
    for cand in ("libbrotlicommon.so.1", "libbrotlicommon.so",
                 ctypes.util.find_library("brotlicommon")):
        if not cand:
            continue
        try:
            return ctypes.CDLL(cand)
        except OSError:
            continue
    raise SystemExit("libbrotlicommon not found")


def extract_dictionary(lib: ctypes.CDLL) -> bytes:
    """BrotliDictionary struct (public header brotli/dictionary.h):
    uint8 size_bits_by_length[32]; uint32 offsets_by_length[32];
    size_t data_size; const uint8* data."""

    class BrotliDictionary(ctypes.Structure):
        _fields_ = [
            ("size_bits_by_length", ctypes.c_uint8 * 32),
            ("offsets_by_length", ctypes.c_uint32 * 32),
            ("data_size", ctypes.c_size_t),
            ("data", ctypes.POINTER(ctypes.c_uint8)),
        ]

    lib.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
    d = lib.BrotliGetDictionary().contents
    bits = list(d.size_bits_by_length)
    # geometry must match the RFC §8 values we hardcode in the decoder
    assert bits[:25] == NDBITS and all(b == 0 for b in bits[25:]), bits
    offs = [0]
    for length in range(25):
        count = (1 << NDBITS[length]) if NDBITS[length] else 0
        offs.append(offs[-1] + length * count)
    assert list(d.offsets_by_length)[:25] == offs[:25], "offset mismatch"
    assert d.data_size == offs[25] == 122784, d.data_size
    return ctypes.string_at(d.data, d.data_size)


def derive_transforms(lib: ctypes.CDLL) -> list[tuple[bytes, str, int,
                                                      bytes]]:
    """Each RFC 7932 Appendix B transform is prefix + elem(word) +
    suffix where elem is one of: identity, omit_first_1..9,
    omit_last_1..9, uppercase_first, uppercase_all. Apply each
    transform to probe words via the library and invert."""

    class BrotliTransforms(ctypes.Structure):
        _fields_ = [
            ("prefix_suffix_size", ctypes.c_uint16),
            ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
            ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
            ("num_transforms", ctypes.c_uint32),
            ("transforms", ctypes.POINTER(ctypes.c_uint8)),
            ("params", ctypes.POINTER(ctypes.c_uint8)),
            ("cutOffTransforms", ctypes.c_int16 * 10),
        ]

    lib.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
    tr = lib.BrotliGetTransforms()
    n = tr.contents.num_transforms
    assert n == 121, f"expected the 121 RFC transforms, got {n}"

    fn = lib.BrotliTransformDictionaryWord
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                   ctypes.POINTER(BrotliTransforms), ctypes.c_int]

    def apply(word: bytes, idx: int) -> bytes:
        dst = ctypes.create_string_buffer(len(word) + 64)
        ln = fn(dst, word, len(word), tr, idx)
        return dst.raw[:ln]

    # distinct lowercase probe: every elem kind maps it to a unique,
    # locatable core (uppercase probes disambiguate the ferments)
    probe = b"abcdefghijklmnopqrst"  # 20 distinct lowercase bytes
    out: list[tuple[bytes, str, int, bytes]] = []
    for idx in range(n):
        got = apply(probe, idx)
        cand: list[tuple[bytes, str, int, bytes]] = []
        kinds: list[tuple[str, int, bytes]] = [("identity", 0, probe),
                                               ("uppercase_first", 0,
                                                b"A" + probe[1:]),
                                               ("uppercase_all", 0,
                                                probe.upper())]
        kinds += [("omit_first", k, probe[k:]) for k in range(1, 10)]
        kinds += [("omit_last", k, probe[:-k]) for k in range(1, 10)]
        for kind, param, core in kinds:
            at = got.find(core)
            if at >= 0:
                cand.append((got[:at], kind, param,
                             got[at + len(core):]))
        # prefer the longest core (identity over omit_*); ferments
        # can't collide with the distinct-letter probe
        assert cand, (idx, got)
        best = min(cand, key=lambda c: (len(c[0]) + len(c[3])))
        # verify on a second probe word
        w2 = b"zyxwvutsrqponmlkjihg"
        core2 = {"identity": w2, "uppercase_first": b"Z" + w2[1:],
                 "uppercase_all": w2.upper()}.get(best[1])
        if core2 is None:
            core2 = w2[best[2]:] if best[1] == "omit_first" \
                else w2[:-best[2]]
        assert apply(w2, idx) == best[0] + core2 + best[3], idx
        out.append(best)
    # RFC sanity: transform 0 is the bare identity
    assert out[0] == (b"", "identity", 0, b"")
    return out


def extract_utf8_luts() -> tuple[list[int], list[int]]:
    """RFC 7932 §7.1 context lookup tables for the UTF8 literal
    context mode, recovered from the reference library's combined
    context table. The table is LOCATED STRUCTURALLY: the four modes
    are stored as 512-byte (lut0, lut1) pairs in mode order, and the
    LSB6/MSB6/SIGNED sections are closed-form (lut values b&63, b>>2
    and the §7.1 signed quantization) — we scan for the exact
    LSB6+MSB6 image and then VERIFY the trailing SIGNED section
    against the closed form before trusting the UTF8 section between
    them."""
    lsb6 = bytes(i & 63 for i in range(256)) + bytes(256)
    msb6 = bytes(i >> 2 for i in range(256)) + bytes(256)

    def lut2(b: int) -> int:
        return (0 if b == 0 else 1 if b < 16 else 2 if b < 64
                else 3 if b < 128 else 4 if b < 192 else 5 if b < 240
                else 6 if b < 255 else 7)

    for path in ("/usr/lib/x86_64-linux-gnu/libbrotlicommon.so.1",
                 "libbrotlicommon.so.1", "libbrotlicommon.so"):
        try:
            full = os.path.realpath(path) if os.path.isabs(path) else None
            blob = open(full or _sofile(path), "rb").read()
        except OSError:
            continue
        at = blob.find(lsb6 + msb6)
        if at < 0:
            continue
        utf8 = blob[at + 1024:at + 1536]
        signed = blob[at + 1536:at + 2048]
        if not (all(signed[b] == lut2(b) << 3 for b in range(256))
                and all(signed[256 + b] == lut2(b) for b in range(256))):
            continue
        return list(utf8[:256]), list(utf8[256:])
    raise SystemExit("context table not found in libbrotlicommon")


def _sofile(name: str) -> str:
    import ctypes.util
    import subprocess
    out = subprocess.run(["ldconfig", "-p"], capture_output=True,
                         text=True).stdout
    for line in out.splitlines():
        if name in line and "=>" in line:
            return line.split("=>", 1)[1].strip()
    raise OSError(f"{name} not found")


def main() -> None:
    lib = _load_lib()
    data = extract_dictionary(lib)
    path = os.path.join(OPS, "brotli_dict.bin")
    with open(path, "wb") as f:
        f.write(data)
    sha = hashlib.sha256(data).hexdigest()
    print(f"wrote {path}: {len(data)} bytes sha256={sha}")

    transforms = derive_transforms(lib)
    lut0, lut1 = extract_utf8_luts()
    tpath = os.path.join(OPS, "brotli_transforms.py")
    with open(tpath, "w") as f:
        f.write('"""RFC 7932 static tables. GENERATED by '
                'tools/make_brotli_tables.py —\ndo not edit by hand.\n'
                '\n- TRANSFORMS: the 121 static-dictionary word '
                'transforms of Appendix B\n  as (prefix, kind, param, '
                'suffix) literals, derived behaviorally from\n  the '
                "public reference library's BrotliTransformDictionary"
                'Word (see\n  the tool docstring). kind is identity / '
                'uppercase_first /\n  uppercase_all / omit_first / '
                'omit_last with param as the omit count.\n- UTF8_LUT0'
                '/UTF8_LUT1: the §7.1 literal-context lookup tables '
                'for the\n  UTF8 context mode (p1 and p2 components), '
                'recovered from the\n  structurally-located context '
                'table whose sibling sections were\n  verified '
                'against their closed forms.\n"""\n\nTRANSFORMS = [\n')
        for p, kind, param, s in transforms:
            f.write(f"    ({p!r}, {kind!r}, {param}, {s!r}),\n")
        f.write("]\n\nUTF8_LUT0 = bytes([\n")
        for i in range(0, 256, 16):
            f.write("    " + ", ".join(str(b) for b in lut0[i:i + 16])
                    + ",\n")
        f.write("])\n\nUTF8_LUT1 = bytes([\n")
        for i in range(0, 256, 16):
            f.write("    " + ", ".join(str(b) for b in lut1[i:i + 16])
                    + ",\n")
        f.write("])\n")
    print(f"wrote {tpath}: {len(transforms)} transforms + UTF8 luts")


if __name__ == "__main__":
    sys.exit(main())
