"""From-scratch brotli (RFC 7932) decoder tests — golden fixtures
from the reference encoder (tools/make_brotli_fixtures.py), pinned
static tables, hand-assembled bit-grammar vectors, hostile bytes."""

import glob
import hashlib
import os

import pytest

from dolphinbeat_spark.operators.brotli import (
    BrotliError,
    _DICT_OFFSETS,
    decode_brotli,
    encode_brotli_store,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "brotli")


def test_brotli_golden_fixtures():
    """Every committed (reference-encoder-produced) stream decodes
    byte-identically: quality 11 exercises the static dictionary,
    word transforms, context maps and block switching; quality 0 the
    uncompressed-meta-block path; lgwin 10 the small-window distance
    interplay; the binary cases the literal-heavy path."""
    pairs = sorted(glob.glob(os.path.join(FIX, "*.br")))
    assert len(pairs) >= 11
    for br_path in pairs:
        with open(br_path, "rb") as f:
            comp = f.read()
        with open(br_path[:-3] + ".raw", "rb") as f:
            want = f.read()
        assert decode_brotli(comp) == want, os.path.basename(br_path)


def test_brotli_static_dictionary_pin():
    """The Appendix A data blob is pinned by sha256 (the well-known
    published hash of the brotli dictionary) and by the §8 geometry:
    word counts per length derive offsets ending at 122,784."""
    path = os.path.join(os.path.dirname(__file__), "..",
                        "dolphinbeat_spark", "operators",
                        "brotli_dict.bin")
    with open(path, "rb") as f:
        data = f.read()
    assert len(data) == 122784 == _DICT_OFFSETS[25]
    assert hashlib.sha256(data).hexdigest() == (
        "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70"
    )
    # spot words: 4-letter word 0 and a mid-table 6-letter word are
    # plain ASCII English (the dictionary is mostly English/HTML)
    assert data[:4].isascii()


def test_brotli_transforms_table():
    """Appendix B pins: 121 transforms, transform 0 is the bare
    identity, the ferment kinds behave per the §8 UTF-8 pseudocode."""
    from dolphinbeat_spark.operators.brotli import _transform_word
    from dolphinbeat_spark.operators.brotli_transforms import TRANSFORMS

    assert len(TRANSFORMS) == 121
    assert TRANSFORMS[0] == (b"", "identity", 0, b"")
    # every kind is one of the five RFC shapes
    kinds = {t[1] for t in TRANSFORMS}
    assert kinds <= {"identity", "uppercase_first", "uppercase_all",
                     "omit_first", "omit_last"}
    # §8 ferment: ASCII uppercases, 2-byte UTF-8 flips bit 5 of the
    # continuation byte (é U+00E9 -> É U+00C9), 3-byte xors 5
    up_first = next(i for i, t in enumerate(TRANSFORMS)
                    if t == (b"", "uppercase_first", 0, b""))
    assert _transform_word(b"word", up_first) == b"Word"
    assert _transform_word("élan".encode(), up_first) == "Élan".encode()


def test_brotli_hand_assembled_vectors():
    """Bit-grammar pins computed from the spec by hand, independent
    of any encoder: the 1-byte empty stream (WBITS=16 bit, ISLAST,
    ISLASTEMPTY = LSB-first 011 -> 0x06), a store-mode block, and a
    metadata block whose skip length is declared-value + 1 (semantics
    pinned against the reference decoder during development)."""
    assert decode_brotli(b"\x06") == b""
    # store mode, bits LSB-first: wbits 0, islast 0, mnibbles 00,
    # mlen-1=4 over 16 bits, ISUNCOMPRESSED 1, align -> bytes
    # 0b01000000 0b00000000 0b00010000, then "hello", then the
    # 1-byte final empty block 0x03
    hand = bytes([0x40, 0x00, 0x10]) + b"hello" + bytes([0x03])
    assert decode_brotli(hand) == b"hello"
    assert encode_brotli_store(b"hello") == hand
    # metadata: wbits 0, islast 0, mnibbles 11, reserved 0,
    # mskipbytes=1 (bits 1,0), length byte 2 -> skip 2+1=3 bytes
    # -> bits 0,0,1,1,0,1,0 then 0,1,0,0,0,0,0,0 -> 0x2C 0x01
    meta = bytes([0x2C, 0x01]) + b"MMM" + bytes([0x03])
    assert decode_brotli(meta) == b""


def test_brotli_store_roundtrip_and_reference_shape():
    for n in (0, 1, 100, 65536, 70000):
        d = bytes((i * 7 + 13) & 0xFF for i in range(n))
        enc = encode_brotli_store(d)
        assert decode_brotli(enc) == d


def test_brotli_hostile_bytes_stay_typed():
    with pytest.raises(BrotliError):
        decode_brotli(b"")
    # invalid window code: bits 1,000,001 -> reserved
    with pytest.raises(BrotliError, match="window"):
        decode_brotli(bytes([0b0001_0001, 0x00]))
    # trailing garbage after the last meta-block
    with pytest.raises(BrotliError, match="trailing"):
        decode_brotli(b"\x06\x00")
    # non-zero padding bits after the last meta-block
    with pytest.raises(BrotliError, match="padding"):
        decode_brotli(bytes([0b1000_0110]))
    # metadata reserved bit set (bits 0,0,1,1,1 LSB-first)
    with pytest.raises(BrotliError, match="reserved"):
        decode_brotli(bytes([0b0001_1100]))
    # truncations of a real stream raise (never hang, never return)
    with open(os.path.join(FIX, "english_q11.br"), "rb") as f:
        good = f.read()
    for cut in (1, 7, len(good) // 3, len(good) - 1):
        with pytest.raises(BrotliError):
            decode_brotli(good[:cut])
    # uncompressed block truncated
    with pytest.raises(BrotliError, match="truncated"):
        decode_brotli(bytes([0x40, 0x00, 0x10]) + b"he")


def test_brotli_bitflip_fuzz_stays_typed():
    """Bit flips over a REAL quality-11 stream (dictionary + context
    maps + block switching all live): every corruption either raises
    BrotliError or decodes to SOMETHING under the output cap — never
    a foreign IndexError/KeyError, never a hang (the house hostile-
    bytes standard; 600-flip dev sweep ran clean, this keeps a
    fast pinned subset)."""
    import numpy as np

    with open(os.path.join(FIX, "english_q11.br"), "rb") as f:
        good = f.read()
    rng = np.random.RandomState(7)
    typed = decoded = 0
    for _ in range(120):
        b = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            b[rng.randint(0, len(b))] ^= 1 << rng.randint(0, 8)
        try:
            decode_brotli(bytes(b), max_output=2_000_000)
            decoded += 1
        except BrotliError:
            typed += 1
    assert typed + decoded == 120 and typed > 50


def test_brotli_max_output_guard():
    blob = encode_brotli_store(b"x" * 10000)
    assert len(decode_brotli(blob, max_output=10000)) == 10000
    with pytest.raises(BrotliError, match="max_output"):
        decode_brotli(blob, max_output=9999)
    # the cap bounds PEAK memory (r13, ADVICE): every compressed
    # command (insert run / copy / dictionary word / uncompressed
    # block) pre-checks its pending length against the budget, so a
    # tiny cap raises on the golden streams' very first command too
    for br_path in sorted(glob.glob(os.path.join(FIX, "*.br")))[:4]:
        with open(br_path, "rb") as f:
            comp = f.read()
        with open(br_path[:-3] + ".raw", "rb") as f:
            want_len = len(f.read())
        if want_len <= 1:
            continue
        with pytest.raises(BrotliError, match="max_output"):
            decode_brotli(comp, max_output=1)
        assert len(decode_brotli(comp, max_output=want_len)) == want_len
