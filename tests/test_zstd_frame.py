"""From-scratch zstd (RFC 8878) decoder tests.

Three layers of evidence:
- published XXH64 test vectors (the checksum hash)
- committed golden fixtures produced by the REAL reference
  implementation (the system ``zstd`` CLI, present in this container)
  over deterministic corpora regenerated in-test — every literal/
  sequence/table mode a real compressor emits must decode byte-exactly
- malformed/hostile payloads raise the typed ZstdError, never a wrong
  answer or an unbounded allocation

If the CLI is present, a property layer round-trips random corpora at
several compression levels on the fly; without it the committed
fixtures still cover the same paths.
"""

from __future__ import annotations

import shutil
import struct
import subprocess
from pathlib import Path

import pytest

from dolphinbeat_spark.operators.zstd_frame import (
    ZstdError,
    decode_zstd,
    encode_zstd_store,
    xxh64,
)

FIXDIR = Path(__file__).parent / "fixtures" / "zstd"
_ZSTD_CLI = shutil.which("zstd")


from tools.make_zstd_fixtures import corpora as _corpora  # noqa: E402
# (the committed .zst fixtures are the CLI's output over exactly
# these regenerated corpora — fixtures carry only compressed bytes)


def test_xxh64_published_vectors():
    # vectors published with the xxHash spec
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # >32-byte input exercises the 4-lane path; self-consistency with
    # the one-shot CLI frames is pinned by every golden fixture's
    # verified content checksum below


def test_store_frame_roundtrip():
    for data in (b"", b"x", b"hello world" * 1000, bytes(range(256)) * 300):
        for chk in (True, False):
            frame = encode_zstd_store(data, with_checksum=chk)
            assert decode_zstd(frame) == data


@pytest.mark.parametrize("name", sorted(_corpora()))
@pytest.mark.parametrize("level", [1, 3, 19])
def test_golden_cli_fixtures(name, level):
    """Decode frames written by the reference implementation. The
    fixtures are committed; the corpora are regenerated here, so the
    comparison is fully self-contained."""
    fix = FIXDIR / f"{name}.l{level}.zst"
    if not fix.exists():
        pytest.skip(f"fixture {fix.name} not committed yet")
    want = _corpora()[name]
    got = decode_zstd(fix.read_bytes(), max_output=len(want) + 1)
    assert got == want


def test_golden_long_mode_and_multiframe():
    fix = FIXDIR / "mixed.long27.zst"
    if fix.exists():
        want = _corpora()["mixed"]
        assert decode_zstd(fix.read_bytes()) == want
    multi = FIXDIR / "multiframe.zst"
    if multi.exists():
        c = _corpora()
        assert decode_zstd(multi.read_bytes()) == c["text"] + c["json_rows"]
    skippable = FIXDIR / "with_skippable.zst"
    if skippable.exists():
        assert decode_zstd(skippable.read_bytes()) == _corpora()["text"]


@pytest.mark.skipif(_ZSTD_CLI is None, reason="zstd CLI not on PATH")
@pytest.mark.parametrize("level", [1, 5, 9, 19])
def test_property_roundtrip_against_cli(level):
    import numpy as np

    rng = np.random.RandomState(level)
    for data in (
        rng.bytes(rng.randint(0, 5000)),
        (b"abcabcabd" * 500)[: rng.randint(1, 4000)],
        bytes(rng.randint(0, 4, 30_000).astype("u1")),  # tiny alphabet
    ):
        comp = subprocess.run(
            [_ZSTD_CLI, f"-{level}", "-c"],
            input=data, capture_output=True, check=True,
        ).stdout
        assert decode_zstd(comp, max_output=len(data) + 1) == data


def test_handcrafted_rle_literals_block():
    """RLE literals + zero sequences — a path real encoders rarely
    emit, built by hand per the spec: literals header type=1, 5-bit
    regenerated size, one repeated byte."""
    body = bytes([(5 << 3) | 1, ord("z"), 0x00])  # lit hdr, byte, nbseq=0
    frame = (
        struct.pack("<IB", 0xFD2FB528, (0 << 6) | (1 << 5)) + bytes([5])
        + struct.pack("<I", 1 | (2 << 1) | (len(body) << 3))[:3] + body
    )
    assert decode_zstd(frame) == b"zzzzz"


def test_handcrafted_rle_sequence_tables():
    """All three sequence codes in RLE mode (constant symbol, no FSE
    state bits): raw literals 'ab', one sequence ll=1/ml=3/offset=1 →
    'a' + overlapping self-copy 'aaa' + tail 'b'."""
    body = bytes(
        [
            (2 << 3) | 0, ord("a"), ord("b"),  # raw literals, regen 2
            1,      # one sequence
            0x54,   # LL=RLE, OF=RLE, ML=RLE (reserved bits 0)
            1,      # LL symbol 1 → litlen 1, no extra bits
            2,      # OF symbol 2 → offset_value = 4 + read(2)
            0,      # ML symbol 0 → matchlen 3, no extra bits
            0b100,  # bitstream: sentinel above two 0 extra bits
        ]
    )
    frame = (
        struct.pack("<IB", 0xFD2FB528, (0 << 6) | (1 << 5)) + bytes([5])
        + struct.pack("<I", 1 | (2 << 1) | (len(body) << 3))[:3] + body
    )
    assert decode_zstd(frame) == b"aaaab"


def test_direct_huffman_weights():
    """Direct (4-bit) Huffman weight representation — headerByte >=
    128 — decoded via the table builder + a round-trip through the
    canonical code assignment."""
    from dolphinbeat_spark.operators.zstd_frame import _read_huffman

    # weights for symbols 0..3 = [2,2,1,1]; implicit last (symbol 4)
    # completes 6 → 8, weight 2; max_bits = 3
    desc = bytes([127 + 4, 0x22, 0x11])
    table, used = _read_huffman(desc)
    assert used == 3 and table.max_bits == 3
    # decode a stream we assemble from the canonical codes the table
    # implies: read top-3-bits cell → symbol, consume (4 - weight)
    import itertools

    for symbols in itertools.product(range(5), repeat=4):
        nb = {0: 2, 1: 2, 2: 3, 3: 3, 4: 2}
        # build backward bitstream: peek-cells must land on each symbol
        # in order; derive each symbol's canonical code from the table
        code_of = {}
        v = 0
        while v < 8:
            s = table.symbol[v]
            w = table.nb_bits[v]
            code_of[s] = (v >> (3 - w), w)
            v += 1 << (3 - w)
        val, bits = 1, 0  # sentinel
        for s in symbols:
            c, w = code_of[s]
            val = (val << w) | c
            bits += w
        stream = val.to_bytes((bits + 8) // 8, "little")
        assert table.decode_stream(stream, 4) == bytes(symbols)


def test_skippable_frame_is_skipped():
    body = b"metadata-to-ignore"
    skip = struct.pack("<II", 0x184D2A50, len(body)) + body
    frame = encode_zstd_store(b"payload")
    assert decode_zstd(skip + frame) == b"payload"
    # a skippable frame alone is "no zstd frame"
    with pytest.raises(ZstdError, match="no zstd frame"):
        decode_zstd(skip)


def test_malformed_and_hostile_payloads():
    good = encode_zstd_store(b"hello hello hello")
    with pytest.raises(ZstdError, match="magic"):
        decode_zstd(b"\x00\x11\x22\x33rest")
    with pytest.raises(ZstdError):
        decode_zstd(good[:-3])  # truncated
    with pytest.raises(ZstdError, match="checksum"):
        bad = bytearray(good)
        bad[-1] ^= 0xFF  # flip checksum byte
        decode_zstd(bytes(bad))
    # content does not match declared FCS
    bad = bytearray(encode_zstd_store(b"abcd", with_checksum=False))
    bad[5] = 200  # FCS says 200, frame carries 4
    with pytest.raises(ZstdError, match="declared"):
        decode_zstd(bytes(bad))
    # reserved block type 3
    hdr = struct.pack("<IB", 0xFD2FB528, (3 << 6) | (1 << 5)) + struct.pack(
        "<Q", 0
    )
    blk = struct.pack("<I", 1 | (3 << 1))[:3]
    with pytest.raises(ZstdError, match="reserved block type"):
        decode_zstd(hdr + blk)
    # dictionary demanded by name
    dhdr = struct.pack("<IB", 0xFD2FB528, (3 << 6) | (1 << 5) | 1) + b"\x07" \
        + struct.pack("<Q", 0) + struct.pack("<I", 1)[:3]
    with pytest.raises(ZstdError, match="[Dd]ictionar"):
        decode_zstd(dhdr)
    # output cap: a frame that inflates past max_output must raise,
    # not allocate
    big = encode_zstd_store(b"A" * 10_000)
    with pytest.raises(ZstdError, match="max_output=100"):
        decode_zstd(big, max_output=100)


def test_default_cap_names_itself_and_is_raisable():
    """With max_output=None a DEFAULT 128 MiB cap applies; a perfectly
    valid payload above it must fail with an error naming the default
    cap and the max_output= escape hatch (not a message blaming the
    input), and passing an explicit max_output must decode it."""
    from dolphinbeat_spark.operators.zstd_frame import MAX_WINDOW

    # non-single-segment frame, tiny window descriptor, no FCS; body =
    # RLE blocks of 1 MiB each until just past MAX_WINDOW
    n_blocks = MAX_WINDOW // (1 << 20) + 1
    parts = [struct.pack("<IBB", 0xFD2FB528, 0, 0)]
    for i in range(n_blocks):
        last = 1 if i == n_blocks - 1 else 0
        bh = last | (1 << 1) | ((1 << 20) << 3)
        parts.append(bh.to_bytes(3, "little") + b"Z")
    frame = b"".join(parts)
    with pytest.raises(ZstdError, match="default.*max_output"):
        decode_zstd(frame)
    got = decode_zstd(frame, max_output=MAX_WINDOW + (1 << 20))
    assert len(got) == n_blocks * (1 << 20) and set(got) == {ord("Z")}


def test_dictionary_frames_cli_goldens():
    """Dictionary decompression (RFC 8878 §5) against REAL zstd-CLI
    goldens (tools/make_zstd_dict_fixtures.py): a --train'ed formatted
    dictionary (entropy-table seeding + window prefix) at levels 19
    and 1, a raw content dictionary, id-mismatch and missing-dict
    typed errors, and plain frames decoding unchanged with a
    dictionary supplied."""
    from dolphinbeat_spark.operators.zstd_frame import (
        parse_zstd_dictionary,
    )

    ddir = FIXDIR / "dict"
    if not ddir.exists():
        pytest.skip("dict fixtures not committed yet")
    trained = parse_zstd_dictionary((ddir / "trained.dict").read_bytes())
    assert trained.dict_id != 0 and trained.huff is not None
    assert trained.ll is not None and len(trained.content) > 1000
    for name, dict_blob in (
        ("s07", trained), ("s23", trained),
        ("s11", (ddir / "raw.dict").read_bytes()),
    ):
        want = (ddir / f"{name}.json").read_bytes()
        got = decode_zstd((ddir / f"{name}.zst").read_bytes(),
                          max_output=len(want) + 16, dictionary=dict_blob)
        assert got == want, name
    raw = parse_zstd_dictionary((ddir / "raw.dict").read_bytes())
    assert raw.dict_id == 0 and raw.huff is None
    # missing / mismatched dictionary: typed, names the id
    with pytest.raises(ZstdError, match="requires dictionary"):
        decode_zstd((ddir / "s07.zst").read_bytes(), max_output=1000)
    trained.dict_id = 42
    with pytest.raises(ZstdError, match="got 42"):
        decode_zstd((ddir / "s07.zst").read_bytes(), max_output=1000,
                    dictionary=trained)
    # a did-less frame decodes identically with a dictionary supplied
    plain = encode_zstd_store(b"no dict needed")
    assert decode_zstd(plain, max_output=100,
                       dictionary=raw) == b"no dict needed"


def test_dictionary_hostile_bytes():
    """Bit flips across dictionary blob AND compressed frame raise
    the typed family or decode benignly — never a foreign exception."""
    import numpy as np

    from dolphinbeat_spark.operators.zstd_frame import (
        parse_zstd_dictionary,
    )

    ddir = FIXDIR / "dict"
    if not ddir.exists():
        pytest.skip("dict fixtures not committed yet")
    dict_blob = (ddir / "trained.dict").read_bytes()
    comp = (ddir / "s07.zst").read_bytes()
    want = (ddir / "s07.json").read_bytes()
    rng = np.random.RandomState(29)
    for _ in range(60):  # flip in the dictionary
        d = bytearray(dict_blob)
        i = int(rng.randint(0, len(d)))
        d[i] ^= 1 << int(rng.randint(0, 8))
        try:
            pd_ = parse_zstd_dictionary(bytes(d))
            decode_zstd(comp, max_output=1000, dictionary=pd_)
        except ZstdError:
            pass
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"untyped crash on corrupted dictionary: {ex!r}")
    for _ in range(60):  # flip in the frame
        c = bytearray(comp)
        i = int(rng.randint(0, len(c)))
        c[i] ^= 1 << int(rng.randint(0, 8))
        try:
            got = decode_zstd(bytes(c), max_output=1000,
                              dictionary=dict_blob)
            assert got == want, "corruption must raise, not misdecode"
        except ZstdError:
            pass
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"untyped crash on corrupted dict frame: {ex!r}")


def test_hostile_window_guard():
    # window descriptor demanding an exabyte must be refused up front
    hdr = struct.pack("<IBB", 0xFD2FB528, 0, 0xFF)
    with pytest.raises(ZstdError, match="window"):
        decode_zstd(hdr + b"\x00" * 8)


def test_fuzz_corruption_never_silently_wrong():
    """Single-byte corruption of a real compressed frame either decodes
    to the original (bit didn't matter / unreachable padding) or raises
    the typed error — never returns different content silently.
    (Checksummed frames make silent corruption essentially impossible;
    this pins the error TYPE.)"""
    fix = FIXDIR / "json_rows.l19.zst"
    if not fix.exists():
        pytest.skip("fixture not committed yet")
    data = bytearray(fix.read_bytes())
    want = _corpora()["json_rows"]
    import numpy as np

    rng = np.random.RandomState(7)
    for _ in range(60):
        i = int(rng.randint(0, len(data)))
        old = data[i]
        data[i] ^= 1 << int(rng.randint(0, 8))
        try:
            got = decode_zstd(bytes(data), max_output=len(want) * 2 + 64)
            assert got == want, "corruption must raise, not misdecode"
        except ZstdError:
            pass
        except (IndexError, KeyError, OverflowError) as ex:  # pragma: no cover
            pytest.fail(f"untyped crash on corrupted input: {ex!r}")
        finally:
            data[i] = old
