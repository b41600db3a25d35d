"""Audio fingerprint + banded near-dup joins (r13,
operators/audiofp.py): closed-form loudness-contour hash, volume /
sign / container invariances, and the shared banded-LSH pair join."""

import struct

import numpy as np
import pytest

from dolphinbeat_spark.operators.audiofp import (
    audio_fingerprint,
    audio_fingerprint64,
)
from dolphinbeat_spark.operators.imagehash import dhash_near_dup_pairs


def _wav16(samples: np.ndarray, rate: int = 8000) -> bytes:
    data = np.asarray(samples, np.int16).tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def test_audio_fingerprint_closed_form_and_invariances():
    rng = np.random.RandomState(5)
    amps = rng.randint(1, 16, 65) * 100
    sig = np.repeat(amps, 80).astype(np.int16)
    want = 0
    for k in range(64):
        want = (want << 1) | int(amps[k + 1] > amps[k])
    if want >= 1 << 63:
        want -= 1 << 64
    fp = audio_fingerprint64(sig)
    assert fp == want
    # the properties wild duplicates carry: volume scaling, polarity,
    # stereo wrapping
    assert audio_fingerprint64(sig * 3) == fp
    alt = sig.copy()
    alt[::2] *= -1
    assert audio_fingerprint64(alt) == fp
    assert audio_fingerprint64(np.stack([sig, sig], axis=1)) == fp
    # different content differs
    assert audio_fingerprint64(
        np.repeat(rng.randint(1, 16, 65) * 100, 80)) != fp
    with pytest.raises(ValueError, match="non-empty"):
        audio_fingerprint64(np.zeros(0))
    # windows-1 bits must fit the signed 64-bit fingerprint column
    for bad in (0, 1, 66, 128):
        with pytest.raises(ValueError, match=r"\[2, 65\]"):
            audio_fingerprint64(np.ones(100), windows=bad)
    assert audio_fingerprint64(np.arange(1, 9, dtype=float),
                               windows=2) == 1


def test_audio_fingerprint_spark_and_pairs(spark):
    """WAV and a louder FLAC re-encode of the same clip collide
    exactly; the shared banded join (hash-agnostic) finds them."""
    from dolphinbeat_spark.operators.flac import encode_flac

    rng = np.random.RandomState(8)
    rows = []
    fps = {}
    for k in range(4):
        amps = rng.randint(1, 16, 65) * 100
        sig = np.repeat(amps, 80).astype(np.int16)
        rows.append((2 * k, bytearray(_wav16(sig))))
        rows.append((2 * k + 1, bytearray(
            encode_flac((sig * 2).reshape(-1, 1), 8000))))
        fps[2 * k] = audio_fingerprint64(sig)
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hdf = audio_fingerprint(df)
    got = {r.media_id: (r.fmt, r.fingerprint) for r in hdf.collect()}
    for k in range(4):
        assert got[2 * k] == ("wav", fps[2 * k])
        assert got[2 * k + 1] == ("flac", fps[2 * k])
    pairs = dhash_near_dup_pairs(hdf, max_dist=0,
                                 hash_col="fingerprint").collect()
    found = {(p.media_a, p.media_b) for p in pairs}
    for k in range(4):
        assert (2 * k, 2 * k + 1) in found
