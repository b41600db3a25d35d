"""Audio fingerprinting + banded near-duplicate joins — the AUDIO
half of crawl dedup, the sibling of operators/imagehash.py: copies of
one clip that differ in container (WAV vs FLAC), overall volume, or
light edits share a fingerprint within a small Hamming distance, so
the audio share of a corpus dedups through the same banded-LSH join
as images (``imagehash.dhash_near_dup_pairs`` works on any signed
64-bit hash column).

- ``audio_fingerprint64``: the loudness-contour hash — the clip's
  mono mean-|amplitude| over 65 equal windows (exact integral-image
  windowing, integer-exact for divisible lengths), one bit per
  adjacent-window comparison. Comparisons are invariant under volume
  scaling and sample-rate-preserving re-encoding, the two transforms
  wild duplicates actually carry; they are NOT meant to survive
  tempo/pitch edits (that is a chromaprint-class problem and out of
  scope — stated, not hidden).
- ``audio_fingerprint``: (media_id, payload) -> one hash row per
  clip via the same WAV/FLAC sniff as decode_audio, one Arrow
  ``mapInPandas`` pass.

At 100 TB the posture matches the image path: 8 bytes per clip into
a band-keyed shuffle join, exact Hamming filter JVM-side.

Reference parity: the reference repo has no media layer; this
extends the LLM-data-pipeline dedup surface (SURVEY §7 mandate).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["audio_fingerprint64", "audio_fingerprint"]


def audio_fingerprint64(samples: np.ndarray, windows: int = 65) -> int:
    """Sample array (n,) or (n, channels) -> signed 64-bit loudness
    contour hash (module docstring)."""
    if not 2 <= windows <= 65:
        # windows-1 comparison bits must fit the signed 64-bit
        # LongType fingerprint column; >65 would overflow at write
        # time, <2 yields no comparisons at all.
        raise ValueError(
            f"audio_fingerprint64 windows must be in [2, 65] so the "
            f"{windows - 1}-bit contour fits a signed 64-bit column")
    a = np.asarray(samples, np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    if a.ndim != 1 or a.size == 0:
        raise ValueError(
            f"audio_fingerprint64 wants a non-empty 1D/2D sample "
            f"array, got shape {np.asarray(samples).shape}")
    a = np.abs(a)
    n = a.size
    cum = np.concatenate([[0.0], np.cumsum(a)])
    edges = np.linspace(0, n, windows + 1)

    def at(p: float) -> float:
        f = int(p)
        r = p - f
        return cum[f] + (cum[min(f + 1, n)] - cum[f]) * r

    means = np.array([
        (at(edges[k + 1]) - at(edges[k])) / (edges[k + 1] - edges[k])
        for k in range(windows)
    ])
    v = 0
    for k in range(windows - 1):
        v = (v << 1) | int(means[k + 1] > means[k])
    return v - (1 << 64) if v >= 1 << 63 else v


AUDIO_FP_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("fmt", StringType()),
    StructField("sample_rate", LongType()),
    StructField("n_frames", LongType()),
    StructField("fingerprint", LongType()),
])


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> one fingerprint row per WAV/FLAC clip.
    Near-dup pairs come from
    ``imagehash.dhash_near_dup_pairs(hashes, hash_col="fingerprint")``
    — the banded join is hash-agnostic."""
    import pandas as pd

    from dolphinbeat_spark.operators.multimodal import decode_wav

    def batches(it):
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(raw)
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    rate, ch, n, samples = decode_wav(b)
                    fmt = "wav"
                elif b[:4] == b"fLaC":
                    from dolphinbeat_spark.operators.flac import (
                        decode_flac,
                    )
                    rate, ch, n, samples = decode_flac(b)
                    fmt = "flac"
                else:
                    raise NotImplementedError(
                        "audio formats beyond WAV/FLAC need codec "
                        "libraries not present in this environment")
                rows.append((mid, fmt, rate, n,
                             audio_fingerprint64(samples)))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in AUDIO_FP_SCHEMA.fields])

    return df.mapInPandas(batches, AUDIO_FP_SCHEMA)
