"""Perceptual image hashing + banded near-duplicate joins — the
IMAGE half of crawl dedup (the text half is operators/dedup.py's
MinHash/SimHash family): re-encoded, resized, or lightly edited
copies of one image share a perceptual hash within a small Hamming
distance, so a 100 TB crawl dedups its image share WITHOUT pairwise
pixel comparison.

- ``dhash64``: the difference hash — area-mean resize to a 9x8 gray
  grid, one bit per horizontal gradient (row-major, bit 63 = top
  left), packed into a SIGNED 64-bit value so the column is a plain
  Spark/DuckDB BIGINT. Gradients survive brightness/contrast shifts
  and recompression; the area mean is exact integer arithmetic for
  block-divisible sizes (what the oracle's closed form uses) and
  deterministic float64 otherwise.
- ``image_dhash``: (media_id, payload) -> (media_id, fmt, width,
  height, dhash) via the shared codec sniff
  (operators/multimodal.py::sniff_decode_image) in one Arrow
  ``mapInPandas`` pass — decode and hash in the same slot, pixels
  never leave the executor.
- ``dhash_near_dup_pairs``: banded Hamming self-join. The 64-bit
  hash splits into 4 x 16-bit bands; images sharing ANY band become
  candidates (shuffle join on the band value — never all-pairs),
  then the exact Hamming distance ``bit_count(a ^ b)`` filters to
  ``max_dist``. Same LSH contract as MinHash banding: a pair whose
  differing bits spread across every band is missed by design, and
  the band count is the recall/cost dial.

At 100 TB: one 8-byte hash per image flows into the join; the
candidate shuffle is keyed by 16-bit band values salted by band
index, and the Hamming filter is JVM-side (whole-stage codegen), so
the only Python cost is the decode pass that produced the hashes.

Reference parity: the reference repo has no media layer; this
extends the LLM-data-pipeline dedup surface (SURVEY §7 mandate).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["dhash64", "image_dhash", "dhash_near_dup_pairs"]


def _area_mean(gray: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Exact area-mean downsample to (rows, cols): each output cell
    averages its (fractional) source rectangle via the integral
    image — integer-exact when the dimensions divide evenly."""
    h, w = gray.shape
    ii = np.zeros((h + 1, w + 1), np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0, dtype=np.float64),
                           axis=1)

    def axis_edges(n: int, parts: int) -> np.ndarray:
        return np.linspace(0, n, parts + 1)

    ye = axis_edges(h, rows)
    xe = axis_edges(w, cols)

    def box(y0, y1, x0, x1) -> float:
        # fractional-edge box sum over the integral image
        def at(yy, xx):
            fy, fx = int(yy), int(xx)
            ry, rx = yy - fy, xx - fx
            v00 = ii[fy, fx]
            v01 = ii[fy, min(fx + 1, w)]
            v10 = ii[min(fy + 1, h), fx]
            v11 = ii[min(fy + 1, h), min(fx + 1, w)]
            return (v00 * (1 - ry) * (1 - rx) + v01 * (1 - ry) * rx
                    + v10 * ry * (1 - rx) + v11 * ry * rx)

        return at(y1, x1) - at(y0, x1) - at(y1, x0) + at(y0, x0)

    out = np.empty((rows, cols), np.float64)
    for r in range(rows):
        for c in range(cols):
            area = (ye[r + 1] - ye[r]) * (xe[c + 1] - xe[c])
            out[r, c] = box(ye[r], ye[r + 1], xe[c], xe[c + 1]) / area
    return out


def dhash64(px: np.ndarray) -> int:
    """Pixel array (HxW, HxWx1, HxWx3, HxWx4) -> signed 64-bit
    difference hash (module docstring). Alpha is ignored; gray is
    the exact channel mean."""
    a = np.asarray(px, np.float64)
    if a.ndim == 3:
        a = a[:, :, :3].mean(axis=2) if a.shape[2] >= 3 \
            else a[:, :, 0]
    if a.ndim != 2 or a.size == 0:
        raise ValueError(f"dhash64 wants a 2D/3D pixel array, "
                         f"got shape {np.asarray(px).shape}")
    g = _area_mean(a, 8, 9)
    bits = g[:, 1:] > g[:, :-1]  # 8x8 horizontal gradients
    v = 0
    for b in bits.reshape(-1):
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= 1 << 63 else v


DHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("fmt", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("dhash", LongType()),
])


def image_dhash(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> one perceptual-hash row per image."""
    import pandas as pd

    from dolphinbeat_spark.operators.multimodal import (
        sniff_decode_image,
    )

    def batches(it):
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                fmt, w, h, px = sniff_decode_image(bytes(raw))
                rows.append((mid, fmt, w, h, dhash64(px)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DHASH_SCHEMA.fields])

    return df.mapInPandas(batches, DHASH_SCHEMA)


def dhash_near_dup_pairs(hashes: DataFrame, max_dist: int = 6,
                         bands: int = 4,
                         id_col: str = "media_id",
                         hash_col: str = "dhash") -> DataFrame:
    """Hash rows -> (media_a, media_b, hamming_dist) near-duplicate
    pairs: candidates share at least one of ``bands`` equal-width
    hash bands (LSH — the shuffle is keyed by band values, never
    all-pairs), then the exact JVM-side Hamming filter keeps
    distance <= ``max_dist``."""
    if 64 % bands:
        raise ValueError(f"bands={bands} must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    # r17 (guide §2.4/§8): materialization barrier below the self-join
    # fork. Both join branches (probe and broadcast/build) otherwise
    # re-run the full hash-producing chain — for the callers that is a
    # per-row Python decode (image dHash / audio fingerprint), the
    # most expensive stage of the query — and the final orderBy's
    # range sampler would run it a third time. One round-robin
    # exchange of the narrow (id, hash) rows (16 bytes/row — the
    # "shuffle the proxy, not the payload" shape) makes the two
    # branches canonically identical below the exchange, so the
    # runtime dedupes them via ReusedExchange and the decode chain
    # executes exactly once. Measured at sf0.1 (mm_audio_fp_neardup):
    # 3.0 s -> 1.8 s on top of the widen fix (20.7 s unwidened).
    narrow = hashes.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    )
    parallelism = hashes.sparkSession.sparkContext.defaultParallelism
    banded = narrow.repartition(parallelism).select(
        "_id", "_h",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                (F.shiftrightunsigned(F.col("_h"), width * i)
                 .bitwiseAND(F.lit(mask))).alias("val"),
            ) for i in range(bands)
        ])).alias("b"),
    ).select("_id", "_h", "b.band", "b.val")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, on=[F.col("a.band") == F.col("b.band"),
                      F.col("a.val") == F.col("b.val"),
                      F.col("a._id") < F.col("b._id")])
        .select(F.col("a._id").alias("media_a"),
                F.col("b._id").alias("media_b"),
                F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h")))
                .alias("hamming_dist"))
        .distinct()
        .filter(F.col("hamming_dist") <= max_dist)
    )
    return pairs
