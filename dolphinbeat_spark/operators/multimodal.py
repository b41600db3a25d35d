"""Multimodal column plumbing (north-star; absent in the reference).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, Arrow batch
shape, mapInPandas signatures, frame-index explosion — is real and
oracle-tested; the actual media decode is STUBBED because no codec
libraries exist in this container:

- ``decode_media_stub`` raises NotImplementedError by default, or
  produces a clearly-marked deterministic fake when
  ``allow_fake=True`` (so pipelines can be exercised end-to-end).
- ``extract_binary_features`` is a REAL Arrow-batched feature pass
  (byte length + sha256) whose output the DuckDB oracle reproduces.

At 100 TB: media payloads dominate row size — keep them in their own
column so column pruning skips the bytes unless a stage needs them,
and size ``maxPartitionBytes``/batch counts for payload width, not
row count (mapInPandas streams Arrow batches, never whole partitions).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
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
