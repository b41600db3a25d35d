"""Compressed-JSONL ingestion — the .jsonl.{zst,gz,bz2,xz} shape bulk
text corpora actually ship in (The Pile and its descendants are
zstd-framed JSONL).

Spark reads jsonlines natively FROM FILES, but a pipeline fed binary
payloads (one corpus shard per row, from an object store or the
archive/WARC readers in this package) needs the decompress-and-split
stage inside the DataFrame plan. ``read_jsonl`` sniffs the
compression by magic — zstd (decoded by the FROM-SCRATCH RFC 8878
decoder in operators/zstd_frame.py, golden-tested against the
reference CLI), gzip multi-member, bzip2, xz (stdlib), or plain —
and emits one row per line via Arrow ``mapInPandas``. JSON parsing
itself stays in Catalyst (``from_json`` / ``get_json_object``), where
it is codegen'd and column-pruned.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


class JsonlError(ValueError):
    """Typed compressed-JSONL framing error."""


def decompress_auto(data: bytes, zstd_dict=None,
                    max_inflate: int | None = None) -> tuple[str, bytes]:
    """Sniff the compression magic -> (codec name, plaintext).
    ``zstd_dict`` (raw bytes or a parsed ZstdDictionary) enables
    dictionary-compressed zstd shards — the layout small-document
    corpora actually ship in (a shared --train'ed dictionary slashes
    per-shard overhead). Every codec is inflation-capped at
    ``max_inflate`` or sources/inflate.py's dynamic zip-bomb default
    (r13, ADVICE): overruns raise the typed JsonlError."""
    from dolphinbeat_spark.sources.inflate import (
        InflateError, bz2_capped, gzip_multi_capped, inflation_cap,
        xz_capped,
    )
    cap = inflation_cap(len(data), max_inflate)
    if data[:4] == b"\x28\xb5\x2f\xfd":
        from dolphinbeat_spark.operators.zstd_frame import decode_zstd

        return "zstd", decode_zstd(data, dictionary=zstd_dict,
                                   max_output=cap)
    if data[:2] == b"\x1f\x8b":
        try:
            return "gzip", gzip_multi_capped(data, cap)
        except InflateError as ex:
            raise JsonlError(f"gzip shard: {ex}") from ex
    if data[:3] == b"BZh":
        try:
            return "bzip2", bz2_capped(data, cap)
        except InflateError as ex:
            raise JsonlError(f"bzip2 shard: {ex}") from ex
    if data[:6] == b"\xfd7zXZ\x00":
        try:
            return "xz", xz_capped(data, cap)
        except InflateError as ex:
            raise JsonlError(f"xz shard: {ex}") from ex
    if data[:2] == b"\x1f\x9d":
        # Unix compress (.Z) — legacy corpora still ship it (r12,
        # from-scratch LZW validated against the system uncompress)
        from dolphinbeat_spark.operators.lzw_z import (
            ZCompressError, decode_z,
        )

        try:
            return "compress", decode_z(data, max_output=cap)
        except ZCompressError as ex:
            raise JsonlError(f"bad compress (.Z) stream: {ex}") from ex
    return "plain", data


JSONL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("codec", StringType()),
        StructField("line_idx", LongType()),
        StructField("line", StringType()),
    ]
)


def read_jsonl(df: DataFrame, zstd_dict: bytes | None = None,
               max_inflate: int | None = None) -> DataFrame:
    """(media_id, payload) -> one row per line with the sniffed codec
    name. A trailing newline yields no empty record; interior blank
    lines are preserved (they are data errors worth seeing).
    ``zstd_dict`` decodes dictionary-compressed shards; the blob is
    parsed ONCE on the driver and broadcast by closure capture, so
    executors skip per-row dictionary parsing."""
    if zstd_dict is not None:
        from dolphinbeat_spark.operators.zstd_frame import (
            parse_zstd_dictionary,
        )

        zstd_dict = parse_zstd_dictionary(zstd_dict)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                codec, text = decompress_auto(bytes(raw), zstd_dict,
                                              max_inflate=max_inflate)
                lines = text.decode("utf-8", "replace").split("\n")
                if lines and lines[-1] == "":
                    lines.pop()
                for i, line in enumerate(lines):
                    rows.append((mid, codec, i, line))
            yield pd.DataFrame(
                rows, columns=[f.name for f in JSONL_SCHEMA.fields]
            )

    return df.mapInPandas(batches, JSONL_SCHEMA)
