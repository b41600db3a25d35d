"""Multimodal-column query plans (binary payload plumbing).

The decode slots are REAL zero-dependency codecs implemented from
their public specs (see operators/multimodal.py, operators/jpeg.py,
operators/mp4_demux.py): PPM/BMP/PNG/GIF/baseline+progressive JPEG
images, WAV PCM/float/IMA-ADPCM audio, MP4 container demux — each
under a DuckDB oracle that independently recomputes the decoded
relation. Only perceptual codec bitstreams (H.264/AAC/MP3) remain
stubbed by name: no codec libraries exist in this environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dolphinbeat_spark.catalog import load
from dolphinbeat_spark.operators import multimodal as M
from dolphinbeat_spark.plans.registry import register


def fixture_media(df: DataFrame, build, with_text: bool = False,
                  extra_cols: tuple = ()) -> DataFrame:
    """Fixture payloads built IN EXECUTORS (r14 hygiene): one Arrow
    ``mapInPandas`` pass turns each bounded doc row into (media_id,
    payload) via ``build(doc_id[, text, *extra]) -> bytes`` — the
    old driver-side ``collect()`` + per-row loop is gone, so fixture
    construction scales with the cluster exactly like the decode
    stage it feeds (and the build cost shows up in the right place:
    the executors)."""
    import pandas as pd

    cols = ["doc_id"] + (["text"] if with_text else []) \
        + list(extra_cols)

    def batches(it):
        for pdf in it:
            payloads = [
                bytearray(build(*t))
                for t in pdf[cols].itertuples(index=False)
            ]
            yield pd.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "payload": payloads,
            })

    return df.select(*cols).mapInPandas(
        batches, "media_id long, payload binary")


def fixture_media_multi(df: DataFrame, build_many,
                        with_text: bool = False) -> DataFrame:
    """Like :func:`fixture_media` but ``build_many(doc_id[, text])
    -> list[(media_id, payload)]`` — for specs that derive SEVERAL
    media rows per document (variant pairs, multi-record archives).
    Same executor-side contract: no driver loop, no collect."""
    import pandas as pd

    cols = ["doc_id", "text"] if with_text else ["doc_id"]

    def batches(it):
        for pdf in it:
            mids: list[int] = []
            pays: list[bytearray] = []
            for t in pdf[cols].itertuples(index=False):
                for mid, pay in build_many(*t):
                    mids.append(int(mid))
                    pays.append(bytearray(pay))
            yield pd.DataFrame({
                "media_id": pd.array(mids, dtype="int64"),
                "payload": pays,
            })

    return df.select(*cols).mapInPandas(
        batches, "media_id long, payload binary")


@register(
    "mm_binary_metadata",
    oracle="""
SELECT doc_id AS media_id,
       'image' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       length(text) AS meta_width
FROM documents
ORDER BY media_id
""",
    tags=("multimodal", "binary"),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata columns (JVM-side only:
    encode/length/md5 are codegen'd built-ins)."""
    d = load(spark, sf_dir, "documents")
    media = M.attach_binary_payload(d, "doc_id", "text")
    return media.select(
        "media_id",
        "media_type",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        "meta_width",
    ).orderBy("media_id")


@register(
    "mm_feature_extract_pandas",
    oracle="""
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       substr(sha256(text), 1, 16) AS sha256_16
FROM documents
ORDER BY media_id
""",
    tags=("multimodal", "pandas_udf"),
    bench=True,
)
def mm_feature_extract_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Arrow slow-path: mapInPandas over binary payloads; the
    oracle reproduces the features, proving the batch plumbing is
    byte-faithful end to end."""
    # r16: examined for the widen spread and REVERTED after measurement
    # (OPTIMIZATION_r16.md): the per-byte Python work here (length +
    # sha256 prefix) is too cheap to repay shipping the text bytes
    # through a round-robin exchange — widened A/B measured ~1.8x
    # SLOWER at sf0.1 (0.67-0.79 s -> 1.21 s best). Single-task scan
    # stage stays the right shape for this spec at bench layout.
    d = load(spark, sf_dir, "documents")
    media = M.attach_binary_payload(d, "doc_id", "text")
    # explicit exchange + in-partition sort: a global orderBy would
    # range-sample and run the map-only Arrow chain twice (the r15
    # decode-wall finding); tiny bounded result, standard total-order
    # sink boundary
    return (
        M.extract_binary_features(media)
        .repartition(1)
        .sortWithinPartitions("media_id")
    )


@register(
    "mm_frame_sample",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id, length(text) AS meta_width FROM documents
)
SELECT media_id, CAST(f AS BIGINT) AS frame_idx, CAST(f * 32 AS BIGINT) AS byte_offset
FROM media, unnest(range(0, greatest(CAST(floor(meta_width / 32) AS INTEGER), 1))) AS t(f)
WHERE f % 4 = 0
ORDER BY media_id, frame_idx
""",
    tags=("multimodal", "frames"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 4th 32-byte frame per payload — the video
    frame-extraction pipeline shape with the codec stubbed out."""
    d = load(spark, sf_dir, "documents")
    media = M.attach_binary_payload(d, "doc_id", "text")
    return M.frame_sample_plan(media, frame_bytes=32, every=4).orderBy("media_id", "frame_idx")


@register(
    "mm_decode_ppm",
    # payload = a REAL binary PPM (P6 header + 8x4 RGB pixel rows) whose
    # 96 pixel bytes are the ASCII of repeat(md5(doc_id), 3); the Spark
    # side decodes the actual bytes (numpy codec), the oracle recomputes
    # the expected pixel sum / md5 from the same pattern — an exact
    # md5-of-decoded-pixels check, no codec libs needed
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 7 = 0
)
SELECT media_id,
       'ppm' AS fmt,
       CAST(8 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT) AS pixel_sum,
       md5(pattern) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec"),
)
def mm_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the oracle gate: each document gets a
    genuine binary PPM payload (built JVM-side — header + deterministic
    ASCII pixel bytes), ``decode_media`` parses the actual format with
    the pure-numpy codec (operators/multimodal.py::decode_ppm), and the
    decoded pixels' sum + md5 must match the oracle's independent
    recomputation. De-stubs the decode slot for uncompressed formats;
    JPEG/PNG remain honestly stubbed (no codec libs in the env)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    pattern = F.repeat(F.md5(F.col("doc_id").cast("string")), 3)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.concat(F.lit("P6\n8 4\n255\n"), pattern), "UTF-8").alias("payload"),
    )
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_decode_pnm_packed",
    # payload cycles the remaining netpbm binary family (r16): even
    # docs get a P4 packed bitmap (32x24 — the md5-pattern's 96 ASCII
    # bytes ARE the packed rows, 4 bytes per row, MSB-first bits),
    # odd docs a P5 binary graymap (12x8, samples = pattern bytes).
    # digest='hex' md5s the lowercase-hex rendering of the decoded
    # samples, which the oracle rebuilds: '01'/'00' per bit for P4,
    # two hex digits per sample for P5. pixel_sum doubles as the
    # bit-count (P4) / ord-sum (P5) check.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 13 = 5
)
SELECT media_id,
       CASE WHEN media_id % 2 = 0 THEN 'pbm' ELSE 'pgm' END AS fmt,
       CAST(CASE WHEN media_id % 2 = 0 THEN 32 ELSE 12 END
            AS BIGINT) AS width,
       CAST(CASE WHEN media_id % 2 = 0 THEN 24 ELSE 8 END
            AS BIGINT) AS height,
       CAST(CASE WHEN media_id % 2 = 0 THEN
         list_sum(list_transform(range(1, 97),
           i -> bit_count(ord(substr(pattern, CAST(i AS INTEGER),
                                     1)))))
       ELSE
         list_sum(list_transform(range(1, 97),
           i -> ord(substr(pattern, CAST(i AS INTEGER), 1))))
       END AS BIGINT) AS pixel_sum,
       CASE WHEN media_id % 2 = 0 THEN
         md5(list_aggregate(list_transform(range(1, 97), i ->
           list_aggregate(list_transform(range(0, 8), j ->
             CASE WHEN (ord(substr(pattern, CAST(i AS INTEGER), 1))
                        >> (7 - CAST(j AS INTEGER))) & 1 = 1
                  THEN '01' ELSE '00' END),
             'string_agg', '')),
           'string_agg', ''))
       ELSE
         md5(list_aggregate(list_transform(range(1, 97), i ->
           lpad(lower(to_hex(ord(substr(pattern, CAST(i AS INTEGER),
                                        1)))), 2, '0')),
           'string_agg', ''))
       END AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec"),
)
def mm_decode_pnm_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 packed-bitmap and P5 binary-graymap decode under the
    oracle gate (r16): the last netpbm binary forms beside
    decode_ppm — MSB-first packed rows (operators/multimodal.py::
    decode_pbm) and raw gray samples (decode_pgm) — through the
    shared decode_media surface with the hex digest contract."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 5)
    pattern = F.repeat(F.md5(F.col("doc_id").cast("string")), 3)
    payload = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("P4\n32 24\n"), pattern),
    ).otherwise(F.concat(F.lit("P5\n12 8\n255\n"), pattern))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(payload, "UTF-8").alias("payload"),
    )
    return M.decode_media(media, digest="hex").orderBy("media_id")


@register(
    "mm_resize_fake",
    # the fake resize is deterministic byte-stride downsampling
    # (b[::s], s = max(1, len//16)); payloads are ASCII so DuckDB
    # reproduces it with a stepped substr walk — md5-comparing the
    # RESIZED BYTES proves the Arrow batch plumbing end to end, not
    # just the metadata
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id, text,
         greatest(1, CAST(floor(length(text) / 16) AS INTEGER)) AS stride
  FROM documents
), resized AS (
  SELECT media_id,
         array_to_string(
           list_transform(range(1, length(text) + 1, stride),
                          i -> substr(text, i, 1)), '') AS r
  FROM media
)
SELECT media_id,
       least(16, length(r)) AS out_width,
       CAST(16 AS BIGINT) AS out_height,
       md5(r) AS resized_md5
FROM resized
ORDER BY media_id
""",
    tags=("multimodal", "resize", "pandas_udf"),
)
def mm_resize_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing through mapInPandas (PIL/ffmpeg slot stubbed
    with the deterministic byte-stride fake): the payload-shrinking map
    stage that at 100 TB must run BEFORE any shuffle so exchanges carry
    thumbnails, not originals. The oracle independently recomputes the
    strided bytes and their md5."""
    d = load(spark, sf_dir, "documents")
    media = M.attach_binary_payload(d, "doc_id", "text")
    return (
        M.resize_media(media, 16, 16, allow_fake=True)
        .select(
            "media_id",
            "out_width",
            F.col("out_height").cast("bigint").alias("out_height"),
            F.md5("resized_payload").alias("resized_md5"),
        )
        .orderBy("media_id")
    )


# constant RIFF/WAVE header for 8-bit mono PCM @ 8 kHz with a 96-byte
# data chunk (sizes are fixed, so the whole header is one hex literal)
_WAV_HDR_HEX = (
    "524946468400000057415645666D7420100000000100"
    "0100401F0000401F0000010008006461746160000000"
)


@register(
    "mm_decode_wav",
    # payload = a REAL binary WAV (RIFF header via unhex + 96 ASCII
    # PCM samples = repeat(md5(doc_id), 3)); Spark decodes the actual
    # container (operators/multimodal.py::decode_wav), the oracle
    # recomputes the expected sample sum / md5 / duration from the
    # same pattern — audio's analog of mm_decode_ppm
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 9 = 2
)
SELECT media_id,
       'wav' AS fmt,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(96 AS BIGINT) AS n_samples,
       CAST(96 AS DOUBLE) / 8000 AS duration_s,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT) AS sample_sum,
       md5(pattern) AS sample_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "audio", "codec"),
)
def mm_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode under the oracle gate: each document gets a
    genuine binary WAV payload (RIFF header bytes via unhex + ASCII
    8-bit PCM samples), ``decode_audio`` parses the actual container
    with the pure-numpy codec and the decoded samples' sum, md5, and
    duration must match the oracle's independent recomputation.
    De-stubs the audio slot for uncompressed PCM; MP3/AAC/opus remain
    honestly stubbed (no codec libs in the env)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 9 == 2)
    pattern = F.repeat(F.md5(F.col("doc_id").cast("string")), 3)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.unhex(F.lit(_WAV_HDR_HEX)), F.encode(pattern, "UTF-8")
        ).alias("payload"),
    )
    return M.decode_audio(media).orderBy("media_id")


@register(
    "mm_decode_png",
    # payload = a REAL PNG (zlib-deflated IDAT, CRC'd chunks) whose 8x4
    # RGB pixels are the ASCII of repeat(md5(doc_id), 3), written with
    # row filters [None, Sub, Up, Average] so decode exercises the
    # actual unfilter paths; the Spark side inflates + unfilters real
    # bytes (operators/multimodal.py::decode_png) and the oracle
    # recomputes the expected pixel sum / md5 from the same pattern
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 11 = 3
)
SELECT media_id,
       'png' AS fmt,
       CAST(8 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT) AS pixel_sum,
       md5(pattern) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec"),
)
def mm_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode under the oracle gate: PNG's
    entropy coding is DEFLATE, which the stdlib ships, so unlike JPEG
    it is fully decodable with zlib + numpy — closing the one codec
    stub that was closable in this environment (VERDICT r5 #4).

    Payload construction (encode side) runs driver-side over the
    bounded spec subset — it is test-harness glue; the DECODE is the
    operator under test and runs distributed through the same
    mapInPandas slot as PPM/BMP. Pixel sum + md5 of the decoded bytes
    must match the oracle's independent recomputation."""
    import hashlib

    from dolphinbeat_spark.operators.multimodal import encode_png

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 3)
    def build_many(i):
        rows = []
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode("ascii")
        rows.append(
            (i, bytearray(encode_png(8, 4, pattern, color_type=2,
                                     row_filters=[0, 1, 2, 3])))
        )
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_decode_gif",
    # payload = a REAL GIF87a (from-scratch LZW compression, 256-entry
    # grayscale color table) whose 12x8 pixel indices are the ASCII of
    # repeat(md5(doc_id), 3); decode LZW-decompresses and maps through
    # the palette, so each index becomes an (i,i,i) RGB triple — the
    # oracle recomputes the tripled pattern's sum and md5 independently
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 13 = 5
)
SELECT media_id,
       'gif' AS fmt,
       CAST(12 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(3 * list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT) AS pixel_sum,
       md5(regexp_replace(pattern, '(.)', '\\1\\1\\1', 'g')) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec"),
)
def mm_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL LZW-compressed image decode under the oracle gate: GIF's
    entropy coding is LZW, implemented from scratch (variable code
    width, clear/EOI, KwKwK, dictionary growth — public GIF87a spec),
    so a second compressed format decodes with no codec libraries.
    Encode side is driver-side harness glue over the bounded subset;
    the DECODE runs distributed through the same mapInPandas slot as
    PPM/BMP/PNG. The grayscale-identity palette makes each decoded
    pixel the (i,i,i) triple of its index, which the oracle reproduces
    as the tripled pattern."""
    import hashlib

    from dolphinbeat_spark.operators.multimodal import encode_gif

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 5)
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode("ascii")
        return (encode_gif(12, 8, pattern))
    media = fixture_media(d, build)
    return M.decode_media(media).orderBy("media_id")


# RIFF/WAVE header for 16-bit STEREO PCM @ 8 kHz with a 96-byte data
# chunk (= 48 interleaved int16 samples = 24 frames)
_WAV16_HDR_HEX = (
    "524946468400000057415645666D74201000000001000200"
    "401F0000007D0000040010006461746160000000"
)


@register(
    "mm_decode_wav_stereo16",
    # payload = the 16-bit stereo header + the 96 ASCII pattern bytes
    # reinterpreted as 48 little-endian int16 samples; ASCII < 128
    # keeps every sample positive, so the oracle recomputes each as
    # low + 256*high without sign handling, and the raw sample bytes
    # ARE the pattern (md5 equality pins the byte-exact decode)
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 17 = 4
)
SELECT media_id,
       'wav' AS fmt,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(48 AS BIGINT) AS n_samples,
       CAST(24 AS DOUBLE) / 8000 AS duration_s,
       CAST(list_sum(list_transform(range(0, 48),
            i -> ord(substr(pattern, CAST(2 * i + 1 AS INTEGER), 1))
                 + 256 * ord(substr(pattern, CAST(2 * i + 2 AS INTEGER), 1))))
            AS BIGINT) AS sample_sum,
       md5(pattern) AS sample_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "audio", "codec"),
)
def mm_decode_wav_stereo16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit STEREO PCM decode under the oracle gate — the common
    real-world WAV shape (the r7 widening of the 8-bit-mono-only
    decoder): interleaved little-endian signed int16 frames, duration
    = frames/rate (not samples/rate). Sum and md5 of the decoded
    int16 stream must match the oracle's independent per-sample
    recomputation from the same pattern."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 4)
    import hashlib

    hdr = bytes.fromhex(_WAV16_HDR_HEX)
    def build_many(i):
        rows = []
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode("ascii")
        rows.append((i, bytearray(hdr + pattern)))
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_audio(media).orderBy("media_id")


@register(
    "mm_decode_jpeg",
    # payload = a REAL baseline JPEG (from-scratch T.81 encoder) of a
    # FLAT 16x8 grayscale image with v = 2*(ord(first md5 hex char)
    # % 64) — an even offset from 128, so the lone DC coefficient
    # quantizes losslessly (8*(v-128)/16 is an integer with the Annex K
    # q00=16) and the decode returns exactly v everywhere: the decoded
    # relation has a CLOSED FORM the oracle recomputes (v < 128 keeps
    # chr() single-byte for the md5)
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         2 * (ord(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 64) AS v
  FROM documents WHERE doc_id % 19 = 7
)
SELECT media_id,
       'jpeg' AS fmt,
       CAST(16 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(128 * v AS BIGINT) AS pixel_sum,
       md5(repeat(chr(CAST(v AS INTEGER)), 128)) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec"),
)
def mm_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode under the oracle gate: the last image
    stub closed from scratch (operators/jpeg.py — Annex K tables,
    canonical Huffman, F.2 entropy decode, orthonormal-DCT IDCT). The
    oracle can only pin what has a cross-engine closed form, so the
    spec uses DC-lossless flat images; textured reconstruction error
    bounds and the hand-assembled-bitstream decoder pin live in
    tests/test_multimodal.py."""
    import hashlib

    from dolphinbeat_spark.operators.jpeg import encode_jpeg

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 19 == 7)
    def build(i):
        v = 2 * (ord(hashlib.md5(str(i).encode()).hexdigest()[0]) % 64)
        return (encode_jpeg(16, 8, bytes([v]) * 128, gray=True))
    media = fixture_media(d, build)
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_decode_jpeg_progressive",
    # payload = a REAL progressive (SOF2) JPEG of the same flat 16x8
    # grayscale closed form as mm_decode_jpeg: v = 2*(ord(first md5
    # hex char) % 64) quantizes losslessly, and splitting the
    # coefficients across progressive scans (DC Al=1 + refinement,
    # spectral-selection AC bands) must reconstruct the identical
    # pixels — so the SAME closed form holds
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         2 * (ord(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 64) AS v
  FROM documents WHERE doc_id % 19 = 11
)
SELECT media_id,
       'jpeg' AS fmt,
       CAST(16 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(128 * v AS BIGINT) AS pixel_sum,
       md5(repeat(chr(CAST(v AS INTEGER)), 128)) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "progressive"),
)
def mm_decode_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG (SOF2, T.81 Annex G) decode under the oracle
    gate (VERDICT r7 #3): multi-scan coefficient accumulation —
    interleaved DC first scan at Al=1, per-component spectral-selection
    AC scans with cross-block EOB runs, and a DC successive-
    approximation refinement scan — reconstructed once at EOI. The
    AC-refinement path and malformed-stream fuzz are pinned in
    tests/test_multimodal.py (hand-assembled scans, typed errors)."""
    import hashlib

    from dolphinbeat_spark.operators.jpeg import encode_jpeg_progressive

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 19 == 11)
    def build_many(i):
        rows = []
        v = 2 * (ord(hashlib.md5(str(i).encode()).hexdigest()[0]) % 64)
        rows.append(
            (i, bytearray(encode_jpeg_progressive(16, 8, bytes([v]) * 128, gray=True)))
        )
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_decode_jpeg_dri",
    # same flat-grayscale closed form as mm_decode_jpeg, but every
    # payload carries a DRI segment and RSTn markers (restart_interval
    # = 1 on a 2-MCU 16x8 image => a marker between the MCUs). Even
    # doc_ids encode BASELINE, odd PROGRESSIVE (restarts in the DC
    # first, AC band and DC refinement scans) — both restart paths sit
    # under one oracle. Restarts reset the DC predictor, and a flat
    # image stays DC-lossless, so the closed form is unchanged.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         2 * (ord(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 64) AS v
  FROM documents WHERE doc_id % 19 = 3
)
SELECT media_id,
       'jpeg' AS fmt,
       CAST(16 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(128 * v AS BIGINT) AS pixel_sum,
       md5(repeat(chr(CAST(v AS INTEGER)), 128)) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "dri"),
)
def mm_decode_jpeg_dri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG restart-interval decode under the oracle gate (VERDICT r9
    #6): DRI + RSTn markers in both baseline and progressive streams —
    predictor/EOB-run reset at each marker, byte-aligned marker
    consumption, modulo-8 sequence verification. Missing/misplaced/
    out-of-sequence RSTn fuzz lives in tests/test_multimodal.py."""
    import hashlib

    from dolphinbeat_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 19 == 3)
    def build_many(i):
        rows = []
        v = 2 * (ord(hashlib.md5(str(i).encode()).hexdigest()[0]) % 64)
        enc = encode_jpeg if i % 2 == 0 else encode_jpeg_progressive
        rows.append(
            (i, bytearray(enc(16, 8, bytes([v]) * 128, gray=True,
                              restart_interval=1)))
        )
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_decode_jpeg_arith",
    # same flat-grayscale closed form as mm_decode_jpeg, but the
    # payload is an ARITHMETIC-coded (SOF9, T.81 Annex D QM-coder)
    # JPEG; odd doc_ids additionally carry a restart interval (RSTn
    # resets statistics AND predictors in arithmetic scans). The
    # quantized coefficients are identical to the Huffman encoding,
    # so the identical closed form holds.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         2 * (ord(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 64) AS v
  FROM documents WHERE doc_id % 19 = 15
)
SELECT media_id,
       'jpeg' AS fmt,
       CAST(16 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(128 * v AS BIGINT) AS pixel_sum,
       md5(repeat(chr(CAST(v AS INTEGER)), 128)) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "arithmetic"),
)
def mm_decode_jpeg_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARITHMETIC-coded JPEG (SOF9) decode under the oracle gate: the
    T.81 Annex D QM-coder (113-state probability estimation,
    conditional exchange, DAC conditioning, restart statistics reset)
    implemented from the public spec in operators/jpeg_arith.py. The
    decoder is cross-pinned bit-for-bit against libjpeg at the
    quantized-coefficient level on committed fixtures
    (tests/fixtures/arith/, generated by tools/jpeg_arith_harness.c);
    this spec pins the in-Spark decode path with the DC-lossless flat
    closed form the oracle can recompute."""
    import hashlib

    from dolphinbeat_spark.operators.jpeg_arith import encode_jpeg_arith

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 19 == 15)
    def build_many(i):
        rows = []
        v = 2 * (ord(hashlib.md5(str(i).encode()).hexdigest()[0]) % 64)
        rows.append(
            (i, bytearray(encode_jpeg_arith(
                16, 8, bytes([v]) * 128, gray=True,
                restart_interval=1 if i % 2 else 0,
            )))
        )
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_decode_jpeg_arith_prog",
    # same flat-grayscale closed form: the payload is a PROGRESSIVE
    # arithmetic-coded (SOF10, T.81 Annex G.2) JPEG whose scan script
    # exercises DC first/refine and AC first/refine; odd doc_ids add a
    # restart interval. Quantized coefficients equal the sequential /
    # Huffman encodings, so the identical closed form holds.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         2 * (ord(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) % 64) AS v
  FROM documents WHERE doc_id % 19 = 16
)
SELECT media_id,
       'jpeg' AS fmt,
       CAST(16 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(128 * v AS BIGINT) AS pixel_sum,
       md5(repeat(chr(CAST(v AS INTEGER)), 128)) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "arithmetic", "progressive"),
)
def mm_decode_jpeg_arith_prog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE arithmetic JPEG (SOF10) decode under the oracle
    gate: the Annex G.2 scan procedures (DC first/refine, AC
    first/refine with EOBx gating) on top of the Annex D QM coder.
    Cross-pinned bit-for-bit against libjpeg's own
    jpeg_simple_progression output at the quantized-coefficient level
    (tests/fixtures/arith/*_prog.*); this spec pins the in-Spark
    decode path with the DC-lossless flat closed form."""
    import hashlib

    from dolphinbeat_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 19 == 16)
    def build_many(i):
        rows = []
        v = 2 * (ord(hashlib.md5(str(i).encode()).hexdigest()[1]) % 64)
        rows.append(
            (i, bytearray(encode_jpeg_arith_progressive(
                16, 8, bytes([v]) * 128, gray=True,
                restart_interval=1 if i % 2 else 0,
            )))
        )
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_decode_png16",
    # payload = a REAL 16-bit grayscale PNG (BE sample pairs, byte-wise
    # filters at doubled bpp) of a 16x8 image with v_i = (base*131 +
    # i*7919) % 65536, base = doc_id % 9973; row filter cycles with
    # doc_id and odd ids are Adam7-interlaced, so the wide-sample
    # unfilter AND deinterlace paths both execute. Digest over the hex
    # rendering of the little-endian uint16 stream (decode_media
    # digest='hex' — same contract as mm_decode_jpeg12).
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id % 9973 AS base
  FROM documents WHERE doc_id % 23 = 7
), px AS (
  SELECT media_id, i, (base * 131 + i * 7919) % 65536 AS v
  FROM p, range(128) t(i)
)
SELECT media_id,
       'png' AS fmt,
       CAST(16 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(SUM(v) AS BIGINT) AS pixel_sum,
       md5(string_agg(printf('%02x%02x', v % 256, v // 256), ''
                      ORDER BY i)) AS pixel_md5
FROM px GROUP BY media_id
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "16bit"),
)
def mm_decode_png16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-BIT PNG decode under the oracle gate (previously a named
    refusal: wide samples change the filter geometry — bpp doubles
    and samples are big-endian pairs). The decode runs distributed in
    the same mapInPandas slot; pixel sum + md5 of the hex-rendered
    LE uint16 stream must match the oracle's recomputation."""
    import numpy as np

    from dolphinbeat_spark.operators.multimodal import encode_png

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 23 == 7)
    def build_many(i):
        rows = []
        base = i % 9973
        v = (base * 131 + np.arange(128) * 7919) % 65536
        raw = v.astype(">u2").tobytes()
        rows.append(
            (i, bytearray(encode_png(
                16, 8, raw, color_type=0, depth=16,
                row_filters=int(i % 5), interlace=bool(i % 2),
            )))
        )
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media, digest="hex").orderBy("media_id")


@register(
    "mm_decode_png_lowdepth",
    # payload = a sub-byte grayscale PNG (depth 1/2/4 by doc_id % 3) of
    # a 19x6 image — width chosen so scanlines carry padding bits the
    # decoder must discard. Samples v_i = (base + i) % 2^d scale to
    # 0..255 by the spec's exact factor 255/(2^d - 1); digest over the
    # hex rendering of the decoded uint8 stream.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS d,
         doc_id % 251 AS base
  FROM documents WHERE doc_id % 23 = 11
), px AS (
  SELECT media_id, i,
         ((base + i) % (1 << d)) * (255 // ((1 << d) - 1)) AS v
  FROM p, range(114) t(i)
)
SELECT media_id,
       'png' AS fmt,
       CAST(19 AS BIGINT) AS width,
       CAST(6 AS BIGINT) AS height,
       CAST(SUM(v) AS BIGINT) AS pixel_sum,
       md5(string_agg(printf('%02x', v), '' ORDER BY i)) AS pixel_md5
FROM px GROUP BY media_id
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "lowdepth"),
)
def mm_decode_png_lowdepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-byte PNG decode (1/2/4-bit grayscale, MSB-first packed
    scanlines with row-padding bits) under the oracle gate. Exercises
    the bit-unpacking sample path and the exact integer range
    expansion; filters still apply byte-wise at bpp=1."""
    import numpy as np

    from dolphinbeat_spark.operators.multimodal import encode_png

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 23 == 11)
    def build_many(i):
        rows = []
        dep = {0: 1, 1: 2, 2: 4}[i % 3]
        base = i % 251
        vals = ((base + np.arange(114)) % (1 << dep)).astype(np.uint8)
        rows.append(
            (i, bytearray(encode_png(
                19, 6, vals.tobytes(), color_type=0, depth=dep,
                row_filters=int(i % 5),
            )))
        )
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media, digest="hex").orderBy("media_id")


@register(
    "mm_decode_flac",
    # payload = a REAL FLAC stream (from-scratch RFC 9639 encoder:
    # Rice-coded fixed-predictor subframes over multiple frames incl.
    # a short tail, stereo decorrelation mode cycling with doc_id
    # through independent/left-side/right-side/mid-side, Rice
    # partition order cycling 0/1/2, embedded STREAMINFO MD5). The
    # decoder verifies frame CRC-8/CRC-16 AND the embedded MD5 of the
    # decoded samples before emitting. Samples are the closed-form
    # l_i = ((base + 37i) % 4001) - 2000, r_i = ((3*base + 11i) %
    # 3001) - 1500 the oracle recomputes; digest over the hex-rendered
    # interleaved LE int16 stream (decode_audio digest='hex').
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id % 997 AS base
  FROM documents WHERE doc_id % 21 = 5
), px AS (
  SELECT media_id, i,
         ((base + 37 * i) % 4001) - 2000 AS l,
         ((base * 3 + 11 * i) % 3001) - 1500 AS r
  FROM p, range(240) t(i)
)
SELECT media_id,
       'flac' AS fmt,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(480 AS BIGINT) AS n_samples,
       CAST(480 AS DOUBLE) / 2 / 8000 AS duration_s,
       CAST(SUM(l + r) AS BIGINT) AS sample_sum,
       md5(string_agg(printf('%02x%02x%02x%02x',
           l & 255, (l >> 8) & 255, r & 255, (r >> 8) & 255), ''
           ORDER BY i)) AS sample_md5
FROM px GROUP BY media_id
ORDER BY media_id
""",
    tags=("multimodal", "decode", "audio", "codec", "flac"),
)
def mm_decode_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS COMPRESSED audio decode under the oracle gate: FLAC,
    the one audio codec whose entropy layer (Rice-coded linear
    prediction) is decodable from scratch with no codec libraries —
    the audio analog of the PNG/GIF/JPEG de-stubs. The decode runs
    distributed through the same mapInPandas slot as WAV
    (operators/flac.py; self-checks against the stream's embedded
    MD5), and the decoded interleaved samples must match the oracle's
    closed-form recomputation. Perceptual codecs (MP3/AAC/opus)
    remain honestly stubbed by name."""
    import numpy as np

    from dolphinbeat_spark.operators.flac import encode_flac

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 21 == 5)
    modes = (None, "left-side", "right-side", "mid-side")
    def build_many(i):
        rows = []
        base = i % 997
        t = np.arange(240)
        left = ((base + 37 * t) % 4001) - 2000
        right = ((base * 3 + 11 * t) % 3001) - 1500
        rows.append(
            (i, bytearray(encode_flac(
                np.stack([left, right], 1), 8000, block_size=64,
                stereo_mode=modes[i % 4], partition_order=int(i % 3),
            )))
        )
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_audio(media, digest="hex").orderBy("media_id")


@register(
    "mm_video_demux_mkv",
    # payload = a REAL Matroska/WebM container (RFC 8794 EBML + RFC
    # 9559, operators/mkv_demux.py): a V_RAW video track whose 6
    # SimpleBlocks (BlockGroup/Block for odd doc_ids) partition the
    # doc's 96-byte md5 pattern (sizes 10/20/14/16/16/20, 40-tick
    # deltas at the default 1 ms TimestampScale), plus an A_PCM audio
    # track the handler filter must skip. The oracle recomputes each
    # frame's byte range from the pattern — the WebM twin of
    # mm_video_demux.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 21 = 12
),
s(sample_idx, start, sz) AS (
  VALUES (0, 1, 10), (1, 11, 20), (2, 31, 14),
         (3, 45, 16), (4, 61, 16), (5, 77, 20)
)
SELECT media_id,
       CAST(1 AS BIGINT) AS track_id,
       'vide' AS handler,
       'V_RAW' AS codec,
       CAST(sample_idx AS BIGINT) AS sample_idx,
       CAST(sample_idx * 40 AS BIGINT) AS dts,
       CAST(sample_idx * 40 AS DOUBLE) / 1000 AS dts_s,
       CAST(sz AS BIGINT) AS sample_bytes,
       md5(substr(pattern, start, sz)) AS sample_md5
FROM p CROSS JOIN s
ORDER BY media_id, sample_idx
""",
    tags=("multimodal", "video", "demux", "webm"),
)
def mm_video_demux_mkv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matroska/WebM demux under the oracle gate — the SECOND video
    container beside ISO-BMFF, dispatched by payload magic through
    the same demux_media Arrow slot: every video frame's
    track/codec/dts/size/digest recovered from a real EBML structure
    (Info/Tracks/Clusters) with an audio track the handler filter
    skips. Lacing modes are pinned in pytest (they share block
    timestamps, so the per-frame dts relation here stays closed-form
    without them)."""
    import hashlib

    from dolphinbeat_spark.operators.mkv_demux import encode_mkv
    from dolphinbeat_spark.operators.mp4_demux import demux_media

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 21 == 12)
    sizes = [10, 20, 14, 16, 16, 20]
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        vid, pos = [], 0
        for sz in sizes:
            vid.append(pattern[pos:pos + sz])
            pos += sz
        aud = [pattern[8 * j:8 * j + 8] for j in range(4)]
        payload = encode_mkv(
            [
                {"track_id": 1, "handler": "vide", "codec": "V_RAW",
                 "samples": vid, "deltas": [40] * 6},
                {"track_id": 2, "handler": "soun", "codec": "A_PCM/INT/LIT",
                 "samples": aud, "deltas": [60] * 4},
            ],
            cluster_frames=3, block_group=bool(i % 2),
        )
        return (payload)
    media = fixture_media(d, build)
    return (
        demux_media(media, handler="vide")
        .select(
            "media_id", "track_id", "handler", "codec", "sample_idx",
            "dts", "dts_s", "sample_bytes", "sample_md5",
        )
        .orderBy("media_id", "sample_idx")
    )


@register(
    "mm_video_demux_mkv_compressed",
    # same frame partition as mm_video_demux_mkv, but the track rides
    # a ContentEncodings element (RFC 9559) with the compression algo
    # cycling by doc_id % 3: zlib (ContentCompAlgo 0), bzlib (1), and
    # header-stripping (3, settings = the frame's shared 2-byte prefix
    # — only possible because every pattern slice here is hex text, so
    # the fixture prepends a constant 'h:' marker). The STORED block
    # bytes differ per algo; the decoded relation is byte-identical to
    # the closed form — proving the demuxer actually undoes the
    # coding. Pre-r11 all of these raised 'ContentEncodings not
    # supported'.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 21 = 2
),
s(sample_idx, start, sz) AS (
  VALUES (0, 1, 10), (1, 11, 20), (2, 31, 14),
         (3, 45, 16), (4, 61, 16), (5, 77, 20)
)
SELECT media_id,
       CAST(1 AS BIGINT) AS track_id,
       'vide' AS handler,
       'V_RAW' AS codec,
       CAST(sample_idx AS BIGINT) AS sample_idx,
       CAST(sample_idx * 40 AS BIGINT) AS dts,
       CAST(sample_idx * 40 AS DOUBLE) / 1000 AS dts_s,
       CAST(sz + 2 AS BIGINT) AS sample_bytes,
       md5('h:' || substr(pattern, start, sz)) AS sample_md5
FROM p CROSS JOIN s
ORDER BY media_id, sample_idx
""",
    tags=("multimodal", "video", "demux", "webm", "compression"),
)
def mm_video_demux_mkv_compressed(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Matroska ContentEncodings under the oracle gate (r11,
    operators/mkv_demux.py): zlib/bzlib block compression and the
    header-stripping variant undone per track at demux, decoded frame
    bytes surfaced through the same demux_media Arrow slot — a real
    .mkv share stops erroring at demux. Encryption and lzo1x still
    raise by name (pytest pins)."""
    import hashlib

    from dolphinbeat_spark.operators.mkv_demux import encode_mkv
    from dolphinbeat_spark.operators.mp4_demux import demux_media

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 21 == 2)
    sizes = [10, 20, 14, 16, 16, 20]
    comps = [("zlib", b""), ("bzlib", b""), ("strip", b"h:")]
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        vid, pos = [], 0
        for sz in sizes:
            vid.append(b"h:" + pattern[pos:pos + sz])
            pos += sz
        payload = encode_mkv(
            [{"track_id": 1, "handler": "vide", "codec": "V_RAW",
              "samples": vid, "deltas": [40] * 6,
              "compression": comps[i % 3]}],
            cluster_frames=3, block_group=bool(i % 2),
        )
        return (payload)
    media = fixture_media(d, build)
    return (
        demux_media(media, handler="vide")
        .select(
            "media_id", "track_id", "handler", "codec", "sample_idx",
            "dts", "dts_s", "sample_bytes", "sample_md5",
        )
        .orderBy("media_id", "sample_idx")
    )


@register(
    "mm_audio_demux_mp3",
    # payload = a REAL MPEG-1 Layer III frame sequence (128 kbit/s,
    # 44.1 kHz, alternating padding bit -> 417/418-byte frames, the
    # VBR length mechanism) whose frame bodies draw round-robin from
    # the doc's 96-char md5 pattern; operators/mp3_demux.py walks the
    # published header matrix and the oracle recomputes each frame's
    # header hex + body slice (digest='hex': md5 over the lowercase
    # hex rendering, since frame headers are non-ASCII).
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 21 = 15
),
s(sample_idx, hdr, start, sz) AS (
  VALUES (0, 'fffb90c0', 1, 413), (1, 'fffb92c0', 414, 414),
         (2, 'fffb90c0', 828, 413)
)
SELECT media_id,
       CAST(1 AS BIGINT) AS track_id,
       'soun' AS handler,
       'mpeg1-layer3' AS codec,
       CAST(sample_idx AS BIGINT) AS sample_idx,
       CAST(sample_idx * 1152 AS BIGINT) AS dts,
       CAST(sample_idx * 1152 AS DOUBLE) / 44100 AS dts_s,
       CAST(sz + 4 AS BIGINT) AS sample_bytes,
       md5(hdr || lower(hex(substr(repeat(pattern, 13), start, sz))))
           AS sample_md5
FROM p CROSS JOIN s
ORDER BY media_id, sample_idx
""",
    tags=("multimodal", "audio", "demux", "mp3"),
)
def mm_audio_demux_mp3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 frame demux under the oracle gate — the audio analog of
    the video-container demux specs: per-frame byte ranges, sample
    timestamps (1152 samples/frame), and digests recovered from real
    MPEG audio framing, dispatched by payload magic through the same
    demux_media Arrow slot. DCT-domain bitstream decode stays honestly
    stubbed (no codec libs); frame-level demux is what the 100 TB
    sampling/dedup pipeline needs."""
    import hashlib

    from dolphinbeat_spark.operators.mp3_demux import encode_mp3_frames
    from dolphinbeat_spark.operators.mp4_demux import demux_media

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 21 == 15)
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        return (
            encode_mp3_frames(3, pattern, paddings=[0, 1, 0])
        )
    media = fixture_media(d, build)
    return (
        demux_media(media, digest="hex")
        .select(
            "media_id", "track_id", "handler", "codec", "sample_idx",
            "dts", "dts_s", "sample_bytes", "sample_md5",
        )
        .orderBy("media_id", "sample_idx")
    )


@register(
    "mm_audio_demux_ogg",
    # payload = a REAL Ogg/Opus stream (RFC 3533 pages with the
    # Ogg-specific CRC-32, lacing, BOS/EOS flags; RFC 7845 OpusHead
    # identification packet -> fixed 48 kHz granule clock): 5 data
    # packets from the doc's md5 pattern over two pages with granules
    # 960/2880; every packet row carries its PAGE's granule (what the
    # container stores). digest='hex' since the head packet is
    # non-ASCII; its hex is embedded in the oracle verbatim.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 21 = 18
),
s(sample_idx, dts, start, sz) AS (
  VALUES (1, 960, 1, 10), (2, 960, 11, 20), (3, 2880, 31, 14),
         (4, 2880, 45, 16), (5, 2880, 61, 16)
)
SELECT media_id,
       CAST(1 AS BIGINT) AS track_id,
       'soun' AS handler,
       'opus' AS codec,
       CAST(sample_idx AS BIGINT) AS sample_idx,
       CAST(dts AS BIGINT) AS dts,
       CAST(dts AS DOUBLE) / 48000 AS dts_s,
       CAST(sz AS BIGINT) AS sample_bytes,
       md5(lower(hex(substr(pattern, start, sz)))) AS sample_md5
FROM p CROSS JOIN s
UNION ALL
SELECT media_id, 1, 'soun', 'opus', 0, 960,
       CAST(960 AS DOUBLE) / 48000, 19,
       md5('4f707573486561640102000080bb0000000000')
FROM p
ORDER BY media_id, sample_idx
""",
    tags=("multimodal", "audio", "demux", "ogg", "opus"),
)
def mm_audio_demux_ogg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ogg/Opus container demux under the oracle gate — the THIRD
    container dialect through the magic-dispatched demux_media slot
    (ISO-BMFF, EBML, MPEG audio framing, now RFC 3533 pages): page
    CRC verification, segment-lacing packet reassembly, BOS codec
    identification, per-packet byte ranges with page granules.
    Opus/Vorbis BITSTREAM decode stays honestly stubbed (no codec
    libs)."""
    import hashlib

    from dolphinbeat_spark.operators.mp4_demux import demux_media
    from dolphinbeat_spark.operators.ogg_demux import encode_ogg

    head = bytes.fromhex("4f707573486561640102000080bb0000000000")
    sizes = [10, 20, 14, 16, 16]
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 21 == 18)
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        pkts, pos = [], 0
        for sz in sizes:
            pkts.append(pattern[pos:pos + sz])
            pos += sz
        return (encode_ogg(
            [{"serial": 1, "packets": pkts, "codec_head": head,
              "granules": [960, 2880]}]
        ))
    media = fixture_media(d, build)
    return (
        demux_media(media, digest="hex")
        .select(
            "media_id", "track_id", "handler", "codec", "sample_idx",
            "dts", "dts_s", "sample_bytes", "sample_md5",
        )
        .orderBy("media_id", "sample_idx")
    )


@register(
    "mm_ogg_spanning_packets",
    # payload = the COMMITTED fixture tests/fixtures/spanning.ogg
    # (tools/make_ogg_spanning_fixture.py): an Opus stream whose
    # 1201-byte middle packet SPANS two pages at a 3-lace page cap
    # (laces [255,255,255] + [255,181]; the no-completion page carries
    # granule -1 per RFC 3533) — the layout real Vorbis headers
    # produce, a r9 NotImplementedError boundary. The oracle pins the
    # md5 of each packet's hex rendering, computed over the
    # REASSEMBLED fragments.
    oracle="""
SELECT *
FROM (VALUES
  (0::BIGINT, 11::BIGINT, 'soun', 'opus', 0::BIGINT, 960::BIGINT,
   960::DOUBLE / 48000, 19::BIGINT,
   'b9c977a77d966bd59b40cec1d5d25d4d'),
  (0::BIGINT, 11::BIGINT, 'soun', 'opus', 1::BIGINT, 1920::BIGINT,
   1920::DOUBLE / 48000, 1201::BIGINT,
   'f719f1cf8cbad46826e9348d721249be'),
  (0::BIGINT, 11::BIGINT, 'soun', 'opus', 2::BIGINT, 2880::BIGINT,
   2880::DOUBLE / 48000, 17::BIGINT,
   '043839cc15313ee4d02dd8f329c1d132')
) AS t(media_id, track_id, handler, codec, sample_idx, dts, dts_s,
       sample_bytes, sample_md5)
ORDER BY sample_idx
""",
    tags=("multimodal", "audio", "demux", "ogg", "spanning"),
)
def mm_ogg_spanning_packets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ogg spanning-packet reassembly under the oracle gate
    (operators/ogg_demux.py): continuation-flag pages reassemble into
    one packet whose demux row carries the total size and the md5 of
    the stitched bytes. Reads the committed multi-page fixture,
    independent of sf_dir."""
    from pathlib import Path

    from dolphinbeat_spark.operators.mp4_demux import demux_media

    raw = (
        Path(__file__).resolve().parents[2]
        / "tests" / "fixtures" / "spanning.ogg"
    ).read_bytes()
    media = spark.createDataFrame(
        [(0, bytearray(raw))], "media_id long, payload binary"
    )
    return (
        demux_media(media, digest="hex")
        .select("media_id", "track_id", "handler", "codec", "sample_idx",
                "dts", "dts_s", "sample_bytes", "sample_md5")
        .orderBy("sample_idx")
    )


@register(
    "mm_exif_extract",
    # payload = a real JPEG carrying a real APP1 Exif segment (TIFF
    # IFD chain, operators/exif.py::encode_exif_app1, byte order
    # alternating II/MM with doc_id parity): camera fields and GPS
    # DMS rationals are closed-form in doc_id; every fourth doc has
    # no GPS IFD at all. The oracle recomputes each field, including
    # the DMS->decimal-degree conversion with hemisphere signs
    # (bit-identical double math: d + m/60.0 + s/3600.0).
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id AS i
  FROM documents WHERE doc_id % 25 = 4
)
SELECT media_id,
       'ACME-' || CAST(i % 5 AS VARCHAR) AS make,
       'M' || CAST(i % 97 AS VARCHAR) AS model,
       CAST(1 + i % 8 AS BIGINT) AS orientation,
       printf('2024:%02d:%02d 10:20:30', 1 + i % 12, 1 + i % 28)
           AS datetime_original,
       CAST(100 * (1 + i % 8) AS BIGINT) AS iso,
       CASE WHEN i % 4 = 0 THEN NULL
            WHEN i % 2 = 1
            THEN -((i % 90) + ((i * 7) % 60) / 60.0
                   + ((i * 13) % 60) / 3600.0)
            ELSE (i % 90) + ((i * 7) % 60) / 60.0
                 + ((i * 13) % 60) / 3600.0 END AS gps_lat,
       CASE WHEN i % 4 = 0 THEN NULL
            WHEN i % 3 = 0
            THEN -((i % 180) + ((i * 11) % 60) / 60.0
                   + ((i * 17) % 60) / 3600.0)
            ELSE (i % 180) + ((i * 11) % 60) / 60.0
                 + ((i * 17) % 60) / 3600.0 END AS gps_lon,
       i % 4 != 0 AS has_gps
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "exif", "metadata"),
)
def mm_exif_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction under the oracle gate: camera
    make/model/orientation/timestamp/ISO and GPS coordinates parsed
    from real APP1 TIFF-IFD structures (both byte orders) by the
    from-scratch parser in operators/exif.py, distributed via Arrow
    mapInPandas. These fields are the filter/dedup keys a multimodal
    training pipeline joins on (same-device bursts, time windows) —
    and the GPS columns are exactly the PII the redaction spec
    removes."""
    from dolphinbeat_spark.operators.exif import (
        encode_exif_app1, exif_extract, insert_app1,
    )
    from dolphinbeat_spark.operators.jpeg import encode_jpeg

    jpg = encode_jpeg(16, 8, bytes([130]) * 128, gray=True)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 4)
    def build(i):
        gps = None
        if i % 4:
            gps = ("S" if i % 2 else "N",
                   ((i % 90, 1), ((i * 7) % 60, 1), ((i * 13) % 60, 1)),
                   "W" if i % 3 == 0 else "E",
                   ((i % 180, 1), ((i * 11) % 60, 1), ((i * 17) % 60, 1)))
        app1 = encode_exif_app1(
            make=f"ACME-{i % 5}", model=f"M{i % 97}",
            orientation=1 + i % 8,
            datetime_original=f"2024:{1 + i % 12:02d}:{1 + i % 28:02d} "
                              "10:20:30",
            iso=100 * (1 + i % 8), gps=gps,
            byte_order="<" if i % 2 == 0 else ">",
        )
        return (insert_app1(jpg, app1))
    media = fixture_media(d, build)
    return exif_extract(media).orderBy("media_id")


@register(
    "mm_exif_webp",
    # payload = a VP8X-wrapped LOSSY WebP (the r11 VP8 keyframe
    # encoder) carrying an EXIF chunk — the same closed-form TIFF-IFD
    # camera/GPS fields as mm_exif_extract, now extracted from the #2
    # web image format's container (WebP container spec, VP8X flags
    # bit 3). Odd doc_ids prefix the chunk with the JPEG-style
    # 'Exif\\x00\\x00' header some writers emit; both layouts must
    # parse identically. Every fourth doc carries no GPS IFD.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id AS i
  FROM documents WHERE doc_id % 25 = 12
)
SELECT media_id,
       'ACME-' || CAST(i % 5 AS VARCHAR) AS make,
       'M' || CAST(i % 97 AS VARCHAR) AS model,
       CAST(1 + i % 8 AS BIGINT) AS orientation,
       printf('2024:%02d:%02d 10:20:30', 1 + i % 12, 1 + i % 28)
           AS datetime_original,
       CAST(100 * (1 + i % 8) AS BIGINT) AS iso,
       CASE WHEN i % 4 = 0 THEN NULL
            WHEN i % 2 = 1
            THEN -((i % 90) + ((i * 7) % 60) / 60.0
                   + ((i * 13) % 60) / 3600.0)
            ELSE (i % 90) + ((i * 7) % 60) / 60.0
                 + ((i * 13) % 60) / 3600.0 END AS gps_lat,
       CASE WHEN i % 4 = 0 THEN NULL
            WHEN i % 3 = 0
            THEN -((i % 180) + ((i * 11) % 60) / 60.0
                   + ((i * 17) % 60) / 3600.0)
            ELSE (i % 180) + ((i * 11) % 60) / 60.0
                 + ((i * 17) % 60) / 3600.0 END AS gps_lon,
       i % 4 != 0 AS has_gps
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "exif", "metadata", "webp"),
)
def mm_exif_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF extraction from WebP containers under the oracle gate
    (r11): the same from-scratch TIFF-IFD parser behind the VP8X EXIF
    chunk walk — camera identity and GPS PII are exactly the keys/
    redaction targets a crawl pipeline needs for the WebP share of
    its images."""
    from dolphinbeat_spark.operators import vp8_tables as VT
    from dolphinbeat_spark.operators.exif import encode_exif_app1, exif_extract
    from dolphinbeat_spark.operators.webp import add_webp_exif, encode_webp_vp8

    mb = {"ymode": VT.DC_PRED, "uvmode": VT.DC_PRED,
          "y2": [4] + [0] * 15}
    base = encode_webp_vp8(16, 16, [mb], qi=20)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 12)
    def build(i):
        gps = None
        if i % 4:
            gps = ("S" if i % 2 else "N",
                   ((i % 90, 1), ((i * 7) % 60, 1), ((i * 13) % 60, 1)),
                   "W" if i % 3 == 0 else "E",
                   ((i % 180, 1), ((i * 11) % 60, 1), ((i * 17) % 60, 1)))
        app1 = encode_exif_app1(
            make=f"ACME-{i % 5}", model=f"M{i % 97}",
            orientation=1 + i % 8,
            datetime_original=f"2024:{1 + i % 12:02d}:{1 + i % 28:02d} "
                              "10:20:30",
            iso=100 * (1 + i % 8), gps=gps,
            byte_order="<" if i % 2 == 0 else ">",
        )
        tiff = app1[10:]  # strip marker + length + 'Exif\x00\x00'
        if i % 2:
            tiff = b"Exif\x00\x00" + tiff  # the JPEG-prefixed layout
        return (add_webp_exif(base, tiff, (16, 16)))
    media = fixture_media(d, build)
    return exif_extract(media).orderBy("media_id")


@register(
    "mm_exif_gps_redact",
    # the redaction gate: strip_metadata drops every APPn/COM segment
    # (GPS hides in thumbnails/maker notes too) and MUST NOT disturb
    # the entropy-coded pixels. Each doc's JPEG carries a GPS-bearing
    # APP1; after distributed redaction the extractor finds nothing
    # and the decode still matches the flat closed form.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         2 * (ord(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) % 64) AS v
  FROM documents WHERE doc_id % 25 = 9
)
SELECT media_id,
       FALSE AS has_gps,
       'jpeg' AS fmt,
       CAST(16 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(128 * v AS BIGINT) AS pixel_sum,
       md5(repeat(chr(CAST(v AS INTEGER)), 128)) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "exif", "redaction", "pii"),
)
def mm_exif_gps_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPS/PII redaction under the oracle gate, proving BOTH halves
    of the contract at once: after the distributed strip
    (exif.strip_metadata_df) the extractor finds no GPS, and the
    pixel decode is byte-identical to the untagged closed form — the
    metadata layer went, the image didn't."""
    import hashlib

    from dolphinbeat_spark.operators.exif import (
        encode_exif_app1, exif_extract, insert_app1, strip_metadata_df,
    )
    from dolphinbeat_spark.operators.jpeg import encode_jpeg

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 9)
    def build(i):
        v = 2 * (ord(hashlib.md5(str(i).encode()).hexdigest()[2]) % 64)
        jpg = encode_jpeg(16, 8, bytes([v]) * 128, gray=True)
        app1 = encode_exif_app1(
            make="ACME", gps=("N", ((1, 1), (2, 1), (3, 1)),
                              "E", ((4, 1), (5, 1), (6, 1))),
        )
        return (insert_app1(jpg, app1))
    media = fixture_media(d, build)
    clean = strip_metadata_df(media)
    meta = exif_extract(clean).select("media_id", "has_gps")
    pixels = M.decode_media(clean)
    return (
        meta.join(pixels, "media_id")
        .select("media_id", "has_gps", "fmt", "width", "height",
                "pixel_sum", "pixel_md5")
        .orderBy("media_id")
    )


@register(
    "warc_records",
    # payload = a REAL WARC 1.0 file (sources/warc.py): warcinfo +
    # two HTTP response records whose bodies are slices of the doc's
    # md5 pattern; odd doc_ids use the Common Crawl record-per-gzip-
    # member layout. The oracle recomputes every column, including
    # the HTTP envelope split (status / Content-Type / entity body).
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id AS i,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 14
),
s(record_idx, wt, status, sz, start) AS (
  VALUES (1, 'response', 200, 40, 1), (2, 'response', 404, 30, 41)
)
SELECT media_id, CAST(record_idx AS BIGINT) AS record_idx,
       wt AS warc_type,
       '<urn:uuid:' || CAST(i AS VARCHAR) || '-'
           || CAST(record_idx AS VARCHAR) || '>' AS record_id,
       'http://ex.com/' || CAST(i AS VARCHAR) || '/'
           || CAST(record_idx AS VARCHAR) AS target_uri,
       printf('2024-01-%02dT00:00:00Z', 1 + i % 28) AS warc_date,
       CAST(status AS BIGINT) AS http_status,
       CASE record_idx WHEN 1 THEN 'text/html' ELSE 'text/plain' END
           AS content_type,
       CAST(NULL AS VARCHAR) AS http_encoding,
       CAST(sz AS BIGINT) AS body_len,
       md5(substr(pattern, start, sz)) AS body_md5,
       substr(pattern, start, sz) AS body_text,
       'utf-8' AS charset,
       CAST(NULL AS VARCHAR) AS payload_digest,
       CAST(NULL AS VARCHAR) AS refers_to,
       CAST(NULL AS VARCHAR) AS refers_to_uri
FROM p CROSS JOIN s
UNION ALL
SELECT media_id, 0, 'warcinfo',
       '<urn:uuid:' || CAST(i AS VARCHAR) || '-0>', NULL,
       printf('2024-01-%02dT00:00:00Z', 1 + i % 28), NULL,
       'application/warc-fields', CAST(NULL AS VARCHAR), 23,
       md5('software: dolphinbeat' || chr(13) || chr(10)),
       'software: dolphinbeat' || chr(13) || chr(10),
       'utf-8' AS charset,
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR)
FROM p
ORDER BY media_id, record_idx
""",
    tags=("text", "ingest", "warc"),
)
def warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion under the oracle gate — the Common Crawl bulk
    format a web-scale training pipeline reads first: record grammar
    (version line, CRLF headers, Content-Length framing), the
    record-per-gzip-member layout (odd doc_ids), and HTTP response
    envelope splitting, all via Arrow mapInPandas
    (sources/warc.py::read_warc). The emitted relation (uri, date,
    status, content type, body text/digest) is what the dedup /
    quality / lang-ID stages consume."""
    import hashlib

    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 14)
    def build_many(i):
        rows = []
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        date = f"2024-01-{1 + i % 28:02d}T00:00:00Z"
        recs = [
            {"type": "warcinfo", "record_id": f"<urn:uuid:{i}-0>",
             "date": date, "content": b"software: dolphinbeat\r\n",
             "content_type": "application/warc-fields"},
            {"type": "response", "record_id": f"<urn:uuid:{i}-1>",
             "target_uri": f"http://ex.com/{i}/1", "date": date,
             "content": pattern[0:40],
             "http": {"status": 200, "content_type": "text/html"}},
            {"type": "response", "record_id": f"<urn:uuid:{i}-2>",
             "target_uri": f"http://ex.com/{i}/2", "date": date,
             "content": pattern[40:70],
             "http": {"status": 404, "content_type": "text/plain"}},
        ]
        rows.append(
            (i, bytearray(encode_warc(recs, gzip_members=bool(i % 2))))
        )
        return rows
    media = fixture_media_multi(d, build_many)
    return read_warc(media).orderBy("media_id", "record_idx")


@register(
    "warc_charset_decode",
    # payload = the COMMITTED fixture tests/fixtures/charset.warc
    # (tools/make_charset_fixture.py): five HTTP responses covering
    # every rung of the WHATWG charset precedence — cp1252 labeled
    # iso-8859-1 (the € / — bytes are cp1252-only), Shift_JIS found
    # only by <meta charset> prescan, a UTF-8 BOM beating a LYING
    # iso-8859-1 header, undeclared cp1252 via the windows-1252
    # fallback, and GBK under its gb2312 superset label. The oracle
    # pins the decoded text verbatim: before charset handling every
    # non-ASCII char here came back U+FFFD.
    oracle="""
SELECT *
FROM (VALUES
  (0::BIGINT, 0::BIGINT, 200::BIGINT, 'text/html; charset=iso-8859-1',
   'Café naïve — résumé €9', 'windows-1252'),
  (0::BIGINT, 1::BIGINT, 200::BIGINT, 'text/html',
   '<html><head><meta charset="shift_jis"></head><body><p>こんにちは世界。日本語のページ。</p></body></html>',
   'shift_jis'),
  (0::BIGINT, 2::BIGINT, 200::BIGINT, 'text/html; charset=iso-8859-1',
   'BOM wins: héllo résumé', 'utf-8'),
  (0::BIGINT, 3::BIGINT, 200::BIGINT, 'text/html',
   'déjà vu, 10€ œuvre', 'windows-1252'),
  (0::BIGINT, 4::BIGINT, 200::BIGINT, 'text/html; charset=gb2312',
   '<html><body><p>你好，世界。中文页面。</p></body></html>', 'gbk'),
  (0::BIGINT, 5::BIGINT, 200::BIGINT, 'text/plain; charset=iso-2022-jp',
   '日本語テキストです。ISO-2022-JP 版。', 'iso-2022-jp'),
  (0::BIGINT, 6::BIGINT, 200::BIGINT, 'text/html',
   '<html><head><meta charset="euc-jp"></head><body><p>こんにちは、EUC-JP のページです。</p></body></html>',
   'euc-jp'),
  (0::BIGINT, 7::BIGINT, 200::BIGINT, 'text/html; charset=ks_c_5601-1987',
   '안녕하세요 세계. 한국어 페이지.', 'euc-kr'),
  (0::BIGINT, 8::BIGINT, 200::BIGINT, 'text/html; charset=big5',
   '繁體中文網頁測試。', 'big5')
) AS t(media_id, record_idx, http_status, content_type, body_text, charset)
ORDER BY record_idx
""",
    tags=("text", "ingest", "warc", "charset"),
)
def warc_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset-aware WARC body decode under the oracle gate
    (sources/charset.py): BOM → transport ``charset=`` param → meta
    prescan → strict UTF-8 → windows-1252 fallback, with WHATWG label
    normalization (latin-1→cp1252, shift_jis→cp932, gb2312→gbk).
    Reads the committed legacy-encoding fixture — independent of
    sf_dir, like the cdc_binlog_* replay specs."""
    from pathlib import Path

    from dolphinbeat_spark.sources.warc import read_warc

    raw = (
        Path(__file__).resolve().parents[2]
        / "tests" / "fixtures" / "charset.warc"
    ).read_bytes()
    media = spark.createDataFrame(
        [(0, bytearray(raw))], "media_id long, payload binary"
    )
    return (
        read_warc(media)
        .select("media_id", "record_idx", "http_status", "content_type",
                "body_text", "charset")
        .orderBy("record_idx")
    )


@register(
    "warc_content_encoding",
    # Eleven HTTP responses per doc exercise every supported body
    # coding
    # (RFC 9110 §8.4 / RFC 9112 §7.1): identity, Content-Encoding gzip,
    # deflate in BOTH wild forms (zlib-wrapped per spec and raw-deflate
    # as misconfigured servers send), Transfer-Encoding chunked (with a
    # chunk extension and a trailer field), chunked OVER gzip,
    # MULTI-MEMBER gzip (RFC 1952 §2.2 — r12: a single zlib.decompress
    # silently truncated to the first member), zstd (RFC 8878 through
    # the in-repo frame decoder, r12), a bare-LF HTTP envelope
    # (r12: sloppy servers terminate headers with \n\n; pre-fix the
    # whole header block flowed into body_text), brotli (r12:
    # from-scratch RFC 7932 decoder, operators/brotli.py — the largest
    # wild-web coding), and Unix compress (r12: from-scratch .Z LZW
    # validated against the system uncompress — the last registered
    # RFC 9110 coding). The oracle pins the decoded text, length,
    # digest and the applied coding list in closed form from the same
    # pattern pieces.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 9
),
s(record_idx, enc, start, sz) AS (
  VALUES (0, NULL, 1, 40), (1, 'gzip', 1, 60), (2, 'deflate', 11, 40),
         (3, 'deflate', 21, 60), (4, 'chunked', 1, 96),
         (5, 'gzip,chunked', 31, 60), (6, 'gzip', 41, 50),
         (7, 'zstd', 5, 72), (8, NULL, 61, 30), (9, 'br', 13, 66),
         (10, 'compress', 17, 48)
)
SELECT media_id, CAST(record_idx AS BIGINT) AS record_idx,
       200::BIGINT AS http_status, 'text/plain' AS content_type,
       enc AS http_encoding,
       CAST(sz AS BIGINT) AS body_len,
       md5(substr(pattern, start, sz)) AS body_md5,
       substr(pattern, start, sz) AS body_text,
       'utf-8' AS charset
FROM p CROSS JOIN s
ORDER BY media_id, record_idx
""",
    tags=("text", "ingest", "warc", "http"),
)
def warc_content_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP body decoding inside WARC response records
    (sources/warc.py::_split_http): Transfer-Encoding chunked framing
    removed, Content-/Transfer-Encoding gzip & deflate (both zlib and
    raw forms) inflated BEFORE charset detection, with the applied
    coding list surfaced as ``http_encoding``. Wild WARCs (wget/
    warcprox/Heritrix captures, older Common Crawl) store the raw HTTP
    payload — without this, a gzip'd response's body_text is binary
    garbage that poisons dedup hashes and quality gates downstream.
    r12 adds multi-member gzip (all members decode, trailing garbage
    raises typed), zstd via the in-repo RFC 8878 decoder, brotli via
    the in-repo from-scratch RFC 7932 decoder (operators/brotli.py),
    and bare-LF envelope tolerance; genuinely unsupported or corrupt
    codings are contained per response as ``unresolved:<coding>``."""
    import hashlib

    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 9)
    def build_many(i):
        rows = []
        pat = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        mk = lambda n, body, **http: {  # noqa: E731
            "type": "response", "record_id": f"<urn:uuid:{i}-{n}>",
            "target_uri": f"http://ex.com/{i}/{n}", "content": body,
            "http": {"status": 200, "content_type": "text/plain", **http},
        }
        recs = [
            mk(0, pat[0:40]),
            mk(1, pat[0:60], content_encoding="gzip"),
            mk(2, pat[10:50], content_encoding="deflate"),
            mk(3, pat[20:80], content_encoding="deflate",
               raw_deflate=True),
            mk(4, pat[0:96], chunked=True),
            mk(5, pat[30:90], content_encoding="gzip", chunked=True),
            mk(6, pat[40:90], content_encoding="gzip", gzip_parts=3),
            mk(7, pat[4:76], content_encoding="zstd"),
            mk(8, pat[60:90], bare_lf=True),
            mk(9, pat[12:78], content_encoding="br"),
            mk(10, pat[16:64], content_encoding="compress"),
        ]
        rows.append(
            (i, bytearray(encode_warc(recs, gzip_members=bool(i % 2))))
        )
        return rows
    media = fixture_media_multi(d, build_many)
    return (
        read_warc(media)
        .select("media_id", "record_idx", "http_status", "content_type",
                "http_encoding", "body_len", "body_md5", "body_text",
                "charset")
        .orderBy("media_id", "record_idx")
    )


@register(
    "pipeline_warc_capture",
    # Each payload is three WARC response records where record 1 is
    # CORRUPT (its Content-Length claims 999999 bytes that aren't
    # there — the classic truncated-capture shape). errors="capture"
    # must isolate it: records 0 and 2 flow with their exact bodies,
    # record 1 becomes one error-only row (all-null fields, error
    # set). The oracle pins the good bodies and the error-row
    # positions in closed form; strict mode raising on the same bytes
    # is pinned by tests/test_multimodal.py.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 3
),
s(record_idx, ok, start, sz) AS (
  VALUES (0, TRUE, 1, 40), (1, FALSE, NULL, NULL), (2, TRUE, 41, 56)
)
SELECT media_id, CAST(record_idx AS BIGINT) AS record_idx,
       CAST(CASE WHEN ok THEN 200 END AS BIGINT) AS http_status,
       CASE WHEN ok THEN substr(pattern, start, sz) END AS body_text,
       NOT ok AS is_error
FROM p CROSS JOIN s
ORDER BY media_id, record_idx
""",
    tags=("text", "ingest", "warc", "errors"),
)
def pipeline_warc_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record error isolation for wild crawls
    (sources/warc.py::read_warc errors="capture"): at 100 TB corrupt
    records are a statistical certainty, and one truncated capture
    must cost ONE row, not a 1 GB segment's task. The corrupt record
    parses as "content truncated" and the reader resyncs on the next
    ``\\r\\n\\r\\nWARC/`` boundary, so the record after it still
    flows with its exact body."""
    import hashlib

    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 3)
    def build(i):
        pat = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        mk = lambda n, body: {  # noqa: E731
            "type": "response", "record_id": f"<urn:uuid:{i}-{n}>",
            "target_uri": f"http://ex.com/{i}/{n}", "content": body,
            "http": {"status": 200, "content_type": "text/plain"},
        }
        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Record-ID: <urn:uuid:bad>\r\n"
               b"Content-Length: 999999\r\n\r\ntruncated!\r\n\r\n")
        payload = (encode_warc([mk(0, pat[0:40])]) + bad
                   + encode_warc([mk(2, pat[40:96])]))
        return (payload)
    media = fixture_media(d, build)
    return (
        read_warc(media, errors="capture")
        .select("media_id", "record_idx", "http_status", "body_text",
                F.col("error").isNotNull().alias("is_error"))
        .orderBy("media_id", "record_idx")
    )


@register(
    "warc_revisit_dedup",
    # payload = a WARC per doc holding one response (the original
    # fetch, WARC-Payload-Digest stamped) and two REVISIT records
    # (identical-payload-digest profile, pointing at the original via
    # WARC-Refers-To / WARC-Refers-To-Target-URI, empty body) — how
    # Common Crawl marks duplicate fetches so consumers can dedup
    # WITHOUT refetching. The query joins revisits to their originals
    # on (media_id, payload_digest) and emits the deduped fetch set:
    # every fetch resolved to its canonical URI with a duplicate
    # flag. Pre-r13 read_warc dropped these headers, so the crawl's
    # own dedup markers could not join.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id AS i,
         'md5:' || md5(substr(repeat(md5(CAST(doc_id AS VARCHAR)), 3),
                              1, 40)) AS dg
  FROM documents WHERE doc_id % 25 = 8
)
SELECT media_id,
       'http://ex.com/' || CAST(i AS VARCHAR) || '/orig' AS fetch_uri,
       'http://ex.com/' || CAST(i AS VARCHAR) || '/orig'
           AS canonical_uri,
       dg AS payload_digest,
       CAST(NULL AS VARCHAR) AS refers_to,
       FALSE AS is_duplicate
FROM p
UNION ALL
SELECT media_id,
       'http://mirror' || CAST(m.n AS VARCHAR) || '.com/'
           || CAST(i AS VARCHAR) AS fetch_uri,
       'http://ex.com/' || CAST(i AS VARCHAR) || '/orig',
       dg,
       '<urn:uuid:' || CAST(i AS VARCHAR) || '-1>',
       TRUE
FROM p CROSS JOIN (VALUES (1), (2)) AS m(n)
ORDER BY media_id, fetch_uri
""",
    tags=("text", "ingest", "warc", "dedup"),
)
def warc_revisit_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC revisit records as a dedup signal (r13): the crawl's OWN
    duplicate markers (WARC-Payload-Digest / WARC-Refers-To, the
    Common Crawl identical-payload-digest profile) join revisit
    fetches back to their originals — the standard contract for
    deduplicating a crawl without hashing any payload bytes. At
    100 TB this is a plain shuffle hash join on the digest column;
    nothing touches body text."""
    import hashlib

    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 8)
    def build(i):
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        body = pattern[:40].encode()
        dg = "md5:" + hashlib.md5(body).hexdigest()
        orig_uri = f"http://ex.com/{i}/orig"
        recs = [
            {"type": "response", "record_id": f"<urn:uuid:{i}-1>",
             "target_uri": orig_uri, "content": body,
             "http": {"status": 200, "content_type": "text/plain"},
             "warc_headers": {"WARC-Payload-Digest": dg}},
        ]
        for n in (1, 2):
            recs.append({
                "type": "revisit",
                "record_id": f"<urn:uuid:{i}-{n + 1}>",
                "target_uri": f"http://mirror{n}.com/{i}",
                "content": b"",
                "warc_headers": {
                    "WARC-Payload-Digest": dg,
                    "WARC-Refers-To": f"<urn:uuid:{i}-1>",
                    "WARC-Refers-To-Target-URI": orig_uri,
                    "WARC-Profile": "http://netpreserve.org/warc/1.1/"
                                    "revisit/identical-payload-digest",
                }})
        return (encode_warc(
            recs, gzip_members=bool(i % 2)))
    media = fixture_media(d, build)
    df = read_warc(media)
    resp = (df.filter(F.col("warc_type") == "response")
            .select("media_id", "payload_digest",
                    F.col("target_uri").alias("canonical_uri")))
    rev = (df.filter(F.col("warc_type") == "revisit")
           .select("media_id",
                   F.col("target_uri").alias("fetch_uri"),
                   "payload_digest", "refers_to"))
    dup = (rev.join(resp, ["media_id", "payload_digest"])
           .select("media_id", "fetch_uri", "canonical_uri",
                   "payload_digest", "refers_to",
                   F.lit(True).alias("is_duplicate")))
    orig = resp.select(
        "media_id", F.col("canonical_uri").alias("fetch_uri"),
        "canonical_uri", "payload_digest",
        F.lit(None).cast("string").alias("refers_to"),
        F.lit(False).alias("is_duplicate"))
    return dup.unionByName(orig).orderBy("media_id", "fetch_uri")


@register(
    "warc_unresolved_coding",
    # Two responses per doc: a normal gzip one, and one declaring the
    # UNKNOWN coding x-custom over raw ASCII (the reversed pattern
    # slice, so "not decoded" is visible in the value). The r11
    # ADVICE containment contract, pinned in the driver's correctness
    # window: the unknown coding must NOT kill the payload — the raw
    # entity bytes flow with http_encoding = 'unresolved:x-custom'.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 24
)
SELECT media_id, 0::BIGINT AS record_idx, 'gzip' AS http_encoding,
       substr(pattern, 1, 40) AS body_text
FROM p
UNION ALL
SELECT media_id, 1::BIGINT, 'unresolved:x-custom',
       reverse(substr(pattern, 41, 40))
FROM p
ORDER BY media_id, record_idx
""",
    tags=("text", "ingest", "warc", "errors"),
)
def warc_unresolved_coding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-response coding containment
    (sources/warc.py::_split_http strict=False): a response declaring
    a coding the engine does not implement flows through as RAW
    entity bytes with the declared list surfaced as
    ``unresolved:<coding>`` — at 100 TB one exotic response must cost
    one marked row, not a segment's task. The sibling gzip record in
    the same payload proves decoding still happens where it can."""
    import hashlib

    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 24)
    def build_many(i):
        rows = []
        pat = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        good = {
            "type": "response", "record_id": f"<urn:uuid:{i}-0>",
            "target_uri": f"http://ex.com/{i}/0", "content": pat[0:40],
            "http": {"status": 200, "content_type": "text/plain",
                     "content_encoding": "gzip"},
        }
        raw_body = pat[40:80][::-1]
        envelope = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                    b"Content-Encoding: x-custom\r\n\r\n" + raw_body)
        exotic = {
            "type": "response", "record_id": f"<urn:uuid:{i}-1>",
            "target_uri": f"http://ex.com/{i}/1", "content": envelope,
            "content_type": "application/http; msgtype=response",
        }
        rows.append(
            (i, bytearray(encode_warc([good, exotic],
                                      gzip_members=bool(i % 2)))))
        return rows
    media = fixture_media_multi(d, build_many)
    return (
        read_warc(media)
        .select("media_id", "record_idx", "http_encoding", "body_text")
        .orderBy("media_id", "record_idx")
    )


@register(
    "mm_pdf_indexed_images",
    # Four images per doc over the 96-char md5 pattern (ASCII hex
    # chars, so palette bytes stay printable): a 4-bit INDEXED
    # XObject (palette = pattern[0:48] as 16 RGB entries, index i =
    # ord(char_i) % 16 — expanded pixels are palette triplets), the
    # SAME image inline (BI/ID/EI with [/I /RGB hival <...>] and
    # unfiltered sub-byte rows), a 2-bit DeviceGray XObject with the
    # exact 85x expansion, and an /ImageMask stencil whose /Decode
    # sense flips by doc parity. Digests use the hex-rendered
    # contract (mask/gray pixels are non-ASCII bytes). Pre-r12 all
    # four raised by name.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id % 2 AS rev,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 8
),
ex AS (
  SELECT media_id, rev, pattern,
         lower(hex(array_to_string(list_transform(range(1, 97),
             i -> substr(pattern,
                  ((ord(substr(pattern, CAST(i AS INTEGER), 1)) % 16)
                   * 3) + 1, 3)), ''))) AS indexed_hex,
         array_to_string(list_transform(range(1, 97),
             i -> CASE ord(substr(pattern, CAST(i AS INTEGER), 1)) % 4
                  WHEN 0 THEN '00' WHEN 1 THEN '55'
                  WHEN 2 THEN 'aa' ELSE 'ff' END), '') AS gray_hex,
         array_to_string(list_transform(range(1, 97),
             i -> CASE WHEN (ord(substr(pattern, CAST(i AS INTEGER), 1))
                             % 2 = 1) != (rev = 1)
                  THEN 'ff' ELSE '00' END), '') AS mask_hex
  FROM p
)
SELECT media_id, 0::BIGINT AS page_idx, 'BI0' AS img_name,
       12::BIGINT AS width, 8::BIGINT AS height,
       3::BIGINT AS n_components, NULL AS img_filter,
       md5(indexed_hex) AS pixel_md5
FROM ex
UNION ALL
SELECT media_id, 0::BIGINT, 'Im0_0', 12::BIGINT, 8::BIGINT, 3::BIGINT,
       'FlateDecode', md5(indexed_hex) FROM ex
UNION ALL
SELECT media_id, 0::BIGINT, 'Im0_1', 12::BIGINT, 8::BIGINT, 1::BIGINT,
       'FlateDecode', md5(gray_hex) FROM ex
UNION ALL
SELECT media_id, 0::BIGINT, 'Im0_2', 12::BIGINT, 8::BIGINT, 1::BIGINT,
       'FlateDecode', md5(mask_hex) FROM ex
ORDER BY media_id, img_name
""",
    tags=("multimodal", "pdf", "decode", "codec", "ingest"),
)
def mm_pdf_indexed_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 PDF image tail (operators/pdf.py::_decode_image_data):
    Indexed palettes (§8.6.6.3 — stream lookups, clamped indices),
    sub-8-bit sample rows with the §8.9.5.2 MSB-first row-padded
    unpacking (borrowing the TIFF bit logic's semantics), and
    /ImageMask stencils emitted as 0/255 gray honoring /Decode [1 0]
    — palette-indexed and 1-bit images are common in real scanned
    PDFs outside CCITT/JBIG2. XObject and inline forms both decode;
    xref layout and RC4 encryption cycle by doc parity."""
    import hashlib

    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 8)
    def build(i):
        pat = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        palette = pat[0:48]
        idx = bytes(b % 16 for b in pat)
        gray = bytes(b % 4 for b in pat)
        bits = bytes(b % 2 for b in pat)
        pdf = encode_pdf(
            [[f"images {i}"]], title=f"Indexed {i}",
            xref_stream=bool(i % 2),
            encrypt="rc4-128" if i % 3 == 0 else None,
            images=[[
                ("indexed", 12, 8, 3, (4, palette, idx)),
                ("gray-sub", 12, 8, 1, (2, gray)),
                ("mask", 12, 8, 1, (bits, bool(i % 2))),
                ("inline-indexed", 12, 8, 3, (4, palette, idx)),
            ]],
        )
        return (pdf)
    media = fixture_media(d, build)
    return (
        pdf_images(media, digest="hex")
        .select("media_id", "page_idx", "img_name", "width", "height",
                "n_components", "img_filter", "pixel_md5")
        .orderBy("media_id", "img_name")
    )


@register(
    "mm_decode_tiff",
    # payload = a REAL baseline TIFF (operators/tiff.py) of the doc's
    # 96-byte md5 pattern as 8x4 RGB, compression cycling
    # none/LZW/PackBits with doc_id % 3, the horizontal-differencing
    # predictor on odd ids, byte order II/MM by parity, and 2-row
    # strips — decode is lossless, so the oracle is md5(pattern),
    # identical in shape to mm_decode_png.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 19
)
SELECT media_id,
       'tiff' AS fmt,
       CAST(8 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT)
           AS pixel_sum,
       md5(pattern) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "tiff"),
)
def mm_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF decode under the oracle gate — the scanned-document /
    scientific format, with its own LZW dialect (MSB-first, EARLY
    code-width change; distinct from GIF's LSB-first variant),
    PackBits, the horizontal-differencing predictor, and multi-strip
    assembly, all exercised across the spec subset and decoded
    distributed in the same mapInPandas slot as the other codecs."""
    import hashlib

    from dolphinbeat_spark.operators.tiff import encode_tiff

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 19)
    comps = (1, 5, 32773)
    def build_many(i):
        rows = []
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        rows.append((i, bytearray(encode_tiff(
            8, 4, pattern, spp=3, compression=comps[i % 3],
            # Predictor is LZW-only (TIFF 6.0 §14, r12 libtiff
            # conformance): pair it with compression 5 alone
            predictor=2 if comps[i % 3] == 5 else 1, rows_per_strip=2,
            byte_order="<" if i % 2 == 0 else ">",
        ))))
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_decode_tiff_ccitt",
    # payload = a REAL CCITT-compressed bilevel TIFF (ITU-T T.4/T.6,
    # operators/ccitt.py — r11): the doc's 96-char md5 pattern as an
    # 8x12 fax page, INK where the hex digit is a letter (a-f), with
    # compression cycling MH / T.4 (2D + byte-aligned EOLs by parity)
    # / T.6 by doc_id % 3, 5-row strips (the coder restarts per
    # strip), byte order II/MM and photometric WhiteIsZero/MinIsBlack
    # by parity (both must yield the identical gray rendering). The
    # decoded 0/255 gray bytes are pinned via the hex-digest contract
    # (digest='hex'); the oracle rebuilds the hex rendering with a
    # translate + replace over the same pattern. Pre-r11 every one of
    # these raised 'TIFF compression 2/3/4 not supported'.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 5
)
SELECT media_id,
       'tiff' AS fmt,
       CAST(8 AS BIGINT) AS width,
       CAST(12 AS BIGINT) AS height,
       CAST(255 * length(regexp_replace(pattern, '[a-f]', '', 'g'))
            AS BIGINT) AS pixel_sum,
       md5(replace(replace(
             translate(pattern, '0123456789abcdef', 'wwwwwwwwwwBBBBBB'),
             'w', 'ff'), 'B', '00')) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "tiff", "ccitt"),
)
def mm_decode_tiff_ccitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCITT Group 3/4 fax decode under the oracle gate (r11): the
    from-scratch T.4/T.6 codec (published run-length code tables, MH
    rows, EOL-framed G3 1D/2D with tag bits, G4 MMR against the
    reference line) behind TIFF Compression 2/3/4 — the
    scanned-document / fax archive slice becomes decodable in the
    same mapInPandas slot as every other codec."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.tiff import encode_tiff_ccitt

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 5)
    comps = (2, 3, 4)
    def build_many(i):
        rows = []
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        ink = np.array([1 if c in "abcdef" else 0 for c in pattern],
                       np.uint8).reshape(12, 8)
        rows.append((i, bytearray(encode_tiff_ccitt(
            ink, compression=comps[i % 3], t4_2d=bool(i % 2),
            byte_align=i % 4 == 1, rows_per_strip=5,
            byte_order="<" if i % 2 == 0 else ">",
            photometric=i % 2,
        ))))
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media, digest="hex").orderBy("media_id")


@register(
    "mm_decode_tiff_jpeg",
    # payload = a REAL JPEG-in-TIFF (Compression 7, TechNote 2 — the
    # scanned/archival layout, r13): an 8x12 gray page of three
    # 4-row FLAT strips, each its own JPEG through the in-repo
    # encoder, abbreviated against the shared JPEGTables tag on odd
    # docs. Strip values come from the doc md5's first three hex
    # digits as v = 16*digit + 8 — EVEN values, so the flat DC
    # coefficient quantizes exactly (Annex K DC step 16 divides
    # (v-128)*8) and the lossy codec roundtrips these bytes
    # bit-exactly, giving the oracle a closed form over decoded
    # pixels. Byte order cycles II/MM. Pre-r13 these raised 'TIFF
    # compression 7 not supported'. libtiff agreement is pinned in
    # tools/tiff_conformance.py (within ±1 of libjpeg's IDCT).
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, md5(CAST(doc_id AS VARCHAR)) AS hx
  FROM documents WHERE doc_id % 25 = 0
), v AS (
  SELECT media_id,
         16*(strpos('0123456789abcdef', substr(hx, 1, 1))-1)+8 AS v0,
         16*(strpos('0123456789abcdef', substr(hx, 2, 1))-1)+8 AS v1,
         16*(strpos('0123456789abcdef', substr(hx, 3, 1))-1)+8 AS v2
  FROM p
)
SELECT media_id, 'tiff' AS fmt,
       CAST(8 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
       CAST(32 * (v0 + v1 + v2) AS BIGINT) AS pixel_sum,
       md5(repeat(printf('%02x', v0), 32)
           || repeat(printf('%02x', v1), 32)
           || repeat(printf('%02x', v2), 32)) AS pixel_md5
FROM v
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "tiff", "jpeg"),
)
def mm_decode_tiff_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG-in-TIFF (Compression 7) decode under the oracle gate
    (r13): strip/tile payloads route through the in-repo JPEG
    decoder with the JPEGTables abbreviated-stream layout honored —
    the same near-zero-cost reuse as r11's DCTDecode-in-PDF, closing
    the scanned/archival TIFF share."""
    return _mm_decode_tiff_jpeg_impl(spark, sf_dir)


@register(
    "mm_tiff_ojpeg",
    # payload = an OLD-STYLE JPEG TIFF (Compression 6, TIFF 6.0 §22 —
    # withdrawn by TechNote 2 yet alive in scanner/early-digicam
    # output; r15 verdict task #8): a 16x8 flat-gray page, value
    # v = 16*digit + 8 (the DC step 16 divides (v-128)*8, so the
    # lossy codec roundtrips EXACTLY — the mm_decode_tiff_jpeg closed
    # form). Docs cycle BOTH wild layouts: even = the embedded
    # interchange stream (JPEGInterchangeFormat 513/514), odd = the
    # raw-tables form (JPEGProc 512, JPEGQ/DC/ACTables 519/520/521
    # pointing at bare table bytes, strips of bare entropy data that
    # the decoder rebuilds into standalone JPEGs). Byte order cycles
    # II/MM by doc_id % 4. Pre-r15 these raised 'old-style JPEG
    # compression 6 not supported'.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         16*(strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))-1)+8 AS v
  FROM documents WHERE doc_id % 31 = 21
)
SELECT media_id, 'tiff' AS fmt,
       CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       CAST(128 * v AS BIGINT) AS pixel_sum,
       md5(repeat(printf('%02x', v), 128)) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "tiff", "jpeg", "ojpeg"),
)
def mm_tiff_ojpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Old-style JPEG TIFF (Compression 6) decode under the oracle
    gate (r15): both §22 layouts — the embedded interchange stream
    and the raw-table tags with bare entropy strips — through the
    shared decode_media slot and the in-repo JPEG decoder."""
    import hashlib

    from dolphinbeat_spark.operators.tiff import encode_tiff_ojpeg

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 31 == 21)

    def build(i):
        hx = hashlib.md5(str(i).encode()).hexdigest()
        v = 16 * int(hx[0], 16) + 8
        return encode_tiff_ojpeg(
            16, 8, bytes([v]) * 128, gray=True,
            layout="tables" if i % 2 else "interchange",
            byte_order=">" if i % 4 >= 2 else "<")

    media = fixture_media(d, build)
    return M.decode_media(media, digest="hex").orderBy("media_id")


def _mm_decode_tiff_jpeg_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.tiff import encode_tiff_jpeg

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    hexd = "0123456789abcdef"
    def build_many(i):
        rows = []
        hx = hashlib.md5(str(i).encode()).hexdigest()
        vs = [16 * hexd.index(c) + 8 for c in hx[:3]]
        px = np.concatenate(
            [np.full((4, 8, 1), v, np.uint8) for v in vs])
        rows.append((i, bytearray(encode_tiff_jpeg(
            8, 12, px.tobytes(), gray=True, rows_per_strip=4,
            split_tables=bool(i % 2),
            byte_order="<" if i % 2 == 0 else ">",
        ))))
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media, digest="hex").orderBy("media_id")


@register(
    "mm_decode_tiff_tiled",
    # payload = a REAL TILED TIFF (TIFF 6.0 §15) of the doc's 96-byte
    # md5 pattern as 8x4 RGB with 3x3 tiles — 3 across x 2 down with
    # BOTH edge dimensions cropped — planar configuration 2 on odd
    # doc_ids (per-plane tiles, plane-major), compression cycling
    # none/LZW/PackBits, predictor on odd ids (differencing restarts
    # per TILE row, not per image row). Decode is lossless, so the
    # oracle is md5(pattern), same shape as mm_decode_tiff.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 21
)
SELECT media_id,
       'tiff' AS fmt,
       CAST(8 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT)
           AS pixel_sum,
       md5(pattern) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "tiff", "tiled"),
)
def mm_decode_tiff_tiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiled-TIFF decode under the oracle gate — the organization
    satellite/scan imagery actually ships (TileWidth/TileLength/
    TileOffsets walk, zero-padded edge tiles cropped, per-tile
    predictor restart) plus planar configuration 2 (per-plane
    segments, plane-major) — closing the r9 NotImplementedError
    boundary at operators/tiff.py."""
    import hashlib

    from dolphinbeat_spark.operators.tiff import encode_tiff

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 21)
    comps = (1, 5, 32773)
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        return (encode_tiff(
            8, 4, pattern, spp=3, compression=comps[i % 3],
            predictor=2 if comps[i % 3] == 5 else 1, tile=(3, 3),
            planar=2 if i % 2 else 1,
            byte_order="<" if i % 2 == 0 else ">",
        ))
    media = fixture_media(d, build)
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_pdf_extract_text",
    # payload = a REAL two-page PDF per doc (operators/pdf.py): lines
    # derived from the doc's first 10 tokens plus parenthesized /
    # backslashed literals (escape coverage), /Info /Title set. The
    # layout cycles per doc_id: classic xref table vs xref stream +
    # object stream (with a real Up predictor), Tj vs TJ arrays with
    # a -250 word-gap kern. The oracle rebuilds every page's text in
    # closed form from the same token slices.
    oracle=r"""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id % 25 = 6
), pg(page_idx) AS (VALUES (0), (1))
SELECT media_id, CAST(page_idx AS BIGINT) AS page_idx,
       2::BIGINT AS n_pages,
       'Doc ' || i || ' & Co' AS title,
       CASE page_idx
         WHEN 0 THEN 'Doc ' || i || ' (report)' || chr(10)
                     || array_to_string(list_slice(toks, 1, 5), ' ')
         ELSE array_to_string(list_slice(toks, 6, 10), ' ') || chr(10)
                     || 'end \ of doc ' || i
       END AS page_text
FROM p CROSS JOIN pg
ORDER BY media_id, page_idx
""",
    tags=("multimodal", "decode", "pdf", "text", "ingest"),
)
def mm_pdf_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction under the oracle gate (operators/pdf.py —
    ISO 32000-1 subset: COS syntax, classic + stream xref, object
    streams, FlateDecode with PNG predictors, page tree, BT/ET + Tj/
    TJ/Td/T* with the word-gap kern rule, Latin-1 standard-font
    decode). The PDFs are built driver-side over a bounded doc subset
    (encode-side fixture glue, as in the sibling mm_decode_* specs);
    the extraction under test runs distributed via Arrow
    mapInPandas."""
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 6)
    def build(did, text):
        toks = text.strip().split()
        pages = [
            [f"Doc {did} (report)", " ".join(toks[0:5])],
            [" ".join(toks[5:10]), f"end \\ of doc {did}"],
        ]
        pdf = encode_pdf(
            pages, title=f"Doc {did} & Co", flate=True,
            xref_stream=bool(did % 2), use_tj_array=did % 3 == 0,
        )
        return (pdf)
    media = fixture_media(d, build, with_text=True)
    return pdf_extract(media).orderBy("media_id", "page_idx")


@register(
    "jsonl_dict_shards",
    # payload = the COMMITTED dictionary-compressed JSONL shards
    # (tests/fixtures/zstd/dict/shard*.jsonl.zst, reference-CLI
    # -9 -D trained.dict): the layout small-document corpora actually
    # ship in — a shared --train'ed dictionary slashes per-shard
    # overhead, and a reader without dictionary support cannot open
    # the corpus at all (r9 boundary, closed in r10). JSON field
    # extraction stays JVM-side (get_json_object); the oracle pins
    # every extracted field.
    oracle="""
SELECT *
FROM (VALUES
  (0::BIGINT, 0::BIGINT, 0::BIGINT, 'charlie bravo foxtrot alpha echo charlie alpha echo'),
  (0::BIGINT, 1::BIGINT, 1::BIGINT, 'alpha delta alpha alpha delta golf alpha bravo'),
  (0::BIGINT, 2::BIGINT, 2::BIGINT, 'foxtrot hotel echo delta hotel alpha golf charlie'),
  (0::BIGINT, 3::BIGINT, 3::BIGINT, 'bravo alpha charlie golf bravo echo foxtrot charlie'),
  (1::BIGINT, 0::BIGINT, 4::BIGINT, 'echo alpha alpha bravo foxtrot delta charlie echo'),
  (1::BIGINT, 1::BIGINT, 5::BIGINT, 'delta charlie golf foxtrot bravo echo echo hotel'),
  (1::BIGINT, 2::BIGINT, 6::BIGINT, 'foxtrot charlie hotel alpha delta golf bravo delta'),
  (1::BIGINT, 3::BIGINT, 7::BIGINT, 'alpha foxtrot golf echo hotel charlie foxtrot echo'),
  (2::BIGINT, 0::BIGINT, 8::BIGINT, 'echo delta golf hotel delta foxtrot alpha foxtrot'),
  (2::BIGINT, 1::BIGINT, 9::BIGINT, 'foxtrot hotel golf charlie delta foxtrot alpha delta'),
  (2::BIGINT, 2::BIGINT, 10::BIGINT, 'bravo alpha alpha golf bravo bravo delta golf'),
  (2::BIGINT, 3::BIGINT, 11::BIGINT, 'alpha delta echo hotel golf golf charlie delta')
) AS t(media_id, line_idx, doc, payload)
ORDER BY media_id, line_idx
""",
    tags=("text", "ingest", "jsonl", "zstd", "dictionary"),
)
def jsonl_dict_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-compressed JSONL shard ingestion under the oracle
    gate: read_jsonl(zstd_dict=…) parses the --train'ed dictionary
    ONCE driver-side and every shard decodes through the from-scratch
    RFC 8878 §5 dictionary path (entropy seeding, repeat offsets,
    window prefix). Reads committed fixtures, independent of
    sf_dir."""
    from pathlib import Path

    from dolphinbeat_spark.sources.jsonl import read_jsonl

    ddir = (Path(__file__).resolve().parents[2]
            / "tests" / "fixtures" / "zstd" / "dict")
    rows = [
        (i, bytearray((ddir / f"shard{i}.jsonl.zst").read_bytes()))
        for i in range(3)
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    lines = read_jsonl(media, zstd_dict=(ddir / "trained.dict").read_bytes())
    return lines.select(
        "media_id", "line_idx",
        F.get_json_object("line", "$.doc").cast("bigint").alias("doc"),
        F.get_json_object("line", "$.payload").alias("payload"),
    ).orderBy("media_id", "line_idx")


@register(
    "pipeline_charset_html_extract",
    # charset decode -> HTML extraction end-to-end over the committed
    # legacy-encoding fixture: the Shift_JIS and GBK pages must come
    # out as clean CJK text (tags stripped), and the cp1252/BOM/
    # fallback bodies (tagless) pass through the extractor verbatim —
    # proving the U+FFFD-free decode actually FEEDS the text layer,
    # not just a column.
    oracle="""
SELECT *
FROM (VALUES
  (0::BIGINT, 'windows-1252', 'Café naïve — résumé €9'),
  (1::BIGINT, 'shift_jis', 'こんにちは世界。日本語のページ。'),
  (2::BIGINT, 'utf-8', 'BOM wins: héllo résumé'),
  (3::BIGINT, 'windows-1252', 'déjà vu, 10€ œuvre'),
  (4::BIGINT, 'gbk', '你好，世界。中文页面。'),
  (5::BIGINT, 'iso-2022-jp', '日本語テキストです。ISO-2022-JP 版。'),
  (6::BIGINT, 'euc-jp', 'こんにちは、EUC-JP のページです。'),
  (7::BIGINT, 'euc-kr', '안녕하세요 세계. 한국어 페이지.'),
  (8::BIGINT, 'big5', '繁體中文網頁測試。')
) AS t(doc_id, charset, text)
ORDER BY doc_id
""",
    tags=("text", "html", "charset", "pipeline", "ingest"),
)
def pipeline_charset_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset-aware decode feeding HTML extraction (the two r10
    bridge stages composed): read_warc's WHATWG-decoded bodies →
    html_extract → clean text, over the committed cp1252/Shift_JIS/
    BOM/fallback/GBK fixture. Independent of sf_dir."""
    from pathlib import Path

    from dolphinbeat_spark.operators.html import html_extract
    from dolphinbeat_spark.sources.warc import read_warc

    raw = (
        Path(__file__).resolve().parents[2]
        / "tests" / "fixtures" / "charset.warc"
    ).read_bytes()
    media = spark.createDataFrame(
        [(0, bytearray(raw))], "media_id long, payload binary"
    )
    recs = read_warc(media).select(
        "record_idx", "charset", "body_text"
    )
    ext = html_extract(recs, id_col="record_idx", html_col="body_text")
    return (
        ext.join(recs.select("record_idx", "charset"),
                 ext.doc_id == F.col("record_idx"))
        .select("doc_id", "charset", "text")
        .orderBy("doc_id")
    )


@register(
    "mm_image_dhash_neardup",
    # IMAGE near-duplicate detection (r13, operators/imagehash.py):
    # per doc, TWO images — a 45x40 PNG whose 9x8 grid of 5px blocks
    # carries gray 16*d+8 from the doc md5's first 72 hex digits, and
    # a BMP re-encode of the pattern with ONE digit flipped (char 5
    # -> 'f'/'0'), i.e. a near-dup within 2 dHash bits. The pipeline
    # decodes via the shared codec sniff, computes the 64-bit
    # difference hash, and joins near-dups through the banded Hamming
    # LSH (4 x 16-bit bands -> candidates, exact bit_count filter).
    # Block sizes divide exactly, so the area-mean grid IS the digit
    # grid and the oracle rebuilds both hashes in closed form
    # (comparisons are monotone in the hex digit), then reproduces
    # the SAME banded-candidate contract over all pairs.
    oracle="""
WITH p AS (
  SELECT doc_id, repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 17
), imgs AS (
  SELECT doc_id, 2 * doc_id AS media_id, pattern FROM p
  UNION ALL
  SELECT doc_id, 2 * doc_id + 1,
         substr(pattern, 1, 4)
           || CASE WHEN substr(pattern, 5, 1) = 'f' THEN '0'
                   ELSE 'f' END
           || substr(pattern, 6)
  FROM p
), bits AS (
  SELECT media_id, r, c,
         CASE WHEN strpos('0123456789abcdef',
                          substr(pattern, r * 9 + c + 2, 1))
                 > strpos('0123456789abcdef',
                          substr(pattern, r * 9 + c + 1, 1))
              THEN 1 ELSE 0 END AS bit
  FROM imgs, generate_series(0, 7) g1(r), generate_series(0, 7) g2(c)
), hashes AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN bit = 0 THEN 0
                       WHEN r = 0 AND c = 0
                         THEN -9223372036854775808
                       ELSE (CAST(1 AS BIGINT)
                             << (63 - (r * 8 + c))) END)
              AS BIGINT) AS dhash
  FROM bits GROUP BY media_id
)
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT)
           AS hamming_dist
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE (((a.dhash >> 0) & 65535) = ((b.dhash >> 0) & 65535)
    OR ((a.dhash >> 16) & 65535) = ((b.dhash >> 16) & 65535)
    OR ((a.dhash >> 32) & 65535) = ((b.dhash >> 32) & 65535)
    OR ((a.dhash >> 48) & 65535) = ((b.dhash >> 48) & 65535))
  AND bit_count(xor(a.dhash, b.dhash)) <= 4
ORDER BY media_a, media_b
""",
    tags=("multimodal", "dedup", "image", "lsh", "codec"),
)
def mm_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup under the oracle gate (r13): the
    crawl's image share dedups by 64-bit difference hash + banded
    Hamming LSH — decode and hash share one Arrow pass, candidates
    come from a shuffle join on 16-bit band values (never
    all-pairs), and the exact bit_count filter runs JVM-side. PNG
    and BMP re-encodes of the same pixels collide exactly; the
    planted one-digit variants sit within 2 bits."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.imagehash import (
        dhash_near_dup_pairs, image_dhash,
    )
    from dolphinbeat_spark.operators.multimodal import (
        encode_bmp, encode_png,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 17)
    hexd = "0123456789abcdef"
    def build_many(i):
        rows = []
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        variant = (pattern[:4]
                   + ("0" if pattern[4] == "f" else "f")
                   + pattern[5:])
        for mid, pat, enc in ((2 * i, pattern, encode_png),
                              (2 * i + 1, variant, encode_bmp)):
            vals = np.array([16 * hexd.index(ch) + 8
                             for ch in pat[:72]],
                            np.uint8).reshape(8, 9)
            img = np.repeat(np.repeat(vals, 5, 0), 5, 1)
            rgb = np.dstack([img] * 3).tobytes()
            rows.append((mid, bytearray(enc(45, 40, rgb))))
        return rows
    media = fixture_media_multi(d, build_many)
    pairs = dhash_near_dup_pairs(image_dhash(media), max_dist=4)
    return (pairs.select("media_a", "media_b",
                         F.col("hamming_dist").cast("long")
                         .alias("hamming_dist"))
            .orderBy("media_a", "media_b"))


@register(
    "mm_image_dedup_clusters",
    # The FULL image-dedup pipeline (r13): perceptual hashes ->
    # banded Hamming pairs -> connected components -> canonical
    # keeper per cluster. Per doc, THREE block-grid images: the base
    # pattern, a one-digit variant (char 5), and a two-digit variant
    # (chars 5+13) — a chain whose pairwise distances are <= 2/2/4,
    # so all three land in one cluster whose canonical id is the
    # smallest media_id. Components run via the large-star/small-star
    # operator (operators/dedup.py — O(log^2) shuffle rounds at
    # 100 TB); the oracle rebuilds the hashes and banded pairs in
    # closed form and takes the transitive closure with a recursive
    # CTE.
    oracle="""
WITH RECURSIVE p AS (
  SELECT doc_id, repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 23
), imgs AS (
  SELECT doc_id, 10 * doc_id AS media_id, pattern FROM p
  UNION ALL
  SELECT doc_id, 10 * doc_id + 1,
         substr(pattern, 1, 4)
           || CASE WHEN substr(pattern, 5, 1) = 'f' THEN '0'
                   ELSE 'f' END || substr(pattern, 6)
  FROM p
  UNION ALL
  SELECT doc_id, 10 * doc_id + 2,
         substr(pattern, 1, 4)
           || CASE WHEN substr(pattern, 5, 1) = 'f' THEN '0'
                   ELSE 'f' END || substr(pattern, 6, 7)
           || CASE WHEN substr(pattern, 13, 1) = 'f' THEN '0'
                   ELSE 'f' END || substr(pattern, 14)
  FROM p
), bits AS (
  SELECT media_id, r, c,
         CASE WHEN strpos('0123456789abcdef',
                          substr(pattern, r * 9 + c + 2, 1))
                 > strpos('0123456789abcdef',
                          substr(pattern, r * 9 + c + 1, 1))
              THEN 1 ELSE 0 END AS bit
  FROM imgs, generate_series(0, 7) g1(r), generate_series(0, 7) g2(c)
), hashes AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN bit = 0 THEN 0
                       WHEN r = 0 AND c = 0
                         THEN -9223372036854775808
                       ELSE (CAST(1 AS BIGINT)
                             << (63 - (r * 8 + c))) END)
              AS BIGINT) AS dhash
  FROM bits GROUP BY media_id
), pairs AS (
  SELECT a.media_id AS ma, b.media_id AS mb
  FROM hashes a JOIN hashes b ON a.media_id < b.media_id
  WHERE (((a.dhash >> 0) & 65535) = ((b.dhash >> 0) & 65535)
      OR ((a.dhash >> 16) & 65535) = ((b.dhash >> 16) & 65535)
      OR ((a.dhash >> 32) & 65535) = ((b.dhash >> 32) & 65535)
      OR ((a.dhash >> 48) & 65535) = ((b.dhash >> 48) & 65535))
    AND bit_count(xor(a.dhash, b.dhash)) <= 4
), edges AS (
  SELECT ma AS src, mb AS dst FROM pairs
  UNION SELECT mb, ma FROM pairs
), reach AS (
  SELECT src AS node, dst AS other FROM edges
  UNION
  SELECT e.src, r.other FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node,
       least(node, min(other)) AS cluster_id,
       node = least(node, min(other)) AS is_canonical
FROM reach GROUP BY node
ORDER BY node
""",
    tags=("multimodal", "dedup", "image", "lsh", "clusters", "codec"),
)
def mm_image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end image dedup under the oracle gate (r13): decode ->
    dHash -> banded Hamming pairs -> large-star/small-star connected
    components -> canonical keeper per duplicate cluster. The whole
    chain is the contract a 100 TB crawl runs to keep ONE copy of
    each recurring image."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.dedup import (
        connected_components_star,
    )
    from dolphinbeat_spark.operators.imagehash import (
        dhash_near_dup_pairs, image_dhash,
    )
    from dolphinbeat_spark.operators.multimodal import encode_png

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 23)
    hexd = "0123456789abcdef"

    def flip(p: str, pos: int) -> str:
        return (p[:pos] + ("0" if p[pos] == "f" else "f")
                + p[pos + 1:])

    def build_many(i):
        rows = []
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        variants = [pattern, flip(pattern, 4),
                    flip(flip(pattern, 4), 12)]
        for k, pat in enumerate(variants):
            vals = np.array([16 * hexd.index(ch) + 8
                             for ch in pat[:72]],
                            np.uint8).reshape(8, 9)
            img = np.repeat(np.repeat(vals, 5, 0), 5, 1)
            rows.append((10 * i + k, bytearray(
                encode_png(45, 40, np.dstack([img] * 3).tobytes()))))
        return rows
    media = fixture_media_multi(d, build_many)
    pairs = dhash_near_dup_pairs(image_dhash(media), max_dist=4)
    cc = connected_components_star(pairs, id_a="media_a",
                                   id_b="media_b")
    return (cc.select(F.col("node"),
                      F.col("cluster_id"),
                      (F.col("node") == F.col("cluster_id"))
                      .alias("is_canonical"))
            .orderBy("node"))


@register(
    "mm_audio_fp_neardup",
    # AUDIO near-duplicate detection (r13, operators/audiofp.py —
    # the sibling of mm_image_dhash_neardup): per doc, a 16-bit mono
    # WAV whose 65 windows of 80 samples hold constant amplitude
    # 100*(digit+1) from the doc md5's first 65 hex digits, and a
    # FLAC re-encode at 2x VOLUME with ONE digit flipped (char 3 ->
    # 'f'/'0'): the loudness-contour fingerprint is volume- and
    # container-invariant, so the planted pair sits within 2 Hamming
    # bits and the SAME banded-LSH join as the image path finds it.
    # Window comparisons are monotone in the digit, so the oracle
    # rebuilds both fingerprints in closed form and reproduces the
    # band-candidate contract.
    oracle="""
WITH p AS (
  SELECT doc_id, repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 19
), clips AS (
  SELECT doc_id, 2 * doc_id AS media_id, pattern FROM p
  UNION ALL
  SELECT doc_id, 2 * doc_id + 1,
         substr(pattern, 1, 2)
           || CASE WHEN substr(pattern, 3, 1) = 'f' THEN '0'
                   ELSE 'f' END
           || substr(pattern, 4)
  FROM p
), bits AS (
  SELECT media_id, k,
         CASE WHEN strpos('0123456789abcdef',
                          substr(pattern, k + 2, 1))
                 > strpos('0123456789abcdef',
                          substr(pattern, k + 1, 1))
              THEN 1 ELSE 0 END AS bit
  FROM clips, generate_series(0, 63) g(k)
), fps AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN bit = 0 THEN 0
                       WHEN k = 0 THEN -9223372036854775808
                       ELSE (CAST(1 AS BIGINT) << (63 - k)) END)
              AS BIGINT) AS fp
  FROM bits GROUP BY media_id
)
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming_dist
FROM fps a JOIN fps b ON a.media_id < b.media_id
WHERE (((a.fp >> 0) & 65535) = ((b.fp >> 0) & 65535)
    OR ((a.fp >> 16) & 65535) = ((b.fp >> 16) & 65535)
    OR ((a.fp >> 32) & 65535) = ((b.fp >> 32) & 65535)
    OR ((a.fp >> 48) & 65535) = ((b.fp >> 48) & 65535))
  AND bit_count(xor(a.fp, b.fp)) <= 4
ORDER BY media_a, media_b
""",
    tags=("multimodal", "dedup", "audio", "lsh", "codec"),
)
def mm_audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup dedup under the oracle gate (r13): the
    loudness-contour fingerprint over decoded WAV/FLAC samples feeds
    the SAME hash-agnostic banded Hamming join as the image path —
    one 8-byte value per clip into a band-keyed shuffle, duplicates
    across container and volume changes land within 2 bits."""
    import hashlib
    import struct as st

    import numpy as np

    from dolphinbeat_spark.operators.audiofp import audio_fingerprint
    from dolphinbeat_spark.operators.flac import encode_flac
    from dolphinbeat_spark.operators.imagehash import (
        dhash_near_dup_pairs,
    )

    def wav16(sig: np.ndarray) -> bytes:
        data = sig.astype(np.int16).tobytes()
        return (b"RIFF" + st.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + st.pack("<IHHIIHH", 16, 1, 1, 8000,
                                    16000, 2, 16)
                + b"data" + st.pack("<I", len(data)) + data)

    # r17 (guide §2.5, REGISTRY_TIMING: ~20 s steady at sf0.1):
    # widen=True — the pure-Python FLAC encode (fixture build) and
    # decode (fingerprint) chains are fused into the scan, and the
    # single-row-group documents scan ran them all on ONE core.
    d = load(spark, sf_dir, "documents", widen=True).filter(
        F.col("doc_id") % 25 == 19
    )
    hexd = "0123456789abcdef"
    def build_many(i):
        rows = []
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        variant = (pattern[:2]
                   + ("0" if pattern[2] == "f" else "f")
                   + pattern[3:])
        base = np.repeat(
            np.array([100 * (hexd.index(c) + 1)
                      for c in pattern[:65]]), 80)
        var = np.repeat(
            np.array([100 * (hexd.index(c) + 1)
                      for c in variant[:65]]), 80) * 2
        rows.append((2 * i, bytearray(wav16(base))))
        rows.append((2 * i + 1, bytearray(
            encode_flac(var.astype(np.int16).reshape(-1, 1), 8000))))
        return rows
    media = fixture_media_multi(d, build_many)
    pairs = dhash_near_dup_pairs(audio_fingerprint(media), max_dist=4,
                                 hash_col="fingerprint")
    return (pairs.select("media_a", "media_b",
                         F.col("hamming_dist").cast("long")
                         .alias("hamming_dist"))
            .orderBy("media_a", "media_b"))


@register(
    "pipeline_crawl_images",
    # the image share of a crawl end-to-end (r11): each doc's WARC
    # carries THREE image responses — image/png (lossless pattern),
    # image/jpeg (flat-gray closed form) and image/webp (LOSSY VP8,
    # the r11 decoder; this response also rides Content-Encoding gzip
    # so the r11 HTTP body decode sits in the image path) — read in
    # BINARY mode, gated on content_type, and decoded through the one
    # magic-dispatched decode_media slot. The oracle recomputes all
    # three decodes in closed form (hex-digest contract): the PNG
    # round-trips its byte pattern, the JPEG reconstructs flat v, the
    # WebP runs the literal dequant + BT.601 constants.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern,
         2 * (ord(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 64) AS v,
         1 + ord(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) % 5 AS ly
  FROM documents WHERE doc_id % 25 = 16
), webp_yuv AS (
  SELECT media_id,
         128 + ((((ly * 42 + 3) >> 3) + 4) >> 3) AS y, 128 AS u, 128 AS v
  FROM p
), webp_rgb AS (
  SELECT media_id,
         (((y * 19077) >> 8) + ((v * 26149) >> 8) - 14234) >> 6 AS r,
         (((y * 19077) >> 8) - ((u * 6419) >> 8) - ((v * 13320) >> 8)
          + 8708) >> 6 AS g,
         (((y * 19077) >> 8) + ((u * 33050) >> 8) - 17685) >> 6 AS b
  FROM webp_yuv
)
SELECT p.media_id, 'png' AS fmt, 8::BIGINT AS width, 4::BIGINT AS height,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT)
           AS pixel_sum,
       md5(lower(hex(pattern))) AS pixel_md5
FROM p
UNION ALL
SELECT media_id, 'jpeg', 16, 8, CAST(128 * v AS BIGINT),
       md5(repeat(printf('%02x', CAST(v AS INTEGER)), 128))
FROM p
UNION ALL
SELECT w.media_id, 'webp', 16, 16,
       CAST((r + g + b + 255) * 256 AS BIGINT),
       md5(repeat(printf('%02x%02x%02xff', CAST(r AS INTEGER),
                         CAST(g AS INTEGER), CAST(b AS INTEGER)), 256))
FROM webp_rgb w
ORDER BY media_id, fmt
""",
    tags=("multimodal", "webp", "jpeg", "png", "warc", "pipeline",
          "ingest", "lossy"),
)
def pipeline_crawl_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl image path under the oracle gate (r11): WARC binary
    mode → content-type gate → magic-dispatched decode_media, with
    PNG, JPEG and LOSSY VP8 WebP decoding side by side and one
    response arriving gzip-compressed on the wire (the r11 HTTP body
    decode feeding the codec layer). This is what the multimodal
    share of a Common Crawl segment looks like on its way to feature
    extraction."""
    import hashlib

    from dolphinbeat_spark.operators import vp8_tables as VT
    from dolphinbeat_spark.operators.jpeg import encode_jpeg
    from dolphinbeat_spark.operators.multimodal import encode_png
    from dolphinbeat_spark.operators.webp import encode_webp_vp8
    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 16)
    def build(i):
        hx = hashlib.md5(str(i).encode()).hexdigest()
        pattern = (hx * 3).encode("ascii")
        v = 2 * (ord(hx[0]) % 64)
        ly = 1 + ord(hx[1]) % 5
        mb = {"ymode": VT.DC_PRED, "uvmode": VT.DC_PRED,
              "y2": [ly] + [0] * 15}
        date = "2024-05-01T00:00:00Z"
        recs = [
            {"type": "response", "record_id": f"<urn:uuid:{i}-png>",
             "target_uri": f"http://ex.com/{i}/a.png", "date": date,
             "content": encode_png(8, 4, pattern, color_type=2),
             "http": {"status": 200, "content_type": "image/png"}},
            {"type": "response", "record_id": f"<urn:uuid:{i}-jpg>",
             "target_uri": f"http://ex.com/{i}/b.jpg", "date": date,
             "content": encode_jpeg(16, 8, bytes([v]) * 128, gray=True),
             "http": {"status": 200, "content_type": "image/jpeg"}},
            {"type": "response", "record_id": f"<urn:uuid:{i}-webp>",
             "target_uri": f"http://ex.com/{i}/c.webp", "date": date,
             "content": encode_webp_vp8(16, 16, [mb], qi=20),
             "http": {"status": 200, "content_type": "image/webp",
                      "content_encoding": "gzip"}},
            {"type": "response", "record_id": f"<urn:uuid:{i}-txt>",
             "target_uri": f"http://ex.com/{i}/robots.txt", "date": date,
             "content": b"User-agent: *\r\n",
             "http": {"status": 200, "content_type": "text/plain"}},
        ]
        return (encode_warc(
            recs, gzip_members=bool(i % 2)))
    media = fixture_media(d, build)
    images = (
        read_warc(media, binary=True)
        .filter((F.col("http_status") == 200)
                & F.col("content_type").startswith("image/"))
        .select("media_id", F.col("body").alias("payload"))
    )
    return (
        M.decode_media(images, digest="hex")
        .orderBy("media_id", "fmt")
    )


@register(
    "pipeline_image_decode_wall",
    # r15 (verdict task #6): image decode as a FIRST-CLASS bench
    # wall — the codec_throughput section measures per-family MB/s on
    # synthetic batches, but nothing in the bench set exercised
    # decode_media end-to-end at sf scale with non-trivial pixel
    # counts (the correctness specs use tiny fixtures, so their walls
    # are all overhead). Each doc contributes a 128x128 JPEG (flat
    # gray, closed form), a 128x128 grayscale PNG (md5-letter
    # pattern) and a 128x128 lossy VP8 WebP (flat: only MB(0,0)
    # carries a Y2 DC, DC_PRED propagates it — verified exact) — 16
    # distinct variants keyed by doc_id % 16, LRU-cached per worker
    # so fixture encode cost is bounded and the measured wall is the
    # DECODE path. ~7.5k images / ~370 Mpx at sf0.1.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id % 16 AS VARCHAR)), 512) AS pattern,
         2 * ((doc_id % 16) * 7 % 64) AS v,
         1 + (doc_id % 16) % 5 AS ly
  FROM documents WHERE doc_id % 2 = 0
), webp_yuv AS (
  SELECT media_id,
         128 + ((((ly * 42 + 3) >> 3) + 4) >> 3) AS y, 128 AS u, 128 AS v
  FROM p
), webp_rgb AS (
  SELECT media_id,
         (((y * 19077) >> 8) + ((v * 26149) >> 8) - 14234) >> 6 AS r,
         (((y * 19077) >> 8) - ((u * 6419) >> 8) - ((v * 13320) >> 8)
          + 8708) >> 6 AS g,
         (((y * 19077) >> 8) + ((u * 33050) >> 8) - 17685) >> 6 AS b
  FROM webp_yuv
)
SELECT p.media_id, 'jpeg' AS fmt, 128::BIGINT AS width,
       128::BIGINT AS height, CAST(16384 * v AS BIGINT) AS pixel_sum,
       md5(repeat(printf('%02x', CAST(v AS INTEGER)), 16384))
           AS pixel_md5
FROM p
UNION ALL
SELECT media_id, 'png', 128, 128,
       CAST(32 * list_sum(list_transform(range(1, 33),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) * 16
            AS BIGINT),
       md5(lower(hex(pattern)))
FROM p
UNION ALL
SELECT w.media_id, 'webp', 128, 128,
       CAST((r + g + b + 255) * 16384 AS BIGINT),
       md5(repeat(printf('%02x%02x%02xff', CAST(r AS INTEGER),
                         CAST(g AS INTEGER), CAST(b AS INTEGER)),
                  16384))
FROM webp_rgb w
ORDER BY media_id, fmt
""",
    tags=("multimodal", "decode", "codec", "jpeg", "png", "webp",
          "bench", "lossy"),
    bench=True,
)
def pipeline_image_decode_wall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode_media wall-clock at sf scale (r15): three real codecs
    per doc at 128x128 through the one magic-dispatched decode slot
    (native plugs active where loadable, pure fallback otherwise) —
    the round-over-round image-decode number the codec_throughput
    bandwidth section cannot provide."""
    from dolphinbeat_spark.plans.multimodal_fixture_cache import (
        decode_wall_payloads,
    )

    import pandas as pd

    # r16: widen so the decode runs at session parallelism instead of
    # inside the (single-task at bench layout) scan stage; only doc_id
    # survives column pruning into the exchange, so the spread is ~free.
    d = load(spark, sf_dir, "documents", widen=True).filter(
        F.col("doc_id") % 2 == 0
    )

    def build_many(i):
        return [(i, pay) for pay in decode_wall_payloads(i % 16)]

    # r16 fused boundary (guide §4.1, measured in OPTIMIZATION_r16.md):
    # fixture_media_multi(...) then decode_media(...) chained two
    # mapInPandas nodes, shipping every payload byte Python->JVM->
    # Python through two Arrow boundaries. The fixture build and the
    # decode now compose inside ONE mapInPandas — payloads never leave
    # the Python worker; only doc_id crosses in and the 6 small stat
    # columns cross out. Identical rows: same payloads through the
    # same decode_media_batches transform.
    def fused(it):
        def media(it):
            for pdf in it:
                mids, pays = [], []
                for (i,) in pdf[["doc_id"]].itertuples(index=False):
                    for mid, pay in build_many(i):
                        mids.append(int(mid))
                        pays.append(bytearray(pay))
                yield pd.DataFrame({
                    "media_id": pd.array(mids, dtype="int64"),
                    "payload": pays,
                })

        return M.decode_media_batches(media(it), digest="hex")

    decoded = d.select("doc_id").mapInPandas(fused, M.DECODED_SCHEMA)
    # a global orderBy would RANGE-SAMPLE its child and execute the
    # whole map-only fixture+decode chain TWICE (no shuffle files to
    # reuse upstream — measured 7.2 s vs 3.7 s single-pass at sf0.1);
    # a persist would make bench re-runs hit the plan cache instead
    # of decoding. Explicit exchange + in-partition sort keeps decode
    # parallel and single-pass; the sorted relation is 6 tiny columns
    # bounded by doc count, the standard total-order sink boundary.
    return decoded.repartition(1).sortWithinPartitions("media_id", "fmt")


@register(
    "pipeline_crawl_mixed_media",
    # a real crawl is not all HTML: each doc's WARC carries an HTML
    # 200 response AND an application/pdf 200 response. The pipeline
    # reads the WARC TWICE from the same payload column — text mode
    # (charset-decoded) routes text/html bodies into the HTML
    # extractor; binary mode routes application/pdf bodies into the
    # PDF extractor — and unions the per-document text. The oracle
    # rebuilds both sides from token slices.
    oracle=r"""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id % 25 = 17
)
SELECT media_id, 'html' AS kind, 'Page ' || i AS title,
       'Crawl doc ' || i || chr(10)
         || array_to_string(list_slice(toks, 1, 5), ' ') AS text
FROM p
UNION ALL
SELECT media_id, 'pdf', 'Attachment ' || i,
       'PDF doc ' || i || chr(10)
         || array_to_string(list_slice(toks, 6, 10), ' ')
FROM p
ORDER BY media_id, kind
""",
    tags=("multimodal", "pdf", "html", "warc", "pipeline", "ingest"),
)
def pipeline_crawl_mixed_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-media crawl ingestion under the oracle gate: one WARC,
    two content types, two decode paths — read_warc text mode →
    html_extract for text/html, read_warc binary mode → pdf_extract
    for application/pdf — unioned into a per-document text relation.
    This is the actual shape of a Common Crawl segment (HTML + PDF +
    images interleaved) flowing into the text pipeline."""
    from dolphinbeat_spark.operators.html import html_extract
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract
    from dolphinbeat_spark.sources.warc import encode_warc, read_warc

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 17)
    def build(did, text):
        toks = text.strip().split()
        page = (
            f"<html><head><title>Page {did}</title></head>"
            f"<body><h1>Crawl doc {did}</h1>"
            f"<p>{' '.join(toks[0:5])}</p></body></html>"
        )
        pdf = encode_pdf(
            [[f"PDF doc {did}", " ".join(toks[5:10])]],
            title=f"Attachment {did}", xref_stream=bool(did % 2),
        )
        date = "2024-04-01T00:00:00Z"
        recs = [
            {"type": "response", "record_id": f"<urn:uuid:{did}-h>",
             "target_uri": f"http://ex.com/{did}", "date": date,
             "content": page.encode(),
             "http": {"status": 200, "content_type": "text/html"}},
            {"type": "response", "record_id": f"<urn:uuid:{did}-p>",
             "target_uri": f"http://ex.com/{did}/doc.pdf", "date": date,
             "content": pdf,
             "http": {"status": 200, "content_type": "application/pdf"}},
        ]
        return (encode_warc(recs,
                                                gzip_members=bool(did % 2)))
    media = fixture_media(d, build, with_text=True)
    html_side = (
        read_warc(media)
        .filter((F.col("http_status") == 200)
                & F.col("content_type").startswith("text/html"))
        .select("media_id", "body_text")
    )
    html_out = html_extract(
        html_side, id_col="media_id", html_col="body_text"
    ).select(
        F.col("doc_id").alias("media_id"), F.lit("html").alias("kind"),
        "title", "text",
    )
    pdf_side = (
        read_warc(media, binary=True)
        .filter((F.col("http_status") == 200)
                & (F.col("content_type") == "application/pdf"))
        .select("media_id", F.col("body").alias("payload"))
    )
    pdf_out = pdf_extract(pdf_side).select(
        "media_id", F.lit("pdf").alias("kind"), "title",
        F.col("page_text").alias("text"),
    )
    return html_out.unionByName(pdf_out).orderBy("media_id", "kind")


@register(
    "pipeline_archive_pdf_text",
    # the bundled-corpus decode chain: each doc ships as a ZIP
    # (forced-Zip64 on odd ids) holding notes.txt + doc.pdf; the
    # pipeline enumerates members in BINARY mode, routes *.pdf
    # payloads into the PDF text extractor, and emits per-page text —
    # exactly how a tar/zip-of-PDFs corpus flows at 100 TB. The
    # oracle rebuilds the single page's text from token slices.
    oracle=r"""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id % 25 = 11
)
SELECT media_id, 0::BIGINT AS page_idx, 1::BIGINT AS n_pages,
       'Bundle ' || i AS title,
       'Doc ' || i || ' from bundle' || chr(10)
         || array_to_string(list_slice(toks, 1, 6), ' ') || chr(10)
         || array_to_string(list_slice(toks, 7, 10), ' ') AS page_text
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "archive", "pipeline", "ingest"),
)
def pipeline_archive_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive→PDF decode chain under the oracle gate: read_archive
    in binary mode (member bytes as payload) → Catalyst name filter →
    pdf_extract — two Arrow stages with a JVM filter between, no
    driver round-trip of member bytes. ZIPs cycle classic/Zip64 and
    the PDFs cycle classic/stream xref per doc parity."""
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract
    from dolphinbeat_spark.sources.archives import encode_zip, read_archive

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 11)
    def build(did, text):
        toks = text.strip().split()
        pdf = encode_pdf(
            [[f"Doc {did} from bundle", " ".join(toks[0:6]),
              " ".join(toks[6:10])]],
            title=f"Bundle {did}", xref_stream=bool(did % 2),
        )
        z = encode_zip(
            [("notes.txt", b"not a pdf"), ("doc.pdf", pdf)],
            zip64=bool(did % 2),
        )
        return (z)
    media = fixture_media(d, build, with_text=True)
    members = read_archive(media, binary=True)
    pdfs = members.filter(F.col("name").endswith(".pdf")).select(
        "media_id", "payload"
    )
    return pdf_extract(pdfs).orderBy("media_id", "page_idx")


@register(
    "mm_pdf_unicode_text",
    # payload = a REAL Type0/Identity-H PDF per doc (r10): a generated
    # /ToUnicode CMap maps 2-byte CIDs to CJK + accented + ASCII text
    # — the layout Word/Chrome-class writers emit for any non-Latin
    # content. Layouts cycle classic/stream xref and Tj/TJ per doc
    # parity; the oracle rebuilds title and page text in closed form.
    oracle=r"""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id % 25 = 2
)
SELECT media_id, 0::BIGINT AS page_idx, 1::BIGINT AS n_pages,
       '文書 ' || i AS title,
       'ドキュメント ' || i || ' — résumé' || chr(10)
         || array_to_string(list_slice(toks, 1, 6), ' ') AS page_text
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "unicode", "text", "ingest"),
)
def mm_pdf_unicode_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type0/CMap PDF text extraction under the oracle gate
    (operators/pdf.py, r10): 2-byte Identity-H CIDs decoded through
    the /ToUnicode CMap — without this path the non-English share of
    a PDF corpus is unreadable. PDFs built driver-side over a bounded
    doc subset; extraction runs distributed."""
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 2)
    def build(did, text):
        toks = text.strip().split()
        pdf = encode_pdf(
            [[f"ドキュメント {did} — résumé", " ".join(toks[0:6])]],
            title=f"文書 {did}", unicode_text=True,
            xref_stream=bool(did % 2), use_tj_array=did % 3 == 0,
        )
        return (pdf)
    media = fixture_media(d, build, with_text=True)
    return pdf_extract(media).orderBy("media_id", "page_idx")


@register(
    "mm_pdf_type0_fontcmap",
    # payload = a Type0/Identity-H PDF per doc WITHOUT /ToUnicode
    # (r13): the non-Adobe CJK-toolchain layout, where text is only
    # recoverable by inverting the embedded TrueType font's own cmap
    # table through /CIDToGIDMap (operators/truetype.py). Docs cycle
    # the /Identity map and a REAL CIDToGIDMap stream (gid = cid + 7)
    # plus classic/stream xref; the oracle rebuilds the CJK + token
    # page text in closed form. Pre-r13 these raised 'Type0 ...
    # without /ToUnicode'.
    oracle=r"""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id % 25 = 12
)
SELECT media_id, 0::BIGINT AS page_idx, 1::BIGINT AS n_pages,
       CAST(NULL AS VARCHAR) AS title,
       '无映射字体 ' || i || chr(10)
         || array_to_string(list_slice(toks, 1, 6), ' ') AS page_text
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "unicode", "text", "fontcmap", "ingest"),
)
def mm_pdf_type0_fontcmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type0-without-/ToUnicode PDF text under the oracle gate (r13):
    CIDs recover through the embedded TrueType cmap inverted via
    /CIDToGIDMap — the multilingual-corpus share that non-Adobe
    writers produce. PDFs built driver-side over a bounded doc
    subset; extraction runs distributed."""
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 12)
    def build(did, text):
        toks = text.strip().split()
        pdf = encode_pdf(
            [[f"无映射字体 {did}", " ".join(toks[0:6])]],
            unicode_text="fontcmap-gidmap" if did % 2 else "fontcmap",
            xref_stream=did % 4 < 2,
        )
        return (pdf)
    media = fixture_media(d, build, with_text=True)
    return pdf_extract(media).orderBy("media_id", "page_idx")


@register(
    "mm_pdf_type0_cff",
    # payload = a Type0/Identity-H PDF per doc WITHOUT /ToUnicode
    # whose descendant embeds a NON-CID CFF via /FontFile3
    # /CIDFontType0C (r14): the OTHER common wild embedding next to
    # r13's TrueType path. Text recovers through the CFF charset's
    # glyph names resolved by the Adobe Glyph List (CID == GID for a
    # non-CID CFF, PDF 32000-1 §9.7.4.2; operators/cff.py). Docs
    # cycle classic/stream xref; the oracle rebuilds the CJK + token
    # page text in closed form. Pre-r14 these raised 'CFF /FontFile3
    # (no cmap table)'.
    oracle=r"""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id % 29 = 5
)
SELECT media_id, 0::BIGINT AS page_idx, 1::BIGINT AS n_pages,
       CAST(NULL AS VARCHAR) AS title,
       'CFF嵌入 ' || i || chr(10)
         || array_to_string(list_slice(toks, 1, 6), ' ') AS page_text
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "unicode", "text", "cff", "ingest"),
)
def mm_pdf_type0_cff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type0-without-/ToUnicode PDF text where the embedded font is a
    non-CID CFF (r14): CIDs double as GIDs, the charset names the
    glyphs, the AGL names the code points — the CFF half of the
    embedded-font recovery surface. PDFs built driver-side over a
    bounded doc subset; extraction runs distributed."""
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 5)
    def build(did, text):
        toks = text.strip().split()
        pdf = encode_pdf(
            [[f"CFF嵌入 {did}", " ".join(toks[0:6])]],
            unicode_text="cff",
            xref_stream=did % 2 == 0,
        )
        return (pdf)
    media = fixture_media(d, build, with_text=True)
    return pdf_extract(media).orderBy("media_id", "page_idx")


@register(
    "mm_pdf_cid_cff",
    # payload = a Type0/Identity-H PDF per doc WITHOUT /ToUnicode
    # whose descendant embeds a CID-KEYED CFF (/FontFile3, ROS
    # Adobe-Japan1-7) — the last embedded-font recovery gap from r14
    # (r15): the glyphs carry NO names, so the charset/AGL route is
    # closed; recovery rides the ordering's PUBLISHED algorithmic
    # ASCII slice (Adobe-Japan1 CIDs 1..95 = U+0020..U+007E, Tech
    # Note 5078) — via Identity-H the show codes ARE those CIDs. The
    # fixture text stays inside the slice; CJK CIDs would need the
    # registry's full UCS2 CMaps and remain a named boundary
    # (Adobe-Identity ROS still raises by name). Docs cycle
    # classic/stream xref; the oracle rebuilds the page text in
    # closed form.
    oracle=r"""
SELECT doc_id AS media_id, 0::BIGINT AS page_idx,
       1::BIGINT AS n_pages, CAST(NULL AS VARCHAR) AS title,
       'CID slice ' || CAST(doc_id AS VARCHAR) || chr(10)
         || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS page_text
FROM documents WHERE doc_id % 29 = 20
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "unicode", "text", "cff", "cid",
          "ingest"),
)
def mm_pdf_cid_cff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CID-keyed-CFF PDF text under the oracle gate (r15): ROS-driven
    recovery through the published Adobe-Japan1 ASCII slice
    (operators/cff.py cid_latin_slice) — the CFF half of the Type0
    surface that r14 left as a named boundary. PDFs built in
    executors over a bounded doc subset; extraction runs
    distributed."""
    import hashlib

    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 20)

    def build(did):
        tok = hashlib.md5(str(did).encode()).hexdigest()[:16]
        return encode_pdf(
            [[f"CID slice {did}", tok]],
            unicode_text="cff-cid",
            xref_stream=did % 2 == 0,
        )

    media = fixture_media(d, build)
    return pdf_extract(media).orderBy("media_id", "page_idx")


#: (cmap name, CJK prefix) cycled by doc parity — one script family
#: per Adobe registry, all four predefined-CMap code spaces
_CMAP_CYCLE = (
    ("GBK-EUC-H", "中文文档"),
    ("90ms-RKSJ-H", "日本語文書"),
    ("KSCms-UHC-H", "한국어 문서"),
    ("UniCNS-UCS2-H", "繁體文件"),
)


@register(
    "mm_pdf_predefined_cmap",
    # payload = a Type0 PDF per doc using a PREDEFINED CJK CMap
    # encoding (GBK-EUC-H / 90ms-RKSJ-H / KSCms-UHC-H /
    # UniCNS-UCS2-H, cycled) and NO /ToUnicode (r14): the
    # Acrobat-era CJK layout. Text recovery needs no Adobe tables —
    # each CMap's code space IS a standard charset (GBK / Shift-JIS
    # / UHC / UTF-16BE), so decoding the show bytes with that codec
    # is the code->unicode mapping (the code->CID step only matters
    # for glyph lookup). Oracle rebuilds the prefix + tokens in
    # closed form. Pre-r14 these raised 'predefined CMap ... only
    # Identity-H/V'.
    oracle=r"""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         CASE doc_id % 4 WHEN 0 THEN '中文文档' WHEN 1 THEN '日本語文書'
              WHEN 2 THEN '한국어 문서' ELSE '繁體文件' END AS prefix,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id % 29 = 11
)
SELECT media_id, 0::BIGINT AS page_idx, 1::BIGINT AS n_pages,
       CAST(NULL AS VARCHAR) AS title,
       prefix || ' ' || i || chr(10)
         || array_to_string(list_slice(toks, 1, 6), ' ') AS page_text
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "unicode", "text", "cmap", "ingest"),
)
def mm_pdf_predefined_cmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predefined-CJK-CMap PDF text under the oracle gate (r14): all
    four Adobe registry code spaces decode through their native
    charset codecs — no CID tables shipped or needed for text. PDFs
    built driver-side over a bounded doc subset; extraction runs
    distributed."""
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 11)
    def build(did, text):
        toks = text.strip().split()
        cmap, prefix = _CMAP_CYCLE[did % 4]
        pdf = encode_pdf(
            [[f"{prefix} {did}", " ".join(toks[0:6])]],
            unicode_text=f"cmap:{cmap}",
            xref_stream=did % 2 == 1,
        )
        return (pdf)
    media = fixture_media(d, build, with_text=True)
    return pdf_extract(media).orderBy("media_id", "page_idx")


@register(
    "mm_pdf_encrypted_text",
    # payload = a REAL RC4-encrypted PDF per doc (Standard security
    # handler, r10): owner-locked with the EMPTY user password — the
    # restriction layout every viewer opens. Key length cycles
    # 40/128-bit and xref layout classic/stream per doc parity; the
    # oracle rebuilds the single page's text from token slices.
    oracle=r"""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id % 25 = 9
)
SELECT media_id, 0::BIGINT AS page_idx, 1::BIGINT AS n_pages,
       'Locked ' || i AS title,
       'Restricted doc ' || i || chr(10)
         || array_to_string(list_slice(toks, 1, 7), ' ') AS page_text
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "encryption", "text", "ingest"),
)
def mm_pdf_encrypted_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RC4-encrypted PDF text extraction under the oracle gate
    (operators/pdf.py, r10): Standard-handler key derivation, /U
    validation with the empty user password, per-object RC4 over
    streams AND strings (the /Info title) — without this path the
    owner-locked share of a PDF corpus is unreadable."""
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 9)
    def build(did, text):
        toks = text.strip().split()
        pdf = encode_pdf(
            [[f"Restricted doc {did}", " ".join(toks[0:7])]],
            title=f"Locked {did}",
            encrypt="rc4-128" if did % 2 else "rc4-40",
            xref_stream=did % 4 < 2,
        )
        return (pdf)
    media = fixture_media(d, build, with_text=True)
    return pdf_extract(media).orderBy("media_id", "page_idx")


@register(
    "mm_pdf_embedded_images",
    # payload = a REAL 2-page PDF per doc with embedded image XObjects:
    # page 0 carries a BASELINE DCTDecode JPEG (the mm_decode_jpeg
    # flat-gray closed form: v = 2*(ord(first md5 hex char) % 64)
    # quantizes losslessly, 16x8) plus a Flate-compressed raw
    # DeviceRGB 4x4 (flat r = 1 + doc_id % 127); page 1 carries the
    # SAME closed form as a PROGRESSIVE (SOF2) JPEG. Xref layout and
    # RC4 encryption cycle by doc parity — image streams decrypt like
    # any other stream. Pre-r11 every one of these payloads raised
    # 'PDF filter DCTDecode not supported'.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         2 * (ord(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 64) AS v,
         1 + doc_id % 127 AS r
  FROM documents WHERE doc_id % 25 = 23
)
SELECT media_id, 0::BIGINT AS page_idx, 'Im0_0' AS img_name,
       16::BIGINT AS width, 8::BIGINT AS height,
       1::BIGINT AS n_components, 'DCTDecode' AS img_filter,
       CAST(128 * v AS BIGINT) AS pixel_sum,
       md5(repeat(chr(CAST(v AS INTEGER)), 128)) AS pixel_md5
FROM p
UNION ALL
SELECT media_id, 0::BIGINT, 'Im0_1', 4::BIGINT, 4::BIGINT, 3::BIGINT,
       'FlateDecode', CAST(48 * r AS BIGINT),
       md5(repeat(chr(CAST(r AS INTEGER)), 48))
FROM p
UNION ALL
SELECT media_id, 1::BIGINT, 'Im1_0', 16::BIGINT, 8::BIGINT, 1::BIGINT,
       'DCTDecode', CAST(128 * v AS BIGINT),
       md5(repeat(chr(CAST(v AS INTEGER)), 128))
FROM p
ORDER BY media_id, page_idx, img_name
""",
    tags=("multimodal", "pdf", "decode", "codec", "ingest"),
)
def mm_pdf_embedded_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded PDF images under the oracle gate (r11): the XObject
    /Image walk (operators/pdf.py::extract_pdf_images) routes
    DCTDecode payloads through the engine's own from-scratch JPEG
    decoder (baseline AND progressive) and raw Flate sample streams
    through the common filter chain — the scanned-document share of a
    PDF corpus becomes reachable for the multimodal path. Arrow
    mapInPandas, one image per row, map-only at any scale."""
    import hashlib

    from dolphinbeat_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 23)
    def build(i):
        v = 2 * (ord(hashlib.md5(str(i).encode()).hexdigest()[0]) % 64)
        r = 1 + i % 127
        pdf = encode_pdf(
            [[f"scan page {i}"], ["second page"]],
            title=f"Scans {i}",
            xref_stream=bool(i % 2),
            encrypt="rc4-128" if i % 3 == 0 else None,
            images=[
                [("jpeg", 16, 8, 1,
                  encode_jpeg(16, 8, bytes([v]) * 128, gray=True)),
                 ("raw", 4, 4, 3, bytes([r]) * 48)],
                [("jpeg", 16, 8, 1,
                  encode_jpeg_progressive(16, 8, bytes([v]) * 128,
                                          gray=True))],
            ],
        )
        return (pdf)
    media = fixture_media(d, build)
    return (
        pdf_images(media)
        .select("media_id", "page_idx", "img_name", "width", "height",
                "n_components", "img_filter", "pixel_sum", "pixel_md5")
        .orderBy("media_id", "page_idx", "img_name")
    )


@register(
    "mm_pdf_ccitt_image",
    # payload = a PDF per doc embedding a CCITTFaxDecode image XObject
    # (the scanned-fax layout): the doc's 96-char md5 pattern as an
    # 8x12 bilevel page, ink where the hex digit is a letter, coded
    # G4 / G3-1D / G3-2D by doc_id % 3 — the PDF filter delegates to
    # the same from-scratch T.4/T.6 codec as TIFF Compression 2/3/4.
    # BlackIs1 defaults false, so ink decodes to gray 0; the 0/255
    # bytes are pinned via the hex-digest contract, the same closed
    # form as mm_decode_tiff_ccitt. Pre-r11 these raised
    # 'PDF filter CCITTFaxDecode not supported'.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 7
)
SELECT media_id, 0::BIGINT AS page_idx, 'Im0_0' AS img_name,
       CAST(8 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
       1::BIGINT AS n_components, 'CCITTFaxDecode' AS img_filter,
       CAST(255 * length(regexp_replace(pattern, '[a-f]', '', 'g'))
            AS BIGINT) AS pixel_sum,
       md5(replace(replace(
             translate(pattern, '0123456789abcdef', 'wwwwwwwwwwBBBBBB'),
             'w', 'ff'), 'B', '00')) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "decode", "codec", "ccitt", "ingest"),
)
def mm_pdf_ccitt_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF CCITTFaxDecode images under the oracle gate (r11): the
    filter delegates to the engine's own T.4/T.6 fax codec
    (operators/ccitt.py), K selecting G4/G3-1D/G3-2D — the
    scanned-fax share of a PDF corpus decodes beside DCTDecode in the
    same pdf_images Arrow slot."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 7)
    kinds = ("ccitt-g4", "ccitt-g3", "ccitt-g3-2d")
    def build(i):
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        ink = np.array([1 if c in "abcdef" else 0 for c in pattern],
                       np.uint8)
        pdf = encode_pdf(
            [[f"fax {i}"]], xref_stream=bool(i % 2),
            images=[[(kinds[i % 3], 8, 12, 1, ink.tobytes())]],
        )
        return (pdf)
    media = fixture_media(d, build)
    return (
        pdf_images(media, digest="hex")
        .select("media_id", "page_idx", "img_name", "width", "height",
                "n_components", "img_filter", "pixel_sum", "pixel_md5")
        .orderBy("media_id", "page_idx", "img_name")
    )


@register(
    "mm_pdf_jbig2_image",
    # payload = a PDF per doc embedding a JBIG2Decode image XObject
    # (the modern scanned-document layout — JBIG2 compresses bilevel
    # ~2-5x tighter than G4, so producers prefer it): the doc's
    # 96-char md5 pattern as an 8x12 bilevel page, ink where the hex
    # digit is a letter, generic-region coded by the in-repo T.88
    # encoder (operators/jbig2.py, r13 — MQ coder pinned against the
    # spec's published Annex H.2 vector). Odd docs use the PDF
    # two-stream arrangement (/JBIG2Globals carrying the page
    # information segment), even docs the single-stream form — both
    # must decode identically. The filter's 1=black bits invert to
    # the 0=black gray convention, pinned via the same hex-digest
    # closed form as mm_pdf_ccitt_image. Pre-r13 these raised 'PDF
    # image filter JBIG2Decode not supported'.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 1
)
SELECT media_id, 0::BIGINT AS page_idx, 'Im0_0' AS img_name,
       CAST(8 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
       1::BIGINT AS n_components, 'JBIG2Decode' AS img_filter,
       CAST(255 * length(regexp_replace(pattern, '[a-f]', '', 'g'))
            AS BIGINT) AS pixel_sum,
       md5(replace(replace(
             translate(pattern, '0123456789abcdef', 'wwwwwwwwwwBBBBBB'),
             'w', 'ff'), 'B', '00')) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "decode", "codec", "jbig2", "ingest"),
)
def mm_pdf_jbig2_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF JBIG2Decode images under the oracle gate (r13): the filter
    delegates to the engine's own ITU-T T.88 generic-region decoder
    (MQ arithmetic coder + template contexts), honoring the
    /JBIG2Globals two-stream arrangement — the JBIG2 share of a
    scanned-PDF corpus decodes beside CCITT and DCT in the same
    pdf_images Arrow slot."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 1)
    def build(i):
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        ink = np.array([1 if c in "abcdef" else 0 for c in pattern],
                       np.uint8)
        kind = "jbig2-globals" if i % 2 else "jbig2"
        pdf = encode_pdf(
            [[f"scan {i}"]], xref_stream=bool(i % 2),
            images=[[(kind, 8, 12, 1, ink.tobytes())]],
        )
        return (pdf)
    media = fixture_media(d, build)
    return (
        pdf_images(media, digest="hex")
        .select("media_id", "page_idx", "img_name", "width", "height",
                "n_components", "img_filter", "pixel_sum", "pixel_md5")
        .orderBy("media_id", "page_idx", "img_name")
    )


@register(
    "mm_pdf_jbig2_text",
    # payload = a PDF per doc whose image is a SYMBOL/TEXT-coded
    # JBIG2 page (T.88 §6.4/§6.5 arithmetic profile — the
    # scanned-text layout jbig2enc emits, r13 stretch): a two-glyph
    # dictionary (2x2 solid block, 1x2 top bar — two height classes)
    # placed over a 16x24 canvas from the doc's 96-char md5 pattern:
    # letters a-c stamp the solid glyph at (2c, 2r), d-f the top bar,
    # digits stay background. Reference corner and orientation cycle
    # by doc parity (the wire S/T form changes; the geometry must
    # not). The oracle rebuilds the 24 gray rows in closed form: row
    # 2r maps a-f -> '0000' and digits -> 'ffff'; row 2r+1 maps only
    # a-c -> '0000'.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 4
), rows_hex AS (
  SELECT media_id,
         string_agg(
           replace(replace(replace(translate(
             substr(pattern, 1 + 8 * (r // 2), 8),
             '0123456789abcdef', 'wwwwwwwwwwBBBTTT'),
             'w', 'ffff'), 'B', '0000'),
             'T', CASE WHEN r % 2 = 0 THEN '0000' ELSE 'ffff' END),
           '' ORDER BY r) AS hexpx
  FROM p, generate_series(0, 23) AS g(r)
  GROUP BY media_id
)
SELECT p.media_id, 0::BIGINT AS page_idx, 'Im0_0' AS img_name,
       CAST(16 AS BIGINT) AS width, CAST(24 AS BIGINT) AS height,
       1::BIGINT AS n_components, 'JBIG2Decode' AS img_filter,
       CAST(255 * (4 * length(regexp_replace(pattern, '[a-f]', '',
                                             'g'))
                   + 2 * length(regexp_replace(pattern, '[^d-f]', '',
                                               'g')))
            AS BIGINT) AS pixel_sum,
       md5(hexpx) AS pixel_md5
FROM p JOIN rows_hex USING (media_id)
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "decode", "codec", "jbig2", "text",
          "ingest"),
)
def mm_pdf_jbig2_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbol/text-coded JBIG2 in PDFs under the oracle gate (r13):
    the arithmetic integer procedures, height-class symbol
    dictionary, and strip-based text region placement — the profile
    that makes real scanned-TEXT PDFs decodable, not just scanned
    images."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.jbig2 import encode_jbig2_text
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 4)
    solid = np.ones((2, 2), np.uint8)
    topbar = np.ones((1, 2), np.uint8)
    def build(i):
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        inst = []
        for idx, c in enumerate(pattern):
            r, col = divmod(idx, 8)
            if c in "abc":
                inst.append((0, 2 * col, 2 * r))
            elif c in "def":
                inst.append((1, 2 * col, 2 * r))
        blob = encode_jbig2_text(
            [solid, topbar], inst, page_size=(16, 24),
            ref_corner=i % 4, transposed=bool((i // 4) % 2))
        pdf = encode_pdf(
            [[f"ocr {i}"]], xref_stream=bool(i % 2),
            images=[[("jbig2-raw", 16, 24, 1, blob)]],
        )
        return (pdf)
    media = fixture_media(d, build)
    return (
        pdf_images(media, digest="hex")
        .select("media_id", "page_idx", "img_name", "width", "height",
                "n_components", "img_filter", "pixel_sum", "pixel_md5")
        .orderBy("media_id", "page_idx", "img_name")
    )


@register(
    "mm_pdf_jbig2_huffman",
    # payload = the mm_pdf_jbig2_text layout re-coded in the HUFFMAN
    # profile (T.88 Annex B, r14 — the ancient-Xerox-class encoder
    # output): SDHUFF=1 symbol dictionary with raw OR MMR collective
    # bitmaps (cycled by parity), SBHUFF=1 text region with the
    # runcoded symbol-ID table, and every fourth doc shipping DT as
    # a CUSTOM code-table segment (type 53). Same canvas/glyph
    # construction as the arithmetic twin, so the oracle is the same
    # closed form — the RASTER must be profile-invariant.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 29 = 17
), rows_hex AS (
  SELECT media_id,
         string_agg(
           replace(replace(replace(translate(
             substr(pattern, 1 + 8 * (r // 2), 8),
             '0123456789abcdef', 'wwwwwwwwwwBBBTTT'),
             'w', 'ffff'), 'B', '0000'),
             'T', CASE WHEN r % 2 = 0 THEN '0000' ELSE 'ffff' END),
           '' ORDER BY r) AS hexpx
  FROM p, generate_series(0, 23) AS g(r)
  GROUP BY media_id
)
SELECT p.media_id, 0::BIGINT AS page_idx, 'Im0_0' AS img_name,
       CAST(16 AS BIGINT) AS width, CAST(24 AS BIGINT) AS height,
       1::BIGINT AS n_components, 'JBIG2Decode' AS img_filter,
       CAST(255 * (4 * length(regexp_replace(pattern, '[a-f]', '',
                                             'g'))
                   + 2 * length(regexp_replace(pattern, '[^d-f]', '',
                                               'g')))
            AS BIGINT) AS pixel_sum,
       md5(hexpx) AS pixel_md5
FROM p JOIN rows_hex USING (media_id)
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "decode", "codec", "jbig2", "huffman",
          "ingest"),
)
def mm_pdf_jbig2_huffman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huffman-profile JBIG2 in PDFs under the oracle gate (r14):
    Annex-B standard + custom code tables, collective-bitmap symbol
    dictionaries (raw and MMR), runcoded symbol-ID prefix tables —
    the other wild JBIG2 encoder family next to r13's arithmetic
    profile, raster-identical by construction."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.jbig2 import (
        encode_jbig2_text_huffman,
    )
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 17)
    solid = np.ones((2, 2), np.uint8)
    topbar = np.ones((1, 2), np.uint8)
    def build(i):
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        inst = []
        for idx, c in enumerate(pattern):
            r, col = divmod(idx, 8)
            if c in "abc":
                inst.append((0, 2 * col, 2 * r))
            elif c in "def":
                inst.append((1, 2 * col, 2 * r))
        blob = encode_jbig2_text_huffman(
            [solid, topbar], inst, page_size=(16, 24),
            ref_corner=i % 4,
            mmr_collective=bool((i // 4) % 2),
            custom_dt=i % 8 < 2)
        pdf = encode_pdf(
            [[f"huff {i}"]], xref_stream=bool(i % 2),
            images=[[("jbig2-raw", 16, 24, 1, blob)]],
        )
        return (pdf)
    media = fixture_media(d, build)
    return (
        pdf_images(media, digest="hex")
        .select("media_id", "page_idx", "img_name", "width", "height",
                "n_components", "img_filter", "pixel_sum", "pixel_md5")
        .orderBy("media_id", "page_idx", "img_name")
    )


@register(
    "mm_pdf_simple_font_diff",
    # payload = a PDF per doc whose SIMPLE (Type1) font carries a
    # custom /Encoding: /Differences over a WinAnsi base — the
    # TeX-toolchain layout (r14). Accented/punctuation glyphs ride
    # as codes >= 128 named per the Adobe Glyph List; pre-r14 these
    # extracted as Latin-1 garbage. Oracle rebuilds the text in
    # closed form.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE doc_id % 31 = 7
)
SELECT media_id, 0::BIGINT AS page_idx, 1::BIGINT AS n_pages,
       CAST(NULL AS VARCHAR) AS title,
       'tëx—fönt «' || i || '»' || chr(10)
         || array_to_string(list_slice(toks, 1, 6), ' ') AS page_text
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "text", "encoding", "ingest"),
)
def mm_pdf_simple_font_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-font /Differences text under the oracle gate (r14):
    per-code glyph names resolve through the AGL (operators/cff.py's
    table + productive forms) over a WinAnsi base codec — the custom
    encodings TeX-class writers emit."""
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 31 == 7)

    def build(did, text):
        toks = text.strip().split()
        return encode_pdf(
            [[f"tëx—fönt «{did}»", " ".join(toks[0:6])]],
            unicode_text="differences",
            xref_stream=did % 2 == 0,
        )

    media = fixture_media(d, build, with_text=True)
    return pdf_extract(media).orderBy("media_id", "page_idx")


@register(
    "mm_pdf_jpx_image",
    # payload = a PDF per doc whose image XObject is a REAL JPEG 2000
    # codestream (/JPXDecode — the last named PDF image filter, r14):
    # the from-scratch reversible Part-1 path (5/3 DWT, MQ Tier-1,
    # tag-tree packet headers) over the 12x8 ASCII md5 pattern. Docs
    # cycle the JP2 box wrapper vs raw codestream, SOP/EPH markers,
    # segmentation symbols and progression order — the raster is
    # lossless, so the oracle recomputes the pattern sum/md5 exactly.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 29 = 23
)
SELECT media_id, 0::BIGINT AS page_idx, 'Im0_0' AS img_name,
       CAST(12 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       1::BIGINT AS n_components, 'JPXDecode' AS img_filter,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1))))
            AS BIGINT) AS pixel_sum,
       md5(pattern) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "decode", "codec", "jpx", "ingest"),
)
def mm_pdf_jpx_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG 2000 images in PDFs under the oracle gate (r14):
    operators/jpx.py's reversible Part-1 decode — DWT 5/3, RCT-less
    gray path, MQ Tier-1, tag-tree packets — through the shared
    /JPXDecode image surface, bit-exact by reversibility."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.jpx import encode_jpx
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 23)

    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3) \
            .encode("ascii")
        img = np.frombuffer(pattern, np.uint8).reshape(8, 12)
        cs = encode_jpx(
            img, levels=2, progression=i % 5,
            sop=bool(i % 3 == 1), eph=bool(i % 3 == 1),
            segsym=bool(i % 3 == 2), jp2=bool(i % 2),
            # r15: a MULTI-TILE share (4x8 grid over the 12x8 page,
            # 2^levels-aligned pitch) — bit-exact by reversibility
            tile=(4, 8) if i % 7 == 0 else None)
        return encode_pdf([[f"jpx {i}"]], xref_stream=bool(i % 2),
                          images=[[("jpx", 12, 8, 1, cs)]])

    media = fixture_media(d, build)
    return (
        pdf_images(media)
        .select("media_id", "page_idx", "img_name", "width", "height",
                "n_components", "img_filter", "pixel_sum", "pixel_md5")
        .orderBy("media_id", "page_idx", "img_name")
    )


@register(
    "mm_pdf_jpx_lossy",
    # payload = a PDF per doc embedding a LOSSY (9/7 irreversible)
    # JPEG 2000 image of the md5-letter pattern — the dominant wild
    # JPX form for photographic PDFs (r15): scalar quantization style
    # cycles derived(1)/expounded(2) by doc parity, progression and
    # quality-layer count cycle too. Lossy float DWT has no closed
    # integer form, so the contract is the encoder-mirror roundtrip
    # with the DOCUMENTED tolerance (the r14 JPX posture — no
    # OpenJPEG in env): the Spark side decodes through the full PDF
    # /JPXDecode path, recomputes the source pattern from media_id
    # and reports whether max |err| lands inside the per-style bound
    # (16 derived / 6 expounded at these fixture step sizes); the
    # oracle states the metadata and the bound literally.
    oracle="""
SELECT doc_id AS media_id,
       CAST(12 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       1::BIGINT AS n_components, 'JPXDecode' AS img_filter,
       TRUE AS within_tolerance
FROM documents WHERE doc_id % 31 = 17
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "decode", "codec", "jpx", "lossy",
          "ingest"),
)
def mm_pdf_jpx_lossy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irreversible JPEG 2000 in PDFs under the oracle gate (r15):
    operators/jpx.py's 9/7 float-lifting path — scalar dequantization
    styles 1/2 (T.800 E.1), midpoint reconstruction, spec packet
    order with multi-layer inclusion — through the shared /JPXDecode
    surface, tolerance-pinned against the recomputed source."""
    import hashlib

    import numpy as np
    import pandas as pd

    from dolphinbeat_spark.operators.jpx import encode_jpx
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 31 == 17)

    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3) \
            .encode("ascii")
        img = np.frombuffer(pattern, np.uint8).reshape(8, 12)
        cs = encode_jpx(
            img, levels=2, transform=0,
            qstyle=1 if i % 2 else 2, progression=i % 5,
            layers=1 + i % 2, jp2=bool(i % 3 == 0),
            # r15: multi-tile + tile-part share on the lossy path
            tile=(4, 4) if i % 5 == 0 else None,
            tile_parts=2 if i % 10 == 0 else 1)
        return encode_pdf([[f"jpx lossy {i}"]],
                          images=[[("jpx", 12, 8, 1, cs)]])

    def err_batches(it):
        for pdf in it:
            errs = []
            for m, p in zip(pdf["media_id"], pdf["pixels"]):
                pattern = (hashlib.md5(str(int(m)).encode())
                           .hexdigest() * 3).encode("ascii")
                src = np.frombuffer(pattern, np.uint8).astype(np.int64)
                got = np.frombuffer(bytes(p), np.uint8).astype(np.int64)
                errs.append(int(np.abs(got - src).max())
                            if got.size == src.size else 255)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pdf["width"], "height": pdf["height"],
                "n_components": pdf["n_components"],
                "img_filter": pdf["img_filter"],
                "max_err": pd.array(errs, dtype="int32"),
            })

    media = fixture_media(d, build)
    imgs = pdf_images(media).select(
        "media_id", "width", "height", "n_components", "img_filter",
        "pixels")
    scored = imgs.mapInPandas(
        err_batches,
        "media_id long, width long, height long, n_components long, "
        "img_filter string, max_err int")
    tol = F.when(F.col("media_id") % 2 == 1, F.lit(16)).otherwise(
        F.lit(6))
    return (
        scored
        .select("media_id", "width", "height", "n_components",
                "img_filter",
                (F.col("max_err") <= tol).alias("within_tolerance"))
        .orderBy("media_id")
    )


@register(
    "mm_pdf_jpx_cblk_styles",
    # payload = a PDF per doc whose /JPXDecode image cycles the six
    # T.800 A.6.1 code-block coding styles (r16): selective
    # arithmetic bypass (raw spp/mrp segments with B.10.7.2
    # per-segment length signaling), per-pass context reset,
    # termination on every pass, vertically causal contexts,
    # predictable termination, and their combinations — the wild
    # styles real encoders (Kakadu -Cmodes, OpenJPEG -M) emit. The
    # raster stays the lossless 5/3 path, so the oracle recomputes
    # the md5-letter pattern exactly, style-independent.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 31 = 11
)
SELECT media_id, 0::BIGINT AS page_idx, 'Im0_0' AS img_name,
       CAST(12 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       1::BIGINT AS n_components, 'JPXDecode' AS img_filter,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1))))
            AS BIGINT) AS pixel_sum,
       md5(pattern) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "decode", "codec", "jpx", "ingest"),
)
def mm_pdf_jpx_cblk_styles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPX code-block coding styles under the oracle gate (r16):
    operators/jpx.py's bypass/reset/termall/causal/pterm decode —
    raw codeword segments, segment-split length signaling, per-pass
    context resets, stripe-causal contexts — through the shared
    /JPXDecode surface, bit-exact by reversibility."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.jpx import encode_jpx
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 31 == 11)

    # bypass (0x01) in every row so raw segments always decode; the
    # other flags cycle so each PDF exercises a different combination
    styles = (0x01, 0x03, 0x05, 0x09, 0x11, 0x07, 0x0D, 0x1F)

    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3) \
            .encode("ascii")
        img = np.frombuffer(pattern, np.uint8).reshape(8, 12)
        cs = encode_jpx(
            img, levels=2, progression=i % 5,
            cblk_style=styles[i % len(styles)],
            segsym=bool(i % 3 == 2), jp2=bool(i % 2),
            cblk_exp=(4, 4) if i % 5 == 0 else (6, 6),
            # r16: a third of the docs move their packet headers
            # into PPT tile-part / PPM main-header segments
            ppt=bool(i % 4 == 1), ppm=bool(i % 4 == 2))
        return encode_pdf([[f"jpx styles {i}"]],
                          xref_stream=bool(i % 2),
                          images=[[("jpx", 12, 8, 1, cs)]])

    media = fixture_media(d, build)
    return (
        pdf_images(media)
        .select("media_id", "page_idx", "img_name", "width", "height",
                "n_components", "img_filter", "pixel_sum", "pixel_md5")
        .orderBy("media_id", "page_idx", "img_name")
    )


@register(
    "mm_pdf_inline_images",
    # payload = a PDF per doc whose images are INLINE (BI/ID/EI,
    # §8.9.7 — the layout scanned faxes and small graphics actually
    # use, with abbreviated key/filter/colorspace names): page 0
    # carries an unfiltered raw DeviceRGB 4x4 (flat r = 1 + doc_id %
    # 127) and a /DCT-filtered flat-gray JPEG (the mm_decode_jpeg
    # closed form), page 1 a /CCF (CCITT G4) bilevel block over the
    # md5-letter pattern. Encryption and xref layout cycle by parity —
    # inline data rides inside the (encrypted) content stream. Raw +
    # JPEG rows use the byte-digest contract (values < 128); the
    # 0/255 CCITT row is reported via pixel_sum only (md5 pinned in
    # the hex-contract twin mm_pdf_ccitt_image).
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         2 * (ord(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 64) AS v,
         1 + doc_id % 127 AS r,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 18
)
SELECT media_id, 0::BIGINT AS page_idx, 'BI0' AS img_name,
       4::BIGINT AS width, 4::BIGINT AS height, 3::BIGINT AS n_components,
       CAST(NULL AS VARCHAR) AS img_filter,
       CAST(48 * r AS BIGINT) AS pixel_sum
FROM p
UNION ALL
SELECT media_id, 0::BIGINT, 'BI1', 16::BIGINT, 8::BIGINT, 1::BIGINT,
       'DCTDecode', CAST(128 * v AS BIGINT)
FROM p
UNION ALL
SELECT media_id, 1::BIGINT, 'BI0', 8::BIGINT, 12::BIGINT, 1::BIGINT,
       'CCITTFaxDecode',
       CAST(255 * length(regexp_replace(pattern, '[a-f]', '', 'g'))
            AS BIGINT)
FROM p
ORDER BY media_id, page_idx, img_name
""",
    tags=("multimodal", "pdf", "decode", "codec", "inline", "ingest"),
)
def mm_pdf_inline_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INLINE PDF images under the oracle gate (r11): the BI/ID/EI
    walk with abbreviated names expanded routes through the same
    decode paths as XObjects — raw samples, /DCT via the in-repo JPEG
    decoder, /CCF via the in-repo T.4/T.6 codec — and the binary
    inline data is skipped cleanly by the TEXT extractor (it would
    otherwise fake string bytes). Encrypted content streams decrypt
    before the scan."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.jpeg import encode_jpeg
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_images

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 18)
    encs = (None, "rc4-128", "aes-128")
    def build(i):
        hx = hashlib.md5(str(i).encode()).hexdigest()
        v = 2 * (ord(hx[0]) % 64)
        r = 1 + i % 127
        ink = np.array([1 if c in "abcdef" else 0 for c in hx * 3],
                       np.uint8)
        pdf = encode_pdf(
            [[f"inline page {i}"], ["second"]],
            xref_stream=bool(i % 2), encrypt=encs[i % 3],
            title="T" if i % 3 else None,
            images=[
                [("inline-raw", 4, 4, 3, bytes([r]) * 48),
                 ("inline-jpeg", 16, 8, 1,
                  encode_jpeg(16, 8, bytes([v]) * 128, gray=True))],
                [("inline-ccitt-g4", 8, 12, 1, ink.tobytes())],
            ],
        )
        return (pdf)
    media = fixture_media(d, build)
    return (
        pdf_images(media)
        .select("media_id", "page_idx", "img_name", "width", "height",
                "n_components", "img_filter", "pixel_sum")
        .orderBy("media_id", "page_idx", "img_name")
    )


@register(
    "archive_zip64_members",
    # payload = the COMMITTED forced-Zip64 fixture
    # tests/fixtures/zip64.zip (tools/make_zip64_fixture.py —
    # stdlib-zipfile-verified at generation): maxed 32-bit central-
    # directory fields resolved via 0x0001 extras, EOCD64 record +
    # locator. Non-ASCII member bytes are pinned by md5 (hex-digest
    # contract), names/sizes verbatim. Pre-fix the reader raised
    # 'Zip64 not supported' on exactly these bundles.
    oracle="""
SELECT *
FROM (VALUES
  (0::BIGINT, 0::BIGINT, 'docs/readme.txt', 25::BIGINT,
   'f4b7b8590d812753e5347186b565c6aa'),
  (0::BIGINT, 1::BIGINT, 'data/shard-00.jsonl', 102::BIGINT,
   'db4f726720166aa049fb96e44aa296d7'),
  (0::BIGINT, 2::BIGINT, 'data/shard-01.jsonl', 108::BIGINT,
   'ffb0459e60b1047b00c3dca7df6f5349'),
  (0::BIGINT, 3::BIGINT, 'bin/pattern.bin', 256::BIGINT,
   'e2c865db4162bed963bfaa9ef6ac18f0'),
  (0::BIGINT, 4::BIGINT, 'empty.txt', 0::BIGINT,
   'd41d8cd98f00b204e9800998ecf8427e')
) AS t(media_id, member_idx, name, size, member_md5)
ORDER BY member_idx
""",
    tags=("text", "ingest", "archive", "zip64"),
)
def archive_zip64_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zip64 member enumeration under the oracle gate
    (sources/archives.py): EOCD64 locator/record walk + 0x0001
    extended-information extras, CRC-verified extraction — the
    archive shape every >4 GiB training-data bundle has. Reads the
    committed fixture, independent of sf_dir."""
    from pathlib import Path

    from dolphinbeat_spark.sources.archives import read_archive

    raw = (
        Path(__file__).resolve().parents[2]
        / "tests" / "fixtures" / "zip64.zip"
    ).read_bytes()
    media = spark.createDataFrame(
        [(0, bytearray(raw))], "media_id long, payload binary"
    )
    return (
        read_archive(media)
        .select("media_id", "member_idx", "name", "size", "member_md5")
        .orderBy("member_idx")
    )


@register(
    "archive_members",
    # payload = a REAL archive per doc: ZIP for even doc_ids (stored
    # when doc_id % 4 == 0, deflated otherwise — both CRC-verified on
    # extraction) and gzipped ustar TAR for odd ones; three members
    # slice the doc's 96-char md5 pattern (40/30/26). The readers are
    # cross-pinned against stdlib zipfile/tarfile in pytest; this
    # spec pins the distributed relation.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id AS i,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 22
),
s(member_idx, nm, start, sz) AS (
  VALUES (0, 'docs/a.txt', 1, 40), (1, 'docs/b.txt', 41, 30),
         (2, 'meta.json', 71, 26)
)
SELECT media_id,
       CAST(member_idx AS BIGINT) AS member_idx,
       CASE WHEN i % 2 = 0 THEN 'zip' ELSE 'tar' END AS archive_fmt,
       nm AS name,
       CAST(sz AS BIGINT) AS size,
       md5(substr(pattern, start, sz)) AS member_md5,
       substr(pattern, start, sz) AS text
FROM p CROSS JOIN s
ORDER BY media_id, member_idx
""",
    tags=("text", "ingest", "archive"),
)
def archive_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive-bundle ingestion under the oracle gate: ZIP central
    directories (stored + deflated members, CRC-32 verified) and
    gzipped ustar TARs (header checksums verified) enumerated
    distributed via Arrow mapInPandas (sources/archives.py) — no
    driver-side temp files. The member relation (name, size, digest,
    text) feeds the same downstream stages as warc_records."""
    import hashlib

    from dolphinbeat_spark.sources.archives import (
        encode_tar, encode_zip, read_archive,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 22)
    def build_many(i):
        rows = []
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        members = [("docs/a.txt", pattern[0:40]),
                   ("docs/b.txt", pattern[40:70]),
                   ("meta.json", pattern[70:96])]
        if i % 2 == 0:
            payload = encode_zip(members, deflate=bool(i % 4))
        else:
            payload = encode_tar(members, gzip_wrap=True)
        rows.append((i, bytearray(payload)))
        return rows
    media = fixture_media_multi(d, build_many)
    return read_archive(media).orderBy("media_id", "member_idx")


@register(
    "archive_aes_members",
    # payload = a REAL WinZip AE-2 encrypted ZIP per doc (the
    # from-scratch FIPS-197 AES in operators/aes.py behind AES-CTR +
    # PBKDF2-HMAC-SHA1 + HMAC-SHA1 authentication): strength cycles
    # 128/192/256-bit by doc_id % 3, stored/deflate by parity, Zip64
    # layout every sixth doc. Same member slices as archive_members —
    # the decrypted relation is byte-identical to the plaintext one.
    # Pre-r11 AES members raised by name; the AES core is pinned by
    # FIPS-197/SP 800-38A vectors and a randomized cross-check
    # against the cryptography package (tests/test_aes_crypto.py).
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id AS i,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 13
),
s(member_idx, nm, start, sz) AS (
  VALUES (0, 'docs/a.txt', 1, 40), (1, 'docs/b.txt', 41, 30),
         (2, 'meta.json', 71, 26)
)
SELECT media_id,
       CAST(member_idx AS BIGINT) AS member_idx,
       'zip' AS archive_fmt,
       nm AS name,
       CAST(sz AS BIGINT) AS size,
       md5(substr(pattern, start, sz)) AS member_md5,
       substr(pattern, start, sz) AS text
FROM p CROSS JOIN s
ORDER BY media_id, member_idx
""",
    tags=("text", "ingest", "archive", "encryption"),
)
def archive_aes_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES-encrypted ZIP ingestion under the oracle gate (r11,
    closing the r10 accepted boundary): WinZip AE-2 members decrypt
    with a supplied password — PBKDF2 key derivation, password
    verifier, AES-CTR (little-endian counter), HMAC-SHA1
    authentication BEFORE decompression — inside the same distributed
    read_archive slot. Encrypted dataset bundles a pipeline holds
    keys for stop being opaque."""
    import hashlib

    from dolphinbeat_spark.sources.archives import encode_zip, read_archive

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 13)
    def build_many(i):
        rows = []
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        members = [("docs/a.txt", pattern[0:40]),
                   ("docs/b.txt", pattern[40:70]),
                   ("meta.json", pattern[70:96])]
        rows.append((i, bytearray(encode_zip(
            members, deflate=bool(i % 2), zip64=i % 6 == 0,
            password=b"corpus-key", aes=1 + i % 3,
        ))))
        return rows
    media = fixture_media_multi(d, build_many)
    return (
        read_archive(media, password=b"corpus-key")
        .orderBy("media_id", "member_idx")
    )


@register(
    "mm_pdf_aes_text",
    # payload = a REAL AES-encrypted PDF per doc, the HANDLER cycling
    # by parity: AESV2 (V4 R4, AES-128-CBC with sAlT object keys) and
    # AESV3 (V5 R6, AES-256 with the Algorithm 2.B iterated password
    # hash, /UE file-key unwrap and /Perms verification — the modern
    # Acrobat-X+ layout); xref layout cycles classic/stream. Same
    # closed-form page text as mm_pdf_encrypted_text — pre-r11 every
    # AES PDF raised by name.
    oracle=r"""
WITH p AS (
  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS i,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id % 25 = 15
)
SELECT media_id, 0::BIGINT AS page_idx, 1::BIGINT AS n_pages,
       'Sealed ' || i AS title,
       'AES doc ' || i || chr(10)
         || array_to_string(list_slice(toks, 1, 7), ' ') AS page_text
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "pdf", "encryption", "aes", "text", "ingest"),
)
def mm_pdf_aes_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES-encrypted PDF text extraction under the oracle gate (r11):
    AESV2 (V4 crypt filters, sAlT object keys, AES-128-CBC) and AESV3
    (V5 R6: Algorithm 2.B password hash, /UE key unwrap, /Perms
    check, AES-256-CBC with the file key) — the owner-locked AES
    share of a PDF corpus, legacy AND modern, becomes readable beside
    the RC4 one. FIPS-197 core from scratch."""
    from dolphinbeat_spark.operators.pdf import encode_pdf, pdf_extract

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 15)
    def build(did, text):
        toks = text.strip().split()
        pdf = encode_pdf(
            [[f"AES doc {did}", " ".join(toks[0:7])]],
            title=f"Sealed {did}",
            encrypt="aes-128" if did % 2 else "aes-256",
            xref_stream=did % 4 < 2,
        )
        return (pdf)
    media = fixture_media(d, build, with_text=True)
    return pdf_extract(media).orderBy("media_id", "page_idx")


@register(
    "jsonl_compressed_records",
    # payload = one JSONL corpus shard per doc, compression cycling
    # plain/gzip/zstd/bzip2/xz/compress with doc_id % 6 — the zstd
    # path runs the FROM-SCRATCH RFC 8878 decoder
    # (operators/zstd_frame.py) and the compress (.Z) path the r12
    # from-scratch LZW validated against the system uncompress
    # (operators/lzw_z.py). Four records per shard with closed-form
    # id/text; the JSON field extraction happens in Catalyst
    # (get_json_object), not Python.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id AS i,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 27 = 5
),
s(line_idx) AS (VALUES (0), (1), (2), (3))
SELECT media_id,
       CASE i % 6 WHEN 0 THEN 'plain' WHEN 1 THEN 'gzip'
                  WHEN 2 THEN 'zstd' WHEN 3 THEN 'bzip2'
                  WHEN 4 THEN 'xz' ELSE 'compress' END AS codec,
       CAST(line_idx AS BIGINT) AS line_idx,
       CAST(i * 10 + line_idx AS BIGINT) AS rec_id,
       substr(pattern, 1 + line_idx * 24, 24) AS text
FROM p CROSS JOIN s
ORDER BY media_id, line_idx
""",
    tags=("text", "ingest", "jsonl", "zstd"),
)
def jsonl_compressed_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-JSONL ingestion under the oracle gate — the
    .jsonl.zst shard shape bulk text corpora ship in: magic-sniffed
    decompression (incl. the from-scratch zstd frame decoder) inside
    the DataFrame plan via Arrow mapInPandas, with the JSON field
    extraction staying JVM-side in Catalyst (get_json_object)."""
    import hashlib

    from dolphinbeat_spark.operators.zstd_frame import encode_zstd_store
    from dolphinbeat_spark.sources.jsonl import read_jsonl

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 27 == 5)
    def build(i):
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        raw = "".join(
            f'{{"id": {i * 10 + k}, "text": "{pattern[k * 24:k * 24 + 24]}"}}\n'
            for k in range(4)
        ).encode()
        mode = i % 6
        if mode == 1:
            import zlib

            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            payload = co.compress(raw) + co.flush()
        elif mode == 2:
            payload = encode_zstd_store(raw)
        elif mode == 3:
            import bz2

            payload = bz2.compress(raw)
        elif mode == 4:
            import lzma

            payload = lzma.compress(raw)
        elif mode == 5:
            from dolphinbeat_spark.operators.lzw_z import encode_z

            payload = encode_z(raw)
        else:
            payload = raw
        return (payload)
    media = fixture_media(d, build)
    return (
        read_jsonl(media)
        .select(
            "media_id", "codec", "line_idx",
            F.get_json_object("line", "$.id").cast("long").alias("rec_id"),
            F.get_json_object("line", "$.text").alias("text"),
        )
        .orderBy("media_id", "line_idx")
    )


@register(
    "mm_decode_aiff",
    # payload = a REAL AIFF (big-endian IFF audio, Apple's published
    # container): the doc's 96 pattern chars as 8-bit SIGNED PCM
    # (AIFF's 8-bit is signed, unlike WAV's unsigned — ASCII values
    # are < 128 so the byte stream equals the pattern), sample rate
    # 8000 via the 80-bit extended float. Same oracle shape as
    # mm_decode_wav.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 27 = 11
)
SELECT media_id,
       'aiff' AS fmt,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(96 AS BIGINT) AS n_samples,
       CAST(96 AS DOUBLE) / 8000 AS duration_s,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT)
           AS sample_sum,
       md5(pattern) AS sample_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "audio", "codec", "aiff"),
)
def mm_decode_aiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AIFF decode under the oracle gate — the big-endian sibling of
    mm_decode_wav (IFF chunk walk, COMM's 80-bit extended-float
    sample rate, SSND offset header, signed 8-bit PCM), decoded
    distributed through the same decode_audio slot as WAV/FLAC."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.multimodal import encode_aiff

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 27 == 11)
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        s = np.frombuffer(pattern, np.uint8).astype(np.int64).reshape(-1, 1)
        return (encode_aiff(s, 8000, bits=8))
    media = fixture_media(d, build)
    return M.decode_audio(media).orderBy("media_id")


@register(
    "mm_decode_webp",
    # payload = a REAL lossless WebP (VP8L) whose 8x3 RGBA pixels are
    # the doc's 96-byte md5 pattern; the coding shape cycles with
    # doc_id % 5 through literals / LZ77 / color cache /
    # subtract-green / predictor-mode-7, so every decoder path runs
    # across the spec subset. Decode is lossless: oracle =
    # md5(pattern), the mm_decode_png shape.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 27 = 17
)
SELECT media_id,
       'webp' AS fmt,
       CAST(8 AS BIGINT) AS width,
       CAST(3 AS BIGINT) AS height,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT)
           AS pixel_sum,
       md5(pattern) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "webp"),
)
def mm_decode_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP LOSSLESS (VP8L) decode under the oracle gate — the #2
    wild-web image format's losslessly-decodable profile, from
    scratch (operators/webp.py: canonical prefix codes, LZ77 with the
    2D distance map, color cache, and the four inverse transforms).
    The lossy VP8 profile decodes too since r11 — see
    mm_decode_webp_lossy. Decoded distributed in the same
    mapInPandas slot as the other codecs."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.webp import encode_webp_lossless

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 27 == 17)
    shapes = (dict(), dict(lz77_min=4), dict(use_cache_bits=4),
              dict(subtract_green=True), dict(predictor=(7, 3)))
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        rgba = np.frombuffer(pattern, np.uint8).reshape(3, 8, 4)
        return (
            encode_webp_lossless(rgba, **shapes[i % 5])
        )
    media = fixture_media(d, build)
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_decode_webp_lossy",
    # payload = a REAL lossy-WebP VP8 KEYFRAME (RFC 6386, the
    # from-scratch decoder in operators/vp8.py behind the RIFF
    # container): one 16x16 macroblock, DC_PRED, a DC-only Y2 block
    # level Ly and flat chroma DC levels Lu/Lv, quantizer index
    # cycling 10/20/40 by doc parity. The whole decode chain — boolean
    # arithmetic coder, token trees, dequant, inverse WHT + DCT, DC
    # prediction, fancy chroma upsample (flat-invariant), libwebp's
    # fixed-point BT.601 YUV->RGB — has a CLOSED FORM the oracle
    # recomputes with integer arithmetic: the dequant table values
    # (DC_QLOOKUP[10/20/40] = 13/21/37, RFC 6386 §14.1) and the
    # conversion constants (19077/26149/6419/13320/33050 with the
    # truncating VP8Clip8 >> 6 — r13) are stated literally. Flat
    # chroma is invariant under the fancy upsampler, so the closed
    # form survives the r13 upsampling change untouched. Pinned against a real libwebp encoding in
    # tests/test_vp8.py. Pre-r11 every lossy WebP raised by name.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         1 + ord(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 5 AS ly,
         1 + ord(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) % 4 AS lu,
         1 + ord(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) % 4 AS lv,
         CASE doc_id % 3 WHEN 0 THEN 26 WHEN 1 THEN 42 ELSE 74 END
             AS y2dc,
         CASE doc_id % 3 WHEN 0 THEN 13 WHEN 1 THEN 21 ELSE 37 END
             AS uvdc
  FROM documents WHERE doc_id % 27 = 8
), yuv AS (
  SELECT media_id,
         128 + ((((ly * y2dc + 3) >> 3) + 4) >> 3) AS y,
         128 + ((lu * uvdc + 4) >> 3) AS u,
         128 + ((lv * uvdc + 4) >> 3) AS v
  FROM p
), rgb AS (
  SELECT media_id,
         (((y * 19077) >> 8) + ((v * 26149) >> 8) - 14234) >> 6
             AS r,
         (((y * 19077) >> 8) - ((u * 6419) >> 8) - ((v * 13320) >> 8)
          + 8708) >> 6 AS g,
         (((y * 19077) >> 8) + ((u * 33050) >> 8) - 17685) >> 6
             AS b
  FROM yuv
)
SELECT media_id,
       'webp' AS fmt,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST((r + g + b + 255) * 256 AS BIGINT) AS pixel_sum,
       md5(repeat(printf('%02x%02x%02xff',
                         CAST(r AS INTEGER), CAST(g AS INTEGER),
                         CAST(b AS INTEGER)), 256)) AS pixel_md5
FROM rgb
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "webp", "lossy"),
)
def mm_decode_webp_lossy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSY WebP (VP8 keyframe) decode under the oracle gate — the
    dominant WebP form on the real web, closing the r10 boundary:
    RFC 6386 from scratch (operators/vp8.py — boolean arithmetic
    coder, keyframe headers, mode/coefficient token trees with the
    full published probability tables, dequant, exact integer inverse
    WHT/DCT, intra prediction, both loop filters) behind the RIFF
    container with libwebp's fixed-point YUV->RGB. Hex-digest
    contract; same mapInPandas slot as every other codec."""
    import hashlib

    from dolphinbeat_spark.operators import vp8_tables as VT
    from dolphinbeat_spark.operators.webp import encode_webp_vp8

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 27 == 8)
    qis = (10, 20, 40)
    def build(i):
        hx = hashlib.md5(str(i).encode()).hexdigest()
        ly = 1 + ord(hx[0]) % 5
        lu = 1 + ord(hx[1]) % 4
        lv = 1 + ord(hx[2]) % 4
        mb = {"ymode": VT.DC_PRED, "uvmode": VT.DC_PRED,
              "y2": [ly] + [0] * 15,
              "u": [[lu] + [0] * 15 for _ in range(4)],
              "v": [[lv] + [0] * 15 for _ in range(4)]}
        return (
            encode_webp_vp8(16, 16, [mb], qi=qis[i % 3])
        )
    media = fixture_media(d, build)
    return M.decode_media(media, digest="hex").orderBy("media_id")


@register(
    "mm_decode_webp_real",
    # payload = the COMMITTED real libwebp encoding
    # tests/fixtures/golden/python-logo.webp (PSF-licensed CPython
    # test data): VP8X container, a VP8 lossy keyframe whose 160
    # bytes of arithmetic-coded DCT tokens exercise the full
    # DEFAULT_COEFF_PROBS / COEFF_UPDATE_PROBS tables, and an ALPH
    # transparency plane (headerless VP8L) carrying the Python-logo
    # silhouette. The oracle pins the decoded relation's stats as
    # literals — r12: the pinned values are the decode whose YUV
    # planes are BIT-EXACT against libwebp's own WebPDecodeYUV (the
    # r11 literals pinned a wrong decode: the probability tables were
    # mistranscribed; tools/check_vp8_tables.py now verifies them
    # against the reference library and four conformance goldens pin
    # the planes in tests/test_vp8.py). r13: the pinned RGBA is
    # BIT-EXACT against libwebp's own WebPDecodeRGBA — fancy chroma
    # upsampling plus the truncating VP8Clip8 conversion close the
    # former simple-upsampler deviation. Independent of sf_dir, like
    # the other committed-fixture specs.
    oracle="""
SELECT 0::BIGINT AS media_id, 'webp' AS fmt,
       16::BIGINT AS width, 16::BIGINT AS height,
       109897::BIGINT AS pixel_sum,
       '9771c5fe39692a9bbbcdda3e53a73eae' AS pixel_md5
""",
    tags=("multimodal", "decode", "codec", "webp", "lossy", "alpha"),
)
def mm_decode_webp_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL libwebp-encoded lossy+alpha WebP through the full r11
    decode chain (VP8X walk -> RFC 6386 keyframe decode -> fixed-point
    YUV->RGB -> headerless-VP8L ALPH plane) under the oracle gate —
    the independent pin for the big VP8 probability tables, inside
    the driver's correctness window rather than pytest only."""
    from pathlib import Path

    raw = (
        Path(__file__).resolve().parents[2]
        / "tests" / "fixtures" / "golden" / "python-logo.webp"
    ).read_bytes()
    media = spark.createDataFrame(
        [(0, bytearray(raw))], "media_id long, payload binary"
    )
    return M.decode_media(media, digest="hex").orderBy("media_id")


@register(
    "mm_webp_anim_frames",
    # payload = a REAL animated WebP per doc (VP8X animation flag +
    # ANIM + ANMF chunks): two lossy VP8 keyframes (the closed-form
    # flat DC frames, levels from the doc's md5) at different canvas
    # offsets/durations, then a LOSSLESS frame carrying the doc's
    # 96-byte pattern as 8x3 RGBA — the demux decodes each frame
    # through the matching still-image path and the oracle recomputes
    # geometry, timing and pixel sums in closed form. Pre-r11
    # animated WebP raised by name.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         1 + ord(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 5 AS l0,
         1 + ord(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) % 5 AS l1,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 25 = 20
), f01 AS (
  SELECT media_id, k, CASE k WHEN 0 THEN l0 ELSE l1 END AS ly
  FROM p CROSS JOIN (VALUES (0), (1)) AS v(k)
), yuv AS (
  SELECT media_id, k,
         128 + ((((ly * 42 + 3) >> 3) + 4) >> 3) AS y, 128 AS u, 128 AS v
  FROM f01
), rgb AS (
  SELECT media_id, k,
         (((y * 19077) >> 8) + ((v * 26149) >> 8) - 14234) >> 6 AS r,
         (((y * 19077) >> 8) - ((u * 6419) >> 8) - ((v * 13320) >> 8)
          + 8708) >> 6 AS g,
         (((y * 19077) >> 8) + ((u * 33050) >> 8) - 17685) >> 6 AS b
  FROM yuv
)
SELECT media_id, CAST(k AS BIGINT) AS frame_idx,
       CAST(k * 16 AS BIGINT) AS x, 0::BIGINT AS y,
       16::BIGINT AS width, 16::BIGINT AS height,
       CAST(40 * (k + 1) AS BIGINT) AS duration_ms,
       CAST(k AS BIGINT) AS blend,
       CAST((r + g + b + 255) * 256 AS BIGINT) AS pixel_sum
FROM rgb
UNION ALL
SELECT media_id, 2, 4, 2, 8, 3, 120, 0,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT)
FROM p
ORDER BY media_id, frame_idx
""",
    tags=("multimodal", "webp", "animation", "demux", "lossy"),
)
def mm_webp_anim_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-WebP frame demux under the oracle gate (r11): ANMF
    frames decode through the matching still paths (lossy VP8 and
    VP8L both appear in one animation here) with canvas geometry,
    durations and blend flags surfaced — the animated share of a
    crawl becomes frame rows, like demux_media's video samples."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators import vp8_tables as VT
    from dolphinbeat_spark.operators.vp8 import encode_vp8
    from dolphinbeat_spark.operators.webp import (
        encode_webp_anim,
        webp_anim_demux,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 20)
    def build(i):
        hx = hashlib.md5(str(i).encode()).hexdigest()
        mk = lambda ly: encode_vp8(  # noqa: E731
            16, 16, [{"ymode": VT.DC_PRED, "uvmode": VT.DC_PRED,
                      "y2": [ly] + [0] * 15}], qi=20)
        rgba = np.frombuffer((hx * 3).encode(), np.uint8).reshape(3, 8, 4)
        anim = encode_webp_anim(
            [{"vp8": mk(1 + ord(hx[0]) % 5), "duration_ms": 40},
             {"vp8": mk(1 + ord(hx[1]) % 5), "x": 16, "duration_ms": 80,
              "blend": 1},
             {"rgba": rgba, "x": 4, "y": 2, "duration_ms": 120}],
            canvas=(32, 16),
        )
        return (anim)
    media = fixture_media(d, build)
    return webp_anim_demux(media).orderBy("media_id", "frame_idx")


@register(
    "mm_webp_anim_decode",
    # payload = a REAL animated WebP per doc: canvas 8x6 with an
    # opaque background color from the doc's md5 chars, three
    # LOSSLESS frames — full-canvas solid c1, a 4x2 rect of c2 at
    # (2,2) with DISPOSE-to-background, a 2x2 rect of c3 at (0,0)
    # with blend=1. The operator composites the full canvas per the
    # container spec (RFC 9649): frame 2's canvas must show c1
    # everywhere EXCEPT frame 1's rect restored to the BACKGROUND
    # color and frame 2's own rect — the oracle rebuilds each canvas
    # pixel-by-pixel from the coordinates in closed form (hex-digest
    # contract; colors are md5-char bytes with alpha 0xff). Pre-r12
    # frames were decoded but never composited.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern,
         CAST(40 + doc_id % 60 AS BIGINT) AS dur
  FROM documents WHERE doc_id % 25 = 10
), c AS (
  SELECT media_id, dur,
         lower(hex(substr(pattern, 1, 3))) || 'ff' AS bg,
         lower(hex(substr(pattern, 4, 3))) || 'ff' AS c1,
         lower(hex(substr(pattern, 7, 3))) || 'ff' AS c2,
         lower(hex(substr(pattern, 10, 3))) || 'ff' AS c3
  FROM p
), f(frame_idx) AS (VALUES (0), (1), (2)),
px AS (
  SELECT media_id, dur, frame_idx,
         md5(array_to_string(list_transform(range(0, 48), i ->
           CASE
             WHEN frame_idx = 0 THEN c1
             WHEN frame_idx = 1 THEN
               CASE WHEN (i % 8) BETWEEN 2 AND 5
                         AND (i // 8) BETWEEN 2 AND 3
                    THEN c2 ELSE c1 END
             ELSE
               CASE WHEN (i % 8) <= 1 AND (i // 8) <= 1 THEN c3
                    WHEN (i % 8) BETWEEN 2 AND 5
                         AND (i // 8) BETWEEN 2 AND 3 THEN bg
                    ELSE c1 END
           END), '')) AS canvas_md5
  FROM c CROSS JOIN f
)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(dur + frame_idx AS BIGINT) AS duration_ms,
       8::BIGINT AS canvas_w, 6::BIGINT AS canvas_h, canvas_md5
FROM px
ORDER BY media_id, frame_idx
""",
    tags=("multimodal", "webp", "animation", "decode"),
)
def mm_webp_anim_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 animated-WebP COMPOSITING under the oracle gate
    (operators/webp.py::webp_anim_composite): ANMF frames decode
    through the still paths and assemble onto the canvas —
    background-color initialization, blend methods, and
    dispose-to-background per the container spec — so frame-sampling
    an animation yields presentable canvases, not patches. Arrow
    mapInPandas, map-only at any scale."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.webp import (
        encode_webp_anim,
        webp_anim_canvas,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 10)

    def solid(w, h, rgb):
        a = np.empty((h, w, 4), np.uint8)
        a[:, :] = rgb + (255,)
        return a

    def build(i):
        pat = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        bg, c1, c2, c3 = (tuple(pat[k:k + 3]) for k in (0, 3, 6, 9))
        bg_int = (bg[2] | bg[1] << 8 | bg[0] << 16 | 255 << 24)
        dur = 40 + i % 60
        anim = encode_webp_anim(
            [{"rgba": solid(8, 6, c1), "duration_ms": dur},
             {"rgba": solid(4, 2, c2), "x": 2, "y": 2,
              "duration_ms": dur + 1, "dispose": 1},
             {"rgba": solid(2, 2, c3), "duration_ms": dur + 2,
              "blend": 1}],
            canvas=(8, 6), bgcolor=bg_int,
        )
        return (anim)
    media = fixture_media(d, build)
    return (
        webp_anim_canvas(media)
        .select("media_id", "frame_idx", "duration_ms", "canvas_w",
                "canvas_h", "canvas_md5")
        .orderBy("media_id", "frame_idx")
    )


@register(
    "mm_video_nal_units",
    # payload = a REAL H.264 Annex-B elementary stream per doc:
    # SPS (640x480 baseline — the demux PARSES it: Exp-Golomb,
    # profile, crop -> sps_width/height), PPS, an IDR slice and two
    # non-IDR slices whose payloads slice the doc's md5 pattern.
    # SPS/PPS NAL digests are constants embedded verbatim (their
    # bytes are fixed); slice digests are hdr-byte hex + pattern hex
    # (digest='hex'; ASCII payloads need no emulation prevention).
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 27 = 22
),
s(nal_idx, nal_type, type_name, ref_idc, keyf, nb, hdr, start, sz) AS (
  VALUES (2, 5, 'idr',   3, TRUE,  31, '65', 1, 30),
         (3, 1, 'slice', 2, FALSE, 25, '41', 31, 24),
         (4, 1, 'slice', 2, FALSE, 19, '41', 55, 18)
)
SELECT media_id, CAST(nal_idx AS BIGINT) AS nal_idx,
       CAST(nal_type AS BIGINT) AS nal_type, type_name,
       CAST(ref_idc AS BIGINT) AS ref_idc, keyf AS is_keyframe,
       CAST(nb AS BIGINT) AS nal_bytes,
       md5(hdr || lower(hex(substr(pattern, start, sz)))) AS nal_md5,
       CAST(NULL AS BIGINT) AS sps_width,
       CAST(NULL AS BIGINT) AS sps_height
FROM p CROSS JOIN s
UNION ALL
SELECT media_id, 0, 7, 'sps', 3, FALSE, 9,
       'c89ddc75477c5484cb65cd3c234112f2',
       640, 480
FROM p
UNION ALL
SELECT media_id, 1, 8, 'pps', 3, FALSE, 3,
       '41f594f9cfc1cb73eae852e244a7541f',
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM p
ORDER BY media_id, nal_idx
""",
    tags=("multimodal", "video", "demux", "h264"),
)
def mm_video_nal_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H.264 Annex-B NAL demux under the oracle gate
    (operators/h264_demux.py): start-code splitting, NAL header
    classification (IDR keyframe flagging — the frame-sampling cut
    points), and a REAL SPS parse (Exp-Golomb, cropping) that
    recovers the coded pixel dimensions from the raw bitstream.
    Slice-data decode (CABAC/CAVLC) stays honestly stubbed."""
    import hashlib

    from dolphinbeat_spark.operators.h264_demux import (
        build_annexb, build_sps, nal_units,
    )

    sps = build_sps(40, 30)  # 640x480 baseline
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 27 == 22)
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        stream = build_annexb([
            (7, 3, sps),
            (8, 3, b"\x12\x34"),
            (5, 3, pattern[0:30]),
            (1, 2, pattern[30:54]),
            (1, 2, pattern[54:72]),
        ])
        return (stream)
    media = fixture_media(d, build)
    return (
        nal_units(media, digest="hex")
        .select(
            "media_id", "nal_idx", "nal_type", "type_name", "ref_idc",
            "is_keyframe", "nal_bytes", "nal_md5", "sps_width",
            "sps_height",
        )
        .orderBy("media_id", "nal_idx")
    )


@register(
    "subtitle_cues",
    # payload = a real subtitle file per doc: SRT for even doc_ids
    # (comma millisecond separator, index lines, CRLF) and WebVTT for
    # odd (header, NOTE block, cue identifiers, dot separator). Three
    # cues slice the doc's md5 pattern; the first carries <i> markup
    # the reader strips into the clean-text column. Timings are
    # closed-form in (doc_id, cue).
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id AS i,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 27 = 24
),
s(cue_idx, start_off, sz) AS (
  VALUES (1, 1, 30), (2, 31, 24), (3, 55, 20)
)
SELECT media_id,
       CASE WHEN i % 2 = 0 THEN 'srt' ELSE 'vtt' END AS fmt,
       CAST(cue_idx AS BIGINT) AS cue_idx,
       CAST((i % 50) * 1000 + cue_idx * 5000 AS BIGINT) AS start_ms,
       CAST((i % 50) * 1000 + cue_idx * 5000 + 2500 + cue_idx * 100
            AS BIGINT) AS end_ms,
       CAST((i % 50) * 1000 + cue_idx * 5000 AS DOUBLE) / 1000 AS start_s,
       CAST(2500 + cue_idx * 100 AS BIGINT) AS duration_ms,
       CASE WHEN cue_idx = 1
            THEN '<i>' || substr(pattern, start_off, sz) || '</i>'
            ELSE substr(pattern, start_off, sz) END AS raw_text,
       substr(pattern, start_off, sz) AS text
FROM p CROSS JOIN s
ORDER BY media_id, cue_idx
""",
    tags=("text", "ingest", "subtitles", "multimodal"),
)
def subtitle_cues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtitle-cue ingestion under the oracle gate — how video
    becomes text training data: SRT and WebVTT parsed distributed
    (sources/subtitles.py), emitting per-cue time spans (the join key
    against the demuxers' frame timestamps) plus raw and
    markup-stripped text."""
    import hashlib

    from dolphinbeat_spark.sources.subtitles import read_subtitles

    def ts_srt(ms):
        return (f"{ms // 3600000:02d}:{ms // 60000 % 60:02d}:"
                f"{ms // 1000 % 60:02d},{ms % 1000:03d}")

    def ts_vtt(ms):
        return (f"{ms // 3600000:02d}:{ms // 60000 % 60:02d}:"
                f"{ms // 1000 % 60:02d}.{ms % 1000:03d}")

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 27 == 24)
    spans = [(1, 0, 30), (2, 30, 24), (3, 54, 20)]
    def build(i):
        pattern = hashlib.md5(str(i).encode()).hexdigest() * 3
        cues = []
        for k, off, sz in spans:
            start = (i % 50) * 1000 + k * 5000
            end = start + 2500 + k * 100
            body = pattern[off:off + sz]
            if k == 1:
                body = f"<i>{body}</i>"
            cues.append((k, start, end, body))
        if i % 2 == 0:
            doc = "\r\n\r\n".join(
                f"{k}\r\n{ts_srt(s)} --> {ts_srt(e)}\r\n{b}"
                for k, s, e, b in cues
            ) + "\r\n"
        else:
            blocks = ["WEBVTT", "NOTE synthetic fixture"]
            blocks += [
                f"cue-{k}\n{ts_vtt(s)} --> {ts_vtt(e)}\n{b}"
                for k, s, e, b in cues
            ]
            doc = "\n\n".join(blocks) + "\n"
        return (doc.encode())
    media = fixture_media(d, build)
    return read_subtitles(media).orderBy("media_id", "cue_idx")


@register(
    "mm_decode_bmp_rle",
    # payload = an 8-bit palette BMP compressed with BI_RLE8: the
    # palette is the grayscale identity (entry i = (i,i,i)) and the
    # indices are the doc's 96 pattern chars laid out 8x12 bottom-up,
    # each row one absolute-mode run — so the decoded RGB stream is
    # every pattern char tripled, which the oracle rebuilds directly.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 29 = 13
)
SELECT media_id,
       'bmp' AS fmt,
       CAST(12 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(3 * list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1)))) AS BIGINT)
           AS pixel_sum,
       md5(string_agg(r, '' ORDER BY i)) AS pixel_md5
FROM p, LATERAL (
  SELECT i, repeat(substr(pattern, CAST(i AS INTEGER), 1), 3) AS r
  FROM range(1, 97) t(i)
)
GROUP BY media_id, pattern
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "bmp", "rle"),
)
def mm_decode_bmp_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length BMP decode under the oracle gate — the classic
    Windows palette + BI_RLE8 shape (absolute runs, EOL/EOB escapes,
    bottom-up order), previously a named refusal (only 24-bit BI_RGB
    decoded). Grayscale-identity palette makes the decoded relation
    closed-form."""
    import hashlib
    import struct

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 13)
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    def build_many(i):
        rows = []
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        grid = [pattern[y * 12:(y + 1) * 12] for y in range(8)]
        rle = bytearray()
        for y in range(7, -1, -1):  # bottom-up rows, absolute runs
            rle += bytes([0, 12]) + grid[y]  # 12 is even: no pad
            rle += bytes([0, 0])             # end of line
        rle += bytes([0, 1])                 # end of bitmap
        info = struct.pack("<IiiHHIIiiII", 40, 12, 8, 1, 8, 1,
                           len(rle), 0, 0, 256, 0)
        off = 14 + 40 + len(pal)
        hdr = struct.pack("<2sIHHI", b"BM", off + len(rle), 0, 0, off)
        rows.append((i, bytearray(hdr + info + pal + bytes(rle))))
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media).orderBy("media_id")


@register(
    "mm_id3_extract",
    # payload = a real MP3 (two MPEG frames) led by a real ID3v2 tag
    # — version 2.3 for even doc_ids (plain frame sizes) and 2.4 for
    # odd (syncsafe sizes, TDRC date), text encoding cycling
    # latin-1/UTF-8. Fields are closed-form in doc_id; the oracle
    # recomputes them directly — audio's mm_exif_extract.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id, doc_id AS i
  FROM documents WHERE doc_id % 29 = 18
)
SELECT media_id,
       CASE WHEN i % 2 = 0 THEN '2.3' ELSE '2.4' END AS version,
       'Track ' || CAST(i % 97 AS VARCHAR) AS title,
       'Artist ' || CAST(i % 13 AS VARCHAR) AS artist,
       'Album ' || CAST(i % 7 AS VARCHAR) AS album,
       CAST(1990 + i % 35 AS VARCHAR) AS date,
       CAST(1 + i % 20 AS VARCHAR) || '/20' AS track,
       'Genre' || CAST(i % 5 AS VARCHAR) AS genre,
       'c-' || CAST(i % 11 AS VARCHAR) AS comment
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "audio", "metadata", "id3"),
)
def mm_id3_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID3v2 tag extraction under the oracle gate — audio's EXIF:
    title/artist/album/date/track/genre/comment parsed from real
    v2.3 and v2.4 tag structures leading real MPEG frames
    (operators/id3.py), distributed via Arrow mapInPandas. These are
    the dedup/filter keys an audio pipeline joins on; strip_id3 is
    the matching redaction op (pinned in pytest to leave the MPEG
    frames byte-identical)."""
    from dolphinbeat_spark.operators.id3 import encode_id3, id3_extract
    from dolphinbeat_spark.operators.mp3_demux import encode_mp3_frames

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 18)
    def build(i):
        ver = 3 if i % 2 == 0 else 4
        frames = {
            "TIT2": f"Track {i % 97}",
            "TPE1": f"Artist {i % 13}",
            "TALB": f"Album {i % 7}",
            ("TYER" if ver == 3 else "TDRC"): str(1990 + i % 35),
            "TRCK": f"{1 + i % 20}/20",
            "TCON": f"Genre{i % 5}",
        }
        tag = encode_id3(frames, version=ver, comment=f"c-{i % 11}",
                         encoding=0 if i % 4 < 2 else 3)
        return (
            encode_mp3_frames(2, b"xy", id3v2=tag)
        )
    media = fixture_media(d, build)
    return id3_extract(media).orderBy("media_id")


@register(
    "mm_decode_bmp16",
    # payload = a REAL 16-bit BI_BITFIELDS 5-6-5 BMP (r10: the
    # high-color format BI_RGB 5-5-5 defaults and arbitrary masks
    # generalize): 8x4 pixels whose 5/6/5 channel values derive from
    # the doc's 96-byte md5 pattern; the oracle replays the exact
    # round-half-up 8-bit expansion (v*255 + max/2) // max per pixel
    # and pins the md5 of the hex-rendered RGB stream.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 29 = 5
), px AS (
  SELECT media_id, j,
         (ord(substr(pattern, CAST(3*j+1 AS INTEGER), 1)) % 32) AS r5,
         (ord(substr(pattern, CAST(3*j+2 AS INTEGER), 1)) % 64) AS g6,
         (ord(substr(pattern, CAST(3*j+3 AS INTEGER), 1)) % 32) AS b5
  FROM p, unnest(range(0, 32)) AS t(j)
), e AS (
  SELECT media_id, j,
         (r5 * 255 + 15) // 31 AS r8,
         (g6 * 255 + 31) // 63 AS g8,
         (b5 * 255 + 15) // 31 AS b8
  FROM px
)
SELECT media_id, 'bmp' AS fmt,
       CAST(8 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
       CAST(SUM(r8 + g8 + b8) AS BIGINT) AS pixel_sum,
       md5(string_agg(printf('%02x%02x%02x', r8, g8, b8), ''
           ORDER BY j)) AS pixel_md5
FROM e
GROUP BY media_id
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "bmp", "bitfields"),
)
def mm_decode_bmp16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit BI_BITFIELDS BMP decode under the oracle gate —
    closing the r9 named boundary: channel masks with trailing-zero
    shifts and the exact integer 8-bit expansion, through the same
    decode_media slot (digest='hex': expanded bytes are non-ASCII)."""
    import hashlib
    import struct

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 5)
    def build_many(i):
        rows = []
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        vals = []
        for j in range(32):
            r5 = pattern[3 * j] % 32
            g6 = pattern[3 * j + 1] % 64
            b5 = pattern[3 * j + 2] % 32
            vals.append((r5 << 11) | (g6 << 5) | b5)
        # 8 px/row * 2 B = 16 B rows (4-byte aligned), bottom-up
        body = b"".join(
            b"".join(struct.pack("<H", v) for v in vals[y * 8:(y + 1) * 8])
            for y in (3, 2, 1, 0)
        )
        info = struct.pack("<IiiHHIIiiII", 40, 8, 4, 1, 16, 3,
                           len(body), 0, 0, 0, 0)
        masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
        off = 14 + 40 + 12
        hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        rows.append((i, bytearray(hdr + info + masks + body)))
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media, digest="hex").orderBy("media_id")


@register(
    "mm_decode_ico",
    # payload = a REAL two-entry ICO: a 2x2 classic DIB decoy and the
    # 8x4 PNG (the doc's 96-byte md5 pattern) the largest-entry rule
    # must pick. ICO decode is ALWAYS RGBA (r10: the AND mask is the
    # alpha plane; an opaque PNG normalizes to A=255), so the oracle
    # interleaves each RGB triplet with FF and pins md5 of the hex
    # rendering (digest='hex': alpha bytes are non-ASCII).
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 29 = 22
)
SELECT media_id,
       'ico' AS fmt,
       CAST(8 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(list_sum(list_transform(range(1, 97),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1))))
            + 32 * 255 AS BIGINT) AS pixel_sum,
       md5(lower(list_aggregate(list_transform(range(0, 32),
            j -> hex(substr(pattern, CAST(3 * j + 1 AS INTEGER), 3))
                 || 'FF'), 'string_agg', ''))) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "ico"),
)
def mm_decode_ico(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICO (favicon) decode under the oracle gate: directory walk,
    largest-entry selection, and both embedded layouts (PNG by magic,
    classic doubled-height DIB via the BMP matrix) through the same
    decode_media slot — RGBA output, opaque alpha normalized in."""
    import hashlib
    import struct

    from dolphinbeat_spark.operators.multimodal import encode_png

    def build_ico(entries):
        out = bytearray(b"\x00\x00\x01\x00"
                        + struct.pack("<H", len(entries)))
        off = 6 + 16 * len(entries)
        for w, h, blob in entries:
            out += bytes([w % 256, h % 256, 0, 0])
            out += struct.pack("<HHII", 1, 32, len(blob), off)
            off += len(blob)
        for _, _, blob in entries:
            out += blob
        return bytes(out)

    dib = (struct.pack("<IiiHHIIiiII", 40, 2, 4, 1, 24, 0, 0, 0, 0, 0, 0)
           + bytes(16) + bytes(8))  # 2x2 black + AND mask
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 22)
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        png = encode_png(8, 4, pattern, color_type=2,
                         row_filters=[0, 1, 2, 3])
        return (build_ico([(2, 2, dib), (8, 4, png)]))
    media = fixture_media(d, build)
    return M.decode_media(media, digest="hex").orderBy("media_id")


@register(
    "mm_decode_ico_mask",
    # payload = a single-entry classic-DIB ICO: a 4x4 24-bit XOR image
    # from the doc pattern's first 48 bytes, followed by a REAL 1-bit
    # AND mask making pixel (r,c) transparent iff (r+c) is even — the
    # checkerboard every masked favicon reduces to. The oracle
    # rebuilds the RGBA byte stream (alpha 00/FF per the mask) and
    # pins md5 of its hex rendering; pre-r10 the mask was dropped and
    # two icons differing only in transparency hashed identically.
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 29 = 13
)
SELECT media_id,
       'ico' AS fmt,
       CAST(4 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(list_sum(list_transform(range(1, 49),
            i -> ord(substr(pattern, CAST(i AS INTEGER), 1))))
            + 8 * 255 AS BIGINT) AS pixel_sum,
       md5(lower(list_aggregate(list_transform(range(0, 16),
            j -> hex(substr(pattern, CAST(3 * j + 1 AS INTEGER), 3))
                 || CASE WHEN ((j // 4) + (j % 4)) % 2 = 0
                         THEN '00' ELSE 'FF' END),
            'string_agg', ''))) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "ico", "alpha"),
)
def mm_decode_ico_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICO AND-mask transparency under the oracle gate: the 1-bit
    mask rows (32-bit-padded, bottom-up, after the XOR rows) become
    the alpha plane — closing the r9 verdict's item 7."""
    import hashlib
    import struct

    def build_ico(blob, w, h):
        out = bytearray(b"\x00\x00\x01\x00" + struct.pack("<H", 1))
        out += bytes([w % 256, h % 256, 0, 0])
        out += struct.pack("<HHII", 1, 32, len(blob), 6 + 16)
        return bytes(out) + blob

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 13)
    def build_many(i):
        rows = []
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        rgb = pattern[:48]
        # XOR rows: bottom-up, BGR; 4px * 3B = 12B row, 4-byte aligned
        xor = b"".join(
            b"".join(rgb[(r * 4 + c) * 3:(r * 4 + c) * 3 + 3][::-1]
                     for c in range(4))
            for r in (3, 2, 1, 0)
        )
        # AND mask: bit 1 = transparent at (r+c) even; bottom-up rows
        mask = b"".join(
            bytes([0xA0 if r % 2 == 0 else 0x50, 0, 0, 0])
            for r in (3, 2, 1, 0)
        )
        dib = struct.pack("<IiiHHIIiiII", 40, 4, 8, 1, 24,
                          0, 0, 0, 0, 0, 0) + xor + mask
        rows.append((i, bytearray(build_ico(dib, 4, 4))))
        return rows
    media = fixture_media_multi(d, build_many)
    return M.decode_media(media, digest="hex").orderBy("media_id")


# the 89-entry IMA step table + 16-entry index table as SQL array
# literals (public: IMA RP / RFC 3551 §4.5.1) — the oracle replays the
# ADPCM recursion itself in a recursive CTE, fully independent of the
# Python decoder
_IMA_STEPS_SQL = (
    "[7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50,55,60,66,"
    "73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,307,337,371,"
    "408,449,494,544,598,658,724,796,876,963,1060,1166,1282,1411,1552,1707,"
    "1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,"
    "7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,20350,"
    "22385,24623,27086,29794,32767]"
)
_IMA_INDEX_SQL = "[-1,-1,-1,-1,2,4,6,8,-1,-1,-1,-1,2,4,6,8]"


@register(
    "mm_decode_wav_adpcm",
    # payload = a REAL IMA/DVI ADPCM WAV (wFormatTag 0x11): one
    # 20-byte block — 4-byte header (initial predictor/step index
    # derived from the doc's md5) + 16 data bytes whose 32 nibbles ARE
    # the md5 hex digits. The oracle replays the published ADPCM
    # recursion itself (step/index tables as literals, clamping
    # included) in a RECURSIVE CTE and rebuilds the int16-LE hex
    # stream for the digest — a fully independent second
    # implementation of the codec
    oracle=f"""
WITH RECURSIVE init AS (
  SELECT doc_id AS media_id,
         md5(CAST(doc_id AS VARCHAR)) AS hx,
         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 256 - 2048 AS p0,
         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 5 AS i0
  FROM documents WHERE doc_id % 23 = 6
),
dec(media_id, k, pred, idx, acc, ssum) AS (
  SELECT media_id, 0, p0, i0,
         printf('%02x%02x', p0 & 255, (p0 >> 8) & 255), p0
  FROM init
  UNION ALL
  SELECT media_id, k + 1, pred2, idx2,
         acc || printf('%02x%02x', pred2 & 255, (pred2 >> 8) & 255),
         ssum + pred2
  FROM (
    SELECT media_id, k, acc, ssum,
           greatest(-32768, least(32767, pred + CASE WHEN nb & 8 > 0 THEN -mag ELSE mag END)) AS pred2,
           greatest(0, least(88, idx + ({_IMA_INDEX_SQL})[nb + 1])) AS idx2
    FROM (
      SELECT d.media_id, d.k, d.pred, d.idx, d.acc, d.ssum, d.nb,
             (d.st >> 3)
             + CASE WHEN d.nb & 1 > 0 THEN d.st >> 2 ELSE 0 END
             + CASE WHEN d.nb & 2 > 0 THEN d.st >> 1 ELSE 0 END
             + CASE WHEN d.nb & 4 > 0 THEN d.st ELSE 0 END AS mag
      FROM (
        SELECT dec.*,
               strpos('0123456789abcdef', substr(init.hx, dec.k + 1, 1)) - 1 AS nb,
               ({_IMA_STEPS_SQL})[dec.idx + 1] AS st
        FROM dec JOIN init USING (media_id)
        WHERE dec.k < 32
      ) d
    ) d2
  ) d3
)
SELECT media_id,
       'wav' AS fmt,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(33 AS BIGINT) AS n_samples,
       CAST(33 AS DOUBLE) / 8000 AS duration_s,
       CAST(ssum AS BIGINT) AS sample_sum,
       md5(acc) AS sample_md5
FROM dec WHERE k = 32
ORDER BY media_id
""",
    tags=("multimodal", "decode", "audio", "codec", "adpcm"),
)
def mm_decode_wav_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED audio decode under the oracle gate: IMA/DVI ADPCM
    (WAV wFormatTag 0x11) — 4-bit block-coded audio decoded from
    scratch per the public IMA recursion (operators/multimodal.py
    ``_ima_decode_data``). The DuckDB oracle re-implements the same
    published recursion as a recursive CTE over the step/index table
    literals — two independent codecs must agree on every int16
    sample (digest over the hex rendering, since DuckDB's md5 takes
    VARCHAR only). De-stubs the compressed-audio slot the way PNG/GIF
    de-stubbed compressed images."""
    import hashlib
    import struct

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 23 == 6)
    def build(i):
        hx = hashlib.md5(str(i).encode()).hexdigest()
        nibbles = [int(c, 16) for c in hx]
        p0 = nibbles[0] * 256 - 2048
        i0 = nibbles[1] * 5
        body = bytes(
            nibbles[2 * j] | (nibbles[2 * j + 1] << 4) for j in range(16)
        )
        block = struct.pack("<hBB", p0, i0, 0) + body
        fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 4849, 20, 4, 2, 33)
        wavb = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 20) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 20) + block
        )
        return (wavb)
    media = fixture_media(d, build)
    return M.decode_audio(media, digest="hex").orderBy("media_id")


@register(
    "mm_video_demux",
    # payload = a REAL two-track ISO-BMFF (MP4) container written by
    # operators/mp4_demux.py::encode_mp4 — interleaved chunks, a
    # multi-entry sample-to-chunk map, and a 'raw ' video track whose
    # 6 samples partition the doc's 96-byte md5 pattern (sizes
    # 10/20/14/16/16/20) — plus a 'twos' PCM audio track the spec's
    # handler filter must skip. The oracle recomputes each sample's
    # byte range directly from the pattern
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 21 = 8
),
s(sample_idx, start, sz) AS (
  VALUES (0, 1, 10), (1, 11, 20), (2, 31, 14),
         (3, 45, 16), (4, 61, 16), (5, 77, 20)
)
SELECT media_id,
       CAST(1 AS BIGINT) AS track_id,
       'vide' AS handler,
       'raw ' AS codec,
       CAST(sample_idx AS BIGINT) AS sample_idx,
       CAST(sample_idx * 100 AS BIGINT) AS dts,
       CAST(sample_idx AS DOUBLE) / 10 AS dts_s,
       CAST(sz AS BIGINT) AS sample_bytes,
       md5(substr(pattern, start, sz)) AS sample_md5
FROM p CROSS JOIN s
ORDER BY media_id, sample_idx
""",
    tags=("multimodal", "video", "demux"),
)
def mm_video_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO container demux under the oracle gate (closing the
    'video: raise by name' boundary at the container level —
    operators/mp4_demux.py, ISO/IEC 14496-12 from scratch): every
    video sample's track/codec/dts/size/digest recovered from a real
    MP4 box structure with interleaved chunks and a second (audio)
    track that the handler filter must skip. Codec BITSTREAM decode
    stays honestly stubbed (no codec libs); the byte-range extraction
    demux performs here is the real 100 TB primitive (ship ranges to
    a GPU decode stage, dedup by frame hash)."""
    import hashlib

    from dolphinbeat_spark.operators.mp4_demux import demux_media, encode_mp4

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 21 == 8)
    sizes = [10, 20, 14, 16, 16, 20]
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        vid, pos = [], 0
        for sz in sizes:
            vid.append(pattern[pos:pos + sz])
            pos += sz
        aud = [pattern[8 * j:8 * j + 8] for j in range(4)]
        payload = encode_mp4(
            [
                {"handler": "vide", "codec": "raw ", "timescale": 1000,
                 "width": 8, "height": 4, "samples": vid,
                 "deltas": [100] * 6, "chunk_sizes": [2, 2, 2]},
                {"handler": "soun", "codec": "twos", "timescale": 8000,
                 "channels": 1, "samples": aud, "deltas": [4] * 4,
                 "chunk_sizes": [2, 2]},
            ]
        )
        return (payload)
    media = fixture_media(d, build)
    return (
        demux_media(media, handler="vide")
        .select(
            "media_id", "track_id", "handler", "codec", "sample_idx",
            "dts", "dts_s", "sample_bytes", "sample_md5",
        )
        .orderBy("media_id", "sample_idx")
    )


@register(
    "mm_video_demux_fragmented",
    # same sample content as mm_video_demux but written FRAGMENTED
    # (fMP4: init segment + moof/mdat pairs, tfdt anchors, trun
    # per-sample tables) — the layout streaming video ships; the
    # demuxed relation must be identical to the classic layout's
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 27 = 11
),
s(sample_idx, start, sz) AS (
  VALUES (0, 1, 10), (1, 11, 20), (2, 31, 14),
         (3, 45, 16), (4, 61, 16), (5, 77, 20)
)
SELECT media_id,
       CAST(1 AS BIGINT) AS track_id,
       'vide' AS handler,
       'raw ' AS codec,
       CAST(sample_idx AS BIGINT) AS sample_idx,
       CAST(sample_idx * 100 AS BIGINT) AS dts,
       CAST(sample_idx AS DOUBLE) / 10 AS dts_s,
       CAST(sz AS BIGINT) AS sample_bytes,
       md5(substr(pattern, start, sz)) AS sample_md5
FROM p CROSS JOIN s
ORDER BY media_id, sample_idx
""",
    tags=("multimodal", "video", "demux", "fragmented"),
)
def mm_video_demux_fragmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRAGMENTED MP4 demux under the oracle gate: the same six 'raw '
    video samples as mm_video_demux, but written as an fMP4 init
    segment + three moof/mdat fragments (mvex/trex defaults,
    default-base-is-moof tfhd, tfdt decode-time anchors, explicit
    trun sample tables). A demuxer that only reads classic stbl
    tables sees ZERO samples here — this spec pins the fragment walk
    (ISO/IEC 14496-12 §8.8) against the identical expected relation."""
    import hashlib

    from dolphinbeat_spark.operators.mp4_demux import demux_media, encode_mp4

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 27 == 11)
    sizes = [10, 20, 14, 16, 16, 20]
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        vid, pos = [], 0
        for sz in sizes:
            vid.append(pattern[pos:pos + sz])
            pos += sz
        payload = encode_mp4(
            [
                {"handler": "vide", "codec": "raw ", "timescale": 1000,
                 "width": 8, "height": 4, "samples": vid,
                 "deltas": [100] * 6},
            ],
            fragments=2,
        )
        return (payload)
    media = fixture_media(d, build)
    return (
        demux_media(media, handler="vide")
        .select(
            "media_id", "track_id", "handler", "codec", "sample_idx",
            "dts", "dts_s", "sample_bytes", "sample_md5",
        )
        .orderBy("media_id", "sample_idx")
    )


@register(
    "mm_decode_jpeg12",
    # payload = a REAL 12-bit EXTENDED SEQUENTIAL JPEG (SOF1, 16-bit
    # DQT, level shift 2048) of a FLAT 16x8 grayscale image with
    # v = 2048 + 2*((ord(first md5 hex char) % 64) - 32) — an even
    # offset from 2048, so the lone DC coefficient quantizes
    # losslessly and the decode returns exactly v in every uint16
    # pixel; the oracle rebuilds the little-endian hex stream for the
    # digest (DuckDB md5 takes VARCHAR only — same contract as
    # mm_decode_wav_adpcm)
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         2048 + 2 * ((ord(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 64) - 32) AS v
  FROM documents WHERE doc_id % 29 = 9
)
SELECT media_id,
       'jpeg' AS fmt,
       CAST(16 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(128 * v AS BIGINT) AS pixel_sum,
       md5(repeat(printf('%02x%02x', v & 255, (v >> 8) & 255), 128)) AS pixel_md5
FROM p
ORDER BY media_id
""",
    tags=("multimodal", "decode", "codec", "12bit"),
)
def mm_decode_jpeg12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-BIT JPEG decode under the oracle gate (the medical/
    scientific-imaging precision, previously a named refusal): SOF1
    extended sequential with 16-bit quantization tables and level
    shift 2048, decoded to uint16 pixels by the same from-scratch
    T.81 machinery as the 8-bit paths (operators/jpeg.py). Flat even
    values make the decoded relation closed-form; the digest is over
    the hex rendering of the little-endian uint16 stream
    (decode_media digest='hex')."""
    import hashlib

    import numpy as np

    from dolphinbeat_spark.operators.jpeg import encode_jpeg

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 9)
    def build(i):
        v = 2048 + 2 * ((ord(hashlib.md5(str(i).encode()).hexdigest()[0]) % 64) - 32)
        px = np.full(16 * 8, v, dtype="<u2").tobytes()
        return (encode_jpeg(16, 8, px, gray=True,
                                              precision=12))
    media = fixture_media(d, build)
    return M.decode_media(media, digest="hex").orderBy("media_id")


@register(
    "mm_decode_wav_ulaw",
    # payload = a G.711 µ-law WAV (wFormatTag 7) whose 96 sample bytes
    # are the doc's md5 pattern; the oracle expands each byte with the
    # published G.711 µ-law formula directly in SQL (complement, 3-bit
    # exponent, 4-bit mantissa, bias 132) and rebuilds the int16-LE
    # hex stream for the digest — a second independent implementation
    # of the codec (the Python side's table is additionally pinned
    # against the stdlib audioop reference in tests)
    oracle="""
WITH p AS (
  SELECT doc_id AS media_id,
         repeat(md5(CAST(doc_id AS VARCHAR)), 3) AS pattern
  FROM documents WHERE doc_id % 31 = 12
),
s1 AS (
  SELECT media_id, i,
         255 - ord(substr(pattern, CAST(i AS INTEGER), 1)) AS u
  FROM p, range(1, 97) t(i)
),
s2 AS (
  SELECT media_id, i, u, (u >> 4) & 7 AS e, u & 15 AS m FROM s1
),
s3 AS (
  SELECT media_id, i,
         CASE WHEN u & 128 > 0
              THEN -((((m << 3) + 132) << e) - 132)
              ELSE (((m << 3) + 132) << e) - 132 END AS v
  FROM s2
)
SELECT media_id,
       'wav' AS fmt,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(96 AS BIGINT) AS n_samples,
       CAST(96 AS DOUBLE) / 8000 AS duration_s,
       CAST(SUM(v) AS BIGINT) AS sample_sum,
       md5(string_agg(printf('%02x%02x', v & 255, (v >> 8) & 255),
                      '' ORDER BY i)) AS sample_md5
FROM s3
GROUP BY media_id
ORDER BY media_id
""",
    tags=("multimodal", "decode", "audio", "codec", "g711"),
)
def mm_decode_wav_ulaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 µ-law telephony-audio decode under the oracle gate
    (wFormatTag 7 — previously a named refusal): logarithmic
    companding expanded to int16 via the published G.711 formula,
    which the DuckDB oracle re-implements per sample in plain SQL.
    The A-law twin (wFormatTag 6, inverted sign convention) is
    table-pinned against the stdlib audioop reference in
    tests/test_multimodal.py."""
    import hashlib
    import struct

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 31 == 12)
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    def build(i):
        pattern = (hashlib.md5(str(i).encode()).hexdigest() * 3).encode()
        wavb = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 96) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 96) + pattern
        )
        return (wavb)
    media = fixture_media(d, build)
    return M.decode_audio(media, digest="hex").orderBy("media_id")
