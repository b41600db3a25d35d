"""Multimodal plumbing tests: binary columns, Arrow batches, stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dolphinbeat_spark.operators import multimodal as M


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world " * 10), (2, "tiny"), (3, "frame " * 40)], ["doc_id", "text"]
    )
    return M.attach_binary_payload(docs, "doc_id", "text")


def test_payload_schema_and_bytes(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "media_type", "payload", "meta_width", "meta_height", "meta_duration_ms",
    ]
    row = media.filter(F.col("media_id") == 2).first()
    assert bytes(row["payload"]) == b"tiny"


def test_feature_extraction_arrow(media):
    feats = {r["media_id"]: r for r in M.extract_binary_features(media).collect()}
    assert feats[2]["n_bytes"] == 4
    assert feats[2]["sha256_16"] == hashlib.sha256(b"tiny").hexdigest()[:16]


def test_frame_sampling(media):
    frames = M.frame_sample_plan(media, frame_bytes=32, every=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append((r["frame_idx"], r["byte_offset"]))
    # doc 3: 240 bytes → 7 frames (0..6), every 4th → idx 0 and 4
    assert by_id[3] == [(0, 0), (4, 128)]
    # tiny doc still yields frame 0 (greatest(n-1, 0) floor)
    assert by_id[2] == [(0, 0)]


def test_decode_stub_is_honest(media):
    with pytest.raises(NotImplementedError, match="codec"):
        M.decode_media_stub(media).collect()
    fake = {r["media_id"]: r["fake_pixel_checksum"] for r in
            M.decode_media_stub(media, allow_fake=True).collect()}
    # deterministic fake: sha256-derived
    expected = int.from_bytes(hashlib.sha256(b"tiny").digest()[:6], "big")
    assert fake[2] == expected


def test_resize_plumbing(media):
    from dolphinbeat_spark.operators.multimodal import resize_media

    import pytest

    with pytest.raises(NotImplementedError):
        resize_media(media, 16, 16).collect()

    rows = resize_media(media, 16, 16, allow_fake=True).collect()
    assert len(rows) == media.count()
    for r in rows:
        assert r["out_width"] <= 16
        assert r["out_height"] == 16
        # fake resize must actually shrink payloads beyond the target
        assert len(r["resized_payload"]) <= 2 * 16 + 1
    # deterministic across runs
    again = resize_media(media, 16, 16, allow_fake=True).collect()
    assert sorted((r["media_id"], bytes(r["resized_payload"])) for r in rows) == sorted(
        (r["media_id"], bytes(r["resized_payload"])) for r in again
    )
