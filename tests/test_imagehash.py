"""Perceptual image hashing + banded near-dup joins (r13,
operators/imagehash.py): dhash64 closed form and invariances, the
distributed decode+hash pass over mixed formats, and the banded
Hamming pair join's LSH contract."""

import numpy as np
import pytest

from dolphinbeat_spark.operators.imagehash import (
    dhash64,
    dhash_near_dup_pairs,
    image_dhash,
)


def _block_img(vals: np.ndarray, cell: int = 5) -> np.ndarray:
    return np.repeat(np.repeat(vals, cell, axis=0), cell,
                     axis=1).astype(np.uint8)


def test_dhash64_closed_form_and_invariances():
    rng = np.random.RandomState(1)
    vals = rng.randint(0, 220, (8, 9))
    img = _block_img(vals)
    want = 0
    for r in range(8):
        for c in range(8):
            want = (want << 1) | int(vals[r, c + 1] > vals[r, c])
    if want >= 1 << 63:
        want -= 1 << 64
    h = dhash64(img)
    assert h == want
    # gradient bits survive brightness shifts, 2x scaling, and RGB
    # wrapping — the properties the near-dup join leans on
    assert dhash64(img.astype(int) + 25) == h  # no saturation
    assert dhash64(np.repeat(np.repeat(img, 2, 0), 2, 1)) == h
    assert dhash64(np.dstack([img] * 3)) == h
    # a real content change flips bits
    other = _block_img(rng.randint(0, 256, (8, 9)))
    assert dhash64(other) != h
    with pytest.raises(ValueError, match="2D/3D"):
        dhash64(np.zeros((0, 0)))


def test_image_dhash_and_near_dup_pairs_spark(spark):
    """Decode+hash over mixed real formats (PNG and BMP of the SAME
    pixels must collide exactly); the banded join finds planted
    near-dups and respects the LSH share-a-band contract."""
    from dolphinbeat_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
    )

    rng = np.random.RandomState(7)
    rows = []
    hashes = {}
    for k in range(6):
        vals = rng.randint(0, 256, (8, 9))
        img = _block_img(vals)
        rgb = np.dstack([img] * 3).tobytes()
        rows.append((2 * k, bytearray(encode_png(45, 40, rgb))))
        # near-dup partner: same image re-encoded in ANOTHER format
        rows.append((2 * k + 1, bytearray(encode_bmp(45, 40, rgb))))
        hashes[2 * k] = dhash64(img)
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hdf = image_dhash(df)
    got = {r.media_id: (r.fmt, r.dhash) for r in hdf.collect()}
    assert len(got) == 12
    for k in range(6):
        assert got[2 * k] == ("png", hashes[2 * k])
        assert got[2 * k + 1] == ("bmp", hashes[2 * k])
    pairs = dhash_near_dup_pairs(hdf, max_dist=0).collect()
    found = {(p.media_a, p.media_b) for p in pairs}
    # every planted pair present (identical hash -> all bands match)
    for k in range(6):
        assert (2 * k, 2 * k + 1) in found
    for p in pairs:
        assert p.hamming_dist == 0
    # LSH contract: a pair differing in EVERY band is not a candidate
    base = dhash64(_block_img(rng.randint(0, 256, (8, 9))))
    flipped = base
    for band in range(4):
        flipped ^= 1 << (16 * band + 3)
    two = spark.createDataFrame(
        [(100, base), (101, flipped)], "media_id long, dhash long")
    assert dhash_near_dup_pairs(two, max_dist=10).count() == 0
    # ...but the same distance concentrated in one band IS found
    conc = base ^ 0b1111
    two2 = spark.createDataFrame(
        [(100, base), (101, conc)], "media_id long, dhash long")
    (p,) = dhash_near_dup_pairs(two2, max_dist=10).collect()
    assert p.hamming_dist == 4
