"""AES from scratch (operators/aes.py, FIPS-197) + the WinZip AE-x
ZIP and PDF AESV2 integrations (r11).

Pins, strongest first: the FIPS-197 Appendix C known-answer vectors
for all three key sizes, NIST SP 800-38A CBC/CTR mode vectors, and —
when the ``cryptography`` package is importable — a randomized
cross-pin against an independent industry implementation.
"""

from __future__ import annotations

import pytest

from dolphinbeat_spark.operators.aes import (
    AES,
    AesError,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_ctr,
)


def test_fips197_known_answers():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for klen, want in ((16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
                       (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
                       (32, "8ea2b7ca516745bfeafc49904b496089")):
        key = bytes(range(klen))
        ct = AES(key).encrypt_block(pt)
        assert ct.hex() == want, klen
        assert AES(key).decrypt_block(ct) == pt


def test_sp800_38a_mode_vectors():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    ct1 = aes_cbc_encrypt(key, iv, pt1, add_padding=False)
    assert ct1.hex() == "7649abac8119b246cee98e9b12e9197d"
    assert aes_cbc_decrypt(key, iv, ct1, strip_padding=False) == pt1
    ctr0 = int.from_bytes(
        bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff"), "big")
    assert aes_ctr(key, pt1, initial=ctr0).hex() == \
        "874d6191b620e3261bef6864990db6ce"


def test_cross_pin_against_cryptography():
    """Randomized agreement with an independent industry AES when the
    cryptography package is present (it ships in this environment's
    interpreter; skip-free fallback keeps the suite green without
    it)."""
    try:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes,
        )
    except ImportError:  # pragma: no cover
        return
    import numpy as np

    rng = np.random.RandomState(9)
    for klen in (16, 24, 32):
        for _ in range(20):
            key = rng.bytes(klen)
            block = rng.bytes(16)
            ref = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
            want = ref.update(block) + ref.finalize()
            assert AES(key).encrypt_block(block) == want
        # CBC over multi-block data
        key = rng.bytes(16)
        iv = rng.bytes(16)
        data = rng.bytes(160)
        ref = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
        want = ref.update(data) + ref.finalize()
        assert aes_cbc_encrypt(key, iv, data, add_padding=False) == want


def test_padding_and_errors():
    key = bytes(16)
    iv = bytes(16)
    blob = aes_cbc_encrypt(key, iv, b"short msg")
    assert aes_cbc_decrypt(key, iv, blob) == b"short msg"
    with pytest.raises(AesError, match="padding"):
        aes_cbc_decrypt(bytes([1]) * 16, iv, blob)  # wrong key
    with pytest.raises(AesError, match="key"):
        AES(bytes(10))
    with pytest.raises(AesError, match="block multiple"):
        aes_cbc_decrypt(key, iv, bytes(10))


def test_zip_winzip_aes_members():
    """WinZip AE-2 across all three strengths × stored/deflate ×
    classic/Zip64; wrong password fails on the PBKDF2 verifier,
    tampered ciphertext on the HMAC — both BEFORE decompression."""
    from dolphinbeat_spark.sources.archives import (
        ArchiveError, encode_zip, iter_zip_members,
    )

    members = [("a.txt", b"alpha secret data"),
               ("b/c.bin", bytes(range(200)))]
    for strength in (1, 2, 3):
        for deflate in (True, False):
            z = encode_zip(members, deflate=deflate,
                           password=b"hunter2", aes=strength)
            assert list(iter_zip_members(z, password=b"hunter2")) \
                == members, (strength, deflate)
    z = encode_zip(members, zip64=True, password=b"pw", aes=3)
    assert list(iter_zip_members(z, password=b"pw")) == members
    with pytest.raises(ArchiveError, match="wrong password"):
        list(iter_zip_members(z, password=b"nope"))
    with pytest.raises(NotImplementedError, match="password="):
        list(iter_zip_members(z))
    # flip one ciphertext byte -> authentication code mismatch
    bad = bytearray(encode_zip(members, password=b"pw", aes=1))
    bad[80] ^= 0xFF
    with pytest.raises(ArchiveError, match="wrong password|mismatch"):
        list(iter_zip_members(bytes(bad), password=b"pw"))


def test_pdf_aesv2_roundtrip():
    """PDF AESV2 (V4 R4, §7.6.2): IV-prefixed AES-128-CBC over
    streams AND strings with the sAlT object-key derivation, across
    classic/stream xref, Type0 fonts and embedded DCT images; AESV3
    still raises by name."""
    from dolphinbeat_spark.operators.jpeg import encode_jpeg
    from dolphinbeat_spark.operators.pdf import (
        encode_pdf, extract_pdf_images, extract_pdf_text,
    )

    pages = [["aes secret line"], ["page two"]]
    for xs in (False, True):
        for uni in (False, True):
            pdf = encode_pdf(pages, title="Tïtle", xref_stream=xs,
                             encrypt="aes-128", unicode_text=uni)
            assert b"aes secret" not in pdf
            d = extract_pdf_text(pdf)
            assert d.pages == ["aes secret line", "page two"]
            assert d.title == "Tïtle", (xs, uni)
    jb = encode_jpeg(16, 8, bytes([84]) * 128, gray=True)
    pdf = encode_pdf([["scan"]], encrypt="aes-128",
                     images=[[("jpeg", 16, 8, 1, jb)]])
    (im,) = extract_pdf_images(pdf)
    assert im.pixels == bytes([84]) * 128
    # a V5 header around an AESV2 crypt filter is inconsistent and
    # raises by name (same-length /R swap keeps the xref valid)
    blob = encode_pdf([["x"]], encrypt="aes-128")
    v5 = blob.replace(b"/V 4 /R 4", b"/V 5 /R 6")
    with pytest.raises(NotImplementedError, match="AESV3"):
        extract_pdf_text(v5)


def test_pdf_aesv3_roundtrip():
    """AESV3 (V5 R6, PDF 2.0 §7.6.4): Algorithm 2.B iterated password
    hash, /UE file-key unwrap (AES-256-CBC, zero IV), /Perms block
    verification, file-key-per-object encryption — the modern
    Acrobat-X+ layout. Tampered /U fails the empty-password check by
    name; a corrupted /Perms is a typed PdfError."""
    from dolphinbeat_spark.operators.pdf import (
        PdfError, encode_pdf, extract_pdf_images, extract_pdf_text,
    )

    pages = [["aes256 secret"], ["page two"]]
    for xs in (False, True):
        for uni in (False, True):
            pdf = encode_pdf(pages, title="Tïtle", xref_stream=xs,
                             encrypt="aes-256", unicode_text=uni)
            assert b"aes256 secret" not in pdf
            d = extract_pdf_text(pdf)
            assert d.pages == ["aes256 secret", "page two"], (xs, uni)
            assert d.title == "Tïtle"
    from dolphinbeat_spark.operators.jpeg import encode_jpeg

    jb = encode_jpeg(16, 8, bytes([84]) * 128, gray=True)
    pdf = encode_pdf([["scan"]], encrypt="aes-256",
                     images=[[("jpeg", 16, 8, 1, jb)]])
    (im,) = extract_pdf_images(pdf)
    assert im.pixels == bytes([84]) * 128
    blob = encode_pdf([["x"]], encrypt="aes-256")
    i = blob.index(b"/U (")
    bad = bytearray(blob)
    bad[i + 4] ^= 0xFF
    with pytest.raises(NotImplementedError, match="password-protected"):
        extract_pdf_text(bytes(bad))
    j = blob.index(b"/Perms (")
    bad = bytearray(blob)
    bad[j + 8] ^= 0xFF
    try:
        extract_pdf_text(bytes(bad))
    except (PdfError, NotImplementedError):
        pass  # typed — flipping may also hit an escape byte


def test_pdf_aesv2_hostile_bytes():
    import numpy as np

    from dolphinbeat_spark.operators.pdf import (
        PdfError, encode_pdf, extract_pdf_text,
    )

    rng = np.random.RandomState(47)
    good = encode_pdf([["crypt body"]], title="T", encrypt="aes-128",
                      xref_stream=True)
    for _ in range(120):
        data = bytearray(good)
        i = int(rng.randint(0, len(data)))
        data[i] ^= 1 << int(rng.randint(0, 8))
        try:
            extract_pdf_text(bytes(data))
        except (PdfError, NotImplementedError):
            pass
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"untyped crash on corrupted AES PDF: {ex!r}")
