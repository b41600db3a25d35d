"""AES (FIPS-197) from scratch, with the two modes the ingest layer
needs: CTR (WinZip AE-x encrypted ZIP members) and CBC (PDF AESV2
string/stream encryption).

The S-box is GENERATED from its algebraic definition (multiplicative
inverse in GF(2^8) mod the Rijndael polynomial x^8+x^4+x^3+x+1,
followed by the affine transform) rather than transcribed — the
FIPS-197 Appendix C known-answer vectors for all three key sizes and
the NIST SP 800-38A mode vectors pin the whole construction in
tests/test_aes_crypto.py.

This is a DECRYPT-side library for corpus ingestion (bulk-decrypting
archived datasets a pipeline legitimately holds keys for); encrypt
exists for fixtures. Pure Python over 16-byte blocks — encrypted
members are the rare path, and the per-file work rides inside the
same Arrow-parallel ingest tasks as the codecs.
"""

from __future__ import annotations


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x11B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverses via exhaustive product (8-bit field)
    inv = [0] * 256
    for a in range(1, 256):
        for b in range(1, 256):
            if _gmul(a, b) == 1:
                inv[a] = b
                break
    sbox = bytearray(256)
    for a in range(256):
        x = inv[a]
        y = x
        for _ in range(4):  # affine transform: x ^ rotl1..4 ^ 0x63
            y = ((y << 1) | (y >> 7)) & 0xFF
            x ^= y
        sbox[a] = x ^ 0x63
    invbox = bytearray(256)
    for i, v in enumerate(sbox):
        invbox[v] = i
    return bytes(sbox), bytes(invbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [1]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))

# per-factor multiplication tables: MixColumns runs per 16-byte block
# per round, so byte-wise field multiplies dominate the pure-Python
# profile — table lookups keep the hot loop allocation-free
_M2 = bytes(_gmul(i, 2) for i in range(256))
_M3 = bytes(_gmul(i, 3) for i in range(256))
_M9 = bytes(_gmul(i, 9) for i in range(256))
_M11 = bytes(_gmul(i, 11) for i in range(256))
_M13 = bytes(_gmul(i, 13) for i in range(256))
_M14 = bytes(_gmul(i, 14) for i in range(256))


class AesError(ValueError):
    """Typed AES usage error (bad key/IV/padding sizes)."""


class AES:
    """The block cipher: 128/192/256-bit keys, 16-byte blocks."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise AesError(f"AES key must be 16/24/32 bytes, got {len(key)}")
        nk = len(key) // 4
        self.nr = nk + 6
        words = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
        for i in range(nk, 4 * (self.nr + 1)):
            t = list(words[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]
                t = [_SBOX[b] for b in t]
                t[0] ^= _RCON[i // nk - 1]
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            words.append([a ^ b for a, b in zip(words[i - nk], t)])
        # round keys as 16-byte lists
        self.rk = [sum((words[4 * r + c] for c in range(4)), [])
                   for r in range(self.nr + 1)]

    @staticmethod
    def _add(state: list[int], rk: list[int]) -> None:
        for i in range(16):
            state[i] ^= rk[i]

    def encrypt_block(self, block: bytes) -> bytes:
        if len(block) != 16:
            raise AesError("AES block must be 16 bytes")
        s = list(block)
        self._add(s, self.rk[0])
        for rnd in range(1, self.nr + 1):
            s = [_SBOX[b] for b in s]
            # ShiftRows (column-major state: byte i sits at row i%4)
            s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
            if rnd != self.nr:
                t = []
                for c in range(4):
                    a0, a1, a2, a3 = s[4 * c:4 * c + 4]
                    t += [
                        _M2[a0] ^ _M3[a1] ^ a2 ^ a3,
                        a0 ^ _M2[a1] ^ _M3[a2] ^ a3,
                        a0 ^ a1 ^ _M2[a2] ^ _M3[a3],
                        _M3[a0] ^ a1 ^ a2 ^ _M2[a3],
                    ]
                s = t
            self._add(s, self.rk[rnd])
        return bytes(s)

    def decrypt_block(self, block: bytes) -> bytes:
        if len(block) != 16:
            raise AesError("AES block must be 16 bytes")
        s = list(block)
        self._add(s, self.rk[self.nr])
        for rnd in range(self.nr - 1, -1, -1):
            # InvShiftRows then InvSubBytes
            s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
            s = [_INV_SBOX[b] for b in s]
            self._add(s, self.rk[rnd])
            if rnd:
                t = []
                for c in range(4):
                    a0, a1, a2, a3 = s[4 * c:4 * c + 4]
                    t += [
                        _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3],
                        _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3],
                        _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3],
                        _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3],
                    ]
                s = t
        return bytes(s)


def aes_ctr(key: bytes, data: bytes, little_endian: bool = False,
            initial: int = 1, nonce: bytes = b"") -> bytes:
    """CTR keystream XOR (encrypt == decrypt). WinZip AE-x uses a
    LITTLE-ENDIAN 16-byte counter starting at 1 with no nonce; the
    SP 800-38A form is big-endian over nonce||counter."""
    cipher = AES(key)
    out = bytearray(len(data))
    ctr = initial
    for off in range(0, len(data), 16):
        if nonce:
            block = nonce + ctr.to_bytes(16 - len(nonce), "big")
        else:
            block = ctr.to_bytes(16, "little" if little_endian else "big")
        ks = cipher.encrypt_block(block)
        chunk = data[off:off + 16]
        for i, b in enumerate(chunk):
            out[off + i] = b ^ ks[i]
        ctr += 1
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes,
                    strip_padding: bool = True) -> bytes:
    """CBC decrypt with optional PKCS#7 padding removal (the PDF
    AESV2/AESV3 layout carries the IV as the first 16 data bytes —
    the caller splits it off)."""
    if len(iv) != 16:
        raise AesError("CBC IV must be 16 bytes")
    if len(data) % 16:
        raise AesError(f"CBC data length {len(data)} not a block multiple")
    cipher = AES(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        block = data[off:off + 16]
        plain = cipher.decrypt_block(block)
        out += bytes(a ^ b for a, b in zip(plain, prev))
        prev = block
    if strip_padding:
        if not out:
            return b""
        pad = out[-1]
        if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
            raise AesError("bad PKCS#7 padding (wrong key?)")
        del out[-pad:]
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes,
                    add_padding: bool = True) -> bytes:
    """CBC encrypt with PKCS#7 padding — the fixture mirror."""
    if len(iv) != 16:
        raise AesError("CBC IV must be 16 bytes")
    if add_padding:
        pad = 16 - len(data) % 16
        data = data + bytes([pad]) * pad
    elif len(data) % 16:
        raise AesError("unpadded CBC data must be a block multiple")
    cipher = AES(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[off:off + 16], prev))
        enc = cipher.encrypt_block(block)
        out += enc
        prev = enc
    return bytes(out)
