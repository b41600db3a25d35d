"""Unix compress (.Z) LZW from scratch — the ncompress/compress(1)
on-disk format (magic ``1F 9D``) and the IANA-registered HTTP
``compress`` content coding (RFC 9110 §8.4.1.1), closing the last
registered-coding boundary in sources/warc.py and adding ``.Z``
sniffing to the JSONL/tar ingestion wrappers.

Format (as fixed by the historical compress 4.0 lineage, which every
extant decompressor mirrors):
- header ``1F 9D`` + flags byte: bits 0..4 = maxbits (9..16), bit 7 =
  block mode (code 256 = CLEAR, first dynamic code 257);
- LZW codes packed LSB-first starting at 9 bits; the width grows by
  one after exactly 2^w codes have been emitted at width w (i.e.,
  when the next dictionary index passes ``1 << w``), up to maxbits,
  after which the dictionary freezes (no further appends) until a
  CLEAR resets it. Because every width section is an exact multiple
  of eight codes, the historical writer's 8-code group padding is
  INVISIBLE at width changes — it only surfaces after an adaptive
  CLEAR, which this writer never emits (legal: the original's CLEAR
  is a compression-ratio watchdog, not a format requirement).

Group padding (r13): compress 4.0's ``output()`` buffers codes in
8-code groups of ``n_bits`` bytes and, on CLEAR (and width change),
flushes the FULL group zero-padded even when partially filled.
Width sections are exact multiples of 8 codes (256 at w9, 512 at
w10, ...) so that flush is invisible at width changes — but a CLEAR
lands mid-group, so real adaptive-CLEAR streams carry pad bits up
to the next group boundary. Both sides model it: the reader tracks
the bit position where the current group run started (re-anchored
at every width change and CLEAR) and on CLEAR rounds the position
up to the next multiple of ``old_n_bits*8`` relative to that
anchor; the writer (``encode_z(clear_every=...)``) emits the same
padding.

Verification (tests/test_multimodal.py): every encoder output —
including adaptive-CLEAR streams with clears at unaligned group
offsets — is decompressed by the SYSTEM ``uncompress``/``gzip -d``
(the gzip unlzw lineage — today's de-facto .Z reader)
byte-identically across sizes that cross every width boundary (the
schedule above was DERIVED empirically against it); the decoder
roundtrips the encoder and reads the externally-validated bytes.

Named boundary: maxbits=9 streams that fill the dictionary diverge
between historical readers; the writer floors maxbits at 10.

Scale note: this runs inside the same per-payload Arrow batches as
gzip/bzip2/xz in sources/jsonl.py — partition-parallel, bounded by
``max_output`` against bombs.
"""

from __future__ import annotations

__all__ = ["ZCompressError", "decode_z", "encode_z"]

MAGIC = b"\x1f\x9d"
_INIT_BITS = 9


class ZCompressError(ValueError):
    """Typed .Z / compress-LZW format error."""


def decode_z(data: bytes, max_output: int | None = None) -> bytes:
    """One .Z stream -> plaintext. ``max_output`` bounds the inflated
    size (bomb guard for untrusted crawls)."""
    if data[:2] != MAGIC:
        raise ZCompressError("not a compress(1) stream (1F 9D)")
    if len(data) < 3:
        raise ZCompressError("truncated compress header")
    flags = data[2]
    maxbits = flags & 0x1F
    block_mode = bool(flags & 0x80)
    if flags & 0x60:
        raise ZCompressError(f"reserved compress flag bits set ({flags:#x})")
    if not 9 <= maxbits <= 16:
        raise ZCompressError(f"compress maxbits {maxbits} outside 9..16")
    body = data[3:]
    nbits_total = len(body) * 8
    pos = 0
    anchor = 0  # bit position where the current 8-code group run began
    n_bits = _INIT_BITS
    clear_code = 256 if block_mode else None
    next_code = 257 if block_mode else 256
    table: list[bytes] = [bytes([i]) for i in range(256)]
    # dynamic entries appended at indices >= first_dynamic
    dyn: list[bytes] = []
    first_dynamic = next_code
    out = bytearray()
    prev: bytes | None = None

    def read_code() -> int | None:
        nonlocal pos
        if pos + n_bits > nbits_total:
            return None
        byte = pos >> 3
        chunk = int.from_bytes(body[byte:byte + 3], "little")
        v = (chunk >> (pos & 7)) & ((1 << n_bits) - 1)
        pos += n_bits
        return v

    def resync() -> None:
        # compress 4.0's output() flushes the full n_bits-byte group
        # zero-padded on width change / CLEAR; skip those pad bits by
        # rounding up to the next 8-code group boundary of the OLD
        # width, relative to the last re-anchor (module docstring).
        # A no-op at width changes (sections are exact multiples of 8
        # codes), real pad bits after an adaptive CLEAR.
        nonlocal pos, anchor
        group = n_bits * 8
        rel = pos - anchor
        if rel % group:
            pos = anchor + (rel + group - 1) // group * group
        anchor = pos

    while True:
        # widen when the next index passes 1<<n_bits. The reader's
        # dictionary TRAILS the writer's by one entry (it cannot
        # append until it has seen the next code's first byte), so its
        # trigger fires one index earlier than the writer's ``>``.
        if next_code >= (1 << n_bits) and n_bits < maxbits:
            resync()
            n_bits += 1
        code = read_code()
        if code is None:
            break
        if clear_code is not None and code == clear_code:
            resync()
            n_bits = _INIT_BITS
            anchor = pos
            dyn.clear()
            next_code = first_dynamic
            prev = None
            continue
        if code < 256:
            entry = table[code]
        elif first_dynamic <= code < first_dynamic + len(dyn):
            entry = dyn[code - first_dynamic]
        elif code == first_dynamic + len(dyn) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ZCompressError(
                f"compress code {code} beyond the dictionary "
                f"({first_dynamic + len(dyn)} entries)"
            )
        out += entry
        if max_output is not None and len(out) > max_output:
            raise ZCompressError(f"output exceeds max_output={max_output}")
        if prev is not None and next_code < (1 << maxbits):
            dyn.append(prev + entry[:1])
            next_code += 1
        prev = entry
    return bytes(out)


def encode_z(data: bytes, maxbits: int = 16,
             clear_every: int | None = None) -> bytes:
    """compress(1)-compatible writer (fixture generator and the
    encode mirror for the decoder's tests): block mode, greedy LZW,
    maxbits floored at 10 (module docstring). ``clear_every=N``
    emits an adaptive CLEAR after every N codes (a deterministic
    stand-in for the original's compression-ratio watchdog) with the
    historical 8-code group padding, so the decoder's CLEAR resync
    path can be pinned against system ``gzip -d``/``uncompress``."""
    if not 10 <= maxbits <= 16:
        raise ValueError(f"maxbits {maxbits} outside 10..16")
    out = bytearray(MAGIC + bytes([0x80 | maxbits]))
    bitbuf = bytearray()
    pos = 0
    anchor = 0
    n_bits = _INIT_BITS

    def put_code(v: int) -> None:
        nonlocal pos
        byte = pos >> 3
        while len(bitbuf) < byte + 3:
            bitbuf.append(0)
        chunk = int.from_bytes(bitbuf[byte:byte + 3], "little")
        chunk |= v << (pos & 7)
        bitbuf[byte:byte + 3] = chunk.to_bytes(3, "little")
        pos += n_bits

    def pad_group() -> None:
        # compress 4.0 output(): flush the full n_bits-byte group even
        # when partially filled (zero pad bits); re-anchor after it
        nonlocal pos, anchor
        group = n_bits * 8
        rel = pos - anchor
        if rel % group:
            pos = anchor + (rel + group - 1) // group * group
        anchor = pos

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 257
    cur = b""
    emitted = 0
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        put_code(table[cur])
        emitted += 1
        # the decoder registers a new entry after every emitted code
        # (until maxbits capacity); mirror its width schedule
        if next_code < (1 << maxbits):
            table[nxt] = next_code
            next_code += 1
            if next_code > (1 << n_bits) and n_bits < maxbits:
                pad_group()  # no-op: sections are multiples of 8 codes
                n_bits += 1
        cur = bytes([b])
        if clear_every and emitted % clear_every == 0:
            put_code(256)
            pad_group()
            n_bits = _INIT_BITS
            anchor = pos
            table = {bytes([i]): i for i in range(256)}
            next_code = 257
    if cur:
        put_code(table[cur])
    nbytes = (pos + 7) // 8
    return bytes(out + bitbuf[:nbytes])
