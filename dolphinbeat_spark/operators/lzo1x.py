"""From-scratch LZO1X block codec (r16).

Matroska ContentCompAlgo 2 frames are raw LZO1X blocks (RFC 9559
routes to the LZO algorithm; the stream format is the public LZO1X
instruction encoding documented in the Linux kernel's
Documentation/staging/lzo.rst and implemented by liblzo2 /
lzo1x_decompress_safe — reference for BEHAVIOR; this is an
independent implementation of the documented format).

Instruction set (state = number of trailing literals the previous
instruction copied; it disambiguates opcodes 0..15):

- first byte 18..21: copy 0..3 literals, state = byte - 17
- first byte 22..255: copy (byte - 17) literals, state = 4
- first byte 17: version/RLE extension marker (LZO >= 2.10 RLE
  bitstream) — raises by name, never seen in Matroska tracks
- 0..15, state 0: long literal run, length 3 + (L or 15 + ext)
- 0..15, state 1..3: 2-byte match, distance (H << 2) + D + 1 (<= 1 kB)
- 0..15, state 4: 3-byte match, distance (H << 2) + D + 2049 (2-3 kB)
- 16..31: far match, distance 16384 + (H << 14) + (LE16 >> 2),
  length 2 + (L or 7 + ext); distance == 16384 is end-of-stream
- 32..63: match within 16 kB, distance (LE16 >> 2) + 1,
  length 2 + (L or 31 + ext)
- 64..127: 3-4 byte match, distance (H << 3) + D + 1 (<= 2 kB)
- 128..255: 5-8 byte match, distance (H << 3) + D + 1 (<= 2 kB)

Every match carries 2 trailing-literal-count bits (S) that become the
next state. ``ext`` is the run-length extension: each 0x00 byte adds
255, the final non-zero byte adds itself.

The compressor mirror emits only initial-literal/long-literal/M3/
trailing-S forms (always-valid subset, greedy 16 kB hash matcher);
the decoder's remaining opcode families are pinned by hand-built
byte vectors in tests/test_multimodal.py.
"""

from __future__ import annotations


class Lzo1xError(ValueError):
    """Malformed or truncated LZO1X stream."""


def _ext(data: bytes, ip: int, n: int) -> tuple[int, int]:
    total = 0
    while True:
        if ip >= n:
            raise Lzo1xError("LZO1X length extension truncated")
        b = data[ip]
        ip += 1
        if b == 0:
            total += 255
            if total > 1 << 26:
                raise Lzo1xError("LZO1X length extension overflow")
        else:
            return total + b, ip


def lzo1x_decompress(data: bytes, max_out: int = 1 << 26) -> bytes:
    """One LZO1X block -> plain bytes (strict: requires the EOS
    marker and no trailing garbage)."""
    n = len(data)
    if n < 3:
        raise Lzo1xError("LZO1X stream shorter than the EOS marker")
    out = bytearray()
    ip = 0
    state = 0

    def literals(count: int, ip: int) -> int:
        if ip + count > n:
            raise Lzo1xError("LZO1X literal run truncated")
        out.extend(data[ip:ip + count])
        if len(out) > max_out:
            raise Lzo1xError("LZO1X output exceeds max_out")
        return ip + count

    def match(dist: int, length: int) -> None:
        src = len(out) - dist
        if src < 0:
            raise Lzo1xError(
                f"LZO1X match distance {dist} before stream start")
        if len(out) + length > max_out:
            raise Lzo1xError("LZO1X output exceeds max_out")
        for k in range(length):  # overlap-safe byte copy
            out.append(out[src + k])

    # first-byte special forms
    t = data[0]
    if t == 17 and n >= 5:
        # the version marker only exists in streams long enough to
        # carry it; the bare EOS block (11 00 00, empty payload)
        # parses through the regular 16..31 branch below
        raise NotImplementedError(
            "LZO1X version-1 RLE bitstream (first byte 17) not "
            "supported")
    if t > 17:
        ip = 1
        t -= 17
        ip = literals(t, ip)
        state = t if t < 4 else 4

    while True:
        if ip >= n:
            raise Lzo1xError("LZO1X stream ends without EOS marker")
        t = data[ip]
        ip += 1
        if t < 16:
            if state == 0:
                if t == 0:
                    ext, ip = _ext(data, ip, n)
                    length = 18 + ext
                else:
                    length = t + 3
                ip = literals(length, ip)
                state = 4
                continue
            if ip >= n:
                raise Lzo1xError("LZO1X short-match byte truncated")
            h = data[ip]
            ip += 1
            if state < 4:  # 2-byte match within 1 kB
                match((h << 2) + ((t >> 2) & 3) + 1, 2)
            else:          # 3-byte match at 2-3 kB
                match((h << 2) + ((t >> 2) & 3) + 2049, 3)
        elif t < 32:
            ln = t & 7
            if ln == 0:
                ext, ip = _ext(data, ip, n)
                length = 9 + ext
            else:
                length = 2 + ln
            if ip + 2 > n:
                raise Lzo1xError("LZO1X far-match LE16 truncated")
            le = data[ip] | (data[ip + 1] << 8)
            ip += 2
            dist = 16384 + (((t >> 3) & 1) << 14) + (le >> 2)
            if dist == 16384:  # end-of-stream marker
                if ip != n:
                    raise Lzo1xError(
                        f"{n - ip} trailing bytes after LZO1X EOS")
                return bytes(out)
            match(dist, length)
            t = le  # S bits live in the LE16
        elif t < 64:
            ln = t & 31
            if ln == 0:
                ext, ip = _ext(data, ip, n)
                length = 33 + ext
            else:
                length = 2 + ln
            if ip + 2 > n:
                raise Lzo1xError("LZO1X match LE16 truncated")
            le = data[ip] | (data[ip + 1] << 8)
            ip += 2
            match((le >> 2) + 1, length)
            t = le
        else:
            if ip >= n:
                raise Lzo1xError("LZO1X match byte truncated")
            h = data[ip]
            ip += 1
            length = (3 + ((t >> 5) & 1)) if t < 128 \
                else (5 + ((t >> 5) & 3))
            match((h << 3) + ((t >> 2) & 7) + 1, length)
        state = t & 3
        if state:
            ip = literals(state, ip)


def lzo1x_compress(data: bytes) -> bytes:
    """Plain bytes -> a valid LZO1X block (fixture mirror). Greedy
    3-byte-hash matcher over a 16 kB window; emits the
    initial-literal, long-literal, M3 (32..63) and trailing-S forms
    only — every stream it produces exercises the documented
    decoder, and lzo1x_decompress() round-trips it exactly."""
    n = len(data)
    out = bytearray()
    # token scan: (literal_run_start, literal_run_len, match_d, match_len)
    tokens: list[tuple[int, int, int, int]] = []
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 3 <= n:
        key = data[i:i + 3]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 16384:
            length = 3
            while i + length < n and length < 1 << 14 \
                    and data[j + length] == data[i + length]:
                length += 1
            tokens.append((lit_start, i - lit_start, i - j, length))
            # index positions inside the match so later data can
            # still find them (sparse: every 7th, bounds the cost)
            for k in range(i + 1, min(i + length, n - 2), 7):
                table[data[k:k + 3]] = k
            i += length
            lit_start = i
        else:
            i += 1
    tail = n - lit_start

    def emit_ext(v: int) -> None:
        # v = zero_count * 255 + final_nonzero
        z, b = divmod(v, 255)
        if b == 0:
            z, b = z - 1, 255
        out.extend(b"\x00" * z)
        out.append(b)

    def emit_literals(run_start: int, run_len: int,
                      first: bool) -> None:
        if run_len == 0:
            return
        if first:
            if run_len <= 3:
                out.append(17 + run_len)
            elif run_len <= 238:
                out.append(17 + run_len)
            else:
                out.append(0)
                emit_ext(run_len - 18)
        else:
            # long-literal instruction (valid: previous match S=0)
            if run_len < 4:
                raise AssertionError("short runs ride the S bits")
            if run_len <= 18:
                out.append(run_len - 3)
            else:
                out.append(0)
                emit_ext(run_len - 18)
        out.extend(data[run_start:run_start + run_len])

    first = True
    k = 0
    while k < len(tokens):
        run_start, run_len, d, length = tokens[k]
        trailing = 0
        if not first and 1 <= run_len <= 3:
            # short run already rode the previous match's S bits
            run_len = 0
        emit_literals(run_start, run_len, first)
        first = False
        # decide the NEXT short literal run now: it rides our S bits
        if k + 1 < len(tokens):
            nxt_len = tokens[k + 1][1]
            if 1 <= nxt_len <= 3:
                trailing = nxt_len
        elif 1 <= tail <= 3:
            trailing = tail
        ln = length - 2
        if ln <= 31:
            out.append(32 + ln)
        else:
            out.append(32)
            emit_ext(ln - 31)
        le = ((d - 1) << 2) | trailing
        out.append(le & 0xFF)
        out.append(le >> 8)
        if trailing:
            # trailing literals follow this match's span in the
            # original data: [token_start + run_len, + match_len)
            src = tokens[k][0] + tokens[k][1] + length
            out.extend(data[src:src + trailing])
        k += 1
    if first:  # no matches at all: one literal run covers everything
        emit_literals(0, n, True)
    elif tail >= 4:
        emit_literals(n - tail, tail, False)
    # 1..3-byte tails rode the last match's S bits above
    out.extend(b"\x11\x00\x00")  # EOS
    return bytes(out)
