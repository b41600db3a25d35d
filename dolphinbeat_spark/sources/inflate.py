"""Capped decompression helpers shared by the untrusted-ingestion
readers (WARC HTTP bodies in sources/warc.py, compressed JSONL shards
in sources/jsonl.py, tar wrappers in sources/archives.py) — the
zip-bomb guard for crawls (ADVICE r12): a small crafted gzip/br/.Z/
zstd/bz2/xz payload must not inflate to gigabytes inside one Arrow
batch.

Every helper enforces an output cap. ``inflation_cap`` computes the
default when the caller passes none: ``max(64 MiB, 256 × compressed
size)`` — legitimate shards scale with their input (real text rarely
compresses past ~10-20×; 256× is generous headroom for log-like
corpora), while a 1 KB bomb is stopped at 64 MiB instead of the
multi-GiB it encodes. Overruns raise the typed ``InflateError``; each
reader re-wraps it into its own typed error (WarcError / JsonlError /
ArchiveError) so the existing ``errors="capture"`` / ``strict=False``
containment modes absorb bombs per-record like any other corruption.

The stdlib codecs are driven through ``decompressobj(max_length=…)``
loops so the cap bounds PEAK memory, not just final size — a bomb
stops within one max_length grant of the cap, never after
materializing the whole payload.
"""

from __future__ import annotations

import zlib

__all__ = [
    "InflateError", "inflation_cap",
    "gzip_multi_capped", "deflate_capped", "bz2_capped", "xz_capped",
]

DEFAULT_FLOOR = 64 << 20  # 64 MiB
DEFAULT_RATIO = 256


class InflateError(ValueError):
    """Typed decompression error (format or inflation-cap overrun)."""


def inflation_cap(compressed_len: int,
                  max_output: int | None = None) -> int:
    """The cap actually applied: the caller's explicit ``max_output``
    or the dynamic default (module docstring)."""
    if max_output is not None:
        return max_output
    return max(DEFAULT_FLOOR, DEFAULT_RATIO * compressed_len)


def _cap_err(cap: int) -> InflateError:
    return InflateError(
        f"inflated output exceeds the {cap}-byte cap (zip-bomb guard; "
        "pass max_inflate= to raise it)")


def gzip_multi_capped(data: bytes, cap: int) -> bytes:
    """Concatenated gzip members (RFC 1952 §2.2) -> plaintext, capped.
    Non-gzip trailing bytes after a member raise typed — that is
    corruption, not a member."""
    out = bytearray()
    rest = data
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise InflateError(
                "gzip body has non-gzip trailing bytes "
                f"({rest[:8]!r}) after {len(out)} decoded")
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(rest, max(1, cap + 1 - len(out)))
        except zlib.error as ex:
            raise InflateError(f"gzip body fails to inflate: {ex}") from ex
        if len(out) > cap:
            raise _cap_err(cap)
        if not d.eof:
            raise InflateError("gzip body ends mid-member")
        rest = d.unused_data
    return bytes(out)


def deflate_capped(data: bytes, cap: int) -> bytes:
    """HTTP ``deflate``: the spec'd zlib wrapper first, then the
    raw-deflate form common in the wild (the dual-window probe every
    browser ships), capped."""
    last: Exception | None = None
    for wbits in (15, -15):
        d = zlib.decompressobj(wbits=wbits)
        try:
            out = d.decompress(data, cap + 1)
        except zlib.error as ex:
            last = ex
            continue
        if len(out) > cap:
            raise _cap_err(cap)
        return out
    raise InflateError(f"deflate body fails to inflate: {last}") from last


def bz2_capped(data: bytes, cap: int) -> bytes:
    """Concatenated bzip2 streams, capped — mirrors stdlib
    ``bz2.decompress`` semantics (streams loop; trailing garbage
    after ≥1 good stream is ignored; truncation raises)."""
    import bz2
    out = bytearray()
    first = True
    while data:
        d = bz2.BZ2Decompressor()
        try:
            while True:
                out += d.decompress(data, max(1, cap + 1 - len(out)))
                if len(out) > cap:
                    raise _cap_err(cap)
                if d.eof:
                    break
                if not d.needs_input:
                    data = b""
                    continue
                raise InflateError("bzip2 stream truncated")
        except OSError as ex:
            if first:
                raise InflateError(f"bad bzip2 stream: {ex}") from ex
            break  # leftover bytes are not a stream: stdlib ignores
        first = False
        data = d.unused_data
    return bytes(out)


def xz_capped(data: bytes, cap: int) -> bytes:
    """Concatenated xz streams, capped — mirrors stdlib
    ``lzma.decompress`` semantics (streams loop; trailing garbage
    after ≥1 good stream is ignored; truncation raises)."""
    import lzma
    out = bytearray()
    first = True
    while data:
        d = lzma.LZMADecompressor()
        try:
            while True:
                out += d.decompress(data, max(1, cap + 1 - len(out)))
                if len(out) > cap:
                    raise _cap_err(cap)
                if d.eof:
                    break
                if not d.needs_input:
                    data = b""
                    continue
                raise InflateError("xz stream truncated")
        except lzma.LZMAError as ex:
            if first:
                raise InflateError(f"bad xz stream: {ex}") from ex
            break  # leftover bytes are not a stream: stdlib ignores
        first = False
        data = d.unused_data
    return bytes(out)
