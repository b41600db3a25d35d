"""Deterministic, engine-portable hashing primitives.

The engine's sketch operators (MinHash, SimHash, LSH, fingerprints) need
hash functions that produce IDENTICAL values in Spark and in any ANSI
SQL engine (the correctness oracle runs in DuckDB). Neither Spark's
``xxhash64`` nor DuckDB's ``hash()`` is portable, so we standardize on:

    hash64(s) = first 12 hex digits of md5(s), as a BIGINT  (48 bits)

md5 is available and bit-identical everywhere. 48 bits keeps all the
downstream affine arithmetic ``(a*h + b) mod p`` inside signed-64-bit
range even with 30-bit multipliers, which matters because Spark 4 runs
in ANSI mode (overflow raises instead of wrapping).

MinHash permutations use fixed affine transforms over the Mersenne
prime 2^61-1; parameters are derived deterministically from the
permutation index via md5 so both engines can regenerate them.

All of this is JVM-side expression code (no Python UDFs): ``md5``,
``conv``, ``substring`` are whole-stage-codegen'd built-ins.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^61 - 1, Mersenne prime: (a*h+b) with a,b < 2^31 and h < 2^48 stays
# below 2^79?? no — a*h < 2^31 * 2^48 = 2^79 overflows. Multipliers are
# therefore capped at 2^15 (see _affine_params), giving a*h < 2^63.
MERSENNE_61 = (1 << 61) - 1
HASH_BITS = 48
_HEX_DIGITS = HASH_BITS // 4  # 12


def hash64(col: Column | str) -> Column:
    """Portable 48-bit hash of a string column as BIGINT.

    Spark:   conv(substring(md5(s), 1, 12), 16, 10) :: bigint
    DuckDB:  CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, _HEX_DIGITS), 16, 10).cast("bigint")


def hash64_sql(expr: str) -> str:
    """DuckDB SQL text equivalent of :func:`hash64`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, {_HEX_DIGITS})) AS BIGINT)"


def _affine_params(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for permutation *i*.

    a is odd, 1..2^15-1 (so a*h < 2^15 * 2^48 = 2^63 never overflows
    signed 64-bit under ANSI); b is 0..2^31-1. Derived from md5 of the
    index so any engine (or a reviewer) can re-derive them.
    """
    d = hashlib.md5(f"dolphinbeat-minhash-{i}".encode()).hexdigest()
    a = (int(d[:8], 16) % ((1 << 15) - 1)) | 1
    b = int(d[8:16], 16) % ((1 << 31) - 1)
    return a, b


def minhash_params(num_perm: int) -> list[tuple[int, int]]:
    return [_affine_params(i) for i in range(num_perm)]


def affine_hash(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod 2^61-1 — overflow-safe under ANSI mode."""
    return (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_61)


def affine_hash_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({h_expr}) * {a} + {b}) % {MERSENNE_61}"
