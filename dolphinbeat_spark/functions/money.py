"""Long-cents money aggregation (r16, guide §2.3 "narrower types").

Spark's decimal sum partials box a BigDecimal per input row in the
hash-aggregate buffer; summing exact scaled INTEGERS keeps the partial
primitive (one long per group per column) and was measured ~3-5x
faster on the q1 aggregation at sf1/sf100 (OPTIMIZATION_r16.md, and
the q1_pricing_summary_cents twin spec which passes q1's own oracle
SQL hash-identically — the bit-identity proof for this machinery).

Soundness (the q1-cents argument, applies to every user):
- inputs are 2-decimal money/quantity columns stored as doubles whose
  values are exact in cents: ``round(x * 100)`` recovers the exact
  integer (x*100 sits within 0.5 of the integer for |x| < 2^51).
- products of cents/basis-point integers are exact int64 values with a
  known power-of-ten scale; sums of those are exact int64 (ANSI mode
  RAISES on overflow rather than corrupting — callers document their
  magnitude headroom).
- one decimal rescale after the aggregation (cast decimal(38,6),
  divide by 10^scale, round 2, cast double) restores exactly the
  value the decimal formulation produces: the quotient of a scale-4
  integer by 10^4 is exact at 6 fractional digits, so no rounding
  happens before the final ROUND(, 2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-decimal money/quantity column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def rescale(sumcol: Column, pow10: int, alias: str) -> Column:
    """Restore a summed scaled-integer column to the 2-decimal DOUBLE
    the decimal formulation emits (exact: see module docstring)."""
    return (
        F.round(sumcol.cast("decimal(38,6)") / F.lit(10 ** pow10), 2)
        .cast("double")
        .alias(alias)
    )


def cents_sum(col: Column, pow10: int, alias: str) -> Column:
    """SUM a scaled-integer expression and rescale: the drop-in for
    ``round(sum(decimal_expr), 2).cast(double)``."""
    return rescale(F.sum(col), pow10, alias)


def rev_cents(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """price*(1-disc) as a scale-4 integer: cents x (100 - bp)."""
    return cents(price) * (100 - cents(disc))


# ---------------------------------------------------------------------------
# Limbed micro-unit sums (r17, guide §2.3 "narrower types"): primitive long
# aggregation for 6-decimal `value` columns whose plain micro-scaling
# (x 10^6) would leave too little int64 headroom to assert safe at 100 TB
# (decimal(18,6) admits |micros| < 10^18 — ~9 max-magnitude rows to
# overflow). Each input is split into four 16-bit limbs; each limb's sum
# is an independent long aggregate with per-row magnitude < 2^16, so a
# single group overflows int64 only beyond 2^47 ≈ 1.4e14 input rows —
# more rows than a 100 TB corpus can hold at any plausible row width,
# i.e. UNCONDITIONAL at the target scale (and ANSI still raises loudly
# beyond it). The exact total is recombined in decimal(38) space after
# the aggregation:  m == (m >> 48)·2^48 + Σ_{i<3} (m >> 16i & 0xFFFF)·2^16i
# holds bit-exactly for every int64 (arithmetic shift floors; the mask
# yields the non-negative remainder), so Σ limb-sums recombined equals
# Σ micros exactly, and micros/10^6 at scale 6 reproduces the decimal
# formulation's sum bit-for-bit (same rescale argument as the module
# docstring). This replaces the r16 "two-level long/decimal aggregate"
# sketch with a single aggregation: 4 primitive longs per group in the
# hash-agg buffer instead of one boxed BigDecimal per input row.
# Domain note: the limb split/recombine is exact for EVERY int64; the
# double→micros conversion (micros()) is exact for |x·1e6| < 2^51 (the
# 0.5-window bound below) — beyond that, feed limb_sums a long derived
# from an exact decimal instead.
# ---------------------------------------------------------------------------

_LIMB_BITS = 16
_LIMB_MASK = (1 << _LIMB_BITS) - 1


def micros(col: Column | str) -> Column:
    """Exact integer micro-units (scale 6) of a value column exact at
    6 decimal places: ``round(x * 1e6)`` recovers the exact integer for
    |x·1e6| < 2^51 (same 0.5-window argument as ``cents``), matching
    ``CAST(x AS DECIMAL(p,6))`` bit-for-bit (both round HALF_UP)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 1_000_000).cast("long")


def limb_sums(mcol: Column, prefix: str) -> list[Column]:
    """SUM aggregates of the four 16-bit limbs of ``mcol`` (a long
    micro-unit expression). Aliases: ``{prefix}_l0 .. {prefix}_l3``."""
    aggs = []
    for i in range(4):
        shifted = F.shiftright(mcol, _LIMB_BITS * i) if i else mcol
        limb = shifted if i == 3 else shifted.bitwiseAND(F.lit(_LIMB_MASK))
        aggs.append(F.sum(limb).alias(f"{prefix}_l{i}"))
    return aggs


def limb_total(prefix: str) -> Column:
    """Recombine the four limb sums into the exact decimal(38,6) total
    value (Σ micros / 10^6). The recombination runs in decimal(38,0)
    space — exact for totals up to 10^38 micros; the final /10^6
    lands on decimal(38,6), exact at 6 fractional digits (the proven
    ``rescale`` division shape)."""
    total = F.col(f"{prefix}_l3").cast("decimal(38,0)")
    for i in (2, 1, 0):
        total = total * (1 << _LIMB_BITS) + F.col(f"{prefix}_l{i}").cast("decimal(38,0)")
    return total.cast("decimal(38,6)") / F.lit(1_000_000)
