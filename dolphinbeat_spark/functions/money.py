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
