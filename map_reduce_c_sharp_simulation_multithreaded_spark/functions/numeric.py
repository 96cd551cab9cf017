"""Cross-engine-exact numeric aggregation helpers.

The trap (hit at sf0.01, TPC-H Q3 shape): revenue terms like
``l_extendedprice * (1 - l_discount)`` have exactly 4 decimal digits, so
per-group SUMs are multiples of 1e-4 and land EXACTLY on the .005
boundary of ``ROUND(x, 2)`` with probability ~1/50 per group. At an
exact tie, Spark (BigDecimal HALF_UP on the shortest repr) and DuckDB
(float-arithmetic rounding) can disagree by a cent even on identical
input doubles — and float summation-order noise can flip the side of
the boundary besides.

The fix is exactness, not more rounding:

1. round each TERM to its exact decimal width (a 4-decimal true value
   can never tie at 4 decimals, so per-row rounding is deterministic);
2. sum as DECIMAL — exact, order-independent, identical across engines;
3. cast the final decimal back to DOUBLE (same decimal → same IEEE bits
   on both sides), with no further rounding.

SUMs of naturally-2-decimal columns (prices, amounts) don't need this:
their sums are multiples of 0.01 and can't tie at ``ROUND(x, 2)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_decimal_sum(term: Column, decimals: int) -> Column:
    """Order-independent, cross-engine-exact SUM of a product term whose
    true value has exactly ``decimals`` decimal digits."""
    return F.sum(
        F.round(term, decimals).cast(f"decimal(28,{decimals})")
    ).cast("double")


def exact_decimal_sum_sql(term_sql: str, decimals: int) -> str:
    """The DuckDB-side twin of :func:`exact_decimal_sum`."""
    return (
        f"CAST(SUM(CAST(ROUND({term_sql}, {decimals}) "
        f"AS DECIMAL(28,{decimals}))) AS DOUBLE)"
    )
