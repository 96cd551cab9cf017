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


# hi/lo split base for the long-backed exact sum below. Per-row scaled
# values v = round(term·10^d) split into hi = v div B, lo = v mod B;
# with B = 1e6 and |term| ≤ ~1e6 at d ≤ 6, SUM(lo) < rows·1e6 and
# SUM(hi) < rows·1e6 both stay inside int64 out to ~10^12 rows — the
# 100 TB row count with three orders of magnitude to spare.
_SPLIT_BASE = 1_000_000


def exact_decimal_sum(term: Column, decimals: int) -> Column:
    """Order-independent, cross-engine-exact SUM of a product term whose
    true value has exactly ``decimals`` decimal digits.

    Implemented as TWO int64 sums (hi/lo split of the scaled integer
    term) recombined exactly in DECIMAL(38,0) per group — not as a
    decimal-typed SUM: Spark's sum over precision-28 decimals runs on
    the BigDecimal slow path (~15× the cost of a long sum; measured
    1.0 s of TPC-H Q1's 1.5 s at sf0.1), while long sums stay inside
    whole-stage codegen. The recombined integer is bit-exact;
    ``double(total)/10^d`` then mirrors DuckDB's decimal→double cast
    bit-for-bit at EVERY magnitude (see the return-expression
    comment), which is why the DuckDB twin below keeps the decimal
    form — a genuinely independent formulation that still lands on
    identical doubles, 2^53-crossing totals included.

    The ``(v - v % B)/B`` double division is exact (numerator is a
    multiple of B below 2^53) and the ``%`` remainder truncates toward
    zero identically on both engines, so negative terms reconstruct
    exactly too.
    """
    scale = float(10**decimals)
    v = F.round(term * F.lit(scale)).cast("bigint")
    lo = v % F.lit(_SPLIT_BASE)
    hi = ((v - lo) / F.lit(_SPLIT_BASE)).cast("bigint")
    total = (
        F.sum(hi).cast("decimal(38,0)") * F.lit(_SPLIT_BASE)
        + F.sum(lo).cast("decimal(38,0)")
    )
    # double(total) THEN divide — deliberately the same two-step
    # rounding DuckDB's own DECIMAL(28,d)→DOUBLE cast performs
    # (int128 storage → correctly-rounded double → divide by 10^d),
    # on the SAME integer (DuckDB's internal rep of the decimal sum
    # IS this scaled total). Past 2^53 scaled units the two-step
    # result can differ 1 ulp from the correctly-rounded rational,
    # but it differs IDENTICALLY on both engines — dividing in
    # DECIMAL here instead would be closer to the true value yet
    # 1 ulp OFF the oracle (verified at total = 2^53 + 1; pinned in
    # tests/test_round4_properties.py).
    return (total.cast("double") / F.lit(scale))


def exact_decimal_sum_sql(term_sql: str, decimals: int) -> str:
    """The DuckDB-side twin of :func:`exact_decimal_sum`."""
    return (
        f"CAST(SUM(CAST(ROUND({term_sql}, {decimals}) "
        f"AS DECIMAL(28,{decimals}))) AS DOUBLE)"
    )
