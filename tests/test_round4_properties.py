"""Property-based pins for the round-4 numeric and fold seams.

Hypothesis drives the CORNER CASES the corpus never hits: adversarial
magnitudes for the hi/lo split sum and pathological symbol runs for
the greedy BPE fold.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark.functions.numeric import (
    exact_decimal_sum,
    exact_decimal_sum_sql,
)
from map_reduce_c_sharp_simulation_multithreaded_spark.operators.text import (
    _BPE_APPLY,
)

# money-like doubles: 2-decimal values across sign and magnitude,
# including the exact .005-boundary shapes the module exists for
_cents = st.integers(min_value=-10_000_000, max_value=10_000_000)


@settings(max_examples=12, deadline=None)
@given(st.lists(_cents, min_size=1, max_size=60))
def test_split_sum_equals_decimal_formulation(spark, values):
    """The hi/lo int64 split sum must equal DuckDB's decimal-typed SUM
    (the oracle formulation it is differentially tested against) on
    arbitrary 2-decimal inputs, signs included."""
    import duckdb

    doubles = [c / 100.0 for c in values]
    df = spark.createDataFrame([(v,) for v in doubles], "v double")
    (got,) = df.agg(exact_decimal_sum(F.col("v"), 2).alias("s")).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS v", [doubles])
    (want,) = con.execute(
        f"SELECT {exact_decimal_sum_sql('v', 2)} FROM t"
    ).fetchone()
    assert got == want, (values, got, want)


def _greedy_merge(syms: list[str], s1: str, s2: str) -> list[str]:
    """Pure-Python reference: greedy left-to-right single-pair merge."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
            out.append(s1 + s2)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


_sym = st.sampled_from(["a", "b", "ab", "</w>"])


@settings(max_examples=12, deadline=None)
@given(
    st.lists(_sym, min_size=1, max_size=12),
    _sym,
    _sym,
)
def test_bpe_fold_matches_greedy_reference(spark, syms, s1, s2):
    """The SQL fold applying one BPE merge must equal greedy
    left-to-right matching — including overlapping runs like
    ['a','a','a'] under pair (a, a) — for arbitrary symbol sequences
    drawn from a colliding alphabet."""
    df = spark.createDataFrame(
        [(syms, s1, s2)], "syms array<string>, s1 string, s2 string"
    )
    (got,) = df.select(F.expr(_BPE_APPLY).alias("m")).collect()[0]
    assert list(got) == _greedy_merge(syms, s1, s2), (syms, s1, s2, got)


def test_split_sum_tracks_oracle_beyond_2_53(spark):
    """Scaled total = 2^53 + 1 — the first integer where
    double(T)/1e6 (two-step rounding) differs from the correctly
    rounded rational T/1e6. DuckDB's DECIMAL(28,6)→DOUBLE cast
    double-rounds exactly like that (int128 → double → divide), so
    the engine must do the SAME — a decimal-division 'fix' here would
    be closer to the true value yet 1 ulp OFF the oracle and flip the
    driver hash. This pins the deliberate two-step choice."""
    import duckdb
    from decimal import Decimal

    rows = [(4503599627.370496,), (4503599627.370497,)]
    df = spark.createDataFrame(rows, "v double")
    (got,) = df.agg(exact_decimal_sum(F.col("v"), 6).alias("s")).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    (want,) = con.execute(
        f"SELECT {exact_decimal_sum_sql('v', 6)} FROM t"
    ).fetchone()
    assert got == want  # the invariant that matters: engine == oracle
    # document the shared 1-ulp deviation from the exact rational
    exact = float(Decimal(2**53 + 1) / Decimal(10**6))
    assert got == float(float(2**53 + 1) / 1e6) and got != exact
