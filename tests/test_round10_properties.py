"""Property-based test for the round-10 prefix-join debut.

The operator's load-bearing claim is LOSSLESSNESS: prefix filtering,
the length-ratio filter, and PPJoin's positional filter are candidate
PRUNING only — for every corpus and every threshold, the pruned join
must return exactly the brute-force all-pairs answer, byte for byte
(ids, counts, and the integer-scaled jaccard). Hypothesis drives
corpora designed to stress the scheme's proof obligations: skewed
element frequencies (the global-rarity order), heavy common cores
(candidates that only the positional filter kills), near-identical
sets (prefix length 1 at high thresholds), duplicates, singletons,
and thresholds ON decision boundaries (small-integer Jaccards like
3/5 land exactly on te4 grid points). One Spark job pair per example
(same budget reasoning as test_round7_properties.py).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# a small closed vocabulary forces frequency skew and real overlap;
# element "e0" is near-universal (the frequent-token quadratic risk)
VOCAB = [f"e{i}" for i in range(12)]
SET = st.lists(
    st.sampled_from(VOCAB), min_size=1, max_size=9, unique=True
)
CORPUS = st.lists(SET, min_size=2, max_size=12).map(
    lambda sets: [(i, sorted(s)) for i, s in enumerate(sets)]
)
# boundary-heavy thresholds: 5000 and 6000 are hit exactly by the
# small-set Jaccards this vocabulary produces (1/2, 3/5, ...)
THRESHOLD = st.sampled_from([3000, 5000, 6000, 7500, 10000])


def _brute(rows, te4):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            a, b = set(sa), set(sb)
            inter = len(a & b)
            union = len(a) + len(b) - inter
            if inter * 10000 >= te4 * union:
                out.add(
                    (ia, ib, len(a), len(b), inter, union,
                     inter * 10000 // union)
                )
    return out


@SLOW
@given(rows=CORPUS, te4=THRESHOLD)
def test_prefix_join_equals_brute_force(spark, rows, te4):
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        jaccard_prefix_join_pairs,
    )

    df = spark.createDataFrame(rows, "id long, s array<string>")
    got = {
        (r.id_a, r.id_b, r.n_a, r.n_b, r.n_inter, r.n_union, r.jaccard_e4)
        for r in jaccard_prefix_join_pairs(df, "id", "s", te4).collect()
    }
    assert got == _brute(rows, te4)
