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

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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


# --- fuzzy decontamination audit (late round-10 debut) ---------------
#
# LSH is a candidate scheme with recall < 1 strictly between the
# threshold and 1.0, so brute-force EQUALITY is not a law (the
# registered query's fixture equality is pinned separately where it
# was verified to hold). The laws that DO hold for every corpus:
#   soundness — every audit row is derived from TRUE >= 0.8 train×eval
#   pairs: the doc must have such pairs, the reported count cannot
#   exceed the true count, and the reported max must be one of the
#   doc's true pair values;
#   completeness at J = 1 — identical shingle SETS give identical
#   signatures, so every band matches and the pair cannot be missed;
#   split discipline — only training docs (id % 20 != 7) appear.

_TOKENS = [f"t{i}" for i in range(10)]
_BASE = st.lists(st.sampled_from(_TOKENS), min_size=5, max_size=14)


@st.composite
def _contam_corpus(draw):
    bases = draw(st.lists(_BASE, min_size=1, max_size=3))
    n_docs = draw(st.integers(min_value=2, max_value=8))
    rows = []
    for i in range(n_docs):
        toks = list(draw(st.sampled_from(bases)))
        for _ in range(draw(st.integers(min_value=0, max_value=2))):
            pos = draw(st.integers(min_value=0, max_value=len(toks) - 1))
            toks[pos] = draw(st.sampled_from(_TOKENS))
        is_eval = draw(st.booleans())
        doc_id = 7 + 20 * i if is_eval else 1 + 20 * i
        rows.append((doc_id, " ".join(toks)))
    return rows


def _shingles(text):
    tk = text.split()
    return {" ".join(tk[j:j + 3]) for j in range(len(tk) - 2)}


def _brute_audit(rows):
    sets = {i: _shingles(t) for i, t in rows}
    sets = {i: s for i, s in sets.items() if s}
    out = {}
    for ia, sa in sets.items():
        if ia % 20 == 7:
            continue
        js = []
        for ib, sb in sets.items():
            if ib % 20 != 7:
                continue
            inter = len(sa & sb)
            j_e4 = inter * 10000 // (len(sa) + len(sb) - inter)
            if j_e4 >= 8000:
                js.append(j_e4)
        if js:
            out[ia] = (len(js), sorted(js))
    return out, sets


@SLOW
@given(rows=_contam_corpus())
def test_fuzzy_contam_audit_sound_and_exact_on_identical_sets(spark, rows):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.mlprep import (
        _fuzzy_contam_audit,
    )

    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_eval_neardups, r.top_jaccard_e4)
        for r in _fuzzy_contam_audit(d).collect()
    }
    brute, sets = _brute_audit(rows)
    for doc_id, (n, top) in got.items():
        assert doc_id % 20 != 7  # training docs only
        assert doc_id in brute, doc_id  # no false flags
        true_n, true_js = brute[doc_id]
        assert 1 <= n <= true_n
        assert top in true_js and top >= 8000
    # completeness at J = 1: identical shingle sets cannot be missed
    eval_sets = {i: s for i, s in sets.items() if i % 20 == 7}
    for ia, sa in sets.items():
        if ia % 20 == 7:
            continue
        if any(sa == sb for sb in eval_sets.values()):
            assert got.get(ia, (0, 0))[1] == 10000, ia


# --- scalable k-means seeding (late round-10 operator) ----------------
#
# Laws that hold for EVERY corpus:
#   membership    — every seed is a normalized input vector;
#   determinism   — same corpus, same seeds;
#   exact k       — a non-empty corpus yields exactly k seeds
#                   (duplicates allowed only when the corpus has fewer
#                   distinct vectors than k);
#   coverage      — if the corpus has d <= k DISTINCT normalized
#                   vectors, ALL of them become seeds: an uncovered
#                   vector always sorts ahead of any duplicate in the
#                   oversample pool (max-dot < 1 vs = 1) and the
#                   greedy reduction picks smallest-max-dot first, so
#                   no pick is ever wasted on a duplicate while an
#                   uncovered vector remains.

_VEC = st.lists(
    st.integers(min_value=0, max_value=2), min_size=4, max_size=4
)
_VCORPUS = st.lists(_VEC, min_size=1, max_size=10).filter(
    lambda vs: any(any(v) for v in vs)
)


def _unit(v):
    import math

    n = max(math.sqrt(sum(x * x for x in v)), 1e-12)
    return tuple(round(x / n, 12) for x in v)


@SLOW
@given(vecs=_VCORPUS)
# r10 falsifying corpus (judge + hypothesis): the zero vector's
# floored-norm "unit" form has self-dot 0, so without picked-key
# exclusion the greedy loop re-picks it forever and the genuinely
# uncovered unit vector never seeds — pinned so the degenerate case
# runs deterministically every session, not at hypothesis's whim
@example(vecs=[[0, 0, 0, 0], [0, 0, 0, 1]])
@example(vecs=[[0, 0, 0, 0], [1, 0, 0, 0], [1, 1, 0, 0], [0, 1, 0, 0]])
def test_scalable_seeding_laws(spark, vecs):
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.similarity import (
        seed_kmeans_scalable,
    )

    k = 6
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    s1 = seed_kmeans_scalable(df, "embedding", k, id_col="vec_id")
    s2 = seed_kmeans_scalable(df, "embedding", k, id_col="vec_id")
    assert s1 == s2  # determinism
    assert len(s1) == k  # exact k on any non-empty corpus
    inputs = {_unit(v) for _i, v in rows}
    seeds = {tuple(round(x, 12) for x in c) for c in s1}
    assert seeds <= inputs  # membership
    if len(inputs) <= k:
        assert seeds == inputs  # full coverage of distinct vectors


# --- IVF range search (late round-10 debut) ---------------------------
#
# The lossless-at-full-probe law, corpus-agnostically: with n_probe =
# n_centroids the cell pruning prunes nothing, so the range result
# must equal the exhaustive cross-join range filter — ids AND rounded
# similarity values — for every corpus, every threshold, and every
# codebook (here the sha-derived default at a small dim).

_RVEC = st.lists(
    st.integers(min_value=-2, max_value=2), min_size=4, max_size=4
).filter(lambda v: any(v))
_RCORPUS = st.lists(_RVEC, min_size=2, max_size=9)
_RTHRESH = st.sampled_from([0.0, 0.5, 0.9])


@SLOW
@given(vecs=_RCORPUS, tau=_RTHRESH)
def test_range_search_full_probe_equals_brute(spark, vecs, tau):
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.similarity import (
        cosine,
        ivf_range_search,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 3)
    got = {
        (r.query_id, r.neighbor_id, r.sim)
        for r in ivf_range_search(
            df, q, "vec_id", "embedding", threshold=tau,
            n_centroids=4, n_probe=4, dim=4,
        ).collect()
    }
    c = df.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv")
    )
    qq = q.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    brute = {
        (r.query_id, r.neighbor_id, r.sim)
        for r in qq.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= tau)
        .collect()
    }
    assert got == brute
