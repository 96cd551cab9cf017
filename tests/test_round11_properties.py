"""Property-based tests for the round-11 ExactSubstr debut.

The operator's load-bearing claim mirrors the PPJoin one: the 64-bit
gram-hash window is candidate PRUNING only — for every corpus, the
prune→verify funnel must return exactly the one-step literal-gram
answer, which a pure-Python reference computes here from first
principles (count every L-gram occurrence, mark positions whose gram
occurs ≥ 2 times anywhere, merge covered intervals). Hypothesis draws
corpora over a 2-letter alphabet with L=3, the regime where grams
repeat constantly: within-doc self-repeats (the paper counts them),
runs ("aaaa…") that stress island merging at the p − prev_p = L
boundary, docs shorter than L (no positions at all), and exact
duplicate docs. The pinned examples cover each of those classes
deterministically.
"""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

L = 3

TEXT = st.text(alphabet="ab", min_size=0, max_size=14)
CORPUS = st.lists(TEXT, min_size=1, max_size=8)


def _ref_spans(texts: list[str], min_len: int) -> set[tuple]:
    """First-principles ExactSubstr spans: literal gram counting, no
    hashing, no pruning — the semantics the operator must equal."""
    from collections import Counter

    grams: Counter = Counter()
    for t in texts:
        for i in range(len(t) - min_len + 1):
            grams[t[i : i + min_len]] += 1
    spans = set()
    for d, t in enumerate(texts):
        ps = [
            i + 1
            for i in range(len(t) - min_len + 1)
            if grams[t[i : i + min_len]] >= 2
        ]
        run: list[int] = []
        for p in ps + [None]:  # sentinel flushes the last island
            if p is not None and (not run or p - run[-1] <= min_len):
                run.append(p)
                continue
            if run:
                spans.add(
                    (
                        d,
                        run[0],
                        run[-1] + min_len - 1,
                        run[-1] + min_len - run[0],
                        len(run),
                    )
                )
            run = [p] if p is not None else []
    return spans


@SLOW
@given(texts=CORPUS)
@example(texts=["aaaaaa"])  # one doc, pure self-repeat islands
@example(texts=["abab", "abab"])  # exact duplicate docs
@example(texts=["ab", "a", ""])  # every doc shorter than L
@example(texts=["aabaa", "baaba", "abaab"])  # dense cross-doc overlap
@example(texts=["aaab", "baaa"])  # islands meeting exactly at gap = L
def test_exact_substr_funnel_is_lossless(spark, texts):
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        exact_substr_spans,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.dup_start, r.dup_end, r.span_len, r.n_windows)
        for r in exact_substr_spans(
            df, "doc_id", "text", min_len=L
        ).collect()
    }
    assert got == _ref_spans(texts, L)
    # prune-only mode agrees wherever 64-bit collisions are absent —
    # always, at these corpus sizes
    got_noverify = {
        (r.doc_id, r.dup_start, r.dup_end, r.span_len, r.n_windows)
        for r in exact_substr_spans(
            df, "doc_id", "text", min_len=L, verify=False
        ).collect()
    }
    assert got_noverify == got


# --- span-level decontamination (bipartite ExactSubstr) ----------------
#
# Same reference-equality law, bipartite: a train position is
# contaminated iff its literal L-gram occurs anywhere in the eval
# corpus; islands merge identically. Eval-side multiplicity must NOT
# matter (a gram occurring once in eval contaminates — unlike the
# self-join's >= 2 rule), which the single-eval-doc examples pin.


def _ref_contam(train: list[str], evals: list[str], min_len: int) -> set:
    ev = {
        t[i : i + min_len]
        for t in evals
        for i in range(len(t) - min_len + 1)
    }
    spans = set()
    for d, t in enumerate(train):
        ps = [
            i + 1
            for i in range(len(t) - min_len + 1)
            if t[i : i + min_len] in ev
        ]
        run: list[int] = []
        for p in ps + [None]:
            if p is not None and (not run or p - run[-1] <= min_len):
                run.append(p)
                continue
            if run:
                spans.add(
                    (
                        d,
                        run[0],
                        run[-1] + min_len - 1,
                        run[-1] + min_len - run[0],
                        len(run),
                    )
                )
            run = [p] if p is not None else []
    return spans


@SLOW
@given(train=CORPUS, evals=CORPUS)
@example(train=["ababa"], evals=["aba"])  # single eval occurrence hits
@example(train=["aaa"], evals=["bbb"])  # no overlap → empty
@example(train=["abab", "baba"], evals=["abab"])  # exact copy + shift
@example(train=[""], evals=["aaa"])  # empty train doc
def test_contamination_spans_match_reference(spark, train, evals):
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        contamination_spans,
    )

    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(evals)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_windows)
        for r in contamination_spans(tdf, edf, "doc_id", "text", L).collect()
    }
    assert got == _ref_contam(train, evals, L)


# --- consumer-shape regression (round-11 shuffle-audit catch) ----------
#
# pandas_asof_join's cogroup children both derive from the same events
# frame; before the round-11 alias fix, an output-pruning parent
# (count()) deduplicated the shared user_id/ts attributes out of the
# right child's Arrow batches and the pandas merge_asof crashed with
# KeyError('ts'). The oracle harness collects, so it could never hit
# this — the audit's count() did. Pin BOTH consumer shapes.


def test_pandas_asof_join_survives_output_pruning(spark):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.advanced import (
        pandas_asof_join,
    )

    df = pandas_asof_join(spark, "/root/testdata/sf0.001")
    n_counted = df.count()  # output-pruning consumer (the crash shape)
    n_collected = len(
        pandas_asof_join(spark, "/root/testdata/sf0.001").collect()
    )
    assert n_counted == n_collected > 0
