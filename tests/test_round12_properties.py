"""Property-based tests for the round-12 debut: cut_spans, the
ExactSubstr pipeline's ACTION half (detect → cut).

Two laws, both from first principles:

1. SURGERY — the emitted segments are exactly the complement of the
   detected spans: a pure-Python reference recomputes the duplicated
   positions by literal gram counting, takes the complement intervals,
   and the operator's (doc, seg_start, seg_end, seg_text) set must
   equal it (including seg_text content — the substring arithmetic is
   1-based and inclusive on both ends, an off-by-one trap on each
   side).

2. THE PAPER'S INVARIANT (Lee et al. 2022) — after cutting, the
   deduplicated corpus contains NO duplicated L-gram: every L-gram
   lying fully inside a kept segment occurs exactly once across ALL
   kept segments. This is why segments are emitted as rows instead of
   re-joined strings: a gram inside a segment sits at an unmarked
   position of the original corpus (occurred once), whereas re-joining
   would manufacture new seam-spanning grams the invariant says
   nothing about.

Same corpus regime as the round-11 suite: 2-letter alphabet, L=3,
where grams collide constantly and docs routinely become 100 %
duplicate (zero segments — the head/tail emptiness edge).
"""

from __future__ import annotations

from collections import Counter

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


def _ref_segments(texts: list[str], min_len: int) -> set[tuple]:
    """First-principles kept segments: literal gram counting, marked
    positions, complement intervals — no hashing, no Spark."""
    grams: Counter = Counter()
    for t in texts:
        for i in range(len(t) - min_len + 1):
            grams[t[i : i + min_len]] += 1
    out = set()
    for d, t in enumerate(texts):
        covered = [False] * len(t)
        for i in range(len(t) - min_len + 1):
            if grams[t[i : i + min_len]] >= 2:
                for j in range(i, i + min_len):
                    covered[j] = True
        seg_id, start = 0, None
        for i in range(len(t) + 1):
            if i < len(t) and not covered[i]:
                if start is None:
                    start = i
                continue
            if start is not None:
                seg_id += 1
                out.add(
                    (d, seg_id, start + 1, i, i - start, t[start:i])
                )
                start = None
    return out


def _run_cut(spark, texts: list[str]):
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        cut_spans,
        exact_substr_spans,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = exact_substr_spans(df, "doc_id", "text", min_len=L)
    return cut_spans(df, spans, "doc_id", "text").collect()


@SLOW
@given(texts=CORPUS)
@example(texts=["aaaaaa"])  # 100 % duplicate → zero segments
@example(texts=["abab", "abab"])  # exact duplicate docs
@example(texts=["ab", "a", ""])  # every doc shorter than L → whole-doc segs
@example(texts=["aabaa", "baaba", "abaab"])  # dense cross-doc overlap
@example(texts=["aaab", "baaa"])  # islands meeting exactly at gap = L
@example(texts=["abbbbba", "bbbbb"])  # interior span, head+tail segments
def test_cut_spans_surgery_matches_reference(spark, texts):
    got = {
        (r.doc_id, r.seg_id, r.seg_start, r.seg_end, r.seg_len, r.seg_text)
        for r in _run_cut(spark, texts)
    }
    assert got == _ref_segments(texts, L)


@SLOW
@given(texts=CORPUS)
@example(texts=["abab", "abab"])
@example(texts=["aabaa", "baaba", "abaab"])
@example(texts=["abbbbba", "bbbbb"])
def test_cut_corpus_has_no_duplicated_gram(spark, texts):
    grams: Counter = Counter()
    for r in _run_cut(spark, texts):
        t = r.seg_text
        for i in range(len(t) - L + 1):
            grams[t[i : i + L]] += 1
    dup = {g: n for g, n in grams.items() if n >= 2}
    assert not dup, f"duplicated grams survive the cut: {dup}"


@SLOW
@given(train=CORPUS, evals=CORPUS)
@example(train=["abab"], evals=["abab"])  # whole train doc leaked
@example(train=["aabbb", "bbbaa"], evals=["abbba"])  # partial overlaps
@example(train=["ab", ""], evals=["aaa"])  # train shorter than L
def test_decontaminated_corpus_has_no_eval_gram(spark, train, evals):
    """The bipartite invariant (contamination_cut_spans): after
    surgery, NO L-gram inside a kept training segment occurs anywhere
    in the eval suite — the decontaminated corpus is verbatim-clean."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        contamination_spans,
        cut_spans,
    )

    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(evals)],
        "doc_id long, text string",
    )
    spans = contamination_spans(tdf, edf, "doc_id", "text", L)
    segs = cut_spans(
        tdf, spans, "doc_id", "text",
        start_col="span_start", end_col="span_end",
    ).collect()
    eval_grams = {
        t[i : i + L] for t in evals for i in range(len(t) - L + 1)
    }
    leaked = {
        r.seg_text[i : i + L]
        for r in segs
        for i in range(len(r.seg_text) - L + 1)
        if r.seg_text[i : i + L] in eval_grams
    }
    assert not leaked, f"eval grams survive decontamination: {leaked}"


@SLOW
@given(texts=CORPUS)
@example(texts=["abab", "abab"])
@example(texts=["aabaa", "baaba", "abaab"])
@example(texts=["abbbbba", "bbbbb"])
@example(texts=["aaab", "baaa"])
def test_cut_output_is_a_fixpoint_of_exact_substr(spark, texts):
    """The DIRECT form of the paper's convergence check (VERDICT r12
    next-round #5): running the DETECTOR on the cut output — kept
    segments as documents — finds ZERO spans. Stronger than gram
    counting through one subtlety it exercises for free: the detector
    counts WITHIN-document repeats too, so the fixpoint also certifies
    that no kept segment internally repeats a gram. One pass suffices
    (cut(cut(x)) == cut(x)) because surgery removes EVERY occurrence
    of a duplicated gram, not all-but-one."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        exact_substr_spans,
    )

    segs = _run_cut(spark, texts)
    rows = [
        (r.doc_id * 1000 + r.seg_id, r.seg_text) for r in segs
    ]
    if not rows:
        return  # fully-duplicated corpus: empty output is trivially fixed
    seg_df = spark.createDataFrame(rows, "doc_id long, text string")
    residual = exact_substr_spans(seg_df, "doc_id", "text", min_len=L).collect()
    assert not residual, (
        f"detector finds spans in its own cut output: {residual}"
    )


@SLOW
@given(
    positions=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=25
    )
)
@example(positions=[1, 4])           # gap == L: one island (touching covers)
@example(positions=[1, 5])           # gap == L+1: two islands, 1-char gap
@example(positions=[1, 1, 2, 9, 9])  # duplicates + interior split
def test_span_islands_output_is_disjoint_and_non_adjacent(spark, positions):
    """The precondition cut_spans' public contract leans on (ADVICE
    r12 #3): _span_islands output within a document is sorted,
    pairwise DISJOINT and NON-ADJACENT (next.start > prev.end + 1),
    and covers exactly the union of the marked [p, p+L-1] intervals.
    Pinning it here makes the contract chain airtight: both detectors
    emit islands, islands satisfy the precondition, cut_spans assumes
    it."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        _span_islands,
    )

    marked = spark.createDataFrame(
        [(1, p) for p in positions], "_id long, _p long"
    )
    rows = sorted(
        _span_islands(marked, L).collect(), key=lambda r: r.span_start
    )
    covered_ref = set()
    for p in positions:
        covered_ref.update(range(p, p + L))
    covered_got = set()
    prev_end = None
    for r in rows:
        assert r.span_end >= r.span_start
        if prev_end is not None:
            assert r.span_start > prev_end + 1, (
                f"adjacent or overlapping islands: prev_end={prev_end}, "
                f"next_start={r.span_start}"
            )
        prev_end = r.span_end
        covered_got.update(range(r.span_start, r.span_end + 1))
    assert covered_got == covered_ref
