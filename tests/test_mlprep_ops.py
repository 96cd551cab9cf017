"""Semantic invariants for contamination audit, span dedup, and int8
quantization (cross-engine agreement is covered by test_oracle_parity;
these pin properties the hash comparison can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark.catalog import load_table
from map_reduce_c_sharp_simulation_multithreaded_spark.plans.dedup import (
    dedup_span_windows,
)
from map_reduce_c_sharp_simulation_multithreaded_spark.plans.mlprep import (
    contamination_eval_overlap,
    quantize_embeddings_int8,
)


def test_contamination_flags_match_direct_recompute(spark, sf_dir):
    rows = {r.doc_id: r for r in contamination_eval_overlap(spark, sf_dir).collect()}
    # no eval doc may appear in the audit (train-only output)
    assert all(doc_id % 20 != 7 for doc_id in rows)

    # recompute 13-gram sets in plain Python and compare flags exactly
    docs = {
        r.doc_id: r.text.split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    grams = {
        d: {" ".join(tk[i : i + 13]) for i in range(len(tk) - 12)}
        for d, tk in docs.items()
        if len(tk) >= 13
    }
    eval_grams = {d: g for d, g in grams.items() if d % 20 == 7}
    for d, g in grams.items():
        if d % 20 == 7:
            continue
        shared = {x for eg in eval_grams.values() for x in g & eg}
        hit_docs = {ed for ed, eg in eval_grams.items() if g & eg}
        r = rows[d]
        assert (r.n_shared_13grams, r.n_eval_docs_hit, r.contaminated) == (
            len(shared),
            len(hit_docs),
            bool(hit_docs),
        ), f"doc {d}"


def test_span_dedup_conservation(spark, sf_dir):
    out = dedup_span_windows(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_spans
        assert r.n_spans >= 1  # len>=10 filter guarantees a span
    total_spans = sum(r.n_spans for r in out)
    docs = load_table(spark, sf_dir, "documents").collect()
    expected = sum(len(d.text.split()) // 10 for d in docs)
    assert total_spans == expected


def test_span_dedup_first_occurrence_wins(spark, sf_dir):
    out = {r.doc_id: r for r in dedup_span_windows(spark, sf_dir).collect()}
    dropped_docs = [d for d, r in out.items() if r.n_dropped > 0]
    if not dropped_docs:  # corpus-dependent; sf0.001+ has planted dups
        return
    # the lowest doc_id overall can never have a dropped span
    first = min(out)
    assert out[first].n_dropped == 0


def test_quantization_error_and_saturation_bounds(spark, sf_dir):
    out = quantize_embeddings_int8(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # symmetric round-to-nearest: reconstruction error ≤ scale/2 (+ulp)
        assert r.max_abs_err <= r.qscale_r / 2 + 1e-9, r.vec_id
        # the max-|v| component always maps to ±127
        assert r.n_extreme >= 1, r.vec_id


def test_zorder_key_matches_python_interleave(spark):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.layout import (
        zorder_key,
    )

    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }

    def interleave(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for x, y in pts:
        assert got[(x, y)] == interleave(x, y), (x, y)


def test_zorder_tiles_bound_both_dimensions(spark, sf_dir):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.layout import (
        layout_zorder_tiles,
    )

    rows = layout_zorder_tiles(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        # tile = zkey >> 20 frees 10 bits per dimension: both spans
        # are bounded — the data-skipping property a plain sort lacks
        assert r.max_x - r.min_x <= 1023, r.tile
        assert r.max_y - r.min_y <= 1023, r.tile


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.setops import (
        sample_weighted_priority,
    )

    rows = sample_weighted_priority(spark, sf_dir).collect()
    assert len(rows) == 50
    assert len({r.doc_id for r in rows}) == 50  # without replacement
    sampled_avg = sum(r.n_chars for r in rows) / len(rows)
    corpus = load_table(spark, sf_dir, "documents").agg(
        F.avg("n_chars").alias("a")
    ).collect()[0].a
    # inclusion ∝ n_chars: the sample must skew heavy (size-biased mean;
    # weights span ~1 order of magnitude here, measured ratio ≈ 1.13)
    assert sampled_avg > corpus * 1.08, (sampled_avg, corpus)


def test_funnel_stages_are_monotone(spark, sf_dir):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.events import (
        events_cohort_retention,
        events_funnel_view_click_purchase,
        events_time_to_convert,
    )

    f = events_funnel_view_click_purchase(spark, sf_dir).collect()[0]
    assert f.n_view_users >= f.n_click_after >= f.n_purchase_within_7d
    assert f.n_view_users > 0

    t = events_time_to_convert(spark, sf_dir).collect()[0]
    assert t.min_s <= t.p50_s <= t.p90_s <= t.max_s
    assert t.n_converted > 0

    rows = events_cohort_retention(spark, sf_dir).collect()
    # offsets start at 0 and cohort sizes never exceed the week-0 count
    base = {r.cohort_wk: r.n_users for r in rows if r.week_offset == 0}
    for r in rows:
        assert r.week_offset >= 0
        assert r.n_users <= base[r.cohort_wk]
