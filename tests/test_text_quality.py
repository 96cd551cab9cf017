"""Edge semantics for the Gopher quality pack and PII redaction —
the differential oracle (test_oracle_parity) covers corpus-wide
agreement; these pin the corner cases the corpus never hits."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark.operators.text import (
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    tokens,
    top_repeated_shingle,
    word_shingles,
)


def _mode_of(spark, text: str):
    df = spark.createDataFrame([(text,)], "text string")
    col = top_repeated_shingle(
        F.array_sort(word_shingles(tokens(F.col("text")), 2))
    )
    return df.select(col.alias("m")).collect()[0].m


def test_top_shingle_counts_runs(spark):
    m = _mode_of(spark, "a b a b a b c")
    # 2-grams: [a b, b a, a b, b a, a b, b c] -> "a b" x3
    assert (m.bestg, m.best) == ("a b", 3)


def test_top_shingle_tie_breaks_lexicographically(spark):
    # "x y" and "a b" both occur twice; the smaller gram must win,
    # matching the oracle's ORDER BY cnt DESC, gram ASC
    m = _mode_of(spark, "x y q a b q x y q a b")
    assert (m.bestg, m.best) == ("a b", 2)


def test_top_shingle_short_doc_empty(spark):
    m = _mode_of(spark, "single")
    assert (m.bestg, m.best) == ("", 0)


def test_pii_redaction_replaces_all_instances(spark):
    df = spark.createDataFrame(
        [("mail a@b.io and c.d@e-f.org call +1-555-0001 +1-555-9999 "
          "from 10.3.0.1 not 11.3.0.1",)],
        "t string",
    )
    out = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("t"), PII_EMAIL_RE, "<EMAIL>"),
                PII_PHONE_RE,
                "<PHONE>",
            ),
            PII_IP_RE,
            "<IP>",
        ).alias("r"),
        F.regexp_count("t", F.lit(PII_EMAIL_RE)).alias("ne"),
        F.regexp_count("t", F.lit(PII_PHONE_RE)).alias("np"),
        F.regexp_count("t", F.lit(PII_IP_RE)).alias("ni"),
    ).collect()[0]
    assert out.r == (
        "mail <EMAIL> and <EMAIL> call <PHONE> <PHONE> from <IP> not 11.3.0.1"
    )
    assert (out.ne, out.np, out.ni) == (2, 2, 1)


def test_gopher_verdict_on_crafted_docs(spark, sf_dir):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.text import (
        text_gopher_quality,
    )

    rows = text_gopher_quality(spark, sf_dir).collect()
    assert len(rows) > 0
    # the verdict must not be degenerate on the shipped corpus
    verdicts = {r.gopher_pass for r in rows}
    assert verdicts == {True, False}
    for r in rows:
        assert r.n_distinct_tokens <= r.n_tokens
        assert r.n_distinct_5grams <= r.n_5grams
        assert r.top2_count >= 1


def test_countmin_upper_bound_holds(spark, sf_dir):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.text import (
        sketch_countmin_terms,
    )

    rows = sketch_countmin_terms(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        # the count-min guarantee: estimates never undercount
        assert r.cm_estimate >= r.exact_count, r.tok
        assert r.is_upper_bound


def test_token_poly_hash_matches_python_reference(spark):
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.text import (
        token_poly_hash,
    )

    words = ["spark", "join", "a", "customer", "averyverylongtokenindeed"]
    df = spark.createDataFrame([(w,) for w in words], "tok string")
    got = {
        r.tok: r.h
        for r in df.select("tok", token_poly_hash(F.col("tok")).alias("h")).collect()
    }
    for w in words:
        expect = sum(
            ord(c) * pow(257, i, 1000003) for i, c in enumerate(w[:12])
        ) % 1000003
        assert got[w] == expect, w
