"""Round-15 optimization pins: value identity for the plan rewrites of
optimization round 2 (VERDICT r14 "next round" items), each one a
differential test of the new vectorized/folded form against the exact
column/explode form it replaced."""

from __future__ import annotations

import pytest


@pytest.mark.usefixtures("spark")
def test_doc_term_stats_rows_match_explode_groupby(spark):
    """doc_term_stats_rows must equal explode(tokens(lower(text))) +
    groupBy(doc).agg(count, sum(term == t)...) exactly — dl, each
    fixed-vocabulary tf column, and the zero-token row-drop contract
    (the r15 bm25 docstats fold)."""
    from pyspark.sql import functions as F

    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.text import (
        doc_term_stats_rows,
        tokens,
    )

    terms = ("join", "hash", "vector")
    rows = [
        (1, "join hash JOIN Join vector other join"),
        (2, ""),
        (3, "   "),
        (4, "no query terms here"),
        (5, "hash"),
        (6, None),
        (7, "vector vector vector hash"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    occ = df.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    old = {
        r["doc_id"]: (
            r["dl"],
            *[r[f"_tf{i}"] for i in range(len(terms))],
        )
        for r in occ.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum((F.col("term") == t).cast("long")).alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ],
        )
        .collect()
    }
    new = {
        r["doc_id"]: (
            r["dl"],
            *[r[f"_tf{i}"] for i in range(len(terms))],
        )
        for r in doc_term_stats_rows(df, "doc_id", "text", terms).collect()
    }
    assert new == old
    # zero-token and null docs emit no row, like the explode form
    assert {1, 4, 5, 7} == set(new)
