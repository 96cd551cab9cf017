"""Round-4 regression tests: the variance-clamp seam (ADVICE.md r3)
and the zero-sign normalization caught by the type-tagged comparator.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark import oracle as ora
from map_reduce_c_sharp_simulation_multithreaded_spark import schemas
from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry


def _write_constant_price_corpus(spark, out_dir: str) -> None:
    """lineitem+part where one brand's price is constant at a value that
    pushes the decimal-exact variance formula slightly NEGATIVE through
    double cancellation (found by search: x=1000.07, n=11 gives
    var_raw ≈ -1.35e-10). Without the greatest(.., 0) clamp Spark's
    floor(sqrt(negative)) and DuckDB's disagree on the NaN."""
    li_rows = [
        # (orderkey, partkey, suppkey, linenumber, qty, price, disc, tax,
        #  returnflag, linestatus, shipdate)
        (i, 1, 1, 1, 1.0, 1000.07, 0.0, 0.0, "N", "O", None)
        for i in range(11)
    ] + [
        # a second, 2-row varying brand so the CASE WHEN n > 1 branch
        # with real variance is exercised too
        (100 + i, 2, 1, 1, 1.0, 900.0 + 200.0 * i, 0.0, 0.0, "N", "O", None)
        for i in range(2)
    ]
    part_rows = [
        (1, "part one", "Brand#CONST", "T", 1, 1000.07),
        (2, "part two", "Brand#VARY", "T", 1, 1000.0),
    ]
    spark.createDataFrame(li_rows, schemas.TABLE_SCHEMAS["lineitem"]).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/lineitem.parquet")
    spark.createDataFrame(part_rows, schemas.TABLE_SCHEMAS["part"]).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/part.parquet")


def test_stats_by_brand_variance_clamp(spark, tmp_path):
    """A (near-)constant price group yields sd_price = var_price = 0.0 —
    not NaN, not a negative — and Spark and DuckDB agree exactly."""
    out = str(tmp_path / "corpus")
    _write_constant_price_corpus(spark, out)
    q = registry.all_queries()["agg_stats_by_brand"]

    sdf = q.fn(spark, out)
    scols, srows = ora.spark_result(sdf)
    by_brand = {r[scols.index("p_brand")]: dict(zip(scols, r)) for r in srows}
    const = by_brand["Brand#CONST"]
    assert const["sd_price"] == 0.0
    assert const["var_price"] == 0.0
    vary = by_brand["Brand#VARY"]
    assert vary["sd_price"] == pytest.approx(141.42, abs=0.01)

    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            # Spark writes a parquet DIRECTORY; duckdb needs the glob
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{out}/{t}.parquet/*.parquet')"
        )
    ocols, orows = ora.oracle_result(con, q.oracle)
    res = ora.compare(scols, srows, ocols, orows)
    assert res["ok"], res


def test_zero_sign_normalized(spark):
    """The + 0.0 pattern turns a rounded -0.0 into +0.0 (IEEE), so the
    driver's stringified hash cannot see "-0.0" vs "0.0"."""
    row = spark.range(1).select(
        (F.round(F.lit(-0.0004), 3) + F.lit(0.0)).alias("v")
    ).collect()[0]
    assert repr(row.v) == "0.0"
    (dv,) = duckdb.connect().execute(
        "SELECT ROUND(CAST(-0.0004 AS DOUBLE), 3) + 0.0"
    ).fetchone()
    assert repr(dv) == "0.0"


# ---------- round-4 new operators ----------


def _write_docs(spark, out_dir: str, texts: list[str]) -> None:
    rows = [
        (i, t, "en", "test", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(rows, schemas.TABLE_SCHEMAS["documents"]).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")


def test_bpe_merges_hand_computed(spark, tmp_path):
    """Planted micro-corpus with a hand-computed greedy merge sequence,
    including the overlap case ("aaa" under pair (a,a) merges left-to-
    right into [aa, a]) and a round-3 single-symbol word (no pairs)."""
    out = str(tmp_path / "bpe")
    # words: aa x3, ab x2, aaa x1
    _write_docs(spark, out, ["aa aa aa", "ab ab", "aaa"])
    q = registry.all_queries()["text_bpe_merges"]
    rows = {r["merge_rank"]: r for r in q.fn(spark, out).collect()}
    # round 1: (a,a) count 5 beats (a,</w>) count 4
    assert (rows[1]["left_sym"], rows[1]["right_sym"], rows[1]["pair_count"]) == (
        "a", "a", 5,
    )
    # round 2: "aa" -> [aa,</w>] x3 makes (aa,</w>) the winner;
    # "aaa" contributed [aa, a, </w>] — the greedy (not maximal) split
    assert (rows[2]["left_sym"], rows[2]["right_sym"], rows[2]["pair_count"]) == (
        "aa", "</w>", 3,
    )
    # round 3: (a,b) count 2 wins on the (count DESC, pair ASC) tiebreak
    assert (rows[3]["left_sym"], rows[3]["right_sym"], rows[3]["pair_count"]) == (
        "a", "b", 2,
    )


def test_bpe_merges_matches_oracle_on_planted_corpus(spark, tmp_path):
    """Cross-engine: the fold-based Spark rewrite and the SQL islands
    formulation agree on the planted corpus (beyond the driver corpus)."""
    out = str(tmp_path / "bpe_x")
    _write_docs(
        spark, out,
        ["the cat sat on the mat", "the cat ate", "banana bandana", "aaa aa a"],
    )
    q = registry.all_queries()["text_bpe_merges"]
    scols, srows = ora.spark_result(q.fn(spark, out))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{out}/documents.parquet/*.parquet')"
    )
    ocols, orows = ora.oracle_result(con, q.oracle)
    res = ora.compare(scols, srows, ocols, orows)
    assert res["ok"], res


def _write_embeddings(spark, out_dir: str, vecs: dict[int, list[float]]) -> None:
    rows = [(vid, [float(x) for x in v], 0) for vid, v in vecs.items()]
    spark.createDataFrame(rows, schemas.TABLE_SCHEMAS["embeddings"]).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/embeddings.parquet")


def test_semantic_dedup_drops_planted_duplicate(spark, tmp_path):
    """An exact duplicate vector lands in the same cell as its twin
    (identical argmax) and is dropped; the lowest id survives; an
    orthogonal-ish distinct vector is kept."""
    out = str(tmp_path / "semdedup")
    base = [1.0] + [0.0] * 63
    near = [1.0, 0.05] + [0.0] * 62  # cosine ~0.999 with base
    other = [0.0] * 32 + [1.0] + [0.0] * 31
    _write_embeddings(spark, out, {10: base, 20: list(base), 30: near, 40: other})
    q = registry.all_queries()["dedup_semantic_clusters"]
    got = {r["vec_id"]: r for r in q.fn(spark, out).collect()}
    assert set(got) == {10, 20, 30, 40}
    assert got[10]["kept"] == 1          # lowest id in its dup group
    assert got[20]["kept"] == 0          # exact twin of 10
    assert got[30]["kept"] == 0          # near-dup of 10, same cell
    assert got[40]["kept"] == 1          # no lower-id neighbor
    assert got[10]["cell"] == got[20]["cell"] == got[30]["cell"]


def test_sink_partitioned_roundtrip_prunes_partitions(spark, sf_dir):
    """The read-back scan must carry the lang predicate as a
    PartitionFilter (directory pruning — the write layout pays for the
    read), and the round trip must preserve the aggregate."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.sinks import (
        partitioned_roundtrip_dir,
        sink_partitioned_roundtrip,
    )

    df = sink_partitioned_roundtrip(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    # the scan must NOT read lang as a data column (it's a directory key)
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan_lines and all("ReadSchema" not in ln or "lang" not in
                              ln.split("ReadSchema")[1] for ln in scan_lines)
    got = {r["lang"]: (r["n_docs"], r["total_chars"]) for r in df.collect()}
    from map_reduce_c_sharp_simulation_multithreaded_spark.catalog import load_table

    src = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c"))
    )
    want = {r["lang"]: (r["n"], r["c"]) for r in src.collect()}
    assert got == want


def test_bucketed_colocated_join_has_no_exchange_on_inputs(spark, sf_dir):
    """The registered bucketed-join query must sort-merge join the two
    bucketed tables without re-shuffling either input — the whole point
    of paying for bucketing at write time."""
    q = registry.all_queries()["join_bucketed_colocated"]
    df = q.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange hashpartitioning(o_custkey" not in join_part
    assert "Exchange hashpartitioning(c_custkey" not in join_part
    # bucket pruning metadata present on both scans
    assert plan.count("SelectedBucketsCount") >= 2 or "Bucketed: true" in plan


def test_json_roundtrip_preserves_dates_and_money(spark, sf_dir):
    """Date and double columns survive the JSON text round trip with a
    schema-explicit read (no inference)."""
    q = registry.all_queries()["source_json_roundtrip"]
    got = {r["o_orderpriority"]: r for r in q.fn(spark, sf_dir).collect()}
    from map_reduce_c_sharp_simulation_multithreaded_spark.catalog import load_table

    want = {
        r["o_orderpriority"]: r
        for r in (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 100 == 0)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderdate").alias("first_date"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                    "total_cents"
                ),
            )
            .collect()
        )
    }
    assert set(got) == set(want)
    for k in got:
        assert (got[k]["n_orders"], got[k]["first_date"], got[k]["total_cents"]) == (
            want[k]["n_orders"], want[k]["first_date"], want[k]["total_cents"],
        )


def test_pca_power_iteration_finds_planted_direction(spark, tmp_path):
    """A corpus with dominant variance along axis 6 (1-based) must put
    its largest |loading| there, and the loadings must be unit-norm."""
    out = str(tmp_path / "pca")
    vecs = {}
    for i in range(40):
        v = [0.01 * ((i * 7 + j) % 5 - 2) for j in range(64)]  # small noise
        v[5] = 10.0 if i % 2 == 0 else -10.0  # dominant +/- axis 6
        vecs[i] = v
    _write_embeddings(spark, out, vecs)
    q = registry.all_queries()["embed_pca_power_iteration"]
    rows = q.fn(spark, out).collect()
    assert len(rows) == 64
    by_pos = {r["pos"]: r["loading"] for r in rows}
    top = max(by_pos, key=lambda p: abs(by_pos[p]))
    assert top == 6
    norm = sum(v * v for v in by_pos.values()) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-4)


def test_perplexity_filter_separates_predictable_from_rare(spark, tmp_path):
    """Under a corpus LM where 'the'→{cat,dog} splits 50/50 and 'the
    rat' appears once, the rare continuation scores ln(101) nats and
    is dropped; the common ones score ln(101/50) and are kept."""
    import math

    out = str(tmp_path / "pplx")
    texts = ["the cat"] * 50 + ["the dog"] * 50 + ["the rat"]
    _write_docs(spark, out, texts)
    q = registry.all_queries()["quality_perplexity_filter"]
    rows = {r["doc_id"]: r for r in q.fn(spark, out).collect()}
    assert len(rows) == 101
    cat = rows[0]          # a "the cat" doc
    rat = rows[100]        # the "the rat" doc
    assert cat["avg_nll_e4"] == round(math.log(101 / 50) * 10000)  # 7032
    assert rat["avg_nll_e4"] == round(math.log(101) * 10000)       # 46151
    assert cat["kept"] == 1 and rat["kept"] == 0


def test_sink_queries_are_rerun_idempotent(spark, sf_dir):
    """The driver may run a query repeatedly (and across processes
    whose catalogs forgot the scratch tables): both side-effecting
    queries must return identical results on an immediate re-run."""
    for name in ("sink_partitioned_roundtrip", "join_bucketed_colocated",
                 "source_json_roundtrip", "dedup_incremental_index",
                 "source_orc_roundtrip"):
        q = registry.all_queries()[name]
        first = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
        second = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
        assert first == second, name
