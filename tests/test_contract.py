"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue", "n_lines"}


def test_oracle_keys_subset_of_queries():
    mod = _load_entry_module()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0
    for sql in os_.values():
        assert isinstance(sql, str) and sql.strip()


def test_oracle_type_lint(sf_dir):
    """DESCRIBE every oracle; no output column may be HUGEINT/unsigned.

    DuckDB's pandas/Arrow fetch paths materialize HUGEINT as float64,
    so a stringifying driver hash sees 4711.0 vs Spark's 4711 and flips
    even when rows and schema names match — the root cause of the
    round-2/round-3 text_lang_rollup + text_winnowing_fingerprints
    driver hash FAILs (VERDICT.md r3 "What's wrong" #1/#2)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from verify_local import lint_oracle_types

    from map_reduce_c_sharp_simulation_multithreaded_spark import oracle as ora
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

    con = ora.duckdb_connect(sf_dir)
    oracles = {
        n: registry.resolve_oracle(q.oracle, sf_dir)
        for n, q in registry.all_queries().items()
    }
    bad = lint_oracle_types(con, oracles)
    assert bad == [], f"driver-hash-unsafe oracle output types: {bad}"


def test_comparator_type_tags_numbers():
    """int-vs-float skew must FAIL values_match locally (it flips the
    driver's stringified hash), even though Python's 123 == 123.0."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.oracle import compare

    res = compare(["a"], [(4711,)], ["a"], [(4711.0,)])
    assert not res["values_match"]
    res = compare(["a"], [(4711,)], ["a"], [(4711,)])
    assert res["ok"]
    # floats still compare exactly by shortest-roundtrip repr
    res = compare(["a"], [(0.1,)], ["a"], [(0.1,)])
    assert res["ok"]


def test_stateful_totals_multibatch(spark, tmp_path):
    """The update-mode sink dedup must survive a multi-micro-batch
    replay (ADVICE r01: round 1 silently depended on the whole corpus
    arriving as one batch)."""
    from pyspark.sql import functions as F

    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.streaming import (
        last_update_per_user,
        stateful_user_totals,
    )
    from map_reduce_c_sharp_simulation_multithreaded_spark.streaming.events_stream import (
        run_to_completion,
    )

    src = tmp_path / "ev"
    src.mkdir()
    rows = [(i, i % 5, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    # two separate files => two micro-batches with maxFilesPerTrigger=1
    df.filter("event_id < 50").coalesce(1).write.parquet(str(src / "a.parquet"))
    df.filter("event_id >= 50").coalesce(1).write.parquet(str(src / "b.parquet"))

    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*.parquet")
    )
    out = run_to_completion(stateful_user_totals(stream), spark, "update")
    # every user was touched by both batches → sink holds 2 rows/user
    assert out.count() == 10
    final = {r.user_id: (r.n_events, r.total_value)
             for r in last_update_per_user(out).collect()}
    expect = {
        r.user_id: (r.n, r.t)
        for r in df.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .collect()
    }
    assert final == expect


def test_declared_schemas_match_corpus(spark, sf_dir):
    """Every declared StructType matches what catalog.load_table yields
    on the current corpus — catches silent testdata-generation drift
    (events.ts has already shipped as nanos-long AND micros-NTZ; date
    columns went tz → tz-naive between generations)."""
    from map_reduce_c_sharp_simulation_multithreaded_spark import schemas
    from map_reduce_c_sharp_simulation_multithreaded_spark.catalog import load_table

    for name in schemas.TABLE_NAMES:
        got = load_table(spark, sf_dir, name).schema
        assert got == schemas.TABLE_SCHEMAS[name], name
