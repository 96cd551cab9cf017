"""Source/sink coverage beyond the test-corpus parquet scans:
partitioned parquet writes (partition pruning on read-back), JSON
round-trip with explicit schema, bucketed tables (shuffle-free join
co-location — the at-scale answer to the reference's pre-partitioned
join files, ``D/Program.cs:63-149``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark.catalog import load_table
from map_reduce_c_sharp_simulation_multithreaded_spark.schemas import EVENTS


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    o.write.mode("overwrite").partitionBy("yr").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == o.count()
    one_year = back.filter(F.col("yr") == 1995)
    # partition pruning: the physical plan must carry the partition filter
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "yr" in plan
    expected = o.filter(F.col("yr") == 1995).count()
    assert one_year.count() == expected


def test_dynamic_partition_overwrite_replaces_only_touched(
    spark, sf_dir, tmp_path
):
    """partitionOverwriteMode=dynamic: an overwrite-mode write replaces
    ONLY the partitions present in the incoming frame — the idempotent
    backfill primitive for a partitioned 100 TB table (re-run one day's
    job without clobbering the other 3,649 days)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_dyn")
    o.write.mode("overwrite").partitionBy("yr").parquet(out)
    before = {
        r.yr: r.cnt
        for r in spark.read.parquet(out).groupBy("yr").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }

    # backfill 1995 with a filtered (halved) frame under dynamic mode
    patch = o.filter((F.col("yr") == 1995) & (F.col("o_orderkey") % 2 == 0))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch.write.mode("overwrite").partitionBy("yr").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = {
        r.yr: r.cnt
        for r in spark.read.parquet(out).groupBy("yr").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    assert after[1995] == patch.count() and after[1995] < before[1995]
    for yr, cnt in before.items():  # every untouched partition survives
        if yr != 1995:
            assert after[yr] == cnt, yr


def test_json_roundtrip_explicit_schema(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_json")
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(EVENTS).json(out)
    assert back.count() == ev.count()
    a = ev.agg(F.sum("value"), F.countDistinct("event_type")).collect()[0]
    b = back.agg(F.sum("value"), F.countDistinct("event_type")).collect()[0]
    assert abs(a[0] - b[0]) < 1e-6 and a[1] == b[1]


def test_bucketed_table_join_without_exchange(spark, sf_dir, tmp_path):
    # bucketBy co-locates both join sides on the key: the join plan has
    # no Exchange on the bucketed inputs (reference: co-partitioned
    # split files feeding partition-wise joins). Warehouse dir is set
    # statically by the session factory (tmp).
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c.write.mode("overwrite").bucketBy(4, "c_custkey").sortBy(
        "c_custkey"
    ).saveAsTable("bt_customer")
    o.write.mode("overwrite").bucketBy(4, "o_custkey").sortBy(
        "o_custkey"
    ).saveAsTable("bt_orders")
    bc = spark.table("bt_customer")
    bo = spark.table("bt_orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey).groupBy(
            "c_mktsegment"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not re-shuffle its bucketed inputs
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in join_part
        assert "Exchange hashpartitioning(c_custkey" not in join_part
        rows = {r.c_mktsegment: r["count"] for r in joined.collect()}
        expected = {
            r.c_mktsegment: r["count"]
            for r in o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .count()
            .collect()
        }
        assert rows == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bt_customer")
        spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_orc_roundtrip_preserves_aggregates(spark, sf_dir, tmp_path):
    """ORC sink/source (the third columnar format beside parquet and
    the reference CSV dialect): full round-trip with identical
    aggregate results and pushed-down filters on read-back."""
    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    o.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == o.count()
    a = o.agg(
        F.sum("o_totalprice").alias("s"), F.countDistinct("o_custkey").alias("c")
    ).collect()[0]
    b = back.agg(
        F.sum("o_totalprice").alias("s"), F.countDistinct("o_custkey").alias("c")
    ).collect()[0]
    assert abs(a.s - b.s) < 1e-6 and a.c == b.c
    filt = back.filter(F.col("o_orderstatus") == "F")
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderstatus" in plan


def test_bucket_pruning_reads_single_bucket(spark, sf_dir):
    """Filtering on the bucket column prunes the scan to one bucket
    (SelectedBucketsCount) — at 100 TB an equality probe on a bucketed
    fact table touches 1/N of the files before any row is read."""
    o = load_table(spark, sf_dir, "orders")
    o.write.mode("overwrite").bucketBy(8, "o_custkey").saveAsTable(
        "bp_orders"
    )
    # a bare filter gives the planner no partitioning requirement, so
    # auto-bucketed-scan would fall back to a plain scan and skip the
    # pruning this test demonstrates
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                   "false")
    try:
        probe = spark.table("bp_orders").filter(F.col("o_custkey") == 37)
        plan = probe._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:800]
        expected = o.filter(F.col("o_custkey") == 37).count()
        assert probe.count() == expected
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
        spark.sql("DROP TABLE IF EXISTS bp_orders")


def test_custom_python_sink_two_phase_commit(spark, tmp_path):
    """Spark 4 Python Data Source writer: per-task write() messages are
    aggregated by commit() and published atomically — totals must
    equal the (deterministic) source stream, task count must equal
    the source's partition count."""
    import json

    from map_reduce_c_sharp_simulation_multithreaded_spark.sources.python_source import (
        KNUTH,
        register_counting_sink,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    register_counting_sink(spark)
    df = (
        spark.read.format("synthetic_rows")
        .option("rows", "1000").option("partitions", "8").load()
    )
    out = tmp_path / "sink"
    df.write.format("counting_sink").option("path", str(out)).mode(
        "append"
    ).save()
    got = json.loads((out / "summary.json").read_text())
    want_sum = round(sum(((i * KNUTH) % 1000) / 10.0 for i in range(1000)), 2)
    assert got == {"n_rows": 1000, "v_sum": want_sum, "n_tasks": 8}
