"""Set operations, distinct/dedup, sorts, limits, top-k.

The reference's only set-like operation is the reduce-side bag-union of
partial aggregates (``D/Program.cs:151-165``) — i.e. UNION ALL +
re-aggregate in disguise. This module covers the full family
(SURVEY.md §2.3 "Set operations" / "Sorts / limits / top-k").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..session import pin_session
from .registry import register


def _nationkeys(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c, s


@register(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): union + dropDuplicates, one shuffle."""
    pin_session(spark)
    c, s = _nationkeys(spark, sf_dir)
    return c.union(s).distinct()


@register(
    "set_union_all_reaggregate",
    oracle="""
SELECT nationkey, COUNT(*) AS n
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
)
GROUP BY nationkey
""",
    tags=("setop", "aggregate", "parity"),
)
def set_union_all_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + re-aggregate — the reference's merge step
    (``D/Program.cs:151-165``) as a declarative plan."""
    pin_session(spark)
    c, s = _nationkeys(spark, sf_dir)
    return c.union(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    pin_session(spark)
    c, s = _nationkeys(spark, sf_dir)
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers.

    ``subtract`` is Spark's EXCEPT DISTINCT (``exceptAll`` would be bag
    semantics: remove one occurrence per right row — not this query).
    """
    pin_session(spark)
    c, s = _nationkeys(spark, sf_dir)
    return c.subtract(s)


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("setop", "dedup"),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a column subset (exact dedup primitive)."""
    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").dropDuplicates()


@register(
    "orderby_limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    tags=("sort", "topk"),
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject —
    per-partition heaps + driver merge of k rows, never a full sort.
    The tiebreak makes the k-boundary deterministic."""
    pin_session(spark)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "sort_within_partitions_sample",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("sort",),
)
def sort_within_partitions_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repartition-by-key + sortWithinPartitions (the write-path pattern
    for sorted sinks / bucketed tables) feeding an aggregate; results
    are order-insensitive so the oracle is the plain aggregate."""
    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    arranged = li.repartition(8, "l_returnflag").sortWithinPartitions(
        "l_returnflag", "l_orderkey"
    )
    return arranged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@register(
    "set_except_all",
    oracle="""
SELECT l_returnflag FROM lineitem WHERE l_linenumber <= 2
EXCEPT ALL
SELECT l_returnflag FROM lineitem WHERE l_linenumber = 1
""",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): each right-side occurrence removes
    exactly one left-side occurrence."""
    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 2).select("l_returnflag")
    b = li.filter(F.col("l_linenumber") == 1).select("l_returnflag")
    return a.exceptAll(b)


@register(
    "sample_deterministic_count",
    oracle=None,  # sampling RNG is engine-specific; only the statistical
    # envelope is checkable (pinned in pytest)
    tags=("sample",),
)
def sample_deterministic_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling: same seed → same sample within Spark.

    Returns per-flag sampled counts; determinism within the engine is
    what matters at scale (re-runs of a pipeline must see the same
    sample), cross-engine equality is impossible by construction.
    """
    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@register(
    "sample_stratified_by_lang",
    oracle=None,  # seeded sampling RNG is engine-specific; envelope
    # + determinism pinned in pytest
    tags=("sample", "mlprep"),
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (``sampleBy``): per-language fractions — the
    corpus-rebalancing primitive (downsample the dominant language,
    keep the tail) every training-data pipeline needs. Seeded, so
    re-runs see the same sample; per-stratum rates are pinned in
    pytest, cross-engine equality is impossible by construction."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    # Per-stratum fraction derived from the lang value itself (hash
    # parity → 0.25 or 0.75), then Bernoulli-filtered with a seeded
    # rand — semantically sampleBy, but with no driver round-trip to
    # enumerate strata (round 1 ran a collect() at plan-build time;
    # at 100 TB the stratum list shouldn't require a pre-pass).
    frac = F.when(F.pmod(F.xxhash64("lang"), F.lit(2)) == 0, 0.25).otherwise(
        0.75
    )
    return (
        d.withColumn("_frac", frac)
        .filter(F.rand(42) < F.col("_frac"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
