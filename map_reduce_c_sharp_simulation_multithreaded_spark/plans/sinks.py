"""Partitioned-sink queries: the write-side data-layout surface.

The reference's only sink is an unpartitioned CSV (``D/Program.cs:
475-484``); at 100 TB the write layout IS the read performance —
a dataset partitioned by a low-cardinality column turns every
filter on that column into directory pruning (zero bytes read for
excluded partitions). This module proves the round trip: write
partitioned parquet, read it back through a partition filter, and
differentially check the result against the un-partitioned source.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..session import pin_session
from .registry import register


def partitioned_roundtrip_dir(sf_dir: str) -> str:
    """Deterministic scratch dir for the partitioned-write round trip
    (per scale factor, so concurrent sf runs don't clobber each other)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(tempfile.gettempdir(), f"mrss_sink_lang_{tag}")


@register(
    "sink_partitioned_roundtrip",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE lang IN ('en', 'de')
GROUP BY lang
""",
    tags=("sink", "layout", "partitioning"),
)
def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink + partition-pruned read-back:
    write ``documents`` partitioned by ``lang``, read it back with a
    partition filter (``lang IN ('en','de')``), aggregate, and
    differentially check against the unpartitioned source.

    The read-back scan carries the ``lang`` predicate as a
    PartitionFilter (asserted in ``tests/test_round4_ops.py``) — the
    non-matching language directories are never opened. At 100 TB this
    is the difference between scanning 2/5 of the corpus and all of
    it; the same layout also makes the partition column free to group
    by. The write is an overwrite into a per-sf scratch dir, so the
    query is idempotent under driver re-runs.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    out = partitioned_roundtrip_dir(sf_dir)
    d.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out).filter(F.col("lang").isin("en", "de"))
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
