"""Structured Streaming over the ``events`` table.

The reference has no streaming at all (its pull loop is pipelined
batch, ``D/Program.cs:74,116``; SURVEY.md §2.3 "Streaming"). Here the
events parquet is replayed as a file stream and every result is
produced by a real streaming query (watermark, windowed state, memory
sink drained with ``processAllAvailable``) — the same plan shape that
would run against Kafka at scale; only the source line changes.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_COUNTER = itertools.count()

def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream replay of events.parquet with µs TimestampType ts.

    File-stream sources need an explicit schema, and events.ts has
    shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across
    corpus generations — so the schema is taken from a (lazy, footer
    -only) batch read of the same file and ts normalized per dtype,
    exactly as in ``catalog.load_table``.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    physical = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    stream = (
        spark.readStream.schema(physical)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(physical["ts"].dataType, T.LongType):
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_completion(
    stream_df: DataFrame, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming plan over the full replay and return the
    materialized result (memory sink + processAllAvailable)."""
    name = f"mrcs_stream_{next(_COUNTER)}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
