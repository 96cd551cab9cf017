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

# events schema with ts as raw nanosecond longs (the parquet physical
# type; file-stream sources need the physical schema, conversion after).
_EVENTS_NANOS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream replay of events.parquet with µs TimestampType ts."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(_EVENTS_NANOS)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )


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
