"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

The reference's only extensibility story is editing its hand-rolled CSV
reader (``D/Program.cs:512-573``); Spark 4's Python Data Source API is
the modern equivalent surface — a pluggable, PARTITIONED source whose
``partitions()``/``read(partition)`` contract is exactly the reference's
split-file + per-worker-reader design (``D/Program.cs:63-149``)
formalized: the planner asks the source for its splits and schedules
one task per split, so reads parallelize across executors with no
driver involvement per row.

The synthetic source here yields deterministic rows from a
multiplicative-hash formula, so an independent engine can reproduce the
stream exactly (DuckDB ``range()``) — keeping even the custom-source
path under the differential-oracle regime.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

KNUTH = 2654435761  # Knuth's multiplicative hash constant


class SyntheticRowsReader(DataSourceReader):
    """Range-split reader: each InputPartition carries (lo, hi)."""

    def __init__(self, options) -> None:
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))

    def partitions(self):  # planner-visible splits → one task each
        step = max(1, self.n // self.parts)
        bounds = list(range(0, self.n, step)) + [self.n]
        return [
            InputPartition((lo, hi))
            for lo, hi in zip(bounds, bounds[1:])
            if lo < hi
        ]

    def read(self, partition):  # runs executor-side, one call per split
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, float((i * KNUTH) % 1000) / 10.0)


class SyntheticRowsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_rows"

    def schema(self) -> StructType:
        return StructType(
            [StructField("id", LongType()), StructField("v", DoubleType())]
        )

    def reader(self, schema) -> SyntheticRowsReader:
        return SyntheticRowsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticRowsSource)
