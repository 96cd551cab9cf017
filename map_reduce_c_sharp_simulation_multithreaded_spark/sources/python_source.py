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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
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


class _CountingCommit(WriterCommitMessage):
    """Commit message carrying per-task row counts + a value sum."""

    def __init__(self, n_rows: int, v_sum: float) -> None:
        self.n_rows = n_rows
        self.v_sum = v_sum


class CountingSinkWriter(DataSourceWriter):
    """Custom sink writer: ``write`` runs once per partition on
    executors and emits a commit message; the driver-side ``commit``
    aggregates the task messages — the two-phase-commit contract every
    distributed sink implements (and the formalization of the
    reference's per-worker partial-result files + master merge,
    ``D/Program.cs:320-329,151-165``)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator):
        n, s = 0, 0.0
        for row in iterator:
            n += 1
            s += row.v
        return _CountingCommit(n, round(s, 2))

    def commit(self, messages):
        # publish atomically: summary visible only after ALL tasks
        # succeeded (the _SUCCESS-marker discipline)
        import json
        import os

        summary = {
            "n_rows": sum(m.n_rows for m in messages),
            "v_sum": round(sum(m.v_sum for m in messages), 2),
            "n_tasks": len(messages),
        }
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, "_summary.json.tmp")
        with open(tmp, "w") as f:
            json.dump(summary, f)
        os.replace(tmp, os.path.join(self.path, "summary.json"))

    def abort(self, messages):  # pragma: no cover - error path
        pass


class CountingSink(DataSource):
    """Custom sink: counts rows and sums ``v`` across all partitions,
    publishing the committed totals as ``summary.json`` under the
    ``path`` option only after every task's commit message arrived —
    write()/commit() run in Python workers, so the result is published
    through the filesystem like any real sink, never via driver
    process state."""

    @classmethod
    def name(cls) -> str:
        return "counting_sink"

    def writer(self, schema, overwrite: bool) -> CountingSinkWriter:
        return CountingSinkWriter(self.options["path"])


def register_counting_sink(spark) -> None:
    spark.dataSource.register(CountingSink)
