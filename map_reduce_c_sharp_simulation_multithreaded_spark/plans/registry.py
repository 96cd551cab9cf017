"""Central query registry.

A query is (name, PySpark callable, optional DuckDB oracle SQL). The
oracle is the independent differential-testing engine (SURVEY.md §5.2):
the driver runs both at sf0.01 and compares row count + schema +
order-insensitive value hash. Column names are aliased identically on
both sides; double aggregates are rounded identically on both sides so
float-summation order differences (reference sums in arbitrary order
too, ``D/Program.cs:162,315``) cannot flip the hash.

Queries with ``oracle=None`` are genuinely non-SQL-expressible
(stateful streaming, probabilistic LSH) and get the driver's weaker
rows-only check plus dedicated pytest coverage.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    headline: bool = False  # included in bench.py's timed set


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, tuple(tags), headline)
        return fn

    return deco


def _load_all_plan_modules() -> None:
    # Import side effects populate the registry; keep the list explicit so
    # a broken module is an import error, not silent missing coverage.
    from . import (  # noqa: F401
        advanced,
        aggregates,
        dedup,
        flagship,
        joins,
        mlprep,
        multimodal,
        relational,
        scalars,
        scd,
        setops,
        similarity,
        streaming,
        text,
        tpch,
        windows,
    )


def all_queries() -> dict[str, Query]:
    _load_all_plan_modules()
    return dict(_REGISTRY)


def headline_queries() -> dict[str, Query]:
    return {n: q for n, q in all_queries().items() if q.headline}
