"""Local differential-testing harness against DuckDB.

Mirrors the driver's correctness gate (BASELINE.md): run a registered
query's PySpark plan and its DuckDB oracle SQL on the same parquet,
compare row count + schema (sorted column names) + order-insensitive
values. Used by ``tools/verify_local.py`` and the pytest suite so every
query is pre-verified before the driver sees it.

The reference repo has no tests at all (SURVEY.md §5.1); its only
correctness artifact is a golden CSV. Differential testing against an
independent engine is this repo's replacement for that.
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb
from pyspark.sql import DataFrame

from .schemas import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """In-memory DuckDB with every test table registered as a view."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def spark_result(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def oracle_result(
    con: "duckdb.DuckDBPyConnection", sql: str
) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_value(v: Any) -> Any:
    if isinstance(v, bool):
        return v
    # Type-tag numerics: Python's 123 == 123.0, so an int-vs-float skew
    # between engines (e.g. a DuckDB HUGEINT fetched as float64) passed
    # values_match here while flipping the driver's stringified hash —
    # the exact mechanism behind the round-2/round-3 "passes local,
    # fails driver" text-query streak (VERDICT.md r3 "What's wrong" #2).
    # repr() for floats is the shortest round-trip form, so 4711.0 and
    # 4711 can never compare equal again.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_value(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def _untag_float(v: Any) -> Any:
    """Unwrap a ("f", repr) tag back to the float for approx compare."""
    if isinstance(v, tuple) and len(v) == 2 and v[0] == "f":
        return float(v[1])
    return v


def _approx_equal(a: list[tuple], b: list[tuple], rel: float = 1e-9) -> bool:
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            va, vb = _untag_float(va), _untag_float(vb)
            if isinstance(va, float) and isinstance(vb, float):
                if not math.isclose(va, vb, rel_tol=rel, abs_tol=1e-9):
                    return False
            elif va != vb:
                return False
    return True


def compare(
    spark_cols: list[str],
    spark_rows: list[tuple],
    oracle_cols: list[str],
    oracle_rows: list[tuple],
) -> dict[str, Any]:
    """Compare the two result sets the way the driver does."""
    out: dict[str, Any] = {
        "rows_spark": len(spark_rows),
        "rows_oracle": len(oracle_rows),
        "rows_match": len(spark_rows) == len(oracle_rows),
        "schema_spark": sorted(spark_cols),
        "schema_oracle": sorted(oracle_cols),
        "schema_match": sorted(spark_cols) == sorted(oracle_cols),
    }
    ns, no = _normalize(spark_cols, spark_rows), _normalize(oracle_cols, oracle_rows)
    out["values_match"] = ns == no
    if not out["values_match"]:
        out["values_approx_match"] = _approx_equal(ns, no)
        diffs = [(a, b) for a, b in zip(ns, no) if a != b]
        out["first_diffs"] = diffs[:3]
    out["ok"] = bool(
        out["rows_match"] and out["schema_match"] and out["values_match"]
    )
    return out
