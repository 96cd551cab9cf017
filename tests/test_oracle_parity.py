"""Differential test: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 correctness gate at sf0.001 so failures surface
locally first. Queries without an oracle get a rows-materialize smoke
check instead.
"""

from __future__ import annotations

import pytest

from map_reduce_c_sharp_simulation_multithreaded_spark import oracle as ora
from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

ALL = registry.all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = ora.duckdb_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(name, spark, sf_dir, con):
    q = ALL[name]
    scols, srows = ora.spark_result(q.fn(spark, sf_dir))
    if q.oracle is None:
        assert srows is not None  # materializes without error
        return
    ocols, orows = ora.oracle_result(con, q.oracle)
    res = ora.compare(scols, srows, ocols, orows)
    assert res["ok"], {k: v for k, v in res.items() if k != "first_diffs"} | {
        "first_diffs": res.get("first_diffs")
    }
