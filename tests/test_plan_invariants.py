"""Repo-wide physical-plan invariants over EVERY registered query.

The scale rules the engine claims (SCALE.md, VERDICT.md audits) are
asserted mechanically here, so a future query can't silently violate
them:

- **No row-at-a-time Python UDFs** (`BatchEvalPython`): the slow path
  the reference's hot loop never pays (``D/Program.cs:451`` does its
  cast/agg in compiled code) and neither do we — Python crosses the
  boundary only through Arrow-batched nodes (`ArrowEvalPython`,
  `FlatMapGroupsInPandas`, `FlatMapCoGroupsInPandas`, `MapInPandas`,
  `PythonMapInArrow`) or the declared UDTF (`BatchEvalPythonUDTF`,
  a table function evaluated per input ROW GROUP, part of the API
  surface).
- **No unpartitioned cartesian products** (`CartesianProduct`): the
  one intentional all-pairs shape (brute-force cosine baseline) is a
  *broadcast* nested-loop join — the build side is the bounded query
  set, never a shuffled n×n product.

Both patterns are checked on the INITIAL physical plan —
``executedPlan()`` before any action returns the pre-AQE physical plan
(ADVICE r5 wording fix). That is the right surface for these
invariants: AQE re-planning cannot *introduce* either banned node (it
can only convert shuffle joins to broadcasts, never conjure a Python
eval node or turn a partitioned join into a cartesian product).
"""

from __future__ import annotations

import re

import pytest

from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

# Row-wise scalar Python UDF node; the negative lookahead admits the
# Python UDTF node (BatchEvalPythonUDTF), which is registered API
# surface with its own oracle (udtf_chunk_windows).
_ROWWISE_UDF = re.compile(r"BatchEvalPython(?!UDTF)")


def _initial_plan(df) -> str:
    # pre-action executedPlan() == the initial (pre-AQE) physical plan
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name", sorted(registry.all_queries()), ids=lambda n: n
)
def test_plan_invariants(spark, sf_dir, name):
    q = registry.all_queries()[name]
    plan = _initial_plan(q.fn(spark, sf_dir))
    assert not _ROWWISE_UDF.search(plan), (
        f"{name}: row-at-a-time Python UDF (BatchEvalPython) in plan"
    )
    assert "CartesianProduct" not in plan, (
        f"{name}: unpartitioned CartesianProduct in plan"
    )
