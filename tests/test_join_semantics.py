"""Pinned reference join semantics (SURVEY.md §7.3 hard parts).

Edge cases from FIXTURES.md §A5: duplicate build keys (reference keeps
last, ``D/Program.cs:296``) and unmatched probe keys (reference throws,
``D/Program.cs:310``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark.operators.joins import (
    dedup_dim_last_wins,
    strict_inner_join,
)


def test_last_wins_keeps_last_per_key(spark):
    dim = spark.createDataFrame(
        [("d1", "CA", 1), ("d1", "NY", 2), ("d2", "TX", 1)],
        "donor_id string, state string, seq int",
    )
    out = dedup_dim_last_wins(dim, "donor_id", [F.col("seq")])
    got = {(r.donor_id, r.state) for r in out.collect()}
    assert got == {("d1", "NY"), ("d2", "TX")}


def test_strict_join_raises_on_missing_key(spark):
    probe = spark.createDataFrame([("d1", 5.0), ("dX", 1.0)], "k string, amt double")
    build = spark.createDataFrame([("d1", "CA")], "k string, state string")
    with pytest.raises(ValueError, match="strict join"):
        strict_inner_join(probe, build, "k")


def test_strict_join_passes_when_ri_holds(spark):
    probe = spark.createDataFrame([("d1", 5.0), ("d1", 2.0)], "k string, amt double")
    build = spark.createDataFrame([("d1", "CA")], "k string, state string")
    out = strict_inner_join(probe, build, "k")
    assert out.count() == 2
