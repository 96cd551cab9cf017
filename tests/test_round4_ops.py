"""Round-4 regression tests: the variance-clamp seam (ADVICE.md r3)
and the zero-sign normalization caught by the type-tagged comparator.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark import oracle as ora
from map_reduce_c_sharp_simulation_multithreaded_spark import schemas
from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry


def _write_constant_price_corpus(spark, out_dir: str) -> None:
    """lineitem+part where one brand's price is constant at a value that
    pushes the decimal-exact variance formula slightly NEGATIVE through
    double cancellation (found by search: x=1000.07, n=11 gives
    var_raw ≈ -1.35e-10). Without the greatest(.., 0) clamp Spark's
    floor(sqrt(negative)) and DuckDB's disagree on the NaN."""
    li_rows = [
        # (orderkey, partkey, suppkey, linenumber, qty, price, disc, tax,
        #  returnflag, linestatus, shipdate)
        (i, 1, 1, 1, 1.0, 1000.07, 0.0, 0.0, "N", "O", None)
        for i in range(11)
    ] + [
        # a second, 2-row varying brand so the CASE WHEN n > 1 branch
        # with real variance is exercised too
        (100 + i, 2, 1, 1, 1.0, 900.0 + 200.0 * i, 0.0, 0.0, "N", "O", None)
        for i in range(2)
    ]
    part_rows = [
        (1, "part one", "Brand#CONST", "T", 1, 1000.07),
        (2, "part two", "Brand#VARY", "T", 1, 1000.0),
    ]
    spark.createDataFrame(li_rows, schemas.TABLE_SCHEMAS["lineitem"]).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/lineitem.parquet")
    spark.createDataFrame(part_rows, schemas.TABLE_SCHEMAS["part"]).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/part.parquet")


def test_stats_by_brand_variance_clamp(spark, tmp_path):
    """A (near-)constant price group yields sd_price = var_price = 0.0 —
    not NaN, not a negative — and Spark and DuckDB agree exactly."""
    out = str(tmp_path / "corpus")
    _write_constant_price_corpus(spark, out)
    q = registry.all_queries()["agg_stats_by_brand"]

    sdf = q.fn(spark, out)
    scols, srows = ora.spark_result(sdf)
    by_brand = {r[scols.index("p_brand")]: dict(zip(scols, r)) for r in srows}
    const = by_brand["Brand#CONST"]
    assert const["sd_price"] == 0.0
    assert const["var_price"] == 0.0
    vary = by_brand["Brand#VARY"]
    assert vary["sd_price"] == pytest.approx(141.42, abs=0.01)

    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            # Spark writes a parquet DIRECTORY; duckdb needs the glob
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{out}/{t}.parquet/*.parquet')"
        )
    ocols, orows = ora.oracle_result(con, q.oracle)
    res = ora.compare(scols, srows, ocols, orows)
    assert res["ok"], res


def test_zero_sign_normalized(spark):
    """The + 0.0 pattern turns a rounded -0.0 into +0.0 (IEEE), so the
    driver's stringified hash cannot see "-0.0" vs "0.0"."""
    row = spark.range(1).select(
        (F.round(F.lit(-0.0004), 3) + F.lit(0.0)).alias("v")
    ).collect()[0]
    assert repr(row.v) == "0.0"
    (dv,) = duckdb.connect().execute(
        "SELECT ROUND(CAST(-0.0004 AS DOUBLE), 3) + 0.0"
    ).fetchone()
    assert repr(dv) == "0.0"
