"""Reference-dialect CSV source/sink + the reference's flagship query.

Reproduces the reference's CSV semantics (SURVEY.md §1.4, FIXTURES.md
§A) as declarative reader options plus explicit expressions:

* delimiter ``,``; NO quote/escape handling (``D/Program.cs:550-573``)
  → ``quote=""`` disables quoting;
* empty fields preserved; empty/missing Donation Amount → 0.0
  (``D/Program.cs:451,580-588``) → coalesce after a permissive cast;
* blank lines skipped (``D/Program.cs:555-561``) → Spark's CSV reader
  drops blank lines natively;
* header row (``D/Program.cs:411-419``) → ``header=True``;
* sink renders amounts F2 invariant-culture without grouping
  separators (``D/Program.cs:483``) → ``format_string('%.2f')``;
* duplicate Donor ID keeps the LAST occurrence (``D/Program.cs:296``)
  → keep-last window over file position;
* missing Donor ID on the probe side THROWS (``D/Program.cs:310``)
  → strict mode via ``strict_inner_join``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import strict_inner_join
from ..schemas import DONATIONS_CSV, DONORS_CSV


def read_donors(spark: SparkSession, path: str) -> DataFrame:
    """Donors CSV (5 positional columns, only ID + State consumed)."""
    return (
        spark.read.schema(DONORS_CSV)
        .options(header=True, quote="", sep=",")
        .csv(path)
    )


def read_donations(spark: SparkSession, path: str) -> DataFrame:
    """Donations CSV; Donation Amount parses permissively (bad/empty →
    NULL → coalesced to 0.0 downstream, matching ReadNextDouble)."""
    return (
        spark.read.schema(DONATIONS_CSV)
        .options(header=True, quote="", sep=",", mode="PERMISSIVE")
        .csv(path)
    )


def dedup_donors_last_wins(donors: DataFrame) -> DataFrame:
    """Last-occurrence-wins on duplicate Donor ID.

    The reference's build dictionary overwrite keeps the last row in
    FILE order (``D/Program.cs:296``); a single-file CSV read preserves
    that order per partition, surfaced via monotonically increasing ids.
    """
    w = Window.partitionBy("Donor ID").orderBy(F.col("_pos").desc())
    return (
        donors.withColumn("_pos", F.monotonically_increasing_id())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_pos", "_rn")
    )


def donations_by_state(
    donors: DataFrame, donations: DataFrame, strict: bool = True
) -> DataFrame:
    """The reference's one query (``D/Program.cs:228-248``):

    donations ⋈ donors on Donor ID → GROUP BY Donor State →
    SUM(coalesce(amount, 0.0)). ``strict=True`` reproduces the
    missing-key throw; ``strict=False`` is the inner-join-drop mode.
    """
    dim = dedup_donors_last_wins(donors).select("Donor ID", "Donor State")
    fact = donations.select(
        "Donor ID",
        F.coalesce(F.col("Donation Amount"), F.lit(0.0)).alias("_amount"),
    )
    join = strict_inner_join if strict else (lambda p, b, on: p.join(b, on, "inner"))
    joined = join(fact, dim, "Donor ID")
    return (
        joined.groupBy(F.col("Donor State").alias("State"))
        .agg(F.sum("_amount").alias("Total Donation Amount"))
    )


def write_result_csv(result: DataFrame, path: str) -> None:
    """Reference sink: header + F2-rendered amounts, unordered rows
    (``D/Program.cs:475-484``; order was hash-map iteration order)."""
    (
        result.select(
            "State",
            F.format_string("%.2f", F.col("Total Donation Amount")).alias(
                "Total Donation Amount"
            ),
        )
        .write.mode("overwrite")
        .options(header=True, quote="", sep=",")
        .csv(path)
    )
