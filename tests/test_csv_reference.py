"""Reference CSV dialect parity tests (FIXTURES.md §A5 edge cases).

Fixtures are built to the reference's own dialect: no quoting, empty
fields preserved, blank lines, duplicate donor keys, empty amounts.
"""

from __future__ import annotations

import glob

import pytest

from map_reduce_c_sharp_simulation_multithreaded_spark.sources.csv_reference import (
    donations_by_state,
    read_donations,
    read_donors,
    write_result_csv,
)

DONORS = """Donor ID,Donor City,Donor State,Donor Is Teacher,Donor Zip
d1,Springfield,CA,No,90001
d2,Portland,NY,Yes,10001

d1,Oakland,TX,No,73301
d3,Austin,other,No,
"""

DONATIONS = """Project ID,Donation ID,Donor ID,Donation Included Optional Donation,Donation Amount,Donor Cart Sequence
p1,x1,d1,Yes,100.50,1
p2,x2,d2,No,25.25,2
p3,x3,d1,Yes,,3
p4,x4,d3,No,10.00,1
p5,x5,d2,No,4.25,9
"""


@pytest.fixture(scope="module")
def csv_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("refcsv")
    donors = d / "donors.csv"
    donations = d / "donations.csv"
    donors.write_text(DONORS)
    donations.write_text(DONATIONS)
    return str(donors), str(donations), str(d / "result")


def test_flagship_reference_semantics(spark, csv_paths):
    donors_path, donations_path, _ = csv_paths
    donors = read_donors(spark, donors_path)
    donations = read_donations(spark, donations_path)
    out = {
        r.State: r["Total Donation Amount"]
        for r in donations_by_state(donors, donations).collect()
    }
    # d1 duplicated: LAST occurrence (TX) wins -> d1's 100.50 + 0.0 go to TX
    # empty amount coalesces to 0.0; blank line between rows is skipped
    assert out == {"TX": 100.50, "NY": 29.50, "other": 10.00}


def test_strict_mode_raises_on_unknown_donor(spark, csv_paths):
    donors_path, donations_path, _ = csv_paths
    donors = read_donors(spark, donors_path)
    extra = spark.createDataFrame(
        [("p9", "x9", "dMISSING", "No", 5.0, "1")], read_donations(spark, donations_path).schema
    )
    donations = read_donations(spark, donations_path).union(extra)
    with pytest.raises(ValueError, match="strict join"):
        donations_by_state(donors, donations, strict=True).collect()
    # non-strict mode drops the orphan row instead (inner-join semantics)
    out = donations_by_state(donors, donations, strict=False)
    assert abs(sum(r["Total Donation Amount"] for r in out.collect()) - 140.0) < 1e-9


def test_result_csv_f2_rendering(spark, csv_paths, tmp_path):
    donors_path, donations_path, _ = csv_paths
    result = donations_by_state(
        read_donors(spark, donors_path), read_donations(spark, donations_path)
    )
    out_dir = str(tmp_path / "result")
    write_result_csv(result, out_dir)
    lines = []
    for f in glob.glob(f"{out_dir}/part-*.csv"):
        with open(f) as fh:
            lines += [ln.strip() for ln in fh if ln.strip()]
    header = "State,Total Donation Amount"
    assert header in lines
    body = sorted(ln for ln in lines if ln != header)
    assert body == ["NY,29.50", "TX,100.50", "other,10.00"]
