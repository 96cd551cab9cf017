"""Evidence-freshness gate: a changed plan must ride the next driver
window (VERDICT.md r5 next-round #5).

Round 5's only debt was ~12 queries whose plans changed after the
driver window froze, leaving their driver evidence one round behind
their code. This test retires that failure class structurally: it
recomputes every registered query's normalized plan fingerprint
(tools/plan_hashes.py) and fails if any query whose fingerprint
differs from the committed PLAN_HASHES.json snapshot — or any newly
registered query — is NOT in the upcoming DRIVER_WINDOW.

Green means: every plan the driver has not yet re-verified is queued
for verification in the very next round. When a plan changes
intentionally, add the query to DRIVER_WINDOW and refresh the snapshot
(``python tools/plan_hashes.py --write``) in the same commit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

import plan_hashes  # noqa: E402

from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry  # noqa: E402


def test_changed_plans_are_in_driver_window(spark, sf_dir):
    snapshot = plan_hashes.load_snapshot()
    assert snapshot, "PLAN_HASHES.json missing — run tools/plan_hashes.py --write"
    current = plan_hashes.compute(sf_dir)
    changed, new, gone = plan_hashes.diff(current, snapshot)

    window = set(registry.DRIVER_WINDOW)
    stale = [n for n in changed + new if n not in window]
    assert not stale, (
        f"plans changed (or debuted) outside the upcoming DRIVER_WINDOW: "
        f"{stale} — add them to registry.DRIVER_WINDOW and refresh "
        f"PLAN_HASHES.json (tools/plan_hashes.py --write)"
    )
    assert not gone, (
        f"snapshot lists queries that no longer exist: {gone} — refresh "
        f"PLAN_HASHES.json"
    )
