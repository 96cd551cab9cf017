"""Evidence-AGE gate (ADVICE r7): the freshness gate
(test_plan_freshness.py) catches CHANGED plans outside the window, but
an UNCHANGED query displaced from the window keeps its old driver row
forever on nothing but a comment's promise (window_rolling_median sat
at r03 evidence through rounds 4-7 that way). This test makes the
rotation schedule itself structural:

    every registered query must have driver evidence no older than
    (latest committed round − 2), OR be in the upcoming DRIVER_WINDOW.

With 50-slot windows over ~190 queries that bound is exactly
sustainable (each round retires the oldest two-round block plus
debuts/changes); VERDICT r7's "after round 8 no query carries pre-r05
evidence" is this rule instantiated at latest_round = 7. A query
displaced during a late rotation now FAILS the suite instead of
slipping a round silently.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_AGE_ROUNDS = 2  # in-window exemption covers the current round


def _latest_evidence() -> tuple[dict[str, int], int]:
    evidence: dict[str, int] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        latest = max(latest, rnd)
        with open(path, encoding="utf-8") as fh:
            for name in json.load(fh):
                evidence[name] = max(evidence.get(name, 0), rnd)
    return evidence, latest


def test_no_query_evidence_older_than_two_rounds_unless_queued():
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

    evidence, latest = _latest_evidence()
    window = set(registry.DRIVER_WINDOW)
    floor = latest - MAX_AGE_ROUNDS
    stale = sorted(
        name
        for name in registry.registration_order()
        if evidence.get(name, 0) < floor and name not in window
    )
    assert not stale, (
        f"queries whose latest driver evidence is older than r{floor:02d} "
        f"are not in the upcoming DRIVER_WINDOW: {stale} — rotate them in "
        f"(registry.DRIVER_WINDOW) or they silently age out of the "
        f"correctness record"
    )


def test_debuts_are_in_window():
    """A registered query with NO driver evidence at all (a debut) must
    ride the very next window — the same-round rule, structurally."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

    evidence, _ = _latest_evidence()
    window = set(registry.DRIVER_WINDOW)
    missing = sorted(
        name
        for name in registry.registration_order()
        if name not in evidence and name not in window
    )
    assert not missing, (
        f"registered queries with no driver evidence and no window slot: "
        f"{missing}"
    )
