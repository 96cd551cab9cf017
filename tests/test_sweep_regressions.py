"""Round-over-round sweep diff gate (VERDICT.md r6 next-round #5):
the headline-bench watch rule — no query >1.5× its prior warm time —
generalized to all registered queries, applied to the two latest
committed SWEEP_r{N}.json artifacts.

The comparison logic lives in tools/sweep_times.compare_sweeps (also
behind the tool's --diff flag) so the gate and the interactive check
can never disagree. Queries with prior warm < 0.25 s are exempt
(constant overhead dominates; ratios there are noise — the same
reasoning VERDICT.md applied to parity_donations_by_state), as are
queries present in only one artifact (debuts / retirements).

A MODE switch (collect → noop_write, round 7) can only LOWER times,
so cross-mode comparisons cannot false-flag; a genuine regression can
hide behind the first mode-switch round, which is why the artifact
records its mode and subsequent rounds compare like-for-like.
"""

from __future__ import annotations

import json
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

# Known-accepted regressions: {query: reason}. Empty is the goal.
ALLOWLIST: dict[str, str] = {
    "range_join_bucketed": (
        "r6 warm 0.517s was a lucky sample: four independent r7 runs "
        "measure 0.63-0.96s minimum with the plan fingerprint unchanged "
        "all round; isolated min-of-4 is 0.628s = 1.21x, inside the bar "
        "(SCALE.md round-7 audit, contention-noise class)"
    ),
}


def _latest_sweeps() -> list[str]:
    arts = sorted(
        (f for f in os.listdir(REPO) if re.fullmatch(r"SWEEP_r\d+\.json", f)),
        key=lambda f: int(re.search(r"\d+", f).group()),  # r9 < r10
    )
    return arts[-2:]


def test_no_query_regressed_vs_prior_sweep():
    arts = _latest_sweeps()
    if len(arts) < 2:
        pytest.skip("fewer than two committed sweep artifacts")
    from sweep_times import compare_sweeps

    with open(os.path.join(REPO, arts[0]), encoding="utf-8") as fh:
        prev = json.load(fh)
    with open(os.path.join(REPO, arts[1]), encoding="utf-8") as fh:
        cur = json.load(fh)
    flagged = [
        (name, pw, cw)
        for name, pw, cw in compare_sweeps(prev, cur)
        if name not in ALLOWLIST
    ]
    assert not flagged, (
        f"queries regressed >1.5x between {arts[0]} and {arts[1]}: "
        + "; ".join(f"{n} {pw}s->{cw}s" for n, pw, cw in flagged)
        + " — fix the plan or allowlist with a written reason"
    )
