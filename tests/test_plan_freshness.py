"""Evidence-freshness gate: a changed plan must ride the next driver
window (VERDICT.md r5 next-round #5).

Round 5's only debt was ~12 queries whose plans changed after the
driver window froze, leaving their driver evidence one round behind
their code. This test retires that failure class structurally: it
recomputes every registered query's normalized plan fingerprint
(tools/plan_hashes.py) and fails if any query whose fingerprint
differs from the committed PLAN_HASHES.json snapshot — or any newly
registered query — is NOT in the upcoming DRIVER_WINDOW.

The fingerprints are computed in a FRESH SUBPROCESS, not the suite's
session: a long-lived session perturbs plan strings in ways that are
deterministic per-process but not per-history (session-global lambda
counters — normalized away — and exprId-dependent attribute order in
Catalyst's distinct-aggregate rewrite, which is not normalizable).
The committed snapshot is likewise produced by the standalone tool,
so the comparison is always fresh-process vs fresh-process.

Green means: every plan the driver has not yet re-verified is queued
for verification in the very next round. When a plan changes
intentionally, add the query to DRIVER_WINDOW and refresh the snapshot
(``python tools/plan_hashes.py --write``) in the same commit.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "plan_hashes.py")


def test_changed_plans_are_in_driver_window(sf_dir):
    assert os.path.exists(os.path.join(REPO, "PLAN_HASHES.json")), (
        "PLAN_HASHES.json missing — run tools/plan_hashes.py --write"
    )
    proc = subprocess.run(
        [sys.executable, TOOL, "--sf", sf_dir],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )
    drifted = {
        m.group(2)
        for m in re.finditer(r"^(changed|new): (\S+)$", proc.stdout, re.M)
    }
    gone = re.findall(r"^gone: (\S+)$", proc.stdout, re.M)

    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

    window = set(registry.DRIVER_WINDOW)
    stale = sorted(drifted - window)
    assert proc.returncode in (0, 1), proc.stderr[-2000:]
    assert not stale, (
        f"plans changed (or debuted) outside the upcoming DRIVER_WINDOW: "
        f"{stale} — add them to registry.DRIVER_WINDOW and refresh "
        f"PLAN_HASHES.json (tools/plan_hashes.py --write)"
    )
    assert not gone, (
        f"snapshot lists queries that no longer exist: {gone} — refresh "
        f"PLAN_HASHES.json"
    )
