"""Shuffle-audit staleness gate (round 11).

SHUFFLE_AUDIT.json is evidence the same way SWEEP_r{N}.json is: it
holds the measured shuffle/scan volume for every batch query, and the
claims SCALE.md builds on it only stay true while the artifact covers
the registry. This gate fails when a query debuts (or is renamed)
without re-running ``tools/shuffle_audit.py --json SHUFFLE_AUDIT.json``
— the same add-consciously contract as the sweep's regression gate
and the plan-freshness window.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact() -> dict:
    with open(os.path.join(REPO, "SHUFFLE_AUDIT.json"), encoding="utf-8") as fh:
        return json.load(fh)


def test_shuffle_audit_covers_every_batch_query():
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from shuffle_audit import SKIP

    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import (
        registry,
    )

    audited = {
        k for k in _artifact()["queries"] if not k.startswith("_")
    }
    expected = {
        n
        for n in registry.all_queries()
        if n not in SKIP and not n.startswith("stream_")
    }
    missing = sorted(expected - audited)
    assert not missing, (
        f"registered batch queries missing from SHUFFLE_AUDIT.json: "
        f"{missing} — re-run tools/shuffle_audit.py --json "
        f"SHUFFLE_AUDIT.json (it executes every plan once with a noop "
        f"write; the artifact is the evidence behind SCALE.md's "
        f"shuffle-volume claims)"
    )
    stale = sorted(audited - expected)
    assert not stale, (
        f"SHUFFLE_AUDIT.json lists queries that no longer exist: {stale}"
    )


def test_shuffle_audit_is_clean():
    q = _artifact()["queries"]
    errs = {
        k: v
        for k, v in q.items()
        if not k.startswith("_") and isinstance(v, dict) and "error" in v
    }
    assert not errs, f"audited queries errored: {errs}"
    probe = q.get("_count_shape_probe", {})
    assert probe.get("pandas_asof_join") == "ok", (
        "count()-shaped consumer probe failed — the cogroup "
        "attribute-dedup class (round-11 bug) may have regressed: "
        f"{probe}"
    )


def test_no_query_spills_at_test_scale():
    """Zero-spill gate (round 13): memory+disk bytes spilled must be 0
    for every audited query at sf0.1 under the audit session. A task
    that spills THIS corpus on THIS heap has a per-partition working
    set out of proportion to its input — the early warning for the
    non-spillable-buffer OOM class (collect_list aggregation buffers,
    window sort state) that shuffle byte counts cannot show. Artifacts
    written before the spill column existed skip (re-run the audit to
    arm the gate)."""
    q = _artifact()["queries"]
    rows = {
        k: v
        for k, v in q.items()
        if not k.startswith("_") and isinstance(v, dict) and "error" not in v
    }
    if not any("spill_bytes" in v for v in rows.values()):
        import pytest

        pytest.skip("artifact predates the spill column")
    spilled = {
        k: v["spill_bytes"]
        for k, v in rows.items()
        if v.get("spill_bytes", 0) > 0
    }
    assert not spilled, (
        f"queries spilled at sf0.1: {spilled} — the working set per "
        f"partition is out of proportion; re-shard the hot key or "
        f"bound the aggregation buffer"
    )
