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
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_AGE_ROUNDS = 2  # in-window exemption covers the current round
REGISTRY_PATH = os.path.join(
    REPO, "map_reduce_c_sharp_simulation_multithreaded_spark", "plans", "registry.py"
)


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


def _git_commit_time(path: str) -> int | None:
    """Unix time of ``path``'s last commit, or None (untracked / no git)."""
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", path],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        ).stdout.strip()
    except (OSError, subprocess.TimeoutExpired):
        return None
    return int(out) if out.isdigit() else None


def _rotation_grace() -> int:
    """1 when the newest CORRECTNESS artifact was committed AFTER the
    last DRIVER_WINDOW change (registry.py), else 0.

    The driver lands CORRECTNESS_r{N}.json in its own commit at round
    start; the builder cannot have rotated the window for a round it
    has not seen, so the suite starting red on that commit punishes
    nobody (VERDICT r8 wrong #1). The floor therefore relaxes by ONE
    round exactly until the builder's first registry edit lands —
    after which the strict bound applies, and a rotation that skips a
    stale query still fails (the r03-displacement class). Uncommitted
    working-tree edits to registry.py don't flip this bit — only the
    commit does — so the gate stays red locally until the rotation is
    actually committed, which is the point.
    """
    latest_artifact = max(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")), default=None
    )
    if latest_artifact is None:
        return 0
    art_t = _git_commit_time(latest_artifact)
    reg_t = _git_commit_time(REGISTRY_PATH)
    if art_t is None or reg_t is None:
        return 0  # strict when history is unreadable
    return 1 if art_t > reg_t else 0


def test_no_query_evidence_older_than_two_rounds_unless_queued():
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

    evidence, latest = _latest_evidence()
    window = set(registry.DRIVER_WINDOW)
    floor = latest - MAX_AGE_ROUNDS - _rotation_grace()
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


def test_rotation_grace_is_one_round_and_commit_gated():
    """The grace is exactly one round wide and keyed on COMMIT order:
    a fresh artifact (newer commit than registry.py) buys floor−1,
    anything else — including a registry commit that postdates the
    artifact without rotating — is strict. Pins the arithmetic so a
    future edit can't silently widen the exemption."""
    grace = _rotation_grace()
    assert grace in (0, 1)
    evidence, latest = _latest_evidence()
    strict_floor = latest - MAX_AGE_ROUNDS
    assert strict_floor - (latest - MAX_AGE_ROUNDS - grace) == grace


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


def test_deferred_overflow_rides_at_most_one_extra_round():
    """Tuple positions beyond the driver's 50 verified slots are a
    DEFERRAL, not a parking lot. The age gate accepts membership
    anywhere in DRIVER_WINDOW, so without this rule a stale query
    could sit at position 51+ through every future rotation and never
    regain driver evidence (the off-by-N class the r11 and r12
    verdicts each had to adjudicate by hand). Rule: an evidenced
    query at position 51+ must have evidence no older than
    latest − 3 − grace — exactly old enough to have been displaced
    once, too old to be displaced twice; staler queries must occupy a
    verified slot (positions 1–50). Debuts (no evidence) are outside
    this rule — their promise is pinned by test_debuts_are_in_window
    and their first driver row starts this clock."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

    evidence, latest = _latest_evidence()
    bound = latest - 3 - _rotation_grace()
    overflow = registry.DRIVER_WINDOW[50:]
    too_old = sorted(
        n for n in overflow
        if n in evidence and evidence[n] < bound
    )
    assert not too_old, (
        f"queries deferred to DRIVER_WINDOW positions 51+ for a second "
        f"consecutive rotation (evidence older than r{bound:02d}): "
        f"{too_old} — move them into the verified first 50"
    )
