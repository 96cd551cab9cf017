#!/usr/bin/env python
"""Plan the next DRIVER_WINDOW rotation from accumulated driver evidence.

Reads every CORRECTNESS_r*.json in the repo root, computes per-query
evidence age (latest round with a green rows+schema+hash row), and
prints:

  1. queries with NO driver evidence (must debut next window),
  2. queries whose latest green predates the current round by the most
     (re-confirmation queue, oldest first),
  3. a suggested 50-slot window: debuts, then the oldest greens.

The same-round rule — any query whose oracle or plan changes in a
round rides that round's window — cannot be derived from evidence
files; splice those in by hand at the front.

Usage: python tools/window_planner.py [--slots 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def evidence_ages() -> tuple[dict[str, int], int]:
    """{query: latest green round} plus the newest round number seen."""
    latest: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", path)
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        data = json.load(open(path))
        for name, row in data.items():
            if row.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, newest


def plan_drift() -> tuple[list[str], list[str], bool]:
    """(changed, new, ran) — query names whose plan fingerprint differs
    from the committed PLAN_HASHES.json; these MUST head the next
    window (same-round rule). Runs the fingerprint sweep (~1 min of
    Spark). ``ran`` is False when the snapshot is missing, so callers
    can distinguish 'clean' from 'never checked'."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import plan_hashes

    snapshot = plan_hashes.load_snapshot()
    if not snapshot:
        return [], [], False
    changed, new, _gone = plan_hashes.diff(plan_hashes.compute(), snapshot)
    return changed, new, True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument("--no-drift", action="store_true",
                    help="skip the plan-fingerprint sweep (faster; the "
                         "suggested window then omits same-round changes)")
    args = ap.parse_args()

    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

    qs = registry.all_queries()
    latest, newest = evidence_ages()

    never = [n for n in qs if n not in latest]
    aged = sorted(
        ((latest[n], n) for n in qs if n in latest),
        key=lambda t: (t[0], t[1]),
    )

    changed, new, drift_ran = (
        ([], [], False) if args.no_drift else plan_drift()
    )
    must = [n for n in (*changed, *new, *never) if n in qs]
    # dedupe, preserve order
    must = list(dict.fromkeys(must))

    print(f"# registered: {len(qs)}   evidence through round {newest}")
    if drift_ran:
        print(f"\n## plan drifted vs PLAN_HASHES.json ({len(changed)} "
              f"changed, {len(new)} new) — same-round rule, these ride the "
              "next window")
        for n in (*changed, *new):
            print(f"  {n}")
    else:
        reason = ("--no-drift" if args.no_drift
                  else "PLAN_HASHES.json missing — run tools/plan_hashes.py"
                       " --write first")
        print(f"\n## drift check SKIPPED ({reason}): the suggested window "
              "OMITS same-round plan changes — splice them in by hand")
    print(f"\n## never driver-verified ({len(never)}) — debut these first")
    for n in never:
        print(f"  {n}")

    print("\n## re-confirmation queue (latest green round, oldest first)")
    for rnd, n in aged[: args.slots]:
        print(f"  r{rnd:02d}  {n}")

    window = must + [n for _, n in aged if n not in set(must)]
    print(f"\n## suggested window ({args.slots} slots: drifted + debuts, "
          "then oldest evidence)")
    for n in window[: args.slots]:
        print(f'    "{n}",')
    return 0


if __name__ == "__main__":
    sys.exit(main())
