#!/usr/bin/env python
"""Warm-timing sweep over EVERY registered query — the perf audit the
bench set cannot give (bench times ~30 of 178 queries).

    python tools/sweep_times.py [--passes 2] [--sf DIR] [--json OUT.json]

Prints one line per query, slowest first: warm (min across passes),
cold (first pass), name. Round 5's sweep found a 45 s and a 32 s
outlier that had been invisible for four rounds (SCALE.md "Full-sweep
timing audit"); re-run this after adding query families or making
plan-level changes, and investigate anything whose warm time is out
of line with its plan shape.

``--json SWEEP_r{N}.json`` writes the full per-query warm/cold map as
a committed machine-readable artifact (VERDICT.md r5 next-round #2):
the driver's stdout tail capture (~2 KB) cannot carry 178 timings, so
the repo carries them instead — diff SWEEP_r{N}.json against the prior
round to see every query's trajectory, not just the bench set's.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry
from map_reduce_c_sharp_simulation_multithreaded_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--json", default=None,
                    help="also write the full warm/cold map to this path")
    args = ap.parse_args()

    spark = get_spark("mrcs_sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    res: dict[str, tuple[float, float]] = {}
    for name, q in registry.all_queries().items():
        ts: list[float] = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            try:
                q.fn(spark, args.sf).collect()
            except Exception as e:  # keep sweeping; report at the end
                print(f"ERR {name}: {type(e).__name__}: {e}", file=sys.stderr)
                break
            ts.append(time.perf_counter() - t0)
        if ts:
            res[name] = (round(min(ts), 3), round(ts[0], 3))

    total = 0.0
    for name, (warm, cold) in sorted(res.items(), key=lambda kv: -kv[1][0]):
        total += warm
        print(f"{warm:8.3f} {cold:8.3f}  {name}")
    print(f"# {len(res)} queries, warm total {total:.1f}s", file=sys.stderr)

    if args.json:
        artifact = {
            "sf_dir": args.sf,
            "passes": args.passes,
            "n_queries": len(res),
            "warm_total_sec": round(total, 3),
            "queries": {
                n: {"warm": warm, "cold": cold}
                for n, (warm, cold) in sorted(res.items())
            },
        }
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump(artifact, fh, indent=0, sort_keys=True)
            fh.write("\n")
        print(f"# wrote {args.json}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
