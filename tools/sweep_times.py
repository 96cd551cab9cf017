#!/usr/bin/env python
"""Warm-timing sweep over EVERY registered query — the perf audit the
bench set cannot give (bench times ~50 of 184 queries).

    python tools/sweep_times.py [--passes 2] [--sf DIR] [--json OUT.json]
                                [--collect] [--diff PREV.json]

Prints one line per query, slowest first: warm (min across passes),
cold (first pass), name. Round 5's sweep found a 45 s and a 32 s
outlier that had been invisible for four rounds (SCALE.md "Full-sweep
timing audit"); re-run this after adding query families or making
plan-level changes, and investigate anything whose warm time is out
of line with its plan shape.

Measurement mode (VERDICT.md r6 next-round #4): queries are evaluated
with a NOOP WRITE (``df.write.format("noop")``) by default, not
``.collect()`` — the sweep should record PLAN cost, and driver-side
row materialization polluted the artifact for row-identity projections
(scalar_math_pack: 3.35 s collected, ~1.1 s noop — the plan was never
slow). ``--collect`` restores the old mode; the artifact records which
mode produced it. Streaming queries still execute their micro-batches
either way (the returned frame is the memory-sink table; the stream
runs when the plan builds).

``--json SWEEP_r{N}.json`` writes the full per-query warm/cold map as
a committed machine-readable artifact: the driver's stdout tail
capture (~2 KB) cannot carry 184 timings, so the repo carries them
instead.

``--diff PREV.json`` compares against a prior round's artifact and
flags any query whose warm time grew >1.5× (prior warm ≥ 0.25 s —
below that, constant overhead dominates and ratios are noise): the
headline-bench watch rule generalized to the whole registry
(VERDICT.md r6 next-round #5). tests/test_sweep_regressions.py runs
the same comparison over the two latest committed artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_c_sharp_simulation_multithreaded_spark import buildstats
from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry
from map_reduce_c_sharp_simulation_multithreaded_spark.session import (
    get_spark,
    host_speed_probe,
    host_speed_probe_single,
)

REGRESSION_RATIO = 1.5
REGRESSION_FLOOR_SEC = 0.25


def host_norm(prev: dict, cur: dict) -> float:
    """Host-speed normalizer (VERDICT.md r7 next-round #4): the ratio
    of the two artifacts' recorded calibration constants
    (session.host_speed_probe — a fixed CPU-bound probe), clamped to
    [0.5, 2.0] so a broken calibration can at most halve/double the
    bar, never disable it. 1.0 when either artifact predates the
    field. A slow-host epoch (SCALE.md measured identical code
    uniformly 1.4-1.5× slower) raises cur's calibration by the same
    factor as its query times, so dividing the observed ratio by this
    normalizer separates "slow host" from "slow plan" mechanically —
    previously human adjudication."""
    pc, cc = prev.get("calibration_sec"), cur.get("calibration_sec")
    if pc is None or cc is None:
        return 1.0  # field predates calibration — uncalibrated compare
    if pc == 0 or cc == 0:
        # a zero constant is a BROKEN probe, not a missing field —
        # falling through truthiness to 1.0 would silently disable
        # normalization exactly when the record is corrupt (ADVICE r8)
        raise ValueError(
            f"calibration_sec is 0 (prev={pc!r}, cur={cc!r}) — broken "
            f"host_speed_probe record; refuse to compare uncalibrated"
        )
    # the probe measures cores × clock: a CORE-COUNT change between
    # artifacts shifts it for every query — including shuffle/IO-bound
    # ones that don't scale with cores — indistinguishably from a clock
    # epoch (ADVICE r8). When both artifacts record cpu_count and they
    # differ, normalization is confounded: compare raw and say so.
    pn, cn = prev.get("cpu_count"), cur.get("cpu_count")
    if pn is not None and cn is not None and pn != cn:
        print(f"# host_norm: cpu_count changed {pn} -> {cn}; "
              f"calibration confounded, comparing UNNORMALIZED",
              file=sys.stderr)
        return 1.0
    return min(2.0, max(0.5, cc / pc))


def compare_sweeps(prev: dict, cur: dict) -> list[tuple[str, float, float]]:
    """(name, prev_warm, cur_warm) for every query in BOTH artifacts
    whose warm time grew >REGRESSION_RATIO× from a prior warm of at
    least REGRESSION_FLOOR_SEC — after normalizing the prior warm by
    the host-speed calibration ratio. Shared by --diff and the pytest
    gate."""
    out = []
    norm = host_norm(prev, cur)
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    for name in sorted(set(pq) & set(cq)):
        pw, cw = pq[name]["warm"], cq[name]["warm"]
        if pw >= REGRESSION_FLOOR_SEC and cw > REGRESSION_RATIO * pw * norm:
            out.append((name, pw, cw))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--json", default=None,
                    help="also write the full warm/cold map to this path")
    ap.add_argument("--collect", action="store_true",
                    help="evaluate via .collect() instead of a noop write")
    ap.add_argument("--diff", default=None,
                    help="prior-round artifact to flag >1.5x warm regressions "
                         "against")
    args = ap.parse_args()

    # pre-JVM load sample: the cross-run epoch indicator (SCALE.md
    # "host-speed epoch" — a re-sweep of identical code once measured
    # 146.7 s vs a committed 99.7 s, uniformly across families).
    loadavg_start = [round(v, 2) for v in os.getloadavg()]
    spark = get_spark("mrcs_sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    calibration = host_speed_probe(spark)
    calibration_single = host_speed_probe_single(spark)
    print(f"# host_speed_probe: {calibration}s parallel / "
          f"{calibration_single}s single-thread", file=sys.stderr)

    def evaluate(df) -> None:
        if args.collect:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()

    # REGISTRATION order, not queries() order: queries() leads with the
    # rotating DRIVER_WINDOW, so a rotation moves a block of queries to
    # the front of the sweep where the JVM has accumulated less JIT —
    # observed round 7: the newly-fronted TPC-H block measured
    # +0.1-0.2 s (1.3-1.5×) while the sweep median was 0.94×.
    # Registration order is stable across rotations, so round-over-
    # round diffs compare each query at the same session age.
    qs = registry.all_queries()
    res: dict[str, tuple[float, float]] = {}
    builds: dict[str, list[dict]] = {}
    buildstats.drain()  # clear anything a prior import-time path left
    for name in registry.registration_order():
        q = qs[name]
        ts: list[float] = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            try:
                evaluate(q.fn(spark, args.sf))
            except Exception as e:  # keep sweeping; report at the end
                print(f"ERR {name}: {type(e).__name__}: {e}", file=sys.stderr)
                break
            ts.append(time.perf_counter() - t0)
        # one-time memoized BUILD steps (codebook training, the cluster
        # index) self-report via the build ledger: attach them to the
        # query whose invocation paid them, so a cold build in the
        # artifact is labeled as BUILD, never misread as plan cost
        # (VERDICT.md r7 stretch #8 — the FAISS train/add/search split,
        # now explicit in the committed record)
        paid = buildstats.drain()
        if paid:
            builds[name] = paid
        if ts:
            res[name] = (round(min(ts), 3), round(ts[0], 3))

    total = 0.0
    for name, (warm, cold) in sorted(res.items(), key=lambda kv: -kv[1][0]):
        total += warm
        print(f"{warm:8.3f} {cold:8.3f}  {name}")
    print(f"# {len(res)} queries, warm total {total:.1f}s", file=sys.stderr)

    artifact = {
        "sf_dir": args.sf,
        "passes": args.passes,
        "measure": "collect" if args.collect else "noop_write",
        "n_queries": len(res),
        "warm_total_sec": round(total, 3),
        "loadavg_start": loadavg_start,
        "loadavg_end": [round(v, 2) for v in os.getloadavg()],
        "calibration_sec": calibration,
        "calibration_single_sec": calibration_single,
        # the probe measures cores × clock; recording the core count
        # lets host_norm tell a topology change from a clock epoch
        "cpu_count": os.cpu_count(),
        "queries": {
            n: {
                "warm": warm,
                "cold": cold,
                **(
                    {
                        "build_sec": round(
                            sum(b["sec"] for b in builds[n]), 3
                        ),
                        "builds": builds[n],
                    }
                    if n in builds
                    else {}
                ),
            }
            for n, (warm, cold) in sorted(res.items())
        },
    }
    if args.json:
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump(artifact, fh, indent=0, sort_keys=True)
            fh.write("\n")
        print(f"# wrote {args.json}", file=sys.stderr)

    if args.diff:
        with open(args.diff, encoding="utf-8") as fh:
            prev = json.load(fh)
        # advisory: the gate normalizes by the PARALLEL probe; print
        # the single-thread ratio too when both artifacts carry it —
        # round 9 found a driver/JIT epoch the parallel probe is blind
        # to (see session.host_speed_probe_single), and this line is
        # what makes that adjudication mechanical next time
        ps, cs = prev.get("calibration_single_sec"), artifact.get(
            "calibration_single_sec")
        if ps and cs:
            print(f"# single-thread calibration ratio: {cs / ps:.3f} "
                  f"(parallel: {host_norm(prev, artifact):.3f})",
                  file=sys.stderr)
        regressions = compare_sweeps(prev, artifact)
        for name, pw, cw in regressions:
            print(f"REGRESSION {name}: {pw}s -> {cw}s "
                  f"({cw / pw:.2f}x)", file=sys.stderr)
        if regressions:
            return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
