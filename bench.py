#!/usr/bin/env python
"""Benchmark: run the headline queries and print ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Output: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry
from map_reduce_c_sharp_simulation_multithreaded_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("mrcs_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    # three runs per query: first pays JIT/page-cache warmup, min is the
    # steady-state number (what a long-running cluster job would see);
    # cold times are reported alongside for honesty
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, q in sorted(registry.headline_queries().items()):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = q.fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        cold[name] = round(runs[0], 3)
        times[name] = round(min(runs), 3)
        print(f"# {name}: {times[name]}s warm / {cold[name]}s cold "
              f"({len(rows)} rows)", file=sys.stderr)

    out = {
        "metric": "headline_query_wall_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "cold_queries": cold,
        "sf": sf,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
