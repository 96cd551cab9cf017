#!/usr/bin/env python
"""Run every registered query against its DuckDB oracle locally.

Usage: python tools/verify_local.py [--sf /root/testdata/sf0.001] [--query NAME ...]
Prints one line per query and a summary; exit code 1 on any failure.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_c_sharp_simulation_multithreaded_spark import oracle as ora
from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry
from map_reduce_c_sharp_simulation_multithreaded_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--query", action="append", default=None)
    args = ap.parse_args()

    spark = get_spark("verify_local")
    con = ora.duckdb_connect(args.sf)
    qs = registry.all_queries()
    if args.query:
        qs = {n: q for n, q in qs.items() if n in set(args.query)}

    failures = []
    for name, q in sorted(qs.items()):
        t0 = time.time()
        try:
            scols, srows = ora.spark_result(q.fn(spark, args.sf))
            if q.oracle is None:
                status = "ROWS-ONLY" if srows is not None else "??"
                print(f"{name:45s} {status:10s} rows={len(srows):7d} "
                      f"({time.time()-t0:5.1f}s)")
                continue
            ocols, orows = ora.oracle_result(con, q.oracle)
            res = ora.compare(scols, srows, ocols, orows)
            status = "OK" if res["ok"] else "FAIL"
            print(f"{name:45s} {status:10s} rows={res['rows_spark']:7d} "
                  f"({time.time()-t0:5.1f}s)")
            if not res["ok"]:
                failures.append(name)
                detail = {k: v for k, v in res.items() if k != "first_diffs"}
                print(f"    {detail}")
                for a, b in res.get("first_diffs", []):
                    print(f"    spark : {a}\n    oracle: {b}")
        except Exception:
            failures.append(name)
            print(f"{name:45s} ERROR      ({time.time()-t0:5.1f}s)")
            traceback.print_exc()

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
