#!/usr/bin/env python
"""Recall-vs-n_probe frontier on the planted-cluster corpus
(VERDICT.md r8 stretch #8) — the FAISS tuning loop as a reproducible
artifact.

For each codebook (the analytic 16-block centroids the registered
query uses, and a codebook TRAINED on the planted corpus via
train_kmeans_codebook — its one-time cost labeled BUILD through the
build ledger) sweep n_probe and record mean recall@10 against
brute-force ground truth plus warm query wall. The curve is the
quality/cost dial the uniform-corpus fixture could never show: recall
climbs 0.81 → 1.0 across probes while scanned-cell fraction grows
n_probe/16.

    python tools/ann_probe_curve.py [--sf DIR] [--json ANN_CURVE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark import buildstats
from map_reduce_c_sharp_simulation_multithreaded_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    train_kmeans_codebook,
)
from map_reduce_c_sharp_simulation_multithreaded_spark.plans.similarity import (
    _block_centroids,
    _recall_frame,
    planted_corpus,
)
from map_reduce_c_sharp_simulation_multithreaded_spark.session import (
    get_spark,
    host_speed_probe,
    host_speed_probe_single,
)

N_PROBES = (1, 2, 3, 4, 8, 16)
K = 10


def measure(spark, corpus, truth, centroids, n_probe: int) -> dict:
    q = corpus.filter(F.col("vec_id") < 20)

    def run():
        approx = ivf_topk(
            corpus, q, "vec_id", "embedding", k=K, n_probe=n_probe,
            dim=64, centroids=centroids,
        )
        return (
            _recall_frame(truth, approx)
            .agg(F.avg("recall").alias("r"))
            .collect()[0]["r"]
        )

    recall = run()  # warm-up + value
    t0 = time.perf_counter()
    run()
    warm = time.perf_counter() - t0
    return {
        "recall": round(float(recall), 4),
        "warm_sec": round(warm, 3),
        "cell_fraction": round(n_probe / len(centroids), 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    loadavg_start = [round(v, 2) for v in os.getloadavg()]
    spark = get_spark("mrcs_ann_curve")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    calibration = host_speed_probe(spark)
    calibration_single = host_speed_probe_single(spark)
    print(f"# host_speed_probe: {calibration}s parallel / "
          f"{calibration_single}s single-thread", file=sys.stderr)

    corpus = planted_corpus(spark, args.sf).cache()
    corpus.count()
    q = corpus.filter(F.col("vec_id") < 20)
    truth = brute_force_topk(q, corpus, "vec_id", "embedding", k=K).select(
        "query_id", "neighbor_id"
    )

    buildstats.drain()
    books: dict[str, tuple[list[list[float]], list[dict]]] = {}
    books["block"] = (_block_centroids(), buildstats.drain())
    t0 = time.perf_counter()
    trained = train_kmeans_codebook(
        corpus, "embedding", n_centroids=16, n_iter=3, dim=64,
        id_col="vec_id", sum_quantize=1e-6,
    )
    buildstats.record_build(
        "kmeans_codebook", time.perf_counter() - t0, "ann_probe_curve k=16"
    )
    books["trained"] = (trained, buildstats.drain())

    results: dict[str, dict] = {}
    for name, (cents, builds) in books.items():
        curve = {}
        for npb in N_PROBES:
            curve[str(npb)] = measure(spark, corpus, truth, cents, npb)
            c = curve[str(npb)]
            print(f"{name:8s} n_probe={npb:2d}  recall {c['recall']:.4f}  "
                  f"warm {c['warm_sec']}s  cells {c['cell_fraction']}")
        results[name] = {"curve": curve, "builds": builds}

    artifact = {
        "sf_dir": args.sf,
        "k": K,
        "n_centroids": 16,
        "loadavg_start": loadavg_start,
        "loadavg_end": [round(v, 2) for v in os.getloadavg()],
        "calibration_sec": calibration,
        "calibration_single_sec": calibration_single,
        "cpu_count": os.cpu_count(),
        "codebooks": results,
    }
    if args.json:
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump(artifact, fh, indent=0, sort_keys=True)
            fh.write("\n")
        print(f"# wrote {args.json}", file=sys.stderr)
    corpus.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
