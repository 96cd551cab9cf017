#!/usr/bin/env python
"""ExactSubstr scaling evidence (round 11): measure the prune→verify
funnel across SFs, and prove the hash-shape decision on documents long
enough to expose the asymptotics.

    python tools/exactsubstr_scaling.py [--json OUT.json]

Two experiments:

1. FUNNEL — at each testdata SF: total positions, prune survivors
   (64-bit gram-hash window), verified duplicated positions, merged
   spans, plus wall time for the prune-only (``verify=False``) and
   full operator. Shows the candidate fraction the verify join
   actually pays for as the corpus grows.

2. LONG-DOC A/B — the committed rejection of the dynamic-position
   ``substr`` prune (SCALE.md round-11 note) gets measured proof: on
   synthetic corpora of FIXED total characters but growing document
   length (≈300 → 20 000 chars/doc), time the adopted
   ``xxhash64(slice(chars, i, L))`` prune against the
   ``xxhash64(text.substr(i, L))`` form. UTF8String.substring walks to
   the char offset, so the substr form is O(position) per gram —
   O(len²) per document — and should degrade with document length at
   constant total work, while the slice form stays ~flat. (The same
   experiment design as the winnow_fps lesson, applied to this
   round's operator.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark.catalog import load_table
from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
    exact_substr_spans,
)
from map_reduce_c_sharp_simulation_multithreaded_spark.session import (
    get_spark,
    host_speed_probe,
)

L = 50
SFS = ("sf0.001", "sf0.01", "sf0.1")


def _prune_counts(d, make_hashes) -> tuple[int, int]:
    """(total positions, prune survivors) for a given hash builder."""
    pos = d.select(
        F.col("doc_id").alias("_id"),
        F.posexplode(make_hashes()).alias("_p0", "_h"),
    )
    n_occ = F.count(F.lit(1)).over(Window.partitionBy("_h"))
    cand = pos.withColumn("_n", n_occ).filter(F.col("_n") >= 2)
    return pos.count(), cand.count()


def _slice_hashes():
    chars_src = F.split(F.col("text"), "")

    def hash_array(chars):
        n_pos = F.size(chars) - (L - 1)
        hs = F.transform(
            F.sequence(F.lit(1), F.greatest(n_pos, F.lit(1))),
            lambda i: F.xxhash64(F.slice(chars, i, L)),
        )
        return F.when(n_pos > 0, hs).otherwise(
            F.array().cast("array<bigint>")
        )

    return F.element_at(F.transform(F.array(chars_src), hash_array), 1)


def _substr_hashes():
    n_pos = F.length("text") - (L - 1)
    hs = F.transform(
        F.sequence(F.lit(1), F.greatest(n_pos, F.lit(1))),
        lambda i: F.xxhash64(F.col("text").substr(i, F.lit(L))),
    )
    return F.when(n_pos > 0, hs).otherwise(F.array().cast("array<bigint>"))


def funnel(spark) -> dict:
    out = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        d = d.cache()
        d.count()
        n_pos, n_cand = _prune_counts(d, _slice_hashes)

        t0 = time.perf_counter()
        n_spans_prune = exact_substr_spans(d, verify=False).count()
        t_prune = time.perf_counter() - t0

        full = exact_substr_spans(d)
        t0 = time.perf_counter()
        n_spans = full.count()
        t_full = time.perf_counter() - t0
        n_dup_pos = int(
            full.agg(F.sum("n_windows")).collect()[0][0] or 0
        )
        d.unpersist()
        out[sf] = {
            "positions": n_pos,
            "prune_survivors": n_cand,
            "survivor_pct": round(100.0 * n_cand / max(n_pos, 1), 2),
            "verified_dup_positions": n_dup_pos,
            "spans": n_spans,
            "spans_prune_only": n_spans_prune,
            "wall_prune_only_sec": round(t_prune, 3),
            "wall_full_sec": round(t_full, 3),
        }
        print(f"{sf}: {out[sf]}")
    return out


def synth_corpus(spark, doc_len: int, total_chars: int):
    """Deterministic word-soup docs of ~doc_len chars with planted
    repetition (16-word vocabulary → shared 50-grams guaranteed), at a
    fixed corpus-wide character budget."""
    n_docs = max(2, total_chars // doc_len)
    words = F.array(*[F.lit(f"w{i:02d}") for i in range(16)])
    n_words = doc_len // 4  # "wNN " = 4 chars
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_words)),
            lambda j: F.element_at(
                words,
                (F.pmod(F.xxhash64(F.col("id") * 7 + j), F.lit(16)) + 1)
                .cast("int"),
            ),
        ),
        " ",
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), body.alias("text")
    )


def longdoc_ab(spark, total_chars: int = 1_500_000) -> dict:
    out = {}
    for doc_len in (300, 2_000, 20_000):
        d = synth_corpus(spark, doc_len, total_chars).cache()
        d.count()
        rows = {}
        for label, mk in (("slice", _slice_hashes), ("substr", _substr_hashes)):
            # warm once, then measure
            _prune_counts(d, mk)
            t0 = time.perf_counter()
            n_pos, n_cand = _prune_counts(d, mk)
            rows[label] = {
                "sec": round(time.perf_counter() - t0, 3),
                "positions": n_pos,
                "survivors": n_cand,
            }
        d.unpersist()
        assert rows["slice"]["survivors"] == rows["substr"]["survivors"]
        rows["substr_over_slice"] = round(
            rows["substr"]["sec"] / max(rows["slice"]["sec"], 1e-9), 2
        )
        out[str(doc_len)] = rows
        print(f"doc_len={doc_len}: {rows}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spark = get_spark("mrcs_exactsubstr_scaling")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    calibration = host_speed_probe(spark)
    print(f"# host_speed_probe: {calibration}s", file=sys.stderr)

    artifact = {
        "calibration_sec": calibration,
        "cpu_count": os.cpu_count(),
        "min_len": L,
        "funnel": funnel(spark),
        "longdoc_ab_fixed_total_chars": longdoc_ab(spark),
    }
    if args.json:
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump(artifact, fh, indent=0, sort_keys=True)
            fh.write("\n")
        print(f"# wrote {args.json}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
