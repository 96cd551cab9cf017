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

# Queries whose fingerprint is BLIND to their loop/stream body because
# the returned frame is a localCheckpoint scan (LogicalRDD) or a
# memory-sink table read — exactly the iterative/streaming families
# whose post-freeze changes caused the round-5 evidence gap. Pinned
# here (ADVICE r6) so the gate's blind spot is an explicit, reviewed
# list that FAILS the suite when it grows: a new checkpoint/stream
# query must be added here consciously, with its body guarded by its
# own pytest (the existing ones live in test_dedup.py /
# test_round5_ops.py / streaming tests).
EXPECTED_BLIND = {
    # eager-localCheckpoint iteratives (LogicalRDD tails)
    "curation_cluster_keep_best",
    "dedup_connected_components",
    "graph_bfs_supplier_hops",
    "graph_pagerank_directed",
    "graph_pagerank_suppliers",
    "split_cluster_leakage_safe",
    "text_bpe_merges",
    "text_bpe_vocab_apply",
    # memory-sink streaming family (mrcs_stream_N table tails)
    "stream_dedup_user_type",
    "stream_dedup_within_watermark",
    "stream_session_windows",
    "stream_sliding_avg",
    "stream_stateful_user_totals",
    "stream_static_join_enrich",
    "stream_stream_interval_join",
    "stream_tumbling_counts",
    "stream_windowed_topk",
}
# Known additional body-blind query the regex cannot isolate:
# stream_foreachbatch_upsert returns a WAREHOUSE table scan (its
# foreachBatch MERGE writes a real table), indistinguishable in the
# plan string from a legitimate catalog read. It is force-listed in
# plan_hashes._FORCE_SOURCE_FP; treat any foreachBatch-style debut
# the same way.
#
# Blind does NOT mean unguarded: for every query in this set (and the
# force list) the fingerprint folds in the SOURCE CLOSURE of the plan
# function — itself plus every package-local function/class it
# transitively references — so loop-body and stream-body edits drift
# the hash even though the analyzed plan cannot see them
# (plan_hashes._source_closure; coverage pinned below).


def _run_tool() -> "subprocess.CompletedProcess[str]":
    # Pinned to the tool's own DEFAULT_SF, NOT the suite's sf_dir
    # fixture (ADVICE r6): PLAN_HASHES.json is snapshotted at the
    # default corpus, and queries with data-dependent plan literals
    # (the k∝n SemDeDup pair's footer-derived k, trained centroids)
    # would falsely report drift at any other SF.
    return subprocess.run(
        [sys.executable, TOOL],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )


def test_changed_plans_are_in_driver_window():
    assert os.path.exists(os.path.join(REPO, "PLAN_HASHES.json")), (
        "PLAN_HASHES.json missing — run tools/plan_hashes.py --write"
    )
    proc = _run_tool()
    drifted = {
        m.group(2)
        for m in re.finditer(r"^(changed|new): (\S+)$", proc.stdout, re.M)
    }
    gone = re.findall(r"^gone: (\S+)$", proc.stdout, re.M)
    blind = set(re.findall(r"^blind: (\S+)$", proc.stdout, re.M))

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
    assert blind == EXPECTED_BLIND, (
        f"fingerprint blind-spot set drifted: unexpected "
        f"{sorted(blind - EXPECTED_BLIND)}, missing "
        f"{sorted(EXPECTED_BLIND - blind)} — a checkpoint/stream-tail "
        f"query's plan hash cannot see its body; update EXPECTED_BLIND "
        f"deliberately and make sure the body has its own pytest"
    )


# For every plan-blind query, a source marker its body MUST contain:
# the name of (or a call inside) the loop/stream body the plan hash
# cannot see. If a marker goes missing from the query's source
# closure, the gate has regressed to the r6-ADVICE blind spot.
# Function-LOCAL imports are the known trap (review finding: the BPE
# iteratives import their merge loop inside the function body, which
# binds locals invisible to __globals__ — plan_hashes._local_imports
# exists for exactly this).
_BODY_MARKERS = {
    "curation_cluster_keep_best": ["_min_label_components",
                                   "def quality_features"],
    "dedup_connected_components": ["_min_label_components"],
    "graph_bfs_supplier_hops": ["localCheckpoint"],
    "graph_pagerank_directed": ["_pagerank_body"],
    "graph_pagerank_suppliers": ["_pagerank_body", "localCheckpoint"],
    "split_cluster_leakage_safe": ["_min_label_components"],
    "text_bpe_merges": ["def bpe_merge_rounds", "localCheckpoint"],
    "text_bpe_vocab_apply": ["def bpe_merge_rounds"],
    "stream_dedup_user_type": ["writeStream"],
    "stream_dedup_within_watermark": ["writeStream"],
    "stream_session_windows": ["writeStream"],
    "stream_sliding_avg": ["writeStream"],
    "stream_stateful_user_totals": ["writeStream"],
    "stream_static_join_enrich": ["writeStream", "def load_table"],
    "stream_stream_interval_join": ["writeStream"],
    "stream_tumbling_counts": ["writeStream"],
    "stream_windowed_topk": ["writeStream"],
    # force-listed (warehouse-table tail, regex-invisible)
    "stream_foreachbatch_upsert": ["foreachBatch", "def load_table"],
}


def test_blind_fingerprints_fold_in_body_source():
    """Every plan-blind query's source closure must reach its actual
    loop/stream body (markers above) — including bodies bound by
    function-local imports. (End-to-end check run when the scheme
    landed: a one-character docstring edit inside _pagerank_body
    drifted all three dependent fingerprints; reverting restored zero
    drift.)"""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import plan_hashes

    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

    assert set(_BODY_MARKERS) == EXPECTED_BLIND | plan_hashes._FORCE_SOURCE_FP
    qs = registry.all_queries()
    missing = {
        name: [m for m in markers if m not in
               plan_hashes._source_closure(qs[name].fn)]
        for name, markers in _BODY_MARKERS.items()
    }
    missing = {n: ms for n, ms in missing.items() if ms}
    assert not missing, (
        f"source closure no longer reaches these bodies: {missing} — "
        f"the freshness gate is blind to edits there"
    )
