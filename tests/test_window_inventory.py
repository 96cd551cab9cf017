"""Hot-key window gate (round 12) — the SCALE.md "Window inventory"
made structural.

The r11→r12 lesson, three times over (ExactSubstr gram hash, span-
windows span hash, curate-pipeline fingerprint, inverted-index token,
multimodal shape bucket): ``Window.partitionBy(k)`` places EVERY row
of a key on one task with no partial aggregation and no AQE relief,
so a window is only safe when rows-per-key is bounded by something a
task can hold. This gate pins that law: ``tools/plan_hashes.py
--write`` extracts every ``windowspecdefinition`` partition key from
every registered query's analyzed plan into ``WINDOW_KEYS.json``
(same refresh the plan-freshness gate already keeps current — a plan
change without a refresh fails THAT gate, so this one always judges
live data), and any key outside the reviewed allowlist below fails
the suite. Adding a key here requires naming its rows-per-key bound,
mirroring a row on SCALE.md's inventory table.

Blind spot, explicit: queries whose returned frame is a checkpoint or
memory-sink tail analyze to a table scan, so windows inside their
loop/stream bodies don't appear here — those bodies are covered by
the source-closure fingerprints (plan_hashes._BLIND_RX) and their own
pytest suites, the same division of labor the freshness gate uses.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# key -> the rows-per-key bound that makes a window over it safe
# (classes from SCALE.md "Window inventory")
ALLOWED_WINDOW_KEYS = {
    # per-document position: bounded by the row's own text width
    "_id": "span-island merges — positions per document",
    "doc_id": "per-document term stats",
    # per-entity history: the unit the semantics must co-locate anyway
    "user_id": "one user's event history",
    "sess_id": "one session's events",
    "o_custkey": "one customer's order history",
    "c_nationkey": "customers per nation — dimension-bounded (25)",
    # pre-reduced input: the feeding aggregation collapsed multiplicity
    "o_orderstatus": "window over a <=15-row (status x priority) table",
    "w1": "aggregated bigram counts — continuations <= vocabulary",
    "window-T600000ms": "streaming (window, event_type) counts — enum-bounded",
    # bounded by algorithm constants
    "query_id": "per-query shortlist — k x probes",
    "vec_id": "candidate cells per vector — <= nlist",
    "ps_partkey": "EUROPE (part, supplier) costs per part — bounded "
    "by suppliers-per-part (TPC-H: <= ~100 at any SF; r14 q2 rewrite)",
    "cluster_id": "SemDeDup k-proportional-to-n occupancy (measured)",
    # sharded two-phase escape hatch / small-domain stream keys
    "lang": "language domain is small; sharded variant exists for skew",
    "source": "source domain is small; two-phase shard documented",
    "shard": "explicit shard key of the two-phase pattern",
    "_shard": "explicit shard key of the two-phase pattern",
}

# A windowspecdefinition with an EMPTY partition spec is a GLOBAL
# window: Spark logs "WindowExec: No Partition Defined ... Moving all
# data to a single partition" and puts EVERY input row on one task —
# the worst case of the hot-key class by construction (VERDICT r12
# wrong #2). The extractor (tools/plan_hashes.window_partition_keys)
# records it as the sentinel "<global>", and unlike column keys the
# review is PER QUERY: a global window is only safe when the frame
# feeding it is already reduced to a task-sized row count, which is a
# property of that query's plan, not of any key. Each entry names the
# feeding frame's rows bound (SCALE.md "Window inventory").
ALLOWED_GLOBAL_WINDOW_QUERIES = {
    "curation_budget_mixture": (
        "both global windows run over the per-source aggregate "
        "(plans/mlprep.py greedy budget walk) — <= #sources rows (20 "
        "at sf0.01), reduced before the window"
    ),
    "window_ratio_to_report": (
        "ratio-to-report denominator over the nation-level aggregate "
        "— <= #nations rows (25), dimension-bounded"
    ),
    "text_bm25_topk": (
        "rank window over orderBy().limit(10) — TakeOrderedAndProject "
        "reduces the corpus to 10 rows BEFORE the window"
    ),
    "retrieval_hybrid_rrf": (
        "three rank windows, each over a limit(20)/limit(20)/limit(10) "
        "shortlist — all frames list-k-bounded before the window"
    ),
    "text_zipf_slope": (
        "rank window over the top-50 limit frame (the full-vocabulary "
        "top-k is TakeOrderedAndProject, NOT this window)"
    ),
    "text_bpe_vocab_apply": (
        "rank window over the per-SYMBOL frequency table — symbols "
        "are the character alphabet + n_rounds merges (~130 rows), "
        "alphabet-bounded, not corpus-bounded"
    ),
}


def _global_window_offenders(wkeys: dict) -> dict:
    return {
        q: "unreviewed global window"
        for q, ks in wkeys.items()
        if "<global>" in ks and q not in ALLOWED_GLOBAL_WINDOW_QUERIES
    }


def test_every_window_partition_key_is_allowlisted():
    with open(os.path.join(REPO, "WINDOW_KEYS.json"), encoding="utf-8") as fh:
        wkeys = json.load(fh)
    offenders = {
        q: sorted(set(ks) - set(ALLOWED_WINDOW_KEYS) - {"<global>"})
        for q, ks in wkeys.items()
        if set(ks) - set(ALLOWED_WINDOW_KEYS) - {"<global>"}
    }
    assert not offenders, (
        f"window partition keys outside the reviewed inventory: "
        f"{offenders} — a Window over a key whose rows-per-key grows "
        f"with the corpus is a one-task straggler at scale (no "
        f"combiner, no AQE). Either rewrite as groupBy+semi-join / "
        f"min(struct) / sharded two-phase (see SCALE.md 'Window "
        f"inventory') or add the key here WITH its boundedness "
        f"argument and a SCALE.md table row"
    )


def test_global_windows_are_per_query_reviewed():
    """Every query whose plan contains a zero-partition-key window must
    be individually allowlisted with its feeding frame's rows bound —
    the column-key allowlist cannot cover it (an empty spec has no key
    to review)."""
    with open(os.path.join(REPO, "WINDOW_KEYS.json"), encoding="utf-8") as fh:
        wkeys = json.load(fh)
    offenders = _global_window_offenders(wkeys)
    assert not offenders, (
        f"queries with a GLOBAL window (empty partition spec — ALL rows "
        f"on one task) outside the reviewed list: {sorted(offenders)} — "
        f"either partition the window, pre-reduce the frame and add the "
        f"query to ALLOWED_GLOBAL_WINDOW_QUERIES with its rows bound, "
        f"or rewrite as an aggregate + broadcast join"
    )
    # The review list carries no dead entries: every allowlisted query
    # still has a global window in its live plan.
    dead = sorted(
        q for q in ALLOWED_GLOBAL_WINDOW_QUERIES
        if "<global>" not in set(wkeys.get(q, []))
    )
    assert not dead, (
        f"ALLOWED_GLOBAL_WINDOW_QUERIES entries whose plans no longer "
        f"contain a global window: {dead} — retire them"
    )


def test_global_window_gate_fails_on_unreviewed_entry():
    """Red-test proof (VERDICT r12 'Done =' condition): an unreviewed
    query whose key list contains the <global> sentinel is flagged."""
    fake = {"some_new_query": ["<global>"], "doc_id_query": ["doc_id"]}
    offenders = _global_window_offenders(fake)
    assert offenders == {"some_new_query": "unreviewed global window"}
    # ...and the extractor actually emits the sentinel for an empty
    # partition spec, anchored on the real analyzed-plan syntax.
    import sys
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from plan_hashes import window_partition_keys

    plan = (
        "Window [sum(x#1L) windowspecdefinition(y#2 ASC NULLS FIRST, "
        "specifiedwindowframe(RangeFrame, unboundedpreceding$(), "
        "currentrow$()))], [y#2 ASC NULLS FIRST]"
    )
    assert window_partition_keys(plan) == {"<global>"}
    # a partitioned spec still extracts its key, and a key expression
    # containing ' ASC' as a literal is NOT dropped (ADVICE r12 #4)
    plan2 = (
        "Window [row_number() windowspecdefinition(concat(k#3,  ASC)#9, "
        "y#2 DESC NULLS LAST, specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), currentrow$()))]"
    )
    assert window_partition_keys(plan2) == {"concat(k,  ASC)"}


def test_window_keys_snapshot_in_sync_with_plan_hashes():
    """WINDOW_KEYS.json is written by the same --write that refreshes
    PLAN_HASHES.json; every query it names must exist in the hash
    snapshot, so a hand-edited or stale file cannot pass silently."""
    with open(os.path.join(REPO, "WINDOW_KEYS.json"), encoding="utf-8") as fh:
        wkeys = json.load(fh)
    with open(os.path.join(REPO, "PLAN_HASHES.json"), encoding="utf-8") as fh:
        hashes = json.load(fh)
    orphans = sorted(set(wkeys) - set(hashes))
    assert not orphans, (
        f"WINDOW_KEYS.json names queries absent from PLAN_HASHES.json: "
        f"{orphans} — refresh both with tools/plan_hashes.py --write"
    )
    assert wkeys, "WINDOW_KEYS.json is empty — regenerate with --write"
