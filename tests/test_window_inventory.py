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
    "cluster_id": "SemDeDup k-proportional-to-n occupancy (measured)",
    # sharded two-phase escape hatch / small-domain stream keys
    "lang": "language domain is small; sharded variant exists for skew",
    "source": "source domain is small; two-phase shard documented",
    "shard": "explicit shard key of the two-phase pattern",
    "_shard": "explicit shard key of the two-phase pattern",
}


def test_every_window_partition_key_is_allowlisted():
    with open(os.path.join(REPO, "WINDOW_KEYS.json"), encoding="utf-8") as fh:
        wkeys = json.load(fh)
    offenders = {
        q: sorted(set(ks) - set(ALLOWED_WINDOW_KEYS))
        for q, ks in wkeys.items()
        if set(ks) - set(ALLOWED_WINDOW_KEYS)
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
