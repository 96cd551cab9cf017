#!/usr/bin/env python
"""Per-query plan fingerprints — the structural gate behind the
same-round driver rule (VERDICT.md r5 next-round #5).

Round 5's only debt was evidentiary: a late perf pass changed ~12
plans AFTER the driver window froze, so their driver rows lagged their
code. This tool makes that impossible to repeat silently: it computes
a normalized sha256 of every registered query's ANALYZED logical plan
(deliberately pre-optimizer — see the comment in :func:`compute`) and
compares against the committed ``PLAN_HASHES.json`` snapshot (frozen
when the DRIVER_WINDOW was last rotated). Queries whose returned
frame is a checkpoint or memory-sink tail (the plan is BLIND to their
loop/stream body) additionally fold the body's source closure into
the fingerprint — see :data:`_BLIND_RX`.
``tests/test_plan_freshness.py`` fails unless every query whose
fingerprint drifted from the snapshot — plus every new query — is in
the upcoming DRIVER_WINDOW.

Workflow when changing any query's plan:
  1. make the change;
  2. add the query to DRIVER_WINDOW (registry.py);
  3. ``python tools/plan_hashes.py --write`` to refresh the snapshot;
  4. commit both. The pytest then stays green, and the driver verifies
     the changed plan in the same round it changed.

Normalization strips run-varying tokens (expr ids ``#123``, per-pid
scratch tags ``_p4242``, JVM object addresses, absolute paths) so the
fingerprint is stable across processes; queries are hashed in
REGISTRATION order with the Spark cache cleared before each build, so
cross-query cache substitution cannot make one query's fingerprint
depend on window ordering.

Usage: python tools/plan_hashes.py [--write] [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import importlib
import importlib.util
import inspect
import json
import os
import re
import sys
import textwrap
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(REPO, "PLAN_HASHES.json")
WINDOW_KEYS = os.path.join(REPO, "WINDOW_KEYS.json")
DEFAULT_SF = "/root/testdata/sf0.001"

_NORMALIZERS = (
    (re.compile(r"#\d+"), "#N"),                      # expression ids
    # session-global lambda-variable counters (x_1, x_2, ...): the
    # suffix counts lambdas created in the SESSION, not the query
    (re.compile(r"(lambda [A-Za-z]+)_\d+"), r"\1_N"),
    (re.compile(r"(lambdafunction\([A-Za-z]*[a-z])_\d+"), r"\1_N"),
    (re.compile(r"_p\d+"), "_pN"),                    # per-pid scratch tags
    (re.compile(r"@[0-9a-fA-F]{6,}"), "@X"),          # JVM object addresses
    (re.compile(r"(?:file|hdfs|s3a?):/[^\s,\)\]\"]*"), "URI"),
    (re.compile(r"/[A-Za-z0-9_\-./]*(?:testdata|tmp|warehouse)[A-Za-z0-9_\-./]*"),
     "PATH"),
    (re.compile(r"\bplan_id=\d+"), "plan_id=N"),
    # memory-sink table names carry a session-global stream counter
    # (streaming/events_stream.py) — its value depends on how many
    # stream-driving queries registered EARLIER, so without this,
    # registering or removing any stream query would spuriously flag
    # every later stream_* fingerprint as changed (ADVICE r6)
    (re.compile(r"mrcs_stream_\d+"), "mrcs_stream_N"),
)

# Queries whose RETURNED frame is a checkpoint scan (LogicalRDD) or a
# memory-sink table scan fingerprint only that tail — the PLAN hash is
# BLIND to their loop/stream bodies. main() prints them as "blind:"
# lines and tests/test_plan_freshness.py pins the exact set, so the
# blind spot is visible in the gate itself, not just a comment
# (ADVICE r6). For these queries (and _FORCE_SOURCE_FP) the
# fingerprint additionally folds in :func:`_source_closure` — the
# source text of the plan function and every package-local function/
# class it transitively references — so a loop-body or stream-body
# edit DOES drift the fingerprint even though the analyzed plan
# cannot see it (closing the r6-ADVICE blind spot instead of only
# pinning it). Plan-visible queries keep plan-only hashes: source
# hashing there would flag comment-only refactors the plan hash
# already proves harmless.
_BLIND_RX = re.compile(r"\bLogicalRDD\b|mrcs_stream_")

# Body-blind queries the regex cannot isolate: foreachBatch writes a
# real warehouse table, so the returned frame is a plain catalog read
# indistinguishable from a legitimate table scan. Force their
# fingerprints onto the source-closure scheme by name.
_FORCE_SOURCE_FP = {"stream_foreachbatch_upsert"}

_PKG = "map_reduce_c_sharp_simulation_multithreaded_spark"


def _code_names(code: types.CodeType) -> set[str]:
    """co_names of ``code`` and every nested code object (lambdas,
    comprehensions, local defs)."""
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _code_names(const)
    return names


def _local_imports(f) -> list:
    """Package objects bound by import statements INSIDE ``f``'s body.

    Function-local imports (``from ..operators.text import
    bpe_merge_rounds`` in the function body) bind LOCALS — invisible
    to ``f.__globals__`` — so without this, a blind query whose loop
    body is locally imported would escape the source closure entirely
    (found in review: the BPE iteratives). Parse the source for
    Import/ImportFrom nodes, resolve relative levels against the
    function's own module path, and return the named objects."""
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(f)))
    except (OSError, TypeError, SyntaxError):
        return []
    # Relative imports resolve against the module's PACKAGE, which for a
    # function defined in a package __init__.py is the module itself —
    # naive "strip `level` components off __module__" would strip the
    # package too and silently drop the import from the closure
    # (ADVICE r7). importlib.util.resolve_name applies the real rule.
    f_module = getattr(f, "__module__", "") or ""
    mod_obj = sys.modules.get(f_module)
    package = getattr(mod_obj, "__package__", None)
    if package is None:  # pragma: no cover - module not imported
        package = f_module.rpartition(".")[0]
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            modname = node.module or ""
            if node.level:
                try:
                    modname = importlib.util.resolve_name(
                        "." * node.level + modname, package
                    )
                except (ImportError, ValueError):  # pragma: no cover
                    continue
            if not modname.startswith(_PKG):
                continue
            try:
                mod = importlib.import_module(modname)
            except ImportError:  # pragma: no cover - broken import
                continue
            for alias in node.names:
                sub = getattr(mod, alias.name, None)
                if sub is not None:
                    out.append(sub)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(_PKG):
                    try:
                        out.append(importlib.import_module(alias.name))
                    except ImportError:  # pragma: no cover
                        pass
    return out


def _closure_key(f) -> tuple[str, str]:
    if isinstance(f, types.ModuleType):
        return (f.__name__, "<module>")
    return (
        getattr(f, "__module__", "") or "",
        getattr(f, "__qualname__", None) or repr(type(f)),
    )


def _source_closure(fn) -> str:
    """Concatenated (sorted, deduped) source of ``fn`` plus every
    package-local function/class/module it transitively references
    through globals, module attributes, closure cells, or
    function-LOCAL imports (:func:`_local_imports`). Deterministic for
    a given working tree — comment edits count, deliberately: a
    drifted body fingerprint costs one driver-window slot to
    re-verify, while a silent body change cost round 5 its evidence
    freshness."""
    seen: set[tuple[str, str]] = set()
    sources: dict[tuple[str, str], str] = {}
    stack = [fn]
    while stack:
        f = stack.pop()
        key = _closure_key(f)
        if key in seen:
            continue
        seen.add(key)
        try:
            sources[key] = inspect.getsource(f)
        except (OSError, TypeError):
            pass
        if isinstance(f, types.ModuleType):
            continue  # whole-module source collected; don't traverse
        code = getattr(f, "__code__", None)
        if code is None:
            continue
        stack.extend(
            o
            for o in _local_imports(f)
            if isinstance(o, (types.FunctionType, type, types.ModuleType))
            and (
                getattr(o, "__module__", None) or getattr(o, "__name__", "")
            ).startswith(_PKG)
        )
        g = getattr(f, "__globals__", {})
        names = _code_names(code)
        for name in names:
            cand = g.get(name)
            if isinstance(cand, (types.FunctionType, type)) and getattr(
                cand, "__module__", ""
            ).startswith(_PKG):
                stack.append(cand)
            elif isinstance(cand, types.ModuleType) and cand.__name__.startswith(
                _PKG
            ):
                # attribute-style calls (mod.helper(...)): co_names holds
                # both the module and the attribute names — resolve every
                # name against the module (over-collects harmlessly)
                for attr in names:
                    sub = getattr(cand, attr, None)
                    if isinstance(sub, (types.FunctionType, type)) and getattr(
                        sub, "__module__", ""
                    ).startswith(_PKG):
                        stack.append(sub)
        for cell in getattr(f, "__closure__", None) or ():
            try:
                v = cell.cell_contents
            except ValueError:  # pragma: no cover - unfilled cell
                continue
            if isinstance(v, (types.FunctionType, type)) and getattr(
                v, "__module__", ""
            ).startswith(_PKG):
                stack.append(v)
    return "\n".join(sources[k] for k in sorted(sources))


def normalize(plan: str) -> str:
    for rx, repl in _NORMALIZERS:
        plan = rx.sub(repl, plan)
    return plan


def _split_top_args(plan: str, open_idx: int) -> list[str]:
    """Split the argument list of the call whose '(' sits at
    ``open_idx`` into top-level comma-separated pieces."""
    depth, start, out = 1, open_idx + 1, []
    i = start
    while i < len(plan) and depth:
        c = plan[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                out.append(plan[start:i])
        elif c == "," and depth == 1:
            out.append(plan[start:i])
            start = i + 1
        i += 1
    return out


# An analyzed-plan sort order always renders as "<expr> ASC NULLS
# FIRST" / "<expr> DESC NULLS LAST" inside windowspecdefinition —
# anchor on that suffix, not substring containment, so a partition-key
# EXPRESSION whose text merely contains " ASC"/" DESC" (e.g. a string
# literal) cannot be silently dropped from the inventory (ADVICE r12).
_SORT_ORDER_RX = re.compile(r" (ASC|DESC) NULLS (FIRST|LAST)$")


def window_partition_keys(plan: str) -> set[str]:
    """Partition-key expressions of every ``windowspecdefinition`` in
    a plan string, exprIds stripped — the raw material of the hot-key
    window inventory (SCALE.md "Window inventory";
    tests/test_window_inventory.py). Sort orders carry ``ASC``/
    ``DESC`` suffixes and the frame is ``specifiedwindowframe(...)``;
    everything else in the spec's argument list is a partition key.

    A spec with ZERO partition keys is a GLOBAL window — Spark moves
    ALL input rows to a single task ("WindowExec: No Partition
    Defined" warning), the worst case of the hot-key class by
    construction. It is recorded as the sentinel ``<global>`` so the
    inventory gate can require a per-query rows-bound review instead
    of passing it trivially (VERDICT r12 wrong #2)."""
    keys: set[str] = set()
    for m in re.finditer(r"windowspecdefinition\(", plan):
        part_keys: list[str] = []
        for a in _split_top_args(plan, m.end() - 1):
            a = a.strip()
            if (
                not a
                or a.startswith("specifiedwindowframe(")
                or _SORT_ORDER_RX.search(a)
            ):
                continue
            part_keys.append(re.sub(r"#\d+L?", "", a))
        keys.update(part_keys or ["<global>"])
    return keys


def compute(
    sf_dir: str = DEFAULT_SF,
    names=None,
    blind_out: set | None = None,
    window_keys_out: dict | None = None,
) -> dict[str, str]:
    """{query name: 16-hex fingerprint of its normalized ANALYZED plan}.
    If ``blind_out`` is given, names whose plan matches :data:`_BLIND_RX`
    (checkpoint/memory-table tails — see its comment) are added to it."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry
    from map_reduce_c_sharp_simulation_multithreaded_spark.session import get_spark

    spark = get_spark("mrcs_plan_hashes", cpus=8, shuffle_partitions=8)
    # Pin the inverted-index shard knob while fingerprinting (ADVICE
    # r13): _index_shard_count derives a pmod LITERAL from
    # defaultParallelism / MRCS_INDEX_SHARDS, so without a pin the
    # fingerprint would vary with SPARK_GRAFT_CPUS or an env override
    # and read as spurious plan drift on a differently-sized host. 32
    # matches the bench session's local[32].
    _shards_prev = os.environ.get("MRCS_INDEX_SHARDS")
    os.environ["MRCS_INDEX_SHARDS"] = "32"
    try:
        return _compute_inner(spark, sf_dir, names, blind_out, window_keys_out)
    finally:
        if _shards_prev is None:
            os.environ.pop("MRCS_INDEX_SHARDS", None)
        else:
            os.environ["MRCS_INDEX_SHARDS"] = _shards_prev


def _compute_inner(spark, sf_dir, names, blind_out, window_keys_out):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry

    qs = registry.all_queries()
    out: dict[str, str] = {}
    for name in registry.registration_order():
        if names and name not in names:
            continue
        spark.catalog.clearCache()
        # The ANALYZED plan, not the optimized one: it is a pure
        # function of the DataFrame construction (what the gate
        # guards), while optimizer rewrites (RewriteDistinctAggregates'
        # Expand) iterate attribute sets whose order shifts with
        # session history — observed flapping agg_distinct_counts /
        # agg_profile_orders_columns across otherwise identical runs.
        # Queries returning localCheckpoint()ed frames (pagerank/CC)
        # analyze to only the post-checkpoint tail; their fingerprints
        # get the body's source closure folded in below.
        plan = (
            qs[name]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        payload = normalize(plan)
        if window_keys_out is not None:
            wk = window_partition_keys(plan)
            if wk:
                window_keys_out[name] = sorted(wk)
        if _BLIND_RX.search(plan) or name in _FORCE_SOURCE_FP:
            if blind_out is not None and _BLIND_RX.search(plan):
                blind_out.add(name)
            # plan-blind tail: fold the body's source closure into the
            # fingerprint so body edits drift it (see _BLIND_RX note)
            payload += "\x00" + _source_closure(qs[name].fn)
        out[name] = hashlib.sha256(payload.encode("utf-8")).hexdigest()[:16]
    spark.catalog.clearCache()
    return out


def load_snapshot() -> dict[str, str]:
    if not os.path.exists(SNAPSHOT):
        return {}
    with open(SNAPSHOT, encoding="utf-8") as fh:
        return json.load(fh)


def diff(current: dict[str, str], snapshot: dict[str, str]):
    """(changed, new, gone) query-name lists vs the snapshot."""
    changed = sorted(
        n for n, h in current.items() if n in snapshot and snapshot[n] != h
    )
    new = sorted(n for n in current if n not in snapshot)
    gone = sorted(n for n in snapshot if n not in current)
    return changed, new, gone


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=DEFAULT_SF)
    ap.add_argument("--write", action="store_true",
                    help="refresh PLAN_HASHES.json with current fingerprints")
    args = ap.parse_args()

    blind: set[str] = set()
    wkeys: dict[str, list[str]] = {}
    current = compute(args.sf, blind_out=blind, window_keys_out=wkeys)
    for n in sorted(blind):
        print(f"blind: {n}")
    if args.write:
        with open(SNAPSHOT, "w", encoding="utf-8") as fh:
            json.dump(current, fh, indent=0, sort_keys=True)
            fh.write("\n")
        # window partition keys ride the same refresh so the hot-key
        # inventory gate (tests/test_window_inventory.py) always
        # judges the snapshot the freshness gate keeps current
        with open(WINDOW_KEYS, "w", encoding="utf-8") as fh:
            json.dump(wkeys, fh, indent=0, sort_keys=True)
            fh.write("\n")
        print(f"wrote {len(current)} fingerprints to {SNAPSHOT}")
        print(f"wrote window keys for {len(wkeys)} queries to {WINDOW_KEYS}")
        return 0

    changed, new, gone = diff(current, load_snapshot())
    for label, names in (("changed", changed), ("new", new), ("gone", gone)):
        for n in names:
            print(f"{label}: {n}")
    print(f"# {len(current)} queries; {len(changed)} changed, "
          f"{len(new)} new, {len(gone)} gone vs snapshot; "
          f"{len(blind)} checkpoint/stream-tail fingerprints (blind)")
    return 1 if (changed or new or gone) else 0


if __name__ == "__main__":
    sys.exit(main())
