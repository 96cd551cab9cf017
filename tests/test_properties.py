"""Property-based tests: operator semantics vs pure-Python models.

Each hypothesis example carries a BATCH of generated rows and runs one
Spark job (per-example jobs would make shrinking unbearably slow), so
examples are few but each covers dozens of inputs.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark.operators.joins import (
    dedup_dim_last_wins,
)
from map_reduce_c_sharp_simulation_multithreaded_spark.operators.text import (
    fingerprint,
    token_count,
    tokens,
    word_shingles,
)

# printable-ish text incl. whitespace runs and punctuation
TEXT = st.text(
    alphabet=st.sampled_from(list("abcde THE.!?,;: \t")), min_size=0, max_size=60
)
BATCH = st.lists(TEXT, min_size=1, max_size=40)

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _py_tokens(s: str) -> list[str]:
    return [t for t in re.split(r"\s+", s.strip()) if t != ""]


@given(BATCH)
@SLOW
def test_tokenizer_matches_python_model(spark, batch):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(batch)], "i long, t string")
    got = {
        r.i: (r.toks, r.n)
        for r in df.select(
            "i",
            tokens(F.col("t")).alias("toks"),
            token_count(F.col("t")).alias("n"),
        ).collect()
    }
    for i, s in enumerate(batch):
        expected = _py_tokens(s)
        assert got[i][0] == expected, (s, got[i][0], expected)
        assert got[i][1] == len(expected)


@given(BATCH)
@SLOW
def test_shingles_match_python_model(spark, batch):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(batch)], "i long, t string")
    got = {
        r.i: r.sh
        for r in df.select(
            "i", word_shingles(tokens(F.col("t")), 3).alias("sh")
        ).collect()
    }
    for i, s in enumerate(batch):
        toks = _py_tokens(s)
        expected = (
            [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
            if len(toks) >= 3
            else []
        )
        assert got[i] == expected, (s, got[i], expected)


@given(BATCH)
@SLOW
def test_fingerprint_whitespace_and_punct_invariant(spark, batch):
    # fingerprint must be invariant to whitespace runs, case, and the
    # stripped punctuation class
    rows = []
    for i, s in enumerate(batch):
        noisy = "  " + s.upper().replace(" ", "   ") + " .,; "
        rows.append((i, s, noisy))
    df = spark.createDataFrame(rows, "i long, a string, b string")
    got = df.select(
        "i",
        (fingerprint(F.col("a")) == fingerprint(F.col("b"))).alias("same"),
    ).collect()
    for r in got:
        # invariant holds whenever the original had no tabs (tabs also
        # normalize, so equality holds there too — assert uniformly)
        assert r.same, batch[r.i]


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=50,
    )
)
@SLOW
def test_last_wins_matches_python_model(spark, pairs):
    rows = [(k, seq, f"v{seq}") for seq, (k, _) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "k int, seq int, v string")
    got = {
        r.k: r.v
        for r in dedup_dim_last_wins(df, "k", [F.col("seq")]).collect()
    }
    expected: dict[int, str] = {}
    for k, seq, v in rows:
        expected[k] = v  # later row overwrites — reference semantics
    assert got == expected


@given(BATCH)
@SLOW
def test_top_shingle_matches_counter_model(spark, batch):
    from collections import Counter

    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.text import (
        top_repeated_shingle,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(batch)], "i long, t string"
    )
    got = {
        r.i: (r.m.bestg, r.m.best)
        for r in df.select(
            "i",
            top_repeated_shingle(
                F.array_sort(word_shingles(tokens(F.col("t")), 2))
            ).alias("m"),
        ).collect()
    }
    for i, s in enumerate(batch):
        toks = _py_tokens(s)
        grams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        if not grams:
            assert got[i] == ("", 0), s
            continue
        c = Counter(grams)
        best = max(c.values())
        # tie-break: lexicographically smallest gram with the max count
        bestg = min(g for g, n in c.items() if n == best)
        assert got[i] == (bestg, best), (s, got[i], (bestg, best))


@given(
    st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=60,
    )
)
@SLOW
def test_zorder_key_is_bijective(spark, pts):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.layout import (
        zorder_key,
    )

    df = spark.createDataFrame(list(set(pts)), "x long, y long")
    rows = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    ).collect()

    def deinterleave(z):
        x = y = 0
        for i in range(16):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    for r in rows:
        assert deinterleave(r.z) == (r.x, r.y)
    # distinct inputs -> distinct keys
    assert len({r.z for r in rows}) == len(rows)


# random sparse digraphs as edge lists over a small node universe
EDGE = st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(
    lambda e: e[0] != e[1]
)
GRAPH = st.lists(EDGE, min_size=1, max_size=30, unique=True)


def _py_bfs(edges: list[tuple[int, int]], src: int, cap: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    dist = {src: 0}
    frontier = [src]
    for hop in range(1, cap + 1):
        nxt = sorted(
            {d for n in frontier for d in adj.get(n, ()) if d not in dist}
        )
        if not nxt:
            break
        for n in nxt:
            dist[n] = hop
        frontier = nxt
    return dist


@given(GRAPH)
@SLOW
def test_bfs_matches_python_model(spark, graph):
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.advanced import (
        bfs_hops,
    )

    edges = spark.createDataFrame(graph, "src long, dst long")
    got = {r.node: r.dist for r in bfs_hops(edges, 1, max_hops=6).collect()}
    assert got == _py_bfs(graph, 1, cap=6)
