"""Round-5 surface: the md5-derived oracle-mode hash family
(MinHash/SimHash), the replayable trained-IVF codebook, and the
bucketed incremental-dedup index probe plan (VERDICT.md r4 next-round
#2-#4, #8)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from map_reduce_c_sharp_simulation_multithreaded_spark.plans import registry


def test_md5hash60_matches_duckdb(spark):
    """The oracle-mode hash family's whole premise: Spark's
    conv(substr(md5(x),1,15),16,10) and the oracles' portable DuckDB
    hex-polynomial decode agree bit-for-bit (also cross-checked
    against the terse '0x' cast on the local DuckDB)."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        md5hash60,
    )
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.dedup import (
        _md5hash60_sql,
    )

    samples = ["hello", "", "a b c", "ünïcode", "the quick brown fox", "123"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: r["h"] for r in df.select("s", md5hash60(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    poly = _md5hash60_sql("md5(?)")
    for s in samples:
        (want,) = con.execute(f"SELECT {poly}", [s]).fetchone()
        (want2,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()
        assert got[s] == want == want2, s
    con.close()


def test_minhash_md5_mode_finds_planted_pair(spark):
    """The oracle-mode family preserves the pipeline semantics the
    production (xxhash64) family is pinned to: exact dup at
    jaccard_e4=10000, near dup above threshold, no false positives."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "bank every single morning before the sun rises over the hills"
    )
    near = base.replace("quiet river", "silent river")
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, "completely different text "
         "about distributed query engines and shuffle partitioning at scale")],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.jaccard_e4
        for r in minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=0.5, hash_mode="md5", scaled=True
        ).collect()
    }
    assert pairs[(1, 2)] == 10000
    assert (1, 3) in pairs and pairs[(1, 3)] >= 5000
    assert all(4 not in p for p in pairs)


def test_simhash_md5_mode_band_pairs_equal_brute_force(spark, sf_dir):
    """Pigeonhole recall holds for the 60-bit oracle-mode signature
    exactly as for the 64-bit production one: 4×15-bit banded join +
    hamming verify == all-pairs hamming<=3."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.catalog import load_table
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        hamming64,
        simhash64,
        simhash_band_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    banded = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_band_pairs(
            d, "doc_id", "text", 3, 4, hash_mode="md5"
        ).collect()
    }
    sig = simhash64(d, "doc_id", "text", hash_mode="md5")
    a = sig.select(F.col("doc_id").alias("ia"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("ib"), F.col("simhash").alias("sb"))
    brute = {
        (r.ia, r.ib): r.h
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .select("ia", "ib", hamming64(F.col("sa"), F.col("sb")).alias("h"))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute
    assert len(brute) > 0


def test_trained_codebook_replay_matches_spark(spark, sf_dir):
    """The generated trained-IVF oracle stands on this: k-means in
    replayable mode (id-derived seeds + 1e-6 sum grid) is a
    deterministic function of the data, and the pure-Python replay
    reproduces the Spark-trained codebook EXACTLY (same floats)."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.catalog import load_table
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.similarity import (
        replay_kmeans_codebook,
        train_kmeans_codebook,
    )

    e = load_table(spark, sf_dir, "embeddings")
    spark_cents = train_kmeans_codebook(
        e, "embedding", n_centroids=8, n_iter=3, dim=64,
        id_col="vec_id", sum_quantize=1e-6,
    )
    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    replay_cents = replay_kmeans_codebook(
        rows, n_centroids=8, n_iter=3, sum_quantize=1e-6
    )
    assert spark_cents == replay_cents


def test_incremental_index_probe_avoids_index_shuffle(spark, sf_dir):
    """The persisted fingerprint index is bucketed by fp, so the
    nightly probe SMJ shuffles ONLY the batch side (one Exchange on
    fp, to the index's bucket count) — the 100 TB story where the
    historical side never moves (VERDICT.md r4 next-round #8)."""
    q = registry.all_queries()["dedup_incremental_index"]
    df = q.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning(fp") == 1
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan


def test_source_quota_caps_and_is_deterministic(spark, tmp_path):
    """A 40-doc source keeps exactly 15 (hash-ordered), a 10-doc source
    keeps all 10, and the kept set is rerun-stable."""
    sf = tmp_path / "sf_quota"
    sf.mkdir()
    rows = [(i, f"text {i}", "en", "big" if i < 40 else "small", 6)
            for i in range(50)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    q = registry.all_queries()["dedup_source_quota"]
    out1 = {(r.doc_id): (r.source, r.quota_rank, r.kept)
            for r in q.fn(spark, str(sf)).collect()}
    out2 = {(r.doc_id): (r.source, r.quota_rank, r.kept)
            for r in q.fn(spark, str(sf)).collect()}
    assert out1 == out2
    big_kept = [d for d, (s, _, k) in out1.items() if s == "big" and k == 1]
    small_kept = [d for d, (s, _, k) in out1.items() if s == "small" and k == 1]
    assert len(big_kept) == 15 and len(small_kept) == 10
    ranks = sorted(r for _, (s, r, _) in out1.items() if s == "big")
    assert ranks == list(range(1, 41))


def test_mix_weights_are_sqrt_of_token_mass(spark, tmp_path):
    """weight == round(sqrt(total tokens), 6) per (source, lang) —
    small sources get super-proportional weight (the α=0.5 point)."""
    import math

    sf = tmp_path / "sf_mix"
    sf.mkdir()
    rows = [(i, "a b c d", "en", "s_big", 7) for i in range(16)]
    rows += [(100 + i, "a b c d", "de", "s_small", 7) for i in range(4)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    q = registry.all_queries()["curation_mix_weights"]
    out = {(r.source, r.lang): r for r in q.fn(spark, str(sf)).collect()}
    big, small = out[("s_big", "en")], out[("s_small", "de")]
    assert (big.n_docs, big.total_toks) == (16, 64)
    assert (small.n_docs, small.total_toks) == (4, 16)
    assert big.mix_weight == round(math.sqrt(64), 6) == 8.0
    assert small.mix_weight == 4.0
    # 4x the tokens -> only 2x the weight: small sources up-weighted
    assert big.mix_weight / small.mix_weight == 2.0


def test_md5hash60_matches_duckdb_batch(spark):
    """200 generated strings (ascii, unicode, whitespace-heavy, long)
    through both engines' hash in one batch — the 6-sample pin above,
    widened to the shapes real tokens/shingles take."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.dedup import (
        md5hash60,
    )
    from map_reduce_c_sharp_simulation_multithreaded_spark.plans.dedup import (
        _md5hash60_sql,
    )

    samples = []
    for i in range(200):
        base = f"tok{i} " * (i % 7 + 1)
        if i % 3 == 1:
            base += "ümläut ßtraße 文字"
        if i % 5 == 2:
            base = f"  {base}\t{i}  "
        samples.append(base)
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = dict(
        (r["s"], r["h"])
        for r in df.select("s", md5hash60(F.col("s")).alias("h")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS s", [samples])
    poly = _md5hash60_sql("md5(s)")
    want = dict(con.execute(f"SELECT s, {poly} FROM t").fetchall())
    con.close()
    assert got == want


def test_replay_handles_fewer_vectors_than_centroids():
    """A 3-vector corpus with k=8 must yield 3 cells, not crash —
    mirrors the trainer's limit(k) behavior."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.similarity import (
        replay_kmeans_codebook,
    )

    rows = [(i, [float(i + j) for j in range(4)]) for i in range(3)]
    cents = replay_kmeans_codebook(rows, n_centroids=8, n_iter=2)
    assert len(cents) == 3 and all(len(c) == 4 for c in cents)
    assert replay_kmeans_codebook([], n_centroids=8) == []


def test_winnow_and_char_ngrams_match_naive_reference(spark):
    """Regression pin for the round-5 split-once rewrites: winnow_fps
    and char_ngrams replaced per-position substr walks (O(len^2) per
    row) with one split into a char array. The outputs must stay
    bit-identical to the straightforward definition, checked here
    against naive pure-Python references on adversarial strings
    (shorter than k, exactly k, repeats, punctuation, empty)."""
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.text import (
        char_ngrams,
        winnow_fps,
    )

    samples = [
        "",
        "ab",
        "abcd",
        "abcde",
        "aaaaaaaaaa",
        "the quick brown fox jumps over the lazy dog",
        "a b c d e f g h i j k l m n o p",
        "x" * 300,
        "Hello, World! 123 -- punct.",
    ]

    def naive_winnow(s, k=5, window=4):
        s = "".join(c for c in s if 0x20 <= ord(c) <= 0x7E)
        if len(s) < k:
            return []
        hs = [
            sum(ord(s[i + j]) * pow(257, j, 1000003) for j in range(k)) % 1000003
            for i in range(len(s) - k + 1)
        ]
        n_w = max(len(hs) - window + 1, 1)
        mins = [min(hs[i : i + window]) for i in range(n_w)]
        out, seen = [], set()
        for m in mins:
            if m not in seen:
                seen.add(m)
                out.append(m)
        return out

    def naive_ngrams(s, n=3):
        return [s[i : i + n] for i in range(len(s) - n + 1)] if len(s) >= n else []

    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i int, s string")
    rows = df.select(
        "i",
        winnow_fps(F.col("s")).alias("w"),
        char_ngrams(F.col("s")).alias("g"),
    ).collect()
    for r in rows:
        s = samples[r["i"]]
        assert r["w"] == naive_winnow(s), f"winnow mismatch on {s!r}"
        assert r["g"] == naive_ngrams(s), f"ngram mismatch on {s!r}"
