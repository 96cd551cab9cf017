"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point at 100 TB):
* exact dedup is a hash-groupBy — one shuffle on the hash, no driver
  state (unlike the reference's master-side merge dictionary,
  ``D/Program.cs:51``, the one anti-pattern not to copy);
* MinHash+LSH turns O(n²) near-dup search into
  shingle→signature→band→bucket-join — every step a bounded shuffle;
* SimHash gives a 64-bit per-doc signature (hamming-ball near-dup);
* all hashing is ``xxhash64`` (deterministic across runs/executors).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import _MEMO_CAP, tokens, word_shingles

# Mersenne prime 2^31-1: min-hash permutation modulus. Hashes are reduced
# below 2^31 before the permutation multiply so a*h+b stays well under
# 2^63 (Spark 4 runs ANSI mode: long overflow raises, it doesn't wrap).
_MERSENNE = (1 << 31) - 1


def md5hash60(col: Column) -> Column:
    """Engine-replayable 60-bit hash: first 15 md5 hex chars as a long.

    The ORACLE-MODE hash family (VERDICT.md r4 "What's missing" #1):
    ``xxhash64`` stays the production default — faster and 64-bit — but
    no non-Spark engine recomputes it, so queries that want a DuckDB
    differential oracle swap in this family. DuckDB replays it exactly
    (via the version-stable hex polynomial in ``plans.dedup.
    _md5hash60_sql``; equivalently ``('0x' || substr(md5(x), 1,
    15))::BIGINT`` on recent DuckDB — both pinned equal in pytest);
    15 hex chars = 60 bits keeps the value positive in a signed 64-bit
    long on both engines. Both engines hash the same utf-8 bytes, so
    values agree bit-for-bit.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _token_hash(col: Column, hash_mode: str) -> Column:
    if hash_mode == "md5":
        return md5hash60(col)
    assert hash_mode == "xxhash64", hash_mode
    return F.xxhash64(col)


def _sig_bits(hash_mode: str) -> int:
    """Signature width per hash family: 64 production bits, 60 in
    oracle mode (md5-derived hashes carry 60 usable bits)."""
    return 60 if hash_mode == "md5" else 64


def exact_dedup_keep_first(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact text; adds ``n_copies``.

    groupBy on the content hash (not the content — short shuffle keys),
    then rejoin is avoided by carrying min(id) and count in one agg.
    """
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("_h"))
        .groupBy("_h")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_h")
    )


def doc_shingle_sets(
    df: DataFrame, id_col: str, text_col: str, k: int = 3,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-doc DISTINCT shingle-hash SET as an array column.

    Shingling, hashing, and dedup are all per-row array expressions —
    zero shuffles. Docs too short for a single shingle are dropped
    (they cannot be shingle-near-dups, and at scale they would
    otherwise all collide into one degenerate LSH bucket).
    ``hash_mode="md5"`` selects the engine-replayable 60-bit family
    (see :func:`md5hash60`) so the whole pipeline gets a DuckDB oracle.
    """
    sh = word_shingles(tokens(F.col(text_col)), k)
    hashes = F.array_distinct(F.transform(sh, lambda s: _token_hash(s, hash_mode)))
    return df.select(F.col(id_col), hashes.alias("sh_set")).filter(
        F.size("sh_set") > 0
    )


def minhash_signatures(
    shingle_sets: DataFrame, id_col: str, num_hashes: int = 32
) -> DataFrame:
    """MinHash signature per doc: for permutation i, min over the
    shingle set of ``(a_i * h + b_i) mod M``.

    Computed as ``array_min(transform(...))`` per row — the whole
    signature matrix costs zero shuffles (the reference's entire
    pipeline philosophy — partition once, compute locally — taken to
    its limit).
    """
    # ONE data-driven expression instead of num_hashes unrolled columns:
    # the (a_i, b_i) permutation constants ride as two array literals and
    # a nested transform computes every signature position — same values
    # (a_i = 2i+1 odd multiplier, b_i = 104729(i+1) spread offset), but
    # O(1) py4j round-trips and loopy generated code (the similarity.py
    # codebook discipline; the 32-column form cost ~0.4 s of driver-side
    # plan build per query at sf0.1)
    a_lit = F.expr(
        "array(" + ",".join(str(2 * i + 1) + "L" for i in range(num_hashes)) + ")"
    )
    b_lit = F.expr(
        "array("
        + ",".join(str(104729 * (i + 1)) + "L" for i in range(num_hashes))
        + ")"
    )
    sig = F.zip_with(
        a_lit,
        b_lit,
        lambda a, b: F.array_min(
            F.transform(
                "sh_set",
                lambda h: F.pmod(F.pmod(h, F.lit(_MERSENNE)) * a + b, F.lit(_MERSENNE)),
            )
        ),
    )
    return shingle_sets.select(F.col(id_col), F.col("sh_set"), sig.alias("sig"))


def lsh_banded(
    signatures: DataFrame, id_col: str, bands: int = 8, rows: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Banded LSH keys, one row per (doc, band): ``(id, band_id, bh)``.

    The shared banding stage under both the self-join candidate
    generator (:func:`lsh_candidate_pairs`) and the bipartite
    train×eval decontamination join (plans.mlprep.
    contamination_fuzzy_minhash). In oracle mode the band key is the
    comma-joined slice itself (exact, engine-replayable); production
    hashes the slice with xxhash64 so shuffle keys stay 8 bytes.
    """

    def band_key(slice_col: Column) -> Column:
        if hash_mode == "md5":
            return F.concat_ws(
                ",", F.transform(slice_col, lambda v: v.cast("string"))
            )
        return F.xxhash64(slice_col)

    # band b's key over its contiguous signature slice — data-driven
    # over the sig array (see minhash_signatures)
    bands_expr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            band_key(F.slice(F.col("sig"), b * rows + 1, rows)).alias("bh"),
        ),
    )
    return signatures.select(
        F.col(id_col), F.explode(bands_expr).alias("band")
    ).select(id_col, "band.band_id", "band.bh")


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, bands: int = 8, rows: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Band the signature and self-join per (band, band_hash) bucket.

    Docs agreeing on all ``rows`` values of any band become a candidate
    pair; the join key is (band_id, hash of the band slice) so bucket
    size — not n² — bounds the work.
    """
    banded = lsh_banded(signatures, id_col, bands, rows, hash_mode)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def exact_jaccard(
    pairs: DataFrame, shingle_sets: DataFrame, id_col: str,
    scaled: bool = False,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification step).

    Two equi joins pull each side's shingle-hash ARRAY onto the pair
    row, then intersection/union are per-row array expressions — no
    per-shingle shuffle, work proportional to candidate pairs only.

    ``scaled=True`` emits integer ``jaccard_e4 = n_inter*10000 DIV
    n_union`` instead of a rounded double: n_union is frequently a
    power of two, so ROUND(n_inter/n_union, 4) lands on exact .5 ties
    (1/32 = 0.03125) where engine rounding modes diverge — integer
    floor division cannot tie (the dedup_ngram_jaccard_adjacent
    lesson, applied here for the oracle-backed query).
    """
    sa = shingle_sets.select(F.col(id_col).alias("id_a"), F.col("sh_set").alias("_sa"))
    sb = shingle_sets.select(F.col(id_col).alias("id_b"), F.col("sh_set").alias("_sb"))
    n_inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    n_union = F.size("_sa") + F.size("_sb") - n_inter
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    if scaled:
        return joined.select(
            "id_a",
            "id_b",
            n_inter.alias("n_inter"),
            n_union.alias("n_union"),
        ).select(
            "id_a",
            "id_b",
            F.expr("n_inter * 10000L DIV n_union").alias("jaccard_e4"),
        )
    return joined.select(
        "id_a",
        "id_b",
        F.round(n_inter.cast("double") / n_union, 4).alias("jaccard"),
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
    scaled: bool = False,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH buckets →
    candidate pairs → exact-Jaccard verify → threshold filter.

    Shuffle budget: signatures are shuffle-free; the band self-join and
    the two pair joins are the only exchanges, each keyed on bounded
    data (band buckets / candidate pairs) — the property that holds at
    100 TB where per-shingle shuffles would not.

    The shingle sets and signatures are persisted: each feeds 2+ plan
    branches (both sides of the self-join, both jaccard probes) and the
    shingling expressions are the expensive part — recomputing them per
    branch dominated runtime before caching. At cluster scale the same
    persist would go to MEMORY_AND_DISK serialized.
    """
    sets_df = doc_shingle_sets(df, id_col, text_col, shingle_k, hash_mode).cache()
    sig = minhash_signatures(sets_df.select(id_col, "sh_set"), id_col, num_hashes)
    sig = sig.drop("sh_set").cache()
    cand = lsh_candidate_pairs(
        sig, id_col, bands, num_hashes // bands, hash_mode
    )
    verified = exact_jaccard(cand, sets_df, id_col, scaled=scaled)
    if scaled:
        # floor(10000·j) >= 10000·t  <=>  j >= t when 10000·t is integer
        return verified.filter(
            F.col("jaccard_e4") >= int(round(threshold * 10000))
        )
    return verified.filter(F.col("jaccard") >= threshold)


def jaccard_prefix_join_pairs(
    sets_df: DataFrame,
    id_col: str,
    set_col: str,
    threshold_e4: int,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    AllPairs/PPJoin candidate scheme — Bayardo et al. WWW'07, Xiao et
    al. WWW'08): all pairs with Jaccard(set_a, set_b) ≥ t, where
    t = threshold_e4/10000, with NO approximation — the deterministic
    complement to MinHash-LSH (probabilistic recall) over the same
    shingle-set kernel.

    How it prunes: order every set by GLOBAL element rarity (document
    frequency asc, element asc — one corpus-wide count, broadcast-sized
    vocabulary join) and emit only each set's PREFIX, the first
    ``n − ceil(t·n) + 1`` elements. Two sets with Jaccard ≥ t must
    share an element inside both prefixes (pigeonhole on the α-th
    largest common element, α = ceil(t·n) ≤ true minimum overlap), so
    the equi-join on prefix elements loses nothing, while the
    rarest-first order makes join buckets tiny: frequent elements —
    the quadratic blowup in a naive element join — land in the suffix
    and never generate candidates. Candidate volume is Σ_prefix df²,
    not n²; a length-ratio filter (min ≥ t·max, implied by J ≥ t)
    prunes inside the join. Before verification, PPJoin's POSITIONAL
    filter runs per candidate pair: the first shared token in the
    global order is the first in BOTH sorted sequences (a common
    token ordered before it would itself be a prefix match on both
    sides), so with 1-based positions (i, j) of that first match,
    overlap ≤ 1 + min(n_a − i, n_b − j); pairs whose bound misses the
    required overlap α = ceil(t/(1+t)·(n_a+n_b)) drop before paying
    the array intersection. Verification is :func:`exact_jaccard`-
    style per-row array intersection over the surviving pairs only
    (measured at sf0.1: 12.5M all-pairs → 193,340 prefix candidates
    → 68,725 positional survivors → 256 qualifying pairs).

    All thresholds are integer arithmetic (ceil(t·n) =
    (threshold_e4·n + 9999) DIV 10000; the keep test is
    n_inter·10000 ≥ threshold_e4·n_union), so an oracle replays the
    decision boundary exactly — no float threshold ties.

    Returns (id_a, id_b, n_a, n_b, n_inter, n_union, jaccard_e4) with
    id_a < id_b, all counts BIGINT, jaccard_e4 = n_inter·10000 DIV
    n_union (the integer-scaled discipline of :func:`exact_jaccard`).
    """
    sets = sets_df.select(
        F.col(id_col).alias("_id"),
        F.col(set_col).alias("_s"),
        F.size(set_col).cast("long").alias("_n"),
    ).filter(F.col("_n") > 0).cache()
    occ = sets.select("_id", "_n", F.explode("_s").alias("_g"))
    dfreq = occ.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    # rarest-first total order = (df asc, element asc); sort_array on
    # the struct sorts field-lexicographically, per-row, no shuffle
    ordered = occ.join(dfreq, "_g").groupBy("_id", "_n").agg(
        F.sort_array(F.collect_list(F.struct("_df", "_g"))).alias("_ord")
    )
    prefix = (
        ordered.select(
            "_id",
            "_n",
            F.posexplode(
                F.expr(
                    "slice(_ord, 1, CAST(_n - "
                    f"(({threshold_e4}L * _n + 9999) DIV 10000) + 1 AS INT))"
                )
            ).alias("_pos0", "_p"),
        )
        # 1-based position of the element in the set's rarity order
        .select(
            "_id", "_n", (F.col("_pos0") + 1).alias("_i"),
            F.col("_p._g").alias("_g"),
        )
        # both sides of the candidate self-join read this frame;
        # uncached the tokenize→df-join→sort pipeline runs twice
        .cache()
    )
    a = prefix.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("n_a"),
        F.col("_i").alias("_ia"), "_g",
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), F.col("_n").alias("n_b"),
        F.col("_i").alias("_ib"), "_g",
    )
    # required overlap if J >= t: inter >= t/(1+t) · (n_a + n_b)
    alpha = F.expr(
        f"({threshold_e4}L * (n_a + n_b) + {10000 + threshold_e4 - 1}) "
        f"DIV {10000 + threshold_e4}"
    )
    cand = (
        a.join(b, "_g")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("n_a", "n_b") * 10000
                >= F.greatest("n_a", "n_b") * F.lit(threshold_e4)
            )
        )
        # one row per pair (the distinct-dedup the naive scheme needs
        # anyway, upgraded to carry PPJoin's positional bound): the
        # FIRST shared token in the global order is first in BOTH
        # rarity-sorted sequences, so min(_ia)/min(_ib) name the same
        # token and overlap <= 1 + min(n_a - i, n_b - j)
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.min("_ia").alias("_fi"), F.min("_ib").alias("_fj"))
        .filter(
            F.lit(1)
            + F.least(F.col("n_a") - F.col("_fi"), F.col("n_b") - F.col("_fj"))
            >= alpha
        )
        .select("id_a", "id_b")
    )
    sa = sets.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("_sa"),
        F.col("_n").alias("n_a"),
    )
    sb = sets.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("_sb"),
        F.col("_n").alias("n_b"),
    )
    n_inter = F.size(F.array_intersect("_sa", "_sb")).cast("long")
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", "n_a", "n_b", n_inter.alias("n_inter"),
        )
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .filter(F.col("n_inter") * 10000 >= F.lit(threshold_e4) * F.col("n_union"))
    )
    return verified.select(
        "id_a",
        "id_b",
        "n_a",
        "n_b",
        "n_inter",
        "n_union",
        F.expr("n_inter * 10000L DIV n_union").alias("jaccard_e4"),
    )


def _simhash_md5_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) for the md5 oracle mode, vectorized (r14, guide
    §4.2): token arrays are produced by the JVM ``tokens()`` (no
    tokenizer-semantics risk) and cross to Python unchanged; per doc,
    each token occurrence's :func:`md5hash60` (hashlib.md5 reproduces
    it bit-for-bit, memoized — vocabularies are tiny next to token
    counts) votes ±1 per bit, and the sign bits reassemble into the
    identical long the 60-way aggregate computed. Docs with zero
    tokens emit no row, exactly like the explode+groupBy form."""
    import hashlib

    from pyspark.sql.types import LongType, StructField, StructType

    src = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_tk")
    )
    schema = StructType(
        [
            StructField(id_col, src.schema["_id"].dataType, True),
            StructField("simhash", LongType(), False),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        # BOUNDED per-task memo (ADVICE r14): distinct tokens grow
        # with partition text volume, so an uncapped dict has no
        # ceiling on a 100 TB-scale task over adversarial vocabulary.
        # md5 of a short string is cheap — on overflow just reset and
        # keep the Zipf head hot again within one batch.
        memo: dict[str, int] = {}

        def h60(t: str) -> int:
            v = memo.get(t)
            if v is None:
                if len(memo) >= _MEMO_CAP:
                    memo.clear()
                v = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                memo[t] = v
            return v

        bit_idx = np.arange(60, dtype=np.uint64)
        for batch in batches:
            ids = batch.column(0)
            tks = batch.column(1).to_pylist()
            idx: list[int] = []
            sims: list[int] = []
            for i, tk in enumerate(tks):
                if not tk:
                    continue
                hs = np.fromiter(
                    (h60(t) for t in tk), np.uint64, len(tk)
                )
                bits = (hs[:, None] >> bit_idx) & np.uint64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                sim = int(((votes > 0).astype(np.uint64) << bit_idx).sum())
                idx.append(i)
                sims.append(sim)
            if not idx:
                continue
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(idx)), pa.array(sims, pa.int64())],
                names=[id_col, "simhash"],
            )

    return src.mapInArrow(run, schema)


def simhash64(
    df: DataFrame, id_col: str, text_col: str, hash_mode: str = "xxhash64"
) -> DataFrame:
    """SimHash per doc: per-token hash, majority vote per bit.

    One explode + one n_bits-way aggregation (sums of ±1 per bit), then
    the sign bits reassemble into a long — two shuffles total, no
    row-wise UDFs. Production signatures are 64-bit xxhash64;
    ``hash_mode="md5"`` switches to the 60-bit engine-replayable family
    (:func:`md5hash60`) so the signature query carries a full DuckDB
    oracle — and, since r14, runs the vectorized
    :func:`_simhash_md5_rows` path (identical longs: hashlib.md5
    reproduces md5hash60, the vote is the same ±1 sum)."""
    if hash_mode == "md5":
        return _simhash_md5_rows(df, id_col, text_col)
    n_bits = _sig_bits(hash_mode)
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    ).select(id_col, _token_hash(F.col("_t"), hash_mode).alias("_h"))
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                # shift-right+mask instead of a 1<<i mask literal: 1<<63
                # does not fit a signed long
                F.when(
                    F.shiftrightunsigned(F.col("_h"), i).bitwiseAND(F.lit(1)) != 0,
                    1,
                ).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(n_bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(n_bits):
        # bit 63 of a signed long is the sign bit: its set-value is -2^63
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(bit_val).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bit_sums.select(F.col(id_col), sim.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_band_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """SimHash near-duplicate PAIRS via pigeonhole banding: split the
    64-bit signature into ``n_bands`` equal bands; two signatures
    within ``max_hamming`` bit flips (< n_bands) must agree exactly on
    at least one band, so a self-join keyed on (band_id, band_value)
    finds every such pair with 100% recall — candidate generation is a
    bucketed equi-join, never an all-pairs scan. Candidates are then
    verified with the exact hamming distance (precision filter).

    The LSH-for-hamming-space analogue of the MinHash band join: at
    100 TB the join fans out n_bands rows per doc and bucket occupancy
    bounds the pair work; skewed buckets (common band values) split
    under AQE like any hot join key.

    The signature frame is persisted: both sides of the self-join
    derive from it, and unpersisted the whole tokenize→hash→60-way
    vote pipeline plans and runs TWICE (measured: the join costs 2.1 s
    over the 0.26 s signature pass at sf0.1, almost all duplicated
    signature work). Same branch-reuse discipline as minhash.
    """
    assert n_bands > max_hamming, "pigeonhole needs bands > max_hamming"
    width = _sig_bits(hash_mode) // n_bands
    sig = simhash64(df, id_col, text_col, hash_mode).cache()
    bands = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), j * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bv"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("s"),
    ).select(id_col, "simhash", F.col("s.band").alias("band"), F.col("s.bv").alias("bv"))
    a = bands.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("sig_a"),
        "band",
        "bv",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sig_b"),
        "band",
        "bv",
    )
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = hamming64(F.col("sig_a"), F.col("sig_b"))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def exact_substr_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    verify: bool = True,
) -> DataFrame:
    """EXACT sub-document duplicate-span detection at suffix
    granularity — the ExactSubstr semantics of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"):
    every maximal character span whose every ``min_len``-window occurs
    at least twice in the corpus (any doc, any position — within-doc
    repeats count, as in the paper). Completes the dedup family past
    ``dedup_span_windows``'s fixed non-overlapping windows: a repeated
    passage is found at ANY alignment, not only on 10-token
    boundaries.

    Why not the paper's suffix array: a global suffix sort is a
    single-machine construction (their impl memory-maps the whole
    corpus). The distributed equivalent of "two suffixes share a
    length-L prefix" is "two positions start the same L-gram", so the
    Spark-first plan is a gram-keyed shuffle — the same decomposition
    every step of the dedup family already uses:

    1. PRUNE — one projection computes ``xxhash64`` (the production
       hash family) of each position's L-gram, built as
       ``array_join(slice(chars, i, L))`` over a char array bound once
       per row: O(L) compiled work and 3 interpreted HOF node-evals
       per position, never the O(len²) dynamic-position ``substr``
       walk (the winnow_fps lesson — a substr form is ~1.4× faster on
       this corpus's 300-char docs but quadratic on the 10–100 KB
       documents a real corpus has; measured, see PLANS.md). A
       polynomial weighted-sum form with NO gram materialization was
       also measured and rejected: 100 interpreted node-evals per
       position made the whole query 10.5 s warm vs ~4 s for this
       shape (and hashing the sliced char array directly, without
       array_join, shaved a further ~1.6 s — the adopted form).
       "Occurs ≥ 2" is a ``groupBy(_h).count().filter(≥2)`` followed
       by a left-semi join of positions against the duplicated-hash
       set — NOT a window over the hash: partial aggregation combines
       a hot gram (boilerplate, whitespace runs — exactly what this
       operator exists to find at 100 TB) to one row per map
       partition, so the only full-width shuffle key is the semi
       join's, which AQE can skew-split — or eliminate outright by
       broadcasting the (small-tail) duplicated-hash set, in which
       case positions reach the verify stage with ZERO shuffle. The
       8-byte hash key is ~L× less shuffle volume than shipping
       literal grams either way. False candidates need a 64-bit
       collision: ~(n²/2)/2^64 ≈ 3·10⁸ expected at 10¹⁴ positions
       (100 TB) — 0.0003 % over-candidacy, each over-marking one
       L-char span until the verify stage drops it.
    2. VERIFY (``verify=True``, the default contract) — candidate
       positions regroup per doc (they are a small fraction — 9 % on
       the synthetic corpus, exactly the near-dup tail on a real one),
       join back to the text on the id key, re-derive the LITERAL
       gram for candidate positions only (slice of a once-bound char
       array, O(min_len) each), and the same groupBy + left-semi
       shape keeps positions whose literal gram occurs ≥ 2 times
       (a gram hot enough to survive the prune is exactly the key a
       window would straggle on). Any truly
       duplicated gram has all its occurrences in the candidate set
       (equal grams ⇒ equal hashes), so verification over candidates
       alone is LOSSLESS — the PPJoin prune-then-verify contract, and
       the same reason its brute-force-equality property test applies
       here. At 100 TB the verify join is one id-keyed shuffle of the
       corpus; prune-only mode (``verify=False``) trades that shuffle
       for the ~10⁻⁵ over-marking bound above.
    3. MERGE — per doc, duplicated positions p cover [p, p+L−1];
       gap-and-island with a lag/running-sum window (all intervals
       share length L, so "new island iff p − prev_p > L" needs no
       running max). One doc-keyed shuffle, trivially parallel.

    Returns (doc_id, dup_start, dup_end, span_len, n_windows) with
    1-based inclusive character positions — the regions the paper's
    method would cut.
    """
    L = min_len
    pos = _hashed_gram_positions(df, id_col, text_col, L)
    # "occurs >= 2" via groupBy + left-semi, NOT a Window over the
    # hash: a hot 50-char gram (license boilerplate, whitespace runs)
    # is ONE key — a window puts every occurrence in one task with no
    # combiner and no AQE relief, while HashAggregate(partial)
    # collapses it to one row per map partition before the (tiny,
    # distinct-hash-sized) shuffle, and the semi join back is
    # AQE-skew-splittable — and typically a broadcast, since
    # duplicated hashes are the small tail, in which case positions
    # never shuffle at all before the island merge.
    dup_h = pos.groupBy("_h").count().filter(F.col("count") >= 2).select("_h")
    cand = pos.join(dup_h, "_h", "left_semi").select("_id", "_p")

    if verify:
        with_grams = _candidate_literal_grams(df, cand, id_col, text_col, L)
        # same hot-key argument as the prune stage: a boilerplate
        # gram that survives the prune is exactly the key that would
        # straggle a Window; partial-agg + semi-join keeps it
        # combiner-friendly and AQE-splittable
        dup_g = (
            with_grams.groupBy("_g")
            .count()
            .filter(F.col("count") >= 2)
            .select("_g")
        )
        dup = with_grams.join(dup_g, "_g", "left_semi").select("_id", "_p")
    else:
        dup = cand

    return _span_islands(dup, L).select(
        F.col("_id").alias(id_col),
        F.col("span_start").alias("dup_start"),
        F.col("span_end").alias("dup_end"),
        "span_len",
        "n_windows",
    )


# Rolling-hash family for gram-position pruning. Any deterministic
# hash is RESULT-INVARIANT here: every consumer either literal-verifies
# the candidate tail (``verify=True`` default, contamination's matched-
# tail equality join) or tolerates the documented 64-bit collision
# bound, and equal grams hash equal under any function — so the prune
# hash is a pure performance knob. The base is an odd multiplier
# (invertible mod 2^64) whose prefix form makes every window hash
# computable from two prefix-sum lookups; a splitmix64 finalizer
# (bijective, so equality semantics are untouched) spreads the linear
# form over the full 64 bits.
_GRAM_B = 0x9E3779B97F4A7C15
_GRAM_BINV = pow(_GRAM_B, -1, 1 << 64)  # modular inverse mod 2^64


def _splitmix64_np(z):
    """splitmix64 finalizer over a ``numpy.uint64`` array (bijective)."""
    import numpy as np

    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _prefix_window_hashes(texts: list, L: int):
    """Vectorized window hashes for a BATCH of texts in one numpy pass.

    All texts concatenate into a single code-point array (utf-32-le —
    one code point per character, so positions stay CHARACTER
    positions); with P[k] = Σ_{j<k} cp[j]·Binv^j (mod 2^64), the hash
    of the L-window starting at global index i is
    (P[i+L] − P[i])·B^i = Σ_t cp[i+t]·Binv^t — a value that depends
    only on the window's own code points, so document boundaries need
    no per-doc restart; windows crossing a boundary are simply not
    emitted. uint64 arithmetic wraps mod 2^64 natively in numpy.

    Returns (row_idx, local_p0, hashes) numpy arrays: source row index
    per emitted window, 0-based position within its text, finalized
    uint64 hash.
    """
    import numpy as np

    lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    total = int(lens.sum())
    empty = (np.empty(0, np.int64),) * 2 + (np.empty(0, np.uint64),)
    if total == 0:
        return empty
    cps = np.frombuffer(
        "".join(texts).encode("utf-32-le"), dtype="<u4"
    ).astype(np.uint64)
    with np.errstate(over="ignore"):
        pinv = np.empty(total, np.uint64)
        pinv[0] = 1
        pw = np.empty(total, np.uint64)
        pw[0] = 1
        if total > 1:
            np.multiply.accumulate(
                np.full(total - 1, np.uint64(_GRAM_BINV)), out=pinv[1:]
            )
            np.multiply.accumulate(
                np.full(total - 1, np.uint64(_GRAM_B)), out=pw[1:]
            )
        P = np.zeros(total + 1, np.uint64)
        np.cumsum(cps * pinv, out=P[1:])
        npos = np.maximum(lens - (L - 1), 0)
        if int(npos.sum()) == 0:
            return empty
        offs = np.concatenate(([0], np.cumsum(lens)))
        row_idx = np.repeat(np.arange(len(texts)), npos)
        local_p0 = np.concatenate([np.arange(k) for k in npos if k > 0])
        gidx = offs[row_idx] + local_p0
        raw = (P[gidx + L] - P[gidx]) * pw[gidx]
        return row_idx, local_p0, _splitmix64_np(raw)


def _rolling_hash_batches(min_len: int):
    """mapInArrow body: (_id, _text) batches → (_id, _p, _h) rows, one
    :func:`_prefix_window_hashes` pass per Arrow batch."""
    L = min_len

    def run(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            texts = ["" if t is None else t for t in batch.column(1).to_pylist()]
            row_idx, local_p0, hashes = _prefix_window_hashes(texts, L)
            if len(hashes) == 0:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(row_idx)),
                    pa.array(local_p0 + 1, pa.int64()),
                    pa.array(hashes.view(np.int64)),
                ],
                names=["_id", "_p", "_h"],
            )

    return run


def gram_hash(col: Column) -> Column:
    """Hash of a FULL string under the same rolling family
    :func:`_hashed_gram_positions` uses for windows — i.e. the value a
    window at position 1 spanning the whole string would get. Lets a
    literal gram frame (contamination's eval side) join against hashed
    window positions without a JVM re-implementation of the hash.
    Vectorized pandas UDF (ArrowEvalPython, never BatchEvalPython)."""

    @F.pandas_udf("long")
    def _hash_series(s: pd.Series) -> pd.Series:
        import numpy as np

        texts = ["" if t is None else t for t in s.tolist()]
        lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        out = np.zeros(len(texts), np.uint64)
        nonempty = [t for t in texts if t]
        if nonempty:
            # window length = each string's own length: emit exactly the
            # position-0 window per string by hashing each text with
            # L = len (one call per distinct length keeps it vectorized)
            import collections

            by_len = collections.defaultdict(list)
            for i, t in enumerate(texts):
                if t:
                    by_len[len(t)].append(i)
            for L, idxs in by_len.items():
                _, p0, hs = _prefix_window_hashes(
                    [texts[i] for i in idxs], L
                )
                # one window per string (the full-string one)
                out[np.asarray(idxs)] = hs
        return pd.Series(out.view(np.int64))

    return _hash_series(col)


def _hashed_gram_positions(
    df: DataFrame, id_col: str, text_col: str, min_len: int
) -> DataFrame:
    """(_id, _p, _h): 64-bit rolling hash of every position's
    ``min_len``-char gram, computed in ONE vectorized numpy pass per
    Arrow batch inside ``mapInArrow`` (guide §4.2 shape: Spark does
    distribution and shuffles, native vectorized code does the per-
    byte work). The previous JVM HOF form paid O(L) compiled work + 3
    interpreted node-evals per position (xxhash64 over a 50-element
    array slice); the prefix-sum rolling form pays O(1) amortized per
    position, and the hash swap is result-invariant because every
    consumer literal-verifies the candidate tail (see ``_GRAM_B``).
    Output schema matches the old form exactly: positions 1-based,
    null/short texts emit no rows, ``_h`` a signed 64-bit long."""
    from pyspark.sql.types import LongType, StructField, StructType

    src = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    )
    schema = StructType(
        [
            StructField("_id", src.schema["_id"].dataType, True),
            StructField("_p", LongType(), False),
            StructField("_h", LongType(), False),
        ]
    )
    return src.mapInArrow(_rolling_hash_batches(min_len), schema)


def _slice_gram_batches(min_len: int):
    """mapInArrow body: (_id, _text, _ps) batches → (_id, _p, _g) rows —
    one Python string slice per listed position. Candidates are the
    duplicated tail (a few % of positions), so the per-row loop touches
    little data; string slicing is code-point indexed in Python exactly
    like ``substring``'s character positions."""
    L = min_len

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            pss = batch.column(2).to_pylist()
            idx: list[int] = []
            ps_out: list[int] = []
            grams: list[str] = []
            for i, (t, ps) in enumerate(zip(texts, pss)):
                if t is None or not ps:
                    continue
                for p in ps:
                    idx.append(i)
                    ps_out.append(p)
                    grams.append(t[p - 1 : p - 1 + L])
            if not grams:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(idx)),
                    pa.array(ps_out, pa.int64()),
                    pa.array(grams, pa.string()),
                ],
                names=["_id", "_p", "_g"],
            )

    return run


def _gram_rows_schema(src: DataFrame):
    """Output schema for the literal-gram mapInArrow bodies: the input
    frame's ``_id`` type plus (position, gram)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("_id", src.schema["_id"].dataType, True),
            StructField("_p", LongType(), False),
            StructField("_g", StringType(), False),
        ]
    )


def _candidate_literal_grams(
    df: DataFrame,
    cand: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int,
) -> DataFrame:
    """(_id, _p, _g): the LITERAL ``min_len``-char gram at each
    candidate position, re-derived by regrouping candidates per doc
    (collect_list of positions — candidates are the duplicated tail,
    so the build side is small and broadcastable), joining back to the
    text on the id key, and slicing each listed position out of the
    document string in one vectorized ``mapInArrow`` pass (guide §4.2
    again — measured 6.9 s → 0.6 s warm at sf0.1 vs the interpreted
    HOF slice-and-join form, which paid ~50 interpreted node-evals per
    candidate). Document text crosses to Python once per doc, never
    per candidate row."""
    by_doc = cand.groupBy("_id").agg(
        F.sort_array(F.collect_list("_p")).alias("_ps")
    )
    txt = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    )
    src = by_doc.join(txt, "_id").select("_id", "_text", "_ps")
    return src.mapInArrow(
        _slice_gram_batches(min_len), _gram_rows_schema(src)
    )


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_col: str = "dup_start",
    end_col: str = "dup_end",
) -> DataFrame:
    """Substring surgery — the second half of the Lee et al. 2022
    ExactSubstr pipeline (their released tool's behavior: every
    occurrence of a duplicated span is removed, leaving zero copies):
    given (id, start, end) spans, emit each document's KEPT segments —
    the maximal character ranges outside every span.

    PRECONDITION (public contract, ADVICE r12): spans within one
    document must be pairwise DISJOINT AND NON-ADJACENT (a gap of at
    least one character between consecutive spans) — the complement
    zip below assumes it, and overlapping or touching spans would
    yield inverted or overlapping segments. ``_span_islands`` output
    (both ExactSubstr and contamination detectors) guarantees this by
    construction: islands merge any overlapping or adjacent covered
    intervals before they reach this operator. Callers supplying
    their own spans must pre-merge the same way rather than rely on a
    defensive in-row merge here — an O(n²) immutable-array fold per
    document inside the hot ExactSubstr pipeline, declined for the
    same measured-cost reason as the positional filter (SCALE.md).

    Segments are emitted as rows, NOT re-joined into one string:
    re-joining would form new grams across the cut seams, so the
    paper's invariant ("the deduplicated corpus contains no duplicated
    L-gram") would only hold approximately. Over segments it holds
    EXACTLY: a gram fully inside a kept segment sits at an unmarked
    position of the original corpus, i.e. occurred exactly once
    (property-pinned in tests/test_round12_properties.py).

    Scale shape: spans collapse per doc (collect_list — bounded by
    doc_len/min_len entries, each 16 B), then ONE id-keyed join back
    to the corpus; segment bounds come from zipping span ends with
    successor span starts inside the row (no window, no second
    shuffle), and each segment pays one O(doc_len) substr. Returns
    (id_col, seg_id, seg_start, seg_end, seg_len, seg_text),
    1-based inclusive positions, seg_id numbering kept segments in
    document order.
    """
    sp = spans.groupBy(F.col(id_col).alias("_id")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(start_col).cast("long").alias("s"),
                    F.col(end_col).cast("long").alias("e"),
                )
            )
        ).alias("_sps")
    )
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    )
    j = base.join(sp, "_id", "left").select(
        "_id",
        "_text",
        F.coalesce(
            "_sps", F.array().cast("array<struct<s:bigint,e:bigint>>")
        ).alias("_sps"),
    )
    # candidate segments: [1, s1-1], [e1+1, s2-1], ..., [ek+1, len];
    # islands are disjoint and non-adjacent, so only the head/tail
    # candidates can be empty — the filter drops them
    starts = F.concat(
        F.array(F.lit(1).cast("long")),
        F.transform(F.col("_sps"), lambda x: x["e"] + 1),
    )
    ends = F.concat(
        F.transform(F.col("_sps"), lambda x: x["s"] - 1),
        F.array(F.length("_text").cast("long")),
    )
    segs = F.filter(
        F.zip_with(
            starts, ends, lambda s, e: F.struct(s.alias("ss"), e.alias("se"))
        ),
        lambda st: st["se"] >= st["ss"],
    )
    return (
        j.select("_id", "_text", F.posexplode(segs).alias("_i", "_seg"))
        .select(
            F.col("_id").alias(id_col),
            (F.col("_i") + 1).cast("long").alias("seg_id"),
            F.col("_seg.ss").alias("seg_start"),
            F.col("_seg.se").alias("seg_end"),
            (F.col("_seg.se") - F.col("_seg.ss") + 1).alias("seg_len"),
            F.col("_text")
            .substr(
                F.col("_seg.ss").cast("int"),
                (F.col("_seg.se") - F.col("_seg.ss") + 1).cast("int"),
            )
            .alias("seg_text"),
        )
    )


def _span_islands(marked: DataFrame, min_len: int) -> DataFrame:
    """Merge marked window positions into maximal covered spans.

    ``marked`` is (_id, _p): position ``_p`` (1-based) covers the
    interval [_p, _p + min_len − 1]. All intervals share length
    ``min_len``, so sorted by start, a new island begins exactly when
    ``_p − prev > min_len`` — a lag suffices, no running max (the
    gap-and-island shape both span operators share). One id-keyed
    window shuffle over marked positions only.
    Returns (_id, span_start, span_end, span_len, n_windows)."""
    L = min_len
    by_pos = Window.partitionBy("_id").orderBy("_p")
    lagged = marked.withColumn("_pp", F.lag("_p").over(by_pos))
    grouped = lagged.withColumn(
        "_new",
        F.when(
            F.col("_pp").isNull() | (F.col("_p") - F.col("_pp") > L), 1
        ).otherwise(0),
    ).withColumn("_grp", F.sum("_new").over(by_pos))
    return (
        grouped.groupBy("_id", "_grp")
        .agg(
            F.min("_p").alias("span_start"),
            F.max("_p").alias("_pmax"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "_id",
            "span_start",
            (F.col("_pmax") + (L - 1)).alias("span_end"),
            (F.col("_pmax") + L - F.col("span_start")).alias("span_len"),
            "n_windows",
        )
    )


def _all_gram_batches(min_len: int):
    """mapInArrow body: (_id, _text) batches → (_id, _p, _g) rows with
    EVERY position's ``min_len``-char gram — Python string slices, one
    per window (used on the small eval side only)."""
    L = min_len

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            idx: list[int] = []
            ps: list[int] = []
            grams: list[str] = []
            for i, t in enumerate(texts):
                if t is None:
                    continue
                npos = len(t) - L + 1
                for p0 in range(npos):
                    idx.append(i)
                    ps.append(p0 + 1)
                    grams.append(t[p0 : p0 + L])
            if not grams:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(idx)),
                    pa.array(ps, pa.int64()),
                    pa.array(grams, pa.string()),
                ],
                names=["_id", "_p", "_g"],
            )

    return run


def _literal_gram_positions(
    df: DataFrame, id_col: str, text_col: str, min_len: int
) -> DataFrame:
    """(_id, _p, _g): every position's literal ``min_len``-char gram,
    sliced out of the document string in one vectorized ``mapInArrow``
    pass (same §4.2 shape as the hashed scan; the interpreted-HOF
    array_join(slice(...)) form paid ~L interpreted node-evals per
    position)."""
    src = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    )
    return src.mapInArrow(
        _all_gram_batches(min_len), _gram_rows_schema(src)
    )


def contamination_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
) -> DataFrame:
    """Span-level train/eval decontamination — ExactSubstr semantics
    applied BIPARTITE (the PaLM-report style substring-overlap audit):
    for each training document, the maximal character spans whose
    every ``min_len``-char window occurs verbatim anywhere in the
    eval suite. The third member of the contamination family: the
    13-gram audit flags whole documents, the MinHash pass catches
    fuzzy copies, this one localizes exactly WHICH characters leaked
    so a pipeline can cut the span instead of dropping the document.

    Scale shape — the fuzzy decontamination broadcast argument, taken
    further, with the prune→verify funnel applied BIPARTITE (r11
    verdict advice #4, adopted): the eval side reduces to its DISTINCT
    gram set (benchmark suites are MBs at any training scale), but the
    broadcast key is the 8-byte ``xxhash64`` of each gram's char
    array — NOT the 50-char literal (~58 B/row, 6–7× larger; measured
    build sizes in SCALE.md) — so the train side's positions stream
    through a map-side LEFT SEMI join with ZERO train-side shuffle.
    Exactness is then restored on the MATCHED TAIL only: candidate
    train positions regroup per doc and re-derive their literal grams
    (the :func:`exact_substr_spans` verify machinery), the eval gram
    set is cut down to the hashes that actually matched (a second
    tiny broadcast), and a literal-equality semi join keeps true
    contamination — lossless, because equal grams ⇒ equal hashes, so
    every truly contaminated position is a candidate; a 64-bit
    collision costs one over-candidate that the literal join then
    drops, never a wrong answer. The only shuffles in the plan are
    over MATCHED positions (contaminated tails only): the verify
    regroup and the island merge's id-keyed window.

    Recompute, documented (ADVICE r12): the ``cand`` subtree — the
    full train-side position scan + hash semi join — feeds BOTH the
    ``match_h`` broadcast build and the verify regroup, so the train
    scan runs twice per action, the same two-map-scans-for-no-shuffle
    trade adjudicated for :func:`exact_substr_spans` (SCALE.md): both
    evaluations are embarrassingly parallel map work with zero train-
    side shuffle, while the alternatives either blind the plan
    fingerprint (``localCheckpoint`` collapses the analyzed plan to a
    scan tail) or leak a cache this lazily-returned operator has no
    point to unpersist at. A pipeline that materializes the result
    anyway (e.g. writing the decontaminated corpus) pays the second
    scan once.

    Returns (id_col, span_start, span_end, span_len, n_windows),
    1-based inclusive character positions into the training doc.
    """
    L = min_len
    ev_h = (
        _hashed_gram_positions(eval_df, id_col, text_col, L)
        .select("_h")
        .distinct()
    )
    tr = _hashed_gram_positions(train, id_col, text_col, L)
    # prune: 8-byte hash broadcast, map-side semi join over every
    # train position — keep _h so the matched-hash set below needs no
    # recomputation of eval-side state
    cand = tr.join(F.broadcast(ev_h), "_h", "left_semi")
    # which eval grams actually matched? bounded by the contaminated
    # tail (⊆ distinct candidate hashes), so broadcastable by
    # construction
    match_h = cand.select("_h").distinct()
    ev_g = (
        _literal_gram_positions(eval_df, id_col, text_col, L)
        .select("_g")
        .distinct()
    )
    ev_g_matched = ev_g.join(
        F.broadcast(match_h),
        gram_hash(F.col("_g")) == F.col("_h"),
        "left_semi",
    )
    # verify: literal grams for candidate positions only, equality
    # against the matched eval grams — the broadcast carries literal
    # text only for the tail that hashed equal
    tr_g = _candidate_literal_grams(
        train, cand.select("_id", "_p"), id_col, text_col, L
    )
    hits = tr_g.join(F.broadcast(ev_g_matched), "_g", "left_semi").select(
        "_id", "_p"
    )
    return _span_islands(hits, min_len).select(
        F.col("_id").alias(id_col),
        "span_start",
        "span_end",
        "span_len",
        "n_windows",
    )
