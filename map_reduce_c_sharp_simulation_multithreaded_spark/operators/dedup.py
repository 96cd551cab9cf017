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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens, word_shingles

# Mersenne prime 2^31-1: min-hash permutation modulus. Hashes are reduced
# below 2^31 before the permutation multiply so a*h+b stays well under
# 2^63 (Spark 4 runs ANSI mode: long overflow raises, it doesn't wrap).
_MERSENNE = (1 << 31) - 1


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


def doc_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Distinct (id, shingle_hash) pairs from k-word shingles."""
    sh = word_shingles(tokens(F.col(text_col)), k)
    return (
        df.select(F.col(id_col), F.explode(sh).alias("_sh"))
        .select(id_col, F.xxhash64("_sh").alias("shingle_hash"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = 32
) -> DataFrame:
    """MinHash signature per doc: for permutation i, min over shingles of
    ``(a_i * h + b_i) mod M`` — one wide aggregation, single shuffle."""
    h = F.pmod(F.col("shingle_hash"), F.lit(_MERSENNE))
    aggs = []
    for i in range(num_hashes):
        a, b = 2 * i + 1, 104729 * (i + 1)  # odd multiplier, spread offset
        aggs.append(F.min(F.pmod(h * a + b, F.lit(_MERSENNE))).alias(f"mh_{i}"))
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, bands: int = 8, rows: int = 4
) -> DataFrame:
    """Band the signature and self-join per (band, band_hash) bucket.

    Docs agreeing on all ``rows`` values of any band become a candidate
    pair; the join key is (band_id, hash of the band slice) so bucket
    size — not n² — bounds the work.
    """
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.xxhash64(*cols).alias("bh"))
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_id", "band.bh")
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
    pairs: DataFrame, shingles: DataFrame, id_col: str
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification step).

    Two hash joins against the (id, shingle_hash) relation; intersection
    counted by matching hashes, union by inclusion-exclusion.
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "shingle_hash")
    sb = shingles.select(F.col(id_col).alias("id_b"), "shingle_hash")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle_hash"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH buckets →
    candidate pairs → exact-Jaccard verify → threshold filter."""
    sh = doc_shingle_hashes(df, id_col, text_col, shingle_k)
    sig = minhash_signatures(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(sig, id_col, bands, num_hashes // bands)
    return exact_jaccard(cand, sh, id_col).filter(F.col("jaccard") >= threshold)


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: per-token xxhash64, majority vote per bit.

    One explode + one 64-way aggregation (sums of ±1 per bit), then the
    sign bits reassemble into a long — two shuffles total, no UDFs.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    ).select(id_col, F.xxhash64("_t").alias("_h"))
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
            for i in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(64):
        # bit 63 of a signed long is the sign bit: its set-value is -2^63
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(bit_val).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bit_sums.select(F.col(id_col), sim.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
