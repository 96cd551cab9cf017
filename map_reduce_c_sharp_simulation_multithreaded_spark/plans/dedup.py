"""Deduplication queries over ``documents`` (LLM-pipeline surface).

Exact and n-gram-Jaccard dedup carry DuckDB oracles. MinHash+LSH and
SimHash are genuinely non-SQL-expressible (xxhash64 has no DuckDB
equivalent), so they are rows-only here and pinned by planted-duplicate
tests in ``tests/test_dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import (
    simhash_band_pairs,
    exact_dedup_keep_first,
    minhash_lsh_dedup_pairs,
    simhash64,
)
from ..operators.text import tokens, word_shingles
from ..session import pin_session
from .registry import register


@register(
    "dedup_exact_keep_first",
    oracle="""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY text
""",
    tags=("dedup",),
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one survivor (lowest id) per distinct text.

    Hash-groupBy on sha2(text) — shuffle keys are 32 bytes regardless of
    document size, the scale-correct exact-dedup shape.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup_keep_first(d, "text", "doc_id")


@register(
    "dedup_ngram_jaccard_adjacent",
    oracle="""
WITH sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(len(toks) - 2),
                j -> toks[CAST(j + 1 AS INT)] || ' ' ||
                     toks[CAST(j + 2 AS INT)] || ' ' ||
                     toks[CAST(j + 3 AS INT)])
           ELSE [] END) AS shingles
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks
    FROM documents
  )
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.shingles AS sa, b.shingles AS sb
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
),
scored AS (
  SELECT doc_a, doc_b,
         len(list_filter(sa, s -> list_contains(sb, s))) AS n_inter,
         len(sa) + len(sb) - len(list_filter(sa, s -> list_contains(sb, s))) AS n_union
  FROM pairs
)
SELECT doc_a, doc_b,
       -- all-integer scaled Jaccard: n_union is often a power of two,
       -- so n_inter/n_union hits EXACT round-4 ties (e.g. 1/32 =
       -- 0.03125) where engine rounding modes differ; integer floor
       -- division cannot
       CASE WHEN n_union > 0 THEN n_inter * 10000 // n_union
            ELSE 0 END AS jaccard_e4
FROM scored
""",
    tags=("dedup", "ngram"),
)
def dedup_ngram_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard between adjacent doc ids — the exact
    similarity kernel that MinHash approximates, oracle-checked."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.array_distinct(word_shingles(tokens(F.col("text")), 3)).alias("shingles"),
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    pairs = a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
    n_inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    n_union = F.size(F.col("sa")) + F.size(F.col("sb")) - n_inter
    # integer-scaled: n_union is frequently a power of two, making
    # ROUND(n_inter/n_union, 4) an exact tie (0.03125 → .0312 vs
    # .0313 depending on engine rounding mode); integer DIV cannot tie
    return pairs.select(
        "doc_a",
        "doc_b",
        n_inter.alias("n_inter"),
        n_union.alias("n_union"),
    ).select(
        "doc_a",
        "doc_b",
        F.expr(
            "CASE WHEN n_union > 0 THEN n_inter * 10000L DIV n_union"
            " ELSE 0L END"
        ).alias("jaccard_e4"),
    )


@register(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64-based; pinned by planted-duplicate pytest
    tags=("dedup", "minhash", "custom-operator"),
    headline=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-Jaccard verified ≥ 0.5.

    shingle → 32-perm minhash → 8 bands × 4 rows → bucket join →
    verify. Every stage is a bounded shuffle; nothing driver-side.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_dedup_pairs(
        d, "doc_id", "text", shingle_k=3, num_hashes=32, bands=8, threshold=0.5
    )


@register(
    "dedup_simhash_signatures",
    oracle=None,  # xxhash64-based; pinned by planted-duplicate pytest
    tags=("dedup", "simhash", "custom-operator"),
)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signature per document (hamming-ball near-dup)."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return simhash64(d, "doc_id", "text")


_SPAN_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
  FROM documents
),
sp AS (
  -- single-element tk[i] indexing, not a slice: list-slice bound
  -- conventions have drifted across DuckDB versions. p*10+10 <= len(tk)
  -- for every p in range, so all accesses are in range.
  SELECT doc_id, unnest(list_transform(range(0, len(tk) // 10),
         p -> struct_pack(pos := p,
                sh := md5(array_to_string(list_transform(range(1, 11),
                  o -> tk[CAST(p * 10 + o AS INT)]), ' '))))) AS s
  FROM toks WHERE len(tk) >= 10
),
e AS (SELECT doc_id, s.pos AS pos, s.sh AS sh FROM sp),
r AS (
  SELECT doc_id, pos, sh,
         ROW_NUMBER() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn
  FROM e
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM r GROUP BY doc_id
"""


@register(
    "dedup_span_windows",
    oracle=_SPAN_ORACLE,
    tags=("dedup", "ngram", "custom-operator"),
)
def dedup_span_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document span dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", at fixed-window
    granularity): split each doc into non-overlapping 10-token spans,
    keep only the corpus-wide FIRST occurrence of each span (ordered
    by doc_id, then position), report kept/dropped per document.

    The suffix-array ExactSubstr method needs a global sort over all
    suffixes; fixed windows get most of the repeated-passage removal
    with exactly one shuffle — keyed on the span's md5, so shuffle
    width is a 32-hex digest however long the span is, and skew is
    bounded by true duplicate multiplicity (AQE splits the rest).
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens(F.col("text")).alias("tk"))
    n_win = F.floor(F.size("tk") / 10).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda p: F.struct(
            p.alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(F.col("tk"), p * 10 + 1, 10))).alias(
                "sh"
            ),
        ),
    )
    guarded = F.when(n_win > 0, spans).otherwise(
        F.array().cast("array<struct<pos:int,sh:string>>")
    )
    e = t.select("doc_id", F.explode(guarded).alias("s")).select(
        "doc_id", F.col("s.pos").alias("pos"), F.col("s.sh").alias("sh")
    )
    w = Window.partitionBy("sh").orderBy("doc_id", "pos")
    r = e.withColumn("rn", F.row_number().over(w))
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dropped"),
    )


@register(
    "dedup_simhash_band_pairs",
    oracle=None,  # xxhash64-based signatures; equality-vs-brute-force pytest
    tags=("dedup", "simhash", "custom-operator"),
)
def dedup_simhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3) via pigeonhole banding:
    4×16-bit bands — two signatures within 3 flips must share a band,
    so the bucketed band join finds every pair (proved equal to the
    brute-force pair set in ``tests/test_dedup.py``), then the exact
    hamming check filters false bucket-mates. Rows-only at the driver
    gate: signatures are xxhash64, which DuckDB cannot recompute.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return simhash_band_pairs(d, "doc_id", "text", max_hamming=3, n_bands=4)
