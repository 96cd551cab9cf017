"""Text-analysis queries over the ``documents`` table (LLM-pipeline
surface mandated by the north star; no reference analogue).

Every query here is pure column expressions from ``operators/text.py``
— language ID, quality scoring, token statistics, term frequencies,
shingling, fingerprinting — each with a DuckDB oracle computing the
same thing relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.text import (
    char_ngrams,
    fingerprint,
    lang_guess,
    quality_features,
    token_count,
    tokens,
    winnow_fps,
)
from ..session import pin_session
from .registry import register


@register(
    "text_token_stats",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t <> '')) AS INT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_computed,
       n_chars AS n_chars_declared
FROM documents
""",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) + char-length audit."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
        F.col("n_chars").alias("n_chars_declared"),
    )


@register(
    "text_lang_rollup",
    oracle="""
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars) AS total_chars,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 2) AS avg_chars
FROM documents
GROUP BY lang, source
""",
    tags=("text", "aggregate"),
)
def text_lang_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup by (lang, source)."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg(F.col("n_chars").cast("double")), 2).alias("avg_chars"),
    )


_LANGID_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang,
         (CASE WHEN ' '||lower(text)||' ' LIKE '% the %' THEN 1 ELSE 0 END +
          CASE WHEN ' '||lower(text)||' ' LIKE '% and %' THEN 1 ELSE 0 END +
          CASE WHEN ' '||lower(text)||' ' LIKE '% of %' THEN 1 ELSE 0 END) AS s_en,
         (CASE WHEN ' '||lower(text)||' ' LIKE '% el %' THEN 1 ELSE 0 END +
          CASE WHEN ' '||lower(text)||' ' LIKE '% la %' THEN 1 ELSE 0 END +
          CASE WHEN ' '||lower(text)||' ' LIKE '% los %' THEN 1 ELSE 0 END) AS s_es,
         (CASE WHEN ' '||lower(text)||' ' LIKE '% le %' THEN 1 ELSE 0 END +
          CASE WHEN ' '||lower(text)||' ' LIKE '% les %' THEN 1 ELSE 0 END +
          CASE WHEN ' '||lower(text)||' ' LIKE '% des %' THEN 1 ELSE 0 END) AS s_fr,
         (CASE WHEN ' '||lower(text)||' ' LIKE '% der %' THEN 1 ELSE 0 END +
          CASE WHEN ' '||lower(text)||' ' LIKE '% und %' THEN 1 ELSE 0 END +
          CASE WHEN ' '||lower(text)||' ' LIKE '% das %' THEN 1 ELSE 0 END) AS s_de
  FROM documents
)
SELECT doc_id,
       CASE
         WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
         WHEN s_es > 0 AND s_es > s_en AND s_es >= s_fr AND s_es >= s_de THEN 'es'
         WHEN s_fr > 0 AND s_fr > s_en AND s_fr > s_es AND s_fr >= s_de THEN 'fr'
         WHEN s_de > 0 AND s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
         ELSE 'unknown'
       END AS lang_guess,
       lang AS lang_declared
FROM scored
"""


@register("text_langid_heuristic", oracle=_LANGID_ORACLE, tags=("text", "langid"))
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-scoring language ID (argmax, deterministic tie-break).

    The corpus is synthetic word-salad, so accuracy vs the declared
    lang column is incidental — the differential test pins the operator
    semantics, not linguistic truth.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        lang_guess(F.col("text")).alias("lang_guess"),
        F.col("lang").alias("lang_declared"),
    )


@register(
    "text_quality_score",
    oracle="""
SELECT doc_id,
       ROUND(CASE WHEN length(text) > 0
             THEN CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
                  / length(text) ELSE 0.0 END, 4) AS punct_ratio,
       ROUND(CASE WHEN len(toks) > 0
             THEN CAST(len(list_filter(toks, t -> lower(t) IN ('the','a','and','of','to'))) AS DOUBLE)
                  / len(toks) ELSE 0.0 END, 4) AS stopword_ratio,
       ROUND(CASE WHEN len(toks) > 0
             THEN list_aggregate(list_transform(toks, t -> CAST(length(t) AS DOUBLE)), 'sum')
                  / len(toks) ELSE 0.0 END, 4) AS mean_token_len
FROM (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks
  FROM documents
)
""",
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features: punctuation ratio, stopword ratio, mean token
    length — the length/punct/stopword scoring family."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    return d.select(
        "doc_id",
        F.round(feats["punct_ratio"], 4).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(feats["mean_token_len"], 4).alias("mean_token_len"),
    )


@register(
    "text_term_frequency",
    oracle="""
SELECT tok, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
FROM (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents
)
GROUP BY tok
""",
    tags=("text", "aggregate"),
    headline=True,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term + document frequencies (explode → two-phase agg).

    The canonical MapReduce word-count — the reference's architecture
    generalized (map-side combine + reduce merge, automatic in Spark).
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
    )


@register(
    "text_char_ngram_stats",
    oracle="""
SELECT doc_id,
       CAST(CASE WHEN length(text) >= 3 THEN length(text) - 2 ELSE 0 END AS INT)
         AS n_ngrams,
       CAST(len(list_distinct(
         CASE WHEN length(text) >= 3
              THEN list_transform(range(1, length(text) - 1),
                                  i -> substr(text, CAST(i AS INT), 3))
              ELSE [] END)) AS INT) AS n_distinct_ngrams
FROM documents
""",
    tags=("text", "ngram"),
)
def text_char_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram counts (total + distinct) per document —
    the shingling primitive under MinHash/SimHash."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    ng = char_ngrams(F.col("text"), 3)
    return d.select(
        "doc_id",
        F.size(ng).alias("n_ngrams"),
        F.size(F.array_distinct(ng)).alias("n_distinct_ngrams"),
    )


@register(
    "text_fingerprint_groups",
    oracle="""
SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[.!?,;:]', '', 'g'),
                               '\\s+', ' ', 'g'))) AS fp,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS canonical_doc
FROM documents
GROUP BY 1
""",
    tags=("text", "dedup"),
)
def text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-fingerprint groups (md5 of canonicalized text) —
    document fingerprinting for dedup."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )


@register(
    "text_bpe_token_count",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+'))
            AS INT) AS n_subwords,
       CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS INT) AS n_vowel_runs
FROM documents
""",
    tags=("text", "tokenize"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer counting: a GPT-2-ish regex splits text
    into word/number/punctuation subword units (the cheap token-count
    estimator for LLM data budgeting — no vocab needed)."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    pat = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), 0)).alias("n_subwords"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[aeiou]+"), 0)
        ).alias("n_vowel_runs"),
    )


# Shared winnowing-fingerprint CTE (mirrors operators/text.py:winnow_fps)
# — also the edge basis of dedup_connected_components in advanced.py.
WINNOW_FPS_CTE = r"""h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - 5 + 2, 1)),
           i -> (ascii(substr(text, CAST(i AS INT), 1))
               + ascii(substr(text, CAST(i + 1 AS INT), 1)) * 257
               + ascii(substr(text, CAST(i + 2 AS INT), 1)) * 66049
               + ascii(substr(text, CAST(i + 3 AS INT), 1)) * 16974593
               + ascii(substr(text, CAST(i + 4 AS INT), 1)) * 4362470401)
              % 1000003) AS hashes
  FROM documents
),
w AS (
  -- 1..4 hashes still yield ONE window minimum (greatest(..., 2) keeps
  -- range non-empty, matching Spark's greatest(n-4+1, 1) sequence);
  -- zero hashes yield an empty fps, not [NULL]
  SELECT doc_id,
         CASE WHEN len(hashes) = 0 THEN CAST([] AS BIGINT[])
              ELSE list_distinct(list_transform(
                range(1, greatest(len(hashes) - 4 + 2, 2)),
                s -> list_min(hashes[CAST(s AS INT):CAST(s + 3 AS INT)])))
         END AS fps
  FROM h
)"""

_WINNOW_ORACLE = f"""
WITH {WINNOW_FPS_CTE}
SELECT doc_id,
       CAST(len(fps) AS INT) AS n_fp,
       list_min(fps) AS fp_min,
       -- empty-doc convention: Spark's aggregate() over an empty array
       -- returns the zero accumulator, DuckDB's list_aggregate returns
       -- NULL — coalesce to Spark's 0 (fp_min stays NULL on both)
       COALESCE(list_aggregate(fps, 'sum') % 1000000007, 0) AS fp_check
FROM w
"""


@register("text_winnowing_fingerprints", oracle=_WINNOW_ORACLE,
          tags=("text", "dedup", "custom-operator"))
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (rolling hash + sliding-window
    minima — the MOSS/plagiarism-detection scheme).

    The 5-gram hash is a POLYNOMIAL over character codes (base 257 mod
    1000003) so the identical integers are computable in plain SQL on
    the oracle side — a cross-engine-checkable rolling hash, unlike
    engine hashes (xxhash64). Window-4 minima, deduplicated, summarized
    per doc as (count, min, checksum). All array expressions, zero
    shuffles before the final projection.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    fps = winnow_fps(F.col("text"))

    # Same trick for the summary: evaluate `fps` once and emit the three
    # outputs via inline() (a generator runs once per row), instead of
    # embedding the full expression tree in three projection columns.
    def summarize(fp):
        return F.struct(
            F.size(fp).alias("n_fp"),
            F.array_min(fp).alias("fp_min"),
            F.pmod(
                F.aggregate(fp, F.lit(0).cast("long"), lambda a, x: a + x),
                F.lit(1000000007),
            ).alias("fp_check"),
        )

    return d.select(
        "doc_id", F.inline(F.transform(F.array(fps), summarize))
    )
