"""Training-data preparation operators (LLM-pipeline surface).

Beyond dedup/similarity/text-analysis (their own modules), a training
pipeline needs deterministic dataset mechanics: reproducible train/test
splits and sequence packing. Both are pure relational plans here —
content-hash splits instead of RNG (survives reruns, repartitions and
engine changes; the only split discipline that is stable at 100 TB) and
running-sum packing instead of a sequential packer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..catalog import load_table
from ..session import pin_session
from .registry import register

_SPLIT_ORACLE = """
WITH tagged AS (
  SELECT doc_id, lang,
         CASE WHEN substr(md5(text), 1, 1) IN
                   ('0','1','2','3','4','5','6','7','8','9','a','b','c')
              THEN 'train' ELSE 'eval' END AS split
  FROM documents
)
SELECT split, lang, COUNT(*) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(SUM(doc_id) AS BIGINT) AS doc_check
FROM tagged
GROUP BY split, lang
"""


@register(
    "split_train_test_hash",
    oracle=_SPLIT_ORACLE,
    tags=("mlprep", "split", "dedup"),
)
def split_train_test_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~81/19 train/eval split on the CONTENT hash
    (first md5 nibble < 'd'), summarized per (split, lang).

    Content-hash splitting is the reproducibility discipline for
    training corpora: the assignment is a pure function of the row, so
    it survives reruns, repartitioning, engine swaps — unlike
    randomSplit, whose output depends on partitioning — and any engine
    (here: DuckDB) can re-derive it, which is exactly what the oracle
    proves. A leakage-safe variant hashes the dedup-cluster key instead
    of the raw text.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    nibble = F.substring(F.md5(F.col("text")), 1, 1)
    split = F.when(
        nibble.isin(*"0123456789abc"), F.lit("train")
    ).otherwise(F.lit("eval"))
    return (
        d.select("doc_id", "lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.sum("doc_id").cast("long").alias("doc_check"),
        )
    )


_PACK_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
binned AS (
  SELECT doc_id, lang, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 2048.0) AS BIGINT)
           AS bin_id
  FROM toks
  WINDOW w AS (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT lang, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM binned
GROUP BY lang, bin_id
"""


@register(
    "pack_sequences_running_sum",
    oracle=_PACK_ORACLE,
    tags=("mlprep", "window", "custom-operator"),
)
def pack_sequences_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to ~2048-token context bins via a
    running token sum per language (bin = floor(preceding-sum/2048)).

    The streaming-friendly alternative to sequential first-fit packing:
    one window shuffle on the stream key, no driver loop, deterministic
    given the (lang, doc_id) order. Bins can overflow by at most one
    document — the standard trade for a fully parallel packer.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
    ).withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(2048.0)
        ).cast("long"),
    )
    return binned.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )
