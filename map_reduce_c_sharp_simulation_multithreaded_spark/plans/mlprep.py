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
from ..operators.dedup import (
    contamination_spans,
    cut_spans,
    doc_shingle_sets,
    exact_jaccard,
    lsh_banded,
    minhash_signatures,
)
from ..operators.text import tokens, word_shingles
from ..session import pin_session
from .dedup import _JACCARD_VERIFY_CTE, _MINHASH_CTES
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


_CONTAM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
  FROM documents
),
gr AS (
  -- single-element tk[i] indexing, not a slice: list-slice bound
  -- conventions have drifted across DuckDB versions, 1-based element
  -- access has not. i <= len-12, so all 13 accesses are in range.
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 11),
         i -> array_to_string(list_transform(range(0, 13),
                o -> tk[CAST(i + o AS INT)]), ' ')))) AS gram
  FROM toks WHERE len(tk) >= 13
)
-- the engine joins on xxhash64(gram) (8-byte shuffle keys); the
-- oracle counts the raw grams — identical counts, independent path
SELECT t.doc_id,
       CAST(COUNT(DISTINCT CASE WHEN e.doc_id IS NOT NULL THEN t.gram END)
            AS BIGINT) AS n_shared_13grams,
       CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs_hit,
       COUNT(DISTINCT e.doc_id) > 0 AS contaminated
FROM gr t
LEFT JOIN (SELECT * FROM gr WHERE doc_id % 20 = 7) e ON e.gram = t.gram
WHERE t.doc_id % 20 <> 7
GROUP BY t.doc_id
"""


@register(
    "contamination_eval_overlap",
    oracle=_CONTAM_ORACLE,
    tags=("mlprep", "dedup", "contamination", "custom-operator"),
)
def contamination_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit via 13-gram overlap — the GPT-3
    appendix-C decontamination scheme: any training document sharing a
    13-token shingle with the held-out set (here: doc_id % 20 == 7) is
    flagged, with overlap counts for triage.

    Scale shape: shingles are xxhash64'd before the join, so the join
    keys are 8-byte longs instead of ~80-byte strings (4× narrower in
    the shuffle than the md5-hex digests this replaced, and no string
    hashing in the hot loop); the oracle counts the raw grams instead —
    an independent path to the same counts. The eval
    side carries NO broadcast hint: here it is 5% of the corpus, which
    at 100 TB would be terabytes — a mandatory broadcast is a
    driver/executor OOM. AQE picks broadcast when the eval side is
    actually small (real decontamination eval sets — benchmarks — are
    MBs) and falls back to a shuffled join with a runtime bloom filter
    pruning the training side otherwise (the path pinned by
    tests/test_round2_ops.py::test_runtime_bloom_filter_engages).
    Output is the full audit table (clean docs carry zeros), not just
    the flagged tail.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    grams = F.array_distinct(word_shingles(tokens(F.col("text")), 13))
    # Collision bound (ADVICE.md r4): joining on a single 64-bit digest
    # means two DISTINCT 13-grams collide with birthday probability
    # ~n²/2^65 — at 10^10 distinct grams (the 100 TB regime) that's an
    # expected ~3 spurious gram matches corpus-wide, each flagging one
    # training doc with a 1-gram overlap (a false positive, never a
    # miss — the
    # audit errs toward quarantine). Decontamination tolerates that
    # asymmetry; a pipeline needing exactness swaps in a 128-bit key
    # (two independent xxhash64 seeds), doubling shuffle-key width:
    #   F.struct(F.xxhash64("gram"), F.xxhash64(F.lit(1), F.col("gram")))
    # Persisted: BOTH join sides (eval filter, train filter) derive
    # from this frame, so unpersisted the tokenize→shingle→explode→
    # hash pipeline plans and runs twice (measured 2.6 s → 0.8 s warm
    # at sf0.1). At 100 TB the same one-materialization discipline
    # holds but the mechanism changes: the hashed-gram projection is
    # ~16 B/gram ≈ corpus token count — too big to pin in executor
    # memory, so a production decontamination run writes it ONCE to
    # temp parquet (or persists MEMORY_AND_DISK_SER) and feeds both
    # sides from that, trading one narrow write+read against a second
    # full tokenization pass; the join's own shuffle moves the same
    # rows regardless, so the materialized copy is never the
    # bottleneck.
    g = d.select("doc_id", F.explode(grams).alias("gram")).select(
        "doc_id", F.xxhash64("gram").alias("gh")
    ).cache()
    ev = g.filter(F.col("doc_id") % 20 == 7).select(
        F.col("doc_id").alias("eval_id"), "gh"
    )
    tr = g.filter(F.col("doc_id") % 20 != 7)
    return (
        tr.join(ev, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.countDistinct(
                F.when(F.col("eval_id").isNotNull(), F.col("gh"))
            ).alias("n_shared_13grams"),
            F.countDistinct("eval_id").alias("n_eval_docs_hit"),
            (F.countDistinct("eval_id") > 0).alias("contaminated"),
        )
    )


# Fuzzy decontamination: the MinHash signature CTEs are imported from
# plans.dedup (one definition of the replayed hash family), then the
# candidate join is BIPARTITE train×eval instead of the near-dup
# self-join, verified at the 0.8-Jaccard decontamination bar.
_FUZZY_CONTAM_ORACLE = _MINHASH_CTES + f""",
cand AS (
  SELECT DISTINCT t.doc_id AS id_a, e.doc_id AS id_b
  FROM banded t JOIN banded e
    ON t.band = e.band AND t.bh = e.bh
  WHERE t.doc_id % 20 <> 7 AND e.doc_id % 20 = 7
),{_JACCARD_VERIFY_CTE}
SELECT id_a AS doc_id,
       CAST(COUNT(DISTINCT id_b) AS BIGINT) AS n_eval_neardups,
       CAST(MAX(n_inter * 10000 // n_union) AS BIGINT) AS top_jaccard_e4
FROM sc
WHERE n_inter * 10000 // n_union >= 8000
GROUP BY id_a
"""


@register(
    "contamination_fuzzy_minhash",
    oracle=_FUZZY_CONTAM_ORACLE,
    tags=("mlprep", "contamination", "dedup", "minhash", "custom-operator"),
)
def contamination_fuzzy_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy train/eval decontamination: training documents whose
    shingle-Jaccard to ANY held-out document (doc_id % 20 == 7, the
    same split as the exact audit) is >= 0.8 — the near-duplicate
    decontamination pass that catches reformatted or lightly edited
    benchmark copies the exact 13-gram audit misses (and the standard
    second stage next to it in production dataset reports).

    Pipeline: shingle → 32-perm MinHash → 8×4 LSH bands (all per-row
    expressions, zero shuffles) → BIPARTITE band join of train bands
    against BROADCAST eval bands → exact-Jaccard verify on the
    candidates → threshold 0.8 → per-doc audit aggregate.

    The broadcast is the scale decision, and it is the OPPOSITE of the
    exact audit's (contamination_eval_overlap carries no hint because
    its join side is every 13-gram of the eval split — GBs at corpus
    scale). Here the eval side is 8 band keys per eval document —
    a few MBs for any real benchmark suite even at 100 TB of training
    data — so the band join becomes a map-side hash join: the train
    side's signatures stream through without ever shuffling, and
    decontamination costs one scan of the training corpus. The verify
    join is candidate-bounded (LSH bucket hits only, never n²).

    Runs the md5-derived oracle-mode hash family (shared CTE prefix
    with dedup_minhash_lsh — plans.dedup._MINHASH_CTES — so the
    replayed signature stage cannot drift between the two oracles);
    xxhash64 stays the production default in the underlying operators.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return _fuzzy_contam_audit(d)


def _fuzzy_contam_audit(d: DataFrame, hash_mode: str = "md5") -> DataFrame:
    """The plan body over an arbitrary ``(doc_id, text)`` frame —
    separated so the planted-contamination pytest can drive it.
    ``hash_mode`` follows the family discipline of the near-dup
    pipeline: "md5" (default here — the registered query wants the
    DuckDB-replayable family) or "xxhash64" (the production family —
    semantics-equivalence pinned in pytest, same as
    dedup_minhash_lsh's)."""
    # Shingle sets feed both verify probes; signatures feed the banding
    # once — same one-materialization discipline as the near-dup query.
    sets_df = doc_shingle_sets(d, "doc_id", "text", 3, hash_mode).cache()
    sig = minhash_signatures(
        sets_df.select("doc_id", "sh_set"), "doc_id", 32
    ).drop("sh_set")
    banded = lsh_banded(
        sig, "doc_id", bands=8, rows=4, hash_mode=hash_mode
    )
    is_eval = F.col("doc_id") % 20 == 7
    ev = banded.filter(is_eval).select(
        F.col("doc_id").alias("id_b"), "band_id", "bh"
    )
    tr = banded.filter(~is_eval).select(
        F.col("doc_id").alias("id_a"), "band_id", "bh"
    )
    cand = (
        tr.join(F.broadcast(ev), ["band_id", "bh"])
        .select("id_a", "id_b")
        .distinct()
    )
    verified = exact_jaccard(cand, sets_df, "doc_id", scaled=True)
    return (
        verified.filter(F.col("jaccard_e4") >= 8000)
        .groupBy("id_a")
        .agg(
            F.countDistinct("id_b").alias("n_eval_neardups"),
            F.max("jaccard_e4").alias("top_jaccard_e4"),
        )
        .select(
            F.col("id_a").alias("doc_id"), "n_eval_neardups", "top_jaccard_e4"
        )
    )


_QUANT_ORACLE = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
  FROM embeddings
),
s AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, v -> abs(v))) / 127.0 AS qscale
  FROM e
),
q AS (
  SELECT vec_id, qscale,
         list_transform(emb, v -> greatest(-127, least(127,
           CAST(floor(v / qscale + 0.5) AS BIGINT)))) AS codes,
         emb
  FROM s WHERE qscale > 0
)
SELECT vec_id,
       ROUND(qscale, 9) AS qscale_r,
       CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
       CAST(len(list_filter(codes, c -> abs(c) = 127)) AS INT) AS n_extreme,
       ROUND(list_max(list_transform(range(1, len(emb) + 1),
             i -> abs(emb[CAST(i AS INT)]
                      - codes[CAST(i AS INT)] * qscale))), 9) AS max_abs_err
FROM q
"""


@register(
    "quantize_embeddings_int8",
    oracle=_QUANT_ORACLE,
    tags=("mlprep", "similarity", "quantization"),
)
def quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (per-vector
    scale = max|v|/127, code = round(v/scale) clamped) with a
    reconstruction-error audit — the 4× storage cut that makes a
    100 TB embedding corpus shippable, and the precursor to the PQ
    codes in ``sim_ivfpq_topk``.

    Cross-engine discipline: rounding is ``floor(x + 0.5)`` on both
    sides (Spark's ROUND and DuckDB's differ on negative halves),
    floats are cast to double BEFORE any arithmetic, and the audited
    outputs are either integers (code_sum, n_extreme) or order-free
    maxima rounded well past the double noise floor.
    """
    pin_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda v: v.cast("double")).alias(
            "emb"
        ),
    )
    s = e.select(
        "vec_id",
        "emb",
        (
            F.array_max(F.transform(F.col("emb"), F.abs)) / F.lit(127.0)
        ).alias("qscale"),
    ).filter(F.col("qscale") > 0)
    codes = F.transform(
        F.col("emb"),
        lambda v: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.floor(v / F.col("qscale") + F.lit(0.5)),
            ),
        ),
    )
    q = s.select("vec_id", "qscale", "emb", codes.alias("codes"))
    err = F.array_max(
        F.zip_with(
            F.col("emb"),
            F.col("codes"),
            lambda v, c: F.abs(v - c * F.col("qscale")),
        )
    )
    return q.select(
        "vec_id",
        F.round(F.col("qscale"), 9).alias("qscale_r"),
        F.aggregate(
            F.col("codes"), F.lit(0).cast("long"), lambda a, c: a + c
        ).alias("code_sum"),
        F.size(F.filter(F.col("codes"), lambda c: F.abs(c) == 127)).alias(
            "n_extreme"
        ),
        F.round(err, 9).alias("max_abs_err"),
    )


@register(
    "pipeline_curate_corpus",
    oracle=r"""
WITH feat AS (
  SELECT doc_id, lang, text,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         t -> t <> '')) AS n_toks,
         CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'),
                                   t -> t <> '')) > 0
              THEN CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                        t -> lower(t) IN ('the','a','and','of','to')))
                        AS DOUBLE)
                   / len(list_filter(string_split_regex(trim(text), '\s+'),
                                     t -> t <> ''))
              ELSE 0.0 END AS sw_ratio
  FROM documents
),
kept AS (
  SELECT doc_id, lang, n_toks,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[.!?,;:]', '', 'g'), '\s+', ' ', 'g'))) AS fp
  FROM feat
  WHERE n_toks >= 15 AND sw_ratio >= 0.02
),
dedup AS (
  SELECT doc_id, lang, n_toks,
         COUNT(*) OVER (PARTITION BY fp) AS n_dups,
         MIN(doc_id) OVER (PARTITION BY fp) AS canon
  FROM kept
)
SELECT doc_id, lang, CAST(n_toks AS INT) AS n_toks,
       CAST(n_dups AS INT) AS n_dups,
       CASE WHEN substr(md5('doc:' || doc_id), 1, 1) IN
                 ('0','1','2','3','4','5','6','7','8','9','a','b','c')
            THEN 'train' ELSE 'eval' END AS split
FROM dedup
WHERE doc_id = canon
""",
    tags=("mlprep", "dedup", "quality", "split", "custom-operator"),
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline as ONE composed plan: quality gate
    (token count + stopword ratio) → normalization-fingerprint dedup
    keeping the lowest doc_id per group → deterministic content-hash
    train/eval split — the minimal version of what a training-data
    pipeline runs nightly, and the proof that this engine's operators
    compose (each stage is also exercised standalone:
    ``text_quality_score``, ``text_fingerprint_groups``,
    ``split_train_test_hash``).

    One plan, one shuffle at scale; Catalyst pipelines the gate into
    the scan. The split decision is a pure row hash — rerun-stable
    across engines and cluster sizes.

    r12 hot-key restructure (the ExactSubstr window law applied
    registry-wide, SCALE.md "Window inventory"): "canonical doc +
    duplicate count per fingerprint" was a ``Window.partitionBy(fp)``
    — a mega-duplicated boilerplate doc is ONE fp on ONE task. It is
    now ``groupBy(fp).agg(min(struct(doc_id, lang, n_toks)), count)``
    — the canonical row rides the min struct, so the hot key combines
    map-side and there is no join back at all; same answer.
    """
    pin_session(spark)
    from ..operators.text import fingerprint, tokens

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_toks = F.size(toks)
    sw = F.size(
        F.filter(toks, lambda t: F.lower(t).isin("the", "a", "and", "of", "to"))
    )
    sw_ratio = F.when(n_toks > 0, sw.cast("double") / n_toks).otherwise(0.0)
    kept = (
        d.withColumn("n_toks", n_toks)
        .withColumn("sw_ratio", sw_ratio)
        .filter((F.col("n_toks") >= 15) & (F.col("sw_ratio") >= 0.02))
        .select("doc_id", "lang", "n_toks", fingerprint(F.col("text")).alias("fp"))
    )
    # min(struct) orders by doc_id first (unique per corpus), so the
    # whole canonical row rides one combiner-friendly aggregate
    agg = kept.groupBy("fp").agg(
        F.min(F.struct("doc_id", "lang", "n_toks")).alias("_c"),
        F.count(F.lit(1)).alias("n_dups"),
    )
    split = F.when(
        F.substring(
            F.md5(F.concat(F.lit("doc:"), F.col("_c.doc_id"))), 1, 1
        )
        < F.lit("d"),
        F.lit("train"),
    ).otherwise(F.lit("eval"))
    return agg.select(
        F.col("_c.doc_id").alias("doc_id"),
        F.col("_c.lang").alias("lang"),
        F.col("_c.n_toks").cast("int").alias("n_toks"),
        F.col("n_dups").cast("int").alias("n_dups"),
        split.alias("split"),
    )


def _pca_oracle(n_iter: int = 2, dim: int = 64) -> str:
    """Power-iteration oracle: v0 is the exact literal 1/8 vector; each
    round's per-row dot is the index-ordered list fold ROUNDed to 6,
    per-position contributions are quantized to integers before the
    (order-free) SUM, and the norm folds the 64 per-position sums in
    position order — every float step is either per-row-deterministic
    or integer, so both engines produce bit-identical loadings."""
    v0 = "[" + ", ".join(["0.125"] * dim) + "]::DOUBLE[]"
    # the iteration vector crosses rounds as a 1-row list CTE
    ctes = [
        "e AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb "
        "FROM embeddings)",
        f"v0(l) AS (SELECT {v0})",
    ]
    for r in range(1, n_iter + 1):
        ctes.append(f"""d{r} AS (
  SELECT e.vec_id, e.emb,
         ROUND(list_aggregate(list_transform(list_zip(e.emb, v.l),
               p -> p[1] * p[2]), 'sum'), 6) AS dot
  FROM e CROSS JOIN v{r-1} v
),
w{r} AS (
  SELECT i.i AS pos,
         CAST(SUM(CAST(ROUND(d.emb[CAST(i.i AS INT)] * d.dot * 1000000.0)
                       AS BIGINT)) AS BIGINT) AS w
  FROM d{r} d CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS i) i
  GROUP BY i.i
),
v{r}(l) AS (
  SELECT list_transform(
           list(CAST(w AS DOUBLE) ORDER BY pos),
           x -> x / sqrt(list_aggregate(
                  list_transform(list(CAST(w AS DOUBLE) ORDER BY pos),
                                 y -> y * y), 'sum')))
  FROM w{r}
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(pos AS INT) AS pos, ROUND(loading, 6) AS loading
FROM (
  SELECT unnest(range(1, {dim + 1})) AS pos,
         unnest((SELECT l FROM v{n_iter})) AS loading
)
"""
    )


@register(
    "embed_pca_power_iteration",
    oracle=_pca_oracle(2, 64),
    tags=("mlprep", "similarity", "iterative", "custom-operator"),
)
def embed_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by two
    distributed power iterations over the (uncentered) second-moment
    matrix: w = Σ_rows x·(xᵀv), v ← w/‖w‖ — the spectral primitive
    under PCA whitening, ABBA-style outlier pruning, and low-rank
    compression of embedding tables. Emits the 64 loadings of v₂.

    Scale shape: the matrix Σxxᵀ is never materialized — each round is
    one corpus scan (per-row dot against the broadcast 64-float
    vector) plus a 64-group integer aggregation; only the 64-value
    vector crosses rounds (the k-means-codebook discipline, here kept
    fully in-plan via a 1-row crossJoin instead of a driver collect).
    Cross-engine determinism: per-row dots fold index-ordered and
    round to 6; per-position contribution sums are quantized to
    integers (order-free across 1000 executors); the final normalize
    folds 64 values in position order.
    """
    pin_session(spark)
    dim = 64
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    v = F.expr("array(" + ", ".join(["0.125D"] * dim) + ")")
    vrow = emb.sparkSession.range(1).select(v.alias("l"))
    for _ in range(2):
        d = emb.crossJoin(F.broadcast(vrow)).select(
            "emb",
            F.round(
                F.aggregate(
                    F.zip_with("emb", "l", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                ),
                6,
            ).alias("dot"),
        )
        w = (
            d.select(F.posexplode("emb").alias("pos0", "x"), "dot")
            .select(
                (F.col("pos0") + 1).alias("pos"),
                F.round(F.col("x") * F.col("dot") * 1000000.0)
                .cast("bigint")
                .alias("q"),
            )
            .groupBy("pos")
            .agg(F.sum("q").alias("w"))
        )
        arr = w.agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("pos", F.col("w").cast("double").alias("wd")))
                ),
                lambda s: s["wd"],
            ).alias("wa")
        )
        vrow = arr.select(
            F.transform(
                "wa",
                lambda x: x
                / F.sqrt(
                    F.aggregate(
                        F.transform("wa", lambda y: y * y),
                        F.lit(0.0),
                        lambda acc, t: acc + t,
                    )
                ),
            ).alias("l")
        )
    return vrow.select(F.posexplode("l").alias("pos0", "v")).select(
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.round("v", 6).alias("loading"),
    )


_QUOTA_ORACLE = """
SELECT doc_id, source, CAST(rn AS INT) AS quota_rank,
       CAST(CASE WHEN rn <= 15 THEN 1 ELSE 0 END AS INT) AS kept
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5('quota:' || doc_id), doc_id) AS rn
  FROM documents)
"""


@register(
    "dedup_source_quota",
    oracle=_QUOTA_ORACLE,
    tags=("mlprep", "dedup", "curation"),
)
def dedup_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota — the corpus-balancing half of
    curation: cap every source at 15 documents, chosen by CONTENT-HASH
    order (md5 of "quota:"||doc_id), so the subsample is a
    deterministic uniform draw that survives reruns, repartitioning,
    and engine swaps — the same no-RNG discipline as the train/eval
    split. One over-represented crawl domain cannot dominate the
    training mixture.

    Scale shape: one shuffle on ``source``; rank work is per-source.
    A pathological mega-source would bottleneck its window partition —
    at 100 TB the standard refinement is a two-phase cap (cap each
    task's slice at N first, then rank the ≤ N·tasks survivors),
    which composes from this same plan; per-source skew here is
    bounded by the corpus's source fan-out.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return d.select("doc_id", "source").withColumn(
        "quota_rank", F.row_number().over(w).cast("int")
    ).withColumn(
        "kept",
        F.when(F.col("quota_rank") <= 15, F.lit(1)).otherwise(F.lit(0)).cast("int"),
    )


def source_quota_two_phase(
    d: DataFrame, n: int = 15, n_shards: int = 32
) -> DataFrame:
    """Two-phase per-source quota (the mega-source refinement the
    one-phase docstring documents, VERDICT.md r5 next-round #4).

    Phase 1 caps each (source, shard) slice at ``n`` by content-hash
    order, where shard = pmod(xxhash64(doc_id), n_shards) — so even a
    source holding the entire corpus fans its rank work across
    ``n_shards`` window partitions. Phase 2 ranks only the ≤
    n·n_shards survivors per source and keeps the global top ``n``.

    Exactly equal to the one-phase plan by the top-k pushdown argument:
    any doc in a source's global top-n is also in its shard's top-n
    (fewer competitors), so it survives phase 1; and every doc ahead of
    it globally is itself global-top-n and survives too, so survivor
    rank == global rank on the kept set. ``tests/test_round6_ops.py``
    pins both the equality and the phase-1 partition bound.
    """
    key = F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    shard = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards))
    w1 = Window.partitionBy("source", "_shard").orderBy(
        key.asc(), F.col("doc_id").asc()
    )
    survivors = (
        d.select("doc_id", "source")
        .withColumn("_shard", shard)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= n)
        .drop("_shard", "_r1")
    )
    w2 = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        survivors.withColumn("quota_rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("quota_rank") <= n)
        .select("doc_id", "source", "quota_rank")
    )


_QUOTA2_ORACLE = """
SELECT doc_id, source, CAST(rn AS INT) AS quota_rank
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5('quota:' || doc_id), doc_id) AS rn
  FROM documents)
WHERE rn <= 15
"""


@register(
    "dedup_source_quota_two_phase",
    oracle=_QUOTA2_ORACLE,
    tags=("mlprep", "dedup", "curation"),
)
def dedup_source_quota_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mega-source-safe per-source quota: same kept set as
    ``dedup_source_quota`` (the oracle IS the one-phase SQL filtered to
    kept — both are deterministic functions of the same content-hash
    order), computed in two capped phases so no single window partition
    ever receives a whole skewed source. This is the 100 TB shape: a
    crawl snapshot where one domain is 40% of the corpus turns the
    one-phase plan's ``Window.partitionBy(source)`` into a single
    straggler task; here that domain's rank work spreads over 32 shard
    partitions and phase 2 touches at most 15·32 rows per source.
    """
    pin_session(spark)
    return source_quota_two_phase(
        load_table(spark, sf_dir, "documents"), n=15, n_shards=32
    )


_PACK_SHARDED_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         strpos('0123456789abcdef',
                substr(md5('packshard:' || doc_id), 1, 1)) - 1 AS shard
  FROM documents
),
local AS (
  SELECT doc_id, lang, shard, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 2048.0) AS BIGINT)
           AS local_bin
  FROM toks
  WINDOW w AS (PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
shard_bins AS (
  SELECT lang, shard, MAX(local_bin) + 1 AS nb
  FROM local GROUP BY lang, shard
),
offsets AS (
  -- SUM(BIGINT) is HUGEINT in DuckDB; cast back before it reaches an
  -- output column (the driver-hash type lint)
  SELECT lang, shard,
         CAST(COALESCE(SUM(nb) OVER (PARTITION BY lang ORDER BY shard
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM shard_bins
)
SELECT l.lang, CAST(l.local_bin + o.off AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(l.n_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(l.doc_id) AS BIGINT) AS first_doc
FROM local l JOIN offsets o ON o.lang = l.lang AND o.shard = l.shard
GROUP BY l.lang, l.local_bin + o.off
"""


@register(
    "pack_sequences_sharded",
    oracle=_PACK_SHARDED_ORACLE,
    tags=("mlprep", "window", "custom-operator"),
)
def pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe sequence packing — the sharded refinement the windows
    SCALE.md paragraph documents for ``pack_sequences_running_sum``:
    that plan's ``Window.partitionBy(lang)`` puts a whole language in
    ONE window partition, a single straggler task when one language is
    90 % of a 100 TB corpus. Here the running-sum pack runs per
    (lang, shard) — shard = first md5 hex digit of the doc id, 16-way
    — and shard-local bins are renumbered globally by offsetting with
    the cumulative bin counts of prior shards (a 16-row-per-lang
    window, negligible). Same output shape and bin-capacity contract
    as the one-phase packer (bins overflow by at most one document);
    bin MEMBERSHIP differs (docs pack within their shard), which is
    the accepted trade for removing the per-key straggler — the same
    two-phase discipline as ``source_quota_two_phase``.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit("packshard:"),
                                          F.col("doc_id").cast("string"))), 1, 1),
               16, 10)
        .cast("int")
    )
    w1 = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"), shard.alias("shard")
    ).withColumn(
        "local_bin",
        F.floor(
            (F.sum("n_tokens").over(w1) - F.col("n_tokens")) / F.lit(2048.0)
        ).cast("long"),
    )
    shard_bins = local.groupBy("lang", "shard").agg(
        (F.max("local_bin") + 1).alias("nb")
    )
    w_off = (
        Window.partitionBy("lang")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = shard_bins.select(
        "lang",
        "shard",
        F.coalesce(F.sum("nb").over(w_off), F.lit(0)).alias("off"),
    )
    return (
        local.join(offsets, ["lang", "shard"])
        .select(
            "lang",
            (F.col("local_bin") + F.col("off")).alias("bin_id"),
            "n_tokens",
            "doc_id",
        )
        .groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )


_MIX_ORACLE = r"""
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(list_filter(string_split_regex(trim(text), '\s+'),
                                t -> t <> ''))) AS BIGINT) AS total_toks,
       ROUND(sqrt(CAST(SUM(len(list_filter(string_split_regex(trim(text),
             '\s+'), t -> t <> ''))) AS DOUBLE)), 6) AS mix_weight
FROM documents
GROUP BY source, lang
"""


@register(
    "curation_mix_weights",
    oracle=_MIX_ORACLE,
    tags=("mlprep", "sampling", "curation"),
)
def curation_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-temperature mixture weights per (source, lang):
    weight ∝ sqrt(total tokens) — the α=0.5 temperature scheme
    (XLM-style multilingual rebalancing) that up-weights small
    sources/languages relative to proportional sampling without
    letting giants dominate. The trainer renormalizes the weights;
    this emits the per-cell mass.

    sqrt, not pow(x, α): IEEE sqrt is correctly rounded in both
    engines, so the rounded weight is bit-stable cross-engine —
    pow(x, 0.7) = exp(0.7·ln x) is 1-ulp-accurate twice over and can
    straddle a rounding boundary (the quality_perplexity_filter
    caveat). One scan, one vocab-free aggregation — the token count
    is a per-row array expression.
    """
    pin_session(spark)
    from ..operators.text import token_count

    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text"))).alias("total_toks"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "total_toks",
            F.round(F.sqrt(F.col("total_toks").cast("double")), 6).alias(
                "mix_weight"
            ),
        )
    )


_CSPAN_L = 50  # same minimum span length as dedup_exact_substr_spans

_CONTAM_SPAN_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, p, substring(text, CAST(p AS INTEGER), {_CSPAN_L}) AS gram
  FROM documents,
       unnest(range(1, greatest(length(text) - {_CSPAN_L} + 2, 1))) AS t(p)
),
ev AS (SELECT DISTINCT gram FROM pos WHERE doc_id % 20 = 7),
hit AS (
  SELECT doc_id, p FROM pos JOIN ev USING (gram) WHERE doc_id % 20 <> 7
),
lagged AS (
  SELECT doc_id, p,
         lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp
  FROM hit
),
grouped AS (
  SELECT doc_id, p,
         SUM(CASE WHEN pp IS NULL OR p - pp > {_CSPAN_L} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p) AS g
  FROM lagged
)
SELECT doc_id,
       MIN(p) AS span_start,
       MAX(p) + {_CSPAN_L - 1} AS span_end,
       MAX(p) + {_CSPAN_L} - MIN(p) AS span_len,
       COUNT(*) AS n_windows
FROM grouped
GROUP BY doc_id, g
"""


@register(
    "contamination_span_overlap",
    oracle=_CONTAM_SPAN_ORACLE,
    tags=("mlprep", "contamination", "exact-substr", "custom-operator"),
)
def contamination_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: for each TRAINING document
    (doc_id % 20 != 7, the family's split), the maximal character
    spans whose every 50-char window occurs verbatim in ANY held-out
    document — the PaLM-report substring-overlap audit, completing
    the contamination trio (13-gram doc flags → fuzzy MinHash →
    exact spans that say WHICH characters to cut).

    Scale decision (see :func:`operators.dedup.contamination_spans`,
    r12 hardening): the eval side collapses to its distinct gram set
    and BROADCASTS — keyed by the 8-byte ``xxhash64`` of each gram,
    not the ~58 B literal (measured build sizes in SCALE.md) — so the
    training side streams through a map-side left-semi join with no
    shuffle; exactness is restored by literal-verifying only the
    matched tail against the eval grams whose hashes actually hit
    (prune→verify applied bipartite: lossless, since equal grams ⇒
    equal hashes). The oracle replays the one-step literal semantics,
    so agreement also witnesses funnel ≡ direct computation.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 20 == 7
    return contamination_spans(
        d.filter(~is_eval), d.filter(is_eval), "doc_id", "text", _CSPAN_L
    )


_BUDGET_MIX_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         md5(text) AS pri
  FROM documents
),
src AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens,
         CAST(FLOOR(SQRT(CAST(SUM(n_tokens) AS DOUBLE))) AS BIGINT) AS ws
  FROM tok GROUP BY source
),
tot AS (
  SELECT CAST(SUM(src_tokens) * 5000 AS BIGINT) // 10000 AS budget,
         CAST(SUM(ws) AS BIGINT) AS sum_ws
  FROM src
),
alloc AS (
  SELECT source, src_tokens,
         (SELECT budget FROM tot) * ws // (SELECT sum_ws FROM tot)
           AS alloc_tokens
  FROM src
),
ranked AS (
  SELECT t.doc_id, t.source, t.n_tokens, a.alloc_tokens,
         COALESCE(SUM(t.n_tokens) OVER (
           PARTITION BY t.source ORDER BY t.pri, t.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS run_before
  FROM tok t JOIN alloc a USING (source)
)
SELECT source,
       CAST(MAX(alloc_tokens) AS BIGINT) AS alloc_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN run_before < alloc_tokens THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN run_before < alloc_tokens THEN n_tokens
                ELSE 0 END) AS BIGINT) AS tokens_kept,
       CAST(SUM(CASE WHEN run_before < alloc_tokens THEN doc_id
                ELSE 0 END) AS BIGINT) AS doc_check
FROM ranked
GROUP BY source
"""


@register(
    "curation_budget_mixture",
    oracle=_BUDGET_MIX_ORACLE,
    tags=("mlprep", "curation", "custom-operator"),
)
def curation_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained mixture sampling — the step that ASSEMBLES
    the training mix the dataset papers describe (Pile/LLaMA-style
    sampling proportions): a global token budget (here 50 % of the
    corpus) is allocated across sources by sqrt-temperature weight
    (``curation_mix_weights``'s α = 0.5 rebalancing, floor(sqrt) so
    the weight itself is integer), and each source is filled in
    deterministic content-hash priority order until its allocation is
    spent. ``curation_mix_weights`` computes what the mix SHOULD be;
    this materializes which documents make the cut.

    Determinism discipline: md5(text) priority (unbiased, engine-
    replayable, survives repartitioning — the content-hash split
    argument), integer allocations (B·w_s DIV Σw), and the packing
    family's exclusive-prefix-sum keep rule (keep iff tokens BEFORE
    this doc < allocation — a source can overflow by at most one
    document, the standard parallel-packing trade). After floor(sqrt)
    every comparison is integer, so the decision boundary replays
    exactly cross-engine.

    Scale shape: one aggregate builds the per-source table (broadcast
    — source count is small by definition), one window per source
    orders by the hash (the same per-stream-key shuffle as
    pack_sequences_running_sum; a mega-source straggler would use the
    two-phase sharding of dedup_source_quota_two_phase), one final
    aggregate. Output is the per-source audit (allocation, kept
    docs/tokens, checksum), not the kept rows — a pipeline would keep
    the per-doc flag column instead of aggregating.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
        F.md5(F.col("text")).alias("pri"),
    )
    src = tok.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    w_all = Window.partitionBy()
    alloc = (
        src.withColumn(
            "ws",
            F.floor(F.sqrt(F.col("src_tokens").cast("double"))).cast("long"),
        )
        .withColumn(
            "budget",
            F.expr("sum(src_tokens) over () * 5000L DIV 10000L"),
        )
        .withColumn("sum_ws", F.sum("ws").over(w_all))
        .select(
            "source",
            F.expr("budget * ws DIV sum_ws").alias("alloc_tokens"),
        )
    )
    run_w = (
        Window.partitionBy("source")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        tok.join(F.broadcast(alloc), "source")
        .withColumn(
            "run_before", F.coalesce(F.sum("n_tokens").over(run_w), F.lit(0))
        )
        .withColumn("kept", F.col("run_before") < F.col("alloc_tokens"))
    )
    return ranked.groupBy("source").agg(
        F.max("alloc_tokens").alias("alloc_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0)).alias(
            "tokens_kept"
        ),
        F.sum(F.when(F.col("kept"), F.col("doc_id")).otherwise(0)).alias(
            "doc_check"
        ),
    )


_DECONTAM_CUT_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, p, substring(text, CAST(p AS INTEGER), {_CSPAN_L}) AS gram
  FROM documents,
       unnest(range(1, greatest(length(text) - {_CSPAN_L} + 2, 1))) AS t(p)
),
ev AS (SELECT DISTINCT gram FROM pos WHERE doc_id % 20 = 7),
hit AS (
  SELECT doc_id, p FROM pos JOIN ev USING (gram) WHERE doc_id % 20 <> 7
),
lagged AS (
  SELECT doc_id, p,
         lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp
  FROM hit
),
grouped AS (
  SELECT doc_id, p,
         SUM(CASE WHEN pp IS NULL OR p - pp > {_CSPAN_L} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p) AS g
  FROM lagged
),
spans AS (
  SELECT doc_id, MIN(p) AS s, MAX(p) + {_CSPAN_L - 1} AS e
  FROM grouped GROUP BY doc_id, g
),
ordered AS (
  SELECT doc_id, s, e,
         lag(e) OVER (PARTITION BY doc_id ORDER BY s) AS prev_e
  FROM spans
),
train AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 7),
segs AS (
  SELECT doc_id, COALESCE(prev_e, 0) + 1 AS ss, s - 1 AS se FROM ordered
  UNION ALL
  SELECT m.doc_id, m.me + 1 AS ss, length(d.text) AS se
  FROM (SELECT doc_id, MAX(e) AS me FROM spans GROUP BY doc_id) m
  JOIN train d USING (doc_id)
  UNION ALL
  SELECT d.doc_id, 1 AS ss, length(d.text) AS se
  FROM train d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM spans)
),
numbered AS (
  SELECT doc_id, ss, se,
         row_number() OVER (PARTITION BY doc_id ORDER BY ss) AS seg_id
  FROM segs WHERE se >= ss
)
SELECT n.doc_id,
       CAST(n.seg_id AS BIGINT) AS seg_id,
       CAST(n.ss AS BIGINT) AS seg_start,
       CAST(n.se AS BIGINT) AS seg_end,
       CAST(n.se - n.ss + 1 AS BIGINT) AS seg_len,
       substring(d.text, CAST(n.ss AS INTEGER),
                 CAST(n.se - n.ss + 1 AS INTEGER)) AS seg_text
FROM numbered n JOIN train d USING (doc_id)
"""


@register(
    "contamination_cut_spans",
    oracle=_DECONTAM_CUT_ORACLE,
    tags=("mlprep", "contamination", "exact-substr", "custom-operator"),
)
def contamination_cut_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination ACTION (round 12): compose
    :func:`contamination_span_overlap`'s leaked-span detector with
    :func:`operators.dedup.cut_spans`' substring surgery and emit the
    DECONTAMINATED training corpus — each training document's kept
    segments after every span whose 50-char windows appear verbatim in
    the eval suite is cut. The same detect→cut closure
    ``dedup_cut_spans`` gives the dedup family, applied bipartite: the
    PaLM-style audit stops flagging and starts producing the corpus a
    pipeline actually trains on, cutting the leaked characters instead
    of dropping whole documents.

    Plan: the hardened hash-broadcast detector (zero train-side
    shuffle before islands) plus cut_spans' one id-keyed join and
    in-row segment zip. Exactness inherits from both halves: every
    50-gram inside a kept segment occurs nowhere in the eval suite.
    The oracle replays detection and surgery end to end from literal
    grams.
    """
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 20 == 7
    train, eval_df = d.filter(~is_eval), d.filter(is_eval)
    spans = contamination_spans(train, eval_df, "doc_id", "text", _CSPAN_L)
    return cut_spans(
        train,
        spans,
        id_col="doc_id",
        text_col="text",
        start_col="span_start",
        end_col="span_end",
    )
