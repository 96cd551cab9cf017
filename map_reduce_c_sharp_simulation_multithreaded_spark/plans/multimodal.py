"""Multimodal-column queries (LLM-pipeline surface, north star §2.4).

Binary payload metadata is oracle-checked (byte length, sha256, first
byte — all JVM-side). The mapInPandas feature extractor's fake decode
is sha-digest arithmetic, so it is oracle-checked too; the real decode
stays import-gated behind ``use_real_decode``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import (
    arrow_doc_stats,
    attach_binary_payload,
    extract_features,
)
from ..session import pin_session
from .registry import register


@register(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha,
       CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
FROM documents
""",
    tags=("multimodal", "binary"),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads: byte length, content hash,
    leading byte — all computed on the ``binary`` column JVM-side."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
        F.ascii(F.substring("text", 1, 1)).cast("int").alias("first_byte"),
    )


@register(
    "arrow_batch_doc_stats",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT) AS n_e
FROM documents
""",
    tags=("multimodal", "mapInArrow", "custom-operator"),
)
def arrow_batch_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` document stats: byte length, char length,
    substring occurrence count — all vectorized pyarrow.compute
    kernels on RecordBatches, no pandas conversion. Deterministic, so
    it carries a full oracle (unlike the decode stub)."""
    pin_session(spark)
    return arrow_doc_stats(load_table(spark, sf_dir, "documents"))


@register(
    "multimodal_decode_features",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha,
       CAST(CAST('0x' || substr(sha256(text), 1, 2) AS INT) % 128 + 1
            AS INT) AS width,
       CAST(CAST('0x' || substr(sha256(text), 3, 2) AS INT) % 128 + 1
            AS INT) AS height,
       CAST(CAST('0x' || substr(sha256(text), 5, 2) AS INT) % 3 + 1
            AS INT) AS channels
FROM documents
""",
    tags=("multimodal", "mapInPandas", "custom-operator"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: attach binary payload → Arrow
    mapInPandas feature extraction (the real decode is import-gated,
    see operators/multimodal.py). The fake decode's pseudo-dimensions
    are pure sha256-digest-byte arithmetic, so DuckDB reproduces them
    exactly from the hex digest — a full cross-engine oracle over a
    mapInPandas path (the UDF is the implementation, not the
    contract)."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(d, "text", "doc_id")
    return extract_features(with_payload)


@register(
    "multimodal_resize_plan",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         CAST('0x' || substr(sha256(text), 1, 2) AS INT) % 128 + 1 AS w,
         CAST('0x' || substr(sha256(text), 3, 2) AS INT) % 128 + 1 AS h,
         CAST('0x' || substr(sha256(text), 5, 2) AS INT) % 3 + 1 AS c
  FROM documents
)
SELECT doc_id,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(c AS INT) AS channels,
       CAST(GREATEST(1, (w * 64) // GREATEST(w, h)) AS INT) AS out_w,
       CAST(GREATEST(1, (h * 64) // GREATEST(w, h)) AS INT) AS out_h
FROM dims
""",
    tags=("multimodal", "mapInPandas", "custom-operator"),
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail-resize planning over binary payloads: fake-decode the
    dimensions, fit them in a 64-box with integer floor scaling by the
    longer edge (clamped ≥1). All integer math on digest-derived dims,
    so DuckDB re-derives the exact plan from the hex digest; the
    pixel-level resample is the import-gated step, the PLAN is the
    tested contract (positive operands, so DuckDB's flooring // and
    Python's // agree)."""
    pin_session(spark)
    from ..operators.multimodal import resize_plan

    d = load_table(spark, sf_dir, "documents")
    return resize_plan(attach_binary_payload(d, "text", "doc_id"))


@register(
    "multimodal_frame_sample",
    oracle="""
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, (length(text) + 255) // 256)) AS fi
  FROM documents
)
SELECT doc_id,
       CAST(fi AS BIGINT) AS frame_idx,
       md5(substr(text, CAST(fi * 256 + 1 AS INT), 256)) AS frame_md5,
       CAST(length(substr(text, CAST(fi * 256 + 1 AS INT), 256))
            AS BIGINT) AS n_chars
FROM f WHERE fi % 4 = 0
""",
    tags=("multimodal", "mapInPandas", "custom-operator"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe sampling over simulated video payloads: fixed
    256-char frames, every 4th kept, one output row per sampled frame
    (the 1→N fan-out mapInPandas shape video curation needs). The
    frame digest is md5 over the exact char slice — both engines hash
    the same utf-8 bytes of the same substring, so the oracle covers
    the fan-out, the sampling stride, and the ragged tail frame."""
    pin_session(spark)
    from ..operators.multimodal import frame_sample

    d = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_binary_payload(d, "text", "doc_id"))
