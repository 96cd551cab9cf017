"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are opaque ``binary`` columns with a typed
metadata struct alongside; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row objects. The decode libraries (PIL/torchaudio/av) are NOT in this
container, so the real decode is gated behind an import-try and the
pipeline ships a deterministic fake extractor — the Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, payload_sha string, width int, height int, "
    "channels int"
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Simulate a media column: utf-8 bytes payload + typed metadata.

    In a real pipeline the payload comes from the lakehouse (parquet
    binary / object-store pointers); everything downstream only assumes
    ``binary`` + metadata, which is why the simulation is faithful.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _real_decode(payload: bytes) -> tuple[int, int, int]:
    """Actual media decode — requires libs not present in this image."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - exercised by design
        raise NotImplementedError(
            "media decode requires PIL/torchaudio; not available in this "
            "container — deterministic fake features are used instead"
        ) from exc
    raise NotImplementedError("real decode path reserved for image builds")


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: pseudo width/height/channels
    derived from the payload hash (stable across runs/executors)."""
    h = hashlib.sha256(payload).digest()
    return (h[0] % 128 + 1, h[1] % 128 + 1, (h[2] % 3) + 1)


def extract_features(df: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: one pandas batch in, one out, no per-row pickling.
    Columns in: (doc_id, payload, meta); out: FEATURE_SCHEMA.
    """
    decode = _real_decode if use_real_decode else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "payload_sha": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


ARROW_STATS_SCHEMA = "doc_id long, n_bytes long, n_chars long, n_e long"


def arrow_doc_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Columnar batch stats via ``mapInArrow`` — the zero-copy sibling
    of mapInPandas: Arrow RecordBatches in and out, no pandas
    materialization at all, every op a vectorized pyarrow.compute
    kernel. This is the shape for Python batch processors that never
    need row objects (tokenizer fleets, feature hashers)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def run(batches):
        for batch in batches:
            names = batch.schema.names
            text = batch.column(names.index(text_col))
            doc_id = batch.column(names.index("doc_id"))
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(doc_id, pa.int64()),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, "e"), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_chars", "n_e"],
            )

    return df.select("doc_id", text_col).mapInArrow(run, ARROW_STATS_SCHEMA)
