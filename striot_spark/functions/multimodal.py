"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns beside typed
metadata structs. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partitioning — is real and tested; the actual
codec step is stubbed (decode libraries are not in this container) behind
``decode_stub`` / ``NotImplementedError``, clearly marked.

At scale: binary payloads ride in their own parquet column (column
pruning keeps metadata-only queries from touching bytes at all);
``mapInPandas`` streams Arrow batches so a 100 MB image row group never
materializes as Python objects row-by-row.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from striot_spark.core.scale import scatter
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("digest", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def to_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap a column as an opaque media payload: (id, bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(payload_col), "UTF-8").cast(BinaryType()).alias("media"),
    )


def real_decode(payload: bytes) -> tuple[int, int]:
    """The genuine codec step — requires an image library not present in
    this environment. STUB: see decode_stub for the deterministic fake
    used by tests and the oracle-checked query."""
    raise NotImplementedError(
        "image/audio decode requires codec libraries not installed here; "
        "wire Pillow/ffmpeg here in a real deployment"
    )


def decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions derived from the content
    digest, so every engine (and the DuckDB oracle) agrees."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return 16 + h % 1024, 16 + (h // 1024) % 1024


def extract_media_meta(media_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    Input: (doc_id long, media binary). Output: MEDIA_META_SCHEMA.
    This is the canonical shape for decode / resize / frame-sample
    operators: swap the per-batch body, keep the plumbing.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            dims = [decode_stub(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return scatter(media_df).mapInPandas(fn, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("media", BinaryType()),
    ]
)


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: real deployments wire an image codec
    here (see real_decode). The stub keeps the byte-volume semantics —
    output size proportional to the target area — so partition-size
    planning behaves like the real operator."""
    target = max(1, (width * height) // 64)
    reps = target // max(1, len(payload)) + 1
    return (payload * reps)[:target]


def resize_media(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize: (doc_id, media) → (doc_id, width, height,
    media). Arrow streams binary batches; no row-at-a-time Python."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "media": pdf["media"].map(
                        lambda b: resize_stub(bytes(b), width, height)
                    ),
                }
            )

    return scatter(media_df).mapInPandas(fn, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(media_df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """mapInPandas frame sampling: one input row (a 'video' payload)
    fans out to many frame rows — the row-multiplying shape of a frame
    extractor. The stub slices fixed-size byte windows; a real deployment
    decodes at timestamps. Output is (doc_id, frame_idx, frame)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(payload)
                for i in range(0, max(1, len(b)), every_n_bytes):
                    ids.append(doc_id)
                    idxs.append(i // every_n_bytes)
                    frames.append(b[i : i + every_n_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return scatter(media_df).mapInPandas(fn, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def embed_stub(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake encoder: byte-histogram folded to ``dim``
    buckets, L1-normalized. Real deployments wire a vision/audio model
    forward pass here (the import-gated pattern of ``real_decode``);
    the stub keeps the numeric shape — dense float vector, unit mass —
    and is a pure function of the bytes, so outputs are reproducible
    and testable cross-engine."""
    counts = [0] * dim
    for byte in payload:
        counts[byte % dim] += 1
    total = max(1, len(payload))
    return [c / total for c in counts]


def extract_features(media_df: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas media→embedding: (doc_id, media) → (doc_id,
    features[dim]) — the encode step that bridges binary media columns
    into the similarity/ANN operators (`functions/similarity.py`):
    decode → embed here, then nearest_centroid / IVF / LSH downstream
    operate on the vector column exactly as they do on text embeddings.

    Arrow streams the binary batches; feature vectors are built
    vectorized per batch. One scan of the media, no shuffle — at 100 TB
    the encode pass is embarrassingly parallel and the expensive model
    forward is the per-row cost, not the plumbing."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": pdf["media"].map(
                        lambda b: embed_stub(bytes(b), dim)
                    ),
                }
            )

    return scatter(media_df).mapInPandas(fn, schema=FEATURE_SCHEMA)
