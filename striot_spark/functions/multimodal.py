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
    BinaryType,
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
