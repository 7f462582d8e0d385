"""Interchange formats beyond parquet: ORC and JSON-lines.

The reference's only wire format is its JSON event serde
(`Nodes/TCP.hs` / `Nodes/Kafka.hs` — one JSON object per event); at
rest it has no storage layer at all. This module fills the at-rest
side Spark-natively:

- **ORC**: the second columnar format large estates actually hold
  (Hive-era lakes). Spark's reader/writer is built in; predicate
  pushdown and column pruning work exactly as with parquet, so an ORC
  corpus plugs into every operator here unchanged.
- **JSON-lines**: the interchange format of dataset releases (one doc
  per line). Schemaless on disk — reads MUST pass the schema: schema
  inference costs a full extra scan at 100 TB and silently widens
  types (ints arriving as bigints, timestamps as strings). The JSONL
  reader with a dead-letter channel lives in `sources/csv.py`
  (`read_jsonl_dead_letter`, q98); this writer is its producing side.

Round-trip caveats (tested in tests/test_sources_functions.py):
ORC preserves Spark types exactly; JSONL serializes timestamps as ISO
strings (microsecond precision — Spark's JSON writer default) and
restores them only because the read schema says TimestampType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


# Spark's JSON writer DEFAULT truncates timestamps to milliseconds —
# the same silent-precision-loss pitfall the Kafka serde guards
# (streaming/runtime.py:kafka_json_serde); pin microseconds explicitly
# on both sides of the hop.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """One JSON object per line per row (the dataset-release format).
    Column order inside each object follows the schema; floats keep
    shortest-round-trip repr; timestamps serialize as ISO-8601 with
    MICROSECOND precision (the writer's millisecond default is
    overridden — see ``_TS_FMT``)."""
    df.write.mode(mode).option("timestampFormat", _TS_FMT).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Schema-REQUIRED JSONL read — see module docstring for why
    inference is banned at scale. For malformed-line tolerance use
    ``sources/csv.py:read_jsonl_dead_letter`` instead."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )
