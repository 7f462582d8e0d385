"""Bucketed table layout: pay a join's shuffle ONCE at write time.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the key. Bucketing amortizes that shuffle across every future
join/aggregation on the same key: `bucketBy(n, key)` hash-partitions
rows into n stable buckets AT WRITE TIME, records the spec in the
catalog, and Spark's `FileSourceScanExec` then exposes the bucket
hash-partitioning as the scan's output partitioning — so a sort-merge
join of two tables bucketed on the join key with the same bucket count
plans with ZERO `Exchange` nodes (gated in
tests/test_plan_quality.py). Aggregations keyed by the bucket column
skip their exchange the same way.

This is the Spark-native analogue of the reference's static partition
placement (`SURVEY.md §4`: the StrIoT partitioner fixes operator
placement ahead of time so runtime does no re-routing): the layout
decision is made once, declaratively, and every downstream plan
inherits it.

Operational notes encoded here:
- one file per bucket (`repartition(n, key)` before the write):
  many-files-per-bucket still avoids the exchange but forces a
  per-task merge sort of file splits; one sorted file per bucket lets
  the scan satisfy the join's sort requirement from `sortBy` order.
- tables live in an explicit `LOCATION` database, so the session's
  warehouse default (cwd-relative in a plain session) never matters.
- bucket counts must match across join sides; choose n so a bucket of
  the BIGGER table fits one task (~n = table_bytes / 256 MB at scale).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DB = "striot_buckets"
_LOCATION: str | None = None


def _ensure_db(spark: SparkSession) -> str:
    """Create the bucket database at an explicit temp LOCATION once per
    process (a plain session's default warehouse is cwd-relative and
    may not be writable where the driver runs)."""
    global _LOCATION
    if _LOCATION is None:
        _LOCATION = tempfile.mkdtemp(prefix="striot_bucket_db_")
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {_DB} LOCATION '{_LOCATION}'"
    )
    return _DB


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
) -> str:
    """Write ``df`` as a catalog-registered parquet table bucketed (and
    by default sorted) on ``bucket_col``; returns the qualified table
    name. One file per bucket; overwrites any previous version."""
    spark = df.sparkSession
    db = _ensure_db(spark)
    name = f"{db}.{table}"
    writer = (
        df.repartition(num_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(name)
    return name


def bucketed_equijoin(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two bucketed catalog tables. With matching bucket
    specs the planned join carries no Exchange on either side — the
    write-time layout IS the shuffle."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
