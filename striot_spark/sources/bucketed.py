"""Bucketed table layout for co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join (events ⋈ events,
impressions ⋈ conversions) is shuffling both sides on the join key.
Bucketing pre-shuffles ONCE at write time: both tables are hash-split
into the same number of buckets on the key and sorted within buckets, so
every later join/groupBy on that key is bucket-to-bucket — zero
exchanges, no network, sort-merge reads pre-sorted runs. The write-time
shuffle amortizes over every downstream query that touches the key.

The reference has no storage layer at all (streams exist only in flight,
SURVEY.md §2.6); this is the Spark-native replacement for its static
operator-placement idea — co-location by data layout instead of by
process pinning.

Bucket-count rule of thumb at scale: total_size / bucket_count ≈
128-512 MB per bucket file per partition; keep it a multiple of cluster
parallelism so every core reads whole buckets.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: Sequence[str],
    buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed table (parquet at ``path``,
    bucket metadata in the session catalog). Joins between tables
    bucketed the same way on the same keys need no shuffle.

    Rows are repartitioned onto the bucket keys first so each bucket
    lands as ONE file: many-files-per-bucket still avoids the join
    exchange, but forces a per-task merge of file splits, while one
    ``sort_cols``-sorted file per bucket lets the scan satisfy a
    sort-merge join's sort requirement straight from ``sortBy`` order.
    (`functions/bucketing.py:write_bucketed` is the temp-LOCATION
    catalog wrapper over this, used by the oracle-gated q132.)"""
    w = (
        df.repartition(buckets, *[F.col(k) for k in keys])
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, *keys)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its layout metadata (a plain
    ``spark.read.parquet`` of the same files would lose bucketing and
    reintroduce the shuffle)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    max_records_per_file: int | None = None,
    sort_by: Sequence[str] | None = None,
) -> None:
    """Hive-partitioned parquet write WITHOUT the small-files explosion.

    The naive ``df.write.partitionBy(cols)`` makes every task write one
    file per partition value it happens to hold: ``tasks x values``
    files — at 1000 executors over 100 languages that is ~100k tiny
    files per write, and the metadata/listing cost of tiny files
    dominates every later read. Repartitioning ON the partition columns
    first routes each value to exactly one task, so the output is one
    file per value (plus ``maxRecordsPerFile`` splits for values too
    big for one file — set it so files land near the 128-512 MB sweet
    spot). One extra shuffle at write time buys a sane file layout for
    every later scan, and partition pruning on the directory structure
    comes free.

    Skewed partition values (one language is half the corpus) are the
    one caveat: a single task writes that value. ``max_records_per_file``
    bounds the file sizes but not the task; for heavy skew add a salt
    column to ``repartition`` (``core/scale.py:salted_join`` pattern)
    at the cost of salt-many files per value.

    ``sort_by`` sorts rows WITHIN each output task before writing:
    parquet row-group min/max statistics then become tight ranges on
    those columns, so later range predicates (time windows, id ranges)
    skip whole row groups at scan time — clustering bought once at
    write, paid back on every read.
    """
    cols = list(partition_by)
    out = df.repartition(*[df[c] for c in cols])
    if sort_by:
        out = out.sortWithinPartitions(*list(sort_by))
    w = out.write
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.partitionBy(*cols).mode("overwrite").parquet(path)
