"""Scale hygiene helpers.

``scatter`` fixes the small-input parallelism trap: a tiny parquet file
arrives as ONE partition, so a CPU-heavy per-row projection (md5 passes,
HOF folds, mapInPandas codecs) runs on one core of a 32-core machine.
Repartitioning costs one cheap shuffle of the small input and buys full
parallelism. At real scale (100 TB → thousands of input partitions) the
guard makes it a no-op — it never adds a shuffle to a well-partitioned
input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scatter(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism * multiple``
    partitions iff it currently has fewer — use right before CPU-heavy
    per-row work. No-op on inputs that already have enough partitions.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiple
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
