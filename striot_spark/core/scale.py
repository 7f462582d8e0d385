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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot key of ``left`` across
    ``salt`` shuffle partitions by joining on ``(key, salt_id)``, with
    ``right`` replicated ``salt`` times (one copy per salt id).

    Use when one side has pathological key skew (a handful of keys own
    most rows — users behind NAT gateways, null-ish sentinel ids) AND
    the other side is too big to broadcast but small enough to
    replicate x salt. AQE's skew-join splitting (on by default,
    session.py) handles most cases without this; salting is the
    explicit tool for when a single key exceeds what one task can sort
    — AQE can split a skewed *partition*, but a sort-merge join still
    sorts each key's rows together, while salting divides the key
    itself.

    The salt id derives from a hash of the whole left row (all columns
    via ``F.hash``... on struct) so it is deterministic; replication is
    an ``explode`` of a literal range — no RNG, no extra scan of right.
    """
    from pyspark.sql import functions as F

    lsalt = F.pmod(
        F.hash(F.struct(*[F.col(c) for c in left.columns])), F.lit(salt)
    )
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, [on, "__salt"]).drop("__salt")
