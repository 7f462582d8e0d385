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

SMALL_INPUT_CONF = "striot.globalIndex.smallInputBytes"
SMALL_INPUT_DEFAULT = 64 * 1024 * 1024  # one comfortable task


def _estimated_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimizer size estimate (same statistic broadcast-join
    planning uses). Conservative: without CBO, a Filter inherits its
    child's size, so this never under-estimates a big input."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - py4j edge
        return None


def is_small_input(df: DataFrame) -> bool:
    """The shared small-input gate: True iff Catalyst's size estimate
    for ``df`` is at or under ``striot.globalIndex.smallInputBytes``
    (default 64 MB). Used by ``global_index`` / ``global_prefix_sum``
    to pick the plain one-task form. (``functions/graph.py``'s
    iterative ops use their own edge-ROW-count gate — SMALL_GRAPH_CONF
    via ``e.count()`` — because a graph's cost scales with edge count
    across iterations, not the byte size of one scan, and the exact
    count is already materialized when the edge list is persisted.)"""
    spark = df.sparkSession
    try:
        small = int(
            spark.conf.get(SMALL_INPUT_CONF, str(SMALL_INPUT_DEFAULT))
        )
    except ValueError:
        small = SMALL_INPUT_DEFAULT
    est = _estimated_bytes(df)
    return est is not None and est <= small


def global_index(
    df: DataFrame,
    order_cols: list,
    out_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Scale-safe global 0-based row numbering by ``order_cols`` — the
    fallback for zip-join / sample / chop when the stream has no dense
    seq column.

    A bare ``row_number() OVER (ORDER BY ...)`` funnels the whole input
    through ONE task (``Exchange SinglePartition`` + single sort) — a
    non-starter at 100 TB. This is the zipWithIndex-style two-pass form:

      1. range-repartition on the order key (parallel distributed sort;
         ``localCheckpoint`` pins the sampled range bounds so both
         downstream actions see identical partition assignment),
      2. count rows per partition (#partitions rows to the driver) and
         prefix-sum them into per-partition start offsets,
      3. local ``row_number`` within each range partition (window keyed
         by ``spark_partition_id`` — parallel, no single-partition
         exchange) plus the broadcast-joined offset.

    Ties in ``order_cols`` get an arbitrary but stable order, same
    contract as the single-sort form. Cost: one range shuffle + one
    pid-keyed shuffle, both fully parallel.

    Small inputs skip all of that: if Catalyst's size estimate is at or
    under ``striot.globalIndex.smallInputBytes`` (default 64 MB), the
    whole input is one comfortable task even on a 1000-executor cluster,
    and the two-pass form's extra jobs (range sample, checkpoint
    materialization, count collect) are pure overhead — so the gate picks
    the plain one-task sort, exactly how broadcast-join planning gates on
    ``autoBroadcastJoinThreshold``. Set the conf to 0 to force the
    two-pass path (the plan-quality tests do).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    spark = df.sparkSession
    if is_small_input(df):
        w = W.orderBy(*order_cols)
        return df.withColumn(out_col, F.row_number().over(w) - F.lit(1))
    n = partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        df.rdd.getNumPartitions(),
    )
    pid = "__gidx_pid__"
    base = (
        df.repartitionByRange(n, *order_cols)
        .withColumn(pid, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r[0], r[1]) for r in base.groupBy(pid).count().collect()
    )
    offsets, acc = [], 0
    for p, c in counts:
        offsets.append((p, acc))
        acc += c
    if len(offsets) <= 1:
        w = W.partitionBy(F.lit(1)).orderBy(*order_cols)
        return base.drop(pid).withColumn(
            out_col, F.row_number().over(w) - F.lit(1)
        )
    off_df = spark.createDataFrame(
        offsets, f"{pid} int, __gidx_off__ long"
    )
    w = W.partitionBy(pid).orderBy(*order_cols)
    return (
        base.join(F.broadcast(off_df), pid)
        .withColumn(
            out_col,
            F.row_number().over(w) - F.lit(1) + F.col("__gidx_off__"),
        )
        .drop(pid, "__gidx_off__")
    )


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


def global_prefix_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Scale-safe global running sum of ``value_col`` in ``order_cols``
    order (inclusive of the current row) — the cumulative-total
    primitive behind budgeted selection (keep documents until a token
    budget is exhausted).

    Same two-pass shape as ``global_index`` — a bare
    ``sum() OVER (ORDER BY ...)`` is an ``Exchange SinglePartition``:

      1. range-repartition on the order key (localCheckpoint pins the
         sampled range bounds across the two downstream actions),
      2. per-partition SUM of ``value_col`` (#partitions rows to the
         driver), prefix-summed into per-partition starting totals,
      3. within-partition running sum (window keyed by partition id —
         parallel) plus the broadcast-joined start.

    Small inputs take the plain one-task window, gated by the same
    ``striot.globalIndex.smallInputBytes`` conf as ``global_index``.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    spark = df.sparkSession
    run = F.sum(F.col(value_col))
    if is_small_input(df):
        w = W.orderBy(*order_cols).rowsBetween(W.unboundedPreceding, 0)
        return df.withColumn(out_col, run.over(w))
    n = partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        df.rdd.getNumPartitions(),
    )
    pid = "__gps_pid__"
    base = (
        df.repartitionByRange(n, *order_cols)
        .withColumn(pid, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = sorted(
        (r[0], r[1])
        for r in base.groupBy(pid)
        .agg(F.sum(F.col(value_col)).alias("s"))
        .collect()
    )
    starts, acc = [], 0
    for p, s in totals:
        starts.append((p, acc))
        acc += int(s or 0)
    if len(starts) <= 1:
        w = (
            W.partitionBy(F.lit(1))
            .orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        return base.drop(pid).withColumn(out_col, run.over(w))
    start_df = spark.createDataFrame(
        starts, f"{pid} int, __gps_start__ long"
    )
    w = (
        W.partitionBy(pid)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(start_df), pid)
        .withColumn(out_col, run.over(w) + F.col("__gps_start__"))
        .drop(pid, "__gps_start__")
    )
