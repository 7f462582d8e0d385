"""Derived analytics library (SURVEY.md §2.5): the application-level
patterns StrIoT's example queries compute, as reusable Column/DataFrame
builders. All Catalyst-visible — no Python UDFs anywhere in this module.

Also home of the *exact-decimal* helpers: money-like doubles are summed
in integer cents so results are bit-identical regardless of aggregation
order — sums of doubles are order-sensitive, sums of longs are not.
This matters twice: (a) the DuckDB correctness oracle hash-compares
values, (b) at 100 TB partial-aggregation order is nondeterministic, so
a float sum isn't even reproducible run-to-run.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


# -- exact-decimal arithmetic ------------------------------------------------
def cents(col: Column) -> Column:
    """double dollars → long cents (deterministic: same double in, same
    long out, on any engine with IEEE754 + half-away rounding)."""
    return F.round(col * F.lit(100.0), 0).cast("long")


def sum_money(col: Column) -> Column:
    """Order-insensitive exact sum of a 2-decimal double column."""
    return F.sum(cents(col)) / F.lit(100.0)


def avg_money(col: Column) -> Column:
    return F.sum(cents(col)) / F.count(F.lit(1)) / F.lit(100.0)


def median_money(col: Column) -> Column:
    """Exact median over integer cents: interpolation of two longs is an
    exact double (x.5 at worst) — reproducible across engines."""
    return F.percentile(cents(col), 0.5) / F.lit(100.0)


def percentile_money(col: Column, p: float) -> Column:
    return F.percentile(cents(col), p) / F.lit(100.0)


def ts_str(col: Column) -> Column:
    """Canonical microsecond timestamp string (matches DuckDB strftime
    '%Y-%m-%d %H:%M:%S.%f')."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")


def day_str(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


# -- topk (Taxi.hs:160-169: topkMap . freqMap) -------------------------------
def topk(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int,
    count_alias: str = "n",
    rank_alias: str = "rnk",
) -> DataFrame:
    """Per-group top-k most frequent values: groupBy count → rank →
    filter. Pure DataFrame ops (no UDF); ties broken by value for
    determinism. The count aggregation is map-side partial, the rank
    shuffle is on the (small) counted output — this is the plan that
    survives a 100× scale-up, unlike collect-and-sort."""
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias(count_alias)
    )
    w = W.partitionBy(*group_cols).orderBy(
        F.col(count_alias).desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn(rank_alias, F.rank().over(w))
        .filter(F.col(rank_alias) <= k)
    )


def freq_map(
    df: DataFrame, group_cols: Sequence[str], value_col: str, alias: str = "n"
) -> DataFrame:
    """Frequency map / histogram per group (Taxi.hs:164-165)."""
    return df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias(alias))


# -- sessionization (WearableStreams.hs:175-189) -----------------------------
def sessionize(
    df: DataFrame,
    time_col: str,
    gap_minutes: int,
    key: Sequence[str],
    order_cols: Sequence[str] | None = None,
    session_alias: str = "session_id",
) -> DataFrame:
    """Batch gaps-and-islands sessionization: new session when the gap
    from the previous event (per key) exceeds the threshold. The
    reference builds this with streamScan; streaming mode uses Spark's
    native session_window instead (striot_spark.streaming)."""
    order = [F.col(c) for c in (order_cols or [time_col])]
    w = W.partitionBy(*key).orderBy(*order)
    prev_ts = F.lag(F.col(time_col)).over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col(time_col)) - F.unix_micros(prev_ts)) > gap_minutes * 60_000_000)
    ).cast("long")
    cum = W.partitionBy(*key).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn(session_alias, F.sum(new_session).over(cum))


# -- threshold crossing (WearableExample.hs:72-85) ---------------------------
def threshold_cross(
    df: DataFrame,
    value_col: str,
    threshold: float,
    order_cols: Sequence[str],
    key: Sequence[str] | None = None,
    prev_alias: str = "prev_value",
) -> DataFrame:
    """CEP-style crossing: previous value > threshold, current <=
    threshold (the wearable step detector's MATCH_RECOGNIZE pattern)."""
    w = W.partitionBy(*(key or [])).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(F.col(value_col)).over(w)
    return (
        df.withColumn(prev_alias, prev)
        .filter((F.col(prev_alias) > threshold) & (F.col(value_col) <= threshold))
    )


# -- latest-wins snapshot compaction (CDC / SCD type-1) ----------------------
def latest_snapshot(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Compact an append-only change log to its latest-wins snapshot:
    one row per key, carrying the payload of that key's maximally-
    ordered row — the CDC/upsert-compaction step of incremental
    ingestion (state-of-the-world from an event history, SCD type 1).

    ``order_cols`` must be a deterministic total order within each key
    (version + a unique tiebreak like the event id) or the "latest" row
    is ill-defined; all comparisons should be integral/timestamp, not
    float.

    Lowering: one groupBy with ``max_by`` on a payload struct ordered
    by an ``order_cols`` struct — a single key shuffle WITH map-side
    partial aggregation (each task pre-reduces to one candidate per
    key), which beats the window row_number form at scale: no per-key
    sort, no rank column, and the shuffle carries at most
    #tasks × #keys candidate rows instead of the full history.
    """
    pay = F.struct(*[F.col(c) for c in payload_cols])
    order = F.struct(*[F.col(c) for c in order_cols])
    picked = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.max_by(pay, order).alias("_latest")
    )
    return picked.select(
        *key_cols,
        *[F.col(f"_latest.{c}").alias(c) for c in payload_cols],
    )


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Expand an append-only change log into SCD type-2 validity
    intervals: one row per change carrying ``valid_from`` (its own
    timestamp) and ``valid_to`` (the key's NEXT change, null while
    current) — the full-history companion to ``latest_snapshot``'s
    latest-wins compaction. Any past state of the world is then a
    filter (``snapshot_asof``), not a replay.

    Ties share a timestamp but are totally ordered by
    ``tiebreak_col`` (a unique event id); an overwritten tied row gets
    an EMPTY interval [ts, ts), so as-of reads at that instant see
    exactly the last write — the same total-order contract as
    ``latest_snapshot``. Change logs with consecutive no-op updates
    can be collapsed first with ``Stream.changes``.

    Lowering: one window ``lead`` per key (partitioned by the key —
    parallel at any key cardinality; per-key history sorts locally
    within its partition). This is the one snapshot operator where a
    window beats ``max_by``: every history row is emitted, so there is
    nothing for a map-side partial to prune.
    """
    w = W.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    return df.select(
        *key_cols,
        *payload_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
    )


def snapshot_asof(history: DataFrame, asof) -> DataFrame:
    """Point-in-time read over an ``scd2_history`` table: rows whose
    validity interval contains ``asof`` (a timestamp literal/Column).
    A pure scan-side filter — time travel over 100 TB of history costs
    one pruned scan, no join, no window."""
    t = F.lit(asof) if not isinstance(asof, Column) else asof
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Diff two table snapshots into a change feed: one row per key
    that changed, with ``op`` in {'insert', 'delete', 'update'} —
    the CDC-extract inverse of ``latest_snapshot`` (which folds a
    change feed back into a snapshot).

    Equality is judged on a null-safe md5 digest of ``compare_cols``
    (16-byte compare instead of wide payloads — the digests are
    computed scan-side, so the join carries keys + digests, never
    bodies). Lowering: ONE full-outer hash equi-join on the key —
    the minimal shuffle for an arbitrary-key diff; co-partitioned or
    bucketed snapshots make it co-located. Unchanged keys drop out
    before the join output is consumed.
    """
    def digest(df: DataFrame) -> Column:
        # injection-safe: hash each column FIRST (md5 is exactly 32 hex
        # chars), then concatenate the fixed-width digests — no value
        # can shift bytes across column boundaries, and the 6-char NULL
        # sentinel can never collide with a 32-char hex digest (a
        # separator-based concat would let ("x\\x01","y") == ("x","\\x01y")
        # and a literal "\\x00null" value == NULL)
        parts: list[Column] = []
        for c in compare_cols:
            col = F.col(c)
            parts.append(
                F.coalesce(
                    F.md5(F.encode(col.cast("string"), "UTF-8")),
                    F.lit("<NULL>"),
                )
            )
        return F.md5(F.concat(*parts))

    o = old.select(
        *[F.col(k) for k in key_cols], digest(old).alias("__od")
    )
    n = new.select(
        *[F.col(k) for k in key_cols], digest(new).alias("__nd")
    )
    joined = o.join(n, list(key_cols), "full_outer")
    op = (
        F.when(F.col("__od").isNull(), F.lit("insert"))
        .when(F.col("__nd").isNull(), F.lit("delete"))
        .when(F.col("__od") != F.col("__nd"), F.lit("update"))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(*key_cols, "op")
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str,
    top_k: int = 20,
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Count-min-sketch heavy hitters with EXACT ground truth side by
    side: (token, exact_n, cms_estimate) for the top-``top_k`` tokens
    by exact count (ties broken by token string).

    The sketch hashes are md5-derived (functions/text.py:md5_hash64
    convention), so the CMS table — and therefore every estimate — is
    bit-reproducible in any engine: an APPROXIMATE structure under an
    exact oracle. Estimates are upper bounds (min over rows of
    colliding-mass counters): estimate >= exact always, with
    overestimate bounded by collision mass (Cormode & Muthukrishnan
    2005, public methodology).

    Scale shape: one token explode feeds BOTH the exact count groupBy
    (shuffles unique tokens) and the sketch build — a groupBy on
    (row, bucket) whose output is exactly ``depth x width`` rows
    regardless of vocabulary, the CMS selling point: partial aggregates
    merge by elementwise add map-side, and the finished sketch is a
    driver-literal lookup (no join) for any estimate consumer. At
    100 TB you keep the sketch and drop the exact side; here both run
    so the gate proves the sketch math itself.
    """
    from striot_spark.functions.text import md5_hash64, nonempty_tokens

    toks = df.select(
        F.explode(nonempty_tokens(F.col(text_col))).alias("tok")
    )
    bucket = lambda i: F.pmod(  # noqa: E731
        md5_hash64(F.concat(F.col("tok"), F.lit(f"#{i}"))), F.lit(width)
    )
    # ONE token explode feeds the whole sketch: each token fans out to
    # its depth (row, bucket) pairs in-row, then one groupBy counts —
    # not depth separate re-explodes of the corpus
    sketch = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row"), bucket(i).alias("pos")
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("rp")
        )
        .groupBy(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # the sketch is depth x width rows — driver-sized by construction
    table = {(r["row"], r["pos"]): r["c"] for r in sketch.collect()}
    maps = [
        F.create_map(
            *[
                c
                for (row, pos), n in sorted(table.items())
                if row == i
                for c in (F.lit(pos), F.lit(n))
            ]
        )
        for i in range(depth)
    ]
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("tok"))
        .limit(top_k)
    )
    est = F.least(
        *[F.element_at(maps[i], bucket(i)) for i in range(depth)]
    )
    return exact.select(
        "tok",
        "exact_n",
        est.cast("long").alias("cms_estimate"),
    )


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    item_col: str,
    m: int = 64,
    max_rho: int = 40,
    alpha_num: int = 709,
    alpha_den: int = 1000,
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group, every step in
    EXACT integer arithmetic — the mergeable-cardinality-sketch
    companion to ``cms_heavy_hitters`` (frequency) under the same
    design rule: an APPROXIMATE structure whose VALUE is
    bit-reproducible on any engine, because the hash is md5-derived
    and the estimate avoids floats entirely.

    Per item: bucket = h mod m, rho = trailing-zeros(h div m) + 1
    (capped at ``max_rho``; the cap also defines the empty-bucket
    power). Registers are per-(group, bucket) MAX — insensitive to
    duplicate items by construction, so no pre-distinct is needed,
    and max merges map-side like any algebraic aggregate: the shuffle
    carries at most ``m`` partial registers per group per task, never
    the item stream. The harmonic mean runs as shifted longs:

        est = (alpha_num * m^2 * 2^max_rho)
              DIV (alpha_den * Σ_b 2^(max_rho - reg_b))

    with absent buckets contributing 2^max_rho. Defaults keep every
    intermediate below 2^63 (alpha_num*m^2*2^40 ~ 3.2e18). Standard
    HLL bias correction for the small-cardinality regime (linear
    counting) is intentionally omitted — it needs a log; the estimate
    is the raw Flajolet et al. 2007 form, accurate to ~1.04/sqrt(m)
    relative error in the mid range (unit-tested against exact counts).

    Emits one row per group: ``(group_cols..., hll_est)``.
    """
    return hll_estimate(
        hll_registers(df, group_cols, item_col, m, max_rho),
        group_cols,
        m,
        max_rho,
        alpha_num,
        alpha_den,
    )


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    item_col: str,
    m: int = 64,
    max_rho: int = 40,
) -> DataFrame:
    """The mergeable half of ``hll_distinct``: per-(group, bucket) MAX
    registers. Max is algebraic, so this aggregation also runs
    unchanged as a complete-mode STREAMING aggregation (registers over
    an unbounded stream) or unions across shards — merge is just
    another max groupBy."""
    from striot_spark.functions.text import md5_hash64

    h = md5_hash64(F.col(item_col))
    rest = F.expr(f"__hll_h DIV {m}")
    rho = F.when(rest == 0, F.lit(max_rho)).otherwise(
        F.least(
            F.bit_count((rest.bitwiseAND(-rest)) - 1) + F.lit(1),
            F.lit(max_rho),
        )
    )
    return (
        df.select(
            *group_cols,
            h.alias("__hll_h"),
        )
        .select(
            *group_cols,
            F.pmod(F.col("__hll_h"), F.lit(m)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(
    regs: DataFrame,
    group_cols: Sequence[str],
    m: int = 64,
    max_rho: int = 40,
    alpha_num: int = 709,
    alpha_den: int = 1000,
) -> DataFrame:
    """Finish an ``hll_registers`` table into per-group estimates (the
    shifted-long harmonic mean; see ``hll_distinct``)."""
    if alpha_num * m * m * (1 << max_rho) >= (1 << 63):
        raise ValueError(
            "alpha_num * m^2 * 2^max_rho must stay below 2^63 "
            "(lower max_rho or m)"
        )
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {max_rho} - reg)")).alias(
            "s_obs"
        ),
    )
    num = alpha_num * m * m * (1 << max_rho)
    return per_group.select(
        *group_cols,
        F.expr(
            f"CAST({num} AS BIGINT) DIV "
            f"({alpha_den} * (s_obs + ({m} - n_obs) * "
            f"shiftleft(CAST(1 AS BIGINT), {max_rho})))"
        ).alias("hll_est"),
    )


def quantiles_at_scale(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    n_quantiles: int = 10,
) -> DataFrame:
    """EXACT quantiles of an integer column by distributed rank
    selection — the form that survives 100 TB, unlike
    ``F.percentile``/``F.median``, whose aggregation buffers every
    value of the group in one task's memory (fine for q13's bounded
    per-day groups, a non-starter for a whole-table quantile over
    billions of rows).

    Two-pass: ``global_index`` assigns each row its global rank in
    (value, tiebreak) order (range-repartitioned — no
    single-partition sort), then the ``n_quantiles + 1`` boundary
    ranks ``floor(k * (n-1) / q)`` are selected by a scan-side filter
    on the rank column. Quantiles are type-``discrete`` (an actual
    data value, no interpolation), so integer columns stay integer
    and any engine agrees exactly. Output: (quantile k, rank, value).
    """
    from striot_spark.core.scale import global_index

    spark = df.sparkSession
    n = df.count()
    if n == 0:
        return spark.createDataFrame(
            [], f"q int, rank long, {value_col} long"
        )
    wanted = [
        (k, k * (n - 1) // n_quantiles) for k in range(n_quantiles + 1)
    ]
    ranks_df = spark.createDataFrame(wanted, "q int, rank long")
    idx = global_index(
        df.select(value_col, tiebreak_col),
        [F.col(value_col).asc(), F.col(tiebreak_col).asc()],
        "rank",
    )
    return (
        idx.join(F.broadcast(ranks_df), "rank")
        .select("q", "rank", F.col(value_col))
    )


def table_digest(
    df: DataFrame,
    cols: Sequence[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Order-insensitive content digest of a table, bucketed so two
    copies can be compared without moving data — the
    replication/migration validation primitive (did the cross-region
    copy, engine migration, or compaction rewrite preserve every
    row?). Two tables are content-equal iff their digest tables are
    equal; a mismatch localizes to a bucket (~1/n_buckets of the
    data) for drill-down.

    Per row: the same injection-safe digest discipline as
    ``snapshot_diff`` (each column md5-hashed FIRST, fixed-width
    concat, '<NULL>' sentinel), folded to a 60-bit integer. Per
    bucket (= row-hash mod n_buckets): the row count and the SUM of
    row hashes mod 2^31-1 — addition is commutative/associative, so
    the digest is independent of row order, partitioning, and
    engine; unlike XOR it does NOT cancel duplicate rows (two copies
    of a row change the sum). The sum runs in decimal(38,0) (exact at
    any row count, the ``dedup_groups`` discipline) with ONE final
    mod back to a long.

    One scan + one ``n_buckets``-row aggregate; map-side partials
    carry at most n_buckets rows per task. Pass the same ``cols`` on
    both sides; restrict to columns with engine-stable string casts
    (integers/strings — float/timestamp formatting differs across
    engines).
    """
    from striot_spark.functions.text import md5_hash64

    parts: list[Column] = []
    for c in cols:
        parts.append(
            F.coalesce(
                F.md5(F.encode(F.col(c).cast("string"), "UTF-8")),
                F.lit("<NULL>"),
            )
        )
    h = md5_hash64(F.concat(*parts)) % F.lit(2147483647)
    return (
        df.select(
            F.pmod(h, F.lit(n_buckets)).alias("bucket"),
            h.alias("__h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(F.col("__h").cast("decimal(38,0)"))
                % F.lit(2147483647)
            ).cast("long").alias("digest"),
        )
    )


def group_quantiles_at_scale(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    n_quantiles: int = 4,
) -> DataFrame:
    """EXACT per-group quantiles for groups too large to buffer:
    ``F.percentile``/``median`` aggregate by collecting every value of
    the group into one task's MEMORY (fine for bounded groups, an OOM
    for a billion-row group); this form instead ranks within each group
    with a window (Spark's sort SPILLS to disk, so group size is
    bounded by executor disk, not heap) and selects the boundary ranks
    ``floor(k * (n-1) / q)`` per group with a scan-side filter.

    Discrete quantiles (actual data values): integer columns stay
    integer and any engine agrees exactly. One key shuffle (the window
    partitioning) + one tiny count join. Output: one row per
    (group, k) — ``(group_cols..., q, rank, value)``.

    The whole-table sibling is ``quantiles_at_scale`` (range-
    partitioned two-pass — no key to partition by there).
    """
    if n_quantiles < 1:
        raise ValueError("n_quantiles must be >= 1")
    w = W.partitionBy(*group_cols).orderBy(
        F.col(value_col).asc(), F.col(tiebreak_col).asc()
    )
    sizes = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    ranked = df.withColumn("rank", F.row_number().over(w) - F.lit(1))
    ks = F.explode(
        F.array(*[F.lit(k) for k in range(n_quantiles + 1)])
    ).alias("q")
    wanted = sizes.select(*group_cols, "__n", ks).select(
        *group_cols,
        "q",
        F.expr(f"CAST(q * (__n - 1) DIV {n_quantiles} AS BIGINT)").alias(
            "rank"
        ),
    )
    # no forced broadcast: `wanted` is n_groups x (n_quantiles+1) rows,
    # which can exceed driver memory at extreme group cardinality - let
    # the planner/AQE pick broadcast when it actually fits
    return ranked.join(wanted, [*group_cols, "rank"]).select(
        *group_cols, "q", "rank", F.col(value_col)
    )


def funnel(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Ordered conversion funnel: for each entity, the earliest
    timestamp at which each stage completes *strictly after the
    previous stage* (the sequenced CEP pattern A then B then C — a
    later 'view' after the first 'click' does not reopen stage one).
    Null from the first incomplete stage onward.

    Lowering: one conditional-min aggregation per stage, each keyed by
    the entity — stage k's aggregation takes ``min(ts) WHERE type =
    stages[k] AND ts > t_{k-1}``, with ``t_{k-1}`` equi-joined back
    from the previous round (one row per entity — broadcast-sized for
    bounded entity sets, AQE picks). len(stages) key shuffles of
    (entity, ts) pairs; no window over full histories, no collect.
    For funnels over billions of entities each aggregation is map-side
    partial and the joined state is one row per entity.

    Emits (key_cols..., t_<stage> for each stage).
    """
    keys = list(key_cols)
    out = df.select(*keys).distinct()
    prev: str | None = None
    for st in stages:
        cond = F.col(type_col) == st
        if prev is not None:
            # join ONLY the entities still alive in the funnel, and only
            # their previous-stage time - entities eliminated upstream
            # (and the other accumulated t_ columns) stay out of the
            # per-stage shuffle
            alive = out.filter(F.col(prev).isNotNull()).select(
                *keys, F.col(prev)
            )
            src = df.join(alive, keys)
            cond = cond & (F.col(ts_col) > F.col(prev))
        else:
            src = df
        stage_ts = (
            src.filter(cond)
            .groupBy(*keys)
            .agg(F.min(ts_col).alias(f"t_{st}"))
        )
        out = out.join(stage_ts, keys, "left")
        prev = f"t_{st}"
    return out


def retention_cohorts(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    origin: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: entities grouped by their FIRST-active
    period (cohort), counted in every later period they return —
    ``(cohort, period_offset, n_active)``, the classic
    product-analytics triangle, in pure integer period arithmetic
    (``datediff DIV period_days`` from a fixed origin; no float ages).

    ``origin`` should be at or before the earliest event: both engines
    TRUNCATE integer division (Spark ``DIV`` and DuckDB ``//`` agree,
    including for negatives), so pre-origin days -(period-1)..+(period-1)
    would fold into one double-width period 0 — pick the origin, don't
    let data precede it.

    Lowering: one key groupBy for first-activity periods, one distinct
    over (entity, period) — which already dedups multi-event periods,
    so the final cell count is a plain ``count(*)`` — and one key
    equi-join between two entity-sized tables. Three key shuffles
    total, map-side partials everywhere; nothing scales with events
    per entity beyond the first scan.
    """
    keys = list(key_cols)
    wk = F.expr(
        f"datediff({ts_col}, '{origin}') DIV {int(period_days)}"
    ).alias("__wk")
    acts = df.select(*keys, wk).distinct()
    first = acts.groupBy(*keys).agg(F.min("__wk").alias("cohort"))
    return (
        acts.join(first, keys)
        .groupBy(
            "cohort",
            (F.col("__wk") - F.col("cohort")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def ohlc_bars(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Downsample to open/high/low/close bars per bucket: open/close
    are min_by/max_by on a caller-supplied total-order column (build
    it as ``F.struct(ts, unique_id)``), so the whole bar is ONE
    groupBy with map-side partials — each task pre-reduces to a
    candidate bar per bucket and the shuffle carries bars, not ticks.
    Shared by q161 (full bars) and q162 (close-only for gap-fill)."""
    return df.groupBy(bucket_col).agg(
        F.min_by(F.col(value_col), F.col(order_col)).alias("open_c"),
        F.max(value_col).alias("high_c"),
        F.min(value_col).alias("low_c"),
        F.max_by(F.col(value_col), F.col(order_col)).alias("close_c"),
        F.count(F.lit(1)).alias("n"),
    )


def grain_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str],
    grains: Sequence[str] = ("minute", "hour", "day"),
) -> DataFrame:
    """Multi-resolution time rollup where every coarser grain is
    RE-AGGREGATED from the next finer grain's partials — the
    hypertable / continuous-aggregate serving pattern: raw data is
    scanned exactly once (for the finest grain); hour bars are sums of
    minute bars, day bars sums of hour bars. Correct because (count,
    integer-cents sum) is algebraic: combine(partials) == agg(raw).

    Contrast q54's ROLLUP grouping sets (dimension hierarchy in one
    pass): here the hierarchy is the TIME axis and the point is
    partial reuse — at 100 TB you materialize the minute level once
    and serve every coarser resolution from aggregates that are
    orders of magnitude smaller than the raw table, never rescanning
    it. Each non-final level is persisted so the union of levels
    really does read the finer partials instead of re-deriving them.

    Output: one row per (grain, bucket, *key_cols) with exact ``n``
    and integer-cents ``sum_c``; ``bucket`` stays a timestamp (caller
    formats).
    """
    from striot_spark.functions.caching import track_persist

    cur = track_persist(
        df.groupBy(
            F.date_trunc(grains[0], F.col(ts_col)).alias("bucket"),
            *key_cols,
        ).agg(
            F.sum(cents(F.col(value_col))).alias("sum_c"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    levels = [(grains[0], cur)]
    for g in grains[1:]:
        nxt = cur.groupBy(
            F.date_trunc(g, F.col("bucket")).alias("bucket"), *key_cols
        ).agg(F.sum("sum_c").alias("sum_c"), F.sum("n").alias("n"))
        if g != grains[-1]:
            nxt = track_persist(nxt)
        levels.append((g, nxt))
        cur = nxt
    out = None
    for g, lv in levels:
        piece = lv.select(
            F.lit(g).alias("grain"),
            F.col("bucket"),
            *key_cols,
            F.col("n"),
            F.col("sum_c"),
        )
        out = piece if out is None else out.unionByName(piece)
    return out


def apply_changes(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str],
    op_col: str,
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """Apply a CDC change log WITH delete tombstones to a final
    snapshot: per key, the maximally-ordered log row wins; if that row
    is a delete op the key is absent from the result (the
    Debezium-tombstone semantics ``latest_snapshot`` lacks). Also
    emits ``n_changes``, the log depth per surviving key.

    Same scale contract as ``latest_snapshot``: ONE key shuffle with
    map-side partial aggregation — every task pre-reduces its slice to
    one candidate row per key, so the shuffle carries candidates, not
    history, and a deleted key costs one candidate row. The tombstone
    filter runs AFTER the aggregate (a delete only wins if nothing
    newer follows it), which a pre-filter would get wrong.
    """
    pay = F.struct(
        F.col(op_col).alias("_op"), *[F.col(c) for c in payload_cols]
    )
    order = F.struct(*[F.col(c) for c in order_cols])
    g = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.max_by(pay, order).alias("_last"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    live = g.filter(~F.col("_last._op").isin(list(delete_ops)))
    return live.select(
        *key_cols,
        *[F.col(f"_last.{c}").alias(c) for c in payload_cols],
        "n_changes",
    )


def winsorized_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    n_quantiles: int = 20,
    k_lo: int = 1,
    k_hi: int = 19,
) -> DataFrame:
    """Per-group winsorized statistics: clamp each value into the
    [k_lo/n_q, k_hi/n_q] quantile band (defaults: p05..p95) before
    summing — the outlier-robust aggregate a metrics/feature pipeline
    wants when a handful of extreme rows would otherwise dominate the
    mean. Also counts how many rows were clamped on each side.

    Boundaries are EXACT discrete quantiles from
    ``group_quantiles_at_scale`` (rank ``k*(n-1) DIV n_q`` in
    (value, tiebreak) order — spill-safe window rank, no per-group
    value buffering), so every engine picks identical boundary values
    and the clamped integer sum is engine-exact. The per-group
    boundary table (one row per group) joins back and the clamp runs
    in the final aggregate's scan — two key shuffles total beyond the
    quantile machinery, nothing buffers a group in memory.
    """
    qs = group_quantiles_at_scale(
        df, group_cols, value_col, tiebreak_col, n_quantiles
    )
    v = F.col(value_col)
    b = (
        qs.filter(F.col("q").isin(k_lo, k_hi))
        .groupBy(*group_cols)
        .agg(
            F.min(F.when(F.col("q") == k_lo, v)).alias("_lo"),
            F.min(F.when(F.col("q") == k_hi, v)).alias("_hi"),
        )
    )
    j = df.join(b, list(group_cols))
    clamped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return j.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(clamped).alias("wsum"),
        F.sum((v < F.col("_lo")).cast("long")).alias("n_lo"),
        F.sum((v > F.col("_hi")).cast("long")).alias("n_hi"),
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    weight_col: str,
    ps: Sequence[int] = (25, 50, 75),
) -> DataFrame:
    """Exact WEIGHTED quantiles of ``value_col`` under non-negative
    integer weights: for each percentile p, the first value (in
    (value, tiebreak) total order) whose inclusive cumulative weight
    reaches p% of the total — e.g. the token-weighted median document
    length ("half the corpus' tokens sit in docs this long or
    shorter"), which an unweighted median badly misstates when long
    docs dominate the token mass.

    Scale lowering: the cumulative weight comes from the two-pass
    range-partitioned ``global_prefix_sum`` (never an Exchange
    SinglePartition), the 1-row total broadcasts, and because the
    qualifying rows form a SUFFIX of the order (weights >= 0 make the
    running sum nondecreasing), each percentile's answer is a plain
    min over that suffix — one map-side-combined aggregate, no second
    sort. All-integer arithmetic (cw*100 >= p*total), engine-exact.
    """
    from striot_spark.core.scale import global_prefix_sum

    ps_df = global_prefix_sum(
        df.select(value_col, tiebreak_col, weight_col),
        [value_col, tiebreak_col],
        weight_col,
        "cw",
    )
    tot = ps_df.agg(F.sum(F.col(weight_col)).alias("tw"))
    e = ps_df.crossJoin(F.broadcast(tot)).select(
        "*",
        F.explode(F.array(*[F.lit(int(p)) for p in ps])).alias("p"),
    )
    q = e.filter(F.col("cw") * 100 >= F.col("p") * F.col("tw"))
    return q.groupBy("p").agg(
        F.min(F.col(value_col)).alias("value"),
        F.min(F.col("cw")).alias("cum_w"),
        F.min(F.col("tw")).alias("total_w"),
    )


def burst_flags(counts: DataFrame, key_col: str, bucket_col: str) -> DataFrame:
    """Sliding-median rate-burst flags over a (key, bucket, n) count
    table: flag buckets whose count exceeds 1.5x the exact lower
    median of the up-to-7 preceding active buckets (integer
    cross-multiplication 2n > 3*med; >= 4 samples required). Shared by
    the batch (q196) and streaming (q206) monitors so both forms stay
    provably identical; each row's median sorts <= 7 values in-row and
    the window runs over the bounded count table, never raw events."""
    w = (
        W.partitionBy(key_col)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(-7, -1)
    )
    prev = F.array_sort(F.collect_list(F.col("n")).over(w))
    sel = counts.select(
        key_col, bucket_col, "n", prev.alias("prev")
    ).select(
        key_col,
        bucket_col,
        "n",
        F.expr("prev[CAST((size(prev) + 1) / 2 AS INT) - 1]").alias(
            "med_prev"
        ),
        F.size(F.col("prev")).alias("np"),
    )
    return sel.filter(
        (F.col("np") >= 4) & (2 * F.col("n") > 3 * F.col("med_prev"))
    ).select(
        key_col,
        ts_str(F.col(bucket_col)).alias("bucket"),
        "n",
        "med_prev",
    )


def binned_quantile_serve(
    counts: DataFrame,
    bin_col: str = "bin",
    n_col: str = "n_rows",
    ticks: int = 10,
) -> DataFrame:
    """Quantile RECONSTRUCTION from additive bin counts — the serving
    side of streaming approximate quantiles: exact quantiles are not
    mergeable, but fixed-width bin counts are (pure addition), so a
    stream maintains (bin, count) via the incremental delta-merge sink
    and this derives the q/ticks quantile BINS from that snapshot.
    Resolution is the bin width; within it the answer is exact rank
    selection (the same 0-based ``(q * (N-1)) DIV ticks`` target ranks
    as ``quantiles_at_scale``).

    Scale lowering: the counts table is #bins rows (domain/width —
    bounded, snapshot-sized, NOT data-sized), so the cumulative window
    over it is a bounded single-partition pass by construction. Each
    bin then emits the quantile indices it covers by an IN-ROW integer
    sequence explode — q is covered by the bin holding rank
    ``(q*(N-1)) DIV ticks``, i.e. ``ceil(ticks*(cum-n)/(N-1)) <= q <=
    (ticks*cum - 1) DIV (N-1)`` — zero joins beyond the broadcast of
    the 1-row total, no inequality join anywhere. Returns (q, bin),
    one row per covered quantile index. N=1 is special-cased (every
    quantile index maps to the single bin — the same limit the
    oracle's range-join form produces).
    """
    from pyspark.sql import Window as W

    w = W.orderBy(F.col(bin_col).asc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    c = counts.select(
        F.col(bin_col).alias("bin"), F.col(n_col).alias("n")
    ).withColumn("cum", F.sum("n").over(w))
    tot = c.agg(F.sum("n").alias("__nt"))
    t = ticks
    # N=1 degenerates (every quantile is the single value, and the
    # N-1 denominators vanish): special-case it to the full tick
    # range so the result matches rank selection's limit behavior
    # instead of silently emitting nothing
    bounded = (
        c.join(F.broadcast(tot))
        .withColumn(
            "__qlo",
            F.when(F.col("__nt") == 1, F.lit(0).cast("long")).otherwise(
                F.expr(f"({t} * (cum - n) + __nt - 2) DIV (__nt - 1)")
            ),
        )
        .withColumn(
            "__qhi",
            F.when(
                F.col("__nt") == 1, F.lit(t).cast("long")
            ).otherwise(
                F.expr(
                    f"least(CAST({t} AS BIGINT), "
                    f"({t} * cum - 1) DIV (__nt - 1))"
                )
            ),
        )
        .filter(F.col("__qhi") >= F.col("__qlo"))
    )
    return bounded.select(
        F.explode(F.sequence(F.col("__qlo"), F.col("__qhi"))).alias("q"),
        "bin",
    ).select(F.col("q").cast("long"), "bin")


def equidepth_histogram(
    df: DataFrame,
    value_col,
    tiebreak_col,
    bins: int = 10,
) -> DataFrame:
    """EXACT equi-depth histogram — the sibling of the equi-width form
    (q183): instead of fixed-width bins with varying counts, each of
    ``bins`` buckets holds floor/ceil(N/bins) rows exactly, with
    boundaries wherever the data density puts them — the binning
    feature stores and selectivity estimators want on skewed columns,
    where equi-width collapses most rows into one bar.

    Exact and engine-reproducible: bucket = ``global_rank * bins DIV
    N`` under the (value, tiebreak) total order — a pure integer
    function of the rank, so ties split deterministically and both
    engines agree row for row. The rank comes from ``global_index``'s
    two-pass range-partitioned numbering (no single-partition sort —
    the q147 scale argument), and the per-bucket reduction is one
    map-side-combined groupBy over ``bins`` groups. The only
    driver-side value is the scalar row count. Returns (bucket,
    n_rows, lo, hi).
    """
    from striot_spark.core.scale import global_index

    n = df.count()
    if n == 0:
        raise ValueError("equidepth_histogram: empty input")
    vt = df.select(
        F.col(value_col).alias("__v") if isinstance(value_col, str)
        else value_col.alias("__v"),
        F.col(tiebreak_col).alias("__tb") if isinstance(tiebreak_col, str)
        else tiebreak_col.alias("__tb"),
    )
    idx = global_index(vt, ["__v", "__tb"], "__rank")
    return (
        idx.groupBy(
            F.expr(f"__rank * {bins} DIV {n}").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
        )
    )
