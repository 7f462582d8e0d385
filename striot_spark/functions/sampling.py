"""Deterministic sampling for training-data pipelines.

Production corpus construction needs *reproducible* sampling — the same
document set on every run, resumable after failure, auditable. RNG-based
``df.sample`` gives none of that (and its draws depend on partitioning).
Both operators here derive keep/drop decisions from an md5 hash of the
row id, so they are pure functions of the data:

- ``hash_sample``: per-stratum keep *rates*. A pure projection + filter —
  a 100 TB sampling pass is ONE parquet scan with ZERO shuffles, and the
  filter sits right on top of the scan for Catalyst to push down.
- ``reservoir_sample``: exactly n rows per stratum, chosen as the n
  smallest id-hashes (a deterministic reservoir). Needs a per-stratum
  ordering, so it shuffles on the stratum key — meant for bounded strata
  (per-language eval slices, per-source audits). For huge strata prefer
  ``hash_sample`` with rate ≈ n/N, which never concentrates a stratum
  on one task.

The reference's 1-in-n ``sample`` (FunctionalProcessing.hs:258-259,
docs/Operators.md:124-129) is the stream-positional cousin
(core/stream.py:Stream.sample); these are its corpus-scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from striot_spark.functions.text import md5_hash64

#: hash buckets per unit of rate — rates are quantized to 1/RESOLUTION
RESOLUTION = 10_000


def _bucket(id_col: str):
    return md5_hash64(F.col(id_col).cast("string")) % RESOLUTION


def hash_sample(
    df: DataFrame,
    id_col: str,
    rate: float | None = None,
    strata_col: str | None = None,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows (optionally per
    stratum). A row is kept iff ``md5(id) % RESOLUTION`` falls below the
    stratum's threshold, so membership is stable across runs, engines,
    and partitionings; nested samples compose (a 10% sample is a strict
    subset of the 20% sample with the same key)."""
    bucket = _bucket(id_col)
    if strata_col is None:
        if rate is None:
            raise ValueError("either rate or (strata_col, rates) required")
        return df.filter(bucket < int(rate * RESOLUTION))
    threshold = F.lit(int(default_rate * RESOLUTION))
    for value, r in sorted((rates or {}).items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(r * RESOLUTION))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5 id-bucket is
    partitioned into contiguous ranges sized by the split fractions
    (insertion order of ``splits``; fractions should sum to 1). Pure
    projection — every engine and every rerun assigns each id to the
    same split, and there is NO leakage path: membership depends only
    on the id, never on partitioning, sampling state, or row order.
    """
    bucket = _bucket(id_col)
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, frac in splits.items():
        acc += frac
        bounds.append((name, int(round(acc * RESOLUTION))))
    expr = None
    for name, upper in bounds:
        cond = bucket < upper
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr.otherwise(bounds[-1][0]))


def corpus_mix(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights_permille: dict[str, int],
) -> DataFrame:
    """Resample a corpus toward a target stratum mix (the "data mixing"
    step of training-corpus construction: e.g. 40% en / 15% each of
    four other languages).

    Given integer permille weights, the output size is maximized
    subject to never up-sampling: ``N = min_s floor(n_s * 1000 / w_s)``
    over strata present in both the data and the weights, each stratum
    keeping ``floor(N * w_s / 1000)`` rows via the same deterministic
    md5-bucket rate filter as ``hash_sample`` (threshold arithmetic is
    all-integer, so any engine reproduces the exact member set).
    Strata not in ``weights_permille`` are dropped.

    One count-per-stratum aggregate moves k rows to the driver (k =
    number of strata — scale-invariant, like the k-means centroid
    collect); the sampling pass itself is a zero-shuffle scan+filter.
    Rate-quantization means per-stratum output counts approximate the
    targets the way ``hash_sample`` rates do (RESOLUTION buckets).
    """
    if any(w <= 0 for w in weights_permille.values()):
        raise ValueError("corpus_mix weights must be positive permille")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
        if r[0] in weights_permille
    }
    if not counts:
        return df.filter(F.lit(False))
    n_out = min(
        counts[s] * 1000 // w
        for s, w in weights_permille.items()
        if s in counts
    )
    thresholds = {
        s: (n_out * weights_permille[s] // 1000) * RESOLUTION // counts[s]
        for s in counts
    }
    bucket = _bucket(id_col)
    thr = F.lit(0)
    for value, t in sorted(thresholds.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(t)).otherwise(thr)
    return df.filter(bucket < thr)


def reservoir_sample(
    df: DataFrame, id_col: str, strata_col: str, n: int
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum: the n smallest
    id-hashes, ties broken by id. Deterministic analogue of per-group
    reservoir sampling; one shuffle on the stratum key."""
    h = _bucket(id_col)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def select_token_budget(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    order_cols: list | None = None,
) -> DataFrame:
    """Budgeted corpus selection: walk documents in priority order and
    keep them until the cumulative token count would exceed ``budget``
    — the "best N billion tokens" cut of training-set construction
    (quality-ranked greedy selection).

    A doc is kept iff its INCLUSIVE running total is ≤ budget, so the
    selection never overshoots and is a strict prefix of the priority
    order (a bigger budget strictly extends a smaller one). Priority
    defaults to ``id_col`` ascending; pass integer-valued
    ``order_cols`` (quality desc, id asc) for ranked selection — float
    priorities reintroduce ulp-order hazards across engines.

    The running total is ``global_prefix_sum`` (two-pass range-
    partitioned — no single-partition exchange), so the cut is a
    distributed sort + filter at any scale. Output keeps the running
    total (``cum_tokens``) for budget accounting downstream.
    """
    from striot_spark.core.scale import global_prefix_sum

    order = order_cols if order_cols is not None else [F.col(id_col).asc()]
    cum = global_prefix_sum(df, order, n_tokens_col, "cum_tokens")
    return cum.filter(F.col("cum_tokens") <= budget)


def temperature_mix(
    df: DataFrame,
    id_col: str,
    strata_col: str,
) -> DataFrame:
    """Temperature-flattened corpus resampling at α = 1/2: stratum
    shares move from their natural sizes ``c_s`` toward uniform,
    targeting ``p_s ∝ sqrt(c_s)`` — the multilingual-corpus rebalancing
    rule (small languages up-weighted RELATIVELY, never up-SAMPLED).

    Without up-sampling, the per-row keep rate in stratum ``s`` is
    ``sqrt(c_min / c_s)`` (the smallest stratum keeps everything, a
    stratum 100× larger keeps 10%). Thresholds are computed as
    ``isqrt(RESOLUTION² · c_min // c_s)`` — exact integer arithmetic on
    driver-side counts, so any engine reproduces the member set with
    the same md5-bucket filter as ``hash_sample``. α is fixed at 1/2
    because it is the common default AND the one exponent with an exact
    integer form; other α values would need correctly-rounded ``pow``
    on both engines to gate.

    Cost mirrors ``corpus_mix``: one k-row count aggregate to the
    driver (k = #strata, scale-invariant), then a zero-shuffle
    scan+filter.
    """
    import math

    counts = {r[0]: r[1] for r in df.groupBy(strata_col).count().collect()}
    if not counts:
        return df.filter(F.lit(False))
    c_min = min(counts.values())
    thresholds = {
        s: math.isqrt(RESOLUTION * RESOLUTION * c_min // c)
        for s, c in counts.items()
    }
    bucket = _bucket(id_col)
    thr = F.lit(0)
    for value, t in sorted(thresholds.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(t)).otherwise(thr)
    return df.filter(bucket < thr)


def systematic_weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    stride: int,
    order_cols: list | None = None,
) -> DataFrame:
    """Weight-proportional sampling with EXACT integer arithmetic:
    walk rows in a fixed order, accumulate integer ``weight_col``, and
    keep every row whose inclusive running total crosses a multiple of
    ``stride`` — classic systematic (grid) sampling over the cumulative
    weight axis.

    A row with weight ``w`` spans ``w`` units of the cumulative axis and
    is kept iff that span contains a grid point, so rows with ``w >=
    stride`` are always kept and smaller rows are kept at exactly the
    ``w / stride`` rate along the walk — importance sampling without a
    single float. The draw is a pure function of (data, order, stride):
    reproducible across runs, engines, and partitionings, unlike
    RNG-based ``df.sample``. Expected output size is
    ``total_weight / stride``.

    The running total is ``global_prefix_sum`` (two-pass
    range-partitioned; no ``Exchange SinglePartition`` at scale — the
    same machinery as ``select_token_budget``), and the grid test
    ``cum DIV stride > (cum - w) DIV stride`` is a scan-side integer
    filter. Weights must be non-negative integers (token counts,
    quality scores in integer points); float weights would reintroduce
    cross-engine ulp hazards in the cumulative sums.
    """
    from striot_spark.core.scale import global_prefix_sum

    if stride <= 0:
        raise ValueError("stride must be a positive integer")
    order = order_cols if order_cols is not None else [F.col(id_col).asc()]
    cum = global_prefix_sum(df, order, weight_col, "cum_weight")
    w = F.col(weight_col).cast("long")
    # integral DIV, not float division + cast: exact for any long
    keep = F.expr(f"cum_weight DIV {int(stride)}") > F.expr(
        f"(cum_weight - CAST({weight_col} AS BIGINT)) DIV {int(stride)}"
    )
    return cum.filter(w > 0).filter(keep)


def importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred,
    buckets: int = 4096,
    scale: int = 10**6,
) -> DataFrame:
    """DSIR-shaped data selection (hashed n-gram importance sampling,
    Xie et al. 2023 public methodology) with EXACT integer arithmetic:
    score each doc by how target-like its token distribution is, where
    the per-feature importance ratio is the target/corpus occurrence
    ratio over ``buckets`` hashed unigram features:

        w(b)  = (target_count(b) * scale) DIV corpus_count(b)
        score = Σ_tokens w(bucket(token))          (occurrences, not set)

    ``target_pred`` marks the in-domain rows (e.g. ``lang == 'en'``).
    Rank by ``raw_score DIV n_tokens`` (or feed ``raw_score`` to
    ``systematic_weighted_sample``) to select target-like data; all
    integers, so the ranking is identical on any engine.

    Scale shape: ONE exploded scan feeds a single ``buckets``-row
    groupBy counting corpus and target occurrences together (map-side
    partials; the bucket table is scale-invariant in doc count), the
    weight vector collects driver-side (bounded by ``buckets``) and
    returns to the plan as ONE array literal (`F.lit(list)` — the
    PERF.md §23 rule; a per-entry CreateMap would be 2*buckets
    expression nodes), and the scoring pass is a zero-shuffle in-row
    fold — docs are never joined or shuffled.
    """
    from striot_spark.functions.text import md5_hash64, nonempty_tokens

    def bkt(c):
        return F.pmod(md5_hash64(c), F.lit(buckets))

    cnt = (
        df.select(
            F.explode(nonempty_tokens(F.col(text_col))).alias("tok"),
            target_pred.cast("long").alias("is_t"),
        )
        .select(bkt(F.col("tok")).alias("b"), "is_t")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_c"),
            F.sum("is_t").alias("n_t"),
        )
    )
    w = [0] * buckets
    for r in cnt.collect():  # <= buckets rows, scale-invariant
        w[r["b"]] = r["n_t"] * scale // r["n_c"]
    arr = F.lit(w)
    toks = nonempty_tokens(F.col(text_col))
    score = F.aggregate(
        F.transform(
            toks,
            lambda t: F.element_at(
                arr, (bkt(t) + F.lit(1)).cast("int")
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("raw_score"),
    )


def shuffle_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic seeded shuffle + shard assignment — the training-
    data export step (every epoch-0 data loader wants the corpus in a
    pseudo-random order, split into shards, and REPRODUCIBLE across
    reruns and engines): shard = 60-bit md5(seed || id) mod n_shards,
    position = dense rank of that hash within the shard (id tiebreak
    — md5 collisions need ~2^30 docs at 60 bits, but determinism must
    not hinge on their absence). Changing ``seed`` reshuffles
    globally; the same (seed, corpus) always produces the identical
    layout, unlike Spark's ``rand(seed)`` whose values depend on
    partitioning.

    Scale: the hash is a pure projection; the per-shard rank is a
    window sort PARTITIONED BY shard — Spark's window sort spills, so
    shard size (corpus / n_shards) is bounded by executor disk, and
    the shard count is the parallelism knob (1024 shards over 100 TB
    ≈ 100 GB sorted per shard — size n_shards so this fits; never
    rank over an unpartitioned window). Returns
    (id, shard, pos) with pos 1-based within shard.
    """
    if n_shards < 1:
        raise ValueError("shuffle_shard: n_shards must be >= 1")
    h = md5_hash64(
        F.concat(F.lit(seed), F.col(id_col).cast("string"))
    )
    out = df.select(F.col(id_col), h.alias("__h")).withColumn(
        "shard", (F.col("__h") % n_shards).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return out.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )
