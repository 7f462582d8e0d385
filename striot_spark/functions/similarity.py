"""Similarity search over embedding columns (array<float>).

Two tiers:
- **Brute-force cosine top-k** — the exactness baseline. Dot products via
  ``zip_with`` + ``aggregate`` (JVM-side fold, no Python); the query side
  is broadcast so the big side never shuffles.
- **LSH-bucketed ANN (random hyperplanes)** — the scale path: sign-bit
  bucket join prunes the candidate set; only same-bucket pairs are
  scored. Hyperplanes are deterministic (seeded arithmetic), so results
  are reproducible run-to-run and across engines.

At 100 TB the brute-force form is O(N) per query vector with a broadcast
query set — fine for small query batches; the bucketed form is the
default for all-pairs / large query sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from striot_spark.core.scale import scatter
from striot_spark.functions.caching import track_persist


def as_double(vec: Column) -> Column:
    """float[] → double[] before any arithmetic: keeps Spark's fold and
    the oracle's (double) math bit-identical."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def pair_cosine(v: Column, nv: Column, qv: Column, nqv: Column) -> Column:
    """Cosine from pre-computed per-row norms: norms are computed once
    per vector BEFORE the join instead of once per candidate pair —
    identical floats (same fold order, sqrt(a)*sqrt(b) per pair either
    way), O(rows) instead of O(pairs) norm work."""
    return dot(v, qv) / (nv * nqv)


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``query_df``: (query_id, qvec). Broadcast the (small) query side,
    score everything, rank per query. Deterministic tie-break on id.
    """
    from pyspark.sql import Window as W

    base = scatter(df).select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    q = query_df.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("nqv", norm(F.col("qv")))
    scored = base.crossJoin(F.broadcast(q)).withColumn(
        "cos",
        F.round(
            pair_cosine(F.col("v"), F.col("nv"), F.col("qv"), F.col("nqv")), 6
        ),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos", "rnk")
    )


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    partition_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: score only vectors in the query's coarse partition
    (an inverted-file cell — here any precomputed cluster/label column).

    At scale the base table is written partitioned/bucketed by
    ``partition_col``, so a probe reads one cell's files only (partition
    pruning), and the query side is broadcast — no shuffle of the base
    table at all.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col), F.col(partition_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    q = query_df.select(
        F.col(query_id_col), F.col(partition_col), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("nqv", norm(F.col("qv")))
    scored = base.join(F.broadcast(q), partition_col).withColumn(
        "cos",
        F.round(
            pair_cosine(F.col("v"), F.col("nv"), F.col("qv"), F.col("nqv")), 6
        ),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos", "rnk")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: self-join *within* the
    coarse partition cell (IVF bucket / cluster label), score cosine,
    keep pairs >= threshold.

    The scale story: candidate generation is an equi-join on the cell
    id — both sides shuffle once on ``partition_col`` (or zero times if
    the table is bucketed by it), and only same-cell pairs are ever
    scored. All-pairs never materializes; skewed cells are AQE's
    skew-join problem, not a driver loop.
    """
    # scatter: if the (small) build side is broadcast, the join output
    # inherits the probe side's partitioning — a single-partition input
    # would score every candidate pair on one core
    sides = scatter(df).select(
        F.col(id_col), F.col(partition_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    a, b = sides.alias("a"), sides.alias("b")
    cos = F.round(
        pair_cosine(F.col("a.v"), F.col("a.nv"), F.col("b.v"), F.col("b.nv")), 6
    )
    return (
        a.join(
            b,
            (F.col(f"a.{partition_col}") == F.col(f"b.{partition_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: values in
    [-1, 1) from integer arithmetic (no RNG dependency)."""
    vals = []
    x = seed * 2654435761 % 2**32
    for _ in range(dim):
        x = (1103515245 * x + 12345) % 2**31
        vals.append((x / 2**30) - 1.0)
    return vals


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dim: int,
    out_dim: int,
    seed: int = 7,
    out_col: str = "projected",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    embedding onto ``out_dim`` deterministic pseudo-random directions
    (the ``_hyperplane`` integer recurrence — no RNG state, so any
    engine and any rerun produce bit-identical projections). The
    standard cheap pre-step before ANN indexing: JL preserves pairwise
    distances within (1±ε) at out_dim = O(log n / ε²), public result.

    Pure zero-shuffle projection — out_dim sequential-fold dot products
    per row, all JVM-side; a 100 TB reduction pass is one scan. The
    projection matrix lives in the plan as literals (out_dim × in_dim
    doubles — kilobytes), the same centroid-inlining trick as
    ``nearest_centroid``.
    """
    v = as_double(F.col(vec_col))
    comps = [
        dot(
            v, F.array(*[F.lit(c) for c in _hyperplane(in_dim, seed + p)])
        ).alias(f"c{p}")
        for p in range(out_dim)
    ]
    return df.select(F.col(id_col), F.array(*comps).alias(out_col))


def hyperplane_buckets(
    vec: Column, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """Sign-bit LSH bucket id (long) for a vector column."""
    bucket = F.lit(0).cast("long")
    v = as_double(vec)
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, seed + p)])
        bit = (dot(v, plane) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k: score only vectors in the query's hyperplane bucket.
    Approximate (bucket boundary misses) but prunes the scored set by
    ~2^n_planes; the bucketed base table can be written bucketed-by
    ``bucket`` so repeated queries avoid even the scan."""
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("v"),
        hyperplane_buckets(F.col(vec_col), dim, n_planes).alias("bucket"),
    ).withColumn("nv", norm(F.col("v")))
    q = query_df.select(
        F.col(query_id_col),
        as_double(F.col(vec_col)).alias("qv"),
        hyperplane_buckets(F.col(vec_col), dim, n_planes).alias("bucket"),
    ).withColumn("nqv", norm(F.col("qv")))
    scored = base.join(F.broadcast(q), "bucket").withColumn(
        "cos",
        F.round(
            pair_cosine(F.col("v"), F.col("nv"), F.col("qv"), F.col("nqv")), 6
        ),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos", "rnk")
    )


def nearest_centroid(
    base: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "centroid_id",
    keep_vec: bool = False,
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine — the
    coarse-quantizer build step for IVF (``ivf_topk`` consumes the
    resulting cell column) and the E-step of k-means. With
    ``keep_vec``, the double-cast vector and its norm ride along as
    ``__v``/``__nv`` so a downstream within-cell consumer (e.g.
    ``semantic_near_dup_pairs``) needs no re-join back to the corpus.

    The centroid set is small by construction (k cells), so it is
    collected ONCE and inlined as literal arrays: assignment becomes a
    pure projection — one scan, zero joins, zero shuffles, and the
    quantizer travels inside the plan to every task. Per row: k fold
    dot-products (JVM higher-order functions, no Python). Argmax via
    ``array_max`` over (cos, -centroid_id) structs — ties pick the
    smaller centroid id, deterministically.

    Centroid norms are computed driver-side with the same sequential
    left-fold the engines use, so cosines stay bit-identical to the
    oracle's ``list_dot_product`` math.
    """
    import math

    rows = centroids.select(cid_col, vec_col).collect()
    cents = sorted(
        (int(r[0]), [float(x) for x in r[1]]) for r in rows
    )
    if not cents:
        raise ValueError("empty centroid set")
    b = scatter(base).select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("__v"),
    ).withColumn("__nv", norm(F.col("__v")))
    choices = []
    for cid, vec in cents:
        nc = math.sqrt(sum(x * x for x in vec))
        cl = F.array(*[F.lit(x) for x in vec])
        cos = F.round(
            dot(F.col("__v"), cl) / (F.col("__nv") * F.lit(nc)), 6
        )
        choices.append(
            F.struct(
                cos.alias("cos"),
                F.lit(-cid).cast("long").alias("__ncid"),
            )
        )
    best = F.array_max(F.array(*choices))
    extra = ["__v", "__nv"] if keep_vec else []
    return b.select(
        F.col(id_col),
        (-best["__ncid"]).alias(cid_col),
        best["cos"].alias("cos"),
        *extra,
    )


def semantic_near_dup_pairs(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic near-duplicate pair generation, SemDeDup-style (Abbas
    et al. 2023, public literature): assign every embedding to its
    nearest centroid, then score pairwise cosine WITHIN each cell only.

    That cell restriction is the published recipe's scale lever: k
    cells turn the all-pairs O(n²) compare into k·O((n/k)²), and the
    only corpus movement is ONE shuffle by cell id — the assignment
    itself is the zero-shuffle literal-centroid projection
    (``nearest_centroid(keep_vec=True)``, so no re-join back to the
    corpus for the vectors), and the pair join is an equi-join on the
    cell, never a corpus-wide cartesian. At 100 TB, store the corpus
    partitioned by cell and the pair-gen is partition-local.

    Returns (id_a, id_b, cos) with ``id_a < id_b`` and ROUNDED (6 dp)
    cosine >= ``threshold``. Real corpora use thresholds near 0.95;
    pick per-corpus from the within-cell cosine distribution (the
    driver's synthetic embeddings are near-random — max within-cell
    cosine ~0.47 — so the demo query q96 uses 0.4). Pairs compose with
    ``functions.dedup.dedup_groups`` for keep/drop group assignment,
    exactly like the text near-dup pipelines.
    """
    # persist: the self-join consumes the assignment twice — without
    # the cache the corpus scan AND the k-dot-product E-step would
    # execute once per join side (at 100 TB, write the assignment out
    # partitioned by cell instead; persist is the in-session analogue)
    cells = track_persist(
        nearest_centroid(df, centroids, id_col, vec_col, keep_vec=True)
        .select(id_col, "centroid_id", "__v", "__nv")
    )
    a = cells.select(
        F.col(id_col).alias("id_a"),
        "centroid_id",
        F.col("__v").alias("__va"),
        F.col("__nv").alias("__na"),
    )
    b = cells.select(
        F.col(id_col).alias("id_b"),
        "centroid_id",
        F.col("__v").alias("__vb"),
        F.col("__nv").alias("__nb"),
    )
    return (
        a.join(
            b,
            (a["centroid_id"] == b["centroid_id"])
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn(
            "cos",
            F.round(
                pair_cosine(
                    F.col("__va"), F.col("__na"),
                    F.col("__vb"), F.col("__nb"),
                ),
                6,
            ),
        )
        .filter(F.col("cos") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cos")
    )


def kmeans(
    df: DataFrame,
    k: int,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1_000_000,
) -> tuple[DataFrame, list[list[float]]]:
    """Spherical k-means (Lloyd's) over an embedding column — the
    iterative companion to ``nearest_centroid``: cluster a corpus to
    BUILD the IVF cell structure instead of relying on a given label.

    Each iteration is ONE action with ONE exchange: the E-step argmax
    (centroids inlined as literals, same machinery as
    ``nearest_centroid``) is fused into the M-step projection, which
    posexplodes to (cluster, dim_pos, val) and aggregates — after
    map-side combine the shuffle carries only k x dim partial sums,
    and exactly k x dim values reach the driver, independent of row
    count. The scored base (vector + norm) is persisted once so every
    iteration starts from the cache, and the per-row norm is
    materialized instead of being re-inlined k times by
    CollapseProject. (A broadcast-join E-step + separate M-step action
    measured 2.6x slower per iteration from extra stages alone.)
    Init is deterministic: the k rows with the smallest ids
    (reproducible, seed-free).

    **Deterministic M-step:** per-dimension means are computed as
    EXACT integer sums of quantized coordinates
    (``floor(x*quant + 0.5)`` as long) with ONE double division on
    the driver. Long addition is associative/commutative, so the
    centroids are bit-identical regardless of partitioning, task
    order, AQE re-plans, or speculative retries — a rerun on 1000
    executors clusters identically, and an external engine (DuckDB
    oracle) reproduces the math exactly. A float ``avg`` M-step, by
    contrast, drifts with reduce order. The uniform 1/quant scale
    cancels in cosine, so centroids stay in quantized units
    (headroom: |x|*quant*rows_per_cluster must stay < 2^63 — at
    quant=1e6 and unit-norm-ish data that is ~1e11 rows per cluster).

    At 100 TB, train the quantizer on a ``hash_sample`` of the corpus
    (standard IVF practice), then assign the full corpus once with the
    zero-shuffle ``nearest_centroid`` projection.

    Returns (assignment DataFrame (id, centroid_id, cos), final
    centroid list). The assignment is persisted and materialized
    before the scored base is dropped, so collecting it later does
    not recompute the scatter+norm lineage.
    """
    init = (
        df.select(id_col, vec_col)
        .orderBy(F.col(id_col))
        .limit(k)
        .collect()
    )
    if len(init) < k:
        raise ValueError(
            f"kmeans: k={k} but the input has only {len(init)} rows — "
            "the M-step rebuild indexes cents[i] for every cluster id "
            "< k and would IndexError; pass k <= row count"
        )
    cents = [[float(x) for x in r[1]] for r in init]
    dim = len(cents[0])
    base = (
        scatter(df)
        .select(F.col(id_col), as_double(F.col(vec_col)).alias("__v"))
        .withColumn("__nv", norm(F.col("__v")))
        .persist()
    )

    import math

    def best(cents_list: list[list[float]]) -> Column:
        choices = []
        for cid, vec in enumerate(cents_list):
            nc = math.sqrt(sum(x * x for x in vec))
            cl = F.array(*[F.lit(x) for x in vec])
            cos = F.round(
                dot(F.col("__v"), cl) / (F.col("__nv") * F.lit(nc)), 6
            )
            choices.append(
                F.struct(
                    cos.alias("cos"),
                    F.lit(-cid).cast("long").alias("__ncid"),
                )
            )
        return F.array_max(F.array(*choices))

    try:
        for _ in range(max_iter):
            # field access on a lambda-bearing struct must happen in a
            # separate select from the generator: combining them makes
            # the analyzer drop the struct's field names (col1/col2)
            picked = base.select(best(cents).alias("__best"), F.col("__v"))
            rows = (
                picked.select(
                    (-F.col("__best.__ncid")).alias("centroid_id"),
                    F.posexplode(F.col("__v")).alias("p", "x"),
                )
                .groupBy("centroid_id", "p")
                .agg(
                    F.sum(
                        F.floor(
                            F.col("x") * F.lit(float(quant)) + F.lit(0.5)
                        ).cast("long")
                    ).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            new: dict[int, list[float]] = {}
            for r in rows:
                # convert-then-divide (not exact-rational divide) to
                # mirror CAST(sum AS DOUBLE)/count in external engines
                new.setdefault(r["centroid_id"], [0.0] * dim)[r["p"]] = (
                    float(r["s"]) / float(r["n"])
                )
            # a centroid that lost every point keeps its previous position
            cents = [new.get(i, cents[i]) for i in range(k)]
        b = best(cents)
        assigned = base.select(
            F.col(id_col),
            (-b["__ncid"]).alias("centroid_id"),
            b["cos"].alias("cos"),
        ).persist()
        assigned.count()  # materialize off the cached base, pre-unpersist
        return assigned, cents
    finally:
        base.unpersist()


def group_centroids(
    df: DataFrame,
    group_cols,
    vec_col: str = "embedding",
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-group embedding centroid TRANSPORT form: for each (group,
    dimension), the EXACT integer sum of quantized coordinates plus
    the group count — the mean-pooling step of class prototypes /
    label centroids / per-source embedding summaries, in the same
    deterministic M-step arithmetic as ``kmeans`` (long sums are
    order-insensitive, so the result is bit-identical under any
    partitioning and reproducible in any engine; one double division
    ``q_sum / (n * quant)`` wherever the float mean is finally
    needed).

    Plan: one ``posexplode`` of the vector column into (group, dim,
    val) and one groupBy — after map-side partials the shuffle
    carries at most #groups × dim partial rows per task, independent
    of corpus size; output is #groups × dim rows (driver-safe).
    """
    gcols = [F.col(c) for c in (
        [group_cols] if isinstance(group_cols, str) else list(group_cols)
    )]
    exploded = df.select(
        *gcols, F.posexplode(F.col(vec_col)).alias("dim", "val")
    )
    qv = F.floor(F.col("val") * F.lit(float(quant)) + F.lit(0.5)).cast(
        "long"
    )
    return exploded.groupBy(*[c for c in gcols] + [F.col("dim")]).agg(
        F.sum(qv).alias("q_sum"),
        F.count(F.lit(1)).alias("n"),
    )


def pq_encode(
    base: DataFrame,
    codebook: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "centroid_id",
) -> DataFrame:
    """Product-quantization encode (Jégou et al. TPAMI'11, public
    methodology): split each vector into ``m`` contiguous subvectors
    and assign each to its nearest codebook entry by squared L2 — the
    compressed representation an ANN index stores instead of raw
    floats (d floats -> m small codes). Output: one row per
    (vector, subspace) with the chosen ``code`` and its rounded
    quantization distance.

    Same scale contract as ``nearest_centroid``: the codebook is tiny
    by construction, so it is collected once and inlined as literal
    arrays — the encode is a PURE PROJECTION (one corpus scan, zero
    joins, zero shuffles; m x c fold dot-products per row, JVM-side).
    Distances use the dot-product expansion ||v||² - 2<v,c> + ||c||²
    rounded to 6 decimals so both engines agree digit for digit
    (the proven nearest_centroid parity convention); argmin via
    ``array_min`` over (dist, cid) structs — ties pick the smaller
    code, deterministically.
    """
    rows = codebook.select(cid_col, vec_col).collect()
    cents = sorted((int(r[0]), [float(x) for x in r[1]]) for r in rows)
    if not cents:
        raise ValueError("empty codebook")
    d = len(cents[0][1])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub_d = d // m
    b = scatter(base).select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__v")
    )
    subs = []
    for j in range(m):
        sl = F.slice(F.col("__v"), j * sub_d + 1, sub_d)
        dvv = dot(sl, sl)
        choices = []
        for cid, vec in cents:
            cv = vec[j * sub_d : (j + 1) * sub_d]
            dcc = sum(x * x for x in cv)
            cl = F.array(*[F.lit(x) for x in cv])
            dist = F.round(dvv - 2 * dot(sl, cl) + F.lit(dcc), 6)
            choices.append(
                F.struct(
                    dist.alias("dist"),
                    F.lit(cid).cast("long").alias("cid"),
                )
            )
        best = F.array_min(F.array(*choices))
        subs.append(
            F.struct(
                F.lit(j).cast("long").alias("sub"),
                best["cid"].alias("code"),
                best["dist"].alias("dist"),
            )
        )
    e = b.select(F.col(id_col), F.explode(F.array(*subs)).alias("pq"))
    return e.select(
        F.col(id_col), F.col("pq.sub"), F.col("pq.code"),
        F.col("pq.dist"),
    )


def rrf_fuse(
    ranked: "list[DataFrame]",
    id_col: str = "doc_id",
    rank_cols: "list[str] | None" = None,
    k: int = 10,
    c: int = 60,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (Cormack,
    Clarke & Büttcher SIGIR'09, public methodology) — THE standard
    hybrid-retrieval combiner (lexical BM25-ish + embedding ANN):

        rrf(d) = Σ_lists scale DIV (c + rank_list(d))

    with a document absent from a list contributing 0. Kept in exact
    integers (scale DIV ...) so the fused scores and the final
    (rrf DESC, id ASC) top-k are engine-exact — float RRF reorders
    under summation error; this cannot.

    Each input frame carries (id_col, rank) where rank is 1-based
    within that list (e.g. ``brute_force_topk``'s ``rnk``, or a
    row_number over a lexical score). Inputs are top-K candidate
    lists — a few hundred rows each — so the N-way full outer join
    and the final TakeOrdered are driver-trivial at any corpus size;
    the heavy lifting (scoring/ranking the corpus) stays in the
    per-list producers. Returns (id, rrf, rank_1..rank_N) with 0 for
    "absent from that list".
    """
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")
    names = rank_cols or [f"rank_{i + 1}" for i in range(len(ranked))]
    if len(names) != len(ranked):
        raise ValueError("rrf_fuse: rank_cols must match ranked lists")
    out = None
    for df, name in zip(ranked, names):
        cur = df.select(F.col(id_col), F.col("rank").alias(name))
        out = cur if out is None else out.join(cur, id_col, "full_outer")
    rrf = None
    for name in names:
        # backtick-quote the interpolated identifier: a caller-supplied
        # rank_col with spaces/hyphens/reserved words would otherwise
        # fail to parse or resolve to the wrong expression (ADVICE r10)
        quoted = "`" + name.replace("`", "``") + "`"
        term = F.when(
            F.col(name).isNotNull(),
            F.expr(f"CAST({scale} DIV ({c} + {quoted}) AS BIGINT)"),
        ).otherwise(F.lit(0).cast("long"))
        rrf = term if rrf is None else rrf + term
    out = out.select(
        F.col(id_col),
        rrf.cast("long").alias("rrf"),
        *[
            F.coalesce(F.col(n), F.lit(0)).cast("long").alias(n)
            for n in names
        ],
    )
    return out.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(k)
