"""Data-quality audit: declarative constraint checks evaluated in ONE
aggregation pass per table (deequ-style; Schelter et al., "Automating
Large-Scale Data Quality Verification", VLDB 2018 — public
methodology). Each check compiles to a conditional-count aggregate
expression, so auditing N constraints costs one scan with map-side
partials, not N scans. Referential-integrity checks add one
broadcast anti-join per foreign key (the dimension side is the
broadcast, the fact table is scanned once per key table).

No reference analogue (the reference has no audit surface —
``src/Striot/`` is operator algebra); this belongs to the
beyond-reference pipeline tier the brief mandates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint: ``violated`` is a boolean Column that is
    true on rows BREAKING the constraint."""

    name: str
    violated: Column


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(
        f"in_range({col},{lo},{hi})",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def matches(col: str, pattern: str, label: str | None = None) -> Check:
    c = F.col(col)
    return Check(
        label or f"matches({col},{pattern})",
        c.isNotNull() & ~c.rlike(pattern),
    )


def one_of(col: str, allowed: Sequence[str]) -> Check:
    c = F.col(col)
    return Check(
        f"one_of({col},{','.join(allowed)})",
        c.isNotNull() & ~c.isin(*list(allowed)),
    )


def audit(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all row-level checks in ONE aggregation: returns
    (check, n_violations, n_rows) — every check shares the same scan
    and the same map-side partial aggregate. Unpivoted via an inline
    stack so the output is one row per check regardless of width."""
    names = [c.name for c in checks]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        # create_map with duplicate keys throws (or silently drops a
        # check under LAST_WIN) — refuse loudly with the culprits
        raise ValueError(f"duplicate check names: {sorted(dupes)}")
    # coalesce: F.sum over zero rows is NULL; an empty table is
    # vacuously clean, not unknown
    aggs = [
        F.coalesce(F.sum(c.violated.cast("long")), F.lit(0)).alias(
            f"__v{i}"
        )
        for i, c in enumerate(checks)
    ] + [F.count(F.lit(1)).alias("__n")]
    row = df.agg(*aggs)
    pairs: list[Column] = []
    for i, c in enumerate(checks):
        pairs.append(F.lit(c.name))
        pairs.append(F.col(f"__v{i}"))
    return row.select(
        F.explode(F.create_map(*pairs)).alias("check", "n_violations"),
        F.col("__n").alias("n_rows"),
    )


def unique_key(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(check, n_violations, n_rows) for key uniqueness: violations =
    rows beyond the first per key (n_rows - distinct keys) — one
    groupBy-count on the key, shuffling unique keys not rows."""
    name = f"unique({','.join(cols)})"
    counts = df.groupBy(*[F.col(c) for c in cols]).agg(
        F.count(F.lit(1)).alias("__c")
    )
    return counts.agg(
        F.coalesce(F.sum("__c") - F.count(F.lit(1)), F.lit(0)).alias(
            "n_violations"
        ),
        F.coalesce(F.sum("__c"), F.lit(0)).alias("n_rows"),
    ).select(F.lit(name).alias("check"), "n_violations", "n_rows")


def foreign_key(
    fact: DataFrame,
    fact_col: str,
    dim: DataFrame,
    dim_col: str,
) -> DataFrame:
    """(check, n_violations, n_rows) for referential integrity:
    violations = fact rows whose non-null key has no dimension match.
    ONE broadcast left join + one aggregate (dims are the small side
    by construction); the fact table is scanned once, never shuffled,
    and nothing is collected — the report row stays a DataFrame."""
    name = f"fk({fact_col}->{dim_col})"
    keys = (
        dim.select(F.col(dim_col).alias(fact_col))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = fact.select(fact_col).join(F.broadcast(keys), fact_col, "left")
    return joined.agg(
        F.coalesce(
            F.sum(
                (
                    F.col(fact_col).isNotNull() & F.col("__hit").isNull()
                ).cast("long")
            ),
            F.lit(0),
        ).alias("n_violations"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(F.lit(name).alias("check"), "n_violations", "n_rows")


def audit_suite(parts: Sequence[DataFrame]) -> DataFrame:
    """Union audit result frames into one report, sorted by check."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-pass column profiling: (column, n_rows, n_nonnull,
    n_distinct) per requested column, all from a single aggregate
    (Spark plans multi-column DISTINCT aggregates with one Expand —
    k x row multiplication map-side, still one shuffle of partial
    states, no per-column rescans). The profiling companion to
    ``audit``: exact counts, engine-comparable, no min/max strings
    (cross-engine numeric formatting is not stable)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn{i}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd{i}"))
    row = df.agg(*aggs)
    pairs: list[Column] = []
    for i, c in enumerate(cols):
        pairs.append(F.lit(c))
        pairs.append(F.array(F.col(f"__nn{i}"), F.col(f"__nd{i}")))
    return row.select(
        F.explode(F.create_map(*pairs)).alias("column", "__v"),
        F.col("__n").alias("n_rows"),
    ).select(
        "column",
        "n_rows",
        F.col("__v")[0].alias("n_nonnull"),
        F.col("__v")[1].alias("n_distinct"),
    )


def skew_stats(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Key-distribution skew profile: the ``top_n`` heaviest values of
    ``key_col`` with their counts, rank, and integer-permille share of
    all rows, plus the global row/key totals on every row — the
    diagnostic that decides whether a join/agg on this key needs
    salting (q60) or AQE skew handling before it burns a cluster.

    Scale shape: one key groupBy with map-side partials, then the
    top-N via ``orderBy().limit()`` — Spark plans TakeOrdered (each
    partition keeps its local N, the driver merges #partitions*N
    rows), NOT a single-partition global sort of the counted key set;
    the rank window runs over the already-limited N rows. Totals are a
    1-row aggregate of the same counts, broadcast-joined back.
    """
    counts = df.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    top = counts.orderBy(F.col("n").desc(), F.col(key_col).asc()).limit(
        top_n
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("n").desc(), F.col(key_col).asc())
    ranked = top.withColumn("rank", F.row_number().over(w))
    return ranked.crossJoin(F.broadcast(totals)).select(
        F.col(key_col).cast("string").alias("key_value"),
        "n",
        "rank",
        F.expr("(n * 1000) DIV total_rows").alias("permille"),
        "n_keys",
        "total_rows",
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_n: int = 10,
) -> DataFrame:
    """Predict an equi-join's output size BEFORE running it:
    ``|A ⋈ B| = Σ_k c_A(k) · c_B(k)`` over per-key counts — exact, and
    computed from two key-count aggregates joined to each other
    (key-cardinality-sized inputs, never the fact rows). The
    per-key products also expose WHICH keys explode: the companion to
    ``skew_stats`` in the pre-flight family — run both before a
    100 TB join to decide between plain, broadcast, salted (q60), or
    bucketed (q132) execution.

    Emits one summary row (key_value='<TOTAL>') with the predicted
    row count plus the ``top_n`` heaviest contributing keys with
    their per-key output sizes and integer-permille share.
    """
    ca = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    prod = ca.join(cb, "k").select(
        "k", (F.col("ca") * F.col("cb")).alias("rows_out")
    )
    # empty key intersection => predicted size 0, not NULL
    total = prod.agg(
        F.coalesce(F.sum("rows_out"), F.lit(0).cast("long")).alias("t")
    )
    top = prod.orderBy(F.col("rows_out").desc(), F.col("k").asc()).limit(
        top_n
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("rows_out").desc(), F.col("k").asc())
    ranked = top.withColumn("rank", F.row_number().over(w))
    detail = ranked.crossJoin(F.broadcast(total)).select(
        F.col("k").cast("string").alias("key_value"),
        F.col("rank").cast("int").alias("rank"),
        "rows_out",
        F.expr("(rows_out * 1000) DIV t").alias("permille"),
    )
    summary = total.select(
        F.lit("<TOTAL>").alias("key_value"),
        F.lit(0).cast("int").alias("rank"),
        F.col("t").alias("rows_out"),
        F.when(F.col("t") > 0, F.lit(1000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("permille"),
    )
    return summary.unionByName(detail)


def k_anonymous_rows(
    df: DataFrame, qi_cols: Sequence[str], k: int
) -> DataFrame:
    """k-anonymity suppression: keep only rows whose quasi-identifier
    combination is shared by at least ``k`` rows, annotated with the
    group size ``group_n`` — the release-gate that makes a
    quasi-identifier join attack ambiguous among >= k people.

    Lowering for scale: group sizes come from ONE map-side-combined
    groupBy over the QI columns (shuffle carries #groups partials, not
    rows), the >=k survivor list is BROADCAST back, and the corpus is
    filtered by a broadcast hash join — the big table is never sorted
    or re-shuffled, unlike the window-count form whose per-QI
    partition sort is the 100 TB bottleneck. Bounded by #QI combos,
    which a release pipeline keeps small by construction
    (generalize-then-check).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sizes = (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(F.count(F.lit(1)).alias("group_n"))
        .filter(F.col("group_n") >= k)
    )
    return df.join(F.broadcast(sizes), list(qi_cols), "inner")
