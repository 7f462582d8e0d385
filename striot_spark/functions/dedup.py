"""Deduplication operators for training-data pipelines.

Three tiers, all shuffle-conscious:

- **Exact**: hash-groupBy on a content digest. One shuffle on the digest;
  at 100 TB the digest (16 bytes) shuffles, never the document bodies.
- **MinHash + LSH**: shingle → k minhashes → b bands → band-bucket join.
  Candidate pairs come from equi-joins on (band_id, band_signature) —
  no all-pairs comparison ever materializes. Hashes derive from md5
  (engine-reproducible; functions/text.py:md5_hash64), so signatures are
  deterministic and oracle-checkable.
- **SimHash**: 64-bit majority-vote fingerprint; near-dups differ in few
  bits. Computed via explode(64 bits)+groupBy — declarative, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from striot_spark.functions.text import md5_hash64, tokens_col

MERSENNE_P = 2_147_483_647  # 2^31-1, classic Carter-Wegman modulus
# (a, b) pairs for the universal hash family h_i(x) = (a_i*x + b_i) mod p
MINHASH_COEFFS = [(2, 1), (3, 7), (5, 13), (7, 31), (11, 61), (13, 127)]


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: digest → (kept id, duplicate count)."""
    return (
        df.withColumn("fp", F.md5(F.encode(F.col(text_col), "UTF-8")))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (pure Column expr:
    transform over token index slices)."""
    toks = F.filter(tokens_col(text), lambda t: t != F.lit(""))
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    return F.when(
        F.size(toks) < n, F.array(F.array_join(toks, " "))
    ).otherwise(
        F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 4, shingle_n: int = 2
) -> DataFrame:
    """Per-document minhash signature columns mh0..mh{k-1}.

    Explode shingles → base hash (md5-derived, engine-reproducible) →
    per-document min of each affine transform. GroupBy with min() is
    map-side combinable: the shuffle carries k longs per doc.
    """
    coeffs = MINHASH_COEFFS[:num_hashes]
    sh = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    base = md5_hash64(F.col("shingle")) % MERSENNE_P
    aggs = [
        F.min((F.lit(a) * base + F.lit(b)) % MERSENNE_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 6,
    bands: int = 3,
    shingle_n: int = 2,
) -> DataFrame:
    """LSH banding: docs sharing any band signature become candidate
    pairs. Join key = (band_id, concatenated in-band minhashes); output
    (id_a, id_b) with id_a < id_b, distinct."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    band_cols = []
    for b in range(bands):
        members = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("_", *[m.cast("string") for m in members]).alias("sig"),
            )
        )
    exploded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bs")
    ).select(id_col, "bs.band", "bs.sig")
    left = exploded.alias("a")
    right = exploded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    candidates: DataFrame, df: DataFrame, id_col: str, text_col: str,
    shingle_n: int = 2, threshold: float = 0.7,
) -> DataFrame:
    """Verify LSH candidates with exact shingle-set Jaccard. Only
    candidate pairs are scored — the shingle arrays join by doc id."""
    sets_ = df.select(
        F.col(id_col).alias("sid"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("sset"),
    )
    out = (
        candidates.join(sets_.withColumnRenamed("sid", "id_a").withColumnRenamed("sset", "set_a"), "id_a")
        .join(sets_.withColumnRenamed("sid", "id_b").withColumnRenamed("sset", "set_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("set_a", "set_b"))
            / F.size(F.array_union("set_a", "set_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash fingerprint, fully declarative.

    token → 60-bit md5 hash → explode 60 bit positions → weighted vote
    per (doc, bit) → majority → sum(bit << pos). The (doc, bit) groupBy
    is map-side combinable; at scale this is two narrow shuffles of
    (id, long) pairs.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    # Dedupe tokens per doc (min/votes are weight-linear, so hash each
    # distinct token once and carry its count), then fold the 60 bit-vote
    # counters JVM-side over the per-doc (hash, count) array — no 60x row
    # explosion, one map-side-combinable shuffle.
    counted = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("cnt"))
    h = md5_hash64(F.col("token"))
    hashes = counted.groupBy(id_col).agg(
        F.collect_list(F.struct(h.alias("h"), F.col("cnt").alias("cnt"))).alias("hs")
    )
    votes = F.expr(
        """
        aggregate(
          hs,
          array_repeat(CAST(0 AS BIGINT), 60),
          (acc, s) -> zip_with(
              acc, sequence(0, 59),
              (a, b) -> a + CASE WHEN (s.h >> b) & 1 = 1
                             THEN s.cnt ELSE -s.cnt END))
        """
    )
    fingerprint = F.expr(
        """
        aggregate(
          zip_with(votes, sequence(0, 59),
                   (v, b) -> CASE WHEN v > 0
                                  THEN CAST(1 AS BIGINT) << b
                                  ELSE CAST(0 AS BIGINT) END),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)
        """
    )
    return (
        hashes.withColumn("votes", votes)
        .withColumn("simhash", fingerprint)
        .select(id_col, "simhash")
    )
