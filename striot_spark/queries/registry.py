"""Query registry: every implemented operator/capability from SURVEY.md §2
is demonstrated by a named query over the driver's synthetic tables, each
with a DuckDB oracle SQL string (or None for genuinely non-SQL-expressible
operators → weaker rows-only check).

Contract (see /root/repo/__spark_entry__.py): the Spark result and the
oracle result must agree on row count, schema, and order-insensitive
value hash, with columns matched *by name* — so every computed column is
aliased identically on both sides, money aggregates run in integer cents
(order-insensitive, engine-exact; see functions/analytics.py), and
timestamps are emitted as canonical strings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# Driver sweep order. The driver's CORRECTNESS sweep caps at the first 50
# registry entries per round. Round 1 verified q01–q29/q34/q37/q38/q42–q45/
# q48/q51/q52/q57–q63 cohorts; round 2 rotated to verify the other 50.
# Round 3 (per VERDICT.md #1) rotates back: the 36 queries whose only green
# row is from round 1 go first so they get fresh r03 rows, followed by any
# queries new this round, with the 50 freshly-r02-verified entries at the
# tail — a truncated sweep then cuts re-confirmation, never fresh rows.
_SWEEP_FIRST = [
    # r01-only cohort (fresh rows needed this round)
    "q01_filter_map",
    "q02_expand_tokens",
    "q03_merge",
    "q04_chop_count_window",
    "q05_choptime_window",
    "q06_sliding_count_window",
    "q07_scan_running_sum",
    "q08_changes_dedup",
    "q09_sample",
    "q10_zip_join",
    "q21_text_stats",
    "q22_lang_id",
    "q23_dedup_exact",
    "q24_doc_fingerprint",
    "q25_minhash_signatures",
    "q26_simhash",
    "q27_ann_cosine",
    "q28_multimodal_meta",
    "q29_lsh_near_dups",
    "q34_filteracc_above_running_avg",
    "q37_ann_ivf",
    "q38_quality_class",
    "q42_embedding_near_dups",
    "q43_rolling_fingerprint",
    "q44_bpe_token_stats",
    "q45_simhash_near_dups",
    "q48_ann_lsh",
    "q51_stratified_sample",
    "q52_reservoir_per_lang",
    "q57_chunk_documents",
    "q58_corpus_build",
    "q59_interval_join",
    "q60_salted_skew_join",
    "q61_approx_aggregates",
    "q62_sequence_pack",
    "q63_nearest_centroid",
    # round-3 additions — no CORRECTNESS row exists yet for any of these
    "q87_joinw_stream",
    "q88_taxi_csv_dead_letter",
]
# Slowest already-r02-confirmed queries absolutely last.
_SWEEP_LAST = [
    "q68_prefix_jaccard_pairs",
    "q74_dedup_groups",
    "q64_kmeans_clusters",
]


def _ordered_names() -> list[str]:
    mid = [
        n
        for n in REGISTRY
        if n not in _SWEEP_FIRST and n not in _SWEEP_LAST
    ]
    known = set(REGISTRY)
    return (
        [n for n in _SWEEP_FIRST if n in known]
        + mid
        + [n for n in _SWEEP_LAST if n in known]
    )


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _load()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _load() -> None:
    """Import all query modules (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from striot_spark.queries import (  # noqa: F401
        composite,
        datapipe,
        events_ops,
        flagship,
        tpch,
    )

    _LOADED = True
