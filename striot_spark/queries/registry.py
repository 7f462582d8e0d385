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
# registry entries per round. Freshness ledger entering round 5: the 50
# queries swept in r04 are one round fresh; the other 41 (q01–q10,
# q21–q29, q36–q38, q42–q45, q48, q51–q63, q79) have their freshest green
# row in r03, now two rounds old. This round's order: any round-5
# additions first (no CORRECTNESS row exists yet), then the full r03-only
# cohort — so after this sweep no green row is older than one round.
_SWEEP_FIRST = [
    # round-5 additions — no CORRECTNESS row exists yet
    "q92_scan_stream_global",
    "q93_joinw_stream_non_nesting",
    "q94_cross_corpus_near_dups",
    "q95_contamination_scores",
    "q96_semantic_near_dups",
    "q97_filteracc_stream_global",
    "q98_docs_jsonl_dead_letter",
    "q99_corpus_pipeline",
    "q100_chop_count_stream",
    # r03-only cohort (freshest row now two rounds old)
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
    "q36_window_expand_roundtrip",
    "q37_ann_ivf",
    "q38_quality_class",
    "q42_embedding_near_dups",
    "q43_rolling_fingerprint",
    "q44_bpe_token_stats",
    "q45_simhash_near_dups",
    "q48_ann_lsh",
    "q51_stratified_sample",
    "q52_reservoir_per_lang",
    "q53_asof_enrich",
    "q54_time_rollup",
    "q55_json_props",
    "q56_daily_distinct_users",
    "q57_chunk_documents",
    "q58_corpus_build",
    "q59_interval_join",
    "q60_salted_skew_join",
    "q61_approx_aggregates",
    "q62_sequence_pack",
    "q63_nearest_centroid",
    "q79_pivot_event_counts",
]
# Nothing needs forcing to the absolute tail this round; the r03-fresh
# cohort fills the remainder in registry order.
_SWEEP_LAST: list[str] = []


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
