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
# registry entries per round. Freshness ledger entering round 4:
# 36 queries verified in r03 only, 36 in r02 only, 14 in both, and two
# round-4 additions (q87/q88) never driver-verified. This round's order:
# the never-verified pair first, then the r02-only cohort (oldest rows,
# heaviest three at that block's end so a time-capped sweep cuts them
# last-within-block), then everything r03-fresh — 38 priority slots, so
# the 50-cap also re-confirms ~12 r03 rows.
_SWEEP_FIRST = [
    # round-4 additions — no CORRECTNESS row exists yet
    "q87_joinw_stream",
    "q88_taxi_csv_dead_letter",
    "q89_scan_stream",
    "q90_filteracc_stream",
    "q91_sliding_count_stream",
    # r02-only cohort (freshest row now two rounds old)
    "q11_topk_per_window",
    "q12_sessionize",
    "q13_percentiles",
    "q14_value_histogram",
    "q15_threshold_cross",
    "q16_step_count",
    "q17_pricing_summary",
    "q18_top_orders",
    "q19_regional_revenue",
    "q20_top_customers",
    "q30_frequent_routes",
    "q47_broadcast_enrich",
    "q49_wearable_chain",
    "q50_window_custom_fold",
    "q65_frequent_routes_stream",
    "q66_null_passthrough_chain",
    "q67_joine_positional_untimed",
    "q69_contamination_check",
    "q70_repetition_stats",
    "q71_corpus_mix",
    "q72_priority_semi_join",
    "q73_inactive_customers_anti_join",
    "q75_vocab_encode",
    "q76_split_assign",
    "q77_random_projection",
    "q78_window_agg_stream",
    "q80_unpivot_money_metrics",
    "q81_sole_returned_supplier",
    "q82_cube_counts",
    "q83_set_ops_users",
    "q84_incremental_ingest_dedup",
    "q85_length_quartiles",
    "q86_sessionize_stream",
    # the three heavy r02-only entries close the priority block
    "q64_kmeans_clusters",
    "q68_prefix_jaccard_pairs",
    "q74_dedup_groups",
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
