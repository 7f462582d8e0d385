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

import functools
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

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str):
            # long sessions (the driver's 50-query sweep) would otherwise
            # accumulate the pair-generation operators' persisted work
            # tables until eviction pressure (ADVICE r05): by the time
            # the NEXT query starts, the previous one's result has been
            # materialized and compared, so its caches are dead weight
            from striot_spark.functions.caching import release_persisted

            release_persisted()
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(fn=wrapped, oracle=oracle, doc=doc)
        return fn

    return deco


# Driver sweep order. The driver's CORRECTNESS sweep caps at the first 50
# registry entries per round. Round 6 produced NO driver artifacts
# (no CORRECTNESS_r06.json landed), so entering round 7 the freshest
# driver rows are still r05: q93/q100 red, everything else green in
# r04/r05, and 32 registered queries (q93d, q100d, q101-q130) have no
# driver row at all. Round-7 priorities, in order:
#   (1) the two r05 reds (q93, q100) whose lowerings round 6 rewrote,
#       plus their double-money hash-probe shadows and the adversarial
#       q101 - these settle VERDICT r05 tasks 1/2/5;
#   (2) all round-6 additions q102-q130 - registered after the r05
#       sweep, so they have never had a driver row;
#   (3) the streaming queries whose staging/finalize behavior round 6
#       changed (single-file sorted `_stage_events`, q92 max_by
#       finalize) - their r04/r05 green rows predate the code they
#       now run, so green must be re-earned;
#   (4) new round-7 queries are appended here as they are registered,
#       consuming the remaining head slots up to the 50 cap.
# The stable pure-batch r04-green cohort (q11-q50 era, untouched
# code) stays mid-order / _SWEEP_LAST and rotates in round 8.
_SWEEP_FIRST = [
    # (1) r05 reds + hash-probe shadows + adversarial replay
    "q93_joinw_stream_non_nesting",
    "q100_chop_count_stream",
    "q93d_joinw_stream_money_double",
    "q100d_chop_stream_money_double",
    "q101_sliding_stream_ooo_replay",
    # (2) round-6 additions, never driver-swept
    "q102_tfidf_top_terms",
    "q103_blocklist_filter",
    "q104_canonical_docs",
    "q105_token_budget_select",
    "q106_temperature_mix",
    "q107_latest_snapshot",
    "q108_stream_static_enrich",
    "q109_shared_ngram_pairs",
    "q110_quality_filter_linear",
    "q111_sliding_time_stream",
    "q112_domain_quality_filter",
    "q113_bloom_decontaminate",
    "q114_scrub_duplicated_spans",
    "q115_daily_distinct_stream",
    "q116_interval_join_stream",
    "q117_joine_stream",
    "q118_quality_audit",
    "q119_snapshot_diff",
    "q120_merge_stream",
    "q121_expand_stream",
    "q122_corpus_ingest_stream",
    "q123_zip_join_stream",
    "q124_column_profile",
    "q125_upsert_snapshot_stream",
    "q126_volume_shipping",
    "q127_market_share",
    "q128_cms_heavy_hitters",
    "q129_dedup_groups_logrounds",
    "q130_cms_sketch_stream",
    # (3) staging/finalize behavior-touched streaming (green rows are
    # for pre-round-6 code)
    "q92_scan_stream_global",
    "q97_filteracc_stream_global",
    "q65_frequent_routes_stream",
    "q78_window_agg_stream",
    "q86_sessionize_stream",
    "q87_joinw_stream",
    "q89_scan_stream",
    "q90_filteracc_stream",
    "q91_sliding_count_stream",
    # (4) round-7 additions go here as they are registered
    "q131_systematic_weighted_sample",
    "q132_bucketed_colocated_join",
    "q133_pagerank_customer_supplier",
    "q134_scd2_history",
    "q135_snapshot_asof",
    "q136_novelty_stats",
    "q137_zorder_zone_map",
    # beyond the 50 cap from here down - no driver row possible this
    # round; ROUND-8/9 HEAD PLAN: the never-swept cohort is q138-q221
    # (84 registry entries, every one green in the full plain-session
    # sweeps this round) - that is MORE than one head, so it rotates
    # over two rounds: round 8 sweeps q138-q187 (50 exactly); round 9
    # sweeps q188-q221 (34) + the oldest stale rows (_SWEEP_LAST's
    # seven r04-green queries + 9 more of the r04 q11-q50 batch) to
    # fill 50; the cohort swept green in r07 (q93-q137 head) waits
    # for r10. Keep this arithmetic in sync when appending queries.
    "q138_incremental_agg_stream",
    "q139_hll_distinct",
    "q140_fuzzy_link_pairs",
    "q141_hll_sketch_stream",
    "q142_skew_profile",
    "q143_compact_small_files",
    "q144_importance_weights",
    "q145_label_centroids",
    "q146_interarrival_stats",
    "q147_quantiles_at_scale",
    "q148_table_digest",
    "q149_triangle_count",
    "q150_table_digest_stream",
    "q151_group_quantiles",
    "q152_pit_enrich_stream",
    "q153_conversion_funnel",
    "q154_retention_cohorts",
    "q155_rolling_active_users",
    "q156_hll_rolling_merge",
    "q157_event_transitions",
    "q158_mad_outliers",
    "q159_join_size_estimate",
    "q160_gini_diversity",
    "q161_ohlc_bars",
    "q162_gap_fill_ffill",
    "q163_entity_resolution",
    "q164_ohlc_bars_stream",
    "q165_pii_scrub",
    "q166_grain_rollup_reuse",
    "q167_cdc_apply_deletes",
    "q168_k_anonymity",
    "q169_winsorized_stats",
    "q170_posting_lists",
    "q171_weighted_median_len",
    "q172_kcore_parts",
    "q173_partition_pruned_day",
    "q174_rollup_serve_stream",
    "q175_pq_encode",
    "q176_ann_recall_eval",
    "q177_collocations",
    "q178_lexical_search",
    "q179_cdc_apply_stream",
    "q180_forecast_revenue_band",
    "q181_promo_revenue_share",
    "q182_rank_normalize",
    "q183_equiwidth_histogram",
    "q184_freshness_audit",
    "q185_oov_audit",
    "q186_dup_cluster_census",
    "q187_leakage_aware_split",
    "q188_cap_per_cluster",
    "q189_freshness_stream",
    "q190_media_embed",
    "q191_trend_stats",
    "q192_scd2_enrich",
    "q193_twap_daily",
    "q194_pareto_frontier",
    "q195_debounce_per_user",
    "q196_burst_detection",
    "q197_curriculum_interleave",
    "q198_debounce_stream",
    "q199_returned_revenue_customers",
    "q200_sorted_export",
    "q201_json_schema_profile",
    "q202_large_order_customers",
    "q203_nearest_event_align",
    "q204_int8_quantize",
    "q205_session_stats",
    "q206_burst_detection_stream",
    "q207_timed_funnel",
    "q208_trigram_patterns",
    "q209_segment_overlap",
    "q210_corpus_card",
    "q211_mixed_language_audit",
    "q212_disorder_profile",
    "q213_source_drift",
    "q214_dup_threshold_curve",
    "q215_compression_quality",
    "q216_peak_concurrency",
    "q217_customer_order_distribution",
    "q218_top_supplier",
    "q219_small_quantity_revenue",
    "q220_stream_exact_dedup",
    "q221_weekend_split",
    "q222_stratum_floor_split",
    "q223_weekly_top_event",
]
# Everything below the 50 cap is r04/r05-green untouched batch code;
# order among them is irrelevant to the driver. _SWEEP_LAST kept for
# round-8 rotation bookkeeping (oldest stable cohort: r04 rows).
_SWEEP_LAST: list[str] = [
    "q13_percentiles",
    "q14_value_histogram",
    "q35_complete_window",
    "q80_unpivot_money_metrics",
    "q82_cube_counts",
    "q83_set_ops_users",
    "q85_length_quartiles",
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
