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


# Driver sweep order. The driver's CORRECTNESS sweep caps at the first
# 50 registry entries per round, so this list is rebuilt each round to
# put the queries that most need a driver row at the head.
#
# ROUND-OPEN PROTOCOL: run `python tools/ledger.py --check` BEFORE the
# first sweep of every round. It computes the cumulative ledger (latest
# row per query across all CORRECTNESS_r*.json) and proposes the
# canonical next head; exit 1 at round open means rebuild this list to
# the tool's proposal first. The tool is authoritative — prose comments
# here have gone stale twice (r12 named nine queries that already had
# r10 rows; r13's tail comment named q13 where the tool picks q187).
# Do not hand-build the head from comments.
#
# History: r8 fixed the HUGEINT hash artifact registry-wide; r9 cleared
# the never-swept backlog; r10 re-swept the five r07 ex-reds + the r9
# additions; r11 swept the r10 additions + 43 of the stalest q01..q64
# block; r12 swept its plan verbatim (ledger reached 269/269
# green-at-latest); r13 swept canary + the 24 r12 additions + the 24
# r07-rowed entries + q138 (50/50 green — ledger reached 293/293
# green-at-latest with zero never-swept for the first time).
# r16 swept canary + the 47 r10-rowed entries + q247/q243 (50/50
# green — oldest evidence advanced to r11).
# ROUND-17 HEAD (executes VERDICT r16 task 1, tool-ratified against
# `python tools/ledger.py --check` at r17 open):
#   (1) q224_type_canary FIRST, as in every round;
#   (2) the 47 remaining r11-rowed entries (q245, q246, q244, q248,
#       the q21..q64 cohort, q01..q04), oldest ledger rows after r16
#       rotated the r10 cohort;
#   (3) q249_sssp_trade_proximity + q250_pagerank_stream_serve -- the
#       two oldest r12 rows.
# 1 + 47 + 2 = 50 exactly. After this sweep the oldest ledger
# evidence is r12. Verify with the tool, not this prose.
_SWEEP_FIRST = [
    # (1) type canary -- keep at head position 1 in every round
    "q224_type_canary",
    # (2) the 49 oldest ledger rows (47 remaining r11 rows, then the two
    #     oldest r12 rows q249/q250) -- executes VERDICT r16 task 1,
    #     tool-ratified against `python tools/ledger.py --check` at r17
    #     open. This puts the r16 k_truss rewrite (q244) and q248 under
    #     the driver oracle. After this sweep the oldest evidence is r12.
    "q245_khop_hll_stream_serve",
    "q246_neighborhood_function",
    "q244_ktruss_edges",
    "q248_harmonic_centrality",
    "q31_joinw_revenue_per_click",
    "q32_joine_window_theta",
    "q33_sliding_time_window",
    "q34_filteracc_above_running_avg",
    "q39_sliding_time_forward",
    "q40_empty_windows",
    "q41_merge_timestamp_order",
    "q46_profitability_cells",
    "q36_window_expand_roundtrip",
    "q53_asof_enrich",
    "q54_time_rollup",
    "q55_json_props",
    "q56_daily_distinct_users",
    "q59_interval_join",
    "q60_salted_skew_join",
    "q61_approx_aggregates",
    "q21_text_stats",
    "q22_lang_id",
    "q23_dedup_exact",
    "q24_doc_fingerprint",
    "q25_minhash_signatures",
    "q26_simhash",
    "q27_ann_cosine",
    "q28_multimodal_meta",
    "q37_ann_ivf",
    "q38_quality_class",
    "q42_embedding_near_dups",
    "q43_rolling_fingerprint",
    "q44_bpe_token_stats",
    "q45_simhash_near_dups",
    "q29_lsh_near_dups",
    "q48_ann_lsh",
    "q51_stratified_sample",
    "q52_reservoir_per_lang",
    "q57_chunk_documents",
    "q58_corpus_build",
    "q62_sequence_pack",
    "q63_nearest_centroid",
    "q64_kmeans_clusters",
    "q01_filter_map",
    "q02_expand_tokens",
    "q03_merge",
    "q04_chop_count_window",
    "q249_sssp_trade_proximity",
    "q250_pagerank_stream_serve",
    # ---- 50-cap boundary: entries below get no driver row in r17 ----
    # Tail is oldest-ledger-row-first (r12 remainder, then r13..r16)
    # so the r18 head is canary + the next 49 verbatim.
    # Tool-generated; run `python tools/ledger.py --check` rather than
    # trusting prose.
    "q251_degree_distribution",
    "q252_degree_assortativity",
    "q253_sssp_parents",
    "q254_harmonic_pivots",
    "q255_local_clustering",
    "q256_link_prediction_ra",
    "q257_min_cost_supplier",
    "q258_product_profit",
    "q259_important_parts",
    "q260_priority_line_counts",
    "q261_supplier_counts_by_part_attr",
    "q262_or_block_revenue",
    "q263_excess_volume_suppliers",
    "q264_strength_core",
    "q265_shuffle_shard",
    "q266_coreness",
    "q267_sssp_stream_serve",
    "q05_choptime_window",
    "q06_sliding_count_window",
    "q07_scan_running_sum",
    "q08_changes_dedup",
    "q09_sample",
    "q10_zip_join",
    "q11_topk_per_window",
    "q12_sessionize",
    "q15_threshold_cross",
    "q16_step_count",
    "q47_broadcast_enrich",
    "q49_wearable_chain",
    "q50_window_custom_fold",
    "q30_frequent_routes",
    "q17_pricing_summary",
    "q18_top_orders",
    "q19_regional_revenue",
    "q20_top_customers",
    "q215_compression_quality",
    "q100d_chop_stream_money_double",
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
    "q272_unigram_surprisal",
    "q275_mrr_eval",
    "q276_bm25_rank",
    "q279_map_eval",
    "q280_bigram_surprisal",
    "q283_prototypicality_band",
    "q288_hard_negatives",
    "q289_frequent_trigrams",
    "q274_decayed_user_activity",
    "q284_exponential_histogram",
    "q290_first_touch_attribution",
    "q273_surprisal_stream",
    "q282_bm25_stream_serve",
    "q286_exp_histogram_stream_serve",
    "q268_betweenness_pivots",
    "q269_coreness_stream_serve",
    "q270_coreness_hub_capped",
    "q271_link_prediction_ra_capped",
    "q277_hits_trade",
    "q278_butterfly_count",
    "q281_rich_club",
    "q285_transitivity",
    "q287_katz_centrality",
    "q291_avg_neighbor_degree",
    "q118_quality_audit",
    "q119_snapshot_diff",
    "q124_column_profile",
    "q112_domain_quality_filter",
    "q113_bloom_decontaminate",
    "q114_scrub_duplicated_spans",
    "q128_cms_heavy_hitters",
    "q129_dedup_groups_logrounds",
    "q131_systematic_weighted_sample",
    "q136_novelty_stats",
    "q134_scd2_history",
    "q135_snapshot_asof",
    "q115_daily_distinct_stream",
    "q116_interval_join_stream",
    "q117_joine_stream",
    "q120_merge_stream",
    "q121_expand_stream",
    "q122_corpus_ingest_stream",
    "q123_zip_join_stream",
    "q125_upsert_snapshot_stream",
    "q130_cms_sketch_stream",
    "q126_volume_shipping",
    "q133_pagerank_customer_supplier",
    "q137_zorder_zone_map",
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
    "q225_stream_near_dup_filter",
    "q226_bloom_file_skip",
    "q227_phrase_search",
    "q228_lpa_communities",
    "q229_stream_quantile_bins",
    "q230_lpa_modularity",
    "q231_equidepth_histogram",
    "q232_personalized_pagerank",
    "q233_hll_set_algebra",
    "q234_association_rules",
    "q235_minhash_cohort_similarity",
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
    "q216_peak_concurrency",
    "q217_customer_order_distribution",
    "q218_top_supplier",
    "q219_small_quantity_revenue",
    "q220_stream_exact_dedup",
    "q221_weekend_split",
    "q222_stratum_floor_split",
    "q223_weekly_top_event",
    "q13_percentiles",
    "q93_joinw_stream_non_nesting",
    "q100_chop_count_stream",
    "q101_sliding_stream_ooo_replay",
    "q127_market_share",
    "q132_bucketed_colocated_join",
    "q236_pagerank_dangling",
    "q237_weighted_pagerank",
    "q238_weighted_modularity",
    "q239_lpa_stream_weighted",
    "q240_incremental_extents_stream",
    "q241_khop_reach",
    "q242_edge_neighborhood_jaccard",
    "q14_value_histogram",
    "q35_complete_window",
    "q80_unpivot_money_metrics",
    "q82_cube_counts",
    "q83_set_ops_users",
    "q85_length_quartiles",
    "q87_joinw_stream",
    "q93d_joinw_stream_money_double",
    "q79_pivot_event_counts",
    "q74_dedup_groups",
    "q75_vocab_encode",
    "q76_split_assign",
    "q77_random_projection",
    "q68_prefix_jaccard_pairs",
    "q69_contamination_check",
    "q94_cross_corpus_near_dups",
    "q95_contamination_scores",
    "q70_repetition_stats",
    "q71_corpus_mix",
    "q96_semantic_near_dups",
    "q84_incremental_ingest_dedup",
    "q66_null_passthrough_chain",
    "q67_joine_positional_untimed",
    "q65_frequent_routes_stream",
    "q78_window_agg_stream",
    "q86_sessionize_stream",
    "q88_taxi_csv_dead_letter",
    "q89_scan_stream",
    "q90_filteracc_stream",
    "q91_sliding_count_stream",
    "q92_scan_stream_global",
    "q72_priority_semi_join",
    "q73_inactive_customers_anti_join",
    "q81_sole_returned_supplier",
    "q97_filteracc_stream_global",
    "q98_docs_jsonl_dead_letter",
    "q99_corpus_pipeline",
    "q247_hybrid_rrf",
    "q243_khop_reach_hll",
]

# Everything below the 50 cap is driver-green untouched code; order
# among them is irrelevant to the driver. _SWEEP_LAST is now empty:
# the r03/r04 rotation cohort moved into the r10 head (slot group 4).
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
        canary,
        composite,
        datapipe,
        events_ops,
        flagship,
        tpch,
    )

    _LOADED = True
