"""Physical-plan quality gates — the 100 TB contract, enforced.

Correct results with a bad plan fail at scale; these tests pin the
plan shapes: parquet predicate pushdown, broadcast (not sort-merge)
dimension joins, map-side partial aggregation, and no superfluous
shuffles. If a refactor regresses a plan, these fail before any
benchmark does.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from striot_spark.queries.registry import REGISTRY, _load

_load()


def _executed(spark, name, sf_dir) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(spark, name, sf_dir) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_reaches_parquet_scan(spark, sf_dir):
    plan = _formatted(spark, "q01_filter_map", sf_dir)
    assert "GreaterThan(value,100.0)" in plan  # PushedFilters hit the scan


def test_filter_map_has_zero_shuffles(spark, sf_dir):
    plan = _executed(spark, "q01_filter_map", sf_dir)
    assert "Exchange" not in plan  # pure scan+project pipeline


def test_dim_joins_broadcast_not_sort_merge(spark, sf_dir):
    for q in ("q18_top_orders", "q19_regional_revenue", "q20_top_customers"):
        plan = _executed(spark, q, sf_dir)
        assert "BroadcastHashJoin" in plan, q
        assert "SortMergeJoin" not in plan, q


def test_star_join_pushes_dim_filters(spark, sf_dir):
    plan = _formatted(spark, "q19_regional_revenue", sf_dir)
    assert "EqualTo(r_name,ASIA)" in plan
    plan18 = _formatted(spark, "q18_top_orders", sf_dir)
    assert "EqualTo(c_mktsegment,BUILDING)" in plan18
    assert "GreaterThanOrEqual(o_orderdate," in plan18


def test_tumbling_agg_has_partial_aggregation(spark, sf_dir):
    """chop window agg: exactly one shuffle, partial+final HashAggregate."""
    plan = _executed(spark, "q04_chop_count_window", sf_dir)
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2


def test_pricing_summary_single_shuffle(spark, sf_dir):
    plan = _executed(spark, "q17_pricing_summary", sf_dir)
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2


def test_dense_seq_count_window_avoids_global_sort(spark, sf_dir):
    """Chop over the dense seq must not contain a single-partition
    row_number (the unscalable fallback)."""
    plan = _executed(spark, "q04_chop_count_window", sf_dir)
    assert "row_number" not in plan.lower()


def test_ann_broadcasts_query_side(spark, sf_dir):
    plan = _executed(spark, "q27_ann_cosine", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_column_pruning_on_documents(spark, sf_dir):
    """q23 projects only (doc_id, text): the scan must not read other
    document columns."""
    plan = _formatted(spark, "q23_dedup_exact", sf_dir)
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines, "no ReadSchema in formatted plan"
    for line in scan_lines:
        assert "lang" not in line and "source" not in line, line
