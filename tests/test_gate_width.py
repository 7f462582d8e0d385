"""The small-graph gate width is derived from the edge count (r16
optimization): ~GATE_TARGET_ROWS edge rows per task, floored at 8,
capped at defaultParallelism; None above the edge-row threshold; an
explicit ``striot.graph.smallGraphWidth`` overrides the derivation.
Pinning the arithmetic keeps the width a DATA property — a regression
back to a machine-constant width fails here."""

from __future__ import annotations

import pytest

from striot_spark.functions.graph import (
    GATE_TARGET_ROWS,
    GATE_WIDTH_CONF,
    SMALL_GRAPH_CONF,
    _gate_width,
)


@pytest.fixture()
def clean_conf(spark):
    for key in (GATE_WIDTH_CONF, SMALL_GRAPH_CONF):
        try:
            spark.conf.unset(key)
        except Exception:
            pass
    yield spark
    for key in (GATE_WIDTH_CONF, SMALL_GRAPH_CONF):
        try:
            spark.conf.unset(key)
        except Exception:
            pass


def test_big_graph_returns_none(clean_conf):
    spark = clean_conf
    assert _gate_width(spark, 5_000_001) is None
    assert _gate_width(spark, 10**12) is None


def test_small_graph_floor_is_8(clean_conf):
    spark = clean_conf
    # tiny graphs never drop below 8 tasks (keep multicore engaged)
    assert _gate_width(spark, 0) == 8
    assert _gate_width(spark, 1) == 8
    assert _gate_width(spark, 8 * GATE_TARGET_ROWS) == 8


def test_width_scales_with_edge_rows(clean_conf):
    spark = clean_conf
    dp = spark.sparkContext.defaultParallelism
    rows = 23 * GATE_TARGET_ROWS
    assert _gate_width(spark, rows) == min(dp, 23)
    # at the threshold boundary the width is capped by the machine
    assert _gate_width(spark, 5_000_000) == min(dp, -(-5_000_000 // GATE_TARGET_ROWS))


def test_override_conf_wins(clean_conf):
    spark = clean_conf
    spark.conf.set(GATE_WIDTH_CONF, "32")
    assert _gate_width(spark, 100) == 32
    # empty string = unset = derive
    spark.conf.set(GATE_WIDTH_CONF, "")
    assert _gate_width(spark, 100) == 8
    # override does NOT open the gate for big graphs
    spark.conf.set(GATE_WIDTH_CONF, "32")
    assert _gate_width(spark, 5_000_001) is None


def test_threshold_conf_respected(clean_conf):
    spark = clean_conf
    spark.conf.set(SMALL_GRAPH_CONF, "50")
    assert _gate_width(spark, 51) is None
    assert _gate_width(spark, 50) == 8


@pytest.fixture()
def clean_ckpt_conf(spark):
    from striot_spark.functions.graph import GATE_CKPT_CONF

    try:
        spark.conf.unset(GATE_CKPT_CONF)
    except Exception:
        pass
    yield spark
    try:
        spark.conf.unset(GATE_CKPT_CONF)
    except Exception:
        pass


def test_cut_every_gated_defaults_to_one(clean_ckpt_conf):
    from striot_spark.functions.graph import _cut_every

    spark = clean_ckpt_conf
    # gated: cut every round regardless of the caller's cadence
    assert _cut_every(spark, 8, 4) == 1
    assert _cut_every(spark, 32, 8) == 1


def test_cut_every_above_gate_keeps_caller(clean_ckpt_conf):
    from striot_spark.functions.graph import _cut_every

    spark = clean_ckpt_conf
    # above the gate (width None) the caller's cadence stands — the
    # 100 TB plan shape must not change
    assert _cut_every(spark, None, 4) == 4
    assert _cut_every(spark, 0, 8) == 8


def test_cut_every_conf_override(clean_ckpt_conf):
    from striot_spark.functions.graph import GATE_CKPT_CONF, _cut_every

    spark = clean_ckpt_conf
    spark.conf.set(GATE_CKPT_CONF, "3")
    assert _cut_every(spark, 8, 8) == 3
    # 0 restores the caller's cadence (the A/B escape hatch)
    spark.conf.set(GATE_CKPT_CONF, "0")
    assert _cut_every(spark, 8, 8) == 8


def test_gated_cut_cadence_is_result_invariant(clean_ckpt_conf):
    """The lineage cut is pure materialization: hits (the operator
    with the strongest measured cadence effect) must return identical
    rows whether the gated cadence is every round (default) or the
    caller's cadence (conf 0)."""
    from striot_spark.functions.graph import GATE_CKPT_CONF, hits

    spark = clean_ckpt_conf
    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("c", "y"), ("c", "x")],
        "src string, dst string",
    )
    out_default = sorted(
        tuple(r) for r in hits(edges, iterations=2).collect()
    )
    spark.conf.set(GATE_CKPT_CONF, "0")
    out_caller = sorted(
        tuple(r) for r in hits(edges, iterations=2).collect()
    )
    assert out_default == out_caller
