"""Golden pre/post tests for every rewrite rule — the reference's
``test_<rule>`` pattern (``LogicalOptimiser.hs:187-194`` and friends):
apply the rule to a hand-built pre-chain and assert the post-chain is
semantically identical on concrete inputs, via the pure evaluator.

Pure Python — no SparkSession needed.
"""

from __future__ import annotations

import random

import pytest

from striot_spark.plans.graph import (
    ExpandOp,
    FilterAccOp,
    FilterOp,
    MapOp,
    ScanOp,
    run_chain,
    run_fused,
)
from striot_spark.plans import rewrite as R

INTS = list(range(-20, 40))
LISTS = [[1, 2], [], [3], [4, 5, 6], [], [7]]


def double(v):
    return v * 2


def is_even(v):
    return v % 2 == 0


def is_pos(v):
    return v > 0


def add(acc, v):
    return acc + v


def changed(v, acc):
    return v != acc


CASES = [
    # (rule, pre-chain, inputs)
    (R.filter_fuse, (FilterOp(is_even), FilterOp(is_pos)), INTS),
    (R.map_fuse, (MapOp(double), MapOp(lambda v: v + 1)), INTS),
    (R.map_filter, (MapOp(double), FilterOp(is_pos)), INTS),
    (
        R.filter_filter_acc,
        (FilterOp(is_even), FilterAccOp(lambda a, v: v, None, changed)),
        [1, 1, 2, 2, 3, 4, 4, 5, 6, 6],
    ),
    (
        R.filter_acc_filter,
        (FilterAccOp(lambda a, v: v, None, changed), FilterOp(is_pos)),
        [1, 1, -2, -2, 3, 3, -4, 5],
    ),
    (
        R.filter_acc_filter_acc,
        (
            FilterAccOp(lambda a, v: v, None, changed),
            FilterAccOp(add, 0, lambda v, acc: acc < 50),
        ),
        [1, 1, 2, 3, 3, 40, 10, 5, 5, 2],
    ),
    (R.map_scan, (MapOp(double), ScanOp(add, 0)), INTS),
    (
        R.map_filter_acc,
        (MapOp(double), FilterAccOp(lambda a, v: v, None, changed)),
        [1, 1, 2, 3, 3, 4],
    ),
    (R.expand_filter, (ExpandOp(), FilterOp(is_even)), LISTS),
    (R.expand_map, (ExpandOp(), MapOp(double)), LISTS),
    (R.expand_expand, (ExpandOp(), ExpandOp()), [[[1, 2], [3]], [], [[4], []]]),
    (R.expand_scan, (ExpandOp(), ScanOp(add, 0)), LISTS),
    (
        R.expand_filter_acc,
        (ExpandOp(), FilterAccOp(lambda a, v: v, None, changed)),
        [[1, 1, 2], [2, 3], [], [3, 4, 4]],
    ),
]


@pytest.mark.parametrize(
    "rule,pre,inputs", CASES, ids=[c[0].__name__ for c in CASES]
)
def test_rule_preserves_semantics(rule, pre, inputs):
    post = rule(pre[0], pre[1])
    assert post is not None, "rule did not match its own pre-chain"
    assert run_chain(pre, inputs) == run_chain(post, inputs)


@pytest.mark.parametrize(
    "rule,pre,inputs", CASES, ids=[c[0].__name__ for c in CASES]
)
def test_rule_in_optimize_pipeline(rule, pre, inputs):
    opt = R.optimize(tuple(pre))
    assert run_chain(pre, inputs) == run_chain(opt, inputs)


def test_stateful_chain_fuses_to_one_stage():
    """filter → filterAcc → filter → filterAcc collapses to a single
    stateful op (one applyInPandas boundary instead of two+)."""
    chain = (
        FilterOp(is_pos),
        FilterAccOp(lambda a, v: v, None, changed),
        FilterOp(is_even),
        FilterAccOp(add, 0, lambda v, acc: acc < 100),
    )
    opt = R.optimize(chain)
    assert R.stateful_stages(opt) == 1
    data = [random.Random(7).randint(-5, 30) for _ in range(200)]
    assert run_chain(chain, data) == run_chain(opt, data)


def test_fused_kernel_matches_evaluator():
    chain = (
        MapOp(double),
        FilterOp(is_pos),
        ScanOp(add, 0),
        FilterAccOp(lambda a, v: v, None, changed),
    )
    rng = random.Random(42)
    data = [rng.randint(-10, 10) for _ in range(300)]
    assert run_fused(chain, data) == run_chain(chain, data)
    opt = R.optimize(chain)
    assert run_fused(opt, data) == run_chain(chain, data)


def test_optimize_terminates_and_is_idempotent():
    chain = (
        FilterOp(is_pos),
        FilterOp(is_even),
        MapOp(double),
        MapOp(lambda v: v - 1),
        ScanOp(add, 0),
    )
    opt = R.optimize(chain)
    assert R.optimize(opt) == opt


def test_chain_to_dot_renders_ops_and_jackson_style():
    """VizGraph parity (VizGraph.hs:streamGraphToDot/jacksonStyle):
    Source -> ops -> Sink digraph; utilisations annotate labels and an
    unstable node (rho >= 1) gets the red outline."""
    from striot_spark.plans.graph import FilterAccOp, FilterOp, MapOp
    from striot_spark.plans.viz import chain_to_dot

    chain = (
        FilterOp(pred=lambda v: v > 0, selectivity=0.5),
        MapOp(fn=lambda v: v * 2),
        FilterAccOp(
            step=lambda a, v: v, init=None, pred=lambda v, a: True
        ),
    )
    dot = chain_to_dot(chain, utilisations=[0.4, 1.2, 0.9])
    assert dot.startswith("digraph striot {")
    assert dot.count("->") == 4  # Source->f->m->fa->Sink
    assert "streamFilter" in dot and "streamMap" in dot
    assert "streamFilterAcc" in dot
    assert "rho=0.4" in dot and "rho=1.2" in dot
    assert "color=red" in dot  # the unstable node is highlighted
    assert dot.rstrip().endswith("}")


# -- opt-in reshaping rules (LogicalOptimiser.hs:976-1029) -------------------


def chop2(vs):
    return [vs[i : i + 2] for i in range(0, len(vs), 2)]


def complete(vs):
    return [list(vs)]


def test_filter_window_golden_shape():
    """filterWindow golden pre/post (LogicalOptimiser.hs:992-1006):
    filter >>> window  ⇒  window >>> map(filter)."""
    from striot_spark.plans.graph import WindowOp

    pre = (FilterOp(lambda v: v > 3), WindowOp(chop2))
    post = R.apply_first(pre, rules=R.RESHAPING_RULES)
    assert post is not None
    assert isinstance(post[0], WindowOp) and isinstance(post[1], MapOp)
    # exact for a value-independent maker over the same event set
    pre_c = (FilterOp(lambda v: v > 3), WindowOp(complete))
    post_c = R.apply_first(pre_c, rules=R.RESHAPING_RULES)
    data = list(range(10))
    assert run_chain(post_c, data) == run_chain(pre_c, data)


def test_filter_acc_window_golden_shape():
    """filterAccWindow golden pre/post (LogicalOptimiser.hs:1031-1049):
    filterAcc >>> window ⇒ window >>> scan(windowed filterAcc) >>> map;
    the accumulator must CARRY ACROSS windows, exactly like the
    unwindowed filterAcc stream."""
    from striot_spark.plans.graph import WindowOp

    # dedup-on-change, the reference's own example accumulator
    facc = FilterAccOp(
        step=lambda acc, v: v, init=None, pred=lambda v, acc: v != acc
    )
    pre = (facc, WindowOp(chop2))
    post = R.apply_first(pre, rules=R.RESHAPING_RULES)
    assert post is not None
    assert isinstance(post[0], WindowOp)
    assert isinstance(post[1], ScanOp) and isinstance(post[2], MapOp)
    # exact under the complete maker
    pre_c = (facc, WindowOp(complete))
    post_c = R.apply_first(pre_c, rules=R.RESHAPING_RULES)
    data = [1, 1, 2, 2, 2, 3, 1, 1]
    assert run_chain(post_c, data) == run_chain(pre_c, data)
    # and the per-window kept-lists concatenate to the unwindowed
    # filterAcc output (state threads across window boundaries)
    windowed = run_chain(
        (WindowOp(chop2),) + tuple(R.apply_first(pre, R.RESHAPING_RULES)[1:]),
        data,
    )
    assert [v for w in windowed for v in w] == run_chain((facc,), data)


def test_reshaping_rules_change_semantics_under_count_windows():
    """The DOCUMENTED caveat (LogicalOptimiser.hs:977-981): under a
    count-based maker, pre-filtering alters window membership — the
    rules reshape the plan, they do not preserve it. This is why they
    are opt-in and excluded from DEFAULT_RULES, like the reference's
    default set."""
    from striot_spark.plans.graph import WindowOp

    pre = (FilterOp(is_even), WindowOp(chop2))
    post = R.apply_first(pre, rules=R.RESHAPING_RULES)
    data = list(range(7))
    assert run_chain(pre, data) != run_chain(post, data)
    for rule in R.RESHAPING_RULES:
        assert rule not in R.DEFAULT_RULES
