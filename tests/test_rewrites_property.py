"""Property-based rewrite tests (the reference uses QuickCheck
properties over random graphs, SURVEY.md §5.3): for ANY randomly
composed op chain and ANY input list, the optimized chain and the fused
kernel must produce exactly the evaluator's output."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from striot_spark.plans.graph import (
    ExpandOp,
    FilterAccOp,
    FilterOp,
    MapOp,
    ScanOp,
    run_chain,
    run_fused,
)
from striot_spark.plans.rewrite import optimize, stateful_stages

# op pool over int payloads (expand ops wrap values into lists first so
# any op order is type-correct)
OPS = st.sampled_from(
    [
        MapOp(lambda v: v + 3),
        MapOp(lambda v: v * -1),
        FilterOp(lambda v: v % 2 == 0),
        FilterOp(lambda v: v > -5),
        ScanOp(lambda acc, v: acc + v, 0),
        ScanOp(lambda acc, v: max(acc, v), -(10**9)),
        FilterAccOp(lambda acc, v: v, None, lambda v, acc: v != acc),
        FilterAccOp(lambda acc, v: acc + 1, 0, lambda v, acc: acc % 3 != 2),
    ]
)


@st.composite
def chains(draw):
    """Chains where every ExpandOp is immediately preceded by a
    list-wrapping map (keeps payload types consistent)."""
    base = draw(st.lists(OPS, min_size=1, max_size=6))
    if draw(st.booleans()):
        pos = draw(st.integers(0, len(base)))
        base = (
            base[:pos]
            + [MapOp(lambda v: [v, v + 1]), ExpandOp()]
            + base[pos:]
        )
    return tuple(base)


@given(chain=chains(), data=st.lists(st.integers(-50, 50), max_size=60))
@settings(max_examples=200, deadline=None)
def test_optimize_preserves_semantics(chain, data):
    assert run_chain(optimize(chain), data) == run_chain(chain, data)


@given(chain=chains(), data=st.lists(st.integers(-50, 50), max_size=60))
@settings(max_examples=200, deadline=None)
def test_fused_kernel_equals_evaluator(chain, data):
    assert run_fused(chain, data) == run_chain(chain, data)
    opt = optimize(chain)
    assert run_fused(opt, data) == run_chain(chain, data)


@given(chain=chains())
@settings(max_examples=200, deadline=None)
def test_optimize_never_adds_stateful_stages(chain):
    assert stateful_stages(optimize(chain)) <= stateful_stages(chain)
