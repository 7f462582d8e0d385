"""Logical op-chain IR — the StreamGraph analogue.

Reference parity: StrIoT represents programs as ``Graph StreamVertex``
with operators Map | Filter | Expand | Window | Merge | Join | Scan |
FilterAcc | Source | Sink (``src/Striot/StreamGraph.hs:57-64,109-119``)
and rewrites them before codegen (SURVEY.md §4.1).

In this engine the *stateless* algebra (filter/map/expand/merge
reordering and fusion — 16 of the reference's 23 rules) is Catalyst's
job: those operators lower to declarative DataFrame ops and Catalyst's
CombineFilters / CollapseProject / PushDownPredicate / CombineUnions
subsume the rules. What Catalyst cannot see is a chain of *opaque
stateful* operators (scan / filterAcc with arbitrary Python state): each
one is an ``applyInPandas`` boundary — a full shuffle + Arrow
serialization round-trip. This IR exists to fuse those chains before
lowering, mirroring the reference's stateful rules
(``filterFilterAcc``, ``filterAccFilter``, ``filterAccFilterAcc``,
``mapScan``, ``mapFilterAcc``, ``expandScan``, ``expandFilterAcc`` —
``src/Striot/LogicalOptimiser.hs:244-920``).

Ops here carry plain Python callables over row dicts (the general path);
the pure evaluator ``run_chain`` defines the semantics and is the oracle
for rewrite-correctness tests (the reference's golden pre/post pattern,
SURVEY.md §5.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Iterable


@dataclass(frozen=True)
class Op:
    """Base class for chain operators."""


@dataclass(frozen=True)
class MapOp(Op):
    """streamMap: value -> value (FunctionalProcessing.hs:67-71)."""

    fn: Callable[[Any], Any]


@dataclass(frozen=True)
class FilterOp(Op):
    """streamFilter (FunctionalProcessing.hs:59-63)."""

    pred: Callable[[Any], bool]
    selectivity: float = 1.0  # reference carries these for costing


@dataclass(frozen=True)
class ExpandOp(Op):
    """streamExpand: each value is an iterable, flattened
    (FunctionalProcessing.hs:206-210)."""


@dataclass(frozen=True)
class ScanOp(Op):
    """streamScan: emit accumulator after each event
    (FunctionalProcessing.hs:188-191)."""

    step: Callable[[Any, Any], Any]
    init: Any


@dataclass(frozen=True)
class FilterAccOp(Op):
    """streamFilterAcc: pred sees pre-update accumulator; acc updates on
    every event (FunctionalProcessing.hs:181-185)."""

    step: Callable[[Any, Any], Any]
    init: Any
    pred: Callable[[Any, Any], bool]  # (value, acc) -> keep
    selectivity: float = 1.0


@dataclass(frozen=True)
class WindowOp(Op):
    """streamWindow: group the stream into list-valued events by a
    window maker (FunctionalProcessing.hs:84-90). ``maker`` maps the
    finite value list to a list of windows (lists). Present in the IR
    only for the opt-in reshaping rules (filterWindow /
    filterAccWindow, LogicalOptimiser.hs:983-1029); the engine's real
    window lowering is operators/windows.py."""

    maker: Callable[[list], list]


Chain = tuple[Op, ...]


def run_chain(ops: Iterable[Op], values: Iterable[Any]) -> list[Any]:
    """Pure-Python reference evaluator — the semantics oracle.

    Implements exactly the reference's per-operator behavior over a
    finite list (timestamps omitted: rewrites never touch them).
    """
    out = list(values)
    for op in ops:
        if isinstance(op, MapOp):
            out = [op.fn(v) for v in out]
        elif isinstance(op, FilterOp):
            out = [v for v in out if op.pred(v)]
        elif isinstance(op, ExpandOp):
            out = [x for v in out for x in v]
        elif isinstance(op, ScanOp):
            acc, res = op.init, []
            for v in out:
                acc = op.step(acc, v)
                res.append(acc)
            out = res
        elif isinstance(op, FilterAccOp):
            acc, res = op.init, []
            for v in out:
                if op.pred(v, acc):
                    res.append(v)
                acc = op.step(acc, v)
            out = res
        elif isinstance(op, WindowOp):
            out = [list(w) for w in op.maker(out)]
        else:
            raise TypeError(f"unknown op {op}")
    return out


def is_stateful(op: Op) -> bool:
    return isinstance(op, (ScanOp, FilterAccOp))


def compile_fused(ops: Iterable[Op]):
    """Collapse a chain into ONE stateful kernel:
    ``(state, value) -> (new_state, [outputs])``.

    This is the execution payoff of the rewrite layer: an N-op stateful
    chain becomes a single applyInPandas stage (one shuffle, one Arrow
    boundary) instead of N.
    """
    ops = tuple(ops)
    for op in ops:
        if not isinstance(
            op, (MapOp, FilterOp, ExpandOp, ScanOp, FilterAccOp)
        ):
            # WindowOp (and anything future) buffers across events —
            # not expressible as a per-event kernel; refuse loudly
            # rather than silently dropping the operator
            raise TypeError(f"compile_fused cannot fuse {op}")
    inits = tuple(op.init for op in ops if is_stateful(op))

    def kernel(state: tuple, value: Any) -> tuple[tuple, list[Any]]:
        states = list(state)
        vals = [value]
        si = 0
        for op in ops:
            if isinstance(op, MapOp):
                vals = [op.fn(v) for v in vals]
            elif isinstance(op, FilterOp):
                vals = [v for v in vals if op.pred(v)]
            elif isinstance(op, ExpandOp):
                vals = [x for v in vals for x in v]
            elif isinstance(op, ScanOp):
                res = []
                for v in vals:
                    states[si] = op.step(states[si], v)
                    res.append(states[si])
                vals = res
                si += 1
            elif isinstance(op, FilterAccOp):
                res = []
                for v in vals:
                    if op.pred(v, states[si]):
                        res.append(v)
                    states[si] = op.step(states[si], v)
                vals = res
                si += 1
        return tuple(states), vals

    return inits, kernel


def run_fused(ops: Iterable[Op], values: Iterable[Any]) -> list[Any]:
    """Evaluate via the fused kernel (used to cross-check compile_fused
    against run_chain)."""
    state, kernel = compile_fused(ops)
    out: list[Any] = []
    for v in values:
        state, emitted = kernel(state, v)
        out.extend(emitted)
    return out
