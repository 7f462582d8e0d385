"""Rewrite rules over the op-chain IR.

Ports exactly the reference rules that Catalyst cannot express — the
ones touching opaque stateful operators — plus the stateless fusions
needed to feed them (the reference's full rule list: SURVEY.md §4.1;
rule sources cited per function from ``src/Striot/LogicalOptimiser.hs``).

Every rule is semantics-preserving over ``graph.run_chain`` (the pure
evaluator); each ships a golden pre/post test in
``tests/test_rewrites.py`` mirroring the reference's ``test_<rule>``
pre/post-graph pattern (``LogicalOptimiser.hs:187-194`` etc.).

Why bother in a Spark engine: every opaque stateful op lowers to its own
``applyInPandas`` stage (shuffle + Arrow round-trip). Fusing
filter/map/expand into neighboring scan/filterAcc ops, and adjacent
stateful ops into each other, minimizes the number of those stages —
the reference's motivation (fewer nodes) transposed to Spark's real
cost model (fewer stateful boundaries).
"""

from __future__ import annotations

from typing import Callable, Optional

from striot_spark.plans.graph import (
    Chain,
    ExpandOp,
    FilterAccOp,
    FilterOp,
    MapOp,
    Op,
    ScanOp,
    WindowOp,
    is_stateful,
)

# A rule inspects the pair (a, b) and returns replacement ops or None.
PairRule = Callable[[Op, Op], Optional[tuple[Op, ...]]]


def filter_fuse(a: Op, b: Op):
    """filter p >>> filter q ⇒ filter (p ∧ q)  (LogicalOptimiser.hs:166-175)."""
    if isinstance(a, FilterOp) and isinstance(b, FilterOp):
        return (
            FilterOp(
                lambda v, p=a.pred, q=b.pred: p(v) and q(v),
                a.selectivity * b.selectivity,
            ),
        )
    return None


def map_fuse(a: Op, b: Op):
    """map f >>> map g ⇒ map (g ∘ f)  (LogicalOptimiser.hs:368-373)."""
    if isinstance(a, MapOp) and isinstance(b, MapOp):
        return (MapOp(lambda v, f=a.fn, g=b.fn: g(f(v))),)
    return None


def map_filter(a: Op, b: Op):
    """map f >>> filter p ⇒ filter (p ∘ f) >>> map f
    (predicate pushdown through projection, LogicalOptimiser.hs:199-207)."""
    if isinstance(a, MapOp) and isinstance(b, FilterOp):
        return (
            FilterOp(lambda v, f=a.fn, p=b.pred: p(f(v)), b.selectivity),
            a,
        )
    return None


def filter_filter_acc(a: Op, b: Op):
    """filter p >>> filterAcc f a q ⇒ single filterAcc whose accumulator
    updates only for events passing p  (LogicalOptimiser.hs:244-252)."""
    if isinstance(a, FilterOp) and isinstance(b, FilterAccOp):
        return (
            FilterAccOp(
                step=lambda acc, v, p=a.pred, f=b.step: f(acc, v) if p(v) else acc,
                init=b.init,
                pred=lambda v, acc, p=a.pred, q=b.pred: p(v) and q(v, acc),
                selectivity=a.selectivity * b.selectivity,
            ),
        )
    return None


def filter_acc_filter(a: Op, b: Op):
    """filterAcc f a p >>> filter q ⇒ filterAcc f a (p ∧ q)
    (LogicalOptimiser.hs:284-290)."""
    if isinstance(a, FilterAccOp) and isinstance(b, FilterOp):
        return (
            FilterAccOp(
                step=a.step,
                init=a.init,
                pred=lambda v, acc, p=a.pred, q=b.pred: p(v, acc) and q(v),
                selectivity=a.selectivity * b.selectivity,
            ),
        )
    return None


def filter_acc_filter_acc(a: Op, b: Op):
    """filterAcc f a p >>> filterAcc g b q ⇒ one filterAcc over the
    paired accumulator; the second acc updates only for events the first
    kept  (LogicalOptimiser.hs:321-329)."""
    if isinstance(a, FilterAccOp) and isinstance(b, FilterAccOp):
        return (
            FilterAccOp(
                step=lambda st, v, f=a.step, g=b.step, p=a.pred: (
                    f(st[0], v),
                    g(st[1], v) if p(v, st[0]) else st[1],
                ),
                init=(a.init, b.init),
                pred=lambda v, st, p=a.pred, q=b.pred: p(v, st[0])
                and q(v, st[1]),
                selectivity=a.selectivity * b.selectivity,
            ),
        )
    return None


def map_scan(a: Op, b: Op):
    """map f >>> scan g a ⇒ scan (λacc v → g acc (f v)) a
    (LogicalOptimiser.hs:391-396)."""
    if isinstance(a, MapOp) and isinstance(b, ScanOp):
        return (ScanOp(lambda acc, v, f=a.fn, g=b.step: g(acc, f(v)), b.init),)
    return None


def map_filter_acc(a: Op, b: Op):
    """map f >>> filterAcc g a p ⇒ filterAcc (g∘f) a (p∘f) >>> map f
    (LogicalOptimiser.hs:455-463; f evaluated twice, as in the ref)."""
    if isinstance(a, MapOp) and isinstance(b, FilterAccOp):
        return (
            FilterAccOp(
                step=lambda acc, v, f=a.fn, g=b.step: g(acc, f(v)),
                init=b.init,
                pred=lambda v, acc, f=a.fn, p=b.pred: p(f(v), acc),
                selectivity=b.selectivity,
            ),
            a,
        )
    return None


def expand_filter(a: Op, b: Op):
    """expand >>> filter p ⇒ map (filter p) >>> expand
    (LogicalOptimiser.hs:425-431)."""
    if isinstance(a, ExpandOp) and isinstance(b, FilterOp):
        return (
            MapOp(lambda vs, p=b.pred: [v for v in vs if p(v)]),
            a,
        )
    return None


def expand_map(a: Op, b: Op):
    """expand >>> map f ⇒ map (map f) >>> expand
    (LogicalOptimiser.hs:604-612)."""
    if isinstance(a, ExpandOp) and isinstance(b, MapOp):
        return (MapOp(lambda vs, f=b.fn: [f(v) for v in vs]), a)
    return None


def expand_expand(a: Op, b: Op):
    """expand >>> expand ⇒ map concat >>> expand
    (LogicalOptimiser.hs:684-690)."""
    if isinstance(a, ExpandOp) and isinstance(b, ExpandOp):
        return (MapOp(lambda vs: [x for v in vs for x in v]), a)
    return None


def expand_scan(a: Op, b: Op):
    """expand >>> scan f a ⇒ filter nonempty >>> scan-on-lists >>>
    map snd >>> expand  (LogicalOptimiser.hs:638-653)."""
    if isinstance(a, ExpandOp) and isinstance(b, ScanOp):

        def list_scan(st, vs, f=b.step):
            acc, out = st[0], []
            for v in vs:
                acc = f(acc, v)
                out.append(acc)
            return (acc, out)

        return (
            FilterOp(lambda vs: len(vs) > 0),
            ScanOp(list_scan, (b.init, [])),
            MapOp(lambda st: st[1]),
            a,
        )
    return None


def expand_filter_acc(a: Op, b: Op):
    """expand >>> filterAcc f a p ⇒ scan (list filterAcc) >>> map kept
    >>> expand  (LogicalOptimiser.hs:903-920)."""
    if isinstance(a, ExpandOp) and isinstance(b, FilterAccOp):

        def list_facc(st, vs, f=b.step, p=b.pred):
            acc, kept = st[0], []
            for v in vs:
                if p(v, acc):
                    kept.append(v)
                acc = f(acc, v)
            return (acc, kept)

        return (
            ScanOp(list_facc, (b.init, [])),
            MapOp(lambda st: st[1]),
            a,
        )
    return None


# -- opt-in reshaping rules --------------------------------------------------
#
# The reference ships two rules that move a (stateful) filter to AFTER
# the window operator (LogicalOptimiser.hs:976-1029). They are NOT
# generally semantics-preserving — the reference's own comment
# (LogicalOptimiser.hs:977-981): if the window maker decides on values
# or sequencing (any count-based maker), pre-filtering alters window
# membership, and the filter's selectivity is lost for costing. The
# reference keeps them OUT of its default rule set; so do we —
# RESHAPING_RULES must be passed explicitly. They are exact for
# value-independent makers over the same event set (e.g. the complete
# window); tests/test_rewrites.py pins both the golden pre/post shapes
# and a demonstration of the documented semantics change under chop n.


def filter_window(a: Op, b: Op):
    """filter p >>> window w ⇒ window w >>> map (filter p)
    (``filterWindow``, LogicalOptimiser.hs:983-990)."""
    if isinstance(a, FilterOp) and isinstance(b, WindowOp):
        return (
            b,
            MapOp(lambda vs, p=a.pred: [v for v in vs if p(v)]),
        )
    return None


def filter_acc_window(a: Op, b: Op):
    """filterAcc f a p >>> window w ⇒ window w >>> scan (per-window
    filterAcc carrying the accumulator) >>> map kept
    (``filterAccWindow``, LogicalOptimiser.hs:1014-1029). The scan
    state is ``(kept_reversed, acc)`` and the map reverses, mirroring
    the reference's ``([], a)`` / ``reverse . fst`` shape."""
    if isinstance(a, FilterAccOp) and isinstance(b, WindowOp):

        def list_facc(st, vs, f=a.step, p=a.pred):
            acc, kept = st[1], []
            for v in vs:
                if p(v, acc):
                    kept.append(v)
                acc = f(acc, v)
            return (kept[::-1], acc)

        return (
            b,
            ScanOp(list_facc, ([], a.init)),
            MapOp(lambda st: st[0][::-1]),
        )
    return None


#: semantics-changing reshaping rules — opt-in, NEVER in DEFAULT_RULES
#: (the reference excludes them from its defaults too)
RESHAPING_RULES: tuple[PairRule, ...] = (filter_window, filter_acc_window)


#: default rule set, in application order (stateful fusions first — they
#: are the ones that remove applyInPandas stages)
DEFAULT_RULES: tuple[PairRule, ...] = (
    filter_filter_acc,
    filter_acc_filter,
    filter_acc_filter_acc,
    map_scan,
    map_filter_acc,
    filter_fuse,
    map_fuse,
    map_filter,
    expand_filter,
    expand_map,
    expand_expand,
    expand_scan,
    expand_filter_acc,
)


def apply_first(chain: Chain, rules=DEFAULT_RULES) -> Optional[Chain]:
    """Apply the first matching rule at the leftmost position (the
    reference's firstMatch strategy, LogicalOptimiser.hs:82-98)."""
    for i in range(len(chain) - 1):
        for rule in rules:
            repl = rule(chain[i], chain[i + 1])
            if repl is not None:
                return chain[:i] + repl + chain[i + 2 :]
    return None


def optimize(chain: Chain, rules=DEFAULT_RULES, max_steps: int = 100) -> Chain:
    """Rewrite to fixpoint, guarded against non-terminating rule sets.

    Only accepts a step if it does not increase the number of stateful
    ops (the cost proxy: applyInPandas stages)."""
    current = tuple(chain)
    for _ in range(max_steps):
        nxt = apply_first(current, rules)
        if nxt is None:
            return current
        if sum(is_stateful(o) for o in nxt) > sum(is_stateful(o) for o in current):
            return current
        current = nxt
    return current


def stateful_stages(chain: Chain) -> int:
    """Number of applyInPandas boundaries this chain would lower to."""
    return sum(1 for o in chain if is_stateful(o))
