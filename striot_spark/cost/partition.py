"""Deployment-plan enumeration + cost selection (advisory module).

Reference parity — the enumerate-and-pick pipeline that sits on top of
the Jackson and bandwidth models:

- ``all_partitions`` ports ``allPartitions``
  (``src/Striot/Partition.hs:26-31``): every valid partitioning of a
  stream graph, where a valid partition holds at most one Source or
  Sink, and a Merge operator is always the first (flow-order) operator
  of its partition. The reference builds these by left-folding the
  TRANSPOSED graph (sink-first traversal, ``Partition.hs:48-54``) and
  extending each candidate with "new partition" / "append to last"
  choices (``extendPartitioning``, ``Partition.hs:115-123``); this port
  reproduces that construction — including its enumeration ORDER, which
  the reference's own test vectors pin (``test_g'``/``test_g2``/
  ``test_g3``, ``Partition.hs:128-148``, reproduced in
  tests/test_partition.py).
- ``plan_cost`` ports ``planCost`` (``src/Striot/
  Orchestration.hs:120-127``): a plan (graph + partition map) is
  non-viable (None) if any operator is over-utilised (ρ > 1,
  ``Jackson.hs:346-347`` via ``cost/jackson.py``), any partition's
  summed utilisation exceeds ``max_node_util`` (``Orchestration.hs:
  166-176``; default 3.0, ``CompileIoT.hs:118``), or a source-connected
  partition's egress exceeds ``max_bandwidth``
  (``Bandwidth.hs:176-188`` via ``cost/bandwidth.py``; default 200
  bytes/s, ``CompileIoT.hs:119``); otherwise its cost is the partition
  count — fewer deployment nodes is better.
- ``viable_plans`` / ``choose_plan`` port the selection half of
  ``viableRewrites`` / ``chopAndChange`` (``Orchestration.hs:74-97``):
  enumerate, cost, drop non-viable, pick the cheapest. The reference
  additionally folds rewrite-rule *variants* of the graph into the
  candidate set; in this engine the stateless variants are Catalyst's
  job and the stateful-chain variants live in ``plans/rewrite.py``
  (chain IR), so the variant set enters here as "call viable_plans per
  candidate graph and take the global min" — see ``choose_plan``'s
  ``candidates`` parameter.

On Spark this whole module is advisory (SURVEY.md §4.3 / M6): placement
is owned by the scheduler + AQE, and "partition" reads as "executor
group running a fused stage". The value is the same sanity questions
the reference asks at deploy time: can this pipeline keep up at the
declared rates, and does any stage grouping overload one node or one
egress link?
"""

from __future__ import annotations

from dataclasses import dataclass

from striot_spark.cost.bandwidth import (
    BGraph,
    depart_rate,
    over_bandwidth_limit,
)

DEFAULT_MAX_NODE_UTIL = 3.0  # CompileIoT.hs:118
DEFAULT_MAX_BANDWIDTH = 200.0  # bytes/s, CompileIoT.hs:119

PartitionMap = list[list[int]]


# -- allPartitions (Partition.hs:26-31) --------------------------------------


def _singleton(op: str) -> bool:
    """``singleton`` (Partition.hs:125): Sources and Sinks may not share
    a partition with another Source/Sink."""
    return op in ("source", "sink")


def _extend_partitioning(
    n: tuple[int, str], choice: list[list[tuple[int, str]]]
) -> list[list[list[tuple[int, str]]]]:
    """``extendPartitioning`` (Partition.hs:115-123): the new operator
    always MAY start a new partition; it may additionally append to the
    last one unless that would co-locate two Source/Sink vertices or
    follow a Merge/Source (traversal is sink-first, so 'the vertex after
    a Merge' is the Merge's upstream — keeping Merge flow-first in its
    partition)."""
    last_part = choice[-1]
    last_node = last_part[-1]
    n_singletons = sum(1 for v in [n, *last_part] if _singleton(v[1]))
    if n_singletons > 1 or last_node[1] in ("merge", "source"):
        return [choice + [[n]]]
    return [choice + [[n]], choice[:-1] + [last_part + [n]]]


def _children(edges: list[tuple[int, int]], n: int) -> list[int]:
    """``childrenOf`` (Partition.hs:108-110) — edge order follows the
    reference's sorted ``edgeList``."""
    return sorted(c for p, c in edges if p == n)


def _roots(vertices: list[int], edges: list[tuple[int, int]]) -> list[int]:
    dests = {c for _, c in edges}
    return sorted(v for v in vertices if v not in dests)


def _reachable(n: int, edges: list[tuple[int, int]]) -> set[int]:
    seen = {n}
    frontier = [n]
    while frontier:
        x = frontier.pop()
        for p, c in edges:
            if p == x and c not in seen:
                seen.add(c)
                frontier.append(c)
    return seen


def _foldgl(f, z, vertices: list[int], edges: list[tuple[int, int]]):
    """``foldgl`` (Partition.hs:48-54): left fold following edges from
    the root, recursing into each child's reachable subgraph."""
    if not vertices:
        return z
    root = _roots(vertices, edges)[0]
    b = f(z, root)
    for child in _children(edges, root):
        keep = _reachable(child, edges)
        sub_vs = sorted(v for v in vertices if v in keep)
        sub_es = [(p, c) for p, c in edges if p in keep and c in keep]
        b = _foldgl(f, b, sub_vs, sub_es)
    return b


def all_partitions(g: BGraph) -> list[PartitionMap]:
    """All valid partitionings of ``g`` (``allPartitions``,
    Partition.hs:26-31), in the reference's enumeration order. Each
    partitioning lists partitions sink-first, and vertices within a
    partition downstream-first (so a Merge, which must be flow-FIRST in
    its partition, appears last in its stored list)."""
    ops = {v.vid: v.op for v in g.vertices}
    # transpose: traversal starts at the sink and walks toward sources
    t_edges = sorted((c, p) for p, c in g.edges)
    vertices = sorted(ops)

    def fun(choices, vid):
        n = (vid, ops[vid])
        if not choices:
            return [[[n]]]
        out = []
        for choice in choices:
            out.extend(_extend_partitioning(n, choice))
        return out

    result = _foldgl(fun, [], vertices, t_edges)
    return [[[vid for vid, _ in part] for part in pm] for pm in result]


# -- planCost (Orchestration.hs:120-127) -------------------------------------


def arrival_rate(g: BGraph, vid: int) -> float:
    """Events/s entering ``vid``: a source's declared rate; the
    pair-gated min for a positional zip join; the parents' summed
    departures otherwise (merge-sum falls out)."""
    v = g.vertex(vid)
    ps = g.parents_of(vid)
    if v.op == "source":
        return v.rate
    if not ps:
        return 0.0
    if v.op == "join":
        return min(depart_rate(g, p) for p in ps)
    return sum(depart_rate(g, p) for p in ps)


def utilisations(g: BGraph, service_rates: dict[int, float]) -> dict[int, float]:
    """ρ = λ/μ per vertex (``calcAllSg`` figures, Jackson.hs:215-224);
    μ = inf (or absent) → a free operator, ρ = 0."""
    out = {}
    for v in g.vertices:
        mu = service_rates.get(v.vid, float("inf"))
        out[v.vid] = 0.0 if mu == float("inf") else arrival_rate(g, v.vid) / mu
    return out


def is_over_utilised(utils: dict[int, float]) -> bool:
    """ρ > 1 anywhere → the program can never keep up, under ANY
    partitioning (Jackson.hs:346-347)."""
    return any(u > 1 for u in utils.values())


def total_node_utilisations(
    utils: dict[int, float], pm: PartitionMap
) -> list[float]:
    """Summed ρ per partition (``totalNodeUtilisations``,
    Orchestration.hs:166-169)."""
    return [sum(utils[vid] for vid in part) for part in pm]


def plan_cost(
    g: BGraph,
    pm: PartitionMap,
    service_rates: dict[int, float],
    max_node_util: float = DEFAULT_MAX_NODE_UTIL,
    max_bandwidth: float = DEFAULT_MAX_BANDWIDTH,
) -> int | None:
    """``planCost`` (Orchestration.hs:120-127): None = non-viable, else
    the partition count (lower is better)."""
    utils = utilisations(g, service_rates)
    if is_over_utilised(utils):
        return None
    if any(u > max_node_util for u in total_node_utilisations(utils, pm)):
        return None
    if over_bandwidth_limit(g, pm, max_bandwidth):
        return None
    return len(pm)


@dataclass(frozen=True)
class CostedPlan:
    """``CostedPlan`` (Orchestration.hs:79-82), graph included so a
    rewrite-variant winner is self-describing."""

    graph: BGraph
    partition_map: tuple[tuple[int, ...], ...]
    cost: int


def viable_plans(
    g: BGraph,
    service_rates: dict[int, float],
    max_node_util: float = DEFAULT_MAX_NODE_UTIL,
    max_bandwidth: float = DEFAULT_MAX_BANDWIDTH,
) -> list[CostedPlan]:
    """``makePlans`` + cost + viability filter — the per-graph half of
    ``viableRewrites`` (Orchestration.hs:94-114). Returned cheapest
    first (stable within equal cost, preserving enumeration order)."""
    plans = []
    for pm in all_partitions(g):
        c = plan_cost(g, pm, service_rates, max_node_util, max_bandwidth)
        if c is not None:
            plans.append(
                CostedPlan(g, tuple(tuple(p) for p in pm), c)
            )
    return sorted(plans, key=lambda p: p.cost)


def choose_plan(
    candidates: list[tuple[BGraph, dict[int, float]]],
    max_node_util: float = DEFAULT_MAX_NODE_UTIL,
    max_bandwidth: float = DEFAULT_MAX_BANDWIDTH,
) -> CostedPlan:
    """``chopAndChange`` (Orchestration.hs:74-77): over a candidate set
    of (graph, service-rate) variants — the rewrite-rule derivatives in
    the reference; any graph family here — return the cheapest viable
    plan. Raises if none is viable, like the reference's ``error``."""
    best: CostedPlan | None = None
    for g, rates in candidates:
        for p in viable_plans(g, rates, max_node_util, max_bandwidth):
            if best is None or p.cost < best.cost:
                best = p
            break  # viable_plans is sorted; first is its cheapest
    if best is None:
        raise ValueError("choose_plan: no viable programs")
    return best
