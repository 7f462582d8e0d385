"""Plan-enumeration + cost-selection parity tests.

Reproduces the reference's own asserted vectors:
- ``test_g'`` / ``test_g2`` / ``test_g3`` — exact partitioning lists,
  including enumeration order (``src/Striot/Partition.hs:128-148``);
- ``prop_allPartitions_maxlength`` (``Partition.hs:36-40``) as a
  hypothesis property, plus the structural validity invariants;
- the over-utilised-partition suite (``src/Striot/
  Orchestration.hs:151-207``): non-viable graphs yield no plans, an
  over-utilised partition costs None, partUtilGraph needs >=3
  partitions and admits [[1,2,3],[4,5,6],[7,8,9]].
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from striot_spark.cost.bandwidth import BGraph, BVertex
from striot_spark.cost.partition import (
    all_partitions,
    choose_plan,
    plan_cost,
    utilisations,
    viable_plans,
)


def _g(vertices, edges):
    return BGraph(vertices=tuple(vertices), edges=tuple(edges))


# the reference's shared test vertices (Partition.hs:82-87)
V0 = BVertex(0, "source", rate=1.0)
V1 = BVertex(1, "map")
V2 = BVertex(2, "sink")
V3 = BVertex(3, "source", rate=1.0)
V4 = BVertex(4, "merge")
V5 = BVertex(5, "map")


def test_gprime_vector():
    # path [v0, v1, v2] (Partition.hs:127-131)
    g = _g([V0, V1, V2], [(0, 1), (1, 2)])
    assert all_partitions(g) == [
        [[2], [1], [0]],
        [[2], [1, 0]],
        [[2, 1], [0]],
    ]


def test_g2_vector():
    # overlay (path [v0, v4, v2]) (path [v3, v4]) (Partition.hs:133-137)
    g = _g([V0, V2, V3, V4], [(0, 4), (4, 2), (3, 4)])
    assert all_partitions(g) == [
        [[2], [4], [0], [3]],
        [[2, 4], [0], [3]],
    ]


def test_g3_vector():
    # overlay (path [v0,v1,v4,v2]) (path [v3,v5,v4]) (Partition.hs:139-148)
    g = _g(
        [V0, V1, V2, V3, V4, V5],
        [(0, 1), (1, 4), (4, 2), (3, 5), (5, 4)],
    )
    assert all_partitions(g) == [
        [[2], [4], [1], [0], [5], [3]],
        [[2], [4], [1], [0], [5, 3]],
        [[2], [4], [1, 0], [5], [3]],
        [[2], [4], [1, 0], [5, 3]],
        [[2, 4], [1], [0], [5], [3]],
        [[2, 4], [1], [0], [5, 3]],
        [[2, 4], [1, 0], [5], [3]],
        [[2, 4], [1, 0], [5, 3]],
    ]


@st.composite
def _path_graphs(draw):
    """Random linear source → (map|filter)* → sink pipelines, the shape
    ``simpleStream`` builds (plus the reference's random-graph property
    runs over arbitrary graphs; linear covers the fold's append logic)."""
    n_mid = draw(st.integers(min_value=0, max_value=6))
    ops = ["source"] + [
        draw(st.sampled_from(["map", "filter", "expand", "scan"]))
        for _ in range(n_mid)
    ] + ["sink"]
    vs = [
        BVertex(i, op, rate=1.0 if op == "source" else 0.0)
        for i, op in enumerate(ops)
    ]
    es = [(i, i + 1) for i in range(len(ops) - 1)]
    return _g(vs, es)


@given(_path_graphs())
@settings(max_examples=60, deadline=None)
def test_prop_allpartitions_maxlength_and_validity(g):
    """prop_allPartitions_maxlength (Partition.hs:36-40) + the validity
    constraints ``extendPartitioning`` encodes (Partition.hs:21-24)."""
    ops = {v.vid: v.op for v in g.vertices}
    pms = all_partitions(g)
    assert pms, "a non-empty graph always has the all-singletons plan"
    n = len(g.vertices)
    assert max(len(pm) for pm in pms) <= n
    seen = set()
    for pm in pms:
        key = tuple(tuple(p) for p in pm)
        assert key not in seen, "no duplicate partitionings"
        seen.add(key)
        flat = [vid for part in pm for vid in part]
        assert sorted(flat) == sorted(ops), "exact cover of all vertices"
        for part in pm:
            srcsinks = [v for v in part if ops[v] in ("source", "sink")]
            assert len(srcsinks) <= 1, "≤1 Source/Sink per partition"
            # merge must be flow-first == stored-last (sink-first build)
            for v in part[:-1]:
                assert ops[v] != "merge"


# -- planCost / viability (Orchestration.hs:120-127,151-207) -----------------


def _part_util_graph():
    """partUtilGraph (Orchestration.hs:178-190): 9 ops, ids 1..9 as
    simpleStream numbers them, every service time 1 → μ=1, source rate
    1, all selectivities 1 → every operator's ρ is exactly 1."""
    ops = [
        "source", "map", "filter", "map", "filter", "map", "filter",
        "map", "sink",
    ]
    vs = [
        BVertex(i + 1, op, rate=1.0 if op == "source" else 0.0)
        for i, op in enumerate(ops)
    ]
    es = [(i + 1, i + 2) for i in range(8)]
    rates = {i + 1: 1.0 for i in range(9)}
    return _g(vs, es), rates


def test_over_utilised_partition_rejected():
    # planCost (Plan partUtilGraph [[1,2],[3,4,5,6,7,8,9]]) == Nothing
    # (Orchestration.hs:201-202): partition 2 sums ρ=7 > maxNodeUtil 3
    g, rates = _part_util_graph()
    assert plan_cost(g, [[1, 2], [3, 4, 5, 6, 7, 8, 9]], rates) is None


def test_over_utilised_partition_min_three_partitions():
    # Orchestration.hs:198-199: every viable plan has >= 3 partitions
    g, rates = _part_util_graph()
    plans = viable_plans(g, rates)
    assert plans
    assert all(len(p.partition_map) >= 3 for p in plans)


def test_over_utilised_partition_acceptable():
    # Orchestration.hs:205-207: [[1,2,3],[4,5,6],[7,8,9]] is viable
    g, rates = _part_util_graph()
    normalized = [
        sorted(sorted(part) for part in p.partition_map)
        for p in viable_plans(g, rates)
    ]
    assert [[1, 2, 3], [4, 5, 6], [7, 8, 9]] in normalized


def test_over_utilised_graph_has_no_viable_plans():
    # 'graph' (Orchestration.hs:141-151): 2 sources rate 1 merge into a
    # filter with μ=1 → ρ=2 → never viable, under any partitioning
    g = _g(
        [
            BVertex(0, "source", rate=1.0),
            BVertex(1, "source", rate=1.0),
            BVertex(2, "merge"),
            BVertex(3, "filter", selectivity=0.5),
            BVertex(4, "sink"),
        ],
        [(0, 2), (1, 2), (2, 3), (3, 4)],
    )
    rates = {3: 1.0}  # only the filter has service time 1
    assert utilisations(g, rates)[3] == 2.0
    assert viable_plans(g, rates) == []


def test_too_much_has_no_viable_plans():
    # tooMuch (Orchestration.hs:153-159): source rate 2 → map μ=1
    g = _g(
        [
            BVertex(1, "source", rate=2.0),
            BVertex(2, "map"),
            BVertex(3, "sink"),
        ],
        [(1, 2), (2, 3)],
    )
    assert viable_plans(g, {2: 1.0}) == []


def test_choose_plan_picks_fewest_partitions():
    # chopAndChange (Orchestration.hs:74-77): lowest cost wins; cost =
    # partition count, so a 3-op pipeline under no utilisation pressure
    # collapses to the 2-partition plan (source | rest)
    g = _g(
        [
            BVertex(0, "source", rate=1.0),
            BVertex(1, "map"),
            BVertex(2, "sink"),
        ],
        [(0, 1), (1, 2)],
    )
    best = choose_plan([(g, {})])
    assert best.cost == 2
    with pytest.raises(ValueError, match="no viable"):
        choose_plan(
            [(
                _g(
                    [
                        BVertex(1, "source", rate=2.0),
                        BVertex(2, "map"),
                        BVertex(3, "sink"),
                    ],
                    [(1, 2), (2, 3)],
                ),
                {2: 1.0},
            )]
        )
