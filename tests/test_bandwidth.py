"""Bandwidth-model parity: every number the reference's own test suite
asserts (``src/Striot/Bandwidth.hs``) is reproduced on the port."""

from __future__ import annotations

import pytest

from striot_spark.cost.bandwidth import (
    BGraph,
    BVertex,
    connected_to_sources,
    depart_rate,
    over_bandwidth_limit,
    what_bandwidth_weighted,
)

# The reference's test graphs (Bandwidth.hs:80-95,124-129,146-151):
# v1=Source 2, v2=Map, v3=Source 1, v4=Map, v5=Merge, v6=Sink,
# v7=Filter 0.5, v8=Join, v9=Window chopTime 120ms.
V = {
    1: BVertex(1, "source", "Int", rate=2.0),
    2: BVertex(2, "map", "Int"),
    3: BVertex(3, "source", "Int", rate=1.0),
    4: BVertex(4, "map", "Int"),
    5: BVertex(5, "merge", "Int"),
    6: BVertex(6, "sink", "IO ()"),
    7: BVertex(7, "filter", "Int", selectivity=0.5),
    8: BVertex(8, "join", "(Int, Int)"),
    9: BVertex(9, "window", "[a]", chop_ms=120),
}


def _graph(vids, edges):
    return BGraph(tuple(V[i] for i in vids), tuple(edges))


# graph = overlay (path [v3,v4,v5]) (path [v1,v2,v5,v6])
GRAPH = _graph(
    [1, 2, 3, 4, 5, 6], [(3, 4), (4, 5), (1, 2), (2, 5), (5, 6)]
)
# graph2 = overlay (path [v3,v4,v8]) (path [v1,v2,v8,v7,v6])
GRAPH2 = _graph(
    [1, 2, 3, 4, 6, 7, 8],
    [(3, 4), (4, 8), (1, 2), (2, 8), (8, 7), (7, 6)],
)
# graph3 = path [v1,v2,v9,v7,v6]
GRAPH3 = _graph([1, 2, 6, 7, 9], [(1, 2), (2, 9), (9, 7), (7, 6)])


def test_depart_rate_merge():  # test_departRate_merge
    assert depart_rate(GRAPH, 6) == 3.0


def test_depart_rate_join():  # test_departRate_join
    assert depart_rate(GRAPH2, 8) == 1.0


def test_depart_rate_filter():  # test_departRate_filter
    assert depart_rate(GRAPH2, 7) == 0.5


def test_depart_rate_window():  # test_departRate_window
    assert depart_rate(GRAPH3, 9) == pytest.approx(1 / 0.12)


def test_chop_window_bandwidth_uses_window_payload():
    # chopTime egress: (rate x chop payload) + weighting; the payload is
    # events-per-window x parent size, so egress bytes/s equals parent
    # bytes/s — the window trades event count for event size
    # (Bandwidth.hs:131-141 "no accounting for list overhead").
    per_event = GRAPH3.sizes["Int"]
    got = what_bandwidth_weighted(GRAPH3, 9)
    want = (1 / 0.12) * (0.12 * 2.0 * per_event) + (1 / 0.12) * 60.0
    assert got == pytest.approx(want)


def test_connected_to_sources_vectors():  # test_connectedToSources 1-4
    pm = [[1, 2], [3, 4], [5, 6, 7]]
    assert connected_to_sources([1, 3], pm) == [1, 2, 3, 4]
    assert connected_to_sources([1], pm) == [1, 2]
    assert connected_to_sources([7], pm) == [5, 6, 7]
    assert connected_to_sources([0], pm) == []


def test_over_bandwidth_limit():  # test_overBandwidthLimit
    assert over_bandwidth_limit(GRAPH, [[1, 2], [3, 4], [5, 6]], 29.0)
    # and the complement: a huge limit is never breached
    assert not over_bandwidth_limit(GRAPH, [[1, 2], [3, 4], [5, 6]], 1e9)


def test_filter_halves_weighted_egress_for_same_type():
    # 0.5 filter on an Int stream: egress = 0.5 x parent rate x
    # (size + 60B weighting)
    per_event = GRAPH2.sizes["Int"]
    f = what_bandwidth_weighted(GRAPH2, 7)
    assert f == pytest.approx(0.5 * (per_event + 60.0))


def test_unknown_event_size_is_skipped_not_crashed():
    # the reference's mapMaybe drops vertices with unknown out types
    assert what_bandwidth_weighted(GRAPH2, 8) is None  # "(Int, Int)"
    # the only boundary edge (8 -> 7) has unknown egress -> no breach
    # even at limit 0
    assert not over_bandwidth_limit(GRAPH2, [[1, 2, 3, 4, 8], [7, 6]], 0.0)
