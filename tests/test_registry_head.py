"""Sweep-head hygiene gates: the driver grades only the first 50
registry entries per round (see tools/driver_sim.py), so mistakes in
_SWEEP_FIRST — duplicates, unregistered names, a displaced canary —
silently waste sweep slots for a whole round. Pin the invariants."""

from __future__ import annotations

from striot_spark.queries.registry import (
    _SWEEP_FIRST,
    _SWEEP_LAST,
    REGISTRY,
    _load,
    all_oracles,
    all_queries,
)

_load()


def test_sweep_lists_have_no_duplicates_or_unknown_names():
    assert len(_SWEEP_FIRST) == len(set(_SWEEP_FIRST))
    assert len(_SWEEP_LAST) == len(set(_SWEEP_LAST))
    unknown = [n for n in _SWEEP_FIRST + _SWEEP_LAST if n not in REGISTRY]
    assert unknown == []  # a typo here burns a sweep slot silently
    assert not set(_SWEEP_FIRST) & set(_SWEEP_LAST)


def test_type_canary_leads_every_sweep():
    names = list(all_queries())
    assert names[0] == "q224_type_canary"


def test_ordering_is_a_permutation_of_the_registry():
    names = list(all_queries())
    assert len(names) == len(set(names)) == len(REGISTRY)
    assert set(names) == set(REGISTRY)
    oracles = all_oracles()
    assert set(oracles) <= set(names)


def test_head_50_composition_round9():
    """The r9 head the driver sweeps (VERDICT r8 task 1): canary, then
    the rest of the never-swept backlog — q187, the round-8 additions
    q225-q235, q188-q223 — then q13 (oldest stale row) filling slot 50.
    Update alongside the registry's rotation comment when the head is
    rebuilt for a new round."""
    names = list(all_queries())[:50]
    assert names[0] == "q224_type_canary"
    assert names[1] == "q187_leakage_aware_split"
    assert names[2] == "q225_stream_near_dup_filter"
    assert names[13] == "q188_cap_per_cluster"
    assert names[48] == "q223_weekly_top_event"
    assert names[49] == "q13_percentiles"
    # every never-swept query (no driver row through r8) is inside the head
    never_swept = (
        ["q187_leakage_aware_split"]
        + [f"q{i}" for i in range(188, 224)]
        + [f"q{i}" for i in range(225, 236)]
    )
    head_prefixes = {n.split("_")[0] for n in names}
    missing = [q for q in never_swept if q.split("_")[0] not in head_prefixes]
    assert missing == []
    assert all(n in REGISTRY for n in names)
