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


def test_head_50_composition_round8():
    """The r8 head the driver sweeps: canary first, then exactly the
    never-swept q138-q186 cohort. Update alongside the registry's
    rotation comment when the head is rebuilt for a new round."""
    names = list(all_queries())[:50]
    assert names[0] == "q224_type_canary"
    assert names[1] == "q138_incremental_agg_stream"
    assert names[49] == "q186_dup_cluster_census"
    assert all(n in REGISTRY for n in names)
