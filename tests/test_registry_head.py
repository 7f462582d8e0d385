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


def test_head_50_composition_round14():
    """The r14 head the driver sweeps (VERDICT r13 task 1, ratified by
    tools/ledger.py --check): canary, the 48 r08-rowed entries
    q139-q186 (the ledger's oldest rows) in registered order, and
    q187_leakage_aware_split (the tool's pick for slot 50 — the first
    r09-rowed entry in registry order). Update alongside the registry's
    rotation comment when the head is rebuilt."""
    names = list(all_queries())[:50]
    assert names[0] == "q224_type_canary"
    # the 48 r08-rowed entries fill slots 2-49, registered order
    assert [n.split("_")[0] for n in names[1:49]] == [
        f"q{i}" for i in range(139, 187)
    ]
    # slot 50: the first r09-rowed entry in registry order
    assert names[49] == "q187_leakage_aware_split"
    # every head entry is oracle-gated (zero rows-only since r12)
    oracles = all_oracles()
    assert all(n in oracles for n in names)
    assert all(n in REGISTRY for n in names)
