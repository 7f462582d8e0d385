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


def test_head_50_composition_round11():
    """The r11 head the driver sweeps (VERDICT r10 task 1): canary, the
    round-10 additions q243-q248 (never driver-swept), then 43 of the
    stalest q01-q64 block in registered order (skipping q13/q14/q35,
    refreshed r9/r10). Update alongside the registry's rotation comment
    when the head is rebuilt for a new round."""
    names = list(all_queries())[:50]
    assert names[0] == "q224_type_canary"
    # the never-swept round-10 additions fill slots 1-6
    assert {n.split("_")[0] for n in names[1:7]} == {
        f"q{i}" for i in range(243, 249)
    }
    # the 43-slot stale block is drawn only from q01-q64, never from
    # the q13/q14/q35 refreshed rows
    stale_prefixes = {n.split("_")[0] for n in names[7:50]}
    assert len(names[7:50]) == 43
    assert all(
        1 <= int(p[1:]) <= 64 and p not in {"q13", "q14", "q35"}
        for p in stale_prefixes
    )
    assert names[49] == "q04_chop_count_window"
    assert all(n in REGISTRY for n in names)
