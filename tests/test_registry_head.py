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


def test_head_50_composition_round13():
    """The r13 head the driver sweeps (VERDICT r12 task 1): canary, the
    round-12 additions q268-q291 (never driver-swept), the 24 remaining
    r07-rowed entries (the ledger's oldest rows), and the single oldest
    r08-rowed entry. Update alongside the registry's rotation comment
    when the head is rebuilt."""
    names = list(all_queries())[:50]
    assert names[0] == "q224_type_canary"
    # the never-swept round-12 additions fill slots 1-24
    assert {n.split("_")[0] for n in names[1:25]} == {
        f"q{i}" for i in range(268, 292)
    }
    # the 24 remaining r07-rowed entries, registered order
    assert [n.split("_")[0] for n in names[25:49]] == [
        "q118", "q119", "q124", "q112", "q113", "q114", "q128",
        "q129", "q131", "q136", "q134", "q135", "q115", "q116",
        "q117", "q120", "q121", "q122", "q123", "q125", "q130",
        "q126", "q133", "q137",
    ]
    # the oldest r08-rowed entry fills slot 50
    assert names[49] == "q138_incremental_agg_stream"
    # every head entry is oracle-gated (zero rows-only since r12)
    oracles = all_oracles()
    assert all(n in oracles for n in names)
    assert all(n in REGISTRY for n in names)
