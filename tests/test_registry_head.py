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


def test_head_50_composition_round12():
    """The r12 head the driver sweeps (VERDICT r11 task 1): canary, the
    round-11 additions q249-q267 (never driver-swept), the 18-name tail
    of the q01-q64 block, q215 (converted from rows-only to
    oracle-backed this round — the ledger's one non-green row), then
    the 11 oldest r07-rowed streaming-cohort entries. Update alongside
    the registry's rotation comment when the head is rebuilt."""
    names = list(all_queries())[:50]
    assert names[0] == "q224_type_canary"
    # the never-swept round-11 additions fill slots 1-19
    assert {n.split("_")[0] for n in names[1:20]} == {
        f"q{i}" for i in range(249, 268)
    }
    # the 18-slot q01-q64 tail
    tail_prefixes = [n.split("_")[0] for n in names[20:38]]
    assert sorted(tail_prefixes) == sorted(
        ["q05", "q06", "q07", "q08", "q09", "q10", "q11", "q12",
         "q15", "q16", "q47", "q49", "q50", "q30", "q17", "q18",
         "q19", "q20"]
    )
    # the converted q215 + the 11 oldest r07-rowed streaming entries
    assert names[38] == "q215_compression_quality"
    assert len(names[39:50]) == 11
    assert [n.split("_")[0] for n in names[39:50]] == [
        "q100d", "q102", "q103", "q104", "q105", "q106", "q107",
        "q108", "q109", "q110", "q111",
    ]
    # every head entry is oracle-gated (q215's conversion closed the
    # last rows-only hole)
    oracles = all_oracles()
    assert all(n in oracles for n in names)
    assert names[49] == "q111_sliding_time_stream"
    assert all(n in REGISTRY for n in names)
