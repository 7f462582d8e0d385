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


def test_head_50_composition_round10():
    """The r10 head the driver sweeps (VERDICT r9 task 1): canary, the
    five r07 ex-reds, the round-9 additions q236-q242, the r03/r04
    rotation six, then the oldest r05/r07 cohort (q65-q99 block) to
    exactly 50. Update alongside the registry's rotation comment when
    the head is rebuilt for a new round."""
    names = list(all_queries())[:50]
    assert names[0] == "q224_type_canary"
    # the five stale-red ledger rows, formally cleared this round
    ex_reds = [
        "q93_joinw_stream_non_nesting",
        "q100_chop_count_stream",
        "q101_sliding_stream_ooo_replay",
        "q127_market_share",
        "q132_bucketed_colocated_join",
    ]
    assert names[1:6] == ex_reds
    # the never-swept round-9 additions
    assert names[6:13] == [f"q{i}" for i in range(236, 243)] or [
        n.split("_")[0] for n in names[6:13]
    ] == [f"q{i}" for i in range(236, 243)]
    # rotation six (oldest r03/r04 rows)
    rotation_prefixes = {"q14", "q35", "q80", "q82", "q83", "q85"}
    assert {n.split("_")[0] for n in names[13:19]} == rotation_prefixes
    assert names[49] == "q99_corpus_pipeline"
    assert all(n in REGISTRY for n in names)
