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


def test_head_50_composition_round15():
    """The r15 head the driver sweeps (VERDICT r14 task 1, ratified by
    tools/ledger.py --check): canary, the 47 r09-rowed entries
    (q225-q235, q188-q214 minus the r13-swept q215, q216-q223) in
    registered order, then the three oldest r10 rows q13/q93/q100.
    Update alongside the registry's rotation comment when the head is
    rebuilt."""
    names = list(all_queries())[:50]
    assert names[0] == "q224_type_canary"
    # the 47 r09-rowed entries fill slots 2-48: the 46 q188-q235-range
    # entries in registered order, then q13 (the 47th r09 row)
    expected = (
        [f"q{i}" for i in range(225, 236)]
        + [f"q{i}" for i in range(188, 215)]
        + [f"q{i}" for i in range(216, 224)]
        + ["q13"]
    )
    assert [n.split("_")[0] for n in names[1:48]] == expected
    # slots 49-50: the two oldest r10 rows
    assert [n.split("_")[0] for n in names[48:]] == ["q93", "q100"]
    # every head entry is oracle-gated (zero rows-only since r12)
    oracles = all_oracles()
    assert all(n in oracles for n in names)
    assert all(n in REGISTRY for n in names)


def test_head_matches_ledger_tool_proposal():
    """VERDICT r14 task 7: assert tool-equality mechanically, not just
    composition rules. The registry head must equal what
    `tools/ledger.py` proposes from the committed CORRECTNESS ledger —
    this is exactly the check that would have caught the r12/r13
    stale-prose incidents. The assertion holds from round open (head
    rebuilt to the proposal) until the round's own CORRECTNESS file
    lands; once it lands, the swept head IS the latest cohort and the
    proposal rotates, so skip that window rather than fail it."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import ledger as ledger_mod

    led = ledger_mod.load_ledger(repo)
    names = list(all_queries())
    head = _SWEEP_FIRST[: ledger_mod.HEAD]
    mx = max((rn for rn, _ in led.values()), default=0)
    if all(led.get(n, (None, False))[0] == mx for n in head):
        # the current head was already swept in the newest ledger round:
        # the proposal has rotated past it (documented round-close state)
        return
    assert head == ledger_mod.propose_head(names, led)
