"""tools/ledger.py propose_head priority invariants: canary leads, a
red outranks never-swept, never-swept outranks stale-green, greens
order oldest-row-first, registry order breaks ties. A bug here
proposes a wrong head — the one mistake that loses a round."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "ledger_tool",
    os.path.join(os.path.dirname(__file__), "..", "tools", "ledger.py"),
)
ledger_tool = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ledger_tool)


def test_propose_head_priority_order():
    names = [ledger_tool.CANARY, "qa", "qb", "qc", "qd", "qe"]
    ledger = {
        ledger_tool.CANARY: (12, True),
        "qa": (10, True),   # stale green
        "qb": (12, False),  # red at latest sweep
        # qc never swept
        "qd": (7, True),    # oldest green
        "qe": (12, True),   # freshest green
    }
    head = ledger_tool.propose_head(names, ledger)
    assert head[0] == ledger_tool.CANARY
    assert head[1] == "qb"  # red first
    assert head[2] == "qc"  # then never-swept
    assert head[3:] == ["qd", "qa", "qe"]  # greens oldest-row-first


def test_propose_head_ties_break_by_registry_order():
    names = [ledger_tool.CANARY, "q2", "q1", "q3"]
    ledger = {ledger_tool.CANARY: (12, True)}  # q1..q3 all never-swept
    head = ledger_tool.propose_head(names, ledger)
    assert head == [ledger_tool.CANARY, "q2", "q1", "q3"]


def test_propose_head_caps_at_50():
    names = [ledger_tool.CANARY] + [f"q{i:03d}" for i in range(100)]
    head = ledger_tool.propose_head(names, {})
    assert len(head) == ledger_tool.HEAD
    assert head[0] == ledger_tool.CANARY


def test_red_beats_even_the_stalest_green():
    names = [ledger_tool.CANARY, "qx", "qy"]
    ledger = {
        ledger_tool.CANARY: (12, True),
        "qx": (12, False),  # fresh but red
        "qy": (5, True),    # very stale but green
    }
    head = ledger_tool.propose_head(names, ledger)
    assert head[1] == "qx"


def test_load_ledger_orders_rounds_numerically(tmp_path):
    """r100's file must replay AFTER r99's (ADVICE r13: lexicographic
    glob order inverts latest-row-wins once round numbers hit three
    digits)."""
    import json

    row = {"rows_match": True, "schema_match": True, "hash_match": True}
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps({"qz": dict(row, hash_match=False)})
    )
    (tmp_path / "CORRECTNESS_r100.json").write_text(json.dumps({"qz": row}))
    ledger = ledger_tool.load_ledger(str(tmp_path))
    # lexicographically r100 < r99, so a lexicographic replay would
    # leave the r99 red as the latest row; numeric order keeps r100
    assert ledger["qz"] == (100, True)
