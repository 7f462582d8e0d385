"""Correctness-ledger rotation planner.

The grading driver sweeps only the FIRST 50 registry entries per round
(`striot_spark/queries/registry.py:_SWEEP_FIRST`), so each round the
head must be rebuilt to put the queries that most need a driver row on
top. The authoritative input is the cumulative ledger — the LATEST row
per query across every committed `CORRECTNESS_r*.json` — not the
rotation comments (VERDICT r12's plan text named nine queries from a
stale comment; the computed ledger showed they had r10 rows).

Usage:
    python tools/ledger.py            # ledger summary + proposed head
    python tools/ledger.py --check    # exit 1 if the current
                                      # _SWEEP_FIRST head differs from
                                      # the proposal (stale-head guard)
    python tools/ledger.py --plan-next
                                      # assume the current head sweeps
                                      # green this round and print the
                                      # FOLLOWING round's proposal (for
                                      # the round-close plan section)

Priority for head slots (established across rounds 8-13):
    canary first, then reds (non-green at latest sweep), then
    never-swept, then oldest-row-first; ties broken by registry order.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANARY = "q224_type_canary"
HEAD = 50


def load_ledger(repo: str) -> dict[str, tuple[int, bool]]:
    """name -> (latest round with a driver row, green at that row)."""
    ledger: dict[str, tuple[int, bool]] = {}

    def round_no(f: str) -> int:
        return int(re.search(r"r(\d+)", os.path.basename(f)).group(1))

    # Sort numerically, not lexicographically: zero-padded names keep
    # the two orders identical through r99, but at r100 lexicographic
    # order would replay older files after newer ones and latest-row-
    # wins would invert (ADVICE r13).
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")), key=round_no):
        rn = round_no(f)
        try:
            rows = json.load(open(f))
        except (json.JSONDecodeError, OSError):
            continue
        for name, v in rows.items():
            if not isinstance(v, dict):
                continue
            green = bool(
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
                and not v.get("err")
            )
            ledger[name] = (rn, green)
    return ledger


def registry_names() -> list[str]:
    import __spark_entry__ as entry

    return list(entry.queries().keys())


def propose_head(
    names: list[str], ledger: dict[str, tuple[int, bool]]
) -> list[str]:
    order = {n: i for i, n in enumerate(names)}

    def key(n: str):
        rn, green = ledger.get(n, (None, True))
        if rn is None:
            return (1, 0, order[n])  # never swept
        if not green:
            return (0, 0, order[n])  # red: outranks everything
        return (2, rn, order[n])  # green: oldest first

    rest = sorted((n for n in names if n != CANARY), key=key)
    return [CANARY] + rest[: HEAD - 1]


def write_state(repo: str, names: list[str], ledger: dict) -> str:
    """Render LEDGER-STATE.md — the one-page cumulative-ledger summary
    (VERDICT r15 task 7) — purely from the committed CORRECTNESS_r*.json
    files plus the registry name list. No prose inputs: rerunning
    `python tools/ledger.py --state` after any sweep regenerates it, so
    rounds/judges stop re-deriving the rotation state from 15 ROUND*.md
    files."""
    never = [n for n in names if n not in ledger]
    reds = [n for n in names if n in ledger and not ledger[n][1]]
    mx = max((rn for rn, _ in ledger.values()), default=0)
    by_round: dict[int, list[str]] = {}
    for n in names:
        if n in ledger:
            by_round.setdefault(ledger[n][0], []).append(n)

    lines = [
        "# LEDGER-STATE",
        "",
        "GENERATED — do not edit. Regenerate with "
        "`python tools/ledger.py --state` after any sweep lands.",
        "Source of truth: the committed `CORRECTNESS_r*.json` files "
        "(latest row per query wins) plus the registry name list.",
        "",
        f"- registry entries: **{len(names)}**",
        f"- swept at least once: **{len(names) - len(never)}**"
        f"  (never-swept: {len(never)})",
        f"- red at latest sweep: **{len(reds)}**",
        f"- newest ledger round: **r{mx:02d}**"
        f"  · oldest evidence: **r{min(by_round):02d}**"
        if by_round
        else "- ledger empty",
        "",
        "## Latest driver row per query, grouped by round",
        "",
        "| round | queries | names |",
        "|---|---|---|",
    ]
    for rn in sorted(by_round):
        qs = by_round[rn]
        lines.append(f"| r{rn:02d} | {len(qs)} | {', '.join(qs)} |")
    if reds:
        lines += ["", "## RED at latest sweep (head priority 1)", ""]
        lines += [f"- {n} (r{ledger[n][0]:02d})" for n in reds]
    if never:
        lines += ["", "## Never swept (head priority 2)", ""]
        lines += [f"- {n}" for n in never]
    lines += [
        "",
        "## Next head",
        "",
        "The head the driver sweeps next round is canary + the 49 "
        "oldest rows above (reds, then never-swept, then "
        "oldest-green-first; registry order inside each tier). "
        "Run `python tools/ledger.py --check` for the exact list.",
        "",
    ]
    out = os.path.join(repo, "LEDGER-STATE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--plan-next", action="store_true")
    ap.add_argument(
        "--state",
        action="store_true",
        help="write LEDGER-STATE.md from the committed CORRECTNESS files",
    )
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    ledger = load_ledger(repo)
    names = registry_names()

    if args.state:
        print(f"wrote {write_state(repo, names, ledger)}")
        return 0

    if args.plan_next:
        # Project the ledger forward: every entry in the CURRENT head
        # gets a green row for the upcoming round, then propose the
        # head after that. Written at round close so the next-round
        # plan is tool-computed, not prose (prose plans went stale in
        # r12 and r13).
        from striot_spark.queries.registry import _SWEEP_FIRST, _load

        _load()
        mx = max((rn for rn, _ in ledger.values()), default=0)
        head = _SWEEP_FIRST[:HEAD]
        if all(ledger.get(n, (None, False))[0] == mx for n in head):
            # The current head already has rows at the ledger's max
            # round — its CORRECTNESS file has landed, so projecting it
            # green again would label the proposal one round too far
            # ahead (ADVICE r14: printed "r16 proposal" at r14 close
            # when the content was the r15 head). No projection needed:
            # propose straight from the ledger, labeled max+1.
            nxt = propose_head(names, ledger)
            print(f"current head-{HEAD} already swept in r{mx:02d}; "
                  f"the r{mx + 1:02d} proposal is:")
            for i, n in enumerate(nxt):
                rn = ledger.get(n, (None,))[0]
                tag = f" (r{rn:02d})" if rn is not None else " (never swept)"
                print(f"  {i + 1:02d} {n}{tag}")
            return 0
        this_round = 1 + mx
        projected = dict(ledger)
        for n in head:
            projected[n] = (this_round, True)
        nxt = propose_head(names, projected)
        print(f"assuming the current head-{HEAD} sweeps green in "
              f"r{this_round:02d}, the r{this_round + 1:02d} proposal is:")
        for i, n in enumerate(nxt):
            rn = projected.get(n, (None,))[0]
            tag = f" (r{rn:02d})" if rn is not None else " (never swept)"
            print(f"  {i + 1:02d} {n}{tag}")
        return 0

    never = [n for n in names if n not in ledger]
    reds = [n for n in names if n in ledger and not ledger[n][1]]
    by_round: dict[int, int] = {}
    for n in names:
        if n in ledger:
            by_round[ledger[n][0]] = by_round.get(ledger[n][0], 0) + 1
    print(f"registry: {len(names)}  swept: {len(names) - len(never)}  "
          f"never-swept: {len(never)}  reds-at-latest: {len(reds)}")
    for rn in sorted(by_round):
        print(f"  r{rn:02d}: {by_round[rn]}")
    if reds:
        print("REDS (head priority 1):")
        for n in reds:
            print(f"  {n} (r{ledger[n][0]:02d})")
    if never:
        print("never-swept (head priority 2):")
        for n in never:
            print(f"  {n}")

    proposal = propose_head(names, ledger)
    from striot_spark.queries.registry import _SWEEP_FIRST, _load

    _load()
    current = [n for n in _SWEEP_FIRST][:HEAD]
    if current == proposal:
        print(f"\nhead-{HEAD}: current _SWEEP_FIRST matches the proposal.")
        return 0
    print(f"\nproposed head-{HEAD} (differs from current _SWEEP_FIRST):")
    for i, n in enumerate(proposal):
        marker = "" if i < len(current) and current[i] == n else "  <- differs"
        print(f"  {i + 1:02d} {n}{marker}")
    return 1 if args.check else 0


if __name__ == "__main__":
    sys.exit(main())
