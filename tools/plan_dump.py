"""Dump .explain('formatted') for registry queries + a one-line plan-shape
summary per query (Exchange count, join strategies, Python eval nodes,
cartesians, window nodes).

    python tools/plan_dump.py --out /tmp/plans_r16 [--only q268... | --all]

Uses the bench session (striot_spark.session.get_spark) so plans match the
bench environment. Plans are the PRE-execution AQE initial plans; shape
counts (Exchange/join/Python nodes) are still meaningful per guide §7.2.
"""

from __future__ import annotations

import argparse
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def shape(plan: str) -> dict:
    return {
        "exchange": len(re.findall(r"\bExchange\b", plan)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", plan)),
        "sortagg": len(re.findall(r"\bSortAggregate\b", plan)),
        "hashagg": len(re.findall(r"\bHashAggregate\b", plan)),
        "window": len(re.findall(r"\bWindow\b", plan)),
        "pyeval": len(re.findall(r"BatchEvalPython|ArrowEvalPython", plan)),
        "mapinpandas": len(re.findall(r"MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)),
        "generate": len(re.findall(r"\bGenerate\b", plan)),
        "sort": len(re.findall(r"\bSort \b", plan)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/plans_r16")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--head", type=int, default=None,
                    help="only the N most expensive from bench_full_latest.json")
    ap.add_argument("--conf", nargs="*", default=[],
                    help="k=v session confs (e.g. to reproduce a pre-change plan)")
    ap.add_argument("--suffix", default="",
                    help="filename suffix, e.g. _before / _after")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from striot_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(app_name="plan-dump", extra_conf=extra or None)
    for k, v in extra.items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    names = list(qs)
    if args.only:
        names = [n for n in names if n in set(args.only)]
    elif args.head:
        import json
        bench = json.load(open(REPO / "bench_full_latest.json"))["queries"]
        names = [n for n, _ in sorted(bench.items(), key=lambda kv: -kv[1])[: args.head]]

    summary = []
    for n in names:
        t0 = time.time()
        try:
            df = qs[n](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as ex:  # noqa: BLE001
            summary.append((n, {"error": str(ex)[:120]}))
            continue
        (out / f"{n}{args.suffix}.txt").write_text(plan)
        s = shape(plan)
        s["build_s"] = round(time.time() - t0, 2)
        s["plan_kb"] = len(plan) // 1024
        summary.append((n, s))

    with open(out / "_summary.tsv", "w") as f:
        cols = ["exchange", "bhj", "smj", "shj", "bnlj", "cartesian", "sortagg",
                "hashagg", "window", "pyeval", "mapinpandas", "generate", "sort",
                "plan_kb", "build_s"]
        f.write("query\t" + "\t".join(cols) + "\n")
        for n, s in summary:
            if "error" in s:
                f.write(f"{n}\tERROR: {s['error']}\n")
            else:
                f.write(n + "\t" + "\t".join(str(s[c]) for c in cols) + "\n")
    print(f"wrote {len(summary)} plans to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
