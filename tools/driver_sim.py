"""Fresh-process replica of the grading driver's correctness sweep.

Run from anywhere:

    python tools/driver_sim.py            # first 50 (the driver's cap)
    python tools/driver_sim.py --all      # every registry entry
    python tools/driver_sim.py --sf /root/testdata/sf0.001 --all

Plain SparkSession (no project confs — the driver's environment),
driver registry order, DuckDB hash-compare per query via
tests/oracle_harness.compare_query; rows-only entries (oracle=None)
get the driver's weaker non-negative-count check. Exit code = number
of failing queries. Run it in a FRESH process (getOrCreate() reuses
sessions) — this file being its own __main__ guarantees that.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true",
                    help="sweep every entry, not just the first 50")
    ap.add_argument("--only", nargs="*", default=None,
                    help="sweep only these query names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_harness import compare_query

    qs, oracles = e.queries(), e.oracle_sql()
    names = list(qs)
    if args.only:
        names = [n for n in names if n in set(args.only)]
    elif not getattr(args, "all"):
        names = names[:50]

    bad = 0
    for i, n in enumerate(names):
        t0 = time.time()
        try:
            if n in oracles:
                probs = compare_query(spark, n, qs[n], oracles[n], args.sf)
            else:
                cnt = qs[n](spark, args.sf).count()
                probs = [] if cnt >= 0 else [f"{n}: negative count"]
        except Exception as ex:  # noqa: BLE001 - report, keep sweeping
            probs = [f"{n}: EXC {type(ex).__name__}: {ex}"]
        status = "OK" if not probs else "FAIL"
        print(f"[{i + 1:03d}/{len(names)}] {n}: {status} "
              f"({time.time() - t0:.1f}s)", flush=True)
        for p in probs:
            bad += 1
            print("   ", str(p)[:300], flush=True)
    print("DONE bad=", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
