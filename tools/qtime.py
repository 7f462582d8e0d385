"""Interleaved per-query timing harness (PERF §36 protocol, one process).

    python tools/qtime.py q268_betweenness_pivots q253_sssp_parents \
        --reps 3 [--sf /root/testdata/sf0.1] [--conf k=v ...]

Times each named query with the noop sink inside the bench session,
interleaving queries across reps (A B A B ...) so box drift hits every
arm equally; prints per-rep and min/median per query. clearCache()
between runs, warmup identical to bench.py.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--conf", nargs="*", default=[])
    ap.add_argument("--ab", nargs="*", default=None,
                    help="k=v confs toggled per rep IN-SESSION: even reps "
                         "run with session defaults (arm A), odd reps set "
                         "these (arm B). True interleaving — immune to box "
                         "drift between processes.")
    args = ap.parse_args()

    from striot_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(app_name="qtime", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    from striot_spark.sources.batch import load_table

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        load_table(spark, args.sf, t).count()

    import __spark_entry__ as e

    qs = e.queries()
    ab = dict(kv.split("=", 1) for kv in args.ab) if args.ab else None
    saved = {k: spark.conf.get(k, None) for k in (ab or {})}
    rows: dict[tuple[str, str], list[float]] = {}
    for rep in range(args.reps):
        arm = "B" if (ab and rep % 2 == 1) else "A"
        if ab:
            for k, v in (ab if arm == "B" else saved).items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        for n in args.names:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{n} rep{rep} arm{arm}")
            t0 = time.perf_counter()
            qs[n](spark, args.sf).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            rows.setdefault((n, arm), []).append(dt)
            print(f"rep{rep}[{arm}] {n}: {dt:.3f}s", flush=True)
    if ab:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    print("---")
    for (n, arm), ts in sorted(rows.items()):
        print(f"{n}[{arm}]: min={min(ts):.3f} med={statistics.median(ts):.3f} "
              f"all={[round(t, 2) for t in ts]}")
    # calib, same as bench.py
    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(2_000_000_000).selectExpr("sum(id * 2654435761 % 1000003)").collect()
        calib = min(calib, time.perf_counter() - t0)
    print(f"calib_sec={calib:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
