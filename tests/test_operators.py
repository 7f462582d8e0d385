"""Operator semantics unit tests (the reference keeps per-operator
inline tests + properties, SURVEY.md §5.1/5.3; these mirror that on the
Spark lowering, cross-checking general paths against algebraic paths
and the pure evaluator)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from striot_spark.core import Stream
from striot_spark.operators import Chop, ChopTime, Session, Sliding
from striot_spark.operators.windows import WINDOW_ID, window_skeleton
from striot_spark.plans.graph import FilterAccOp, FilterOp, MapOp, ScanOp, run_chain
from striot_spark.sources.batch import event_stream


@pytest.fixture(scope="module")
def ev(spark, sf_dir):
    return event_stream(spark, sf_dir)


def test_zip_join_truncates_to_shorter(spark, ev):
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "signup")
    n_a, n_b = a.df.count(), b.df.count()
    joined = a.zip_join(b)
    assert joined.df.count() == min(n_a, n_b)  # Haskell zip semantics


def test_merge_is_multiset_union(spark, ev):
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "view")
    assert a.merge(b).df.count() == a.df.count() + b.df.count()


def test_chop_window_sizes(spark, ev):
    total = ev.df.count()
    sizes = (
        ev.window_agg(Chop(64), {"n": F.count(F.lit(1))})
        .df.select("n")
        .collect()
    )
    ns = sorted(r["n"] for r in sizes)
    assert sum(ns) == total
    assert all(n == 64 for n in ns[:-1]) or ns.count(64) >= len(ns) - 1


def test_choptime_origin_alignment(spark, ev):
    """ChopTime(origin=first event ts) reproduces the reference's
    first-event-aligned tumbling windows (FunctionalProcessing.hs:118-126)."""
    first_ts = ev.df.agg(F.min("ts")).collect()[0][0]
    maker = ChopTime("1 day", origin=str(first_ts))
    out = ev.window_agg(maker, {"n": F.count(F.lit(1))}, keep_window_time=True)
    starts = [r["window_start"] for r in out.df.select("window_start").collect()]
    # every window start is origin + k*1day
    deltas = {
        int((s - first_ts).total_seconds()) % 86400 for s in starts
    }
    assert deltas == {0}


def test_window_skeleton_emits_empty_windows(spark, ev):
    """Reference emits empty windows (FunctionalProcessing.hs:86); the
    skeleton left-join reproduces that."""
    maker = ChopTime("1 hour")
    agg = ev.window_agg(maker, {"n": F.count(F.lit(1))}).df
    skel = window_skeleton(ev.df, maker, "ts")
    full = skel.join(agg, WINDOW_ID, "left").fillna(0, subset=["n"])
    n_hours = skel.count()
    assert full.count() == n_hours
    assert full.filter(F.col("n") == 0).count() > 0  # sparse stream → gaps
    assert agg.count() < n_hours


def test_scan_apply_matches_algebraic_scan(spark, ev):
    """General Arrow path == analytic-frame path on a cumulative sum."""
    alg = (
        ev.scan({"rt": F.sum(F.col("value").cast("long"))}, key=["user_id"])
        .df.select("event_id", "rt")
    )
    gen = ev.scan_apply(
        lambda st, row: st + int(row["value"]),
        0,
        out_field="rt",
        out_type="long",
        key=["user_id"],
    ).df.select("event_id", "rt")
    assert alg.exceptAll(gen).count() == 0 and gen.exceptAll(alg).count() == 0


def test_filter_acc_apply_matches_lag_changes(spark, ev):
    """General Arrow filterAcc == lag()-based dedup-on-change."""
    lag_based = ev.changes("event_type", key=["user_id"]).df.select("event_id")
    gen = ev.filter_acc_apply(
        step=lambda st, row: row["event_type"],
        init=None,
        pred=lambda row, st: st is None or row["event_type"] != st,
        key=["user_id"],
    ).df.select("event_id")
    assert lag_based.exceptAll(gen).count() == 0
    assert gen.exceptAll(lag_based).count() == 0


def test_sample_without_dense_seq(spark, ev):
    """Fallback row_number sampling picks every n-th by stream order."""
    filtered = ev.filter(F.col("value") > 50)  # density broken
    n_in = filtered.df.count()
    out = filtered.sample(7)
    assert out.df.count() == (n_in + 6) // 7


def test_session_window_maker_matches_sessionize(spark, ev):
    from striot_spark.functions.analytics import sessionize
    from striot_spark.operators.windows import assign_window_id

    a = assign_window_id(
        ev.df, Session("30 minutes"), "ts", "event_id", key=["user_id"]
    ).select("event_id", F.col(WINDOW_ID).alias("sid"))
    b = sessionize(
        ev.df, "ts", 30, ["user_id"], order_cols=["ts", "event_id"]
    ).select("event_id", F.col("session_id").alias("sid"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_sliding_window_counts(spark, ev):
    out = ev.window_agg(Sliding(10), {"n": F.count(F.lit(1))}).df
    ns = [r["n"] for r in out.orderBy("event_id").select("n").collect()]
    assert ns[:9] == list(range(1, 10))  # ramp-up
    assert all(n == 10 for n in ns[9:])


def test_apply_chain_matches_pure_evaluator(spark, ev):
    """Fused applyInPandas chain == pure evaluator on collected values."""
    chain = (
        MapOp(lambda v: v * 2),
        FilterOp(lambda v: v > 100),
        ScanOp(lambda acc, v: acc + v, 0.0),
        FilterAccOp(lambda acc, v: acc + 1, 0, lambda v, acc: acc % 2 == 0),
    )
    out = ev.apply_chain(chain, "value", "double")
    got = [
        r["value"]
        for r in out.df.orderBy("ts", "event_id").select("value").collect()
    ]
    vals = [
        r["value"]
        for r in ev.df.orderBy("ts", "event_id").select("value").collect()
    ]
    assert got == run_chain(chain, vals)


def test_apply_chain_is_single_stage(spark, ev):
    """The fused chain must lower to exactly one FlatMapGroupsInPandas."""
    chain = (
        FilterOp(lambda v: v > 0),
        FilterAccOp(lambda acc, v: v, None, lambda v, acc: v != acc),
        ScanOp(lambda acc, v: acc + v, 0.0),
    )
    out = ev.apply_chain(chain, "value", "double")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_asof_join_backward_semantics(spark):
    """Latest right row at-or-before each left ts, per key; same-ts right
    rows visible; ties broken by right seq; no prior right -> null."""
    from striot_spark.operators.join import asof_join

    left = spark.createDataFrame(
        [
            (10, 1, 100.0, 5.0),   # after r at ts=90 and the tie pair at 100
            (11, 1, 95.0, 6.0),    # only r at ts=90 is visible
            (12, 1, 50.0, 7.0),    # before any right row -> null
            (13, 2, 100.0, 8.0),   # other key: only its own rights
        ],
        "event_id long, user_id long, ts double, value double",
    )
    right = spark.createDataFrame(
        [
            (100, 1, 90.0, 1.0),
            (101, 1, 100.0, 2.0),  # same ts as left event 10: visible
            (102, 1, 100.0, 3.0),  # same ts, higher seq wins the tie
            (103, 2, 60.0, 4.0),
        ],
        "event_id long, user_id long, ts double, value double",
    )
    out = {
        r["event_id"]: (r["rv"], r["rid"])
        for r in asof_join(
            left,
            right,
            ["user_id"],
            "ts",
            {"rv": F.col("value"), "rid": F.col("event_id")},
            right_seq="event_id",
            left_seq="event_id",
        ).collect()
    }
    assert out[10] == (3.0, 102)  # same-ts ties: highest right seq
    assert out[11] == (1.0, 100)
    assert out[12] == (None, None)
    assert out[13] == (4.0, 103)


def test_asof_join_matches_bruteforce_on_random_data(spark):
    """Randomized cross-check: the union+carry-forward lowering must
    agree with the O(n*m) brute-force definition (latest right row with
    ts <= left ts, ties -> highest right seq) on adversarial data:
    duplicate timestamps, keys with no right rows, interleaved orders."""
    import random

    from striot_spark.operators.join import asof_join

    rng = random.Random(7)
    lrows = [
        (i, rng.randint(1, 5), float(rng.randint(0, 20)), float(i))
        for i in range(60)
    ]
    rrows = [
        (1000 + i, rng.randint(1, 6), float(rng.randint(0, 20)), float(i) / 7)
        for i in range(80)
    ]
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts double, value double"
    )
    right = spark.createDataFrame(
        rrows, "event_id long, user_id long, ts double, value double"
    )
    got = {
        r["event_id"]: r["rid"]
        for r in asof_join(
            left,
            right,
            ["user_id"],
            "ts",
            {"rid": F.col("event_id")},
            right_seq="event_id",
            left_seq="event_id",
        ).collect()
    }
    for eid, key, ts, _ in lrows:
        cand = [(rts, rid) for rid, rkey, rts, _ in rrows if rkey == key and rts <= ts]
        want = max(cand)[1] if cand else None
        assert got[eid] == want, (eid, key, ts)


def test_salted_join_matches_plain_join(spark):
    """salted_join must return exactly the rows of the plain equi-join,
    with left rows of a hot key spread across salt ids."""
    from striot_spark.core.scale import salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(5)],
        "k long, lv long",
    )
    right = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, rv long")
    got = salted_join(left, right, "k", salt=8)
    want = left.join(right, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the hot key's rows really do carry multiple salt ids
    import pyspark.sql.functions as F
    n_salts = (
        left.withColumn(
            "__salt",
            F.pmod(F.hash(F.struct(*[F.col(c) for c in left.columns])), F.lit(8)),
        )
        .filter(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_interval_join_boundaries_and_bins(spark):
    """Inclusive [lower, upper] bounds in exact microseconds; matches
    across time-bin boundaries; keys partition the match space."""
    from striot_spark.operators.join import interval_join

    t0 = 1_000_000_000_000_000  # epoch micros
    S = 1_000_000
    left = spark.createDataFrame(
        [(1, 1, t0), (2, 2, t0)], "lid long, k long, lus long"
    ).select("lid", "k", F.timestamp_micros("lus").alias("lts"))
    right = spark.createDataFrame(
        [
            (10, 1, t0),                 # gap 0: lower bound, inclusive
            (11, 1, t0 + 3600 * S),      # upper bound, inclusive
            (12, 1, t0 + 3600 * S + 1),  # 1us past upper: out
            (13, 1, t0 - 1),             # 1us before lower: out
            (14, 1, t0 + 3000 * S),      # lands in the NEXT time bin
            (15, 2, t0 + 5 * S),         # other key
        ],
        "rid long, k long, rus long",
    ).select("rid", "k", F.timestamp_micros("rus").alias("rts"))
    out = interval_join(left, right, ["k"], "lts", "rts", 0.0, 3600.0)
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    assert pairs == {(1, 10), (1, 11), (1, 14), (2, 15)}


def test_interval_join_matches_bruteforce_on_random_data(spark):
    """Binned lowering == brute-force O(n^2) reference, including a
    negative lower bound (backward+forward window)."""
    import random

    from striot_spark.operators.join import interval_join

    rng = random.Random(7)
    t0 = 1_700_000_000_000_000
    S = 1_000_000
    lows, ups = -60.0, 120.0
    lrows = [
        (i, rng.randrange(3), t0 + rng.randrange(0, 3600) * S // 2)
        for i in range(120)
    ]
    rrows = [
        (i, rng.randrange(3), t0 + rng.randrange(0, 3600) * S // 2)
        for i in range(120)
    ]
    expected = {
        (l[0], r[0])
        for l in lrows
        for r in rrows
        if l[1] == r[1]
        and l[2] + int(lows * S) <= r[2] <= l[2] + int(ups * S)
    }
    left = spark.createDataFrame(
        lrows, "lid long, k long, lus long"
    ).select("lid", "k", F.timestamp_micros("lus").alias("lts"))
    right = spark.createDataFrame(
        rrows, "rid long, k long, rus long"
    ).select("rid", "k", F.timestamp_micros("rus").alias("rts"))
    out = interval_join(left, right, ["k"], "lts", "rts", lows, ups)
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    assert got == expected


# -- dataless (timestamp-only) event pass-through ----------------------------
# Reference properties: FunctionalProcessing.hs:70 (map), :185 (filterAcc),
# :191 (scan) — events without data pass through unchanged and never touch
# operator state.


@pytest.fixture(scope="module")
def nulls(spark):
    """Stream with interleaved dataless events (value NULL)."""
    rows = [
        (0, 1.0), (1, None), (2, 2.0), (3, 2.0), (4, None),
        (5, 2.0), (6, 3.0), (7, None), (8, 3.0),
    ]
    df = spark.createDataFrame(rows, "seq long, value double")
    return Stream(df, time_col=None, seq_col="seq", dense_seq=True)


def test_map_null_passthrough_defeats_non_strict_exprs(spark, nulls):
    """Even a non-null-strict expression (coalesce) must emit NULL for a
    dataless event under null_passthrough."""
    out = nulls.map(
        null_passthrough="value", v=F.coalesce(F.col("value") * 2, F.lit(-1.0))
    )
    got = {r["seq"]: r["v"] for r in out.df.collect()}
    assert got[1] is None and got[4] is None and got[7] is None
    assert got[0] == 2.0 and got[6] == 6.0


def test_scan_null_passthrough_skips_accumulator(spark, nulls):
    out = nulls.scan(
        {"rt": F.sum(F.col("value"))}, null_passthrough="value"
    )
    got = {r["seq"]: r["rt"] for r in out.df.collect()}
    # dataless rows emit NULL, and the accumulator resumes unchanged
    assert got == {0: 1.0, 1: None, 2: 3.0, 3: 5.0, 4: None,
                   5: 7.0, 6: 10.0, 7: None, 8: 13.0}


def test_scan_apply_null_passthrough_matches_algebraic(spark, nulls):
    alg = nulls.scan({"rt": F.sum(F.col("value"))}, null_passthrough="value")
    gen = nulls.scan_apply(
        step=lambda st, row: (st or 0.0) + row["value"],
        init=None,
        out_field="rt",
        out_type="double",
        null_passthrough="value",
    )
    a = {r["seq"]: r["rt"] for r in alg.df.collect()}
    b = {r["seq"]: r["rt"] for r in gen.df.collect()}
    assert a == b


def test_scan_apply_null_passthrough_array_payload(spark):
    """The dataless-event rule must work for ARRAY payloads too:
    pd.isna on an array cell returns an elementwise array (ambiguous
    truth value) — the null check has to be type-safe."""
    from striot_spark.operators.stateful import scan_apply

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, None),  # dataless event
            (3, [3.0, 4.0]),
        ],
        "seq long, vec array<double>",
    )
    out = scan_apply(
        df,
        step=lambda st, row: (st or 0.0) + sum(row["vec"]),
        init=None,
        out_field="total",
        out_type="double",
        time_col=None,
        seq_col="seq",
        null_passthrough="vec",
    )
    got = {r["seq"]: r["total"] for r in out.collect()}
    assert got == {1: 3.0, 2: None, 3: 10.0}


def test_filter_acc_null_passthrough_changes(spark, nulls):
    """Dedup-on-change: NULL rows always pass; data rows compare against
    the last NON-NULL value (so 2.0 after [2.0, NULL] is still a dup)."""
    out = nulls.filter_acc(
        lambda prev, cur: prev != cur, "value", null_passthrough=True
    )
    kept = sorted(r["seq"] for r in out.df.collect())
    # seq3 (2.0 after 2.0) and seq5 (2.0 after NULL, last data 2.0) and
    # seq8 (3.0 after NULL, last data 3.0) are dups; NULLs 1,4,7 pass
    assert kept == [0, 1, 2, 4, 6, 7]


def test_filter_acc_apply_null_passthrough_matches_lag(spark, nulls):
    lag_based = nulls.filter_acc(
        lambda prev, cur: prev != cur, "value", null_passthrough=True
    )
    gen = nulls.filter_acc_apply(
        step=lambda st, row: row["value"],
        init=None,
        pred=lambda row, st: st is None or row["value"] != st,
        null_passthrough="value",
    )
    a = sorted(r["seq"] for r in lag_based.df.collect())
    b = sorted(r["seq"] for r in gen.df.collect())
    assert a == b


def test_join_e_positional_matches_haskell_zip_semantics(spark):
    """Chop-windowed joinE with unequal sizes == the reference's
    positional zip of window lists (streamJoinE fwm1 fwm2,
    FunctionalProcessing.hs:161-173), computed here in pure Python."""
    from striot_spark.operators import Chop

    la = [(i, float(i % 5)) for i in range(17)]
    rb = [(i, float(i % 3)) for i in range(11)]
    sa = Stream(
        spark.createDataFrame(la, "seq long, v double"),
        time_col=None, seq_col="seq", dense_seq=True,
    )
    sb = Stream(
        spark.createDataFrame(rb, "seq long, v double"),
        time_col=None, seq_col="seq", dense_seq=True,
    )
    out = sa.join_e(
        sb, Chop(3), F.col("l_v") > F.col("r_v"), r_maker=Chop(2)
    )
    got = sorted(
        (r["l_seq"], r["r_seq"]) for r in out.df.collect()
    )

    # pure reference semantics: window, zip, cartesian, filter
    def windows(rows, n):
        return [rows[i : i + n] for i in range(0, len(rows), n)]

    want = sorted(
        (a[0], b[0])
        for wa, wb in zip(windows(la, 3), windows(rb, 2))
        for a in wa
        for b in wb
        if a[1] > b[1]
    )
    assert got == want and len(got) > 0


def test_debounce_keep_dependent_state(spark):
    """Debounce state advances only on KEPT rows. gap=10s over
    t=0,6,12,17,25: keep t=0 (first), suppress t=6 (6s after kept 0),
    keep t=12 (12s after kept 0), suppress t=17 (5s after kept 12),
    keep t=25. An every-row accumulator (plain filter_acc comparing
    against the previous EVENT) would instead suppress t=12, since
    only 6s separate it from the t=6 event — that divergence is what
    this pins."""
    import datetime as dt

    from striot_spark.operators.stateful import debounce

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(seconds=s), i)
        for i, s in enumerate([0, 6, 12, 17, 25])
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = sorted(
        r["event_id"]
        for r in debounce(
            df, ["user_id"], "ts", "event_id", gap_us=10_000_000
        ).collect()
    )
    # kept: t=0 (first), t=12 (12-0>=10), t=25 (25-12>=10); t=6 and
    # t=17 are suppressed because they are <10s after the last KEPT
    assert got == [0, 2, 4]
