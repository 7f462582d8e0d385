"""Join operators: positional zip join, windowed theta join, whole-window join.

Reference parity (SURVEY.md §2.1 #6, §2.3):
- ``streamJoin`` — *positional pairwise zip*, not relational
  (``src/Striot/FunctionalProcessing.hs:148-155``): pair the i-th event
  of stream 1 with the i-th of stream 2; output takes stream 1's
  timestamp.
- ``streamJoinE`` — windowed theta join: window both sides, pair windows
  positionally, cartesian within the pair, filter, project, flatten
  (``FunctionalProcessing.hs:161-173``).
- ``streamJoinW`` — whole-window join: apply ``[a] -> [b] -> c`` to each
  positional window pair (``FunctionalProcessing.hs:175-178``); taxi Q2
  uses different window lengths per side (``examples/taxi/Taxi.hs:302``).

Spark-first lowering:
- Zip join on dense seq columns is a plain equi-join (shuffle hash /
  sort-merge, fully parallel). Without dense seqs it needs a global
  ``row_number`` — single-partition sort, flagged for scale.
- JoinE/JoinW use *time-aligned* window ids (both sides windowed by the
  same ChopTime spec ⇒ join key = window id), which is the semantics the
  reference approximates by zipping window lists positionally: for timed
  streams windowed by the same maker the i-th windows coincide. This is
  an equi-join on the window key — broadcastable when one side is small,
  AQE-skew-split otherwise.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .windows import WINDOW_ID, ChopTime, WindowMaker, assign_window_id


def _with_pos(
    df: DataFrame, time_col: str | None, seq_col: str | None, dense_seq: bool
) -> tuple[DataFrame, str]:
    """Positional index for zip joins: dense seq directly, else the
    two-pass partition-offset numbering (never a single-partition sort)."""
    if dense_seq and seq_col:
        return df.withColumn("__pos__", F.col(seq_col)), "__pos__"
    order = [F.col(c) for c in (time_col, seq_col) if c]
    if not order:
        raise ValueError("zip join needs a time or seq column")
    from striot_spark.core.scale import global_index

    return global_index(df, order, "__pos__"), "__pos__"


def zip_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str | None,
    seq_col: str | None,
    r_time_col: str | None,
    r_seq_col: str | None,
    prefixes: tuple[str, str] = ("l_", "r_"),
    dense_seq: bool = False,
) -> DataFrame:
    """Positional zip of two streams (inner: stops at the shorter one,
    mirroring Haskell ``zip``)."""
    lp, lpos = _with_pos(left, time_col, seq_col, dense_seq)
    rp, rpos = _with_pos(right, r_time_col, r_seq_col, dense_seq)
    lcols = [F.col(c).alias(f"{prefixes[0]}{c}") for c in left.columns]
    rcols = [F.col(c).alias(f"{prefixes[1]}{c}") for c in right.columns]
    lp = lp.select(F.col(lpos).alias("zip_pos"), *lcols)
    rp = rp.select(F.col(rpos).alias("zip_pos"), *rcols)
    return lp.join(rp, "zip_pos", "inner")


def join_e(
    left: DataFrame,
    right: DataFrame,
    maker: WindowMaker,
    theta: Column,
    time_col: str | None,
    r_time_col: str | None,
    select: Sequence[Column] | None = None,
    prefixes: tuple[str, str] = ("l_", "r_"),
    broadcast_right: bool = False,
    r_maker: WindowMaker | None = None,
    seq_col: str | None = None,
    r_seq_col: str | None = None,
    dense_seq: bool = False,
) -> DataFrame:
    """Windowed theta join (streamJoinE, ``FunctionalProcessing.hs:
    161-173``): pair windows, cartesian within each pair, filter by
    ``theta`` over the prefixed columns, flatten.

    Two window-pairing regimes, both equi-joins on the window id:

    - **Timed streams** (ChopTime makers): the i-th windows of two
      streams windowed by the same time maker coincide, so the window
      *start* is the pair key.
    - **Untimed streams** (Chop makers, possibly different sizes per
      side — the reference's ``fwm1``/``fwm2``): a count window's id is
      ``seq div n``, i.e. its ORDINAL, so the equi-join pairs the i-th
      left window with the i-th right window — exactly the reference's
      positional zip of window lists, including truncation to the
      shorter list (no ordinal match → no pair). With a dense seq this
      is pure arithmetic: no sort, no single-partition anything.
    """
    r_maker = r_maker if r_maker is not None else maker
    lw = assign_window_id(
        left, maker, time_col, seq_col, dense_seq=dense_seq
    ).select(
        F.col(WINDOW_ID),
        *[F.col(c).alias(f"{prefixes[0]}{c}") for c in left.columns],
    )
    rw = assign_window_id(
        right, r_maker, r_time_col, r_seq_col, dense_seq=dense_seq
    ).select(
        F.col(WINDOW_ID),
        *[F.col(c).alias(f"{prefixes[1]}{c}") for c in right.columns],
    )
    if broadcast_right:
        rw = F.broadcast(rw)
    out = lw.join(rw, WINDOW_ID, "inner").filter(theta)
    if select is not None:
        out = out.select(F.col(WINDOW_ID), *select)
    return out


def join_w(
    left: DataFrame,
    right: DataFrame,
    left_maker: ChopTime,
    right_maker: ChopTime,
    left_aggs: dict[str, Column],
    right_aggs: dict[str, Column],
    time_col: str,
    r_time_col: str,
    align: str = "left",
) -> DataFrame:
    """Whole-window join (streamJoinW) with per-side window lengths.

    Each side is windowed and aggregated independently, then the two
    window streams are joined by aligning the *right* window containing
    the left window's start (``align='left'``) — the explicit, tested
    definition of the reference's positional zip of differently-sized
    window lists (SURVEY.md §7.3 hard-point 3).
    """
    lw = (
        assign_window_id(left, left_maker, time_col, None)
        .groupBy(WINDOW_ID)
        .agg(*[c.alias(n) for n, c in left_aggs.items()])
        .withColumnRenamed(WINDOW_ID, "left_window")
    )
    rw = (
        assign_window_id(right, right_maker, r_time_col, None)
        .groupBy(WINDOW_ID)
        .agg(*[c.alias(n) for n, c in right_aggs.items()])
        .withColumnRenamed(WINDOW_ID, "right_window")
    )
    if align != "left":
        raise NotImplementedError("only left-start alignment is defined")
    # right window id containing the left window's start:
    from .windows import _gap_ms

    r_ms = _gap_ms(right_maker.duration)
    r_sec = r_ms // 1000 if r_ms % 1000 == 0 else None
    if r_sec is None:
        raise ValueError("right window length must be whole seconds")
    containing = (F.col("left_window") - (F.col("left_window") % F.lit(r_sec)))
    return lw.withColumn("right_window", containing).join(rw, "right_window", "left")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_sec: float,
    upper_sec: float,
) -> DataFrame:
    """Bounded time-interval (range) join: pair each left row with every
    right row sharing ``key_cols`` whose timestamp falls in
    ``[left_ts + lower_sec, left_ts + upper_sec]`` (both ends
    inclusive). The batch form of Structured Streaming's time-interval
    stream-stream join; not in the reference's operator set (its only
    joins are positional zips, SURVEY.md §2.1 #6).

    Scale-first lowering — *binned* range join, not a theta join. A
    plain ``l.join(r, key & range)`` degenerates inside each key to an
    O(n_l x n_r) nested-loop compare; with hot keys (one user owning
    millions of events) a single task does quadratic work. Instead both
    sides are bucketed into time bins of width ``upper - lower``: each
    left interval starts in exactly one bin, a right row can only match
    intervals starting in its own or the previous bin, so RIGHT is
    replicated x2 into ``{bin-1, bin}`` and the join becomes an
    equi-join on ``(keys..., bin)`` with a residual range filter.
    Candidates per pair are bounded by bin occupancy, the equi-join is
    shuffle-parallel on (key, bin) — finer than key alone, so a hot key
    spreads across time — and AQE skew-split applies.

    Arithmetic is integer microseconds end-to-end (``unix_micros``) so
    boundary comparisons are exact, never float-rounded.

    Non-key column names must be disjoint between the two sides (rename
    before calling); ``key_cols`` are merged in the output.
    """
    if upper_sec <= lower_sec:
        raise ValueError("interval_join requires upper_sec > lower_sec")
    lower_us = int(round(lower_sec * 1_000_000))
    upper_us = int(round(upper_sec * 1_000_000))
    w = upper_us - lower_us

    def _bin(x: Column) -> Column:
        return ((x - F.pmod(x, F.lit(w))) / F.lit(w)).cast("long")

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    l2 = left.withColumn("__lus", l_us).withColumn(
        "__bin", _bin(F.col("__lus") + F.lit(lower_us))
    )
    rb = _bin(r_us)
    r2 = (
        right.withColumn("__rus", r_us)
        .withColumn("__bin", F.explode(F.array(rb - 1, rb)))
    )
    out = l2.join(r2, [*key_cols, "__bin"]).filter(
        (F.col("__rus") >= F.col("__lus") + F.lit(lower_us))
        & (F.col("__rus") <= F.col("__lus") + F.lit(upper_us))
    )
    return out.drop("__bin", "__lus", "__rus")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload: dict[str, Column],
    right_seq: str,
    left_seq: str,
) -> DataFrame:
    """As-of (backward) join: each left row is enriched with the payload
    of the latest right row with ``right.ts <= left.ts`` for the same
    key — the canonical timeseries enrichment (sensor reading → latest
    calibration, trade → latest quote). Not in the reference's operator
    set; included because IoT users of this engine need it and Spark has
    no native form.

    Scale-first lowering — the union trick, NOT a range join: tag both
    sides, union them, and carry the right payload forward with
    ``last(..., ignorenulls=True)`` over a per-key ordered frame. Costs
    exactly ONE shuffle (on the key) and never materializes candidate
    ranges; a time-interval join would multiply rows by the overlap
    factor before filtering. Ties at equal timestamps: right rows sort
    before left rows (a same-timestamp right row IS visible), ordered
    among themselves by ``right_seq`` so the result is deterministic.

    ``payload`` maps output names to right-side Columns; names must not
    collide with left columns.
    """
    r = right.select(
        *key_cols,
        F.col(ts_col),
        F.col(right_seq).alias("__tie"),
        F.lit(0).alias("__side"),
        *[c.alias(n) for n, c in payload.items()],
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__tie", F.col(left_seq)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    for name in payload:
        u = u.withColumn(name, F.last(F.col(name), ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).drop("__side", "__tie")
