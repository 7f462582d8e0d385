"""Window makers and their Spark lowering.

Reference parity: ``WindowMaker a = Stream a -> [Stream a]``
(``src/Striot/FunctionalProcessing.hs:74``) with the five shipped makers
``sliding`` / ``slidingTime`` / ``chop`` / ``chopTime`` / ``complete``
(``FunctionalProcessing.hs:93-132``) plus session windows (the reference
builds these by hand with streamScan, ``examples/wearable/
WearableStreams.hs:175-189``; Spark has them natively).

Spark-first lowering strategy (SURVEY.md §2.2):

- **Tumbling** makers (``Chop``/``ChopTime``/``Complete``/``Session``)
  assign a *window id column* and aggregate with ``groupBy`` — a single
  shuffle on the window key, map-side partial aggregation for free.
- **Sliding** makers (slide = 1 event in the reference) lower to analytic
  window *frames* (``rowsBetween`` / ``rangeBetween``) — no row
  multiplication: a per-event sliding window materialized as rows would
  explode 100 TB inputs by the window length (SURVEY.md §7.3 hard-point 2).

Semantic deltas vs the reference, by design (documented + tested):

- ``ChopTime`` is epoch-aligned (Spark ``window()``), not aligned to the
  first event's timestamp (``FunctionalProcessing.hs:118-126``). Pass
  ``origin=<timestamp>`` to reproduce first-event alignment when needed.
- Empty windows are not emitted by ``groupBy`` (the reference emits
  ``Event Nothing (Just [])``, ``FunctionalProcessing.hs:86``); use
  ``with_empty_windows`` to left-join a generated window skeleton.

Scale notes: the global (un-keyed) forms of count-based windows use the
dense ``seq`` column when the stream declares one — pure arithmetic,
fully parallel, no sort. Without a dense seq they fall back to a global
``row_number`` (single-partition sort) — fine for correctness oracles,
flagged for scale via ``requires_global_sort``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

WINDOW_ID = "window_id"
WINDOW_TIME = "window_time"


@dataclass(frozen=True)
class WindowMaker:
    """Base class for window specifications."""

    def requires_global_sort(self, has_dense_seq: bool) -> bool:
        return False


@dataclass(frozen=True)
class Chop(WindowMaker):
    """Tumbling count window of n data events (FunctionalProcessing.hs:113-116)."""

    n: int

    def requires_global_sort(self, has_dense_seq: bool) -> bool:
        return not has_dense_seq


@dataclass(frozen=True)
class ChopTime(WindowMaker):
    """Tumbling time window (FunctionalProcessing.hs:118-126).

    ``duration`` is a Spark interval string ("1 day", "120 milliseconds").
    Epoch-aligned unless ``origin`` (ISO timestamp string) is given.
    """

    duration: str
    origin: str | None = None


@dataclass(frozen=True)
class Sliding(WindowMaker):
    """Count-based sliding window, slide=1 event (FunctionalProcessing.hs:93-97)."""

    n: int

    def requires_global_sort(self, has_dense_seq: bool) -> bool:
        return True  # frames always need an ordering; keyed use parallelizes


@dataclass(frozen=True)
class SlidingTime(WindowMaker):
    """Time-based sliding window, slide=1 event (FunctionalProcessing.hs:99-108).

    ``ms``: window length in milliseconds, covering [t, t+ms) like the
    reference's ``takeTime`` (forward-looking from each event).
    """

    ms: int
    backward: bool = False  # True → [t-ms, t], the usual analytic frame

    def requires_global_sort(self, has_dense_seq: bool) -> bool:
        return True


@dataclass(frozen=True)
class Complete(WindowMaker):
    """Whole-stream single window (FunctionalProcessing.hs:131-132)."""


@dataclass(frozen=True)
class Session(WindowMaker):
    """Gap-based session window (extension; native in Spark streaming).

    Batch lowering is gaps-and-islands: a new session starts when the gap
    from the previous event (per key) exceeds ``gap``.
    """

    gap: str  # interval string, e.g. "30 minutes"


def _gap_ms(interval: str) -> int:
    qty, unit = interval.split()
    unit = unit.rstrip("s")
    factor = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit]
    return int(qty) * factor


def origin_offset(origin: str, interval: str) -> str:
    """Spark's ``window(..., startTime=)`` is an OFFSET interval, not an
    absolute instant: reduce the origin timestamp modulo the window
    slide so windows start at origin + k*slide (first-event alignment,
    ``FunctionalProcessing.hs:118``). Shared by the batch ChopTime
    lowering and the streaming ``window_agg_stream(origin=...)``."""
    import datetime as _dt

    origin_dt = _dt.datetime.fromisoformat(origin)
    epoch = _dt.datetime(1970, 1, 1)
    micros = int((origin_dt - epoch).total_seconds() * 1_000_000)
    return f"{micros % (_gap_ms(interval) * 1000)} microseconds"


def _ordering(time_col: str | None, seq_col: str | None) -> list[Column]:
    cols: list[Column] = []
    if time_col:
        cols.append(F.col(time_col))
    if seq_col:
        cols.append(F.col(seq_col))
    if not cols:
        raise ValueError("stream has neither a time column nor a seq column")
    return cols


def assign_window_id(
    df: DataFrame,
    maker: WindowMaker,
    time_col: str | None,
    seq_col: str | None,
    key: list[str] | None = None,
    dense_seq: bool = False,
) -> DataFrame:
    """Add WINDOW_ID (+ WINDOW_TIME for time windows) for tumbling makers."""
    key = key or []
    if isinstance(maker, Chop):
        if dense_seq and seq_col and not key:
            wid = (F.col(seq_col) / maker.n).cast("long")
        elif key:
            # keyed: the window is already partitioned -> parallel
            w = W.partitionBy(*key).orderBy(*_ordering(time_col, seq_col))
            wid = ((F.row_number().over(w) - F.lit(1)) / maker.n).cast("long")
        else:
            # un-keyed, no dense seq: two-pass partition-offset
            # numbering instead of a single-partition global sort
            from striot_spark.core.scale import global_index

            df = global_index(
                df, list(_ordering(time_col, seq_col)), "__chop_rn__"
            )
            return df.withColumn(
                WINDOW_ID, (F.col("__chop_rn__") / maker.n).cast("long")
            ).drop("__chop_rn__")
        return df.withColumn(WINDOW_ID, wid)
    if isinstance(maker, ChopTime):
        if time_col is None:
            raise ValueError("ChopTime requires a time column")
        # Spark-native tumbling window; start timestamp doubles as the id.
        if maker.origin is None:
            win = F.window(F.col(time_col), maker.duration)
        else:
            win = F.window(
                F.col(time_col),
                maker.duration,
                maker.duration,
                origin_offset(maker.origin, maker.duration),
            )
        return df.withColumn(WINDOW_TIME, win).withColumn(
            WINDOW_ID, F.col(f"{WINDOW_TIME}.start").cast("long")
        )
    if isinstance(maker, Complete):
        return df.withColumn(WINDOW_ID, F.lit(0).cast("long"))
    if isinstance(maker, Session):
        if time_col is None:
            raise ValueError("Session requires a time column")
        order = _ordering(time_col, seq_col)
        w = W.partitionBy(*key).orderBy(*order)
        prev_ts = F.lag(F.col(time_col)).over(w)
        gap_ms = _gap_ms(maker.gap)
        new_session = (
            prev_ts.isNull()
            | (
                (F.unix_micros(F.col(time_col)) - F.unix_micros(prev_ts))
                > gap_ms * 1000
            )
        ).cast("long")
        return df.withColumn(
            WINDOW_ID,
            F.sum(new_session).over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
    raise TypeError(f"{maker} is a sliding maker; use sliding_frame()")


def sliding_frame(
    maker: WindowMaker,
    time_col: str | None,
    seq_col: str | None,
    key: list[str] | None = None,
):
    """Return the analytic WindowSpec for a sliding maker.

    The reference's sliding windows are *forward-looking* from each event
    (``FunctionalProcessing.hs:93-108``); the analytic convention is
    backward-looking. Both are exposed; aggregate columns are applied
    ``.over()`` this spec.
    """
    key = key or []
    if isinstance(maker, Sliding):
        w = W.partitionBy(*key).orderBy(*_ordering(time_col, seq_col))
        return w.rowsBetween(-(maker.n - 1), 0)
    if isinstance(maker, SlidingTime):
        if time_col is None:
            raise ValueError("SlidingTime requires a time column")
        micros = maker.ms * 1000
        w = W.partitionBy(*key).orderBy(F.unix_micros(F.col(time_col)))
        if maker.backward:
            return w.rangeBetween(-micros, 0)
        return w.rangeBetween(0, micros)
    raise TypeError(f"{maker} is a tumbling maker; use assign_window_id()")


def is_sliding(maker: WindowMaker) -> bool:
    return isinstance(maker, (Sliding, SlidingTime))


def window_skeleton(df: DataFrame, maker: ChopTime, time_col: str):
    """Generate the full window-id range so empty windows can be emitted
    via left join (reference emits empty windows: FunctionalProcessing.hs:86,
    examples/wearable/WearableStreams.hs:70-75)."""
    dur_ms = _gap_ms(maker.duration)
    bounds = df.select(
        F.min(F.col(time_col)).alias("lo"), F.max(F.col(time_col)).alias("hi")
    )
    return (
        bounds.select(
            F.explode(
                F.sequence(
                    (F.unix_micros(F.col("lo")) / (dur_ms * 1000)).cast("long"),
                    (F.unix_micros(F.col("hi")) / (dur_ms * 1000)).cast("long"),
                )
            ).alias("bucket")
        )
        .select((F.col("bucket") * dur_ms / 1000).cast("long").alias(WINDOW_ID))
    )
