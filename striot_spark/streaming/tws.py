"""transformWithStateInPandas lowerings for the stateful operators.

Spark 4 deprecates ``applyInPandasWithState`` in favor of the
``transformWithStateInPandas`` (TWS) API — named by SURVEY.md §2.1 as the
target lowering for streamScan / streamFilterAcc
(reference: ``src/Striot/FunctionalProcessing.hs:188-191``). TWS adds:

- named state variables (value/list/map) instead of one packed tuple;
- per-state **TTL** (``ttlDurationMs``) — expiring abandoned keys is
  something the old API could only approximate with a coarse
  ``GroupStateTimeout`` over the whole group;
- processing-/event-time timers (``handleExpiredTimer``) for timeout
  emission patterns;
- state-schema evolution across restarts.

Runtime requirement: TWS runs a Python state-server protocol encoded
with protobuf, so the worker needs the ``protobuf`` package (and a
RocksDB state store provider). This container ships neither protobuf
nor a network route to fetch it, so :func:`tws_available` gates the
dispatch: the operators in ``runtime.py`` accept ``api="auto"`` and
pick TWS when the platform supports it, else the legacy (still
shipped, still supported) ``applyInPandasWithState`` lowering. The
processor classes below are plain objects — their ordering and
accumulator semantics are pinned by direct unit tests with a fake
handle (``tests/test_tws.py``), and the engine-backed parity tests
run wherever protobuf exists (skipped here, in CI markers).

Semantics parity (identical to the legacy lowering, which is the
batch-checked oracle):
- events within a micro-batch are processed in event-time order
  (chunked per-key input is concatenated then sorted ONCE — a
  per-chunk sort would only order within chunks);
- streamFilterAcc's predicate sees the accumulator *before* this
  event's update (``FunctionalProcessing.hs:181-185``);
- cross-batch order is arrival order — the reference's
  distributed-merge guarantee (``Nodes/TCP.hs:52-59``).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame

try:  # the abstract base needs nothing exotic; import is cheap
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover - pyspark<4 fallback
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = Any  # type: ignore[assignment,misc]


def tws_available() -> bool:
    """True when the runtime can execute transformWithStateInPandas:
    the TWS Python state server speaks protobuf to the JVM."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# -- processors ---------------------------------------------------------------


class ScanProcessor(StatefulProcessor):
    """streamScan (running fold) as a TWS stateful processor.

    One named value-state ``acc`` per key, schema ``state_type``;
    emits ``carry`` columns + ``out_field`` = accumulator *after* each
    event's update (scan-left semantics,
    ``FunctionalProcessing.hs:188-191``).
    """

    def __init__(
        self,
        step: Callable[[Any, dict], Any],
        init: Any,
        out_field: str,
        carry: Sequence[str],
        time_col: str,
        state_type: str,
        ttl_ms: int | None = None,
        tiebreak: str | None = None,
    ) -> None:
        self._step = step
        self._init = init
        self._out_field = out_field
        self._carry = list(carry)
        self._sort_cols = (
            [time_col] if tiebreak is None else [time_col, tiebreak]
        )
        self._state_type = state_type
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._acc = handle.getValueState(
            "acc", self._state_type, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        acc = self._acc.get()[0] if self._acc.exists() else self._init
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(
                self._sort_cols, kind="mergesort"
            )
            out = []
            for row in pdf.to_dict("records"):
                acc = self._step(acc, row)
                out.append(acc)
            res = pdf[self._carry].copy()
            res[self._out_field] = out
            yield res
        self._acc.update((acc,))

    def close(self) -> None:
        pass


class FilterAccProcessor(StatefulProcessor):
    """streamFilterAcc as a TWS stateful processor.

    Exact reference semantics (``FunctionalProcessing.hs:181-185``):
    the predicate sees the accumulator *before* this event's update;
    the accumulator updates on every event, kept or not. State is a
    tuple matching ``state_type``'s fields.
    """

    def __init__(
        self,
        step: Callable[[Any, dict], Any],
        init: tuple,
        pred: Callable[[dict, Any], bool],
        time_col: str,
        state_type: str,
        ttl_ms: int | None = None,
        tiebreak: str | None = None,
    ) -> None:
        self._step = step
        self._init = tuple(init)
        self._pred = pred
        self._sort_cols = (
            [time_col] if tiebreak is None else [time_col, tiebreak]
        )
        self._state_type = state_type
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._acc = handle.getValueState(
            "acc", self._state_type, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        acc = tuple(self._acc.get()) if self._acc.exists() else self._init
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(
                self._sort_cols, kind="mergesort"
            )
            keep = []
            for row in pdf.to_dict("records"):
                keep.append(bool(self._pred(row, acc)))
                acc = tuple(self._step(acc, row))
            yield pdf[pd.Series(keep, index=pdf.index)]
        self._acc.update(acc)

    def close(self) -> None:
        pass


class SlidingCountProcessor(StatefulProcessor):
    """Count-based sliding window (reference ``sliding n``,
    ``FunctionalProcessing.hs:93-97``) as a TWS processor: per-key
    bounded buffer of the previous n-1 values in a list-typed value
    state; every event emits ``agg`` over its trailing window."""

    def __init__(
        self,
        n: int,
        value_col: str,
        agg: Callable[[list], Any],
        out_field: str,
        carry: Sequence[str],
        sort_cols: Sequence[str],
        ttl_ms: int | None = None,
    ) -> None:
        self._n = n
        self._value_col = value_col
        self._agg = agg
        self._out_field = out_field
        self._carry = list(carry)
        self._sort_cols = list(sort_cols)
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._buf = handle.getValueState(
            "buf", "buf array<double>", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        n = self._n
        buf = list(self._buf.get()[0]) if self._buf.exists() else []
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(self._sort_cols, kind="mergesort")
            out = []
            for v in pdf[self._value_col].tolist():
                out.append(self._agg(buf[-(n - 1):] + [v] if n > 1 else [v]))
                buf = (buf + [v])[-(n - 1):] if n > 1 else []
            res = pdf[self._carry].copy()
            res[self._out_field] = out
            yield res
        self._buf.update((buf,))

    def close(self) -> None:
        pass


# -- DataFrame-level lowerings ------------------------------------------------


def _ensure_rocksdb(sdf: DataFrame) -> None:
    """TWS requires the RocksDB state store provider; set it on the
    session if the default (HDFS-backed) provider is still active.
    Safe at runtime: the provider conf is read at query start."""
    spark = sdf.sparkSession
    k = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    if spark.conf.get(k, "") != rocks:
        spark.conf.set(k, rocks)


def scan_stream_tws(
    sdf: DataFrame,
    step: Callable[[Any, dict], Any],
    init: Any,
    out_field: str,
    out_type: str,
    key: Sequence[str],
    time_col: str,
    state_type: str = "acc double",
    ttl_ms: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """streamScan on the TWS API — signature-compatible with
    ``runtime.scan_stream`` plus ``ttl_ms`` (per-key state expiry the
    legacy API cannot express per state variable)."""
    key = list(key)
    carry = [*key, time_col]
    fields = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out_schema = ", ".join(
        [f"`{c}` {fields[c]}" for c in carry] + [f"`{out_field}` {out_type}"]
    )
    _ensure_rocksdb(sdf)
    proc = ScanProcessor(
        step, init, out_field, carry, time_col, state_type, ttl_ms, tiebreak
    )
    return sdf.groupBy(*key).transformWithStateInPandas(
        proc,
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )


def filter_acc_stream_tws(
    sdf: DataFrame,
    step: Callable[[Any, dict], Any],
    init: tuple,
    pred: Callable[[dict, Any], bool],
    key: Sequence[str],
    time_col: str,
    state_type: str = "acc double",
    ttl_ms: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """streamFilterAcc on the TWS API — signature-compatible with
    ``runtime.filter_acc_stream`` plus ``ttl_ms``."""
    key = list(key)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sdf.schema.fields
    )
    _ensure_rocksdb(sdf)
    proc = FilterAccProcessor(
        step, init, pred, time_col, state_type, ttl_ms, tiebreak
    )
    return sdf.groupBy(*key).transformWithStateInPandas(
        proc,
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )


def sliding_count_stream_tws(
    sdf: DataFrame,
    n: int,
    value_col: str,
    agg: Callable[[list], Any],
    key: Sequence[str],
    time_col: str,
    out_field: str = "agg",
    out_type: str = "double",
    tiebreak: str | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """sliding n on the TWS API — signature-compatible with
    ``runtime.sliding_count_stream`` plus ``ttl_ms``."""
    key = list(key)
    carry = [*key, time_col]
    fields = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out_schema = ", ".join(
        [f"`{c}` {fields[c]}" for c in carry] + [f"`{out_field}` {out_type}"]
    )
    sort_cols = [time_col] if tiebreak is None else [time_col, tiebreak]
    _ensure_rocksdb(sdf)
    proc = SlidingCountProcessor(
        n, value_col, agg, out_field, carry, sort_cols, ttl_ms
    )
    return sdf.groupBy(*key).transformWithStateInPandas(
        proc,
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
