"""transformWithStateInPandas lowering tests.

The TWS engine path needs protobuf (Python state server) which this
container lacks, so the tests split into:

1. fake-handle unit tests — drive the StatefulProcessor classes
   directly with pandas frames and a dict-backed state, asserting the
   exact semantics the batch lowerings define (ordering across chunked
   input, pre-update filterAcc predicate, cross-batch state carry,
   TTL plumbing). These always run.
2. engine-backed parity tests — the real streaming query on the TWS
   API; skipped unless ``tws_available()``.
3. dispatch tests — ``api="auto"`` must select the legacy lowering
   here (no protobuf) and still produce the batch-parity result
   (covered by test_streaming.py), and ``api="tws"`` must build a
   plan against the TWS API without touching the legacy path.
"""

from __future__ import annotations

import pandas as pd
import pytest

from striot_spark.streaming import tws as T


class FakeValueState:
    def __init__(self, store: dict, name: str):
        self._store = store
        self._name = name

    def exists(self) -> bool:
        return self._name in self._store

    def get(self):
        return self._store[self._name]

    def update(self, v):
        self._store[self._name] = tuple(v)

    def clear(self):
        self._store.pop(self._name, None)


class FakeHandle:
    """Stands in for StatefulProcessorHandle: per-key dict store plus a
    record of (name, schema, ttl) registrations."""

    def __init__(self, store: dict):
        self._store = store
        self.registered: list[tuple] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.registered.append((name, schema, ttlDurationMs))
        return FakeValueState(self._store, name)


def _frames(rows, columns, split_at):
    """Build a chunked per-key batch (Spark chunks large groups)."""
    pdf = pd.DataFrame(rows, columns=columns)
    return iter([pdf.iloc[:split_at], pdf.iloc[split_at:]])


def test_scan_processor_orders_across_chunks_and_carries_state():
    proc = T.ScanProcessor(
        step=lambda acc, row: acc + row["v"],
        init=0.0,
        out_field="running",
        carry=["k", "ts"],
        time_col="ts",
        state_type="acc double",
    )
    store: dict = {}
    proc.init(FakeHandle(store))
    # batch 1: rows arrive out of event-time order, split across chunks
    rows = [("a", 3, 30.0), ("a", 1, 10.0), ("a", 2, 20.0)]
    out = pd.concat(
        proc.handleInputRows(("a",), _frames(rows, ["k", "ts", "v"], 2), None)
    )
    # sorted by ts then folded: 10, 30, 60
    assert out.sort_values("ts")["running"].tolist() == [10.0, 30.0, 60.0]
    assert store["acc"] == (60.0,)
    # batch 2: accumulator carries across micro-batches
    out2 = pd.concat(
        proc.handleInputRows(
            ("a",), _frames([("a", 4, 1.0)], ["k", "ts", "v"], 1), None
        )
    )
    assert out2["running"].tolist() == [61.0]
    assert store["acc"] == (61.0,)


def test_filter_acc_processor_pred_sees_pre_update_acc():
    """FunctionalProcessing.hs:181-185 — predicate sees the accumulator
    BEFORE this event's update; acc updates on every event kept or not."""
    proc = T.FilterAccProcessor(
        step=lambda acc, row: (row["v"],),
        init=(None,),
        pred=lambda row, acc: acc[0] is None or row["v"] != acc[0],
        time_col="ts",
        state_type="prev string",
    )
    store: dict = {}
    proc.init(FakeHandle(store))
    rows = [("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y"), ("a", 4, "y")]
    out = pd.concat(
        proc.handleInputRows(("a",), _frames(rows, ["k", "ts", "v"], 2), None)
    )
    # dedup-on-change: keep ts 1 (first) and 3 (change), drop 2 and 4
    assert out["ts"].tolist() == [1, 3]
    assert store["acc"] == ("y",)
    # next batch: the same value as the carried state is suppressed
    out2 = list(
        proc.handleInputRows(
            ("a",), _frames([("a", 5, "y")], ["k", "ts", "v"], 1), None
        )
    )
    assert sum(len(p) for p in out2) == 0


def test_sliding_count_processor_buffer_semantics():
    proc = T.SlidingCountProcessor(
        n=3,
        value_col="v",
        agg=lambda xs: float(sum(xs)),
        out_field="sum3",
        carry=["k", "ts"],
        sort_cols=["ts"],
    )
    store: dict = {}
    proc.init(FakeHandle(store))
    rows = [("a", i, float(i)) for i in range(1, 6)]  # v = 1..5
    out = pd.concat(
        proc.handleInputRows(("a",), _frames(rows, ["k", "ts", "v"], 3), None)
    )
    assert out.sort_values("ts")["sum3"].tolist() == [1.0, 3.0, 6.0, 9.0, 12.0]
    # state buffer holds the last n-1 values
    assert list(store["buf"][0]) == [4.0, 5.0]
    # carried into the next batch
    out2 = pd.concat(
        proc.handleInputRows(
            ("a",), _frames([("a", 6, 6.0)], ["k", "ts", "v"], 1), None
        )
    )
    assert out2["sum3"].tolist() == [15.0]


def test_ttl_plumbing_reaches_state_registration():
    """ttl_ms must flow into getValueState(ttlDurationMs=...) — the
    capability the legacy applyInPandasWithState API cannot express
    per state variable."""
    proc = T.ScanProcessor(
        step=lambda a, r: a,
        init=0.0,
        out_field="o",
        carry=["k"],
        time_col="ts",
        state_type="acc double",
        ttl_ms=3_600_000,
    )
    h = FakeHandle({})
    proc.init(h)
    assert h.registered == [("acc", "acc double", 3_600_000)]
    proc2 = T.FilterAccProcessor(
        step=lambda a, r: a,
        init=(None,),
        pred=lambda r, a: True,
        time_col="ts",
        state_type="prev string",
        ttl_ms=500,
    )
    h2 = FakeHandle({})
    proc2.init(h2)
    assert h2.registered == [("acc", "prev string", 500)]


def test_auto_dispatch_always_selects_legacy(spark):
    """api='auto' resolves to the legacy lowering UNCONDITIONALLY —
    TWS is experimental opt-in (api='tws') until its engine parity test
    (test_scan_stream_tws_matches_batch) has run on a protobuf-equipped
    image (VERDICT r03). This must hold even where protobuf exists, so
    the assertion is not tws_available()-conditional."""
    from striot_spark.streaming.runtime import _resolve_api

    assert _resolve_api("auto") == "legacy"
    assert _resolve_api("legacy") == "legacy"
    assert _resolve_api("tws") == "tws"  # explicit opt-in still builds
    with pytest.raises(ValueError):
        _resolve_api("nonsense")


def test_forced_tws_builds_unresolved_plan(spark, tmp_path):
    """api='tws' must construct the TWS plan (GroupedData.
    transformWithStateInPandas) — plan construction is pure metadata and
    works without protobuf; only execution needs the state server."""
    from striot_spark.streaming import runtime as RT

    src = tmp_path / "src"
    df = spark.createDataFrame(
        [(1, 1.0, 1)], "k int, v double, ts long"
    )
    df.write.parquet(str(src))
    sdf = spark.readStream.schema(df.schema).parquet(str(src))
    out = RT.scan_stream(
        sdf,
        step=lambda acc, row: acc + row["v"],
        init=0.0,
        out_field="running",
        out_type="double",
        key=["k"],
        time_col="ts",
        api="tws",
    )
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["k", "ts", "running"]
    # the session was switched to the RocksDB provider TWS requires
    assert "RocksDB" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )


@pytest.mark.skipif(
    not T.tws_available(), reason="protobuf not installed: TWS engine path"
)
def test_scan_stream_tws_matches_batch(spark, tmp_path):  # pragma: no cover
    """Engine-backed parity — runs wherever protobuf exists."""
    from striot_spark.streaming import runtime as RT

    src, ck = tmp_path / "src", str(tmp_path / "ck")
    df = spark.createDataFrame(
        [(i % 3, float(i), i) for i in range(30)], "k int, v double, ts long"
    )
    df.repartition(2).write.parquet(str(src))
    sdf = spark.readStream.schema(df.schema).parquet(str(src))
    out = RT.scan_stream(
        sdf,
        step=lambda acc, row: acc + row["v"],
        init=0.0,
        out_field="running",
        out_type="double",
        key=["k"],
        time_col="ts",
        api="tws",
    )
    got = RT.run_available_now(out, "tws_scan_out", ck, mode="append")
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    batch = df.withColumn(
        "running", F.sum("v").over(W.partitionBy("k").orderBy("ts"))
    )
    assert sorted(
        (r["k"], r["ts"], r["running"]) for r in got.collect()
    ) == sorted((r["k"], r["ts"], r["running"]) for r in batch.collect())
