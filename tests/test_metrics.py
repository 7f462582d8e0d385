"""Prometheus metrics parity (``src/Striot/Nodes.hs:322-338``): the
reference's per-node series populated from Spark's own streaming
telemetry, exposed in Prometheus text format over stdlib HTTP."""

from __future__ import annotations

import time
import urllib.request

import pytest
from pyspark.sql import functions as F

from striot_spark.sources.batch import load_table
from striot_spark.streaming import runtime as RT
from striot_spark.streaming.metrics import PrometheusMetrics


def test_listener_populates_reference_series(spark, sf_dir, tmp_path):
    m = PrometheusMetrics()
    spark.streams.addListener(m)
    try:
        events = load_table(spark, sf_dir, "events")
        src = tmp_path / "src"
        events.limit(200).repartition(2).write.parquet(str(src))
        sdf = spark.readStream.schema(events.schema).parquet(str(src))
        agg = RT.window_agg_stream(
            sdf, "ts", "1 day", {"n": F.count(F.lit(1))}, watermark="1 minute"
        )
        got = RT.run_available_now(
            agg, "metrics_probe", str(tmp_path / "ck"), mode="complete"
        )
        assert got.count() > 0
        # listener bus is async — give it a moment to drain
        for _ in range(50):
            if m.sample("metrics_probe").get(
                "striot_ingress_events_total", 0
            ):
                break
            time.sleep(0.1)
        s = m.sample("metrics_probe")
        assert s["striot_ingress_events_total"] == 200.0
        assert s["striot_egress_events_total"] > 0
        assert s["striot_state_rows"] > 0  # the metric the reference lacks
        # terminated (availableNow drained) -> connection gauge back to 0
        for _ in range(50):
            if m.sample("metrics_probe")["striot_ingress_connection"] == 0:
                break
            time.sleep(0.1)
        assert m.sample("metrics_probe")["striot_ingress_connection"] == 0.0
    finally:
        spark.streams.removeListener(m)


def test_exposition_format_and_http_server():
    m = PrometheusMetrics(bytes_per_event={"n1": 43.0})
    # simulate a node lifecycle without Spark (unit surface)
    class _Started:
        id, name = "q-1", "n1"

    class _Sink:
        numOutputRows = 7

    class _State:
        numRowsTotal = 3

    class _Progress:
        id, name = "q-1", "n1"
        numInputRows = 10
        sink = _Sink()
        stateOperators = [_State()]

    class _ProgressEvent:
        progress = _Progress()

    m.onQueryStarted(_Started())
    m.onQueryProgress(_ProgressEvent())
    text = m.exposition()
    assert '# TYPE striot_ingress_events_total counter' in text
    assert 'striot_ingress_events_total{node="n1"} 10' in text
    assert 'striot_egress_events_total{node="n1"} 7' in text
    assert 'striot_ingress_bytes_total{node="n1"} 430' in text
    assert 'striot_ingress_connection{node="n1"} 1' in text
    assert 'striot_state_rows{node="n1"} 3' in text
    port = m.serve(port=0)
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=5
        ).read().decode()
        assert body == text
        # one server per instance: a second serve() would leak the
        # first port/thread, so it must refuse until shutdown()
        with pytest.raises(RuntimeError, match="already running"):
            m.serve(port=0)
    finally:
        m.shutdown()
    # after shutdown, serving again is allowed
    port2 = m.serve(port=0)
    assert port2
    m.shutdown()


def test_exposition_escapes_label_values():
    """Text-format spec: backslash, double-quote, and newline in a
    label value must be escaped or scrapers reject the whole page."""
    m = PrometheusMetrics()

    class _Started:
        id = "q-2"
        name = 'we"ird\\node\nname'

    m.onQueryStarted(_Started())
    text = m.exposition()
    assert 'node="we\\"ird\\\\node\\nname"' in text
    # the raw newline never reaches the page: every line is a comment
    # or a complete `series{...} value` sample
    for line in text.splitlines():
        if not line.startswith("#"):
            assert line.startswith("striot_")
            float(line.rsplit(" ", 1)[1])  # parses as a sample value
