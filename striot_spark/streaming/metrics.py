"""Per-node metrics parity: the reference's Prometheus surface on Spark.

Reference parity: every deployed StrIoT node starts a Prometheus
registry labeled ``node=<name>`` with six series — ingress/egress
connection gauges and bytes/events counters — served at
``:8080/metrics`` (``src/Striot/Nodes.hs:322-338``). On Spark the
"node" is a streaming query (one deployed operator partition ≅ one
query), and the engine already meters every micro-batch; this module
adapts that telemetry to the reference's exposition instead of
hand-counting events on the hot path:

- ``striot_ingress_connection`` (gauge): 1 while the query runs —
  query started/terminated lifecycle.
- ``striot_ingress_events_total`` (counter): cumulative
  ``numInputRows`` over all progress events.
- ``striot_egress_events_total`` (counter): cumulative sink
  ``numOutputRows``.
- ``striot_egress_connection`` (gauge): mirrors ingress (a Spark sink
  has no standing connection; kept for series-name parity).
- ``striot_ingress_bytes_total`` / ``striot_egress_bytes_total``
  (counters): Spark's progress reports rows, not bytes, for most
  sources; populated from an optional per-query ``bytes_per_event``
  estimate (``cost/bandwidth.py``'s event-size table is the natural
  source), else 0 — the honest value, not a fake.
- plus ``striot_state_rows`` (gauge): stateful-operator rows — the
  metric the reference cannot report (its state is an opaque lazy
  list) and the first one to watch on an unbounded feed.

The exposition is the Prometheus text format, served by a stdlib
daemon-thread HTTP server (``serve()``, default port 8080 like the
reference) or scraped directly via ``exposition()``. No external
dependencies; listener callbacks arrive on Spark's listener-bus thread,
so all state sits behind one lock.
"""

from __future__ import annotations

import threading

try:  # pyspark >= 3.4
    from pyspark.sql.streaming.listener import StreamingQueryListener
except ImportError:  # pragma: no cover - older pyspark
    StreamingQueryListener = object  # type: ignore[assignment,misc]


class PrometheusMetrics(StreamingQueryListener):
    """StreamingQueryListener → reference-shaped Prometheus series.

    Attach once per session (``spark.streams.addListener(m)``); every
    streaming query becomes a ``node`` label, named queries by name,
    anonymous ones by query id.
    """

    def __init__(self, bytes_per_event: dict[str, float] | None = None):
        self._lock = threading.Lock()
        self._nodes: dict[str, dict[str, float]] = {}
        self._names: dict[str, str] = {}  # query id -> node label
        self._bytes_per_event = dict(bytes_per_event or {})
        self._server = None

    # -- listener callbacks (Spark listener-bus thread) ----------------------

    def _node(self, node: str) -> dict[str, float]:
        return self._nodes.setdefault(
            node,
            {
                "striot_ingress_connection": 0.0,
                "striot_ingress_bytes_total": 0.0,
                "striot_ingress_events_total": 0.0,
                "striot_egress_connection": 0.0,
                "striot_egress_bytes_total": 0.0,
                "striot_egress_events_total": 0.0,
                "striot_state_rows": 0.0,
            },
        )

    def onQueryStarted(self, event) -> None:
        with self._lock:
            node = event.name or str(event.id)
            self._names[str(event.id)] = node
            m = self._node(node)
            m["striot_ingress_connection"] = 1.0
            m["striot_egress_connection"] = 1.0

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            node = self._names.get(str(p.id)) or p.name or str(p.id)
            m = self._node(node)
            n_in = float(p.numInputRows or 0)
            n_out = float(
                p.sink.numOutputRows
                if p.sink is not None and p.sink.numOutputRows is not None
                and p.sink.numOutputRows >= 0
                else 0
            )
            m["striot_ingress_events_total"] += n_in
            m["striot_egress_events_total"] += n_out
            bpe = self._bytes_per_event.get(node)
            if bpe is not None:
                m["striot_ingress_bytes_total"] += n_in * bpe
                m["striot_egress_bytes_total"] += n_out * bpe
            m["striot_state_rows"] = float(
                sum(s.numRowsTotal or 0 for s in (p.stateOperators or []))
            )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            node = self._names.get(str(event.id), str(event.id))
            m = self._node(node)
            m["striot_ingress_connection"] = 0.0
            m["striot_egress_connection"] = 0.0

    # -- exposition ----------------------------------------------------------

    _TYPES = {
        "striot_ingress_connection": "gauge",
        "striot_ingress_bytes_total": "counter",
        "striot_ingress_events_total": "counter",
        "striot_egress_connection": "gauge",
        "striot_egress_bytes_total": "counter",
        "striot_egress_events_total": "counter",
        "striot_state_rows": "gauge",
    }

    @staticmethod
    def _escape_label(value: str) -> str:
        """Escape a label value per the text-format spec: backslash,
        double-quote, and line-feed must be escaped or the exposition
        is invalid and scrapers reject the whole page."""
        return (
            value.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
        )

    def exposition(self) -> str:
        """Prometheus text exposition format 0.0.4 — the exact series
        names and ``node`` label of ``startPrometheus``
        (``Nodes.hs:324-338``)."""
        with self._lock:
            lines: list[str] = []
            for series, typ in self._TYPES.items():
                lines.append(f"# TYPE {series} {typ}")
                for node in sorted(self._nodes):
                    v = self._nodes[node][series]
                    val = repr(v) if v != int(v) else str(int(v))
                    label = self._escape_label(node)
                    lines.append(f'{series}{{node="{label}"}} {val}')
            return "\n".join(lines) + "\n"

    def sample(self, node: str) -> dict[str, float]:
        """Current values for one node (test/introspection surface)."""
        with self._lock:
            return dict(self._nodes.get(node, {}))

    # -- stdlib /metrics server (serveMetrics parity) ------------------------

    def serve(self, port: int = 8080):
        """Serve ``/metrics`` on a daemon thread (``serveMetrics 8080``,
        ``Nodes.hs:331``). Returns the bound port (pass ``port=0`` for
        an ephemeral one in tests). One server per instance: call
        ``shutdown()`` before re-serving, else the first bound port and
        its thread would leak."""
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        if self._server is not None:
            raise RuntimeError(
                "metrics server already running on port "
                f"{self._server.server_address[1]}; call shutdown() first"
            )

        metrics = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - http.server API
                if self.path.rstrip("/") not in ("", "/metrics"):
                    self.send_error(404)
                    return
                body = metrics.exposition().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # keep the test output quiet
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self._server.server_address[1]

    def shutdown(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server = None
