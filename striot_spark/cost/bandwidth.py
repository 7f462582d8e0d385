"""Bandwidth cost model: departure rates and egress bytes per stream-graph
vertex (advisory module, companion to ``cost/jackson.py``).

Reference parity (``src/Striot/Bandwidth.hs``):

- ``departRate`` (``Bandwidth.hs:99-122``): recursive departure rate per
  vertex — sources emit their declared rate, merge sums its parents, join
  takes the parents' min, filter/filterAcc scale by selectivity, a
  chopTime window emits ``1/seconds`` (one window event per period), and
  everything else passes its parent's rate through.
- ``chopSize`` (``Bandwidth.hs:131-141``): payload bytes of a chopTime
  window event = events-per-window x parent event size.
- ``whatBandwidth`` / ``whatBandwidthWeighted`` (``Bandwidth.hs:144-168``):
  egress bytes/s of a vertex, the weighted form adding the reference's
  60-byte TCP/IP per-event overhead.
- ``connectedToSources`` / ``overBandwidthLimit``
  (``Bandwidth.hs:170-199``): does any edge leaving the source-connected
  partitions of a deployment plan exceed a bandwidth limit?

Event sizes: the reference measures on-wire sizes by running its Haskell
``Store`` serializer over sample events (``Bandwidth.hs:46-74``) and
notes "longer term we should accept user-provided event sizes" — its own
test suite pins departure *rates*, never bytes. This port therefore takes
the size table as data: ``KNOWN_EVENT_SIZES`` reproduces the reference's
table shape (type name -> bytes: 16-byte stream-frame header + 1-byte
payload-presence tag + 17-byte timestamp option + payload) and callers
override per deployment, which is the reference's stated long-term
design. All reference-asserted numbers (``test_departRate_*``,
``test_connectedToSources*``, ``test_overBandwidthLimit``) are
reproduced in ``tests/test_bandwidth.py``.

On Spark, this model reads as: source rate = ingest events/s,
"partition" = the executor group running a stage, and the egress check
flags a stream whose shuffle/sink write rate would exceed a link budget.
Spark owns actual placement (SURVEY.md §4.3); this stays advisory.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Frame header (magic + length) + Maybe tags + timestamp, mirroring the
# reference's Store-encoded Event framing; payload bytes per base type.
_FRAME = 16 + 1 + 17 + 1

KNOWN_EVENT_SIZES: dict[str, int] = {
    "Int": _FRAME + 8,
    "Double": _FRAME + 8,
    "Char": _FRAME + 4,
    "String1": _FRAME + 8 + 1,
    "String2": _FRAME + 8 + 2,
    "String3": _FRAME + 8 + 3,
    "(Int,Int,Int)": _FRAME + 24,
    "PebbleMode60": _FRAME + 32,
}

TCP_OVERHEAD_BYTES = 60.0  # per-event wire weighting, Bandwidth.hs:166-168


@dataclass(frozen=True)
class BVertex:
    """One stream-graph vertex for the bandwidth model.

    ``op``: source | map | expand | filter | filteracc | merge | join |
    window | scan | sink.  ``rate``: declared events/s (sources only).
    ``selectivity``: pass fraction (filter/filteracc). ``chop_ms``: the
    chopTime period in milliseconds (window vertices; None = count-based
    window, which passes its parent rate through, Bandwidth.hs:117-121).
    ``out_type``: key into the event-size table.
    """

    vid: int
    op: str
    out_type: str = "Int"
    rate: float = 0.0
    selectivity: float = 1.0
    chop_ms: int | None = None


@dataclass(frozen=True)
class BGraph:
    vertices: tuple[BVertex, ...]
    edges: tuple[tuple[int, int], ...]  # (parent vid, child vid)
    sizes: dict[str, int] = field(
        default_factory=lambda: dict(KNOWN_EVENT_SIZES)
    )

    def vertex(self, vid: int) -> BVertex:
        for v in self.vertices:
            if v.vid == vid:
                return v
        raise KeyError(vid)

    def parents_of(self, vid: int) -> list[int]:
        return [p for p, c in self.edges if c == vid]


def depart_rate(g: BGraph, vid: int) -> float:
    """Events/s leaving vertex ``vid`` (Bandwidth.hs:99-122)."""
    v = g.vertex(vid)
    ps = g.parents_of(vid)
    if v.op == "source":
        return v.rate
    if v.op == "merge":
        return sum(depart_rate(g, p) for p in ps)
    if v.op == "join":
        # positional zip: the slower side gates the pair rate
        return min(depart_rate(g, ps[0]), depart_rate(g, ps[-1]))
    if v.op in ("filter", "filteracc"):
        return v.selectivity * depart_rate(g, ps[0])
    if v.op == "window" and v.chop_ms is not None:
        return 1.0 / (v.chop_ms / 1000.0)  # one event per chopTime period
    return depart_rate(g, ps[0])


def chop_size(g: BGraph, vid: int, ms: int) -> float | None:
    """Payload bytes of one chopTime window event: events-per-window x
    parent event size (Bandwidth.hs:131-141; like the reference, list
    serialization overhead is not modeled)."""
    pid = g.parents_of(vid)[0]
    psize = g.sizes.get(g.vertex(pid).out_type)
    if psize is None:
        return None
    prate = depart_rate(g, pid)
    events_in_window = (ms / 1000.0) * prate
    return events_in_window * float(psize)


def what_bandwidth(g: BGraph, vid: int) -> float | None:
    """Egress bytes/s of vertex ``vid`` (Bandwidth.hs:144-156)."""
    v = g.vertex(vid)
    out_rate = depart_rate(g, vid)
    if v.op == "window" and v.chop_ms is not None:
        out_size = chop_size(g, vid, v.chop_ms)
    else:
        s = g.sizes.get(v.out_type)
        out_size = float(s) if s is not None else None
    return None if out_size is None else out_size * out_rate


def what_bandwidth_weighted(g: BGraph, vid: int) -> float | None:
    """``whatBandwidth`` plus the 60-byte/event TCP/IP weighting
    (Bandwidth.hs:164-168)."""
    bw = what_bandwidth(g, vid)
    if bw is None:
        return None
    return bw + depart_rate(g, vid) * TCP_OVERHEAD_BYTES


def connected_to_sources(
    sources: list[int], partition_map: list[list[int]]
) -> list[int]:
    """Flatten the partitions that contain a source vertex
    (Bandwidth.hs:191-195)."""
    return [
        vid
        for part in partition_map
        if any(s in part for s in sources)
        for vid in part
    ]


def over_bandwidth_limit(
    g: BGraph, partition_map: list[list[int]], limit: float
) -> bool:
    """True iff any edge leaving a source-connected partition exceeds
    ``limit`` bytes/s weighted (Bandwidth.hs:176-188). Unknown event
    sizes are skipped, like the reference's ``mapMaybe``."""
    source_ids = [v.vid for v in g.vertices if v.op == "source"]
    connected = set(connected_to_sources(source_ids, partition_map))
    for p, c in g.edges:
        if p in connected and c not in connected:
            bw = what_bandwidth_weighted(g, p)
            if bw is not None and bw > limit:
                return True
    return False
