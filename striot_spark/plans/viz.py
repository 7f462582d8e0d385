"""GraphViz rendering of op chains and annotated pipelines.

Reference parity: ``src/Striot/VizGraph.hs:streamGraphToDot`` renders a
StreamGraph to dot, optionally styled with Jackson utilisation /
bandwidth annotations (``jacksonGraphToDot``, ``bandwidthStyle``).
Here the chain IR (``plans/graph.py``) plays the StreamGraph role, and
the advisory annotations come from ``cost/jackson.py`` — rendering is
string assembly only (no graphviz binary required; pipe the output to
``dot -Tpng`` wherever one exists).
"""

from __future__ import annotations

from striot_spark.plans.graph import (
    Chain,
    ExpandOp,
    FilterAccOp,
    FilterOp,
    MapOp,
    Op,
    ScanOp,
)


def _label(op: Op) -> str:
    if isinstance(op, MapOp):
        return "streamMap"
    if isinstance(op, FilterOp):
        return f"streamFilter\\nsel={op.selectivity:g}"
    if isinstance(op, ExpandOp):
        return "streamExpand"
    if isinstance(op, ScanOp):
        return "streamScan"
    if isinstance(op, FilterAccOp):
        return f"streamFilterAcc\\nsel={op.selectivity:g}"
    return type(op).__name__


def chain_to_dot(
    chain: Chain,
    name: str = "striot",
    utilisations: list[float] | None = None,
) -> str:
    """Render an op chain as a GraphViz digraph: Source → ops → Sink
    (the reference's ``streamGraphToDot`` shape, ``VizGraph.hs``).

    ``utilisations`` (one per op, e.g. from ``cost/jackson.py``) adds
    the Jackson-style annotation: the utilisation value in the label
    and a red outline where ρ >= 1 (an unstable node) — the
    ``jacksonStyle`` analogue.
    """
    lines = [
        f"digraph {name} {{",
        "  rankdir=LR;",
        '  node [shape=box, fontname="monospace"];',
        '  n0 [label="Source", shape=ellipse];',
    ]
    for i, op in enumerate(chain, start=1):
        label = _label(op)
        style = ""
        if utilisations is not None and i - 1 < len(utilisations):
            rho = utilisations[i - 1]
            label += f"\\nrho={rho:.3g}"
            if rho >= 1.0:
                style = ', color=red, penwidth=2'
        lines.append(f'  n{i} [label="{label}"{style}];')
    sink = len(chain) + 1
    lines.append(f'  n{sink} [label="Sink", shape=ellipse];')
    for i in range(sink):
        lines.append(f"  n{i} -> n{i + 1};")
    lines.append("}")
    return "\n".join(lines)
