"""Lowering the op-chain IR onto a Stream: optimize → fuse → ONE
applyInPandas stage.

Without this layer, a chain like ``filter → filterAcc → map → scan``
with opaque Python callables would lower to multiple applyInPandas
stages, each a shuffle + Arrow round-trip. After ``rewrite.optimize``
and ``graph.compile_fused`` it executes as a single per-key pass.
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from striot_spark.operators.stateful import BUCKET, _bucketed, _per_key_groups
from striot_spark.plans.graph import Op, compile_fused
from striot_spark.plans.rewrite import optimize


def apply_chain(
    df: DataFrame,
    ops: Iterable[Op],
    value_col: str,
    out_type: str,
    time_col: str | None,
    seq_col: str | None,
    key: Sequence[str] | None = None,
    do_optimize: bool = True,
) -> DataFrame:
    """Run an op chain over ``value_col``, emitting (carry cols, value).

    Output rows carry the triggering event's time/seq/key columns (an
    expand may emit several rows per input; a filter may emit none) —
    the Event-model contract: derived events inherit the source event's
    timestamp (SURVEY.md §2.1 #4).
    """
    chain = tuple(ops)
    if do_optimize:
        chain = optimize(chain)
    inits, kernel = compile_fused(chain)
    key = list(key or [])
    order = [c for c in (time_col, seq_col) if c]
    if not order:
        raise ValueError("apply_chain needs a time or seq column for ordering")
    carry = [c for c in (*key, *order) if c]
    # bucket the key space so each pandas call handles many key groups —
    # per-group Arrow/pandas setup dominates with many small keys
    # (operators/stateful.py:_bucketed)
    work = _bucketed(df, key)

    carry_fields = [work.schema[c] for c in carry]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in carry_fields]
        + [f"`{value_col}` {out_type}"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict[str, Any]] = []
        for g in _per_key_groups(pdf, key, order):
            cols = g.columns.tolist()
            vi = cols.index(value_col)
            state = inits
            for tup in g.itertuples(index=False, name=None):
                state, emitted = kernel(state, tup[vi])
                if emitted:
                    rec = dict(zip(cols, tup))
                    for out in emitted:
                        row = {c: rec[c] for c in carry}
                        row[value_col] = out
                        rows.append(row)
        return pd.DataFrame(rows, columns=[*carry, value_col])

    return work.groupBy(BUCKET).applyInPandas(fn, schema=schema)
