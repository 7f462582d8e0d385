"""Memoized-map helpers.

Reference parity: ``streamMapCache`` carries a Map cache through
streamScan to avoid recomputing an expensive per-value function
(``examples/caching/Caching.hs:15-20``). On Spark the idiomatic
equivalents are (a) a broadcast lookup table when the function's domain
is small/known, (b) ``df.cache()`` for whole-plan reuse — per-executor
memoization of arbitrary Python functions would be cache-per-worker and
rarely wins over Arrow-vectorized recomputation.
"""

from __future__ import annotations

from itertools import chain
from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# -- session-scoped persist tracking -----------------------------------------
#
# Several pair-generation operators persist corpus-scale work tables
# (shingle sets, minhash bases, cell assignments) that the RETURNED
# DataFrame's plan still reads — so the function cannot unpersist them
# before the caller materializes the result, and a long session that
# loops corpora (a bench sweep, the driver's 50-query run) accumulates
# cached blocks until eviction pressure (ADVICE r05). The deal: those
# persists register here, and session loops call ``release_persisted()``
# between queries. Releasing early is always CORRECT — an unpersisted
# plan recomputes from source — it only costs recompute time if the
# caller had not yet materialized the previous result.

_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for ``release_persisted``."""
    p = df.persist()
    _PERSISTED.append(p)
    return p


def untrack(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist one tracked frame NOW and drop it from the release
    list. For setup-superseded persists (ADVICE r15): when an operator
    replaces a persisted work table with a re-layout of itself (e.g.
    the co-partitioned edge copy under the small-graph gate), the raw
    persist would otherwise stay cached alongside the copy until
    ``release_persisted``, doubling cached memory for the whole job.
    Callers must materialize the successor first (one ``count()``)
    so the copy is built from the still-cached raw layout."""
    try:
        df.unpersist(blocking)
    except Exception:
        pass  # session already stopped; nothing to release
    try:
        _PERSISTED.remove(df)
    except ValueError:
        pass  # already released (or never tracked) — idempotent


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every tracked work table; returns how many released."""
    n = 0
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist(blocking)
            n += 1
        except Exception:
            pass  # session already stopped; nothing to release
    return n


def broadcast_lookup(
    df: DataFrame,
    mapping: Mapping[Any, Any],
    key_col: str,
    out_col: str,
    default: Any = None,
) -> DataFrame:
    """Map ``key_col`` through a driver-side dict as a literal MapType
    expression — Catalyst constant, shipped once per stage, no shuffle
    and no UDF. For large mappings use a broadcast-join against a
    DataFrame instead."""
    kv = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    looked = kv[F.col(key_col)]
    if default is not None:
        looked = F.coalesce(looked, F.lit(default))
    return df.withColumn(out_col, looked)


def broadcast_join_lookup(
    df: DataFrame, lookup: DataFrame, key_col: str, how: str = "left"
) -> DataFrame:
    """Lookup via explicit broadcast join (the >100-entry regime)."""
    return df.join(F.broadcast(lookup), key_col, how)
