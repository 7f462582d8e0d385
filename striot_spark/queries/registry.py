"""Query registry: every implemented operator/capability from SURVEY.md §2
is demonstrated by a named query over the driver's synthetic tables, each
with a DuckDB oracle SQL string (or None for genuinely non-SQL-expressible
operators → weaker rows-only check).

Contract (see /root/repo/__spark_entry__.py): the Spark result and the
oracle result must agree on row count, schema, and order-insensitive
value hash, with columns matched *by name* — so every computed column is
aliased identically on both sides, money aggregates run in integer cents
(order-insensitive, engine-exact; see functions/analytics.py), and
timestamps are emitted as canonical strings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


_LOADED = False


def _load() -> None:
    """Import all query modules (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from striot_spark.queries import (  # noqa: F401
        composite,
        datapipe,
        events_ops,
        flagship,
        tpch,
    )

    _LOADED = True
