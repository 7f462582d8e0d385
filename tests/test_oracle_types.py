"""Registry-wide oracle output-type lint (VERDICT r07 task 2).

Round 7's five driver hash-reds (q93/q100/q101/q127/q132) were all one
bug: DuckDB types ``sum(BIGINT)`` as HUGEINT (int128), and the grading
driver's value normalizer renders HUGEINT differently from int64 —
while the in-repo harness's DBAPI ``fetchall()`` returns Python ints
either way and is structurally blind to the difference (six full
green sim sweeps while the driver saw red). The registry convention is
therefore: **no oracle's final SELECT may emit a HUGEINT or DECIMAL
column** — integer aggregates are ``CAST(... AS BIGINT)``, money is
integer cents (BIGINT) or ``/100.0`` doubles.

This test types every registered oracle with ``duckdb.sql(...).types``
(relation typing — no query execution) against the sf0.001 views and
fails on any HUGEINT/DECIMAL output column, turning the r07
driver-only blind spot into a local regression gate. It would have
caught all five r07 reds and the 27 never-swept hazard oracles.
"""

from __future__ import annotations

import os

import pytest

from striot_spark.queries.registry import REGISTRY, _load
from tests.oracle_harness import duck_con

_load()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)

_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

_BANNED = ("HUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duck_con(_SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_emits_no_hugeint_or_decimal(con, name):
    rel = con.sql(REGISTRY[name].oracle)
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(b in str(t).upper() for b in _BANNED)
    ]
    assert not offenders, (
        f"{name}: oracle emits driver-hash-hazard column types "
        f"{offenders} — wrap the expression in CAST(... AS BIGINT) "
        f"(integers) or /100.0 (money doubles); see tests/"
        f"test_oracle_types.py docstring and VERDICT r07"
    )
