"""Every registered query must match its DuckDB oracle exactly
(row count + columns + normalized values) — the local replica of the
driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from striot_spark.queries.registry import REGISTRY, _load

_load()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    from tests.oracle_harness import compare_query

    spec = REGISTRY[name]
    problems = compare_query(spark, name, spec.fn, spec.oracle, sf_dir)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
