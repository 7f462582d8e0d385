"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``striot_spark`` (see SURVEY.md §2 for the
operator inventory each query demonstrates).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (frequentRoutes analog) on /root/testdata/sf0.001."""
    from striot_spark.queries.flagship import q30_frequent_routes

    return q30_frequent_routes(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from striot_spark.queries.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from striot_spark.queries.registry import all_oracles

    return all_oracles()
