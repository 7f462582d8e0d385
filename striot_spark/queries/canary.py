"""Driver-hash type canary (VERDICT r07 task 8).

Round 7 proved the driver's value normalizer renders DuckDB HUGEINT
(the implicit result type of ``sum(BIGINT)``) differently from int64:
five queries with exactly-correct values stayed hash-red for two
rounds because the artifact is invisible to DBAPI ``fetchall()``
(which returns Python ints either way). The registry convention is
now "no oracle emits HUGEINT/DECIMAL" — enforced by
``tests/test_oracle_types.py`` — and this canary locks the other side
of the contract: one tiny query, first in every driver sweep head,
emitting one column of EVERY output type the registry uses:

- BIGINT key, BIGINT-cast windowed sum (the r07 hazard shape),
- INTEGER, DOUBLE, VARCHAR, DATE-as-string, BOOLEAN-as-int.

If a future driver-normalizer change renders any of these types
differently across engines, the canary goes red in isolation and the
failure localizes instantly instead of costing a round of hypothesis
testing (r05→r07 took two rounds to isolate HUGEINT).

Deterministic over the 5-row ``region`` table: no floats that are not
exact in binary (x/4.0 is a power-of-two division), no timezone
surface, no ordering surface (keyed rows, order-insensitive hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from striot_spark.queries.registry import register
from striot_spark.sources.batch import load_table


@register(
    "q224_type_canary",
    """
    SELECT CAST(r_regionkey AS BIGINT) AS key_bigint,
           CAST(r_regionkey AS INTEGER) AS key_int,
           CAST(r_regionkey AS DOUBLE) / 4.0 AS val_double,
           r_name AS name_varchar,
           strftime(DATE '2024-01-15' + CAST(r_regionkey AS INTEGER),
                    '%Y-%m-%d') AS date_str,
           CAST(CASE WHEN r_regionkey % 2 = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS flag_int,
           CAST(sum(r_regionkey) OVER () AS BIGINT) AS sum_bigint
    FROM region
    """,
    doc="driver-hash type canary: one column of every output type the "
    "registry uses (BIGINT / INTEGER / DOUBLE / VARCHAR / "
    "date-as-string / boolean-as-int / BIGINT-cast sum — the exact "
    "r07 HUGEINT hazard shape). Kept at head position 1 of every "
    "driver sweep so any future normalizer drift localizes to one row "
    "instead of a round of hypothesis testing. 5 rows, zero shuffles "
    "beyond the single-partition window over a 5-row frame.",
)
def q224_type_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    return r.select(
        F.col("r_regionkey").cast("long").alias("key_bigint"),
        F.col("r_regionkey").cast("int").alias("key_int"),
        (F.col("r_regionkey").cast("double") / F.lit(4.0)).alias(
            "val_double"
        ),
        F.col("r_name").alias("name_varchar"),
        F.date_format(
            F.date_add(
                F.lit("2024-01-15").cast("date"),
                F.col("r_regionkey").cast("int"),
            ),
            "yyyy-MM-dd",
        ).alias("date_str"),
        (F.col("r_regionkey") % 2 == 0).cast("long").alias("flag_int"),
        F.sum("r_regionkey")
        .over(Window.partitionBy())
        .cast("long")
        .alias("sum_bigint"),
    )
