"""CSV sources + the taxi (DEBS 2015) application schema.

Reference parity: StrIoT parses CSV lines into typed records inside the
source action (``tripSource`` / ``stringsToTrip``,
``examples/taxi/Taxi.hs:123-140``; wearable ``parseSessionLine``,
``examples/wearable/WearableExample.hs:201-205``). Here parsing is a
schema'd ``spark.read.csv`` — typed, vectorized, and pushdown-capable —
plus Column-level derivations for the taxi grid cells and journeys
(``Taxi.hs:83-118``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# F2 fixture (FIXTURES.md): 17 CSV fields of the DEBS 2015 taxi data
TAXI_SCHEMA = StructType(
    [
        StructField("medallion", StringType()),
        StructField("hack_license", StringType()),
        StructField("pickup_datetime", TimestampType()),
        StructField("dropoff_datetime", TimestampType()),
        StructField("trip_time_in_secs", IntegerType()),
        StructField("trip_distance", FloatType()),
        StructField("pickup_longitude", FloatType()),
        StructField("pickup_latitude", FloatType()),
        StructField("dropoff_longitude", FloatType()),
        StructField("dropoff_latitude", FloatType()),
        StructField("payment_type", StringType()),
        StructField("fare_amount", FloatType()),
        StructField("surcharge", FloatType()),
        StructField("mta_tax", FloatType()),
        StructField("tip_amount", FloatType()),
        StructField("tolls_amount", FloatType()),
        StructField("total_amount", FloatType()),
    ]
)

# grid constants (Taxi.hs:83-118): origin cell centre + cell sizes.
# Q1 uses 0.004491556 x 0.005986 degree cells, valid range 1..300.
GRID_ORIGIN_LAT = 41.474937
GRID_ORIGIN_LON = -74.913585
Q1_CELL_LAT = 0.004491556
Q1_CELL_LON = 0.005986
Q1_MAX_CELL = 300


def load_taxi_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read DEBS-format CSV; event time = dropoff (tripSource,
    Taxi.hs:123-125)."""
    return spark.read.csv(
        path, schema=TAXI_SCHEMA, timestampFormat="yyyy-M-d HH:mm:ss"
    )


def cell_of(lat: Column, lon: Column) -> Column:
    """(lat, lon) → grid cell struct(clat, clon), 1-based from the
    origin corner (toCell, Taxi.hs:83-99)."""
    clat = (F.floor((F.lit(GRID_ORIGIN_LAT) - lat) / F.lit(Q1_CELL_LAT)) + 1).cast(
        "int"
    )
    clon = (F.floor((lon - F.lit(GRID_ORIGIN_LON)) / F.lit(Q1_CELL_LON)) + 1).cast(
        "int"
    )
    return F.struct(clat.alias("clat"), clon.alias("clon"))


def in_range(cell: Column) -> Column:
    """Valid-range predicate (inRange, Taxi.hs:107-113)."""
    return (
        (cell["clat"] >= 1)
        & (cell["clat"] <= Q1_MAX_CELL)
        & (cell["clon"] >= 1)
        & (cell["clon"] <= Q1_MAX_CELL)
    )


def trips_to_journeys(trips: DataFrame) -> DataFrame:
    """Trip → Journey {start_cell, end_cell, pickup, dropoff}
    (tripToJourney, Taxi.hs:64-69) with the in-range filter of Q1."""
    out = trips.select(
        cell_of(F.col("pickup_latitude"), F.col("pickup_longitude")).alias(
            "start_cell"
        ),
        cell_of(F.col("dropoff_latitude"), F.col("dropoff_longitude")).alias(
            "end_cell"
        ),
        F.col("pickup_datetime").alias("pickup_time"),
        F.col("dropoff_datetime").alias("dropoff_time"),
    )
    return out.filter(in_range(F.col("start_cell")) & in_range(F.col("end_cell")))


def frequent_routes(trips: DataFrame, k: int = 10) -> DataFrame:
    """Taxi Q1 (frequentRoutes, Taxi.hs:173-178) on the F2 schema:
    journeys → 30-min tumbling route counts → top-k → dedup-on-change.
    (The reference uses a per-event 30-min *sliding* window; the tumbling
    form is the scalable default, the sliding form is expressible via
    SlidingTime.)"""
    from pyspark.sql import Window as W

    from striot_spark.functions.analytics import topk

    j = trips_to_journeys(trips).withColumn(
        "route",
        F.concat_ws(
            ">",
            F.concat_ws(",", F.col("start_cell.clat"), F.col("start_cell.clon")),
            F.concat_ws(",", F.col("end_cell.clat"), F.col("end_cell.clon")),
        ),
    ).withColumn("win", F.window("dropoff_time", "30 minutes"))
    ranked = topk(
        j.select(F.col("win.start").alias("window_start"), "route"),
        ["window_start"],
        "route",
        k,
    )
    lists = ranked.groupBy("window_start").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rnk", "route"))),
                lambda s: s["route"],
            ),
            "|",
        ).alias("top_routes")
    )
    w = W.orderBy("window_start")
    return (
        lists.withColumn("prev", F.lag("top_routes").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("top_routes")))
        .select("window_start", "top_routes")
    )


def _text_scan_with_rejects(
    spark: SparkSession,
    path: str,
    schema: StructType,
    parse,
    options: dict,
) -> tuple[DataFrame, DataFrame]:
    """Shared dead-letter lowering for line formats: ONE ``text`` scan;
    ``parse(value_col, schema_ddl, opts)`` returns the typed struct.

    Reject routing covers all three observed failure shapes (probed on
    this Spark version): (a) parser-flagged lines (corrupt column set),
    (b) lines the parser maps to a NULL struct (``from_json`` on blank
    input), (c) blank/whitespace-only lines that would otherwise emit
    silent all-null rows (``from_csv('')``)."""
    corrupt = "_corrupt_record"
    full = StructType(
        list(schema.fields) + [StructField(corrupt, StringType())]
    )
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt}
    opts.update(options)
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        parse(F.col("value"), full.simpleString(), opts).alias("e"),
    )
    is_reject = (
        F.col(f"e.{corrupt}").isNotNull()
        | F.col("e").isNull()
        | (F.trim(F.col("raw_line")) == "")
    )
    good = parsed.filter(~is_reject).select(
        *[F.col(f"e.{f.name}").alias(f.name) for f in schema.fields]
    )
    rejects = parsed.filter(is_reject).select("raw_line")
    return good, rejects


def csv_with_rejects(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter CSV ingestion: returns ``(good, rejects)`` where
    ``good`` carries only fully-parsed typed rows and ``rejects`` the
    raw text of every malformed line (wrong arity, unparseable field,
    blank line).

    The reference's CSV sources (``Taxi.hs:123-140``) run ``read`` on
    each line and would crash the node on a malformed one; at 100 TB
    there WILL be malformed lines, and silently nulling fields (Spark's
    bare PERMISSIVE default) corrupts downstream aggregates instead.
    This split makes the failure set explicit and re-processable — the
    standard dead-letter-queue shape.

    Lowering: ONE ``text`` scan + ``from_csv`` per consumer. Parsing
    through ``from_csv`` (not the csv file source) side-steps Spark's
    restriction on file scans that reference only the internal corrupt
    column, needs no cache() workaround, and both outputs stay pure
    scan->project->filter pipelines.

    Note the parser's leniency limits: values COERCIBLE to the declared
    type (a number feeding a string column) parse as good — the rejects
    set catches structural damage, not semantic surprises.
    """
    return _text_scan_with_rejects(spark, path, schema, F.from_csv, options)


def jsonl_with_rejects(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter JSONL ingestion — same contract and lowering as
    ``csv_with_rejects`` for the training-data interchange format:
    malformed JSON, lines with type-INCOMPATIBLE fields, blank lines,
    and lines parsing to a null struct land verbatim in ``rejects``;
    coercible values (number -> declared string) parse as good, like
    any lenient JSON reader."""
    return _text_scan_with_rejects(spark, path, schema, F.from_json, options)
