from striot_spark.sources.batch import (
    event_stream,
    load_table,
    load_tables,
    register_views,
)
from striot_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
    write_partitioned,
)
from striot_spark.sources.csv import (
    csv_with_rejects,
    jsonl_with_rejects,
    load_taxi_csv,
)

__all__ = [
    "event_stream",
    "load_table",
    "load_tables",
    "register_views",
    "read_bucketed",
    "write_bucketed",
    "write_partitioned",
    "csv_with_rejects",
    "jsonl_with_rejects",
    "load_taxi_csv",
]
