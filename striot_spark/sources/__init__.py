from striot_spark.sources.batch import event_stream, load_table, load_tables
from striot_spark.sources.bucketed import read_bucketed, write_bucketed

__all__ = [
    "event_stream",
    "load_table",
    "load_tables",
    "read_bucketed",
    "write_bucketed",
]
