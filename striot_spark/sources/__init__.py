from striot_spark.sources.batch import event_stream, load_table, load_tables

__all__ = ["event_stream", "load_table", "load_tables"]
