from striot_spark.core.stream import Stream

__all__ = ["Stream"]
