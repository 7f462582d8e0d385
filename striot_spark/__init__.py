"""striot_spark — a PySpark-native analytics/stream engine with the
capability surface of striot/striot (see SURVEY.md), rebuilt Spark-first.
"""

from striot_spark.core import Stream
from striot_spark.session import get_spark

__all__ = ["Stream", "get_spark"]
__version__ = "0.1.0"
