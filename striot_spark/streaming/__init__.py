from striot_spark.streaming import runtime  # noqa: F401
from striot_spark.streaming.metrics import PrometheusMetrics  # noqa: F401
