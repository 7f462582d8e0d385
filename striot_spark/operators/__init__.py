from striot_spark.operators.windows import (
    Chop,
    ChopTime,
    Complete,
    Session,
    Sliding,
    SlidingTime,
)

__all__ = ["Chop", "ChopTime", "Complete", "Session", "Sliding", "SlidingTime"]
