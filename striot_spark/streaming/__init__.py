from striot_spark.streaming import runtime
