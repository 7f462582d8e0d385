"""Flagship query: the taxi-Q1 ``frequentRoutes`` pipeline
(``examples/taxi/Taxi.hs:173-178``) re-expressed over the events table.

Reference chain: source → map(tripToJourney) → filter(in-range) →
30-min sliding window → topk-10 route counts → filterAcc dedup-on-change
→ sink.  Analog here: events → filter(valid) → tumbling day window →
top-3 event-type counts → ordered route list → keep only windows whose
list changed vs the previous window.  Exercises map, filter, time
window, windowed topk (pure DataFrame rank — no UDF), collect+sort, and
filterAcc-as-lag in one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from striot_spark.functions.analytics import day_str, topk
from striot_spark.queries.registry import register
from striot_spark.sources.batch import load_table


@register(
    "q30_frequent_routes",
    """
    WITH counts AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type, count(*) AS n
        FROM events WHERE value >= 0 GROUP BY 1, 2),
    ranked AS (
        SELECT day, event_type, n,
               rank() OVER (PARTITION BY day
                            ORDER BY n DESC, event_type ASC) AS rnk
        FROM counts),
    lists AS (
        SELECT day,
               string_agg(event_type, ',' ORDER BY rnk, event_type)
                   AS top_routes
        FROM ranked WHERE rnk <= 3 GROUP BY day)
    SELECT day, top_routes
    FROM (SELECT day, top_routes,
                 lag(top_routes) OVER (ORDER BY day) AS prev
          FROM lists) t
    WHERE prev IS NULL OR prev <> top_routes
    """,
    doc="flagship frequentRoutes (Taxi.hs:173-178): window → topk → "
    "dedup-on-change, all Catalyst-visible",
)
def q30_frequent_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value") >= 0)
        .withColumn("day", day_str(F.col("ts")))
    )
    ranked = topk(ev, ["day"], "event_type", 3)
    lists = ranked.groupBy("day").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rnk", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ",",
        ).alias("top_routes")
    )
    w = W.orderBy("day")
    return (
        lists.withColumn("prev", F.lag("top_routes").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("top_routes")))
        .select("day", "top_routes")
    )
