"""Kafka transport plumbing tests — brokerless, mirroring
tests/test_mqtt.py: the spark-sql-kafka package isn't in this container,
so broker I/O can't run, but everything this repo OWNS about the kafka
edge is pinned here: option composition (reader + writer), the JSON
event serde in both directions (round-trip through real Spark
expressions), and that the format string actually reaches Spark's data
source resolution (reference transport: ``src/Striot/Nodes/
Kafka.hs:24-119``)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from striot_spark.sources.batch import load_table
from striot_spark.streaming.runtime import (
    kafka_json_parse,
    kafka_json_serde,
    kafka_reader_options,
    kafka_stream,
    kafka_writer_options,
)


def test_reader_option_composition():
    opts = kafka_reader_options("b1:9092,b2:9092", "events")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
    }
    # explicit offsets pass through (earliest and JSON offset maps)
    assert (
        kafka_reader_options("b", "t", "earliest")["startingOffsets"]
        == "earliest"
    )
    j = '{"t":{"0":23}}'
    assert kafka_reader_options("b", "t", j)["startingOffsets"] == j


def test_reader_option_validation():
    with pytest.raises(ValueError, match="bootstrap"):
        kafka_reader_options("", "t")
    with pytest.raises(ValueError, match="topic"):
        kafka_reader_options("b", "")
    with pytest.raises(ValueError, match="startingOffsets"):
        kafka_reader_options("b", "t", "yesterday")


def test_writer_option_composition_and_validation(tmp_path):
    ck = str(tmp_path / "ck")
    opts = kafka_writer_options("b:9092", "out", ck)
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out",
        "checkpointLocation": ck,
    }
    with pytest.raises(ValueError, match="checkpoint"):
        kafka_writer_options("b", "t", "")


def test_json_serde_round_trip(spark, sf_dir):
    """Egress serde → ingress serde must reproduce the event exactly
    (kafka carries opaque bytes; the JSON framing is ours to verify).
    Runs through the real Spark expressions on real events rows —
    timestamps included, the field most likely to break in a
    text serde."""
    ev = (
        load_table(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(50)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in ev.schema.fields
    )
    wire = kafka_json_serde(ev)
    assert wire.columns == ["key", "value"]
    # null key => round-robin partitioning (documented choice)
    assert wire.filter(F.col("key").isNotNull()).count() == 0
    back = kafka_json_parse(
        # kafka delivers value as binary; serde must cast, so feed bytes
        wire.select(F.col("value").cast("binary").alias("value")),
        schema,
    )
    assert back.schema == ev.schema
    orig = sorted(map(tuple, ev.collect()))
    rt = sorted(map(tuple, back.collect()))
    assert rt == orig


def test_kafka_format_reaches_spark_resolution(spark):
    """kafka_stream must hand Spark the 'kafka' format with our options:
    without the spark-sql-kafka package the load fails at data source
    RESOLUTION, and the error must name kafka + the deploy instructions
    — proving the wiring path executes up to the missing-jar boundary
    (not, e.g., an option error earlier)."""
    with pytest.raises(Exception, match="[Kk]afka"):
        kafka_stream(spark, "b:9092", "events")


def test_to_kafka_wiring_reaches_spark_resolution(spark, tmp_path):
    """Same boundary assertion for the sink: serde + writer options
    compose and .start() fails only at the missing kafka data source."""
    from striot_spark.streaming.runtime import to_kafka

    sdf = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    with pytest.raises(Exception, match="[Kk]afka"):
        to_kafka(sdf, "b:9092", "out", str(tmp_path / "ck"))
