"""MQTT transport config-path tests (no broker in this container — the
reader/writer broker I/O is import-gated; see sources/mqtt.py)."""

from __future__ import annotations

import pytest

from striot_spark.sources.mqtt import (
    SCHEMA,
    MQTTConfig,
    MQTTDataSource,
    MQTTStreamReader,
    register,
)


def test_config_defaults_match_reference():
    # netmqttConf's fixed striot/striot credentials (MQTT.hs:73-74)
    c = MQTTConfig.from_options({"host": "broker.local"})
    assert (c.username, c.password) == ("striot", "striot")
    assert c.port == 1883 and c.topic == "striot"


def test_config_validation():
    with pytest.raises(ValueError, match="host"):
        MQTTConfig.from_options({})
    with pytest.raises(ValueError, match="port"):
        MQTTConfig.from_options({"host": "h", "port": "70000"})
    with pytest.raises(ValueError, match="topic"):
        # publish topics must be literal (mkTopic, MQTT.hs:37-38)
        MQTTConfig.from_options({"host": "h", "topic": "a/#"})


def test_reader_offset_bookkeeping_without_broker():
    r = MQTTStreamReader({"host": "h", "topic": "t"})
    assert r.initialOffset() == {"seq": 0}
    # simulate delivered messages; read() must drain and advance
    r._client = object()  # skip connect
    r._buffer = [(1, "t", b"a", 0.0), (2, "t", b"b", 0.0)]
    rows, end = r.read({"seq": 0})
    assert [x[1] for x in rows] == [b"a", b"b"]
    assert end == {"seq": 2}
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == {"seq": 2}


def test_reader_replay_is_at_most_once():
    r = MQTTStreamReader({"host": "h"})
    r._buffer = [(1, "t", b"a", 0.0)]
    assert [x[1] for x in r.readBetweenOffsets({"seq": 0}, {"seq": 1})] == [
        b"a"
    ]
    # buffer gone -> QoS0 has nothing to re-serve (matches reference)
    r._buffer = []
    assert list(r.readBetweenOffsets({"seq": 0}, {"seq": 1})) == []


def test_datasource_registers_on_session(spark):
    register(spark)
    assert MQTTDataSource.name() == "striot_mqtt"
    assert "payload binary" in SCHEMA
    # format resolution succeeds (connection would need paho + a broker)
    reader = spark.readStream.format("striot_mqtt").option("host", "h")
    assert reader is not None
