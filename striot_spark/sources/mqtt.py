"""MQTT transport: Structured Streaming source + sink via Spark 4's
Python Data Source API.

Reference parity (``src/Striot/Nodes/MQTT.hs:29-86``): StrIoT's MQTT
node publishes each serialized event to a topic at QoS0
(``sendStreamMQTT``, ``:29-38``) and subscribes with a message callback
that enqueues decoded events (``runMQTTSub``, ``:46-66``); connection
config carries host/port/client-name and the fixed striot/striot
credentials (``netmqttConf``, ``:69-77``).

Spark-first lowering: a custom ``DataSource`` named ``striot_mqtt`` —
``spark.readStream.format("striot_mqtt").option("host", ...)`` — whose
stream reader buffers messages from a background MQTT subscription into
micro-batches, and a ``DataSourceStreamWriter`` that publishes each
row's payload. QoS0 semantics match the reference: at-most-once, no
replay — ``readBetweenOffsets`` re-serves only what the reader still
buffers, and missed messages are gone (exactly the reference's fire-and-
forget ``publishq ... QoS0``).

The ``paho-mqtt`` client library is not installed in this container, so
the broker I/O is gated behind an import guard: registration, option
validation, schema, and offset bookkeeping are real and unit-tested
(``tests/test_mqtt.py``); connecting raises the documented ImportError
until the library is present on the cluster.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SCHEMA = "topic string, payload binary, ts timestamp"


def _paho():
    try:
        import paho.mqtt.client as mqtt  # noqa: PLC0415

        return mqtt
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise ImportError(
            "MQTT transport needs the paho-mqtt package on driver and "
            "executors (pip install paho-mqtt); the striot_mqtt data "
            "source registers and validates without it, but cannot "
            "connect to a broker."
        ) from exc


@dataclass(frozen=True)
class MQTTConfig:
    """Connection config (reference ``netmqttConf``, MQTT.hs:69-77 —
    including its fixed default credentials)."""

    host: str
    port: int = 1883
    topic: str = "striot"
    client_id: str = "striot-spark"
    username: str = "striot"
    password: str = "striot"

    @classmethod
    def from_options(cls, options: dict) -> "MQTTConfig":
        if not options.get("host"):
            raise ValueError("striot_mqtt requires option 'host'")
        port = int(options.get("port", 1883))
        if not (0 < port < 65536):
            raise ValueError(f"striot_mqtt: port out of range: {port}")
        topic = options.get("topic", "striot")
        if not topic or any(c in topic for c in "#+"):
            # publish topics must be literal (mkTopic, MQTT.hs:37-38)
            raise ValueError(f"striot_mqtt: invalid publish topic {topic!r}")
        return cls(
            host=options["host"],
            port=port,
            topic=topic,
            client_id=options.get("client_id", "striot-spark"),
            username=options.get("username", "striot"),
            password=options.get("password", "striot"),
        )


class MQTTStreamReader(SimpleDataSourceStreamReader):
    """Buffers subscribed messages; each ``read`` drains the buffer into
    one micro-batch. Offsets count messages seen this run; QoS0 has no
    broker-side replay, so ``readBetweenOffsets`` re-serves only rows
    still held in the local buffer (at-most-once, like the reference)."""

    def __init__(self, options: dict):
        self.conf = MQTTConfig.from_options(options)
        self._buffer: list[tuple] = []  # (seq, topic, payload, ts)
        self._lock = threading.Lock()
        self._seq = 0
        self._client = None

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _connect(self):  # pragma: no cover - needs a broker
        mqtt = _paho()
        # unique client id: MQTT brokers kick the live session on a
        # duplicate id, so a shared id would make reader/writer tasks
        # take each other down in a connect storm
        c = mqtt.Client(
            client_id=f"{self.conf.client_id}-r-{uuid.uuid4().hex[:8]}"
        )
        c.username_pw_set(self.conf.username, self.conf.password)

        def on_message(client, userdata, msg):
            with self._lock:
                self._seq += 1
                self._buffer.append(
                    (self._seq, msg.topic, bytes(msg.payload), time.time())
                )

        c.on_message = on_message
        c.connect(self.conf.host, self.conf.port)
        c.subscribe(self.conf.topic, qos=0)
        c.loop_start()
        return c

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        if self._client is None:
            self._client = self._connect()
        # snapshot under the lock; a blanket `self._buffer = []` outside
        # it would drop messages the paho thread appends between the
        # snapshot and the clear (data-loss race). Rows are pruned only
        # at commit(), so an uncommitted batch remains replayable from
        # the local buffer within this process lifetime.
        with self._lock:
            rows = [r for r in self._buffer if r[0] > start["seq"]]
        end_seq = rows[-1][0] if rows else start["seq"]
        return iter([r[1:] for r in rows]), {"seq": end_seq}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[Tuple]:
        # replay an uncommitted batch from the retained buffer (QoS0:
        # the broker itself keeps no replayable log)
        with self._lock:
            rows = [
                r
                for r in self._buffer
                if start["seq"] < r[0] <= end["seq"]
            ]
        return iter(r[1:] for r in rows)

    def commit(self, end: dict) -> None:
        # offsets up to `end` are checkpointed by Spark: safe to prune
        with self._lock:
            self._buffer = [r for r in self._buffer if r[0] > end["seq"]]


class MQTTStreamWriter(DataSourceStreamWriter):
    """Publishes each row's ``payload`` to the configured topic at QoS0
    (``sendStreamMQTT``, MQTT.hs:29-38). One client per executor task."""

    def __init__(self, options: dict):
        self.conf = MQTTConfig.from_options(options)

    def write(self, rows) -> WriterCommitMessage:  # pragma: no cover
        mqtt = _paho()
        # per-task unique id: concurrent partition writers with one
        # shared id would repeatedly kick each other off the broker
        c = mqtt.Client(
            client_id=f"{self.conf.client_id}-w-{uuid.uuid4().hex[:8]}"
        )
        c.username_pw_set(self.conf.username, self.conf.password)
        c.connect(self.conf.host, self.conf.port)
        n = 0
        for row in rows:
            c.publish(self.conf.topic, row.payload, qos=0)
            n += 1
        c.disconnect()
        return WriterCommitMessage()

    def commit(self, messages, batchId) -> None:
        pass

    def abort(self, messages, batchId) -> None:
        pass  # QoS0 fire-and-forget: nothing to roll back


class MQTTDataSource(DataSource):
    """``spark.dataSource.register(MQTTDataSource)`` then
    ``spark.readStream.format("striot_mqtt")`` /
    ``df.writeStream.format("striot_mqtt")``."""

    @classmethod
    def name(cls) -> str:
        return "striot_mqtt"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema) -> MQTTStreamReader:
        return MQTTStreamReader(self.options)

    def streamWriter(self, schema, overwrite) -> MQTTStreamWriter:
        return MQTTStreamWriter(self.options)


def register(spark) -> None:
    """Register the MQTT transport on a session."""
    spark.dataSource.register(MQTTDataSource)
