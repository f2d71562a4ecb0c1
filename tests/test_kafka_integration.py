"""S5/F4 ready-to-run Kafka round-trip (r3 VERDICT Next-round #5).

Collected-but-SKIPPED in this sandbox: the container has no network
(curl to repo1.maven.org -> DNS failure, recorded in BENCH.md), so the
spark-sql-kafka connector jar cannot be fetched and no broker exists.
On a networked host, run it with:

    export HETMAN_SPARK_KAFKA_PACKAGES=1          # wires spark.jars.packages
    export HETMAN_SPARK_KAFKA_BROKERS=host:9092   # a reachable broker
    python -m pytest tests/test_kafka_integration.py -x -q

The round-trip mirrors the reference semantics end-to-end:
produce with log_df_to_kafka_records -> .format("kafka") batch write
(forwarder/kafka.go:37-47 SendEvents), then read back via
read_kafka_stream -> kafka_records_to_log_df (tailer/kafka.go:36-42
ConsumeClaim relay) and assert the lines and the event-source label
("topics=T|brokers=B", kafka.go:89-91) survive intact.
"""

from __future__ import annotations

import os
import uuid

import pytest

_BROKERS = os.environ.get("HETMAN_SPARK_KAFKA_BROKERS")
_JAR_GATE = os.environ.get("HETMAN_SPARK_KAFKA_PACKAGES")

pytestmark = pytest.mark.skipif(
    not (_BROKERS and _JAR_GATE),
    reason=(
        "needs HETMAN_SPARK_KAFKA_PACKAGES=1 + HETMAN_SPARK_KAFKA_BROKERS "
        "(no network/jar/broker in this sandbox — see BENCH.md)"
    ),
)


def test_kafka_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from hetman_spark.streaming.stream import (
        log_df_to_kafka_records,
        read_kafka_stream,
    )

    topic = f"hetman-it-{uuid.uuid4().hex[:8]}"
    lines = [f"10.0.0.{i} - - [01/Jan/2024:00:00:0{i} +0000] line {i}" for i in range(5)]
    src = spark.createDataFrame([(ln,) for ln in lines], "log_line string")

    # F4: producer-record adapter -> the real kafka batch sink, with the
    # reference's sync-producer ack level (required-acks=-1)
    (
        log_df_to_kafka_records(src, topics=[topic])
        .write.format("kafka")
        .option("kafka.bootstrap.servers", _BROKERS)
        .option("kafka.acks", "all")
        .save()
    )

    # S5: the streaming source + value adapter, drained to memory
    stream = read_kafka_stream(spark, brokers=_BROKERS, topics=topic)
    q = (
        stream.writeStream.format("memory")
        .queryName("kafka_it")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM kafka_it").collect()

    assert sorted(r["log_line"] for r in out) == sorted(lines)
    assert all(
        r["labels"]["source"] == f"topics={topic}|brokers={_BROKERS}" for r in out
    )
    assert all(r["labels"]["topic"] == topic for r in out)
