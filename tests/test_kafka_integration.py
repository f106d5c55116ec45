"""Guarded Kafka integration round-trip (skip-if-no-broker).

The engine's Kafka source/sink (`streaming/sources.py:kafka_stream`,
`streaming/sinks.py:kafka_json_sink`) mirror the reference's options
(reference: spark_apps/pubg_streaming.py:19-25 — subscribe topic,
startingOffsets, failOnDataLoss). This sandbox ships no broker and no
spark-sql-kafka connector jar, so these tests skip cleanly here; they
run end-to-end wherever both are present.

How to run with a real broker:

    # needs the connector on the session classpath, e.g.
    #   spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>
    KAFKA_BOOTSTRAP_SERVERS=localhost:9092 python -m pytest tests/test_kafka_integration.py

The broker probe is a plain TCP connect to every host:port in
$KAFKA_BOOTSTRAP_SERVERS; the connector probe asks the session's DataSource
registry for the `kafka` format. Either probe failing -> pytest.skip, never
an error, so the default suite stays broker-free.
"""

from __future__ import annotations

import json
import os
import socket
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS", "")


def _broker_reachable() -> bool:
    if not BOOTSTRAP:
        return False
    for hostport in BOOTSTRAP.split(","):
        host, _, port = hostport.strip().partition(":")
        try:
            with socket.create_connection((host, int(port or 9092)), timeout=2):
                pass
        except OSError:
            return False
    return True


def _kafka_connector_available(spark) -> bool:
    # DataSource.lookupDataSource throws if no provider registers "kafka"
    # (the spark-sql-kafka jar is a separate artifact, absent here).
    try:
        jvm = spark._jvm
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "kafka", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


@pytest.fixture()
def kafka_ready(spark):
    if not _broker_reachable():
        pytest.skip("no Kafka broker: set KAFKA_BOOTSTRAP_SERVERS to run (see module docstring)")
    if not _kafka_connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the session classpath")
    return BOOTSTRAP


def test_kafka_round_trip_batch_sink_stream_source(spark, kafka_ready, tmp_path):
    """kafka_json_sink -> kafka_stream(availableNow) round-trip with the
    reference's exact source options (earliest offsets so the batch
    written above is visible; failOnDataLoss=false)."""
    from pyspark.sql import functions as F

    from pubg_data_pipeline_spark.streaming.sinks import kafka_json_sink
    from pubg_data_pipeline_spark.streaming.sources import kafka_stream

    topic = f"pubg-test-{uuid.uuid4().hex[:8]}"
    rows = [(1, "kill", 2.0), (2, "signup", 0.5), (3, "purchase", 9.9)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    kafka_json_sink(df, kafka_ready, topic)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = kafka_stream(
        spark, kafka_ready, topic, starting_offsets="earliest", fail_on_data_loss=False
    ).selectExpr("CAST(value AS STRING) AS value")
    q = (
        stream.writeStream.format("json")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        json.loads(json.loads(line)["value"])["event_id"]
        for f in os.listdir(out_dir)
        if f.endswith(".json")
        for line in open(os.path.join(out_dir, f))
        if line.strip()
    )
    assert got == [1, 2, 3]
