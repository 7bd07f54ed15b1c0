"""Env-gated smoke test for the REAL Kafka source path
(sources/kafka.py). The container ships no broker and no
spark-sql-kafka connector jar, so these tests skip unless
``KTPS_KAFKA_BROKERS`` points at a reachable broker (and the connector
jar is on the session classpath, e.g. via
``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).

Run against a real broker:

    KTPS_KAFKA_BROKERS=localhost:9092 KTPS_KAFKA_TOPIC=smoke \
        python -m pytest tests/test_kafka_broker.py

Without the env var the tests report as SKIPPED, never failed — the
broker path's logic is otherwise exercised through the brokerless
analog (kafka_analog.py, same fixed schema).
"""

from __future__ import annotations

import os

import pytest

BROKERS = os.environ.get("KTPS_KAFKA_BROKERS")
TOPIC = os.environ.get("KTPS_KAFKA_TOPIC", "ktps_smoke")

needs_broker = pytest.mark.skipif(
    not BROKERS, reason="KTPS_KAFKA_BROKERS not set; no Kafka broker in container"
)


@needs_broker
def test_kafka_roundtrip_and_metadata(spark):
    """Produce rows, read them back bounded, check the fixed source
    schema, decode semantics, and per-partition watermarks (S1-S3, S7,
    the metadata probe)."""
    from pyspark.sql import functions as F

    from kafka_to_parquet_spark.sources.kafka import (
        KAFKA_COLUMNS,
        decode_payload,
        describe_source,
        kafka_batch,
        write_kafka,
    )

    src = spark.range(100).select(
        F.col("id").cast("string").alias("key"),
        F.concat(F.lit("payload_"), F.col("id")).alias("value"),
    )
    write_kafka(src, BROKERS, TOPIC)

    raw = kafka_batch(spark, BROKERS, TOPIC)
    assert set(KAFKA_COLUMNS) <= set(raw.columns)
    assert raw.count() >= 100

    decoded = decode_payload(raw)
    assert decoded.schema["b"].nullable is False or decoded.filter("b IS NULL").count() == 0
    assert decoded.filter(F.col("b").startswith("payload_")).count() >= 100

    meta = describe_source(spark, BROKERS, TOPIC)
    rows = meta.collect()
    assert rows and all(r["high_watermark"] >= r["low_watermark"] for r in rows)


@needs_broker
def test_kafka_stream_to_parquet_sink(spark, tmp_path):
    """S1+S5 end to end: streaming scan → count-batched parquet sink."""
    from pyspark.sql import functions as F

    from kafka_to_parquet_spark.sinks.parquet_batch import streaming_sink
    from kafka_to_parquet_spark.sources.kafka import kafka_stream

    stream = kafka_stream(spark, BROKERS, TOPIC).select(
        "partition", "offset", F.col("value").cast("string").alias("value")
    )
    q = streaming_sink(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), batch_size=50
    ).start()
    q.awaitTermination()
    assert spark.read.parquet(str(tmp_path / "out" / "epoch_*")).count() >= 100
