"""Synthetic record generator — reference producer parity (S7).

The reference's producer mode sends N messages with payload
"Message {i}", key "Key {i}" and one header header_key=header_value
(main.rs:59-96, shapes at 76-81). Spark-first: ``spark.range(n)`` is a
distributed, partition-parallel source (no driver loop, no futures
list), and the same DataFrame feeds either a Kafka sink
(kafka.write_kafka) or any file sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.registry import query

N_MESSAGES = 1000


def synthetic_messages(spark: SparkSession, n: int = N_MESSAGES) -> DataFrame:
    """N records in the reference producer's shape. ``headers`` carries
    the constant header pair (main.rs:78-81)."""
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("Key "), F.col("id").cast("string")).alias("key"),
        F.concat(F.lit("Message "), F.col("id").cast("string")).alias("value"),
        F.array(
            F.struct(
                F.lit("header_key").alias("key"),
                F.lit("header_value").alias("value"),
            )
        ).alias("headers"),
    )


@query(
    "q_synth_generator",
    oracle=f"""
SELECT CAST(i AS BIGINT) AS id,
       concat('Key ', CAST(i AS VARCHAR)) AS "key",
       concat('Message ', CAST(i AS VARCHAR)) AS "value"
FROM range({N_MESSAGES}) t(i)
""",
)
def q_synth_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: the producer's record shape (headers omitted from the
    declared output — struct-array vs DuckDB map normalization is not
    comparison-stable; covered by a unit test instead)."""
    return synthetic_messages(spark).select("id", "key", "value")
