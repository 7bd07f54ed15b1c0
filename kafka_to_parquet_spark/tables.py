"""Loaders for the driver-generated test tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Plain parquet scan → Catalyst gets
    pushdown + pruning on anything layered on top.

    ``events.ts`` has shipped as two physical types across driver
    generations: parquet TIMESTAMP(NANOS) (which Spark 4 rejects
    outright, PARQUET_TYPE_ILLEGAL — read nanos as long via the legacy
    conf and truncate to microseconds) and plain TIMESTAMP(MICROS)
    (readable directly). Handle both by inspecting the loaded type:
    the ns→µs truncation matches DuckDB's, so oracle comparisons stay
    exact either way. The conf is set here, not only in our session
    builder, because the driver calls queries with its own
    SparkSession.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # timestamp[us] parquet columns load as TIMESTAMP_NTZ under Spark 4's
    # inferTimestampNTZ default; epoch extraction on NTZ is interpreted in
    # the session timezone, so pin it to UTC (= DuckDB's naive-timestamp
    # semantics) even when the caller's session didn't set it.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return normalize_event_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_event_ts(df):
    """Normalize events.ts to TIMESTAMP across fixture generations —
    the ONE definition shared by the batch loader above and the
    streaming reader (streaming/stateful.py::_stream_events), so the
    next physical-type change is fixed in a single place:

    - TIMESTAMP(NANOS) read as long under nanosAsLong → truncate to
      µs (matches DuckDB's truncation, oracle-exact);
    - TIMESTAMP(MICROS) inferred as NTZ under Spark 4 → cast to
      TIMESTAMP (identity under the pinned UTC session tz)."""
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
