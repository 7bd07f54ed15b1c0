"""Loaders for the driver-generated test tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    outright (PARQUET_TYPE_ILLEGAL) — read nanos as long via the
    legacy conf and truncate to microseconds (Spark timestamp
    precision; DuckDB does the same ns→µs truncation, so oracle
    comparisons stay exact). The conf is set here, not only in our
    session builder, because the driver calls queries with its own
    SparkSession.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
