"""Central registry of declared queries and their DuckDB oracle SQL.

Every operator module registers its queries at import time via the
``@query`` decorator. ``__spark_entry__.py`` (the driver contract)
exposes these dicts verbatim.

A query is a ``Callable[[SparkSession, str], DataFrame]`` taking the
session and an sf dir. The oracle is ANSI SQL runnable by DuckDB over
the same parquet tables (pre-registered views). Queries with no
SQL-expressible oracle (streaming state, LSH, multimodal stubs) are
registered with ``oracle=None`` and get the driver's rows-only check.

Naming discipline (the driver sorts columns by name before hashing):
every computed column is aliased identically in the Spark plan and the
oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as declared query ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports are inside the function to avoid circular imports at
    # package-import time; each module body calls @query(...).
    from kafka_to_parquet_spark.operators import aggregates  # noqa: F401
    from kafka_to_parquet_spark.operators import composite  # noqa: F401
    from kafka_to_parquet_spark.operators import statistics  # noqa: F401
    from kafka_to_parquet_spark.operators import joins  # noqa: F401
    from kafka_to_parquet_spark.operators import relational  # noqa: F401
    from kafka_to_parquet_spark.operators import windows  # noqa: F401
    from kafka_to_parquet_spark.functions import scalar  # noqa: F401
    from kafka_to_parquet_spark.functions import text  # noqa: F401
    from kafka_to_parquet_spark.functions import vectors  # noqa: F401
    from kafka_to_parquet_spark.functions import udfs  # noqa: F401
    from kafka_to_parquet_spark.sources import kafka_analog  # noqa: F401
    from kafka_to_parquet_spark.sources import generator  # noqa: F401
    from kafka_to_parquet_spark.sources import partitioned  # noqa: F401
    from kafka_to_parquet_spark.sinks import parquet_batch  # noqa: F401
    from kafka_to_parquet_spark.streaming import windows as swin  # noqa: F401
    from kafka_to_parquet_spark.streaming import stateful  # noqa: F401
    from kafka_to_parquet_spark.llm import components  # noqa: F401
    from kafka_to_parquet_spark.llm import dedup  # noqa: F401
    from kafka_to_parquet_spark.llm import similarity  # noqa: F401
    from kafka_to_parquet_spark.llm import multimodal  # noqa: F401
