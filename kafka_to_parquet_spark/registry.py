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


# Queries that already hold an accepted driver row in a prior round's
# CORRECTNESS_r{N}.json (green hash-match, or an intentional rows-only
# row for sketch/LSH queries). The driver's per-round gate only records
# the FIRST 50 entries of ``queries()``, so ``ordered_queries()`` floats
# never-certified queries to the front of the dict until every declared
# query has a row on record. Append names here once their round result
# lands.
CERTIFIED: set[str] = {
    # round 1 (CORRECTNESS_r01.json): 48 hash-green + 1 accepted rows-only.
    "q_agg_groupby", "q_agg_distinct", "q_agg_approx_distinct",
    "q_agg_rollup", "q_agg_cube", "q_agg_global", "q_agg_pivot",
    "q_agg_conditional", "q_agg_listagg", "q_agg_unpivot",
    "q_tpch_q6", "q_tpch_q3", "q_tpch_q5", "q_join_asof",
    "q_agg_salted", "q_agg_percentile", "q_agg_histogram", "q_agg_stats",
    "q_text_levenshtein", "q_join_inner", "q_join_outer",
    "q_join_semi_anti", "q_join_broadcast", "q_join_range",
    "q_join_cross", "q_join_range_binned", "q_join_skew_salted",
    "q_project_compute", "q_filter_pred", "q_distinct",
    "q_set_union", "q_set_intersect", "q_set_except",
    "q_sort", "q_topk", "q_win_rank", "q_win_lag_lead",
    "q_win_running", "q_win_topk_group", "q_win_cdf",
    "q_win_running_scalable", "q_str_funcs", "q_date_funcs",
    "q_math_funcs", "q_cond_funcs", "q_json_funcs",
    "q_text_tokens", "q_text_stats", "q_text_quality",
}


def ordered_queries() -> dict[str, QueryFn]:
    """Registry reordered for the driver's bounded correctness gate:
    queries with no accepted driver row yet come first (registration
    order), already-certified ones fill the tail. Within a round this
    is deterministic; across rounds ``CERTIFIED`` grows until the
    ordering is a no-op."""
    load_all()
    pending = {n: f for n, f in QUERIES.items() if n not in CERTIFIED}
    done = {n: f for n, f in QUERIES.items() if n in CERTIFIED}
    return {**pending, **done}


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
