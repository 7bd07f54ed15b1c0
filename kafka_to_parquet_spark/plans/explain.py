"""Helpers to read a DataFrame's formatted physical plan and assert
scale-critical properties. Used by tests/test_plans.py and the M5
plan-audit pass — there is deliberately no custom planning here
(SURVEY §4: zero Catalyst forks; we *verify* the optimizer, we don't
replace it)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan received pushed filters."""
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column sets actually read from parquet (one entry per scan) —
    the column-pruning check."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line.removeprefix("ReadSchema:").strip())
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_wholestage_codegen(df: DataFrame) -> bool:
    return "WholeStageCodegen" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    return formatted_plan(df).count("Exchange")
