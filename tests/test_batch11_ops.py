"""Invariant tests for the round-12 batch11 operators (quantization
error curve, stratified sampling audit). Both are declared for the
driver's DuckDB hash gate; these pin the invariants a refactor could
silently break between oracle runs.
"""

from __future__ import annotations

import pytest

from kafka_to_parquet_spark import registry

registry.load_all()

BATCH11 = ["q_quant_error_curve", "q_sample_hash_stratified"]


@pytest.mark.parametrize("name", BATCH11)
def test_batch11_query_runs_with_stable_schema(run, name):
    df = run(name)
    rows = df.collect()
    assert df.columns, name
    assert len(rows) > 0, f"{name} returned no rows at sf0.001"


def test_quant_curve_is_monotone_in_bits(run):
    """Fewer bits can only hurt: mean reconstruction error is
    non-decreasing and top-k overlap non-increasing as bits fall —
    the property that makes the output a CURVE. Also: the 8-bit leg's
    overlap should be near-perfect on this fixture (the q_sim_topk_int8
    premise), and every overlap is bounded by possible."""
    rows = {r["bits"]: r for r in run("q_quant_error_curve").collect()}
    assert sorted(rows) == [2, 4, 8]
    for r in rows.values():
        assert 0 <= r["overlap_at5"] <= r["possible_at5"]
        assert r["mae_micro"] >= 0 and r["max_err_micro"] >= r["mae_micro"]
    assert rows[8]["mae_micro"] <= rows[4]["mae_micro"] <= rows[2]["mae_micro"]
    assert (
        rows[8]["overlap_at5"]
        >= rows[4]["overlap_at5"]
        >= rows[2]["overlap_at5"]
    )
    # int8 must preserve a usable share of the exact top-k even on
    # this near-tie-dense synthetic fixture; int2 must visibly degrade
    # relative to it (otherwise the curve carries no signal).
    assert rows[8]["overlap_at5"] >= rows[8]["possible_at5"] // 2
    assert rows[2]["overlap_at5"] < rows[8]["overlap_at5"]


def test_stratified_sample_allocation_and_determinism(run):
    """Allocation spends (approximately, integer division) the budget;
    achieved counts are binomially near target (hash-threshold rule);
    per-stratum achieved never exceeds the stratum; repeat runs are
    identical (hash selection has no RNG state)."""
    from kafka_to_parquet_spark.operators.batch11 import SAMPLE_BUDGET_BP

    rows = run("q_sample_hash_stratified").collect()
    n_total = sum(r["n_docs"] for r in rows)
    target_total = sum(r["target_k"] for r in rows)
    budget = n_total * SAMPLE_BUDGET_BP // 10000
    # sqrt-allocation + floor division can undershoot, never overshoot
    assert 0 < target_total <= budget
    for r in rows:
        assert 0 <= r["achieved_k"] <= r["n_docs"]
        assert 0 <= r["rate_ppm"] <= 1_000_000
        if r["achieved_k"]:
            assert r["mean_chars_sample"] > 0
        else:
            assert r["mean_chars_sample"] == -1
    again = run("q_sample_hash_stratified").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
