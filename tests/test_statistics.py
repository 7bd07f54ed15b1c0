"""Statistical-aggregate invariants (value parity vs DuckDB is covered
by the oracle gate; these pin the math properties)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_to_parquet_spark.tables import load


def test_percentiles_are_monotone(run):
    for r in run("q_agg_percentile").collect():
        assert r["p25"] <= r["p50"] <= r["p75"] <= r["p95"]


def test_histogram_counts_sum_to_total(spark, sf_dir, run):
    o = load(spark, sf_dir, "orders")
    h = run("q_agg_histogram")
    assert h.agg(F.sum("n")).collect()[0][0] == o.count()
    assert h.filter(~F.col("lo_ok")).count() == 0


def test_moment_stats_match_builtin(spark, sf_dir, run):
    """The exact-moment corr/covar/stddev must agree with Spark's own
    streaming implementations to float tolerance (they differ only in
    summation order)."""
    li = load(spark, sf_dir, "lineitem")
    ours = run("q_agg_stats").collect()[0]
    ref = li.agg(
        F.corr("l_quantity", "l_discount").alias("c"),
        F.covar_samp("l_quantity", "l_discount").alias("cv"),
        F.stddev("l_quantity").alias("sd"),
    ).collect()[0]
    assert math.isclose(ours["corr_qty_disc"], ref["c"], rel_tol=1e-9)
    assert math.isclose(ours["covar_qty_disc"], ref["cv"], rel_tol=1e-9)
    assert math.isclose(ours["stddev_qty"], ref["sd"], rel_tol=1e-9)
    assert -1.0 <= ours["corr_qty_disc"] <= 1.0


def test_levenshtein_pairs_symmetric_bound(run):
    for r in run("q_text_levenshtein").collect():
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["edit_dist"] <= 20
