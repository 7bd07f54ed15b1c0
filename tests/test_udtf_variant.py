"""Invariants for the Python-UDTF table function and the VARIANT
semi-structured query."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.text import tokens_col
from kafka_to_parquet_spark.tables import load


def test_udtf_histogram_mass_equals_token_count(run, spark, sf_dir):
    rows = run("q_udtf_wordcounts").collect()
    docs = load(spark, sf_dir, "documents")
    n_tokens = docs.select(F.explode(tokens_col(F.col("text")))).count()
    assert sum(r.cnt for r in rows) == n_tokens
    # (doc, word) keys are unique — the UDTF aggregates within the doc
    keys = [(r.doc_id, r.word) for r in rows]
    assert len(keys) == len(set(keys))


def test_udtf_matches_explode_groupby(run, spark, sf_dir):
    expected = {
        (r.doc_id, r.word): r.cnt
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens_col(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    got = {(r.doc_id, r.word): r.cnt for r in run("q_udtf_wordcounts").collect()}
    assert got == expected


def test_variant_buckets_partition_events(run, spark, sf_dir):
    rows = run("q_json_variant").collect()
    n_events = load(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events
    assert all(0 <= r.k_bucket <= 9 for r in rows)
    # bucket-wise sums are consistent with the bucket definition:
    # every contributing k ≡ k_bucket (mod 10), so k_sum ≡ n·k_bucket
    for r in rows:
        assert (r.k_sum - r.n * r.k_bucket) % 10 == 0
