"""Invariant tests for the round-11 batch10 operators (contamination
attribution/ladder, repetition windows, byte-denominated fertility,
duplication-width curve, filter Venn). All six are hash-verified
against the DuckDB oracle through the driver gate; these pin the
invariants a refactor could silently break between oracle runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_to_parquet_spark import registry

registry.load_all()

BATCH10 = [
    "q_contamination_attrib", "q_contamination_ladder",
    "q_repetition_windows", "q_fertility_bytes",
    "q_dup_width_curve", "q_filter_venn",
]


@pytest.mark.parametrize("name", BATCH10)
def test_batch10_query_runs_with_stable_schema(run, name):
    df = run(name)
    rows = df.collect()
    assert df.columns, name
    assert len(rows) > 0, f"{name} returned no rows at sf0.001"


def test_contamination_attrib_bounds_and_bench_slice(run):
    """Every reported item IS a benchmark doc; leaked grams never
    exceed the item's gram count; leak_bp consistent with the ratio."""
    from kafka_to_parquet_spark.llm.pipeline import BENCH_MOD

    rows = run("q_contamination_attrib").collect()
    for r in rows:
        assert r["bench_doc"] % BENCH_MOD == 0
        assert 0 <= r["n_leaked_grams"] <= r["n_grams"]
        assert (r["n_docs_hit"] == 0) == (r["n_leaked_grams"] == 0)
        assert r["leak_bp"] == r["n_leaked_grams"] * 10000 // r["n_grams"]


def test_contamination_ladder_is_monotone_decreasing_in_n(run):
    """A (n+1)-gram hit contains an n-gram hit, so the contaminated
    doc count can only fall as n grows — the monotonicity that makes
    the ladder a calibration curve at all."""
    from kafka_to_parquet_spark.operators.batch10 import LADDER_NS

    rows = {r["n"]: r for r in run("q_contamination_ladder").collect()}
    assert sorted(rows) == sorted(LADDER_NS)
    hits = [rows[n]["n_docs_hit"] for n in sorted(rows)]
    assert all(a >= b for a, b in zip(hits, hits[1:])), hits
    for r in rows.values():
        assert 0 <= r["hit_bp"] <= 10000


def test_repetition_windows_identities(run):
    from kafka_to_parquet_spark.operators.batch10 import REP_FLAG_BP

    _ = REP_FLAG_BP
    for r in run("q_repetition_windows").collect():
        assert 0 <= r["n_rep_chunks"] <= r["n_chunks"]
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert r["rep_bp"] == r["n_rep_chunks"] * 10000 // r["n_chunks"]
        assert r["flagged_bp"] == r["n_flagged"] * 10000 // r["n_docs"]


def test_fertility_bytes_consistent_with_token_fertility(run):
    """The byte view and the word view must agree on the shared
    word/BPE counts per (lang, source) — same regexes, same groups."""
    b = {(r["lang"], r["source"]): r for r in run("q_fertility_bytes").collect()}
    w = {(r["lang"], r["source"]): r for r in run("q_token_fertility").collect()}
    assert set(b) == set(w)
    for k in b:
        assert b[k]["n_words"] == w[k]["n_words"]
        assert b[k]["n_bpe"] == w[k]["n_bpe"]
        assert b[k]["n_docs"] == w[k]["n_docs"]
        # bytes >= chars for any UTF-8 text
        assert b[k]["n_bytes"] >= w[k]["sum_chars"]


def test_dup_width_curve_monotone_and_conserving(run):
    """Duplicated-instance counts can only FALL as the window widens:
    every position opening a duplicated (w+1)-window also opens a
    duplicated w-window (its w-prefix repeats wherever the full window
    does), so the dup-position set shrinks with w — an injective map
    into the narrower width's instances. (The bp RATIO is NOT
    guaranteed monotone — short docs drop out of the denominator as w
    grows — so it is deliberately unasserted.) Plus conservation:
    n_dup_windows >= 2·n_fp_dup, n_fp_dup <= n_fp <= n_windows."""
    rows = {r["w"]: r for r in run("q_dup_width_curve").collect()}
    from kafka_to_parquet_spark.operators.batch10 import DW_WIDTHS

    assert sorted(rows) == sorted(DW_WIDTHS)
    for col in ("n_windows", "n_dup_windows"):
        seq = [rows[w][col] for w in sorted(rows)]
        assert all(a >= b for a, b in zip(seq, seq[1:])), (col, seq)
    for r in rows.values():
        assert r["n_fp_dup"] <= r["n_fp"] <= r["n_windows"]
        assert r["n_dup_windows"] >= 2 * r["n_fp_dup"]


def test_filter_venn_partitions_the_corpus(run, spark, sf_dir):
    """The 2^3 cells are a partition of documents: shares sum to
    ~10000 bp and doc counts sum to the table's row count exactly."""
    from kafka_to_parquet_spark.tables import load

    rows = run("q_filter_venn").collect()
    n_total = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    cells = {(r["f_quality"], r["f_dedup"], r["f_decon"]) for r in rows}
    assert len(cells) == len(rows), "duplicate Venn cell"
    for r in rows:
        assert r["share_bp"] == r["n_docs"] * 10000 // n_total
