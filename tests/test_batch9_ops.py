"""Invariant tests for the round-10 batch9 operators. Every one of
these queries is hash-verified against the DuckDB oracle (the driver
gate); these tests guard the invariants a refactor could silently
break between oracle runs — monotonicity, conservation, symmetry, and
the two-level-equals-naive decompositions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_to_parquet_spark import registry

registry.load_all()

BATCH9 = [
    "q_mix_curriculum", "q_pack_sequences", "q_entropy_filter",
    "q_pii_scrub", "q_changepoint_cusum", "q_link_adamic_adar",
    "q_knn_classify", "q_lm_bigram_logprob", "q_dedup_span_maximal",
    "q_suffix_lrs", "q_cluster_dbscan_grid", "q_stream_minhash_incr",
    "q_coreset_kcenter", "q_select_budget", "q_pad_waste_buckets",
    "q_source_ngram_leak",
]


@pytest.mark.parametrize("name", BATCH9)
def test_batch9_query_runs_with_stable_schema(run, name):
    df = run(name)
    rows = df.collect()
    assert df.columns, name
    # every batch9 query produces output on the fixture (the oracle
    # hash-match pins the VALUES; this pins non-degeneracy)
    assert len(rows) > 0, f"{name} returned no rows at sf0.001"


def test_coreset_radius_monotone_and_centers_distinct(run):
    rows = {r["step"]: r for r in run("q_coreset_kcenter").collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    radii = [rows[k]["radius_sq"] for k in sorted(rows)]
    # adding a center can only shrink (or hold) the covering radius
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii
    assert all(r >= 0 for r in radii)
    centers = [rows[k]["center_id"] for k in sorted(rows)]
    assert len(set(centers)) == len(centers), "duplicate center chosen"


def test_coreset_seed_is_min_vec_id(run, spark, sf_dir):
    from kafka_to_parquet_spark.tables import load

    seed = run("q_coreset_kcenter").filter(F.col("step") == 1).collect()[0]
    mn = load(spark, sf_dir, "embeddings").agg(F.min("vec_id")).collect()[0][0]
    assert seed["center_id"] == mn


def test_select_budget_two_level_equals_naive_global_window(run, spark, sf_dir):
    """The banded two-level prefix sum must reproduce the naive
    row_number-over-everything selection EXACTLY (same doc set, hence
    the same per-source report)."""
    from kafka_to_parquet_spark.functions.text import q_text_quality
    from kafka_to_parquet_spark.operators.batch9 import BUDGET_PCT
    from kafka_to_parquet_spark.tables import load

    scored = q_text_quality(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    t = docs.join(scored, "doc_id")
    budget = t.agg(
        F.expr(f"CAST(sum(n_tokens) AS BIGINT) * {BUDGET_PCT} DIV 100").alias("b")
    ).collect()[0]["b"]
    w = Window.orderBy(F.desc("quality_score"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    naive = (
        t.withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= budget)
        .groupBy("source")
        .agg(F.count("*").alias("n_sel"), F.sum("n_tokens").alias("tok_sel"))
    )
    naive_map = {r["source"]: (r["n_sel"], r["tok_sel"]) for r in naive.collect()}
    got = {
        r["source"]: (r["n_sel"], r["tok_sel"])
        for r in run("q_select_budget").collect()
        if r["n_sel"] > 0
    }
    assert got == naive_map


def test_select_budget_respects_budget_and_bounds(run):
    rows = run("q_select_budget").collect()
    tot_tok = sum(r["tok_src"] for r in rows)
    sel_tok = sum(r["tok_sel"] for r in rows)
    from kafka_to_parquet_spark.operators.batch9 import BUDGET_PCT

    assert sel_tok <= tot_tok * BUDGET_PCT // 100
    for r in rows:
        assert 0 <= r["n_sel"] <= r["n_src"]
        assert 0 <= r["tok_sel"] <= r["tok_src"]
        assert 0 <= r["sel_docs_bp"] <= 10000
        assert 0 <= r["sel_tok_bp"] <= 10000


def test_pad_waste_conserves_real_tokens_across_strategies(run):
    rows = {r["strategy"]: r for r in run("q_pad_waste_buckets").collect()}
    assert set(rows) == {"global_max", "pow2", "linear64"}
    real = {r["real_tokens"] for r in rows.values()}
    ndocs = {r["n_docs"] for r in rows.values()}
    assert len(real) == 1 and len(ndocs) == 1, "strategies saw different corpora"
    assert rows["global_max"]["n_buckets"] == 1
    for r in rows.values():
        assert r["pad_tokens"] >= 0
        assert 0 <= r["waste_bp"] < 10000


def test_ngram_leak_symmetric_and_bounded(run):
    rows = run("q_source_ngram_leak").collect()
    shared = {(r["src_a"], r["src_b"]): r["n_shared"] for r in rows}
    for (a, b), n in shared.items():
        assert a != b
        # intersection counts are symmetric even though leak_bp is not
        assert shared.get((b, a)) == n, (a, b)
    for r in rows:
        assert 0 < r["n_shared"] <= r["n_fp_a"]
        assert 0 < r["leak_bp"] <= 10000 or r["n_shared"] * 10000 < r["n_fp_a"]


BATCH9_D = ["q_dedup_url", "q_quality_ensemble"]


@pytest.mark.parametrize("name", BATCH9_D)
def test_batch9_group_d_runs(run, name):
    df = run(name)
    assert df.columns and len(df.collect()) > 0, name


def test_dedup_url_groups_collapse_expected_variants(run):
    """By construction every FULL synthesis group of 8 reports TWO
    groups: the base group — plain/HOST-case/port/slash/utm spellings
    (5 distinct raw forms) onto the v0 canonical URL — and the
    params pair ('?b=2&a=1#frag' + '?a=1&b=2', 2 raw forms, pinning
    fragment-strip + param-sort), while the upper-cased-PATH variant
    stays a filtered singleton. keeper of a base group is the v0 doc
    (doc_id % 8 == 0); keeper of a params group is its v5 doc."""
    rows = run("q_dedup_url").collect()
    assert rows, "no dup groups reported"
    for r in rows:
        assert r["n_urls"] >= 2
        assert r["n_raw_forms"] == r["n_urls"], "raw spellings must all differ"
        assert r["keeper"] % 8 in (0, 5), "keeper must be the v0 or v5 doc"
    base = [r for r in rows if r["n_urls"] == 5]
    pairs = [r for r in rows if r["n_urls"] == 2 and "?a=1&b=2" in r["canon_url"]]
    # only a tail partial group may deviate from the 5+2 structure
    assert len(base) + len(pairs) >= len(rows) - 1
    assert pairs, "param-sort pair groups missing — sort rule unpinned"
    for r in pairs:
        assert "#" not in r["canon_url"], "fragment survived canonicalization"


def test_quality_ensemble_attribution_identities(run):
    rows = {r["rule"]: r for r in run("q_quality_ensemble").collect()}
    assert set(rows) == {"any", "len", "ttr", "stop", "digit"}
    any_row = rows.pop("any")
    per = list(rows.values())
    # union bounds: max single rule <= any <= sum of rules
    assert max(r["n_flagged"] for r in per) <= any_row["n_flagged"]
    assert any_row["n_flagged"] <= sum(r["n_flagged"] for r in per)
    # a doc with exactly one flag is solo for exactly one rule
    assert sum(r["n_solo"] for r in per) == any_row["n_solo"]
    for r in list(per) + [any_row]:
        assert 0 <= r["n_solo"] <= r["n_flagged"]
        assert 0 <= r["flagged_bp"] <= 10000


def test_url_canon_recipe_edge_cases_match_across_engines(spark):
    """The shared canonicalization recipe must agree between engines
    on edges the synthesized corpus doesn't fully exercise: http:80,
    non-default port KEPT, mixed utm+real params, bare host, deep
    trailing slashes, fragment-only suffix."""
    import duckdb

    from kafka_to_parquet_spark.operators.batch9 import _url_canon_sql

    cases = {
        "http://Host.COM:80/a": "http://host.com/a",
        "https://h.com:8443/a": "https://h.com:8443/a",
        "https://h.com/a?utm_x=1&z=9&a=2": "https://h.com/a?a=2&z=9",
        "https://h.com": "https://h.com/",
        "https://h.com/a///": "https://h.com/a",
        "https://h.com/a#sec": "https://h.com/a",
        "HTTP://H.COM/A/b?utm_source=s": "http://h.com/A/b",
    }
    con = duckdb.connect()
    for raw, want in cases.items():
        got_duck = con.execute(
            "SELECT " + _url_canon_sql(f"'{raw}'", duck=True)
        ).fetchone()[0]
        got_spark = spark.sql(
            "SELECT " + _url_canon_sql(f"'{raw}'", duck=False)
        ).collect()[0][0]
        assert got_duck == got_spark == want, (raw, got_duck, got_spark, want)


def test_suffix_lrs_corner_corpora(spark, tmp_path, monkeypatch):
    """round-11 rewrite (seeded levels + batched bracket probe) corner
    coverage the fixture can't reach: LRS below the seed gram length
    (seed retries downward), LRS == 1 (only a token repeats), and a
    corpus with no repeat at all (empty report). Values are pinned by
    a hand-computable corpus; the sf fixtures pin the big-path hash
    via the driver oracle."""
    import os

    from kafka_to_parquet_spark.operators.batch9 import q_suffix_lrs

    def write_docs(rows, name):
        p = str(tmp_path / name)
        os.makedirs(p, exist_ok=True)
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(os.path.join(p, "documents.parquet"))
        return p

    # LRS = 3 ("b c d" twice) < 8 = 2^SFX_START: the k=3 and k=2 seeds
    # are empty, the k=1 seed carries it.
    sf1 = write_docs(
        [(1, "a b c d x"), (2, "y b c d")], "lrs3"
    )
    got = {(r.lrs_len, r.phrase, r.n_occ) for r in q_suffix_lrs(spark, sf1).collect()}
    assert got == {(3, "b c d", 2)}

    # LRS = 1: no bigram repeats, token "q" repeats twice.
    sf2 = write_docs([(1, "q w e"), (2, "r q t")], "lrs1")
    got = {(r.lrs_len, r.phrase, r.n_occ) for r in q_suffix_lrs(spark, sf2).collect()}
    assert got == {(1, "q", 2)}

    # No repeat at all: empty report, stable schema.
    sf3 = write_docs([(1, "a b"), (2, "c d")], "lrs0")
    df = q_suffix_lrs(spark, sf3)
    assert df.columns == ["lrs_len", "phrase", "n_occ"]
    assert df.count() == 0

    # LRS spanning a doubling round above the seed: 17-token repeat
    # needs level 4 (16) + offset 1.
    seq = " ".join(f"t{i}" for i in range(17))
    sf4 = write_docs([(1, seq + " u1"), (2, seq + " u2")], "lrs17")
    got = {(r.lrs_len, r.phrase, r.n_occ) for r in q_suffix_lrs(spark, sf4).collect()}
    assert got == {(17, seq, 2)}


def test_dbscan_grid_warm_cache_second_invocation(run, spark, sf_dir):
    """Round-15 regression guard: cell/core/adj live in a registered
    feature cache, so a SECOND same-session invocation takes the
    warm-cache path — which must still build the border/noise joins
    (the first r15 cut left ``offs`` defined only inside the cold
    branch and the warm path raised UnboundLocalError). Rows must be
    identical run-over-run."""
    first = sorted(map(tuple, run("q_cluster_dbscan_grid").collect()))
    second = sorted(map(tuple, run("q_cluster_dbscan_grid").collect()))
    assert first == second
    from kafka_to_parquet_spark.cache import clear_result_caches

    # the result-level boundary (bench protocol) must not break the
    # warm feature path either
    clear_result_caches(spark, sf_dir)
    third = sorted(map(tuple, run("q_cluster_dbscan_grid").collect()))
    assert first == third
