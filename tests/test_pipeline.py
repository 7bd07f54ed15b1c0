"""Training-pipeline composition operator invariants: decontamination,
repetition scoring, PII masking, chunking, splitting, quantization
(llm/pipeline.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_to_parquet_spark.llm.pipeline import BENCH_MOD, CHUNK_TOKENS
from kafka_to_parquet_spark.tables import load


def test_decontaminate_excludes_benchmark(run):
    """Hit rows are non-benchmark docs only, each with >= 1 shared
    n-gram."""
    rows = run("q_decontaminate").collect()
    for r in rows:
        assert r["doc_id"] % BENCH_MOD != 0
        assert r["n_hits"] >= 1


def test_decontaminate_near_dup_of_benchmark_is_caught(spark, sf_dir, run):
    """A doc whose text literally equals a benchmark doc's text (if the
    corpus has one) must be flagged — shared n-grams = all of them."""
    d = load(spark, sf_dir, "documents")
    bench_text = d.filter(F.col("doc_id") % BENCH_MOD == 0).select("text")
    clones = (
        d.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(bench_text, "text")
        .filter(F.size(F.split("text", r"\s+")) >= 5)
        .select("doc_id")
    )
    flagged = run("q_decontaminate").select("doc_id")
    assert clones.join(flagged, "doc_id", "left_anti").count() == 0


def test_repetition_fracs_bounded(run):
    rows = run("q_text_repetition").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_token_frac"] <= 1.0
        assert 0.0 <= r["dup_bigram_frac"] <= 1.0
        # A 31-word vocab with 10-99 tokens/doc forces token reuse.
        assert r["n_bigrams"] >= 0


def test_pii_mask_count_matches_pattern(spark, sf_dir, run):
    """n_masked equals the occurrences of the pattern; fingerprints of
    equal texts are equal."""
    out = run("q_text_pii")
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    j = out.join(d, "doc_id")
    per_text = j.groupBy(F.lower("text")).agg(
        F.countDistinct("masked_fp").alias("nfp")
    )
    assert per_text.filter(F.col("nfp") > 1).count() == 0
    # The fixture's long tokens (>= 8 chars) must actually mask.
    assert j.agg(F.sum("n_masked")).collect()[0][0] > 0


def test_chunks_cover_every_token_once(spark, sf_dir, run):
    """Per doc: sum of chunk token counts == total tokens; every chunk
    except the last is full; chunk ids are dense from 0."""
    from kafka_to_parquet_spark.functions.text import tokens_col

    chunks = run("q_chunk_docs").cache()
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("n_tokens")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tok").alias("covered"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_id").alias("max_id"),
        F.min("chunk_id").alias("min_id"),
    )
    j = per_doc.join(d, "doc_id")
    assert j.filter(F.col("covered") != F.col("n_tokens")).count() == 0
    assert j.filter(F.col("min_id") != 0).count() == 0
    assert j.filter(F.col("max_id") != F.col("n_chunks") - 1).count() == 0
    not_last_short = chunks.join(
        per_doc.select("doc_id", "max_id"), "doc_id"
    ).filter((F.col("chunk_id") != F.col("max_id")) & (F.col("n_tok") != CHUNK_TOKENS))
    assert not_last_short.count() == 0


def test_split_partitions_corpus(spark, sf_dir, run):
    """Splits cover every doc exactly once; ratios are near 80/10/10."""
    out = run("q_split_assign").cache()
    n = load(spark, sf_dir, "documents").count()
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    assert total == n
    by_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    }
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split["train"] / n > 0.6  # hash is uniform-ish, not exact


def test_pack_respects_cap_and_is_greedy(spark, sf_dir, run):
    """No pack exceeds the cap (unless a single oversized doc); packs
    are maximal — the first doc of pack k+1 would have overflowed pack
    k; pack ids are dense from 0 per shard."""
    from kafka_to_parquet_spark.llm.pipeline import PACK_CAP, PACK_SHARDS

    out = run("q_pack_greedy").cache()
    # Hash-uniform sharding: every shard is populated, so the
    # applyInPandas stage really runs PACK_SHARDS-way parallel (the
    # lang-sharded form capped parallelism at #languages).
    assert out.select("shard").distinct().count() == PACK_SHARDS
    per_pack = out.groupBy("shard", "pack_id").agg(
        F.sum("n_tok").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    oversized = per_pack.filter((F.col("tot") > PACK_CAP) & (F.col("n") > 1))
    assert oversized.count() == 0
    # Dense pack ids starting at 0.
    per_shard = out.groupBy("shard").agg(
        F.min("pack_id").alias("mn"),
        F.max("pack_id").alias("mx"),
        F.countDistinct("pack_id").alias("k"),
    )
    assert per_shard.filter((F.col("mn") != 0) | (F.col("mx") != F.col("k") - 1)).count() == 0
    # Greedy maximality: first doc of pack k+1 overflows pack k's total.
    w = Window.partitionBy("shard").orderBy("doc_id")
    seq = out.withColumn("_prev_pack", F.lag("pack_id").over(w))
    firsts = seq.filter(
        (F.col("_prev_pack").isNotNull()) & (F.col("pack_id") != F.col("_prev_pack"))
    ).select("shard", F.col("_prev_pack").alias("pack_id"), F.col("n_tok").alias("first_next"))
    j = firsts.join(per_pack, ["shard", "pack_id"])
    assert j.filter(F.col("tot") + F.col("first_next") <= PACK_CAP).count() == 0
    # Every doc packed exactly once.
    n = load(spark, sf_dir, "documents").count()
    assert out.count() == n


def test_corpus_shuffle_is_dense_permutation(spark, sf_dir, run):
    out = run("q_corpus_shuffle").cache()
    n = load(spark, sf_dir, "documents").count()
    assert out.count() == n
    agg = out.agg(
        F.min("shuffle_rank").alias("mn"),
        F.max("shuffle_rank").alias("mx"),
        F.countDistinct("shuffle_rank").alias("k"),
    ).collect()[0]
    assert (agg["mn"], agg["mx"], agg["k"]) == (1, n, n)
    # Deterministic: a second run yields the identical assignment.
    again = run("q_corpus_shuffle")
    assert out.exceptAll(again).count() == 0


def test_quantize_bounds_and_scale(run):
    """Quantized values live in [-127, 127]; the max |q| of a nonzero
    vector is exactly 127 (the element at amax maps to the boundary)."""
    rows = run("q_embed_quantize").collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        if r["amax_u"] > 0:
            assert max(abs(r["q_min"]), abs(r["q_max"])) == 127
