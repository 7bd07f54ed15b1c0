"""Round-6 eleventh batch: word burstiness, vocab coverage curve,
degree assortativity, churn-risk flags. Python recompute at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from kafka_to_parquet_spark.tables import load


def rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_word_burstiness_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.corpus_stats import BURST_MIN_DF, BURST_TOP

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    cf: Counter = Counter()
    dfc: Counter = Counter()
    for r in docs:
        words = r.text.lower().split()
        cf.update(words)
        dfc.update(set(words))
    rows = [(w, cf[w], dfc[w], cf[w] * 1_000_000 // dfc[w])
            for w in cf if dfc[w] >= BURST_MIN_DF]
    rows.sort(key=lambda t: (-t[3], t[0]))
    want = rows[:BURST_TOP]
    got = [(r.word, r.cf, r.df, r.burst_ppm)
           for r in run("q_word_burstiness").collect()]
    assert got == want
    assert got[0][3] > 1_000_000  # something actually bursts


def test_vocab_coverage_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.corpus_stats import COVER_KS

    docs = load(spark, sf_dir, "documents").select("text").collect()
    cnt: Counter = Counter()
    for r in docs:
        cnt.update(r.text.lower().split())
    order = sorted(cnt, key=lambda w: (-cnt[w], w))
    tot = sum(cnt.values())
    got = {r.k: (r.k_eff, r.head_tokens, r.total_tokens, r.cover_ppm)
           for r in run("q_vocab_coverage").collect()}
    assert set(got) == set(COVER_KS)
    for k in COVER_KS:
        k_eff = min(k, len(order))
        head = sum(cnt[w] for w in order[:k_eff])
        assert got[k] == (k_eff, head, tot, head * 1_000_000 // tot)
    # coverage must be monotone and meaningful under Zipf
    ppms = [got[k][3] for k in sorted(COVER_KS)]
    assert ppms == sorted(ppms) and ppms[-1] > 500_000


def _edges(spark, sf_dir):
    o = {r.o_orderkey: r.o_custkey for r in
         load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()}
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").collect()
    und = {(o[r.l_orderkey] * 2, r.l_suppkey * 2 + 1) for r in li}
    return und | {(b, a) for a, b in und}


def test_graph_assortativity_matches_python(run, spark, sf_dir):
    edges = _edges(spark, sf_dir)
    deg: Counter = Counter(s for s, _ in edges)
    n = len(edges)
    sx = sum(deg[s] for s, _ in edges)
    sy = sum(deg[d] for _, d in edges)
    sxx = sum(deg[s] ** 2 for s, _ in edges)
    syy = sum(deg[d] ** 2 for _, d in edges)
    sxy = sum(deg[s] * deg[d] for s, d in edges)
    r = (float(n) * sxy - float(sx) * sy) / math.sqrt(
        (float(n) * sxx - float(sx) * sx) * (float(n) * syy - float(sy) * sy))
    rows = run("q_graph_assortativity").collect()
    assert len(rows) == 1
    assert (rows[0].n_directed_edges, rows[0].assort_micro) == (n, rnd(1e6 * r))
    # symmetrized edge list => x/y moments coincide
    assert sx == sy and sxx == syy


def test_churn_flags_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.timeseries import CHURN_MIN_GAPS

    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey").collect()
    per: defaultdict = defaultdict(list)
    for r in o:
        per[r.o_custkey].append(
            (math.floor(r.o_orderdate.timestamp()) // 86400, r.o_orderkey))
    ref = max(d for seq in per.values() for d, _ in seq)
    n_eval = n_risk = 0
    for seq in per.values():
        seq.sort()
        gaps = [d1 - d0 for (d0, _), (d1, _) in zip(seq, seq[1:])]
        if len(gaps) < CHURN_MIN_GAPS:
            continue
        gaps.sort()
        m = len(gaps)
        if m % 2:
            med2 = 2 * gaps[m // 2]
        else:
            med2 = gaps[m // 2 - 1] + gaps[m // 2]
        n_eval += 1
        if ref - seq[-1][0] > med2:
            n_risk += 1
    rows = run("q_churn_flags").collect()
    assert len(rows) == 1
    assert (rows[0].n_eval, rows[0].n_at_risk, rows[0].risk_ppm) == (
        n_eval, n_risk, n_risk * 1_000_000 // n_eval)
    assert n_eval > 100  # the fixture has repeat customers
