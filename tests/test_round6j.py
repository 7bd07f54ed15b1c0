"""Round-6 tenth batch: BFS levels, survival curve, cohort LTV,
Laspeyres price index, repurchase gaps. Python recompute at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from kafka_to_parquet_spark.tables import load


def rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_bfs_levels_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.graph import _BFS_ROUNDS

    o = {r.o_orderkey: r.o_custkey for r in
         load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()}
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").collect()
    adj: defaultdict = defaultdict(set)
    for r in li:
        c, s = o[r.l_orderkey] * 2, r.l_suppkey * 2 + 1
        adj[c].add(s)
        adj[s].add(c)
    seed = min(adj)
    lvl = {seed: 0}
    frontier = {seed}
    for k in range(1, _BFS_ROUNDS + 1):
        nxt = set()
        for n in frontier:
            for m in adj[n]:
                if m not in lvl:
                    lvl[m] = k
                    nxt.add(m)
        frontier = nxt
    hist: Counter = Counter(lvl.values())
    hist[-1] = len(adj) - len(lvl)
    got = {r.lvl: r.n_nodes for r in run("q_bfs_levels").collect()}
    assert got == dict(hist)
    assert got[0] == 1 and 1 in got  # the seed actually expanded


def test_survival_curve_matches_python(run, spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts").collect()
    first: dict = {}
    last: dict = {}
    for r in ev:
        d = math.floor(r.ts.timestamp()) // 86400
        u = r.user_id
        first[u] = min(first.get(u, d), d)
        last[u] = max(last.get(u, d), d)
    spans = [last[u] - first[u] for u in first]
    n = len(spans)
    got = {r.k_days: (r.n_surviving, r.surv_ppm)
           for r in run("q_survival_curve").collect()}
    assert set(got) == set(range(max(spans) + 1))
    for k in got:
        surv = sum(1 for s in spans if s >= k)
        assert got[k] == (surv, surv * 1_000_000 // n)
    assert got[0] == (n, 1_000_000)


def test_cohort_ltv_matches_python(run, spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice").collect()
    rows = [(r.o_custkey,
             r.o_orderdate.year * 12 + r.o_orderdate.month - 1,
             rnd(r.o_totalprice * 100)) for r in o]
    cohort = {}
    for ck, m, _ in rows:
        cohort[ck] = min(cohort.get(ck, m), m)
    rev: Counter = Counter()
    active: defaultdict = defaultdict(set)
    for ck, m, rc in rows:
        key = (cohort[ck], m - cohort[ck])
        rev[key] += rc
        active[key].add(ck)
    size: Counter = Counter(cohort.values())
    got = {(r.cohort_m, r.age_m):
           (r.cohort_n, r.n_active, r.rev_cents, r.cum_rev_cents,
            r.ltv_cents_per_user)
           for r in run("q_cohort_ltv").collect()}
    assert set(got) == set(rev)
    for (cm, age), rc in rev.items():
        cum = sum(v for (c2, a2), v in rev.items() if c2 == cm and a2 <= age)
        assert got[(cm, age)] == (size[cm], len(active[(cm, age)]), rc, cum,
                                  cum // size[cm])


def test_price_index_matches_python(run, spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity").collect()
    brand = {r.p_partkey: r.p_brand for r in
             load(spark, sf_dir, "part").select("p_partkey", "p_brand").collect()}
    rev: Counter = Counter()
    qty: Counter = Counter()
    for r in li:
        key = (brand[r.l_partkey],
               r.l_shipdate.year * 12 + r.l_shipdate.month - 1)
        rev[key] += rnd(r.l_extendedprice * 100)
        qty[key] += int(r.l_quantity)
    m0 = min(m for _, m in rev)
    base = {b: (qty[(b, m)], rev[(b, m)] * 1_000_000 // qty[(b, m)])
            for (b, m) in rev if m == m0}
    months = sorted({m for _, m in rev})
    got = {r.m: (r.n_brands, r.laspeyres_ppm)
           for r in run("q_price_index").collect()}
    assert set(got) == set(months)
    for m in months:
        bs = [b for (b, mm) in rev if mm == m and b in base]
        s1 = sum(base[b][0] * (rev[(b, m)] * 1_000_000 // qty[(b, m)]) for b in bs)
        s0 = sum(base[b][0] * base[b][1] for b in bs)
        assert got[m] == (len(bs), rnd(1e6 * (float(s1) / s0)))
    assert got[m0][1] == 1_000_000  # base month is its own basket


def test_repurchase_gaps_matches_python(run, spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey").collect()
    per: defaultdict = defaultdict(list)
    for r in o:
        per[r.o_custkey].append(
            (math.floor(r.o_orderdate.timestamp()) // 86400, r.o_orderkey))
    hist: Counter = Counter()
    for seq in per.values():
        seq.sort()
        for (d0, _), (d1, _) in zip(seq, seq[1:]):
            hist[d1 - d0] += 1
    tot = sum(hist.values())
    got = {r.gap_days: (r.n_gaps, r.share_ppm)
           for r in run("q_repurchase_gaps").collect()}
    assert got == {g: (n, n * 1_000_000 // tot) for g, n in hist.items()}
