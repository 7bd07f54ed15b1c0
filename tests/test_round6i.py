"""Round-6 ninth batch: Kendall tau-b, Markov transition entropy,
last-touch attribution, longest streaks, RFM segmentation, KMV
distinct sketch. Python recompute at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from kafka_to_parquet_spark.tables import load


def rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_kendall_tau_matches_python(run, spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount").collect()
    cells: Counter = Counter()
    for r in li:
        cells[(r.l_returnflag, int(r.l_quantity), rnd(r.l_discount * 100))] += 1
    got = {r.l_returnflag: (r.n, r.conc, r.disc, r.tau_micro)
           for r in run("q_kendall_tau").collect()}
    flags = {f for f, _, _ in cells}
    for fl in flags:
        fc = [(x, y, c) for (f, x, y), c in cells.items() if f == fl]
        conc = disc = 0
        for xa, ya, ca in fc:
            for xb, yb, cb in fc:
                if xa < xb:
                    if ya < yb:
                        conc += ca * cb
                    elif ya > yb:
                        disc += ca * cb
        n = sum(c for _, _, c in fc)
        mx: Counter = Counter()
        my: Counter = Counter()
        for x, y, c in fc:
            mx[x] += c
            my[y] += c
        n0 = n * (n - 1) // 2
        n1 = sum(t * (t - 1) // 2 for t in mx.values())
        n2 = sum(t * (t - 1) // 2 for t in my.values())
        if not (n0 > n1 and n0 > n2):
            assert fl not in got
            continue
        tau = (float(conc) - disc) / math.sqrt(
            (float(n0) - n1) * (float(n0) - n2))
        assert got[fl] == (n, conc, disc, rnd(1e6 * tau))
    assert len(got) == 3


def _ordered_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type").collect()
    by_user: defaultdict = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(
            (math.floor(r.ts.timestamp()), r.event_id, r.event_type))
    for seq in by_user.values():
        seq.sort()
    return by_user


def test_markov_entropy_matches_python(run, spark, sf_dir):
    by_user = _ordered_events(spark, sf_dir)
    cells: Counter = Counter()
    for seq in by_user.values():
        for (_, _, cur), (_, _, nxt) in zip(seq, seq[1:]):
            cells[(cur, nxt)] += 1
    nc: Counter = Counter()
    for (cur, _), c in cells.items():
        nc[cur] += c
    got = {r.cur_type: (r.n_trans, r.n_next, r.h_micro)
           for r in run("q_markov_entropy").collect()}
    assert set(got) == set(nc)
    for cur in nc:
        terms = [rnd(1e6 * (float(c) / nc[cur]) * math.log(float(c) / nc[cur]))
                 for (cu, _), c in cells.items() if cu == cur]
        assert got[cur] == (nc[cur], len(terms), -sum(terms))


def test_attribution_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.timeseries import ATTR_WINDOW_SECS

    by_user = _ordered_events(spark, sf_dir)
    want: Counter = Counter()
    for seq in by_user.values():
        last = None  # (es, event_id, type) of latest non-purchase so far
        for es, eid, typ in seq:
            if typ == "purchase":
                if last is not None and es - last[0] <= ATTR_WINDOW_SECS:
                    want[last[2]] += 1
                else:
                    want["(none)"] += 1
            else:
                last = (es, eid, typ)
    tot = sum(want.values())
    got = {r.channel: (r.n_purchases, r.share_ppm)
           for r in run("q_attribution").collect()}
    assert got == {ch: (n, n * 1_000_000 // tot) for ch, n in want.items()}
    assert len(got) >= 3  # several channels must actually win credit


def test_streak_longest_matches_python(run, spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts").collect()
    days: defaultdict = defaultdict(set)
    for r in ev:
        days[r.user_id].add(math.floor(r.ts.timestamp()) // 86400)
    hist: Counter = Counter()
    for ds in days.values():
        best = cur = 1
        prev = None
        for d in sorted(ds):
            cur = cur + 1 if prev is not None and d == prev + 1 else 1
            best = max(best, cur)
            prev = d
        hist[best] += 1
    got = {r.streak: r.n_users for r in run("q_streak_longest").collect()}
    assert got == dict(hist)


def _disc_cuts(values: list, tiles: int = 5) -> list:
    """SQL-standard percentile_disc cut points: for p = k/tiles the
    smallest value whose cume_dist >= p, i.e. the ceil(p*n)-th smallest
    (the rule q_rfm_segments shares between Spark and DuckDB)."""
    s = sorted(values)
    n = len(s)
    return [s[math.ceil(k / tiles * n) - 1] for k in range(1, tiles)]


def _quintile(x: int, cuts: list) -> int:
    return 1 + sum(1 for c in cuts if x > c)


def test_rfm_segments_matches_python(run, spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice").collect()
    last: dict = {}
    freq: Counter = Counter()
    mon: Counter = Counter()
    for r in o:
        es = math.floor(r.o_orderdate.timestamp())
        ck = r.o_custkey
        last[ck] = max(last.get(ck, 0), es)
        freq[ck] += 1
        mon[ck] += rnd(r.o_totalprice * 100)
    ref = max(last.values())
    rec = {ck: (ref - es) // 86400 for ck, es in last.items()}
    cks = list(last)
    rc = _disc_cuts([rec[c] for c in cks])
    fc = _disc_cuts([-freq[c] for c in cks])
    mc = _disc_cuts([-mon[c] for c in cks])
    r_q = {c: _quintile(rec[c], rc) for c in cks}
    f_q = {c: _quintile(-freq[c], fc) for c in cks}
    m_q = {c: _quintile(-mon[c], mc) for c in cks}
    want: defaultdict = defaultdict(lambda: [0, 0, None, None])
    for ck in cks:
        cell = want[(r_q[ck], f_q[ck], m_q[ck])]
        cell[0] += 1
        cell[1] += mon[ck]
        cell[2] = rec[ck] if cell[2] is None else min(cell[2], rec[ck])
        cell[3] = rec[ck] if cell[3] is None else max(cell[3], rec[ck])
    got = {(r.r_q, r.f_q, r.m_q):
           (r.n_customers, r.mon_cents, r.min_recency_d, r.max_recency_d)
           for r in run("q_rfm_segments").collect()}
    assert got == {k: tuple(v) for k, v in want.items()}
    assert sum(v[0] for v in want.values()) == len(cks)


def h31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2_147_483_647


def test_kmv_distinct_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.corpus_stats import KMV_K
    from kafka_to_parquet_spark.functions.hashes import H31_P

    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    per: defaultdict = defaultdict(set)
    for r in docs:
        for w in r.text.lower().split():
            per[r.source].add(w)
    per["ALL"] = set().union(*per.values())
    got = {r.source: (r.n_exact, r.est, r.err_ppm)
           for r in run("q_kmv_distinct").collect()}
    assert set(got) == set(per)
    for src, words in per.items():
        hv = sorted({h31(w) for w in words})
        exact = len(words)
        est = (KMV_K - 1) * H31_P // hv[KMV_K - 1] if len(hv) >= KMV_K else exact
        assert got[src] == (exact, est, abs(est - exact) * 1_000_000 // exact)
        # the sketch must actually be close (K=256 → ~6% expected error)
        assert abs(est - exact) * 1_000_000 // exact < 200_000
