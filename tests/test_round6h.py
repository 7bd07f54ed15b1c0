"""Round-6 eighth batch: association rules, HHI concentration,
Spearman rank correlation, burstiness/Fano, co-occurrence PMI,
stratified sampling. Python recompute at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date
from itertools import combinations

from kafka_to_parquet_spark.tables import load


def rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_assoc_rules_matches_python(run, spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    pt = {r.p_partkey: r.p_brand for r in
          load(spark, sf_dir, "part").select("p_partkey", "p_brand").collect()}
    baskets: defaultdict = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(pt[r.l_partkey])
    n_orders = len(baskets)
    c: Counter = Counter()
    c_ab: Counter = Counter()
    for brands in baskets.values():
        for b in brands:
            c[b] += 1
        for a, b in combinations(sorted(brands), 2):
            c_ab[(a, b)] += 1
    got = {(r.brand_a, r.brand_b): (r.c_ab, r.support_ppm, r.conf_ppm, r.lift_ppm)
           for r in run("q_assoc_rules").collect()}
    assert set(got) == set(c_ab)
    for (a, b), cab in c_ab.items():
        conf = cab * 1_000_000 // c[a]
        assert got[(a, b)] == (
            cab, cab * 1_000_000 // n_orders, conf, conf * n_orders // c[b]
        )
    assert len(got) > 10  # the fixture must exercise real co-purchases


def test_hhi_concentration_matches_python(run, spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice").collect()
    ptype = {r.p_partkey: r.p_type for r in
             load(spark, sf_dir, "part").select("p_partkey", "p_type").collect()}
    snat = {r.s_suppkey: r.s_nationkey for r in
            load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey").collect()}
    nname = {r.n_nationkey: r.n_name for r in
             load(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()}
    rev: Counter = Counter()
    for r in li:
        rev[(ptype[r.l_partkey], nname[snat[r.l_suppkey]])] += rnd(
            r.l_extendedprice * 100)
    markets: defaultdict = defaultdict(dict)
    for (m, f), v in rev.items():
        markets[m][f] = v
    got = {r.market: (r.n_firms, r.rev_cents, r.hhi_ppm, r.cr4_ppm)
           for r in run("q_hhi_concentration").collect()}
    assert set(got) == set(markets)
    for m, firms in markets.items():
        tot = sum(firms.values())
        shares = {f: v * 1_000_000 // tot for f, v in firms.items()}
        hhi = sum(s * s for s in shares.values()) // 1_000_000
        top4 = sorted(firms, key=lambda f: (-firms[f], f))[:4]
        assert got[m] == (len(firms), tot, hhi, sum(shares[f] for f in top4))


def test_spearman_corr_matches_python(run, spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount").collect()
    cells: Counter = Counter()
    for r in li:
        cells[(r.l_returnflag, int(r.l_quantity), rnd(r.l_discount * 100))] += 1
    flags = {f for f, _, _ in cells}
    got = {r.l_returnflag: (r.n, r.rho_micro)
           for r in run("q_spearman_corr").collect()}
    for fl in flags:
        mx: Counter = Counter()
        my: Counter = Counter()
        for (f, x, y), cnt in cells.items():
            if f == fl:
                mx[x] += cnt
                my[y] += cnt
        n = sum(mx.values())

        def rank_ppm(marg: Counter) -> dict:
            out, before = {}, 0
            for v in sorted(marg):
                out[v] = (2 * before + marg[v] + 1) * 1_000_000 // (2 * n)
                before += marg[v]
            return out

        rx, ry = rank_ppm(mx), rank_ppm(my)
        sx = sy = sxx = syy = sxy = 0
        for (f, x, y), cnt in cells.items():
            if f == fl:
                sx += cnt * rx[x]
                sy += cnt * ry[y]
                sxx += cnt * rx[x] * rx[x]
                syy += cnt * ry[y] * ry[y]
                sxy += cnt * rx[x] * ry[y]
        vx = float(n) * sxx - float(sx) * sx
        vy = float(n) * syy - float(sy) * sy
        if not (vx > 0 and vy > 0):
            assert fl not in got
            continue
        rho = (float(n) * sxy - float(sx) * sy) / math.sqrt(vx * vy)
        assert got[fl] == (n, rnd(1e6 * rho))
    assert len(got) == 3


def test_burstiness_matches_python(run, spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("ts", "event_type").collect()
    cnt: Counter = Counter()
    hours = []
    for r in ev:
        eh = (r.ts.date() - date(1970, 1, 1)).days * 24 + r.ts.hour
        cnt[(r.event_type, eh)] += 1
        hours.append(eh)
    g = max(hours) - min(hours) + 1
    types = {t for t, _ in cnt}
    got = {r.event_type: (r.g, r.n_events, r.active_hours, r.occupancy_ppm,
                          r.fano_micro, r.overdispersed)
           for r in run("q_burstiness").collect()}
    assert set(got) == types
    for t in types:
        cs = [c for (tt, _), c in cnt.items() if tt == t]
        s, ss, nh = sum(cs), sum(c * c for c in cs), len(cs)
        fano = rnd(1e6 * (float(g) * ss - float(s) * s) / (float(g) * s))
        assert got[t] == (g, s, nh, nh * 1_000_000 // g, fano,
                          1 if g * ss - s * s > g * s else 0)


def test_cooccur_pmi_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.corpus_stats import COOC_K

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    n_docs = len(docs)
    dw = {(r.doc_id, w) for r in docs for w in r.text.lower().split()}
    df: Counter = Counter(w for _, w in dw)
    top = sorted(df, key=lambda w: (-df[w], w))[:COOC_K]
    tset = set(top)
    per_doc: defaultdict = defaultdict(set)
    for d, w in dw:
        if w in tset:
            per_doc[d].add(w)
    c_ab: Counter = Counter()
    for words in per_doc.values():
        for a, b in combinations(sorted(words), 2):
            c_ab[(a, b)] += 1
    got = {(r.word_a, r.word_b): (r.c_ab, r.df_a, r.df_b, r.pmi_micro)
           for r in run("q_cooccur_pmi").collect()}
    assert set(got) == set(c_ab)
    for (a, b), cab in c_ab.items():
        pmi = rnd(1e6 * math.log((float(cab) * n_docs) / (float(df[a]) * df[b])))
        assert got[(a, b)] == (cab, df[a], df[b], pmi)
    assert len(got) > 50  # head words co-occur densely in the fixture


def test_stratified_sample_matches_python(run, spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars").collect()
    n: Counter = Counter(r.lang for r in docs)
    target = min(n.values())
    thr = {lang: target * 1_000_000 // cnt for lang, cnt in n.items()}
    kept: Counter = Counter()
    kept_chars: Counter = Counter()
    for r in docs:
        if (r.doc_id * 2654435761) % 1_000_000 < thr[r.lang]:
            kept[r.lang] += 1
            kept_chars[r.lang] += r.n_chars
    got = {r.lang: (r.n_docs, r.thr_ppm, r.n_kept, r.realized_ppm, r.kept_chars)
           for r in run("q_stratified_sample").collect()}
    assert set(got) == set(n)
    for lang in n:
        assert got[lang] == (n[lang], thr[lang], kept[lang],
                             kept[lang] * 1_000_000 // n[lang], kept_chars[lang])
    # the whole point: realized rates should land near the quota
    for lang in n:
        assert abs(got[lang][3] - thr[lang]) < 250_000
