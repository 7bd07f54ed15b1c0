"""Round-6 sixth batch: Benford audit, correlation matrix, vocabulary
overlap/growth, consumer lag, DAU/WAU, rate spikes, PQ codes. Python
recompute at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date

from kafka_to_parquet_spark.tables import load


def rnd(x: float) -> int:
    """Half-away-from-zero rounding (Spark/DuckDB round() on doubles)."""
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_benford_matches_python(run, spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice").collect()
    cells: Counter = Counter()
    for r in li:
        cents = rnd(r.l_extendedprice * 100)
        cells[(r.l_returnflag, int(str(cents)[0]))] += 1
    tot: Counter = Counter()
    for (f, _), n in cells.items():
        tot[f] += n
    chi2 = {}
    for f, nt in tot.items():
        chi2[f] = sum(
            rnd(1e6 * (cells[(f, d)] - nt * math.log10(1 + 1 / d)) ** 2
                / (nt * math.log10(1 + 1 / d)))
            for d in range(1, 10)
            if (f, d) in cells
        )
    rows = run("q_benford").collect()
    assert len(rows) == len(cells)
    for r in rows:
        assert r.n == cells[(r.l_returnflag, r.digit)]
        assert r.obs_ppm == r.n * 1000000 // tot[r.l_returnflag]
        assert r.benford_ppm == rnd(1e6 * math.log10(1 + 1 / r.digit))
        assert r.chi2_micro == chi2[r.l_returnflag]


def test_corr_matrix_matches_python(run, spark, sf_dir):
    li = load(
        spark, sf_dir, "lineitem"
    ).select("l_quantity", "l_extendedprice", "l_discount", "l_tax").collect()
    vals = {
        "qty": [int(r.l_quantity) for r in li],
        "price": [rnd(r.l_extendedprice) for r in li],
        "disc": [rnd(r.l_discount * 100) for r in li],
        "tax": [rnd(r.l_tax * 100) for r in li],
    }
    n = len(li)

    def corr_micro(x, y):
        sx, sy = sum(vals[x]), sum(vals[y])
        sxx = sum(v * v for v in vals[x])
        syy = sum(v * v for v in vals[y])
        sxy = sum(a * b for a, b in zip(vals[x], vals[y]))
        r = (float(n) * sxy - float(sx) * sy) / math.sqrt(
            (float(n) * sxx - float(sx) * sx) * (float(n) * syy - float(sy) * sy)
        )
        return rnd(1e6 * r)

    got = {(r.var_x, r.var_y): (r.n, r.corr_micro) for r in run("q_corr_matrix").collect()}
    assert len(got) == 6
    for (a, b), (gn, gc) in got.items():
        x, y = sorted((a, b))
        assert gn == n
        assert gc == corr_micro(x, y)
    # sanity: every r must land in [-1, 1] micro units (the fixture's
    # measures are generated independently, so no magnitude assumption)
    assert all(abs(c) <= 1_000_000 for _, c in got.values())


def test_source_vocab_overlap_matches_python(run, spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    vocab = defaultdict(set)
    for r in docs:
        vocab[r.source].update(t for t in r.text.lower().split() if t)
    rows = run("q_source_vocab_overlap").collect()
    seen = set()
    for r in rows:
        assert r.src_a < r.src_b
        inter = len(vocab[r.src_a] & vocab[r.src_b])
        union = len(vocab[r.src_a] | vocab[r.src_b])
        assert (r.n_common, r.n_union) == (inter, union)
        assert r.jaccard_mu == math.floor(inter / union * 1e6 + 0.5)
        seen.add((r.src_a, r.src_b))
    # every source pair with a non-empty intersection must be present
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            if vocab[a] & vocab[b]:
                assert (a, b) in seen


def test_vocab_growth_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.corpus_stats import GROWTH_BUCKETS

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    mx = max(r.doc_id for r in docs)
    first = {}
    per_bucket_docs: Counter = Counter()
    per_bucket_toks: Counter = Counter()
    for r in sorted(docs, key=lambda r: r.doc_id):
        b = r.doc_id * GROWTH_BUCKETS // (mx + 1)
        toks = [t for t in r.text.lower().split() if t]
        per_bucket_docs[b] += 1
        per_bucket_toks[b] += len(toks)
        for t in toks:
            first.setdefault(t, b)
    per_bucket_new: Counter = Counter(first.values())
    rows = sorted(run("q_vocab_growth").collect(), key=lambda r: r.bucket)
    dc = tc = vc = 0
    by_bucket = {r.bucket: r for r in rows}
    for b in sorted(per_bucket_docs):
        dc += per_bucket_docs[b]
        tc += per_bucket_toks[b]
        vc += per_bucket_new[b]
        r = by_bucket[b]
        assert (r.docs_cum, r.tokens_cum, r.vocab_cum) == (dc, tc, vc)
    # final checkpoint must equal the corpus-wide totals
    assert rows[-1].vocab_cum == len(first)
    assert rows[-1].docs_cum == len(docs)


def test_consumer_lag_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.sources.kafka_analog import BATCH_SIZE, N_PARTITIONS

    ev = load(spark, sf_dir, "events").select("event_id").collect()
    parts = defaultdict(list)
    for r in ev:
        parts[r.event_id % N_PARTITIONS].append(r.event_id)
    rows = {r.partition: r for r in run("q_consumer_lag").collect()}
    assert set(rows) == set(parts)
    for p, offs in parts.items():
        offs.sort()
        n = len(offs)
        r = rows[p]
        assert r.n_msgs == n
        assert r.end_offset == offs[-1]
        assert r.batches_committed == n // BATCH_SIZE
        assert r.uncommitted == n % BATCH_SIZE
        k = (n // BATCH_SIZE) * BATCH_SIZE
        assert r.committed_offset == (offs[k - 1] if k else None)


def test_active_users_matches_python(run, spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("ts", "user_id").collect()
    du = {( (r.ts.date() - date(1970, 1, 1)).days, r.user_id) for r in ev}
    days = {d for d, _ in du}
    mn, mx = min(days), max(days)
    dau = Counter(d for d, _ in du)
    wau_sets = defaultdict(set)
    for d, u in du:
        for i in range(7):
            if mn <= d + i <= mx:
                wau_sets[d + i].add(u)
    rows = {r.dnum: r for r in run("q_active_users").collect()}
    assert set(rows) == set(wau_sets)
    for d, r in rows.items():
        assert r.dau == dau.get(d, 0)
        assert r.wau == len(wau_sets[d])
        assert r.stickiness_ppm == dau.get(d, 0) * 1000000 // len(wau_sets[d])
        assert r.dau <= r.wau


def test_rate_spike_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.timeseries import SPIKE_BASE_H, SPIKE_Z_MICRO

    ev = load(spark, sf_dir, "events").select("ts", "event_type").collect()
    cnt: Counter = Counter()
    hours = []
    for r in ev:
        eh = (r.ts.date() - date(1970, 1, 1)).days * 24 + r.ts.hour
        cnt[(r.event_type, eh)] += 1
        hours.append(eh)
    mn, mx = min(hours), max(hours)
    types = {t for t, _ in cnt}
    want = {}
    for t in types:
        series = [cnt.get((t, h), 0) for h in range(mn, mx + 1)]
        for i in range(SPIKE_BASE_H, len(series)):
            window = series[i - SPIKE_BASE_H:i]
            sw, sww = sum(window), sum(v * v for v in window)
            if 24 * sww <= sw * sw:
                continue
            c = series[i]
            z = (c - sw / 24) / math.sqrt((sww - float(sw) * sw / 24) / 23)
            zm = rnd(1e6 * z)
            if abs(zm) >= SPIKE_Z_MICRO:
                want[(t, mn + i)] = (c, sw, zm)
    got = {(r.event_type, r.ehour): (r.c, r.base_sum, r.z_micro)
           for r in run("q_rate_spike").collect()}
    assert got == want
    assert want  # the fixture must actually contain spikes


def test_embed_pq_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.similarity import PQ_K, PQ_M, PQ_SEED_MOD, PQ_SUBDIM

    em = load(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in em}
    cents = {
        vid: v for vid, v in vecs.items()
        if vid % PQ_SEED_MOD == 0 and vid < PQ_SEED_MOD * PQ_K
    }
    assert len(cents) == PQ_K
    rows = {r.vec_id: r for r in run("q_embed_pq").collect()}
    assert set(rows) == set(vecs)
    for vid, v in vecs.items():
        codes, err = [], 0
        for s in range(PQ_M):
            lo = s * PQ_SUBDIM
            best = min(
                (round(sum((a - b) ** 2 for a, b in
                           zip(v[lo:lo + PQ_SUBDIM], cv[lo:lo + PQ_SUBDIM])), 6), cid)
                for cid, cv in cents.items()
            )
            codes.append(best[1])
            err += math.floor(best[0] * 1e6 + 0.5)
        r = rows[vid]
        assert [r.code0, r.code1, r.code2, r.code3] == codes
        assert r.err_mu == err
