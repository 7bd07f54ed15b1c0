"""Round-8 session tests: independent pure-Python recomputations of
every batch8 query at sf0.001 (the tests/test_round7.py model — a
THIRD implementation besides the Spark plan and the DuckDB oracle),
plus encoder/decoder round-trip fuzz for the synthetic media path."""

from __future__ import annotations

import hashlib
import random
from collections import Counter, defaultdict

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"
H31_P = 2_147_483_647


def _h31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % H31_P


def _table(name: str):
    return duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{SF}/{name}.parquet')"
    ).df()


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


# ---------------------------------------------------------------------------
# Synthetic media: encode → real decode == closed form
# ---------------------------------------------------------------------------


def test_synth_media_roundtrip_closed_form():
    from kafka_to_parquet_spark.llm.multimodal import (
        SYNTH_KINDS,
        decode_audio,
        decode_gif,
        decode_image,
        decode_video,
        probe_media,
        synth_dims,
        synth_media,
    )

    for d in range(72):
        kind = SYNTH_KINDS[d % 6]
        payload = synth_media(d)
        assert probe_media(payload)[1] == kind
        w, h = synth_dims(d)
        if kind in ("png", "ppm", "bmp"):
            arr, gw, gh, _ = decode_image(payload)
            n = w * h * 3
            want = sum((i * 31 + 7 + d) % 256 for i in range(n))
            assert (gw, gh, arr.size) == (w, h, n)
        elif kind == "gif":
            fr, gw, gh = decode_gif(payload)
            n = w * h
            want = 3 * sum((((i * 7 + d) % 8) * 40 + 5) % 256 for i in range(n))
            assert (gw, gh, fr.size) == (w, h, n * 3)
            arr = fr
        elif kind == "wav":
            arr, rate = decode_audio(payload)
            n = 16 + d % 33
            want = sum((i * 777 + d * 11) % 65536 - 32768 for i in range(n))
            assert rate == 8000 and arr.size == n
        else:
            arr, gw, gh, _fn, _fd = decode_video(payload)
            wv, hv, nf = 2 * (2 + d % 8), 2 * (2 + d % 6), 1 + d % 3
            n = nf * wv * hv
            want = sum((i * 31 + 7 + d) % 256 for i in range(n))
            assert (gw, gh, arr.size) == (wv, hv, n)
        assert int(arr.astype(np.int64).sum()) == want, (d, kind)


def test_gif_lzw_encode_decode_fuzz():
    """Product LZW encoder → product LZW decoder over random index
    streams at every legal min_code_size, including streams long
    enough to force width growth and a 4096-entry table reset."""
    from kafka_to_parquet_spark.llm.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rng = random.Random(8)
    for mcs in (2, 3, 5, 8):
        for n in (1, 7, 300, 6000):
            idx = [rng.randrange(1 << mcs) for _ in range(n)]
            enc = _gif_lzw_encode(mcs, idx)
            assert _gif_lzw_decode(mcs, enc, n) == idx, (mcs, n)


# ---------------------------------------------------------------------------
# BPE induction
# ---------------------------------------------------------------------------


def _merge_greedy(seq: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def test_bpe_learn_k_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import BPE_LEARN_K

    docs = _table("documents")
    tf = Counter(w for t in docs["text"] for w in _tokens(t))
    vocab = {w: [list(w), f] for w, f in tf.items()}
    want = []
    for step in range(1, BPE_LEARN_K + 1):
        pc = Counter()
        for seq, f in vocab.values():
            for i in range(len(seq) - 1):
                pc[(seq[i], seq[i + 1])] += f
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((step, a, b, cnt))
        for v in vocab.values():
            v[0] = _merge_greedy(v[0], a, b)
    got = [
        (r["step"], r["a"], r["b"], r["cnt"])
        for r in run("q_bpe_learn_k").collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# G² collocations
# ---------------------------------------------------------------------------


def test_collocation_llr_matches_python(run):
    import math

    from kafka_to_parquet_spark.operators.batch8 import LLR_MIN_COUNT, LLR_TOP

    docs = _table("documents")
    bg = Counter()
    for t in docs["text"]:
        toks = _tokens(t)
        for i in range(len(toks) - 1):
            bg[(toks[i], toks[i + 1])] += 1
    ra, cb = Counter(), Counter()
    for (a, b), c in bg.items():
        ra[a] += c
        cb[b] += c
    nn = sum(bg.values())

    def cell(o, r, c):
        return o * math.log(o * nn / (r * c)) if o > 0 else 0.0

    rows = []
    for (a, b), n11 in bg.items():
        if n11 < LLR_MIN_COUNT:
            continue
        g2 = 2.0 * (
            cell(n11, ra[a], cb[b])
            + cell(ra[a] - n11, ra[a], nn - cb[b])
            + cell(cb[b] - n11, nn - ra[a], cb[b])
            + cell(nn - ra[a] - cb[b] + n11, nn - ra[a], nn - cb[b])
        )
        rows.append((a, b, n11, ra[a], cb[b], nn, round(g2 * 1_000_000)))
    rows.sort(key=lambda r: (-r[6], r[0], r[1]))
    got = [tuple(r) for r in run("q_collocation_llr").collect()]
    # float-vs-float recompute: allow ±1 micro-unit on the score while
    # requiring the selected set and ordering to match
    assert [g[:6] for g in got] == [w[:6] for w in rows[:LLR_TOP]]
    for g, w in zip(got, rows):
        assert abs(g[6] - w[6]) <= 1


# ---------------------------------------------------------------------------
# Winnowing fingerprints
# ---------------------------------------------------------------------------


def test_winnowing_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import (
        WIN_K,
        WIN_MAX_DF,
        WIN_TOP,
        WIN_W,
    )

    docs = _table("documents")
    fps: dict[int, set[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _tokens(text)
        khs = [
            _h31(" ".join(toks[i : i + WIN_K]))
            for i in range(len(toks) - WIN_K + 1)
        ]
        s = {
            min(khs[i : i + WIN_W])
            for i in range(len(khs) - WIN_W + 1)
        }
        if s:
            fps[int(doc_id)] = s
    # common-fingerprint triage (WIN_MAX_DF), mirroring both engines
    fp_df = Counter(f for s in fps.values() for f in s)
    fps = {
        d: {f for f in s if fp_df[f] <= WIN_MAX_DF}
        for d, s in fps.items()
    }
    fps = {d: s for d, s in fps.items() if s}
    pairs = []
    ids = sorted(fps)
    buckets = defaultdict(list)
    for d in ids:
        for f in fps[d]:
            buckets[f].append(d)
    shared = Counter()
    for f, ds in buckets.items():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] += 1
    for (da, db), sh in shared.items():
        sim = sh * 10000 // (len(fps[da]) + len(fps[db]) - sh)
        pairs.append((da, db, sh, len(fps[da]), len(fps[db]), sim))
    pairs.sort(key=lambda r: (-r[5], r[0], r[1]))
    got = [tuple(r) for r in run("q_winnowing_fingerprint").collect()]
    assert got == pairs[:WIN_TOP]


def test_winnowing_guarantee_shared_run():
    """The winnow guarantee: two token streams sharing a contiguous
    run of ≥ K+W−1 tokens share at least one fingerprint VALUE."""
    from kafka_to_parquet_spark.operators.batch8 import WIN_K, WIN_W

    rng = random.Random(88)

    def fset(toks):
        khs = [
            _h31(" ".join(toks[i : i + WIN_K]))
            for i in range(len(toks) - WIN_K + 1)
        ]
        return {min(khs[i : i + WIN_W]) for i in range(len(khs) - WIN_W + 1)}

    vocab = [f"w{i}" for i in range(50)]
    for _ in range(25):
        shared_run = [rng.choice(vocab) for _ in range(WIN_K + WIN_W - 1)]
        a = [rng.choice(vocab) for _ in range(rng.randint(0, 20))] + shared_run
        b = shared_run + [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        assert fset(a) & fset(b), "winnow guarantee violated"


# ---------------------------------------------------------------------------
# Proximity search
# ---------------------------------------------------------------------------


def test_search_proximity_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import (
        PROX_K,
        PROX_TERMS,
        PROX_TOP,
    )

    docs = _table("documents")
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _tokens(text)
        pa = [i + 1 for i, t in enumerate(toks) if t == PROX_TERMS[0]]
        pb = [i + 1 for i, t in enumerate(toks) if t == PROX_TERMS[1]]
        dists = [abs(x - y) for x in pa for y in pb if abs(x - y) <= PROX_K]
        if dists:
            rows.append((int(doc_id), min(dists), len(dists)))
    rows.sort(key=lambda r: (r[1], -r[2], r[0]))
    got = [tuple(r) for r in run("q_search_proximity").collect()]
    assert got == rows[:PROX_TOP]


# ---------------------------------------------------------------------------
# Rocchio expansion
# ---------------------------------------------------------------------------


def test_rocchio_expand_matches_python(run):
    import math

    from kafka_to_parquet_spark.llm.search import BM25_TERMS
    from kafka_to_parquet_spark.operators.batch8 import (
        ROCCHIO_MIN_LEN,
        ROCCHIO_REL_K,
        ROCCHIO_TOP,
    )

    docs = _table("documents")
    toks = {int(d): _tokens(t) for d, t in zip(docs["doc_id"], docs["text"])}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    qdf = Counter()
    qtf = defaultdict(Counter)
    for d, ts in toks.items():
        for w in ts:
            if w in BM25_TERMS:
                qtf[d][w] += 1
        for w in set(ts) & set(BM25_TERMS):
            qdf[w] += 1

    def bm25_u(tf, df, dl):
        v = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) / (
            tf + 1.2 * (0.25 + 0.75 * dl / avgdl)
        )
        return int(math.floor(v * 1e6 + 0.5))

    scores = {
        d: sum(bm25_u(c, qdf[w], len(toks[d])) for w, c in tfs.items())
        for d, tfs in qtf.items()
    }
    rel = [d for d, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))][
        :ROCCHIO_REL_K
    ]
    cand = defaultdict(Counter)
    for d in rel:
        for w in toks[d]:
            if w not in BM25_TERMS and len(w) >= ROCCHIO_MIN_LEN:
                cand[w][d] += 1
    dfall = Counter()
    cand_words = set(cand)
    for d, ts in toks.items():
        for w in set(ts) & cand_words:
            dfall[w] += 1
    rows = []
    for w, per_doc in cand.items():
        weight = sum(
            int(math.floor(tf * math.log(n_docs / dfall[w]) * 1e6 + 0.5))
            for tf in per_doc.values()
        )
        rows.append((w, len(per_doc), dfall[w], weight))
    rows.sort(key=lambda r: (-r[3], r[0]))
    got = [tuple(r) for r in run("q_rocchio_expand").collect()]
    assert [g[:3] for g in got] == [w[:3] for w in rows[:ROCCHIO_TOP]]
    for g, w in zip(got, rows):
        assert abs(g[3] - w[3]) <= len(rel)  # ±1 micro-unit per summand


# ---------------------------------------------------------------------------
# Weighted SSSP
# ---------------------------------------------------------------------------


def test_sssp_weighted_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import SSSP_ROUNDS

    orders = _table("orders")[["o_orderkey", "o_custkey"]]
    li = _table("lineitem")[["l_orderkey", "l_suppkey"]]
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    cnt = Counter(
        (int(c) * 2, int(s) * 2 + 1)
        for c, s in zip(j["o_custkey"], j["l_suppkey"])
    )
    adj = defaultdict(list)
    for (u, v), n in cnt.items():
        w = 1 + 9 // n
        adj[u].append((v, w))
        adj[v].append((u, w))
    seed = min(adj)
    dist = {seed: 0}
    for _ in range(SSSP_ROUNDS):
        nd = dict(dist)
        for u, d in dist.items():
            for v, w in adj[u]:
                if v not in nd or d + w < nd[v]:
                    nd[v] = d + w
        dist = nd
    hist = Counter(dist.values())
    want = sorted((d, n) for d, n in hist.items())
    unreached = len(adj) - len(dist)
    want = [(-1, unreached)] + want
    got = sorted((r["dist"], r["n_nodes"]) for r in run("q_sssp_weighted").collect())
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# Modularity of co-purchase LPA communities
# ---------------------------------------------------------------------------


def test_graph_modularity_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import MOD_LPA_ROUNDS, MOD_TOP
    from kafka_to_parquet_spark.operators.graph import MIN_SUP

    li = _table("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    per_order = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        per_order[int(o)].add(int(p))
    support = Counter()
    for parts in per_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] += 1
    edges = [
        (a, b) for (a, b), s in support.items() if s >= MIN_SUP
    ]
    sym = edges + [(b, a) for a, b in edges]
    adj = defaultdict(list)
    for u, v in sym:
        adj[u].append(v)
    lab = {n: n for n in adj}
    for _ in range(MOD_LPA_ROUNDS):
        nl = {}
        for n in adj:
            c = Counter(lab[v] for v in adj[n])
            nl[n] = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = nl
    m_dir = len(sym)
    e_c, d_c, members = Counter(), Counter(), defaultdict(set)
    for u, v in sym:
        d_c[lab[u]] += 1
        members[lab[u]].add(u)
        if lab[u] == lab[v]:
            e_c[lab[u]] += 1
    rows = []
    for c in d_c:
        contrib = int(
            np.floor(
                1e6 * (float(e_c[c]) * m_dir - float(d_c[c]) * d_c[c])
                / (float(m_dir) * m_dir)
                + 0.5
            )
        )
        rows.append((c, len(members[c]), d_c[c], e_c[c], contrib))
    rows.sort(key=lambda r: (-r[1], r[0]))
    got = [tuple(r) for r in run("q_graph_modularity").collect()]
    assert got == rows[:MOD_TOP]
    # the audit must be non-degenerate: some community has internal edges
    assert any(r[3] > 0 for r in rows), "no community has internal edges"


# ---------------------------------------------------------------------------
# STL decomposition
# ---------------------------------------------------------------------------


def test_stl_decompose_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import STL_TREND_HALF

    ev = _table("events")
    ev["d"] = ev["ts"].dt.date
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    daily = (
        ev.groupby(["event_type", "d"])["c"].sum().reset_index().sort_values(
            ["event_type", "d"]
        )
    )
    want = []
    full = 2 * STL_TREND_HALF + 1
    for et, g in daily.groupby("event_type"):
        ys = list(g["c"])
        ds = list(g["d"])
        dt_rows = []
        for i in range(len(ys)):
            lo, hi = i - STL_TREND_HALF, i + STL_TREND_HALF
            if lo < 0 or hi >= len(ys):
                continue
            s7 = sum(ys[lo : hi + 1])
            trend = 1000 * s7 // 7
            detr = 1000 * ys[i] - trend
            dow = (ds[i] - __import__("datetime").date(1970, 1, 1)).days % 7
            dt_rows.append((ds[i], dow, ys[i], trend, detr))
        seas = defaultdict(list)
        for _, dow, _, _, detr in dt_rows:
            seas[dow].append(detr)

        def tdiv(a: int, b: int) -> int:
            # truncate-toward-zero, matching Spark DIV and DuckDB //
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b >= 0) else -q

        seas_m = {dow: tdiv(sum(v), len(v)) for dow, v in seas.items()}
        for day, dow, yc, trend, detr in dt_rows:
            want.append(
                (et, day, yc, trend, seas_m[dow], detr - seas_m[dow])
            )
    want.sort(key=lambda r: (r[0], r[1]))
    got = [
        (r["event_type"], r["day"], r["y_cents"], r["trend_milli"],
         r["seas_milli"], r["resid_milli"])
        for r in run("q_stl_decompose").collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# CUPED
# ---------------------------------------------------------------------------


def test_abtest_cuped_matches_python(run):
    ev = _table("events")
    ev["d"] = ev["ts"].dt.date
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    d0, d1 = ev["d"].min(), ev["d"].max()
    sd = d0 + __import__("datetime").timedelta(days=(d1 - d0).days // 2)
    per = defaultdict(lambda: [0, 0])
    for u, d, c in zip(ev["user_id"], ev["d"], ev["c"]):
        per[int(u)][0 if d < sd else 1] += int(c)
    xs = {u: v[0] for u, v in per.items()}
    ys = {u: v[1] for u, v in per.items()}
    n = len(per)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxy = sum(xs[u] * ys[u] for u in per)
    sxx = sum(x * x for x in xs.values())
    theta = (float(n) * sxy - float(sx) * sy) / (float(n) * sxx - float(sx) * sx)
    want = {}
    for variant in (0, 1):
        us = [u for u in per if _h31(str(u)) % 2 == variant]
        n_v = len(us)
        sx_v = sum(xs[u] for u in us)
        sy_v = sum(ys[u] for u in us)
        adj = sy_v / n_v - theta * (sx_v / n_v - sx / n)
        want[variant] = (
            n_v, sx_v, sy_v,
            int(np.floor(theta * 1e6 + 0.5)),
            int(np.floor(sy_v / n_v * 1e6 + 0.5)),
            int(np.floor(adj * 1e6 + 0.5)),
        )
    got = {
        r["variant"]: (
            r["n_v"], r["sx_v"], r["sy_v"], r["theta_micro"],
            r["mean_y_micro"], r["cuped_mean_micro"],
        )
        for r in run("q_abtest_cuped").collect()
    }
    assert set(got) == {0, 1}
    for v in (0, 1):
        assert got[v][:3] == want[v][:3]
        for gi, wi in zip(got[v][3:], want[v][3:]):
            assert abs(gi - wi) <= 1  # float recompute: ±1 micro-unit


# ---------------------------------------------------------------------------
# Poisson bootstrap
# ---------------------------------------------------------------------------


def test_bootstrap_ci_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import BOOT_B, _POIS_CUM

    orders = _table("orders")
    cents = {
        int(k): int(round(p * 100))
        for k, p in zip(orders["o_orderkey"], orders["o_totalprice"])
    }

    def weight(u):
        for w, t in enumerate(_POIS_CUM):
            if u < t:
                return w
        return 7

    stats = []
    for b in range(BOOT_B):
        num = den = 0
        for k, c in cents.items():
            h = _h31(str(k))
            u = ((h + b * 2654435761) % H31_P) * 48271 % H31_P % 10000
            w = weight(u)
            num += w * c
            den += w
        stats.append(num // den)
    stats.sort()

    def disc_q(q):
        import math

        return stats[max(0, math.ceil(q * len(stats)) - 1)]

    row = run("q_bootstrap_ci").collect()[0]
    assert row["b_resamples"] == BOOT_B
    assert row["n_orders"] == len(cents)
    assert row["point_mean_c"] == sum(cents.values()) // len(cents)
    assert row["boot_min_cents"] == stats[0]
    assert row["boot_max_cents"] == stats[-1]
    assert row["ci_lo_cents"] == disc_q(0.05)
    assert row["ci_hi_cents"] == disc_q(0.95)
    # 5/95 cuts are INTERIOR order statistics at B=40 (2.5/97.5 would
    # degenerate to min/max)
    assert stats[0] <= row["ci_lo_cents"] and row["ci_lo_cents"] != stats[0] or stats[0] == stats[1]
    assert row["ci_hi_cents"] <= stats[-1]
    assert row["ci_lo_cents"] <= row["point_mean_c"] <= row["ci_hi_cents"]


# ---------------------------------------------------------------------------
# Second session batch
# ---------------------------------------------------------------------------


def test_text_rake_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import (
        RAKE_MAX_LEN,
        RAKE_STOP_K,
        RAKE_TOP,
    )

    docs = _table("documents")
    dfreq = Counter()
    all_toks = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _tokens(text)
        all_toks[int(doc_id)] = toks
        for w in set(toks):
            dfreq[w] += 1
    stop = {
        w
        for w, _ in sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[
            :RAKE_STOP_K
        ]
    }
    phrases = []  # instances
    for toks in all_toks.values():
        cur = []
        for w in toks:
            if w in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
    phrases = [p for p in phrases if len(p) <= RAKE_MAX_LEN]
    freq, degree = Counter(), Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            degree[w] += len(p)
    score = {w: 1000 * degree[w] // freq[w] for w in freq}
    pocc = Counter(" ".join(p) for p in phrases)
    rows = []
    for ph, n_occ in pocc.items():
        words = ph.split(" ")
        rows.append((ph, n_occ, len(words), sum(score[w] for w in words)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    got = [tuple(r) for r in run("q_text_rake").collect()]
    assert got == rows[:RAKE_TOP]


def test_bpe_apply_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import BPE_LEARN_K

    docs = _table("documents")
    tf = Counter(w for t in docs["text"] for w in _tokens(t))
    vocab = {w: list(w) for w in tf}
    for _ in range(BPE_LEARN_K):
        pc = Counter()
        for w, seq in vocab.items():
            for i in range(len(seq) - 1):
                pc[(seq[i], seq[i + 1])] += tf[w]
        (a, b), _c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        vocab = {w: _merge_greedy(seq, a, b) for w, seq in vocab.items()}
    per_src = defaultdict(lambda: [0, 0, 0, 0])  # types, tokens, before, after
    stf = defaultdict(Counter)
    for text, src in zip(docs["text"], docs["source"]):
        for w in _tokens(text):
            stf[src][w] += 1
    want = []
    for src in sorted(stf):
        types = len(stf[src])
        toks = sum(stf[src].values())
        before = sum(c * len(w) for w, c in stf[src].items())
        after = sum(c * len(vocab[w]) for w, c in stf[src].items())
        want.append((src, types, toks, before, after, 1000 * before // after))
    got = [tuple(r) for r in run("q_bpe_apply").collect()]
    assert got == want


def test_ts_anomaly_stl_matches_python(run):
    """The top-k anomaly report must equal a recompute over
    q_stl_decompose's (already python-verified) output using the
    doubled-median MAD-score rule."""
    import statistics as st

    from kafka_to_parquet_spark.operators.batch8 import ANOM_TOP

    decomp = [tuple(r) for r in run("q_stl_decompose").collect()]
    by_type = defaultdict(list)
    for et, day, yc, trend, seas, resid in decomp:
        by_type[et].append((day, yc, resid))
    want = []
    for et, rows in by_type.items():
        resids = [r[2] for r in rows]
        med2 = int(2 * st.median(resids))
        scored = sorted(
            ((abs(2 * r[2] - med2), r) for r in rows),
            key=lambda x: (-x[0], x[1][0]),
        )
        mad_d2 = int(2 * st.median(sorted(dd for dd, _ in scored)))
        for dd, (day, yc, resid) in scored[:ANOM_TOP]:
            want.append(
                (et, day, yc, resid, dd, med2, mad_d2, 10000 * dd // mad_d2)
            )
    want.sort(key=lambda r: (r[0], r[1]))
    got = [tuple(r) for r in run("q_ts_anomaly_stl").collect()]
    assert got == want
    assert got, "report empty — fixture degenerate?"


def test_graph_clustering_coeff_matches_python(run):
    import math

    from kafka_to_parquet_spark.operators.batch8 import CC_SUP_Q, CC_TOP

    li = _table("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    per_order = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        per_order[int(o)].add(int(p))
    support = Counter()
    for parts in per_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] += 1
    sups = sorted(support.values())
    ks = sups[max(0, math.ceil(CC_SUP_Q * len(sups)) - 1)]  # disc quantile
    edges = [e for e, c in support.items() if c > ks]
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = Counter()
    for u in adj:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    rows = []
    for n_, nbrs in adj.items():
        d = len(nbrs)
        if d >= 2:
            rows.append(
                (n_, d, tri[n_], 2 * tri[n_] * 1_000_000 // (d * (d - 1)))
            )
    rows.sort(key=lambda r: (-r[3], r[0]))
    got = [tuple(r) for r in run("q_graph_clustering_coeff").collect()]
    assert got == rows[:CC_TOP]


def test_abtest_power_matches_python(run):
    import math

    ev = _table("events")
    per = Counter()
    for u, v in zip(ev["user_id"], ev["value"]):
        per[int(u)] += int(round(v * 100))
    n = len(per)
    sy = sum(per.values())
    syy = sum(y * y for y in per.values())
    n_a = sum(1 for u in per if _h31(str(u)) % 2 == 0)
    n_b = n - n_a
    s2 = (float(n) * syy - float(sy) * sy) / (float(n) * (n - 1))
    mde = (1.9599639845400545 + 0.8416212335729143) * math.sqrt(
        s2 * (1.0 / n_a + 1.0 / n_b)
    )
    row = run("q_abtest_power").collect()[0]
    assert (row["n"], row["n_a"], row["n_b"]) == (n, n_a, n_b)
    assert abs(row["mean_micro"] - int(np.floor(sy / n * 1e6 + 0.5))) <= 1
    assert abs(row["var_micro"] - int(np.floor(s2 * 1e6 + 0.5))) <= 1
    assert abs(row["mde_abs_micro"] - int(np.floor(mde * 1e6 + 0.5))) <= 1
    assert abs(row["mde_rel_bp"] - int(np.floor(mde / (sy / n) * 1e4 + 0.5))) <= 1


# ---------------------------------------------------------------------------
# Third session batch
# ---------------------------------------------------------------------------


def test_text_textrank_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import (
        TR_ROUNDS,
        TR_STOP_K,
        TR_TOP,
        TR_WINDOW,
        _TR_T,
    )

    docs = _table("documents")
    dfreq = Counter()
    toks_by_doc = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _tokens(text)
        toks_by_doc[int(doc_id)] = toks
        for w in set(toks):
            dfreq[w] += 1
    stop = {
        w
        for w, _ in sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[
            :TR_STOP_K
        ]
    }
    wedge = Counter()
    for toks in toks_by_doc.values():
        ft = [w for w in toks if w not in stop]
        for i in range(len(ft)):
            for j in range(i + 1, min(i + TR_WINDOW + 1, len(ft))):
                if ft[i] != ft[j]:
                    wedge[(ft[i], ft[j])] += 1
    edges = Counter()
    for (a, b), w in wedge.items():
        edges[(a, b)] += w
        edges[(b, a)] += w
    strength = Counter()
    for (a, _b), w in edges.items():
        strength[a] += w
    nodes = sorted(strength)
    n = len(nodes)
    r_init = _TR_T // n
    base = (15 * r_init) // 100
    r = {v: r_init for v in nodes}
    for _ in range(TR_ROUNDS):
        c = Counter()
        for (a, b), w in edges.items():
            c[b] += (r[a] // strength[a]) * w
        r = {v: base + (85 * c[v]) // 100 for v in nodes}
    want = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:TR_TOP]
    got = [(row["word"], row["rank_units"]) for row in run("q_text_textrank").collect()]
    assert got == want


def test_kmv_union_audit_matches_python(run):
    from kafka_to_parquet_spark.llm.corpus_stats import KMV_K

    docs = _table("documents")
    vocab = defaultdict(set)
    for text, src in zip(docs["text"], docs["source"]):
        vocab[src].update(_tokens(text))
    kept = {
        s: sorted(_h31(w) for w in ws)[:KMV_K] for s, ws in vocab.items()
    }

    def est_from(mins):
        if len(mins) < KMV_K:
            return len(mins)
        return (KMV_K - 1) * H31_P // mins[KMV_K - 1]

    sest = {s: est_from(m) for s, m in kept.items()}
    want = []
    srcs = sorted(vocab)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            merged = sorted(set(kept[sa]) | set(kept[sb]))[:KMV_K]
            est_u = est_from(merged)
            ex_u = len(vocab[sa] | vocab[sb])
            want.append(
                (
                    sa, sb, len(vocab[sa]), len(vocab[sb]), ex_u, est_u,
                    abs(est_u - ex_u) * 10000 // ex_u,
                    sest[sa] + sest[sb] - est_u,
                    len(vocab[sa]) + len(vocab[sb]) - ex_u,
                )
            )
    got = [tuple(r) for r in run("q_kmv_union_audit").collect()]
    assert got == sorted(want)


def test_ts_spectral_dow_matches_python(run):
    import datetime

    from kafka_to_parquet_spark.operators.batch8 import _TW_COS, _TW_SIN

    ev = _table("events")
    ev["d"] = ev["ts"].dt.date
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    daily = ev.groupby(["event_type", "d"])["c"].sum().reset_index()
    epoch = datetime.date(1970, 1, 1)
    want = {}
    for et, g in daily.groupby("event_type"):
        xr = xi = tot = 0
        for d, yc in zip(g["d"], g["c"]):
            dow = (d - epoch).days % 7
            xr += int(np.floor(yc * float(_TW_COS[dow]) * 1000.0 + 0.5))
            xi += int(np.floor(yc * float(_TW_SIN[dow]) * 1000.0 + 0.5))
            tot += int(yc)
        amp = int(
            np.floor(
                10000.0 * ((float(xr) * xr + float(xi) * xi) ** 0.5)
                / (1000.0 * tot)
                + 0.5
            )
        )
        want[et] = (len(g), tot, xr, xi, amp)
    got = {
        r["event_type"]: (
            r["n_days"], r["total_cents"], r["xr_milli"], r["xi_milli"],
            r["weekly_amp_bp"],
        )
        for r in run("q_ts_spectral_dow").collect()
    }
    assert set(got) == set(want)
    for et in want:
        assert got[et][:4] == want[et][:4], et
        assert abs(got[et][4] - want[et][4]) <= 1, et  # sqrt recompute


def test_kn_continuation_matches_python(run):
    from kafka_to_parquet_spark.operators.batch8 import KN_TOP

    docs = _table("documents")
    bg = set()
    freq = Counter()
    for text in docs["text"]:
        toks = _tokens(text)
        freq.update(toks)
        for i in range(len(toks) - 1):
            bg.add((toks[i], toks[i + 1]))
    cont = Counter(b for _a, b in bg)
    n_types = len(bg)
    rows = [
        (
            w, c, freq[w], n_types,
            c * 1_000_000 // n_types,
            freq[w] * 1000 // c,
        )
        for w, c in cont.items()
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    got = [tuple(r) for r in run("q_kn_continuation").collect()]
    assert got == rows[:KN_TOP]


# ---------------------------------------------------------------------------
# Property fuzz: the sentinel-framed replace() IS greedy BPE merging
# ---------------------------------------------------------------------------


def test_bpe_framed_replace_equals_greedy_merge_fuzz():
    """q_bpe_learn_k's core trick — applying a merge as ONE string
    replace over sentinel-framed symbols — must equal the canonical
    greedy leftmost merge for ANY symbol sequence and pair, including
    the aaaa→[aa,aa] overlap traps and multi-char symbols from prior
    merges. Pure-python mirror of the identical Spark/DuckDB string
    semantics (left-to-right non-overlapping scan)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    US = "\x1f"

    def frame(seq):
        return "".join(US + x + US for x in seq)

    def unframe(s):
        return s.strip(US).split(US + US) if s else []

    sym = st.sampled_from(["a", "b", "ab", "ba", "aa", "c"])

    @settings(max_examples=300, deadline=None)
    @given(st.lists(sym, min_size=1, max_size=12), sym, sym)
    def check(seq, a, b):
        framed = frame(seq).replace(
            US + a + US + US + b + US, US + a + b + US
        )
        assert unframe(framed) == _merge_greedy(seq, a, b), (seq, a, b)

    check()


def test_synth_media_fuzz_wide_doc_ids():
    """The probe query's closed-form oracle must hold for ANY doc id —
    fuzz far past the fixture range (incl. the 10x-stress offsets)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_to_parquet_spark.llm.multimodal import (
        SYNTH_KINDS,
        decode_audio,
        decode_gif,
        decode_image,
        decode_video,
        probe_media,
        synth_media,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.integers(min_value=0, max_value=50_000_000))
    def check(d):
        payload = synth_media(d)
        kind = SYNTH_KINDS[d % 6]
        assert probe_media(payload)[1] == kind
        if kind in ("png", "ppm", "bmp"):
            arr = decode_image(payload)[0]
            want = sum((i * 31 + 7 + d) % 256 for i in range(arr.size))
        elif kind == "gif":
            arr = decode_gif(payload)[0]
            want = 3 * sum(
                (((i * 7 + d) % 8) * 40 + 5) % 256 for i in range(arr.size // 3)
            )
        elif kind == "wav":
            arr = decode_audio(payload)[0]
            want = sum((i * 777 + d * 11) % 65536 - 32768 for i in range(arr.size))
        else:
            arr = decode_video(payload)[0]
            want = sum((i * 31 + 7 + d) % 256 for i in range(arr.size))
        assert int(arr.astype(np.int64).sum()) == want

    check()


def test_kmeans_silhouette_matches_python(run):
    import math

    from kafka_to_parquet_spark.llm.clustering import KM_K, KM_MOD

    emb = _table("embeddings")
    vecs = {int(v): list(e) for v, e in zip(emb["vec_id"], emb["embedding"])}
    cents = {
        v: e for v, e in vecs.items() if v % KM_MOD == 0 and v < KM_MOD * KM_K
    }

    def d2(x, y):
        return round(sum((a - b) * (a - b) for a, b in zip(x, y)), 6)

    agg = defaultdict(list)
    for v, e in vecs.items():
        ds = sorted((d2(e, c), cid) for cid, c in cents.items())
        (a_d2, cid), (b_d2, _) = ds[0], ds[1]
        s = 0 if b_d2 <= 0 else int(
            np.floor((1.0 - math.sqrt(a_d2 / b_d2)) * 1e6 + 0.5)
        )
        agg[cid].append(s)
    want = sorted(
        (cid, len(ss), sum(ss) // len(ss), min(ss), max(ss))
        for cid, ss in agg.items()
    )
    got = [tuple(r) for r in run("q_kmeans_silhouette").collect()]
    # d2 here is a float recompute of the engines' shared fragment —
    # identical rounding to 6dp makes the ranks and micro values match
    # exactly in practice; tolerate ±1 micro on the aggregates.
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got, want):
        for gi, wi in zip(g[2:], w[2:]):
            assert abs(gi - wi) <= 1


def test_split_leakage_matches_python(run):
    """Recompute the report from the ALREADY-verified q_dedup_minhash
    output (hash-green vs its own oracle) + the splitter CASE."""
    from kafka_to_parquet_spark.operators.batch8 import LEAK_JAC_BP

    pairs = [
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in run("q_dedup_minhash").collect()
    ]

    def split(d):
        b = (d * 2654435761) % 1000
        return "train" if b < 800 else ("val" if b < 900 else "test")

    lab = Counter()
    ex = {}
    for da, db, jac in pairs:
        if round(jac * 10000) < LEAK_JAC_BP:
            continue
        key = tuple(sorted((split(da), split(db))))
        lab[key] += 1
        ex[key] = min(ex.get(key, da), da)
    total = sum(lab.values())
    want = sorted(
        (
            sa, sb, n, n * 10000 // total, int(sa != sb), ex[(sa, sb)]
        )
        for (sa, sb), n in lab.items()
    )
    got = [tuple(r) for r in run("q_split_leakage").collect()]
    # q_dedup_minhash reports jaccard as a 6dp float; the leakage gate
    # uses the integer-bp form — both land on the same >= 0.5 set on
    # this fixture (no pair sits within 1e-4 of the boundary).
    assert got == want
