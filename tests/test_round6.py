"""Round-6 operators: KS test, BPE merge step, Gini, n-gram novelty,
interval-overlap join, PCA power step, typo dedup. Each test is an
independent Python recompute at sf0.001 (the oracle gate cross-checks
DuckDB; these pin the SEMANTICS against a third implementation)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from kafka_to_parquet_spark.tables import load


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def _h31(s: str) -> int:
    # functions/hashes.py: first 8 hex chars of md5 as int, mod 2^31-1.
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2147483647


# ----------------------------------------------------------------- ks


def test_ks_test_matches_brute_ecdf(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.statistics import KS_TYPE_A, KS_TYPE_B

    ev = load(spark, sf_dir, "events").select("event_type", "value").collect()
    xs = sorted(r.value for r in ev if r.event_type == KS_TYPE_A)
    ys = sorted(r.value for r in ev if r.event_type == KS_TYPE_B)
    n1, n2 = len(xs), len(ys)
    pts = sorted(set(xs) | set(ys))
    import bisect

    d = max(
        abs(bisect.bisect_right(xs, p) * n2 - bisect.bisect_right(ys, p) * n1)
        for p in pts
    )
    want_bp = d * 10000 // (n1 * n2)
    row = run("q_ks_test").collect()[0]
    assert (row.n1, row.n2, row.d_bp) == (n1, n2, want_bp)


# ----------------------------------------------------------- bpe merge


def test_bpe_merge_counts(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.corpus_stats import BPE_MERGES_K

    wf = Counter()
    for r in load(spark, sf_dir, "documents").select("text").collect():
        wf.update(_tokens(r.text))
    pc = Counter()
    for w, f in wf.items():
        for i in range(len(w) - 1):
            pc[(w[i], w[i + 1])] += f
    want = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_MERGES_K]
    got = [((r.a, r.b), r.cnt) for r in run("q_bpe_merge_step").collect()]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want


# ----------------------------------------------------------------- gini


def test_gini_tokens_formula(run, spark, sf_dir):
    tf = Counter()
    for r in load(spark, sf_dir, "documents").select("text").collect():
        tf.update(_tokens(r.text))
    ranked = sorted(tf.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    tot = sum(f for _, f in ranked)
    t = sum((i + 1) * f for i, (_, f) in enumerate(ranked))
    want_bp = (2 * t - (n + 1) * tot) * 10000 // (n * tot)
    row = run("q_gini_tokens").collect()[0]
    assert (row.n_types, row.n_tokens, row.gini_bp) == (n, tot, want_bp)
    assert 0 <= row.gini_bp < 10000


# ------------------------------------------------------------- novelty


def test_ngram_novelty_recompute(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.corpus_stats import NOVELTY_N

    docs = {
        r.doc_id: _tokens(r.text)
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    tri = {
        d: [
            _h31(" ".join(t[i : i + NOVELTY_N]))
            for i in range(len(t) - NOVELTY_N + 1)
        ]
        for d, t in docs.items()
        if len(t) >= NOVELTY_N
    }
    ndocs = defaultdict(set)
    for d, hs in tri.items():
        for h in hs:
            ndocs[h].add(d)
    want = {}
    for d, hs in tri.items():
        novel = sum(1 for h in hs if len(ndocs[h]) == 1)
        want[d] = (len(hs), novel, novel * 10000 // len(hs))
    got = {
        r.doc_id: (r.n_ngrams, r.n_novel, r.novelty_bp)
        for r in run("q_ngram_novelty").collect()
    }
    assert got == want


# ------------------------------------------------------ interval overlap


def test_interval_overlap_brute_force(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.joins import (
        IVL_LEN_S,
        IVL_TYPE_A,
        IVL_TYPE_B,
    )

    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    ta = [int(r.ts.timestamp()) for r in ev if r.event_type == IVL_TYPE_A]
    tb = [int(r.ts.timestamp()) for r in ev if r.event_type == IVL_TYPE_B]
    want: Counter = Counter()
    for x in ta:
        for y in tb:
            if x < y + IVL_LEN_S and y < x + IVL_LEN_S:
                want[max(x, y) // IVL_LEN_S] += 1
    got = {r.hour_bin: r.n_pairs for r in run("q_join_interval_overlap").collect()}
    assert got == dict(want)
    # every overlapping pair counted exactly once overall
    assert sum(got.values()) == sum(want.values())


# ------------------------------------------------------------ pca power


def test_pca_power_is_exact_gram_vector_product(run, spark, sf_dir):
    rows = load(spark, sf_dir, "embeddings").select("embedding").collect()
    units = [
        [math.floor(float(x) * 1_000_000 + 0.5) for x in r.embedding] for r in rows
    ]
    dim = len(units[0])
    want = [0] * dim
    for u in units:
        dot = sum(u)
        for i, ui in enumerate(u):
            want[i] += ui * dot
    got = {r.dim: r.comp for r in run("q_pca_power").collect()}
    assert got == {i: want[i] for i in range(dim)}


def test_pca_power_dominant_direction_property(run):
    """With v0 = 1, the result is Xᵀ(X·1) — for any non-degenerate X
    at least one component must be nonzero, and the output has exactly
    one row per dimension."""
    rows = run("q_pca_power").collect()
    assert len(rows) == len({r.dim for r in rows})
    assert any(r.comp != 0 for r in rows)


# ------------------------------------------------------------ typo dedup


def test_typo_pairs_equal_brute_force_levenshtein(run, spark, sf_dir):
    """The deletion-neighborhood blocking must be LOSSLESS for edit
    distance ≤ 1: compare against all-pairs Levenshtein over the
    vocabulary."""

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    vocab = set()
    for r in load(spark, sf_dir, "documents").select("text").collect():
        vocab.update(_tokens(r.text))
    vocab = sorted(vocab)
    want = {
        (a, b): lev(a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if lev(a, b) <= 1
    }
    got = {(r.word_a, r.word_b): r.dist for r in run("q_dedup_typo").collect()}
    assert got == want


# ------------------------------------------------------ langid confusion


def test_langid_confusion_matches_prediction_counts(run):
    pred = [(r.lang, r.lang_pred) for r in run("q_text_langid").collect()]
    cells = Counter(pred)
    per_lang = Counter(lang for lang, _ in pred)
    got = {
        (r.lang, r.lang_pred): (r.n, r.share_bp)
        for r in run("q_langid_confusion").collect()
    }
    assert got == {
        k: (n, n * 10000 // per_lang[k[0]]) for k, n in cells.items()
    }
    # shares per actual language sum to ~10000 (floor rounding)
    for lang in per_lang:
        s = sum(bp for (la, _), (_, bp) in got.items() if la == lang)
        assert 10000 - len(per_lang) * 2 <= s <= 10000


# ------------------------------------------------------------ zipf slope


def test_zipf_slope_recompute(run, spark, sf_dir):
    tf = Counter()
    for r in load(spark, sf_dir, "documents").select("text").collect():
        tf.update(_tokens(r.text))
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(math.log(i + 1) * 1_000_000 + 0.5) for i in range(len(ranked))]
    ys = [math.floor(math.log(f) * 1_000_000 + 0.5) for _, f in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    want = math.floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1_000_000 + 0.5)
    row = run("q_zipf_slope").collect()[0]
    assert (row.n_types, row.slope_micro) == (n, want)
    assert row.slope_micro < 0  # frequencies decay with rank


# ------------------------------------------------------------------ twap


def test_time_weighted_avg_recompute(run, spark, sf_dir):
    ev = sorted(
        (
            (r.user_id, int(r.ts.timestamp()), r.event_id, round(r.value * 100))
            for r in load(spark, sf_dir, "events").collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    want = {}
    by_user: dict = defaultdict(list)
    for u, es, eid, vc in ev:
        by_user[u].append((es, vc))
    for u, rows in by_user.items():
        segs = [
            (vc, rows[i + 1][0] - es)
            for i, (es, vc) in enumerate(rows[:-1])
            if rows[i + 1][0] - es > 0
        ]
        if segs:
            num = sum(vc * dt for vc, dt in segs)
            den = sum(dt for _, dt in segs)
            want[u] = (len(segs), den, num // den)
    got = {
        r.user_id: (r.n_segments, r.span_s, r.twap_c)
        for r in run("q_time_weighted_avg").collect()
    }
    assert got == want


# -------------------------------------------------------------- dimstats


def test_embed_dimstats_recompute(run, spark, sf_dir):
    rows = load(spark, sf_dir, "embeddings").select("embedding").collect()
    units = [
        [math.floor(float(x) * 1_000_000 + 0.5) for x in r.embedding] for r in rows
    ]
    n = len(units)
    dim = len(units[0])
    got = {r.dim: (r.n, r.mean_mu, r.var_mu2) for r in run("q_embed_dimstats").collect()}
    assert set(got) == set(range(dim))
    for i in range(dim):
        col = [u[i] for u in units]
        su, ssq = sum(col), sum(v * v for v in col)
        mean = math.floor(su / n + 0.5)
        var = round((ssq - su * su / n) / n)
        assert got[i] == (n, mean, var), i


# ------------------------------------------------------- schema evolution


def test_schema_evolution_nulls_old_batch(run, spark, sf_dir):
    from kafka_to_parquet_spark.sources.formats import EVOL_SPLIT_US

    src = {
        r.event_id: (r.user_id, r.event_type, r.value)
        for r in load(spark, sf_dir, "events").collect()
    }
    got = {
        r.event_id: (r.user_id, r.event_type, r.value)
        for r in run("q_schema_evolution").collect()
    }
    assert set(got) == set(src)
    for eid, (uid, et, val) in src.items():
        g_uid, g_et, g_val = got[eid]
        assert (g_uid, g_et) == (uid, et)
        if uid % EVOL_SPLIT_US == 0:
            assert g_val == val
        else:
            assert g_val is None


# ---------------------------------------------------------- mann-whitney


def test_mann_whitney_recompute(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.statistics import KS_TYPE_A, KS_TYPE_B

    ev = load(spark, sf_dir, "events").select("event_type", "value").collect()
    xs = [r.value for r in ev if r.event_type == KS_TYPE_A]
    ys = [r.value for r in ev if r.event_type == KS_TYPE_B]
    n1, n2 = len(xs), len(ys)
    # 2*U_A directly from the definition: pairs where x > y count 2,
    # ties count 1.
    u2 = sum(2 if x > y else (1 if x == y else 0) for x in xs for y in ys)
    row = run("q_mann_whitney").collect()[0]
    assert (row.n1, row.n2, row.u2_a) == (n1, n2, u2)
    assert row.auc_bp == u2 * 5000 // (n1 * n2)
    assert 0 <= row.auc_bp <= 10000


# ------------------------------------------------------------- autocorr


def test_ts_autocorr_recompute(run, spark, sf_dir):
    from collections import Counter as C

    daily = C()
    for r in load(spark, sf_dir, "events").select("ts").collect():
        daily[r.ts.date()] += 1
    days = sorted(daily)
    pairs = [
        (daily[d], daily[days[i + 1]])
        for i, d in enumerate(days[:-1])
        if (days[i + 1] - d).days == 1
    ]
    m = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    want = round(
        (m * sxy - sx * sy) / math.sqrt((m * sxx - sx * sx) * 1.0 * (m * syy - sy * sy))
        * 1_000_000
    )
    row = run("q_ts_autocorr").collect()[0]
    assert (row.n_pairs, row.acf1_micro) == (m, want)


# -------------------------------------------------------- asof tolerance


def test_asof_tolerance_nulls_stale_matches(run):
    from kafka_to_parquet_spark.operators.composite import ASOF_TOL_S

    base = {
        r.p_event: (r.user_id, r.p_ts_s, r.view_event, r.wait_s)
        for r in run("q_join_asof").collect()
    }
    tol = {
        r.p_event: (r.user_id, r.p_ts_s, r.view_event, r.wait_s)
        for r in run("q_join_asof_tolerance").collect()
    }
    assert set(tol) == set(base)
    saw_dropped = saw_kept = False
    for pe, (uid, pts, ve, ws) in base.items():
        t_uid, t_pts, t_ve, t_ws = tol[pe]
        assert (t_uid, t_pts) == (uid, pts)
        if ve is not None and ws <= ASOF_TOL_S:
            assert (t_ve, t_ws) == (ve, ws)
            saw_kept = True
        else:
            assert t_ve is None and t_ws is None
            saw_dropped = True
    assert saw_kept and saw_dropped, "fixture exercises both branches"


# ----------------------------------------------------- stream transitions


def test_stream_transitions_batch_parity(run, spark, sf_dir):
    """The streaming stateful count must equal a Python lag-scan over
    the same (es, event_id)-ordered per-user sequences."""
    ev = [
        (r.user_id, int(r.ts.timestamp()), r.event_id, r.event_type)
        for r in load(spark, sf_dir, "events").collect()
        if r.event_type in ("view", "purchase")
    ]
    by_user: dict = defaultdict(list)
    for u, es, eid, et in ev:
        by_user[u].append((es, eid, et))
    want = {}
    for u, rows in by_user.items():
        rows.sort()
        n = 0
        for prev, cur in zip(rows, rows[1:]):
            if prev[2] == "view" and cur[2] == "purchase":
                n += 1
        want[u] = n
    got = {r.user_id: r.n_transitions for r in run("q_stream_transitions").collect()}
    assert got == want
