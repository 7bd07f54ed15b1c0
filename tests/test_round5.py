"""Invariant tests for the round-5 additions: bag-of-words dedup,
duplicated-span stripping, dup-cluster histogram, k-NN graph, and
type-token ratio. (q_join_bucketed's plan + value tests live in
tests/test_warehouse.py next to the other layout operators.)"""

from __future__ import annotations

from collections import Counter

from kafka_to_parquet_spark.tables import load


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


# ----------------------------------------------------------- q_dedup_bag


def test_bag_dedup_superset_of_exact_dup_members(run, spark, sf_dir):
    """Byte-identical copies are trivially bag-identical, so every
    member of an exact-dup group must appear in the bag output."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    by_text = Counter(r.text for r in docs)
    exact_members = {r.doc_id for r in docs if by_text[r.text] >= 2}
    bag_members = {r.doc_id for r in run("q_dedup_bag").collect()}
    assert exact_members <= bag_members


def test_bag_dedup_python_recompute(run, spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    groups: dict[tuple, list[int]] = {}
    for r in docs:
        groups.setdefault(tuple(sorted(_tokens(r.text))), []).append(r.doc_id)
    want = {}
    for ids in groups.values():
        if len(ids) >= 2:
            for d in ids:
                want[d] = (min(ids), len(ids))
    got = {r.doc_id: (r.keep_id, r.group_size) for r in run("q_dedup_bag").collect()}
    assert got == want


def test_bag_dedup_synthetic_reordered_corpus(spark, tmp_path):
    """The small fixtures contain no reordered-token duplicates, so the
    recompute/superset tests above compare empty-to-empty at sf0.001 —
    a canonicalization bug would ship green. This corpus exercises the
    semantics the query exists for: reordered copies match, differing
    multisets (same set, different counts) don't, and token-boundary
    collisions ('ab c' vs 'a bc') don't."""
    from kafka_to_parquet_spark.llm.dedup import q_dedup_bag

    rows = [
        (1, "en", "s", "the quick brown fox"),
        (2, "en", "s", "fox brown quick the"),     # reordered dup of 1
        (3, "en", "s", "the quick brown fox"),     # byte-identical to 1
        (4, "en", "s", "the the quick brown fox"), # extra 'the': multiset differs
        (5, "en", "s", "ab c"),
        (6, "en", "s", "a bc"),                    # same chars, different tokens
        (7, "en", "s", "  Fox  BROWN quick the "), # case/whitespace-normalized dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: (r.keep_id, r.group_size)
        for r in q_dedup_bag(spark, str(tmp_path)).collect()
    }
    assert got == {1: (1, 4), 2: (1, 4), 3: (1, 4), 7: (1, 4)}


# ----------------------------------------------------- q_dedup_span_strip


def test_span_strip_affected_set_matches_profile(run):
    """The affected doc set must equal q_dedup_substring's output docs
    with at least one duplicated window (both derive from the same
    persisted fingerprint table, through different aggregations)."""
    prof = {r.doc_id for r in run("q_dedup_substring").collect() if r.n_dup > 0}
    strip = {r.doc_id for r in run("q_dedup_span_strip").collect()}
    assert strip == prof


def test_span_strip_output_is_subsequence(run, spark, sf_dir):
    texts = {
        r.doc_id: _tokens(r.text)
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    rows = run("q_dedup_span_strip").collect()
    assert rows
    for r in rows:
        kept = _tokens(r.cleaned) if r.cleaned else []
        assert r.n_kept == len(kept)
        orig = texts[r.doc_id]
        assert len(kept) < len(orig)  # something was stripped
        # kept must be a subsequence of the original token stream
        it = iter(orig)
        assert all(tok in it for tok in kept)


def test_span_strip_python_recompute(run, spark, sf_dir):
    """Independent recompute of covered positions from raw text."""
    from kafka_to_parquet_spark.llm.dedup import SUBSTR_W

    import hashlib

    P = 2_147_483_647

    def h31(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % P

    texts = {
        r.doc_id: _tokens(r.text)
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    owners: dict[int, set[int]] = {}
    wins: dict[int, list[tuple[int, int]]] = {}
    for d, toks in texts.items():
        ws = []
        for i in range(len(toks) - SUBSTR_W + 1):
            wh = h31(" ".join(toks[i : i + SUBSTR_W]))
            ws.append((i + 1, wh))
            owners.setdefault(wh, set()).add(d)
        wins[d] = ws
    dup = {wh for wh, ds in owners.items() if len(ds) >= 2}
    want = {}
    for d, toks in texts.items():
        cov: set[int] = set()
        for i, wh in wins[d]:
            if wh in dup:
                cov.update(range(i, i + SUBSTR_W))
        if cov:
            kept = [t for p, t in enumerate(toks, 1) if p not in cov]
            want[d] = (len(kept), " ".join(kept))
    got = {
        r.doc_id: (r.n_kept, r.cleaned) for r in run("q_dedup_span_strip").collect()
    }
    assert got == want


# --------------------------------------------------- q_dup_cluster_stats


def test_cluster_stats_docs_sum_to_corpus(run, spark, sf_dir):
    rows = run("q_dup_cluster_stats").collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_docs == r.group_size * r.n_clusters
        assert r.group_size >= 1 and r.n_clusters >= 1


def test_cluster_stats_matches_components(run):
    sizes = Counter(
        Counter(r.component for r in run("q_dedup_components").collect()).values()
    )
    got = {r.group_size: r.n_clusters for r in run("q_dup_cluster_stats").collect()}
    assert got == dict(sizes)


# ----------------------------------------------------------- q_knn_graph


def _ivf_cells(spark, sf_dir):
    """Python recompute of the IVF home assignment (rounded sqdist,
    centroid-id tiebreak) — shared by the knn-graph tests."""
    from kafka_to_parquet_spark.llm.similarity import KNN_IVF_MOD

    rows = load(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: r.embedding for r in rows}
    labels = {r.vec_id: r.label for r in rows}
    cents = {v: vecs[v] for v in vecs if v % KNN_IVF_MOD == 0}

    def sqd(a, b):
        return round(sum((x - y) * (x - y) for x, y in zip(a, b)), 6)

    cell = {
        v: min(cents, key=lambda c: (sqd(e, cents[c]), c)) for v, e in vecs.items()
    }
    return vecs, labels, cell


def test_knn_graph_shape_and_ranks(run, spark, sf_dir):
    """Blocked on (label, ivf_cell): neighbors share BOTH, ranks are a
    dense 1..min(K, block-1) prefix per vector."""
    from kafka_to_parquet_spark.llm.similarity import KNN_K

    vecs, labels, cell = _ivf_cells(spark, sf_dir)
    block = Counter((labels[v], cell[v]) for v in vecs)
    per = {}
    for r in run("q_knn_graph").collect():
        assert labels[r.nbr_id] == labels[r.vec_id]  # label filter
        assert cell[r.nbr_id] == cell[r.vec_id]  # ivf blocking
        assert r.nbr_id != r.vec_id
        assert -1.000001 <= r.cos <= 1.000001
        per.setdefault(r.vec_id, []).append(r.rnk)
    for v in vecs:
        want = min(KNN_K, block[(labels[v], cell[v])] - 1)
        ranks = sorted(per.get(v, []))
        assert ranks == list(range(1, want + 1)), (v, ranks, want)


def test_knn_graph_neighbors_are_truly_nearest(run, spark, sf_dir):
    """Python recompute on the largest (label, cell) block: the
    reported top-k (by rounded cosine, id tiebreak) must equal the
    exhaustive ranking within the block."""
    import math

    from kafka_to_parquet_spark.llm.similarity import KNN_K

    vecs, labels, cell = _ivf_cells(spark, sf_dir)
    key = Counter((labels[v], cell[v]) for v in vecs).most_common(1)[0][0]
    block = {v: vecs[v] for v in vecs if (labels[v], cell[v]) == key}
    assert len(block) >= 2, "fixture block too small to exercise ranking"
    rows = [r for r in run("q_knn_graph").collect() if r.vec_id in block]
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append((r.rnk, r.nbr_id, r.cos))
    for v, emb in block.items():
        nv = math.sqrt(sum(x * x for x in emb))
        cand = []
        for u, e2 in block.items():
            if u == v:
                continue
            nu = math.sqrt(sum(x * x for x in e2))
            c = sum(a * b for a, b in zip(emb, e2)) / (nv * nu)
            cand.append((round(c, 6), u))
        cand.sort(key=lambda t: (-t[0], t[1]))
        want = [
            (i + 1, u, c) for i, (c, u) in enumerate(cand[:KNN_K])
        ]
        have = sorted(by_vec.get(v, []))
        assert [(r, u) for r, u, _ in have] == [(r, u) for r, u, _ in want], v
        for (_, _, ch), (_, _, cw) in zip(have, want):
            assert abs(ch - cw) <= 1e-6


# ----------------------------------------------------------- q_ttr_source


def test_ttr_python_recompute(run, spark, sf_dir):
    agg: dict[tuple, tuple[set, int]] = {}
    for r in load(spark, sf_dir, "documents").collect():
        types, n = agg.setdefault((r.lang, r.source), (set(), 0))
        toks = _tokens(r.text)
        types.update(toks)
        agg[(r.lang, r.source)] = (types, n + len(toks))
    want = {
        k: (len(ts), n, len(ts) * 10000 // n) for k, (ts, n) in agg.items() if n
    }
    got = {
        (r.lang, r.source): (r.n_types, r.n_tokens, r.ttr_bp)
        for r in run("q_ttr_source").collect()
    }
    assert got == want


# ----------------------------------------------------------- q_lsh_recall


def test_lsh_recall_counts_match_direct_sets(run):
    truth = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in run("q_dedup_jaccard_prefix").collect()
    }
    cand = {(r.doc_a, r.doc_b) for r in run("q_dedup_minhash").collect()}
    want: dict[int, list[int]] = {}
    for pair, j in truth.items():
        d = int(j * 10)
        n, c = want.get(d, (0, 0))
        want[d] = (n + 1, c + (1 if pair in cand else 0))
    got = {
        r.j_decile: (r.n_true, r.n_caught, r.recall_bp)
        for r in run("q_lsh_recall").collect()
    }
    assert {d: (n, c) for d, (n, c) in want.items()} == {
        d: (n, c) for d, (n, c, _) in got.items()
    }
    for d, (n, c, bp) in got.items():
        assert bp == c * 10000 // n


# ------------------------------------------------------- q_knn_graph_ivf


def test_knn_graph_ivf_python_recompute(run, spark, sf_dir):
    """Full Python recompute at sf0.001: assignment (rounded sqdist,
    centroid-id tiebreak) then within-cell top-k by rounded cosine."""
    import math

    from kafka_to_parquet_spark.llm.similarity import KNN_IVF_MOD, KNN_K

    vecs = {r.vec_id: r.embedding for r in load(spark, sf_dir, "embeddings").collect()}
    cents = {v: vecs[v] for v in vecs if v % KNN_IVF_MOD == 0}

    def sqd(a, b):
        return round(sum((x - y) * (x - y) for x, y in zip(a, b)), 6)

    cell = {
        v: min(cents, key=lambda c: (sqd(e, cents[c]), c)) for v, e in vecs.items()
    }
    norms = {v: math.sqrt(sum(x * x for x in e)) for v, e in vecs.items()}
    want = {}
    for v, e in vecs.items():
        cand = []
        for u, e2 in vecs.items():
            if u == v or cell[u] != cell[v]:
                continue
            c = round(
                sum(a * b for a, b in zip(e, e2)) / (norms[v] * norms[u]), 6
            )
            cand.append((c, u))
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rnk, (c, u) in enumerate(cand[:KNN_K], 1):
            want[(v, rnk)] = (u, c)
    got = {}
    for r in run("q_knn_graph_ivf").collect():
        got[(r.vec_id, r.rnk)] = (r.nbr_id, r.cos)
    assert set(got) == set(want)
    for k, (u, c) in want.items():
        gu, gc = got[k]
        assert gu == u, (k, gu, u)
        assert abs(gc - c) <= 2e-6


# -------------------------------------------------- q_dedup_minhash_incr


def test_minhash_incr_equals_cross_split_slice_of_full_join(run):
    """Same band index, different join shape: the incremental (batch ×
    corpus) pairs must be exactly the full self-join's pairs that
    straddle the batch split, with identical verified Jaccard."""
    from kafka_to_parquet_spark.llm.dedup import INCR_MOD, INCR_REM

    full = {
        tuple(sorted((r.doc_a, r.doc_b))): r.jaccard
        for r in run("q_dedup_minhash").collect()
    }
    incr = {}
    for r in run("q_dedup_minhash_incr").collect():
        assert r.batch_doc % INCR_MOD == INCR_REM
        assert r.corpus_doc % INCR_MOD != INCR_REM
        incr[tuple(sorted((r.batch_doc, r.corpus_doc)))] = r.jaccard
    want = {
        pair: j
        for pair, j in full.items()
        if (pair[0] % INCR_MOD == INCR_REM) != (pair[1] % INCR_MOD == INCR_REM)
    }
    assert incr == want


# --------------------------------------------------- q_knn_multiprobe


def test_multiprobe_dominates_single_probe(run):
    """Probing 2 cells against the same single-home index can only
    widen each vector's candidate set (probes ⊇ home), so at every
    rank the multiprobe neighbor's cosine must be ≥ the single-probe
    twin's — recall monotonicity, the property the nprobe knob buys."""
    single = {(r.vec_id, r.rnk): r.cos for r in run("q_knn_graph_ivf").collect()}
    multi = {(r.vec_id, r.rnk): r.cos for r in run("q_knn_multiprobe").collect()}
    assert set(single) <= set(multi)  # a found rank never disappears
    worse = [k for k in single if multi[k] < single[k]]
    assert worse == []


# ------------------------------------- q_quality_gopher / q_sample_temperature


def test_gopher_rules_python_recompute(run, spark, sf_dir):
    from collections import Counter as C

    from kafka_to_parquet_spark.functions.text import STOPWORDS
    from kafka_to_parquet_spark.llm.corpus_stats import (
        GOPHER_MAX_TOKENS,
        GOPHER_MAX_TOPWORD_PCT,
        GOPHER_MIN_STOP_TYPES,
        GOPHER_MIN_TOKENS,
    )

    want = {}
    for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect():
        toks = _tokens(r.text)
        tf = C(toks)
        n, chars, mx = len(toks), sum(map(len, toks)), max(tf.values())
        stops = sum(1 for w in tf if w in STOPWORDS)
        rl = int(GOPHER_MIN_TOKENS <= n <= GOPHER_MAX_TOKENS)
        rm = int(17 * n <= 4 * chars <= 19 * n)
        rr = int(GOPHER_MAX_TOPWORD_PCT * mx <= n)
        rs = int(stops >= GOPHER_MIN_STOP_TYPES)
        want[r.doc_id] = (rl, rm, rr, rs, rl & rm & rr & rs)
    got = {
        r.doc_id: (r.r_len, r.r_mwl, r.r_rep, r.r_stop, r.keep)
        for r in run("q_quality_gopher").collect()
    }
    assert got == want
    # every rule must actually split somewhere across the fixtures
    # (the mwl window was vacuous before being tuned to the corpus)
    for i in range(4):
        vals = {v[i] for v in want.values()}
        assert vals == {0, 1}, f"rule {i} does not split the fixture"


def test_sample_temperature_flattens_shares(run, spark, sf_dir):
    """Recompute keep_bp exactly; check the temperature property: the
    kept-fraction (keep_bp) never increases with source size, and the
    expected sample is ~half the corpus."""
    import math

    n_by_src = Counter(
        r.source for r in load(spark, sf_dir, "documents").select("source").collect()
    )
    total = sum(n_by_src.values())
    w = {s: math.floor(math.sqrt(n * 1_000_000)) for s, n in n_by_src.items()}
    z = sum(w.values())
    bp = {
        s: min(10000, (5000 * total * w[s]) // (z * n_by_src[s])) for s in n_by_src
    }
    rows = run("q_sample_temperature").collect()
    got_bp = {r.source: r.keep_bp for r in rows}
    assert got_bp == {s: v for s, v in bp.items() if any(r.source == s for r in rows)}
    by_size = sorted(n_by_src, key=n_by_src.get)
    for small, big in zip(by_size, by_size[1:]):
        assert bp[small] >= bp[big], (small, big)
    expect = sum(n_by_src[s] * bp[s] / 10000 for s in n_by_src)
    assert abs(len(rows) - expect) <= 3 * math.sqrt(expect) + 5  # hash-gate noise


# ----------------------------------------------------- q_dedup_keep_best


def test_keep_best_picks_longest_member(run, spark, sf_dir):
    """One kept row per component; the kept doc is the component's
    longest member (min doc_id on ties) and group sizes agree with
    q_dedup_components."""
    comp = {r.doc_id: r.component for r in run("q_dedup_components").collect()}
    chars = {
        r.doc_id: r.n_chars
        for r in load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    members: dict[int, list[int]] = {}
    for d, c in comp.items():
        members.setdefault(c, []).append(d)
    rows = run("q_dedup_keep_best").collect()
    assert len(rows) == len(members)
    for r in rows:
        ms = members[r.component]
        best = min(ms, key=lambda d: (-chars[d], d))
        assert r.doc_id == best
        assert r.group_size == len(ms)
        assert r.n_chars == chars[best]


def test_keep_best_and_keep_same_components(run):
    """Both policies must partition the corpus identically — only the
    chosen representative differs. q_dedup_keep's kept doc_id IS the
    component id (min-id policy), so it must equal keep_best's
    component column exactly."""
    best = {r.component: r.group_size for r in run("q_dedup_keep_best").collect()}
    keep = {r.doc_id: r.group_size for r in run("q_dedup_keep").collect()}
    assert best == keep


# --------------------------------------------------------- q_select_topq


def test_select_topq_python_recompute(run, spark, sf_dir):
    """Exact recompute: per source keep ceil(20%) by (score desc,
    doc_id) where score comes from the declared quality query."""
    import math

    score = {r.doc_id: r.quality_score for r in run("q_text_quality").collect()}
    src = {
        r.doc_id: r.source
        for r in load(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    by_src: dict[str, list[int]] = {}
    for d, s in src.items():
        by_src.setdefault(s, []).append(d)
    want = set()
    for s, ds in by_src.items():
        k = math.ceil(len(ds) * 0.2)
        ds.sort(key=lambda d: (-score[d], d))
        want.update(ds[:k])
    rows = run("q_select_topq").collect()
    assert {r.doc_id for r in rows} == want
    assert rows and all(r.quality_score == score[r.doc_id] for r in rows)


# ------------------------------------------------------------- q_skyline


def test_skyline_python_recompute_and_prune_invariance(run, spark, sf_dir):
    """Exhaustive O(n²) dominance recompute; then re-run the same
    pandas skyline routine with a different bucket count to pin the
    local-prune losslessness (output must not depend on bucketing)."""
    import collections

    spend: dict[int, int] = collections.defaultdict(int)
    cnt: dict[int, int] = collections.defaultdict(int)
    for r in load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect():
        spend[r.o_custkey] += int(round(r.o_totalprice * 100))
        cnt[r.o_custkey] += 1
    pts = [(k, spend[k], cnt[k]) for k in spend]
    want = {
        (k, s, c)
        for k, s, c in pts
        if not any(
            (s2 >= s and c2 >= c and (s2 > s or c2 > c)) for _, s2, c2 in pts
        )
    }
    got = {(r.custkey, r.spend_cents, r.n_orders) for r in run("q_skyline").collect()}
    assert got == want
    assert got  # non-vacuous

    # Bucketing invariance: the pandas routine applied globally (one
    # bucket) must equal the two-stage result.
    import pandas as pd

    from kafka_to_parquet_spark.operators.preference import _skyline_block

    pdf = pd.DataFrame(pts, columns=["custkey", "spend_cents", "n_orders"])
    single = _skyline_block(pdf)
    assert {tuple(x) for x in single.to_numpy()} == want


# ---------------------------------------------------------- q_outliers_mad


def test_mad_outliers_python_recompute(run, spark, sf_dir):
    """Exact recompute with Python statistics.median on integer cents;
    also checks robustness vs the z-score screen: the MAD flag set is
    computed from medians, so it must be non-empty and every flagged
    row's deviation must exceed 2.25x its type's MAD."""
    import statistics as st

    import math

    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in load(spark, sf_dir, "events").select("event_id", "event_type", "value").collect():
        # floor(x+0.5) = HALF_UP, matching both engines' round();
        # Python round() is banker's and would diverge on a future
        # fixture containing an exact half-cent midpoint.
        by_type.setdefault(r.event_type, []).append(
            (r.event_id, int(math.floor(r.value * 100 + 0.5)))
        )
    want = set()
    stats = {}
    for t, rows in by_type.items():
        cs = [c for _, c in rows]
        med2 = round(2 * st.median(cs))
        dds = [abs(2 * c - med2) for c in cs]
        mad_d2 = round(2 * st.median(dds))
        stats[t] = (med2, mad_d2)
        for (eid, c), dd in zip(rows, dds):
            if 4 * dd > 9 * mad_d2:
                want.add((eid, t, c, med2, mad_d2))
    got = {
        (r.event_id, r.event_type, r.cents, r.med2, r.mad_d2)
        for r in run("q_outliers_mad").collect()
    }
    assert got == want
    assert got


# --------------------------------------------------------- q_event_pattern


def test_event_pattern_python_recompute(run, spark, sf_dir):
    """Journey strings and conversion-run counts recomputed with
    Python re over the (ts, event_id)-ordered event stream."""
    import re

    ch = {"click": "c", "error": "e", "purchase": "p", "signup": "s", "view": "v"}
    evs: dict[int, list[tuple]] = {}
    for r in load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect():
        evs.setdefault(r.user_id, []).append((r.ts, r.event_id, ch[r.event_type]))
    want = {}
    for u, rows in evs.items():
        rows.sort()
        j = "".join(c for _, _, c in rows)
        want[u] = (len(rows), j, len(re.findall(r"s[cv]*p", j)))
    got = {
        r.user_id: (r.n_events, r.journey, r.n_conv)
        for r in run("q_event_pattern").collect()
    }
    assert got == want
    assert any(v[2] > 0 for v in want.values())  # pattern actually fires


def test_skyline_block_property_based():
    """Hypothesis: for arbitrary integer point sets, _skyline_block
    returns exactly the non-dominated rows (>=/>= with one strict),
    keeps ALL co-optimal duplicates, and is invariant to splitting
    into buckets first (the losslessness the distributed plan rests
    on) — including adversarial tie-heavy inputs the fixture lacks."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_to_parquet_spark.operators.preference import _skyline_block

    pts = st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 12)),  # dense → many ties
        min_size=1,
        max_size=120,
    )

    @settings(max_examples=250, deadline=None)
    @given(pts)
    def check(rows):
        pdf = pd.DataFrame(
            [(i, s, c) for i, (s, c) in enumerate(rows)],
            columns=["custkey", "spend_cents", "n_orders"],
        )
        want = {
            i
            for i, (s, c) in enumerate(rows)
            if not any(
                s2 >= s and c2 >= c and (s2 > s or c2 > c) for s2, c2 in rows
            )
        }
        got = set(_skyline_block(pdf)["custkey"])
        assert got == want
        # bucketing invariance: local skylines then merge == global
        merged = pd.concat(
            [_skyline_block(pdf[pdf["custkey"] % 3 == b]) for b in range(3)]
        )
        assert set(_skyline_block(merged)["custkey"]) == want

    check()


# --------------------------------------------------- q_chi2_independence


def test_chi2_python_recompute(run, spark, sf_dir):
    """Recompute the contingency chi-square (micro-units) with
    scipy-free Python; dof, cell count, and chi2_micro must match
    exactly (the per-term double expression and round are identical,
    and the cross-cell sum is pure integer)."""
    from collections import Counter as C

    pairs = [
        (r.lang, r.source)
        for r in load(spark, sf_dir, "documents").select("lang", "source").collect()
    ]
    cell = C(pairs)
    rowt = C(p[0] for p in pairs)
    colt = C(p[1] for p in pairs)
    n = len(pairs)
    chi2_micro = sum(
        round(
            1e6
            * (float(n) * c - float(rowt[l]) * colt[s]) ** 2
            / (float(n) * rowt[l] * colt[s])
        )
        for (l, s), c in cell.items()
    )
    row = run("q_chi2_independence").collect()[0]
    assert row.n_cells == len(cell)
    assert row.dof == (len(rowt) - 1) * (len(colt) - 1)
    assert row.chi2_micro == chi2_micro
    assert row.chi2_micro > 0
