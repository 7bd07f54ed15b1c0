"""Round-7 session tests: the numpy sequential-fold helper behind
q_semdedup's applyInPandas prune, and its bit-parity with the SQL
fold twins (dot_expr / duck_dot)."""

from __future__ import annotations

import random

import duckdb
import numpy as np
from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.vectors import (
    dot_expr,
    duck_dot,
    np_seq_dot,
)


def _py_fold(prods) -> float:
    s = 0.0
    for p in prods:
        s = s + float(p)
    return s


def test_np_cumsum_matches_sequential_fold():
    """np_seq_dot (cumsum) must accumulate in the exact IEEE op order
    of the SQL engines' sequential left folds — np.dot/einsum's
    pairwise summation would not. Bitwise comparison, not isclose:
    a single reordered add can flip q_semdedup's threshold compare."""
    rng = random.Random(7)
    for _ in range(200):
        n = rng.randint(1, 80)
        a = np.array([rng.uniform(-2, 2) for _ in range(n)], dtype=np.float32)
        b = np.array([rng.uniform(-2, 2) for _ in range(n)], dtype=np.float32)
        prods = a.astype(np.float64) * b.astype(np.float64)
        got = float(np_seq_dot(prods))
        want = _py_fold(prods)
        assert np.float64(got).tobytes() == np.float64(want).tobytes()
    # batched form (the Gram-matrix path): last axis reduced per pair
    m = np.array(
        [[rng.uniform(-2, 2) for _ in range(16)] for _ in range(5)],
        dtype=np.float32,
    ).astype(np.float64)
    gram = np_seq_dot(m[:, None, :] * m[None, :, :])
    for i in range(5):
        for j in range(5):
            want = _py_fold(m[i] * m[j])
            assert np.float64(gram[i, j]).tobytes() == np.float64(want).tobytes()


def test_np_seq_dot_matches_spark_and_duckdb_folds(spark):
    """Cross-engine leg: the same float32 vectors through Spark's
    aggregate() fold, DuckDB's list_reduce fold, and np_seq_dot give
    bitwise-identical doubles."""
    rng = random.Random(11)
    vecs = [
        [rng.uniform(-2, 2) for _ in range(64)] for _ in range(20)
    ]
    f32 = [[float(x) for x in np.array(v, dtype=np.float32)] for v in vecs]
    df = spark.createDataFrame(
        [(i, f32[i], f32[(i + 1) % 20]) for i in range(20)],
        "i int, a array<float>, b array<float>",
    )
    spark_dots = {
        r.i: r.d
        for r in df.select("i", F.expr(dot_expr("a", "b")).alias("d")).collect()
    }
    con = duckdb.connect()
    for i in range(20):
        fa, fb = f32[i], f32[(i + 1) % 20]
        # literals parse as DECIMAL in DuckDB and DECIMAL→FLOAT rounds
        # differently than DOUBLE→FLOAT — route through DOUBLE[] (the
        # parquet path never sees literals, so this is harness-only)
        duck = con.execute(
            f"SELECT {duck_dot('$a$', '$b$')}".replace(
                "$a$", f"CAST(CAST({fa} AS DOUBLE[]) AS FLOAT[])"
            ).replace("$b$", f"CAST(CAST({fb} AS DOUBLE[]) AS FLOAT[])")
        ).fetchone()[0]
        prods = np.array(fa, dtype=np.float32).astype(np.float64) * np.array(
            fb, dtype=np.float32
        ).astype(np.float64)
        mine = float(np_seq_dot(prods))
        assert np.float64(mine).tobytes() == np.float64(duck).tobytes()
        assert np.float64(mine).tobytes() == np.float64(spark_dots[i]).tobytes()


# ---------------------------------------------------------------------------
# Python recomputes for the five round-7 declarations (sf0.001)
# ---------------------------------------------------------------------------

import hashlib
import math
from collections import Counter, defaultdict

from kafka_to_parquet_spark.tables import load


def _h31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2_147_483_647


def test_graph_kcore_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.batch7 import KCORE_Q, KCORE_ROUNDS

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").collect()
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    cust = {r.o_orderkey: r.o_custkey for r in od}
    e0 = {(cust[r.l_orderkey] * 2, r.l_suppkey * 2 + 1) for r in li}
    edges = e0 | {(d, s) for s, d in e0}
    nbrs: defaultdict = defaultdict(set)
    for s, d in edges:
        nbrs[s].add(d)
    degs = sorted(len(v) for v in nbrs.values())
    kk = degs[math.ceil(KCORE_Q * len(degs)) - 1]
    alive = set(nbrs)
    deg = {}
    for _ in range(KCORE_ROUNDS):
        deg = {
            n: sum(1 for m in nbrs[n] if m in alive)
            for n in alive
            if any(m in alive for m in nbrs[n])
        }
        alive = {n for n, d in deg.items() if d >= kk}
    want = sorted((n, deg[n]) for n in alive)
    got = [(r.node, r.degree) for r in run("q_graph_kcore").collect()]
    assert got == want
    # non-degenerate: the peel must actually remove nodes
    assert 0 < len(alive) < len(nbrs)


def test_search_phrase_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.batch7 import PHRASE_TOP_DOCS

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    bg: Counter = Counter()
    per_doc: defaultdict = defaultdict(Counter)
    for r in docs:
        toks = [t for t in r.text.lower().split() if t]
        for i in range(len(toks) - 1):
            pair = (toks[i], toks[i + 1])
            bg[pair] += 1
            per_doc[r.doc_id][pair] += 1
    top = min(bg, key=lambda p: (-bg[p], p[0], p[1]))
    rows = sorted(
        ((d, c[top]) for d, c in per_doc.items() if c[top] > 0),
        key=lambda t: (-t[1], t[0]),
    )[:PHRASE_TOP_DOCS]
    got = [
        (r.doc_id, r.word1, r.word2, r.occurrences)
        for r in run("q_search_phrase").collect()
    ]
    assert got == [(d, top[0], top[1], c) for d, c in rows]


def test_multimodal_hashdup_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.batch7 import HASHDUP_HEADER_BYTES

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    fam: defaultdict = defaultdict(list)
    for r in docs:
        b = r.text.encode("utf-8")
        fam[hashlib.md5(b[:HASHDUP_HEADER_BYTES]).hexdigest()].append(
            (r.doc_id, hashlib.md5(b).hexdigest(), len(b))
        )
    want = sorted(
        (
            h,
            len(v),
            len({f for _, f, _ in v}),
            min(d for d, _, _ in v),
            min(n for _, _, n in v),
            max(n for _, _, n in v),
        )
        for h, v in fam.items()
        if len(v) >= 2
    )
    got = [
        (r.header_md5, r.n_copies, r.n_distinct_payloads, r.keep_doc,
         r.min_bytes, r.max_bytes)
        for r in run("q_multimodal_hashdup").collect()
    ]
    assert got == want
    assert want, "fixture must produce at least one header family"


def test_keyness_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.batch7 import KEYNESS_TOP

    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    sw: Counter = Counter()
    for r in docs:
        for t in r.text.lower().split():
            if t:
                sw[(r.source, t)] += 1
    stot: Counter = Counter()
    wtot: Counter = Counter()
    for (s, w), a in sw.items():
        stot[s] += a
        wtot[w] += a
    nt = sum(sw.values())
    scored: defaultdict = defaultdict(list)
    for (s, w), a in sw.items():
        mu = math.floor(
            (
                math.log((a + 1.0) / (stot[s] - a + 1.0))
                - math.log((wtot[w] - a + 1.0) / (nt - stot[s] - (wtot[w] - a) + 1.0))
            )
            * 1000000
            + 0.5
        )
        scored[s].append((w, a, mu))
    want = []
    for s in sorted(scored):
        ranked = sorted(scored[s], key=lambda t: (-t[2], t[0]))[:KEYNESS_TOP]
        want += [(s, w, a, mu) for w, a, mu in ranked]
    got = [
        (r.source, r.word, r.tf, r.keyness_mu)
        for r in run("q_keyness").collect()
    ]
    assert got == want


def test_minhash_bbit_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.minhash import (
        MAX_BAND_BUCKET,
        MH_BANDS,
        MH_NUM_HASHES,
        MH_P,
        _mh_coeffs,
    )

    SHINGLE_N = 3
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    coeffs = _mh_coeffs()
    sh: dict = {}
    sig: dict = {}
    for r in docs:
        toks = r.text.lower().split()
        ss = {" ".join(toks[i:i + SHINGLE_N])
              for i in range(len(toks) - SHINGLE_N + 1)}
        if not ss:
            continue
        sh[r.doc_id] = ss
        hs = [_h31(s) for s in ss]
        sig[r.doc_id] = [min((a * h + b) % MH_P for h in hs) for a, b in coeffs]
    buckets: defaultdict = defaultdict(list)
    for d, m in sig.items():
        for j in range(MH_BANDS):
            buckets[(j, m[2 * j] * MH_P + m[2 * j + 1])].append(d)
    cand = set()
    for ds in buckets.values():
        if len(ds) > MAX_BAND_BUCKET:
            continue
        for a in ds:
            for b in ds:
                if a < b:
                    cand.add((a, b))
    scale = 10000 // MH_NUM_HASHES
    cells: defaultdict = defaultdict(list)
    for a, b in cand:
        agree = sum(
            1 for i in range(MH_NUM_HASHES) if sig[a][i] % 2 == sig[b][i] % 2
        )
        est = (2 * agree - MH_NUM_HASHES) * scale
        inter = len(sh[a] & sh[b])
        exact = inter * 10000 // (len(sh[a]) + len(sh[b]) - inter)
        cells[exact // 1000].append(abs(est - exact))
    got = {r.decile: (r.n_pairs, r.mean_abs_err_bp, r.max_abs_err_bp)
           for r in run("q_minhash_bbit").collect()}
    assert got == {d: (len(v), sum(v) // len(v), max(v))
                   for d, v in cells.items()}
