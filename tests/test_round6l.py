"""Round-6 twelfth batch: Bloom FPR audit, splitter hash-uniformity
KS audit. Python recompute at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from kafka_to_parquet_spark.tables import load


def rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def h31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2_147_483_647


def test_bloom_fpr_audit_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.corpus_stats import (
        BLOOM_K, BLOOM_M, BLOOM_SRC,
    )

    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    va: set = set()
    other: set = set()
    for r in docs:
        toks = r.text.lower().split()
        shingles = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        (va if r.source == BLOOM_SRC else other).update(shingles)
    vb = other - va
    bits = {h31(f"{i}:{w}") % BLOOM_M for i in range(BLOOM_K) for w in va}
    n_fp = sum(
        1 for w in vb
        if all(h31(f"{i}:{w}") % BLOOM_M in bits for i in range(BLOOM_K))
    )
    rows = run("q_bloom_fpr_audit").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_member, r.bits_set, r.n_probe, r.n_fp) == (
        len(va), len(bits), len(vb), n_fp)
    assert r.fpr_ppm == n_fp * 1_000_000 // len(vb)
    assert r.expected_ppm == rnd(1e6 * (len(bits) / BLOOM_M) ** BLOOM_K)
    # the filter is roomy at fixture scale: FPR must be tiny and in the
    # same decade as theory predicts
    assert r.fpr_ppm < 50_000


def test_hash_uniformity_matches_python(run, spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id").collect()
    c: Counter = Counter((r.doc_id * 2654435761) % 1000 for r in docs)
    n = len(docs)
    cum = 0
    d_scaled = 0
    for b in range(1000):
        cum += c.get(b, 0)
        d_scaled = max(d_scaled, abs(1000 * cum - (b + 1) * n))
    rows = run("q_hash_uniformity").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_docs, r.d_scaled) == (n, d_scaled)
    assert r.d_ppm == d_scaled * 1_000_000 // (1000 * n)
    flag = 1 if (d_scaled / (1000 * float(n))) * math.sqrt(float(n)) > 1.358 else 0
    assert r.reject_uniform == flag
    assert flag == 0  # the Knuth hash should PASS the uniformity test
