"""Round-6 fifth batch: dup-provenance matrix, embedding outliers,
mix token budget. Python recompute at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from kafka_to_parquet_spark.tables import load


def test_dup_provenance_matches_python(run, spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("text", "source").collect()
    fam: Counter = Counter()
    for r in docs:
        fam[(hashlib.sha256(r.text.encode()).hexdigest(), r.source)] += 1
    by_fp = defaultdict(dict)
    for (fp, s), c in fam.items():
        by_fp[fp][s] = c
    want: Counter = Counter()
    for srcs in by_fp.values():
        items = sorted(srcs.items())
        for i, (sa, ca) in enumerate(items):
            if ca >= 2:
                want[(sa, sa)] += ca * (ca - 1) // 2
            for sb, cb in items[i + 1 :]:
                want[(sa, sb)] += ca * cb
    got = {(r.sa, r.sb): r.dup_pairs for r in run("q_dup_provenance").collect()}
    assert got == dict(want)
    # pair-count conservation: matrix total equals sum over families
    # of C(family_size, 2)
    sizes: Counter = Counter()
    for (fp, _), c in fam.items():
        sizes[fp] += c
    assert sum(got.values()) == sum(c * (c - 1) // 2 for c in sizes.values())


def test_embed_outliers_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.similarity import CENTROID_MOD, OUTLIER_K

    em = load(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: list(r.embedding) for r in em}
    cents = {vid: v for vid, v in vecs.items() if vid % CENTROID_MOD == 0}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return round(
            dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))),
            6,
        )

    assign = {}
    for vid, v in vecs.items():
        best = max(cents.items(), key=lambda kv: (cos(v, kv[1]), -kv[0]))
        assign[vid] = (best[0], cos(v, best[1]))
    cells = defaultdict(list)
    for vid, (cid, c) in assign.items():
        cells[cid].append((c, vid))
    want = {}
    for cid, lst in cells.items():
        lst.sort()
        want[cid] = [vid for _, vid in lst[:OUTLIER_K]]
    got = defaultdict(list)
    for r in sorted(run("q_embed_outliers").collect(), key=lambda r: (r.cent_id, r.rank)):
        got[r.cent_id].append(r.vec_id)
    assert dict(got) == want


def test_mix_token_budget_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.corpus_stats import MIX_BUDGET_TOKENS

    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    toks: Counter = Counter()
    ndocs: Counter = Counter()
    for r in docs:
        toks[r.source] += len([t for t in r.text.lower().split() if t])
        ndocs[r.source] += 1
    rt = {s: round(1000000 * math.sqrt(float(t))) for s, t in toks.items()}
    rtot = sum(rt.values())
    got = {r.source: r for r in run("q_mix_token_budget").collect()}
    assert set(got) == set(toks)
    for s in toks:
        r = got[s]
        assert (r.n_docs, r.toks) == (ndocs[s], toks[s])
        assert r.share_bp == rt[s] * 10000 // rtot
        alloc = MIX_BUDGET_TOKENS * rt[s] // rtot
        assert r.alloc_tokens == alloc
        assert r.epochs_milli == alloc * 1000 // toks[s]
    # allocations sum to (just under) the budget
    assert 0 <= MIX_BUDGET_TOKENS - sum(r.alloc_tokens for r in got.values()) < len(got) * rtot // rtot + len(got)
