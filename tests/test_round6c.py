"""Round-6 third batch: NDCG@k eval, hard-negative mining, dataset
card. Python recompute at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from kafka_to_parquet_spark.tables import load


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def test_ndcg_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.search import BM25_TERMS, _TOP_K

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    rel = {}
    for r in docs:
        k = len(set(_toks(r.text)) & set(BM25_TERMS))
        if k:
            rel[r.doc_id] = k

    def term(rl: int, pos: int) -> int:
        return round(1000000 * ((2.0**rl - 1) / math.log2(pos + 1)))

    ranked = run("q_bm25").collect()
    ranked.sort(key=lambda r: (-r.score_units, r.doc_id))
    dcg = sum(term(r.n_terms, pos) for pos, r in enumerate(ranked, start=1))
    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOP_K]
    idcg = sum(term(rl, pos) for pos, (_, rl) in enumerate(ideal, start=1))
    row = run("q_ndcg_bm25").collect()[0]
    assert row.k == _TOP_K
    assert abs(row.dcg_micro - dcg) <= _TOP_K  # per-position libm ulp slack
    assert abs(row.idcg_micro - idcg) <= _TOP_K
    assert row.ndcg_bp == row.dcg_micro * 10000 // row.idcg_micro
    assert 0 < row.ndcg_bp <= 10000


def test_hard_negatives_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.similarity import N_QUERIES, TOP_K

    em = load(spark, sf_dir, "embeddings").collect()
    by_id = {r.vec_id: (list(r.embedding), r.label) for r in em}
    want = {}
    for qid in range(N_QUERIES):
        if qid not in by_id:
            continue
        qe, ql = by_id[qid]
        qn = math.sqrt(sum(x * x for x in qe))
        cand = []
        for cid, (ce, cl) in by_id.items():
            if cl == ql:
                continue
            dot = sum(a * b for a, b in zip(qe, ce))
            cn = math.sqrt(sum(x * x for x in ce))
            cand.append((cid, cl, round(dot / (qn * cn), 6)))
        cand.sort(key=lambda t: (-t[2], t[0]))
        want[qid] = [(c, l) for c, l, _ in cand[:TOP_K]]
    got = defaultdict(list)
    for r in sorted(run("q_hard_negatives").collect(), key=lambda r: (r.q_id, r.rank)):
        got[r.q_id].append((r.c_id, r.c_label))
        # negatives really are negatives
        assert by_id[r.c_id][1] != by_id[r.q_id][1]
    # float fold order differs between Python and the SQL aggregate;
    # compare the 6-dp-rounded ranking's membership per query.
    for qid, lst in want.items():
        assert set(got[qid]) == set(lst)


def test_dataset_card_matches_python(run, spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("source", "lang", "n_chars").collect()
    cells: Counter = Counter()
    chars: Counter = Counter()
    for r in docs:
        cells[(r.source, r.lang)] += 1
        chars[r.source] += r.n_chars
    n_by_source: Counter = Counter()
    for (s, _), c in cells.items():
        n_by_source[s] += c
    got = {r.source: r for r in run("q_dataset_card").collect()}
    assert set(got) == set(n_by_source)
    for s, n in n_by_source.items():
        r = got[s]
        assert r.n_docs == n
        assert r.n_langs == sum(1 for (s2, _) in cells if s2 == s)
        assert r.total_chars == chars[s]
        assert r.mean_chars_c == chars[s] * 100 // n
        h = sum(
            round(1000000 * ((c / n) * math.log(n / c)))
            for (s2, _), c in cells.items()
            if s2 == s
        )
        assert abs(r.lang_h_micro - h) <= 2
        assert 0 <= r.lang_h_micro <= round(1000000 * math.log(r.n_langs)) + 2
