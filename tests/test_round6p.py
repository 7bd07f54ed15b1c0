"""Round-6 sixteenth batch: unique-shingle share, order-size
distribution. Python recompute at sf0.001."""

from __future__ import annotations

from collections import Counter, defaultdict

from kafka_to_parquet_spark.tables import load


def test_unique_shingle_share_matches_python(run, spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    per: defaultdict = defaultdict(set)
    for r in docs:
        toks = r.text.lower().split()
        per[r.source].update(
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2))
    owners: Counter = Counter()
    for ss in per.values():
        owners.update(ss)
    got = {r.source: (r.n_shingles, r.n_unique, r.unique_ppm)
           for r in run("q_unique_shingle_share").collect()}
    assert set(got) == set(per)
    for src, ss in per.items():
        uniq = sum(1 for s in ss if owners[s] == 1)
        assert got[src] == (len(ss), uniq, uniq * 1_000_000 // len(ss))
    # originality must actually vary across sources
    ppms = [v[2] for v in got.values()]
    assert max(ppms) > 0


def test_order_size_dist_matches_python(run, spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity").collect()
    lines: Counter = Counter()
    qty: Counter = Counter()
    for r in li:
        lines[r.l_orderkey] += 1
        qty[r.l_orderkey] += int(r.l_quantity)
    n_ord: Counter = Counter()
    q_tot: Counter = Counter()
    for ok, n in lines.items():
        n_ord[n] += 1
        q_tot[n] += qty[ok]
    orders_total = sum(n_ord.values())
    qty_total = sum(q_tot.values())
    got = {r.n_lines: (r.n_orders, r.share_ppm, r.total_qty, r.qty_share_ppm)
           for r in run("q_order_size_dist").collect()}
    assert got == {
        n: (c, c * 1_000_000 // orders_total, q_tot[n],
            q_tot[n] * 1_000_000 // qty_total)
        for n, c in n_ord.items()
    }
    assert sum(v[0] for v in got.values()) == orders_total
