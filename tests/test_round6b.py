"""Round-6 second batch: null-aware anti join, graph Jaccard.
Python recompute at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from kafka_to_parquet_spark.tables import load


def _cents(v: float) -> int:
    x = v * 100
    f = math.floor(x)
    return int(f + 1) if x - f >= 0.5 else int(f)


def test_null_aware_matches_python(run, spark, sf_dir):
    excl = {
        r.user_id
        for r in load(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select("user_id")
        .collect()
    }
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    kept = [r for r in orders if r.o_custkey not in excl]
    row = run("q_join_null_aware").collect()[0]
    assert row.n_orders == len(kept)
    assert row.revenue_c == sum(_cents(r.o_totalprice) for r in kept)


def test_null_aware_empty_on_null(spark, sf_dir):
    """A NULL in the subquery must empty the NOT IN result — the
    three-valued-logic behavior the NAAJ plan preserves and a plain
    left-anti would get wrong."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("naaj_t_orders")
    n = spark.sql(
        """
SELECT count(*) AS n FROM naaj_t_orders
WHERE o_custkey NOT IN (SELECT CAST(NULL AS BIGINT))
"""
    ).collect()[0].n
    assert n == 0


def test_graph_jaccard_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.graph import JACCARD_K

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    orders_of = defaultdict(set)
    for r in li:
        orders_of[r.l_partkey].add(r.l_orderkey)
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    support = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                support[(a, b)] += 1
    rows = []
    for (a, b), s in support.items():
        union = len(orders_of[a]) + len(orders_of[b]) - s
        rows.append((a, b, s, s * 10000 // union))
    rows.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    want = rows[:JACCARD_K]
    got = [(r.pa, r.pb, r.support, r.jac_bp) for r in run("q_graph_jaccard").collect()]
    assert got == want
