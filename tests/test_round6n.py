"""Round-6 fourteenth batch: weekly growth accounting, audience
overlap between event types. Python recompute at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations

from kafka_to_parquet_spark.tables import load


def test_growth_accounting_matches_python(run, spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts").collect()
    weeks: defaultdict = defaultdict(set)
    for r in ev:
        weeks[r.user_id].add(math.floor(r.ts.timestamp()) // 604800)
    mn = min(w for s in weeks.values() for w in s)
    mx = max(w for s in weeks.values() for w in s)
    want = {w: [0, 0, 0, 0] for w in range(mn, mx + 1)}  # active,new,ret,res
    for ws in weeks.values():
        ordered = sorted(ws)
        prev = None
        for w in ordered:
            cell = want[w]
            cell[0] += 1
            if prev is None:
                cell[1] += 1
            elif w - prev == 1:
                cell[2] += 1
            else:
                cell[3] += 1
            prev = w
    got = {r.w: (r.active, r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
           for r in run("q_growth_accounting").collect()}
    assert set(got) == set(want)
    prev_active = 0
    for w in range(mn, mx + 1):
        act, new, ret, res = want[w]
        assert got[w] == (act, new, ret, res, prev_active - ret)
        # the growth-accounting identity
        assert act == new + ret + res
        prev_active = act


def test_user_type_overlap_matches_python(run, spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "event_type").collect()
    users: defaultdict = defaultdict(set)
    for r in ev:
        users[r.event_type].add(r.user_id)
    got = {(r.type_a, r.type_b): (r.n_both, r.n_a, r.n_b, r.jaccard_ppm)
           for r in run("q_user_type_overlap").collect()}
    want = {}
    for a, b in combinations(sorted(users), 2):
        both = len(users[a] & users[b])
        if both:
            want[(a, b)] = (both, len(users[a]), len(users[b]),
                            both * 1_000_000
                            // (len(users[a]) + len(users[b]) - both))
    assert got == want
    assert len(got) == 10  # all 5 types pairwise overlap in the fixture
