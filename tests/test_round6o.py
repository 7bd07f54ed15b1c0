"""Round-6 fifteenth batch: inter-arrival distribution, DOW
seasonality strength. Python recompute at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date

from kafka_to_parquet_spark.tables import load


def rnd(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def test_interarrival_dist_matches_python(run, spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id").collect()
    per: defaultdict = defaultdict(list)
    for r in ev:
        per[r.event_type].append((math.floor(r.ts.timestamp()), r.event_id))
    cells: Counter = Counter()
    tot: Counter = Counter()
    for t, seq in per.items():
        seq.sort()
        for (e0, _), (e1, _) in zip(seq, seq[1:]):
            gap = e1 - e0
            b = 0 if gap == 0 else gap.bit_length()
            cells[(t, b)] += 1
            tot[t] += 1
    got = {(r.event_type, r.bucket): (r.n, r.share_ppm)
           for r in run("q_interarrival_dist").collect()}
    assert got == {(t, b): (n, n * 1_000_000 // tot[t])
                   for (t, b), n in cells.items()}
    # the spectrum must span several octaves to be a distribution at all
    buckets = {b for _, b in cells}
    assert max(buckets) - min(buckets) >= 4


def test_seasonal_strength_matches_python(run, spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    cnt: Counter = Counter()
    days = []
    for r in ev:
        dd = (r.ts.date() - date(1970, 1, 1)).days
        cnt[(r.event_type, dd)] += 1
        days.append(dd)
    mn, mx = min(days), max(days)
    types = {t for t, _ in cnt}
    got = {r.event_type: (r.n_days, r.n_events, r.peak_dow, r.strength_micro)
           for r in run("q_seasonal_strength").collect()}
    for t in types:
        series = {d: cnt.get((t, d), 0) for d in range(mn, mx + 1)}
        n = len(series)
        s = sum(series.values())
        ss = sum(c * c for c in series.values())
        if not (float(ss) - float(s) * s / n > 0):
            assert t not in got
            continue
        sd: Counter = Counter()
        nd: Counter = Counter()
        for d, c in series.items():
            sd[d % 7] += c
            nd[d % 7] += 1
        sb = sum(rnd(1e6 * float(sd[w]) * sd[w] / nd[w]) for w in nd)
        strength = rnd(
            1e6 * ((float(sb) / 1e6 - float(s) * s / n)
                   / (float(ss) - float(s) * s / n)))
        peak = min(nd, key=lambda w: (-(sd[w] * 1_000_000 // nd[w]), w))
        assert got[t] == (n, s, peak, strength)
    assert set(got) == types
    # the synthetic log has real weekday structure somewhere
    assert max(v[3] for v in got.values()) > 10_000
