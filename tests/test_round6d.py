"""Round-6 fourth batch: skew report, DOW seasonality chi2, Theil–Sen.
Python recompute at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from kafka_to_parquet_spark.tables import load


def _cents(v: float) -> int:
    x = v * 100
    f = math.floor(x)
    return int(f + 1) if x - f >= 0.5 else int(f)


def test_skew_report_matches_python(run, spark, sf_dir):
    keys = Counter(
        r.l_suppkey for r in load(spark, sf_dir, "lineitem").select("l_suppkey").collect()
    )
    cnts = sorted(keys.values())
    row = run("q_skew_report").collect()[0]
    assert row.n_rows == sum(cnts)
    assert row.n_keys == len(cnts)
    assert row.max_cnt == cnts[-1]
    assert row.top1_bp == cnts[-1] * 10000 // sum(cnts)

    def q(p: float) -> float:
        # linear-interpolated quantile (type-7, what both engines use)
        h = (len(cnts) - 1) * p
        lo = math.floor(h)
        return cnts[int(lo)] + (h - lo) * (cnts[min(int(lo) + 1, len(cnts) - 1)] - cnts[int(lo)])

    # Python's interpolation order differs from the engines' in the
    # last ulp (the ENGINES agree with each other — the oracle hashes
    # these columns exactly); compare within float tolerance here.
    assert math.isclose(row.p50_cnt, q(0.5), rel_tol=1e-12)
    assert math.isclose(row.p99_cnt, q(0.99), rel_tol=1e-12)


def test_seasonality_dow_matches_python(run, spark, sf_dir):
    import datetime

    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    cells: Counter = Counter()
    for r in ev:
        dow = (r.ts.date() - datetime.date(1970, 1, 1)).days % 7
        cells[(r.event_type, dow)] += 1
    byt: Counter = Counter()
    for (et, _), o in cells.items():
        byt[et] += o
    got = {r.event_type: r for r in run("q_seasonality_dow").collect()}
    assert set(got) == set(byt)
    for et, n in byt.items():
        s = sum((7 * o - n) ** 2 for (e2, _), o in cells.items() if e2 == et)
        peak = sorted(
            ((o, d) for (e2, d), o in cells.items() if e2 == et),
            key=lambda t: (-t[0], t[1]),
        )[0]
        r = got[et]
        assert r.n == n
        assert r.chi2_micro == s * 1000000 // (7 * n * 7)
        assert (r.peak_cnt, r.peak_dow) == peak


def test_theil_sen_matches_python(run, spark, sf_dir):
    import datetime

    daily: Counter = Counter()
    for r in load(spark, sf_dir, "events").select("event_type", "ts", "value").collect():
        daily[(r.event_type, r.ts.date())] += _cents(r.value)
    series = defaultdict(list)
    for (et, d), yc in daily.items():
        series[et].append(((d - datetime.date(1970, 1, 1)).days, yc))
    got = {r.event_type: r for r in run("q_theil_sen").collect()}
    for et, pts in series.items():
        pts.sort()
        slopes = sorted(
            (pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0])
            for i in range(len(pts))
            for j in range(i + 1, len(pts))
        )
        m = len(slopes)
        med2 = slopes[(m - 1) // 2] + slopes[m // 2]
        r = got[et]
        assert r.m_pairs == m
        assert abs(r.ts_slope_micro - 1000000 * med2 / 2) <= 1
