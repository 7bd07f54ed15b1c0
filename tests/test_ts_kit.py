"""Daily-series kit (operators/timeseries.py round 6): rolling median,
truncated EWMA, CUSUM changepoint. Python recompute at sf0.001."""

from __future__ import annotations

from collections import Counter, defaultdict

from kafka_to_parquet_spark.tables import load


def _cents(v: float) -> int:
    import math

    x = v * 100
    f = math.floor(x)
    return int(f + 1) if x - f >= 0.5 else int(f)


def _daily(spark, sf_dir):
    daily: Counter = Counter()
    for r in load(spark, sf_dir, "events").select("event_type", "ts", "value").collect():
        daily[(r.event_type, r.ts.date())] += _cents(r.value)
    series: dict[str, list[tuple[object, int]]] = defaultdict(list)
    for (et, d), yc in sorted(daily.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        series[et].append((d, yc))
    return series


def test_rolling_median_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.timeseries import ROLLMED_W

    series = _daily(spark, sf_dir)
    want = {}
    for et, pts in series.items():
        ys = [y for _, y in pts]
        for i, (d, _) in enumerate(pts):
            fr = sorted(ys[max(0, i - ROLLMED_W + 1) : i + 1])
            n = len(fr)
            want[(et, d)] = fr[(n - 1) // 2] + fr[n // 2]
    got = {(r.event_type, r.d): r.med2x for r in run("q_ts_rolling_median").collect()}
    assert got == want


def test_ewma_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.timeseries import EWMA_K

    series = _daily(spark, sf_dir)
    want = {}
    for et, pts in series.items():
        ys = [y for _, y in pts]
        for i, (d, _) in enumerate(pts):
            num = den = 0
            for k in range(EWMA_K):
                if i - k >= 0:
                    w = 1 << (EWMA_K - 1 - k)
                    num += ys[i - k] * w
                    den += w
            want[(et, d)] = (num, den, num * 1000 // den)
    got = {
        (r.event_type, r.d): (r.ewma_num, r.ewma_den, r.ewma_milli)
        for r in run("q_ts_ewma").collect()
    }
    assert got == want


def test_ewma_converges_to_plain_ewma(run, spark, sf_dir):
    """On rows with a full K-lag history the truncated EWMA is within
    2^-K of the recurrence form — the documented tail bound."""
    from kafka_to_parquet_spark.operators.timeseries import EWMA_K

    series = _daily(spark, sf_dir)
    got = {
        (r.event_type, r.d): r.ewma_milli for r in run("q_ts_ewma").collect()
    }
    for et, pts in series.items():
        e = None
        for i, (d, y) in enumerate(pts):
            e = y if e is None else (e + y) / 2  # alpha = 1/2 recurrence
            if i >= EWMA_K - 1:
                assert abs(got[(et, d)] / 1000 - e) <= e * 2 ** (-EWMA_K + 2) + 1


def test_cusum_matches_python(run, spark, sf_dir):
    series = _daily(spark, sf_dir)
    want = {}
    for et, pts in series.items():
        ys = [y for _, y in pts]
        t, s = len(ys), sum(ys)
        cum = 0
        best = None
        for rn, (d, y) in enumerate(pts, start=1):
            cum += y
            absd = abs(t * cum - rn * s)
            if best is None or absd > best[1]:
                best = (d, absd)
        want[et] = (best[0], best[1], t, best[1] * 10000 // (t * s))
    got = {
        r.event_type: (r.cp_day, r.dmax, r.t_days, r.cusum_bp)
        for r in run("q_ts_cusum").collect()
    }
    assert got == want
