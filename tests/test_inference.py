"""Inference operators (operators/inference.py): Welch's t, OLS trend,
mutual information, PSI drift. Each test recomputes the statistic in
plain Python at sf0.001 (the oracle gate cross-checks DuckDB; these pin
the SEMANTICS against a third implementation). Where the statistic
contains ln() — whose last ulp is libm-specific — the comparison allows
±2 micro; pure-arithmetic statistics compare exactly (Python doubles
follow the same IEEE ops as the JVM for these expression shapes)."""

from __future__ import annotations

import math
from collections import Counter

from kafka_to_parquet_spark.tables import load


def _cents(v: float) -> int:
    # Same quantization as the plan: CAST(round(value * 100) AS BIGINT).
    # Python round() is half-even while SQL round is half-away, but the
    # fixture's doubles never land exactly on .5 cents boundaries after
    # *100 in double — use the SQL rule to be exact regardless.
    x = v * 100
    f = math.floor(x)
    return int(f + 1) if x - f >= 0.5 else int(f)


def test_welch_ttest_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.inference import TT_A, TT_B

    ev = load(spark, sf_dir, "events").select("event_type", "value").collect()
    a = [_cents(r.value) for r in ev if r.event_type == TT_A]
    b = [_cents(r.value) for r in ev if r.event_type == TT_B]
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    ssa, ssb = sum(x * x for x in a), sum(x * x for x in b)
    va = ((ssa - float(sa) * sa / na) / (na - 1)) / na
    vb = ((ssb - float(sb) * sb / nb) / (nb - 1)) / nb
    t = 1000000 * ((float(sa) / na - float(sb) / nb) / math.sqrt(va + vb))
    df = 1000000 * ((va + vb) * (va + vb) / (va * va / (na - 1) + vb * vb / (nb - 1)))
    row = run("q_welch_ttest").collect()[0]
    assert (row.na, row.nb) == (na, nb)
    assert row.t_micro == round(t) or abs(row.t_micro - t) <= 1
    assert abs(row.df_micro - df) <= 1
    # Welch df is bracketed by min(n)-1 and the pooled n1+n2-2.
    assert (min(na, nb) - 1) * 1000000 <= row.df_micro <= (na + nb - 2) * 1000000


def test_ols_trend_matches_python(run, spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    daily: dict[tuple[str, object], int] = Counter()
    for r in ev:
        daily[(r.event_type, r.ts.date())] += _cents(r.value)
    series: dict[str, list[tuple[int, int]]] = {}
    for (et, d), cents in daily.items():
        series.setdefault(et, []).append(
            ((d - __import__("datetime").date(1970, 1, 1)).days, cents // 100)
        )
    got = {r.event_type: r for r in run("q_ols_trend").collect()}
    assert set(got) == set(series)
    for et, pts in series.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        nm, d = n * sxy - sx * sy, n * sxx - sx * sx
        slope = 1000000 * (float(nm) / d)
        icept = float(sy * d - nm * sx) * 1000000 / (n * d)
        r2 = 1000000 * (float(nm) * nm / (float(d) * (n * syy - sy * sy)))
        r = got[et]
        assert r.n == n
        assert abs(r.slope_micro - slope) <= 1
        assert abs(r.icept_micro - icept) <= 1
        assert abs(r.r2_micro - r2) <= 1
        assert 0 <= r.r2_micro <= 1000000


def test_mutual_information_matches_python(run, spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("lang", "source").collect()
    cells = Counter((r.lang, r.source) for r in docs)
    cl = Counter(r.lang for r in docs)
    cs = Counter(r.source for r in docs)
    n = len(docs)
    mi = sum(
        round(
            1000000 * ((float(c) / n) * math.log((float(c) * n) / (float(cl[l]) * cs[s])))
        )
        for (l, s), c in cells.items()
    )
    row = run("q_mutual_information").collect()[0]
    assert row.n == n
    assert row.n_cells == len(cells)
    # ln()'s last ulp is libm-specific; each cell rounds independently.
    assert abs(row.mi_micro - mi) <= 2


def test_psi_drift_matches_python(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.inference import PSI_BUCKET

    docs = load(spark, sf_dir, "documents").select("lang", "n_chars").collect()
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in docs:
        (ca if r.lang == "en" else cb)[r.n_chars // PSI_BUCKET] += 1
    buckets = set(ca) | set(cb)
    na, nb, b = sum(ca.values()), sum(cb.values()), len(buckets)
    psi = 0
    for k in buckets:
        p = float(ca[k] + 1) / (na + b)
        q = float(cb[k] + 1) / (nb + b)
        psi += round(1000000 * ((p - q) * math.log(p / q)))
    row = run("q_psi_drift").collect()[0]
    assert (row.na, row.nb, row.n_buckets) == (na, nb, b)
    assert abs(row.psi_micro - psi) <= 2
    # Smoothed PSI is a sum of (p-q)ln(p/q) >= 0 terms.
    assert row.psi_micro >= -b
