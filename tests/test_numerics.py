"""Property-based tests (hypothesis) for the cross-engine numeric
determinism helpers — the foundation every money-sum oracle comparison
rests on — plus sketch-accuracy bounds for the approximate aggregates.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# 2-decimal money values up to 10M, list sizes up to 500: covers the
# fixture range with headroom. Exactness requires sum(|x|·100) < 2^53.
money = st.decimals(
    min_value=Decimal("-10000000.00"),
    max_value=Decimal("10000000.00"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(money, min_size=1, max_size=500))
def test_dec_sum_is_exact(xs):
    """sum(round(x·100))/100 equals the exact decimal sum for any
    2-decimal inputs — independent of accumulation order."""
    scaled = [round(float(x) * 100) for x in xs]
    got = sum(scaled) / 100.0
    want = sum(xs)  # exact Decimal arithmetic
    assert Decimal(repr(got)) == want or abs(Decimal(repr(got)) - want) == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(money, min_size=1, max_size=500))
def test_dec_sum_order_invariant(xs):
    """The scaled-integer sum is bit-identical under any permutation —
    the property that makes Spark partition order irrelevant."""
    scaled = [round(float(x) * 100) for x in xs]
    fwd = 0.0
    for v in scaled:
        fwd += float(v)
    rev = 0.0
    for v in reversed(scaled):
        rev += float(v)
    assert fwd == rev


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_floor_round_is_deterministic_on_doubles(x):
    """floor-form rounding is a pure function of the double value (no
    decimal-string path), and lands on the p-grid."""
    import math

    p = 4
    s = float(10**p)
    r = math.floor(x * s + 0.5) / s
    assert r == math.floor(x * s + 0.5) / s
    assert abs(r - x) <= 0.5 / s + abs(x) * 1e-15


def test_dec_sum_spark_matches_python(spark):
    """End-to-end: Spark's dec_sum over a shuffled 32-partition
    DataFrame equals the exact Decimal sum."""
    from kafka_to_parquet_spark.functions.rounding import dec_sum

    vals = [(-1) ** i * (i * 7919 % 1000000) / 100.0 for i in range(10000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(32)
    got = df.agg(dec_sum(F.col("x"), 2).alias("s")).collect()[0]["s"]
    want = float(sum(Decimal(repr(v)) for v in vals))
    assert got == want


def test_approx_count_distinct_error_bound(spark, sf_dir, run):
    """q_agg_approx_distinct is rows-only for the driver (HLL++ sketch
    values differ per engine by construction); THIS is its correctness
    gate: every group's estimate must land within ~3 sigma (rsd=0.05
    → 15%) of q_agg_distinct's exact count, and the exact-count
    companion columns must agree exactly."""
    exact = {r["l_returnflag"]: r for r in run("q_agg_distinct").collect()}
    approx = {r["l_returnflag"]: r for r in run("q_agg_approx_distinct").collect()}
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert a["n_rows"] == e["n_rows"], flag
        rel = abs(a["n_parts_approx"] - e["n_parts"]) / e["n_parts"]
        assert rel < 0.15, f"{flag}: approx {a['n_parts_approx']} vs exact {e['n_parts']}"


def test_dec_sum_long_exact_past_double_integer_range(spark):
    """Why dec_sum_long exists: per-row units are exact (each value's
    scaled magnitude is far below 2^53) but their SUM crosses 2^53,
    where a double accumulator has ulp 2 and silently rounds — the
    long accumulator stays integer-exact. Values are constructed so
    the binary representation is exact end-to-end: v = k + 2^-20 with
    even k gives the odd unit k·10^6 + 1."""
    from kafka_to_parquet_spark.functions.rounding import dec_sum_long

    vals = [float(3 * 10**7 + 2 * i) + 2.0**-20 for i in range(1, 401)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(32)
    got = df.agg(dec_sum_long(F.col("x"), 6).alias("s")).collect()[0]["s"]
    want = sum((3 * 10**7 + 2 * i) * 10**6 + 1 for i in range(1, 401))
    assert want > 2**53  # the sum is genuinely past double-exact range
    assert got == want


def test_dec_sum_long_matches_dec_sum_in_safe_range(spark):
    """Inside the double-safe range the two forms agree after the
    final division."""
    from kafka_to_parquet_spark.functions.rounding import dec_sum, dec_sum_long

    vals = [round(1000.0 + i * 0.01, 2) for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    a = df.agg((dec_sum_long(F.col("x"), 2) / 100.0).alias("s")).collect()[0]["s"]
    b = df.agg(dec_sum(F.col("x"), 2).alias("s")).collect()[0]["s"]
    assert a == b
