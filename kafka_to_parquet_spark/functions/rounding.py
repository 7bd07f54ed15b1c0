"""Cross-engine numeric determinism helpers.

Why this exists: the oracle comparison hashes values, and plain
``round(sum(x), 2)`` is not engine-stable — Spark and DuckDB sum
doubles in different orders (Δ ≈ 1e-5 at sf0.1) and implement
half-case rounding differently, so any result whose true value sits
near a rounding boundary can legitimately flip by one ulp of the
rounded grid. Two constructions remove the hazard entirely:

1. **Integer-scaled sums** for fixed-decimal inputs (money is 2dp,
   price×(1−disc) is 4dp): ``sum(round(x·10^p)) / 10^p``. The inner
   round yields exact integers (products of cents are integers), the
   sum of integers is exact in double up to 2^53, and the final
   division is a single identical FP op — both engines produce the
   *bit-identical* double. Averages: divide by ``10^p · count``.

2. **Floor-form rounding** for ratios of integers (Jaccard,
   type-token ratio): both engines compute the identical quotient
   double, but their round() implementations can still diverge on
   exact half values via decimal-string paths; ``floor(x·10^p + 0.5)
   / 10^p`` is deterministic on the double value itself.

Every helper has a Spark (Column) and a DuckDB (SQL-string) form that
perform the same IEEE operations in the same order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column, p: int = 2) -> Column:
    """Exact engine-stable sum of a p-decimal column (Spark side)."""
    s = 10**p
    return F.sum(F.round(col * s, 0)) / float(s)


def dec_sum_sql(x: str, p: int = 2) -> str:
    s = 10**p
    return f"sum(round(({x}) * {s})) / {float(s)}"


def dec_sum_long(col: Column, p: int = 2) -> Column:
    """Exact sum of a p-decimal column in INTEGER 10^p units (Spark
    side, LongType result). Unlike :func:`dec_sum`, the scaled units
    are cast to long BEFORE summing, so the accumulator is a 63-bit
    integer, not a double — use this when ``n_rows · max|x| · 10^p``
    can exceed 2^53 (e.g. 6-decimal charge sums over a large fact
    table), where double accumulation would lose integer exactness
    and the two engines' summation orders could diverge. Divide by
    ``10^p`` (one FP op, identical both engines) for a money double."""
    s = 10**p
    return F.sum(F.round(col * s, 0).cast("long"))


def dec_sum_long_sql(x: str, p: int = 2) -> str:
    """DuckDB twin of :func:`dec_sum_long`: DuckDB's sum(BIGINT) is
    exact (HUGEINT accumulator); the outer cast matches Spark's
    LongType so the driver's schema comparison agrees."""
    s = 10**p
    return f"CAST(sum(CAST(round(({x}) * {s}) AS BIGINT)) AS BIGINT)"


def dec_avg(col: Column, p: int = 2) -> Column:
    """Exact engine-stable average of a p-decimal column (Spark side)."""
    s = 10**p
    return F.sum(F.round(col * s, 0)) / (float(s) * F.count(F.lit(1)))


def dec_avg_sql(x: str, p: int = 2) -> str:
    s = 10**p
    return f"sum(round(({x}) * {s})) / ({float(s)} * count(*))"


def floor_round(col: Column, p: int) -> Column:
    """Deterministic rounding on the double value (Spark side)."""
    s = float(10**p)
    return F.floor(col * s + F.lit(0.5)) / s


def floor_round_sql(x: str, p: int) -> str:
    s = float(10**p)
    return f"floor(({x}) * {s} + 0.5) / {s}"


def int_units(x: str, p: int = 6) -> str:
    """Floor-form rounding to INTEGER 10^p units (e.g. micro-units at
    p=6) — for values that must be serialized into strings, where a
    formatted double would render differently per engine but integers
    render identically. The fragment is valid in BOTH Spark SQL and
    DuckDB, so use the same call on each side of an oracle pair."""
    s = float(10**p)
    return f"CAST(floor(CAST(({x}) AS DOUBLE) * {s} + 0.5) AS BIGINT)"
