"""Pin the cross-engine h31 hash — especially the lambda-nesting class
that produced round 4's only red driver row (q_dedup_substring).

duck_h31 is a SQL FRAGMENT spliced into oracle strings, and several
oracles splice it inside an outer DuckDB lambda (the sliding-window
oracle binds ``i``). If duck_h31's own lambda variables ever collide
with an outer binding again, DuckDB silently shadows the outer one and
hashes garbage — these tests fail loudly instead.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from kafka_to_parquet_spark.functions.hashes import H31_P, duck_h31, spark_h31

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def py_h31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % H31_P


def test_duck_h31_matches_python_reference():
    con = duckdb.connect()
    for w in WORDS:
        got = con.sql(f"SELECT {duck_h31(f'{w!r}')} AS h").fetchone()[0]
        assert got == py_h31(w), w


def test_spark_h31_matches_python_reference(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], ["s"])
    import pyspark.sql.functions as F

    rows = df.select("s", F.expr(spark_h31("s")).alias("h")).collect()
    for r in rows:
        assert r.h == py_h31(r.s), r.s


def test_duck_h31_inside_outer_i_lambda():
    """THE round-4 bug class: duck_h31 embedded in an outer
    list_transform lambda that binds ``i`` (the sliding-window index).
    With the old inner variable also named ``i``, every element of the
    result was a chimera hash; now each element must equal the direct
    per-element hash."""
    con = duckdb.connect()
    arr = ", ".join(f"'{w}'" for w in WORDS)
    got = con.sql(
        f"SELECT list_transform(range(1, {len(WORDS)} + 1),"
        f" i -> {duck_h31(f'(([{arr}])[i])')}) AS hs"
    ).fetchone()[0]
    assert list(got) == [py_h31(w) for w in WORDS]


def test_duck_h31_inside_outer_lambda_over_windows():
    """Same shape as _substring_oracle: hash of a window STRING built
    from the outer lambda index."""
    con = duckdb.connect()
    arr = ", ".join(f"'{w}'" for w in WORDS)
    w = 3
    expected = [
        py_h31(" ".join(WORDS[i : i + w])) for i in range(len(WORDS) - w + 1)
    ]
    win_expr = duck_h31(f"array_to_string(toks[i:i+{w - 1}], ' ')")
    got = con.sql(
        f"WITH t AS (SELECT [{arr}] AS toks) "
        f"SELECT list_transform(range(1, len(toks) - {w} + 2),"
        f" i -> {win_expr}) AS hs "
        "FROM t"
    ).fetchone()[0]
    assert list(got) == expected


@pytest.mark.parametrize("bad", ["i", "a", "c", "s", "x", "j", "k", "n", "t"])
def test_duck_h31_fragment_reserves_no_common_lambda_names(bad):
    """Structural guard: the fragment must not introduce lambda
    variables an oracle author would plausibly bind in an OUTER lambda.
    (Checks the lambda-arrow bindings only — `i` etc. may appear inside
    string literals like the nibble alphabet.)"""
    frag = duck_h31("x")
    import re

    bound = set()
    for m in re.finditer(r"(\w+)\s*->", frag):
        bound.add(m.group(1))
    for m in re.finditer(r"\((\w+),\s*(\w+)\)\s*->", frag):
        bound.update(m.groups())
    assert bad not in bound, f"duck_h31 binds common name {bad!r}: {sorted(bound)}"


def py_h62(s: str) -> int:
    return py_h31(s) * H31_P + py_h31("h62:" + s)


def test_h62_matches_python_reference_both_engines(spark):
    from kafka_to_parquet_spark.functions.hashes import duck_h62, spark_h62

    con = duckdb.connect()
    for w in WORDS:
        expect = py_h62(w)
        assert con.sql(f"SELECT {duck_h62(f'{w!r}')} AS h").fetchone()[0] == expect
        assert spark.sql(f"SELECT {spark_h62(f'{w!r}')} AS h").collect()[0][0] == expect
        assert 0 <= expect < 2**62


def test_duck_h62_inside_outer_i_lambda():
    """h62 composes two sibling h31 folds; embedded inside an outer
    lambda that binds ``i`` (the sliding-window oracle shape) it must
    hash each window, not a shadowed chimera — the round-4 class."""
    from kafka_to_parquet_spark.functions.hashes import duck_h62

    con = duckdb.connect()
    arr = "['" + "','".join(WORDS) + "']"
    got = con.sql(
        "SELECT list_transform(range(1, 4), i -> "
        + duck_h62(f"array_to_string(({arr})[i:i+2], ' ')")
        + ") AS hs"
    ).fetchone()[0]
    expect = [py_h62(" ".join(WORDS[i : i + 3])) for i in range(3)]
    assert list(got) == expect
