"""Round-7 session tests: the numpy sequential-fold helper behind
q_semdedup's applyInPandas prune, and its bit-parity with the SQL
fold twins (dot_expr / duck_dot)."""

from __future__ import annotations

import random

import duckdb
import numpy as np
from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.vectors import (
    dot_expr,
    duck_dot,
    np_seq_dot,
)


def _py_fold(prods) -> float:
    s = 0.0
    for p in prods:
        s = s + float(p)
    return s


def test_np_cumsum_matches_sequential_fold():
    """np_seq_dot (cumsum) must accumulate in the exact IEEE op order
    of the SQL engines' sequential left folds — np.dot/einsum's
    pairwise summation would not. Bitwise comparison, not isclose:
    a single reordered add can flip q_semdedup's threshold compare."""
    rng = random.Random(7)
    for _ in range(200):
        n = rng.randint(1, 80)
        a = np.array([rng.uniform(-2, 2) for _ in range(n)], dtype=np.float32)
        b = np.array([rng.uniform(-2, 2) for _ in range(n)], dtype=np.float32)
        prods = a.astype(np.float64) * b.astype(np.float64)
        got = float(np_seq_dot(prods))
        want = _py_fold(prods)
        assert np.float64(got).tobytes() == np.float64(want).tobytes()
    # batched form (the Gram-matrix path): last axis reduced per pair
    m = np.array(
        [[rng.uniform(-2, 2) for _ in range(16)] for _ in range(5)],
        dtype=np.float32,
    ).astype(np.float64)
    gram = np_seq_dot(m[:, None, :] * m[None, :, :])
    for i in range(5):
        for j in range(5):
            want = _py_fold(m[i] * m[j])
            assert np.float64(gram[i, j]).tobytes() == np.float64(want).tobytes()


def test_np_seq_dot_matches_spark_and_duckdb_folds(spark):
    """Cross-engine leg: the same float32 vectors through Spark's
    aggregate() fold, DuckDB's list_reduce fold, and np_seq_dot give
    bitwise-identical doubles."""
    rng = random.Random(11)
    vecs = [
        [rng.uniform(-2, 2) for _ in range(64)] for _ in range(20)
    ]
    f32 = [[float(x) for x in np.array(v, dtype=np.float32)] for v in vecs]
    df = spark.createDataFrame(
        [(i, f32[i], f32[(i + 1) % 20]) for i in range(20)],
        "i int, a array<float>, b array<float>",
    )
    spark_dots = {
        r.i: r.d
        for r in df.select("i", F.expr(dot_expr("a", "b")).alias("d")).collect()
    }
    con = duckdb.connect()
    for i in range(20):
        fa, fb = f32[i], f32[(i + 1) % 20]
        # literals parse as DECIMAL in DuckDB and DECIMAL→FLOAT rounds
        # differently than DOUBLE→FLOAT — route through DOUBLE[] (the
        # parquet path never sees literals, so this is harness-only)
        duck = con.execute(
            f"SELECT {duck_dot('$a$', '$b$')}".replace(
                "$a$", f"CAST(CAST({fa} AS DOUBLE[]) AS FLOAT[])"
            ).replace("$b$", f"CAST(CAST({fb} AS DOUBLE[]) AS FLOAT[])")
        ).fetchone()[0]
        prods = np.array(fa, dtype=np.float32).astype(np.float64) * np.array(
            fb, dtype=np.float32
        ).astype(np.float64)
        mine = float(np_seq_dot(prods))
        assert np.float64(mine).tobytes() == np.float64(duck).tobytes()
        assert np.float64(mine).tobytes() == np.float64(spark_dots[i]).tobytes()
