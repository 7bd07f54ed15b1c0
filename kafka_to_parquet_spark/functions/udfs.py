"""User-extensibility surface (U1): Arrow-vectorized Pandas UDFs.

The reference has none of this — its schema and transform are
hardcoded (src/main.rs:113-117) and anything else is
``unimplemented!()`` (main.rs:130-132). The engine's rule is "UDFs are
the slow path": everything expressible with built-ins uses built-ins
(see functions/vectors.py for the HOF cosine). This module is the
sanctioned escape hatch, shaped the only way that scales:

- ``@pandas_udf`` (Arrow batch transfer, ~10-100× over row-at-a-time
  Python UDFs), never ``F.udf``;
- deterministic numerics: the cosine below reproduces the oracle's
  sequential left fold *exactly* while staying numpy-vectorized across
  rows — products are computed elementwise (one rounding each), then
  accumulated dimension-by-dimension across the whole batch, so the
  per-row operation sequence is identical to the HOF/oracle fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kafka_to_parquet_spark.functions.vectors import duck_cosine
from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load


def _fold_dot(mat: np.ndarray, vec: np.ndarray) -> np.ndarray:
    """Left-fold dot product of each row of ``mat`` with ``vec`` —
    vectorized across rows, sequential across dimensions (bit-equal to
    ``aggregate(zip_with(...))`` / DuckDB ``list_reduce``)."""
    prods = mat * vec  # elementwise, one IEEE rounding per term
    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for j in range(mat.shape[1]):
        acc = acc + prods[:, j]
    return acc


def _fold_sq(mat: np.ndarray) -> np.ndarray:
    prods = mat * mat
    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for j in range(mat.shape[1]):
        acc = acc + prods[:, j]
    return acc


@query(
    "q_udf_pandas_cosine",
    oracle=f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round({duck_cosine('e.embedding', 'q.qe')}, 6) AS cos
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> 0
""",
)
def q_udf_pandas_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: cosine similarity of every embedding against the vec_id=0
    query vector, as a scalar Pandas UDF. Produces values identical to
    the pure-SQL HOF formulation (and the DuckDB oracle) — the point
    is the Arrow plumbing: batches arrive as numpy, the kernel is
    vectorized across the batch, output is a plain double column. The
    query vector is a tiny driver-side constant captured in the
    closure (broadcast-equivalent for one vector)."""
    e = load(spark, sf_dir, "embeddings")
    head = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if head is None:
        raise ValueError("q_udf_pandas_cosine: embeddings table has no vec_id=0 query vector")
    qvec = np.asarray(head[0], dtype=np.float64)
    q_sq_fold = float(_fold_sq(qvec[None, :])[0])

    @pandas_udf("double")
    def cos_to_query(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        cos = _fold_dot(mat, qvec) / (np.sqrt(_fold_sq(mat)) * np.sqrt(q_sq_fold))
        return pd.Series(cos)

    return (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos_to_query("embedding"), 6).alias("cos"))
    )
