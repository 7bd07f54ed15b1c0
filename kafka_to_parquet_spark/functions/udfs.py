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

from kafka_to_parquet_spark.functions.text import _TOKENS_SQL, tokens_col
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


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4): table function emitting multiple rows per input
# ---------------------------------------------------------------------------


@query(
    "q_udtf_wordcounts",
    oracle=f"""
SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS word FROM documents)
GROUP BY doc_id, word
""",
)
def q_udtf_wordcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 (beyond survey): per-document word histogram as a Python
    UDTF — Spark 4's user-defined TABLE function surface, the expansion
    counterpart of the scalar pandas UDF above. Each input row (a
    document's token array, tokenized JVM-side by the canonical shared
    tokenizer so token semantics can't drift from the SQL family)
    fans out to one row per distinct word with its in-doc count,
    aggregated in Python.

    The LATERAL correlated call is the plan shape to note: the UDTF is
    a per-row generator — no shuffle at all; Spark pipelines the
    Python worker inside the scan stage, so at 100 TB this scales like
    any map-side explode (the Python hop is the cost, which is why the
    HOF/explode form in functions/text.py remains the default; this
    query exists to keep the UDTF path exercised for logic that
    genuinely needs per-row Python, e.g. a real tokenizer library)."""
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, cnt: bigint")
    class WordHist:
        def eval(self, toks):
            for w, c in Counter(toks or []).items():
                yield (w, c)

    spark.udtf.register("word_hist", WordHist)
    load(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        "SELECT d.doc_id, t.word, t.cnt "
        "FROM udtf_docs_v d, LATERAL word_hist(d.toks) t"
    )
