"""Preference queries: the 2-D skyline (Pareto frontier) operator.

A skyline query returns the rows not DOMINATED by any other row —
a dominates b when a is ≥ b in every dimension and > in at least one.
It generalizes top-k (top-k is the skyline of a single weighted
score); the classic use is "best trade-offs" analytics (cheapest vs
closest hotels; here: highest-spend vs most-frequent customers).

Distributed algorithm (Börzsönyi et al.'s block-nested-loop skyline,
map-reduce form): the skyline operator admits a LOSSLESS local prune —
a point dominated within any subset is dominated globally — so stage 1
computes the exact local skyline of each hash bucket with a vectorized
pandas routine (Arrow-batched, no Python per-row work), and stage 2
runs the same routine once over the union of survivors. Survivor count
is bounded by |bucket-skyline| · #buckets; for anti-correlated worst
cases where the global skyline itself is huge, production bounds
stage 2 the same way stage 1 was split (recursive halving) — the
fixture frontier is tiny, and the declared plan keeps stage 2 exact.

Reference parity: the reference engine has no preference operator;
this extends the analytics tier (same charter as the window/top-k
family, SURVEY §2.8).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load

SKYLINE_BUCKETS = 32  # stage-1 parallelism; any value gives the same output

_SKY_SCHEMA = "custkey bigint, spend_cents bigint, n_orders bigint"


def _skyline_block(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact 2-D max-max skyline of one block, fully vectorized.

    Per distinct spend keep only its best count, sort spends
    descending, and a (spend, best-count) pair survives iff its count
    strictly exceeds the running max count over all STRICTLY higher
    spends (≥/≥ with one strict is dominance, so equal (spend, count)
    pairs never dominate each other and all co-optimal ties are
    kept). No per-row Python — numpy cummax over the distinct-spend
    array, pandas mask joins back."""
    import numpy as np

    best = pdf.groupby("spend_cents")["n_orders"].transform("max")
    top = pdf[pdf["n_orders"] == best]
    grp = top.groupby("spend_cents")["n_orders"].max().sort_index(ascending=False)
    run = np.maximum.accumulate(grp.to_numpy())
    prev_run = np.concatenate(([np.int64(-1)], run[:-1]))
    kept_spends = set(grp.index.to_numpy()[grp.to_numpy() > prev_run])
    return top[top["spend_cents"].isin(kept_spends)]


@query(
    "q_skyline",
    oracle="""
WITH cust AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT custkey, spend_cents, n_orders
FROM cust b
WHERE NOT EXISTS (
  SELECT 1 FROM cust a
  WHERE a.spend_cents >= b.spend_cents AND a.n_orders >= b.n_orders
    AND (a.spend_cents > b.spend_cents OR a.n_orders > b.n_orders)
)
""",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of customers maximizing (total spend, order count):
    the Pareto frontier no other customer beats on both axes.

    Spend is summed in integer CENTS (each price rounded per-row
    before the sum) so the aggregate is exact and order-independent —
    a double sum's result depends on reduction order and could flip a
    dominance comparison between engines.

    Plan: one hash aggregate to (custkey, spend_cents, n_orders) —
    100 TB of orders reduce to |customers| rows map-side-combinably —
    then the two-stage skyline: stage 1 groups by a hash bucket of
    custkey and prunes each bucket to its exact local skyline
    (applyInPandas, vectorized numpy cummax — sound because dominance
    within a subset implies global dominance), stage 2 reruns the same
    routine over the union of the ≤ SKYLINE_BUCKETS tiny survivor
    sets. The oracle is the independent NOT-EXISTS formulation, so
    agreement also certifies the prune's losslessness."""
    orders = load(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
            "spend_cents"
        ),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    local = cust.groupBy(
        (F.crc32(F.col("custkey").cast("string")) % SKYLINE_BUCKETS).alias("b")
    ).applyInPandas(
        lambda pdf: _skyline_block(pdf[["custkey", "spend_cents", "n_orders"]]),
        _SKY_SCHEMA,
    )
    return local.groupBy(F.lit(1).alias("g")).applyInPandas(
        lambda pdf: _skyline_block(pdf[["custkey", "spend_cents", "n_orders"]]),
        _SKY_SCHEMA,
    )
