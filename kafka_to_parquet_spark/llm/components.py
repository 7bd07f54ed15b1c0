"""Near-dup clustering: connected components over the SimHash-band
near-dup pair graph — the step that turns pairwise matches into dedup
groups (keep min doc_id per component, drop the rest).

Spark side: Pregel-style iterative min-label propagation. Each round
is fully distributed (join edges→labels, union, min-aggregate); the
driver only checks a scalar convergence sum, and lineage is truncated
per round with localCheckpoint so plans don't grow with iterations.
Rounds needed = graph diameter (small for near-dup clusters); each
round is one shuffle — the same shape GraphX/GraphFrames use, built
from plain DataFrame ops.

Oracle: DuckDB recursive CTE computing min reachable label — an
independent fixpoint formulation, so agreement is strong evidence the
iteration converges to the true components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.llm.dedup import SIMHASH_PAIRS_CTE, q_dedup_simhash_pairs
from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load

# Reuse the exact banded-LSH pair CTE from dedup.py (single source of
# truth for SIMHASH_* thresholds); just add the undirected edge view.
_PAIRS_CTE = f"""
{SIMHASH_PAIRS_CTE},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
)
"""


@query(
    "q_dedup_components",
    oracle=f"""
WITH RECURSIVE
{_PAIRS_CTE},
reach(n, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.n, e.v FROM reach r JOIN edges e ON r.m = e.u
)
SELECT n AS doc_id, CAST(min(m) AS BIGINT) AS component FROM reach GROUP BY n
""",
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the near-dup graph: every document
    labeled with the min doc_id of its component (singletons label
    themselves). Iterative min-label propagation; see module
    docstring for the scale analysis."""
    pairs = q_dedup_simhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    labels = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.col("doc_id").alias("component"))
        .localCheckpoint()
    )
    prev_sum = None
    converged = False
    max_rounds = 64
    for _ in range(max_rounds):
        msgs = edges.join(labels, edges.doc_a == labels.doc_id).select(
            F.col("doc_b").alias("doc_id"), "component"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Never return partially-propagated labels silently: a diameter
        # > max_rounds graph (ultra-long near-dup chains) must fail
        # loudly, not ship wrong dedup groups.
        raise RuntimeError(
            f"connected-components did not converge within {max_rounds} rounds; "
            "graph diameter exceeds the bound — raise max_rounds or switch to "
            "large-star/small-star contraction"
        )
    return labels
