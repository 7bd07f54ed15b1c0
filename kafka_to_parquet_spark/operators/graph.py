"""Iterative graph analytics on a derived relation: fixed-point
PageRank over the customer↔supplier trade graph.

Complements llm/components.py (connected components via min-label
propagation) with the other canonical iterative-relational algorithm.
The reference engine has no graph surface; this demonstrates that the
Spark-first design expresses iteration as a bounded chain of
join+aggregate rounds — the same dataflow GraphX/Pregel lower to —
with nothing driver-side but the loop counter.

Determinism: classic PageRank sums doubles in shuffle order, which no
oracle can reproduce. Here every quantity is an integer number of
1e-12 "rank units" and each round is

    r' = base + (85 · Σ_in (r // outdeg)) // 100,   base = (15·(T//N))//100

— integer division and integer sums are order-independent, so Spark
and DuckDB produce bit-equal ranks at any scale. (The truncation per
round loses < outdeg units per node — irrelevant at T = 1e12.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load

_T = 1_000_000_000_000  # total rank mass, in units
_ROUNDS = 3


def _oracle_sql() -> str:
    """Chained-CTE mirror of the Spark loop (same integer ops)."""
    ctes = [
        """e0 AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
)""",
        "edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        f"""par AS (
  SELECT {_T} // count(*) AS r_init,
         (15 * ({_T} // count(*))) // 100 AS base
  FROM nodes
)""",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src)",
        "r0 AS (SELECT node, (SELECT r_init FROM par) AS r FROM nodes)",
    ]
    for k in range(1, _ROUNDS + 1):
        ctes.append(
            f"""c{k} AS (
  SELECT e.dst AS node, sum(r{k - 1}.r // deg.outdeg) AS s
  FROM edges e JOIN deg ON e.src = deg.src JOIN r{k - 1} ON r{k - 1}.node = e.src
  GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{k} AS (
  SELECT n.node, (SELECT base FROM par) + (85 * COALESCE(c{k}.s, 0)) // 100 AS r
  FROM nodes n LEFT JOIN c{k} ON c{k}.node = n.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, CAST(r AS BIGINT) AS rank_units FROM r{_ROUNDS}"
    )


@query("q_graph_pagerank", oracle=_oracle_sql())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 rounds, integer fixed-point) on the
    symmetric customer↔supplier graph induced by orders⋈lineitem
    (customer nodes = 2·custkey, supplier nodes = 2·suppkey+1).

    Shape per round: edges ⋈ ranks on src → contributions partial-
    aggregated on dst. Two physical choices make the round cheap:

    * outdeg is folded into the edge relation ONCE, and that
      (src, dst, outdeg) table is repartitioned + sorted on src and
      localCheckpoint-ed — the checkpoint remembers partitioning and
      ordering, so every round's sort-merge join exchanges and sorts
      ONLY the node-sized ranks relation, never the edges.
    * the symmetric construction guarantees indegree ≥ 1 for every
      node, so the contribution aggregate already covers the full node
      set and no left-join back to ``nodes`` is needed (the oracle
      keeps the LEFT JOIN + COALESCE form; the COALESCE never fires,
      values are identical — pinned by the mass-conservation test).

    Per round that leaves one exchange of (node, rank) pairs and one
    edge-local partial aggregation — the Pregel dataflow — with a flat
    per-round plan and no driver-side rows."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # persist, not localCheckpoint: an InMemoryTableScan advertises the
    # cached plan's partitioning+ordering to Catalyst (a checkpointed
    # RDD scan does not), so the per-round join sees edges pre-hashed
    # and pre-sorted on src and never re-exchanges them.
    edges_d = (
        edges.join(deg, "src")
        .repartition(F.col("src"))
        .sortWithinPartitions("src")
        .persist()
    )
    nodes = edges_d.select(F.col("src").alias("node")).distinct()
    par = nodes.agg(
        F.expr(f"{_T} DIV count(*)").alias("r_init"),
        F.expr(f"(15 * ({_T} DIV count(*))) DIV 100").alias("base"),
    ).localCheckpoint()

    ranks = nodes.crossJoin(F.broadcast(par)).select(
        "node", F.col("r_init").alias("r")
    )
    for _ in range(_ROUNDS):
        contrib = (
            edges_d.join(ranks, edges_d.src == ranks.node)
            .select("dst", F.expr("r DIV outdeg").alias("part"))
            .groupBy("dst")
            .agg(F.sum("part").alias("s"))
        )
        ranks = contrib.crossJoin(F.broadcast(par)).select(
            F.col("dst").alias("node"),
            F.expr("base + (85 * s) DIV 100").alias("r"),
        )
    return ranks.select("node", F.col("r").cast("long").alias("rank_units"))


@query(
    "q_graph_degree",
    oracle="""
WITH e0 AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY src)
SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
       degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM deg
GROUP BY side, degree
""",
)
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer↔supplier trade graph, per
    node side — the skew diagnostic read before running any iterative
    graph algorithm (a heavy-tailed degree histogram is the signal to
    salt or cap hot vertices).

    Shape: the distinct edge derivation is shared with q_graph_pagerank
    (one orders⋈lineitem join, distinct on the pair); per-node degree
    is a count keyed on src, and the histogram is a second aggregate on
    the tiny (side, degree) key. Both aggregates hash-partition on
    their keys; nothing is edge-quadratic and the result is
    |distinct degrees|-sized regardless of graph volume."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
    return (
        deg.select(
            F.when(F.col("src") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("side"),
            "degree",
        )
        .groupBy("side", "degree")
        .agg(F.count("*").alias("n_nodes"))
    )
