"""Projections, filters, distinct, set operations, sort, top-k.

SURVEY §2.2 (P2-P4), §2.6 (O1-O2), §2.7. All predicates/projections are
built-in Column expressions → pushed into the parquet scan by Catalyst
(verify with .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load


@query(
    "q_project_compute",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4)               AS net_price,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged,
       CAST(l_quantity AS BIGINT)                                  AS qty_int,
       upper(l_returnflag)                                         AS flag_u
FROM lineitem
""",
)
def q_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: projection with computed/aliased columns and casts. Only the
    six source columns referenced survive into the scan (column
    pruning)."""
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # Rounding precision ≥ the true decimal precision of the product
        # (2dp × 2dp = 4dp; ×3 factors = 6dp) — rounding *below* it sits
        # exactly on half-boundaries where engines legitimately differ.
        F.round(net, 4).alias("net_price"),
        F.round(net * (1 + F.col("l_tax")), 6).alias("charged"),
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.upper("l_returnflag").alias("flag_u"),
    )


@query(
    "q_filter_pred",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderstatus IN ('F', 'P')
  AND o_totalprice BETWEEN 1000 AND 300000
  AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
  AND o_custkey IS NOT NULL
""",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: comparison / IN / BETWEEN / LIKE / null predicates — all
    Catalyst-pushable into the parquet scan."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(1000, 300000)
        & (F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: distinct = hash-aggregate on all projected columns (partial
    + final, map-side combine — scales as an agg, not a global sort)."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_set_union",
    oracle="""
SELECT nationkey, side, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
)
GROUP BY nationkey, side
""",
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: UNION ALL via unionByName (no implicit dedup — Spark's
    union is positional bag semantics; unionByName is the safe form)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s).groupBy("nationkey", "side").agg(F.count("*").alias("n"))


@query(
    "q_set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: INTERSECT (distinct) — nations having both customers and
    suppliers. Catalyst plans it as a left-semi join over distincts."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: EXCEPT (distinct) — nations with customers but no
    suppliers. Planned as left-anti join."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "q_sort",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
""",
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global sort — Spark range-partitions by sample then sorts
    per partition (no single-node bottleneck at scale). Output order is
    deterministic via the o_orderkey tiebreak."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice", "o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )


@query(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-k — orderBy+limit compiles to TakeOrderedAndProject:
    each task keeps a k-heap, driver merges k×tasks rows; never a full
    global sort. The right plan at 100 TB."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )
