"""Second TPC-H batch (Q4/Q10/Q14/Q18 patterns, adapted to the fixture
schema — no partsupp/commitdate/receiptdate columns exist, so Q4's
late-delivery EXISTS uses shipdate-vs-orderdate and Q14's promo class is
the fixture's literal ``p_type = 'PROMO'``).

These widen the SQL surface beyond round 1's Q3/Q5/Q6: correlated
EXISTS (semi join with a non-equi residual), a HAVING subquery feeding a
join (Q18), a conditional-aggregate ratio (Q14), and a 4-table top-k
(Q10). The reference has none of this (its surface is a straight-line
ETL, reference src/main.rs:59-294); the patterns exercise Catalyst's
semi-join selection, broadcast of aggregated subqueries, and
TakeOrderedAndProject.

Scale notes per query are in the docstrings; the common discipline:
dims broadcast, the one big shuffle is lineitem⋈orders, money sums use
integer-scaled fixed-point (functions.rounding) so the oracle hash is
engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.rounding import dec_sum, dec_sum_sql
from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load


@query(
    "q_tpch_q4",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 pattern (order-priority checking): correlated EXISTS over
    lineitem — orders that had at least one line shipped more than 60
    days after the order date. Spark plans the EXISTS as a left-semi
    hash join on l_orderkey with the non-equi shipdate predicate as a
    join residual; the semi join keeps at most one probe hit per order,
    so the shuffle carries orders once and lineitem once — never the
    pair multiset. At 100 TB both sides hash-partition on orderkey and
    the agg on the 5-value priority key is a map-side partial."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    hit = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@query(
    "q_tpch_q10",
    oracle=f"""
SELECT c_custkey, c_name,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 pattern (returned-item reporting): top-20 customers by lost
    revenue in a quarter. customer and nation broadcast; the only big
    shuffle is lineitem⋈orders (both pre-filtered, predicates pushed to
    parquet). Group key includes the unique c_custkey so the top-20 set
    is deterministic; final ordering is TakeOrderedAndProject with
    bounded driver memory. c_acctbal is a stored column passthrough
    (bit-identical in both engines, no rounding needed)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q14",
    oracle="""
SELECT sum(CASE WHEN p_type = 'PROMO'
                THEN round(l_extendedprice * (1 - l_discount) * 10000) ELSE 0 END)
       / sum(round(l_extendedprice * (1 - l_discount) * 10000)) * 100.0 AS promo_pct,
       CAST(sum(CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END) AS BIGINT) AS n_promo,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
""",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 pattern (promotion effect): percentage of a month's revenue
    from promo parts. part broadcasts into the filtered lineitem scan;
    one conditional aggregate, no second pass. The ratio divides two
    integer-scaled exact sums (units of 1e-4), then multiplies by 100 —
    three IEEE ops on identical operands in both engines, so the double
    is bit-identical and needs no rounding fence."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    disc_scaled = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
    is_promo = F.col("p_type") == "PROMO"
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(F.when(is_promo, disc_scaled).otherwise(F.lit(0)))
                / F.sum(disc_scaled)
                * 100.0
            ).alias("promo_pct"),
            F.sum(F.when(is_promo, 1).otherwise(0)).cast("long").alias("n_promo"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
       o_totalprice, sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 pattern (large-volume customer): orders whose total quantity
    exceeds a threshold, with customer detail. The HAVING subquery is a
    full lineitem group-by — at 100 TB that is THE shuffle, and its
    output (orders over the threshold) is tiny and broadcasts into
    orders, so the base tables are never re-shuffled; customer
    broadcasts too. sum(l_quantity) is exact (integer-valued doubles)
    → CAST BIGINT is engine-stable. Final top-100 by the unique
    (o_totalprice, o_orderkey) is TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 250)
        .select("l_orderkey", F.col("_qty").cast("long").alias("sum_qty"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )
