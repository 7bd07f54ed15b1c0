"""Third TPC-H batch (Q7/Q8/Q13/Q17/Q22 patterns, adapted to the
fixture schema — no partsupp/phone/comment columns exist, so Q13's
comment filter becomes an order-priority exclusion, Q17's container
filter uses p_type, and Q22's phone-prefix country codes become
nation keys).

These close out the classic decision-support join patterns the first
two batches didn't cover: a two-sided nation-pair volume report (Q7),
a market-share ratio with a region-restricted customer side (Q8), a
left-outer count histogram (Q13), a correlated per-group average
threshold (Q17), and an anti-join against the fact table gated by a
scalar-subquery average (Q22). The reference (a straight-line Kafka→
parquet ETL, reference src/main.rs:59-294) has none of this; the
patterns exercise Catalyst's join-order planning, broadcast of
aggregated subqueries, left-anti joins, and two-level aggregation.

Common discipline: dims broadcast, at most one fact-sized shuffle per
query, money sums as integer-scaled fixed-point (functions.rounding)
so oracle hashes are engine-stable, and every average threshold is
cleared of denominators into integer arithmetic so boundary rows can't
flip between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.rounding import dec_sum, dec_sum_sql
from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load

# Q7 nation pair (fixture nations are NATION_0..NATION_24; this pair
# has bilateral 1996-97 trade in BOTH directions at every fixture SF).
Q7_N1, Q7_N2 = "NATION_18", "NATION_19"
# Q8: customers restricted to this region, market share of this
# supplier nation.
Q8_REGION, Q8_NATION = "EUROPE", "NATION_3"
# Q13: the "special requests" exclusion analog.
Q13_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"
# Q17: the small-quantity part class.
Q17_BRAND, Q17_TYPE = "Brand#1", "SMALL"
# Q22: the "country code IN (...)" analog on nation keys. The fixture
# gives every customer at least one lifetime order, so the classic
# "never ordered" anti join is vacuously empty at every SF; the gate
# here is "no order since Q22_CUTOFF" (dormant customers), which keeps
# the anti-join pattern AND a non-trivial result.
Q22_NATIONS = (1, 2, 3, 11, 12, 13)
Q22_CUTOFF = "2000-01-01"


@query(
    "q_tpch_q7",
    oracle=f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE ((sn.n_name = '{Q7_N1}' AND cn.n_name = '{Q7_N2}')
    OR (sn.n_name = '{Q7_N2}' AND cn.n_name = '{Q7_N1}'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY sn.n_name, cn.n_name, l_year
""",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 pattern (volume shipping): bilateral trade volume between two
    nations by year — revenue where the supplier sits in one nation and
    the customer in the other, both directions reported separately.

    Shape: supplier (100 rows) and both nation aliases broadcast onto
    the shipdate-filtered lineitem scan; the one fact-sized shuffle is
    lineitem⋈orders on orderkey, with customer broadcast after it. The
    disjunctive nation-pair predicate runs AFTER the cheap broadcast
    joins attach both nation names, so Catalyst pushes each side's
    half of it into the respective dimension scan. The final group-by
    has ≤ 2 nations × 2 directions × years keys — a map-side partial
    that collapses to almost nothing before the exchange."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == Q7_N1) & (F.col("cust_nation") == Q7_N2)
    ) | ((F.col("supp_nation") == Q7_N2) & (F.col("cust_nation") == Q7_N1))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "q_tpch_q8",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       sum(CASE WHEN sn.n_name = '{Q8_NATION}'
                THEN round(l_extendedprice * (1 - l_discount) * 10000)
                ELSE 0 END)
         / sum(round(l_extendedprice * (1 - l_discount) * 10000)) * 100.0
         AS mkt_share_pct,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = cn.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE r_name = '{Q8_REGION}'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
""",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 pattern (national market share): the share of one supplier
    nation in the revenue sold into one customer region, by order year.

    Shape: every dimension (supplier, customer, both nation aliases,
    region) broadcasts; the single fact shuffle is lineitem⋈orders.
    The region restriction prunes the customer side BEFORE the fact
    join (Catalyst pushes r_name through the broadcast chain), so fact
    rows for other regions never survive the probe. The share is a
    conditional integer-scaled sum over the same rows as the total —
    one aggregate pass, and the final ratio is the identical IEEE
    division in both engines."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    disc_scaled = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    )
    target = F.col("supp_nation") == Q8_NATION
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(target, disc_scaled).otherwise(F.lit(0)))
                / F.sum(disc_scaled)
                * 100.0
            ).alias("mkt_share_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_tpch_q13",
    oracle=f"""
WITH per_cust AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey
                  AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
""",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 pattern (customer order-count distribution): how many
    customers placed 0, 1, 2, … qualifying orders — the left-outer
    count histogram, zeros included (the whole point of Q13 is that
    customers with no orders appear in the 0 bucket).

    Shape: aggregate orders to (custkey, count) FIRST — the fact table
    collapses to |customers| rows before any join — then LEFT join
    customer onto it and coalesce missing counts to 0. Both the
    pre-aggregation and the join hash-partition on custkey, so AQE
    reuses one exchange; the final histogram groups ≤ max-order-count
    keys — a broadcast-sized result. Joining raw orders to customer
    and counting after (the naive form) would shuffle the fact twice;
    this form shuffles it once."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY
    )
    per_ord = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("n")
    )
    per_cust = cust.join(per_ord, "c_custkey", "left").select(
        "c_custkey", F.coalesce("n", F.lit(0)).cast("long").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_tpch_q17",
    oracle=f"""
WITH pl AS (
  SELECT l_partkey, CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{Q17_BRAND}' AND p_type = '{Q17_TYPE}'
),
stats AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s
  FROM pl GROUP BY l_partkey
)
SELECT CAST(sum(price_c) AS BIGINT) / 100.0 / 7.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small
FROM pl JOIN stats USING (l_partkey)
WHERE 5 * q * n < s
""",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 pattern (small-quantity-order revenue): revenue from line
    items whose quantity is below 20% of the part's average quantity,
    for one brand/type class.

    Shape: the part filter broadcasts into lineitem, and the surviving
    (partkey, price, qty) rows — already a small fraction of the fact
    — aggregate per part and rejoin. The per-part average threshold is
    cleared of its denominator: ``q < 0.2·(s/n)`` becomes the integer
    predicate ``5·q·n < s`` (quantities are integer-valued), so no
    float division decides a boundary row. Both the stats agg and the
    rejoin hash on partkey — one exchange, reused. The scalar output
    divides an exact integer cents-sum by 100 then 7 — the same two
    IEEE ops in both engines."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == Q17_BRAND) & (F.col("p_type") == Q17_TYPE)
    )
    li = load(spark, sf_dir, "lineitem")
    pl = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price_c"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    stats = pl.groupBy("l_partkey").agg(
        F.count("*").alias("n"), F.sum("q").alias("s")
    )
    return (
        pl.join(stats, "l_partkey")
        .filter(5 * F.col("q") * F.col("n") < F.col("s"))
        .agg(
            (F.sum("price_c").cast("long") / 100.0 / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


@query(
    "q_tpch_q22",
    oracle=f"""
WITH eligible AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer WHERE c_nationkey IN {Q22_NATIONS}
),
par AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pos, CAST(sum(bal_c) AS BIGINT) AS s_pos
  FROM eligible WHERE bal_c > 0
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_c) AS BIGINT) / 100.0 AS totacctbal
FROM eligible CROSS JOIN par
WHERE bal_c * n_pos > s_pos
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
GROUP BY c_nationkey
""",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 pattern (global sales opportunity): customers from a set of
    nations with above-average positive balances and no recent order
    (dormant since Q22_CUTOFF) — per nation, how many and their total
    balance.

    Shape: the average-balance gate is a 1-row aggregate broadcast as
    a cross join, and cleared of its denominator (``bal > s/n`` →
    ``bal·n > s`` on integer cents) so boundary balances can't flip
    between engines. The NOT EXISTS is a left-anti join against
    orders filtered to the recent window and projected to o_custkey —
    at 100 TB the date predicate prunes the fact scan first, the
    projection pre-aggregates map-side, and it hash-partitions
    opposite the slim customer side; nothing fact-sized is carried
    past the anti join. Final group-by is ≤ |nations| keys."""
    elig = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(*Q22_NATIONS))
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_c"),
        )
    )
    par = elig.filter(F.col("bal_c") > 0).agg(
        F.count("*").alias("n_pos"), F.sum("bal_c").alias("s_pos")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit(f"{Q22_CUTOFF} 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        elig.crossJoin(F.broadcast(par))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("s_pos"))
        .join(orders, elig.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_c").cast("long") / 100.0).alias("totacctbal"),
        )
    )
