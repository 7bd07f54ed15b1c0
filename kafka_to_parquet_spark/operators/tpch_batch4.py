"""Fourth TPC-H batch — Q1/Q2/Q9/Q11/Q12/Q15/Q16/Q19/Q20/Q21
patterns, completing all 22 classic decision-support shapes (batches
1-3 covered Q3/Q4/Q5/Q6/Q7/Q8/Q10/Q13/Q14/Q17/Q18/Q22).

The fixture schema (FIXTURES.md) has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``l_shipmode``/``p_container``
columns, so the five queries that depend on them are adapted while
keeping their *plan shape* intact — the point of each pattern:

- Q2  (min-cost supplier): the supply relation becomes lineitem's
  observed unit price (`l_extendedprice / l_quantity`); the pattern —
  per-group min + equality join-back — is unchanged.
- Q9  (product-type profit): supply cost becomes the documented
  analog ``0.1 · p_retailprice · l_quantity``.
- Q11 (important stock): "stock value" becomes revenue routed through
  one region's suppliers; the scalar-subquery fraction gate stays.
- Q12 (shipmode priority): the group key becomes a shipping-delay
  bucket from ``datediff(l_shipdate, o_orderdate)``; the CASE-sum
  priority split stays.
- Q16 (supplier count): the part-supplier relation is lineitem; the
  "complaints" exclusion becomes negative-balance suppliers, still a
  NOT-IN anti join.
- Q20 (promotion candidates): availability > half-year-demand becomes
  supplier's shipped share > half the part's annual total.
- Q21 (waiting supplier): "only supplier whose delivery was late"
  becomes "only supplier whose line shipped last on a finished
  multi-supplier order".

The reference (a straight-line Kafka→parquet ETL, reference
src/main.rs:59-294) has no relational surface at all; these queries
exercise Catalyst end-to-end: scan pruning + pushdown (Q1/Q19),
min-join-back (Q2/Q15), multi-dim broadcast chains (Q9), scalar
subquery gates (Q11), disjunctive predicate pushdown (Q19), two-level
aggregation reusing one exchange (Q20/Q21), and anti joins (Q16).

Numeric discipline (functions.rounding): every money sum accumulates
in INTEGER units via ``dec_sum_long`` (long accumulator — exact even
where n·max·10^p exceeds 2^53, which double-accumulated units would
not survive at 100 TB), every average keeps its denominator explicit
(`sum_units / (scale · count)`), and every threshold is cleared of
division into integer inequalities (`2·sq > pq`, `2·v·n > 3·total`)
so no boundary row can flip between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.rounding import (
    dec_sum_long,
    dec_sum_long_sql,
    int_units,
)
from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load

# Q1: pricing summary cutoff (fixture shipdates span 1995..2001).
Q1_CUTOFF = "1999-07-01"
# Q2: the part class and the supplier region.
Q2_REGION, Q2_TYPE, Q2_MAX_SIZE = "EUROPE", "LARGE", 10
# Q9: the part-name class ('%green%' analog; fixture names are
# color+noun pairs like 'red widget').
Q9_NAME_FRAGMENT = "red"
# Q11: supplier region and the importance multiple — keep parts whose
# value exceeds K× the average per-part value. TPC-H scales its
# fraction by 1/SF precisely so the gate tracks the part count; the
# K×-average form has that property built in (scale-free), and stays
# an exact integer inequality.
# The multiple is the rational 3/2 (applied as value·2·n > 3·total):
# the fixture's per-part share distribution tops out near 1.9× the
# average at the smallest SF, so an integer 2× would be degenerate.
Q11_REGION, Q11_NUM, Q11_DEN = "EUROPE", 3, 2
# Q12: the order-year window and the delay buckets (days).
Q12_YEAR_LO, Q12_YEAR_HI = "1997-01-01", "1998-01-01"
Q12_SLOW_DAYS, Q12_LATE_DAYS = 30, 90
# Q15: the top-supplier revenue quarter.
Q15_LO, Q15_HI = "1998-01-01", "1998-04-01"
# Q16: excluded brand/type, the size list, and the complaints analog
# (suppliers with negative account balance).
Q16_EXCL_BRAND, Q16_EXCL_TYPE = "Brand#3", "PROMO"
Q16_SIZES = (1, 5, 9, 14, 19, 23, 36, 45)
# Q19: three disjunctive (brand, size, quantity) brackets.
Q19_BRACKETS = (
    ("Brand#2", 5, 1, 11),
    ("Brand#13", 10, 10, 20),
    ("Brand#24", 15, 20, 30),
)
# Q20: supplier region, part-name prefix, and the demand year.
Q20_REGION, Q20_NAME_PREFIX = "EUROPE", "red"
Q20_LO, Q20_HI = "1998-01-01", "1999-01-01"
# Q21: finished-order status and the report size.
Q21_STATUS, Q21_TOPK = "F", 10


def _ts(lit: str) -> F.Column:
    return F.lit(f"{lit} 00:00:00").cast("timestamp")


def _region_supp_sql(region: str) -> str:
    """DuckDB derived-table fragment: suppliers restricted to one
    region. Single source of truth for the Q2/Q11/Q20 oracles (the
    same discipline as graph._PAIRS_CTE)."""
    return (
        "(SELECT s_suppkey, s_name FROM supplier"
        " JOIN nation ON n_nationkey = s_nationkey"
        f" JOIN region ON r_regionkey = n_regionkey AND r_name = '{region}')"
    )


def _region_suppliers(spark: SparkSession, sf_dir: str, region: str) -> DataFrame:
    """Spark twin of :func:`_region_supp_sql`: the broadcast-sized
    supplier⋈nation⋈region chain, shared by Q2/Q11/Q20."""
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(reg), nation.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name")
    )


@query(
    "q_tpch_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       {dec_sum_long_sql('l_extendedprice', 2)} / 100.0 AS sum_base_price,
       {dec_sum_long_sql('l_extendedprice * (1 - l_discount)', 4)} / 10000.0
         AS sum_disc_price,
       {dec_sum_long_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}
         / 1000000.0 AS sum_charge,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) / count(*) AS avg_qty,
       {dec_sum_long_sql('l_extendedprice', 2)} / (100.0 * count(*)) AS avg_price,
       {dec_sum_long_sql('l_discount', 2)} / (100.0 * count(*)) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pattern (pricing summary report): the full measure set —
    quantity/price/discounted/charged sums, three averages, and the
    line count — grouped by returnflag × linestatus over a shipdate
    prefix of the fact table.

    Shape: single scan, no joins. The shipdate predicate reaches the
    parquet scan (PushedFilters) and only the 7 referenced columns are
    read; the group-by has ≤ 6 keys so the partial aggregate collapses
    the fact map-side and the exchange carries 6 rows per task — at
    100 TB this query is scan-bound, exactly as it should be. All four
    money sums accumulate in integer units inside a long accumulator
    (``dec_sum_long``): the 6-decimal charge sum would overflow
    double's 2^53 integer range on a big fact table if accumulated as
    scaled doubles, while long sums stay exact to 2^63. Averages keep
    the denominator explicit so both engines perform the identical
    single FP division on exact integers."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _ts(Q1_CUTOFF))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        (dec_sum_long(F.col("l_extendedprice"), 2) / 100.0).alias("sum_base_price"),
        (dec_sum_long(disc, 4) / 10000.0).alias("sum_disc_price"),
        (dec_sum_long(charge, 6) / 1000000.0).alias("sum_charge"),
        (F.sum(F.col("l_quantity").cast("long")) / cnt).alias("avg_qty"),
        (dec_sum_long(F.col("l_extendedprice"), 2) / (100.0 * cnt)).alias("avg_price"),
        (dec_sum_long(F.col("l_discount"), 2) / (100.0 * cnt)).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "q_tpch_q2",
    oracle=f"""
WITH base AS (
  SELECT l_partkey AS p_partkey, p_name, s_suppkey, s_name,
         {int_units('l_extendedprice / l_quantity', 3)} AS unit_milli
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
           AND p_type = '{Q2_TYPE}' AND p_size <= {Q2_MAX_SIZE}
  JOIN {_region_supp_sql(Q2_REGION)} rs ON rs.s_suppkey = l_suppkey
),
mins AS (
  SELECT p_partkey, min(unit_milli) AS min_milli FROM base GROUP BY p_partkey
)
SELECT DISTINCT b.p_partkey, b.p_name, b.s_suppkey, b.s_name,
       m.min_milli / 1000.0 AS unit_price
FROM base b JOIN mins m
  ON b.p_partkey = m.p_partkey AND b.unit_milli = m.min_milli
""",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 pattern (minimum-cost supplier): for every part in a
    type/size class, the region supplier(s) offering the lowest
    observed unit price. The fixture has no partsupp table, so the
    supply relation is lineitem's realized unit price — the pattern
    (correlated min subquery → per-group min + equality join-back)
    is the real Q2 plan shape.

    Shape: part class and the region-restricted supplier list both
    broadcast into the fact scan, so `base` is a filtered projection
    with zero fact shuffles. The min aggregate and the join-back both
    hash-partition on partkey — one exchange, reused by AQE. Unit
    price is fenced to integer milli-units (floor-form rounding on
    the identical quotient double) BEFORE the min, so min-equality
    join-back can't straddle an ulp between engines. Ties (several
    suppliers at the min) are returned as a set — deterministic
    without any tie-break ordering."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
    )
    supp_r = _region_suppliers(spark, sf_dir, Q2_REGION)
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_r), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_suppkey",
            "s_name",
            F.expr(int_units("l_extendedprice / l_quantity", 3)).alias("unit_milli"),
        )
    )
    mins = base.groupBy("p_partkey").agg(F.min("unit_milli").alias("min_milli"))
    return (
        base.join(mins, "p_partkey")
        .filter(F.col("unit_milli") == F.col("min_milli"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            (F.col("min_milli") / 1000.0).alias("unit_price"),
        )
        .distinct()
    )


@query(
    "q_tpch_q9",
    oracle=f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
              - CAST(round(p_retailprice * l_quantity * 1000) AS BIGINT))
            AS BIGINT) / 10000.0 AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%{Q9_NAME_FRAGMENT}%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
GROUP BY n_name, o_year
""",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 pattern (product-type profit): profit by supplier nation and
    order year for parts in one name class. The fixture has no
    partsupp.ps_supplycost, so unit cost is the documented analog
    ``0.1 · p_retailprice`` — the shape (profit = revenue − cost,
    5-table join, two-key group) is Q9's.

    Shape: the part-name filter broadcasts first and prunes the fact
    scan hard (≈1/8 of parts match a color fragment); supplier and
    nation broadcast after it. The single fact-sized shuffle is
    lineitem⋈orders on orderkey. Profit accumulates as a difference of
    two integer-unit terms inside one long sum — revenue at 4dp and
    cost at 4dp (retailprice·qty·1000 = retailprice·qty·0.1·10^4) —
    so the subtraction is exact per row and the aggregate is an exact
    integer; the final /10^4 is the single shared FP op."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{Q9_NAME_FRAGMENT}%")
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    amount_units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long") - F.round(
        F.col("p_retailprice") * F.col("l_quantity") * 1000, 0
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(amount_units).cast("long") / 10000.0).alias("profit"))
    )


@query(
    "q_tpch_q11",
    oracle=f"""
WITH supp_r AS (
  SELECT s_suppkey FROM {_region_supp_sql(Q11_REGION)} rs
),
per_part AS (
  SELECT l_partkey,
         {dec_sum_long_sql('l_extendedprice * (1 - l_discount)', 4)} AS value_u
  FROM lineitem JOIN supp_r ON s_suppkey = l_suppkey
  GROUP BY l_partkey
),
tot AS (
  SELECT CAST(sum(value_u) AS BIGINT) AS total_u,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM per_part
)
SELECT l_partkey, value_u / 10000.0 AS value
FROM per_part CROSS JOIN tot
WHERE value_u * n_parts * {Q11_DEN} > total_u * {Q11_NUM}
""",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 pattern (important stock identification): parts whose value
    routed through one region's suppliers exceeds 3/2 of the
    average per-part value. The fixture has no partsupp, so "stock
    value" is the revenue shipped by those suppliers — the pattern
    (group, global scalar subquery, fraction gate) is Q11's. TPC-H
    scales its 0.0001 fraction by 1/SF so the gate tracks part count;
    the K×-average form (`value·DEN·n_parts > NUM·total`) is that scaling
    made intrinsic — non-degenerate at every SF.

    Shape: the region supplier list broadcasts into the fact scan and
    prunes it to ~1 region's share before the one partkey exchange;
    the total is a 1-row aggregate of the (already tiny) per-part
    table, broadcast back as a cross join. The gate is cleared of
    division into ``value·n_parts > K·total`` — no boundary flips;
    value·n_parts ≈ (share·n_parts)·total stays O(K·total) for any
    surviving row, so the 63-bit headroom tracks the total itself
    (document: at true 100 TB revenue scale, drop to 2dp units for
    the same exactness)."""
    li = load(spark, sf_dir, "lineitem")
    supp_r = _region_suppliers(spark, sf_dir, Q11_REGION).select("s_suppkey")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        li.join(F.broadcast(supp_r), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dec_sum_long(disc, 4).alias("value_u"))
    )
    tot = per_part.agg(
        F.sum("value_u").cast("long").alias("total_u"),
        F.count("*").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_u") * F.col("n_parts") * Q11_DEN
            > F.col("total_u") * Q11_NUM
        )
        .select("l_partkey", (F.col("value_u") / 10000.0).alias("value"))
    )


@query(
    "q_tpch_q12",
    oracle=f"""
SELECT CASE
         WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
              > {Q12_LATE_DAYS} THEN 'LATE'
         WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
              > {Q12_SLOW_DAYS} THEN 'SLOW'
         ELSE 'FAST'
       END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE o_orderdate >= TIMESTAMP '{Q12_YEAR_LO} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q12_YEAR_HI} 00:00:00'
GROUP BY ship_bucket
""",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 pattern (shipping-priority split): line counts split into
    high/low order priority, grouped by a shipping bucket. The fixture
    has no l_shipmode/commitdate/receiptdate, so the group key is a
    delay bucket from ``datediff(l_shipdate, o_orderdate)`` — the
    CASE-sum conditional-count core of Q12 is unchanged.

    Shape: the orderdate window filters orders before the one
    fact-sized orderkey shuffle; the group-by has 3 bucket keys, so
    partials collapse map-side. datediff on midnight-aligned dates is
    an exact integer in both engines; every measure is a conditional
    integer count — nothing floating anywhere."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(Q12_YEAR_LO))
        & (F.col("o_orderdate") < _ts(Q12_YEAR_HI))
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay > Q12_LATE_DAYS, "LATE")
        .when(delay > Q12_SLOW_DAYS, "SLOW")
        .otherwise("FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q15",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         {dec_sum_long_sql('l_extendedprice * (1 - l_discount)', 4)} AS rev_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_HI} 00:00:00'
  GROUP BY l_suppkey
),
mx AS (SELECT max(rev_u) AS max_u FROM rev)
SELECT r.s_suppkey, s_name, r.rev_u / 10000.0 AS total_revenue
FROM rev r CROSS JOIN mx
JOIN supplier ON supplier.s_suppkey = r.s_suppkey
WHERE r.rev_u = max_u
""",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 pattern (top supplier): the supplier(s) with maximum revenue
    in one quarter — the classic "view + max + equality join-back"
    without materializing a view.

    Shape: the shipdate window prunes the fact scan; one suppkey
    exchange builds per-supplier revenue (a supplier-sized table); the
    max is a 1-row aggregate broadcast back as a cross join. Revenue
    is compared in exact integer units, so `rev_u = max_u` is a true
    equality — the documented Q15 tie case (several suppliers at the
    max) returns all of them deterministically, no tie-break order
    needed. Supplier names attach by broadcast after the gate."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q15_LO)) & (F.col("l_shipdate") < _ts(Q15_HI))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        dec_sum_long(disc, 4).alias("rev_u")
    )
    mx = rev.agg(F.max("rev_u").alias("max_u"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_u") == F.col("max_u"))
        .join(F.broadcast(supp), "s_suppkey")
        .select("s_suppkey", "s_name", (F.col("rev_u") / 10000.0).alias("total_revenue"))
    )


@query(
    "q_tpch_q16",
    oracle=f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 pattern (parts/supplier relationship): how many distinct
    suppliers ship each (brand, type, size) combination, excluding one
    brand, one type, off-list sizes, and "complaint" suppliers. The
    fixture has no partsupp, so the part↔supplier relation is
    lineitem, and the complaints filter is the negative-balance
    supplier set — still a NOT IN anti join.

    Shape: the part filter broadcasts and prunes the fact scan to the
    8 listed sizes; the complaint supplier list is tiny and planned as
    a broadcast anti join (null-safe NOT-IN semantics are irrelevant
    here — keys are non-null — so left_anti is exact). The distinct
    count shuffles narrow (brand, type, size, suppkey) rows once,
    then Spark's two-phase distinct-aggregate collapses them; no
    second fact pass."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def _q19_bracket_sql() -> str:
    parts = [
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {sz}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, sz, qlo, qhi in Q19_BRACKETS
    ]
    return "\n   OR ".join(parts)


@query(
    "q_tpch_q19",
    oracle=f"""
SELECT {dec_sum_long_sql('l_extendedprice * (1 - l_discount)', 4)} / 10000.0
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_q19_bracket_sql()}
""",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 pattern (discounted revenue, disjunctive brackets): revenue
    from lines matching any of three (brand, size-range, quantity-
    range) brackets — the canonical test that a disjunctive mixed
    join/filter predicate still plans as an equi join plus residual,
    not a nested loop.

    Shape: the join key (partkey) is conjunctive to the whole
    disjunction, so Catalyst plans a broadcast hash join with the OR
    residual evaluated on the joined row; the part-only half of each
    bracket also pushes into the part scan (brand/size prune before
    broadcast). The global agg emits one row; revenue in exact integer
    units. A nested-loop plan here would be the 100 TB failure mode —
    pinned absent in tests."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bracket = None
    for b, sz, qlo, qhi in Q19_BRACKETS:
        clause = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(1, sz)
            & F.col("l_quantity").between(qlo, qhi)
        )
        bracket = clause if bracket is None else (bracket | clause)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(bracket).agg(
        (dec_sum_long(disc, 4) / 10000.0).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q_tpch_q20",
    oracle=f"""
WITH qual AS (
  SELECT l_partkey, l_suppkey,
         CAST(round(l_quantity * 100) AS BIGINT) AS q100
  FROM lineitem
  JOIN part ON p_partkey = l_partkey AND p_name LIKE '{Q20_NAME_PREFIX}%'
  WHERE l_shipdate >= TIMESTAMP '{Q20_LO} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q20_HI} 00:00:00'
),
pair AS (
  SELECT l_partkey, l_suppkey, CAST(sum(q100) AS BIGINT) AS sq
  FROM qual GROUP BY l_partkey, l_suppkey
),
ptot AS (
  SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS pq FROM pair GROUP BY l_partkey
)
SELECT DISTINCT rs.s_suppkey, rs.s_name
FROM pair JOIN ptot ON pair.l_partkey = ptot.l_partkey
JOIN {_region_supp_sql(Q20_REGION)} rs ON rs.s_suppkey = pair.l_suppkey
WHERE 2 * sq > pq
""",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 pattern (potential part promotion): region suppliers who
    dominated the supply of some part in one year — shipped more than
    half of that part's annual volume in a name class. The fixture has
    no partsupp.ps_availqty, so "availability exceeds half the demand"
    becomes "supplied share exceeds half the total" — the same nested
    per-(part,supplier) vs per-part aggregate comparison.

    Shape: the name-class part filter and the date window prune the
    fact scan before its one partkey-family shuffle; the pair and
    per-part aggregates share the partkey hash (one exchange + an AQE
    reuse), and the dominance gate is the integer inequality
    ``2·sq > pq`` on exact centi-quantity units. The region supplier
    list broadcasts last over the (tiny) winner set; DISTINCT emits
    each supplier once however many parts they dominate."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q20_LO)) & (F.col("l_shipdate") < _ts(Q20_HI))
    )
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"{Q20_NAME_PREFIX}%")
    )
    qual = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("q100"),
    )
    pair = qual.groupBy("l_partkey", "l_suppkey").agg(F.sum("q100").alias("sq"))
    ptot = pair.groupBy("l_partkey").agg(F.sum("sq").alias("pq"))
    supp_r = _region_suppliers(spark, sf_dir, Q20_REGION)
    return (
        pair.join(ptot, "l_partkey")
        .filter(2 * F.col("sq") > F.col("pq"))
        .join(F.broadcast(supp_r), pair.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "q_tpch_q21",
    oracle=f"""
WITH li2 AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = '{Q21_STATUS}'
),
per_order AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
         max(l_shipdate) AS max_ship
  FROM li2 GROUP BY l_orderkey
),
late AS (
  SELECT DISTINCT a.l_orderkey, a.l_suppkey
  FROM li2 a JOIN per_order p
    ON a.l_orderkey = p.l_orderkey
   AND a.l_shipdate = p.max_ship AND p.n_supp >= 2
),
solo AS (
  SELECT l_orderkey, min(l_suppkey) AS s_suppkey
  FROM late GROUP BY l_orderkey HAVING count(*) = 1
)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM solo JOIN supplier s ON s.s_suppkey = solo.s_suppkey
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_suppkey
LIMIT {Q21_TOPK}
""",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 pattern (suppliers who kept orders waiting): per supplier,
    the number of finished multi-supplier orders where that supplier —
    alone — shipped last. The fixture has no receipt/commit dates, so
    "failed to meet the committed date while everyone else did"
    becomes "uniquely latest l_shipdate on the order" — preserving
    Q21's EXISTS(другой supplier) ∧ NOT EXISTS(another late supplier)
    logic as aggregate form: ≥2 suppliers on the order, exactly 1 at
    the max shipdate.

    Shape: the fact passes through ONE orderkey exchange, and every
    operator after it reuses that partitioning with no further
    fact-scale shuffle. An explicit repartition on l_orderkey feeds
    the per-(order, supplier) max-shipdate aggregate (HashPartitioning
    on a SUBSET of the grouping keys satisfies the aggregate's
    clustering requirement, so no (order, supplier) exchange is
    inserted), the per-order stats come from an unbounded window over
    the same partitioning (count + max over l_orderkey — exchange-free
    where a groupBy + join-back would both re-exchange AND, because
    Catalyst has no cross-subtree CSE, execute the fact-sized os_max
    subtree twice; the round-5 plan did exactly that, 10 exchanges at
    sf≈1 with the smax==max_ship filter absorbed as an extra join key),
    and the solo reduction groups on l_orderkey inside the partitions
    it already owns. The final per-supplier count is supplier-sized,
    topped with a deterministic (numwait DESC, suppkey)
    TakeOrderedAndProject — the unique suppkey tie-break makes the
    LIMIT a well-defined set, so the order-insensitive oracle hash is
    stable."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == Q21_STATUS)
        .select("o_orderkey")
    )
    li = load(spark, sf_dir, "lineitem")
    li2 = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # The ONE fact exchange: cluster by order so the (order, supplier)
    # aggregate, the per-order window, and the solo reduction all run
    # in place on top of it.
    os_max = (
        li2.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("smax"))
    )
    w = Window.partitionBy("l_orderkey")
    late = (
        os_max.withColumn("n_supp", F.count("*").over(w))
        .withColumn("max_ship", F.max("smax").over(w))
        .filter((F.col("smax") == F.col("max_ship")) & (F.col("n_supp") >= 2))
        .select("l_orderkey", "l_suppkey")
    )
    solo = (
        late.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_late"), F.min("l_suppkey").alias("s_suppkey"))
        .filter(F.col("n_late") == 1)
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        solo.groupBy("s_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), "s_suppkey")
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(Q21_TOPK)
    )
