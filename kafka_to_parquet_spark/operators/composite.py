"""Composite workloads: multi-join analytics (TPC-H-pattern Q3/Q5/Q6
adapted to the fixture schema), a scalable as-of join, and a salted
two-phase aggregation for skewed keys.

The reference implements none of these (its relational surface is a
straight-line ETL, SURVEY §2.12 exhaustiveness note); they exercise the
optimizer end-to-end: multi-way join ordering, broadcast selection,
partial aggregation, TakeOrderedAndProject, and the shuffle-minimal
as-of formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.rounding import dec_sum, dec_sum_sql
from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load


@query(
    "q_tpch_q6",
    oracle=f"""
SELECT {dec_sum_sql('l_extendedprice * l_discount', 4)} AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
""",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 pattern: pure filter + global agg. The whole query is one
    scan with every predicate pushed to parquet (range on shipdate,
    range on discount, bound on quantity) and a two-column projection
    — the plan to beat at 100 TB is scan-local partial sums, one
    single-row exchange."""
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.04))
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count("*").alias("n"),
    )


@query(
    "q_tpch_q3",
    oracle=f"""
SELECT l_orderkey,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       CAST(o_orderdate AS DATE) AS o_date,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, o_date, l_orderkey
LIMIT 10
""",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 pattern: shipping-priority top-k. customer (small) joins
    broadcast into orders, orders⋈lineitem is the one real shuffle,
    aggregation is partial+final, and the final ordering is
    TakeOrderedAndProject (bounded driver memory at any scale). The
    sort key includes the unique l_orderkey so the top-10 *set* is
    deterministic for the order-insensitive oracle hash."""
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_date"), "o_orderpriority")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_date", "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle=f"""
SELECT n_name,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN supplier ON s_nationkey = n_nationkey
JOIN customer ON c_nationkey = s_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey AND l_suppkey = s_suppkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
""",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 pattern: local-supplier volume — a 6-table join where
    region/nation/supplier/customer are broadcast dims and the only
    big shuffle is orders⋈lineitem. The c_nationkey = s_nationkey
    constraint ("local" suppliers) rides the same broadcast."""
    cutoff_lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cutoff_hi = F.lit("1999-01-01 00:00:00").cast("timestamp")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = load(spark, sf_dir, "lineitem")
    dims = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .join(
            F.broadcast(customer),
            (orders.o_custkey == customer.c_custkey)
            & (customer.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


@query(
    "q_join_asof",
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS is_p,
         CASE WHEN event_type = 'view' THEN {'t': ts, 'e': event_id} END AS vrec
  FROM events
  WHERE event_type IN ('view', 'purchase')
),
carried AS (
  SELECT *, max(vrec) OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                            ROWS UNBOUNDED PRECEDING) AS last_view
  FROM tagged
)
SELECT event_id AS p_event,
       user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS p_ts_s,
       last_view.e AS view_event,
       CAST(floor(epoch(ts)) - floor(epoch(last_view.t)) AS BIGINT) AS wait_s
FROM carried
WHERE is_p = 1
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J6, beyond the reference): for every purchase, the
    most recent view by the same user at-or-before it (ties broken by
    max event_id — deterministic in both engines via lexicographic
    struct max).

    Spark has no asof primitive; the scalable formulation is NOT a
    range join (quadratic blow-up) but union → one shuffle on user_id
    → running struct-max window. State per key is one struct; at
    100 TB this is a single hash partitioning of the combined stream,
    the same shape Flink/kdb use for asof. DuckDB's native ASOF JOIN
    matches modulo tie-break, which the oracle pins explicitly.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "purchase"))
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", F.lit(0)).otherwise(F.lit(1)).alias("is_p"),
        F.when(
            F.col("event_type") == "view",
            F.struct(F.col("ts").alias("t"), F.col("event_id").alias("e")),
        ).alias("vrec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn("last_view", F.max("vrec").over(w))
    return carried.filter(F.col("is_p") == 1).select(
        F.col("event_id").alias("p_event"),
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("p_ts_s"),
        F.col("last_view.e").alias("view_event"),
        (F.floor(F.unix_timestamp("ts")) - F.floor(F.unix_timestamp("last_view.t")))
        .cast("long")
        .alias("wait_s"),
    )


@query(
    "q_join_asof_nearest",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS is_p,
         CASE WHEN event_type = 'view'
              THEN {'t': CAST(floor(epoch(ts)) AS BIGINT), 'e': event_id} END AS vrec
  FROM events
  WHERE event_type IN ('view', 'purchase')
),
carried AS (
  SELECT *,
         max(vrec) OVER (PARTITION BY user_id ORDER BY es, is_p, event_id
                         ROWS UNBOUNDED PRECEDING) AS back,
         min(vrec) OVER (PARTITION BY user_id ORDER BY es, is_p, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fwd
  FROM tagged
)
SELECT event_id AS p_event, user_id,
       CASE WHEN fwd IS NULL THEN back.e
            WHEN back IS NULL THEN fwd.e
            WHEN es - back.t <= fwd.t - es THEN back.e
            ELSE fwd.e END AS view_event,
       CASE WHEN fwd IS NULL THEN back.t - es
            WHEN back IS NULL THEN fwd.t - es
            WHEN es - back.t <= fwd.t - es THEN back.t - es
            ELSE fwd.t - es END AS delta_s
FROM carried
WHERE is_p = 1 AND (back IS NOT NULL OR fwd IS NOT NULL)
""",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join, completing the as-of family next
    to the backward form (q_join_asof): for every purchase, the
    same-user view closest in time in EITHER direction — kdb's
    ``aj``/pandas ``merge_asof(direction='nearest')`` semantics.

    Declared tie-breaks (pinned identically in both engines): time is
    second-truncated epoch; at equal distance backward wins; among
    same-second views the backward candidate is the max event_id and
    the forward candidate the min event_id (lexicographic struct
    extremes); same-second views sort before purchases, so they are
    always backward candidates with delta 0.

    Scale shape: same as the backward form — NOT a range join. Union
    both event kinds, ONE shuffle on user_id, then two running struct
    extremes over the sorted partition (preceding max + following
    min); per-key state is two structs however large the stream. The
    nearest pick is a row-local CASE. At 100 TB this is a single hash
    exchange, the Flink/kdb asof topology."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        F.when(F.col("event_type") == "view", F.lit(0)).otherwise(F.lit(1)).alias("is_p"),
        F.when(
            F.col("event_type") == "view",
            F.struct(
                F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
                F.col("event_id").alias("e"),
            ),
        ).alias("vrec"),
    )
    order = [F.col("es"), F.col("is_p"), F.col("event_id")]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carried = tagged.withColumn("back", F.max("vrec").over(w_back)).withColumn(
        "fwd", F.min("vrec").over(w_fwd)
    )
    back_wins = (
        F.col("fwd").isNull()
        | (
            F.col("back").isNotNull()
            & (F.col("es") - F.col("back.t") <= F.col("fwd.t") - F.col("es"))
        )
    )
    return (
        carried.filter(
            (F.col("is_p") == 1)
            & (F.col("back").isNotNull() | F.col("fwd").isNotNull())
        )
        .select(
            F.col("event_id").alias("p_event"),
            "user_id",
            F.when(back_wins, F.col("back.e")).otherwise(F.col("fwd.e")).alias(
                "view_event"
            ),
            F.when(back_wins, F.col("back.t") - F.col("es"))
            .otherwise(F.col("fwd.t") - F.col("es"))
            .alias("delta_s"),
        )
    )


@query(
    "q_agg_salted",
    oracle=f"""
SELECT l_returnflag,
       {dec_sum_sql('l_quantity', 2)} AS sum_qty,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: phase 1 groups by
    (key, salt) — salt = l_orderkey % 16, deterministic — spreading a
    hot key over 16 reducers; phase 2 re-aggregates the 16 partials
    per key. Result is identical to a direct groupBy (the oracle IS
    the direct groupBy). On skew-free data this costs one extra tiny
    shuffle; on a 100 TB stream with a dominant key it converts one
    straggler reducer into 16 parallel ones. (Spark's AQE skew-join
    handles join skew; agg skew still needs the salt pattern.)

    Fixed-point note: phase 1 keeps integer-scaled sums (exact), the
    division by the scale happens once in phase 2 — bit-identical to
    the oracle's single-level sum."""
    li = load(spark, sf_dir, "lineitem")
    phase1 = (
        li.withColumn("salt", (F.col("l_orderkey") % 16).cast("int"))
        .groupBy("l_returnflag", "salt")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100, 0)).alias("qty_scaled"),
            F.count("*").alias("n_part"),
        )
    )
    return phase1.groupBy("l_returnflag").agg(
        (F.sum("qty_scaled") / 100.0).alias("sum_qty"),
        F.sum("n_part").cast("long").alias("n"),
    )


ASOF_TOL_S = 1800  # tolerance bound: matches older than 30 min are dropped


@query(
    "q_join_asof_tolerance",
    oracle=f"""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS is_p,
         CASE WHEN event_type = 'view' THEN {{'t': ts, 'e': event_id}} END AS vrec
  FROM events
  WHERE event_type IN ('view', 'purchase')
),
carried AS (
  SELECT *, max(vrec) OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                            ROWS UNBOUNDED PRECEDING) AS last_view
  FROM tagged
)
SELECT event_id AS p_event,
       user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS p_ts_s,
       CASE WHEN floor(epoch(ts)) - floor(epoch(last_view.t)) <= {ASOF_TOL_S}
            THEN last_view.e END AS view_event,
       CASE WHEN floor(epoch(ts)) - floor(epoch(last_view.t)) <= {ASOF_TOL_S}
            THEN CAST(floor(epoch(ts)) - floor(epoch(last_view.t)) AS BIGINT)
            END AS wait_s
FROM carried
WHERE is_p = 1
""",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6c: bounded as-of join — q_join_asof with pandas
    ``merge_asof``'s ``tolerance`` semantics: the most recent same-user
    view matches only if it happened within {ASOF_TOL_S} s of the
    purchase; staler matches become NULL (the purchase row survives,
    attribution doesn't). The bound is what production attribution
    actually ships — an unbounded as-of happily credits a view from
    last month.

    Plan: identical to q_join_asof (union → ONE user_id exchange →
    running struct-max; no range join, state per key is one struct) —
    the tolerance is a pure row-local CASE over the carried struct, so
    the bound costs nothing at any scale. A NULL carried struct (no
    prior view at all) fails the CASE's comparison and nulls both
    output columns on both engines identically."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", F.lit(0)).otherwise(F.lit(1)).alias("is_p"),
        F.when(
            F.col("event_type") == "view",
            F.struct(F.col("ts").alias("t"), F.col("event_id").alias("e")),
        ).alias("vrec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn("last_view", F.max("vrec").over(w))
    wait = F.floor(F.unix_timestamp("ts")) - F.floor(F.unix_timestamp("last_view.t"))
    in_tol = wait <= ASOF_TOL_S
    return carried.filter(F.col("is_p") == 1).select(
        F.col("event_id").alias("p_event"),
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("p_ts_s"),
        F.when(in_tol, F.col("last_view.e")).alias("view_event"),
        F.when(in_tol, wait.cast("long")).alias("wait_s"),
    )
