"""Window functions (SURVEY §2.5, all (E)).

Every window spec here has a deterministic total order (unique-key
tiebreaks) so results are engine-independent. Scale note: a window
shuffles once on its partition keys and sorts within partitions;
partition keys are chosen with bounded group sizes (suppkey, user_id,
mktsegment) — no single giant partition.
"""

from __future__ import annotations

# (analytic CDF window functions appended at the bottom of this module)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load


@query(
    "q_win_rank",
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4)     OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ranking family over one shared window spec (single shuffle +
    sort serves all four functions)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
SELECT event_id,
       user_id,
       "value",
       lag("value")  OVER w                  AS prev_value,
       lead("value") OVER w                  AS next_value,
       first_value(event_id) OVER w          AS first_event,
       CAST(floor(epoch(ts)) AS BIGINT)
         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: analytic family — lag/lead/first + inter-event gap (the
    sessionization building block; see streaming.windows for the
    session_window form)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(w).alias("first_event"),
        gap.alias("gap_s"),
    )


@query(
    "q_win_running",
    oracle="""
SELECT l_suppkey,
       l_orderkey,
       l_linenumber,
       round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_qty,
       sum(round(l_extendedprice * 100)) OVER (PARTITION BY l_suppkey
                                        ORDER BY l_shipdate, l_orderkey, l_linenumber
                                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         / (100.0 * count(*) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
         AS moving_avg_price
FROM lineitem
""",
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: frame-spec aggregates — running sum (unbounded preceding)
    and 4-row moving average. The ROWS frame makes both engines
    accumulate over the identical ordered row set.

    Scale caveat (measured in tools/stress_big.py): this fixture has
    only 10 suppliers at every sf, so partitioning by l_suppkey gives
    10 giant window partitions — parallelism is capped at 10 and each
    partition sorts rows/10 rows. Running aggregates over genuinely
    hot keys at 100 TB need either a higher-cardinality partition key
    or the two-level prefix-sum decomposition (per-salt running sums +
    per-key salt offsets); kept as-is here because the declared query
    pins the reference semantics."""
    li = load(spark, sf_dir, "lineitem")
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w_run = (
        Window.partitionBy("l_suppkey").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    w_mov = Window.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-3, 0)
    # Moving average in the engine-stable integer-cents form: exact sum
    # over the frame / (100 · frame size) — bit-identical to the oracle.
    moving_avg = F.sum(F.round(F.col("l_extendedprice") * 100, 0)).over(w_mov) / (
        F.lit(100.0) * F.count(F.lit(1)).over(w_mov)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w_run), 2).alias("running_qty"),
        moving_avg.alias("moving_avg_price"),
    )


@query(
    "q_win_topk_group",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
WHERE rn <= 3
""",
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 applied: top-k per group — the standard pattern (row_number ≤
    k). One shuffle on the group key; with AQE the rn filter prunes
    early per partition."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "q_win_cdf",
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume,
       CAST(ntile(10) OVER w AS INTEGER) AS decile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def q_win_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1': distribution-analytic window functions — percent_rank /
    cume_dist / decile ntile per market segment. percent_rank is
    (rank-1)/(n-1): a ratio of small integers, identical in both
    engines; rounding is cosmetic. The unique (acctbal, custkey) order
    makes every rank deterministic."""
    from pyspark.sql import Window as W

    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@query(
    "q_win_running_scalable",
    oracle="""
SELECT l_suppkey,
       l_orderkey,
       l_linenumber,
       round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_qty
FROM lineitem
""",
)
def q_win_running_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 scale path: hot-key running sum via two-level prefix-sum
    decomposition. Same semantics as q_win_running's running_qty, but
    parallelism is no longer capped at the number of distinct partition
    keys (10 suppliers in the fixture; a handful of hot tenants at
    100 TB).

    Decomposition: bucket each row by a monotone function of the
    leading ORDER BY column (calendar month of l_shipdate — ~83 buckets
    here), so every bucket is a contiguous run of the ordered stream.

      1. within-bucket running sum — window over (key, bucket): the big
         sort/scan now runs on keys × buckets partitions instead of
         keys, and each partition sorts rows/(keys·buckets) rows;
      2. per-(key, bucket) totals — one map-side-combined groupBy
         producing keys × buckets rows (tiny at any scale);
      3. exclusive prefix sum of those totals per key — a window over
         the tiny table (≤ buckets rows per key);
      4. broadcast-join the offsets back on (key, bucket) and add.

    Exactness: l_quantity is integer-valued (TPC-H 1..50), so the
    regrouped double sums are exact — bit-identical to the single
    window. For fractional measures, decompose over integer-scaled
    cents (functions/rounding.py) instead.

    At 6M rows on local[32] the two forms time within noise of each
    other (stress_big medians swing 1.8-2.9x for both) — 600k-row
    per-key sorts are cheap on one box, so the decomposition's constant
    overhead (~3 extra tiny stages) cancels its parallelism win. The
    argument for this form is structural, and binds at cluster scale:
    the single window's parallelism is |keys| (10 here, a handful of
    hot tenants at 100 TB) regardless of executor count, while this
    form's is |keys|x|buckets| with per-task sort size shrunk by the
    bucket count — the difference between 10 executors busy and 1000.
    This is the production path; q_win_running is the semantics
    baseline (COVERAGE.md)."""
    li = load(spark, sf_dir, "lineitem")
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    bucket = (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("_bkt")
    df = li.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", bucket
    )
    w_in = (
        Window.partitionBy("l_suppkey", "_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = df.withColumn("_run_in", F.sum("l_quantity").over(w_in))
    totals = df.groupBy("l_suppkey", "_bkt").agg(F.sum("l_quantity").alias("_tot"))
    w_off = (
        Window.partitionBy("l_suppkey")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "l_suppkey",
        "_bkt",
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0.0)).alias("_off"),
    )
    joined = within.join(F.broadcast(offsets), ["l_suppkey", "_bkt"])
    return joined.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("_run_in") + F.col("_off"), 2).alias("running_qty"),
    )
