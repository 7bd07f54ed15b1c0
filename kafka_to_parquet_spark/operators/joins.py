"""Joins (SURVEY §2.3, all (E) — the reference has exactly one input
stream and no join anywhere in main.rs).

Scale strategy per join:
- equi joins on keys: let Catalyst/AQE pick broadcast-hash vs
  sort-merge from stats; dimensions (region/nation/part/supplier at
  TPC-H ratios) stay broadcastable even at SF100k;
- explicit F.broadcast for the known-small side (J4) — skips the
  shuffle of the 100 TB fact side entirely;
- non-equi range join (J5) against a tiny derived bucket table:
  broadcast-nested-loop against ~10 rows is O(n·10), not O(n²);
- cross join (J7) only dim×dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.rounding import (
    dec_avg,
    dec_avg_sql,
    dec_sum,
    dec_sum_sql,
)
from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load


@query(
    "q_join_inner",
    oracle=f"""
SELECT c_nationkey,
       CAST(count(*) AS BIGINT)         AS n_orders,
       {dec_sum_sql('o_totalprice', 2)} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: equi inner join fact→dim + aggregate. Shuffles hash on the
    join key; AQE coalesces post-shuffle partitions. At scale the
    customer side is the candidate broadcast side."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_orders"), dec_sum(F.col("o_totalprice"), 2).alias("revenue"))
    )


@query(
    "q_join_outer",
    oracle="""
SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
       coalesce(cn.n_cust, 0)               AS n_cust,
       coalesce(sn.n_supp, 0)               AS n_supp
FROM (SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY c_nationkey) cn
FULL OUTER JOIN
     (SELECT s_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_supp
      FROM supplier GROUP BY s_nationkey) sn
ON cn.nationkey = sn.nationkey
""",
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: full outer join of two pre-aggregated sides (left/right are
    the same primitive with one side's nulls). Pre-aggregating before
    the join is the scale move: the join input is |keys|, not |rows|."""
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    j = cn.join(sn, "nationkey", "full_outer")
    return j.select(
        "nationkey",
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "q_join_semi_anti",
    oracle="""
SELECT c_custkey, c_name, 'has_orders' AS tag
FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, c_name, 'no_orders' AS tag
FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-semi (EXISTS) and left-anti (NOT EXISTS) — neither
    duplicates nor widens the left side, so they're the cheap way to
    express filtering joins at scale (no fanout, right side reduced to
    its distinct keys)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", F.lit("has_orders").alias("tag"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", F.lit("no_orders").alias("tag"))
    )
    return semi.unionByName(anti)


@query(
    "q_join_broadcast",
    oracle=f"""
SELECT p_brand,
       CAST(count(*) AS BIGINT)                                  AS n_items,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)}    AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type IN ('ECONOMY', 'PROMO')
GROUP BY p_brand
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: explicit broadcast of the filtered dimension — the fact side
    never shuffles; the filter on part is applied before broadcast so
    only matching part rows ship to executors. This is the canonical
    100 TB star-join shape."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type").isin("ECONOMY", "PROMO"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )


@query(
    "q_join_range",
    oracle=f"""
SELECT b.bucket_id,
       CAST(count(*) AS BIGINT)          AS n_parts,
       {dec_avg_sql('p_retailprice', 2)} AS avg_price
FROM part p
JOIN (SELECT CAST(i AS BIGINT) AS bucket_id,
             CAST(i * 200 AS DOUBLE) AS lo,
             CAST((i + 1) * 200 AS DOUBLE) AS hi
      FROM range(10) t(i)) b
  ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.bucket_id
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: non-equi (range) theta join. The bucket side is 10 rows →
    Spark plans BroadcastNestedLoopJoin: each part row scans 10
    buckets, O(n·b) with no shuffle of the big side. (For
    big×big range joins the scale pattern is bucketize-the-range-key +
    equi-join on bucket + residual filter — documented here as the
    growth path.)"""
    p = load(spark, sf_dir, "part")
    buckets = spark.range(10).select(
        F.col("id").alias("bucket_id"),
        (F.col("id") * 200).cast("double").alias("lo"),
        ((F.col("id") + 1) * 200).cast("double").alias("hi"),
    )
    return (
        p.join(
            F.broadcast(buckets),
            (p.p_retailprice >= buckets.lo) & (p.p_retailprice < buckets.hi),
        )
        .groupBy("bucket_id")
        .agg(
            F.count("*").alias("n_parts"),
            dec_avg(F.col("p_retailprice"), 2).alias("avg_price"),
        )
    )


@query(
    "q_join_cross",
    oracle="""
SELECT r_name, n_name
FROM region CROSS JOIN nation
""",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: cross join, dim×dim only (5×25). Explicit crossJoin so the
    intent is visible; anything non-dim-sized belongs behind a
    blocking/bucketing scheme instead (see llm.dedup)."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "q_join_range_binned",
    oracle="""
SELECT o.o_orderkey,
       CAST(count(l.l_orderkey) AS BIGINT) AS n_shipped
FROM orders o
LEFT JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <  o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey
""",
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 scale path: big x big point-in-interval join WITHOUT a
    nested loop — the growth path q_join_range's docstring promises.
    Per order, count lineitems (any order's) shipped within 7 days of
    its order date: ~250M matched (order, lineitem) pairs at sf0.1,
    both sides growing with SF, so BroadcastNestedLoopJoin /
    CartesianProduct are off the table at 100 TB.

    Two stacked techniques:

    1. Aggregate pushdown below the join. The residual predicate only
       reads the point's DAY (interval endpoints are midnight, so
       point >= start iff day(point) >= day(start)), so points are
       pre-aggregated to (day, n) — O(distinct days) rows, ~2.5k here
       — BEFORE the join, and the final count is sum(n). The join
       input shrinks from O(points) to O(days), and the 250M-pair
       stream never materializes (it did in the first cut of this
       query: 84s at sf0.1; this form runs in 1.3s). Only valid for
       aggregates; pair-level output is irreducibly O(matches).

    2. Binning makes the join equi. Bin = day DIV 7; an interval of
       width 7 days spans at most 2 bins, so each interval explodes to
       <= 2 (bin, interval) rows and the join is EQUI on bin + the
       residual day filter — a plain shuffled/broadcast hash join,
       never a nested loop. Bin width should track interval width
       (wider intervals -> ceil(w/bin)+1 exploded rows).

    No re-join for unmatched intervals: the daily side is LEFT-joined
    to the exploded intervals and residual failures contribute 0
    inside the aggregation, so every order survives to the output
    through its own exploded rows — the first cut's final
    orders x counts join (a 1.5M x 1.5M sort-merge at sf~1, plus a
    second orders scan) disappears from the plan entirely."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_shipdate")
    return binned_interval_counts(o, li)


def _bin_of(day_col):
    """FLOOR-division bin id. A plain ``(day / 7).cast("long")``
    truncates toward zero, which differs from floor for negative day
    numbers (pre-1970 dates): day −3 would land in bin 0 next to day
    +3, and the 2-bin interval cover silently drops matches. floor()
    keeps the bin lattice uniform across the epoch."""
    return F.floor(day_col / 7).cast("long")


def binned_interval_counts(o: DataFrame, li: DataFrame) -> DataFrame:
    """Core of q_join_range_binned over (o_orderkey, o_orderdate) ×
    (l_shipdate) — split out so the bin arithmetic is unit-testable on
    synthetic date ranges (incl. pre-1970 negative day numbers)."""
    day = lambda c: F.datediff(F.col(c), F.lit("1970-01-01"))  # noqa: E731
    daily = (
        li.select(day("l_shipdate").alias("_day"))
        .groupBy("_day")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_bin", _bin_of(F.col("_day")))
    )
    start = day("o_orderdate")
    intervals = o.select(
        "o_orderkey",
        start.alias("_start"),
        F.explode(
            F.array_distinct(F.array(_bin_of(start), _bin_of(start + 6)))
        ).alias("_bin"),
    )
    residual = (F.col("_day") >= F.col("_start")) & (
        F.col("_day") < F.col("_start") + 7
    )
    contrib = intervals.join(daily, on="_bin", how="left").select(
        "o_orderkey", F.when(residual, F.col("_n")).otherwise(0).alias("_c")
    )
    return contrib.groupBy("o_orderkey").agg(
        F.sum("_c").cast("long").alias("n_shipped")
    )


@query(
    "q_join_skew_salted",
    oracle=f"""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT)         AS n_orders,
       {dec_sum_sql('o_totalprice', 2)} AS sum_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 skew path: salted equi join — the manual pattern for a hot
    join key when the dim side is too big to broadcast and AQE's
    skew-split (which works on partition granularity) can't break up a
    single monster key. Companion to q_agg_salted, which covers agg
    skew.

    Fact side gets salt = pmod(o_orderkey, 8) — derived from a
    high-cardinality column so a hot o_custkey spreads over 8 reducers.
    Dim side is replicated 8x (explode over the salt range), so every
    (custkey, salt) fact partition finds its dim row locally. Join
    keys become (custkey, salt): identical result set to the plain
    join (the oracle IS the plain join), 8x dim replication cost,
    straggler reducer split 8 ways. shuffle_hash hint pins the
    shuffled-join shape the pattern exists for (the fixture dim would
    otherwise auto-broadcast, where salting is pointless)."""
    salt_n = 8
    o = load(spark, sf_dir, "orders").withColumn(
        "_salt", F.pmod(F.col("o_orderkey"), F.lit(salt_n)).cast("int")
    )
    c = load(spark, sf_dir, "customer").withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    joined = o.hint("shuffle_hash").join(
        c, (o.o_custkey == c.c_custkey) & (o._salt == c._salt)
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Interval × interval overlap join (bin decomposition)
# ---------------------------------------------------------------------------

IVL_LEN_S = 3600  # both sides carry 1-hour activity intervals
IVL_TYPE_A, IVL_TYPE_B = "click", "purchase"


@query(
    "q_join_interval_overlap",
    oracle=f"""
WITH a AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ta FROM events
  WHERE event_type = '{IVL_TYPE_A}'
),
b AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS tb FROM events
  WHERE event_type = '{IVL_TYPE_B}'
)
SELECT greatest(ta, tb) // {IVL_LEN_S} AS hour_bin,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM a JOIN b ON ta < tb + {IVL_LEN_S} AND tb < ta + {IVL_LEN_S}
GROUP BY hour_bin
""",
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5'': interval × interval OVERLAP join — the shape q_join_range
    (point-in-interval) cannot express: both sides are intervals
    ([event, event + 1h) activity windows for '{IVL_TYPE_A}' and
    '{IVL_TYPE_B}' events) and a pair matches when the intervals
    intersect. Temporal co-occurrence counting — ad attribution,
    incident correlation, session overlap — aggregated per hour bin of
    the later interval's start.

    Scale technique (big × big, no nested loop): BIN DECOMPOSITION.
    Each interval is exploded to the W-width bins it covers (W = the
    interval length, so ≤ 2 bins per interval — the explode is a
    bounded constant factor), the join is a plain hash EQUI join on
    the bin, the true overlap predicate runs as the residual filter,
    and double-counting (a pair whose intervals share two bins) is
    eliminated WITHOUT a distinct: a pair is counted only in the bin
    containing max(start_a, start_b) — both intervals provably cover
    that bin, and exactly one bin satisfies the rule, so the dedup is
    a free filter instead of a shuffle. The oracle states the naive
    quadratic form; the Spark plan is the production one (the same
    equi-bin + residual discipline as q_join_range_binned, extended to
    interval pairs).

    Epoch discipline: floor-to-second epochs on both engines
    (q_sessionize's convention); every bin/overlap comparison is then
    pure BIGINT arithmetic."""
    ev = load(spark, sf_dir, "events")
    es = F.floor(F.unix_timestamp("ts")).cast("long")

    def side(tname: str, col: str) -> DataFrame:
        t = ev.filter(F.col("event_type") == tname).select(es.alias(col))
        return t.select(
            col,
            F.explode(
                F.expr(
                    f"sequence({col} DIV {IVL_LEN_S},"
                    f" ({col} + {IVL_LEN_S} - 1) DIV {IVL_LEN_S})"
                )
            ).alias("bin"),
        )

    a = side(IVL_TYPE_A, "ta")
    b = side(IVL_TYPE_B, "tb")
    return (
        a.join(b, "bin")
        .filter(
            (F.col("ta") < F.col("tb") + IVL_LEN_S)
            & (F.col("tb") < F.col("ta") + IVL_LEN_S)
            & F.expr(f"bin = greatest(ta, tb) DIV {IVL_LEN_S}")
        )
        .groupBy(F.col("bin").alias("hour_bin"))
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


@query(
    "q_join_null_aware",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders
WHERE o_custkey NOT IN (
  SELECT NULLIF(user_id, -1) FROM events WHERE event_type = 'purchase'
)
""",
)
def q_join_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULLABLE subquery column — the join flavor naive
    anti joins get WRONG: under SQL three-valued logic one NULL in the
    subquery makes every NOT IN row UNKNOWN (empty result), so the
    planner cannot rewrite to a plain left-anti. Spark plans this as a
    null-aware anti join (BroadcastHashJoin ... NAAJ) — a genuinely
    distinct physical operator this query pins (tests/test_plans.py
    asserts NAAJ appears; a plain LeftAnti would silently change
    semantics the day a NULL lands in the subquery).

    Expressed through the SQL surface because NOT IN's null semantics
    ARE the point — the DataFrame twin (isin + ~) collapses to the
    null-naive form. Revenue in exact integer cents (dec_sum_long
    discipline).

    Shape: the subquery side (distinct purchase user ids) is tiny and
    broadcast; the fact side streams through the NAAJ probe with no
    shuffle. At 100 TB this is one broadcast + one scan."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("naaj_orders")
    load(spark, sf_dir, "events").createOrReplaceTempView("naaj_events")
    return spark.sql(
        """
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM naaj_orders
WHERE o_custkey NOT IN (
  SELECT NULLIF(user_id, -1) FROM naaj_events WHERE event_type = 'purchase'
)
"""
    )
