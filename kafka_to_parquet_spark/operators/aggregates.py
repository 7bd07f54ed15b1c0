"""Aggregations (SURVEY §2.4, all (E) — the reference's only
"aggregation" is its physical count-batcher, S4).

Every group-by here compiles to partial (map-side) + final hash
aggregation — the shuffle carries one row per (partition, group), not
per input row, which is what makes these viable at 100 TB. Float
outputs are rounded in-query (identically in the oracle SQL) so the
comparison is stable under summation-order differences.
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

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


@query(
    "q_agg_groupby",
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_quantity), 2)            AS sum_qty,
       {dec_sum_sql('l_extendedprice', 2)}  AS sum_base_price,
       {dec_sum_sql(_DISC_PRICE, 4)}        AS sum_disc_price,
       {dec_sum_sql(_CHARGE, 4)}            AS sum_charge,
       sum(l_quantity) / count(*)           AS avg_qty,
       {dec_avg_sql('l_extendedprice', 2)}  AS avg_price,
       {dec_avg_sql('l_discount', 2)}       AS avg_disc,
       CAST(count(*) AS BIGINT)             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 / flagship (TPC-H Q1 shape): scan → pushed filter → 8-agg
    hash group-by on two low-cardinality keys. The full batch
    lifecycle in one plan; the filter and the 7-column projection reach
    the parquet scan (PushedFilters/ReadSchema). Money aggregates use
    the integer-scaled engine-stable forms (functions.rounding)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            dec_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dec_sum(disc_price, 4).alias("sum_disc_price"),
            dec_sum(charge, 4).alias("sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            dec_avg(F.col("l_extendedprice"), 2).alias("avg_price"),
            dec_avg(F.col("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT)  AS n_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT)  AS n_supps,
       CAST(count(*) AS BIGINT)                   AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2a: exact count-distinct — Catalyst plans expand + two-phase
    agg. Exact distinct shuffles every (group, value) pair once; for
    100 TB cardinality estimation use the approx variant below."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@query("q_agg_approx_distinct")  # rows-only: HLL sketch values differ per engine
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2b: approximate count-distinct (HyperLogLog++, rsd 5%).
    Constant state per group regardless of cardinality — the 100 TB
    answer to distinct counting. No oracle: DuckDB's approx sketch
    yields different estimates by construction; a unit test bounds the
    error vs the exact count instead."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.05).alias("n_parts_approx"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_rollup",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_quantity), 2)  AS sum_qty,
       CAST(count(*) AS BIGINT)   AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: rollup (hierarchical grouping sets): (flag,status), (flag),
    () — subtotal rows carry NULL keys in both engines. Planned as a
    single Expand + hash agg, one pass over the data."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_cube",
    oracle=f"""
SELECT o_orderstatus,
       o_orderpriority,
       {dec_sum_sql('o_totalprice', 2)} AS sum_price,
       CAST(count(*) AS BIGINT)         AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3b: cube — all 4 grouping sets in one Expand+agg pass."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        dec_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_global",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT)           AS n_rows,
       {dec_sum_sql('l_extendedprice', 2)} AS total_price,
       {dec_avg_sql('l_discount', 2)}      AS avg_disc,
       round(min(l_extendedprice), 2)      AS min_price,
       round(max(l_extendedprice), 2)      AS max_price,
       CAST(min(l_shipdate) AS DATE)       AS first_ship_d,
       CAST(max(l_shipdate) AS DATE)       AS last_ship_d
FROM lineitem
""",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: keyless aggregation — partial aggs reduce each partition to
    one row; the final agg sees |partitions| rows. min/max on doubles
    and timestamps are order-insensitive → exact."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dec_sum(F.col("l_extendedprice"), 2).alias("total_price"),
        dec_avg(F.col("l_discount"), 2).alias("avg_disc"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.to_date(F.min("l_shipdate")).alias("first_ship_d"),
        F.to_date(F.max("l_shipdate")).alias("last_ship_d"),
    )


@query(
    "q_agg_collect",
    oracle="""
SELECT c_mktsegment,
       array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
       CAST(count(*) AS BIGINT)                  AS n_cust
FROM customer
GROUP BY c_mktsegment
""",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: collect_set (bounded groups only — nationkey has ≤25 values,
    so per-group state is bounded; never collect unbounded columns at
    scale). sort_array makes the set order-canonical; array_join
    serializes it to a scalar so every downstream comparator (the
    driver canonicalizer hashes rows with pandas, which cannot hash
    list cells) sees a plain string column."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.sort_array(F.collect_set("c_nationkey")), ",").alias(
            "nations"
        ),
        F.count("*").alias("n_cust"),
    )


@query(
    "q_agg_pivot",
    oracle="""
SELECT l_returnflag,
       round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS qty_O,
       round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS qty_F
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: pivot with an explicit value list (no extra pass to discover
    values — required form at scale) = one hash agg with conditional
    sums."""
    li = load(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return piv.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
    )


@query(
    "q_agg_conditional",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)   AS n_high_disc,
       CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT)    AS n_bulk,
       sum(round(l_extendedprice * 100) * CAST(l_tax > 0.04 AS INTEGER)) / 100.0
         AS taxed_price,
       CAST(count(*) AS BIGINT)                                    AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — FILTER-clause style counts and a
    condition-masked money sum, all in ONE pass over the fact table
    (vs the naive multi-scan union). count_if / when-masking are the
    Spark forms; the masked sum keeps the integer-scaled exactness of
    dec_sum."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_high_disc"),
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        (
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0)
                * (F.col("l_tax") > 0.04).cast("int")
            )
            / 100.0
        ).alias("taxed_price"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_listagg",
    oracle="""
SELECT c_nationkey,
       string_agg(c_name, '|' ORDER BY c_name) AS names,
       CAST(count(*) AS BIGINT)                AS n
FROM customer
WHERE c_custkey <= 50
GROUP BY c_nationkey
""",
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg / string_agg): bounded
    groups only — the WITHIN GROUP order makes the concatenation
    deterministic, and the custkey cap keeps per-group state small
    (unbounded listagg at 100 TB is an anti-pattern; collect into
    arrays with explicit limits instead)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    return c.groupBy("c_nationkey").agg(
        F.expr("listagg(c_name, '|') WITHIN GROUP (ORDER BY c_name)").alias("names"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_unpivot",
    oracle="""
SELECT l_returnflag, metric, round(val, 2) AS val
FROM (
  SELECT l_returnflag,
         sum(round(l_quantity * 100)) / 100.0      AS total_qty,
         sum(round(l_extendedprice * 100)) / 100.0 AS total_price,
         CAST(count(*) AS DOUBLE)                  AS n_rows
  FROM lineitem GROUP BY l_returnflag
)
UNPIVOT (val FOR metric IN (total_qty, total_price, n_rows))
""",
)
def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — wide per-group metrics back to long
    (group, metric, value) form, the inverse of q_agg_pivot. Spark's
    native unpivot is a per-row expansion (no shuffle beyond the
    aggregation that feeds it)."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        (F.sum(F.round(F.col("l_quantity") * 100, 0)) / 100.0).alias("total_qty"),
        (F.sum(F.round(F.col("l_extendedprice") * 100, 0)) / 100.0).alias("total_price"),
        F.count("*").cast("double").alias("n_rows"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["total_qty", "total_price", "n_rows"],
        variableColumnName="metric",
        valueColumnName="val_raw",
    ).select("l_returnflag", "metric", F.round("val_raw", 2).alias("val"))


@query(
    "q_agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
       CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True GROUPING SETS (A3's general form): two NON-hierarchical
    sets — by returnflag alone and by linestatus alone — which neither
    rollup nor cube can express (rollup is the prefix chain, cube the
    full lattice). The grouping() indicator columns disambiguate which
    set produced each row, since NULL group keys are also how Spark
    and DuckDB render the "not in this set" columns.

    Plan: one scan feeding an Expand node (one copy per grouping set,
    here 2×) into a single hash aggregate — the same shape as rollup/
    cube; map-side partials collapse each copy to ≤ |distinct keys|
    rows before the one exchange. Expressed through spark.sql on a
    registered view: grouping sets are a SQL-surface feature with no
    DataFrame-API equivalent, and the engine's SQL entry point is part
    of the declared surface."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("li_grouping_sets")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               count(*) AS n
        FROM li_grouping_sets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query("q_agg_approx_quantile")  # rows-only: KLL/GK sketch internals differ per engine
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2c: approximate percentiles (Greenwald-Khanna sketch via
    percentile_approx, accuracy 1/1e4) per group — the bounded-memory
    companion to the exact q_agg_percentile. Sketch state is
    O(accuracy·log n) per group regardless of group size, and partial
    sketches merge associatively — the 100 TB answer to quantiles
    (exact percentiles need a per-group sort). No oracle: sketch
    internals are engine-specific; tests bound the rank error vs the
    exact per-group percentiles instead."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("p90_approx"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_mode",
    oracle="""
WITH c AS (
  SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag,
       CAST(min(CASE WHEN rn = 1 THEN q END) AS BIGINT)   AS mode_qty,
       CAST(min(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS mode_n
FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY cnt DESC, q) AS rn
      FROM c)
GROUP BY l_returnflag
""",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (most frequent value, smallest-value
    tiebreak) — the argmax-as-aggregate idiom: count pairs in one hash
    agg, then min(struct(-cnt, value)) collapses each group WITHOUT a
    window sort. Values are integer-rounded quantities so counts and
    ties are engine-exact.

    Shape: two hash aggregates, both map-side combinable — the second
    reduces each group's (value, count) pairs to one struct before its
    exchange (contrast the oracle's row_number formulation, which would
    shuffle every pair to sort it; Spark-side we keep the aggregate
    form — the plans differ, the value semantics are identical)."""
    li = load(spark, sf_dir, "lineitem")
    c = (
        li.select("l_returnflag", F.expr("CAST(round(l_quantity) AS BIGINT)").alias("q"))
        .groupBy("l_returnflag", "q")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        c.groupBy("l_returnflag")
        .agg(F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("q"))).alias("m"))
        .select(
            "l_returnflag",
            F.col("m.q").cast("long").alias("mode_qty"),
            (-F.col("m.neg")).cast("long").alias("mode_n"),
        )
    )
