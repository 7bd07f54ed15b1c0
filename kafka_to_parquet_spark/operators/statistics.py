"""Statistical aggregates: exact percentiles, histogram binning, and
correlation/covariance computed from exact integer-scaled moments.

Why not ``F.corr``/``F.covar_samp`` directly: their streaming-update
implementations accumulate doubles in partition order, so Spark and
DuckDB legitimately differ in the last ulps and no rounding grid is
safe near boundaries. Computing the five moments as integer-scaled
sums (exact in double: every partial < 2^53) and then applying the
closed-form formula in the *identical expression order* on both
engines yields bit-identical results — same trick as
functions/rounding.py, lifted to second moments. At 100 TB the moment
form is also the right plan: one partial+final aggregation, no second
pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load


@query(
    "q_agg_percentile",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5)  AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       quantile_cont(l_quantity, 0.95) AS p95,
       CAST(count(*) AS BIGINT)        AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group. l_quantity is
    integer-valued, so interpolated results are exact binary fractions
    — engine-stable without rounding. (For approximate percentiles at
    scale, ``approx_percentile`` swaps in per-group sketches; exact
    percentile needs a per-group sort, which Spark distributes by
    group.)"""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_histogram",
    oracle="""
SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(o_totalprice) >= floor(o_totalprice / 25000) * 25000 AS BOOLEAN) AS lo_ok
FROM orders
GROUP BY floor(o_totalprice / 25000)
""",
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram as fixed-width binning + hash agg — the distributed
    histogram: one shuffle of (bucket, partial_count). The floor-form
    bucket is portable to any engine (vs width_bucket, which DuckDB
    lacks)."""
    o = load(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25000).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            (F.min("o_totalprice") >= F.col("bucket") * 25000).alias("lo_ok"),
        )
    )


_MOMENTS_SQL = """
SELECT CAST(count(*) AS DOUBLE)              AS n,
       sum(round(l_quantity * 100))          AS sx,
       sum(round(l_discount * 100))          AS sy,
       sum(round(l_quantity * 100) * round(l_quantity * 100)) AS sxx,
       sum(round(l_discount * 100) * round(l_discount * 100)) AS syy,
       sum(round(l_quantity * 100) * round(l_discount * 100)) AS sxy
FROM lineitem
"""


@query(
    "q_agg_stats",
    oracle=f"""
SELECT (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_disc,
       (n * sxy - sx * sy) / (n * (n - 1)) / 10000.0                         AS covar_qty_disc,
       sqrt((n * sxx - sx * sx) / (n * (n - 1))) / 100.0                     AS stddev_qty,
       CAST(n AS BIGINT)                                                     AS n
FROM ({_MOMENTS_SQL})
""",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation, sample covariance, and sample stddev of
    (l_quantity, l_discount) from exact scaled moments. Each moment sum
    is exact (integers < 2^53); the closed-form combination is the
    same IEEE expression tree in Spark and DuckDB → bit-identical
    doubles, no rounding grid needed."""
    li = load(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100, 0)
    y = F.round(F.col("l_discount") * 100, 0)
    m = li.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        ((n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).alias(
            "corr_qty_disc"
        ),
        ((n * sxy - sx * sy) / (n * (n - 1)) / 10000.0).alias("covar_qty_disc"),
        (F.sqrt((n * sxx - sx * sx) / (n * (n - 1))) / 100.0).alias("stddev_qty"),
        n.cast("long").alias("n"),
    )


@query(
    "q_text_levenshtein",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, source, substr(text, 1, 40) AS head
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.head, b.head) AS INTEGER) AS edit_dist
FROM t a JOIN t b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 20
""",
)
def q_text_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs on 40-char prefixes inside
    (lang, source) blocking buckets — the O(len²) DP cost is bounded by
    the prefix cap and the quadratic pair count by the blocks, same
    scaling discipline as the other near-dup operators."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", "source", F.substring("text", 1, 40).alias("head"))
    a, b = t.alias("a"), t.alias("b")
    # Project the DP distance once, then filter the column (filter-first
    # would run the O(len²) DP twice per pair).
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.head"), F.col("b.head")).cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 20)
    )
