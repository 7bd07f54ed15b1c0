"""Inferential statistics over event/document facts: Welch's t,
per-group OLS trend, mutual information, and PSI drift.

These extend the reference's aggregate tier (SURVEY §2 A1-A4; the
reference itself computes only count batches, main.rs:256-267) with
the hypothesis-test / drift-monitor kit a production data platform
runs next to its pipelines. Discipline is the one proven by
q_chi2_independence / q_ts_autocorr: collapse the fact table to exact
BIGINT moments or bounded histograms map-side, apply the closed-form
statistic as ONE mirrored double expression per cell (IEEE ops on
identical inputs in identical order are bit-identical across engines),
and round each cell to integer micros BEFORE any cross-cell sum — so
no float ever crosses an engine-ordering boundary and the DuckDB
oracle matches bit-for-bit.

Scale shape shared by all four: the only pass over the fact table is
one map-side-combinable aggregation to a result bounded by category
cardinality or value range (never by N); windows and reduces run over
those bounded rows. At 100 TB each query is one shuffle of partial
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load

TT_A, TT_B = "click", "purchase"

# Mirrored double expressions (identical text on both engines).
# Inputs are exact BIGINTs; CAST(... AS DOUBLE) forces the float path
# explicitly — `* 1.0` would be a DECIMAL literal in Spark SQL and
# push the whole expression through decimal arithmetic with different
# scale/rounding rules than DuckDB's double path (bit-divergence that
# only shows up once the moments are large enough, sf0.1 here).
_VAR_A = "((ssa - CAST(sa AS DOUBLE) * sa / na) / (na - 1)) / na"
_VAR_B = "((ssb - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1)) / nb"
_T_EXPR = (
    "CAST(round(1000000 * ((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) "
    "/ sqrt(va + vb))) AS BIGINT)"
)
_DF_EXPR = (
    "CAST(round(1000000 * ((va + vb) * (va + vb) "
    "/ (va * va / (na - 1) + vb * vb / (nb - 1)))) AS BIGINT)"
)


@query(
    "q_welch_ttest",
    oracle=f"""
WITH m AS (
  SELECT
    CAST(sum(CASE WHEN event_type = '{TT_A}' THEN 1 ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN event_type = '{TT_B}' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
    CAST(sum(CASE WHEN event_type = '{TT_A}' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sa,
    CAST(sum(CASE WHEN event_type = '{TT_B}' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sb,
    CAST(sum(CASE WHEN event_type = '{TT_A}' THEN CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS ssa,
    CAST(sum(CASE WHEN event_type = '{TT_B}' THEN CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS ssb
  FROM events WHERE event_type IN ('{TT_A}', '{TT_B}')
),
v AS (SELECT na, nb, sa, sb, {_VAR_A} AS va, {_VAR_B} AS vb FROM m)
SELECT na, nb, {_T_EXPR} AS t_micro, {_DF_EXPR} AS df_micro FROM v
""",
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the '{TT_A}' and
    '{TT_B}' value samples — the workhorse two-sample mean test of A/B
    experimentation, reported with its Welch–Satterthwaite degrees of
    freedom. Completes the two-sample kit next to q_ks_test (shape
    shift) and q_mann_whitney (stochastic order): t answers "did the
    MEAN move, scaled by its standard error".

    Engine stability: values quantize to exact integer cents, the six
    moments (n, Σx, Σx² per sample) are exact BIGINT sums (every
    partial < 2^53), and t and df are each ONE mirrored double
    expression over those integers (module-level constants shared
    verbatim with the oracle text), rounded to integer micros.

    Shape: a single conditional aggregation collapses the fact to one
    six-column row — map-side combinable, one shuffle of one partial
    row per task; the statistic is driver-free arithmetic on that row.
    At 100 TB this is the cheapest possible plan: one pass, one row."""
    cents = "CAST(round(value * 100) AS BIGINT)"
    ev = load(spark, sf_dir, "events").filter(F.col("event_type").isin(TT_A, TT_B))
    m = ev.agg(
        F.expr(f"CAST(sum(CASE WHEN event_type = '{TT_A}' THEN 1 ELSE 0 END) AS BIGINT)").alias("na"),
        F.expr(f"CAST(sum(CASE WHEN event_type = '{TT_B}' THEN 1 ELSE 0 END) AS BIGINT)").alias("nb"),
        F.expr(f"CAST(sum(CASE WHEN event_type = '{TT_A}' THEN {cents} ELSE 0 END) AS BIGINT)").alias("sa"),
        F.expr(f"CAST(sum(CASE WHEN event_type = '{TT_B}' THEN {cents} ELSE 0 END) AS BIGINT)").alias("sb"),
        F.expr(f"CAST(sum(CASE WHEN event_type = '{TT_A}' THEN {cents} * {cents} ELSE 0 END) AS BIGINT)").alias("ssa"),
        F.expr(f"CAST(sum(CASE WHEN event_type = '{TT_B}' THEN {cents} * {cents} ELSE 0 END) AS BIGINT)").alias("ssb"),
    )
    v = m.select(
        "na", "nb", "sa", "sb",
        F.expr(_VAR_A).alias("va"),
        F.expr(_VAR_B).alias("vb"),
    )
    return v.select(
        "na", "nb",
        F.expr(_T_EXPR).alias("t_micro"),
        F.expr(_DF_EXPR).alias("df_micro"),
    )


_SLOPE = "CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)"
_OLS_SLOPE = f"CAST(round(1000000 * ({_SLOPE})) AS BIGINT)"
# Intercept as an exact integer rational: (sy·D − Nm·sx) / (n·D) with
# Nm = n·sxy − sx·sy, D = n·sxx − sx². The naive m̄y − slope·m̄x form is
# `a − b·c` in doubles, which one engine may contract to an FMA and the
# other not — a 1-ulp divergence that flipped the micro rounding on two
# groups at sf0.01. Integer numerator/denominator have no fusable shape.
_OLS_ICEPT = (
    "CAST(round(CAST(sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx "
    "AS DOUBLE) * 1000000 / (n * (n * sxx - sx * sx))) AS BIGINT)"
)
_OLS_R2 = (
    "CAST(round(1000000 * (CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy) "
    "/ (CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)))) AS BIGINT)"
)


@query(
    "q_ols_trend",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) // 100 AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM daily GROUP BY event_type
)
SELECT event_type, n, {_OLS_SLOPE} AS slope_micro, {_OLS_ICEPT} AS icept_micro,
       {_OLS_R2} AS r2_micro
FROM m
""",
)
def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ordinary-least-squares trend of daily revenue
    (whole dollars) on the epoch-day index: slope, intercept, and R²
    — the "is this metric drifting, and how fast" regression every
    metrics warehouse materializes (DuckDB ships it as regr_slope/
    regr_r2; Spark-side we compute the same closed forms from exact
    moments instead of the engines' streaming double accumulators,
    whose partial-order nondeterminism no rounding grid survives).

    Integer discipline: x is the exact epoch-day BIGINT, y the daily
    revenue summed in exact cents then floored to whole dollars
    (keeping Σy² comfortably inside BIGINT through the 10× stress sf),
    the five regression moments are exact BIGINT sums per group, and
    slope/intercept/R² are mirrored double expressions rounded to
    micros. R² casts to DOUBLE before squaring so no intermediate
    integer product can overflow.

    Shape: fact → (type, day) partial aggregate (map-side combinable,
    bounded by |types|·|days|), then a tiny second aggregate per type.
    The daily rollup is the only pass over the corpus."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.expr(
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) DIV 100"
        ).alias("y")
    ).select(
        "event_type",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        "y",
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return m.select(
        "event_type", "n",
        F.expr(_OLS_SLOPE).alias("slope_micro"),
        F.expr(_OLS_ICEPT).alias("icept_micro"),
        F.expr(_OLS_R2).alias("r2_micro"),
    )


_MI_TERM = (
    "CAST(round(1000000 * ((CAST(c AS DOUBLE) / n) "
    "* ln((CAST(c AS DOUBLE) * n) / (CAST(cl AS DOUBLE) * cs)))) AS BIGINT)"
)


@query(
    "q_mutual_information",
    oracle=f"""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, source
),
marg AS (
  SELECT c,
         CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS cl,
         CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS cs,
         CAST(sum(c) OVER () AS BIGINT) AS n
  FROM cells
)
SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum({_MI_TERM}) AS BIGINT) AS mi_micro
FROM marg
""",
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) over the document corpus in
    integer micro-nats — the dependence measure that complements
    q_chi2_independence: chi² answers "is there dependence at all",
    MI answers "how many bits/nats does knowing the source tell you
    about the language" (feature selection, leakage detection between
    supposedly independent metadata columns).

    Engine stability: every per-cell term is computed from four exact
    BIGINTs (cell, two marginals, total) as one mirrored double
    expression and rounded to integer micro-nats BEFORE the cross-cell
    sum — cross-cell summation order (which hash-agg order makes
    engine-specific) then operates on integers, where order cannot
    matter. ln on identical doubles is identical on both engines
    (IEEE, same libm contract for the dynamic range here).

    Shape: the corpus collapses map-side to |lang|×|source| cells
    (≤100 rows); marginals are window sums over those cells, and the
    statistic is one reduce. One shuffle of bounded partials at any
    scale."""
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("c"))
    )
    marg = cells.select(
        "c",
        F.sum("c").over(Window.partitionBy("lang")).cast("long").alias("cl"),
        F.sum("c").over(Window.partitionBy("source")).cast("long").alias("cs"),
        F.sum("c").over(Window.partitionBy()).cast("long").alias("n"),
    )
    return marg.agg(
        F.max("n").alias("n"),
        F.count("*").cast("long").alias("n_cells"),
        F.sum(F.expr(_MI_TERM)).cast("long").alias("mi_micro"),
    )


PSI_BUCKET = 50  # n_chars bucket width; range ≤ ~600 chars ⇒ ≤ 13 buckets

_PSI_P = "CAST(ca + 1 AS DOUBLE) / (na + b)"
_PSI_Q = "CAST(cb + 1 AS DOUBLE) / (nb + b)"
_PSI_TERM = (
    f"CAST(round(1000000 * (({_PSI_P} - {_PSI_Q}) * ln(({_PSI_P}) / ({_PSI_Q})))) "
    "AS BIGINT)"
)


@query(
    "q_psi_drift",
    oracle=f"""
WITH buckets AS (
  SELECT CAST(n_chars // {PSI_BUCKET} AS BIGINT) AS bucket,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM documents GROUP BY bucket
),
tot AS (
  SELECT bucket, ca, cb,
         CAST(sum(ca) OVER () AS BIGINT) AS na,
         CAST(sum(cb) OVER () AS BIGINT) AS nb,
         CAST(count(*) OVER () AS BIGINT) AS b
  FROM buckets
)
SELECT max(na) AS na, max(nb) AS nb, max(b) AS n_buckets,
       CAST(sum({_PSI_TERM}) AS BIGINT) AS psi_micro
FROM tot
""",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the English and non-English
    document-length distributions, in integer micro-nats — THE
    standard drift metric of model monitoring (PSI < 0.1 stable,
    > 0.25 drifted). Laplace-smoothed (+1 per observed bucket) so
    empty-on-one-side buckets contribute a finite term instead of ∞,
    which is the production form.

    Engine stability: bucket counts, totals, and the bucket count B
    are exact BIGINTs; each bucket's (p−q)·ln(p/q) is one mirrored
    double expression over them, rounded to micro-nats before the
    bucket sum (the q_mutual_information discipline — integers commute
    across engine-specific aggregation orders, doubles don't).

    Shape: the corpus collapses map-side to ≤(range/{PSI_BUCKET})
    buckets — bounded by the VALUE RANGE, not N (the q_ks_test
    histogram argument); window totals and the final reduce run over
    those bucket rows only."""
    docs = load(spark, sf_dir, "documents")
    buckets = docs.groupBy(
        (F.col("n_chars") / PSI_BUCKET).cast("long").alias("bucket")
    ).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).cast("long").alias("cb"),
    )
    w = Window.partitionBy()
    tot = buckets.select(
        "bucket", "ca", "cb",
        F.sum("ca").over(w).cast("long").alias("na"),
        F.sum("cb").over(w).cast("long").alias("nb"),
        F.count("*").over(w).cast("long").alias("b"),
    )
    return tot.agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max("b").alias("n_buckets"),
        F.sum(F.expr(_PSI_TERM)).cast("long").alias("psi_micro"),
    )
