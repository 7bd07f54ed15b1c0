"""Scalar function families (SURVEY §2.8) — one declared query per
family, each a wide projection of built-ins over a dimension table.

Oracle-parity notes baked into the expressions:
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all semantics;
- DuckDB year()/month()/day() return BIGINT → cast to INT in SQL;
- ceil/floor: Spark returns BIGINT, DuckDB DOUBLE → cast;
- timestamp→epoch-seconds: Spark cast-to-long truncates; DuckDB
  floor(epoch()) matches for post-1970 values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load


@query(
    "q_str_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name)                                   AS name_u,
       lower(p_brand)                                  AS brand_l,
       substr(p_type, 1, 4)                            AS type4,
       CAST(length(p_name) AS INTEGER)                 AS name_len,
       trim(concat('  ', p_name, '  '))                AS name_trim,
       CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
       regexp_extract(p_brand, '([0-9]+)', 1)          AS brand_num,
       regexp_replace(p_name, '[aeiou]', '', 'g')      AS name_novowel,
       CAST(strpos(p_name, 'o') AS INTEGER)            AS first_o,
       concat_ws('|', p_brand, p_type)                 AS brand_type
FROM part
""",
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/substring/length/trim/split/regexp_*/
    instr/concat_ws — all codegen'd JVM expressions."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_u"),
        F.lower("p_brand").alias("brand_l"),
        F.substring("p_type", 1, 4).alias("type4"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.instr("p_name", "o").alias("first_o"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER)               AS o_year,
       CAST(month(o_orderdate) AS INTEGER)              AS o_month,
       CAST(day(o_orderdate) AS INTEGER)                AS o_day,
       CAST(date_trunc('month', o_orderdate) AS DATE)   AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
                                                        AS days_to_2002,
       CAST(floor(epoch(o_orderdate)) AS BIGINT)        AS unix_s,
       CAST(o_orderdate AS DATE) + 30                   AS plus_30d
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: year/month/day/date_trunc/datediff/epoch/
    date_add. Session timezone is pinned UTC so these are
    host-independent and oracle-identical."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.col("o_orderdate").cast("timestamp").cast("long").alias("unix_s"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("plus_30d"),
    )


@query(
    "q_math_funcs",
    oracle="""
SELECT c_custkey,
       round(abs(c_acctbal), 2)                         AS abal,
       CAST(ceil(c_acctbal) AS BIGINT)                  AS bal_ceil,
       CAST(floor(c_acctbal) AS BIGINT)                 AS bal_floor,
       round(sqrt(abs(c_acctbal)), 6)                   AS bal_sqrt,
       round(pow(c_acctbal / 1000, 2), 6)               AS bal_pow2,
       CAST(((c_custkey % 7) + 7) % 7 AS BIGINT)        AS key_mod7,
       round(ln(abs(c_acctbal) + 1), 6)                 AS bal_ln,
       CAST(sign(c_acctbal) AS DOUBLE)                  AS bal_sign
FROM customer
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/abs/ceil/floor/sqrt/pow/pmod/ln/sign."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.round(F.abs("c_acctbal"), 2).alias("abal"),
        F.ceil("c_acctbal").alias("bal_ceil"),
        F.floor("c_acctbal").alias("bal_floor"),
        F.round(F.sqrt(F.abs("c_acctbal")), 6).alias("bal_sqrt"),
        F.round(F.pow(F.col("c_acctbal") / 1000, 2), 6).alias("bal_pow2"),
        F.pmod("c_custkey", F.lit(7)).cast("long").alias("key_mod7"),
        F.round(F.log(F.abs("c_acctbal") + 1), 6).alias("bal_ln"),
        F.signum("c_acctbal").alias("bal_sign"),
    )


@query(
    "q_cond_funcs",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END                             AS tier,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       round(greatest(c_acctbal, 0.0), 2)               AS bal_pos,
       round(least(c_acctbal, 1000.0), 2)               AS bal_capped
FROM customer
""",
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: when/otherwise (CASE), coalesce, nullif,
    greatest, least."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("bal_pos"),
        F.round(F.least("c_acctbal", F.lit(1000.0)), 2).alias("bal_capped"),
    )


@query(
    "q_json_funcs",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')                  AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       (json_extract_string(props, '$.k') IS NOT NULL)    AS has_k
FROM events
""",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props: get_json_object + from_json →
    typed map access. At scale prefer parsing once with from_json into
    a typed column over repeated get_json_object calls."""
    ev = load(spark, sf_dir, "events")
    kmap = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        kmap.getItem("k").alias("k_int"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
    )


@query(
    "q_json_variant",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS k_sum
FROM events
GROUP BY 1
""",
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the open VARIANT type (Spark 4):
    parse the JSON props column ONCE into a binary variant value, then
    extract typed fields with variant_get — the modern replacement for
    repeated get_json_object string re-parsing (q_json_funcs holds the
    classic form). At 100 TB the difference is material: VARIANT
    parses each row once into a compact binary encoding and every
    extraction is a cheap path lookup, where N get_json_object calls
    re-parse the string N times. Aggregating by a derived bucket
    proves the extracted value is a real typed column (groupable,
    summable) rather than a string."""
    ev = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k_val"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.sum("k_val").cast("long").alias("k_sum"))
    )
