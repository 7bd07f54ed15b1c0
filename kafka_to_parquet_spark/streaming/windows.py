"""Event-time window aggregations (T3/T4) in their batch-equivalent
form over ``events`` — the same ``window()`` / ``session_window()``
expressions drop into a readStream plan unchanged (stateful.py runs
exactly that), which is why these are oracle-checkable here.

Window starts are emitted as epoch seconds (BIGINT) rather than
timestamps so the comparison is precision-independent. Spark aligns
tumbling/sliding windows to the 1970 epoch; the oracles reproduce that
with floor(epoch/width)*width arithmetic.
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

TUMBLE_S = 600
SLIDE_S = 300
SESSION_GAP_S = 300


@query(
    "q_stream_tumbling",
    oracle=f"""
SELECT CAST(floor(epoch(ts) / {TUMBLE_S}) * {TUMBLE_S} AS BIGINT) AS win_start_s,
       event_type,
       CAST(count(*) AS BIGINT)    AS n,
       {dec_sum_sql('"value"', 2)} AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3a: tumbling 10-minute event-time window + key. In streaming
    this is the canonical watermarked agg; state per (window, key) and
    windows close as the watermark passes — bounded state at any
    scale."""
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", f"{TUMBLE_S} seconds")
    return (
        ev.groupBy(win, "event_type")
        .agg(F.count("*").alias("n"), dec_sum(F.col("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").cast("long").alias("win_start_s"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle=f"""
SELECT CAST((floor(epoch(ts) / {SLIDE_S}) - k) * {SLIDE_S} AS BIGINT) AS win_start_s,
       CAST(count(*) AS BIGINT)    AS n,
       {dec_avg_sql('"value"', 2)} AS avg_value
FROM events CROSS JOIN range({TUMBLE_S // SLIDE_S}) r(k)
GROUP BY 1
""",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3b: sliding window (10 min width, 5 min slide) — each event
    lands in width/slide = 2 windows; Spark expands exactly like the
    oracle's cross join with the slide-offset range."""
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", f"{TUMBLE_S} seconds", f"{SLIDE_S} seconds")
    return (
        ev.groupBy(win)
        .agg(F.count("*").alias("n"), dec_avg(F.col("value"), 2).alias("avg_value"))
        .select(F.col("window.start").cast("long").alias("win_start_s"), "n", "avg_value")
    )


@query(
    "q_stream_session",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, "value",
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   >= {SESSION_GAP_S}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
islands AS (
  SELECT user_id, ts, "value",
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM ordered
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
       CAST(count(*) AS BIGINT)              AS n_events,
       {dec_sum_sql('"value"', 2)}           AS sum_value
FROM islands
GROUP BY user_id, sess_id
""",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: session window (5-minute gap) per user via Spark's native
    session_window — sessions merge while consecutive events are
    < gap apart; a session spans [first_ts, last_ts + gap). The oracle
    reproduces the semantics with the classic gaps-and-islands
    formulation (lag + running sum of session starts)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", f"{SESSION_GAP_S} seconds"), "user_id")
        .agg(F.count("*").alias("n_events"), dec_sum(F.col("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").cast("long").alias("session_start_s"),
            "n_events",
            "sum_value",
        )
    )
