"""Event-stream analytics over `events` — batch equivalents of the
Structured Streaming surface (SURVEY.md §2.9, §7 Phase 6).

These run the SAME aggregation logic the streaming module
(finanalyzer_spark/streaming) executes incrementally; in batch they are
oracle-checkable. The reference's incremental semantics
(update_database's today-or-yesterday lateness tolerance,
findatabase.py:217; post-hoc dedup, redundancy.sql) map to watermarks +
dropDuplicates in the streaming twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query


@query(
    "tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window", "streaming-twin"),
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (epoch-aligned, so window.start ==
    date_trunc('hour')). The streaming twin adds withWatermark."""
    t = load(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "sliding_hourly_30m",
    oracle="""
    WITH g AS (
        SELECT *, make_timestamp(((floor(epoch(ts) / 1800) * 1800) * 1000000)::BIGINT) AS s0
        FROM events
    ),
    assigned AS (
        SELECT s0 AS window_start, event_type, value FROM g
        UNION ALL
        SELECT s0 - INTERVAL 30 MINUTE, event_type, value FROM g
    )
    SELECT window_start, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM assigned
    GROUP BY 1, 2
    """,
    tags=("events", "window", "sliding"),
)
def sliding_hourly_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes — each event lands in
    exactly 2 windows (its 30-min grid cell's window and the previous)."""
    t = load(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@query(
    "session_windows",
    oracle="""
    WITH ev AS (  -- truncate ns→us to match Spark's timestamp precision
        SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    marked AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, sum(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS sid
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, sid
    """,
    tags=("events", "session", "streaming-twin"),
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via the native
    `session_window` aggregation — identical semantics to streaming's
    session_window + watermark. Oracle = gaps-and-islands SQL (session
    end is last-event + gap, Spark's end-exclusive convention)."""
    t = load(spark, sf_dir)
    return (
        t.events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "event_dedup_within_watermark",
    oracle="""
    SELECT user_id, event_type, count(*) AS n_first_events
    FROM (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id, event_type, date_trunc('day', ts)
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    )
    WHERE rn = 1
    GROUP BY user_id, event_type
    """,
    tags=("events", "dedup", "streaming-twin"),
)
def event_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type, day) — the batch twin of streaming
    dropDuplicates within a 1-day watermark (the reference's
    today-or-yesterday freshness tolerance, findatabase.py:217)."""
    t = load(spark, sf_dir)
    w = W.partitionBy(
        "user_id", "event_type", F.date_trunc("day", "ts")
    ).orderBy("ts", "event_id")
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_first_events"))
    )


# --------------------------------------------------------------------------
# ext — hypertable-style continuous-aggregate rollup: fixed time
# buckets × type with a full stat row (the materialized-rollup shape
# a timeseries store maintains incrementally; here one batch pass,
# and streaming/events.py maintains the same shape with a watermark)
# --------------------------------------------------------------------------
@query(
    "time_bucket_rollup",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "rollup", "time-bucket"),
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute hypertable rollup. At 100 TB the events table is
    date-partitioned, so the scan prunes to the rollup's refresh
    horizon and the shuffle carries one partial row per
    (mapper × bucket × type)."""
    t = load(spark, sf_dir)
    return (
        t.events.groupBy(
            F.window("ts", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "n",
            "sum_value",
            "min_value",
            "max_value",
            "n_users",
        )
    )
