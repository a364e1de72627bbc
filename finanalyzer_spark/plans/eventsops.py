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
from ..operators.rank import ordered_scan
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


# --------------------------------------------------------------------------
# ext — semi-structured props via the Variant type (Spark 4):
# parse_json once into a binary-encoded variant, then typed paths —
# the columnar-friendly replacement for per-access string re-parsing
# (get_json_object). Oracle uses DuckDB's JSON path extraction.
# --------------------------------------------------------------------------
@query(
    "props_variant_stats",
    oracle="""
    SELECT event_type,
           round(avg(json_extract(props, '$.k')::INT), 4) AS avg_k,
           max(json_extract(props, '$.k')::INT) AS max_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "variant", "json"),
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`parse_json` → VariantType → `variant_get` typed paths: the
    payload parses ONCE per row into Variant's binary encoding, and
    every path access is a cheap binary probe (vs get_json_object's
    re-parse per access). At 100 TB of event payloads, parse cost is
    the hot path."""
    t = load(spark, sf_dir)
    v = F.parse_json("props")
    return (
        t.events.select("event_type", F.variant_get(v, "$.k", "int").alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# ext — conversion funnel (view → click → purchase, time-ordered):
# the sequential-behavior query every event store needs. Stage N
# counts users whose earliest stage-N event follows their earliest
# stage-(N-1) event.
# --------------------------------------------------------------------------
@query(
    "conversion_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
    tags=("events", "funnel"),
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each stage is one conditional-filtered aggregation joined to the
    previous stage's per-user frontier — three shuffles on user_id
    total (the per-user frontiers are tiny: one row per converted
    user). No window over the full event stream needed."""
    t = load(spark, sf_dir)
    ev = t.events
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


# --------------------------------------------------------------------------
# ext — sessionization by inactivity gap, window-composition form:
# lag → gap flag → cumulative sum assigns a session id to EVERY ROW
# (session_window aggregates; this labels), the standard construction
# --------------------------------------------------------------------------
@query(
    "sessionize_events",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, event_id,
               (sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ))::BIGINT AS session_seq
        FROM g
    )
    SELECT user_id, session_seq, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM s
    GROUP BY user_id, session_seq
    """,
    tags=("events", "sessionize", "window"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + cumulative sum over ONE (user, time) window ordering —
    Catalyst plans a single shuffle + sort reused by both window
    functions; the aggregation then groups on the assigned ids."""
    t = load(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    # microsecond precision: cast('long') truncates to whole seconds,
    # which would mis-sessionize a 1800.4s gap vs the oracle's exact
    # INTERVAL 30 MINUTE comparison. unix_micros requires TIMESTAMP
    # (rejects the parquet TIMESTAMP_NTZ); the session tz is pinned
    # to UTC (session.py) so the NTZ→LTZ cast is the identity on the
    # epoch and gap differences are exact either way.
    micros = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = micros - F.lag(micros).over(w)
    g = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap <= 30 * 60 * 1_000_000, 0).otherwise(1).alias("new_session"),
    )
    return (
        g.withColumn("session_seq", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# --------------------------------------------------------------------------
# EWMA smoothing + trailing z-score anomaly flags
# --------------------------------------------------------------------------
#: EWMA smoothing factor and lookback (finite-window normalized form)
EWMA_ALPHA = 0.3
EWMA_LOOKBACK = 8
#: trailing z-score frame length and anomaly threshold
ZSCORE_FRAME = 20
ZSCORE_CUT = 2.5

#: per-lag weights alpha*(1-alpha)^i, folded in Python so BOTH engines
#: consume the identical IEEE doubles
_EWMA_WEIGHTS = [EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** i for i in range(EWMA_LOOKBACK)]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {i}) OVER w, 0.0) * {w!r}"
        for i, w in enumerate(_EWMA_WEIGHTS)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {i}) OVER w IS NOT NULL THEN {w!r} ELSE 0.0 END)"
        for i, w in enumerate(_EWMA_WEIGHTS)
    )
    return f"""
    WITH scored AS (
        SELECT user_id, event_id, value,
               ({num}) / ({den}) AS ewma,
               avg(value) OVER wz AS mu,
               stddev_samp(value) OVER wz AS sd
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               wz AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {ZSCORE_FRAME - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           round(ewma, 6) AS ewma,
           CASE WHEN sd > 0 THEN round((value - mu) / sd, 4) END AS z,
           CASE WHEN sd > 0 THEN abs(round((value - mu) / sd, 4)) > {ZSCORE_CUT}
                ELSE FALSE END AS is_anomaly
    FROM scored
    """


@query(
    "ewma_anomaly_flags",
    oracle=_ewma_oracle(),
    tags=("events", "window", "anomaly", "timeseries"),
)
def ewma_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA smoothing and trailing z-score anomaly flags.

    The EWMA uses the finite normalized form (8 explicit lags with
    alpha*(1-alpha)^i literal weights, renormalized over the lags that
    exist near series start) — unlike the recursive definition this is
    expressible as pure window functions, and every lag shares ONE
    (user, time) sort, so Catalyst plans a single shuffle+sort for the
    EWMA, the trailing mean/stddev frame, and the flags. Weights are
    Python-folded doubles consumed verbatim by both engines; z is
    rounded before thresholding so the flag decision is identical."""
    t = load(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wz = w.rowsBetween(-(ZSCORE_FRAME - 1), W.currentRow)
    num, den = F.lit(0.0), F.lit(0.0)
    for i, wt in enumerate(_EWMA_WEIGHTS):
        lag_i = F.lag("value", i).over(w)
        num = num + F.coalesce(lag_i, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lag_i.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    mu = F.avg("value").over(wz)
    sd = F.stddev_samp("value").over(wz)
    z = F.when(sd > 0, F.round((F.col("value") - mu) / sd, 4))
    return t.events.select(
        "user_id",
        "event_id",
        F.round(num / den, 6).alias("ewma"),
        z.alias("z"),
        F.when(sd > 0, F.abs(z) > ZSCORE_CUT).otherwise(F.lit(False)).alias(
            "is_anomaly"
        ),
    )


# --------------------------------------------------------------------------
# OHLC time-bucket downsampling
# --------------------------------------------------------------------------
@query(
    "ohlc_downsample",
    oracle="""
    WITH ranked AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket_start, value,
               row_number() OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts, event_id
               ) AS rn,
               count(*) OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
               ) AS n
        FROM events
    )
    SELECT user_id, bucket_start,
           max(CASE WHEN rn = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn = n THEN value END) AS close,
           count(*) AS n_events,
           round(sum(value), 6) AS vol
    FROM ranked
    GROUP BY user_id, bucket_start
    """,
    tags=("events", "timeseries", "downsample", "ohlc"),
)
def ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the per-user event stream to hourly OHLC bars — the
    hypertable/candlestick resample every market-data store provides.
    First/last are picked by row_number against the deterministic
    (ts, event_id) order (min_by/max_by would need a composite ordering
    key the oracle engine can't express); open/high/low/close are exact
    row values so only the volume sum needs rounding. One window sort
    keyed by (user, bucket) feeds both the positional flags and the
    rollup — the aggregation groups on the window's own partition keys,
    so no second exchange at scale. Streaming twin: the same agg over a
    1-hour tumbling watermark window."""
    t = load(spark, sf_dir)
    bucket = F.date_trunc("hour", F.col("ts"))
    w = W.partitionBy("user_id", bucket).orderBy("ts", "event_id")
    wc = W.partitionBy("user_id", bucket)
    ranked = t.events.select(
        "user_id",
        bucket.alias("bucket_start"),
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    return ranked.groupBy("user_id", "bucket_start").agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("value"))).alias("close"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("vol"),
    )


# --------------------------------------------------------------------------
# cohort retention matrix
# --------------------------------------------------------------------------
@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               datediff('week', f.cohort_week, date_trunc('week', e.ts))
                   AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    ),
    cohort_size AS (
        SELECT cohort_week, count(*) AS n_users FROM firsts GROUP BY cohort_week
    )
    SELECT a.cohort_week,
           a.week_offset,
           count(*) AS n_active,
           round(count(*) * 1.0 / max(s.n_users), 6) AS retention
    FROM activity a JOIN cohort_size s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_offset
    """,
    tags=("events", "cohort", "retention", "analytics"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: cohort = a user's first active
    week (one min-aggregate), activity = distinct (user, week-offset)
    pairs against that cohort, retention = active users over cohort
    size. The firsts frame is user-cardinality (small relative to
    events) — broadcast back onto the stream; the distinct collapse
    and the matrix rollup both shuffle on the cohort keys. The
    week-offset arithmetic (datediff on week-truncated timestamps) is
    identical in both engines."""
    t = load(spark, sf_dir)
    firsts = t.events.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = (
        t.events.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.datediff(
                F.date_trunc("week", F.col("ts")), F.col("cohort_week")
            ).alias("_days"),
        )
        .select(
            "user_id", "cohort_week", (F.col("_days") / 7).cast("long").alias("week_offset")
        )
        .distinct()
    )
    cohort_size = firsts.groupBy("cohort_week").agg(F.count("*").alias("n_users"))
    return (
        activity.join(F.broadcast(cohort_size), "cohort_week")
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.count("*").alias("n_active"),
            F.round(F.count("*") * 1.0 / F.max("n_users"), 6).alias("retention"),
        )
    )


# --------------------------------------------------------------------------
# Interval overlap: sweep-line peak concurrency per event type
# --------------------------------------------------------------------------
_CONCURRENT_ORACLE = """
WITH iv AS (
    SELECT event_type, epoch_us(ts) AS s,
           epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e
    FROM events
),
pts AS (
    SELECT event_type, s AS t, 1 AS delta FROM iv
    UNION ALL
    SELECT event_type, e AS t, -1 AS delta FROM iv
),
run AS (
    SELECT event_type,
           sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                            ROWS UNBOUNDED PRECEDING) AS n_open
    FROM pts
)
SELECT event_type,
       CAST(max(n_open) AS BIGINT) AS peak_concurrent,
       CAST(count(*) / 2 AS BIGINT) AS n_events
FROM run
GROUP BY event_type
"""


@query(
    "concurrent_events_peak",
    oracle=_CONCURRENT_ORACLE,
    tags=("events", "window", "interval"),
)
def concurrent_events_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per event type via the classic
    sweep-line: each event opens an interval [ts, ts + value minutes);
    +1/-1 deltas at the endpoints, one ordered running sum, max per
    type.  (The room-occupancy / connection-pool shape — an overlap
    COUNT without an interval self-join.)

    Scale shape: the naive formulation is an O(n^2) range self-join;
    the sweep is a UNION (narrow), ONE shuffle on event_type, and a
    single sort-based window — linear in events and embarrassingly
    partitionable because concurrency never crosses the partition key.
    End events sort BEFORE starts at the same instant (delta ASC), so
    intervals are half-open and a back-to-back handoff never counts as
    an overlap; micros arithmetic with explicit floor() keeps both
    engines on identical integers.  unix_micros requires TIMESTAMP —
    the session tz is pinned UTC so the NTZ->LTZ cast is the epoch
    identity (same convention as sessionize_events)."""
    from ..operators.intervals import sweep_concurrency

    t = load(spark, sf_dir)
    micros = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    end = micros + F.floor(F.col("value") * F.lit(60_000_000)).cast("long")
    return sweep_concurrency(t.events, "event_type", micros, end)


# --------------------------------------------------------------------------
# marketing attribution: last-touch click before each purchase
# --------------------------------------------------------------------------
_ATTR_WINDOW_MIN = 7 * 24 * 60  # lookback window, minutes


@query(
    "attribution_last_touch",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    m AS (
        SELECT event_id, ts, click_ts FROM (
            SELECT p.event_id, p.ts, c.click_ts,
                   row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY c.click_ts DESC, c.click_id DESC
                   ) AS rn
            FROM p LEFT JOIN c
              ON c.user_id = p.user_id AND c.click_ts <= p.ts
        ) WHERE rn = 1
    )
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_purchases,
           CAST(sum(CASE WHEN click_ts IS NOT NULL
                AND epoch_us(ts) - epoch_us(click_ts)
                    <= {_ATTR_WINDOW_MIN * 60_000_000} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_attributed,
           round(avg(CASE WHEN click_ts IS NOT NULL
                AND epoch_us(ts) - epoch_us(click_ts)
                    <= {_ATTR_WINDOW_MIN * 60_000_000}
                THEN (epoch_us(ts) - epoch_us(click_ts)) / 60000000.0 END), 4)
               AS avg_delay_min
    FROM m
    GROUP BY 1
    """,
    tags=("events", "asof", "attribution"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the latest click
    by the same user at-or-before it, within a 7-day lookback — the
    funnels-and-campaigns sibling of sessionization, expressed as the
    BACKWARD as-of join (operators/joins.asof_join) instead of the
    oracle's O(purchases x clicks) candidate join + row_number.

    Scale shape: one union + one (user, time) window sort — identical
    to every other as-of composition; the lookback bound is a narrow
    post-filter on the matched delay (filtering inside the window
    would change state size, not the shuffle count)."""
    from ..operators.joins import asof_join

    t = load(spark, sf_dir)
    p = t.events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = t.events.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    m = asof_join(
        left=p, right=c.drop("ts").withColumnRenamed("click_ts", "ts")
        .select("user_id", "ts", "click_id", F.col("ts").alias("click_ts")),
        on="user_id",
        ts="ts",
        right_tiebreak=["click_id"],
    )
    delay_us = F.unix_micros(F.col("ts").cast("timestamp_ltz")) - F.unix_micros(
        F.col("click_ts").cast("timestamp_ltz")
    )
    in_window = F.col("click_ts").isNotNull() & (
        delay_us <= _ATTR_WINDOW_MIN * 60_000_000
    )
    return m.groupBy(
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.when(in_window, 1).otherwise(0)).alias("n_attributed"),
        F.round(
            F.avg(F.when(in_window, delay_us / 60_000_000.0)), 4
        ).alias("avg_delay_min"),
    )


# --------------------------------------------------------------------------
# session path mining: event-type transition matrix
# --------------------------------------------------------------------------
@query(
    "event_transition_matrix",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    p AS (
        SELECT event_type AS cur, next_type AS nxt, count(*) AS n
        FROM o WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (SELECT cur, sum(n) AS row_n FROM p GROUP BY cur)
    SELECT p.cur, p.nxt, p.n,
           round(p.n * 1.0 / t.row_n, 6) AS prob
    FROM p JOIN tot t USING (cur)
    """,
    tags=("events", "sequence", "markov"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next event type | current) with raw transition counts
    — the path-mining / next-action-model input, from ONE lead()
    window over the (user, time) sort plus two aggregations.

    Scale shape: the window shuffle is keyed by user (same sort every
    sessionization query reuses); the transition pairs collapse
    immediately to a |types|^2-row matrix, so the row-normalizing join
    is over a broadcast-sized frame."""
    t = load(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = t.events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    p = (
        o.where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), F.col("next_type").alias("nxt"))
        .agg(F.count("*").alias("n"))
    )
    tot = p.groupBy("cur").agg(F.sum("n").alias("row_n"))
    return p.join(F.broadcast(tot), "cur").select(
        "cur", "nxt", "n",
        F.round(F.col("n") * 1.0 / F.col("row_n"), 6).alias("prob"),
    )


# --------------------------------------------------------------------------
# robust outliers: median/MAD z-scores via distributed order statistics
# --------------------------------------------------------------------------
_MAD_CUT = 3.5
_MAD_K = 0.6745  # normal-consistency constant (Iglewicz-Hoaglin)


@query(
    "mad_outlier_flags",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(*) AS n,
           round(any_value(d.med), 6) AS median_value,
           round(any_value(x.mad), 6) AS mad_value,
           CAST(sum(CASE WHEN x.mad > 0
                AND {_MAD_K} * abs(d.value - d.med) / x.mad > {_MAD_CUT}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad x USING (event_type)
    GROUP BY d.event_type
    """,
    tags=("events", "robust-stats", "profile", "scale-path"),
)
def mad_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection with the modified z-score (Iglewicz &
    Hoaglin 1993): 0.6745·|x − median| / MAD > 3.5 — the
    mean/stddev-free anomaly gate that survives the heavy tails that
    wreck ewma_anomaly_flags'-style parametric scores.

    Scale shape: both medians come from the distributed order-statistics
    operator (operators/percentiles.grouped_exact_percentiles — range
    repartition + per-partition offsets, NO one-task-per-group holistic
    aggregate); each median table is per-group-row-sized and broadcast
    back onto the stream. Two ordered passes + one flagging scan."""
    from ..operators.percentiles import grouped_exact_percentiles

    t = load(spark, sf_dir)
    # localCheckpoint the two per-group-sized median tables: the
    # percentile operator references its input several times, so
    # NESTING one call inside the other without truncating lineage
    # re-expands the first plan combinatorially (observed: 64 scans,
    # 185 exchanges for this query — vs 4 scans checkpointed). The
    # frames are |groups| rows; at scale this is a metadata-sized
    # materialization, the same trade as fit_kmeans' k-row collects.
    # with_input=True hands back the operator's OWN checkpointed
    # (event_type, _v) frame, so the deviation pass, the MAD pass and
    # the final flagging aggregate all read the materialized blocks —
    # the raw parquet is scanned exactly once (r12: was 5 scans).
    med, vals = grouped_exact_percentiles(
        t.events, ["event_type"], "value", [0.5], names=["med"],
        num_partitions=8, with_input=True,
    )
    med = med.localCheckpoint()
    dev = (
        vals.select("event_type", F.col("_v").alias("value"))
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type", "value", "med",
            F.abs(F.col("value") - F.col("med")).alias("adev"),
        )
    )
    mad = grouped_exact_percentiles(
        dev, ["event_type"], "adev", [0.5], names=["mad"],
        num_partitions=8,
    ).localCheckpoint()
    flagged = dev.join(F.broadcast(mad), "event_type")
    is_out = (F.col("mad") > 0) & (
        F.lit(_MAD_K) * F.col("adev") / F.col("mad") > _MAD_CUT
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.any_value("med"), 6).alias("median_value"),
        F.round(F.any_value("mad"), 6).alias("mad_value"),
        F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
    )


# --------------------------------------------------------------------------
# sketch algebra: distinct-set union/intersection estimates from HLL
# --------------------------------------------------------------------------
@query(
    "hll_set_ops_estimate",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
    SELECT 'viewers' AS seg, count(*) AS n_exact, TRUE AS within_bound FROM a
    UNION ALL
    SELECT 'clickers', count(*), TRUE FROM b
    UNION ALL
    SELECT 'union', count(*), TRUE FROM (
        SELECT user_id FROM a UNION SELECT user_id FROM b)
    UNION ALL
    SELECT 'intersection', count(*), TRUE FROM (
        SELECT user_id FROM a INTERSECT SELECT user_id FROM b)
    """,
    tags=("events", "sketch", "hll"),
)
def hll_set_ops_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set ALGEBRA on sketches: viewer and clicker HLLs,
    their union by sketch merge, and the intersection by
    inclusion-exclusion (|A| + |B| − |A∪B|) — the audience-overlap
    question answered without ever co-shuffling the two sides.  Same
    error-contract pattern as hll_mergeable_rollup: the oracle emits
    exact counts and TRUE verdicts; Spark's rows hash-match only if
    every estimate lands inside its bound (5% for the direct sketches,
    15% for the subtraction-compounded intersection).

    Scale shape: each segment aggregates to ONE sketch (map-side
    combined); union/intersection are driver-side algebra on two
    sketch values — at 100 TB, set operations over billions of users
    cost two scans and bytes of state, the whole point of mergeable
    sketches."""
    t = load(spark, sf_dir)
    ev = t.events
    sk = ev.groupBy().agg(
        F.hll_sketch_agg(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("ska"),
        F.hll_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("skb"),
        F.count_distinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("na"),
        F.count_distinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("nb"),
    )
    both = ev.where(F.col("event_type").isin("view", "click"))
    n_union = both.select("user_id").distinct().count()
    inter = (
        ev.where(F.col("event_type") == "view")
        .select("user_id")
        .intersect(ev.where(F.col("event_type") == "click").select("user_id"))
        .count()
    )
    row = sk.select(
        "na",
        "nb",
        F.hll_sketch_estimate("ska").alias("ea"),
        F.hll_sketch_estimate("skb").alias("eb"),
        F.hll_sketch_estimate(
            F.hll_union("ska", "skb")
        ).alias("eu"),
    ).collect()[0]
    est_inter = row["ea"] + row["eb"] - row["eu"]

    def ok(est, exact, tol):
        return bool(exact > 0 and abs(est - exact) / exact <= tol)

    out = [
        ("viewers", int(row["na"]), ok(row["ea"], row["na"], 0.05)),
        ("clickers", int(row["nb"]), ok(row["eb"], row["nb"], 0.05)),
        ("union", int(n_union), ok(row["eu"], n_union, 0.05)),
        ("intersection", int(inter), ok(est_inter, inter, 0.15)),
    ]
    return spark.createDataFrame(
        out, "seg string, n_exact long, within_bound boolean"
    )


# --------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quartile codes)
# --------------------------------------------------------------------------
@query(
    "rfm_segments",
    oracle="""
    WITH ref AS (SELECT max(ts) AS now FROM events),
    u AS (
        SELECT user_id,
               date_diff('second', max(ts), any_value(ref.now)) AS rec_s,
               count(*) AS freq,
               round(sum(value), 2) AS monetary
        FROM events, ref
        GROUP BY user_id
    ),
    q AS (
        SELECT user_id,
               ntile(4) OVER (ORDER BY rec_s, user_id) AS r,
               ntile(4) OVER (ORDER BY freq DESC, user_id) AS f,
               ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m
        FROM u
    )
    SELECT r || '-' || f || '-' || m AS segment,
           count(*) AS n_users
    FROM q
    GROUP BY 1
    """,
    tags=("events", "analytics", "segmentation"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency/frequency/monetary stats,
    quartile-coded (1 = best) and rolled up to segment sizes — the
    classic lifecycle-marketing cut of an event stream, as one keyed
    aggregate plus three ntile windows over the per-USER table.

    Scale shape: the big shuffle is the user aggregate; the three
    quartile codes come from operators/rank.global_ntile (range-
    partitioned global rank + the SQL-standard bucket formula), one
    chained pass per axis, so even 1e9 users never funnel through the
    single task a native `ntile() OVER (ORDER BY ...)` requires."""
    from ..operators.rank import global_ntile

    t = load(spark, sf_dir)
    now = t.events.agg(F.max("ts").alias("now"))
    u = (
        t.events.crossJoin(F.broadcast(now))
        .groupBy("user_id")
        .agg(
            F.min(
                (
                    F.unix_micros(F.col("now").cast("timestamp_ltz"))
                    - F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                ) / 1_000_000
            ).cast("long").alias("rec_s"),
            F.count("*").alias("freq"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
    )
    q = global_ntile(u, ["rec_s", "user_id"], 4, "r")
    q = global_ntile(q, [F.col("freq").desc(), "user_id"], 4, "f")
    q = global_ntile(q, [F.col("monetary").desc(), "user_id"], 4, "m")
    return q.groupBy(
        F.concat_ws("-", "r", "f", "m").alias("segment")
    ).agg(F.count("*").alias("n_users"))


@query(
    "dau_stickiness",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM user_days),
    dau AS (
        SELECT d, count(DISTINCT user_id) AS dau FROM user_days GROUP BY d
    ),
    wau AS (
        SELECT days.d, count(DISTINCT u.user_id) AS wau
        FROM days JOIN user_days u
          ON u.d <= days.d AND u.d >= days.d - INTERVAL 6 DAY
        GROUP BY days.d
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day,
           dau.dau, wau.wau,
           CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_ppm
    FROM dau JOIN wau ON dau.d = wau.d
    """,
    tags=("events", "analytics"),
)
def dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day-WAU stickiness per day — the product-
    analytics engagement headline. Distinct user-days collapse first
    (the only pass over raw events); the trailing-7-day active set
    comes from EXPLODING each user-day into the 7 WAU days it covers
    (d contributes to day X iff X-6 <= d <= X), then one keyed
    count-distinct per covered day — a fixed 7x row expansion plus an
    equi-join, replacing the earlier broadcast nested-loop range join
    whose predicate evaluations grew O(|user_days| x |days|) with
    unbounded history (ADVICE r4).

    Scale shape: raw events reduce to |users|x|days| pairs in one
    map-side-combined distinct; the cover explode is a narrow codegen
    Generate (exactly 7 rows out per row in, independent of history
    length); the day-list semi-join (drops cover days with no events,
    matching the oracle's day spine) broadcasts the tiny day frame;
    then one keyed count-distinct. Stickiness is integer ppm — no
    float rounding to tie-break cross-engine."""
    t = load(spark, sf_dir)
    user_days = t.events.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    days = user_days.select("d").distinct()
    dau = user_days.groupBy("d").agg(
        F.countDistinct("user_id").alias("dau")
    )
    cover = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("dd"),
    )
    wau = (
        cover.join(
            F.broadcast(days.select(F.col("d").alias("dd"))), "dd", "left_semi"
        )
        .groupBy("dd")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == F.col("dd"))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.expr("dau * 1000000 div wau").alias("stickiness_ppm"),
        )
    )


@query(
    "activity_streaks",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ),
    grp AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d
               ) AS INTEGER) AS anchor
        FROM user_days
    ),
    streaks AS (
        SELECT user_id, anchor, count(*) AS len
        FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           count(*) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM streaks
    GROUP BY user_id
    """,
    tags=("events", "analytics", "window"),
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands construction: distinct user-days, then
    `day - row_number()` is constant within a consecutive run, so one
    groupBy on that anchor measures every streak.

    Scale shape: events collapse to user-days first; the window sort
    partitions by user (bounded rows each); two keyed aggregates, all
    map-side combinable. No self-join — the naive adjacency approach
    would be one."""
    t = load(spark, sf_dir)
    user_days = t.events.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    grp = user_days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = grp.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.count("*").alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


@query(
    "session_duration_percentiles",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               (sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ))::BIGINT AS session_seq
        FROM g
    ),
    durs AS (
        SELECT user_id, session_seq,
               date_diff('microsecond', min(ts), max(ts)) AS dur_us,
               count(*) AS n_events
        FROM s GROUP BY user_id, session_seq
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_multi_event,
           round(quantile_cont(dur_us / 1e6, 0.5), 4) + 0.0 AS p50_sec,
           round(quantile_cont(dur_us / 1e6, 0.9), 4) + 0.0 AS p90_sec,
           round(max(dur_us) / 1e6, 4) + 0.0 AS max_sec
    FROM durs
    """,
    tags=("events", "sessionize", "percentile"),
)
def session_duration_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of session durations — composes the sessionize
    labeling (same 30-minute gap rule as `sessionize_events`) with
    exact linear-interpolation percentiles (`percentile` in Spark ==
    `quantile_cont` in DuckDB); durations are exact microsecond
    integers until the final unit conversion.

    Scale shape: one (user, time) window sort shared by lag and the
    running sum, one keyed aggregate to session rows, then a single
    global aggregate of one small row per session. The global
    percentile is exact — at a 100 TB event scale you'd swap in
    `approx_percentile` (the KLL family is covered by
    `approx_quantiles_bounded`)."""
    t = load(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    micros = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = micros - F.lag(micros).over(w)
    g = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap <= 30 * 60 * 1_000_000, F.lit(0))
        .otherwise(F.lit(1))
        .alias("new_session"),
    )
    s = g.select(
        "user_id", "ts", F.sum("new_session").over(wrun).alias("session_seq")
    )
    durs = s.groupBy("user_id", "session_seq").agg(
        (
            F.unix_micros(F.max("ts").cast("timestamp_ltz"))
            - F.unix_micros(F.min("ts").cast("timestamp_ltz"))
        ).alias("dur_us"),
        F.count("*").alias("n_events"),
    )
    return durs.agg(
        F.count("*").alias("n_sessions"),
        F.sum((F.col("n_events") > 1).cast("long")).alias("n_multi_event"),
        (
            F.round(F.expr("percentile(dur_us / 1e6, 0.5)"), 4) + 0.0
        ).alias("p50_sec"),
        (
            F.round(F.expr("percentile(dur_us / 1e6, 0.9)"), 4) + 0.0
        ).alias("p90_sec"),
        (F.round(F.max("dur_us") / 1e6, 4) + 0.0).alias("max_sec"),
    )


@query(
    "funnel_conversion_lag",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    lags AS (
        SELECT p.user_id,
               date_diff('microsecond', v.t_view, p.t_purchase) AS lag_us
        FROM p JOIN v ON v.user_id = p.user_id
    ),
    r AS (
        SELECT lag_us,
               row_number() OVER (ORDER BY lag_us, user_id) AS rn,
               count(*) OVER () AS n
        FROM lags
    )
    SELECT max(n) AS n_converted,
           max(CASE WHEN rn = (n + 1) // 2 THEN lag_us END) AS p50_lag_us,
           max(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_us END)
               AS p90_lag_us,
           max(lag_us) AS max_lag_us
    FROM r
    """,
    tags=("events", "funnel", "percentile"),
)
def funnel_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time from first view to first subsequent purchase per user, with
    discrete p50/p90 — the funnel-latency companion to
    `conversion_funnel` (which counts stages, not delays). Percentile
    positions use pure integer arithmetic (ceil(q*n) as (q_num*n +
    q_den-1) // q_den): float `0.9 * n` is NOT exact and can push
    ceil() off by one between engines; the microsecond lags stay
    integer end-to-end — no rounding anywhere.

    Scale shape: two keyed min-aggregates over filtered scans, a keyed
    join, then the global position of each converted user comes from
    operators/rank.ordered_scan (range repartition + local row_number
    + driver partition offsets) — a fully parallel range shuffle even
    if every user converts, never a single-task `Window.orderBy()`;
    the population count rides along as an exact literal. At full
    scale approx_percentile is the cheaper alternative; the exact form
    here is the oracle-checkable contract."""
    t = load(spark, sf_dir)
    ev = t.events
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    lags = p.join(v, "user_id").select(
        "user_id",
        (
            F.unix_micros(F.col("t_purchase").cast("timestamp_ltz"))
            - F.unix_micros(F.col("t_view").cast("timestamp_ltz"))
        ).alias("lag_us"),
    )
    r = ordered_scan(
        lags, ["lag_us", "user_id"], rank="rn", totals={"n": "*"},
        checkpoint_input=True,
    )
    return r.agg(
        F.max("n").alias("n_converted"),
        F.max(
            F.when(F.expr("rn = (n + 1) div 2"), F.col("lag_us"))
        ).alias("p50_lag_us"),
        F.max(
            F.when(F.expr("rn = (9 * n + 9) div 10"), F.col("lag_us"))
        ).alias("p90_lag_us"),
        F.max("lag_us").alias("max_lag_us"),
    )


@query(
    "event_entropy_per_user",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    ),
    u AS (
        SELECT user_id, sum(n) AS total, count(*) AS n_types
        FROM c GROUP BY user_id
    )
    SELECT c.user_id,
           CAST(max(u.total) AS BIGINT) AS n_events,
           CAST(max(u.n_types) AS BIGINT) AS n_types,
           round(-sum((n / CAST(total AS DOUBLE))
                      * log2(n / CAST(total AS DOUBLE))), 6) + 0.0
               AS entropy_bits
    FROM c JOIN u ON u.user_id = c.user_id
    GROUP BY c.user_id
    """,
    tags=("events", "analytics", "entropy"),
)
def event_entropy_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each user's event-type distribution —
    the behavioral-diversity profile feature (bots score ~0, organic
    users near log2(5)). Two stacked keyed aggregates; the entropy sum
    runs over at most |event_types| rows per user.

    Scale shape: both groupBys share the user_id shuffle key (one
    exchange, reused); counts stay integers until the final p*log2(p)
    map. log2 of a small-int ratio never terminates in decimal, so the
    round-6 comparison has no half-boundary flake exposure."""
    t = load(spark, sf_dir)
    c = t.events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    u = c.groupBy("user_id").agg(
        F.sum("n").alias("total"), F.count("*").alias("n_types")
    )
    p = F.col("n") / F.col("total").cast("double")
    return (
        c.join(u, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("total").alias("n_events"),
            F.max("n_types").alias("n_types"),
            (F.round(-F.sum(p * F.log2(p)), 6) + 0.0).alias("entropy_bits"),
        )
    )


@query(
    "repeat_purchase_interval",
    oracle="""
    WITH per AS (
        SELECT l.l_partkey, o.o_custkey,
               CAST(date_trunc('day', o.o_orderdate) AS DATE) AS d
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2, 3
    ),
    gaps AS (
        SELECT l_partkey, o_custkey,
               date_diff('day', lag(d) OVER (
                   PARTITION BY l_partkey, o_custkey ORDER BY d
               ), d) AS gap_days
        FROM per
    ),
    g AS (SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL),
    r AS (
        SELECT gap_days,
               row_number() OVER (ORDER BY gap_days) AS rn,
               count(*) OVER () AS n
        FROM g
    )
    SELECT max(n) AS n_repeat_pairs,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN gap_days END) AS BIGINT)
               AS p50_gap_days,
           CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_days END)
                AS BIGINT) AS p90_gap_days,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM r
    """,
    tags=("events", "analytics", "percentile"),
)
def repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between repeat purchases of the same part by the same
    customer: per (part, customer) ordered purchase days, lag
    deltas, then integer-exact discrete p50/p90 over all gaps — the
    replenishment-cycle statistic behind reorder-reminder features.

    Scale shape: the join shuffles on orderkey (co-bucketable); the
    per-pair dedup and lag share one (part, customer) shuffle; the
    global position of each gap comes from operators/rank.ordered_scan
    (range repartition + local row_number + driver partition offsets)
    — parallel even when repeat pairs are fact-table-sized, never a
    single-task `Window.orderBy()`; ties in gap_days stay within one
    range partition (RangePartitioner assigns by key) and any tie
    order yields the same value at a given rank, so the percentile is
    deterministic. Integer day arithmetic end-to-end — same
    no-float-ties convention as funnel_conversion_lag."""
    t = load(spark, sf_dir)
    per = (
        t.lineitem.join(
            t.orders,
            t.lineitem.l_orderkey == t.orders.o_orderkey,
        )
        .select(
            "l_partkey",
            "o_custkey",
            F.to_date(F.date_trunc("day", "o_orderdate")).alias("d"),
        )
        .distinct()
    )
    w = W.partitionBy("l_partkey", "o_custkey").orderBy("d")
    gaps = per.select(
        F.datediff(F.col("d"), F.lag("d").over(w)).alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    r = ordered_scan(gaps, ["gap_days"], rank="rn", totals={"n": "*"})
    return r.agg(
        F.max("n").alias("n_repeat_pairs"),
        F.max(
            F.when(F.expr("rn = (n + 1) div 2"), F.col("gap_days"))
        ).cast("long").alias("p50_gap_days"),
        F.max(
            F.when(F.expr("rn = (9 * n + 9) div 10"), F.col("gap_days"))
        ).cast("long").alias("p90_gap_days"),
        F.min("gap_days").cast("long").alias("min_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
    )


@query(
    "sessions_to_convert",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, event_type,
               (sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ))::BIGINT AS session_seq
        FROM g
    ),
    conv AS (
        SELECT user_id, min(session_seq) AS conv_session
        FROM s WHERE event_type = 'purchase'
        GROUP BY user_id
    )
    SELECT conv_session AS sessions_to_convert,
           count(*) AS n_users
    FROM conv GROUP BY conv_session
    """,
    tags=("events", "sessionize", "funnel"),
)
def sessions_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many sessions until the first purchase: sessionize (same
    30-minute rule as sessionize_events), find each converting user's
    first purchase-bearing session ordinal, histogram the ordinals —
    the activation-latency distribution product teams track next to
    the funnel counts.

    Scale shape: the one (user, time) window sort from the sessionize
    family, a filtered keyed min, and a tiny histogram groupBy.
    Session ordinals are integers end-to-end."""
    t = load(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    micros = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = micros - F.lag(micros).over(w)
    g = t.events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap <= 30 * 60 * 1_000_000, F.lit(0))
        .otherwise(F.lit(1))
        .alias("new_session"),
    )
    s = g.select(
        "user_id",
        "event_type",
        F.sum("new_session").over(wrun).alias("session_seq"),
    )
    conv = (
        s.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("session_seq").alias("conv_session"))
    )
    return conv.groupBy(
        F.col("conv_session").alias("sessions_to_convert")
    ).agg(F.count("*").alias("n_users"))


@query(
    "new_vs_returning_users",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ),
    first_seen AS (
        SELECT user_id, min(d) AS d0 FROM user_days GROUP BY user_id
    )
    SELECT strftime(u.d, '%Y-%m-%d') AS day,
           CAST(sum(CASE WHEN u.d = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(sum(CASE WHEN u.d > f.d0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_returning
    FROM user_days u JOIN first_seen f ON f.user_id = u.user_id
    GROUP BY u.d
    """,
    tags=("events", "analytics"),
)
def new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into first-ever-seen vs returning —
    the acquisition/retention headline next to dau_stickiness. One
    keyed min finds each user's first day; the split is a broadcast
    join back onto the (already tiny) user-day frame.

    Scale shape: raw events collapse to distinct user-days first;
    both aggregates and the join share the user_id key. Integer
    counts end-to-end."""
    t = load(spark, sf_dir)
    user_days = t.events.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    first_seen = user_days.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        user_days.join(first_seen, "user_id")
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum((F.col("d") == F.col("d0")).cast("long")).alias("n_new"),
            F.sum((F.col("d") > F.col("d0")).cast("long")).alias(
                "n_returning"
            ),
        )
    )


# --------------------------------------------------------------------------
# ext — survival analysis: time-to-next-order with right censoring.
# The churn/retention statistic product teams actually report
# (Kaplan-Meier 1958); the repo's cohort_retention gives the calendar
# view, this gives the duration view with censoring handled correctly.
# --------------------------------------------------------------------------
@query(
    "survival_km_curve",
    oracle="""
    WITH per AS (
        SELECT o_custkey, CAST(date_trunc('day', o_orderdate) AS DATE) AS d
        FROM orders GROUP BY 1, 2
    ),
    nx AS (
        SELECT o_custkey, d,
               lead(d) OVER (PARTITION BY o_custkey ORDER BY d) AS nxt
        FROM per
    ),
    mx AS (SELECT max(d) AS maxd FROM per),
    obs AS (
        SELECT CASE WHEN nxt IS NOT NULL THEN date_diff('day', d, nxt)
                    ELSE date_diff('day', d, maxd) END AS dur,
               CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM nx CROSS JOIN mx
    ),
    g AS (
        SELECT dur, sum(ev) AS de, sum(1 - ev) AS ce
        FROM obs GROUP BY dur
    ),
    k AS (
        SELECT dur, de, ce,
               sum(de + ce) OVER () AS n_total,
               sum(de + ce) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM g
    ),
    r AS (
        SELECT dur, de, ce, n_total - cum + de + ce AS n_risk FROM k
    ),
    s AS (
        SELECT dur, de, ce, n_risk,
               CASE WHEN de < n_risk
                    THEN ln(1 - de * 1.0 / n_risk) END AS lt,
               max(CASE WHEN de >= n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS dead
        FROM r
    )
    SELECT CAST(dur AS BIGINT) AS gap_days,
           CAST(de AS BIGINT) AS n_events,
           CAST(ce AS BIGINT) AS n_censored,
           CAST(n_risk AS BIGINT) AS n_risk,
           CASE WHEN dead = 1 THEN 0.0
                ELSE round(exp(sum(lt) OVER (ORDER BY dur
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                    + 0.0 END AS survival
    FROM s
    """,
    tags=("events", "stats", "survival", "bounded-window"),
)
def survival_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit estimator of the time-to-next-order
    distribution: per customer, gaps between consecutive distinct
    order days are events; the tail gap from the last order to the
    dataset's last day is right-censored. Output is the full KM table
    (risk set, events, censorings, survival) at every observed gap
    length.

    S(t) = prod_{s<=t} (1 - d_s/n_s); computed as exp of the running
    sum of ln factors (identical expression both engines, rounded to
    6dp). When the final risk set is exhausted by events
    (d = n_risk → a zero factor), the row is flagged through a running
    max instead of feeding ln(0) into the sum — that case can only
    occur at the largest duration, where no later rows exist.

    Scale shape: the per-customer lead() windows partition by
    customer key (bounded per-key row counts); gaps then collapse to
    ≤ (calendar-span-in-days) distinct durations, so the final
    cumulative windows run over a frame bounded BY CONSTRUCTION
    (~2.4k rows for the 1995-2001 span regardless of fact size) —
    `bounded-window` tier, same convention as the decile/KS
    queries. The dataset-max-date scalar rides a 1-row broadcast."""
    t = load(spark, sf_dir)
    per = t.orders.select(
        "o_custkey", F.to_date(F.date_trunc("day", "o_orderdate")).alias("d")
    ).distinct()
    w = W.partitionBy("o_custkey").orderBy("d")
    nx = per.select("o_custkey", "d", F.lead("d").over(w).alias("nxt"))
    mx = per.agg(F.max("d").alias("maxd"))
    obs = nx.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("nxt").isNotNull(), F.datediff("nxt", "d")
        ).otherwise(F.datediff("maxd", "d")).alias("dur"),
        F.col("nxt").isNotNull().cast("long").alias("ev"),
    )
    g = obs.groupBy("dur").agg(
        F.sum("ev").alias("de"), F.sum(1 - F.col("ev")).alias("ce")
    )
    tot = g.agg(F.sum(F.col("de") + F.col("ce")).alias("n_total"))
    wc = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.currentRow)
    atrisk = (
        F.col("n_total")
        - F.sum(F.col("de") + F.col("ce")).over(wc)
        + F.col("de")
        + F.col("ce")
    )
    r = g.crossJoin(F.broadcast(tot)).select(
        "dur", "de", "ce", atrisk.alias("n_risk")
    )
    lt = F.when(
        F.col("de") < F.col("n_risk"),
        F.log(F.lit(1) - F.col("de") * 1.0 / F.col("n_risk")),
    )
    dead = F.max(
        (F.col("de") >= F.col("n_risk")).cast("int")
    ).over(wc)
    s = r.select(
        "dur", "de", "ce", "n_risk", lt.alias("lt"), dead.alias("dead")
    )
    return s.select(
        F.col("dur").cast("long").alias("gap_days"),
        F.col("de").cast("long").alias("n_events"),
        F.col("ce").cast("long").alias("n_censored"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum("lt").over(wc)), 6) + 0.0)
        .alias("survival"),
    )


# --------------------------------------------------------------------------
# ext — CUPED variance reduction (Deng et al. 2013, "Improving the
# Sensitivity of Online Controlled Experiments"): adjust the post-
# period metric by the pre-period covariate before comparing variants.
# The standard trick every experimentation platform applies.
# --------------------------------------------------------------------------
#: experiment split date: pre-period covariate window is everything
#: before it, the measured period everything from it on
CUPED_SPLIT = "2024-01-16"


@query(
    "cuped_adjusted_ab",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               user_id % 2 AS variant,
               sum(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                        THEN value ELSE 0 END) AS pre,
               sum(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                        THEN value ELSE 0 END) AS post
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT count(*) AS n, sum(pre) AS sx, sum(post) AS sy,
               sum(pre * pre) AS sxx, sum(pre * post) AS sxy
        FROM per_user
    ),
    a AS (
        SELECT variant, pre, post,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
               sx / n AS mean_pre
        FROM per_user CROSS JOIN s
    )
    SELECT CAST(variant AS BIGINT) AS variant,
           count(*) AS n_users,
           round(avg(post), 6) + 0.0 AS mean_post,
           round(avg(post - theta * (pre - mean_pre)), 6) + 0.0
               AS mean_adjusted,
           round(max(theta), 6) + 0.0 AS theta
    FROM a
    GROUP BY variant
    """,
    tags=("events", "stats", "experiment"),
)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B comparison: per-user pre-period activity
    (before the split date) is the covariate; the post-period metric
    is adjusted by theta = cov(pre, post)/var(pre) before the
    per-variant means are compared. Theta is pooled across variants
    (the standard estimator — under randomization the covariate is
    independent of assignment). Variant assignment is the
    deterministic user-id parity used by the media/grp queries.

    Theta is computed from raw power sums with the identical
    expression on both engines, so the only cross-engine exposure is
    summation-order ULP noise, cushioned by the 6dp rounding on
    averaged outputs (same posture as value_stats / theil).

    Scale shape: one hash aggregate to a per-user frame (conditional
    sums — no self-join between periods), a 1-row broadcast of the
    pooled power sums, one per-variant aggregate. No windows, no
    sorts."""
    t = load(spark, sf_dir)
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    per_user = t.events.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, F.col("value")).otherwise(0.0))
        .alias("pre"),
        F.sum(F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0))
        .alias("post"),
    ).select(
        (F.col("user_id") % 2).alias("variant"), "pre", "post"
    )
    s = per_user.agg(
        F.count("*").alias("n"),
        F.sum("pre").alias("sx"),
        F.sum("post").alias("sy"),
        F.sum(F.col("pre") * F.col("pre")).alias("sxx"),
        F.sum(F.col("pre") * F.col("post")).alias("sxy"),
    )
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    mean_pre = F.col("sx") / F.col("n")
    a = per_user.crossJoin(F.broadcast(s)).select(
        "variant",
        "pre",
        "post",
        theta.alias("theta"),
        mean_pre.alias("mean_pre"),
    )
    return a.groupBy(F.col("variant").cast("long").alias("variant")).agg(
        F.count("*").alias("n_users"),
        (F.round(F.avg("post"), 6) + 0.0).alias("mean_post"),
        (
            F.round(
                F.avg(
                    F.col("post")
                    - F.col("theta") * (F.col("pre") - F.col("mean_pre"))
                ),
                6,
            )
            + 0.0
        ).alias("mean_adjusted"),
        (F.round(F.max("theta"), 6) + 0.0).alias("theta"),
    )


@query(
    "survival_logrank",
    oracle="""
    WITH per AS (
        SELECT o.o_custkey,
               CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                   AS grp,
               CAST(date_trunc('day', o.o_orderdate) AS DATE) AS d
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    ),
    nx AS (
        SELECT o_custkey, grp, d,
               lead(d) OVER (PARTITION BY o_custkey ORDER BY d) AS nxt
        FROM per
    ),
    mx AS (SELECT max(d) AS maxd FROM per),
    obs AS (
        SELECT grp,
               CASE WHEN nxt IS NOT NULL THEN date_diff('day', d, nxt)
                    ELSE date_diff('day', d, maxd) END AS dur,
               CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM nx CROSS JOIN mx
    ),
    g AS (
        SELECT dur,
               sum(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS d1,
               sum(CASE WHEN grp = 1 THEN 1 - ev ELSE 0 END) AS c1,
               sum(ev) AS d_all,
               count(*) AS m_all
        FROM obs GROUP BY dur
    ),
    k AS (
        SELECT dur, d1, d_all,
               sum(d1 + c1) OVER () - sum(d1 + c1) OVER w + d1 + c1
                   AS n1,
               sum(m_all) OVER () - sum(m_all) OVER w + m_all AS n
        FROM g
        WINDOW w AS (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(sum(d1) AS BIGINT) AS o1,
           round(sum(d_all * n1 * 1.0 / n), 6) + 0.0 AS e1,
           round(sum(CASE WHEN n > 1 THEN
               d_all * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n)
                   * (n - d_all) / (n - 1) ELSE 0 END), 6) + 0.0 AS v,
           round(
               (sum(d1) - sum(d_all * n1 * 1.0 / n))
               * (sum(d1) - sum(d_all * n1 * 1.0 / n))
               / sum(CASE WHEN n > 1 THEN
                   d_all * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n)
                       * (n - d_all) / (n - 1) ELSE 0 END), 6) + 0.0
               AS chi2
    FROM k
    """,
    tags=("events", "stats", "survival", "bounded-window"),
)
def survival_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test: does the BUILDING market segment
    reorder on a different time-to-next-order distribution than the
    rest?  Observed vs expected events under the null at every
    distinct gap length, with the standard hypergeometric variance —
    the censoring-correct companion to `survival_km_curve` (a naive
    mean-gap comparison is biased by the censored tail gaps).

    Scale shape: same as the KM curve — per-customer lead() windows
    partitioned by key, then everything collapses to the
    calendar-bounded distinct-duration frame (`bounded-window` tier);
    the final sums are one scalar aggregate.  The observed count is
    integer-exact; expected/variance are rational sums rounded at
    6dp on both engines."""
    t = load(spark, sf_dir)
    per = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .select(
            "o_custkey",
            (F.col("c_mktsegment") == "BUILDING")
            .cast("long")
            .alias("grp"),
            F.to_date(F.date_trunc("day", "o_orderdate")).alias("d"),
        )
        .distinct()
    )
    w = W.partitionBy("o_custkey").orderBy("d")
    nx = per.select(
        "o_custkey", "grp", "d", F.lead("d").over(w).alias("nxt")
    )
    mx = per.agg(F.max("d").alias("maxd"))
    obs = nx.crossJoin(F.broadcast(mx)).select(
        "grp",
        F.when(F.col("nxt").isNotNull(), F.datediff("nxt", "d"))
        .otherwise(F.datediff("maxd", "d"))
        .alias("dur"),
        F.col("nxt").isNotNull().cast("long").alias("ev"),
    )
    g = obs.groupBy("dur").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("ev")).otherwise(0)).alias(
            "d1"
        ),
        F.sum(
            F.when(F.col("grp") == 1, 1 - F.col("ev")).otherwise(0)
        ).alias("c1"),
        F.sum("ev").alias("d_all"),
        F.count("*").alias("m_all"),
    )
    tot = g.agg(
        F.sum(F.col("d1") + F.col("c1")).alias("t1"),
        F.sum("m_all").alias("tn"),
    )
    wc = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.currentRow)
    k = g.crossJoin(F.broadcast(tot)).select(
        "d1",
        "d_all",
        (
            F.col("t1")
            - F.sum(F.col("d1") + F.col("c1")).over(wc)
            + F.col("d1")
            + F.col("c1")
        ).alias("n1"),
        (
            F.col("tn") - F.sum("m_all").over(wc) + F.col("m_all")
        ).alias("n"),
    )
    frac = F.col("n1") * 1.0 / F.col("n")
    vterm = F.when(
        F.col("n") > 1,
        F.col("d_all")
        * frac
        * (1 - frac)
        * (F.col("n") - F.col("d_all"))
        / (F.col("n") - 1),
    ).otherwise(0.0)
    o1 = F.sum("d1")
    e1 = F.sum(F.col("d_all") * frac)
    v = F.sum(vterm)
    return k.agg(
        o1.cast("long").alias("o1"),
        (F.round(e1, 6) + 0.0).alias("e1"),
        (F.round(v, 6) + 0.0).alias("v"),
        (F.round((o1 - e1) * (o1 - e1) / v, 6) + 0.0).alias("chi2"),
    )


# --------------------------------------------------------------------------
# Top session-opening paths (round 9)
# --------------------------------------------------------------------------
_PATH_TOP = 10


@query(
    "top_session_paths",
    # sessions assigned by the shared 30-minute-gap rule (the
    # sessionize_events window pair), the opening 3-step path is a
    # conditional pivot on the within-session row_number (total order:
    # ts then event_id), and the top-k cut is deterministic under
    # (count DESC, path ASC). Everything after sessionization is
    # integer counts over short strings.
    oracle=f"""
    WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, event_id, event_type,
               (sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ))::BIGINT AS session_seq
        FROM g
    ),
    r AS (
        SELECT user_id, session_seq, event_type,
               row_number() OVER (
                   PARTITION BY user_id, session_seq
                   ORDER BY ts, event_id
               ) AS rn
        FROM s
    ),
    p AS (
        SELECT user_id, session_seq,
               max(CASE WHEN rn = 1 THEN event_type END) AS e1,
               max(CASE WHEN rn = 2 THEN event_type END) AS e2,
               max(CASE WHEN rn = 3 THEN event_type END) AS e3
        FROM r WHERE rn <= 3
        GROUP BY user_id, session_seq
    ),
    paths AS (
        SELECT e1 || '>' || e2 || '>' || e3 AS path,
               count(*) AS n_sessions
        FROM p WHERE e3 IS NOT NULL
        GROUP BY 1
    ),
    tot AS (SELECT sum(n_sessions) AS t FROM paths)
    SELECT path, CAST(n_sessions AS BIGINT) AS n_sessions,
           round(n_sessions * 1.0 / t, 6) + 0.0 AS share
    FROM paths, tot
    ORDER BY n_sessions DESC, path
    LIMIT {_PATH_TOP}
    """,
    tags=("events", "sessionize", "paths"),
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {_PATH_TOP} most common session-opening paths (first three
    event types of each >=3-event session, joined with '>') with their
    share of all 3+-event sessions — the entry-flow mining every
    product-analytics surface ships (the path-level companion to
    event_transition_matrix's single-step Markov view and
    conversion_funnel's fixed-order check).

    Scale shape: the sessionize window pair (one (user, time) sort
    reused by lag + running sum), a within-session row_number on the
    same sort, an rn<=3 filter BEFORE the pivot so only three short
    strings per session reach the path aggregate, then a tiny
    path-count frame with a TakeOrdered cut."""
    t = load(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    micros = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = micros - F.lag(micros).over(w)
    g = t.events.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(gap <= 30 * 60 * 1_000_000, 0).otherwise(1).alias(
            "new_session"
        ),
    )
    s = g.select(
        "user_id", "ts", "event_id", "event_type",
        F.sum("new_session").over(wrun).cast("long").alias(
            "session_seq"
        ),
    )
    r = s.select(
        "user_id", "session_seq", "event_type",
        F.row_number().over(
            W.partitionBy("user_id", "session_seq").orderBy(
                "ts", "event_id"
            )
        ).alias("rn"),
    ).where(F.col("rn") <= 3)
    p = r.groupBy("user_id", "session_seq").agg(
        F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("e1"),
        F.max(F.when(F.col("rn") == 2, F.col("event_type"))).alias("e2"),
        F.max(F.when(F.col("rn") == 3, F.col("event_type"))).alias("e3"),
    )
    paths = (
        p.where(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
    )
    tot = paths.agg(F.sum("n_sessions").alias("t"))
    return (
        paths.crossJoin(F.broadcast(tot))
        .select(
            "path",
            F.col("n_sessions").cast("long").alias("n_sessions"),
            (
                F.round(F.col("n_sessions") * 1.0 / F.col("t"), 6) + 0.0
            ).alias("share"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_PATH_TOP)
    )


# --------------------------------------------------------------------------
# Sample-ratio-mismatch guardrail (round 9)
# --------------------------------------------------------------------------
@query(
    "srm_check",
    # variant assignment is the deterministic user-id parity shared by
    # the A/B family; counts are exact integers and the chi-square /
    # z statistics are single closed-form double expressions.
    oracle="""
    WITH u AS (
        SELECT DISTINCT user_id, user_id % 2 AS variant FROM events
    ),
    c AS (
        SELECT count(*) AS n,
               sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
               sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb
        FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           round((na - n / 2.0) * (na - n / 2.0) / (n / 2.0)
                 + (nb - n / 2.0) * (nb - n / 2.0) / (n / 2.0), 6)
               + 0.0 AS chi2_stat,
           round((na - nb) / sqrt(CAST(n AS DOUBLE)), 6) + 0.0 AS z_stat
    FROM c
    """,
    tags=("events", "variant", "guardrail"),
)
def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the A/B family: the
    one-degree chi-square (and equivalent z) of the observed variant
    split against the designed 50/50 — THE pre-analysis gate every
    experimentation platform runs before reading any metric (an SRM
    means the randomization itself broke, invalidating
    cuped_adjusted_ab / props_variant_stats downstream).

    Scale shape + parity: one distinct on (user, parity-variant), one
    counting aggregate, closed-form statistics over exact integers."""
    t = load(spark, sf_dir)
    u = t.events.select(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).distinct()
    c = u.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("nb"),
    )
    n, na, nb = F.col("n"), F.col("na"), F.col("nb")
    return c.select(
        n.cast("long").alias("n_users"),
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        (
            F.round(
                (na - n / 2.0) * (na - n / 2.0) / (n / 2.0)
                + (nb - n / 2.0) * (nb - n / 2.0) / (n / 2.0),
                6,
            ) + 0.0
        ).alias("chi2_stat"),
        (
            F.round((na - nb) / F.sqrt(n.cast("double")), 6) + 0.0
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# A/B power analysis: minimum detectable effect (round 9)
# --------------------------------------------------------------------------
@query(
    "ab_power_mde",
    # the per-user metric aggregate and the pooled variance follow the
    # cuped float posture (identical expressions, 6dp rounding); the
    # z quantiles are shared literals (alpha=0.05 two-sided, 80% power).
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS variant, sum(value) AS metric
        FROM events GROUP BY user_id
    ),
    mo AS (
        SELECT count(*) AS n,
               sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
               sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
               avg(metric) AS mu,
               (sum(metric * metric)
                - sum(metric) * sum(metric) / count(*))
               / (count(*) - 1) AS var_pooled
        FROM per_user
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           round(sqrt(var_pooled), 6) + 0.0 AS metric_sd,
           round((1.959964 + 0.841621)
                 * sqrt(var_pooled * (1.0 / na + 1.0 / nb)), 6) + 0.0
               AS mde_abs,
           round((1.959964 + 0.841621)
                 * sqrt(var_pooled * (1.0 / na + 1.0 / nb)) / mu, 6)
               + 0.0 AS mde_rel
    FROM mo
    """,
    tags=("events", "variant", "power"),
)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect of the A/B setup at alpha=0.05
    (two-sided) and 80% power: MDE = (z_{0.975} + z_{0.80}) * SE of
    the difference in per-user metric means under the current split —
    the sizing number every experiment review asks for BEFORE launch
    (and the reason underpowered tests get caught); completes the
    experimentation panel srm_check (validity) -> cuped_adjusted_ab
    (variance reduction) -> MDE (sensitivity).

    Scale shape + parity: one per-user metric aggregate, one pooled-
    moment aggregate, closed-form algebra with shared z literals (the
    cuped float posture: identical expressions, rounded outputs)."""
    t = load(spark, sf_dir)
    per_user = t.events.groupBy("user_id").agg(
        F.sum("value").alias("metric")
    ).select(
        (F.col("user_id") % 2).alias("variant"), "metric"
    )
    mo = per_user.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("nb"),
        F.avg("metric").alias("mu"),
        (
            (
                F.sum(F.col("metric") * F.col("metric"))
                - F.sum("metric") * F.sum("metric") / F.count("*")
            )
            / (F.count("*") - 1)
        ).alias("var_pooled"),
    )
    zsum = 1.959964 + 0.841621
    se = F.sqrt(
        F.col("var_pooled") * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return mo.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        (F.round(F.sqrt(F.col("var_pooled")), 6) + 0.0).alias(
            "metric_sd"
        ),
        (F.round(zsum * se, 6) + 0.0).alias("mde_abs"),
        (F.round(zsum * se / F.col("mu"), 6) + 0.0).alias("mde_rel"),
    )


# --------------------------------------------------------------------------
# Position-based (U-shaped) attribution (round 9)
# --------------------------------------------------------------------------
@query(
    "attribution_position_based",
    # per-touch weights quantize to integer ppm the moment they are
    # computed (identical doubles in: exact positions/counts), so the
    # per-channel credit sums are exact integers; the join expansion
    # is the same per-user bounded as-of pattern as last-touch.
    oracle=f"""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT event_id AS tid, user_id, ts AS tts, event_type AS ch
        FROM events WHERE event_type != 'purchase'
    ),
    m AS (
        SELECT p.pid, t.ch, t.tid,
               row_number() OVER (
                   PARTITION BY p.pid ORDER BY t.tts, t.tid
               ) AS pos,
               count(*) OVER (PARTITION BY p.pid) AS k
        FROM p JOIN t
          ON t.user_id = p.user_id
         AND t.tts <= p.pts
         AND epoch_us(p.pts) - epoch_us(t.tts)
             <= {_ATTR_WINDOW_MIN * 60_000_000}
    ),
    w AS (
        SELECT ch,
               CAST(round(CASE
                   WHEN k = 1 THEN 1000000.0
                   WHEN k = 2 THEN 500000.0
                   WHEN pos = 1 OR pos = k THEN 400000.0
                   ELSE 200000.0 / (k - 2) END, 0) AS BIGINT) AS w_ppm
        FROM m
    ),
    agg AS (
        SELECT ch, count(*) AS n_touches, sum(w_ppm) AS credit_ppm
        FROM w GROUP BY ch
    ),
    tot AS (SELECT sum(credit_ppm) AS t FROM agg)
    SELECT ch AS channel,
           CAST(n_touches AS BIGINT) AS n_touches,
           round(credit_ppm / 1000000.0, 4) + 0.0 AS credit,
           round(CAST(credit_ppm AS DOUBLE) / t, 6) + 0.0 AS share
    FROM agg, tot
    """,
    tags=("events", "attribution"),
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) multi-touch attribution:
    every purchase distributes one unit of credit over its preceding
    touchpoints in the 7-day lookback — 40% to the first touch, 40%
    to the last, 20% split over the middle (1 touch takes all; 2 split
    evenly) — rolled up per channel; the multi-touch refinement of
    attribution_last_touch's winner-takes-all rule on the same as-of
    join.

    Scale shape + parity: the purchase-touch join is the per-user
    bounded as-of pattern (same as last-touch); positions/counts come
    from windows partitioned by purchase id; weights quantize to
    integer ppm immediately so the channel rollup is exact integer
    arithmetic."""
    t_ = load(spark, sf_dir)
    p = t_.events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
    )
    tch = t_.events.where(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("tuser"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("ch"),
    )
    pus = F.unix_micros(F.col("pts").cast("timestamp_ltz"))
    tus = F.unix_micros(F.col("tts").cast("timestamp_ltz"))
    m = p.join(
        tch,
        (F.col("tuser") == F.col("puser"))
        & (F.col("tts") <= F.col("pts"))
        & (pus - tus <= _ATTR_WINDOW_MIN * 60_000_000),
    ).select(
        "pid", "ch", "tid",
        F.row_number().over(
            W.partitionBy("pid").orderBy("tts", "tid")
        ).alias("pos"),
        F.count("*").over(W.partitionBy("pid")).alias("k"),
    )
    k, pos = F.col("k"), F.col("pos")
    w_ppm = F.round(
        F.when(k == 1, F.lit(1000000.0))
        .when(k == 2, F.lit(500000.0))
        .when((pos == 1) | (pos == k), F.lit(400000.0))
        .otherwise(200000.0 / (k - 2)),
        0,
    ).cast("long")
    agg = m.select("ch", w_ppm.alias("w_ppm")).groupBy("ch").agg(
        F.count("*").alias("n_touches"),
        F.sum("w_ppm").alias("credit_ppm"),
    )
    tot = agg.agg(F.sum("credit_ppm").alias("t"))
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("ch").alias("channel"),
        F.col("n_touches").cast("long").alias("n_touches"),
        (F.round(F.col("credit_ppm") / 1000000.0, 4) + 0.0).alias(
            "credit"
        ),
        (
            F.round(
                F.col("credit_ppm").cast("double") / F.col("t"), 6
            ) + 0.0
        ).alias("share"),
    )


# --------------------------------------------------------------------------
# Two-proportion z-test on conversion (round 9)
# --------------------------------------------------------------------------
@query(
    "two_proportion_ab_test",
    # converter/user counts are exact integers over the parity split;
    # the pooled z, the unpooled difference CI, and both Wilson
    # single-proportion intervals are closed-form expressions with the
    # shared 1.959964 literal.
    oracle="""
    WITH u AS (
        SELECT user_id, user_id % 2 AS variant,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT
            sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
            sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS xa,
            sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
            sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS xb
        FROM u
    ),
    d AS (
        SELECT na, xa, nb, xb,
               CAST(xa AS DOUBLE) / na AS pa,
               CAST(xb AS DOUBLE) / nb AS pb,
               CAST(xa + xb AS DOUBLE) / (na + nb) AS pp
        FROM c
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(xa AS BIGINT) AS conv_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(xb AS BIGINT) AS conv_b,
           round(pa, 6) + 0.0 AS rate_a,
           round(pb, 6) + 0.0 AS rate_b,
           round((pb - pa)
                 / sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb)), 6)
               + 0.0 AS z_pooled,
           round((pb - pa) - 1.959964
                 * sqrt(pa * (1.0 - pa) / na + pb * (1.0 - pb) / nb),
                 6) + 0.0 AS diff_ci_lo,
           round((pb - pa) + 1.959964
                 * sqrt(pa * (1.0 - pa) / na + pb * (1.0 - pb) / nb),
                 6) + 0.0 AS diff_ci_hi
    FROM d
    """,
    tags=("events", "variant", "stats"),
)
def two_proportion_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on per-user conversion (any purchase)
    between the parity variants: pooled z plus the unpooled 95%
    confidence interval for the rate difference — the single most-run
    statistic of product experimentation, completing the panel
    srm_check (validity) -> two_proportion (the readout) ->
    cuped_adjusted_ab (variance reduction) -> ab_power_mde (sizing).

    Scale shape + parity: one per-user conversion flag aggregate, one
    four-integer rollup, closed-form algebra with the shared z
    literal — every input to the floats is an exact integer."""
    t = load(spark, sf_dir)
    u = t.events.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("variant"), "converted")
    c = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("na"),
        F.sum(
            F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)
        ).alias("xa"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("nb"),
        F.sum(
            F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)
        ).alias("xb"),
    )
    na, xa, nb, xb = F.col("na"), F.col("xa"), F.col("nb"), F.col("xb")
    d = c.select(
        "na", "xa", "nb", "xb",
        (xa.cast("double") / na).alias("pa"),
        (xb.cast("double") / nb).alias("pb"),
        ((xa + xb).cast("double") / (na + nb)).alias("pp"),
    )
    pa, pb, pp = F.col("pa"), F.col("pb"), F.col("pp")
    z = 1.959964
    se_un = F.sqrt(
        pa * (1.0 - pa) / F.col("na") + pb * (1.0 - pb) / F.col("nb")
    )
    return d.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("xa").cast("long").alias("conv_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("xb").cast("long").alias("conv_b"),
        (F.round(pa, 6) + 0.0).alias("rate_a"),
        (F.round(pb, 6) + 0.0).alias("rate_b"),
        (
            F.round(
                (pb - pa)
                / F.sqrt(
                    pp * (1.0 - pp)
                    * (1.0 / F.col("na") + 1.0 / F.col("nb"))
                ),
                6,
            ) + 0.0
        ).alias("z_pooled"),
        (F.round((pb - pa) - z * se_un, 6) + 0.0).alias("diff_ci_lo"),
        (F.round((pb - pa) + z * se_un, 6) + 0.0).alias("diff_ci_hi"),
    )


# --------------------------------------------------------------------------
# Poisson dispersion check on daily arrivals (round 9)
# --------------------------------------------------------------------------
@query(
    "poisson_dispersion_daily_events",
    # daily counts and their moments are exact integers; the
    # variance-to-mean dispersion index and its chi-square are closed
    # expressions over them.
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    mo AS (
        SELECT event_type,
               count(*) AS k,
               sum(n) AS s,
               sum(n * n) AS ss
        FROM d GROUP BY event_type
    )
    SELECT event_type,
           CAST(k AS BIGINT) AS n_days,
           CAST(s AS BIGINT) AS n_events,
           round(CAST(s AS DOUBLE) / k, 6) + 0.0 AS mean_per_day,
           round(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / k)
                  / (k - 1))
                 / (CAST(s AS DOUBLE) / k), 6) + 0.0 AS dispersion_vmr,
           round((k - 1)
                 * ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / k)
                    / (k - 1))
                 / (CAST(s AS DOUBLE) / k), 4) + 0.0 AS chi2_stat
    FROM mo
    """,
    tags=("events", "timeseries", "stats"),
)
def poisson_dispersion_daily_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Poisson dispersion (variance-to-mean) index of daily arrival
    counts per event type, with the (n-1)*VMR chi-square — the
    is-this-a-Poisson-process check behind every arrival-rate alarm
    (VMR >> 1 = overdispersed/bursty traffic where a Poisson
    threshold would false-alarm; the arrivals companion to
    weekday_anomaly_days' seasonal baselines).

    Scale shape + parity: facts collapse to one (type, day) integer
    count in a map-side-combined groupBy, then one keyed moment
    rollup; both statistics are closed expressions over exact
    integers."""
    t = load(spark, sf_dir)
    d = (
        t.events.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    mo = d.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    k, s, ss = F.col("k"), F.col("s"), F.col("ss")
    var_ = (ss.cast("double") - s.cast("double") * s / k) / (k - 1)
    mean_ = s.cast("double") / k
    return mo.select(
        "event_type",
        k.cast("long").alias("n_days"),
        s.cast("long").alias("n_events"),
        (F.round(mean_, 6) + 0.0).alias("mean_per_day"),
        (F.round(var_ / mean_, 6) + 0.0).alias("dispersion_vmr"),
        (F.round((k - 1) * var_ / mean_, 4) + 0.0).alias("chi2_stat"),
    )


# --------------------------------------------------------------------------
# Signup-to-first-purchase latency (round 9)
# --------------------------------------------------------------------------
@query(
    "signup_to_purchase_latency",
    # first-signup / first-purchase timestamps are exact microsecond
    # integers from one conditional aggregate; the latency percentiles
    # use the proven quantile_cont / percentile() interpolation parity
    # (session_duration_percentiles discipline).
    oracle="""
    WITH u AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END)
                   AS first_signup,
               min(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS first_purchase
        FROM events GROUP BY user_id
    ),
    lat AS (
        SELECT user_id,
               date_diff('microsecond', first_signup, first_purchase)
                   AS lat_us
        FROM u
        WHERE first_signup IS NOT NULL
          AND first_purchase IS NOT NULL
          AND first_purchase >= first_signup
    ),
    base AS (
        SELECT count(*) AS n_signed
        FROM u WHERE first_signup IS NOT NULL
    )
    SELECT CAST(base.n_signed AS BIGINT) AS n_signed_up,
           CAST(count(*) AS BIGINT) AS n_converted,
           round(count(*) * 1.0 / base.n_signed, 6) + 0.0
               AS conversion_rate,
           round(quantile_cont(lat_us / 3.6e9, 0.5), 4) + 0.0
               AS p50_hours,
           round(quantile_cont(lat_us / 3.6e9, 0.9), 4) + 0.0
               AS p90_hours,
           round(max(lat_us) / 3.6e9, 4) + 0.0 AS max_hours
    FROM lat, base
    GROUP BY base.n_signed
    """,
    tags=("events", "funnel", "percentile"),
)
def signup_to_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency from first signup to first purchase per user (users
    whose first purchase precedes their signup are excluded — they
    converted through another door), with the signup-based conversion
    rate and p50/p90/max hours — the activation-speed number growth
    teams track beside funnel_conversion_lag's per-step timings.

    Scale shape + parity: ONE conditional min-aggregate per user (no
    self-join between event types), a filter, and one global
    percentile aggregate over exact microsecond integers using the
    proven quantile_cont/percentile interpolation parity."""
    t = load(spark, sf_dir)
    u = t.events.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("first_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))  # noqa: E731
    lat = u.where(
        F.col("first_signup").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_signup"))
    ).select(
        (us("first_purchase") - us("first_signup")).alias("lat_us")
    )
    base = u.where(F.col("first_signup").isNotNull()).agg(
        F.count("*").alias("n_signed")
    )
    j = lat.crossJoin(F.broadcast(base))
    return j.groupBy("n_signed").agg(
        F.count("*").alias("_n_conv"),
        (F.round(F.expr("percentile(lat_us / 3.6e9, 0.5)"), 4) + 0.0)
        .alias("p50_hours"),
        (F.round(F.expr("percentile(lat_us / 3.6e9, 0.9)"), 4) + 0.0)
        .alias("p90_hours"),
        (F.round(F.max("lat_us") / 3.6e9, 4) + 0.0).alias("max_hours"),
    ).select(
        F.col("n_signed").cast("long").alias("n_signed_up"),
        F.col("_n_conv").cast("long").alias("n_converted"),
        (
            F.round(F.col("_n_conv") * 1.0 / F.col("n_signed"), 6) + 0.0
        ).alias("conversion_rate"),
        "p50_hours", "p90_hours", "max_hours",
    )


# --------------------------------------------------------------------------
# Cohort LTV curve (round 9)
# --------------------------------------------------------------------------
_LTV_MAX_AGE = 8  #: weeks of lifetime tracked


@query(
    "ltv_cohort_curve",
    # cohort labels and ages are exact integer week arithmetic on
    # microsecond timestamps; per-(cohort, age) purchase-value sums
    # are quantized to integer cents the moment they are read, so the
    # cumulative curve is exact integers with single divisions at the
    # edge (the cuped/two-proportion posture with zero float sums).
    oracle=f"""
    WITH firsts AS (
        SELECT user_id,
               epoch_us(min(ts)) // (7 * 86400 * 1000000::BIGINT)
                   AS cohort_week
        FROM events GROUP BY user_id
    ),
    spend AS (
        SELECT e.user_id,
               epoch_us(e.ts) // (7 * 86400 * 1000000::BIGINT)
                   - f.cohort_week AS age_weeks,
               f.cohort_week,
               CAST(round(e.value * 100, 0) AS BIGINT) AS cents
        FROM events e
        JOIN firsts f ON f.user_id = e.user_id
        WHERE e.event_type = 'purchase'
    ),
    sizes AS (
        SELECT cohort_week, count(*) AS cohort_users
        FROM firsts GROUP BY cohort_week
    ),
    cell AS (
        SELECT cohort_week, age_weeks, sum(cents) AS cents
        FROM spend
        WHERE age_weeks < {_LTV_MAX_AGE}
        GROUP BY cohort_week, age_weeks
    ),
    cum AS (
        SELECT cohort_week, age_weeks,
               sum(cents) OVER (
                   PARTITION BY cohort_week ORDER BY age_weeks
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_cents
        FROM cell
    )
    SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
           CAST(c.age_weeks AS BIGINT) AS age_weeks,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           round(c.cum_cents / 100.0, 2) + 0.0 AS cum_revenue,
           round(c.cum_cents / 100.0 / s.cohort_users, 6) + 0.0
               AS ltv_per_user
    FROM cum c JOIN sizes s ON s.cohort_week = c.cohort_week
    """,
    tags=("events", "cohort", "ltv", "bounded-window"),
)
def ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users cohorted by the week of
    their first event, cumulative purchase revenue per cohort by
    weeks-since-first-touch (ages 0..{_LTV_MAX_AGE}), normalized per
    cohort user — the LTV triangle every growth model is calibrated
    against (the revenue companion to cohort_retention's activity
    view).

    Scale shape + parity: one per-user first-touch aggregate, one
    broadcast-joined purchase pass quantized to integer cents at the
    scan, a (cohort, age) collapse, and the cumulative window over
    each cohort's bounded {_LTV_MAX_AGE}-row curve — no float ever
    accumulates across rows."""
    t = load(spark, sf_dir)
    wk = lambda c: (  # noqa: E731
        F.unix_micros(F.col(c).cast("timestamp_ltz"))
        / (7 * 86400 * 1000000)
    ).cast("long")
    firsts = t.events.groupBy("user_id").agg(
        F.min("ts").alias("first_ts")
    ).select(
        "user_id",
        (
            F.unix_micros(F.col("first_ts").cast("timestamp_ltz"))
            / F.lit(7 * 86400 * 1000000)
        ).cast("long").alias("cohort_week"),
    )
    spend = (
        t.events.where(F.col("event_type") == "purchase")
        .join(F.broadcast(firsts), "user_id")
        .select(
            "cohort_week",
            (wk("ts") - F.col("cohort_week")).alias("age_weeks"),
            F.round(F.col("value") * 100, 0).cast("long").alias(
                "cents"
            ),
        )
        .where(F.col("age_weeks") < _LTV_MAX_AGE)
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users")
    )
    cell = spend.groupBy("cohort_week", "age_weeks").agg(
        F.sum("cents").alias("cents")
    )
    cum = cell.select(
        "cohort_week", "age_weeks",
        F.sum("cents").over(
            W.partitionBy("cohort_week")
            .orderBy("age_weeks")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("cum_cents"),
    )
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        F.col("age_weeks").cast("long").alias("age_weeks"),
        F.col("cohort_users").cast("long").alias("cohort_users"),
        (F.round(F.col("cum_cents") / 100.0, 2) + 0.0).alias(
            "cum_revenue"
        ),
        (
            F.round(
                F.col("cum_cents") / 100.0 / F.col("cohort_users"), 6
            ) + 0.0
        ).alias("ltv_per_user"),
    )


# --------------------------------------------------------------------------
# Markov stationary distribution of the event chain (round 9)
# --------------------------------------------------------------------------
_MKV_ITERS = 8
_MKV_ROUND = 9  #: per-iteration rounding (the pagerank ITER_ROUND rule)


def _markov_stationary_oracle(iters: int = _MKV_ITERS) -> str:
    prev = "pi0"
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""pi{k} AS (
        SELECT m.nxt AS state, round(sum(p.pi * m.prob), {_MKV_ROUND})
                   AS pi
        FROM m JOIN {prev} p ON p.state = m.cur
        GROUP BY m.nxt
    )"""
        )
        prev = f"pi{k}"
    chained = ",\n    ".join(steps)
    return f"""
    WITH o AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    c AS (
        SELECT event_type AS cur, next_type AS nxt, count(*) AS n
        FROM o WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    rn AS (SELECT cur, sum(n) AS row_n FROM c GROUP BY cur),
    m AS (
        SELECT c.cur, c.nxt, round(c.n * 1.0 / r.row_n, {_MKV_ROUND})
                   AS prob
        FROM c JOIN rn r USING (cur)
    ),
    states AS (SELECT cur AS state FROM rn),
    ns AS (SELECT count(*) AS k FROM states),
    pi0 AS (
        SELECT state, round(1.0 / k, {_MKV_ROUND}) AS pi
        FROM states, ns
    ),
    {chained}
    SELECT state, round(pi, 6) + 0.0 AS stationary_prob
    FROM {prev}
    """


@query(
    "event_markov_stationary",
    # the transition matrix collapses to a |types|^2 frame of exact
    # integer ratios rounded per the pagerank ITER_ROUND rule; the
    # power iteration unrolls as chained CTEs with identical
    # per-iteration rounding, so the fixpoint is exact on both engines.
    oracle=_markov_stationary_oracle(),
    tags=("events", "sequence", "markov", "iterative", "bounded-window"),
)
def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain ({_MKV_ITERS} power iterations from uniform, per-iteration
    rounding) — where a user's session walk spends its time in the
    long run, the equilibrium summary of event_transition_matrix (and
    the same fixed-round power-iteration shape as PageRank, on a
    5-state chain instead of a 16k-node graph).

    Scale shape + parity: one lead() window over the (user, time) sort
    builds the transition counts; everything after lives on the
    bounded |types|^2 matrix — the iteration is driver-side-free
    (chained joins on a broadcast-sized frame), and each round rounds
    at {_MKV_ROUND} digits so the trajectories match bit-for-bit
    across engines (the pagerank ITER_ROUND discipline)."""
    t = load(spark, sf_dir)
    o = t.events.select(
        "event_type",
        F.lead("event_type").over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("next_type"),
    )
    c = (
        o.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("cur"),
            F.col("next_type").alias("nxt"),
        )
        .agg(F.count("*").alias("n"))
    )
    rn = c.groupBy("cur").agg(F.sum("n").alias("row_n"))
    m = c.join(rn, "cur").select(
        "cur", "nxt",
        F.round(F.col("n") * 1.0 / F.col("row_n"), _MKV_ROUND).alias(
            "prob"
        ),
    ).persist()
    states = rn.select(F.col("cur").alias("state"))
    k = states.count()  # bounded: |event types|
    pi = states.select(
        "state", F.round(F.lit(1.0 / k), _MKV_ROUND).alias("pi")
    )
    for _ in range(_MKV_ITERS):
        pi = (
            m.join(pi, pi.state == m.cur)
            .groupBy(F.col("nxt").alias("state"))
            .agg(
                F.round(
                    F.sum(F.col("pi") * F.col("prob")), _MKV_ROUND
                ).alias("pi")
            )
        )
        pi = pi.localCheckpoint(eager=True)
    return pi.select(
        "state", (F.round(F.col("pi"), 6) + 0.0).alias("stationary_prob")
    )
