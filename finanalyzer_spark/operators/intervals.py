"""Interval analytics without interval self-joins.

`sweep_concurrency` answers "how many intervals are open at once" —
rooms occupied, concurrent sessions, pool connections — with the
classic sweep-line: ±1 deltas at the endpoints, one ordered running
sum per key, max. Linear in events where the naive formulation is an
O(n²) range self-join; partitionable because concurrency never crosses
the group key. Intervals are half-open [start, end): an end and a
start at the same instant do NOT overlap (delta sorts ends first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def sweep_concurrency(
    df: DataFrame,
    key: str,
    start: str | Column,
    end: str | Column,
) -> DataFrame:
    """Per-key peak concurrency over half-open numeric intervals.

    `start`/`end` are numeric columns (epoch micros, seconds — any
    ordered numeric). Output: (key, peak_concurrent, n_events).
    """
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    iv = df.select(F.col(key), s.alias("_s"), e.alias("_e"))
    pts = iv.select(
        key, F.col("_s").alias("_t"), F.lit(1).alias("_delta")
    ).unionAll(
        iv.select(key, F.col("_e").alias("_t"), F.lit(-1).alias("_delta"))
    )
    w = (
        W.partitionBy(key)
        .orderBy("_t", "_delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run = pts.select(key, F.sum("_delta").over(w).alias("_open"))
    return run.groupBy(key).agg(
        F.max("_open").cast("long").alias("peak_concurrent"),
        (F.count("*") / 2).cast("long").alias("n_events"),
    )
