"""Incrementally-maintained time-bucket rollup + table maintenance.

`time_bucket_rollup` (plans/eventsops.py) computes the continuous-
aggregate shape in one batch pass. This module MAINTAINS it the way a
hypertable does: each refresh folds only the NEW events into the
stored rollup, touching only the date partitions the batch lands in —
O(batch + touched partitions), never O(history).

The stored stats are deliberately the *mergeable* set (count, sum,
min, max): merge(old, partial) is algebraic, so refresh is one small
aggregation + one keyed outer merge. Non-mergeable stats (exact
distinct users) don't belong in an incremental rollup — that column
would be an HLL sketch (mergeable) with exactness dropped, which is
why the batch query keeps `n_users` but this store does not.

Exactly-once caveat: merging is additive, so re-delivering a batch
double-counts. The streaming path gets idempotence from foreachBatch
batch-id tracking (streaming/events.foreach_batch_merge's pattern);
the batch path assumes each event lands in exactly one refresh call.

`compact` is the other half of table maintenance at scale: streaming
appends and per-batch refreshes accrete small files; compaction
rewrites a directory into ~target-sized files without changing rows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: merge-able rollup schema: key = (bucket, event_type), stats below
_STATS = ("n", "sum_value", "min_value", "max_value")


def bucket_rollup(events: DataFrame, width: str = "15 minutes") -> DataFrame:
    """One batch's partial rollup (the mergeable-stat subset of
    plans/eventsops.time_bucket_rollup)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            *_STATS,
        )
    )


def merge_rollups(current: DataFrame, partial: DataFrame) -> DataFrame:
    """Algebraic merge on (bucket, event_type): counts and sums add,
    min/max fold — the reason incremental refresh is possible at all."""
    c = current.select(
        "bucket", "event_type", *[F.col(s).alias(f"_c_{s}") for s in _STATS]
    )
    p = partial.select(
        "bucket", "event_type", *[F.col(s).alias(f"_p_{s}") for s in _STATS]
    )
    j = c.join(p, ["bucket", "event_type"], "full_outer")
    z = F.lit(0)
    return j.select(
        "bucket",
        "event_type",
        (F.coalesce("_c_n", z) + F.coalesce("_p_n", z)).alias("n"),
        (
            F.coalesce("_c_sum_value", F.lit(0.0))
            + F.coalesce("_p_sum_value", F.lit(0.0))
        ).alias("sum_value"),
        F.least(
            F.coalesce("_c_min_value", "_p_min_value"),
            F.coalesce("_p_min_value", "_c_min_value"),
        ).alias("min_value"),
        F.greatest(
            F.coalesce("_c_max_value", "_p_max_value"),
            F.coalesce("_p_max_value", "_c_max_value"),
        ).alias("max_value"),
    )


def refresh_rollup(
    spark: SparkSession, rollup_dir: str, new_events: DataFrame,
    width: str = "15 minutes",
) -> None:
    """Fold a batch of new events into the stored rollup.

    Reads back only the date partitions the batch touches (partition
    pruning on `dt`), merges, and dynamically overwrites just those
    partitions — O(batch), independent of rollup history size."""
    partial = bucket_rollup(new_events, width).withColumn(
        "dt", F.to_date("bucket")
    )
    if os.path.isdir(rollup_dir):
        touched = [r["dt"] for r in partial.select("dt").distinct().collect()]
        current = spark.read.parquet(rollup_dir).where(F.col("dt").isin(touched))
        merged = merge_rollups(current, partial).withColumn(
            "dt", F.to_date("bucket")
        )
    else:
        merged = partial
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("dt").parquet(rollup_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    return spark.read.parquet(rollup_dir)


def compact(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite a parquet directory into ~target-sized files (stage and
    swap). Returns the new file count. At 100 TB this runs per
    partition on a schedule; the stage-swap becomes a transactional
    rewrite (OPTIMIZE) on Delta/Iceberg."""
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    tmp = f"{path}.compact-tmp"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def recluster(
    spark: SparkSession,
    path: str,
    zorder_by: list[str],
    n_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """OPTIMIZE ZORDER BY on plain parquet (stage and swap): rewrite a
    directory clustered on the Morton curve of `zorder_by`, so every
    output file covers a compact z-range and its per-column min/max
    footers prune on EVERY z-ordered dimension — the maintenance pass
    that turns zorder_locality_audit's before/after numbers into an
    actual layout. Returns the new file count.

    Sibling of `compact`: compact fixes file COUNT after streaming
    appends; recluster fixes file CONTENT after enough out-of-order
    ingest that the envelope spans have drifted wide. Same
    transactional story at 100 TB (this stage-swap becomes Delta/
    Iceberg OPTIMIZE ZORDER BY), same one-range-shuffle cost as a
    sorted write (operators/zorder.zorder_write)."""
    from ..operators.zorder import zorder_write

    if n_files is None:
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    tmp = f"{path}.recluster-tmp"
    zorder_write(df, tmp, zorder_by, n_files=n_files)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files
