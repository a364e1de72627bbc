"""Scalable deterministic surrogate ids.

The reference's AUTOINCREMENT keys (sqlrequests.sql:24-27) become a
1-based row_number over an explicit ordering (SURVEY §7 'what's hard'
(b) — never monotonically_increasing_id, whose values depend on
partition layout). A naive `row_number().over(Window.orderBy(...))`
moves EVERY row to one partition ("No Partition Defined" — the
classic global-window scale cliff).

`positional_ids` computes the same numbering in three distributed
steps, the standard zipWithIndex-style recipe expressed in DataFrames:

1. range-repartition on the order keys (global sort order across
   partitions, equal keys co-located);
2. local row_number per partition (no data movement);
3. per-partition counts → cumulative offsets (tiny driver-side frame,
   broadcast back) added to the local ranks.

Wall-clock is one range shuffle + one local sort; memory per executor
is one partition, at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def positional_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    id_name: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a deterministic 1-based dense id ordered by `order_cols`.

    The ordering should be a total order (include a unique key as the
    last column) — ties would make the numbering nondeterministic, same
    as any ROW_NUMBER."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    # localCheckpoint PINS the sampled range boundaries: this frame is
    # referenced twice (ranks + offsets), and repartitionByRange's
    # boundary sampling is seeded per-RDD-id — two physical executions
    # of the same logical subtree can pick DIFFERENT boundaries (the
    # exchange is not guaranteed to be reused under AQE), which
    # desyncs the per-partition counts from the rank partitioning and
    # yields duplicate/skipped ids. Caught by the sf0.1 oracle sweep
    # (round 5); the numbering must come from ONE materialized
    # partitioning.
    ranged = (
        df.repartitionByRange(int(n), *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    local = F.row_number().over(
        W.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    )
    with_local = ranged.withColumn("_local_rn", local)
    # per-partition counts → exclusive prefix sums; at most `n` rows, so
    # the running total can use an unpartitioned window safely
    offsets = (
        with_local.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        with_local.join(F.broadcast(offsets), "_pid")
        .withColumn(id_name, (F.col("_local_rn") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local_rn", "_offset")
    )
