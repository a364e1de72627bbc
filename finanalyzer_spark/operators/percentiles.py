"""Distributed exact grouped percentiles.

Spark's built-in `percentile(col, q)` is a holistic aggregate: every
value of a group is buffered in ONE task's memory, so parallelism
equals the number of groups and per-task memory grows with group size
— a scale cliff for low-cardinality groups (exactly the shape of
`GROUP BY l_returnflag` over a 100 TB lineitem: 3 tasks, each sorting
tens of billions of values).

`grouped_exact_percentiles` computes the identical linear-interpolated
quantiles with bounded per-task memory, the `positional_ids` recipe
(operators/ids.py) applied to order statistics:

1. range-repartition on (group keys, value) — within each group,
   values ascend across partitions, and no partition exceeds the
   range-split size regardless of group skew;
2. local row_number per (partition, group) — parallelism is
   partitions × groups, not groups;
3. per-(partition, group) counts → per-group exclusive prefix sums
   (tiny frame: ≤ partitions × groups rows) broadcast back: local
   rank + offset = exact global rank of each value within its group;
4. only the two boundary ranks per quantile survive a broadcast
   semi-filter; interpolation is arithmetic on that tiny remainder.

Total cost: one range shuffle + one hash shuffle of (key, value)
pairs, both fully parallel. Nothing holistic anywhere.

Reference parity: the reference has no percentiles (its aggregation
surface is max/mean/count, SURVEY §2.4) — this extends A1-A6 with the
order-statistics family a fundamentals dashboard needs, kept exact so
the DuckDB `quantile_cont` oracle can check it. (`approx_percentile`
is the sketch-based alternative when exactness isn't contractual.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def grouped_exact_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    quantiles: Sequence[float],
    names: Sequence[str] | None = None,
    num_partitions: int | None = None,
    checkpoint_input: bool = False,
    with_input: bool = False,
) -> DataFrame:
    """One row per group; one double column per quantile (linear
    interpolation at position 1 + q*(n-1), the `quantile_cont` /
    numpy-'linear' definition Spark's `percentile` also uses).

    ``checkpoint_input`` materializes ``df`` before the range
    repartition (whose boundary-sampling pass otherwise executes the
    input subtree a second time) — worth it when the input embeds a
    shuffle/join, not for bare scans.  ``with_input=True`` returns
    ``(result, d)`` where ``d`` is the checkpointed range-partitioned
    ``(*keys, _v, _pid)`` frame — callers needing further passes over
    the same values (e.g. deviations from the median just computed)
    read the materialized blocks instead of re-scanning the source."""
    names = list(names or (f"q{int(q * 100)}" for q in quantiles))
    keys = list(keys)
    n_parts = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )

    # localCheckpoint PINS the sampled range boundaries: `d` feeds both
    # the count/offset branch and the boundary-row branch, and
    # repartitionByRange's boundary sampling is seeded per RDD id — two
    # physical executions can pick different boundaries, desyncing the
    # offsets from the ranks (exactly the positional_ids bug caught by
    # the round-5 sf0.1 oracle sweep; operators/ids.py).
    src = df.select(*keys, F.col(value).cast("double").alias("_v"))
    if checkpoint_input:
        src = src.localCheckpoint()
    d = (
        src.repartitionByRange(n_parts, *keys, F.col("_v"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    d = d.withColumn(
        "_lrn", F.row_number().over(W.partitionBy("_pid", *keys).orderBy("_v"))
    )

    # tiny: ≤ n_parts × |groups| rows → windows/joins over it are cheap
    cnt = d.groupBy("_pid", *keys).agg(F.count("*").alias("_c"))
    off = cnt.select(
        "_pid",
        *keys,
        F.coalesce(
            F.sum("_c").over(
                W.partitionBy(*keys).orderBy("_pid").rowsBetween(
                    W.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    totals = cnt.groupBy(*keys).agg(F.sum("_c").alias("_n"))

    # per (group, quantile): interpolation position and its two ranks
    targets = (
        totals.select(
            *keys,
            "_n",
            F.posexplode(F.array(*[F.lit(float(q)) for q in quantiles])).alias(
                "_qi", "_q"
            ),
        )
        .withColumn("_pos", F.lit(1.0) + F.col("_q") * (F.col("_n") - 1))
        .withColumn("_lo", F.floor("_pos").cast("long"))
        .withColumn(
            "_hi", F.least(F.ceil("_pos").cast("long"), F.col("_n"))
        )
        .withColumn("_frac", F.col("_pos") - F.col("_lo"))
    )
    needed = (
        targets.select(*keys, F.explode(F.array("_lo", "_hi")).alias("_grank"))
        .distinct()
    )

    # big side filtered by broadcast join — only boundary rows survive
    boundary = (
        d.join(F.broadcast(off), ["_pid", *keys])
        .withColumn("_grank", F.col("_lrn") + F.col("_off"))
        .join(F.broadcast(needed), [*keys, "_grank"])
        .select(*keys, "_grank", "_v")
    )

    lo_v = boundary.select(
        *keys, F.col("_grank").alias("_lo"), F.col("_v").alias("_vlo")
    )
    hi_v = boundary.select(
        *keys, F.col("_grank").alias("_hi"), F.col("_v").alias("_vhi")
    )
    interp = (
        targets.join(lo_v, [*keys, "_lo"])
        .join(hi_v, [*keys, "_hi"])
        .withColumn(
            "_pv", F.col("_vlo") + F.col("_frac") * (F.col("_vhi") - F.col("_vlo"))
        )
    )
    result = interp.groupBy(*keys).agg(
        *[
            F.max(F.when(F.col("_qi") == i, F.col("_pv"))).alias(name)
            for i, name in enumerate(names)
        ]
    )
    if with_input:
        return result, d
    return result
