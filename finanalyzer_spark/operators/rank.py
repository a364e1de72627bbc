"""Distributed global rank / running sums without a global window.

`Window.orderBy(...)` with no `partitionBy` funnels the whole frame
through ONE task (Spark warns `No Partition Defined for Window
operation`).  That is tolerable over a pre-aggregated frame at sf0.1
and fatal at 100 TB: ranking 1e9 customers becomes a single-task sort.
`ordered_scan` computes the identical global `row_number()` and
inclusive running sums with bounded per-task work — the
`grouped_exact_percentiles` recipe (operators/percentiles.py) with the
group keys removed and the partition-offset pass moved to the driver:

1. range-repartition on the order columns — rows ascend across
   partitions under the requested total order, equal keys land in one
   partition (RangePartitioner assigns by key), and no partition
   exceeds the range-split size;
2. local `row_number()` / running `sum()` per partition — fully
   parallel, each task sorts only its own range;
3. per-partition (count, sum) totals — ≤ `num_partitions` rows —
   round-trip the DRIVER, where exclusive prefix offsets are computed
   in exact arbitrary-precision Python ints (the bounded-scalar
   collect convention of operators/clustering.py:106: k×dim doubles
   there, ≤1024 longs here; never data rows).  Computing the offsets
   with a window instead would itself be a single-partition window —
   the driver pass is what retires the warning entirely;
4. offsets broadcast-join back on partition id: local value + offset
   = exact global value.  Grand totals fall out of the same pass for
   free and are attached as literal columns — no `sum() OVER ()`
   single-partition window, no 1-row cross join.

The input is `localCheckpoint`ed before fan-out for the same reason as
grouped_exact_percentiles: the checkpoint PINS repartitionByRange's
sampled boundaries, which are seeded per RDD id — without it the
offsets branch and the row branch could see different boundaries and
desync ranks from offsets (the positional_ids bug caught by the
round-5 sf0.1 oracle sweep, operators/ids.py).

Reference parity: the reference's only ranking device is
`ROW_NUMBER()` inside SQLite (redundancy.sql:1-10), where the single
file IS one partition; this operator is how the same semantics stay
exact when the frame is distributed (SURVEY.md §2.5).

Determinism: callers must pass a TOTAL order (include a tie-break
column) whenever the rank itself feeds the result — the same contract
as any `row_number()` use in this repo.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def ordered_scan(
    df: DataFrame,
    order: Sequence[Column | str],
    rank: str | None = None,
    running: Mapping[str, str] | None = None,
    running_max_prev: Mapping[str, str] | None = None,
    totals: Mapping[str, str] | None = None,
    num_partitions: int | None = None,
    checkpoint_input: bool = False,
) -> DataFrame:
    """Attach global order statistics under a total order, distributed.

    Parameters
    ----------
    order : sort expressions (str → ascending column); passed verbatim
        to both `repartitionByRange` and the local window, so `desc()`
        columns work.
    rank : name for the 1-based global `row_number()` column.
    running : {out_name: source_col} inclusive running sums
        (`sum(src) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING)`).
    running_max_prev : {out_name: source_col} running max over STRICTLY
        PRECEDING rows (`max(src) OVER (... ROWS BETWEEN UNBOUNDED
        PRECEDING AND 1 PRECEDING)`; null on the first row) — the
        skyline-sweep frame.  Max is associative, so the partition
        offset is the max over all earlier partitions.
    totals : {out_name: source_col or "*"} grand totals attached as
        literal columns ("*" → row count) — exact, computed on the
        driver from the per-partition totals.
    checkpoint_input : materialize `df` (localCheckpoint) BEFORE the
        range repartition.  `repartitionByRange` executes its input
        subtree twice — once for boundary sampling, once for the
        exchange itself — so a caller whose input contains a shuffle,
        join or expensive generator pays that subtree double.  With
        the flag on, the subtree runs once and both the sampler and
        the exchange read the materialized blocks.  Leave off for
        inputs that are bare scans/projections (the extra action costs
        more than the re-scan saves).

    Returns `df`'s columns plus the requested outputs.  Eager: runs
    one bounded job (localCheckpoint + ≤num_partitions-row collect).
    """
    running = dict(running or {})
    running_max_prev = dict(running_max_prev or {})
    totals = dict(totals or {})
    if not (rank or running or running_max_prev or totals):
        raise ValueError("ordered_scan: nothing requested")
    taken = set(df.columns)
    for out in (
        *([rank] if rank else []), *running, *running_max_prev, *totals
    ):
        if out in taken:
            raise ValueError(f"ordered_scan: output {out!r} collides")
        taken.add(out)

    n_parts = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order]

    # offset columns are typed from the SOURCE column (driver-side
    # accumulation is exact Python ints for integrals; floats ride
    # Python floats — the same precision class as Spark's own sum)
    from pyspark.sql import types as T

    def _off_type(src: str) -> str:
        dt = df.schema[src].dataType
        if isinstance(
            dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            return "BIGINT"
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return "DOUBLE"
        raise ValueError(
            f"ordered_scan: unsupported source dtype {dt} for {src!r}"
            " (integral and floating columns only; cast DECIMAL"
            " explicitly)"
        )

    if checkpoint_input:
        df = df.localCheckpoint()
    d = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )

    # per-partition totals → driver (≤ n_parts rows of longs)
    sum_srcs = sorted(
        {*running.values(), *[s for s in totals.values() if s != "*"]}
    )
    max_srcs = sorted(set(running_max_prev.values()))
    per_part = (
        d.groupBy("_pid")
        .agg(
            F.count("*").alias("_c"),
            *[F.sum(s).alias(f"_s_{s}") for s in sum_srcs],
            *[F.max(s).alias(f"_m_{s}") for s in max_srcs],
        )
        .collect()
    )
    per_part.sort(key=lambda r: r["_pid"])
    # accumulator zero matches the offset column type (PySpark's
    # createDataFrame verifier rejects int into a DOUBLE field)
    acc_c = 0
    acc = {
        s: 0.0 if _off_type(s) == "DOUBLE" else 0 for s in sum_srcs
    }
    macc: dict[str, int | float | None] = dict.fromkeys(max_srcs, None)
    off_rows = []
    for row in per_part:
        off_rows.append(
            (
                row["_pid"],
                acc_c,
                *[acc[s] for s in sum_srcs],
                *[
                    (
                        None
                        if macc[s] is None
                        else (
                            float(macc[s])
                            if _off_type(s) == "DOUBLE"
                            else int(macc[s])
                        )
                    )
                    for s in max_srcs
                ],
            )
        )
        acc_c += row["_c"]
        for s in sum_srcs:
            acc[s] += row[f"_s_{s}"] or 0
        for s in max_srcs:
            v = row[f"_m_{s}"]
            if v is not None and (macc[s] is None or v > macc[s]):
                macc[s] = v

    schema = ", ".join(
        ["_pid INT", "_off_rank BIGINT"]
        + [f"_off_{s} {_off_type(s)}" for s in sum_srcs]
        + [f"_moff_{s} {_off_type(s)}" for s in max_srcs]
    )
    off = df.sparkSession.createDataFrame(off_rows, schema=schema)

    wloc = W.partitionBy("_pid").orderBy(*order_cols)
    wrun = wloc.rowsBetween(W.unboundedPreceding, W.currentRow)
    wprev = wloc.rowsBetween(W.unboundedPreceding, -1)
    out_cols: list[Column] = [F.col(c) for c in df.columns]
    if rank:
        out_cols.append(
            (F.row_number().over(wloc) + F.col("_off_rank")).alias(rank)
        )
    for out, src in running.items():
        out_cols.append(
            (F.sum(src).over(wrun) + F.col(f"_off_{src}")).alias(out)
        )
    for out, src in running_max_prev.items():
        # greatest() skips nulls: first-row-of-first-partition → null,
        # first rows of later partitions → the earlier partitions' max
        out_cols.append(
            F.greatest(
                F.max(src).over(wprev), F.col(f"_moff_{src}")
            ).alias(out)
        )
    for out, src in totals.items():
        if src == "*":
            out_cols.append(F.lit(int(acc_c)).cast("long").alias(out))
        elif _off_type(src) == "DOUBLE":
            out_cols.append(
                F.lit(float(acc[src])).cast("double").alias(out)
            )
        else:
            out_cols.append(F.lit(int(acc[src])).cast("long").alias(out))

    return d.join(F.broadcast(off), "_pid").select(*out_cols)


def global_ntile(
    df: DataFrame,
    order: Sequence[Column | str],
    k: int,
    out: str,
    num_partitions: int | None = None,
    checkpoint_input: bool = False,
) -> DataFrame:
    """`ntile(k) OVER (ORDER BY order)` without the single-task sort.

    The SQL-standard bucket rule (both Spark and DuckDB implement it):
    with n rows, the first n%k buckets hold ceil(n/k) rows, the rest
    floor(n/k).  The global rank comes from `ordered_scan`; n comes
    from the same pass, so the bucket arithmetic constant-folds into
    codegen.  Output is IntegerType, matching Spark's native ntile.

    Same total-order contract as ntile itself: include a tie-break
    column or bucket assignment is nondeterministic at the boundaries.
    """
    rn_c, n_c = f"_gnt_rn_{out}", f"_gnt_n_{out}"
    scanned = ordered_scan(
        df, order, rank=rn_c, totals={n_c: "*"},
        num_partitions=num_partitions, checkpoint_input=checkpoint_input,
    )
    big = f"(({n_c} div {k}) + 1)"
    cut = f"(({n_c} % {k}) * {big})"
    tile = (
        f"CAST(CASE WHEN {rn_c} <= {cut}"
        f" THEN ({rn_c} - 1) div {big} + 1"
        f" ELSE ({n_c} % {k})"
        f" + ({rn_c} - 1 - {cut}) div greatest({n_c} div {k}, 1) + 1"
        f" END AS INT)"
    )
    return scanned.withColumn(out, F.expr(tile)).drop(rn_c, n_c)
