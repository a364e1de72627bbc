"""Z-order (Morton-curve) clustering for multi-dimensional data
skipping — the storage-layout technique behind Delta OPTIMIZE ZORDER
BY / Iceberg sort orders, on plain parquet.

Why it matters at 100 TB: parquet scans prune row groups (and whole
files) from footer min/max statistics. A sort on one column gives
perfect skipping on that column and none on any other; interleaving
the quantized bits of k columns gives each of them ~1/k of the
skipping power, so selective filters on ANY of the z-ordered columns
eliminate most files without touching data. The layout pass is one
range shuffle on the z-value — exactly the cost of a plain sort-write.

All expression work is JVM-side bit arithmetic (shiftright / & / |
over longs); no UDFs anywhere.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: quantization resolution per dimension; k dims interleave to
#: k * ZORDER_BITS result bits (keep <= 63 for a long)
ZORDER_BITS = 16


def _quantize(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale col into [0, 2^bits) from its global [min, max] range —
    rank-free (no window, no single-partition funnel), two broadcast
    scalars instead."""
    span = (cmax - cmin).cast("double")
    unit = (col.cast("double") - cmin.cast("double")) / F.when(span > 0, span).otherwise(
        F.lit(1.0)
    )
    q = F.floor(unit * ((1 << bits) - 1))
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q)).cast("long")


def _interleave(qcols: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of column i lands at position
    b * k + i. Builds a flat OR-tree of shift/mask terms — whole-stage
    codegen folds it into straight-line long arithmetic."""
    k = len(qcols)
    terms = [
        F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * k + i)
        for i, q in enumerate(qcols)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS, out: str = "_z"
) -> DataFrame:
    """Append the z-value column: one aggregate pass for the global
    min/max of each dimension (broadcast back as scalars), then pure
    codegen quantize+interleave."""
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits overflows a long")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    stats = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats))
    q = [
        _quantize(F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits)
        for c in cols
    ]
    drop = [f"_min_{c}" for c in cols] + [f"_max_{c}" for c in cols]
    return joined.withColumn(out, _interleave(q, bits)).drop(*drop)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Rewrite `df` at `path` clustered on the Morton curve of `cols`:
    range-partition on the z-value (one shuffle — same cost as a plain
    sorted write) and sort within partitions, so every output file
    covers a compact z-range and its per-column min/max footers stay
    tight. On Delta/Iceberg this whole function is OPTIMIZE ZORDER BY."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
