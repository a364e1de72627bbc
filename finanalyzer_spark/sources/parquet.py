"""Parquet sinks — S5/S6 re-expressed for columnar storage.

The reference inserts row-at-a-time with string-built SQL
(findatabase.py:135-145) into a single-file SQLite db. Here writes are
batched, partitioned parquet:

* `write_partitioned` — date-partitioned fact layout: partition
  pruning makes the retention delete and incremental reads O(touched
  partitions), not O(table). At 100 TB this is the difference between
  rewriting a day and rewriting the world.
* `append_dedup` — idempotent append: append the batch, and resolve
  duplicates at read time OR compact per-partition (the plain-parquet
  stand-in for Delta MERGE; SURVEY §7 'what's hard' (a)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("dt",),
    mode: str = "overwrite",
) -> None:
    """Date-partitioned columnar write. Callers add a `dt` column
    (e.g. year-month of the event time) sized so partitions are
    O(100 MB-1 GB) files at the target scale."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-aware read: reconcile the column sets of every
    parquet footer under `path` (mergeSchema), null-filling columns a
    file predates.

    The reference's wide fundamentals snapshot is exactly the table
    this serves — yfinance grows fields over time
    (sqlrequests.sql:58-145 froze 44 of them; a 45th lands as an ALTER
    in SQLite, as a wider appended file here). A plain read resolves
    the schema from ONE arbitrary footer, so new columns silently
    vanish or appear depending on file listing order; merged reads are
    deterministic. Cost: one footer read per file at planning time —
    at 100 TB table scale, pin the schema in the catalog instead and
    use this only at ingest boundaries."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def append_dedup(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: Sequence[str],
    order_desc: Sequence[str],
) -> DataFrame:
    """Idempotent micro-batch append with read-side dedup.

    Appends `batch`, then returns a reader that resolves each key to
    its latest row (row_number over `order_desc`). Re-delivering the
    same batch is a no-op at read time — the reference gets the same
    guarantee by deleting redundant rows after load (redundancy.sql).
    Compaction (rewriting a partition with duplicates resolved) can run
    on any schedule without changing readers."""
    batch.write.mode("append").parquet(path)
    from ..operators.dedup import dedup_by_key

    merged = spark.read.parquet(path)
    return dedup_by_key(
        merged, list(keys), [F.col(c).desc() for c in order_desc]
    )
