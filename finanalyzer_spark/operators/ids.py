"""Scalable deterministic surrogate ids.

The reference's AUTOINCREMENT keys (sqlrequests.sql:24-27) become a
1-based row_number over an explicit ordering (SURVEY §7 'what's hard'
(b) — never monotonically_increasing_id, whose values depend on
partition layout). A naive `row_number().over(Window.orderBy(...))`
moves EVERY row to one partition ("No Partition Defined" — the
classic global-window scale cliff).

`positional_ids` is the id-flavored entry point to
`operators/rank.ordered_scan` (range-repartition → local row_number →
driver-computed partition offsets — the zipWithIndex-style recipe
expressed in DataFrames).  It used to carry its own copy of that
recipe with the offsets computed by an unpartitioned window over the
≤num_partitions-row counts frame; delegating to ordered_scan removed
the last single-partition window from the id path (round 6) along
with the duplicate implementation.

Wall-clock is one range shuffle + one local sort; memory per executor
is one partition, at any scale.  The localCheckpoint inside
ordered_scan pins repartitionByRange's sampled boundaries so the
offsets can never desync from the rank partitioning (the round-5
sf0.1 oracle-sweep bug).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from .rank import ordered_scan


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
    return ordered_scan(
        df, list(order_cols), rank=id_name, num_partitions=num_partitions
    )
