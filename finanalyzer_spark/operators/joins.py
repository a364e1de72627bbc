"""Join operators Spark lacks natively.

The headline one is the **as-of join** — "latest right-side state at or
before each left timestamp". For finanalyzer this is "latest
fundamentals snapshot at each trade date"
(reference tables financialData + valuesFinHistory,
finanalyzer/database/sql/sqlrequests.sql:30-160 — the reference never
joins them, but the schema implies exactly this query).

Implementation: the union+window composition, NOT a per-key
`merge_asof` in Python:

    union(left tagged 1, right tagged 0)
      → window partitioned by key, ordered by (ts, side, tiebreak)
      → last(right_payload_struct, ignorenulls) over unbounded-preceding
      → keep left rows

One hash shuffle on the key, sort within partitions, O(n log n), no
Python in the hot path — this survives a 100 TB fact table wherever the
key has reasonable cardinality. (A per-group `applyInPandas` +
`pd.merge_asof` would ship every byte through Arrow and die on big
groups.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str,
    right_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with
    the greatest ``ts`` ≤ left ``ts`` within the same ``on`` key.

    Ties on the right timestamp are broken by ``right_tiebreak``
    (ascending → the max tiebreak value wins), making the result
    deterministic and oracle-checkable.

    ``right``'s non-key, non-ts columns become the payload; left rows
    with no match get NULL payload (left-outer semantics).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in {*keys, ts}]
    left_cols = [c for c in left.columns if c not in {*keys, ts}]

    def _pay(cols: list[str]) -> F.Column:
        # struct() with zero fields fails analysis — a side with no
        # columns beyond (key, ts) rides a dummy field instead (never
        # surfaced: the final select only names real columns)
        return F.struct(*cols) if cols else F.struct(F.lit(0).alias("_dummy"))

    lpay_type = left.select(_pay(left_cols).alias("s")).schema["s"].dataType
    rpay_type = right.select(_pay(payload_cols).alias("s")).schema["s"].dataType

    l_tagged = left.select(
        *keys,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        _pay(left_cols).alias("_lpay"),
        F.lit(None).cast(rpay_type).alias("_rpay"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_tb_{c}")
            for c in right_tiebreak
        ],
    )
    r_tagged = right.select(
        *keys,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lpay_type).alias("_lpay"),
        _pay(payload_cols).alias("_rpay"),
        *[F.col(c).alias(f"_tb_{c}") for c in right_tiebreak],
    )

    unioned = l_tagged.unionByName(r_tagged)

    order = [F.col("_ts").asc(), F.col("_side").asc()] + [
        F.col(f"_tb_{c}").asc_nulls_first() for c in right_tiebreak
    ]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    filled = unioned.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    out = filled.where(F.col("_side") == 1).select(
        *keys,
        F.col("_ts").alias(ts),
        *[F.col(f"_lpay.{c}").alias(c) for c in left_cols],
        *[F.col(f"_match.{c}").alias(c) for c in payload_cols],
    )
    return out
