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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach one right row by time.

    ``direction``:

    * ``"backward"`` (default) — greatest right ``ts`` ≤ left ``ts``;
      among equal right timestamps the MAX ``right_tiebreak`` wins.
    * ``"forward"`` — smallest right ``ts`` ≥ left ``ts``; among equal
      right timestamps the MIN tiebreak wins.
    * ``"nearest"`` — whichever of the two is closer in time; an exact
      tie in distance prefers the backward match (pandas
      ``merge_asof(direction='nearest')`` convention).

    All three run on ONE hash shuffle + per-partition sort: backward
    and forward are the same ordered window scanned from opposite
    ends, and nearest evaluates both frames over a single sort (the
    matched right timestamp rides inside the payload struct, so the
    distance compare is a narrow map).

    ``right``'s non-key, non-ts columns become the payload; left rows
    with no match get NULL payload (left-outer semantics).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in {*keys, ts}]
    left_cols = [c for c in left.columns if c not in {*keys, ts}]

    def _pay(cols: list[str]) -> F.Column:
        # struct() with zero fields fails analysis — a side with no
        # columns beyond (key, ts) rides a dummy field instead (never
        # surfaced: the final select only names real columns)
        return F.struct(*cols) if cols else F.struct(F.lit(0).alias("_dummy"))

    # the matched right timestamp rides as the struct's first field so
    # `nearest` can compare distances without a second join
    def _rpay_struct(src: DataFrame) -> F.Column:
        return F.struct(
            F.col(ts).alias("_rts"), *[F.col(c) for c in payload_cols]
        )

    lpay_type = left.select(_pay(left_cols).alias("s")).schema["s"].dataType
    rpay_type = right.select(_rpay_struct(right).alias("s")).schema["s"].dataType

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
        _rpay_struct(right).alias("_rpay"),
        *[F.col(c).alias(f"_tb_{c}") for c in right_tiebreak],
    )

    unioned = l_tagged.unionByName(r_tagged)

    # side ordering decides whether an equal-timestamp right row counts:
    # backward/nearest sort rights first (≤ includes equality in the
    # backward frame); forward sorts rights after lefts (≥ includes it
    # in the forward frame).
    side_order = (
        F.col("_side").desc() if direction == "forward" else F.col("_side").asc()
    )
    order = [F.col("_ts").asc(), side_order] + [
        F.col(f"_tb_{c}").asc_nulls_first() for c in right_tiebreak
    ]
    base = W.partitionBy(*keys).orderBy(*order)
    wb = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = base.rowsBetween(W.currentRow, W.unboundedFollowing)

    if direction == "backward":
        match = F.last("_rpay", ignorenulls=True).over(wb)
    elif direction == "forward":
        match = F.first("_rpay", ignorenulls=True).over(wf)
    else:  # nearest: both frames over ONE sort, closest wins, tie → backward
        b = F.last("_rpay", ignorenulls=True).over(wb)
        f = F.first("_rpay", ignorenulls=True).over(wf)
        match = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(
                (F.col("_ts") - b["_rts"]) <= (f["_rts"] - F.col("_ts")), b
            )
            .otherwise(f)
        )

    filled = unioned.withColumn("_match", match)
    out = filled.where(F.col("_side") == 1).select(
        *keys,
        F.col("_ts").alias(ts),
        *[F.col(f"_lpay.{c}").alias(c) for c in left_cols],
        *[F.col(f"_match.{c}").alias(c) for c in payload_cols],
    )
    return out
