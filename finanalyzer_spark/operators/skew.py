"""Skew mitigation — salting for hot join/agg keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.RUNTIME_CONFS) handles sort-merge-join skew automatically at
runtime; salting is the *explicit* fallback for the cases AQE can't
rewrite: hot keys in aggregations feeding non-algebraic functions
(collect_list, exact distinct) and shuffle-hash joins where one key
holds a double-digit percentage of rows.

Both helpers are deterministic — the salt comes from hashing stable
payload columns, never rand()/monotonically_increasing_id, so results
are reproducible and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    salt_from: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over
    `salt_buckets` partitions and the right side replicated per bucket.

    Left rows get salt = pmod(hash(stable payload cols), buckets); the
    right side explodes a 0..buckets-1 sequence (size × buckets rows —
    use only when `right` is too big to broadcast but small enough to
    replicate, the classic mid-size dimension). The join key becomes
    (on..., salt), so one hot key now lands on `salt_buckets` reducers.

    `how` is restricted to inner/left/left_semi/left_anti: replicating
    the right side per salt bucket would emit every unmatched RIGHT row
    `salt_buckets` times under right/full outer semantics.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "the replicated right side breaks right/full outer semantics "
            "(each unmatched right row would appear once per salt bucket)"
        )
    salt_src = list(salt_from or [c for c in left.columns if c not in on])
    if not salt_src:
        raise ValueError("need at least one non-key column to derive the salt")
    l_salted = left.withColumn(
        SALT_COL, F.pmod(F.hash(*salt_src), F.lit(salt_buckets))
    )
    r_salted = right.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return l_salted.join(r_salted, [*on, SALT_COL], how).drop(SALT_COL)


def salted_collect_list(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-stage collect_list for skewed keys: partial collect per
    (key, salt) shard, then a final flatten-merge per key. An algebraic
    agg (sum/count) never needs this — map-side partial aggregation
    already bounds reducer load — but holistic aggs ship every value to
    one reducer unless sharded like this. Order within the list follows
    shard order (deterministic given the salt), so callers needing a
    total order should sort the array afterwards.

    The salt hashes EVERY non-key column (not just `value_col`): a hot
    key whose skew comes from one repeated value would otherwise land
    every copy in a single shard, spreading nothing. Fully identical
    rows still co-shard — unavoidable for a deterministic salt."""
    salt_src = [c for c in df.columns if c not in key_cols] or [value_col]
    salted = df.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in salt_src]), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, SALT_COL).agg(
        F.collect_list(value_col).alias("_part")
    )
    return (
        partial.groupBy(*key_cols)
        .agg(
            F.array_sort(F.flatten(F.collect_list("_part"))).alias(
                f"{value_col}_list"
            )
        )
    )
