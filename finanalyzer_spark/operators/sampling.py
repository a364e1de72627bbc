"""Deterministic, engine-portable sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(1) reproducible run-to-run, (2) stable under repartitioning and
cluster resizing, and (3) assignable row-at-a-time with no global
state. Spark's `df.sample(seed=...)` gives none of the three across
engines or partitionings — the sample depends on partition layout.

The portable primitive here is a content hash: bucket =
`int(md5(key)[:4], 16) % buckets`. md5 of a canonical key string is
identical in every engine (the same trick anchors the minhash oracles,
operators/dedup.py), so the DuckDB oracle reproduces the exact sample
— sampling becomes oracle-checkable, and a row's split never changes
when data moves.

Scale: pure per-row codegen'd expressions — no shuffle, no state, no
UDF; the filter pushes into the scan's ReadSchema-projected rows.
16 hex bits (65536 buckets) bound rate granularity at ~0.0015%.

Reference parity: the reference has no sampling surface (SURVEY §2 —
absent); this is part of the extended LLM-pipeline surface
(BASELINE.json).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: buckets granularity: first 4 md5 hex chars → [0, 65536)
_HEX_CHARS = 4
_SPACE = 16**_HEX_CHARS


def hash_bucket_col(key: Column, buckets: int = _SPACE, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets) from a key column's string
    form. Portable: DuckDB twin is
    ``('0x' || substr(md5(salt || key), 1, 4))::BIGINT % buckets``."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key)), 1, _HEX_CHARS), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def split_col(
    key: Column,
    weights: Sequence[float],
    names: Sequence[str],
    salt: str = "",
) -> Column:
    """Weighted split label ('train'/'val'/'test', ...) from a key
    column. Thresholds are cumulative weights over the 65536-bucket
    space; assignment is per-row and never changes with partitioning."""
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = float(sum(weights))
    bucket = hash_bucket_col(key, _SPACE, salt)
    expr: Column | None = None
    acc = 0.0
    for w, name in zip(weights[:-1], names[:-1]):
        acc += w / total
        cut = int(acc * _SPACE)
        cond = bucket < F.lit(cut)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1]))


def split_thresholds(weights: Sequence[float]) -> list[int]:
    """The integer bucket cutoffs `split_col` uses — exposed so oracle
    SQL can be generated from the same arithmetic."""
    total = float(sum(weights))
    cuts, acc = [], 0.0
    for w in weights[:-1]:
        acc += w / total
        cuts.append(int(acc * _SPACE))
    return cuts


def deterministic_sample(
    df: DataFrame, key: Column, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~rate of rows, chosen by content hash — reproducible and
    repartition-stable, unlike ``df.sample``."""
    cut = int(rate * _SPACE)
    return df.where(hash_bucket_col(key, _SPACE, salt) < cut)


def stratified_sample(
    df: DataFrame,
    stratum: Column,
    rates: dict[str, float],
    key: Column,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates (the portable analog of
    ``df.sampleBy``): rows of strata absent from `rates` are dropped."""
    bucket = hash_bucket_col(key, _SPACE, salt)
    cut: Column | None = None
    for value, rate in rates.items():
        if cut is None:
            cut = F.when(stratum == value, int(rate * _SPACE))
        else:
            cut = cut.when(stratum == value, int(rate * _SPACE))
    return df.where(bucket < cut.otherwise(0))


def weighted_sample_col(
    key: Column, weight: Column, max_weight: float, rate: float, salt: str = ""
) -> Column:
    """Weighted-Bernoulli inclusion predicate: P(keep) = rate *
    weight / max_weight, decided per row from the key's hash bucket —
    deterministic, shuffle-free, stable under repartitioning, and
    portable to the DuckDB twin (same bucket arithmetic, same double
    threshold — no transcendentals, so both engines compare
    identically)."""
    thr = F.lit(rate * _SPACE / max_weight) * weight
    return hash_bucket_col(key, _SPACE, salt) < thr
