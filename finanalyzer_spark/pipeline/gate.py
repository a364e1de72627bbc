"""Data-contract gate for the write path — a circuit breaker that
keeps a bad batch OUT of the store instead of detecting it afterwards.

`plans/profile.table_profile_checks` is the *reporting* form of
expectations; this is the *enforcing* form: every check evaluates as a
conditional sum in ONE aggregate pass over the batch (no per-check
scans), and a single violation fails the whole batch before any write
begins — with the keyed-merge seams (pipeline/merge.merge_into,
VersionedTable.merge) that makes the gate all-or-nothing: either the
batch lands atomically or the store is untouched.

At 100 TB the one-pass property is the point: expectations over a
landing batch cost one map-side-combined aggregate, not a scan per
rule. Row-level quarantine (split violators into a dead-letter table
instead of failing) is `split_violations` — same single pass, two
filtered writes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """A row-level expectation: `violated` marks BAD rows."""

    name: str
    violated: Column


def not_null(col: str) -> Check:
    return Check(f"{col}_not_null", F.col(col).isNull())


def unique_key(*cols: str) -> Check:
    # handled set-wise in violation_counts (uniqueness is not row-local)
    return Check("unique_key:" + ",".join(cols), F.lit(None))


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"{col}_in_range",
        F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def in_domain(col: str, values) -> Check:
    return Check(
        f"{col}_in_domain",
        F.col(col).isNotNull() & ~F.col(col).isin(list(values)),
    )


class DataContractViolation(Exception):
    def __init__(self, counts: dict[str, int]) -> None:
        self.counts = counts
        super().__init__(
            "data contract violated: "
            + ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        )


def violation_counts(df: DataFrame, checks: list[Check]) -> dict[str, int]:
    """Violation count per check — ONE aggregate pass for all row-level
    rules, plus one distinct-count pass per unique_key rule."""
    row_checks = [c for c in checks if not c.name.startswith("unique_key:")]
    counts: dict[str, int] = {}
    if row_checks:
        row = df.agg(
            *[
                F.sum(F.when(c.violated, 1).otherwise(0)).alias(c.name)
                for c in row_checks
            ]
        ).collect()[0]
        counts.update({c.name: int(row[c.name] or 0) for c in row_checks})
    for c in checks:
        if c.name.startswith("unique_key:"):
            cols = c.name.split(":", 1)[1].split(",")
            total = df.count()
            distinct = df.select(*cols).distinct().count()
            counts[c.name] = total - distinct
    return counts


def enforce(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Pass the batch through unchanged, or raise DataContractViolation
    with per-check counts. Call this on `incoming` BEFORE a store
    merge; the merge seam's atomicity then guarantees nothing partial
    landed."""
    counts = violation_counts(df, checks)
    bad = {k: v for k, v in counts.items() if v > 0}
    if bad:
        raise DataContractViolation(bad)
    return df


def split_violations(
    df: DataFrame, checks: list[Check]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — row-level rules only; one predicate,
    evaluated once per row, reused by both filtered branches. The
    dead-letter-table alternative to failing the batch."""
    row_checks = [c for c in checks if not c.name.startswith("unique_key:")]
    if not row_checks:
        return df, df.limit(0)
    any_bad = row_checks[0].violated
    for c in row_checks[1:]:
        any_bad = any_bad | c.violated
    any_bad = F.coalesce(any_bad, F.lit(False))
    return df.where(~any_bad), df.where(any_bad)
