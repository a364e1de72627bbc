"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over finanalyzer_spark.plans.REGISTRY — every implemented
operator from SURVEY.md §2 registers itself there as a
(PySpark callable, DuckDB oracle SQL) pair; this module just re-exposes
the registry in the driver's protocol.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from finanalyzer_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    'Latest close per ticker with dedup' — scan + per-key max +
    deterministic latest observation + broadcast dimension join
    (SURVEY.md §7 Phase 0).
    """
    return REGISTRY["latest_price_per_key"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries get
    the driver's weaker rows-only check)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
