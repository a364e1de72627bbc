"""Registry of (name → PySpark query, DuckDB oracle SQL) pairs.

Contract (driver's __spark_entry__ protocol):
* the Spark callable takes ``(spark, sf_dir)`` and returns a lazy
  DataFrame;
* the oracle is ANSI SQL DuckDB can run over the same parquet tables
  (views: region nation customer supplier part orders lineitem events
  documents embeddings);
* column names must match exactly (the comparator sorts columns by
  name before hashing) — alias every computed column on both sides;
* float aggregates are rounded on BOTH sides so the order-insensitive
  value hash is stable across engines' summation orders.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkFn
    oracle: str | None  # None → driver runs rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco
