"""Interchange formats beyond parquet: JSONL and ORC readers/writers.

The reference's only interchange formats are a CSV seed list
(dataAcquisition.py:26-33) and SQLite itself. A pipeline engine needs
the common interchange set: JSON Lines for feed payloads / exports
(the `events.props` column shows JSON is already in the data model)
and ORC as the second columnar container.

Readers take an explicit schema — NEVER inferSchema on a large source:
schema inference is an extra full pass over the data and can silently
type-drift between runs (a 100 TB no-go twice over). Same policy as
sources/csvseed.py.

JSONL is a row format: no column pruning or predicate pushdown at the
scan, so it's an *edge* format here — land it, convert to parquet,
query the parquet (`jsonl_to_parquet`). ORC is columnar with the same
pushdown properties as parquet; Spark's reader prunes and pushes
filters identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line, one file per partition."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-declared JSONL scan; corrupt lines surface in the
    standard `_corrupt_record` column rather than failing the job."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC is self-describing; pushdown/pruning match parquet."""
    return spark.read.orc(path)


def jsonl_to_parquet(
    spark: SparkSession, src: str, dst: str, schema: T.StructType
) -> None:
    """Land-and-convert: the one pass a row-format edge file gets
    before all queries run columnar."""
    read_jsonl(spark, src, schema).write.mode("overwrite").parquet(dst)
