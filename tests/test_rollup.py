"""Incremental rollup maintenance: folding batches one at a time must
equal the full batch recompute exactly, touch only the affected date
partitions, and survive compaction unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from finanalyzer_spark.catalog import load
from finanalyzer_spark.pipeline.rollup import (
    bucket_rollup,
    compact,
    read_rollup,
    refresh_rollup,
)

from .conftest import SF_DIR


def _canon(df):
    return (
        df.select(
            "bucket",
            "event_type",
            "n",
            F.round("sum_value", 6).alias("sum_value"),
            F.round("min_value", 6).alias("min_value"),
            F.round("max_value", 6).alias("max_value"),
        )
        .toPandas()
        .sort_values(["bucket", "event_type"])
        .reset_index(drop=True)
    )


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    events = load(spark, SF_DIR).events
    rollup_dir = str(tmp_path / "rollup")

    # three disjoint deterministic batches (hash-split on event_id)
    batches = [events.where(F.col("event_id") % 3 == i) for i in range(3)]
    for b in batches:
        refresh_rollup(spark, rollup_dir, b)

    got = _canon(read_rollup(spark, rollup_dir))
    want = _canon(bucket_rollup(events))
    assert len(got) == len(want) > 0
    assert (got["n"].values == want["n"].values).all()
    assert (got["sum_value"].values == want["sum_value"].values).all()
    assert (got["min_value"].values == want["min_value"].values).all()
    assert (got["max_value"].values == want["max_value"].values).all()

    # layout: date-partitioned so refresh prunes to touched partitions
    assert any(d.startswith("dt=") for d in os.listdir(rollup_dir))


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    docs = load(spark, SF_DIR).documents
    path = str(tmp_path / "many_files")
    docs.repartition(64).write.parquet(path)

    def count_parquet(p):
        return sum(
            f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs
        )

    before = count_parquet(path)
    n_rows = docs.count()
    compact(spark, path)
    assert count_parquet(path) < before
    assert spark.read.parquet(path).count() == n_rows
