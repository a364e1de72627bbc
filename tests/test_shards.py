"""End-to-end shard builder (pipeline/shards.py): the funnel's
invariants — dedup, split partition, token budgets, determinism, and a
loader-friendly on-disk layout.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from finanalyzer_spark.catalog import load
from finanalyzer_spark.pipeline.shards import build_training_shards

from .conftest import SF_DIR


def _docs(spark):
    d = load(spark, SF_DIR).documents
    # inject exact duplicates so the dedup stage has real work
    dupes = d.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    return d.unionByName(dupes)


def test_shards_end_to_end(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = build_training_shards(
        _docs(spark), out, tokens_per_shard=500
    ).collect()
    assert manifest, "funnel produced no shards"

    back = spark.read.parquet(out)
    # 1. dedup: no two rows share text
    assert back.count() == back.select("text").distinct().count()
    # 2. split is a partition of the kept docs
    assert set(
        r["split"] for r in back.select("split").distinct().collect()
    ) <= {"train", "val", "test"}
    # 3. budget: every shard except possibly the last per split holds
    #    < budget + max single doc (greedy bound)
    max_doc = back.agg(F.max("n_tokens")).collect()[0][0]
    for r in manifest:
        assert r["n_tokens"] <= 500 + max_doc
    # 4. layout: hive-partitioned by split and shard
    assert glob.glob(f"{out}/split=*/shard_id=*/*.parquet")


def test_shards_deterministic(spark, tmp_path):
    a = {
        (r["split"], r["shard_id"], r["n_docs"], r["n_tokens"])
        for r in build_training_shards(
            _docs(spark), str(tmp_path / "a"), tokens_per_shard=400
        ).collect()
    }
    b = {
        (r["split"], r["shard_id"], r["n_docs"], r["n_tokens"])
        for r in build_training_shards(
            _docs(spark).repartition(13), str(tmp_path / "b"), tokens_per_shard=400
        ).collect()
    }
    assert a == b  # identical shards regardless of input partitioning


def test_shards_quality_gate_drops_repetitive_docs(spark, tmp_path):
    d = _docs(spark)
    docs = d.unionByName(
        spark.createDataFrame(
            [(900001, "a a a a a a a a", "en", "srcX", 15)], d.schema
        )
    )
    build_training_shards(docs, str(tmp_path / "s"))
    back = spark.read.parquet(str(tmp_path / "s"))
    assert back.where(F.col("doc_id") == 900001).count() == 0
