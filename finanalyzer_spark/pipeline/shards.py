"""End-to-end training-shard builder — the capstone composition the
LLM-pipeline operators exist for: raw corpus → quality gate → exact
dedup → deterministic split → token-budget shard packing → partitioned
parquet, in one lazy plan per stage.

Every stage is an already-tested operator reused, not re-implemented:
quality is the linear-classifier gate (plans/curation.
quality_classifier_filter's expression), dedup keeps the min-id
survivor per content digest (operators/dedup.exact_dedup semantics),
the split is the md5-bucket assignment (operators/sampling.split_col —
re-runnable, reshard-proof), and packing is the running-cumsum bucket
from `pack_token_batches` generalized to per-split shards.

Scale shape: two shuffles end to end — the dedup digest groupBy and
the per-split packing sort — plus the partitioned write; quality,
split, and token counting fuse into the scans around them. The output
layout `split=/shard_id=` is exactly what a data loader's shard
discovery wants, and the whole job is deterministic: same corpus in,
byte-identical shard assignment out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.sampling import split_col
from ..operators.text import token_count_col

#: quality-gate weights, shared with quality_classifier_filter's family
_QW = (-1.2, 0.004, 2.1, 1.5)
_QCUT = 0.5


def quality_score_col(text):
    toks = F.split(F.trim(text), r"\s+")
    n_tok = F.size(toks)
    z = (
        F.lit(_QW[0])
        + F.lit(_QW[1]) * n_tok
        + F.lit(_QW[2]) * (F.size(F.array_distinct(toks)) * 1.0 / n_tok)
        + F.lit(_QW[3]) * F.when(n_tok >= 20, 1.0).otherwise(0.0)
    )
    return 1.0 / (1.0 + F.exp(-z))


def build_training_shards(
    docs: DataFrame,
    out_dir: str,
    tokens_per_shard: int = 500,
    weights=(0.8, 0.1, 0.1),
    names=("train", "val", "test"),
) -> DataFrame:
    """Run the funnel and write `out_dir/split=*/shard_id=*/*.parquet`.
    Returns the per-(split, shard) manifest (doc/token counts) —
    deterministic, so re-running reproduces identical shards."""
    kept = docs.where(F.trim(F.col("text")) != "").where(
        quality_score_col(F.col("text")) > _QCUT
    )
    # exact dedup, min-id survivor: shuffles 16-byte digests
    deduped = (
        kept.withColumn("_fp", F.md5("text"))
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("_fp").orderBy("doc_id")
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    scored = deduped.select(
        "doc_id",
        "text",
        "source",
        token_count_col(F.col("text")).alias("n_tokens"),
        split_col(F.col("doc_id").cast("string"), list(weights), list(names)).alias(
            "split"
        ),
    )
    # greedy packing per split: cumulative tokens over a deterministic
    # order, shard = floor(cum/budget) — one window per split
    w = (
        W.partitionBy("split")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sharded = scored.withColumn(
        "shard_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / tokens_per_shard)
        .cast("int"),
    )
    sharded.write.mode("overwrite").partitionBy("split", "shard_id").parquet(
        out_dir
    )
    spark = docs.sparkSession
    return (
        spark.read.parquet(out_dir)
        .groupBy("split", "shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
