"""Streaming twin of the MinHash-LSH near-dup family (VERDICT r10 #6):
`streaming.stateful.lsh_candidate_increments` emits (earlier, later)
candidate pairs as documents arrive, and the distinct-ed union of all
appended pairs equals `operators.dedup.minhash_lsh_pairs` on the same
corpus — extending the crawl-increment story from exact-substring (r10)
to the banded-LSH family."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from finanalyzer_spark.catalog import load
from finanalyzer_spark.operators.dedup import (
    BUCKET_CAP,
    minhash_lsh_pairs,
    minhash_signature,
    minhash_sig_array_expr,
)
from finanalyzer_spark.streaming.stateful import lsh_candidate_increments

from .conftest import SF_DIR


def _stage_increments(spark, docs, src_dir, n_files=3):
    """Write documents as n_files parquet increments split by doc_id
    range, mtimes increasing so the file source replays them in crawl
    order."""
    ids = sorted(r[0] for r in docs.select("doc_id").distinct().collect())
    step = (len(ids) + n_files - 1) // n_files
    base = 1_700_000_000
    for i in range(n_files):
        chunk = ids[i * step : (i + 1) * step]
        if not chunk:
            continue
        sub = src_dir.parent / f"stage_{i}"
        docs.where(F.col("doc_id").isin(chunk)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(sub))
        part = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
        dst = src_dir / f"{i:04d}.parquet"
        os.rename(sub / part, dst)
        os.utime(dst, (base + i * 100, base + i * 100))


def test_row_signature_matches_batch_signature(spark):
    """The streaming path's per-row signature expression is
    bit-identical to the batch minhash_signature (same md5 token hash,
    shingle polynomial and universal hashes)."""
    docs = load(spark, SF_DIR).documents.select("doc_id", "text")
    row = {
        r["doc_id"]: list(r["ms"])
        for r in docs.select(
            "doc_id", F.expr(minhash_sig_array_expr()).alias("ms")
        )
        .where(F.expr("element_at(ms, 1) IS NOT NULL"))
        .collect()
    }
    batch = {
        r["doc_id"]: [r[f"m{i}"] for i in range(16)]
        for r in minhash_signature(docs, "text", "doc_id", 16, 3).collect()
    }
    assert row == batch and len(row) > 0


def test_streaming_lsh_candidates_equal_batch(spark, tmp_path):
    docs = load(spark, SF_DIR).documents.select("doc_id", "text")
    src = tmp_path / "src"
    src.mkdir()
    _stage_increments(spark, docs, src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        lsh_candidate_increments(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lsh_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    got = {
        (r["id_a"], r["id_b"])
        for r in spark.sql(
            "select distinct id_a, id_b from lsh_stream"
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", 16, 8, 3
        ).collect()
    }
    # the parity precondition: no band bucket overflowed the cap on
    # this fixture (overflow is the one place stream and batch diverge
    # by construction — append mode cannot retract)
    from finanalyzer_spark.operators.dedup import (
        band_hash_exprs,
    )

    banded = (
        docs.select(
            "doc_id", F.expr(minhash_sig_array_expr()).alias("ms")
        )
        .where(F.expr("element_at(ms, 1) IS NOT NULL"))
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("band"), bh.alias("bhash"))
                        for j, bh in enumerate(band_hash_exprs(16, 8))
                    ]
                )
            ).alias("bb"),
        )
    )
    biggest = (
        banded.groupBy("bb.band", "bb.bhash").count().agg(F.max("count"))
    ).collect()[0][0]
    assert biggest <= BUCKET_CAP, "fixture grew a capped bucket"

    assert len(want) > 0
    assert got == want
