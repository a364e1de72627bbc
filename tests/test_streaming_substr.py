"""Streaming twin of the exact-substring family's crawl-increment
read: `streaming.stateful.novel_gram_increments` runs the same k-gram
digest first-seen semantics as the batch registry query
`ngram_novelty_rate` under Structured Streaming (one parquet file per
micro-batch, arrival order = crawl order), and the summed appended
partials equal the batch answer exactly — closing the loop between the
r9 exact-substring dedup transform and the incremental-crawl story it
narrates (VERDICT r9 #6)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from finanalyzer_spark.catalog import load
from finanalyzer_spark.plans import REGISTRY
from finanalyzer_spark.streaming.stateful import novel_gram_increments

from .conftest import SF_DIR

_K = 8  # plans/dedup._SUBSTR_K


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
        part = next(
            p for p in os.listdir(sub) if p.endswith(".parquet")
        )
        dst = src_dir / f"{i:04d}.parquet"
        os.rename(sub / part, dst)
        os.utime(dst, (base + i * 100, base + i * 100))


def test_streaming_ngram_novelty_equals_batch(spark, tmp_path):
    docs = load(spark, SF_DIR).documents.select(
        "doc_id", "source", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    _stage_increments(spark, docs, src)

    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        novel_gram_increments(stream, k=_K)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("novelty_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    got = {
        r["source"]: (r["n_grams"], r["n_repeat"])
        for r in spark.sql(
            "select source, sum(n_grams) as n_grams,"
            " sum(n_repeat) as n_repeat"
            " from novelty_stream group by source"
        ).collect()
    }
    want = {
        r["source"]: (r["n_grams"], r["n_repeat"])
        for r in REGISTRY["ngram_novelty_rate"].fn(spark, SF_DIR).collect()
    }
    assert got == want
    # the fixture corpus must actually exercise both branches
    assert sum(n for n, _ in want.values()) > 0
    assert sum(r for _, r in want.values()) > 0
