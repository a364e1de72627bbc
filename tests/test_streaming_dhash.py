"""Streaming twin of the perceptual media dedup (VERDICT r11 #7):
`streaming.stateful.dhash_dedup_increments` emits per-arrival
new-vs-dup verdicts as blobs crawl in, and aggregating all appended
rows by dhash reproduces `media_dhash_cross_format_dedup`'s batch
output exactly — extending the crawl-increment story from text
(exact-substring r10, MinHash-LSH r11) to the multimodal tier."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from finanalyzer_spark.catalog import load
from finanalyzer_spark.plans import REGISTRY
from finanalyzer_spark.streaming.stateful import dhash_dedup_increments

from .conftest import SF_DIR


def _stage_increments(spark, docs, src_dir, n_files=3):
    """Write doc_ids as n_files parquet increments split by id range,
    mtimes increasing so the file source replays them in crawl
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


def test_streaming_dhash_dedup_equals_batch(spark, tmp_path):
    docs = load(spark, SF_DIR).documents.select("doc_id")
    src = tmp_path / "src"
    src.mkdir()
    _stage_increments(spark, docs, src)

    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        dhash_dedup_increments(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dhash_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    emitted = spark.sql("select * from dhash_stream")
    # every arrival got exactly one verdict row
    assert emitted.count() == docs.count()

    got = {
        (r["dhash"], r["n_media"], r["n_formats"],
         r["n_distinct_blobs"], r["survivor"])
        for r in emitted.groupBy("dhash")
        .agg(
            F.count("*").alias("n_media"),
            F.countDistinct("fmt").alias("n_formats"),
            F.countDistinct("blob_md5").alias("n_distinct_blobs"),
            F.min("media_id").alias("survivor"),
        )
        .collect()
    }
    want = {
        (r["dhash"], r["n_media"], r["n_formats"],
         r["n_distinct_blobs"], r["survivor"])
        for r in REGISTRY["media_dhash_cross_format_dedup"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == want and len(want) > 0

    # survivor semantics: the emitted survivor is the batch survivor
    # for every row (the first-arriving id per hash is the min id on
    # an id-ordered crawl), and is_new fires exactly once per hash
    surv = {r["dhash"]: r["survivor"] for r in emitted.collect()}
    want_surv = {d: s for d, _, _, _, s in want}
    assert surv == want_surv
    n_new = emitted.where("is_new").count()
    assert n_new == len(want)

    # bounded state: one long per distinct hash, nothing else — the
    # state schema itself enforces it; assert the key count matches
    assert emitted.select("dhash").distinct().count() == len(want)
