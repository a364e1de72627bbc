"""Streaming twin of the WARC extraction pipeline: the same
mapInPandas kernel + keyed aggregate (plans/warcops.
html_extraction_report) runs under Structured Streaming in complete
mode over a file-per-micro-batch document stream, and the final state
equals the batch answer exactly — the ingest seam is
incremental-ready, not batch-only."""

from __future__ import annotations

import glob
import os
import shutil

from finanalyzer_spark.catalog import load
from finanalyzer_spark.plans.warcops import html_extraction_report

from .conftest import SF_DIR


def test_streaming_warc_extraction_equals_batch(spark, tmp_path):
    docs = load(spark, SF_DIR).documents.select(
        "doc_id", "source", "text"
    )
    staged = tmp_path / "staged"
    docs.repartition(4).write.parquet(str(staged))
    src = tmp_path / "src"
    src.mkdir()
    for f in sorted(glob.glob(f"{staged}/part-*.parquet")):
        shutil.copy(f, src / os.path.basename(f))

    stream = (
        spark.readStream.schema(
            "doc_id long, source string, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        html_extraction_report(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("warc_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    got = {
        r["host"]: (r["n_docs"], r["n_extract_ok"], r["body_chars"])
        for r in spark.sql("select * from warc_stream").collect()
    }
    want = {
        r["host"]: (r["n_docs"], r["n_extract_ok"], r["body_chars"])
        for r in html_extraction_report(docs).collect()
    }
    assert got == want
    assert all(n_docs == ok for n_docs, ok, _ in want.values())
