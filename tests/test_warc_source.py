"""binaryFile WARC source (sources/warc_source.py): real .warc.gz
files on disk -> record / page DataFrames, file-per-task grain."""

from __future__ import annotations

from finanalyzer_spark.operators.warc import (
    build_http_request,
    build_http_response,
    write_warc,
    write_warc_record,
)
from finanalyzer_spark.sources.warc_source import read_warc, read_warc_pages


def _archive(host: str, n_pages: int) -> bytes:
    recs = []
    for i in range(n_pages):
        uri = f"https://{host}/p/{i}"
        recs.append(
            write_warc_record(
                "request",
                build_http_request(f"/p/{i}", host),
                uri=uri,
                content_type="application/http; msgtype=request",
            )
        )
        body = (
            f"<html><head><title>t{i}</title></head>"
            f"<body><p>page {i} of {host}</p></body></html>"
        ).encode()
        recs.append(
            write_warc_record("response", build_http_response(body), uri=uri)
        )
    # one non-HTML response: must be dropped by the page reader
    recs.append(
        write_warc_record(
            "response",
            build_http_response(b"\x00\x01binary", content_type="image/png"),
            uri=f"https://{host}/img",
        )
    )
    return write_warc(recs, gzip_members=True)


def test_read_warc_records_and_pages(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(_archive("a.example.com", 3))
    (tmp_path / "b.warc.gz").write_bytes(_archive("b.example.com", 2))

    recs = read_warc(spark, str(tmp_path)).collect()
    by_type = {}
    for r in recs:
        by_type[r["rtype"]] = by_type.get(r["rtype"], 0) + 1
    assert by_type == {"request": 5, "response": 7}
    assert all(r["uri"].startswith("https://") for r in recs)

    pages = read_warc_pages(spark, str(tmp_path)).collect()
    assert len(pages) == 5  # the image/png response is dropped
    got = {(p["uri"], p["status"], p["title"], p["text"]) for p in pages}
    assert ("https://a.example.com/p/1", 200, "t1",
            "page 1 of a.example.com") in got
    assert all(s == 200 for _u, s, _t, _x in got)


def test_crawl_to_curation_pipeline_end_to_end(spark, tmp_path):
    """The integration story: .warc.gz archives -> page table ->
    the EXISTING documents-table operators (exact + MinHash-LSH
    dedup) without any glue code — extracted pages are just rows."""
    from pyspark.sql import functions as F

    from finanalyzer_spark.operators.dedup import (
        exact_dedup_groups,
        minhash_lsh_pairs,
    )
    from finanalyzer_spark.operators.warc import (
        build_http_response,
        write_warc,
        write_warc_record,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the market watches every tick of the afternoon session"
    )
    pages = {
        0: base,
        1: base,                       # exact duplicate of 0
        2: base.replace("afternoon", "morning"),  # near-dup of 0
        3: "an entirely different document about spark physical plans "
           "broadcast joins and adaptive query execution at scale",
    }
    recs = [
        write_warc_record(
            "response",
            build_http_response(
                f"<html><body><p>{text}</p></body></html>".encode()
            ),
            uri=f"https://site.example.com/{i}",
        )
        for i, text in pages.items()
    ]
    (tmp_path / "crawl.warc.gz").write_bytes(write_warc(recs))

    from finanalyzer_spark.sources.warc_source import read_warc_pages

    docs = read_warc_pages(spark, str(tmp_path)).select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("uri"),
        F.col("text"),
    )
    docs = docs.withColumn(
        "doc_id",
        F.regexp_extract("uri", r"/(\d+)$", 1).cast("long"),
    )

    exact = exact_dedup_groups(docs, "text", "doc_id").collect()
    dup_groups = [r for r in exact if r["n_copies"] > 1]
    assert len(dup_groups) == 1
    assert (dup_groups[0]["keep_id"], dup_groups[0]["n_copies"]) == (0, 2)
    assert sum(r["n_copies"] for r in exact) == 4

    cand = minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16,
                             bands=8, k=3)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup surfaces
    assert not any(3 in p for p in pairs)      # distinct doc untouched
