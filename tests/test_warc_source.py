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
