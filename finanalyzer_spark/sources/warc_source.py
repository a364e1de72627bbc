"""WARC file source — the production entry for crawl ingest.

`read_warc` scans .warc / .warc.gz files with Spark's `binaryFile`
source (one task per archive file — the right grain for the Common
Crawl layout, which ships ~1 GB archives precisely so that
file-per-task parallelism works without byte-range splitting) and
explodes each archive into WARC records via operators/warc.parse_warc
inside one Arrow kernel.  `read_warc_pages` goes one step further to
the (url, status, html) page table a curation pipeline starts from.

Payload bytes stay inside the kernel partition — only the requested
columns leave it; nothing shuffles archive bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """(archive, record_no, rtype, uri, date, content_type, block)
    for every record of every WARC file under `path`."""
    files = spark.read.format("binaryFile").load(path)

    def explode_records(batches):
        import pandas as pd

        from ..operators.warc import parse_warc

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(parse_warc(bytes(content))):
                    rows.append(
                        {
                            "archive": fpath,
                            "record_no": i,
                            "rtype": rec["type"],
                            "uri": rec["uri"],
                            "date": rec["date"],
                            "content_type": rec["content_type"],
                            "block": rec["block"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "archive", "record_no", "rtype", "uri", "date",
                    "content_type", "block",
                ],
            )

    return files.select("path", "content").mapInPandas(
        explode_records,
        schema=(
            "archive string, record_no long, rtype string, uri string,"
            " date string, content_type string, block binary"
        ),
    )


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """(archive, uri, status, title, text) for every HTML response
    record — the page table curation starts from.  Non-HTML responses
    and non-response records are dropped in the kernel."""
    files = spark.read.format("binaryFile").load(path)

    def extract_pages(batches):
        import pandas as pd

        from ..operators.warc import (
            extract_html_text,
            parse_warc,
            split_http_response,
        )

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(content)):
                    if rec["type"] != "response":
                        continue
                    try:
                        status, headers, body = split_http_response(
                            rec["block"]
                        )
                    except ValueError:
                        continue
                    if not headers.get("content-type", "").startswith(
                        "text/html"
                    ):
                        continue
                    title, text = extract_html_text(
                        body.decode("utf-8", errors="replace")
                    )
                    rows.append(
                        {
                            "archive": fpath,
                            "uri": rec["uri"],
                            "status": status,
                            "title": title,
                            "text": text,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["archive", "uri", "status", "title", "text"],
            )

    return files.select("path", "content").mapInPandas(
        extract_pages,
        schema=(
            "archive string, uri string, status int, title string,"
            " text string"
        ),
    )
