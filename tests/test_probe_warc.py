"""probe_media recognizes web archives (the crawl-ingest modality):
plain WARC by its version magic, .warc.gz by sniffing the first gzip
member's inflated head — and plain non-WARC gzip stays 'unknown'
(never a false archive tag)."""

from __future__ import annotations

import gzip

from finanalyzer_spark.operators.multimodal import probe_media
from finanalyzer_spark.operators.warc import (
    build_http_response,
    write_warc,
    write_warc_record,
)


def _one_record_archive(gz: bool) -> bytes:
    rec = write_warc_record(
        "response",
        build_http_response(b"<html>x</html>"),
        uri="https://example.org/x",
    )
    return write_warc([rec], gzip_members=gz)


def test_probe_identifies_plain_and_gzipped_warc():
    plain = probe_media(_one_record_archive(gz=False))
    assert (plain["kind"], plain["container"]) == ("archive", "warc")
    gzd = probe_media(_one_record_archive(gz=True))
    assert (gzd["kind"], gzd["container"]) == ("archive", "warc.gz")


def test_probe_does_not_mistake_other_gzip_for_warc():
    got = probe_media(gzip.compress(b"just text, definitely not a warc"))
    assert got["kind"] == "unknown"
    # truncated/corrupt gzip head also degrades to unknown, no raise
    assert probe_media(b"\x1f\x8b\x08\x00junk")["kind"] == "unknown"
