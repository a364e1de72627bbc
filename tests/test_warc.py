"""WARC reader/writer + HTML extraction (operators/warc.py).

The parser is certified against a FOREIGN vector: a WARC/1.0 archive
written out longhand in this file per ISO 28500 §4 (not through
write_warc_record), including the classic trap — a content block that
itself contains CRLFCRLF — so Content-Length-driven framing is proven,
not header-scanning.  The writer is then checked against the same
layout and round-tripped.
"""

from __future__ import annotations

import gzip

import pytest

from finanalyzer_spark.operators.warc import (
    build_http_request,
    build_http_response,
    extract_html_text,
    parse_warc,
    split_http_response,
    write_warc,
    write_warc_record,
)

#: hand-written per spec — NOT produced by write_warc_record.  The
#: second record's block contains a CRLFCRLF of its own.
FOREIGN = (
    b"WARC/1.0\r\n"
    b"WARC-Type: warcinfo\r\n"
    b"WARC-Record-ID: <urn:uuid:11111111-2222-3333-4444-555555555555>\r\n"
    b"WARC-Date: 2024-03-05T09:30:00Z\r\n"
    b"Content-Type: application/warc-fields\r\n"
    b"Content-Length: 29\r\n"
    b"\r\n"
    b"software: handcrafted/1.0\r\n\r\n"
    b"\r\n"
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Target-URI: https://example.org/a\r\n"
    b"WARC-Record-ID: <urn:uuid:aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee>\r\n"
    b"WARC-Date: 2024-03-05T09:30:01Z\r\n"
    b"Content-Type: application/http; msgtype=response\r\n"
    b"Content-Length: 79\r\n"
    b"\r\n"
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/plain\r\n"
    b"Content-Length: 14\r\n"
    b"\r\n"
    b"hello\r\n\r\nworld"
    b"\r\n\r\n"
)


def test_foreign_vector_parses_exactly():
    recs = list(parse_warc(FOREIGN))
    assert [r["type"] for r in recs] == ["warcinfo", "response"]
    assert recs[0]["block"] == b"software: handcrafted/1.0\r\n\r\n"
    assert recs[1]["uri"] == "https://example.org/a"
    # Content-Length framing must carry the embedded CRLFCRLF through
    status, headers, body = split_http_response(recs[1]["block"])
    assert status == 200
    assert headers["content-type"] == "text/plain"
    assert body == b"hello\r\n\r\nworld"


def test_foreign_vector_parses_from_gzip_members():
    # whole-file gzip AND a two-member split both parse
    assert [r["type"] for r in parse_warc(gzip.compress(FOREIGN))] == [
        "warcinfo",
        "response",
    ]
    cut = FOREIGN.index(b"WARC/1.0", 10)
    two = gzip.compress(FOREIGN[:cut]) + gzip.compress(FOREIGN[cut:])
    assert [r["type"] for r in parse_warc(two)] == ["warcinfo", "response"]


def test_writer_roundtrip_both_layouts():
    req = write_warc_record(
        "request",
        build_http_request("/x", "h.example.com"),
        uri="https://h.example.com/x",
        content_type="application/http; msgtype=request",
    )
    resp = write_warc_record(
        "response",
        build_http_response(b"<html><body>hi</body></html>"),
        uri="https://h.example.com/x",
    )
    for gz in (False, True):
        recs = list(parse_warc(write_warc([req, resp], gzip_members=gz)))
        assert [r["type"] for r in recs] == ["request", "response"]
        st, hd, body = split_http_response(recs[1]["block"])
        assert (st, body) == (200, b"<html><body>hi</body></html>")
    # determinism (mtime pinned): same input -> same .warc.gz bytes
    assert write_warc([req, resp]) == write_warc([req, resp])


def test_truncation_fails_closed():
    with pytest.raises(ValueError, match="truncated WARC content"):
        list(parse_warc(FOREIGN[:-20]))
    with pytest.raises(ValueError, match="truncated gzip"):
        list(parse_warc(gzip.compress(FOREIGN)[:-5]))
    with pytest.raises(ValueError, match="WARC"):
        list(parse_warc(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_html_extraction_entities_nesting_and_skips():
    title, text = extract_html_text(
        "<html><head><title>T &amp; t</title><style>b{}</style></head>"
        "<body><h1>A&#x41;</h1><div>x<span>y</span>z</div>"
        "<script>var s='<p>not text</p>';</script>"
        "<noscript>nope</noscript><p>5 &lt; 6</p></body></html>"
    )
    assert title == "T & t"
    assert text == "AAxyz5 < 6"


def test_html_extraction_tolerates_malformed_markup():
    # unclosed tags, stray close, bare ampersand — extraction still
    # yields every text node (HTMLParser is forgiving by design)
    _, text = extract_html_text("<body><p>a & b<div>c</body></html></p>")
    assert "a & b" in text and "c" in text


def test_surt_keys():
    from finanalyzer_spark.operators.warc import surt

    assert surt("https://www.a.example.com/p?x=1") == "com,example,a)/p?x=1"
    assert surt("HTTP://Example.COM") == "com,example)/"
    assert surt("https://example.org/a/b") == "org,example)/a/b"


def test_cdx_records_offsets_round_trip():
    """Every CDX row's (offset, length) must slice a self-contained
    gzip member out of the archive whose single record matches the
    indexed fields — the random-access contract a 100 TB reader
    relies on."""
    from finanalyzer_spark.operators.warc import (
        parse_warc,
        warc_cdx_records,
    )

    recs = []
    for i in range(4):
        uri = f"https://www.site{i}.example.com/page/{i}"
        body = f"<html><body>doc {i}</body></html>".encode()
        recs.append(
            write_warc_record("response", build_http_response(body), uri=uri)
        )
    archive = write_warc(recs, gzip_members=True)
    rows = list(warc_cdx_records(archive))
    assert len(rows) == 4
    assert [r["surt"] for r in rows] == [
        f"com,example,site{i})/page/{i}" for i in range(4)
    ]
    assert all(r["status"] == 200 for r in rows)
    assert all(r["mime"].startswith("text/html") for r in rows)
    # offsets tile the archive exactly
    assert rows[0]["offset"] == 0
    assert sum(r["length"] for r in rows) == len(archive)
    for r in rows:
        member = archive[r["offset"] : r["offset"] + r["length"]]
        (only,) = parse_warc(member)
        assert only["uri"] == r["url"]

    # plain (uncompressed) archives index as one pseudo-member
    plain_rows = list(
        warc_cdx_records(write_warc(recs, gzip_members=False))
    )
    assert len(plain_rows) == 4
    assert [r["member_record"] for r in plain_rows] == [0, 1, 2, 3]
