"""WARC (Web ARChive, ISO 28500) reader/writer and HTML text
extraction — the Common Crawl ingest seam of a training-data pipeline.

The reference has no web-ingest surface at all (its only source is a
CSV ticker list + an HTTP price API,
/root/reference/finanalyzer/database/dataAcquisition.py:26-67); this
module is part of the extended LLM-pipeline tier: raw crawl archives →
(url, html) → extracted text → the documents-table operators
(curation, dedup, quality, language-ID) that already exist.

Everything here is stdlib-exact — `gzip`/`zlib` for the member
compression, `html.parser.HTMLParser` (a conformant HTML5 tokenizer)
for text extraction — so there is no hand-transcribed table to get
wrong, and tests pin a FOREIGN hand-written WARC byte vector rather
than relying on the writer twin alone (tests/test_warc.py).

Scale shape: one .warc.gz is a sequence of independent gzip members
(one per record, the Common Crawl convention) — so a 100 TB crawl
splits at member boundaries: a reader task seeks to any member start
and inflates forward without touching the rest of the file.  In this
repo the payloads ride an opaque binary column through Arrow-batched
mapInPandas kernels (plans/warcops.py), the same never-shuffle-payload
discipline as the media codecs.
"""

from __future__ import annotations

import gzip
import io
import zlib
from html.parser import HTMLParser

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# HTTP blocks (the payload convention of response/request records)
# ---------------------------------------------------------------------------


def build_http_response(
    body: bytes,
    content_type: str = "text/html; charset=utf-8",
    status: int = 200,
    reason: str = "OK",
) -> bytes:
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body


def build_http_request(path: str, host: str) -> bytes:
    return f"GET {path} HTTP/1.1\r\nHost: {host}\r\n\r\n".encode("ascii")


def split_http_response(block: bytes):
    """(status:int, headers:dict[str,str] lower-cased, body:bytes);
    ValueError when the block is not an HTTP/1.x response."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP block without header terminator")
    head, body = block[:sep], block[sep + 4 :]
    lines = head.split(_CRLF)
    parts = lines[0].split(b" ", 2)
    if not parts[0].startswith(b"HTTP/") or len(parts) < 2:
        raise ValueError("not an HTTP response status line")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
            "latin-1"
        )
    return status, headers, body


# ---------------------------------------------------------------------------
# WARC records
# ---------------------------------------------------------------------------


def write_warc_record(
    rtype: str,
    block: bytes,
    uri: str | None = None,
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """One WARC/1.0 record: named header fields, Content-Length, the
    content block, and the mandated two trailing CRLFCRLF (ISO 28500
    §4)."""
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode("ascii"),
        b"WARC-Record-ID: " + record_id.encode("ascii"),
        b"WARC-Date: " + date.encode("ascii"),
        b"Content-Type: " + content_type.encode("ascii"),
        b"Content-Length: " + str(len(block)).encode("ascii"),
    ]
    if uri is not None:
        head.insert(2, b"WARC-Target-URI: " + uri.encode("ascii"))
    return _CRLF.join(head) + _CRLF + _CRLF + block + _CRLF + _CRLF


def write_warc(records: list[bytes], gzip_members: bool = True) -> bytes:
    """Concatenate records into a .warc / .warc.gz byte stream.  With
    `gzip_members` each record is its OWN gzip member (mtime pinned to
    0 so output is deterministic) — the Common Crawl layout that makes
    the archive seekable/splittable at member boundaries."""
    if not gzip_members:
        return b"".join(records)
    out = bytearray()
    for rec in records:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        out += buf.getvalue()
    return bytes(out)


def _iter_plain_records(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        sep = buf.find(b"\r\n\r\n", pos)
        if sep < 0:
            raise ValueError("truncated WARC header")
        head = buf[pos:sep]
        lines = head.split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError("missing WARC/ version line")
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            fields[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            length = int(fields["content-length"])
        except KeyError:
            raise ValueError("WARC record without Content-Length") from None
        body_lo = sep + 4
        body_hi = body_lo + length
        if body_hi > n:
            raise ValueError("truncated WARC content block")
        yield {
            "type": fields.get("warc-type", ""),
            "uri": fields.get("warc-target-uri"),
            "record_id": fields.get("warc-record-id"),
            "date": fields.get("warc-date"),
            "content_type": fields.get("content-type"),
            "block": buf[body_lo:body_hi],
        }
        pos = body_hi


def parse_warc(buf: bytes):
    """Yield record dicts from a .warc or .warc.gz byte stream.  Gzip
    input may be one stream or many concatenated members; zlib's
    decompressobj walks member boundaries via unused_data, so both the
    member-per-record convention and whole-file compression parse."""
    if buf[:2] == b"\x1f\x8b":
        plain = bytearray()
        rest = bytes(buf)
        while rest:
            d = zlib.decompressobj(wbits=31)
            plain += d.decompress(rest)
            plain += d.flush()
            if not d.eof:
                raise ValueError("truncated gzip member in WARC")
            rest = d.unused_data
        buf = bytes(plain)
    yield from _iter_plain_records(buf)


def iter_warc_members(buf: bytes):
    """Yield ``(offset, compressed_length, plain_bytes)`` for every
    gzip member of a .warc.gz (or one pseudo-member covering a plain
    .warc).  The per-record member layout is what makes a 100 TB
    archive random-access: a CDX index row stores (offset, length)
    and a reader later fetches exactly that byte range and inflates
    one member — no scan."""
    if buf[:2] != b"\x1f\x8b":
        yield 0, len(buf), bytes(buf)
        return
    pos = 0
    rest = bytes(buf)
    while rest:
        d = zlib.decompressobj(wbits=31)
        plain = d.decompress(rest) + d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        consumed = len(rest) - len(d.unused_data)
        yield pos, consumed, plain
        pos += consumed
        rest = d.unused_data


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform — the key Common Crawl
    CDX indexes sort by: host labels reversed and comma-joined, a
    leading 'www.' dropped, scheme discarded, path/query appended
    after ')': https://www.a.example.com/p?x=1 ->
    com,example,a)/p?x=1."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    host = (parts.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split("."))) if host else ""
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    return f"{key}){path}"


def warc_cdx_records(buf: bytes):
    """CDX-shaped index rows for an archive: one dict per WARC record
    with ``(surt, url, rtype, status, mime, offset, length)`` —
    offset/length are the gzip-member byte range (or the record range
    in a plain .warc), so `buf[offset:offset+length]` round-trips the
    record through iter_warc_members/parse_warc."""
    for offset, clen, plain in iter_warc_members(buf):
        inner = 0
        for rec in _iter_plain_records(plain):
            status = mime = None
            if rec["type"] in ("response", "revisit") and rec[
                "block"
            ].startswith(b"HTTP/"):
                try:
                    status, headers, _body = split_http_response(
                        rec["block"]
                    )
                    mime = headers.get("content-type")
                except ValueError:
                    pass
            yield {
                "surt": surt(rec["uri"]) if rec["uri"] else None,
                "url": rec["uri"],
                "rtype": rec["type"],
                "status": status,
                "mime": mime,
                "offset": offset,
                "length": clen,
                "member_record": inner,
            }
            inner += 1


# ---------------------------------------------------------------------------
# HTML text extraction (stdlib html.parser — conformant tokenizer)
# ---------------------------------------------------------------------------

_SKIP_TAGS = {"script", "style", "noscript", "template"}


class _TextExtractor(HTMLParser):
    def __init__(self):
        # convert_charrefs=True (default) resolves &amp;/&#x..; into
        # text before handle_data — entity-exact extraction for free
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.text_parts: list[str] = []
        self._skip = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag == "title":
            self._in_title = True

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip:
            self._skip -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        elif not self._skip:
            self.text_parts.append(data)


def extract_html_text(html: str) -> tuple[str, str]:
    """(title, body_text): every text node outside
    script/style/noscript/template, entities resolved, node text
    verbatim (no whitespace normalization — that is a downstream
    curation decision, not an extraction one)."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return "".join(p.title_parts), "".join(p.text_parts)
