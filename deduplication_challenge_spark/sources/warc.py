"""WARC ingestion — read Common Crawl's native archive format (ISO 28500 /
the public WARC 1.0/1.1 specification) straight into the pipeline's pages
schema, so the engine consumes real crawl archives, not just parquet
exports.

Format essentials (from the public spec only):
  * a WARC file is a concatenation of records; Common Crawl ships each
    record as its own gzip member (a "member-gzipped" .warc.gz), which
    plain ``gzip.decompress`` handles transparently for the whole stream
    because Python's zlib consumes members back-to-back via
    ``decompressobj`` loops;
  * a record is ``WARC/1.x CRLF`` + header lines (``Name: value``) +
    ``CRLF CRLF`` + exactly ``Content-Length`` payload bytes + ``CRLF
    CRLF``;
  * ``response`` records carry an HTTP response (status line + headers +
    CRLF CRLF + body) as payload; the page bytes are the HTTP body.

Scale shape: ``spark.read.format('binaryFile')`` gives (path, content)
rows — one WARC file per row — and the record scan runs inside
``mapInPandas`` so archives are parsed executor-side, in parallel across
files, and the driver never sees payload bytes.  WARC files are not
splittable mid-record (gzip members would be, with an index; plain
concatenation is not), so per-FILE parallelism is the unit — exactly how
Common Crawl shards its crawls (tens of thousands of ~1 GB segment files),
which keeps every executor busy at any cluster size.
"""

from __future__ import annotations

import gzip
import io
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
#: WARC reads additionally carry the HTTP-declared charset so ingest's
#: extraction honors the transport encoding (functions/textnorm precedence:
#: BOM > this hint > <meta charset> > utf-8); parquet/JSONL pages without
#: the column behave exactly as before
PAGES_CHARSET_DDL = PAGES_DDL + ", charset string"

_CRLF = b"\r\n"
#: quoted parameter values are legal HTTP (charset="shift_jis") — consume
#: an optional opening quote so the token group never starts at the quote
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([^;\s\"']+)", re.IGNORECASE)


def _gunzip_all(data: bytes) -> bytes:
    """Decompress a possibly multi-member gzip stream (or passthrough).
    A corrupt/truncated member ends decompression with the intact prefix —
    damaged segment files are routine at crawl scale and must cost their
    own records only, never the task."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = io.BytesIO()
    pos = 0
    import zlib

    while pos < len(data):
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        try:
            out.write(d.decompress(data[pos:]))
            out.write(d.flush())
        except zlib.error:
            break
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return out.getvalue()


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, payload) per WARC record in a (possibly gzipped)
    WARC byte stream.  Malformed tails stop iteration rather than raise —
    a truncated archive yields its complete prefix records."""
    data = _gunzip_all(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if not data[pos : pos + 5] == b"WARC/":
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", errors="replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if body_start + length > n:
            break
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def _http_body(payload: bytes) -> tuple[bytes, str | None]:
    """HTTP response payload -> (body bytes, Content-Type charset or None).
    The header charset is the TRANSPORT encoding signal — real Common Crawl
    is full of latin-1 / windows-1252 / shift-jis pages whose only correct
    decode hint lives here; discarding it yields deterministic mojibake."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return payload, None
    charset = None
    for line in payload[:sep].split(_CRLF):
        if line[:13].lower() == b"content-type:":
            m = _CHARSET_RE.search(line)
            if m:
                charset = m.group(1).decode("ascii", errors="replace")
            break
    return payload[sep + 4 :], charset


def warc_bytes_to_pages(data: bytes, record_type: str = "response") -> list[dict]:
    """One WARC archive -> pages rows.

    ``record_type='response'``: raw-crawl WARC — the HTTP body becomes the
    ``html`` column, text extraction happens downstream in ingest.
    ``record_type='conversion'``: Common Crawl WET — the payload IS
    extracted utf-8 text, shipped in the ``text`` column with ``html``
    null (the pruned-ingest plan: the scan never touches html)."""
    rows = []
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != record_type:
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        ts = pd.to_datetime(headers.get("warc-date"), utc=True, errors="coerce")
        charset = None
        if record_type == "conversion":
            # WET conversion records are utf-8 text by the published spec
            html, text = None, payload.decode("utf-8", errors="replace")
        else:
            html, charset = _http_body(payload)
            text = None
        rows.append(
            {
                "url": url,
                "warc_ts": None if ts is pd.NaT else ts.tz_localize(None),
                "html": html,
                "text": text,
                "lang": None,
                "charset": charset,
            }
        )
    return rows


def read_warc(spark: SparkSession, path: str, record_type: str = "response") -> DataFrame:
    """WARC/WET file(s)/glob -> pages DataFrame (url, warc_ts, html, text,
    lang).  ``record_type='conversion'`` reads Common Crawl WET text
    records (pair with ``extract_pages(recompute_text=False)``).

    Parsing runs executor-side via mapInPandas over binaryFile rows; feed
    the result to DedupPipeline.run (ingest's html->text extraction and
    null-policy then apply as for any pages input)."""
    if record_type not in ("response", "conversion"):
        raise ValueError(f"record_type must be 'response' or 'conversion', got {record_type!r}")
    files = spark.read.format("binaryFile").load(path).select("content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang", "charset"]
        for pdf in batches:
            for content in pdf["content"]:
                rows = warc_bytes_to_pages(bytes(content), record_type)
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(gen, schema=PAGES_CHARSET_DDL)


def write_warc(rows: list[dict], gzip_members: bool = True) -> bytes:
    """pages-style rows -> WARC bytes (response records; test encoder so no
    external WARC library is needed, mirroring the codec modules)."""
    out = io.BytesIO()
    for r in rows:
        body = r.get("html") or b""
        ctype = "text/html" + (
            f"; charset={r['charset']}" if r.get("charset") else ""
        )
        # errors='replace': read_warc itself can surface U+FFFD in a
        # malformed header's charset token — round-tripping such rows must
        # not abort the writer
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + ctype.encode("ascii", errors="replace") + b"\r\n\r\n" + body
        )
        ts = r.get("warc_ts")
        date = (
            pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
            if ts is not None
            else "2025-01-01T00:00:00Z"
        )
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        rec = head + _CRLF + http + _CRLF + _CRLF
        out.write(gzip.compress(rec) if gzip_members else rec)
    return out.getvalue()
