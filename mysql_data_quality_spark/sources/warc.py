"""WARC source: read Common-Crawl-style web archives straight into the
pages frame (url, warc_ts, html, text, lang).

The WARC byte layout is public (ISO 28500 / the WARC 1.0-1.1 spec):
records are a header block (``WARC/1.0`` version line + ``Name: Value``
lines + blank line) followed by ``Content-Length`` payload bytes and a
``\\r\\n\\r\\n`` terminator; Common Crawl stores one gzip MEMBER per
record (a legal multi-member gzip stream).  Both layouts — plain
concatenation and per-record gzip members — are handled; ``response``
records carry an HTTP response as payload, whose body (after the HTTP
header block, de-chunked if ``Transfer-Encoding: chunked``) is the html.

Spark shape: ``binaryFile`` source (one row per .warc/.warc.gz file —
Spark never splits these, matching the format: gzip members are only
discoverable by scanning) → ``mapInPandas`` parser that yields page
rows.  Parallelism therefore follows FILES, which is how every
production WARC pipeline shards (Common Crawl ships ~1 GB segment
files, tens of thousands per crawl).  The parser is a generator over
one in-memory file blob — binaryFile already materializes the blob, so
peak memory per task ≈ file size + one decompressed record.

No reference counterpart (the reference reads SQL tables); this is the
ingestion surface the north-star pipeline needs for raw crawl drops.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


class WarcFormatError(ValueError):
    """Blob is not a parseable WARC stream."""


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member by member (the
    Common-Crawl per-record layout).  zlib tells us where each member
    ends via ``unused_data``."""
    pos, n = 0, len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out = d.decompress(blob[pos:])
        except zlib.error as e:
            raise WarcFormatError(f"bad gzip member at offset {pos}") from e
        yield out + d.flush()
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def _split_records(stream: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per WARC record in a plain (decompressed)
    stream.  Header names are lower-cased; values stripped."""
    pos, n = 0, len(stream)
    while pos < n:
        # tolerate inter-record padding/newlines
        while pos < n and stream[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not stream[pos : pos + 5] == b"WARC/":
            raise WarcFormatError(
                f"expected WARC version line at offset {pos}, got "
                f"{stream[pos:pos + 16]!r}"
            )
        hdr_end = stream.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcFormatError("truncated WARC header block")
        headers: dict = {}
        lines = stream[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise WarcFormatError(
                "WARC record without a valid Content-Length"
            ) from e
        body_start = hdr_end + 4
        payload = stream[body_start : body_start + clen]
        if len(payload) != clen:
            raise WarcFormatError(
                f"record payload truncated: {len(payload)} of {clen} bytes"
            )
        yield headers, payload
        pos = body_start + clen


def _dechunk(body: bytes) -> bytes:
    """Minimal HTTP/1.1 chunked-transfer decoder."""
    out, pos, n = [], 0, len(body)
    while pos < n:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            break
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        out.append(body[nl + 2 : nl + 2 + size])
        pos = nl + 2 + size + 2  # skip chunk + trailing CRLF
    return b"".join(out)


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response header block from a ``response`` record's
    payload; de-chunk when the headers say so."""
    if not payload.startswith(b"HTTP/"):
        return payload  # resource records carry the raw document
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return b""
    head = payload[:sep].lower()
    body = payload[sep + 4 :]
    if b"transfer-encoding:" in head and b"chunked" in head:
        return _dechunk(body)
    return body


def _parse_ts(value: str | None):
    if not value:
        return None
    try:
        # WARC-Date is ISO-8601 UTC, e.g. 2024-01-17T08:15:30Z
        return datetime.fromisoformat(value.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        return None


def iter_warc_pages(
    blob: bytes, record_types: tuple[str, ...] = ("response",)
) -> Iterator[dict]:
    """Page dicts from one WARC file blob (gzip-member or plain)."""
    stream_iter: Iterator[bytes]
    if blob[:2] == b"\x1f\x8b":
        stream_iter = _gzip_members(blob)
    else:
        stream_iter = iter((blob,))
    for stream in stream_iter:
        for headers, payload in _split_records(stream):
            wtype = headers.get("warc-type")
            if wtype not in record_types:
                continue
            url = headers.get("warc-target-uri")
            if not url:
                continue
            if wtype == "conversion":
                # WET records: the payload IS the extracted text
                # (text/plain, utf-8) — fill `text` directly, no html
                yield {
                    "url": url,
                    "warc_ts": _parse_ts(headers.get("warc-date")),
                    "html": None,
                    "text": payload.decode("utf-8", "replace"),
                    "lang": None,
                }
                continue
            yield {
                "url": url,
                "warc_ts": _parse_ts(headers.get("warc-date")),
                "html": _http_body(payload),
                "text": None,
                "lang": None,
            }


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Pages frame from a directory/glob of ``.warc`` / ``.warc.gz``
    files.  ``text``/``lang`` are NULL — chain the HTML extraction stage
    (``cli filter --extract-html`` / ``functions/htmltext.py``) to fill
    ``text`` before the rule plan."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(iter_warc_pages(bytes(blob), record_types))
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["url", "warc_ts", "html", "text", "lang"],
                    )

    return files.mapInPandas(parse, PAGES_SCHEMA)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Pages frame from Common-Crawl WET files (``conversion`` records:
    the crawl's own extracted text).  ``text`` arrives filled, so the
    HTML-extraction stage is unnecessary — feed straight to the rule
    plan."""
    return read_warc(spark, path, record_types=("conversion",))


def build_wet(
    pages: list[tuple[str, str, str]], gzip_members: bool = False
) -> bytes:
    """Deterministic WET writer (test/round-trip twin of
    :func:`read_wet`): one ``conversion`` record per (url, iso_date,
    text)."""
    records = []
    for url, iso_date, text in pages:
        payload = text.encode("utf-8")
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {iso_date}\r\n".encode()
            + b"Content-Type: text/plain\r\n"
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )
        records.append(rec)
    if gzip_members:
        import gzip as _gz

        return b"".join(
            _gz.compress(r, mtime=0) for r in records
        )
    return b"".join(records)


def build_warc(
    pages: list[tuple[str, str, bytes]], gzip_members: bool = False
) -> bytes:
    """Deterministic WARC writer (the test/round-trip twin of the
    reader): one ``response`` record per (url, iso_date, html) with a
    minimal HTTP/1.1 header block."""
    import gzip as _gzip

    out = []
    for url, date, html in pages:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
            + html
        )
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + date.encode() + b"\r\n"
            b"Content-Type: application/http;msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        )
        rec = hdr + http + b"\r\n\r\n"
        out.append(
            _gzip.compress(rec, mtime=0) if gzip_members else rec
        )
    return b"".join(out)
