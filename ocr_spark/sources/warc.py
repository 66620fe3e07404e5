"""WARC-style source: Common-Crawl archive files → the pages table.

Common Crawl ships as WARC files (ISO 28500): concatenated records,
each a header block (CRLF-separated ``Name: value`` lines, started by a
``WARC/1.0`` version line) + CRLF CRLF + a binary payload of
``Content-Length`` bytes + CRLF CRLF. The ``response`` records carry an
HTTP response (status line + HTTP headers + body) whose body is the
page HTML.

Spark mapping: ``spark.read.format("binaryFile")`` lists the archive
files (one row per file, content as bytes — files are the unit of
parallelism exactly as in a real CC ingest where each of the ~72k
WARC segments per crawl is one task), then an Arrow-batched
``mapInPandas`` splits records and emits ``input_hint``-shaped rows
(url, warc_ts, html, text, lang). Record splitting is pure byte work —
no external WARC library needed (none is installed here; the format is
simple enough that the parser below IS the implementation, not a stub).

Gzip: real CC files are per-record gzip members (``.warc.gz``); this
reader handles both plain ``.warc`` and gzip via ``gzip.decompress``
on the whole file (multi-member streams decompress concatenated, which
is exactly the per-record-member layout).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ocr_spark.sources import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield dicts {headers: {lower-name: value}, payload: bytes} for
    every record in a WARC byte stream. Tolerant: a malformed tail ends
    iteration instead of raising (a truncated archive must not kill the
    ingest)."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + 4
        payload = data[body_start:body_start + length]
        yield {"headers": headers, "payload": payload}
        pos = body_start + length


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP status line + headers from a response payload."""
    sep = payload.find(_CRLF2)
    return payload[sep + 4:] if sep >= 0 else payload


def _records_to_rows(name: str, data: bytes) -> list[dict]:
    if name.endswith(".gz"):
        data = gzip.decompress(data)
    rows = []
    for rec in parse_warc_records(data):
        h = rec["headers"]
        if h.get("warc-type") != "response":
            continue
        url = h.get("warc-target-uri")
        if not url:
            continue
        ts = None
        raw_ts = h.get("warc-date")
        if raw_ts:
            try:
                ts = pd.Timestamp(raw_ts).tz_localize(None) \
                    if pd.Timestamp(raw_ts).tzinfo is None \
                    else pd.Timestamp(raw_ts).tz_convert("UTC").tz_localize(None)
            except ValueError:
                ts = None
        rows.append({
            "url": url,
            "warc_ts": ts,
            "html": _http_body(rec["payload"]),
            "text": "",          # crawler text not present in WARC
            "lang": h.get("warc-identified-content-language", ""),
        })
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s)/glob → pages DataFrame (input_hint shape).

    Files are the unit of parallelism (binaryFile: one row per file);
    record splitting happens in an Arrow-batched kernel. For multi-GB
    archives set ``spark.sql.files.maxPartitionBytes`` high enough that
    binaryFile never splits a file (it doesn't by default)."""
    files = (spark.read.format("binaryFile")
             .load(path)
             .select("path", "content"))

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PAGES_SCHEMA.fields]
        for pdf in batches:
            out: list[dict] = []
            for name, data in zip(pdf["path"], pdf["content"]):
                out.extend(_records_to_rows(str(name), bytes(data)))
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(split, schema=PAGES_SCHEMA)


def write_warc(rows: list[dict], fh: io.BufferedIOBase) -> None:
    """Serialize pages rows to WARC response records (test/roundtrip
    helper — the inverse of parse_warc_records)."""
    for r in rows:
        body = r["html"] if isinstance(r["html"], (bytes, bytearray)) \
            else str(r["html"]).encode()
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + bytes(body))
        ts = r.get("warc_ts")
        ts_s = (ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                if ts is not None else "2025-01-01T00:00:00Z")
        head = (f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {ts_s}\r\n"
                f"WARC-Identified-Content-Language: {r.get('lang', '')}\r\n"
                f"Content-Length: {len(http)}\r\n\r\n").encode()
        fh.write(head + http + b"\r\n\r\n")
