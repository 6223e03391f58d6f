"""WARC source: read Common-Crawl-style .warc / .warc.gz into the pages
schema (SURVEY §2.1 storage sources; the north-rule input is a crawl, and
WARC is its native interchange format).

Plan shape: ``binaryFile`` scan (one WARC shard per task — exactly how
crawl archives are laid out: many ~1 GB shards) → ``mapInPandas`` record
parser (stdlib ``gzip``; WARC .gz files are per-record gzip members, which
``gzip.decompress`` handles as concatenated streams) → pages rows
``(url, warc_ts, html, text, lang)``. Payloads stay inside the scan task —
never shuffled — so extraction composes exactly like the parquet source.

The writer exists for tests and round-tripping: spec-correct WARC/1.0
response records (deterministic record ids from the payload hash, no
uuid4/now()).
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ocr_model_spark.sources.pages import PAGES_SCHEMA

_CRLF = b"\r\n"


# ------------------------------------------------------------------ writer


def build_warc(rows: list[dict], compress: bool = True) -> bytes:
    """rows: [{url, warc_ts, html}] → WARC/1.0 bytes (one gzip member per
    record when ``compress`` — the standard .warc.gz layout)."""
    out = bytearray()
    for r in rows:
        payload = bytes(r["html"]) if r["html"] is not None else b""
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: application/octet-stream" + _CRLF
            + b"Content-Length: " + str(len(payload)).encode() + _CRLF
            + _CRLF
            + payload
        )
        ts = r["warc_ts"]
        if isinstance(ts, str):
            date = ts
        else:
            date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        rec_id = hashlib.sha256(
            (r["url"] + ":" + date).encode()
        ).hexdigest()  # deterministic — never uuid4
        header = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + b"WARC-Record-ID: <urn:sha256:" + rec_id.encode() + b">" + _CRLF
            + b"WARC-Date: " + date.encode() + _CRLF
            + b"WARC-Target-URI: " + r["url"].encode() + _CRLF
            + b"Content-Type: application/http; msgtype=response" + _CRLF
            + b"Content-Length: " + str(len(http)).encode() + _CRLF
            + _CRLF
        )
        record = header + http + _CRLF + _CRLF
        out += gzip.compress(record, mtime=0) if compress else record
    return bytes(out)


def write_warc_files(
    pages_df: DataFrame, out_dir: str, rows_per_file: int = 1000
) -> list[str]:
    """Small-extract WARC writer (driver-side, test/round-trip tool):
    chunks rows into .warc.gz shards. Deterministic bytes (gzip mtime=0)."""
    import os

    rows = pages_df.select("url", "warc_ts", "html").collect()
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(0, len(rows), rows_per_file):
        chunk = [r.asDict() for r in rows[i : i + rows_per_file]]
        p = os.path.join(out_dir, f"shard-{i // rows_per_file:05d}.warc.gz")
        with open(p, "wb") as f:
            f.write(build_warc(chunk))
        paths.append(p)
    return paths


# ------------------------------------------------------------------ reader


def iter_warc_records(stream: io.BufferedIOBase) -> Iterator[dict]:
    """STREAMING record reader over a file-like object: O(one record)
    memory, so a 1 GB shard never materializes decompressed in the worker.
    Yields response records {url, warc_ts, html}; tolerant — short/broken
    trailing records end iteration instead of raising."""
    while True:
        # seek the next record header line (skip inter-record CRLFs/junk)
        line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if not hline:
                return
            if hline in (_CRLF, b"\n", b""):
                break
            k, _, v = hline.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            return
        body = stream.read(length)
        if len(body) < length:
            return  # truncated trailing record
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        date = headers.get("warc-date")
        if not url or not date:
            continue
        # body = HTTP response: payload follows the first blank line
        sep = body.find(_CRLF + _CRLF)
        payload = body[sep + 4 :] if sep >= 0 else body
        try:
            ts = dt.datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            continue
        yield {"url": url, "warc_ts": ts, "html": payload}


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member by member: memory is
    O(one member) — for spec .warc.gz that is one RECORD — and a corrupt
    or truncated member ends iteration with every prior member intact
    (GzipFile/BufferedReader would instead fail the whole read: their
    readahead crosses member boundaries eagerly)."""
    import zlib

    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error:
            return
        if not d.eof:
            if chunk:
                yield chunk  # truncated final member: keep what decoded
            return
        yield chunk
        rest = d.unused_data
        if not rest:
            return
        pos = n - len(rest)


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (gzipped members or plain). Tolerant: corrupt or
    truncated members/records yield the records decoded so far — a scan
    task must not die on one bad shard (the lineage counters surface the
    shortfall). Records are assumed not to SPAN gzip members (true for
    spec .warc.gz — one record per member — and trivially for plain or
    single-member files)."""
    out: list[dict] = []
    if data[:2] == b"\x1f\x8b":
        for member in _iter_gzip_members(data):
            out.extend(iter_warc_records(io.BufferedReader(io.BytesIO(member))))
        return out
    return list(iter_warc_records(io.BufferedReader(io.BytesIO(data))))


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC shards → pages-schema DataFrame. One shard per scan task
    (binaryFile); parsing happens inside the task, payloads never shuffle."""

    from pyspark.sql import types as T

    out_schema = T.StructType(
        PAGES_SCHEMA.fields + [T.StructField("input_file", T.StringType())]
    )

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(content)):
                    rows.append(
                        {
                            "url": rec["url"],
                            "warc_ts": rec["warc_ts"],
                            "html": rec["html"],
                            "text": None,
                            "lang": None,
                            # scan-time lineage: input_file_name() is blank
                            # after mapInPandas, so carry the shard path
                            "input_file": shard,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.warc*").load(path)
    return files.select("path", "content").mapInPandas(parse_files, out_schema)
