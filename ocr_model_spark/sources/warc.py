"""WARC source: read Common-Crawl-style .warc / .warc.gz into the pages
schema (SURVEY §2.1 storage sources; the north-rule input is a crawl, and
WARC is its native interchange format).

Plan shape: ``binaryFile`` scan (one WARC shard per task — exactly how
crawl archives are laid out: many ~1 GB shards) → ``mapInPandas`` record
parser → pages rows ``(url, warc_ts, html, text, lang, input_file)``.
Payloads stay inside the scan task — never shuffled — so extraction
composes exactly like the parquet source.

Decompression is member-by-member (``_iter_gzip_members``): spec .warc.gz
puts one RECORD per gzip member, so worker memory stays O(record) and a
corrupt/truncated member drops only itself. Members chain into one
continuous byte stream (``_ChainedMemberStream``), so a record that SPANS
gzip members (re-packed archives) still parses; a whole-file-gzipped WARC
is one big member and also works.

Timestamps: WARC-Date strings are UTC; the reader emits them as the same
UTC instants ``read_pages`` produces for the parquet tables (TIMESTAMP,
wall-equals-UTC convention), and the writer derives date strings from
instant/wall micros — never from session-local renderings — so shard
BYTES and read values are session-timezone-independent.

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


def _format_warc_date(ts) -> str:
    """UTC 'Z' date string. Aware datetimes convert to UTC; NAIVE ones are
    taken as UTC wall time (the engine's NTZ convention). Microseconds are
    kept when present so round-trips are lossless."""
    if isinstance(ts, str):
        return ts
    if ts.tzinfo is not None:
        ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    base = ts.strftime("%Y-%m-%dT%H:%M:%S")
    if ts.microsecond:
        return f"{base}.{ts.microsecond:06d}Z"
    return base + "Z"


def _parse_warc_date(s: str) -> dt.datetime | None:
    """NAIVE UTC-wall datetime from a WARC-Date (with or without fractional
    seconds). ``read_warc`` attaches UTC tzinfo before handing it to Spark
    so the stored instant is session-timezone-independent."""
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


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
        date = _format_warc_date(r["warc_ts"])
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
    chunks rows into .warc.gz shards. Deterministic bytes (gzip mtime=0),
    INCLUDING across session timezones: timestamps leave Spark as
    ``unix_micros`` (an absolute instant) and are formatted in UTC —
    collecting TimestampType directly would bake the session timezone
    into the shard bytes."""
    import os

    from pyspark.sql import functions as F

    ts_type = dict(pages_df.dtypes).get("warc_ts", "timestamp_ntz")
    if ts_type == "timestamp":
        # ltz: absolute micros — session-independent by definition
        us = F.unix_micros("warc_ts")
    else:
        # ntz: wall-clock micros from the fixed epoch — session-independent
        us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', warc_ts)"
        )
    rows = pages_df.select("url", us.alias("warc_us"), "html").collect()
    epoch = dt.datetime(1970, 1, 1)
    rows = [
        {
            "url": r["url"],
            # PAGES_SCHEMA allows NULL warc_ts: substitute the epoch so the
            # record still ships (WARC-Date is mandatory) instead of
            # crashing the writer on timedelta(microseconds=None)
            "warc_ts": epoch + dt.timedelta(microseconds=r["warc_us"] or 0),
            "html": r["html"],
        }
        for r in rows
    ]
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(0, len(rows), rows_per_file):
        chunk = rows[i : i + rows_per_file]
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
            # header values are UTF-8 (URIs with non-ASCII chars must
            # round-trip); latin-1 only as the tolerant fallback
            try:
                val = v.strip().decode("utf-8")
            except UnicodeDecodeError:
                val = v.strip().decode("latin-1")
            headers[k.strip().lower().decode("latin-1")] = val
        cl = headers.get("content-length")
        try:
            length = int(cl) if cl is not None else None
        except ValueError:
            length = None
        if length is None or length < 0:
            # bad/missing Content-Length: RESYNC at the next 'WARC/' header
            # line (the outer loop skips non-header lines) instead of
            # abandoning the rest of the stream — one bad record must not
            # drop everything after it
            continue
        body = stream.read(length)
        if len(body) < length:
            continue  # truncated: next readline hits EOF (or resyncs)
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        date = headers.get("warc-date")
        if not url or not date:
            continue
        # body = HTTP response: payload follows the first blank line
        sep = body.find(_CRLF + _CRLF)
        payload = body[sep + 4 :] if sep >= 0 else body
        ts = _parse_warc_date(date)
        if ts is None:
            continue
        yield {"url": url, "warc_ts": ts, "html": payload}


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member by member: memory is
    O(one member) — for spec .warc.gz that is one RECORD. A CORRUPT member
    is dropped and iteration RESYNCHRONIZES at the next gzip magic, so one
    flipped byte loses only the member it corrupts, not the rest of the
    shard (GzipFile/BufferedReader would instead fail the whole read:
    their readahead crosses member boundaries eagerly). A TRUNCATED final
    member yields what decoded (its tail records are dropped by the
    record parser anyway).

    Feeds the decompressor bounded memoryview chunks: slicing the whole
    remaining buffer per member would copy O(shard) bytes per RECORD —
    quadratic on per-record-gzipped shards (measured 4.4× time per 2×
    input before the fix)."""
    import zlib

    view = memoryview(data)
    pos = 0
    n = len(data)
    chunk_size = 1 << 16
    while pos < n:
        member_start = pos
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        out = bytearray()
        member_done = False
        corrupt = False
        while pos < n:
            chunk = view[pos : pos + chunk_size]
            try:
                out += d.decompress(chunk)
            except zlib.error:
                corrupt = True
                break
            pos += len(chunk) - len(d.unused_data)
            if d.eof:
                member_done = True
                break
        if member_done:
            yield bytes(out)
            continue
        if corrupt:
            # drop this member, resync at the next gzip magic (may step
            # through false magics inside the corrupt bytes — pos strictly
            # advances, so this terminates)
            nxt = data.find(b"\x1f\x8b\x08", member_start + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        # input exhausted mid-member: truncated tail
        if out:
            yield bytes(out)
        return


class _ChainedMemberStream(io.RawIOBase):
    """Present the decompressed bytes of successive gzip members as ONE
    continuous stream, pulled lazily — so a WARC record that spans a
    member boundary (non-spec but seen in re-packed archives) parses
    seamlessly, while memory stays bounded by one member."""

    def __init__(self, members: Iterator[bytes]):
        self._members = members
        self._buf = b""
        self._pos = 0

    def readable(self) -> bool:  # pragma: no cover - io protocol
        return True

    def readinto(self, b) -> int:
        while self._pos >= len(self._buf):
            nxt = next(self._members, None)
            if nxt is None:
                return 0
            self._buf = nxt
            self._pos = 0
        n = min(len(b), len(self._buf) - self._pos)
        b[:n] = self._buf[self._pos : self._pos + n]
        self._pos += n
        return n


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (gzipped members or plain). Tolerant: corrupt or
    truncated members/records cost only themselves (plus, worst case, the
    record straddling a dropped member — the reader resyncs at the next
    'WARC/' header line); a scan task must not die on one bad shard (the
    lineage counters surface the shortfall). Records MAY span gzip
    members: members chain into one continuous stream."""
    if data[:2] == b"\x1f\x8b":
        stream = io.BufferedReader(_ChainedMemberStream(_iter_gzip_members(data)))
        return list(iter_warc_records(stream))
    return list(iter_warc_records(io.BufferedReader(io.BytesIO(data))))


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC shards → pages-schema DataFrame. One shard per scan task
    (binaryFile); parsing happens inside the task, payloads never shuffle."""

    from pyspark.sql import types as T

    # warc_ts matches read_pages: TIMESTAMP (ltz) carrying the UTC instant
    # of the WARC date's wall clock — yielding AWARE UTC datetimes makes
    # the instant session-timezone-independent, and both ingestion paths
    # produce the same column type (mixed LTZ/NTZ snapshots would coerce
    # silently and time-bucketing would turn session-dependent)
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
                            "warc_ts": rec["warc_ts"].replace(tzinfo=dt.timezone.utc),
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
