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
corrupt/truncated member drops only itself. Member outputs feed ONE
incremental record buffer (``_parse_records_buffer``), so a record that
SPANS gzip members (re-packed archives) still parses; record END
boundaries are validated against the spec's two-CRLF separator, so a
corrupt Content-Length cannot silently swallow the records behind it.

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


def _parse_header_block(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for hline in block.split(b"\n")[1:]:  # line 0 is the WARC/1.x version
        k, _, v = hline.partition(b":")
        # header values are UTF-8 (URIs with non-ASCII chars must
        # round-trip); latin-1 only as the tolerant fallback
        try:
            val = v.strip().decode("utf-8")
        except UnicodeDecodeError:
            val = v.strip().decode("latin-1")
        headers[k.strip().lower().decode("latin-1")] = val
    return headers


def _record_from(headers: dict[str, str], body: bytes) -> dict | None:
    if headers.get("warc-type") != "response":
        return None
    url = headers.get("warc-target-uri")
    date = headers.get("warc-date")
    if not url or not date:
        return None
    ts = _parse_warc_date(date)
    if ts is None:
        return None
    # body = HTTP response: payload follows the first blank line
    sep = body.find(_CRLF + _CRLF)
    payload = body[sep + 4 :] if sep >= 0 else body
    return {"url": url, "warc_ts": ts, "html": payload}


def _parse_records_buffer(buf: bytes, final: bool) -> tuple[list[dict], int]:
    """Parse complete records out of ``buf``; return (records, bytes
    consumed). With ``final=False`` an INCOMPLETE trailing record is left
    unconsumed (it may span into the next gzip member); with ``final=True``
    everything is consumed and salvage-scanning applies.

    The record END is validated: after Content-Length bytes the spec says
    two CRLFs (EOF and a next header line are tolerated). A record whose
    claimed length lands anywhere else has a CORRUPT length — the parser
    resyncs at the next ``WARC/`` magic AFTER the bad header, so the
    records a too-large length would have swallowed are recovered.

    Content-injection surface (accepted recovery tradeoff): resync scans
    INSIDE the bad record's claimed body, so a response payload embedding a
    well-formed fake ``WARC/1.0 … response`` block can inject forged
    records — but ONLY when an adjacent record's length is already corrupt
    (records with valid lengths are consumed whole and their payload bytes
    are never scanned). Downstream must not treat WARC record fields as
    trusted provenance; the alternative (dropping everything after a bad
    length) loses real records to recover nothing."""
    out: list[dict] = []
    pos = 0
    n = len(buf)
    while True:
        h = buf.find(b"WARC/", pos)
        if h < 0:
            # keep a short tail so a header magic split across members
            # still matches next call
            return out, (n if final else max(pos, n - 4))
        he = buf.find(b"\r\n\r\n", h)
        if he < 0:
            return out, (n if final else h)  # incomplete header block
        headers = _parse_header_block(buf[h:he])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            length = None
        if length is None or length < 0:
            pos = h + 5  # bad/missing Content-Length: resync at next magic
            continue
        body_start = he + 4
        body_end = body_start + length
        if body_end > n:
            if not final:
                return out, h  # spanning record: wait for the next member
            pos = h + 5  # truncated at EOF: salvage-scan the claimed body
            continue
        after = buf[body_end : body_end + 8]
        boundary_ok = (
            body_end == n
            or after.startswith(_CRLF + _CRLF)
            or after.lstrip(b"\r\n").startswith(b"WARC/")
            or after.lstrip(b"\r\n") == b""
        )
        if not boundary_ok:
            pos = h + 5  # corrupt length: recover the swallowed records
            continue
        rec = _record_from(headers, buf[body_start:body_end])
        if rec is not None:
            out.append(rec)
        pos = body_end


def _iter_records_incremental(chunks: Iterator[bytes]) -> Iterator[dict]:
    """Drive the buffer parser over a chunk stream: memory is O(largest
    record) — a record spanning gzip members buffers until complete; only
    a corrupt mid-stream length can hold the tail until EOF salvage."""
    buf = b""
    for chunk in chunks:
        buf += chunk
        recs, consumed = _parse_records_buffer(buf, final=False)
        yield from recs
        buf = buf[consumed:]
    recs, _consumed = _parse_records_buffer(buf, final=True)
    yield from recs


def iter_warc_records(stream: io.BufferedIOBase) -> Iterator[dict]:
    """STREAMING record reader over a file-like object: O(one record)
    memory, so a 1 GB shard never materializes decompressed in the worker.
    Yields response records {url, warc_ts, html}; tolerant — corrupt
    lengths/headers cost the one record, never the rest of the stream."""
    return _iter_records_incremental(iter(lambda: stream.read(1 << 16), b""))


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


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (gzipped members or plain). Tolerant: corrupt or
    truncated members/records cost only themselves (plus, worst case, the
    record straddling a dropped member — the parser resyncs at the next
    'WARC/' magic, and END-boundary validation recovers records a corrupt
    Content-Length would otherwise swallow); a scan task must not die on
    one bad shard (the lineage counters surface the shortfall). Records
    MAY span gzip members: member outputs feed one incremental buffer."""
    if data[:2] == b"\x1f\x8b":
        return list(_iter_records_incremental(_iter_gzip_members(data)))
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
