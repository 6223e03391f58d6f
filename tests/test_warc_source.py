"""WARC source: spec round-trip, tolerance, and pipeline composition."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from ocr_model_spark.operators.extract import extract_pages
from ocr_model_spark.sources.warc import build_warc, parse_warc, read_warc, write_warc_files


def test_warc_roundtrip_byte_identical(spark, pages_path, tmp_path):
    # read via read_pages so both sides carry the same TIMESTAMP (ltz)
    # type — mixed LTZ/NTZ comparisons would be session-tz-dependent
    from ocr_model_spark.sources.pages import read_pages

    src = read_pages(spark, pages_path)
    paths = write_warc_files(src, str(tmp_path / "warc"), rows_per_file=120)
    assert len(paths) == 3  # 300 rows / 120
    back = read_warc(spark, str(tmp_path / "warc"))
    a = src.select("url", "warc_ts", "html").toPandas().sort_values("url").reset_index(drop=True)
    b = back.select("url", "warc_ts", "html").toPandas().sort_values("url").reset_index(drop=True)
    assert len(a) == len(b) == 300
    assert (a["url"] == b["url"]).all()
    assert (a["warc_ts"] == b["warc_ts"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["html"], b["html"]))


def test_warc_feeds_extraction_pipeline(spark, pages_path, tmp_path):
    src = spark.read.parquet(pages_path)
    write_warc_files(src, str(tmp_path / "warc"))
    docs = extract_pages(read_warc(spark, str(tmp_path / "warc")))
    assert docs.count() == 300
    assert docs.filter("ok").count() > 280  # only image payloads fail


def test_warc_writer_is_deterministic():
    import datetime as dt

    rows = [
        {"url": "https://a/x", "warc_ts": dt.datetime(2024, 3, 1), "html": b"<p>hi</p>"},
        {"url": "https://b/y", "warc_ts": dt.datetime(2024, 3, 2), "html": b"%PDF-1.4"},
    ]
    assert build_warc(rows) == build_warc(rows)  # gzip mtime pinned to 0


def test_warc_parser_tolerates_junk_and_non_response_records():
    import datetime as dt

    rows = [{"url": "https://a/x", "warc_ts": dt.datetime(2024, 3, 1), "html": b"payload"}]
    plain = build_warc(rows, compress=False)
    warcinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    recs = parse_warc(warcinfo + plain + b"WARC/1.0\r\ntrunca")  # junk tail
    assert len(recs) == 1
    assert recs[0]["url"] == "https://a/x" and recs[0]["html"] == b"payload"
    # gzipped multi-member stream parses identically
    assert parse_warc(gzip.compress(warcinfo, mtime=0) + build_warc(rows)) == recs


def test_cli_ingests_warc_with_shard_lineage(spark, pages_path, tmp_path):
    """main.py --input-format warc: versioned snapshot commit from WARC
    shards, lineage input_file = shard paths (input_file_name() is blank
    after mapInPandas, so the source carries it)."""
    from ocr_model_spark.pipeline import run_versioned
    from ocr_model_spark.sources.snapshots import read_manifest, read_snapshot

    src = spark.read.parquet(pages_path)
    write_warc_files(src, str(tmp_path / "warc"), rows_per_file=120)
    pages = read_warc(spark, str(tmp_path / "warc"))
    version = run_versioned(
        spark, str(tmp_path / "warc"), str(tmp_path / "snap"), pages=pages
    )
    assert version == 0
    snap = read_snapshot(spark, str(tmp_path / "snap"))
    assert snap.count() == 300
    lineage = (read_manifest(str(tmp_path / "snap")) or {}).get("lineage", [])
    files = {r["input_file"] for r in lineage}
    assert files and all(f.endswith(".warc.gz") for f in files)
    # resume: second run over the same shards commits nothing
    assert run_versioned(
        spark, str(tmp_path / "warc"), str(tmp_path / "snap"),
        pages=read_warc(spark, str(tmp_path / "warc")),
    ) is None


def test_warc_unicode_urls_and_microseconds_roundtrip(spark, tmp_path):
    """Non-ASCII URIs and sub-second timestamps must survive the WARC
    round trip (UTF-8 header values; fractional WARC-Date)."""
    import datetime as dt

    rows = [
        ("https://ex.com/añejo/π", dt.datetime(2024, 3, 1, 12, 0, 0, 123456), b"<p>a</p>"),
        ("https://ex.com/plain", dt.datetime(2024, 3, 1, 12, 0, 1), b"<p>b</p>"),
    ]
    src = spark.createDataFrame(
        rows, "url STRING, warc_ts TIMESTAMP_NTZ, html BINARY"
    )
    write_warc_files(src, str(tmp_path / "w"))
    got = (
        read_warc(spark, str(tmp_path / "w"))
        .selectExpr("url", "unix_micros(warc_ts) AS us")  # instant: tz-independent
        .orderBy("url")
        .collect()
    )
    epoch = dt.datetime(1970, 1, 1)
    assert got[0]["url"] == "https://ex.com/añejo/π"
    assert got[0]["us"] == (dt.datetime(2024, 3, 1, 12, 0, 0, 123456) - epoch) // dt.timedelta(microseconds=1)
    assert got[1]["us"] == (dt.datetime(2024, 3, 1, 12, 0, 1) - epoch) // dt.timedelta(microseconds=1)


def test_warc_bytes_are_session_timezone_independent(spark, tmp_path):
    """Shard bytes must not bake in the session timezone: writing the same
    frame under two session timezones yields identical files."""
    import datetime as dt

    src = spark.createDataFrame(
        [("https://a/x", dt.datetime(2024, 3, 1, 6, 30), b"payload")],
        "url STRING, warc_ts TIMESTAMP_NTZ, html BINARY",
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        write_warc_files(src, str(tmp_path / "utc"))
        spark.conf.set("spark.sql.session.timeZone", "Australia/Eucla")
        write_warc_files(src, str(tmp_path / "eucla"))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    a = open(str(tmp_path / "utc" / "shard-00000.warc.gz"), "rb").read()
    b = open(str(tmp_path / "eucla" / "shard-00000.warc.gz"), "rb").read()
    assert a == b


def test_main_cli_warc_end_to_end(spark, pages_path, tmp_path, capsys, monkeypatch):
    """Drive main() itself with --input-format warc: argparse wiring, the
    read_warc import, and the pages= plumbing into run_versioned."""
    import json

    from ocr_model_spark.main import main
    from ocr_model_spark.sources.pages import read_pages

    # main()'s finally stops the session; getOrCreate hands it OUR fixture
    # session, so neuter stop() for the duration of this test
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    write_warc_files(read_pages(spark, pages_path), str(tmp_path / "warc"))
    rc = main(
        [
            "--input", str(tmp_path / "warc"),
            "--input-format", "warc",
            "--output", str(tmp_path / "snap"),
            "--master", "local[4]",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "batch" and out["committed_version"] == 0
    assert out["snapshot_rows"] == 300 and out["delta_docs"] == 300


def test_warc_record_spanning_gzip_members():
    """A record whose bytes are split across TWO gzip members (re-packed
    archive shape) must still parse: members chain into one stream."""
    import datetime as dt
    import gzip

    from ocr_model_spark.sources.warc import build_warc, parse_warc

    rows = [
        {"url": f"https://ex.com/{i}", "warc_ts": dt.datetime(2024, 1, 1, i), "html": b"x" * 50}
        for i in range(3)
    ]
    plain = build_warc(rows, compress=False)
    # split mid-record-1: three members at arbitrary byte cuts
    cut1 = len(plain) // 3
    cut2 = cut1 + 40  # inside record 1's bytes
    shard = (
        gzip.compress(plain[:cut1], mtime=0)
        + gzip.compress(plain[cut1:cut2], mtime=0)
        + gzip.compress(plain[cut2:], mtime=0)
    )
    recs = parse_warc(shard)
    assert [r["url"] for r in recs] == [r["url"] for r in rows]
    assert all(r["html"] == b"x" * 50 for r in recs)


def test_warc_bad_content_length_resyncs():
    """A record with an unparsable Content-Length loses itself only —
    the reader resyncs at the next WARC/ header (was: whole-stream drop)."""
    import datetime as dt

    from ocr_model_spark.sources.warc import build_warc, parse_warc

    good = lambda i: {
        "url": f"https://ex.com/{i}",
        "warc_ts": dt.datetime(2024, 1, 1),
        "html": b"payload",
    }
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad.example/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: NOT_A_NUMBER\r\n\r\n"
        b"junk body without length\r\n\r\n"
    )
    data = (
        build_warc([good(0)], compress=False)
        + bad
        + build_warc([good(1)], compress=False)
    )
    recs = parse_warc(data)
    assert [r["url"] for r in recs] == ["https://ex.com/0", "https://ex.com/1"]


def test_warc_writer_handles_null_warc_ts(spark, tmp_path):
    """PAGES_SCHEMA allows NULL warc_ts: the writer substitutes the epoch
    instead of crashing (ADVICE r2)."""
    from pyspark.sql import types as T

    from ocr_model_spark.sources.warc import read_warc, write_warc_files

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame([("https://n.example/x", None, b"<p>hi</p>")], schema)
    out = str(tmp_path / "nullts")
    write_warc_files(df, out)
    back = read_warc(spark, out).collect()
    assert len(back) == 1 and back[0]["url"] == "https://n.example/x"
    assert back[0]["warc_ts"] is not None  # epoch substituted


def test_warc_inflated_content_length_recovers_following_records():
    """A record whose Content-Length is corrupted UPWARD must not swallow
    the records behind it: end-boundary validation resyncs inside the
    claimed body and recovers them (code-review r3 finding)."""
    import datetime as dt
    import gzip as _gzip

    rows = [
        {"url": f"https://ex.com/{i}", "warc_ts": dt.datetime(2024, 1, 1), "html": b"p" * 30}
        for i in range(5)
    ]
    plain = build_warc(rows, compress=False)
    # inflate record 0's Content-Length from its true value to a huge one
    import re

    m = re.search(rb"Content-Length: (\d+)\r\n\r\nHTTP", plain)
    true_len = m.group(1)
    corrupted = plain.replace(
        b"Content-Length: " + true_len + b"\r\n\r\nHTTP",
        b"Content-Length: 9" + true_len + b"\r\n\r\nHTTP",
        1,
    )
    # plain file AND per-record-gzipped shard both recover records 1..4
    for data in (corrupted, b"".join(
        _gzip.compress(corrupted[i : i + 200], mtime=0)
        for i in range(0, len(corrupted), 200)
    )):
        recs = parse_warc(data)
        urls = [r["url"] for r in recs]
        assert urls == [f"https://ex.com/{i}" for i in range(1, 5)], urls
