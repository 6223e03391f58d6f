"""Property-based kernel tests (hypothesis): the invariants that must hold
for ARBITRARY byte inputs, not just the synthetic corpus.

The reference has no property testing (SURVEY.md §5); these pin the
engine's hard guarantees:
  * extraction never raises — any bytes produce a well-formed result;
  * span offsets always slice the document text exactly;
  * the doc text is exactly the \\n\\n-join of region texts (HTML path);
  * determinism: same bytes → same result;
  * JVM sniff twin agreement is separately pinned on real payloads.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_model_spark.kernels.extract import extract_document
from ocr_model_spark.kernels.html_extract import extract_html

_RESULT_KEYS = {"text", "title", "encoding", "ok", "error", "metadata", "regions"}


def _check_wellformed(r: dict) -> None:
    assert _RESULT_KEYS <= set(r)
    assert isinstance(r["text"], str)
    for reg in r["regions"]:
        assert r["text"][reg["span_start"] : reg["span_end"]] == reg["text"]
        assert 0.0 <= reg["confidence"] <= 1.0
        assert reg["needs_review"] == (reg["confidence"] < 0.7)


@given(st.binary(max_size=4096))
@settings(max_examples=300, deadline=None)
def test_extract_document_total_on_arbitrary_bytes(data):
    r = extract_document(data)
    _check_wellformed(r)
    assert r == extract_document(data)  # deterministic


# markup-shaped fuzz: interleave tags, attrs, entities, and text
_tag = st.sampled_from(
    ["p", "div", "li", "ul", "h1", "a", "span", "script", "nav", "blockquote", "br", "title"]
)
_attr = st.sampled_from(["", ' class="sidebar"', ' id="main"', ' href="/x"', ' class="x y"'])
_word = st.text(alphabet="abcdefg &<>;#", min_size=0, max_size=12)
_piece = st.one_of(
    st.builds(lambda t, a: f"<{t}{a}>", _tag, _attr),
    st.builds(lambda t: f"</{t}>", _tag),
    _word,
    st.sampled_from(["<!-- c -->", "<!doctype html>", "&amp;", "&#65;", "<![CDATA[x]]>"]),
)


@given(st.lists(_piece, max_size=60))
@settings(max_examples=300, deadline=None)
def test_extract_html_invariants_on_markup_fuzz(pieces):
    payload = ("<html><body>" + "".join(pieces) + "</body></html>").encode("utf-8")
    r = extract_html(payload)
    assert r["ok"]
    _check_wellformed(r)
    # document text is exactly the join of region texts
    assert "\n\n".join(reg["text"] for reg in r["regions"]) == r["text"]
    # region indexes are dense and ordered
    assert [reg["idx"] for reg in r["regions"]] == list(range(len(r["regions"])))


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_native_pdf_reader_never_raises_unhandled(data):
    """Any %PDF-prefixed bytes produce a well-formed result dict — garbage
    degrades to a typed error, never an exception (the pandas UDF must not
    die on a malformed crawl payload)."""
    from ocr_model_spark.kernels.pdf_extract import extract_pdf

    r = extract_pdf(b"%PDF-1.5\n" + data)
    _check_wellformed(r)
    assert isinstance(r["ok"], bool)
    if not r["ok"]:
        assert r["error"]


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_docx_kernel_never_raises_unhandled(data):
    from ocr_model_spark.kernels.docx_extract import extract_docx

    r = extract_docx(b"PK\x03\x04" + data)
    _check_wellformed(r)
    if not r["ok"]:
        assert r["error"].startswith("docx-parse-failed")


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_warc_parser_never_raises(data):
    """Arbitrary bytes (optionally gzip-wrapped) parse to a list, never an
    exception — a corrupt crawl shard must not kill the scan task."""
    import gzip as _gzip

    from ocr_model_spark.sources.warc import parse_warc

    assert isinstance(parse_warc(data), list)
    assert isinstance(parse_warc(b"WARC/1.0\r\n" + data), list)
    assert isinstance(parse_warc(_gzip.compress(data, mtime=0)), list)


def test_warc_parser_tolerates_corrupt_gzip():
    import gzip as _gzip

    from ocr_model_spark.sources.warc import build_warc, parse_warc
    import datetime as dt

    rows = [
        # record body bigger than the 8 KiB read buffer, so the good member
        # fully decodes before the reader touches the corrupt tail
        {"url": "https://a/x", "warc_ts": dt.datetime(2024, 3, 1), "html": b"k" * 20000}
    ]
    good = build_warc(rows)
    # gzip magic + garbage: no exception, zero records
    assert parse_warc(b"\x1f\x8b\x08garbage-not-gzip" * 4) == []
    # good member followed by a corrupt one: no exception; the fully
    # buffered good record survives
    recs = parse_warc(good + b"\x1f\x8b\x08corrupt")
    assert len(recs) == 1 and recs[0]["html"] == b"k" * 20000


def test_warc_corrupt_member_resync_drops_only_itself():
    """A flipped byte in one gzip member loses only that member: iteration
    resynchronizes at the next member's magic."""
    import datetime as dt

    from ocr_model_spark.sources.warc import build_warc, parse_warc

    def rec(i):
        return {"url": f"https://a/{i}", "warc_ts": dt.datetime(2024, 3, 1), "html": b"p%d" % i}

    good1 = build_warc([rec(1)])
    bad = bytearray(build_warc([rec(2)]))
    bad[len(bad) // 2] ^= 0xFF  # corrupt mid-member
    good3 = build_warc([rec(3)])
    recs = parse_warc(good1 + bytes(bad) + good3)
    urls = [r["url"] for r in recs]
    assert "https://a/1" in urls and "https://a/3" in urls
    assert "https://a/2" not in urls


# ---- round-5 surfaces: RTF de-markup, OOXML variants, header dims ------


_rtf_piece = st.one_of(
    st.text(alphabet="abc {}\\ \x00\x01\x02", max_size=12),
    st.sampled_from(
        [
            r"\par", r"\tab", r"\'e9", r"\'00", r"\u233?", r"\u-1000?",
            "\\u57344?",  # \uN aimed at the U+E000 sentinel
            "",  # literal PUA chars in the input
            r"{\*\ignorable x}", r"{\fonttbl{\f0 Arial;}}",
            r"\{", r"\}", "\\\\", r"\~", r"\-", r"\_", "{", "}", "\\",
        ]
    ),
)


@given(st.lists(_rtf_piece, max_size=40))
@settings(max_examples=300, deadline=None)
def test_rtf_to_text_total_and_sentinel_free(pieces):
    """_rtf_to_text never raises, is deterministic, and NEVER leaks the
    private-use-area sentinels — even when the input carries literal PUA
    chars, C0 bytes, or \\uN escapes aimed at E000-E002 (review finding:
    the old C0 placeholders transmuted literal \\x00-\\x02 into braces)."""
    from ocr_model_spark.kernels.extract import _rtf_to_text

    text = "{\\rtf1 " + "".join(pieces) + "}"
    out = _rtf_to_text(text)
    assert out == _rtf_to_text(text)
    assert all(ch not in out for ch in ("", "", ""))


@given(st.binary(max_size=256), st.sampled_from(["png", "gif", "jpeg", "unknown"]))
@settings(max_examples=400, deadline=None)
def test_header_dims_total_and_int32_bounded(data, fmt):
    """_header_dims never raises on arbitrary bytes and never returns a
    dimension outside (0, 2^31-1] — the Arrow Int32 schema bound."""
    from ocr_model_spark.operators.multimodal import _decode_image, _header_dims

    dims = _header_dims(data, fmt)
    if dims is not None:
        w, h = dims
        assert 0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF
    w, h, d = _decode_image(data)
    assert d in ("header", "fake", "pil") and w > 0 and h > 0


@given(
    st.floats(min_value=-10, max_value=4_000_000, allow_nan=False),
    st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_serial_to_iso_total_over_both_epochs(serial, date1904):
    """Date-serial rendering never raises for ANY finite serial in either
    epoch system (review finding: 1904-system serials near the cap
    overflowed datetime); in-range results look like ISO dates."""
    from ocr_model_spark.kernels.ooxml_extract import _serial_to_iso

    out = _serial_to_iso(serial, date1904)
    if out is not None:
        assert out[4] == "-" and out[7] == "-"


@given(st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_pptx_xlsx_kernels_never_raise(data):
    from ocr_model_spark.kernels.ooxml_extract import extract_pptx, extract_xlsx

    for fn in (extract_pptx, extract_xlsx):
        r = fn(data)
        assert isinstance(r, dict) and "ok" in r and "regions" in r
