"""Standalone kernel tests: deterministic, Spark-free."""

from __future__ import annotations

from ocr_model_spark.kernels.encoding import decode_with_fallback
from ocr_model_spark.kernels.extract import extract_document
from ocr_model_spark.kernels.html_extract import extract_html
from ocr_model_spark.kernels.pdf_extract import extract_pdf
from ocr_model_spark.kernels.sniff import sniff_doc_type


def test_encoding_fallback_chain():
    assert decode_with_fallback("héllo".encode("utf-8")) == ("héllo", "utf-8")
    # bytes invalid in utf-8 → latin-1 (second in the reference chain)
    text, enc = decode_with_fallback("héllo".encode("latin-1"))
    assert enc == "latin-1"
    assert text == "héllo"


def test_sniff_magic_bytes():
    assert sniff_doc_type(b"%PDF-1.4\n...") == "pdf"
    assert sniff_doc_type(b"\x89PNG\r\n\x1a\nxxxx") == "image"
    assert sniff_doc_type(b"\xff\xd8\xff\xe0JFIF") == "image"
    assert sniff_doc_type(b"PK\x03\x04word/") == "docx"
    assert sniff_doc_type(b"<!DOCTYPE html><html></html>") == "html"
    assert sniff_doc_type(b"  <html><body>x</body></html>") == "html"
    assert sniff_doc_type(b"just plain words") == "text"
    assert sniff_doc_type(b"") == "unknown"


HTML = b"""<!DOCTYPE html><html><head><title>My Title</title>
<script>var boiler = 'ignore me';</script></head><body>
<nav class="navbar"><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
<div class="sidebar"><ul><li><a href="/1">link one</a></li><li><a href="/2">link two</a></li></ul></div>
<main><article>
<h1>My Title</h1>
<p>This paragraph is the main content of the page and long enough to pass.</p>
<p>Second &amp; final paragraph with an <a href="/x">inline link</a> inside prose text here.</p>
<ul><li>First meaningful list item content</li><li>Second meaningful list item content</li></ul>
<blockquote>A quotation block with enough characters.</blockquote>
</article></main>
<footer class="footer"><p>Copyright boilerplate that is long enough to pass length</p></footer>
</body></html>"""


def test_html_extract_regions_and_boilerplate():
    r = extract_html(HTML)
    assert r["ok"] and r["encoding"] == "utf-8"
    assert r["title"] == "My Title"
    types = [reg["type"] for reg in r["regions"]]
    texts = [reg["text"] for reg in r["regions"]]
    assert types == ["heading", "paragraph", "paragraph", "list_item", "list_item", "quote"]
    # nav/sidebar/footer never leak into content
    joined = r["text"]
    assert "Home" not in joined and "link one" not in joined and "Copyright" not in joined
    assert "ignore me" not in joined
    # entity decoding
    assert "Second & final paragraph" in texts[2]


def test_html_span_offsets_are_exact():
    r = extract_html(HTML)
    for reg in r["regions"]:
        assert r["text"][reg["span_start"] : reg["span_end"]] == reg["text"]
    # regions joined with \n\n reconstruct the document text exactly
    assert "\n\n".join(reg["text"] for reg in r["regions"]) == r["text"]


def test_html_link_density_rejects_link_farm():
    farm = (
        b"<html><body><div>"
        + b"".join(
            b'<p><a href="/%d">a long enough link text row here %d</a></p>' % (i, i)
            for i in range(5)
        )
        + b"</div></body></html>"
    )
    r = extract_html(farm)
    assert r["regions"] == []


def test_html_malformed_is_tolerated():
    r = extract_html(b"<html><body><p>Good paragraph content long enough to pass here")
    assert r["ok"]
    assert len(r["regions"]) == 1


def test_html_deterministic():
    assert extract_html(HTML) == extract_html(HTML)


SYNTH_PDF = (
    b"%PDF-1.4\n%%SYNTHPDF x\n"
    b"%%SYNTHPAGE 1 612 792\n"
    b"BT /F1 12 Tf 72 720 Td (Alpha line one.) Tj ET\n"
    b"BT /F1 12 Tf 72 706 Td (Alpha line two.) Tj ET\n"
    b"BT /F1 12 Tf 72 660 Td (Beta block here.) Tj ET\n"
    b"%%SYNTHPAGE 2 612 792\n"
    b"BT /F1 12 Tf 72 720 Td (Page two text.) Tj ET\n"
    b"%%EOF\n"
)


def test_pdf_block_grouping_and_join_rule():
    r = extract_pdf(SYNTH_PDF)
    assert r["ok"]
    texts = [reg["text"] for reg in r["regions"]]
    # two lines 14pt apart merge into one block; 46pt gap starts a new block
    assert texts == ["Alpha line one. Alpha line two.", "Beta block here.", "Page two text."]
    # reference join rule: blocks joined " " within page, page + "\n\n" each
    assert r["text"] == "Alpha line one. Alpha line two. Beta block here.\n\nPage two text.\n\n"
    for reg in r["regions"]:
        assert r["text"][reg["span_start"] : reg["span_end"]] == reg["text"]


def test_pdf_max_pages_cap():
    r = extract_pdf(SYNTH_PDF, max_pages=1)
    assert [reg["text"] for reg in r["regions"]] == [
        "Alpha line one. Alpha line two.",
        "Beta block here.",
    ]


def test_text_branch_verbatim():
    payload = "plain text,\nkept verbatim — no normalization".encode("utf-8")
    r = extract_document(payload)
    assert r["doc_type"] == "text"
    assert r["text"] == payload.decode("utf-8")
    assert r["regions"][0]["confidence"] == 1.0


def test_unextractable_types_fail_gracefully():
    r = extract_document(b"\x89PNG\r\n\x1a\n1234")
    assert r["doc_type"] == "image" and not r["ok"] and "engine-unavailable" in r["error"]
    assert extract_document(b"")["error"] == "empty-payload"


def test_fast_scanner_matches_stdlib_parser():
    """The regex scanner must build the same tree (same extraction output)
    as the stdlib html.parser reference path, across the synthetic corpus."""
    import pandas as pd

    from ocr_model_spark.kernels import html_extract as hx
    from ocr_model_spark.sources.synth import build_pages_pandas

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    pages = build_pages_pandas(docs, 150, seed=7)

    def extract_with(root):
        regs: list = []
        hx._harvest(root, regs)
        return regs, hx._find_title(root)

    checked = 0
    for payload in pages["html"]:
        b = bytes(payload)
        if b.startswith((b"%PDF", b"\x89PNG")):
            continue
        try:
            raw = b.decode("utf-8")
        except UnicodeDecodeError:
            raw = b.decode("latin-1")
        builder = hx._TreeBuilder()
        builder.feed(raw)
        builder.close()
        assert extract_with(hx._fast_build(raw)) == extract_with(builder.root)
        checked += 1
    assert checked > 100


ADVERSARIAL_HTML = [
    # case-variant boilerplate attributes must still be parsed (CLASS= was
    # once skipped by a case-sensitive guard → footer leaked into content)
    '<html><body><div CLASS="footer">skip this boilerplate text entirely</div>'
    "<p>The real article body text goes here and is long enough to keep.</p></body></html>",
    '<div Class="sidebar"><p>navigation links and junk text here</p></div>'
    "<p>Actual content paragraph with sufficient length to pass the filter.</p>",
    '<div ROLE="navigation"><p>menu menu menu menu menu menu menu</p></div>'
    "<p>Another acceptable content paragraph with plenty of characters.</p>",
    '<div Id="comments"><p>troll comment troll comment troll comment</p></div>'
    "<p>Body paragraph that should be the only surviving region here.</p>",
    # nested tags inside <title>: stdlib parses them as elements, so the
    # fast path must too (rawtext-mode title once yielded 'My <b>Site</b>')
    "<html><head><title>My <b>Site</b></title></head>"
    "<body><p>Content paragraph long enough for the minimum length cut.</p></body></html>",
    "<title>Plain title</title><p>Content paragraph long enough for the minimum cut.</p>",
    # textarea parses normally (stdlib only CDATA-modes script/style)
    "<form><textarea><p>typed text</p></textarea></form>"
    "<p>Visible paragraph content that is long enough to be extracted.</p>",
    # script/style stay rawtext on both paths
    '<script>if (a < b) { document.write("<div>x</div>"); }</script>'
    "<p>Paragraph after a script containing angle brackets and markup.</p>",
]


def test_fast_scanner_matches_stdlib_on_adversarial_markup():
    """Case-variant attributes, nested-tag titles, textarea contents: the
    divergences ADVICE.md reproduced must stay pinned to stdlib behavior."""
    from ocr_model_spark.kernels import html_extract as hx

    def extract_with(root):
        regs: list = []
        hx._harvest(root, regs)
        return regs, hx._find_title(root)

    for raw in ADVERSARIAL_HTML:
        builder = hx._TreeBuilder()
        builder.feed(raw)
        builder.close()
        assert extract_with(hx._fast_build(raw)) == extract_with(builder.root), raw


def test_uppercase_class_suppresses_boilerplate():
    from ocr_model_spark.kernels.html_extract import extract_html

    out = extract_html(ADVERSARIAL_HTML[0].encode())
    assert "boilerplate" not in out["text"]
    assert "real article body" in out["text"]


def test_title_with_nested_tags_truncates_like_stdlib():
    from ocr_model_spark.kernels.html_extract import extract_html

    out = extract_html(ADVERSARIAL_HTML[4].encode())
    assert out["title"] == "My"


# ------------------------------------------------------------------- DOCX


def _make_docx(paragraphs=None, table=None, heading=None, numbered=None):
    """Hand-rolled docx for kernel tests (independent of synth's builder)."""
    import zipfile
    from io import BytesIO

    from ocr_model_spark.sources.synth import _DOCX_CONTENT_TYPES, _DOCX_RELS, _xml_esc

    body = []
    if heading:
        body.append(
            f'<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
            f"<w:r><w:t>{_xml_esc(heading)}</w:t></w:r></w:p>"
        )
    for t in paragraphs or []:
        body.append(f"<w:p><w:r><w:t>{_xml_esc(t)}</w:t></w:r></w:p>")
    for t in numbered or []:
        body.append(
            '<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr></w:pPr>'
            f"<w:r><w:t>{_xml_esc(t)}</w:t></w:r></w:p>"
        )
    if table:
        body.append(
            "<w:tbl>"
            + "".join(
                "<w:tr>"
                + "".join(
                    f"<w:tc><w:p><w:r><w:t>{_xml_esc(c)}</w:t></w:r></w:p></w:tc>"
                    for c in row
                )
                + "</w:tr>"
                for row in table
            )
            + "</w:tbl>"
        )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        "<w:body>" + "".join(body) + "</w:body></w:document>"
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in (
            ("[Content_Types].xml", _DOCX_CONTENT_TYPES),
            ("_rels/.rels", _DOCX_RELS),
            ("word/document.xml", document),
        ):
            zf.writestr(zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0)), content)
    return buf.getvalue()


def test_docx_extract_paragraphs_tables_and_title():
    from ocr_model_spark.kernels.docx_extract import extract_docx

    data = _make_docx(
        heading="Quarterly Report",
        paragraphs=["First paragraph text.", "Second & <escaped> one."],
        numbered=["alpha item", "beta item"],
        table=[["h1", "h2"], ["a", "b"]],
    )
    out = extract_docx(data)
    assert out["ok"] and out["error"] is None
    assert out["title"] == "Quarterly Report"
    types = [r["type"] for r in out["regions"]]
    assert types == [
        "heading", "paragraph", "paragraph", "list_item", "list_item",
        "table_row", "table_row",
    ]
    assert out["regions"][2]["text"] == "Second & <escaped> one."
    assert out["regions"][5]["text"] == "h1 | h2"
    assert out["metadata"] == {"n_paragraphs": "5", "n_tables": "1"}
    # span offsets index into the joined text exactly
    for r in out["regions"]:
        assert out["text"][r["span_start"] : r["span_end"]] == r["text"]
        assert r["confidence"] == 1.0 and not r["needs_review"]


def test_docx_malformed_zip_fails_typed():
    from ocr_model_spark.kernels.docx_extract import extract_docx

    out = extract_docx(b"PK\x03\x04 not actually a zip archive")
    assert not out["ok"] and out["error"].startswith("docx-parse-failed")
    assert out["regions"] == []


def test_docx_zip_without_document_xml_fails_typed():
    import zipfile
    from io import BytesIO

    from ocr_model_spark.kernels.docx_extract import extract_docx

    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("other.txt", date_time=(2024, 1, 1, 0, 0, 0)), "x")
    out = extract_docx(buf.getvalue())
    assert not out["ok"] and "docx-parse-failed" in out["error"]


def test_docx_routed_through_unified_kernel():
    from ocr_model_spark.kernels.extract import extract_document

    data = _make_docx(heading="T", paragraphs=["Body paragraph here."])
    r = extract_document(data)
    assert r["doc_type"] == "docx" and r["ok"]
    assert "Body paragraph here." in r["text"]


def test_docx_synth_payloads_are_deterministic_and_extract():
    import random

    from ocr_model_spark.kernels.docx_extract import extract_docx
    from ocr_model_spark.sources.synth import _docx_doc

    words = "lorem ipsum dolor sit amet consectetur adipiscing elit".split()
    a = _docx_doc(random.Random("s:1"), words)
    b = _docx_doc(random.Random("s:1"), words)
    assert a == b  # byte-identical across replays (fixed zip timestamps)
    out = extract_docx(a)
    assert out["ok"] and out["title"] is not None
    assert any(r["type"] == "table_row" for r in out["regions"])
    assert any(r["type"] == "list_item" for r in out["regions"])


# ------------------------------------------------------------- real PDF


def test_native_pdf_reader_extracts_real_pdf():
    """Stdlib reader over a spec-correct classic PDF (FlateDecode, xref,
    inherited MediaBox, TJ kerning, octal escapes, hex strings, T*/TL)."""
    from tests.pdf_fixture import build_real_pdf

    r = extract_pdf(build_real_pdf())
    assert r["ok"], r["error"]
    assert r["metadata"]["page_count"] == "2"
    texts = [reg["text"] for reg in r["regions"]]
    assert texts == [
        "Alpha line one. Alpha line two.",
        "Beta kerned block.",
        "Café naïve (escaped)",
        "Second page first line. Second page second line.",
        "Hex text",
    ]
    # same join rule as the other engines: spans index the document text
    for reg in r["regions"]:
        assert r["text"][reg["span_start"] : reg["span_end"]] == reg["text"]
        assert reg["confidence"] == 1.0


def test_native_pdf_reader_is_deterministic():
    from tests.pdf_fixture import build_real_pdf

    data = build_real_pdf()
    assert extract_pdf(data) == extract_pdf(data)


def test_native_pdf_max_pages_cap():
    from tests.pdf_fixture import build_real_pdf

    r = extract_pdf(build_real_pdf(), max_pages=1)
    assert r["metadata"]["page_count"] == "1"
    assert all("Second page" not in reg["text"] for reg in r["regions"])


def test_encrypted_pdf_fails_typed():
    from tests.pdf_fixture import build_real_pdf

    data = build_real_pdf(extra_trailer=b"/Encrypt 9 0 R ")
    r = extract_pdf(data)
    assert not r["ok"] and r["error"] == "pdf-encrypted"


def test_garbage_pdf_fails_typed():
    r = extract_pdf(b"%PDF-1.7\nthis is not really a pdf at all")
    assert not r["ok"] and r["error"].startswith("pdf-parse-failed")


def test_uncompressed_stream_and_broken_length():
    """Streams without /Filter, and a wrong /Length that forces the
    endstream-scan fallback."""
    from ocr_model_spark.kernels.pdf_native import extract_pages_native
    from ocr_model_spark.kernels.pdf_extract import _group_blocks

    content = b"BT /F1 12 Tf 72 700 Td (Plain stream text.) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 400 500] "
        b"/Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 9999 >> stream\n" + content + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    pages = extract_pages_native(pdf, _group_blocks)
    assert len(pages) == 1
    assert pages[0]["width"] == 400 and pages[0]["height"] == 500
    assert pages[0]["blocks"][0]["text"] == "Plain stream text."


def test_native_pdf_info_metadata_and_title():
    from tests.pdf_fixture import build_real_pdf

    r = extract_pdf(build_real_pdf())
    assert r["title"] == "Fixture Title"
    assert r["metadata"]["author"] == "Jane Dev"
    assert r["metadata"]["page_count"] == "2"


# ----------------------------------------- optional-engine (fake) coverage


class _FakeFitzPage:
    def __init__(self):
        class R:
            width, height = 612.0, 792.0

        self.rect = R()

    def get_text(self, mode):
        assert mode == "dict"
        return {
            "blocks": [
                {
                    "type": 0,
                    "bbox": (72.0, 72.0, 400.0, 100.0),
                    "lines": [
                        {"spans": [{"text": "Fitz span one"}, {"text": "and two"}]},
                        {"spans": [{"text": "second line"}, {"text": "   "}]},
                    ],
                },
                {"type": 1, "bbox": (0, 0, 1, 1), "lines": []},  # image block: skipped
                {"type": 0, "bbox": (72.0, 200.0, 400.0, 230.0),
                 "lines": [{"spans": [{"text": "Second block"}]}]},
            ]
        }


class _FakeFitz:
    def open(self, stream=None, filetype=None):
        import contextlib

        @contextlib.contextmanager
        def doc():
            yield [_FakeFitzPage()]

        return doc()


def test_fitz_engine_path_with_fake_module(monkeypatch):
    """Engine-present coverage for _extract_fitz (VERDICT r1 missing #3):
    the PyMuPDF dict → blocks mapping, blank-span skip, image-block skip."""
    from ocr_model_spark.kernels import pdf_extract as px

    monkeypatch.setattr(px, "_HAS_FITZ", True)
    monkeypatch.setattr(px, "fitz", _FakeFitz())
    r = px.extract_pdf(b"%PDF-1.7\nnot-synth\n")
    assert r["ok"]
    texts = [reg["text"] for reg in r["regions"]]
    assert texts == ["Fitz span one and two second line", "Second block"]
    assert r["metadata"]["page_count"] == "1"


def test_pil_decode_path_with_fake_module(monkeypatch):
    """Engine-present coverage for the PIL decode branch: real dims, decoder
    tag 'pil' (the stub path stays for engine-absent builds)."""
    from ocr_model_spark.operators import multimodal as mm

    class _FakeIm:
        width, height = 320, 240

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeImage:
        @staticmethod
        def open(buf):
            return _FakeIm()

    monkeypatch.setattr(mm, "_HAS_PIL", True)
    monkeypatch.setattr(mm, "Image", _FakeImage)
    w, h, decoder = mm._decode_image(b"\x89PNG\r\n\x1a\nxxxx")
    assert (w, h, decoder) == (320, 240, "pil")
    # engine-absent path stays deterministic and honestly labeled
    monkeypatch.setattr(mm, "_HAS_PIL", False)
    w1, h1, d1 = mm._decode_image(b"\x89PNG\r\n\x1a\nxxxx")
    w2, h2, d2 = mm._decode_image(b"\x89PNG\r\n\x1a\nxxxx")
    assert (w1, h1, d1) == (w2, h2, d2) and d1 == "fake"


def _png_bytes(w, h):
    import zlib

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    crc = zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big")
    return b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR" + ihdr + crc


def _jpeg_bytes(w, h, marker=b"\xff\xc0", junk_segments=1):
    """SOI + N APP0 segments + SOFn(h, w)."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof = (
        marker + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 * junk_segments + sof + b"\x00" * 16


def test_header_dims_parses_png_gif_jpeg_headers():
    """VERDICT r4 item 3: stdlib container-header dims — no imaging lib.
    Crafted fixtures per format, plus truncation/malformed fallbacks."""
    from ocr_model_spark.operators.multimodal import _decode_image, _header_dims

    assert _header_dims(_png_bytes(640, 480), "png") == (640, 480)
    # GIF dims are little-endian u16 pairs (87a and 89a both carry them)
    for sig in (b"GIF87a", b"GIF89a"):
        data = sig + (300).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 4
        assert _header_dims(data, "gif") == (300, 200)
    # baseline SOF0, progressive SOF2, and APP-segment skipping
    assert _header_dims(_jpeg_bytes(800, 600), "jpeg") == (800, 600)
    assert _header_dims(_jpeg_bytes(31, 17, marker=b"\xff\xc2"), "jpeg") == (31, 17)
    assert _header_dims(_jpeg_bytes(64, 64, junk_segments=3), "jpeg") == (64, 64)
    # DHT (C4) must NOT be taken for a frame header
    dht = b"\xff\xc4" + (5).to_bytes(2, "big") + b"\x00\x01\x02"
    data = b"\xff\xd8" + dht + _jpeg_bytes(99, 98)[2:]
    assert _header_dims(data, "jpeg") == (99, 98)
    # malformed/truncated → None → _decode_image falls back to the fake
    assert _header_dims(b"\x89PNG\r\n\x1a\nxxxx", "png") is None
    assert _header_dims(_png_bytes(640, 480)[:20], "png") is None
    assert _header_dims(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4 + b"JUNK" + b"\x00" * 8, "png") is None
    assert _header_dims(b"GIF89a\x01", "gif") is None
    assert _header_dims(b"\xff\xd8\xff", "jpeg") is None
    assert _header_dims(b"\xff\xd8" + b"\x00" * 8, "jpeg") is None
    w, h, d = _decode_image(_png_bytes(12, 2048))
    assert (w, h, d) == (12, 2048, "header")
    w, h, d = _decode_image(b"\x89PNG\r\n\x1a\nxxxx")
    assert d == "fake"
    # dims beyond int32 are a malformed header (PNG spec caps at 2^31-1)
    # AND would overflow the Arrow Int32 schema field → reject, fall back
    big = b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR" + b"\xff" * 8 + b"\x08\x02\x00\x00\x00\x00\x00\x00\x00"
    assert _header_dims(big, "png") is None
    assert _decode_image(big)[2] == "fake"


def test_objstm_pdf_reads_pages_from_object_stream():
    """PDF 1.5+: page tree living inside a compressed /ObjStm must extract."""
    from tests.pdf_fixture import build_objstm_pdf

    r = extract_pdf(build_objstm_pdf())
    assert r["ok"], r["error"]
    assert [reg["text"] for reg in r["regions"]] == ["Objstm page text."]
    assert r["metadata"]["page_count"] == "1"


def test_embedded_image_export_from_real_pdf():
    """S11: image XObjects enumerate with honest dict dims; DCTDecode bytes
    export verbatim (they ARE the JPEG file)."""
    import hashlib
    import zlib as _zlib

    from ocr_model_spark.kernels.pdf_native import extract_embedded_images
    from tests.pdf_fixture import build_real_pdf

    jpeg = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01" + b"\x42" * 100 + b"\xff\xd9"
    raw = _zlib.compress(b"\x00\x01\x02" * 64)
    base = build_real_pdf()
    extra = (
        b"9 0 obj\n<< /Subtype /Image /Width 320 /Height 200 /ColorSpace /DeviceRGB "
        b"/BitsPerComponent 8 /Filter /DCTDecode /Length %d >>\nstream\n" % len(jpeg)
        + jpeg
        + b"\nendstream\nendobj\n"
        b"10 0 obj\n<< /Subtype /Image /Width 8 /Height 8 /Filter /FlateDecode /Length %d >>\nstream\n"
        % len(raw)
        + raw
        + b"\nendstream\nendobj\n"
    )
    data = base.replace(b"xref\n", extra + b"xref\n", 1)
    imgs = extract_embedded_images(data)
    assert len(imgs) == 2
    jpg = imgs[0]
    assert (jpg["format"], jpg["width"], jpg["height"]) == ("jpeg", 320, 200)
    assert jpg["data"] == jpeg  # verbatim export
    assert imgs[1]["format"] == "raw" and imgs[1]["data"] == b"\x00\x01\x02" * 64
    assert hashlib.sha256(jpg["data"]).hexdigest() == hashlib.sha256(jpeg).hexdigest()


def test_synth_real_pdfs_carry_embedded_images():
    import random

    from ocr_model_spark.kernels.pdf_native import extract_embedded_images
    from ocr_model_spark.sources.synth import _real_pdf_doc

    words = "lorem ipsum dolor sit amet consectetur".split()
    found = 0
    for i in range(20):
        data = _real_pdf_doc(random.Random(f"img:{i}"), words)
        imgs = extract_embedded_images(data)
        for im in imgs:
            assert im["format"] == "jpeg" and im["width"] >= 32
            assert im["data"].startswith(b"\xff\xd8\xff")
            found += 1
    assert found > 0


def test_rasterize_pages_engine_gated_and_fake_covered(monkeypatch):
    """S5/S6: rasterize raises typed when no renderer exists; with a (fake)
    fitz the pixmap mapping is exercised end-to-end."""
    import pytest as _pytest

    from ocr_model_spark.kernels import pdf_extract as px

    with _pytest.raises(px.RasterEngineUnavailable):
        px.rasterize_pages(b"%PDF-1.4\n")

    class _Pix:
        width, height = 1275, 1650

        def tobytes(self, fmt):
            assert fmt == "png"
            return b"\x89PNG\r\n\x1a\nfakepixels"

    class _Page:
        def get_pixmap(self, dpi):
            assert dpi == 150
            return _Pix()

    class _Fitz:
        def open(self, stream=None, filetype=None):
            import contextlib

            @contextlib.contextmanager
            def doc():
                yield [_Page(), _Page(), _Page()]

            return doc()

    monkeypatch.setattr(px, "_HAS_FITZ", True)
    monkeypatch.setattr(px, "fitz", _Fitz())
    pages = px.rasterize_pages(b"%PDF-1.4\n", dpi=150, max_pages=2)
    assert len(pages) == 2
    assert pages[0]["width"] == 1275 and pages[0]["png"].startswith(b"\x89PNG")
    # the rasterized output is exactly what the multimodal decode stage eats
    from ocr_model_spark.operators.multimodal import _sniff_format

    assert _sniff_format(pages[0]["png"]) == "png"


def test_ocr_adapters_gated_and_mapping_covered():
    """M1/M2: engines absent → typed failure; the output-mapping adapters
    are driven directly with engine-shaped fake data."""
    import pytest as _pytest

    from ocr_model_spark.kernels import ocr_engines as oe

    assert oe.available_engines() == []
    with _pytest.raises(oe.OcrEngineUnavailable):
        oe.ocr_tokens_tesseract(b"\x89PNG\r\n\x1a\n")
    with _pytest.raises(oe.OcrEngineUnavailable):
        oe.ocr_tokens_paddle(b"\x89PNG\r\n\x1a\n")

    # tesseract TSV-dict mapping: blanks and conf=-1 rows skipped, 0-100 → 0-1
    data = {
        "text": ["Hello", "", "world", "noise"],
        "conf": [96.0, -1.0, 88.5, -1.0],
        "left": [10, 0, 80, 0],
        "top": [20, 0, 20, 0],
        "width": [60, 0, 55, 0],
        "height": [12, 0, 12, 0],
    }
    toks = oe._tesseract_data_to_tokens(data)
    assert [t["text"] for t in toks] == ["Hello", "world"]
    assert toks[0] == {
        "text": "Hello", "x1": 10.0, "y1": 20.0, "x2": 70.0, "y2": 32.0,
        "confidence": 0.96, "engine": "tesseract",
    }

    # paddle quad mapping: quad → axis-aligned bbox
    result = [[
        ([[5, 8], [100, 10], [99, 25], [4, 24]], ("Line one", 0.91)),
        ([[0, 0], [1, 0], [1, 1], [0, 1]], ("", 0.5)),  # blank skipped
    ]]
    toks = oe._paddle_result_to_tokens(result)
    assert len(toks) == 1
    t = toks[0]
    assert (t["x1"], t["y1"], t["x2"], t["y2"]) == (4.0, 8.0, 100.0, 25.0)
    assert t["engine"] == "paddle" and t["confidence"] == 0.91


def test_pdfplumber_adapter_mapping_covered():
    """S4: the extract_words → span mapping is real code (fake word dicts);
    grouped through the same shared block reconstruction."""
    from ocr_model_spark.kernels.pdf_extract import (
        _group_blocks,
        _pdfplumber_words_to_spans,
    )

    words = [
        {"text": "Hello", "x0": 72.0, "x1": 110.0, "top": 72.0, "bottom": 84.0},
        {"text": "world", "x0": 114.0, "x1": 150.0, "top": 72.0, "bottom": 84.0},
        {"text": "  ", "x0": 0.0, "x1": 1.0, "top": 0.0, "bottom": 1.0},  # blank
        {"text": "Next", "x0": 72.0, "x1": 100.0, "top": 140.0, "bottom": 152.0},
    ]
    spans = _pdfplumber_words_to_spans(words)
    assert [s["text"] for s in spans] == ["Hello", "world", "Next"]
    blocks = _group_blocks(spans)
    assert [b["text"] for b in blocks] == ["Hello world", "Next"]


def test_pdf_containing_encrypt_bytes_is_not_misclassified():
    """Only a trailer /Encrypt entry means encrypted — a document whose
    CONTENT mentions '/Encrypt' must still extract (the old substring
    check misfired on this)."""
    import zlib as _zlib

    content = _zlib.compress(b"BT /F1 12 Tf 72 700 Td (How /Encrypt works.) Tj ET")
    length_line = b"4 0 obj << /Length " + str(len(content)).encode() + b" /Filter /FlateDecode >> stream\n"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        + length_line
        + content
        + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n"
        b"% comment mentioning /Encrypt near EOF\n%%EOF\n"
    )
    r = extract_pdf(pdf)
    assert r["ok"], r["error"]
    assert r["regions"][0]["text"] == "How /Encrypt works."


def test_pdf_outline_bookmarks_do_not_hijack_title():
    """Outline items carry /Title but are NOT the document title; /Info is
    resolved through the trailer reference only."""
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R /Outlines 5 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 48 >> stream\n"
        b"BT /F1 12 Tf 72 700 Td (Some body text.) Tj ET\n"
        b"endstream endobj\n"
        b"5 0 obj << /Type /Outlines /First 6 0 R /Count 1 >> endobj\n"
        b"6 0 obj << /Title (Chapter 1) /Parent 5 0 R >> endobj\n"  # bookmark, no /Type
        b"7 0 obj << /Title (Real Document Title) /Author (A. Writer) >> endobj\n"
        b"trailer << /Root 1 0 R /Info 7 0 R >>\n%%EOF\n"
    )
    r = extract_pdf(pdf)
    assert r["ok"]
    assert r["title"] == "Real Document Title"
    assert r["metadata"]["author"] == "A. Writer"


def test_trailer_text_inside_stream_body_is_ignored():
    """An UNCOMPRESSED content stream containing 'trailer << /Encrypt … >>'
    text must not mark the document encrypted (trailer scan skips stream
    bodies)."""
    content = b"BT /F1 12 Tf 72 700 Td (See below) Tj ET\ntrailer << /Encrypt 9 0 R >>\n"
    length = str(len(content)).encode()
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + length + b" >> stream\n" + content + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    r = extract_pdf(pdf)
    assert r["ok"], r["error"]
    assert r["regions"][0]["text"] == "See below"


def test_bogus_length_cannot_swallow_the_real_trailer():
    """A stream whose /Length points past the genuine trailer to a planted
    'endstream' must not hide that trailer (skip spans are capped at the
    first endstream token), so /Encrypt detection still fires."""
    body = b"BT /F1 12 Tf 72 700 Td (x) Tj ET\nendstream endobj\n"
    planted = b"endstream\n"
    # /Length claims everything up to the PLANTED endstream far below
    fake_len = len(body) + len(b"trailer << /Root 1 0 R /Encrypt 9 0 R >>\n")
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(fake_len).encode() + b" >> stream\n"
        + body
        + b"trailer << /Root 1 0 R /Encrypt 9 0 R >>\n"
        + planted
        + b"%%EOF\n"
    )
    r = extract_pdf(pdf)
    assert not r["ok"] and r["error"] == "pdf-encrypted"


def test_type0_cid_font_text_via_tounicode_cmap():
    """Composite (Type0/Identity-H) fonts: 2-byte glyph codes decode
    through the ToUnicode CMap — without it, most modern PDFs read as
    garbage. Covers bfchar, incrementing bfrange, and array bfrange."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"2 beginbfchar\n"
        b"<0001> <0048>\n"          # H
        b"<0002> <00E9>\n"          # e-acute
        b"endbfchar\n"
        b"1 beginbfrange\n"
        b"<0010> <0012> <006C>\n"   # l, m, n (incrementing)
        b"endbfrange\n"
        b"1 beginbfrange\n"
        b"<0020> <0021> [<006F> <0021>]\n"  # o, !
        b"endbfrange\n"
        b"endcmap end\n"
    )
    # codes: H é l l o !  → <0001 0002 0010 0010 0020 0021>
    content = b"BT /F1 12 Tf 72 700 Td <000100020010001000200021> Tj ET"
    objs = []
    objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    objs.append(b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >> endobj\n")
    objs.append(
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >> endobj\n"
    )
    objs.append(
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >> stream\n"
        + content + b"\nendstream endobj\n"
    )
    objs.append(
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n"
    )
    objs.append(
        b"6 0 obj << /Length " + str(len(cmap)).encode() + b" >> stream\n"
        + cmap + b"\nendstream endobj\n"
    )
    pdf = b"%PDF-1.5\n" + b"".join(objs) + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    r = extract_pdf(pdf)
    assert r["ok"], r["error"]
    assert [reg["text"] for reg in r["regions"]] == ["Héllo!"]


def test_simple_fonts_without_tounicode_keep_latin1_path():
    """Fonts without a ToUnicode CMap fall back to the latin-1 decode —
    the fixture PDFs (Type1 Helvetica) must extract exactly as before."""
    from tests.pdf_fixture import build_real_pdf

    r = extract_pdf(build_real_pdf())
    assert r["ok"]
    assert r["regions"][2]["text"] == "Café naïve (escaped)"


# ------------------------------------------------------- xref-first locator


def test_xref_stream_pdf_extracts_via_xref_path():
    """PDF-1.5 file located only by a cross-reference stream (W [1 2 1],
    PNG /Predictor 12, type-2 entries into an ObjStm): the xref path must
    decode the predictor, follow type-1 offsets and recover the in-ObjStm
    page tree."""
    from ocr_model_spark.kernels.pdf_native import _load_via_xref
    from tests.pdf_fixture import build_xrefstream_pdf

    data = build_xrefstream_pdf()
    objects, trailers, _gens, _bind = _load_via_xref(data, set())
    assert set(objects) == {4, 5, 6}  # top-level: ObjStm, content, xref stream
    assert trailers[0].get("Root") is not None
    r = extract_pdf(data)
    assert r["ok"], r["error"]
    assert r["regions"][0]["text"] == "Xref stream page text."


def test_classic_xref_chain_is_primary_locator():
    """build_real_pdf carries a correct classic table: the xref path must
    resolve every object without falling back to the scan."""
    from ocr_model_spark.kernels.pdf_native import _load_via_xref
    from tests.pdf_fixture import build_real_pdf

    objects, trailers, _gens, _bind = _load_via_xref(build_real_pdf(), set())
    assert set(objects) == set(range(1, 9))
    assert trailers[0]["Info"].num == 8


def test_incremental_update_resolves_newer_object():
    import zlib as _zlib

    from tests.pdf_fixture import append_incremental_update, build_real_pdf

    c = _zlib.compress(b"BT /F1 12 Tf 72 700 Td (Replacement text v2.) Tj ET")
    data = append_incremental_update(
        build_real_pdf(),
        [(4, b"<< /Length %d /Filter /FlateDecode >>" % len(c), c)],
    )
    r = extract_pdf(data)
    assert r["ok"], r["error"]
    texts = [reg["text"] for reg in r["regions"]]
    assert "Replacement text v2." in texts
    assert all("Alpha line one." not in t for t in texts)


def test_incremental_freed_object_stays_dead():
    """An update that FREES the /Info object must kill the stale title: a
    scan-based reader (last definition wins) would still find object 8 in
    the base section and report 'Fixture Title'."""
    from tests.pdf_fixture import append_incremental_update, build_real_pdf

    data = append_incremental_update(build_real_pdf(), [], free=[8])
    r = extract_pdf(data)
    assert r["ok"], r["error"]
    assert not r.get("title")
    # document body still extracts fine
    assert any("Alpha line one." in reg["text"] for reg in r["regions"])


def test_fake_object_header_inside_stream_body_is_ignored():
    """Scan fallback: an UNCOMPRESSED content stream containing the text
    '7 0 obj << /Title (Hijacked) >> endobj' must not inject an object —
    object-header matches inside recorded stream bodies are skipped."""
    content = (
        b"BT /F1 12 Tf 72 700 Td (Body here.) Tj ET\n"
        b"7 0 obj << /Title (Hijacked) >> endobj\n"
    )
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >> stream\n"
        + content + b"endstream endobj\n"
        b"7 0 obj << /Title (Real Title) /Author (A. Writer) >> endobj\n"
        b"trailer << /Root 1 0 R /Info 7 0 R >>\n%%EOF\n"
    )
    r = extract_pdf(pdf)
    assert r["ok"], r["error"]
    assert r["title"] == "Real Title"
    assert any("Body here." in reg["text"] for reg in r["regions"])


def test_png_unpredict_all_filters():
    from ocr_model_spark.kernels.pdf_native import _png_unpredict

    rows = [bytes([10, 20, 30, 40]), bytes([13, 24, 35, 46]), bytes([5, 6, 7, 8])]

    def encode(rows, ft):
        out = bytearray()
        prev = bytes(len(rows[0]))
        for row in rows:
            out.append(ft)
            enc = bytearray()
            for i, v in enumerate(row):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((v - pred) & 0xFF)
            out += enc
            prev = row
        return bytes(out)

    flat = b"".join(rows)
    for ft in range(5):
        assert _png_unpredict(encode(rows, ft), 4) == flat, f"filter {ft}"


def test_identity_h_cid_is_unicode_heuristic():
    """Type0 /Identity-H without ToUnicode: CID-as-code-point decode
    recovers generators that emit Unicode CIDs; glyph-id subsets (codes in
    the control range) stay EMPTY rather than mojibake."""
    from tests.pdf_fixture import build_identity_h_pdf

    good = build_identity_h_pdf("Hello Identity world!".encode("utf-16-be"))
    r = extract_pdf(good)
    assert r["ok"], r["error"]
    assert [reg["text"] for reg in r["regions"]] == ["Hello Identity world!"]

    garbage = build_identity_h_pdf(bytes([0, 1, 0, 2, 0, 3, 0, 4] * 3))
    r2 = extract_pdf(garbage)
    assert r2["ok"]
    assert r2["regions"] == []


def test_xref_type2_entry_shadows_older_direct_object():
    """Incremental update that moves /Info (obj 8) INTO an ObjStm, listed
    as a type-2 entry in the update's xref stream: the newer in-ObjStm
    object must win over the base file's direct obj 8 (code-review r3
    finding: type-2 entries used to record nothing, so the stale type-1
    offset from the /Prev section was resurrected)."""
    import re as _re
    import zlib as _zlib

    from tests.pdf_fixture import build_real_pdf

    base = build_real_pdf()
    prev_xref = int(_re.findall(rb"startxref\s+(\d+)", base)[-1])
    out = bytearray(base)

    # ObjStm (obj 9) embedding the NEW obj 8
    embedded = b"<< /Title (Updated Title) /Author (New Author) >>\n"
    head = b"8 0\n"
    stm = _zlib.compress(head + embedded)
    off9 = len(out)
    out += (
        b"9 0 obj\n<< /Type /ObjStm /N 1 /First %d /Length %d /Filter /FlateDecode >>\nstream\n"
        % (len(head), len(stm))
    ) + stm + b"\nendstream\nendobj\n"

    # xref stream (obj 10): entries for 8 (type 2 -> in objstm 9), 9, 10
    off10 = len(out)
    rows = [
        bytes([2, 0, 9, 0]),
        bytes([1, (off9 >> 8) & 0xFF, off9 & 0xFF, 0]),
        bytes([1, (off10 >> 8) & 0xFF, off10 & 0xFF, 0]),
    ]
    xstm = _zlib.compress(b"".join(rows))
    out += (
        b"10 0 obj\n<< /Type /XRef /Size 11 /W [1 2 1] /Index [8 3] /Root 1 0 R "
        b"/Info 8 0 R /Prev %d /Filter /FlateDecode /Length %d >>\nstream\n"
        % (prev_xref, len(xstm))
    ) + xstm + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % off10

    r = extract_pdf(bytes(out))
    assert r["ok"], r["error"]
    assert r["title"] == "Updated Title"
    assert r["metadata"]["author"] == "New Author"


def test_rc4_encrypted_pdf_with_empty_user_password_decrypts():
    """Standard-handler RC4 (V1/R2 and V2/R3/128-bit) with an EMPTY user
    password — owner-restriction-only files, the dominant secured-PDF case
    on the web — must extract text and metadata; the fixture's key
    schedule is an independent spec implementation."""
    from tests.pdf_fixture import build_rc4_encrypted_pdf

    for rev in (2, 3):
        r = extract_pdf(build_rc4_encrypted_pdf(rev))
        assert r["ok"], (rev, r["error"])
        assert [reg["text"] for reg in r["regions"]] == ["Secret but readable."], rev
        assert r["title"] == "Secret Title", rev


def test_encrypted_pdf_with_real_user_password_still_fails_typed():
    """A /U entry that does NOT verify against the empty password (i.e. a
    real user password) must keep the typed pdf-encrypted failure."""
    from tests.pdf_fixture import build_rc4_encrypted_pdf

    data = build_rc4_encrypted_pdf(2)
    # corrupt /U so the empty-password check fails
    import re as _re

    m = _re.search(rb"/U <([0-9a-f]{64})>", data)
    bad_u = (b"ff" * 32)
    data = data.replace(m.group(1), bad_u)
    r = extract_pdf(data)
    assert not r["ok"] and r["error"] == "pdf-encrypted"


def test_aes_block_cipher_matches_fips_197_vectors():
    from ocr_model_spark.kernels.aes import cbc_decrypt, cbc_encrypt, decrypt_block, encrypt_block

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    assert encrypt_block(k128, pt).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert encrypt_block(k256, pt).hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert decrypt_block(k128, encrypt_block(k128, pt)) == pt
    data = b"spanning multiple aes blocks for the cbc chain check!"
    padn = 16 - len(data) % 16
    ct = cbc_encrypt(k256, pt, data + bytes([padn]) * padn)
    assert cbc_decrypt(k256, pt, ct) == data


def test_aes_encrypted_pdfs_with_empty_user_password_decrypt():
    """AESV2 (R4, AES-128) and AESV3 (R6, AES-256, Algorithm 2.B) with an
    empty user password: text and metadata extract; the fixture derives
    keys from the spec independently of the reader."""
    from tests.pdf_fixture import build_aes_encrypted_pdf

    for rev in (4, 6):
        r = extract_pdf(build_aes_encrypted_pdf(rev))
        assert r["ok"], (rev, r["error"])
        assert [reg["text"] for reg in r["regions"]] == ["AES secret text."], rev
        assert r["title"] == "AES Title", rev


def test_aes_pdf_with_wrong_user_password_fails_typed():
    from tests.pdf_fixture import build_aes_encrypted_pdf

    data = build_aes_encrypted_pdf(6)
    # corrupt the /U validation hash: empty-password check must fail
    import re as _re

    m = _re.search(rb"/U <([0-9a-f]{96})>", data)
    data = data.replace(m.group(1), b"ab" * 48)
    r = extract_pdf(data)
    assert not r["ok"] and r["error"] == "pdf-encrypted"


def test_synth_decryptable_pdfs_roundtrip_title_and_text():
    """Writer-side RC4 encryption must cover dict STRINGS, not just
    streams: the reader decrypts all strings, so a plaintext /Title would
    come back as garbage (code-review r3 finding — garbled titles were
    baked into the goldens). Title must survive as printable text."""
    import random

    from ocr_model_spark.sources.synth import _real_pdf_doc

    words = "alpha beta gamma delta".split()
    checked = 0
    for i in range(250):
        rng = random.Random(f"deccheck:{i}")
        data = _real_pdf_doc(rng, words)
        r = extract_document_for_pdf(data)
        if r is None:
            continue
        checked += 1
        assert r["ok"], r["error"]
        assert r["regions"], "decrypted doc must extract text"
        if r["title"] is not None:
            assert r["title"].isprintable(), repr(r["title"])
            assert all(w.istitle() or w.isalpha() for w in r["title"].split()), repr(
                r["title"]
            )
    assert checked >= 10  # the seeded mix produced enough decryptable docs


def extract_document_for_pdf(data):
    """Helper: run the kernel, return the result only for DECRYPTED docs."""
    from ocr_model_spark.kernels.extract import extract_document

    r = extract_document(data)
    if (r.get("metadata") or {}).get("encryption") == "standard-decrypted":
        return r
    return None


def test_rc4_encrypted_object_with_nonzero_generation_uses_gen_key():
    """Per-object keys include the 2 generation bytes (Algorithm 1): a
    gen-1 content stream decrypted with an assumed gen 0 yields silent
    garbage instead of text — both load paths record the header's
    generation."""
    from tests.pdf_fixture import build_rc4_encrypted_pdf

    for rev in (2, 3):
        r = extract_pdf(build_rc4_encrypted_pdf(rev, content_gen=1))
        assert r["ok"], (rev, r["error"])
        assert [reg["text"] for reg in r["regions"]] == ["Secret but readable."], rev


def test_predefined_unicode_cmap_font_decodes_as_utf16():
    """Type0 font with /Encoding /UniGB-UCS2-H and NO /ToUnicode: the
    2-byte codes ARE UTF-16BE, so CJK text extracts without any CMap data
    file (the slice of PDFs that previously yielded empty spans)."""
    from tests.pdf_fixture import build_unicode_cmap_pdf

    text = "你好 GB 混合 text"
    r = extract_pdf(build_unicode_cmap_pdf(text))
    assert r["ok"], r["error"]
    assert [reg["text"] for reg in r["regions"]] == [text]


def test_predefined_legacy_cmap_fonts_decode_via_stdlib_codecs():
    """Type0 fonts with predefined LEGACY-charset CMaps (GB-EUC, Big5,
    Shift-JIS, EUC-KR families) and NO /ToUnicode: the show-string bytes
    are national-charset text; each stdlib codec decodes them without any
    CID table (VERDICT r4 item 5 — previously typed-empty)."""
    from tests.pdf_fixture import build_legacy_cmap_pdf

    cases = [
        ("GB-EUC-H", "gbk", "你好世界 mixed ascii"),
        ("GBK-EUC-H", "gbk", "汉字与 ASCII 123"),
        ("GBK2K-H", "gb18030", "简体中文测试"),
        ("ETen-B5-H", "big5", "繁體中文測試 ok"),
        ("90ms-RKSJ-H", "shift_jis", "日本語テスト abc"),
        ("EUC-H", "euc_jp", "漢字かなカナ"),
        ("KSC-EUC-H", "euc_kr", "한국어 시험 x"),
        ("KSCms-UHC-H", "cp949", "한글 텍스트"),
    ]
    for cmap_name, codec, text in cases:
        r = extract_pdf(build_legacy_cmap_pdf(text, cmap_name, codec))
        assert r["ok"], (cmap_name, r["error"])
        assert [reg["text"] for reg in r["regions"]] == [text], cmap_name
    # a ToUnicode map riding along must NOT push the string through the
    # uniform 2-byte splitter (review finding: ASCII runs mis-segment) —
    # the codec outranks it
    from ocr_model_spark.kernels.pdf_native import _decode_with_font

    raw = "abc 日本語".encode("shift_jis")
    font = (True, {0x6162: "XX"}, False, False, "shift_jis")
    assert _decode_with_font(raw, font) == "abc 日本語"


def test_designated_objstm_container_beats_stale_copy():
    """Two live ObjStms both hold object 3; the xref's type-2 entry
    designates the newer container. Expansion must honor the binding —
    iteration order must not resurrect the stale page."""
    from tests.pdf_fixture import build_shadowed_objstm_pdf

    r = extract_pdf(build_shadowed_objstm_pdf())
    assert r["ok"], r["error"]
    texts = [reg["text"] for reg in r["regions"]]
    assert texts == ["Current page text."], texts


def test_identity_cid_gaps_become_spaces_not_concatenation():
    """Dropped (unprintable) CIDs BETWEEN kept runs must separate them —
    'foo<bad>bar' reads 'foo bar', never 'foobar'; edge gaps still vanish."""
    from ocr_model_spark.kernels.pdf_native import _identity_cid_text

    def codes(s: str) -> bytes:
        return s.encode("utf-16-be")

    raw = codes("Hi") + (7).to_bytes(2, "big") + codes("yo")
    assert _identity_cid_text(raw) == "Hi yo"
    # leading/trailing dropped codes add no padding
    raw = (7).to_bytes(2, "big") + codes("Hello world") + (1).to_bytes(2, "big")
    assert _identity_cid_text(raw) == "Hello world"
    # consecutive gaps collapse to ONE space
    raw = codes("ab") + (7).to_bytes(2, "big") * 2 + codes("cdefgh")
    assert _identity_cid_text(raw) == "ab cdefgh"


def test_lzw_ascii85_asciihex_runlength_filters_decode():
    """The four non-Flate stream filters real crawl PDFs use, each built by
    an INDEPENDENT encoder (LZW/RunLength written from the spec; ASCII85 /
    ASCIIHex via stdlib base64/hex), plus a two-stage chain and the
    abbreviated filter names."""
    import base64
    import zlib as _z

    from tests.pdf_fixture import build_filtered_pdf, lzw_encode, runlength_encode

    content = b"BT /F1 12 Tf 72 700 Td (Filtered stream text.) Tj ET"
    cases = [
        (b"/LZWDecode", lzw_encode(content), b""),
        (b"/ASCIIHexDecode", content.hex().encode() + b">", b""),
        (b"/ASCII85Decode", base64.a85encode(content) + b"~>", b""),
        (b"/RunLengthDecode", runlength_encode(content), b""),
        # chain: Flate then ASCII85 on the wire → decode A85 first
        (
            b"[/ASCII85Decode /FlateDecode]",
            base64.a85encode(_z.compress(content)) + b"~>",
            b"",
        ),
        # abbreviated names (table H.1 short forms appear in the wild)
        (b"/AHx", content.hex().encode() + b">", b""),
    ]
    for filt, enc, parms in cases:
        r = extract_pdf(build_filtered_pdf(filt, enc, parms))
        assert r["ok"], (filt, r["error"])
        assert [reg["text"] for reg in r["regions"]] == ["Filtered stream text."], filt


def test_lzw_decoder_width_transitions_and_runs():
    """LZW at table sizes that force 9→10→11-bit code widths (repetitive
    input grows the table fast), round-tripped against the independent
    encoder; RunLength repeat-run edge (128-byte run) included."""
    from ocr_model_spark.kernels.pdf_native import _lzw_decode, _runlength_decode
    from tests.pdf_fixture import lzw_encode, runlength_encode

    for early in (0, 1):
        for payload in (
            b"ab" * 2000,
            bytes(range(256)) * 12,
            b"the quick brown fox " * 300,
            b"",
            b"x",
        ):
            assert _lzw_decode(lzw_encode(payload, early), early) == payload, (
                early,
                payload[:16],
            )
    for payload in (b"\x00" * 128, b"abc", b"aaabbbccc", b"a" * 300 + b"xyz"):
        assert _runlength_decode(runlength_encode(payload)) == payload


def test_ooxml_dispatch_and_pptx_xlsx_extraction():
    """Zip containers refine to docx/pptx/xlsx from member names; slide
    paragraphs and sheet rows come out as regions with correct types; an
    unknown zip (odt-shaped) fails typed instead of garbling."""
    import io
    import zipfile

    from ocr_model_spark.kernels.extract import extract_document
    from ocr_model_spark.sources.synth import _docx_doc, _pptx_doc, _xlsx_doc
    import random

    rng = random.Random("fixed")
    words = "alpha beta gamma delta epsilon".split()

    r = extract_document(_pptx_doc(random.Random("p"), words))
    assert r["doc_type"] == "pptx" and r["ok"]
    assert r["regions"][0]["type"] == "heading"  # title placeholder
    assert r["title"] is not None
    assert int(r["metadata"]["n_slides"]) >= 1
    full = r["text"]
    for reg in r["regions"]:
        assert full[reg["span_start"] : reg["span_end"]] == reg["text"]

    r = extract_document(_xlsx_doc(random.Random("x"), words))
    assert r["doc_type"] == "xlsx" and r["ok"]
    types = {reg["type"] for reg in r["regions"]}
    assert "heading" in types and "table_row" in types
    assert any("|" in reg["text"] for reg in r["regions"] if reg["type"] == "table_row")

    r = extract_document(_docx_doc(rng, words))
    assert r["doc_type"] == "docx" and r["ok"]

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("content.xml", "<office/>")  # odt-shaped container
    r = extract_document(buf.getvalue())
    assert r["ok"] is False and r["error"].startswith("ooxml-unknown-container")
    assert r["doc_type"] == "ooxml"


def test_xlsx_shared_inline_and_numeric_cells():
    """Cell decoding: shared strings, inline strings, numerics; missing
    sharedStrings index yields empty, not a crash."""
    import io
    import zipfile

    from ocr_model_spark.kernels.ooxml_extract import extract_xlsx

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c t="s"><v>0</v></c><c><v>42.5</v></c>'
        '<c t="inlineStr"><is><t>inline text</t></is></c>'
        '<c t="s"><v>99</v></c></row>'
        "</sheetData></worksheet>"
    )
    sst = f'<?xml version="1.0"?><sst {ns}><si><t>shared one</t></si></sst>'
    wb = f'<?xml version="1.0"?><workbook {ns}><sheets><sheet name="S" sheetId="1"/></sheets></workbook>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    r = extract_xlsx(buf.getvalue())
    assert r["ok"]
    row = [reg for reg in r["regions"] if reg["type"] == "table_row"][0]
    assert row["text"] == "shared one | 42.5 | inline text"


def test_xlsx_formula_cells_render_cached_values_never_formula_text():
    """Crawl spreadsheets carry <f> formulas with cached results: plain
    formulas, shared-formula masters AND followers (si-ref with no <f>
    body), string-typed results (t="str"), booleans (t="b"), errors
    (t="e"), and date-styled cached numerics — every one renders its
    cached value; formula text never leaks."""
    import io
    import zipfile

    from ocr_model_spark.kernels.ooxml_extract import extract_xlsx

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    styles = (
        f'<?xml version="1.0"?><styleSheet {ns}>'
        '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs>'
        "</styleSheet>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        # plain formula with cached numeric
        '<row r="1"><c r="A1"><f>SUM(B1:B9)</f><v>105.5</v></c>'
        # shared master + follower (follower has si-only <f/>)
        '<c r="B1"><f t="shared" ref="B1:C1" si="0">A1*2</f><v>211</v></c>'
        '<c r="C1"><f t="shared" si="0"/><v>422</v></c>'
        # string result, boolean result, error result
        '<c r="D1" t="str"><f>CONCAT(A,B)</f><v>net total</v></c>'
        '<c r="E1" t="b"><f>1&gt;0</f><v>1</v></c>'
        '<c r="F1" t="b"><v>0</v></c>'
        '<c r="G1" t="e"><f>1/0</f><v>#DIV/0!</v></c>'
        # date-styled cached numeric renders ISO like any date cell
        '<c r="H1" s="1"><f>TODAY()</f><v>45292</v></c>'
        # valueless boolean cell: stays EMPTY — fabricating FALSE would
        # inject text that does not exist in the sheet (review finding r6)
        '<c r="I1" t="b"/></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        f'<?xml version="1.0"?><workbook {ns}>'
        '<sheets><sheet name="S" sheetId="1"/></sheets></workbook>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/styles.xml", styles)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    r = extract_xlsx(buf.getvalue())
    assert r["ok"]
    row = [reg for reg in r["regions"] if reg["type"] == "table_row"][0]
    assert row["text"] == (
        "105.5 | 211 | 422 | net total | TRUE | FALSE | #DIV/0! | 2024-01-01"
    )
    assert row["text"].count("FALSE") == 1  # none from the valueless I1
    joined = " ".join(reg["text"] for reg in r["regions"])
    assert "SUM" not in joined and "CONCAT" not in joined


def test_xlsx_date_numfmt_renders_iso_dates():
    """Numeric cells styled with a date numFmt render as ISO dates, not raw
    serials: builtin id 14, a custom y/m/d formatCode, fractional serials
    (datetime), the date1904 epoch, and a NON-date style passing through."""
    import io
    import zipfile

    from ocr_model_spark.kernels.ooxml_extract import _serial_to_iso, extract_xlsx

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    styles = (
        f'<?xml version="1.0"?><styleSheet {ns}>'
        '<numFmts count="2">'
        '<numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd"/>'
        # quoted/bracketed runs must NOT date-type a numeric format
        '<numFmt numFmtId="165" formatCode="[Red]0.00&quot;m&quot;"/>'
        "</numFmts>"
        "<cellXfs count="'"4"'">"
        '<xf numFmtId="0"/><xf numFmtId="14"/>'
        '<xf numFmtId="164"/><xf numFmtId="165"/>'
        "</cellXfs></styleSheet>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        # 45292 = 2024-01-01; .5 = noon; style 0/3 are not dates
        '<row r="1"><c s="1"><v>45292</v></c><c s="2"><v>45292.5</v></c>'
        '<c s="0"><v>45292</v></c><c s="3"><v>45292</v></c></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        f'<?xml version="1.0"?><workbook {ns}>'
        '<sheets><sheet name="S" sheetId="1"/></sheets></workbook>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/styles.xml", styles)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    r = extract_xlsx(buf.getvalue())
    assert r["ok"]
    row = [reg for reg in r["regions"] if reg["type"] == "table_row"][0]
    assert row["text"] == "2024-01-01 | 2024-01-01 12:00:00 | 45292 | 45292"
    # 1904 epoch: same serial lands 4 years + 1 day later
    assert _serial_to_iso(0.0, True) == "1904-01-01"
    assert _serial_to_iso(366.0, False) == "1900-12-31"
    assert _serial_to_iso(-1.0, False) is None
    # epoch-aware ceiling: 2,958,000 days past 1904 overflows year 9999 —
    # must return None (typed), never raise (review finding: OverflowError
    # killed the task); the 1900-system ceiling itself stays valid
    assert _serial_to_iso(2_958_000.0, True) is None
    assert _serial_to_iso(2_958_465.0, False) == "9999-12-31"
    assert _serial_to_iso(2_958_465.0 - 1462, True) == "9999-12-31"


def test_pptx_notes_slides_follow_their_slide():
    """Speaker notes resolve via the slide's rels (Type …/notesSlide) and
    append as 'note' regions after that slide's paragraphs; slide-number
    placeholders inside the notes slide are skipped."""
    import io
    import zipfile

    from ocr_model_spark.kernels.ooxml_extract import extract_pptx

    pns = 'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
    ans = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'

    def slide_xml(text):
        return (
            f'<?xml version="1.0"?><p:sld {pns} {ans}><p:cSld><p:spTree>'
            "<p:sp><p:nvSpPr><p:nvPr/></p:nvSpPr><p:txBody>"
            f"<a:p><a:r><a:t>{text}</a:t></a:r></a:p>"
            "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
        )

    notes = (
        f'<?xml version="1.0"?><p:notes {pns} {ans}><p:cSld><p:spTree>'
        "<p:sp><p:nvSpPr><p:nvPr><p:ph type=\"body\"/></p:nvPr></p:nvSpPr>"
        "<p:txBody><a:p><a:r><a:t>remember the demo</a:t></a:r></a:p></p:txBody></p:sp>"
        "<p:sp><p:nvSpPr><p:nvPr><p:ph type=\"sldNum\"/></p:nvPr></p:nvSpPr>"
        "<p:txBody><a:p><a:r><a:t>1</a:t></a:r></a:p></p:txBody></p:sp>"
        "</p:spTree></p:cSld></p:notes>"
    )
    rels_ns = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'
    slide_rels = (
        f'<?xml version="1.0"?><Relationships {rels_ns}>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/notesSlide" '
        'Target="../notesSlides/notesSlide1.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/presentation.xml", f'<?xml version="1.0"?><p:presentation {pns}/>')
        zf.writestr("ppt/slides/slide1.xml", slide_xml("body one"))
        zf.writestr("ppt/slides/slide2.xml", slide_xml("body two"))
        zf.writestr("ppt/slides/_rels/slide1.xml.rels", slide_rels)
        zf.writestr("ppt/notesSlides/notesSlide1.xml", notes)
    r = extract_pptx(buf.getvalue())
    assert r["ok"] and r["metadata"]["n_notes"] == "1"
    seq = [(reg["type"], reg["text"]) for reg in r["regions"]]
    assert seq == [
        ("paragraph", "body one"),
        ("note", "remember the demo"),
        ("paragraph", "body two"),
    ]


def _epub_bytes(spine_order=("ch2", "ch1"), container_xml=None):
    import io
    import zipfile

    def xhtml(body):
        return (
            "<!DOCTYPE html><html><head><title>t</title></head><body>"
            f"<p>{body} paragraph with enough words to score as content here</p>"
            "</body></html>"
        ).encode()

    opf = (
        '<?xml version="1.0"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        "<dc:title>My Book</dc:title></metadata>"
        "<manifest>"
        '<item id="ch1" href="text/ch1.xhtml" media-type="application/xhtml+xml"/>'
        '<item id="ch2" href="text/ch2.xhtml" media-type="application/xhtml+xml"/>'
        "</manifest>"
        "<spine>"
        + "".join(f'<itemref idref="{i}"/>' for i in spine_order)
        + "</spine></package>"
    )
    container = (
        '<?xml version="1.0"?>'
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "META-INF/container.xml",
            container if container_xml is None else container_xml,
        )
        if container_xml is None:
            zf.writestr("OEBPS/content.opf", opf)
        zf.writestr("OEBPS/text/ch1.xhtml", xhtml("first"))
        zf.writestr("OEBPS/text/ch2.xhtml", xhtml("second"))
    return buf.getvalue()


def test_epub_extracts_spine_order_title_and_refines_doc_type():
    """EPUB: OCF container → OPF spine order (not file order), dc:title as
    the leading heading, chapters through the flagship HTML kernel; the
    zip sniff's 'docx' refines to 'epub' in dispatch."""
    from ocr_model_spark.kernels.extract import extract_document

    r = extract_document(_epub_bytes())
    assert r["ok"] and r["doc_type"] == "epub"
    assert r["title"] == "My Book"
    assert r["metadata"]["n_chapters"] == "2"
    texts = [reg["text"] for reg in r["regions"]]
    # spine lists ch2 before ch1 — reading order must follow the spine
    second = next(i for i, t in enumerate(texts) if "second paragraph" in t)
    first = next(i for i, t in enumerate(texts) if "first paragraph" in t)
    assert second < first
    # PRESENT-but-malformed container (dispatch still routes to the epub
    # kernel): the name-ordered xhtml fallback must extract every chapter
    r2 = extract_document(_epub_bytes(container_xml="<notxml"))
    assert r2["ok"] and r2["doc_type"] == "epub"
    assert r2["metadata"]["n_chapters"] == "2"
    t2 = " ".join(reg["text"] for reg in r2["regions"])
    assert "first paragraph" in t2 and "second paragraph" in t2
    # name order (ch1 before ch2), since the spine is unreadable
    assert t2.index("first paragraph") < t2.index("second paragraph")


def test_ole_sniffs_typed_and_binary_payloads_fail_typed():
    """Legacy binary Office (CFB magic) must sniff as 'ole' and fail TYPED
    — and arbitrary binary junk on the text path must come back as
    'binary-payload', never as latin-1 mojibake document text."""
    from ocr_model_spark.kernels.extract import extract_document
    from ocr_model_spark.kernels.sniff import sniff_doc_type

    ole = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + bytes(range(256)) * 4
    assert sniff_doc_type(ole) == "ole"
    r = extract_document(ole)
    # round 6: CFB routes through kernels/ole_extract.py — a structurally
    # unreadable container fails typed with the CFB error, doc_type 'ole'
    assert r["ok"] is False and r["error"].startswith("cfb-")
    # gzip-like binary junk: no magic branch, text path, binary gate fires
    junk = b"\x1f\x8b\x08\x00" + bytes((i * 7) % 256 for i in range(512))
    r = extract_document(junk)
    assert r["ok"] is False and r["error"] == "binary-payload"
    # plain text with a stray control char stays text
    ok = extract_document(b"hello world " * 20 + b"\x00")
    assert ok["ok"] and ok["text"].startswith("hello world")


def test_pptx_slide_order_follows_sldidlst():
    """A deck reordered in the editor keeps file names and changes only
    sldIdLst: extraction must follow PRESENTATION order, not file order."""
    import io
    import zipfile

    from ocr_model_spark.kernels.ooxml_extract import extract_pptx

    pns = 'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
    ans = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'

    def slide(text):
        return (
            f'<?xml version="1.0"?><p:sld {pns} {ans}><p:cSld><p:spTree>'
            f"<p:sp><p:txBody><a:p><a:r><a:t>{text}</a:t></a:r></a:p></p:txBody></p:sp>"
            "</p:spTree></p:cSld></p:sld>"
        )

    pres = (
        f'<?xml version="1.0"?><p:presentation {pns} {rns}><p:sldIdLst>'
        '<p:sldId id="257" r:id="rId2"/><p:sldId id="256" r:id="rId1"/>'
        "</p:sldIdLst></p:presentation>"
    )
    rels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="slides/slide1.xml"/>'
        '<Relationship Id="rId2" Type="t" Target="slides/slide2.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/presentation.xml", pres)
        zf.writestr("ppt/_rels/presentation.xml.rels", rels)
        zf.writestr("ppt/slides/slide1.xml", slide("first file"))
        zf.writestr("ppt/slides/slide2.xml", slide("second file"))
    r = extract_pptx(buf.getvalue())
    assert [reg["text"] for reg in r["regions"]] == ["second file", "first file"]


def test_xlsx_chartsheet_rels_and_rph_exclusion():
    """Sheet names bind through workbook rels (a chartsheet entry must not
    shift names onto the wrong worksheet) and phonetic rPh runs are
    EXCLUDED from shared-string text."""
    import io
    import zipfile

    from ocr_model_spark.kernels.ooxml_extract import extract_xlsx

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    wb = (
        f'<?xml version="1.0"?><workbook {ns} {rns}><sheets>'
        '<sheet name="ChartOnly" sheetId="1" r:id="rId1"/>'
        '<sheet name="RealData" sheetId="2" r:id="rId2"/>'
        "</sheets></workbook>"
    )
    rels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="chartsheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="t" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    sst = (
        f'<?xml version="1.0"?><sst {ns}>'
        "<si><r><t>base</t></r><rPh><r><t>FURIGANA</t></r></rPh></si></sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c t="s"><v>0</v></c></row></sheetData></worksheet>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    r = extract_xlsx(buf.getvalue())
    texts = [reg["text"] for reg in r["regions"]]
    # the single worksheet carries the RealData name, not the chartsheet's
    assert texts == ["RealData", "base"], texts


def test_ascii85_ignores_bytes_after_eod():
    import base64

    from ocr_model_spark.kernels.pdf_native import _ascii85_decode

    enc = base64.a85encode(b"payload bytes") + b"~>\x00\x00junk"
    assert _ascii85_decode(enc) == b"payload bytes"


def test_rtf_payloads_demarkup_on_the_text_path():
    """.rtf sniffs as text; the kernel strips RTF markup instead of
    emitting control words: header tables dropped, \\par → newline,
    hex/unicode escapes decoded, braces/escapes unescaped."""
    rtf = (
        rb"{\rtf1\ansi\deff0{\fonttbl{\f0 Times New Roman;}}"
        rb"{\colortbl;\red0\green0\blue0;}"
        rb"{\*\generator Acme Writer 1.0;}"
        rb"\f0\fs24 Hello \b bold\b0  world.\par"  # next group starts with a space delimiter
        rb" Caf\'e9 costs \u8364 ?5 \{really\}.\par}"
    )
    r = extract_document(rtf)
    assert r["doc_type"] == "text" and r["ok"]
    lines = r["text"].split("\n")
    assert lines[0] == "Hello bold world."
    assert lines[1] == "Café costs €5 {really}."
    assert "fonttbl" not in r["text"] and "Acme" not in r["text"]
    assert r["regions"][0]["text"] == r["text"]


def test_rtf_escape_edge_cases():
    """Review-confirmed failure inputs: \\uc0 writers (no fallback char to
    swallow), hex escapes decoding to braces/backslash survive the
    brace-strip, and control SYMBOLS (\\~ \\- \\_) are handled."""
    from ocr_model_spark.kernels.extract import _rtf_to_text

    # the single space after a control word is its DELIMITER (consumed per
    # spec) — two spaces = delimiter + one content space; with \uc0 no
    # fallback character exists, so nothing beyond the delimiter is eaten
    assert _rtf_to_text(r"{\rtf1\ansi\uc0 caf\u233 test}") == "cafétest"
    assert _rtf_to_text(r"{\rtf1\ansi\uc0 caf\u233  test}") == "café test"
    assert _rtf_to_text(r"{\rtf1 caf\u233 ? next\par done}") == "café next\ndone"
    assert _rtf_to_text(r"{\rtf1 set \'7bx\'7d ok\par}") == "set {x} ok"
    assert _rtf_to_text(r"{\rtf1 C:\'5cUsers ok\par}") == "C:\\Users ok"
    assert _rtf_to_text(r"{\rtf1 hello\~world\par}") == "hello world"
    assert _rtf_to_text(r"{\rtf1 co\-operate non\_breaking\par}") == (
        "cooperate non-breaking"
    )


def test_ooxml_nonstandard_part_names_resolve_via_rel_type():
    """OPC part names are arbitrary: a worksheet at worksheets/data.xml and
    a slide at slides/intro.xml must still extract when the rel Type says
    what they are; a negative shared-string index must not wrap."""
    import io
    import zipfile

    from ocr_model_spark.kernels.ooxml_extract import extract_pptx, extract_xlsx

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    wb = (
        f'<?xml version="1.0"?><workbook {ns} {rns}><sheets>'
        '<sheet name="Odd" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/data.xml"/>'
        "</Relationships>"
    )
    sst = f'<?xml version="1.0"?><sst {ns}><si><t>LAST</t></si></sst>'
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c t="s"><v>-1</v></c><c><v>7</v></c></row>'
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/data.xml", sheet)
    r = extract_xlsx(buf.getvalue())
    texts = [reg["text"] for reg in r["regions"]]
    assert texts == ["Odd", "7"], texts  # found via Type; -1 index NOT 'LAST'

    pns = 'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
    ans = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
    pres = (
        f'<?xml version="1.0"?><p:presentation {pns} {rns}><p:sldIdLst>'
        '<p:sldId id="256" r:id="rId1"/></p:sldIdLst></p:presentation>'
    )
    prels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/slide" Target="slides/intro.xml"/>'
        "</Relationships>"
    )
    slide = (
        f'<?xml version="1.0"?><p:sld {pns} {ans}><p:cSld><p:spTree>'
        "<p:sp><p:txBody><a:p><a:r><a:t>odd slide name</a:t></a:r></a:p>"
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/presentation.xml", pres)
        zf.writestr("ppt/_rels/presentation.xml.rels", prels)
        zf.writestr("ppt/slides/intro.xml", slide)
    r = extract_pptx(buf.getvalue())
    assert [reg["text"] for reg in r["regions"]] == ["odd slide name"]
