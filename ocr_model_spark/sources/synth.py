"""Deterministic synthetic Common-Crawl-style corpus generator.

Builds the north-rule input table ``(url, warc_ts, html, text, lang)`` from
the driver's ``documents.parquet`` text (FIXTURES.md §1): every page is a
seeded, pure function of ``(seed, index, base_text)`` — regenerating at any
scale yields byte-identical payloads, which is what makes the byte-identity
pytest replay possible.

Payload mix (fractions of rows, chosen per-row by a seeded RNG):
  * ~83% HTML: boilerplate shell (nav/header/sidebar/footer with high link
    density, short promo blurbs) around main content (h1 + paragraphs + list
    + blockquote with high text density) — exercises the density scorer;
  * ~8% PDFs — half the ``%%SYNTHPAGE`` content-stream subset
    (``kernels/pdf_extract.py``), half REAL classic PDFs for the stdlib
    native reader, of which ~15% use Identity-H Type0 fonts (cid-is-unicode
    recovery), ~10% declare /Encrypt with a real user password (typed
    failure → lineage counters, ``is_encrypted`` summary column) and ~10%
    are RC4-encrypted with an empty user password (decrypted in-pipeline);
  * ~2% plain text — exercises the verbatim-text branch;
  * ~2% DOCX (real zip + WordprocessingML, fixed zip timestamps) —
    exercises the stdlib DOCX kernel (paragraph/heading/list/table walk);
  * ~1.5% PPTX and ~1.5% XLSX (v10) — the OOXML container dispatch +
    slide/sheet kernels (``kernels/ooxml_extract.py``);
  * ~1% truncated HTML — parser tolerance path;
  * ~1% PNG magic bytes — the extraction-failure / lineage-counter path.

~3% of HTML rows are encoded latin-1 with bytes invalid in UTF-8, exercising
the reference's encoding fallback chain (document_processor.py:513-549).

Hosts are Zipf-skewed (a few hosts dominate) so the salted-repartition path
has real skew to defuse, even at sandbox scale.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import random

import pandas as pd

_CRAWL_START = dt.datetime(2024, 3, 1, 0, 0, 0)
_N_HOSTS = 101
# bump when the payload mix / builders change: busts materialize_pages caches
# (payloads are a pure function of (GEN_VERSION, seed, index, base_text))
GEN_VERSION = 17  # v16: real Word 97 .doc slice; v17: Excel 97 .xls + PowerPoint 97 .ppt slices

_NAV_WORDS = ["Home", "About", "Products", "Pricing", "Blog", "Contact", "Careers", "Docs"]
_PROMO = ["Subscribe now!", "Follow us", "Hot deals today", "Sign up free"]


def _host_pool() -> list[str]:
    return [f"site{i:03d}.example.com" for i in range(_N_HOSTS)]


def _pick_host(rng: random.Random, hosts: list[str]) -> str:
    # Zipf-ish: P(rank r) ∝ 1/(r+1); deterministic inverse-CDF sampling
    weights = [1.0 / (r + 1) for r in range(len(hosts))]
    total = sum(weights)
    x = rng.random() * total
    acc = 0.0
    for h, w in zip(hosts, weights):
        acc += w
        if x <= acc:
            return h
    return hosts[-1]


def _sentences(words: list[str], rng: random.Random, n_sentences: int) -> list[str]:
    out = []
    for _ in range(n_sentences):
        k = rng.randint(6, 14)
        ws = [words[rng.randrange(len(words))] for _ in range(k)]
        out.append(" ".join(ws).capitalize() + ".")
    return out


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _html_page(i: int, rng: random.Random, words: list[str], accented: bool) -> bytes:
    title = " ".join(words[rng.randrange(len(words))] for _ in range(4)).title()
    paras = [" ".join(_sentences(words, rng, rng.randint(2, 5))) for _ in range(rng.randint(3, 7))]
    items = [" ".join(_sentences(words, rng, 1)) for _ in range(rng.randint(3, 6))]
    quote = " ".join(_sentences(words, rng, 2))
    if accented:
        paras = [p.replace("a", "á").replace("e", "é") for p in paras]
        quote = quote.replace("o", "ö")
    nav = "".join(f'<li><a href="/{w.lower()}">{w}</a></li>' for w in _NAV_WORDS)
    side = "".join(
        f'<li><a href="/t/{j}">{words[rng.randrange(len(words))]}</a></li>' for j in range(8)
    )
    promo = _PROMO[rng.randrange(len(_PROMO))]
    body_paras = "".join(f"<p>{_esc(p)}</p>" for p in paras)
    body_items = "".join(f"<li>{_esc(it)}</li>" for it in items)
    html = (
        "<!DOCTYPE html><html><head><title>"
        + _esc(title)
        + '</title><script>var x=1;</script><style>p{color:#000}</style></head><body>'
        + f'<nav class="navbar"><ul>{nav}</ul></nav>'
        + f'<header class="page-header"><a href="/">LOGO</a><p>{promo}</p></header>'
        + f'<div class="sidebar"><h3>Links</h3><ul>{side}</ul></div>'
        + '<main><article>'
        + f"<h1>{_esc(title)}</h1>"
        + body_paras
        + f"<ul>{body_items}</ul>"
        + f"<blockquote>{_esc(quote)}</blockquote>"
        + "</article></main>"
        + f'<footer class="footer"><p>© example {1990 + i % 30}</p><a href="/priv">Privacy</a></footer>'
        + "</body></html>"
    )
    return html.encode("latin-1" if accented else "utf-8", errors="replace")


def _pdf_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def _pdf_page_lines(rng: random.Random, words: list[str]) -> list[tuple[int, str]]:
    """(y, text) line layout for one page — shared by both PDF emitters."""
    lines: list[tuple[int, str]] = []
    y = 792 - 72  # PDF user space, bottom-up
    for _ in range(rng.randint(2, 4)):
        for _ in range(rng.randint(1, 4)):
            lines.append((y, " ".join(_sentences(words, rng, 1))))
            y -= 14  # tight leading: same block
        y -= 30  # block gap
    return lines


def _pdf_page_bytes(page_num: int, rng: random.Random, words: list[str]) -> bytes:
    out = [f"%%SYNTHPAGE {page_num} 612 792\n".encode()]
    for y, text in _pdf_page_lines(rng, words):
        out.append(f"BT /F1 12 Tf 72 {y} Td ({_pdf_escape(text)}) Tj ET\n".encode())
    return b"".join(out)


# (cmap name, python codec, deterministic vocabulary) — the v14 CJK slice
_CJK_CMAPS: list[tuple[str, str, list[str]]] = [
    ("GB-EUC-H", "gbk", ["数据", "处理", "文档", "提取", "中文", "网页"]),
    ("ETen-B5-H", "big5", ["資料", "處理", "文件", "擷取", "中文", "網頁"]),
    ("90ms-RKSJ-H", "shift_jis", ["データ", "処理", "文書", "抽出", "日本語", "ページ"]),
]


def _real_pdf_doc(rng: random.Random, words: list[str]) -> bytes:
    """Spec-correct classic PDF (FlateDecode streams, page tree, xref) —
    exercises the stdlib native reader (kernels/pdf_native.py) end-to-end in
    the distributed pipeline. Deterministic (zlib of deterministic text).

    Variants (seeded, GEN_VERSION 8+):
      * ~15% use a Type0 /Identity-H font WITHOUT ToUnicode, showing text as
        UTF-16BE hex strings — the cid-is-unicode recovery path;
      * ~10% declare /Encrypt with an unverifiable /U (a real user
        password): the reader fails typed, lineage counts them,
        doc_summary.is_encrypted is true;
      * ~10% are RC4-encrypted with an EMPTY user password (owner-
        restriction-only, the common secured-web-PDF shape): the reader
        decrypts and extracts; metadata carries encryption =
        standard-decrypted.
    """
    import zlib

    identity_font = rng.random() < 0.15
    # ~10% of non-Identity real PDFs use a predefined LEGACY-charset CMap
    # (v14): the show strings are GBK/Big5/Shift-JIS bytes — the slice of
    # CJK web PDFs pdf_native decodes via stdlib codecs, driver-verified
    # through the extraction pins
    legacy = None
    if not identity_font and rng.random() < 0.10:
        legacy = _CJK_CMAPS[rng.randrange(len(_CJK_CMAPS))]
    enc_roll = rng.random()
    encrypted = enc_roll < 0.10  # unverifiable /U → typed failure
    decryptable = 0.10 <= enc_roll < 0.20  # empty-user-password RC4
    n_pages = rng.randint(1, 3)
    contents = []
    for _ in range(n_pages):
        if identity_font:
            lines = [
                "BT /F1 12 Tf 72 %d Td <%s> Tj ET\n"
                % (y, t.encode("utf-16-be", "replace").hex())
                for y, t in _pdf_page_lines(rng, words)
            ]
        elif legacy is not None:
            cmap_name, codec, vocab = legacy
            lines = [
                "BT /F1 12 Tf 72 %d Td <%s> Tj ET\n"
                % (
                    y,
                    " ".join(
                        vocab[rng.randrange(len(vocab))] for _ in range(4)
                    ).encode(codec).hex(),
                )
                for y, _t in _pdf_page_lines(rng, words)
            ]
        else:
            lines = [
                f"BT /F1 12 Tf 72 {y} Td ({_pdf_escape(t)}) Tj ET\n"
                for y, t in _pdf_page_lines(rng, words)
            ]
        contents.append(zlib.compress("".join(lines).encode("latin-1", "replace")))
    # object layout: 1 catalog, 2 pages-root, then (page, stream) pairs,
    # font [+ descendant], /Info, then optional image / encrypt dict —
    # contiguous numbering (assemble_pdf asserts it)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    font_num = 3 + 2 * n_pages
    title = _pdf_escape(
        " ".join(words[rng.randrange(len(words))] for _ in range(3)).title()
    )
    objects: list[tuple[int, bytes, bytes | None]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (
            2,
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} /MediaBox [0 0 612 792] >>".encode(),
            None,
        ),
    ]
    for i, c in enumerate(contents):
        pnum, snum = 3 + 2 * i, 4 + 2 * i
        objects.append(
            (
                pnum,
                f"<< /Type /Page /Parent 2 0 R /Contents {snum} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>".encode(),
                None,
            )
        )
        objects.append((snum, b"<< /Length %d /Filter /FlateDecode >>" % len(c), c))
    if identity_font:
        objects.append(
            (
                font_num,
                b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-Identity "
                b"/Encoding /Identity-H /DescendantFonts [%d 0 R] >>" % (font_num + 1),
                None,
            )
        )
        objects.append(
            (
                font_num + 1,
                b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth-Identity >>",
                None,
            )
        )
        next_num = font_num + 2
    elif legacy is not None:
        objects.append(
            (
                font_num,
                b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CJK "
                b"/Encoding /%s /DescendantFonts [%d 0 R] >>"
                % (legacy[0].encode(), font_num + 1),
                None,
            )
        )
        objects.append(
            (
                font_num + 1,
                b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Synth-CJK >>",
                None,
            )
        )
        next_num = font_num + 2
    else:
        objects.append(
            (font_num, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", None)
        )
        next_num = font_num + 1
    info_num = next_num
    objects.append(
        (
            info_num,
            f"<< /Title ({title}) /Producer (ocr_model_spark synth) >>".encode("latin-1", "replace"),
            None,
        )
    )
    next_num = info_num + 1
    # ~40% of real PDFs embed an image XObject (S11 export path): a
    # deterministic fake JPEG — DCTDecode streams are exported verbatim,
    # never decoded, so magic bytes + rng body exercise the real plumbing
    if rng.random() < 0.4:
        w, h = rng.randint(32, 640), rng.randint(32, 480)
        jpeg = (
            b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01"
            + bytes(rng.randrange(256) for _ in range(rng.randint(64, 256)))
            + b"\xff\xd9"
        )
        objects.append(
            (
                next_num,
                b"<< /Subtype /Image /Width %d /Height %d /ColorSpace /DeviceRGB "
                b"/BitsPerComponent 8 /Filter /DCTDecode /Length %d >>" % (w, h, len(jpeg)),
                jpeg,
            )
        )
        next_num += 1
    trailer_extra = b"/Info %d 0 R " % info_num
    if encrypted:
        objects.append(
            (
                next_num,
                b"<< /Filter /Standard /V 1 /R 2 /P -44 "
                b"/O <0102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f20> "
                b"/U <000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f> >>",
                None,
            )
        )
        trailer_extra += b"/Encrypt %d 0 R " % next_num
    from ocr_model_spark.kernels.pdf_write import assemble_pdf, encrypt_objects_rc4

    if decryptable:
        id0 = bytes(rng.randrange(256) for _ in range(16))
        objects, trailer_add = encrypt_objects_rc4(objects, id0)
        trailer_extra += trailer_add
    return assemble_pdf(objects, trailer_extra=trailer_extra)


def _xml_esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


_DOCX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def _docx_doc(rng: random.Random, words: list[str]) -> bytes:
    """Minimal deterministic .docx: heading + paragraphs + a list + a table.

    ZIP_STORED with a FIXED timestamp so the bytes are a pure function of the
    rng stream (zip headers embed mtimes; wall clock would break
    byte-identity replays)."""
    import zipfile
    from io import BytesIO

    def p(text: str, style: str | None = None, numbered: bool = False) -> str:
        ppr = ""
        if style or numbered:
            ppr = (
                "<w:pPr>"
                + (f'<w:pStyle w:val="{style}"/>' if style else "")
                + ("<w:numPr><w:ilvl w:val=\"0\"/><w:numId w:val=\"1\"/></w:numPr>" if numbered else "")
                + "</w:pPr>"
            )
        return f"<w:p>{ppr}<w:r><w:t>{_xml_esc(text)}</w:t></w:r></w:p>"

    title = " ".join(words[rng.randrange(len(words))] for _ in range(4)).title()
    paras = [" ".join(_sentences(words, rng, rng.randint(2, 4))) for _ in range(rng.randint(2, 5))]
    items = [" ".join(_sentences(words, rng, 1)) for _ in range(rng.randint(2, 4))]
    n_rows, n_cols = rng.randint(2, 4), rng.randint(2, 3)
    cells = [
        [" ".join(_sentences(words, rng, 1)) for _ in range(n_cols)] for _ in range(n_rows)
    ]
    body = [p(title, style="Heading1")]
    body += [p(t) for t in paras]
    body += [p(t, numbered=True) for t in items]
    body.append(
        "<w:tbl>"
        + "".join(
            "<w:tr>"
            + "".join(f"<w:tc>{p(c)}</w:tc>" for c in row)
            + "</w:tr>"
            for row in cells
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
            info = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            zf.writestr(info, content)
    return buf.getvalue()


def _pptx_doc(rng: random.Random, words: list[str]) -> bytes:
    """Minimal deterministic .pptx: 1-3 slides, each a title placeholder +
    body paragraphs. Fixed zip timestamps (byte-identity rule)."""
    import zipfile
    from io import BytesIO

    def slide(title: str, paras: list[str]) -> str:
        def sp(texts: list[str], ph: str | None) -> str:
            nv = (
                '<p:nvSpPr><p:nvPr>'
                + (f'<p:ph type="{ph}"/>' if ph else "")
                + "</p:nvPr></p:nvSpPr>"
            )
            body = "".join(
                f"<a:p><a:r><a:t>{_xml_esc(t)}</a:t></a:r></a:p>" for t in texts
            )
            return f"<p:sp>{nv}<p:txBody>{body}</p:txBody></p:sp>"

        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
            'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
            "<p:cSld><p:spTree>"
            + sp([title], "title")
            + sp(paras, None)
            + "</p:spTree></p:cSld></p:sld>"
        )

    n_slides = rng.randint(1, 3)
    sld_ids = "".join(
        f'<p:sldId id="{255 + i}" r:id="rId{i}"/>' for i in range(1, n_slides + 1)
    )
    rels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/slide" Target="slides/slide{i}.xml"/>'
            for i in range(1, n_slides + 1)
        )
        + "</Relationships>"
    )
    entries: list[tuple[str, str]] = [
        (
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types '
            'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        ),
        (
            "ppt/presentation.xml",
            '<?xml version="1.0"?><p:presentation '
            'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>",
        ),
        ("ppt/_rels/presentation.xml.rels", rels),
    ]
    rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    for s in range(1, n_slides + 1):
        title = " ".join(words[rng.randrange(len(words))] for _ in range(3)).title()
        paras = [
            " ".join(_sentences(words, rng, rng.randint(1, 3)))
            for _ in range(rng.randint(1, 4))
        ]
        entries.append((f"ppt/slides/slide{s}.xml", slide(title, paras)))
        if rng.random() < 0.5:  # v13: speaker notes on about half the slides
            note_text = " ".join(_sentences(words, rng, rng.randint(1, 2)))
            entries.append(
                (
                    f"ppt/slides/_rels/slide{s}.xml.rels",
                    f'<?xml version="1.0"?><Relationships xmlns="{rel_ns}">'
                    '<Relationship Id="rIdN" Type="http://schemas.openxmlformats.org/'
                    'officeDocument/2006/relationships/notesSlide" '
                    f'Target="../notesSlides/notesSlide{s}.xml"/></Relationships>',
                )
            )
            entries.append(
                (
                    f"ppt/notesSlides/notesSlide{s}.xml",
                    '<?xml version="1.0"?>'
                    '<p:notes xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
                    'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
                    "<p:cSld><p:spTree><p:sp><p:nvSpPr><p:nvPr>"
                    '<p:ph type="body"/></p:nvPr></p:nvSpPr><p:txBody>'
                    f"<a:p><a:r><a:t>{_xml_esc(note_text)}</a:t></a:r></a:p>"
                    "</p:txBody></p:sp></p:spTree></p:cSld></p:notes>",
                )
            )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in entries:
            info = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            zf.writestr(info, content)
    return buf.getvalue()


def _xlsx_doc(rng: random.Random, words: list[str]) -> bytes:
    """Minimal deterministic .xlsx: one or two sheets of shared-string and
    inline-numeric cells. Fixed zip timestamps (byte-identity rule)."""
    import zipfile
    from io import BytesIO

    n_sheets = rng.randint(1, 2)
    shared: list[str] = []

    def sidx(text: str) -> int:
        shared.append(text)
        return len(shared) - 1

    sheets_xml: list[str] = []
    names: list[str] = []
    for s in range(1, n_sheets + 1):
        names.append(f"Data{s}")
        rows = []
        for r in range(1, rng.randint(3, 6) + 1):
            cells = []
            for c in range(rng.randint(2, 4)):
                roll = rng.random()
                if roll < 0.55:
                    text = " ".join(_sentences(words, rng, 1))
                    cells.append(f'<c t="s"><v>{sidx(text)}</v></c>')
                elif roll < 0.7:  # v13: inline string (no sharedStrings hop)
                    text = " ".join(_sentences(words, rng, 1))
                    cells.append(
                        f'<c t="inlineStr"><is><t>{_xml_esc(text)}</t></is></c>'
                    )
                elif roll < 0.85:  # v13: date-styled serial (style 1 = numFmt 14)
                    cells.append(f'<c s="1"><v>{rng.randint(40000, 46000)}</v></c>')
                else:
                    cells.append(f"<c><v>{rng.randint(1, 9999)}</v></c>")
            rows.append(f'<row r="{r}">' + "".join(cells) + "</row>")
        sheets_xml.append(
            '<?xml version="1.0"?><worksheet '
            'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<sheetData>" + "".join(rows) + "</sheetData></worksheet>"
        )
    workbook = (
        '<?xml version="1.0"?><workbook '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        "<sheets>"
        + "".join(
            f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    sst = (
        '<?xml version="1.0"?><sst '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(f"<si><t>{_xml_esc(t)}</t></si>" for t in shared)
        + "</sst>"
    )
    styles = (
        '<?xml version="1.0"?><styleSheet '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs>'
        "</styleSheet>"
    )
    entries = [
        ("xl/workbook.xml", workbook),
        ("xl/_rels/workbook.xml.rels", wb_rels),
        ("xl/sharedStrings.xml", sst),
        ("xl/styles.xml", styles),
    ]
    entries += [
        (f"xl/worksheets/sheet{i + 1}.xml", x) for i, x in enumerate(sheets_xml)
    ]
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in entries:
            info = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            zf.writestr(info, content)
    return buf.getvalue()


def _epub_doc(rng: random.Random, words: list[str]) -> bytes:
    """Minimal deterministic .epub: OCF container + OPF (dc:title, spine)
    + 1-3 XHTML chapters of sentence paragraphs. Fixed zip timestamps
    (byte-identity rule)."""
    import zipfile
    from io import BytesIO

    n_ch = rng.randint(1, 3)
    title = " ".join(words[rng.randrange(len(words))] for _ in range(3)).title()
    chapters = []
    for c in range(1, n_ch + 1):
        paras = "".join(
            f"<p>{_xml_esc(' '.join(_sentences(words, rng, rng.randint(2, 4))))}</p>"
            for _ in range(rng.randint(1, 3))
        )
        chapters.append(
            (
                f"OEBPS/text/ch{c}.xhtml",
                "<!DOCTYPE html><html><head><title>ch</title></head>"
                f"<body>{paras}</body></html>",
            )
        )
    opf = (
        '<?xml version="1.0"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>{_xml_esc(title)}</dc:title></metadata>"
        "<manifest>"
        + "".join(
            f'<item id="ch{c}" href="text/ch{c}.xhtml" '
            'media-type="application/xhtml+xml"/>'
            for c in range(1, n_ch + 1)
        )
        + "</manifest><spine>"
        + "".join(f'<itemref idref="ch{c}"/>' for c in range(1, n_ch + 1))
        + "</spine></package>"
    )
    container = (
        '<?xml version="1.0"?>'
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    )
    entries = [
        ("mimetype", "application/epub+zip"),
        ("META-INF/container.xml", container),
        ("OEBPS/content.opf", opf),
    ] + chapters
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in entries:
            info = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            zf.writestr(info, content)
    return buf.getvalue()


def _image_doc(rng: random.Random) -> bytes:
    """Image payload with a VALID container header (v12): PNG IHDR, GIF89a
    logical-screen descriptor, or JPEG APP0+SOF0 — dims parseable by the
    stdlib header scanner (operators/multimodal.py::_header_dims) and, for
    png/gif, by fixed-offset hex arithmetic in the DuckDB oracle. The random
    tail keeps payloads opaque (no real pixel data — these exercise the
    metadata path, not a decoder)."""
    import zlib

    w = rng.randint(16, 2048)
    h = rng.randint(16, 2048)
    tail = bytes(rng.randrange(256) for _ in range(96))
    kind = rng.random()
    if kind < 0.5:  # PNG: signature + IHDR(width, height, 8-bit RGB) + tail
        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
        crc = zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big")
        return (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big") + b"IHDR" + ihdr + crc + tail
        )
    if kind < 0.8:  # GIF89a: logical screen descriptor (little-endian dims)
        return (
            b"GIF89a"
            + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + b"\xf7\x00\x00" + tail
        )
    # JPEG: SOI + APP0(JFIF) + SOF0 carrying (height, width) big-endian
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + tail


def _doc_doc(rng: random.Random, words: list[str]) -> bytes:
    """Minimal deterministic Word 97 .doc through the kernel's spec
    writer (kernels/ole_extract.py::build_doc). Mix: plain cp1252 single
    piece, a UTF-16LE piece forced by a non-cp1252 character, and a
    two-piece table (cp1252 + UTF-16LE) — all three decode paths of the
    piece-table reader."""
    from ocr_model_spark.kernels.ole_extract import build_doc

    paras = [
        " ".join(_sentences(words, rng, rng.randint(1, 3)))
        for _ in range(rng.randint(2, 5))
    ]
    variant = rng.random()
    if variant < 0.2:  # non-cp1252 → single UTF-16LE piece
        paras[0] = paras[0] + " → Δ"
        return build_doc(paras)
    if variant < 0.4:  # forced two-piece Clx
        return build_doc(paras, split_pieces=True)
    return build_doc(paras)


def _xls_doc(rng: random.Random, words: list[str]) -> bytes:
    """Minimal deterministic Excel 97 .xls through the kernel's spec
    writer (kernels/xls_extract.py::build_xls). Mix exercises every cell
    record the reader covers: SST strings (sometimes CONTINUE-split),
    RK ints, NUMBER floats, BOOLERR, date-XF serials (both epochs)."""
    import datetime as _dt

    from ocr_model_spark.kernels.xls_extract import build_xls

    n_rows = rng.randint(2, 5)
    rows: list[list[object]] = []
    for r in range(n_rows):
        rows.append(
            [
                " ".join(rng.choice(words) for _ in range(rng.randint(1, 4))),
                rng.randint(-5000, 5000),
                round(rng.uniform(-100.0, 100.0), 3),
                rng.random() < 0.5,
                _dt.date(2020, 1, 1) + _dt.timedelta(days=rng.randint(0, 2000)),
            ]
        )
    sheets = [("Data", rows)]
    if rng.random() < 0.3:
        sheets.append(
            ("Notes", [[" ".join(_sentences(words, rng, 1)), rng.randint(0, 99)]])
        )
    return build_xls(
        sheets,
        date1904=rng.random() < 0.2,
        split_sst=rng.random() < 0.25,
    )


def _ppt_doc(rng: random.Random, words: list[str]) -> bytes:
    """Minimal deterministic PowerPoint 97 .ppt through the kernel's spec
    writer (kernels/ppt_extract.py::build_ppt). A non-latin-1 character in
    some decks forces the TextCharsAtom (UTF-16LE) path; the rest ride
    TextBytesAtom. Multi-paragraph atoms via the \\r separator."""
    from ocr_model_spark.kernels.ppt_extract import build_ppt

    texts = []
    for _ in range(rng.randint(2, 5)):
        t = " ".join(_sentences(words, rng, rng.randint(1, 2)))
        if rng.random() < 0.25:
            t += "\r" + " ".join(_sentences(words, rng, 1))
        if rng.random() < 0.2:
            t += " — Σ"  # forces the UTF-16LE chars atom
        texts.append(t)
    return build_ppt(texts)


def _pdf_doc(rng: random.Random, words: list[str]) -> bytes:
    # half the PDFs are real classic files (native stdlib reader path),
    # half the %%SYNTHPAGE subset (deterministic reference grammar)
    if rng.random() < 0.5:
        return _real_pdf_doc(rng, words)
    n_pages = rng.randint(1, 3)
    parts = [b"%PDF-1.4\n%%SYNTHPDF deterministic synthetic subset\n"]
    parts += [_pdf_page_bytes(p, rng, words) for p in range(1, n_pages + 1)]
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def build_page_row(seed: int, i: int, base_text: str, base_lang: str) -> dict:
    """Pure function of (seed, i, base_text): one pages-table row."""
    rng = random.Random(f"{seed}:{i}")
    hosts = _host_pool()
    host = _pick_host(rng, hosts)
    url = f"https://{host}/p/{hashlib.sha256(f'{seed}:{i}'.encode()).hexdigest()[:12]}-{i}"
    warc_ts = _CRAWL_START + dt.timedelta(seconds=37 * i)
    words = base_text.split() or ["lorem", "ipsum", "dolor"]
    roll = rng.random()
    lang = base_lang or "en"
    if roll < 0.08:
        html = _pdf_doc(rng, words)
    elif roll < 0.10:
        html = (" ".join(_sentences(words, rng, rng.randint(4, 10)))).encode("utf-8")
    elif roll < 0.11:
        full = _html_page(i, rng, words, accented=False)
        html = full[: max(64, len(full) * 2 // 3)]  # truncated mid-document
    elif roll < 0.12:
        html = _image_doc(rng)
    elif roll < 0.14:
        html = _docx_doc(rng, words)
    elif roll < 0.155:
        html = _pptx_doc(rng, words)
    elif roll < 0.17:
        html = _xlsx_doc(rng, words)
    elif roll < 0.175:  # v15: ebooks — OCF container through the HTML kernel
        html = _epub_doc(rng, words)
    elif roll < 0.178:  # v15: legacy binary Office junk (typed OLE failure)
        html = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + bytes(
            rng.randrange(256) for _ in range(rng.randint(128, 512))
        )
    elif roll < 0.182:  # v16: real Word 97 .doc (piece-table extraction)
        html = _doc_doc(rng, words)
    elif roll < 0.185:  # v17: Excel 97 .xls (BIFF8 record-chain extraction)
        html = _xls_doc(rng, words)
    elif roll < 0.188:  # v17: PowerPoint 97 .ppt (text-atom walk)
        html = _ppt_doc(rng, words)
    else:
        accented = rng.random() < 0.03
        if accented:
            lang = "de"
        html = _html_page(i, rng, words, accented)
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": base_text if rng.random() < 0.5 else None,
        "lang": lang,
    }


def build_pages_pandas(docs: pd.DataFrame, n_pages: int, seed: int = 42) -> pd.DataFrame:
    """Build ``n_pages`` synthetic pages from a documents frame
    (``doc_id,text,lang,…``). Deterministic in (docs order, n_pages, seed)."""
    texts = docs["text"].tolist()
    langs = docs["lang"].tolist() if "lang" in docs else ["en"] * len(texts)
    rows = [
        build_page_row(seed, i, texts[i % len(texts)], langs[i % len(langs)])
        for i in range(n_pages)
    ]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def materialize_pages(
    sf_dir: str, out_dir: str, n_pages: int | None = None, seed: int = 42
) -> str:
    """Materialize the synthetic pages table as parquet next to the workdir.

    Cached: if the target file already exists it is reused (payloads are a
    pure function of (seed, index, documents.parquet), so reuse is safe).
    Returns the parquet path.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    if n_pages is None:
        n_pages = len(docs)
    path = os.path.join(out_dir, f"pages_seed{seed}_n{n_pages}_v{GEN_VERSION}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    pdf = build_pages_pandas(docs, n_pages, seed)
    schema = pa.schema(
        [
            pa.field("url", pa.string(), nullable=False),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    # write a MULTI-FILE dataset (like a real crawl's many WARC-derived
    # files): a single parquet file is one Spark scan task no matter the
    # core count, which serializes the scan stage of every downstream job
    n_files = max(1, min(64, n_pages // 625))
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    chunk = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if part.empty:
            continue
        table = pa.Table.from_pandas(part, preserve_index=False).cast(schema)
        pq.write_table(table, os.path.join(tmp, f"part-{i:05d}.parquet"))
    os.replace(tmp, path)
    return path
