"""DOCX native-text extraction (SURVEY.md S9) — stdlib only.

Reference semantics: ``worker/document_processor.py:551-604`` walks a DOCX
with python-docx, emitting one text block per paragraph and one per table
(rows of cell texts). A .docx is a zip archive whose main part is
``word/document.xml`` (WordprocessingML), so ``zipfile`` + ``xml.etree``
re-implement the same walk without the optional dependency:

  * ``w:p``   → one region; type ``heading`` when the paragraph style is
    Heading*/Title (document_processor.py:569 keeps heading levels), else
    ``list_item`` when numbering (``w:numPr``) is attached, else
    ``paragraph``;
  * ``w:tbl`` → one region per table ROW (``w:tr``), cells joined with
    ``" | "`` — the reference's rows-of-cells layout (:595-604) flattened to
    the engine's Region model;
  * run text = all ``w:t`` descendants in document order; ``w:tab``/``w:br``
    contribute a space (whitespace-normalized away anyway).

Output matches the unified kernel contract (html_extract/pdf_extract):
regions carry span offsets into the "\\n\\n"-joined document text, native
text confidence is 1.0 (same rule as the plain-text branch). Deterministic:
pure function of the payload bytes.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

_MIN_CHARS = 1  # native text: keep everything non-empty (no OCR noise)


def _norm(s: str) -> str:
    return " ".join(s.split())


def _runs_text(el: ET.Element) -> str:
    """Concatenate w:t descendants; tabs/breaks become spaces."""
    parts: list[str] = []
    for node in el.iter():
        tag = node.tag
        if tag == f"{_W}t":
            parts.append(node.text or "")
        elif tag in (f"{_W}tab", f"{_W}br", f"{_W}cr"):
            parts.append(" ")
    return "".join(parts)


def _para_type(p: ET.Element) -> str:
    ppr = p.find(f"{_W}pPr")
    if ppr is not None:
        style = ppr.find(f"{_W}pStyle")
        if style is not None:
            val = style.get(f"{_W}val", "")
            if val.lower().startswith(("heading", "title")):
                return "heading"
        if ppr.find(f"{_W}numPr") is not None:
            return "list_item"
    return "paragraph"


def _walk_body(body: ET.Element) -> tuple[list[dict], int, int]:
    """Document-order regions from paragraphs and tables (tables may nest
    inside table cells; only top-level blocks are walked, like the
    reference's ``document.paragraphs`` + ``document.tables``)."""
    regions: list[dict] = []
    n_paragraphs = 0
    n_tables = 0
    for child in body:
        if child.tag == f"{_W}p":
            n_paragraphs += 1
            text = _norm(_runs_text(child))
            if len(text) >= _MIN_CHARS:
                regions.append({"type": _para_type(child), "text": text})
        elif child.tag == f"{_W}tbl":
            n_tables += 1
            for tr in child.findall(f"{_W}tr"):
                cells = [
                    _norm(_runs_text(tc)) for tc in tr.findall(f"{_W}tc")
                ]
                row_text = " | ".join(c for c in cells if c)
                if row_text:
                    regions.append({"type": "table_row", "text": row_text})
    return regions, n_paragraphs, n_tables


def extract_docx(data: bytes, _zf: "zipfile.ZipFile | None" = None) -> dict:
    """Extract text from DOCX bytes. Unified kernel result dict; never
    raises — malformed zips / XML come back as ``ok=False`` with a typed
    error (the lineage failure counters pick those up). ``_zf`` lets the
    OOXML dispatcher pass its already-open archive (one central-directory
    parse per document)."""
    try:
        # caller-owned handles stay open; a locally-opened one is closed
        # before return (contextlib.nullcontext keeps one code path)
        import contextlib

        ctx = contextlib.nullcontext(_zf) if _zf is not None else zipfile.ZipFile(
            io.BytesIO(data)
        )
        with ctx as zf:
            with zf.open("word/document.xml") as f:
                root = ET.parse(f).getroot()
    except (zipfile.BadZipFile, KeyError, ET.ParseError, OSError) as e:
        return {
            "text": "",
            "title": None,
            "encoding": None,
            "ok": False,
            "error": f"docx-parse-failed:{type(e).__name__}",
            "metadata": {},
            "regions": [],
        }
    body = root.find(f"{_W}body")
    if body is None:
        return {
            "text": "",
            "title": None,
            "encoding": None,
            "ok": False,
            "error": "docx-parse-failed:no-body",
            "metadata": {},
            "regions": [],
        }
    raw_regions, n_paragraphs, n_tables = _walk_body(body)
    # shared span-offset/title assembly — ONE implementation of the
    # offset-+2 / first-heading-title / native-confidence invariant for
    # every OOXML kernel (no top-level import cycle: ooxml_extract imports
    # this module only inside its dispatch function)
    from ocr_model_spark.kernels.ooxml_extract import _assemble

    return _assemble(
        raw_regions,
        {"n_paragraphs": str(n_paragraphs), "n_tables": str(n_tables)},
        "docx",
    )
