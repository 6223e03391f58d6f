"""PPTX / XLSX native-text extraction + OOXML container dispatch — stdlib.

The magic-byte sniff can only see ``PK\\x03\\x04`` (one JVM-side branch for
every OOXML/zip container — reference behavior: ``worker/pipeline/
io_conversion.py:23`` maps any zip to the Word MIME type). The kernel is
where the container opens, so the REFINED doc_type is decided here from the
zip's member names:

  * ``word/document.xml``      → DOCX  (kernels/docx_extract.py)
  * ``ppt/presentation.xml``   → PPTX  (slides → heading/paragraph regions)
  * ``xl/workbook.xml``        → XLSX  (sheets → heading + table_row regions)
  * anything else (odt, plain zips, jars…) → typed ``ooxml-unknown-container``

The reference ingests only docx of this family; pptx/xlsx are
beyond-reference additions a crawl-scale training pipeline needs (decks and
spreadsheets are a real slice of office documents on the web). Both follow
the unified kernel contract (regions with span offsets into the
"\\n\\n"-joined text, native confidence 1.0, typed failures, deterministic).
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile

_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")
_SHEET_RE = re.compile(r"^xl/worksheets/sheet(\d+)\.xml$")


def _norm(s: str) -> str:
    return " ".join(s.split())


def _fail(kind: str, err: str) -> dict:
    return {
        "text": "",
        "title": None,
        "encoding": None,
        "ok": False,
        "error": f"{kind}:{err}",
        "metadata": {},
        "regions": [],
        "doc_type": kind.split("-", 1)[0],
    }


def _assemble(raw_regions: list[dict], metadata: dict, doc_type: str) -> dict:
    """Shared span-offset assembly (same rule as docx_extract)."""
    regions: list[dict] = []
    parts: list[str] = []
    title = None
    offset = 0
    for i, r in enumerate(raw_regions):
        text = r["text"]
        if title is None and r["type"] == "heading":
            title = text
        regions.append(
            {
                "idx": i,
                "type": r["type"],
                "text": text,
                "span_start": offset,
                "span_end": offset + len(text),
                "link_density": 0.0,
                "text_density": float(len(text)),
                "confidence": 1.0,  # native text layer
                "needs_review": False,
            }
        )
        parts.append(text)
        offset += len(text) + 2  # "\n\n" joiner
    return {
        "text": "\n\n".join(parts),
        "title": title,
        "encoding": "utf-8",
        "ok": True,
        "error": None,
        "metadata": metadata,
        "regions": regions,
        "doc_type": doc_type,
    }


# ------------------------------------------------------------------- PPTX


def _slide_regions(root: ET.Element) -> list[dict]:
    """Regions from one slide: every DrawingML paragraph (``a:p``) in shape
    order; paragraphs inside a title placeholder become headings."""
    out: list[dict] = []
    for sp in root.iter(f"{_P}sp"):
        is_title = any(
            ph.get("type") in ("title", "ctrTitle")
            for ph in sp.iter(f"{_P}ph")
        )
        for para in sp.iter(f"{_A}p"):
            parts = []
            for node in para.iter():
                if node.tag == f"{_A}t":
                    parts.append(node.text or "")
                elif node.tag == f"{_A}br":
                    parts.append(" ")
            text = _norm("".join(parts))
            if text:
                out.append(
                    {"type": "heading" if is_title else "paragraph", "text": text}
                )
    return out


def extract_pptx(data: bytes) -> dict:
    """Slides in numeric order (``ppt/slides/slideN.xml``); one region per
    non-empty paragraph. Broken individual slides degrade (skipped), a
    broken container fails typed."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError) as e:
        return _fail("pptx-parse-failed", type(e).__name__)
    slides = sorted(
        (
            (int(m.group(1)), name)
            for name in zf.namelist()
            if (m := _SLIDE_RE.match(name))
        ),
    )
    raw: list[dict] = []
    n_broken = 0
    for _num, name in slides:
        try:
            with zf.open(name) as f:
                raw.extend(_slide_regions(ET.parse(f).getroot()))
        except (ET.ParseError, KeyError, OSError, zipfile.BadZipFile):
            n_broken += 1
    meta = {"n_slides": str(len(slides))}
    if n_broken:
        meta["n_broken_slides"] = str(n_broken)
    return _assemble(raw, meta, "pptx")


# ------------------------------------------------------------------- XLSX


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        with zf.open("xl/sharedStrings.xml") as f:
            root = ET.parse(f).getroot()
    except (KeyError, ET.ParseError, OSError, zipfile.BadZipFile):
        return []
    out = []
    for si in root.findall(f"{_S}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
    return out


def _sheet_names(zf: zipfile.ZipFile) -> list[str]:
    try:
        with zf.open("xl/workbook.xml") as f:
            root = ET.parse(f).getroot()
    except (KeyError, ET.ParseError, OSError, zipfile.BadZipFile):
        return []
    return [
        s.get("name") or ""
        for s in root.iter(f"{_S}sheet")
    ]


def _cell_text(c: ET.Element, shared: list[str]) -> str:
    t = c.get("t")
    if t == "inlineStr":
        is_el = c.find(f"{_S}is")
        if is_el is not None:
            return "".join(x.text or "" for x in is_el.iter(f"{_S}t"))
        return ""
    v = c.find(f"{_S}v")
    val = (v.text or "") if v is not None else ""
    if t == "s":
        try:
            return shared[int(val)]
        except (ValueError, IndexError):
            return ""
    return val


def extract_xlsx(data: bytes) -> dict:
    """Worksheets in numeric order; a heading region per sheet (its
    workbook name, positional — or ``sheet N``) and a ``table_row`` region
    per non-empty row, cells joined with ``" | "`` (the engine's
    rows-of-cells layout, same as DOCX tables)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError) as e:
        return _fail("xlsx-parse-failed", type(e).__name__)
    shared = _shared_strings(zf)
    names = _sheet_names(zf)
    sheets = sorted(
        (
            (int(m.group(1)), name)
            for name in zf.namelist()
            if (m := _SHEET_RE.match(name))
        ),
    )
    raw: list[dict] = []
    n_rows = 0
    for pos, (num, entry) in enumerate(sheets):
        label = names[pos] if pos < len(names) else f"sheet {num}"
        raw.append({"type": "heading", "text": _norm(label) or f"sheet {num}"})
        try:
            with zf.open(entry) as f:
                root = ET.parse(f).getroot()
        except (ET.ParseError, KeyError, OSError, zipfile.BadZipFile):
            continue
        for row in root.iter(f"{_S}row"):
            cells = [_norm(_cell_text(c, shared)) for c in row.findall(f"{_S}c")]
            row_text = " | ".join(c for c in cells if c)
            if row_text:
                raw.append({"type": "table_row", "text": row_text})
                n_rows += 1
    return _assemble(
        raw, {"n_sheets": str(len(sheets)), "n_rows": str(n_rows)}, "xlsx"
    )


# --------------------------------------------------------------- dispatch


def extract_ooxml(data: bytes) -> dict:
    """Open the zip once, refine the container type from member names, and
    run the matching kernel. The result carries the REFINED ``doc_type``
    (docx/pptx/xlsx) — the sniff's 'docx' is container-level only."""
    from ocr_model_spark.kernels.docx_extract import extract_docx

    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            members = set(zf.namelist())
    except (zipfile.BadZipFile, OSError):
        # unreadable container: keep the historical docx-typed failure
        out = extract_docx(data)
        out["doc_type"] = "docx"
        return out
    if "word/document.xml" in members:
        out = extract_docx(data)
        out["doc_type"] = "docx"
        return out
    if "ppt/presentation.xml" in members or any(
        _SLIDE_RE.match(m) for m in members
    ):
        return extract_pptx(data)
    if "xl/workbook.xml" in members or any(_SHEET_RE.match(m) for m in members):
        return extract_xlsx(data)
    return _fail("ooxml-unknown-container", "no-known-main-part")
