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
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")
_SHEET_RE = re.compile(r"^xl/worksheets/sheet(\d+)\.xml$")


def _part_rels(zf: zipfile.ZipFile, part: str) -> dict[str, tuple[str, str]]:
    """rId → (relationship Type, resolved member name) from a part's .rels
    (e.g. ``ppt/_rels/presentation.xml.rels``); {} when absent/broken. The
    TYPE is the spec's part discriminator — OPC part NAMES are arbitrary
    (a worksheet may legally live at worksheets/data.xml), so filename
    patterns must never be the primary filter."""
    base, _, fname = part.rpartition("/")
    rels_name = f"{base}/_rels/{fname}.rels" if base else f"_rels/{fname}.rels"
    try:
        with zf.open(rels_name) as f:
            root = ET.parse(f).getroot()
    except (KeyError, ET.ParseError, OSError, zipfile.BadZipFile):
        return {}
    out: dict[str, tuple[str, str]] = {}
    for rel in root.iter(f"{_REL}Relationship"):
        rid, target = rel.get("Id"), rel.get("Target")
        if not rid or not target:
            continue
        # targets are part-relative ("slides/slide1.xml", "worksheets/…")
        # unless rooted ("/ppt/…")
        if target.startswith("/"):
            resolved = target[1:]
        else:
            resolved = f"{base}/{target}" if base else target
        out[rid] = (rel.get("Type") or "", resolved)
    return out


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


def _slide_order(zf: zipfile.ZipFile) -> list[str]:
    """Slide member names in PRESENTATION order: ``p:sldIdLst`` r:ids
    resolved through presentation.xml.rels (a deck reordered in the editor
    keeps its original file names and changes only the id list). Falls back
    to numeric file order for decks without the list."""
    matched = [
        (int(m.group(1)), nm) for nm in zf.namelist() if (m := _SLIDE_RE.match(nm))
    ]
    numeric = [name for _n, name in sorted(matched)]
    try:
        with zf.open("ppt/presentation.xml") as f:
            root = ET.parse(f).getroot()
    except (KeyError, ET.ParseError, OSError, zipfile.BadZipFile):
        return numeric
    rels = _part_rels(zf, "ppt/presentation.xml")
    members = set(zf.namelist())
    ordered = [
        rels[sld.get(f"{_R}id")]
        for sld in root.iter(f"{_P}sldId")
        if sld.get(f"{_R}id") in rels
    ]
    # the rel TYPE (…/relationships/slide) is the discriminator; accept a
    # filename match too for writers with nonstandard Type strings, and
    # require the part to exist
    ordered = [
        name
        for rtype, name in ordered
        if name in members
        and (rtype.endswith("/slide") or _SLIDE_RE.match(name))
    ]
    if not ordered:
        return numeric
    # any slide files the id list misses (broken rels) append in file order
    return ordered + [n for n in numeric if n not in ordered]


def extract_pptx(data: bytes, _zf: zipfile.ZipFile | None = None) -> dict:
    """Slides in presentation order (``sldIdLst`` via rels, numeric-file
    fallback); one region per non-empty paragraph. Broken individual slides
    degrade (skipped), a broken container fails typed."""
    try:
        zf = _zf or zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError) as e:
        return _fail("pptx-parse-failed", type(e).__name__)
    slides = _slide_order(zf)
    raw: list[dict] = []
    n_broken = 0
    for name in slides:
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


def _rich_text(el: ET.Element) -> str:
    """Text of an ``si``/``is`` rich-string node: ``t`` runs EXCLUDING
    phonetic ``rPh`` subtrees (furigana annotations duplicate the base text
    if naively collected — openpyxl/pandas exclude them too)."""
    parts: list[str] = []

    def walk(node: ET.Element) -> None:
        if node.tag == f"{_S}rPh":
            return
        if node.tag == f"{_S}t":
            parts.append(node.text or "")
            return
        for ch in node:
            walk(ch)

    walk(el)
    return "".join(parts)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        with zf.open("xl/sharedStrings.xml") as f:
            root = ET.parse(f).getroot()
    except (KeyError, ET.ParseError, OSError, zipfile.BadZipFile):
        return []
    return [_rich_text(si) for si in root.findall(f"{_S}si")]


def _workbook_sheets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """(name, worksheet member) in WORKBOOK order, resolved through
    ``xl/_rels/workbook.xml.rels`` — positional pairing misattributes names
    when chartsheets interleave or sheets were reordered. Entries whose
    rel target is not a worksheet part (chartsheets) are skipped."""
    try:
        with zf.open("xl/workbook.xml") as f:
            root = ET.parse(f).getroot()
    except (KeyError, ET.ParseError, OSError, zipfile.BadZipFile):
        return []
    rels = _part_rels(zf, "xl/workbook.xml")
    members = set(zf.namelist())
    out: list[tuple[str, str]] = []
    for s in root.iter(f"{_S}sheet"):
        got = rels.get(s.get(f"{_R}id") or "")
        if got is None:
            continue
        rtype, target = got
        # worksheet rel TYPE is the discriminator (chartsheets carry
        # …/chartsheet); filename is only a fallback for odd Type strings.
        # OPC part names are arbitrary, so worksheets/data.xml is legal.
        if target in members and (
            rtype.endswith("/worksheet") or _SHEET_RE.match(target)
        ):
            out.append((s.get("name") or "", target))
    return out


def _cell_text(c: ET.Element, shared: list[str]) -> str:
    t = c.get("t")
    if t == "inlineStr":
        is_el = c.find(f"{_S}is")
        return _rich_text(is_el) if is_el is not None else ""
    v = c.find(f"{_S}v")
    val = (v.text or "") if v is not None else ""
    if t == "s":
        try:
            idx = int(val)
            # negative indices would WRAP via Python list indexing and
            # return the wrong string
            return shared[idx] if idx >= 0 else ""
        except (ValueError, IndexError):
            return ""
    return val


def extract_xlsx(data: bytes, _zf: zipfile.ZipFile | None = None) -> dict:
    """Worksheets in workbook order (names bound via workbook rels, with a
    numeric-file fallback when workbook.xml/rels are broken); a heading
    region per sheet and a ``table_row`` region per non-empty row, cells
    joined with ``" | "`` (the engine's rows-of-cells layout, same as DOCX
    tables)."""
    try:
        zf = _zf or zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError) as e:
        return _fail("xlsx-parse-failed", type(e).__name__)
    shared = _shared_strings(zf)
    sheets = _workbook_sheets(zf)
    if not sheets:
        # no usable rels: numeric file order, names paired positionally
        # from workbook.xml only when the counts line up exactly
        matched = [
            (int(m.group(1)), nm)
            for nm in zf.namelist()
            if (m := _SHEET_RE.match(nm))
        ]
        numeric = sorted(matched)
        names: list[str] = []
        try:
            with zf.open("xl/workbook.xml") as f:
                names = [
                    s.get("name") or ""
                    for s in ET.parse(f).getroot().iter(f"{_S}sheet")
                ]
        except (KeyError, ET.ParseError, OSError, zipfile.BadZipFile):
            pass
        if len(names) != len(numeric):
            names = [f"sheet {num}" for num, _nm in numeric]
        sheets = [(names[i], nm) for i, (_num, nm) in enumerate(numeric)]
    raw: list[dict] = []
    n_rows = 0
    for label, entry in sheets:
        raw.append({"type": "heading", "text": _norm(label) or entry})
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
        zf = zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError):
        # unreadable container: keep the historical docx-typed failure
        out = extract_docx(data)
        out["doc_type"] = "docx"
        return out
    with zf:
        members = set(zf.namelist())
        if "word/document.xml" in members:
            out = extract_docx(data, _zf=zf)
            out["doc_type"] = "docx"
            return out
        # the already-open ZipFile rides along: the central directory is
        # parsed once per document, not once for dispatch + once for extract
        if "ppt/presentation.xml" in members or any(
            _SLIDE_RE.match(m) for m in members
        ):
            return extract_pptx(data, _zf=zf)
        if "xl/workbook.xml" in members or any(_SHEET_RE.match(m) for m in members):
            return extract_xlsx(data, _zf=zf)
    return _fail("ooxml-unknown-container", "no-known-main-part")
