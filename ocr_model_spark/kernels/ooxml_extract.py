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
import posixpath
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
        # targets are part-relative ("slides/slide1.xml", "worksheets/…",
        # "../notesSlides/…") unless rooted ("/ppt/…"); normalize '../'
        # segments or such parts silently miss the membership check
        if target.startswith("/"):
            resolved = target[1:]
        else:
            resolved = f"{base}/{target}" if base else target
        out[rid] = (rel.get("Type") or "", posixpath.normpath(resolved))
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


def _notes_regions(
    zf: zipfile.ZipFile, slide_name: str, members: set[str]
) -> list[dict]:
    """Speaker-notes regions for one slide: the slide's rels point at its
    notesSlide part (Type …/relationships/notesSlide — names arbitrary per
    OPC). Every non-empty DrawingML paragraph becomes a ``note`` region;
    slide-number/date placeholder shapes are skipped (they render layout
    fields, not authored notes). ``members`` is hoisted by the caller —
    rebuilding the name set per slide made pptx O(slides × members)."""
    rels = _part_rels(zf, slide_name)
    out: list[dict] = []
    for rtype, target in rels.values():
        if not rtype.endswith("/notesSlide") or target not in members:
            continue
        try:
            with zf.open(target) as f:
                root = ET.parse(f).getroot()
        except (ET.ParseError, KeyError, OSError, zipfile.BadZipFile):
            continue
        for sp in root.iter(f"{_P}sp"):
            if any(
                ph.get("type") in ("sldNum", "dt", "ftr", "hdr")
                for ph in sp.iter(f"{_P}ph")
            ):
                continue
            for para in sp.iter(f"{_A}p"):
                parts = [
                    (node.text or "") if node.tag == f"{_A}t" else " "
                    for node in para.iter()
                    if node.tag in (f"{_A}t", f"{_A}br")
                ]
                text = _norm("".join(parts))
                if text:
                    out.append({"type": "note", "text": text})
    return out


def extract_pptx(data: bytes, _zf: zipfile.ZipFile | None = None) -> dict:
    """Slides in presentation order (``sldIdLst`` via rels, numeric-file
    fallback); one region per non-empty paragraph, followed by that slide's
    speaker-notes paragraphs as ``note`` regions (rels-resolved). Broken
    individual slides degrade (skipped), a broken container fails typed."""
    try:
        zf = _zf or zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError) as e:
        return _fail("pptx-parse-failed", type(e).__name__)
    try:
        slides = _slide_order(zf)
        members = set(zf.namelist())
        raw: list[dict] = []
        n_broken = 0
        n_notes = 0
        for name in slides:
            try:
                with zf.open(name) as f:
                    raw.extend(_slide_regions(ET.parse(f).getroot()))
            except (ET.ParseError, KeyError, OSError, zipfile.BadZipFile):
                n_broken += 1
                continue
            notes = _notes_regions(zf, name, members)
            n_notes += len(notes)
            raw.extend(notes)
        meta = {"n_slides": str(len(slides))}
        if n_notes:
            meta["n_notes"] = str(n_notes)
        if n_broken:
            meta["n_broken_slides"] = str(n_broken)
        return _assemble(raw, meta, "pptx")
    finally:
        if _zf is None:  # close only locally-opened handles
            zf.close()


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


# builtin numFmtIds that render as dates/times (ECMA-376 §18.8.30): date,
# time, and datetime families incl. the East Asian 27–36 block
_DATE_NUMFMT_IDS = frozenset(range(14, 23)) | frozenset(range(27, 37)) | frozenset(
    range(45, 48)
) | frozenset(range(50, 59))
# literal runs a formatCode can contain without being date-typed: quoted
# text, [bracketed] sections (colors/conditions), and escaped chars
_FMT_LITERAL_RE = re.compile(r'(\[[^\]]*\])|("[^"]*")|(\\.)')


def _date_styles(zf: zipfile.ZipFile) -> tuple[frozenset[int], bool]:
    """(style indices whose numFmt is a date/time format, date1904 flag).

    Style index = cell ``s=`` attribute = position in ``cellXfs``; a style
    is date-typed when its numFmtId is a builtin date id or a custom
    formatCode that still contains y/m/d/h/s after literal runs are
    stripped (the openpyxl ``is_date_format`` heuristic). Workbooks without
    styles.xml get the empty set — raw serials pass through unchanged."""
    custom_dates: set[int] = set()
    styles: set[int] = set()
    try:
        with zf.open("xl/styles.xml") as f:
            root = ET.parse(f).getroot()
        for nf in root.iter(f"{_S}numFmt"):
            code = _FMT_LITERAL_RE.sub("", nf.get("formatCode") or "")
            if re.search(r"[dmhysDMHYS]", code):
                try:
                    custom_dates.add(int(nf.get("numFmtId") or ""))
                except ValueError:
                    pass
        cellxfs = root.find(f"{_S}cellXfs")
        if cellxfs is not None:
            for i, xf in enumerate(cellxfs.findall(f"{_S}xf")):
                try:
                    fmt_id = int(xf.get("numFmtId") or "0")
                except ValueError:
                    continue
                if fmt_id in _DATE_NUMFMT_IDS or fmt_id in custom_dates:
                    styles.add(i)
    except (KeyError, ET.ParseError, OSError, zipfile.BadZipFile):
        pass
    date1904 = False
    try:
        with zf.open("xl/workbook.xml") as f:
            root = ET.parse(f).getroot()
        pr = root.find(f"{_S}workbookPr")
        date1904 = pr is not None and (pr.get("date1904") or "").lower() in (
            "1",
            "true",
        )
    except (KeyError, ET.ParseError, OSError, zipfile.BadZipFile):
        pass
    return frozenset(styles), date1904


def _serial_to_iso(serial: float, date1904: bool) -> str | None:
    """Excel serial number → ISO date / datetime string. 1900 system uses
    the conventional 1899-12-30 epoch (absorbing Excel's phantom 1900-02-29
    for serials ≥ 61, same convention openpyxl/pandas use); 1904 system
    counts from 1904-01-01. Integral serials render date-only; fractional
    ones append HH:MM:SS (fraction-of-day rounded to the nearest second)."""
    import datetime as _dt

    # ceiling = 9999-12-31 in the ACTIVE epoch (1904 counts 1462 fewer
    # days to the same date); beyond it datetime overflows → typed None
    ceiling = 2_958_465 - 1462 if date1904 else 2_958_465
    if serial < 0 or serial > ceiling:
        return None
    epoch = _dt.datetime(1904, 1, 1) if date1904 else _dt.datetime(1899, 12, 30)
    days = int(serial)
    secs = round((serial - days) * 86400)
    if secs >= 86400:
        days, secs = days + 1, 0
    stamp = epoch + _dt.timedelta(days=days, seconds=secs)
    if secs == 0:
        return stamp.strftime("%Y-%m-%d")
    return stamp.strftime("%Y-%m-%d %H:%M:%S")


def _cell_text(
    c: ET.Element,
    shared: list[str],
    date_styles: frozenset[int] = frozenset(),
    date1904: bool = False,
) -> str:
    t = c.get("t")
    if t == "inlineStr":
        is_el = c.find(f"{_S}is")
        return _rich_text(is_el) if is_el is not None else ""
    # formula cells (<f> present — plain, shared-master or shared-follower)
    # render their CACHED <v> value through the branches below, never the
    # formula text: the <f> element is simply not read. t="str" (string
    # formula result) and t="e" (error literal) carry their text in <v>.
    v = c.find(f"{_S}v")
    val = (v.text or "") if v is not None else ""
    if t == "b":
        # boolean cells store 0/1; Excel and pandas both display TRUE/FALSE.
        # A valueless <c t="b"/> stays EMPTY — fabricating 'FALSE' would
        # inject text that does not exist in the sheet (review finding r6)
        bval = val.strip()
        if not bval:
            return ""
        return "TRUE" if bval == "1" else "FALSE"
    if t == "s":
        try:
            idx = int(val)
            # negative indices would WRAP via Python list indexing and
            # return the wrong string
            return shared[idx] if idx >= 0 else ""
        except (ValueError, IndexError):
            return ""
    # numeric cell styled with a date numFmt: render the serial as ISO text
    # (the reference's pandas path renders dates too; raw serials are noise)
    if t in (None, "n") and val and date_styles:
        try:
            style = int(c.get("s") or "")
        except ValueError:
            style = -1
        if style in date_styles:
            try:
                iso = _serial_to_iso(float(val), date1904)
            except ValueError:
                iso = None
            if iso is not None:
                return iso
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
    try:
        return _extract_xlsx_open(zf)
    finally:
        if _zf is None:  # close only locally-opened handles
            zf.close()


def _extract_xlsx_open(zf: zipfile.ZipFile) -> dict:
    shared = _shared_strings(zf)
    date_styles, date1904 = _date_styles(zf)
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
            cells = [
                _norm(_cell_text(c, shared, date_styles, date1904))
                for c in row.findall(f"{_S}c")
            ]
            row_text = " | ".join(c for c in cells if c)
            if row_text:
                raw.append({"type": "table_row", "text": row_text})
                n_rows += 1
    return _assemble(
        raw, {"n_sheets": str(len(sheets)), "n_rows": str(n_rows)}, "xlsx"
    )


# -------------------------------------------------------------------- EPUB

_CNT = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF = "{http://www.idpf.org/2007/opf}"
_DC = "{http://purl.org/dc/elements/1.1/}"


def extract_epub(data: bytes, _zf: zipfile.ZipFile | None = None) -> dict:
    """EPUB (the zip-of-XHTML ebook container a web crawl actually hits):
    META-INF/container.xml names the OPF package, the OPF's spine gives
    reading order, and each spine chapter is XHTML — extracted by THE SAME
    HTML kernel the flagship path uses (boilerplate scoring and all), so
    ebook chapters get identical region semantics. dc:title becomes the
    leading heading. Broken chapters degrade (skipped + counted); a broken
    container fails typed. Falls back to name-ordered *.xhtml members when
    container/OPF are missing or malformed."""
    from ocr_model_spark.kernels.html_extract import extract_html

    try:
        zf = _zf or zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError) as e:
        return _fail("epub-parse-failed", type(e).__name__)
    try:
        members = set(zf.namelist())

        def read_xml(name):
            with zf.open(name) as f:
                return ET.parse(f).getroot()

        chapters: list[str] = []
        title = None
        try:
            container = read_xml("META-INF/container.xml")
            rootfile = next(
                rf.get("full-path")
                for rf in container.iter(f"{_CNT}rootfile")
                if rf.get("full-path")
            )
            opf = read_xml(rootfile)
            opf_dir = rootfile.rpartition("/")[0]
            t_el = opf.find(f"{_OPF}metadata/{_DC}title")
            if t_el is not None and (t_el.text or "").strip():
                title = _norm(t_el.text)
            manifest = {
                item.get("id"): item.get("href")
                for item in opf.iter(f"{_OPF}item")
                if item.get("id") and item.get("href")
            }
            for ref in opf.iter(f"{_OPF}itemref"):
                href = manifest.get(ref.get("idref") or "")
                if not href:
                    continue
                resolved = posixpath.normpath(
                    f"{opf_dir}/{href}" if opf_dir else href
                )
                if resolved in members:
                    chapters.append(resolved)
        except (StopIteration, ET.ParseError, KeyError, OSError, zipfile.BadZipFile):
            chapters = []
        if not chapters:  # container/OPF broken: name-ordered XHTML members
            chapters = sorted(
                m for m in members if m.lower().endswith((".xhtml", ".html"))
            )
        raw: list[dict] = []
        if title:
            raw.append({"type": "heading", "text": title})
        n_broken = 0
        for name in chapters:
            try:
                with zf.open(name) as f:
                    chapter = extract_html(f.read())
            except (KeyError, OSError, zipfile.BadZipFile):
                n_broken += 1
                continue
            if not chapter.get("ok"):
                n_broken += 1
                continue
            raw.extend(
                {"type": r["type"], "text": r["text"]} for r in chapter["regions"]
            )
        meta = {"n_chapters": str(len(chapters))}
        if n_broken:
            meta["n_broken_chapters"] = str(n_broken)
        return _assemble(raw, meta, "epub")
    finally:
        if _zf is None:
            zf.close()


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
        # OCF container (META-INF/container.xml) = EPUB; ODT uses
        # META-INF/manifest.xml instead and stays typed-unknown
        if "META-INF/container.xml" in members:
            return extract_epub(data, _zf=zf)
    return _fail("ooxml-unknown-container", "no-known-main-part")
