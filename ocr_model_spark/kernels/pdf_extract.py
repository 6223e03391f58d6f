"""PDF text-layer extraction: block/line/span reconstruction.

Reference semantics: ``worker/pipeline/processors/pdf_processor.py:49-76``
(PyMuPDF ``get_text("dict")`` blocks→lines→spans, skip blank, confidence 1.0
for native text) and ``worker/document_processor.py:470-476`` (page text =
blocks joined with ``" "``; document text = ``page_text + "\\n\\n"`` per page,
INCLUDING a trailing separator after the last page — we preserve that quirk
because byte-identity depends on it).

Three engines, same output shape:

  * :func:`_extract_fitz` — real PyMuPDF, used when the ``fitz`` import
    succeeds (not present in this container; gated behind import-try exactly
    like the reference's optional OCR engines, ``advanced_ocr.py:39-52``).
  * :mod:`ocr_model_spark.kernels.pdf_native` — stdlib real-PDF reader
    (object scan, FlateDecode via zlib, ObjStm expansion, page tree,
    Tj/TJ/Td/Tm text operators) used when fitz is absent; fails typed on
    encrypted / exotic-filter files.
  * :func:`_extract_synth` — a deterministic parser for the content-stream
    subset our synthetic corpus generator emits (``BT/Td/Tf/(…) Tj/ET``).
    This keeps the Spark-side plumbing (schema, batching, span arithmetic,
    line/block grouping) real and fully tested without native deps.

All three produce pages of text blocks with bboxes, grouped from individual
spans by y-proximity (lines) and inter-line gaps (blocks) — the same layout
reconstruction the reference performs.
"""

from __future__ import annotations

import re

try:  # pragma: no cover - not installed in the test container
    import fitz  # type: ignore

    _HAS_FITZ = True
except Exception:  # pragma: no cover
    fitz = None
    _HAS_FITZ = False

# content-stream subset grammar emitted by ocr_model_spark.sources.synth
_PAGE_RE = re.compile(rb"%%SYNTHPAGE (\d+) (\d+) (\d+)")  # page_num width height
_SPAN_RE = re.compile(
    rb"BT /F1 (\d+(?:\.\d+)?) Tf (\d+(?:\.\d+)?) (\d+(?:\.\d+)?) Td \((.*?)\) Tj ET",
    re.S,
)

_LINE_Y_TOL = 2.0  # spans within this y-delta are one line
_BLOCK_GAP = 6.0  # new block when inter-line gap exceeds this multiple of size


def _unescape_pdf_string(b: bytes) -> str:
    return (
        b.replace(b"\\(", b"(")
        .replace(b"\\)", b")")
        .replace(b"\\\\", b"\\")
        .decode("utf-8", errors="replace")
    )


def _extract_synth(data: bytes) -> list[dict]:
    """Parse the synthetic PDF subset into pages of blocks (deterministic)."""
    pages = []
    # split on page markers; each chunk holds that page's spans
    markers = list(_PAGE_RE.finditer(data))
    for i, m in enumerate(markers):
        page_num = int(m.group(1))
        width, height = int(m.group(2)), int(m.group(3))
        chunk = data[m.end() : markers[i + 1].start() if i + 1 < len(markers) else len(data)]
        spans = []
        for sm in _SPAN_RE.finditer(chunk):
            size = float(sm.group(1))
            x, y_pdf = float(sm.group(2)), float(sm.group(3))
            text = _unescape_pdf_string(sm.group(4))
            if not text.strip():
                continue  # skip blank spans (pdf_processor.py:62-63)
            y = height - y_pdf  # PDF origin is bottom-left; normalize to top-left
            # width estimate: deterministic 0.5em per char
            w = 0.5 * size * len(text)
            spans.append(
                {"text": text, "x1": x, "y1": y - size, "x2": x + w, "y2": y, "size": size}
            )
        pages.append(
            {
                "page_num": page_num,
                "width": width,
                "height": height,
                "blocks": _group_blocks(spans),
            }
        )
    return pages


def _group_blocks(spans: list[dict]) -> list[dict]:
    """Group spans → lines (y-proximity) → blocks (inter-line gap).

    Mirrors PyMuPDF's dict structure the reference consumes at
    ``pdf_processor.py:49-76``: each block is the space-joined text of its
    lines, each line the space-joined text of its x-sorted spans.
    """
    if not spans:
        return []
    spans = sorted(spans, key=lambda s: (s["y2"], s["x1"]))
    # lines: gaps-and-islands over y
    lines: list[list[dict]] = [[spans[0]]]
    for s in spans[1:]:
        if s["y2"] - lines[-1][-1]["y2"] <= _LINE_Y_TOL:
            lines[-1].append(s)
        else:
            lines.append([s])
    blocks: list[dict] = []
    cur: list[list[dict]] = [lines[0]]
    for prev, ln in zip(lines, lines[1:]):
        gap = min(s["y1"] for s in ln) - max(s["y2"] for s in prev)
        if gap > _BLOCK_GAP:
            blocks.append(_finish_block(cur))
            cur = [ln]
        else:
            cur.append(ln)
    blocks.append(_finish_block(cur))
    return blocks


def _finish_block(line_group: list[list[dict]]) -> dict:
    texts = []
    x1 = y1 = float("inf")
    x2 = y2 = float("-inf")
    for ln in line_group:
        ln_sorted = sorted(ln, key=lambda s: s["x1"])
        texts.append(" ".join(s["text"] for s in ln_sorted))
        for s in ln:
            x1, y1 = min(x1, s["x1"]), min(y1, s["y1"])
            x2, y2 = max(x2, s["x2"]), max(y2, s["y2"])
    return {
        "text": " ".join(texts),
        "x1": round(x1, 2),
        "y1": round(y1, 2),
        "x2": round(x2, 2),
        "y2": round(y2, 2),
        "confidence": 1.0,  # native text spans (pdf_processor.py:75)
    }


def _extract_fitz(data: bytes) -> list[dict]:  # pragma: no cover - optional dep
    pages = []
    with fitz.open(stream=data, filetype="pdf") as doc:
        for pno, page in enumerate(doc, start=1):
            d = page.get_text("dict")
            blocks = []
            for blk in d.get("blocks", []):
                if blk.get("type") != 0:
                    continue
                texts = []
                for line in blk.get("lines", []):
                    t = " ".join(
                        sp.get("text", "") for sp in line.get("spans", []) if sp.get("text", "").strip()
                    )
                    if t:
                        texts.append(t)
                if not texts:
                    continue
                bbox = blk.get("bbox", (0, 0, 0, 0))
                blocks.append(
                    {
                        "text": " ".join(texts),
                        "x1": round(bbox[0], 2),
                        "y1": round(bbox[1], 2),
                        "x2": round(bbox[2], 2),
                        "y2": round(bbox[3], 2),
                        "confidence": 1.0,
                    }
                )
            pages.append(
                {
                    "page_num": pno,
                    "width": int(page.rect.width),
                    "height": int(page.rect.height),
                    "blocks": blocks,
                }
            )
    return pages


def extract_pdf(data: bytes, max_pages: int | None = None) -> dict:
    """Extract text blocks from PDF bytes.

    Returns ``{text, title, encoding, ok, error, regions}`` in the same shape
    as :func:`ocr_model_spark.kernels.html_extract.extract_html`, so one Spark
    schema covers all document types. Document text follows the reference's
    join rule: blocks joined with ``" "`` within a page, each page suffixed
    with ``"\\n\\n"`` (``document_processor.py:470-476``).
    """
    try:
        if data.startswith(b"%%SYNTHPDF") or b"%%SYNTHPAGE" in data[:256]:
            pages = _extract_synth(data)
        elif _HAS_FITZ:
            pages = _extract_fitz(data)
        else:
            from ocr_model_spark.kernels.pdf_native import (
                PdfEncryptedError,
                extract_pages_native,
            )

            try:
                pages = extract_pages_native(data, _group_blocks)
            except PdfEncryptedError:
                # trailer declares /Encrypt: typed failure (a raw substring
                # check would misfire on PDFs merely CONTAINING the bytes)
                return {
                    "text": "",
                    "title": None,
                    "encoding": None,
                    "ok": False,
                    "error": "pdf-encrypted",
                    "metadata": {},
                    "regions": [],
                }
    except Exception as e:
        return {
            "text": "",
            "title": None,
            "encoding": None,
            "ok": False,
            "error": f"pdf-parse-failed: {type(e).__name__}",
            "metadata": {},
            "regions": [],
        }
    doc_info = pages[0].pop("doc_info", {}) if pages else {}
    if max_pages is not None:
        pages = pages[:max_pages]  # BASIC-mode page cap (pdf_processor.py:188-192)

    regions = []
    full = []
    offset = 0
    idx = 0
    for page in pages:
        blocks = page["blocks"]
        for j, blk in enumerate(blocks):
            regions.append(
                {
                    "idx": idx,
                    "type": "paragraph",
                    "text": blk["text"],
                    "span_start": offset,
                    "span_end": offset + len(blk["text"]),
                    "link_density": 0.0,
                    "text_density": float(len(blk["text"])),
                    "confidence": blk["confidence"],
                    "needs_review": blk["confidence"] < 0.7,
                }
            )
            idx += 1
            offset += len(blk["text"]) + (1 if j + 1 < len(blocks) else 2)
        if not blocks:
            offset += 2  # empty page still contributes its "\n\n"
        full.append(" ".join(b["text"] for b in blocks) + "\n\n")
    return {
        "text": "".join(full),
        # S10: /Info title when the document carries one (pdf_processor.py:
        # 238-274); block text never synthesizes a title
        "title": doc_info.get("title"),
        "encoding": None,
        "ok": True,
        "error": None,
        "metadata": {
            "page_count": str(len(pages)),
            "block_count": str(len(regions)),
            **doc_info,
        },
        "regions": regions,
    }


class RasterEngineUnavailable(RuntimeError):
    """No renderer in this build — callers degrade like the reference's
    engine-absent OCR path (``advanced_ocr.py:39-52``)."""


def rasterize_pages(
    data: bytes, dpi: int = 150, max_pages: int | None = None
) -> list[dict]:
    """S5/S6: render PDF pages to PNG images for the scanned-page OCR path
    (reference ``pdf_processor.py:78-117``: ``page.get_pixmap`` at a target
    dpi feeding the OCR models). Requires a renderer (fitz); pure stdlib
    cannot rasterize, so without it this raises
    :class:`RasterEngineUnavailable` and the caller counts an engine
    failure — the images themselves are opaque payloads for the multimodal
    operators (``operators/multimodal.py``).

    Returns ``[{page_num, width, height, dpi, png}]``.
    """
    if not _HAS_FITZ:
        raise RasterEngineUnavailable("pdf-raster-engine-unavailable (no fitz)")
    out: list[dict] = []
    with fitz.open(stream=data, filetype="pdf") as doc:
        for pno, page in enumerate(doc, start=1):
            if max_pages is not None and pno > max_pages:
                break
            pix = page.get_pixmap(dpi=dpi)
            out.append(
                {
                    "page_num": pno,
                    "width": int(pix.width),
                    "height": int(pix.height),
                    "dpi": dpi,
                    "png": pix.tobytes("png"),
                }
            )
    return out


try:  # pragma: no cover - optional dependency (absent in this container)
    import pdfplumber  # type: ignore

    _HAS_PDFPLUMBER = True
except Exception:  # pragma: no cover
    pdfplumber = None
    _HAS_PDFPLUMBER = False


def _pdfplumber_words_to_spans(words: list[dict]) -> list[dict]:
    """pdfplumber ``extract_words()`` dicts → the engine span shape fed to
    :func:`_group_blocks` (reference ``text_native.py:16-40`` consumes the
    same word list). Blank words skipped like the fitz path."""
    spans = []
    for w in words:
        text = (w.get("text") or "").strip()
        if not text:
            continue
        spans.append(
            {
                "text": text,
                "x1": float(w["x0"]),
                "y1": float(w["top"]),
                "x2": float(w["x1"]),
                "y2": float(w["bottom"]),
                "size": float(w["bottom"]) - float(w["top"]),
            }
        )
    return spans


def _extract_pdfplumber(data: bytes) -> list[dict]:
    """S4: alternative native-text engine via pdfplumber — same pages shape
    as the other engines, same block grouping."""
    if not _HAS_PDFPLUMBER:
        raise RuntimeError("pdfplumber not installed")
    import io  # pragma: no cover - engine-present path

    pages = []  # pragma: no cover
    with pdfplumber.open(io.BytesIO(data)) as pdf:  # pragma: no cover
        for pno, page in enumerate(pdf.pages, start=1):
            spans = _pdfplumber_words_to_spans(page.extract_words())
            pages.append(
                {
                    "page_num": pno,
                    "width": int(page.width),
                    "height": int(page.height),
                    "blocks": _group_blocks(spans),
                }
            )
    return pages  # pragma: no cover
