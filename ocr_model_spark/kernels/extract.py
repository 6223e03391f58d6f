"""Unified per-document extraction: sniff type → dispatch to the right kernel.

This is the single pure function the Spark pandas UDF vectorizes
(one call per document, many documents per Arrow batch). Semantics per type:

  * PDF  → :func:`ocr_model_spark.kernels.pdf_extract.extract_pdf`
  * HTML → :func:`ocr_model_spark.kernels.html_extract.extract_html`
  * TEXT → verbatim decoded text, confidence 1.0, one region
           (``worker/document_processor.py:502-549``)
  * DOCX → :func:`ocr_model_spark.kernels.docx_extract.extract_docx`
           (stdlib zipfile+xml; ``worker/document_processor.py:551-604``)
  * IMAGE → extraction failure in this build (OCR engines optional and
    absent; mirrors the reference's graceful engine degradation
    ``advanced_ocr.py:39-52``) — counted by the lineage failure counters.

Deterministic: identical bytes → identical result, always.
"""

from __future__ import annotations

from ocr_model_spark.kernels import sniff
from ocr_model_spark.kernels.ooxml_extract import extract_ooxml
from ocr_model_spark.kernels.encoding import decode_with_fallback
from ocr_model_spark.kernels.html_extract import extract_html
from ocr_model_spark.kernels.pdf_extract import extract_pdf

EMPTY_RESULT = {
    "text": "",
    "title": None,
    "encoding": None,
    "ok": False,
    "error": None,
    "metadata": {},
    "regions": [],
}


def _extract_text_plain(data: bytes) -> dict:
    try:
        text, encoding = decode_with_fallback(data)
    except UnicodeDecodeError:
        return dict(EMPTY_RESULT, error="decode-failed")
    regions = []
    if text:
        regions.append(
            {
                "idx": 0,
                "type": "text",
                "text": text,
                "span_start": 0,
                "span_end": len(text),
                "link_density": 0.0,
                "text_density": float(len(text)),
                "confidence": 1.0,  # "perfect extraction confidence" for text files
                "needs_review": False,
            }
        )
    return {
        "text": text,
        "title": None,
        "encoding": encoding,
        "ok": True,
        "error": None,
        "metadata": {"encoding": encoding},
        "regions": regions,
    }


def extract_document(data: bytes | None, max_pages: int | None = None) -> dict:
    """Sniff + extract one document. Returns the unified result dict plus
    ``doc_type``."""
    if data is None or len(data) == 0:
        return dict(EMPTY_RESULT, doc_type=sniff.UNKNOWN, error="empty-payload")
    doc_type = sniff.sniff_doc_type(data)
    if doc_type == sniff.PDF:
        out = extract_pdf(data, max_pages=max_pages)
    elif doc_type == sniff.HTML:
        out = extract_html(data)
    elif doc_type == sniff.TEXT:
        out = _extract_text_plain(data)
    elif doc_type == sniff.DOCX:
        # sniff sees only the zip magic; the OOXML kernel opens the
        # container and REFINES doc_type to docx/pptx/xlsx (or a typed
        # unknown-container failure) from the member names
        out = extract_ooxml(data)
        doc_type = out.get("doc_type", doc_type)
    else:  # IMAGE / UNKNOWN: engines not present in this build
        out = dict(EMPTY_RESULT, error=f"engine-unavailable:{doc_type}")
    out.setdefault("metadata", {})  # error branches may omit it
    out["doc_type"] = doc_type
    return out
