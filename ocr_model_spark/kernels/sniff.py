"""Document-type sniffing from magic bytes.

Reference semantics: ``worker/pipeline/io_conversion.py:14-26`` (magic bytes)
and ``worker/document_processor.py:379-391`` (extension map). In the Spark
engine this also exists as a pure column expression
(:func:`ocr_model_spark.operators.dispatch.doc_type_col`) so the dispatch is
JVM-side; this Python twin is used inside kernels and for byte-identity tests.
"""

from __future__ import annotations

PDF = "pdf"
HTML = "html"
IMAGE = "image"
DOCX = "docx"
OLE = "ole"  # legacy binary Office (CFB container: .msg/unknown/junk)
DOC = "doc"  # CFB container carrying a WordDocument stream (Word 97 .doc)
XLS = "xls"  # CFB container carrying a Workbook/Book stream (Excel 97)
PPT = "ppt"  # CFB container carrying a PowerPoint Document stream
TEXT = "text"
UNKNOWN = "unknown"

# UTF-16LE stream names as they appear in CFB directory entries. A
# whole-payload substring scan (C-speed) distinguishes the extractable
# legacy-Office children (.doc/.xls/.ppt) from the rest of the CFB family
# at sniff time, so the dispatch gate (and the host-counter failure rule,
# which must have a DuckDB twin) can route without parsing the container.
# Priority order matters and must match extract_ole's stream probing:
# WordDocument, then Workbook/Book, then PowerPoint Document.
WORD_STREAM_MARKER = "WordDocument".encode("utf-16-le")
XLS_STREAM_MARKERS = (
    "Workbook".encode("utf-16-le"),  # BIFF8; lowercase 'b' ≠ the Book marker
    "Book".encode("utf-16-le"),  # BIFF5/7 stream name
)
PPT_STREAM_MARKER = "PowerPoint Document".encode("utf-16-le")


def sniff_doc_type(data: bytes) -> str:
    """Classify raw document bytes. Deterministic, pure."""
    if not data:
        return UNKNOWN
    head = data[:512]
    if head.startswith(b"%PDF"):
        return PDF
    if head.startswith(b"\x89PNG\r\n\x1a\n") or head.startswith(b"\xff\xd8\xff"):
        return IMAGE
    if head.startswith(b"GIF87a") or head.startswith(b"GIF89a"):
        return IMAGE
    if head.startswith(b"PK\x03\x04"):
        # zip container: DOCX in the reference's world (io_conversion.py:23)
        return DOCX
    if head.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        # OLE/CFB compound file (pre-2007 .doc/.xls/.ppt): without this
        # branch the latin-1 fallback would read the binary container as
        # mojibake "text" and poison dedup/quality downstream. A known
        # directory-entry marker anywhere in the payload refines to the
        # extractable child type (doc/xls/ppt kernels); the rest of the
        # family (.msg/unknown) stays a typed failure.
        if WORD_STREAM_MARKER in data:
            return DOC
        if any(m in data for m in XLS_STREAM_MARKERS):
            return XLS
        if PPT_STREAM_MARKER in data:
            return PPT
        return OLE
    low = head.lstrip()[:256].lower()
    if low.startswith(b"<!doctype html") or low.startswith(b"<html") or b"<html" in low:
        return HTML
    # fall back on a cheap tag scan: looks-like-markup heuristic
    if low.startswith(b"<") and b">" in low:
        return HTML
    return TEXT
