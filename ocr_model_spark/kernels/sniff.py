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
OLE = "ole"  # legacy binary Office (CFB container: .xls/.ppt/.msg/junk)
DOC = "doc"  # CFB container carrying a WordDocument stream (Word 97 .doc)
TEXT = "text"
UNKNOWN = "unknown"

# UTF-16LE "WordDocument" — the [MS-DOC] stream name as it appears in a CFB
# directory entry. A whole-payload substring scan (C-speed) distinguishes an
# extractable .doc from the rest of the legacy-Office family at sniff time,
# so the dispatch gate (and the host-counter failure rule, which must have a
# DuckDB twin) can route it without parsing the container.
WORD_STREAM_MARKER = "WordDocument".encode("utf-16-le")


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
        # mojibake "text" and poison dedup/quality downstream. A Word
        # directory entry anywhere in the payload refines to 'doc' (the
        # piece-table kernel extracts it); the rest stay typed failures.
        return DOC if WORD_STREAM_MARKER in data else OLE
    low = head.lstrip()[:256].lower()
    if low.startswith(b"<!doctype html") or low.startswith(b"<html") or b"<html" in low:
        return HTML
    # fall back on a cheap tag scan: looks-like-markup heuristic
    if low.startswith(b"<") and b">" in low:
        return HTML
    return TEXT
