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
from ocr_model_spark.kernels.ole_extract import extract_ole
from ocr_model_spark.kernels.pdf_extract import extract_pdf

# Import the legacy-Office child kernels at module load, NOT lazily inside
# the per-doc call: the in-UDF timer (cost_by_doc_type) would otherwise
# charge each worker's FIRST doc/xls/ppt document with the module import
# (~ms), and with only ~100 such docs across 32 workers that first-call
# cost dominated the reported per-type mean. Worker boot (the untimed
# warm pass) absorbs it instead.
from ocr_model_spark.kernels import ppt_extract as _ppt_extract  # noqa: F401
from ocr_model_spark.kernels import xls_extract as _xls_extract  # noqa: F401

EMPTY_RESULT = {
    "text": "",
    "title": None,
    "encoding": None,
    "ok": False,
    "error": None,
    "metadata": {},
    "regions": [],
}


def _rtf_to_text(text: str) -> str:
    """De-markup an RTF body (reference behavior: .rtf reads through the
    plain-TEXT branch, document_processor.py:379-391 — but raw control
    words are noise, not text). Minimal spec-following pass: drop
    ``{\\*…}`` ignorable destinations and header-only groups (fonttbl /
    colortbl / stylesheet / info / pict), map ``\\par``/``\\line`` to
    newlines and ``\\tab`` to spaces, decode ``\\'hh`` hex escapes
    (cp1252) and ``\\uN`` unicode escapes, strip remaining control words,
    unescape ``\\{ \\} \\\\``. Deterministic, tolerant: never raises."""
    import re as _re

    # remove ignorable/header destination groups (balanced-brace scan)
    out: list[str] = []
    i, n = 0, len(text)
    drop_res = _re.compile(
        r"\{\\\*|\{\\(?:fonttbl|colortbl|stylesheet|info|pict)\b"
    )
    while i < n:
        m = drop_res.search(text, i)
        if not m:
            out.append(text[i:])
            break
        out.append(text[i : m.start()])
        depth = 0
        j = m.start()
        while j < n:
            c = text[j]
            if c == "\\":
                j += 2
                continue
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        i = j + 1
    s = "".join(out)
    s = _re.sub(r"\\par\b|\\line\b", "\n", s)
    s = _re.sub(r"\\tab\b", " ", s)
    # control SYMBOLS (single non-letter after backslash): \~ nbsp,
    # \- optional hyphen (drop), \_ non-breaking hyphen
    s = s.replace("\\~", " ").replace("\\-", "").replace("\\_", "-")

    # decoded characters must survive the later brace-strip / control-word
    # passes even when they ARE braces or backslashes — emit placeholders.
    # Sentinels are PRIVATE-USE-AREA codepoints, not C0 controls: literal
    # \x00-\x02 bytes (or \'00-\'02 escapes) in real documents would have
    # collided and transmuted into {, }, \. Any pre-existing sentinel chars
    # in the input (only producible via \uN aimed at E000-E002) are dropped
    # below in protect(), so they can't be transmuted either.
    _SENT = {"{": "\ue000", "}": "\ue001", "\\": "\ue002"}
    s = s.replace("\ue000", "").replace("\ue001", "").replace("\ue002", "")

    def protect(ch: str) -> str:
        if ch in ("\ue000", "\ue001", "\ue002"):
            return ""  # a \uN escape aimed at our sentinels: drop, never alias
        return _SENT.get(ch, ch)

    # \uN (signed 16-bit code point) BEFORE \'hh: its optional fallback is
    # consumed only when it is the conventional '?' or a raw \'hh escape —
    # never an arbitrary character (a \uc0 writer emits no fallback at all)
    s = _re.sub(
        r"\\u(-?\d+) ?(\\'[0-9a-fA-F]{2}|\?)?",
        lambda m: protect(chr(int(m.group(1)) & 0xFFFF)),
        s,
    )
    s = _re.sub(
        r"\\'([0-9a-fA-F]{2})",
        lambda m: protect(bytes([int(m.group(1), 16)]).decode("cp1252", "replace")),
        s,
    )
    s = _re.sub(r"\\[a-zA-Z]+-?\d* ?", "", s)  # remaining control words
    # escaped literals survive GROUP-brace removal via placeholders
    s = s.replace("\\{", "\ue000").replace("\\}", "\ue001").replace("\\\\", "\ue002")
    s = s.replace("{", "").replace("}", "")
    s = s.replace("\ue000", "{").replace("\ue001", "}").replace("\ue002", "\\")
    return "\n".join(" ".join(ln.split()) for ln in s.split("\n")).strip()


_CTRL = set(range(0x00, 0x20)) - {0x09, 0x0A, 0x0D}
_CTRL |= set(range(0x7F, 0xA0))  # DEL + C1 (latin-1 decodes these verbatim)
# str.translate deletion table: counting via len-difference runs at C
# speed — a per-char Python loop on the ~80%-of-mix text path measured
# as an avoidable per-doc cost (review finding)
_CTRL_DELETE = dict.fromkeys(_CTRL)


def _looks_binary(text: str) -> bool:
    """True when the decoded 'text' is really a binary payload: the latin-1
    fallback NEVER fails, so unrecognized binary formats (old .doc already
    caught by the OLE sniff, but also gzip, mp3, font files, …) would
    otherwise become mojibake document text and poison dedup / quality
    scoring corpus-wide. Rule: >10% control characters (C0 minus
    tab/newline/CR, DEL, C1) in the first 4096 chars of a ≥64-char doc."""
    if len(text) < 64:
        return False
    window = text[:4096]
    n_ctrl = len(window) - len(window.translate(_CTRL_DELETE))
    return n_ctrl * 10 > len(window)


def _extract_text_plain(data: bytes) -> dict:
    try:
        text, encoding = decode_with_fallback(data)
    except UnicodeDecodeError:
        return dict(EMPTY_RESULT, error="decode-failed")
    if _looks_binary(text):
        return dict(EMPTY_RESULT, error="binary-payload")
    if text.startswith("{\\rtf"):
        # .rtf sniffs as TEXT (reference reads it on the text path too);
        # emitting control words as document text would poison dedup and
        # quality scoring downstream
        text = _rtf_to_text(text)
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
    elif doc_type in (sniff.DOC, sniff.XLS, sniff.PPT, sniff.OLE):
        # CFB container: Word .doc extracts through the piece table, Excel
        # .xls through the BIFF8 record chain, PowerPoint .ppt through the
        # text-atom walk (kernels/{ole,xls,ppt}_extract.py, round 6);
        # other children (.msg/unknown) stay typed failures. The kernel
        # re-derives doc_type from the actual directory entries (sniff's
        # marker scan is a heuristic)
        out = extract_ole(data)
        doc_type = out.get("doc_type", doc_type)
    else:  # IMAGE / UNKNOWN: engines not present in this build
        out = dict(EMPTY_RESULT, error=f"engine-unavailable:{doc_type}")
    out.setdefault("metadata", {})  # error branches may omit it
    out["doc_type"] = doc_type
    return out
