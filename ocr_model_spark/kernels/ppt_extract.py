"""Legacy PowerPoint 97 ``.ppt`` text extraction — pure stdlib.

The ``PowerPoint Document`` stream is a tree of 8-byte-headed records
([MS-PPT] 2.3.1: recVer/recInstance u16, recType u16, recLen u32; a
record is a container iff recVer == 0xF). Presentation text lives in
TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8, the low
bytes of UTF-16 → latin-1) leaves; a depth-first walk in stream order
recovers them in slide order. ``\\r`` separates paragraphs inside an
atom. Reference scope: the reference has no legacy-PPT path at all
(binaries fall to its TEXT fallback, ``worker/document_processor.py:
388-391``); this follows the pdf_native/ole_extract from-scratch
playbook. Structurally unreadable streams fail typed, never garbled.

:func:`build_ppt` is the deterministic writer for synth/test fixtures —
it wraps one Document container around alternating chars/bytes atoms.
"""

from __future__ import annotations

import struct

_TEXT_CHARS = 0x0FA0
_TEXT_BYTES = 0x0FA8
_MAX_DEPTH = 64


def _walk(data: bytes, pos: int, end: int, out: list[str], depth: int) -> None:
    if depth > _MAX_DEPTH:
        return
    while pos + 8 <= end:
        verinst, rtype, rlen = struct.unpack_from("<HHI", data, pos)
        pos += 8
        rlen = min(rlen, end - pos)  # truncated tail tolerated
        if verinst & 0x0F == 0x0F:
            _walk(data, pos, pos + rlen, out, depth + 1)
        elif rtype == _TEXT_CHARS:
            out.append(data[pos : pos + rlen].decode("utf-16-le", "replace"))
        elif rtype == _TEXT_BYTES:
            out.append(data[pos : pos + rlen].decode("latin-1", "replace"))
        pos += rlen


def extract_ppt_stream(doc: bytes) -> dict:
    """PowerPoint Document stream → the engine's shared kernel result."""
    from ocr_model_spark.kernels.ooxml_extract import _assemble, _fail, _norm

    if len(doc) < 8:
        return _fail("ppt-parse-failed", "too-short")
    texts: list[str] = []
    _walk(doc, 0, len(doc), texts, 0)
    raw = [
        {"type": "paragraph", "text": _norm(p)}
        for t in texts
        for p in t.split("\r")
        if _norm(p)
    ]
    if not raw:
        return _fail("ppt-no-text", "no-text-atoms")
    return _assemble(raw, {"n_text_atoms": str(len(texts))}, "ppt")


# ------------------------------------------------------------------ writer


def _atom(rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HHI", 0x0000, rtype, len(payload)) + payload


def build_ppt(texts: list[str]) -> bytes:
    """Deterministic minimal .ppt: one Document container (recType 0x03E8)
    holding a chars or bytes text atom per input string (chars when the
    text needs more than latin-1), wrapped in a CFB file."""
    from ocr_model_spark.kernels.ole_extract import build_cfb

    atoms = bytearray()
    for t in texts:
        try:
            atoms += _atom(_TEXT_BYTES, t.encode("latin-1"))
        except UnicodeEncodeError:
            atoms += _atom(_TEXT_CHARS, t.encode("utf-16-le"))
    doc = struct.pack("<HHI", 0x000F, 0x03E8, len(atoms)) + bytes(atoms)
    return build_cfb([("PowerPoint Document", doc)])
