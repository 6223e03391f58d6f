"""Builds a real, spec-correct classic PDF (FlateDecode streams, xref table,
page tree) for exercising the stdlib native reader — the structure reportlab
and friends emit, hand-assembled so the fixture is deterministic and
dependency-free."""

from __future__ import annotations

import zlib

PAGE1_CONTENT = b"""BT /F1 12 Tf 1 0 0 1 72 720 Tm (Alpha line one.) Tj ET
BT /F1 12 Tf 72 706 Td (Alpha line two.) Tj ET
BT /F1 12 Tf 72 660 Td [(Beta) -300 (kerned) -300 (block.)] TJ ET
BT /F1 12 Tf 72 600 Td (Caf\\351 na\\357ve \\(escaped\\)) Tj ET
"""

PAGE2_CONTENT = b"""BT /F1 10 Tf 14 TL 72 700 Td (Second page first line.) Tj T* (Second page second line.) Tj ET
BT /F1 10 Tf 72 600 Td <4865782074657874> Tj ET
"""


def build_objstm_pdf() -> bytes:
    """PDF-1.5-style file: the catalog, pages root and page dict all live
    inside a compressed /ObjStm object stream (how modern writers emit
    them); only the content stream and the ObjStm container are top-level
    objects."""
    content = zlib.compress(b"BT /F1 12 Tf 72 700 Td (Objstm page text.) Tj ET")
    embedded = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    ]
    body = bytearray()
    header = []
    for num, dct in embedded:
        header.append(b"%d %d" % (num, len(body)))
        body += dct + b"\n"
    head = b" ".join(header) + b"\n"
    stm = zlib.compress(bytes(head + body))
    out = bytearray(b"%PDF-1.5\n")
    out += (
        b"4 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>\n"
        b"stream\n" % (len(embedded), len(head), len(stm))
    ) + stm + b"\nendstream\nendobj\n"
    out += (
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content)
    ) + content + b"\nendstream\nendobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def _png_predict_up(rows: list[bytes]) -> bytes:
    """Encode fixed-width rows with the PNG 'Up' filter (type 2) — the
    predictor real writers use for xref streams (/Predictor 12)."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for row in rows:
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def build_xrefstream_pdf() -> bytes:
    """Modern PDF-1.5 file located ONLY via a cross-reference stream
    (/Type /XRef, W [1 2 1], /Predictor 12) — catalog/pages/page live in
    an ObjStm referenced by type-2 entries; no classic trailer anywhere.
    A reader that ignores startxref still works by scanning; a reader that
    trusts it never touches bytes outside the recorded offsets."""
    content = zlib.compress(b"BT /F1 12 Tf 72 700 Td (Xref stream page text.) Tj ET")
    embedded = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    ]
    body = bytearray()
    header = []
    for num, dct in embedded:
        header.append(b"%d %d" % (num, len(body)))
        body += dct + b"\n"
    head = b" ".join(header) + b"\n"
    stm = zlib.compress(bytes(head + body))
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    offsets[4] = len(out)
    out += (
        b"4 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>\n"
        b"stream\n" % (len(embedded), len(head), len(stm))
    ) + stm + b"\nendstream\nendobj\n"
    offsets[5] = len(out)
    out += (
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content)
    ) + content + b"\nendstream\nendobj\n"
    xref_at = len(out)
    # entries for 0..6: type(1B) field2(2B) field3(1B)
    rows = [
        bytes([0, 0, 0, 255]),  # 0: free
        bytes([2, 0, 4, 0]),  # 1: in ObjStm 4, idx 0
        bytes([2, 0, 4, 1]),
        bytes([2, 0, 4, 2]),
        bytes([1, (offsets[4] >> 8) & 0xFF, offsets[4] & 0xFF, 0]),
        bytes([1, (offsets[5] >> 8) & 0xFF, offsets[5] & 0xFF, 0]),
        bytes([1, (xref_at >> 8) & 0xFF, xref_at & 0xFF, 0]),  # 6: self
    ]
    xstm = zlib.compress(_png_predict_up(rows))
    out += (
        b"6 0 obj\n<< /Type /XRef /Size 7 /W [1 2 1] /Index [0 7] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> "
        b"/Length %d >>\nstream\n" % len(xstm)
    ) + xstm + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def append_incremental_update(
    base: bytes,
    new_objects: list[tuple[int, bytes, bytes | None]],
    free: list[int] = (),
    trailer_extra: bytes = b"",
) -> bytes:
    """Append a spec-correct incremental update: new object bodies, freed
    numbers, a classic xref section with /Prev chaining to the base file's
    section, and a fresh startxref."""
    import re as _re

    prev_xref = int(_re.findall(rb"startxref\s+(\d+)", base)[-1])
    out = bytearray(base)
    offsets: dict[int, int] = {}
    for num, dct, stream in new_objects:
        offsets[num] = len(out)
        out += b"%d 0 obj\n%s\n" % (num, dct)
        if stream is not None:
            out += b"stream\n" + stream + b"\nendstream\n"
        out += b"endobj\n"
    xref_at = len(out)
    out += b"xref\n"
    size = max([num for num, _d, _s in new_objects] + list(free) + [0]) + 1
    for num in sorted(set(offsets) | set(free)):
        out += b"%d 1\n" % num
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Prev %d %s>>\nstartxref\n%d\n%%%%EOF\n"
        % (size, prev_xref, trailer_extra, xref_at)
    )
    return bytes(out)


def build_identity_h_pdf(codes: bytes) -> bytes:
    """One-page PDF whose only font is a Type0 /Identity-H WITHOUT a
    /ToUnicode CMap, showing ``codes`` (2-byte CIDs) via a hex string —
    the shape a generator emits when CIDs are Unicode code points."""
    content = b"BT /F1 12 Tf 72 700 Td <%s> Tj ET" % codes.hex().encode()
    c = zlib.compress(content)
    objects = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (
            2,
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
            None,
        ),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>",
            None,
        ),
        (4, b"<< /Length %d /Filter /FlateDecode >>" % len(c), c),
        (
            5,
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>",
            None,
        ),
        (6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake >>", None),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for num, dct, stream in objects:
        out += b"%d 0 obj\n%s\n" % (num, dct)
        if stream is not None:
            out += b"stream\n" + stream + b"\nendstream\n"
        out += b"endobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def build_real_pdf(extra_trailer: bytes = b"") -> bytes:
    """Two-page classic PDF: compressed streams, inherited MediaBox,
    array-valued /Contents on page 2, correct xref + trailer."""
    c1 = zlib.compress(PAGE1_CONTENT)
    c2 = zlib.compress(PAGE2_CONTENT)
    objects = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (
            2,
            b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 /MediaBox [0 0 612 792] >>",
            None,
        ),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 7 0 R >> >> >>",
            None,
        ),
        (4, b"<< /Length %d /Filter /FlateDecode >>" % len(c1), c1),
        (5, b"<< /Type /Page /Parent 2 0 R /Contents [6 0 R] >>", None),
        (6, b"<< /Length %d /Filter /FlateDecode >>" % len(c2), c2),
        (7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", None),
        (8, b"<< /Title (Fixture Title) /Author (Jane Dev) >>", None),
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num, dct, stream in objects:
        offsets[num] = len(out)
        out += b"%d 0 obj\n%s\n" % (num, dct)
        if stream is not None:
            out += b"stream\n" + stream + b"\nendstream\n"
        out += b"endobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, len(objects) + 1):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Info 8 0 R %s>>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, extra_trailer, xref_at)
    )
    return bytes(out)
