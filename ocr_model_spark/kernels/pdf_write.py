"""Minimal classic-PDF writer (stdlib): the inverse of pdf_native's reader.

Used by the annotated-PDF sink (K5) — the reference draws token/region
boxes onto the source pages for review (exporter annotated output); here
the annotation is a REAL generated PDF with stroked boxes + labels, which
``pdf_native`` can read back (self-verifying round trip in tests).

Deterministic: fixed object layout, uncompressed content streams, no
timestamps.
"""

from __future__ import annotations


def escape_pdf_string(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def assemble_pdf(
    objects: list[tuple[int, bytes, bytes | None]], trailer_extra: bytes = b""
) -> bytes:
    """objects: (num, dict-bytes, optional stream-bytes) → full PDF file
    with a correct xref table and trailer (object 1 must be the catalog).
    ``trailer_extra`` adds entries to the trailer dict (e.g. ``/Info N 0 R``,
    trailing space included by the caller). The ONE PDF writer in the repo —
    the synth corpus generator and the annotated sink both assemble
    through it, so spec fixes land everywhere at once."""
    nums = sorted(num for num, _d, _s in objects)
    # the xref subsection header claims objects 0..N contiguously — emitting
    # entries for any other numbering would silently map numbers to wrong
    # offsets for strict external readers (raise, not assert: -O must not
    # compile the check away)
    if nums != list(range(1, len(objects) + 1)):
        raise ValueError(f"assemble_pdf requires contiguous object numbers 1..N, got {nums}")
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num, dct, stream in objects:
        offsets[num] = len(out)
        out += b"%d 0 obj\n%s\n" % (num, dct)
        if stream is not None:
            out += b"stream\n" + stream + b"\nendstream\n"
        out += b"endobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objects) + 1)
    for num in sorted(offsets):
        out += b"%010d 00000 n \n" % offsets[num]
    out += b"trailer\n<< /Size %d /Root 1 0 R %s>>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objects) + 1,
        trailer_extra,
        xref_at,
    )
    return bytes(out)


def encrypt_objects_rc4(
    objects: list[tuple[int, bytes, bytes | None]],
    id0: bytes,
    p: int = -44,
    owner_seed: bytes = b"owner",
) -> tuple[list[tuple[int, bytes, bytes | None]], bytes]:
    """RC4-encrypt an object list (standard handler V1/R2, EMPTY user
    password) for the synth corpus's decryptable-secured-PDF slice.

    Returns (objects + the /Encrypt dict appended, trailer additions
    ``/Encrypt N 0 R /ID [...]``). Both STREAM bodies and dict STRINGS
    encrypt (the spec encrypts all strings, and the reader decrypts all
    strings — a plaintext /Title would round-trip as garbage). Reuses the
    reader's primitives — the independent-derivation cross-check lives in
    the test fixtures."""
    import hashlib as _hl
    import re as _re
    import struct as _st

    from ocr_model_spark.kernels.pdf_native import _Lexer, _STD_PAD, _object_key, _rc4

    o_entry = _hl.sha256(owner_seed).digest()  # 32 bytes; owner pw unused
    key = _hl.md5(_STD_PAD + o_entry + _st.pack("<i", p) + id0).digest()[:5]
    u_entry = _rc4(key, _STD_PAD)
    enc_num = max(num for num, _d, _s in objects) + 1

    # literal `( … )` (with escapes, one nesting level) or hex `< … >`
    # strings inside dict bytes — re-emitted as encrypted hex strings
    str_re = _re.compile(
        rb"\((?:\\.|[^\\()])*(?:\((?:\\.|[^\\()])*\)(?:\\.|[^\\()])*)*\)"
        rb"|<[0-9A-Fa-f\s]+>",
        _re.S,
    )

    def enc_dict_strings(dct: bytes, okey: bytes) -> bytes:
        def repl(m: "_re.Match[bytes]") -> bytes:
            tok = m.group(0)
            lex = _Lexer(tok)
            raw = (
                lex._parse_literal_string()
                if tok[:1] == b"("
                else lex._parse_hex_string()
            )
            return b"<%s>" % _rc4(okey, raw).hex().encode()

        return str_re.sub(repl, dct)

    out: list[tuple[int, bytes, bytes | None]] = []
    for num, dct, stream in objects:
        okey = _object_key(key, num)
        out.append(
            (
                num,
                enc_dict_strings(dct, okey),
                _rc4(okey, stream) if stream is not None else None,
            )
        )
    out.append(
        (
            enc_num,
            b"<< /Filter /Standard /V 1 /R 2 /P %d /O <%s> /U <%s> >>"
            % (p, o_entry.hex().encode(), u_entry.hex().encode()),
            None,
        )
    )
    trailer_add = b"/Encrypt %d 0 R /ID [<%s> <%s>] " % (
        enc_num,
        id0.hex().encode(),
        id0.hex().encode(),
    )
    return out, trailer_add


def build_annotated_pdf(
    pages: list[dict],
    page_w: float = 612.0,
    page_h: float = 792.0,
    review_threshold: float = 0.7,
) -> bytes:
    """``pages``: ``[{page_num, tokens: [{x1,y1,x2,y2,text,confidence}]}]``
    (top-left coordinates) → a PDF with one page per entry: each token gets
    a stroked box (red below the review threshold, green otherwise) and its
    text drawn above the box."""
    pages = sorted(pages, key=lambda p: p["page_num"])
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    font_num = 3 + 2 * n_pages
    objects: list[tuple[int, bytes, bytes | None]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (
            2,
            b"<< /Type /Pages /Kids [%s] /Count %d /MediaBox [0 0 %d %d] >>"
            % (kids.encode(), n_pages, int(page_w), int(page_h)),
            None,
        ),
    ]
    for i, page in enumerate(pages):
        ops: list[str] = []
        for t in sorted(page["tokens"], key=lambda t: (t["y1"], t["x1"])):
            x, w = t["x1"], t["x2"] - t["x1"]
            yb = page_h - t["y2"]  # PDF origin is bottom-left
            h = t["y2"] - t["y1"]
            needs_review = t.get("confidence", 1.0) < review_threshold
            color = "1 0 0" if needs_review else "0 0.6 0"
            ops.append(f"q {color} RG 1 w {x:g} {yb:g} {w:g} {h:g} re S Q\n")
            label = escape_pdf_string(str(t.get("text", "")))[:80]
            if label:
                ops.append(
                    f"BT /F1 6 Tf {x:g} {page_h - t['y1'] + 2:g} Td ({label}) Tj ET\n"
                )
        content = "".join(ops).encode("latin-1", "replace")
        pnum, snum = 3 + 2 * i, 4 + 2 * i
        objects.append(
            (
                pnum,
                b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R "
                b"/Resources << /Font << /F1 %d 0 R >> >> >>" % (snum, font_num),
                None,
            )
        )
        objects.append((snum, b"<< /Length %d >>" % len(content), content))
    objects.append(
        (font_num, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", None)
    )
    return assemble_pdf(objects)
