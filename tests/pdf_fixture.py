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


def assemble_with_xref(
    objects: list,
    trailer_entries: bytes,
    header: bytes = b"%PDF-1.4\n",
    gens: dict[int, int] | None = None,
) -> bytes:
    """Shared body/xref/trailer emitter for the fixture builders (the
    independent-derivation rationale covers the CRYPTO, not the file
    assembly). ``trailer_entries`` goes verbatim inside the trailer dict
    after /Size; ``gens`` overrides the generation (default 0) per object —
    header AND xref row stay consistent."""
    g = gens or {}
    out = bytearray(header)
    offsets: dict[int, int] = {}
    for num, dct, stream in objects:
        offsets[num] = len(out)
        out += b"%d %d obj\n%s\n" % (num, g.get(num, 0), dct)
        if stream is not None:
            out += b"stream\n" + stream + b"\nendstream\n"
        out += b"endobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objects) + 1)
    for num in range(1, len(objects) + 1):
        out += b"%010d %05d n \n" % (offsets[num], g.get(num, 0))
    out += b"trailer\n<< /Size %d %s>>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objects) + 1,
        trailer_entries,
        xref_at,
    )
    return bytes(out)


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
    return assemble_with_xref(
        objects,
        b"/Root 1 0 R /Info 8 0 R %s" % extra_trailer,
        header=b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n",
    )


def build_rc4_encrypted_pdf(rev: int = 2, content_gen: int = 0) -> bytes:
    """A REALLY RC4-encrypted one-page PDF (standard handler, empty user
    password, R2 or R3). The key schedule here is written independently of
    ocr_model_spark.kernels.pdf_native — both sides implement the spec, so
    a derivation bug in either cannot self-cancel. ``content_gen`` gives
    the content-stream object a non-zero generation (its per-object key
    then includes the 2 generation bytes, per Algorithm 1)."""
    import hashlib
    import struct

    pad = bytes(
        [
            0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
            0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
            0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
            0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
        ]
    )

    def rc4(key: bytes, data: bytes) -> bytes:
        s = list(range(256))
        j = 0
        for i in range(256):
            j = (j + s[i] + key[i % len(key)]) & 0xFF
            s[i], s[j] = s[j], s[i]
        out = bytearray()
        i = j = 0
        for b in data:
            i = (i + 1) & 0xFF
            j = (j + s[i]) & 0xFF
            s[i], s[j] = s[j], s[i]
            out.append(b ^ s[(s[i] + s[j]) & 0xFF])
        return bytes(out)

    o_entry = bytes(range(32))  # owner hash: arbitrary (owner pw unused)
    p = -44
    id0 = bytes.fromhex("00112233445566778899aabbccddeeff")
    n = 5 if rev == 2 else 16
    h = hashlib.md5(pad + o_entry + struct.pack("<i", p) + id0).digest()
    if rev == 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    if rev == 2:
        u_entry = rc4(key, pad)
    else:
        t = rc4(key, hashlib.md5(pad + id0).digest())
        for i in range(1, 20):
            t = rc4(bytes(b ^ i for b in key), t)
        u_entry = t + bytes(16)

    def okey(num: int, gen: int = 0) -> bytes:
        d = hashlib.md5(
            key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        ).digest()
        return d[: min(n + 5, 16)]

    content = b"BT /F1 12 Tf 72 700 Td (Secret but readable.) Tj ET"
    enc_content = rc4(okey(4, content_gen), content)
    title = rc4(okey(6), b"Secret Title")
    length_entry = b"/Length 128 " if rev == 3 else b""
    objects = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>", None),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
        (4, b"<< /Length %d >>" % len(enc_content), enc_content),
        (
            5,
            b"<< /Filter /Standard /V %d /R %d %s/P %d /O <%s> /U <%s> >>"
            % (
                1 if rev == 2 else 2,
                rev,
                length_entry,
                p,
                o_entry.hex().encode(),
                u_entry.hex().encode(),
            ),
            None,
        ),
        (6, b"<< /Title <%s> >>" % title.hex().encode(), None),
    ]
    return assemble_with_xref(
        objects,
        b"/Root 1 0 R /Info 6 0 R /Encrypt 5 0 R /ID [<%s> <%s>] "
        % (id0.hex().encode(), id0.hex().encode()),
        gens={4: content_gen} if content_gen else None,
    )


def build_aes_encrypted_pdf(rev: int = 4) -> bytes:
    """AES-encrypted one-page PDF, empty user password: rev 4 = /AESV2
    (AES-128, MD5-era key), rev 6 = /AESV3 (AES-256, Algorithm 2.B). The
    key DERIVATION here follows the spec independently of pdf_native;
    the AES block cipher itself is shared but pinned by FIPS vectors."""
    import hashlib
    import struct

    from ocr_model_spark.kernels.aes import cbc_encrypt

    pad32 = bytes(
        [
            0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
            0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
            0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
            0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
        ]
    )

    def rc4(key: bytes, data: bytes) -> bytes:
        s = list(range(256))
        j = 0
        for i in range(256):
            j = (j + s[i] + key[i % len(key)]) & 0xFF
            s[i], s[j] = s[j], s[i]
        out = bytearray()
        i = j = 0
        for b in data:
            i = (i + 1) & 0xFF
            j = (j + s[i]) & 0xFF
            s[i], s[j] = s[j], s[i]
            out.append(b ^ s[(s[i] + s[j]) & 0xFF])
        return bytes(out)

    id0 = bytes.fromhex("ffeeddccbbaa99887766554433221100")
    p = -3904
    content = b"BT /F1 12 Tf 72 700 Td (AES secret text.) Tj ET"
    title = b"AES Title"

    if rev == 4:
        o_entry = bytes(range(200, 232))
        h = hashlib.md5(pad32 + o_entry + struct.pack("<i", p) + id0).digest()
        for _ in range(50):
            h = hashlib.md5(h[:16]).digest()
        key = h[:16]
        t = rc4(key, hashlib.md5(pad32 + id0).digest())
        for i in range(1, 20):
            t = rc4(bytes(b ^ i for b in key), t)
        u_entry = t + bytes(16)

        def enc_obj(num: int, data: bytes) -> bytes:
            okey = hashlib.md5(
                key + num.to_bytes(3, "little") + b"\x00\x00" + b"sAlT"
            ).digest()[:16]
            iv = hashlib.sha256(b"iv:%d" % num).digest()[:16]  # deterministic
            padn = 16 - len(data) % 16
            return iv + cbc_encrypt(okey, iv, data + bytes([padn]) * padn)

        enc_dict = (
            b"<< /Filter /Standard /V 4 /R 4 /P %d /O <%s> /U <%s> /Length 128 "
            b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF >>"
            % (p, o_entry.hex().encode(), u_entry.hex().encode())
        )
    else:  # rev 6 — AESV3
        def hash2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
            k = hashlib.sha256(pw + salt + udata).digest()
            count = 0
            while True:
                k1 = (pw + k + udata) * 64
                e = cbc_encrypt(k[:16], k[16:32], k1)
                k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
                    sum(e[:16]) % 3
                ](e).digest()
                count += 1
                if count >= 64 and e[-1] <= count - 32:
                    return k[:32]

        key = hashlib.sha256(b"file key for the aesv3 fixture!!").digest()
        vsalt = bytes.fromhex("0102030405060708")
        ksalt = bytes.fromhex("1112131415161718")
        u_entry = hash2b(b"", vsalt, b"") + vsalt + ksalt
        ik = hash2b(b"", ksalt, b"")
        ue_entry = cbc_encrypt(ik, bytes(16), key)
        o_entry = bytes(range(100, 148))  # unused by the empty-user path

        def enc_obj(num: int, data: bytes) -> bytes:
            iv = hashlib.sha256(b"iv:%d" % num).digest()[:16]
            padn = 16 - len(data) % 16
            return iv + cbc_encrypt(key, iv, data + bytes([padn]) * padn)

        enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /P %d /O <%s> /U <%s> /UE <%s> "
            b"/OE <%s> /Length 256 /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF >>"
            % (
                p,
                o_entry.hex().encode(),
                u_entry.hex().encode(),
                ue_entry.hex().encode(),
                bytes(32).hex().encode(),
            )
        )

    enc_content = enc_obj(4, content)
    enc_title = enc_obj(6, title)
    objects = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>", None),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
        (4, b"<< /Length %d >>" % len(enc_content), enc_content),
        (5, enc_dict, None),
        (6, b"<< /Title <%s> >>" % enc_title.hex().encode(), None),
    ]
    return assemble_with_xref(
        objects,
        b"/Root 1 0 R /Info 6 0 R /Encrypt 5 0 R /ID [<%s> <%s>] "
        % (id0.hex().encode(), id0.hex().encode()),
        header=b"%PDF-1.6\n",
    )


def build_unicode_cmap_pdf(text: str) -> bytes:
    """One-page PDF whose Type0 font uses a PREDEFINED Unicode CMap
    (/Encoding /UniGB-UCS2-H) and carries NO /ToUnicode: the 2-byte codes
    in the hex string are UTF-16BE by definition of the encoding."""
    codes = text.encode("utf-16-be")
    content = b"BT /F1 12 Tf 72 700 Td <%s> Tj ET" % codes.hex().encode()
    c = zlib.compress(content)
    objects = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>", None),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>",
            None,
        ),
        (4, b"<< /Length %d /Filter /FlateDecode >>" % len(c), c),
        (
            5,
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-GB "
            b"/Encoding /UniGB-UCS2-H /DescendantFonts [6 0 R] >>",
            None,
        ),
        (6, b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Fake >>", None),
    ]
    return assemble_with_xref(objects, b"/Root 1 0 R ")


def build_legacy_cmap_pdf(text: str, cmap_name: str, codec: str) -> bytes:
    """One-page PDF whose Type0 font uses a PREDEFINED legacy-charset CMap
    (GB-EUC-H / ETen-B5-H / 90ms-RKSJ-H / …) and carries NO /ToUnicode:
    the show-string bytes are national-charset text in ``codec``."""
    codes = text.encode(codec)
    content = b"BT /F1 12 Tf 72 700 Td <%s> Tj ET" % codes.hex().encode()
    c = zlib.compress(content)
    objects = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>", None),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>",
            None,
        ),
        (4, b"<< /Length %d /Filter /FlateDecode >>" % len(c), c),
        (
            5,
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-CJK "
            b"/Encoding /%s /DescendantFonts [6 0 R] >>" % cmap_name.encode(),
            None,
        ),
        (6, b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Fake >>", None),
    ]
    return assemble_with_xref(objects, b"/Root 1 0 R ")


def _objstm_obj(embedded: list[tuple[int, bytes]]) -> tuple[bytes, bytes]:
    """(dict bytes sans num, compressed stream) for an ObjStm holding
    ``embedded`` [(objnum, dict-bytes)]."""
    body = bytearray()
    header = []
    for num, dct in embedded:
        header.append(b"%d %d" % (num, len(body)))
        body += dct + b"\n"
    head = b" ".join(header) + b"\n"
    stm = zlib.compress(bytes(head + body))
    return (
        b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
        % (len(embedded), len(head), len(stm)),
        stm,
    )


def build_shadowed_objstm_pdf() -> bytes:
    """Incremental-update shape where object 3 (the page) exists in TWO
    live ObjStms: a STALE copy in container 4 (pointing at old content 5)
    and the current copy in container 7 (pointing at content 8). The xref
    stream's type-2 entry designates container 7 for object 3 — a reader
    that expands whichever ObjStm iterates first resurrects the stale
    page."""
    old_content = zlib.compress(b"BT /F1 12 Tf 72 700 Td (Stale shadowed text.) Tj ET")
    new_content = zlib.compress(b"BT /F1 12 Tf 72 700 Td (Current page text.) Tj ET")
    objstm_old_dct, objstm_old = _objstm_obj(
        [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),  # STALE
        ]
    )
    objstm_new_dct, objstm_new = _objstm_obj(
        [(3, b"<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>")]
    )
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def emit(num: int, dct: bytes, stream: bytes | None) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n%s\n" % (num, dct))
        if stream is not None:
            out.extend(b"stream\n" + stream + b"\nendstream\n")
        out.extend(b"endobj\n")

    emit(4, objstm_old_dct, objstm_old)
    emit(
        5,
        b"<< /Length %d /Filter /FlateDecode >>" % len(old_content),
        old_content,
    )
    emit(7, objstm_new_dct, objstm_new)
    emit(
        8,
        b"<< /Length %d /Filter /FlateDecode >>" % len(new_content),
        new_content,
    )
    xref_at = len(out)
    rows = [
        bytes([0, 0, 0, 255]),  # 0 free
        bytes([2, 0, 4, 0]),  # 1: in old container (still current)
        bytes([2, 0, 4, 1]),  # 2: in old container (still current)
        bytes([2, 0, 7, 0]),  # 3: DESIGNATED to the NEW container
        bytes([1, (offsets[4] >> 8) & 0xFF, offsets[4] & 0xFF, 0]),
        bytes([1, (offsets[5] >> 8) & 0xFF, offsets[5] & 0xFF, 0]),
        bytes([1, (xref_at >> 8) & 0xFF, xref_at & 0xFF, 0]),  # 6: xref self
        bytes([1, (offsets[7] >> 8) & 0xFF, offsets[7] & 0xFF, 0]),
        bytes([1, (offsets[8] >> 8) & 0xFF, offsets[8] & 0xFF, 0]),
    ]
    xstm = zlib.compress(_png_predict_up(rows))
    out += (
        b"6 0 obj\n<< /Type /XRef /Size 9 /W [1 2 1] /Index [0 9] /Root 1 0 R "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> "
        b"/Length %d >>\nstream\n" % len(xstm)
    ) + xstm + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Independent PDF/TIFF LZW encoder (9→12-bit variable codes, clear=256,
    EOD=257, /EarlyChange semantics) for filter fixtures — written from the
    spec, not from the reader's decoder, so a width-accounting bug in either
    side cannot self-cancel."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    out = bytearray()
    buf = nbits = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
            buf &= (1 << nbits) - 1

    emit(256)  # spec: streams begin with a clear code
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # the decoder reconstructs each table entry one code LATER than the
        # encoder assigns it (it needs the next code's first byte), so the
        # encoder's width switch lags the decoder's threshold by one entry:
        # decoder bumps at next_code >= 2^w - early, encoder at 2^w+1-early
        if next_code >= (1 << width) + 1 - early and width < 12:
            width += 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(257)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def runlength_encode(data: bytes) -> bytes:
    """Simple spec-correct RunLengthDecode inverse: literal runs only,
    plus repeat runs for ≥3 identical bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j - i >= 2:  # repeat run of length j-i+1 (3..128)
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
            continue
        j = i
        while (
            j < n
            and j - i < 128
            and not (j < n - 2 and data[j] == data[j + 1] == data[j + 2])
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    out.append(128)  # EOD
    return bytes(out)


def build_filtered_pdf(filters: bytes, stream: bytes, parms: bytes = b"") -> bytes:
    """One-page PDF whose content stream uses ``filters`` (raw /Filter
    value, e.g. b"/LZWDecode" or b"[/ASCII85Decode /FlateDecode]") with
    pre-encoded ``stream`` bytes."""
    objects = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>", None),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
        (
            4,
            b"<< /Length %d /Filter %s %s>>" % (len(stream), filters, parms),
            stream,
        ),
    ]
    return assemble_with_xref(objects, b"/Root 1 0 R ")
