"""Real-PDF text-layer reader — stdlib only (no fitz/pdfplumber).

Covers the classic-PDF subset a text-layer extractor needs, matching the
semantics of the reference's PyMuPDF path (``worker/pipeline/processors/
pdf_processor.py:49-76``: blocks→lines→spans of native text, blanks skipped,
confidence 1.0):

  * xref-first object location: the ``startxref`` chain (classic tables,
    xref streams with PNG predictors, hybrid ``/XRefStm``) is parsed and
    objects are read at their recorded offsets — newest section wins, freed
    objects stay dead, and parse cost is O(live objects) not O(file); a
    full tolerant scan (``N G obj … endobj``, last definition wins, stream
    bodies skipped) remains the fallback for damaged or xref-less files;
  * stream filters: FlateDecode (``zlib``), LZWDecode (TIFF-style
    variable-width codes, /EarlyChange), ASCII85Decode, ASCIIHexDecode,
    RunLengthDecode — chains and abbreviated names included; anything
    else (JBIG2/CCITT image codecs) fails typed, caught by the caller;
  * page tree walk (``/Catalog → /Pages → /Kids``) with attribute
    inheritance for ``/MediaBox``;
  * content-stream text operators: BT/ET, Tf, Td/TD/Tm/T*, TL, Tj, TJ
    (kerning arrays), ``'`` and ``"``; literal strings with octal/char
    escapes, hex strings, UTF-16BE detection.

Output: the same ``pages`` structure the synthetic and fitz engines emit
(``{page_num, width, height, blocks}``), so ``extract_pdf`` treats all three
engines identically (span grouping, join rule, span offsets are shared).

Also covered: compressed object streams (/Type /ObjStm, PDF 1.5+) — page
dicts living inside a FlateDecoded stream of serialized objects are
expanded into the object table, so modern xref-stream PDFs read fine (the
xref stream itself is never needed; the scan finds the ObjStm containers).

Also covered: CID/Type0 composite fonts WITH a /ToUnicode CMap (bfchar +
both bfrange forms) — i.e. how modern writers embed extractable text;
Type0 text without a ToUnicode map yields empty spans (no mojibake).

Also covered: standard-security-handler decryption for documents whose
USER password is empty — the dominant secured-PDF case on the web
(owner-password-only restriction flags): RC4 (V 1/2, R 2/3; Algorithm 2
key + /U verification), /AESV2 crypt filters (V4/R4, AES-128-CBC with the
sAlT object-key extension) and /AESV3 (V5, R5/R6 — AES-256 with the
Algorithm-2.B hardened hash), via the stdlib AES in ``kernels/aes.py``.
A real user password or an unknown /V still fails typed, and at the
corpus layer lands in the lineage failure counters exactly like the
reference's engine-degradation path.
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfParseError(Exception):
    pass


class PdfEncryptedError(PdfParseError):
    """The document declares /Encrypt — the reader cannot decrypt."""


# ------------------------------------------------------------ object model


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


class _Lexer:
    """Minimal tokenizer for PDF object syntax (dicts, arrays, names,
    numbers, strings, refs)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos : self.pos + 1]
            if c in (b"%",):  # comment to EOL
                eol = d.find(b"\n", self.pos)
                self.pos = n if eol < 0 else eol + 1
            elif c in _WS:
                self.pos += 1
            else:
                return

    def parse_value(self):
        self._skip_ws()
        d = self.data
        p = self.pos
        if p >= len(d):
            raise PdfParseError("eof")
        c = d[p : p + 1]
        if c == b"<":
            if d[p : p + 2] == b"<<":
                return self._parse_dict()
            return self._parse_hex_string()
        if c == b"(":
            return self._parse_literal_string()
        if c == b"[":
            return self._parse_array()
        if c == b"/":
            return self._parse_name()
        if c in b"+-.0123456789":
            return self._parse_number_or_ref()
        m = re.match(rb"(true|false|null)", d[p:])
        if m:
            self.pos = p + len(m.group(1))
            return {b"true": True, b"false": False, b"null": None}[m.group(1)]
        raise PdfParseError(f"unexpected byte {c!r}")

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self._parse_name()
            out[key] = self.parse_value()

    def _parse_array(self) -> list:
        self.pos += 1
        out: list = []
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 1] == b"]":
                self.pos += 1
                return out
            out.append(self.parse_value())

    def _parse_name(self) -> str:
        if self.data[self.pos : self.pos + 1] != b"/":
            raise PdfParseError("expected name")
        self.pos += 1
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos : self.pos + 1] not in _WS + _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        # #xx hex escapes in names
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
        return raw.decode("latin-1")

    def _parse_number_or_ref(self):
        d = self.data
        m = re.match(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", d[self.pos :])
        if not m:
            raise PdfParseError("bad number")
        tok = m.group(0)
        end = self.pos + len(tok)
        # lookahead for "G R" → indirect reference
        m2 = re.match(rb"\s+(\d+)\s+R\b", d[end:])
        if m2 and b"." not in tok:
            self.pos = end + m2.end()
            return Ref(int(tok))
        self.pos = end
        return float(tok) if b"." in tok else int(tok)

    def _parse_hex_string(self) -> bytes:
        end = self.data.find(b">", self.pos + 1)
        if end < 0:
            raise PdfParseError("unterminated hex string")
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos + 1 : end])
        if len(hx) % 2:
            hx += b"0"
        self.pos = end + 1
        return bytes.fromhex(hx.decode("ascii"))

    def _parse_literal_string(self) -> bytes:
        d = self.data
        p = self.pos + 1
        depth = 1
        out = bytearray()
        n = len(d)
        while p < n:
            c = d[p]
            if c == 0x5C:  # backslash
                p += 1
                if p >= n:
                    break
                e = d[p]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    p += 1
                elif e in b"()\\":
                    out.append(e)
                    p += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = bytearray([e])
                    p += 1
                    while p < n and len(oct_digits) < 3 and 0x30 <= d[p] <= 0x37:
                        oct_digits.append(d[p])
                        p += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    p += 1
                    if e == 0x0D and p < n and d[p] == 0x0A:
                        p += 1
                else:
                    out.append(e)
                    p += 1
            elif c == 0x28:  # (
                depth += 1
                out.append(c)
                p += 1
            elif c == 0x29:  # )
                depth -= 1
                if depth == 0:
                    self.pos = p + 1
                    return bytes(out)
                out.append(c)
                p += 1
            else:
                out.append(c)
                p += 1
        raise PdfParseError("unterminated string")


# ------------------------------------------------------------- file parsing

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _read_stream_body(
    data: bytes, value, lex_pos: int
) -> tuple[bytes | None, tuple[int, int] | None]:
    """If a ``stream`` keyword follows the object value at ``lex_pos``,
    return (body bytes, skip-span). /Length is trusted only when
    ``endstream`` actually follows it; the skip span is capped at the first
    ``endstream`` token so a bogus /Length pointing past the real trailer
    to a planted endstream cannot swallow it (a scan over the stream tail
    is the lesser risk)."""
    rest = data[lex_pos : lex_pos + 20]
    if not rest.lstrip(b"\r\n \t").startswith(b"stream"):
        return None, None
    s = data.find(b"stream", lex_pos)
    body_start = s + len(b"stream")
    if data[body_start : body_start + 2] == b"\r\n":
        body_start += 2
    elif data[body_start : body_start + 1] == b"\n":
        body_start += 1
    stream: bytes | None = None
    length = value.get("Length") if isinstance(value, dict) else None
    if isinstance(length, int):
        body_end = body_start + length
        if data[body_end : body_end + 20].lstrip(b"\r\n \t").startswith(b"endstream"):
            stream = data[body_start:body_end]
    if stream is None:
        e = data.find(b"endstream", body_start)
        if e < 0:
            return None, None
        stream = data[body_start:e].rstrip(b"\r\n")
    first_end = data.find(b"endstream", body_start)
    span_end = body_start + len(stream)
    if 0 <= first_end < span_end:
        span_end = first_end
    return stream, (body_start, span_end)


def _scan_objects(
    data: bytes,
) -> tuple[
    dict[int, tuple[dict | object, bytes | None]],
    list[tuple[int, int]],
    dict[int, int],
    dict[int, int],
]:
    """num → (parsed value, raw stream bytes or None), the byte spans of
    every stream body (so trailer scanning can skip content that merely
    CONTAINS PDF-syntax-looking text), num → byte offset of the winning
    definition, and num → generation (decryption derives per-object keys
    from it). Scan-based fallback (no xref): for incremental updates the
    LAST definition of an object number wins, which scanning start-to-end
    gives for free. Object headers whose match starts INSIDE an already
    recorded stream body are skipped — an uncompressed content stream
    containing the text ``3 0 obj << … >>`` must not inject or clobber
    real objects (same rule trailer scanning applies)."""
    objects: dict[int, tuple[object, bytes | None]] = {}
    spans: list[tuple[int, int]] = []
    offsets: dict[int, int] = {}
    gens: dict[int, int] = {}
    covered_end = -1  # spans are recorded in increasing file order
    for m in _OBJ_HEAD_RE.finditer(data):
        if m.start() < covered_end and any(a <= m.start() < b for a, b in spans):
            continue
        num = int(m.group(1))
        lex = _Lexer(data, m.end())
        try:
            value = lex.parse_value()
        except PdfParseError:
            continue
        stream, span = _read_stream_body(data, value, lex.pos)
        if span is not None:
            spans.append(span)
            covered_end = max(covered_end, span[1])
        elif data[lex.pos : lex.pos + 20].lstrip(b"\r\n \t").startswith(b"stream"):
            continue  # stream keyword but no endstream: unterminated, skip
        objects[num] = (value, stream)
        offsets[num] = m.start()
        gens[num] = int(m.group(2))
    if not objects:
        raise PdfParseError("no objects found")
    return objects, spans, offsets, gens


_TRAILER_RE = re.compile(rb"trailer\b")


def _scan_trailers(
    data: bytes, skip_spans: list[tuple[int, int]]
) -> list[tuple[int, dict]]:
    """Every ``trailer << … >>`` dictionary in the file with its byte
    offset, in file order — matches INSIDE stream bodies are skipped, so a
    content stream that happens to contain the text 'trailer << /Encrypt …
    >>' cannot mark a readable file encrypted or hijack /Info."""
    out: list[tuple[int, dict]] = []
    for m in _TRAILER_RE.finditer(data):
        if any(a <= m.start() < b for a, b in skip_spans):
            continue
        lex = _Lexer(data, m.end())
        try:
            v = lex.parse_value()
        except PdfParseError:
            continue
        if isinstance(v, dict):
            out.append((m.start(), v))
    return out


# ----------------------------------------------------------- xref parsing

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_XREF_KW_RE = re.compile(rb"\s*xref\b")
_SUBSEC_RE = re.compile(rb"\s*(\d+)\s+(\d+)[ \t]*\r?\n?")
_XENTRY_RE = re.compile(rb"\s*(\d{10})\s+(\d{5})\s+([nf])")
_TRAILER_KW_RE = re.compile(rb"\s*trailer\b")


def _png_unpredict(body: bytes, columns: int) -> bytes:
    """Undo PNG row predictors (sub/up/avg/paeth) on a byte-per-component
    stream — /DecodeParms /Predictor >= 10, ubiquitous in xref streams.
    Row layout: 1 filter-type byte + ``columns`` data bytes."""
    if columns <= 0:
        raise PdfParseError("bad predictor columns")
    out = bytearray()
    prev = bytearray(columns)
    for base in range(0, len(body) - columns, columns + 1):
        ft = body[base]
        row = bytearray(body[base + 1 : base + 1 + columns])
        if ft == 1:  # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(columns):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(columns):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise PdfParseError(f"unknown png filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _parse_classic_xref(data: bytes, pos: int):
    """Classic ``xref`` table section → (entries, trailer, xrefstm, prev).
    entries: num → (type, offset) with type 1 = in use, 0 = free."""
    m = _XREF_KW_RE.match(data, pos)
    if not m:
        raise PdfParseError("not a classic xref")
    p = m.end()
    entries: dict[int, tuple[int, int]] = {}
    while True:
        ms = _SUBSEC_RE.match(data, p)
        if not ms:
            break
        start, count = int(ms.group(1)), int(ms.group(2))
        if count > 5_000_000:
            raise PdfParseError("xref subsection too large")
        p = ms.end()
        for i in range(count):
            me = _XENTRY_RE.match(data, p)
            if not me:
                raise PdfParseError("short xref subsection")
            entries[start + i] = (
                1 if me.group(3) == b"n" else 0,
                int(me.group(1)),
            )
            p = me.end()
    mt = _TRAILER_KW_RE.match(data, p)
    if not mt:
        raise PdfParseError("classic xref without trailer")
    trailer = _Lexer(data, mt.end()).parse_value()
    if not isinstance(trailer, dict):
        raise PdfParseError("bad trailer dict")
    return entries, trailer, trailer.get("XRefStm"), trailer.get("Prev")


def _parse_xref_stream(data: bytes, pos: int):
    """Xref stream (/Type /XRef) section → (entries, trailer, None, prev).
    entries: num → (type, field2); type 0 free, 1 offset, 2 in-ObjStm
    (field2 = container object number — recovered by ObjStm expansion)."""
    m = _OBJ_HEAD_RE.search(data, pos, pos + 64)
    if not m:
        raise PdfParseError("no object at xref-stream offset")
    lex = _Lexer(data, m.end())
    value = lex.parse_value()
    if not (isinstance(value, dict) and value.get("Type") == "XRef"):
        raise PdfParseError("object at startxref is not /Type /XRef")
    raw, _span = _read_stream_body(data, value, lex.pos)
    if raw is None:
        raise PdfParseError("xref stream without body")
    body = _decode_raw_stream(value, raw)
    w = value.get("W")
    if not (isinstance(w, list) and len(w) >= 3):
        raise PdfParseError("xref stream missing /W")
    w0, w1, w2 = (int(x) for x in w[:3])
    rw = w0 + w1 + w2
    if rw <= 0 or rw > 32:
        raise PdfParseError("bad /W widths")
    size = int(value.get("Size") or 0)
    index = value.get("Index") or [0, size]
    entries: dict[int, tuple[int, int]] = {}
    bpos = 0
    for k in range(0, len(index) - 1, 2):
        start, count = int(index[k]), int(index[k + 1])
        for i in range(count):
            rec = body[bpos : bpos + rw]
            bpos += rw
            if len(rec) < rw:
                raise PdfParseError("short xref stream")
            typ = int.from_bytes(rec[:w0], "big") if w0 else 1
            f2 = int.from_bytes(rec[w0 : w0 + w1], "big")
            entries[start + i] = (typ, f2)
    return entries, value, None, value.get("Prev")


def _load_via_xref(data: bytes, dead: set[int]):
    """Primary object locator: follow the ``startxref`` chain (newest
    section first; hybrid /XRefStm consulted before its classic section,
    per spec) and parse objects only at live recorded offsets. Newest
    entry per object number wins; objects freed by a newer section stay
    dead even if an older section still lists them. Returns
    (objects, trailer dicts newest-first). Raises on anything suspicious —
    the caller falls back to the tolerant full scan."""
    tail = data[-2048:]
    last = None
    for last in _STARTXREF_RE.finditer(tail):
        pass
    if last is None:
        raise PdfParseError("no startxref")
    offsets: dict[int, int] = {}
    containers: dict[int, int] = {}  # type-2: num → designated ObjStm num
    trailers: list[dict] = []
    seen: set[int] = set()
    claimed: set[int] = set()  # object numbers the NEWEST section decided

    def walk(pos: int, depth: int) -> None:
        if depth > 64 or pos in seen or not (0 <= pos < len(data)):
            return
        seen.add(pos)
        if _XREF_KW_RE.match(data, pos):
            entries, trailer, xrefstm, prev = _parse_classic_xref(data, pos)
        else:
            entries, trailer, xrefstm, prev = _parse_xref_stream(data, pos)
        trailers.append(trailer)
        if xrefstm is not None:
            walk(int(xrefstm), depth + 1)
        for num, (typ, f2) in entries.items():
            # a newer section's decision — ANY type, including type 2
            # (in-ObjStm) — shadows older sections: an older type-1 offset
            # must not resurrect an object the newest xref moved into an
            # ObjStm or freed
            if num in claimed or num == 0:
                continue
            claimed.add(num)
            if typ == 0:
                dead.add(num)
            elif typ == 1:
                offsets[num] = f2
            elif typ == 2:
                # lives in ObjStm f2: record the DESIGNATED container so
                # expansion takes this object from the container the newest
                # xref actually points at — a stale copy in an older
                # still-live ObjStm must not shadow it
                containers[num] = f2
        if prev is not None:
            walk(int(prev), depth + 1)

    walk(int(last.group(1)), 0)
    objects: dict[int, tuple[object, bytes | None]] = {}
    gens: dict[int, int] = {}
    for num, off in offsets.items():
        m = _OBJ_HEAD_RE.match(data, off) or _OBJ_HEAD_RE.search(data, off, off + 64)
        if not m or int(m.group(1)) != num:
            continue  # stale offset: tolerate, object just stays missing
        lex = _Lexer(data, m.end())
        try:
            value = lex.parse_value()
        except PdfParseError:
            continue
        stream, _span = _read_stream_body(data, value, lex.pos)
        objects[num] = (value, stream)
        gens[num] = int(m.group(2))
    if not objects:
        raise PdfParseError("xref chain resolved no objects")
    return objects, trailers, gens, containers


# ------------------------------------------- standard security handler (RC4)

_STD_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for idx, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[idx] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _rc4_era_key(enc: dict, id0: bytes, r: int, n: int, password: bytes = b"") -> bytes | None:
    """Algorithm 2 (MD5) file-key derivation + /U verification for
    revisions 2–4; returns the key only if ``password`` verifies as the
    USER password — None means "cannot decrypt"."""
    o, u, p = enc.get("O"), enc.get("U"), enc.get("P")
    if not isinstance(o, bytes) or not isinstance(u, bytes) or not isinstance(p, int):
        return None
    if not 5 <= n <= 16:
        return None
    md5_input = (password + _STD_PAD)[:32] + o[:32] + struct.pack("<I", p & 0xFFFFFFFF) + id0
    if r >= 4 and enc.get("EncryptMetadata") is False:
        md5_input += b"\xff\xff\xff\xff"
    h = hashlib.md5(md5_input).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    if r == 2:
        ok = _rc4(key, _STD_PAD) == u[:32]
    else:
        t = _rc4(key, hashlib.md5(_STD_PAD + id0).digest())
        for i in range(1, 20):
            t = _rc4(bytes(b ^ i for b in key), t)
        ok = t[:16] == u[:16]
    return key if ok else None


def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash (R6)."""
    from ocr_model_spark.kernels.aes import cbc_encrypt

    k = hashlib.sha256(password + salt + udata).digest()
    count = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        count += 1
        if count >= 64 and e[-1] <= count - 32:
            return k[:32]


def _v5_file_key(enc: dict) -> bytes | None:
    """AESV3 (V5, R5/R6) empty-USER-password validation + file key from /UE."""
    from ocr_model_spark.kernels.aes import cbc_decrypt

    u, ue, r = enc.get("U"), enc.get("UE"), enc.get("R")
    if not isinstance(u, bytes) or len(u) < 48 or not isinstance(ue, bytes) or len(ue) < 32:
        return None
    vsalt, ksalt = u[32:40], u[40:48]
    if r == 6:
        if _hash_2b(b"", vsalt, b"") != u[:32]:
            return None
        ik = _hash_2b(b"", ksalt, b"")
    elif r == 5:  # deprecated Adobe extension: plain SHA-256
        if hashlib.sha256(vsalt).digest() != u[:32]:
            return None
        ik = hashlib.sha256(ksalt).digest()
    else:
        return None
    return cbc_decrypt(ik, bytes(16), ue[:32], unpad=False)


def _security_handler_key(enc: dict, id0: bytes) -> tuple[bytes, str] | None:
    """(file key, method) for the standard handler with an EMPTY user
    password; method ∈ {rc4, aesv2, aesv3}. None = cannot decrypt (AES
    with a real password, unknown /V, non-standard handlers, …)."""
    if enc.get("Filter") != "Standard":
        return None
    v, r = enc.get("V", 0), enc.get("R")
    if v in (1, 2) and r in (2, 3):
        key = _rc4_era_key(enc, id0, r, int(enc.get("Length", 40)) // 8 if r >= 3 else 5)
        return (key, "rc4") if key else None
    if v == 4 and r == 4:
        cf = enc.get("CF")
        stdcf = cf.get("StdCF") if isinstance(cf, dict) else None
        cfm = stdcf.get("CFM") if isinstance(stdcf, dict) else None
        if cfm not in ("AESV2", "V2"):
            return None
        # crypt-filter /Length is BYTES per spec, but many writers emit
        # bits — normalize; default 16 for AESV2
        raw_len = stdcf.get("Length") if isinstance(stdcf, dict) else None
        if isinstance(raw_len, int):
            n = raw_len if raw_len <= 32 else raw_len // 8
        else:
            n = int(enc.get("Length", 128)) // 8
        key = _rc4_era_key(enc, id0, 4, n)
        return (key, "aesv2" if cfm == "AESV2" else "rc4") if key else None
    if v == 5 and r in (5, 6):
        key = _v5_file_key(enc)
        return (key, "aesv3") if key else None
    return None


def _object_key(file_key: bytes, num: int, gen: int = 0, aes: bool = False) -> bytes:
    # generation comes from the object header (both load paths record it);
    # a gen>0 object under /Encrypt decrypts with the wrong key if 0 is
    # assumed — silent garbage, not a typed failure
    d = hashlib.md5(
        file_key
        # spec: the 3 (resp. 2) LOW-ORDER bytes — a hostile/corrupt object
        # number >= 2^24 must mask, not raise OverflowError mid-decryption
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
        + (b"sAlT" if aes else b"")
    ).digest()
    return d[: min(len(file_key) + 5, 16)]


def _map_strings(v, f):
    if isinstance(v, bytes):
        return f(v)
    if isinstance(v, dict):
        return {k: _map_strings(x, f) for k, x in v.items()}
    if isinstance(v, list):
        return [_map_strings(x, f) for x in v]
    return v


class _Doc:
    def __init__(self, data: bytes):
        # xref-first: O(live objects) instead of O(file), freed objects
        # stay dead, incremental updates resolve to the section the chain
        # actually references. Any parse trouble → tolerant full scan.
        # Decryption (when the empty user password verifies) runs BEFORE
        # ObjStm expansion: the containers themselves are encrypted streams.
        self._dead: set[int] = set()
        self.decrypted = False
        self.gens: dict[int, int] = {}
        self._objstm_bind: dict[int, int] = {}
        loaded = False
        try:
            self.objects, newest_first, self.gens, self._objstm_bind = _load_via_xref(
                data, self._dead
            )
            # stored oldest-first so info_dict()'s reversed() scan sees the
            # newest trailer first, same convention as the scan path
            self.trailers = list(reversed(newest_first))
            self._maybe_decrypt()
            self._expand_object_streams()
            loaded = any(
                isinstance(v, dict) and v.get("Type") == "Catalog"
                for v, _s in self.objects.values()
            )
        except Exception:
            loaded = False
        if not loaded:
            self._dead = set()
            self.decrypted = False
            self._objstm_bind = {}
            self.objects, stream_spans, obj_offsets, self.gens = _scan_objects(data)
            # trailer dicts (classic) + xref-stream dicts (PDF 1.5+) carry
            # /Root, /Info and /Encrypt — ordered by BYTE OFFSET so an
            # incremental update's newer classic trailer outranks an older
            # xref-stream dict (and vice versa)
            dated = _scan_trailers(data, stream_spans) + [
                (obj_offsets.get(num, 0), v)
                for num, (v, _s) in self.objects.items()
                if isinstance(v, dict) and v.get("Type") == "XRef"
            ]
            self.trailers = [t for _off, t in sorted(dated, key=lambda p: p[0])]
            self._maybe_decrypt()
            self._expand_object_streams()

    def _maybe_decrypt(self) -> None:
        """If the newest trailer declares /Encrypt AND the standard-handler
        key verifies with the EMPTY user password, decrypt every object's
        strings and stream in place (RC4, per-object keys). Leaves
        ``decrypted`` False otherwise — the caller fails typed."""
        enc_ref = None
        for t in reversed(self.trailers):
            if "Encrypt" in t:
                enc_ref = t["Encrypt"]
                break
        if enc_ref is None:
            return
        id0 = b""
        for t in reversed(self.trailers):
            ids = self.resolve(t.get("ID"))
            if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
                id0 = ids[0]
                break
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            return
        # crypt-filter dicts may hide behind indirect refs
        enc = dict(enc)
        cf = self.resolve(enc.get("CF"))
        if isinstance(cf, dict):
            enc["CF"] = {k: self.resolve(v) for k, v in cf.items()}
        got = _security_handler_key(enc, id0)
        if got is None:
            return
        key, method = got

        def dec(num: int, data: bytes) -> bytes:
            gen = self.gens.get(num, 0)
            if method == "rc4":
                return _rc4(_object_key(key, num, gen), data)
            from ocr_model_spark.kernels.aes import cbc_decrypt

            k = _object_key(key, num, gen, aes=True) if method == "aesv2" else key
            if len(data) < 32 or (len(data) - 16) % 16:
                return b""  # malformed AES payload: empty beats garbage
            return cbc_decrypt(k, data[:16], data[16:])

        enc_num = enc_ref.num if isinstance(enc_ref, Ref) else None
        for num in list(self.objects):
            if num == enc_num:
                continue
            value, stream = self.objects[num]
            if isinstance(value, dict) and value.get("Type") == "XRef":
                continue  # xref streams are never encrypted
            new_value = _map_strings(value, lambda b, n=num: dec(n, b))
            new_stream = dec(num, stream) if stream is not None else None
            self.objects[num] = (new_value, new_stream)
        self.decrypted = True

    def is_encrypted(self) -> bool:
        return any("Encrypt" in t for t in self.trailers)

    def info_dict(self) -> dict | None:
        """The /Info dictionary named by the newest trailer that has one."""
        for t in reversed(self.trailers):
            info = self.resolve(t.get("Info"))
            if isinstance(info, dict):
                return info
        return None

    def _parse_objstm(self, num: int):
        """Decoded body, /First, and the {objnum: offset} header map of
        ObjStm ``num`` — None if absent or broken."""
        got = self.objects.get(num)
        if got is None:
            return None
        value, stream = got
        if not (isinstance(value, dict) and value.get("Type") == "ObjStm" and stream):
            return None
        try:
            body = _decode_stream(self, value, stream)
            n = int(self.resolve(value.get("N")) or 0)
            first = int(self.resolve(value.get("First")) or 0)
            header = body[:first].split()
            hmap = {
                int(header[2 * i]): int(header[2 * i + 1]) for i in range(n)
            }
        except (PdfParseError, ValueError, IndexError, zlib.error):
            return None
        return body, first, hmap

    def _expand_object_streams(self) -> None:
        """PDF 1.5+ compressed object streams (/Type /ObjStm): page dicts and
        friends often live INSIDE a FlateDecoded stream of serialized
        objects. Header = ``/N`` pairs of "objnum offset" ints in the first
        ``/First`` bytes; objects follow back-to-back. Embedded objects never
        override a directly-scanned one (direct definitions are newer in
        incremental updates).

        Expansion order: objects with a DESIGNATED container (type-2 xref
        entries) come from that container first — an older still-live ObjStm
        holding a stale copy must not define the object just because it
        iterates earlier. Generic expansion then fills whatever remains
        (scan mode has no bindings; a broken designated container falls
        back here — recovering a stale copy beats losing the object)."""
        by_container: dict[int, list[int]] = {}
        for onum, cnum in self._objstm_bind.items():
            by_container.setdefault(cnum, []).append(onum)
        for cnum, wanted in by_container.items():
            parsed = self._parse_objstm(cnum)
            if parsed is None:
                continue
            body, first, hmap = parsed
            for onum in wanted:
                if onum in self.objects or onum in self._dead or onum not in hmap:
                    continue
                try:
                    self.objects[onum] = (
                        _Lexer(body, first + hmap[onum]).parse_value(),
                        None,
                    )
                except PdfParseError:
                    continue
        for num in list(self.objects):
            parsed = self._parse_objstm(num)
            if parsed is None:
                continue
            body, first, hmap = parsed
            for onum, off in hmap.items():
                if onum in self.objects or onum in self._dead:
                    continue
                try:
                    self.objects[onum] = (_Lexer(body, first + off).parse_value(), None)
                except PdfParseError:
                    continue

    def resolve(self, v):
        seen = 0
        while isinstance(v, Ref):
            if v.num not in self.objects or seen > 32:
                return None
            v = self.objects[v.num][0]
            seen += 1
        return v

    def stream_of(self, ref) -> bytes | None:
        v = ref
        while isinstance(v, Ref):
            if v.num not in self.objects:
                return None
            value, stream = self.objects[v.num]
            if stream is not None:
                return _decode_stream(self, value, stream)
            v = value
        return None

    def pages(self) -> list[dict]:
        """Page dicts in document order via the /Pages tree; falls back to
        object-number order over /Type /Page objects for broken trees."""
        root = None
        for value, _s in self.objects.values():
            if isinstance(value, dict) and value.get("Type") == "Catalog":
                root = self.resolve(value.get("Pages"))
                break
        out: list[dict] = []
        if isinstance(root, dict):
            self._walk(root, out, 0)
        if not out:
            for num in sorted(self.objects):
                value, _s = self.objects[num]
                if isinstance(value, dict) and value.get("Type") == "Page":
                    value.setdefault("__parent__", None)
                    out.append(value)
        return out

    def _walk(self, node: dict, out: list, depth: int) -> None:
        if depth > 64:
            return
        kids = self.resolve(node.get("Kids")) or []
        for kid in kids:
            k = self.resolve(kid)
            if not isinstance(k, dict):
                continue
            if k.get("Type") == "Page":
                k["__parent__"] = node
                out.append(k)
            else:
                k["__parent__"] = node
                self._walk(k, out, depth + 1)

    def inherited(self, page: dict, key: str):
        node: dict | None = page
        depth = 0
        while isinstance(node, dict) and depth < 64:
            if key in node:
                return self.resolve(node[key])
            node = node.get("__parent__") or self.resolve(node.get("Parent"))
            depth += 1
        return None


def _apply_decode_parms(out: bytes, parms) -> bytes:
    """Post-filter predictor step (/DecodeParms): PNG predictors 10–15
    (per-row, see :func:`_png_unpredict`) and TIFF predictor 2 are the two
    the spec defines for Flate/LZW; predictor 1 / absent = identity."""
    if not isinstance(parms, dict):
        return out
    pred = parms.get("Predictor")
    if not isinstance(pred, int) or pred <= 1:
        return out
    columns = int(parms.get("Columns") or 1)
    colors = int(parms.get("Colors") or 1)
    bpc = int(parms.get("BitsPerComponent") or 8)
    rowbytes = (columns * colors * bpc + 7) // 8
    if pred >= 10:
        return _png_unpredict(out, rowbytes)
    if pred == 2:
        if bpc != 8:
            raise PdfParseError("tiff predictor only for 8-bit components")
        buf = bytearray(out)
        for base in range(0, len(buf) - rowbytes + 1, rowbytes):
            for i in range(colors, rowbytes):
                buf[base + i] = (buf[base + i] + buf[base + i - colors]) & 0xFF
        return bytes(buf)
    raise PdfParseError(f"unsupported predictor {pred}")


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode (ISO 32000-1 §7.4.4): TIFF-style variable-width codes
    9→12 bits, 256 = clear table, 257 = EOD, ``early`` = /EarlyChange
    (default 1: the code width bumps one code early)."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: bytes | None = None
    buf = nbits = 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (buf >> nbits) & ((1 << width) - 1)
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise PdfParseError("bad first LZW code")
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
                table[next_code] = entry
                next_code += 1
            else:
                raise PdfParseError("LZW code out of sequence")
            out += entry
            prev = entry
            if next_code >= (1 << width) - early and width < 12:
                width += 1
        buf &= (1 << nbits) - 1  # keep the bit buffer bounded
    return bytes(out)  # EOD-less streams: tolerate, emit what decoded


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    s = b"".join(data.split())  # whitespace is insignificant
    # '~>' is EOD — spec: anything AFTER it shall be IGNORED (padding /
    # stray bytes inside the /Length extent must not kill the stream)
    s = s.split(b"~>")[0]
    if s.startswith(b"<~"):
        s = s[2:]
    try:
        return base64.a85decode(s)
    except ValueError as e:
        raise PdfParseError(f"bad ASCII85 stream: {e}") from None


def _asciihex_decode(data: bytes) -> bytes:
    s = data.split(b">")[0]  # '>' is EOD
    s = b"".join(s.split())
    if len(s) % 2:
        s += b"0"  # spec: odd final digit behaves as if followed by 0
    try:
        return bytes.fromhex(s.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as e:
        raise PdfParseError(f"bad ASCIIHex stream: {e}") from None


def _runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:  # EOD
            break
        if ln < 128:
            out += data[i : i + ln + 1]
            i += ln + 1
        else:
            if i >= n:
                raise PdfParseError("truncated RunLength stream")
            out += bytes([data[i]]) * (257 - ln)
            i += 1
    return bytes(out)


def _decode_filters(filters: list, parms_list: list, raw: bytes, resolve) -> bytes:
    out = raw
    for f, p in zip(filters, parms_list):
        f = resolve(f)
        if f == "FlateDecode" or f == "Fl":
            out = _apply_decode_parms(zlib.decompress(out), resolve(p))
        elif f == "LZWDecode" or f == "LZW":
            parms = resolve(p)
            early = (
                int(parms.get("EarlyChange", 1)) if isinstance(parms, dict) else 1
            )
            out = _apply_decode_parms(_lzw_decode(out, early), parms)
        elif f == "ASCII85Decode" or f == "A85":
            out = _ascii85_decode(out)
        elif f == "ASCIIHexDecode" or f == "AHx":
            out = _asciihex_decode(out)
        elif f == "RunLengthDecode" or f == "RL":
            out = _runlength_decode(out)
        else:
            raise PdfParseError(f"unsupported filter {f}")
    return out


def _normalize_filter_chain(filt, parms) -> tuple[list, list]:
    filters = filt if isinstance(filt, list) else [filt]
    if isinstance(parms, list):
        parms_list = parms + [None] * (len(filters) - len(parms))
    else:
        parms_list = [parms] + [None] * (len(filters) - 1)
    return filters, parms_list


def _decode_stream(doc: _Doc, sdict: dict, raw: bytes) -> bytes:
    filt = doc.resolve(sdict.get("Filter"))
    if filt is None:
        return raw
    parms = doc.resolve(sdict.get("DecodeParms") or sdict.get("DP"))
    filters, parms_list = _normalize_filter_chain(filt, parms)
    return _decode_filters(filters, parms_list, raw, doc.resolve)


def _decode_raw_stream(sdict: dict, raw: bytes) -> bytes:
    """Doc-free decode for xref streams, whose dict entries are required
    by spec to be direct (no indirect references to chase)."""
    filt = sdict.get("Filter")
    if filt is None:
        return raw
    filters, parms_list = _normalize_filter_chain(
        filt, sdict.get("DecodeParms") or sdict.get("DP")
    )
    return _decode_filters(filters, parms_list, raw, lambda v: v)


# ------------------------------------------------- content-stream interpreter

_CS_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*(?:\((?:\\.|[^\\()])*\)(?:\\.|[^\\()])*)*\)"  # literal string (1 nesting level)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|<<|>>|\[|\]"
    rb"|/[^\s()<>\[\]{}/%]*"  # name
    rb"|[+-]?(?:\d+\.\d*|\.\d+|\d+)"  # number
    rb"|[A-Za-z'\"*]+",  # operator
    re.S,
)


def _decode_text(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", errors="replace")
    # WinAnsi/PDFDoc ≈ latin-1 for the printable range (simple-font subset)
    return b.decode("latin-1")


# ------------------------------------------------- fonts / ToUnicode CMaps

_HEX_OR_BRACKET_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")
_MAX_BFRANGE = 1 << 16  # cap range expansion (malicious CMaps)


def _u16(hexs: bytes) -> str:
    try:
        return bytes.fromhex(hexs.decode("ascii")).decode("utf-16-be", errors="replace")
    except ValueError:
        return ""


def parse_tounicode_cmap(data: bytes) -> dict[int, str]:
    """ToUnicode CMap → {char code: unicode string}. Covers the two entry
    forms real writers emit: ``bfchar`` pairs and ``bfrange`` triples
    (incrementing-destination and explicit-array variants). Composite
    (Type0/CID) fonts — i.e. most modern PDFs — are unreadable garbage
    without this: their 2-byte codes are font-internal glyph ids, and the
    CMap is the only route back to text."""
    cmap: dict[int, str] = {}
    for sec in re.findall(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = re.findall(rb"<([0-9A-Fa-f]+)>", sec)
        for src, dst in zip(toks[0::2], toks[1::2]):
            cmap[int(src, 16)] = _u16(dst)
    for sec in re.findall(rb"beginbfrange(.*?)endbfrange", data, re.S):
        items = _HEX_OR_BRACKET_RE.findall(sec)
        i = 0
        while i + 2 < len(items) or (i + 2 == len(items) and items[i][0] and items[i + 1][0]):
            if not (i + 1 < len(items) and items[i][0] and items[i + 1][0]):
                break
            lo, hi = int(items[i][0], 16), int(items[i + 1][0], 16)
            hi = min(hi, lo + _MAX_BFRANGE)
            if i + 2 < len(items) and items[i + 2][1]:  # '[' — explicit array
                j = i + 3
                code = lo
                while j < len(items) and not items[j][2]:
                    if items[j][0]:
                        cmap[code] = _u16(items[j][0])
                        code += 1
                    j += 1
                i = j + 1
            elif i + 2 < len(items) and items[i + 2][0]:  # incrementing dest
                base_hex = items[i + 2][0]
                width = max(2, len(base_hex) // 2)
                base = int(base_hex, 16)
                for c in range(lo, hi + 1):
                    cmap[c] = _u16(
                        (base + c - lo).to_bytes(width, "big").hex().encode()
                    )
                i += 3
            else:
                break
    return cmap


# Predefined Unicode CMaps (ISO 32000-1 §9.7.5.2, Adobe CMap resources):
# the Uni*-UCS2-* and Uni*-UTF16-* encodings map UNICODE values to CIDs,
# i.e. the 2-byte codes in the content stream ARE UTF-16BE text — no CMap
# data file needed, the decode is pure arithmetic. The reference gets these
# for free via its PDF library (pdf_processor.py:49-76); without this a
# slice of CJK PDFs yields empty spans.
_UNICODE_CMAP_NAMES = frozenset(
    f"Uni{reg}-{enc}-{wm}"
    for reg in ("GB", "CNS", "JIS", "JIS2004", "KS")
    for enc in ("UCS2", "UTF16")
    for wm in ("H", "V")
)

# Predefined LEGACY-encoding CMaps (ISO 32000-1 §9.7.5.2 table 118): these
# map NATIONAL-CHARSET byte sequences (EUC-CN/GBK, Big5, Shift-JIS/EUC-JP,
# EUC-KR/UHC) to CIDs — i.e. the show-string bytes in the content stream
# ARE text in a standard charset with a Python STDLIB codec. Decoding the
# raw bytes with that codec yields the same text the reference gets through
# PyMuPDF's bundled CMap resources (pdf_processor.py:49-76) without any CID
# table. The encodings are mixed single/multi-byte, so the codec — not the
# 2-byte splitter — does the segmentation.
_LEGACY_CMAP_CODECS = {
    # Simplified Chinese (Adobe-GB1)
    "GB-EUC-H": "gbk", "GB-EUC-V": "gbk",
    "GBpc-EUC-H": "gbk", "GBpc-EUC-V": "gbk",
    "GBK-EUC-H": "gbk", "GBK-EUC-V": "gbk",
    "GBKp-EUC-H": "gbk", "GBKp-EUC-V": "gbk",
    "GBK2K-H": "gb18030", "GBK2K-V": "gb18030",
    # Traditional Chinese (Adobe-CNS1)
    "B5pc-H": "big5", "B5pc-V": "big5",
    "ETen-B5-H": "big5", "ETen-B5-V": "big5",
    "ETenms-B5-H": "big5", "ETenms-B5-V": "big5",
    "HKscs-B5-H": "big5hkscs", "HKscs-B5-V": "big5hkscs",
    # Japanese (Adobe-Japan1)
    "90ms-RKSJ-H": "shift_jis", "90ms-RKSJ-V": "shift_jis",
    "90msp-RKSJ-H": "shift_jis", "90msp-RKSJ-V": "shift_jis",
    "90pv-RKSJ-H": "shift_jis", "90pv-RKSJ-V": "shift_jis",
    "EUC-H": "euc_jp", "EUC-V": "euc_jp",
    # Korean (Adobe-Korea1)
    "KSC-EUC-H": "euc_kr", "KSC-EUC-V": "euc_kr",
    "KSCms-UHC-H": "cp949", "KSCms-UHC-V": "cp949",
    "KSCms-UHC-HW-H": "cp949", "KSCms-UHC-HW-V": "cp949",
}


def _page_fonts(
    doc: "_Doc", page: dict
) -> dict[str, tuple[bool, dict | None, bool, bool, str | None]]:
    """font resource name → (is_two_byte, ToUnicode cmap or None,
    is_identity_encoding, is_predefined_unicode_encoding,
    legacy_charset_codec or None), from the page's (possibly inherited)
    /Resources /Font dictionary."""
    res = doc.inherited(page, "Resources")
    fonts = doc.resolve(res.get("Font")) if isinstance(res, dict) else None
    out: dict[str, tuple[bool, dict | None, bool, bool, str | None]] = {}
    if not isinstance(fonts, dict):
        return out
    for name, ref in fonts.items():
        fobj = doc.resolve(ref)
        if not isinstance(fobj, dict):
            continue
        two_byte = fobj.get("Subtype") == "Type0"
        enc = doc.resolve(fobj.get("Encoding"))
        identity = isinstance(enc, str) and enc in ("Identity-H", "Identity-V")
        uni_cmap = isinstance(enc, str) and enc in _UNICODE_CMAP_NAMES
        legacy = _LEGACY_CMAP_CODECS.get(enc) if isinstance(enc, str) else None
        cmap = None
        if fobj.get("ToUnicode") is not None:
            stream = doc.stream_of(fobj["ToUnicode"])
            if stream:
                try:
                    cmap = parse_tounicode_cmap(stream) or None
                except Exception:
                    cmap = None
        out[str(name)] = (two_byte, cmap, identity, uni_cmap, legacy)
    return out


def _identity_cid_text(raw: bytes) -> str:
    """Identity-H Type0 WITHOUT a ToUnicode map: the cid-is-unicode
    heuristic. Many generators emit Identity-encoded fonts whose CIDs ARE
    Unicode code points; subset fonts with reordered glyph ids instead
    yield mostly control-range codes. Decode 2-byte codes as code points,
    then keep the string only if it reads like text (≥2/3 printable) —
    recovering the common case while refusing to emit mojibake."""
    chars = []
    n_ok = 0
    for i in range(0, len(raw) - 1, 2):
        code = raw[i] << 8 | raw[i + 1]
        if code in (0x09, 0x0A, 0x0D):  # whitespace CIDs keep word breaks
            chars.append(" ")
            n_ok += 1
            continue
        c = chr(code) if 0x20 <= code <= 0xFFFD and not (0xD800 <= code <= 0xDFFF) else "\x00"
        # isprintable() also rejects C1 controls, soft hyphen, U+2028/29 —
        # anything unprintable is both evidence against the heuristic AND
        # dropped from the output (never emitted)
        if c != "\x00" and (c.isprintable() or c == " "):
            chars.append(c)
            n_ok += 1
        else:
            chars.append("\x00")
    if not chars:
        return ""
    if n_ok * 3 < len(chars) * 2:
        return ""
    # dropped codes BETWEEN kept runs become one space: silently deleting
    # them would concatenate adjacent words ("foo<bad>bar" → "foobar") —
    # partial silent text loss. Edge gaps still vanish (no stray padding).
    return re.sub("\x00+", " ", "".join(chars).strip("\x00"))


def _decode_with_font(
    raw: bytes, font: tuple[bool, dict | None, bool, bool, str | None] | None
) -> str:
    if font is None:
        return _decode_text(raw)
    two_byte, cmap, identity, uni_cmap, legacy = font
    if legacy is not None:
        # predefined legacy-charset CMap (GB-EUC, ETen-B5, RKSJ, …): the
        # bytes are national-charset text; the stdlib codec IS the decode
        # (declared by the font — no printability gate). Checked BEFORE
        # the ToUnicode branch: these encodings are MIXED single/multi-
        # byte, so the uniform 2-byte splitter would mis-segment ASCII
        # runs (0x61 0x62 looked up as code 0x6162) even when a ToUnicode
        # map rides along — the codec and the ToUnicode target the same
        # Unicode text, and only the codec knows the segmentation.
        return raw.decode(legacy, errors="ignore")
    if cmap is None:
        if two_byte and uni_cmap:
            # predefined Uni*-UCS2/UTF16 encoding: the codes ARE UTF-16BE
            # (declared by the font, not a heuristic — no printability gate)
            return raw.decode("utf-16-be", errors="ignore")
        if two_byte and identity:
            return _identity_cid_text(raw)
        # Type0 codes without a ToUnicode map are font-internal glyph ids:
        # emitting nothing beats emitting latin-1 mojibake
        return "" if two_byte else _decode_text(raw)
    if two_byte:
        return "".join(
            cmap.get(raw[i] << 8 | raw[i + 1], "") for i in range(0, len(raw) - 1, 2)
        )
    return "".join(cmap.get(b, "") for b in raw)


def _spans_from_content(
    content: bytes, height: float, fonts: dict | None = None
) -> list[dict]:
    """Interpret text-showing operators into spans (top-left-normalized),
    the shape :func:`pdf_extract._group_blocks` consumes. ``fonts`` maps
    resource names to decode info (see :func:`_page_fonts`); text shown
    with a ToUnicode-equipped font decodes through its CMap."""
    spans: list[dict] = []
    size = 12.0
    leading = 0.0
    line_x = line_y = 0.0
    cur_x = cur_y = 0.0
    scale = 1.0
    cur_font: str | None = None
    stack: list = []

    def show(raw):
        nonlocal cur_x
        text = _decode_with_font(
            raw, fonts.get(cur_font) if fonts and cur_font else None
        )
        if text.strip():
            eff = size * scale
            y = height - cur_y
            w = 0.5 * eff * len(text)
            spans.append(
                {
                    "text": text,
                    "x1": cur_x,
                    "y1": y - eff,
                    "x2": cur_x + w,
                    "y2": y,
                    "size": eff,
                }
            )
            cur_x += w
        else:
            cur_x += 0.5 * size * scale * len(text)

    def newline(ty=None):
        nonlocal line_x, line_y, cur_x, cur_y
        if ty is None:
            ty = -leading
        line_y += ty
        cur_x, cur_y = line_x, line_y

    for m in _CS_TOKEN_RE.finditer(content):
        tok = m.group(0)
        c = tok[:1]
        if c == b"(":
            lex = _Lexer(tok)
            try:
                stack.append(lex._parse_literal_string())
            except PdfParseError:
                stack.append(b"")
        elif c == b"<" and tok != b"<<":
            lex = _Lexer(tok)
            try:
                stack.append(lex._parse_hex_string())
            except PdfParseError:
                stack.append(b"")
        elif c == b"/" or tok in (b"<<", b">>", b"["):
            stack.append(tok)
        elif tok == b"]":
            pass  # `[` marks the TJ array start; `]` is not an operand
        elif c in b"+-.0123456789":
            stack.append(float(tok))
        else:  # operator
            op = tok
            if op == b"BT":
                line_x = line_y = cur_x = cur_y = 0.0
                scale = 1.0
            elif op == b"Tf" and len(stack) >= 1 and isinstance(stack[-1], float):
                size = stack[-1]
                if (
                    len(stack) >= 2
                    and isinstance(stack[-2], bytes)
                    and stack[-2][:1] == b"/"
                ):
                    cur_font = stack[-2][1:].decode("latin-1")
            elif op == b"TL" and stack and isinstance(stack[-1], float):
                leading = stack[-1]
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                tx, ty = stack[-2], stack[-1]
                if isinstance(tx, float) and isinstance(ty, float):
                    line_x += tx
                    line_y += ty
                    cur_x, cur_y = line_x, line_y
                    if op == b"TD":
                        leading = -ty
            elif op == b"Tm" and len(stack) >= 6:
                a, b_, c_, d, e, f = stack[-6:]
                if all(isinstance(v, float) for v in (a, b_, c_, d, e, f)):
                    line_x, line_y = e, f
                    cur_x, cur_y = e, f
                    scale = abs(d) or 1.0
            elif op == b"T*":
                newline()
            elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
                show(stack[-1])
            elif op == b"'" and stack and isinstance(stack[-1], bytes):
                newline()
                show(stack[-1])
            elif op == b'"' and stack and isinstance(stack[-1], bytes):
                newline()
                show(stack[-1])
            elif op == b"TJ":
                # operands since the last '[' token: strings show, numbers kern
                items: list = []
                while stack:
                    v = stack.pop()
                    if v == b"[":
                        break
                    items.append(v)
                for v in reversed(items):
                    if isinstance(v, bytes):
                        show(v)
                    elif isinstance(v, float):
                        cur_x -= v / 1000.0 * size * scale
            stack.clear()
    return spans


# ---------------------------------------------------------------- entrypoint


def read_doc_info(doc: "_Doc") -> dict[str, str]:
    """S10 document metadata from the /Info dictionary (reference:
    ``pdf_processor.py:238-274`` title/author extraction). The dictionary
    is resolved through the trailer's /Info reference — never by scanning
    for Title-bearing dicts, which would match outline (bookmark) items
    and report a chapter heading as the document title. Returns only
    string-typed entries, decoded like content strings."""
    value = doc.info_dict()
    info: dict[str, str] = {}
    if value is None:
        return info
    for key in ("Title", "Author", "Subject", "Producer", "CreationDate"):
        v = doc.resolve(value.get(key))
        if isinstance(v, bytes):
            t = _decode_text(v).strip()
            if t:
                info[key.lower()] = t
    return info


_IMG_FORMAT_BY_FILTER = {
    "DCTDecode": "jpeg",  # stream bytes ARE the JPEG file
    "JPXDecode": "jp2",
    "FlateDecode": "raw",  # decoded samples, no container
    "CCITTFaxDecode": "ccitt",
}


def extract_embedded_images(data: bytes) -> list[dict]:
    """S11: enumerate embedded image XObjects (reference
    ``document_processor.py`` image-export path / ``pdf_processor.py``
    page.get_images). Width/height/colorspace come from the image DICT —
    honest values, no pixel decoding — and for DCTDecode the stream bytes
    are the exportable JPEG file itself. Returns dicts
    ``{idx, format, width, height, colorspace, filter, n_bytes, data}``
    in object-number order (deterministic)."""
    doc = _Doc(data)
    out: list[dict] = []
    for num in sorted(doc.objects):
        value, stream = doc.objects[num]
        if not (isinstance(value, dict) and value.get("Subtype") == "Image" and stream):
            continue
        filt = doc.resolve(value.get("Filter"))
        if isinstance(filt, list):
            filt = doc.resolve(filt[-1]) if filt else None
        cs = doc.resolve(value.get("ColorSpace"))
        payload = stream if filt == "DCTDecode" else None
        if payload is None:
            try:
                payload = _decode_stream(doc, value, stream)
            except (PdfParseError, zlib.error):
                payload = stream  # export undecodable bytes as-is
        out.append(
            {
                "idx": len(out),
                "format": _IMG_FORMAT_BY_FILTER.get(str(filt), "unknown"),
                "width": int(doc.resolve(value.get("Width")) or 0),
                "height": int(doc.resolve(value.get("Height")) or 0),
                "colorspace": str(cs) if cs is not None else None,
                "filter": str(filt) if filt is not None else None,
                "n_bytes": len(payload),
                "data": payload,
            }
        )
    return out


def extract_pages_native(data: bytes, group_blocks) -> list[dict]:
    """Parse real PDF bytes into the engine-common pages structure.
    ``group_blocks`` is injected (pdf_extract._group_blocks) so the span→
    line→block reconstruction is byte-identical across all three engines.
    Raises :class:`PdfParseError` on unsupported constructs.

    The document /Info metadata (title/author…) is attached to the FIRST
    page dict under ``"doc_info"`` so the single return value carries it."""
    doc = _Doc(data)
    if doc.is_encrypted() and not doc.decrypted:
        raise PdfEncryptedError("document declares /Encrypt")
    page_dicts = doc.pages()
    if not page_dicts:
        raise PdfParseError("no pages")
    pages = []
    for pno, page in enumerate(page_dicts, start=1):
        box = doc.inherited(page, "MediaBox") or [0, 0, 612, 792]
        box = [float(doc.resolve(v) or 0) for v in box]
        width, height = box[2] - box[0], box[3] - box[1]
        contents = doc.resolve(page.get("Contents"))
        chunks: list[bytes] = []
        refs = page.get("Contents")
        if isinstance(contents, list):
            for r in contents:
                s = doc.stream_of(r)
                if s:
                    chunks.append(s)
        elif refs is not None:
            s = doc.stream_of(refs)
            if s:
                chunks.append(s)
        spans = (
            _spans_from_content(b"\n".join(chunks), height, _page_fonts(doc, page))
            if chunks
            else []
        )
        pages.append(
            {
                "page_num": pno,
                "width": int(width),
                "height": int(height),
                "blocks": group_blocks(spans),
            }
        )
    info = read_doc_info(doc)
    if doc.decrypted:
        # observable at the corpus layer: the file WAS encrypted and the
        # empty-user-password handler opened it
        info = {**info, "encryption": "standard-decrypted"}
    if info:
        pages[0]["doc_info"] = info
    return pages
