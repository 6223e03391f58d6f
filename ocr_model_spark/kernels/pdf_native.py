"""Real-PDF text-layer reader — stdlib only (no fitz/pdfplumber).

Covers the classic-PDF subset a text-layer extractor needs, matching the
semantics of the reference's PyMuPDF path (``worker/pipeline/processors/
pdf_processor.py:49-76``: blocks→lines→spans of native text, blanks skipped,
confidence 1.0):

  * object scan (``N G obj … endobj``) with ``stream``/``endstream`` bodies —
    tolerant, no xref needed (works on linearized and incrementally-updated
    files; xref parsing adds nothing for read-only text extraction);
  * FlateDecode via ``zlib`` (the only filter classic text PDFs use; any
    other filter fails typed, caught by the caller);
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

Deliberately NOT covered (typed failure instead of wrong text): encrypted
PDFs. At the corpus layer those land in the lineage failure counters
exactly like the reference's engine-degradation path.
"""

from __future__ import annotations

import re
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


def _scan_objects(
    data: bytes,
) -> tuple[dict[int, tuple[dict | object, bytes | None]], list[tuple[int, int]]]:
    """num → (parsed value, raw stream bytes or None), plus the byte spans
    of every stream body (so trailer scanning can skip content that merely
    CONTAINS PDF-syntax-looking text). Scan-based (no xref): for
    incremental updates the LAST definition of an object number wins,
    which scanning start-to-end gives for free."""
    objects: dict[int, tuple[object, bytes | None]] = {}
    spans: list[tuple[int, int]] = []
    for m in _OBJ_HEAD_RE.finditer(data):
        num = int(m.group(1))
        lex = _Lexer(data, m.end())
        try:
            value = lex.parse_value()
        except PdfParseError:
            continue
        stream: bytes | None = None
        rest = data[lex.pos : lex.pos + 20]
        if rest.lstrip(b"\r\n \t").startswith(b"stream"):
            s = data.find(b"stream", lex.pos)
            body_start = s + len(b"stream")
            if data[body_start : body_start + 2] == b"\r\n":
                body_start += 2
            elif data[body_start : body_start + 1] == b"\n":
                body_start += 1
            length = value.get("Length") if isinstance(value, dict) else None
            if isinstance(length, int):
                body_end = body_start + length
                # trust /Length only if endstream actually follows
                if data[body_end : body_end + 20].lstrip(b"\r\n \t").startswith(b"endstream"):
                    stream = data[body_start:body_end]
            if stream is None:
                e = data.find(b"endstream", body_start)
                if e < 0:
                    continue
                stream = data[body_start:e].rstrip(b"\r\n")
            # the SKIP span for trailer scanning is capped at the first
            # 'endstream' token: a bogus /Length pointing past the real
            # trailer to a planted endstream must not swallow it (a scan
            # over the stream tail is the lesser risk)
            first_end = data.find(b"endstream", body_start)
            span_end = body_start + len(stream)
            if 0 <= first_end < span_end:
                span_end = first_end
            spans.append((body_start, span_end))
        objects[num] = (value, stream)
    if not objects:
        raise PdfParseError("no objects found")
    return objects, spans


_TRAILER_RE = re.compile(rb"trailer\b")


def _scan_trailers(data: bytes, skip_spans: list[tuple[int, int]]) -> list[dict]:
    """Every ``trailer << … >>`` dictionary in the file (one per
    incremental update), in file order — matches INSIDE stream bodies are
    skipped, so a content stream that happens to contain the text
    'trailer << /Encrypt … >>' cannot mark a readable file encrypted or
    hijack /Info."""
    out = []
    for m in _TRAILER_RE.finditer(data):
        if any(a <= m.start() < b for a, b in skip_spans):
            continue
        lex = _Lexer(data, m.end())
        try:
            v = lex.parse_value()
        except PdfParseError:
            continue
        if isinstance(v, dict):
            out.append(v)
    return out


class _Doc:
    def __init__(self, data: bytes):
        self.objects, stream_spans = _scan_objects(data)
        self._expand_object_streams()
        # trailer dicts (classic) + xref-stream dicts (PDF 1.5+) carry
        # /Root, /Info and /Encrypt
        self.trailers = _scan_trailers(data, stream_spans) + [
            v for v, _s in self.objects.values()
            if isinstance(v, dict) and v.get("Type") == "XRef"
        ]

    def is_encrypted(self) -> bool:
        return any("Encrypt" in t for t in self.trailers)

    def info_dict(self) -> dict | None:
        """The /Info dictionary named by the newest trailer that has one."""
        for t in reversed(self.trailers):
            info = self.resolve(t.get("Info"))
            if isinstance(info, dict):
                return info
        return None

    def _expand_object_streams(self) -> None:
        """PDF 1.5+ compressed object streams (/Type /ObjStm): page dicts and
        friends often live INSIDE a FlateDecoded stream of serialized
        objects. Header = ``/N`` pairs of "objnum offset" ints in the first
        ``/First`` bytes; objects follow back-to-back. Embedded objects never
        override a directly-scanned one (direct definitions are newer in
        incremental updates)."""
        for num in list(self.objects):
            value, stream = self.objects[num]
            if not (isinstance(value, dict) and value.get("Type") == "ObjStm" and stream):
                continue
            try:
                body = _decode_stream(self, value, stream)
                n = int(self.resolve(value.get("N")) or 0)
                first = int(self.resolve(value.get("First")) or 0)
                header = body[:first].split()
                for i in range(n):
                    onum = int(header[2 * i])
                    off = int(header[2 * i + 1])
                    if onum in self.objects:
                        continue
                    lex = _Lexer(body, first + off)
                    self.objects[onum] = (lex.parse_value(), None)
            except (PdfParseError, ValueError, IndexError, zlib.error):
                continue  # tolerant: a broken ObjStm degrades, never raises

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


def _decode_stream(doc: _Doc, sdict: dict, raw: bytes) -> bytes:
    filt = doc.resolve(sdict.get("Filter"))
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    out = raw
    for f in filters:
        f = doc.resolve(f)
        if f == "FlateDecode":
            out = zlib.decompress(out)
        else:
            raise PdfParseError(f"unsupported filter {f}")
    return out


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


def _page_fonts(doc: "_Doc", page: dict) -> dict[str, tuple[bool, dict | None]]:
    """font resource name → (is_two_byte, ToUnicode cmap or None), from the
    page's (possibly inherited) /Resources /Font dictionary."""
    res = doc.inherited(page, "Resources")
    fonts = doc.resolve(res.get("Font")) if isinstance(res, dict) else None
    out: dict[str, tuple[bool, dict | None]] = {}
    if not isinstance(fonts, dict):
        return out
    for name, ref in fonts.items():
        fobj = doc.resolve(ref)
        if not isinstance(fobj, dict):
            continue
        two_byte = fobj.get("Subtype") == "Type0"
        cmap = None
        if fobj.get("ToUnicode") is not None:
            stream = doc.stream_of(fobj["ToUnicode"])
            if stream:
                try:
                    cmap = parse_tounicode_cmap(stream) or None
                except Exception:
                    cmap = None
        out[str(name)] = (two_byte, cmap)
    return out


def _decode_with_font(raw: bytes, font: tuple[bool, dict | None] | None) -> str:
    if font is None:
        return _decode_text(raw)
    two_byte, cmap = font
    if cmap is None:
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
    if doc.is_encrypted():
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
    if info:
        pages[0]["doc_info"] = info
    return pages
