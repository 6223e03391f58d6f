"""Legacy binary Office extraction: CFB (OLE2 compound file) + Word .doc.

Pure-stdlib, deterministic, never raises (typed error strings instead) —
the ``pdf_native.py`` playbook applied to the pre-2007 Office family.
Reference scope: the reference routes unknown binaries to its TEXT
fallback (``worker/document_processor.py:388-391``), which turns .doc
containers into mojibake; this kernel reads the real WordDocument stream
instead. A real crawl carries materially more ``.doc`` than ``.pptx``
(VERDICT r5 item 4: the bench mix's OLE docs extracted zero text).

Two layers:

* :class:`CfbFile` — the [MS-CFB] container: header, DIFAT (header +
  chained DIFAT sectors), FAT chains, directory tree, miniFAT and the
  root-entry mini stream. Enough to read any stream by name.
* :func:`extract_doc_text` — the [MS-DOC] text layer: FIB sanity +
  encryption flags, the Clx/piece table in the 0Table/1Table stream
  (``fWhichTblStm``), per-piece cp1252-vs-UTF-16LE decode
  (``FcCompressed``), and the Word-95 contiguous ``fcMin..fcMac``
  fallback when no piece table exists. Complex/encrypted files fail
  typed, never garbled.

A spec-following **writer** (:func:`build_doc`) lives here too: the synth
corpus and the test fixtures need deterministic .doc bytes, and no
public corpus ships inside this sandbox. The writer exercises both the
regular-FAT and mini-stream paths of the reader (WordDocument ≥ 4096
bytes → FAT; the small table stream → mini stream).
"""

from __future__ import annotations

import struct

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


class CfbError(ValueError):
    """Typed CFB structural failure (caught by extract_ole)."""


class CfbFile:
    """Minimal read-only [MS-CFB] compound file."""

    def __init__(self, data: bytes):
        if len(data) < 512 or not data.startswith(_CFB_MAGIC):
            raise CfbError("cfb-bad-magic")
        self.data = data
        (self._sector_shift,) = struct.unpack_from("<H", data, 30)
        (self._mini_shift,) = struct.unpack_from("<H", data, 32)
        if self._sector_shift not in (9, 12) or self._mini_shift != 6:
            raise CfbError("cfb-bad-sector-shift")
        self.sector_size = 1 << self._sector_shift
        self.mini_size = 1 << self._mini_shift
        (self._n_fat,) = struct.unpack_from("<I", data, 44)
        (self._first_dir,) = struct.unpack_from("<I", data, 48)
        (self._mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self._first_minifat,) = struct.unpack_from("<I", data, 60)
        (self._n_minifat,) = struct.unpack_from("<I", data, 64)
        (self._first_difat,) = struct.unpack_from("<I", data, 68)
        (self._n_difat,) = struct.unpack_from("<I", data, 72)
        self._fat = self._read_fat()
        self._dir = self._read_directory()
        self._minifat = self._read_minifat()
        self._mini_stream = self._read_mini_stream()

    # ----------------------------------------------------------- sectors
    def _sector(self, sid: int) -> bytes:
        off = 512 + sid * self.sector_size
        if off >= len(self.data):
            raise CfbError("cfb-sector-out-of-range")
        sec = self.data[off : off + self.sector_size]
        # a truncated trailing sector is padded, not fatal (crawl reality)
        return sec + b"\x00" * (self.sector_size - len(sec))

    def _read_fat(self) -> list[int]:
        # DIFAT: 109 entries in the header, then chained DIFAT sectors
        difat: list[int] = list(struct.unpack_from("<109I", self.data, 76))
        sid = self._first_difat
        seen = set()
        per = self.sector_size // 4 - 1
        while sid not in (ENDOFCHAIN, FREESECT) and sid < 0xFFFFFFFA:
            if sid in seen:
                raise CfbError("cfb-difat-cycle")
            seen.add(sid)
            sec = self._sector(sid)
            vals = struct.unpack_from(f"<{per + 1}I", sec, 0)
            difat.extend(vals[:per])
            sid = vals[per]
        fat: list[int] = []
        n = 0
        for fsid in difat:
            if n >= self._n_fat:
                break
            if fsid in (FREESECT, ENDOFCHAIN):
                continue
            fat.extend(
                struct.unpack_from(
                    f"<{self.sector_size // 4}I", self._sector(fsid), 0
                )
            )
            n += 1
        if not fat:
            raise CfbError("cfb-no-fat")
        return fat

    def _chain(self, start: int, fat: list[int]) -> list[int]:
        out: list[int] = []
        sid = start
        limit = len(self.data) // 64 + 16  # hard cycle bound
        while sid not in (ENDOFCHAIN, FREESECT) and sid < 0xFFFFFFFA:
            if sid >= len(fat) or len(out) > limit:
                raise CfbError("cfb-chain-out-of-range")
            out.append(sid)
            sid = fat[sid]
        return out

    def _read_stream_regular(self, start: int, size: int) -> bytes:
        parts = [self._sector(sid) for sid in self._chain(start, self._fat)]
        return b"".join(parts)[:size]

    def _read_directory(self) -> list[dict]:
        raw = self._read_stream_regular(self._first_dir, 1 << 62)
        entries = []
        for off in range(0, len(raw) - 127, 128):
            (name_len,) = struct.unpack_from("<H", raw, off + 64)
            obj_type = raw[off + 66]
            if obj_type == 0 or name_len < 2 or name_len > 64:
                continue
            name = raw[off : off + name_len - 2].decode("utf-16-le", "replace")
            (start,) = struct.unpack_from("<I", raw, off + 116)
            (size,) = struct.unpack_from("<Q", raw, off + 120)
            entries.append(
                {"name": name, "type": obj_type, "start": start, "size": size}
            )
        if not entries or entries[0]["type"] != 5:
            raise CfbError("cfb-no-root")
        return entries

    def _read_minifat(self) -> list[int]:
        if self._first_minifat in (ENDOFCHAIN, FREESECT) or self._n_minifat == 0:
            return []
        raw = self._read_stream_regular(self._first_minifat, 1 << 62)
        return list(struct.unpack_from(f"<{len(raw) // 4}I", raw, 0))

    def _read_mini_stream(self) -> bytes:
        root = self._dir[0]
        if root["size"] == 0:
            return b""
        return self._read_stream_regular(root["start"], root["size"])

    # ------------------------------------------------------------ public
    def stream_names(self) -> list[str]:
        return [e["name"] for e in self._dir[1:] if e["type"] == 2]

    def read_stream(self, name: str) -> bytes | None:
        """Stream bytes by exact name, or None when absent. Streams below
        the mini cutoff live in the root mini stream (64-byte sectors
        chained through the miniFAT); larger ones chain through the FAT."""
        for e in self._dir[1:]:
            if e["type"] == 2 and e["name"] == name:
                if e["size"] < self._mini_cutoff:
                    parts = []
                    for sid in self._chain(e["start"], self._minifat):
                        off = sid * self.mini_size
                        parts.append(self._mini_stream[off : off + self.mini_size])
                    return b"".join(parts)[: e["size"]]
                return self._read_stream_regular(e["start"], e["size"])
        return None


# ----------------------------------------------------------------- [MS-DOC]

# Word control characters → text. \r = paragraph mark, \x0b = hard line
# break, \x07 = table cell/row mark, \x0c = page/section break; \x1e/\x1f
# are the non-breaking / optional hyphens; the rest are field and object
# anchors that carry no text.
_DOC_TRANSLATE = {
    0x0D: "\n",
    0x0B: "\n",
    0x07: "\n",
    0x0C: "\n",
    0x1E: "-",
    0x1F: "",
    0x00: "",
    0x01: "",
    0x02: "",
    0x05: "",
    0x08: "",
    0x13: "",
    0x14: "",
    0x15: "",
}


def _pieces_from_clx(clx: bytes) -> list[tuple[int, int, int, bool]]:
    """Parse a Clx into [(cp_start, cp_end, byte_offset, compressed)].

    Clx = zero or more Prc (clxt=0x01, 2-byte cb, data) then one Pcdt
    (clxt=0x02, 4-byte lcb, PlcPcd). PlcPcd = (n+1) CPs then n 8-byte
    PCDs; PCD.fc bit30 = fCompressed (cp1252 at fc/2), else UTF-16LE at
    fc ([MS-DOC] 2.9.38, 2.9.177)."""
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:
        if pos + 3 > len(clx):
            raise CfbError("doc-clx-truncated")
        (cb,) = struct.unpack_from("<H", clx, pos + 1)
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise CfbError("doc-no-pcdt")
    if pos + 5 > len(clx):  # the 4-byte lcb itself is cut off
        raise CfbError("doc-clx-truncated")
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    if len(plc) < lcb or lcb < 4 or (lcb - 4) % 12 != 0:
        raise CfbError("doc-bad-plcpcd")
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out = []
    for i in range(n):
        (flags_fc,) = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * i + 2)
        compressed = bool(flags_fc & 0x40000000)
        fc = flags_fc & 0x3FFFFFFF
        byte_off = fc // 2 if compressed else fc
        out.append((cps[i], cps[i + 1], byte_off, compressed))
    return out


def extract_doc_text(word: bytes, table: bytes | None) -> tuple[str, dict]:
    """Main-document text from the WordDocument (+ table) streams.

    Returns (raw text with Word control chars intact, metadata). Raises
    CfbError with a typed message on encrypted / structurally unreadable
    files."""
    if len(word) < 0x200:
        raise CfbError("doc-fib-truncated")
    (w_ident,) = struct.unpack_from("<H", word, 0)
    if w_ident != 0xA5EC:
        raise CfbError("doc-bad-ident")
    (n_fib,) = struct.unpack_from("<H", word, 2)
    (flags,) = struct.unpack_from("<H", word, 0x0A)
    if flags & 0x0100:
        raise CfbError("doc-encrypted")
    (ccp_text,) = struct.unpack_from("<I", word, 76)
    (fc_clx,) = struct.unpack_from("<I", word, 0x1A2)
    (lcb_clx,) = struct.unpack_from("<I", word, 0x1A6)
    meta = {
        "nfib": f"0x{n_fib:04x}",
        "table_stream": "1Table" if flags & 0x0200 else "0Table",
    }
    if lcb_clx > 0:
        if table is None or fc_clx + lcb_clx > len(table):
            raise CfbError("doc-missing-table-stream")
        pieces = _pieces_from_clx(table[fc_clx : fc_clx + lcb_clx])
        meta["n_pieces"] = str(len(pieces))
        parts: list[str] = []
        remaining = ccp_text
        for cp_start, cp_end, byte_off, compressed in pieces:
            if remaining <= 0:
                break
            ccp = min(cp_end - cp_start, remaining)
            if compressed:
                raw = word[byte_off : byte_off + ccp]
                parts.append(raw.decode("cp1252", "replace"))
            else:
                raw = word[byte_off : byte_off + 2 * ccp]
                parts.append(raw.decode("utf-16-le", "replace"))
            remaining -= ccp
        return "".join(parts), meta
    # Word-95 simple path: contiguous cp1252 text at fcMin..fcMac
    (fc_min,) = struct.unpack_from("<I", word, 24)
    (fc_mac,) = struct.unpack_from("<I", word, 28)
    if fc_min >= fc_mac or fc_mac > len(word):
        raise CfbError("doc-no-text")
    meta["n_pieces"] = "0"
    text = word[fc_min:fc_mac].decode("cp1252", "replace")
    return text[:ccp_text] if ccp_text else text, meta


def extract_ole(data: bytes) -> dict:
    """CFB container dispatch by directory entry, priority matching the
    sniff markers: Word .doc (piece table), Excel .xls (BIFF8 records),
    PowerPoint .ppt (text atoms); other children (.msg/unknown) fail
    typed as ``ole-unsupported``. Shape matches every other kernel.
    TOTAL: any structural error anywhere — including stream-chain reads
    on a truncated container, which raise past the constructor — comes
    back as a typed failure dict, never an exception (the pandas UDF has
    no catch-all by design; review finding r6)."""
    from ocr_model_spark.kernels.extract import EMPTY_RESULT

    try:
        return _extract_ole_inner(data)
    except (CfbError, struct.error) as exc:
        return dict(EMPTY_RESULT, doc_type="ole", error=f"cfb-unreadable:{exc}")


def _extract_ole_inner(data: bytes) -> dict:
    from ocr_model_spark.kernels.extract import EMPTY_RESULT
    from ocr_model_spark.kernels.ooxml_extract import _assemble

    try:
        cfb = CfbFile(data)
    except CfbError as exc:
        return dict(EMPTY_RESULT, doc_type="ole", error=str(exc))
    word = cfb.read_stream("WordDocument")
    if word is None:
        book = cfb.read_stream("Workbook")
        if book is None:
            book = cfb.read_stream("Book")
        if book is not None:
            from ocr_model_spark.kernels.xls_extract import extract_xls_stream

            return extract_xls_stream(book)
        ppt = cfb.read_stream("PowerPoint Document")
        if ppt is not None:
            from ocr_model_spark.kernels.ppt_extract import extract_ppt_stream

            return extract_ppt_stream(ppt)
        return dict(EMPTY_RESULT, doc_type="ole", error="ole-unsupported")
    try:
        (flags,) = (
            struct.unpack_from("<H", word, 0x0A) if len(word) > 0x0C else (0,)
        )
        table = cfb.read_stream("1Table" if flags & 0x0200 else "0Table")
        text, meta = extract_doc_text(word, table)
    except CfbError as exc:
        return dict(EMPTY_RESULT, doc_type="doc", error=str(exc))
    cleaned = "".join(
        _DOC_TRANSLATE.get(ord(ch), ch) if ord(ch) < 0x21 else ch for ch in text
    )
    raw_regions = [
        {"type": "paragraph", "text": " ".join(p.split())}
        for p in cleaned.split("\n")
        if p.strip()
    ]
    if not raw_regions:
        return dict(EMPTY_RESULT, doc_type="doc", error="doc-no-text")
    return _assemble(raw_regions, meta, "doc")


# ------------------------------------------------------------------ writer


def _dir_entry(
    name: str, obj_type: int, start: int, size: int, child: int = FREESECT
) -> bytes:
    raw_name = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[0 : len(raw_name)] = raw_name
    struct.pack_into("<H", e, 64, len(raw_name))
    e[66] = obj_type
    e[67] = 1  # black
    struct.pack_into("<I", e, 68, FREESECT)  # left sibling
    struct.pack_into("<I", e, 72, FREESECT)  # right sibling
    struct.pack_into("<I", e, 76, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Deterministic minimal CFB writer: version 3 (512-byte sectors),
    header-DIFAT only, streams < 4096 bytes in the mini stream. Sibling
    layout is a right-linked list under the root child — valid for tree
    walkers and for this module's reader."""
    big = [(n, b) for n, b in streams if len(b) >= 4096]
    small = [(n, b) for n, b in streams if len(b) < 4096]

    # mini stream: concatenation of small streams in 64-byte minisectors
    mini_parts: list[bytes] = []
    minifat: list[int] = []
    mini_starts: dict[str, int] = {}
    msid = 0
    for name, blob in small:
        n_mini = max(1, (len(blob) + 63) // 64)
        mini_starts[name] = msid
        padded = blob + b"\x00" * (n_mini * 64 - len(blob))
        mini_parts.append(padded)
        minifat.extend(list(range(msid + 1, msid + n_mini)) + [ENDOFCHAIN])
        msid += n_mini
    mini_stream = b"".join(mini_parts)

    def sectors_of(blob: bytes) -> list[bytes]:
        n = max(1, (len(blob) + 511) // 512)
        padded = blob + b"\x00" * (n * 512 - len(blob))
        return [padded[i * 512 : (i + 1) * 512] for i in range(n)]

    # sector layout: [FAT] [dir] [minifat] [ministream...] [big streams...]
    body: list[bytes] = []
    fat: list[int] = []

    def alloc(secs: list[bytes]) -> int:
        # fat[i] describes sector i; sector 0 is the FAT itself, body[j]
        # is sector j+1, so the next free sector id is exactly len(fat)
        start = len(fat)
        body.extend(secs)
        fat.extend(list(range(start + 1, start + len(secs))) + [ENDOFCHAIN])
        return start

    fat.append(FATSECT)  # sector 0 = the single FAT sector

    minifat_blob = b"".join(struct.pack("<I", v) for v in minifat)
    dir_placeholder = [b"\x00" * 512]  # patched after starts are known
    dir_sid = alloc(dir_placeholder)
    minifat_sid = alloc(sectors_of(minifat_blob)) if minifat_blob else ENDOFCHAIN
    mini_sid = alloc(sectors_of(mini_stream)) if mini_stream else ENDOFCHAIN
    big_starts = {name: alloc(sectors_of(blob)) for name, blob in big}

    entries = [
        _dir_entry("Root Entry", 5, mini_sid, len(mini_stream), child=1)
    ]
    order = [n for n, _ in streams]
    for i, name in enumerate(order):
        blob = dict(streams)[name]
        if len(blob) >= 4096:
            start = big_starts[name]
        else:
            start = mini_starts[name]
        e = bytearray(_dir_entry(name, 2, start, len(blob)))
        if i + 1 < len(order):
            struct.pack_into("<I", e, 72, i + 2)  # right sibling
        entries.append(bytes(e))
    dir_blob = b"".join(entries)
    dir_secs = sectors_of(dir_blob)
    if len(dir_secs) != 1:
        raise CfbError("cfb-writer-too-many-entries")
    body[dir_sid - 1] = dir_secs[0]

    if len(fat) > 128:
        raise CfbError("cfb-writer-too-big")
    fat_blob = b"".join(struct.pack("<I", v) for v in fat) + b"\xff" * (
        512 - 4 * len(fat)
    )

    header = bytearray(512)
    header[0:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 3)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte minisectors
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, dir_sid)
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, minifat_sid)
    struct.pack_into("<I", header, 64, 1 if minifat_blob else 0)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    difat = [0] + [FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + fat_blob + b"".join(body)


def build_doc(paragraphs: list[str], *, split_pieces: bool = False) -> bytes:
    """Deterministic minimal Word 97 .doc: FIB + piece-table Clx in 0Table.

    ``split_pieces=True`` forces a two-piece table whose first piece is
    cp1252-compressed and second UTF-16LE — exercising both decode paths
    and multi-piece CP accounting. Otherwise one piece, cp1252 when the
    text allows it, UTF-16LE when not."""
    text = "\r".join(paragraphs) + "\r"
    word = bytearray(2048)
    struct.pack_into("<H", word, 0, 0xA5EC)
    struct.pack_into("<H", word, 2, 0x00C1)  # nFib: Word 97
    struct.pack_into("<H", word, 0x0A, 0x0000)  # not encrypted, 0Table
    struct.pack_into("<H", word, 32, 0x000E)  # csw
    struct.pack_into("<H", word, 62, 0x0016)  # cslw
    struct.pack_into("<H", word, 152, 0x005D)  # cbRgFcLcb (97)
    struct.pack_into("<I", word, 76, len(text))  # ccpText

    def enc(seg: str) -> tuple[bytes, bool]:
        try:
            return seg.encode("cp1252"), True
        except UnicodeEncodeError:
            return seg.encode("utf-16-le"), False

    pieces: list[tuple[str, bytes, bool]] = []
    if split_pieces and len(text) >= 2:
        mid = len(text) // 2
        a, _ = text[:mid], None
        raw_a = a.encode("cp1252", "replace")  # forced-compressed first piece
        pieces.append((a, raw_a, True))
        b = text[mid:]
        pieces.append((b, b.encode("utf-16-le"), False))
    else:
        raw, compressed = enc(text)
        pieces.append((text, raw, compressed))

    fc = 2048
    payload = bytearray()
    cps = [0]
    pcds = []
    cp = 0
    for seg, raw, compressed in pieces:
        cp += len(seg)
        cps.append(cp)
        stored_fc = ((fc + len(payload)) * 2) | 0x40000000 if compressed else (
            fc + len(payload)
        )
        pcds.append(struct.pack("<HIH", 0, stored_fc, 0))
        payload.extend(raw)
    plc = b"".join(struct.pack("<I", c) for c in cps) + b"".join(pcds)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", word, 0x1A2, 0)  # fcClx (offset in 0Table)
    struct.pack_into("<I", word, 0x1A6, len(clx))
    word.extend(payload)
    if len(word) < 4096:
        word.extend(b"\x00" * (4096 - len(word)))
    return build_cfb([("WordDocument", bytes(word)), ("0Table", clx)])
