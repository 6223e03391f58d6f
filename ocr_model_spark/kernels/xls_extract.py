"""Legacy Excel 97 ``.xls`` (BIFF8) text extraction — pure stdlib.

Companion to :mod:`ocr_model_spark.kernels.ole_extract` (which owns the
CFB container): this module reads the ``Workbook`` stream's BIFF8 record
chain and renders worksheets in the engine's rows-of-cells layout —
identical region shape to :func:`ooxml_extract.extract_xlsx` (a heading
region per sheet, a ``table_row`` region per non-empty row, cells joined
with ``" | "``), so downstream operators see one spreadsheet geometry
regardless of container era. Reference scope: the reference routes
unknown binaries to its TEXT fallback (``worker/document_processor.py:
388-391``) which renders .xls as mojibake; a real crawl carries more
legacy Office than OOXML (VERDICT r5 item 4's follow-on).

Covered records: SST (+CONTINUE-spanning strings, re-emitted option-flags
byte per [MS-XLS] 2.5.293), LABELSST, LABEL, NUMBER, RK/MULRK, BOOLERR,
FORMULA cached results (numeric / string-via-STRING / bool / error /
blank), BOUNDSHEET, DATEMODE, XF + FORMAT for date-styled serials
(rendered ISO through the shared ``_serial_to_iso``, same epochs and
heuristic as the xlsx kernel). Encrypted workbooks (FILEPASS) and
structurally unreadable chains fail typed, never garbled.

A deterministic spec-following writer (:func:`build_xls`) feeds the synth
corpus and the tests — ``split_sst=True`` forces a CONTINUE boundary
mid-string to exercise the reader's continuation path.
"""

from __future__ import annotations

import math
import struct

from ocr_model_spark.kernels.ole_extract import CfbError

# record opcodes
_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
# records [MS-XLS] allows between a string-result FORMULA and its STRING
_FORMULA_COMPANIONS = frozenset((0x04BC, 0x0221, 0x0236))  # SHRFMLA/ARRAY/TABLE
_BOUNDSHEET = 0x0085
_DATEMODE = 0x0022
_XF = 0x00E0
_FORMAT = 0x041E
_FILEPASS = 0x002F

_ERR_NAMES = {
    0x00: "#NULL!",
    0x07: "#DIV/0!",
    0x0F: "#VALUE!",
    0x17: "#REF!",
    0x1D: "#NAME?",
    0x24: "#NUM!",
    0x2A: "#N/A",
}


def _records(data: bytes):
    """Yield (opcode, payload, offset) over a BIFF record chain; tolerate a
    truncated tail (crawl reality) by stopping at it."""
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", data, pos)
        if pos + 4 + ln > n:
            return
        yield op, data[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln


class _SstCursor:
    """Cursor over the SST payload + its CONTINUE payloads. Raw reads
    (counts, formatting runs, ExtRst) flow across segment boundaries
    unchanged; CHARACTER reads crossing a boundary consume the re-emitted
    option-flags byte first ([MS-XLS] 2.5.293 ContinuedString)."""

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.i = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.segs[self.i]) - self.off

    def _advance_if_exhausted(self) -> bool:
        """Move to the next segment when the current one is drained.
        Returns True when a boundary was crossed."""
        crossed = False
        while self.i < len(self.segs) and self._avail() == 0:
            self.i += 1
            self.off = 0
            crossed = True
        if self.i >= len(self.segs):
            raise CfbError("xls-sst-truncated")
        return crossed

    def read_raw(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance_if_exhausted()
            take = min(n, self._avail())
            out += self.segs[self.i][self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_u8(self) -> int:
        return self.read_raw(1)[0]

    def read_u16(self) -> int:
        return struct.unpack("<H", self.read_raw(2))[0]

    def read_u32(self) -> int:
        return struct.unpack("<I", self.read_raw(4))[0]

    def read_chars(self, cch: int, high: bool) -> str:
        parts: list[str] = []
        while cch > 0:
            if self._advance_if_exhausted():
                # continuation of an in-progress string: fresh flags byte
                high = bool(self.read_u8() & 0x01)
            unit = 2 if high else 1
            take = min(cch, self._avail() // unit)
            if take == 0:
                # a 2-byte char split across the boundary — writers must
                # not do this ([MS-XLS] 2.5.293); fail typed
                raise CfbError("xls-sst-split-char")
            raw = self.read_raw(take * unit)
            parts.append(raw.decode("utf-16-le" if high else "latin-1", "replace"))
            cch -= take
        return "".join(parts)


def _parse_sst(segments: list[bytes]) -> list[str]:
    cur = _SstCursor(segments)
    cur.read_u32()  # cstTotal
    n_unique = cur.read_u32()
    if n_unique > 0x0FFFFF:
        raise CfbError("xls-sst-count")
    out: list[str] = []
    for _ in range(n_unique):
        cch = cur.read_u16()
        flags = cur.read_u8()
        high = bool(flags & 0x01)
        n_runs = cur.read_u16() if flags & 0x08 else 0
        cb_ext = cur.read_u32() if flags & 0x04 else 0
        out.append(cur.read_chars(cch, high))
        if n_runs:
            cur.read_raw(4 * n_runs)
        if cb_ext:
            cur.read_raw(cb_ext)
    return out


def _xl_string(payload: bytes, off: int) -> str:
    """Single-record XLUnicodeString (LABEL / STRING / FORMAT bodies)."""
    if off + 3 > len(payload):
        return ""
    (cch,) = struct.unpack_from("<H", payload, off)
    flags = payload[off + 2]
    pos = off + 3
    if flags & 0x08:
        pos += 2
    if flags & 0x04:
        pos += 4
    if flags & 0x01:
        return payload[pos : pos + 2 * cch].decode("utf-16-le", "replace")
    return payload[pos : pos + cch].decode("latin-1", "replace")


def _rk_value(rk: int) -> float:
    f_x100 = rk & 0x01
    f_int = rk & 0x02
    if f_int:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend the 30-bit int
            v -= 0x40000000
        val = float(v)
    else:
        (val,) = struct.unpack("<d", struct.pack("<I", 0) + struct.pack("<I", rk & 0xFFFFFFFC))
    return val / 100.0 if f_x100 else val


def _fmt_num(x: float) -> str:
    """Deterministic numeric rendering matching the xlsx kernel's raw
    ``<v>`` strings for the common cases: integral → no decimal point.
    TOTAL: NaN/±Inf bit patterns occur in crawl-corrupted NUMBER/RK/
    FORMULA payloads — ``int(nan)`` raises, so gate first (review
    finding r6)."""
    if not math.isfinite(x):
        return repr(x)  # 'nan' / 'inf' / '-inf'
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)


def _date_ifmts(formats: dict[int, str]) -> frozenset[int]:
    """ifmt ids that render as dates: builtin date ids plus custom FORMAT
    codes passing the same literal-stripped y/m/d/h/s heuristic as xlsx."""
    import re

    from ocr_model_spark.kernels.ooxml_extract import (
        _DATE_NUMFMT_IDS,
        _FMT_LITERAL_RE,
    )

    out = set(_DATE_NUMFMT_IDS)
    for ifmt, code in formats.items():
        if re.search(r"[dmhysDMHYS]", _FMT_LITERAL_RE.sub("", code)):
            out.add(ifmt)
        else:
            out.discard(ifmt)  # custom override of a builtin id wins
    return frozenset(out)


def extract_xls_stream(book: bytes) -> dict:
    """Workbook stream → the engine's shared kernel result dict."""
    from ocr_model_spark.kernels.ooxml_extract import (
        _assemble,
        _fail,
        _norm,
        _serial_to_iso,
    )

    recs = list(_records(book))
    if not recs or recs[0][0] != _BOF:
        return _fail("xls-parse-failed", "no-bof")
    # BIFF5/7 shares the BOF opcode but has no Unicode-flags byte in its
    # strings — parsing it with BIFF8 layouts produces ok=True mojibake
    # (review finding r6). The BOF vers field decides: 0x0600 = BIFF8;
    # anything else (0x0500 BIFF5, pre-BIFF5 streams behind a 'Book'
    # directory entry) fails typed, honoring "never garbled".
    if len(recs[0][1]) < 2 or struct.unpack_from("<H", recs[0][1], 0)[0] != 0x0600:
        return _fail("xls-biff-unsupported", "pre-biff8")
    # ---- globals substream
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []  # (name, lbPlyPos)
    date1904 = False
    xf_ifmts: list[int] = []
    formats: dict[int, str] = {}
    i = 0
    while i < len(recs):
        op, payload, _off = recs[i]
        if op == _EOF:
            break
        if op == _FILEPASS:
            return _fail("xls-encrypted", "filepass")
        if op == _SST:
            segs = [payload]
            j = i + 1
            while j < len(recs) and recs[j][0] == _CONTINUE:
                segs.append(recs[j][1])
                j += 1
            try:
                sst = _parse_sst(segs)
            except CfbError as exc:
                return _fail("xls-parse-failed", str(exc))
            i = j
            continue
        if op == _BOUNDSHEET and len(payload) >= 8:
            (pos,) = struct.unpack_from("<I", payload, 0)
            dt = payload[5]
            cch = payload[6]
            flags = payload[7]
            if flags & 0x01:
                name = payload[8 : 8 + 2 * cch].decode("utf-16-le", "replace")
            else:
                name = payload[8 : 8 + cch].decode("latin-1", "replace")
            if dt == 0x00:  # worksheet (chart/VB substreams skipped)
                sheets.append((name, pos))
        elif op == _DATEMODE and len(payload) >= 2:
            date1904 = struct.unpack_from("<H", payload, 0)[0] == 1
        elif op == _XF and len(payload) >= 4:
            xf_ifmts.append(struct.unpack_from("<H", payload, 2)[0])
        elif op == _FORMAT and len(payload) >= 3:
            (ifmt,) = struct.unpack_from("<H", payload, 0)
            formats[ifmt] = _xl_string(payload, 2)
        i += 1
    if not sheets:
        return _fail("xls-parse-failed", "no-sheets")
    date_fmts = _date_ifmts(formats)

    def cell_is_date(ixfe: int) -> bool:
        return 0 <= ixfe < len(xf_ifmts) and xf_ifmts[ixfe] in date_fmts

    def num_text(x: float, ixfe: int) -> str:
        if cell_is_date(ixfe):
            try:
                iso = _serial_to_iso(x, date1904)
            except (ValueError, OverflowError):  # Inf serials overflow
                iso = None
            if iso is not None:
                return iso
        return _fmt_num(x)

    # ---- worksheet substreams
    raw: list[dict] = []
    n_rows = 0
    for name, pos in sorted(sheets, key=lambda s: s[1]):
        raw.append({"type": "heading", "text": _norm(name) or "sheet"})
        if pos >= len(book):
            continue
        cells: dict[tuple[int, int], str] = {}
        pending_string: tuple[int, int] | None = None
        for op, payload, _off in _records(book[pos:]):
            if op == _EOF:
                break
            if op == _BOF and _off != 0:
                break  # ran into the next substream without an EOF
            if pending_string is not None:
                if op == _STRING:
                    cells[pending_string] = _xl_string(payload, 0)
                    pending_string = None
                    continue
                if op not in _FORMULA_COMPANIONS:
                    # spec-conformant files emit STRING immediately after
                    # FORMULA (or its SHRFMLA/ARRAY/TABLE companion) — a
                    # stray later STRING must not be mis-assigned to a
                    # long-stale pending cell (malformed-crawl hazard)
                    pending_string = None
            if op in (_LABELSST, _NUMBER, _RK, _BOOLERR, _FORMULA, _LABEL):
                if len(payload) < 6:
                    continue
                rw, col, ixfe = struct.unpack_from("<HHH", payload, 0)
                if op == _LABELSST and len(payload) >= 10:
                    (isst,) = struct.unpack_from("<I", payload, 6)
                    if 0 <= isst < len(sst):
                        cells[(rw, col)] = sst[isst]
                elif op == _NUMBER and len(payload) >= 14:
                    (x,) = struct.unpack_from("<d", payload, 6)
                    cells[(rw, col)] = num_text(x, ixfe)
                elif op == _RK and len(payload) >= 10:
                    (rk,) = struct.unpack_from("<I", payload, 6)
                    cells[(rw, col)] = num_text(_rk_value(rk), ixfe)
                elif op == _BOOLERR and len(payload) >= 8:
                    val, f_err = payload[6], payload[7]
                    cells[(rw, col)] = (
                        _ERR_NAMES.get(val, "#ERR")
                        if f_err
                        else ("TRUE" if val else "FALSE")
                    )
                elif op == _FORMULA and len(payload) >= 14:
                    num = payload[6:14]
                    if num[6:8] == b"\xff\xff":
                        kind = num[0]
                        if kind == 0:  # string result: next STRING record
                            pending_string = (rw, col)
                        elif kind == 1:
                            cells[(rw, col)] = "TRUE" if num[2] else "FALSE"
                        elif kind == 2:
                            cells[(rw, col)] = _ERR_NAMES.get(num[2], "#ERR")
                        # kind 3: blank cell — nothing rendered
                    else:
                        (x,) = struct.unpack("<d", num)
                        cells[(rw, col)] = num_text(x, ixfe)
                elif op == _LABEL:
                    cells[(rw, col)] = _xl_string(payload, 6)
            elif op == _MULRK and len(payload) >= 12:
                rw, col_first = struct.unpack_from("<HH", payload, 0)
                n = (len(payload) - 6) // 6
                for k in range(n):
                    ixfe, rk = struct.unpack_from("<HI", payload, 4 + 6 * k)
                    cells[(rw, col_first + k)] = num_text(_rk_value(rk), ixfe)
        by_row: dict[int, list[tuple[int, str]]] = {}
        for (rw, col), txt in cells.items():
            by_row.setdefault(rw, []).append((col, txt))
        for rw in sorted(by_row):
            row_text = " | ".join(
                _norm(t) for _c, t in sorted(by_row[rw]) if _norm(t)
            )
            if row_text:
                raw.append({"type": "table_row", "text": row_text})
                n_rows += 1
    return _assemble(
        raw,
        {"n_sheets": str(len(sheets)), "n_rows": str(n_rows), "biff": "8"},
        "xls",
    )


# ------------------------------------------------------------------ writer


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _wstr(s: str, *, cch8: bool = False) -> bytes:
    try:
        raw, high = s.encode("latin-1"), 0
    except UnicodeEncodeError:
        raw, high = s.encode("utf-16-le"), 1
    pre = struct.pack("<B", len(s)) if cch8 else struct.pack("<H", len(s))
    return pre + bytes([high]) + raw


def build_xls(
    sheets: list[tuple[str, list[list[object]]]],
    *,
    date1904: bool = False,
    split_sst: bool = False,
) -> bytes:
    """Deterministic minimal BIFF8 Workbook stream wrapped in a CFB file.

    Cell values: ``str`` → SST/LABELSST, ``int`` → RK (fInt), ``float`` →
    NUMBER, ``bool`` → BOOLERR, ``datetime.date`` → NUMBER with the date
    XF (ixfe 16, ifmt 14), ``None`` → skipped. ``split_sst`` forces the
    first SST string to span a CONTINUE boundary (re-emitted flags byte)."""
    import datetime as _dt

    from ocr_model_spark.kernels.ole_extract import build_cfb

    strings: list[str] = []
    index: dict[str, int] = {}
    n_refs = 0
    for _name, rows in sheets:
        for row in rows:
            for v in row:
                if isinstance(v, str):
                    n_refs += 1
                    if v not in index:
                        index[v] = len(strings)
                        strings.append(v)

    def sst_records() -> bytes:
        head = struct.pack("<II", n_refs, len(strings))
        if split_sst and strings and len(strings[0]) >= 4:
            s0 = strings[0]
            raw0, high0 = (
                (s0.encode("latin-1"), 0)
                if all(ord(c) < 256 for c in s0)
                else (s0.encode("utf-16-le"), 1)
            )
            unit = 2 if high0 else 1
            half = (len(s0) // 2) * unit
            first = head + struct.pack("<HB", len(s0), high0) + raw0[:half]
            cont = bytes([high0]) + raw0[half:]
            for s in strings[1:]:
                cont += _wstr(s)
            return _rec(_SST, first) + _rec(_CONTINUE, cont)
        payload = head + b"".join(_wstr(s) for s in strings)
        return _rec(_SST, payload)

    epoch = _dt.date(1904, 1, 1) if date1904 else _dt.date(1899, 12, 30)

    def cell_records(rows: list[list[object]]) -> bytes:
        out = bytearray()
        for rw, row in enumerate(rows):
            for col, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, bool):
                    out += _rec(
                        _BOOLERR,
                        struct.pack("<HHHBB", rw, col, 15, 1 if v else 0, 0),
                    )
                elif isinstance(v, str):
                    out += _rec(
                        _LABELSST, struct.pack("<HHHI", rw, col, 15, index[v])
                    )
                elif isinstance(v, int) and -(1 << 29) <= v < (1 << 29):
                    out += _rec(
                        _RK, struct.pack("<HHHI", rw, col, 15, ((v << 2) & 0xFFFFFFFC) | 0x02)
                    )
                elif isinstance(v, (int, float)):
                    out += _rec(
                        _NUMBER, struct.pack("<HHHd", rw, col, 15, float(v))
                    )
                elif isinstance(v, _dt.date):
                    serial = float((v - epoch).days)
                    out += _rec(
                        _NUMBER, struct.pack("<HHHd", rw, col, 16, serial)
                    )
        return bytes(out)

    bof_globals = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    bof_sheet = struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0)
    # 16 general XFs then one date XF (ixfe 16 → ifmt 14)
    xfs = b"".join(
        _rec(_XF, struct.pack("<HH", 0, 0) + b"\x00" * 16) for _ in range(16)
    ) + _rec(_XF, struct.pack("<HH", 0, 14) + b"\x00" * 16)

    sheet_blobs = [
        _rec(_BOF, bof_sheet) + cell_records(rows) + _rec(_EOF, b"")
        for _name, rows in sheets
    ]

    def globals_blob(positions: list[int]) -> bytes:
        out = bytearray(bof_globals)
        out += _rec(_DATEMODE, struct.pack("<H", 1 if date1904 else 0))
        out += xfs
        out += sst_records()
        for (name, _rows), pos in zip(sheets, positions):
            out += _rec(
                _BOUNDSHEET, struct.pack("<IBB", pos, 0, 0) + _wstr(name, cch8=True)
            )
        out += _rec(_EOF, b"")
        return bytes(out)

    # fixed-point: BOUNDSHEET size is position-independent, so one probe
    # with zeroed positions yields the real globals length
    glen = len(globals_blob([0] * len(sheets)))
    positions = []
    acc = glen
    for blob in sheet_blobs:
        positions.append(acc)
        acc += len(blob)
    book = globals_blob(positions) + b"".join(sheet_blobs)
    return build_cfb([("Workbook", book)])
