"""Legacy Excel 97 (.xls / BIFF8) and PowerPoint 97 (.ppt) kernel tests.

The readers follow [MS-XLS] / [MS-PPT]; the writers (build_xls /
build_ppt) are the deterministic fixture generators the synth corpus
uses. Reference behavior contrast: the reference routes these binaries
to its TEXT fallback (worker/document_processor.py:388-391) and
produces mojibake; these kernels read the real record structures.
"""

from __future__ import annotations

import datetime as dt
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_model_spark.kernels.extract import extract_document
from ocr_model_spark.kernels.ole_extract import build_cfb, extract_ole
from ocr_model_spark.kernels.ppt_extract import build_ppt, extract_ppt_stream
from ocr_model_spark.kernels.sniff import sniff_doc_type
from ocr_model_spark.kernels.xls_extract import (
    _BOF,
    _BOOLERR,
    _BOUNDSHEET,
    _EOF,
    _FILEPASS,
    _FORMULA,
    _MULRK,
    _NUMBER,
    _STRING,
    _rec,
    _wstr,
    build_xls,
    extract_xls_stream,
)

# ---------------------------------------------------------------- xls


def test_build_xls_round_trip_all_cell_types():
    blob = build_xls(
        [
            (
                "Data",
                [
                    ["hello world", 42, 3.25, True, dt.date(2024, 1, 1)],
                    ["second row", -7, None, False, dt.date(2020, 2, 29)],
                ],
            )
        ]
    )
    assert sniff_doc_type(blob) == "xls"
    out = extract_document(blob)
    assert out["ok"] is True and out["doc_type"] == "xls"
    texts = [r["text"] for r in out["regions"]]
    assert texts == [
        "Data",
        "hello world | 42 | 3.25 | TRUE | 2024-01-01",
        "second row | -7 | FALSE | 2020-02-29",
    ]
    assert out["metadata"]["n_sheets"] == "1"
    assert out["metadata"]["n_rows"] == "2"
    # title is the first heading (sheet name), like the xlsx kernel
    assert out["title"] == "Data"


def test_xls_sst_continue_split_both_encodings():
    """A string spanning the SST→CONTINUE boundary re-reads through the
    re-emitted option-flags byte — in the 8-bit and the UTF-16LE form."""
    latin = build_xls([("S", [["a long continued string here", 1]])], split_sst=True)
    out = extract_ole(latin)
    assert out["ok"] and out["regions"][1]["text"] == "a long continued string here | 1"
    wide = build_xls([("S", [["Ωmega continued string Δelta", 2]])], split_sst=True)
    out = extract_ole(wide)
    assert out["ok"] and out["regions"][1]["text"] == "Ωmega continued string Δelta | 2"


def test_xls_1904_epoch_dates():
    out = extract_ole(build_xls([("S", [["d", dt.date(2021, 5, 4)]])], date1904=True))
    assert out["ok"] and out["regions"][1]["text"] == "d | 2021-05-04"


def test_xls_multi_sheet_order_follows_stream_position():
    out = extract_ole(
        build_xls([("First", [["aa", 1]]), ("Second", [["bb", 2]])])
    )
    assert out["ok"]
    texts = [r["text"] for r in out["regions"]]
    assert texts == ["First", "aa | 1", "Second", "bb | 2"]
    assert out["metadata"]["n_sheets"] == "2"


def _hand_built_sheet(cell_records: bytes) -> bytes:
    """Wrap hand-crafted cell records in a minimal globals+sheet stream."""
    bof_g = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    bof_s = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    sheet = bof_s + cell_records + _rec(_EOF, b"")

    def globals_blob(pos: int) -> bytes:
        bs = _rec(_BOUNDSHEET, struct.pack("<IBB", pos, 0, 0) + _wstr("S", cch8=True))
        return bof_g + bs + _rec(_EOF, b"")

    glen = len(globals_blob(0))
    return globals_blob(glen) + sheet


def test_xls_formula_cached_results_and_mulrk():
    """FORMULA cached results (numeric, string-via-STRING, bool, error,
    blank) and a MULRK run all render; formula expressions never exist in
    BIFF cached form, so nothing can leak."""
    cells = bytearray()
    # numeric cached result 12.5 (plain 8-byte double, tail != FFFF)
    cells += _rec(_FORMULA, struct.pack("<HHH", 0, 0, 15) + struct.pack("<d", 12.5))
    # string cached result: kind 0 + FFFF tail, value in the next STRING
    cells += _rec(
        _FORMULA,
        struct.pack("<HHH", 0, 1, 15) + b"\x00\x00\x00\x00\x00\x00\xff\xff",
    )
    cells += _rec(_STRING, _wstr("net total"))
    # bool cached result TRUE
    cells += _rec(
        _FORMULA,
        struct.pack("<HHH", 0, 2, 15) + b"\x01\x00\x01\x00\x00\x00\xff\xff",
    )
    # error cached result #DIV/0!
    cells += _rec(
        _FORMULA,
        struct.pack("<HHH", 0, 3, 15) + b"\x02\x00\x07\x00\x00\x00\xff\xff",
    )
    # blank cached result renders nothing
    cells += _rec(
        _FORMULA,
        struct.pack("<HHH", 0, 4, 15) + b"\x03\x00\x00\x00\x00\x00\xff\xff",
    )
    # MULRK: three RK ints 7,8,9 in row 1 cols 0..2
    mulrk = struct.pack("<HH", 1, 0)
    for v in (7, 8, 9):
        mulrk += struct.pack("<HI", 15, ((v << 2) & 0xFFFFFFFC) | 0x02)
    mulrk += struct.pack("<H", 2)
    cells += _rec(_MULRK, bytes(mulrk))
    out = extract_xls_stream(_hand_built_sheet(bytes(cells)))
    assert out["ok"], out["error"]
    texts = [r["text"] for r in out["regions"]]
    assert texts == ["S", "12.5 | net total | TRUE | #DIV/0!", "7 | 8 | 9"]


def test_xls_stray_string_not_misassigned_to_stale_pending_formula():
    """Malformed stream: a string-result FORMULA whose STRING never comes,
    then unrelated cell records, then a stray late STRING. The stale
    pending cell must NOT swallow the stray value — spec-conformant files
    emit STRING immediately after FORMULA (or a SHRFMLA/ARRAY/TABLE
    companion), so any intervening cell record clears the pending slot."""
    cells = bytearray()
    # string-result FORMULA at (0,0) — its STRING is missing
    cells += _rec(
        _FORMULA,
        struct.pack("<HHH", 0, 0, 15) + b"\x00\x00\x00\x00\x00\x00\xff\xff",
    )
    # unrelated NUMBER at (0,1) — clears the pending slot
    cells += _rec(_NUMBER, struct.pack("<HHH", 0, 1, 15) + struct.pack("<d", 3.0))
    # stray STRING: must be ignored, not assigned to (0,0)
    cells += _rec(_STRING, _wstr("stray"))
    out = extract_xls_stream(_hand_built_sheet(bytes(cells)))
    assert out["ok"], out["error"]
    texts = [r["text"] for r in out["regions"]]
    assert texts == ["S", "3"]
    assert all("stray" not in t for t in texts)


def test_xls_encrypted_fails_typed():
    blob = bytearray(build_xls([("S", [["secret", 1]])]))
    # splice a FILEPASS record right after the globals BOF (op 0x002F)
    bof_len = 4 + 16
    fib_at = blob.find(b"\x09\x08")  # first BOF in the Workbook stream
    assert fib_at > 0
    filepass = _rec(_FILEPASS, struct.pack("<HHH", 1, 1, 1))
    spliced = bytes(blob[: fib_at + bof_len]) + filepass + bytes(blob[fib_at + bof_len :])
    # the CFB wrapper's sizes no longer match — go through the raw stream
    out = extract_xls_stream(spliced[fib_at:])
    assert out["ok"] is False and out["error"] == "xls-encrypted:filepass"
    assert out["doc_type"] == "xls"


def test_xls_garbage_and_truncation_fail_or_degrade_typed():
    # no BOF at all
    out = extract_xls_stream(b"\x00" * 64)
    assert out["ok"] is False and out["error"].startswith("xls-parse-failed")
    # CFB carrying a Workbook stream of junk: typed failure end to end
    blob = build_cfb([("Workbook", b"\xff" * 256)])
    assert sniff_doc_type(blob) == "xls"
    out = extract_ole(blob)
    assert out["ok"] is False and out["doc_type"] == "xls"
    # truncated record tail after a complete first sheet row: reader stops
    whole = build_xls([("S", [["kept row", 1]])])
    out = extract_ole(whole[: len(whole) - 1] + b"")  # CFB pads sectors, still readable
    assert isinstance(out, dict)


def test_build_xls_byte_identity():
    sheets = [("Data", [["same bytes", 5, 1.25, False, dt.date(2023, 6, 1)]])]
    assert build_xls(sheets) == build_xls(sheets)
    assert build_xls(sheets, split_sst=True) == build_xls(sheets, split_sst=True)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.one_of(
                st.text(
                    st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
                    min_size=1,
                    max_size=40,
                ).map(lambda s: " ".join(s.split()) or "x"),
                st.integers(min_value=-(1 << 28), max_value=(1 << 28)),
                st.booleans(),
                st.none(),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    ),
    st.booleans(),
)
def test_build_xls_round_trip_property(rows, split):
    """Any rows of strings/ints/bools survive writer→reader; cell text
    round-trips exactly after the kernel's space-normalization."""
    blob = build_xls([("P", rows)], split_sst=split)
    out = extract_ole(blob)
    assert out["ok"], out["error"]
    got = [r["text"] for r in out["regions"] if r["type"] == "table_row"]
    expect = []
    for row in rows:
        cells = []
        for v in row:
            if v is None:
                continue
            if isinstance(v, bool):
                cells.append("TRUE" if v else "FALSE")
            elif isinstance(v, int):
                cells.append(str(v))
            else:
                norm = " ".join(v.split())
                if norm:
                    cells.append(norm)
        if cells:
            expect.append(" | ".join(cells))
    assert got == expect


# ---------------------------------------------------------------- ppt


def test_build_ppt_round_trip_atoms_and_paragraphs():
    blob = build_ppt(["Title slide", "Body text\rsecond para", "unicode — Σ"])
    assert sniff_doc_type(blob) == "ppt"
    out = extract_document(blob)
    assert out["ok"] is True and out["doc_type"] == "ppt"
    assert [r["text"] for r in out["regions"]] == [
        "Title slide",
        "Body text",
        "second para",
        "unicode — Σ",
    ]
    assert out["metadata"]["n_text_atoms"] == "3"


def test_ppt_nested_containers_walk_in_stream_order():
    """Text atoms inside nested containers (the real layout: Document →
    SlideListWithText → TextCharsAtom) surface in stream order."""
    inner = struct.pack("<HHI", 0x0000, 0x0FA8, 5) + b"inner"
    mid = struct.pack("<HHI", 0x000F, 0x0FF0, len(inner)) + inner
    tail = struct.pack("<HHI", 0x0000, 0x0FA8, 4) + b"tail"
    doc = struct.pack("<HHI", 0x000F, 0x03E8, len(mid) + len(tail)) + mid + tail
    out = extract_ppt_stream(doc)
    assert out["ok"]
    assert [r["text"] for r in out["regions"]] == ["inner", "tail"]


def test_ppt_no_text_and_garbage_fail_typed():
    out = extract_ppt_stream(b"\x00" * 4)
    assert out["ok"] is False and out["error"] == "ppt-parse-failed:too-short"
    # structurally valid container with no text atoms
    doc = struct.pack("<HHI", 0x000F, 0x03E8, 0)
    out = extract_ppt_stream(doc)
    assert out["ok"] is False and out["error"] == "ppt-no-text:no-text-atoms"
    assert out["doc_type"] == "ppt"
    # CFB-wrapped junk PowerPoint Document stream: typed through dispatch
    blob = build_cfb([("PowerPoint Document", b"\xff" * 64)])
    assert sniff_doc_type(blob) == "ppt"
    out = extract_ole(blob)
    assert out["ok"] is False and out["doc_type"] == "ppt"


def test_ppt_truncated_atom_tolerated():
    """An atom whose declared length overruns the stream decodes the
    available bytes (crawl truncation reality), never raises."""
    atom = struct.pack("<HHI", 0x0000, 0x0FA8, 1000) + b"short"
    doc = struct.pack("<HHI", 0x000F, 0x03E8, 1000) + atom
    out = extract_ppt_stream(doc)
    assert out["ok"] and out["regions"][0]["text"] == "short"


def test_build_ppt_byte_identity():
    texts = ["same deck", "every time — Δ"]
    assert build_ppt(texts) == build_ppt(texts)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=1024))
def test_extract_ppt_stream_total_on_fuzz(data):
    out = extract_ppt_stream(data)
    assert isinstance(out, dict) and "error" in out and "ok" in out


def test_fmt_num_nonfinite_total():
    """Review finding r6: NaN/±Inf doubles (arbitrary crawl bytes in
    NUMBER/RK/FORMULA payloads) raised ValueError/OverflowError from
    int(x). Rendering must be TOTAL."""
    from ocr_model_spark.kernels.xls_extract import _fmt_num

    assert _fmt_num(float("nan")) == "nan"
    assert _fmt_num(float("inf")) == "inf"
    assert _fmt_num(float("-inf")) == "-inf"
    assert _fmt_num(3.0) == "3"


def test_xls_nan_number_cell_extracts_typed():
    """Full-path version: a NUMBER record whose 8 payload bytes decode to
    NaN must not crash the kernel (review finding r6)."""
    import math

    blob = bytearray(build_xls([("S", [["label", 1.5]])]))
    patched = bytes(blob).replace(
        struct.pack("<d", 1.5), struct.pack("<d", math.nan)
    )
    assert patched != bytes(blob)
    out = extract_ole(patched)
    assert isinstance(out, dict)
    assert "nan" in (out.get("text") or "")


def test_xls_biff5_fails_typed_not_mojibake():
    """Review finding r6: BIFF5/7 shares the 0x0809 BOF opcode but has no
    Unicode-flags byte in its strings — parsing it with BIFF8 layouts
    produced ok=True mojibake. The BOF vers field (0x0500) now gates it
    to a typed failure, honoring 'fail typed, never garbled'."""
    bof5 = _rec(_BOF, struct.pack("<HH", 0x0500, 0x0005))
    label5 = _rec(0x0204, struct.pack("<HHHH", 0, 0, 0, 5) + b"hello")
    stream = bof5 + label5 + _rec(_EOF, b"")
    out = extract_xls_stream(stream)
    assert out["ok"] is False
    assert out["error"] == "xls-biff-unsupported:pre-biff8"
    assert out["doc_type"] == "xls"
