"""Legacy binary Office (.doc / CFB) kernel tests.

The reader follows [MS-CFB] + [MS-DOC]; the writer (build_doc/build_cfb)
is the deterministic fixture generator the synth corpus uses. Reference
behavior contrast: the reference routes these to its TEXT fallback
(worker/document_processor.py:388-391) and produces mojibake; this
kernel reads the real piece table.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_model_spark.kernels.extract import extract_document
from ocr_model_spark.kernels.ole_extract import (
    CfbError,
    CfbFile,
    build_cfb,
    build_doc,
    extract_doc_text,
    extract_ole,
)
from ocr_model_spark.kernels.sniff import sniff_doc_type


def test_build_doc_round_trip_paragraphs():
    paras = ["Hello world paragraph one.", "Second paragraph — en dash."]
    blob = build_doc(paras)
    assert sniff_doc_type(blob) == "doc"
    out = extract_document(blob)
    assert out["ok"] is True and out["doc_type"] == "doc"
    assert [r["text"] for r in out["regions"]] == paras
    # span offsets contiguous over the assembled text
    assert out["regions"][0]["span_start"] == 0
    assert out["text"]


def test_utf16_piece_preserves_non_cp1252():
    paras = ["Unicode → Δ κόσμε."]
    out = extract_document(build_doc(paras))
    assert out["ok"] and [r["text"] for r in out["regions"]] == paras


def test_split_piece_table_multi_decode():
    """Two-piece Clx: cp1252-compressed first piece + UTF-16LE second,
    CP accounting across the boundary."""
    paras = ["First paragraph here.", "Second one.", "Third closes."]
    blob = build_doc(paras, split_pieces=True)
    out = extract_document(blob)
    assert out["ok"], out["error"]
    assert [r["text"] for r in out["regions"]] == paras
    # the piece table really had two pieces
    assert out["metadata"]["n_pieces"] == "2"


def test_word95_contiguous_fallback():
    """lcbClx == 0: text is the contiguous cp1252 run at fcMin..fcMac."""
    text = "Plain Word six text.\rSecond para.\r"
    word = bytearray(1024)
    struct.pack_into("<H", word, 0, 0xA5EC)
    struct.pack_into("<H", word, 2, 0x0065)  # nFib: Word 95
    struct.pack_into("<I", word, 76, len(text))  # ccpText
    struct.pack_into("<I", word, 24, 1024)  # fcMin
    struct.pack_into("<I", word, 28, 1024 + len(text))  # fcMac
    word.extend(text.encode("cp1252"))
    blob = build_cfb([("WordDocument", bytes(word))])
    out = extract_ole(blob)
    assert out["ok"], out["error"]
    assert [r["text"] for r in out["regions"]] == [
        "Plain Word six text.",
        "Second para.",
    ]
    assert out["metadata"]["n_pieces"] == "0"


def test_encrypted_doc_fails_typed():
    blob = bytearray(build_doc(["secret"]))
    # locate the WordDocument stream: FIB ident is at its offset 0
    fib_at = blob.find(struct.pack("<H", 0xA5EC))
    assert fib_at > 0
    struct.pack_into("<H", blob, fib_at + 0x0A, 0x0100)  # fEncrypted
    out = extract_ole(bytes(blob))
    assert out["ok"] is False and out["error"] == "doc-encrypted"
    assert out["doc_type"] == "doc"


def test_non_office_cfb_is_typed_unsupported():
    """A CFB whose children match none of the doc/xls/ppt stream markers
    (e.g. an Outlook .msg) stays a typed 'ole' failure."""
    blob = build_cfb([("__substg1.0_0037001F", b"subject text here" * 8)])
    assert sniff_doc_type(blob) == "ole"
    out = extract_ole(blob)
    assert out["ok"] is False and out["error"] == "ole-unsupported"
    assert out["doc_type"] == "ole"


def test_structural_garbage_fails_typed_never_raises():
    junk = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + bytes(range(256)) * 4
    out = extract_ole(junk)
    assert out["ok"] is False and out["error"].startswith("cfb-")
    short = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
    assert extract_ole(short)["error"] == "cfb-bad-magic"  # < 512 bytes


def test_control_char_translation():
    """Cell marks / hard breaks split paragraphs; field anchors vanish;
    optional hyphen drops, non-breaking hyphen renders as '-'."""
    text = "alpha\x07beta\x0bgamma\x1fdel\x1eta\x13field\x14inner\x15end"
    word = bytearray(1024)
    struct.pack_into("<H", word, 0, 0xA5EC)
    struct.pack_into("<I", word, 76, len(text))
    struct.pack_into("<I", word, 24, 1024)
    struct.pack_into("<I", word, 28, 1024 + len(text))
    word.extend(text.encode("cp1252"))
    out = extract_ole(build_cfb([("WordDocument", bytes(word))]))
    assert [r["text"] for r in out["regions"]] == [
        "alpha",
        "beta",
        "gammadel-tafieldinnerend",
    ]


def test_cfb_reader_mini_and_regular_streams():
    """build_doc puts WordDocument (>=4096 B) on the FAT path and 0Table
    (small) in the root mini stream — read back both by name."""
    blob = build_doc(["mini/fat split check."])
    cfb = CfbFile(blob)
    names = set(cfb.stream_names())
    assert {"WordDocument", "0Table"} <= names
    word = cfb.read_stream("WordDocument")
    assert word is not None and len(word) >= 4096
    table = cfb.read_stream("0Table")
    assert table is not None and table[0] == 0x02  # Pcdt clxt
    assert cfb.read_stream("NoSuchStream") is None


def test_big_table_stream_goes_regular_fat():
    """A >=4096-byte stream chains through the FAT, not the mini stream."""
    payload = bytes((i * 13) % 256 for i in range(5000))
    blob = build_cfb([("Big", payload), ("Small", b"tiny")])
    cfb = CfbFile(blob)
    assert cfb.read_stream("Big") == payload
    assert cfb.read_stream("Small") == b"tiny"


def test_missing_table_stream_fails_typed():
    blob = build_doc(["text needing a table stream."])
    cfb = CfbFile(blob)
    word = cfb.read_stream("WordDocument")
    with pytest.raises(CfbError, match="doc-missing-table-stream"):
        extract_doc_text(word, None)


def test_build_doc_byte_identity():
    paras = ["Deterministic bytes.", "Always identical."]
    assert build_doc(paras) == build_doc(paras)
    assert build_doc(paras, split_pieces=True) == build_doc(
        paras, split_pieces=True
    )


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_extract_ole_total_on_cfb_prefixed_fuzz(tail):
    """extract_ole never raises: typed error dict or a successful extract,
    for any bytes behind the CFB magic."""
    out = extract_ole(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + tail)
    assert isinstance(out, dict) and "error" in out and "ok" in out


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
            min_size=1,
            max_size=80,
        ).map(lambda s: " ".join(s.split()) or "x"),
        min_size=1,
        max_size=5,
    ),
    st.booleans(),
)
def test_build_doc_round_trip_property(paras, split):
    """Any space-normalized Latin-ish paragraphs survive the writer→reader
    round trip byte-exactly (modulo the forced-cp1252 first piece in
    split mode, which is lossy by design for non-cp1252 chars)."""
    blob = build_doc(paras, split_pieces=split)
    out = extract_ole(blob)
    assert out["ok"], out["error"]
    got = [r["text"] for r in out["regions"]]
    expect = [p for p in paras if p.strip()]
    if not split:
        assert got == expect
    else:
        assert len(got) == len(expect)


def test_truncated_stream_chain_fails_typed():
    """Review finding r6: a CFB whose header/FAT/directory survive a WARC
    length cap but whose stream chain is cut used to raise CfbError OUT of
    extract_ole (CfbFile() succeeds; read_stream raises past the doc-branch
    handler, and the pandas UDF has no catch-all). Now a typed failure."""
    whole = build_doc(["alpha beta gamma", "second paragraph"])
    out = extract_ole(whole[:2100])
    assert out["ok"] is False
    assert out["error"].startswith("cfb-unreadable:")
    assert out["doc_type"] == "ole"


def test_short_clx_pcdt_lcb_fails_typed():
    """Review finding r6: a Clx whose Pcdt lcb field is itself cut off
    (lcbClx in 1..4, first byte 0x02) raised raw struct.error — escaping
    even `except CfbError`. The bounds check turns it into CfbError, and
    the extract_ole wrapper catches struct.error besides."""
    from ocr_model_spark.kernels.ole_extract import _pieces_from_clx

    with pytest.raises(CfbError):
        _pieces_from_clx(b"\x02\x00\x00")
