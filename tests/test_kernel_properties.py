"""Property-based kernel tests (hypothesis): the invariants that must hold
for ARBITRARY byte inputs, not just the synthetic corpus.

The reference has no property testing (SURVEY.md §5); these pin the
engine's hard guarantees:
  * extraction never raises — any bytes produce a well-formed result;
  * span offsets always slice the document text exactly;
  * the doc text is exactly the \\n\\n-join of region texts (HTML path);
  * determinism: same bytes → same result;
  * JVM sniff twin agreement is separately pinned on real payloads.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_model_spark.kernels.extract import extract_document
from ocr_model_spark.kernels.html_extract import extract_html

_RESULT_KEYS = {"text", "title", "encoding", "ok", "error", "metadata", "regions"}


def _check_wellformed(r: dict) -> None:
    assert _RESULT_KEYS <= set(r)
    assert isinstance(r["text"], str)
    for reg in r["regions"]:
        assert r["text"][reg["span_start"] : reg["span_end"]] == reg["text"]
        assert 0.0 <= reg["confidence"] <= 1.0
        assert reg["needs_review"] == (reg["confidence"] < 0.7)


@given(st.binary(max_size=4096))
@settings(max_examples=300, deadline=None)
def test_extract_document_total_on_arbitrary_bytes(data):
    r = extract_document(data)
    _check_wellformed(r)
    assert r == extract_document(data)  # deterministic


# markup-shaped fuzz: interleave tags, attrs, entities, and text
_tag = st.sampled_from(
    ["p", "div", "li", "ul", "h1", "a", "span", "script", "nav", "blockquote", "br", "title"]
)
_attr = st.sampled_from(["", ' class="sidebar"', ' id="main"', ' href="/x"', ' class="x y"'])
_word = st.text(alphabet="abcdefg &<>;#", min_size=0, max_size=12)
_piece = st.one_of(
    st.builds(lambda t, a: f"<{t}{a}>", _tag, _attr),
    st.builds(lambda t: f"</{t}>", _tag),
    _word,
    st.sampled_from(["<!-- c -->", "<!doctype html>", "&amp;", "&#65;", "<![CDATA[x]]>"]),
)


@given(st.lists(_piece, max_size=60))
@settings(max_examples=300, deadline=None)
def test_extract_html_invariants_on_markup_fuzz(pieces):
    payload = ("<html><body>" + "".join(pieces) + "</body></html>").encode("utf-8")
    r = extract_html(payload)
    assert r["ok"]
    _check_wellformed(r)
    # document text is exactly the join of region texts
    assert "\n\n".join(reg["text"] for reg in r["regions"]) == r["text"]
    # region indexes are dense and ordered
    assert [reg["idx"] for reg in r["regions"]] == list(range(len(r["regions"])))
