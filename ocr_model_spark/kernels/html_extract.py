"""Deterministic HTML main-content extraction (the flagship kernel, M14).

Specified by the driver north rule ("HTML boilerplate stripping via DOM-tree
text-density/link-density heuristics, Readability/trafilatura-style scoring");
the reference routes ``.html`` into its plain-text branch
(``worker/document_processor.py:388-389,502-549``) so this kernel is new, but
it plugs into the reference's semantics framework:

  * regions carry ``{type, text, confidence, needs_review}`` like
    ``worker/types.py:92-102`` Regions,
  * region texts are whitespace-normalized and joined with ``"\\n\\n"`` into
    the document text, mirroring the reference's page join
    (``worker/document_processor.py:475-476``),
  * span offsets are char offsets into that document text (north-rule
    "span offsets", SURVEY.md W5),
  * confidence is a pure deterministic function of link density and length.

Pure function, stdlib only (``html.parser``), no wall clock, no randomness:
byte-identical output for identical input bytes, which is the per-row
invariant the driver checks.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

from ocr_model_spark.kernels.encoding import decode_with_fallback

# ---------------------------------------------------------------- DOM model

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# subtrees that never contribute content
_IGNORE_TAGS = frozenset(
    "script style noscript template svg math head iframe form button select "
    "option textarea nav header footer aside".split()
)
# class/id tokens that mark boilerplate containers (word-boundary match)
_BOILER_TOKENS = frozenset(
    "nav navbar menu footer header sidebar banner breadcrumb breadcrumbs "
    "comment comments share social ad ads advert advertisement sponsored "
    "cookie popup modal related widget promo subscribe newsletter".split()
)
_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")

_EXPLICIT_BLOCKS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li dt dd blockquote pre figcaption".split()
)
_CONTAINER_BLOCKS = frozenset("div section article main body td th caption".split())
_LIST_CONTAINERS = frozenset(("ul", "ol", "dl"))
# tags that implicitly close an open <p>/<li>
_AUTOCLOSE_TRIGGERS = _EXPLICIT_BLOCKS | _CONTAINER_BLOCKS | _LIST_CONTAINERS | {
    "table",
    "ul",
    "ol",
}

_REGION_TYPE = {
    "h1": "heading",
    "h2": "heading",
    "h3": "heading",
    "h4": "heading",
    "h5": "heading",
    "h6": "heading",
    "li": "list_item",
    "dt": "list_item",
    "dd": "list_item",
    "blockquote": "quote",
    "pre": "code",
}

# acceptance thresholds (deterministic spec — tests pin these)
_MIN_CHARS = {"heading": 3, "list_item": 10, "quote": 10, "code": 10, "paragraph": 25}
_MAX_LINK_DENSITY = {
    "heading": 0.66,
    "list_item": 0.25,
    "quote": 0.5,
    "code": 0.5,
    "paragraph": 0.5,
}
_REVIEW_THRESHOLD = 0.7  # mirrors the reference's needs_review cutoff (worker/types.py)


# shared empty-attrs dict: most elements carry no attributes, and nothing
# ever mutates node.attrs (read-only in _is_boiler) — saves one dict
# allocation per attribute-less element
_EMPTY_ATTRS: dict[str, str] = {}


class _Node:
    __slots__ = ("tag", "attrs", "children", "boiler")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs = attrs if attrs else _EMPTY_ATTRS
        self.children: list = []  # _Node | str
        self.boiler = False


def _is_boiler(attrs: dict[str, str]) -> bool:
    blob = " ".join(
        v for k, v in attrs.items() if k in ("class", "id", "role") and v
    ).lower()
    if not blob:
        return False
    return any(t in _BOILER_TOKENS for t in _TOKEN_SPLIT.split(blob) if t)


class _TreeBuilder(HTMLParser):
    """Tolerant DOM builder: never raises on malformed markup.

    Kept as the REFERENCE parser (stdlib ``html.parser`` callbacks); the hot
    path uses :func:`_fast_build`, a regex scanner feeding the exact same
    tree-building rules — a test pins the two to identical output on the
    synthetic corpus.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        _open_tag(self.stack, tag.lower(), dict(attrs))

    def handle_startendtag(self, tag, attrs):
        if tag.lower() == "br":
            self.stack[-1].children.append(" ")

    def handle_endtag(self, tag):
        _close_tag(self.stack, tag.lower())

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


_P_LIKE = frozenset(("p", "li", "dt", "dd"))


def _open_tag(stack: list, tag: str, attrs: dict[str, str]) -> None:
    if tag in _VOID_TAGS:
        if tag == "br":
            stack[-1].children.append(" ")
        return
    # implicit close of p/li when a block starts inside them
    if tag in _AUTOCLOSE_TRIGGERS:
        while len(stack) > 1 and stack[-1].tag in _P_LIKE:
            stack.pop()
    node = _Node(tag, attrs)
    node.boiler = bool(attrs) and _is_boiler(attrs)
    stack[-1].children.append(node)
    stack.append(node)


def _close_tag(stack: list, tag: str) -> None:
    if tag in _VOID_TAGS:
        return
    # pop to the matching open tag if present; ignore stray end tags
    for i in range(len(stack) - 1, 0, -1):
        if stack[i].tag == tag:
            del stack[i:]
            return


# --------------------------------------------------------- fast scanner

# one pass over the markup: tags, comments, declarations; stdlib html.parser
# spends ~85% of kernel time on per-position bookkeeping we don't need
_FAST_TAG_RE = re.compile(
    r"<(?:"
    r"!--.*?(?:-->|$)"  # comments
    r"|!\[CDATA\[.*?(?:\]\]>|$)"  # cdata
    r"|[!?][^>]*>?"  # doctype / processing instructions
    r"|(/?)([a-zA-Z][a-zA-Z0-9:_-]*)"  # 1: end-slash, 2: tag name
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"  # 3: attr blob
    r"(/?)>"  # 4: self-closing slash
    r")",
    re.S,
)
_ATTR_RE = re.compile(
    r"(class|id|role)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I
)
# only script/style: stdlib html.parser CDATA-modes exactly these two
# (title/textarea parse normally there, so rawtext-ing them here would
# diverge from the pinned _TreeBuilder output on nested tags in a title)
_RAWTEXT_CLOSE = {
    t: re.compile(f"</{t}[\\s>]", re.I) for t in ("script", "style")
}


def _fast_build(raw: str) -> _Node:
    """Regex-scan ``raw`` into the same tree :class:`_TreeBuilder` builds.

    Tolerant: unmatched ``<`` is literal text; unterminated constructs
    consume to end-of-input. Entities are unescaped in text (same as
    ``convert_charrefs=True``)."""
    root = _Node("#root")
    stack = [root]
    pos = 0
    n = len(raw)
    find = raw.find
    tag_match = _FAST_TAG_RE.match
    # `cur` mirrors stack[-1]; refreshed after every stack mutation (the
    # out-of-line _open_tag/_close_tag paths mutate the stack)
    cur = root
    cur_children = root.children
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            chunk = raw[pos:]
            if chunk:
                if chunk.isspace():
                    cur_children.append(" ")  # normalization-equivalent
                else:
                    cur_children.append(unescape(chunk) if "&" in chunk else chunk)
            break
        if lt > pos:
            chunk = raw[pos:lt]
            # whitespace-only runs collapse to a shared one-space constant
            # (identical after normalization; avoids per-chunk allocations)
            if chunk.isspace():
                cur_children.append(" ")
            else:
                cur_children.append(unescape(chunk) if "&" in chunk else chunk)
        m = tag_match(raw, lt)
        if not m:
            cur_children.append("<")
            pos = lt + 1
            continue
        pos = m.end()
        slash, tag, blob, selfclose = m.group(1, 2, 3, 4)
        if tag is None:
            continue  # comment / doctype / PI
        if not tag.islower():
            tag = tag.lower()
        if slash:  # end tag
            # inline the overwhelmingly-common immediate-match close
            if cur.tag == tag and len(stack) > 1:
                stack.pop()
            else:
                _close_tag(stack, tag)
            cur = stack[-1]
            cur_children = cur.children
            continue
        blob = blob or ""
        attrs: dict[str, str] = {}
        # case-insensitive guard (CLASS=/Id=/ROLE= are valid HTML); _ATTR_RE
        # is re.I so the guard only needs to not miss, never to be exact
        if blob and (
            (lb := blob.lower()) and ("class" in lb or "id" in lb or "role" in lb)
        ):
            for am in _ATTR_RE.finditer(blob):
                val = am.group(2) or am.group(3) or am.group(4) or ""
                attrs[am.group(1).lower()] = unescape(val) if "&" in val else val
        if selfclose:
            if tag == "br":
                cur_children.append(" ")
            continue
        # raw-text elements: consume to the matching close without tokenizing
        if tag in _RAWTEXT_CLOSE:
            _open_tag(stack, tag, attrs)
            cm = _RAWTEXT_CLOSE[tag].search(raw, pos)
            if cm is None:
                content = raw[pos:]
                pos = n
            else:
                content = raw[pos : cm.start()]
                gt = find(">", cm.start())
                pos = (gt + 1) if gt >= 0 else n
            if content:
                # script/style bodies are data (the tree walk ignores them)
                stack[-1].children.append(
                    unescape(content) if "&" in content else content
                )
            _close_tag(stack, tag)
            cur = stack[-1]
            cur_children = cur.children
            continue
        # inlined _open_tag (same rules — ~1/4 of scanner time was call
        # overhead on this per-element path)
        if tag in _VOID_TAGS:
            if tag == "br":
                cur_children.append(" ")
            continue
        if tag in _AUTOCLOSE_TRIGGERS and cur.tag in _P_LIKE:
            # implicit close of p/li when a block starts inside them
            while len(stack) > 1 and stack[-1].tag in _P_LIKE:
                stack.pop()
            cur = stack[-1]
            cur_children = cur.children
        node = _Node(tag, attrs)
        if attrs:
            node.boiler = _is_boiler(attrs)
        cur_children.append(node)
        stack.append(node)
        cur = node
        cur_children = node.children
    return root


# ------------------------------------------------------------- tree metrics


def _norm(s: str) -> str:
    return " ".join(s.split())


def _collect(node: _Node, under_link: bool, out: list) -> None:
    """Append (fragment, under_link) pairs for content-bearing text."""
    for ch in node.children:
        if isinstance(ch, str):
            out.append((ch, under_link))
        elif ch.tag in _IGNORE_TAGS or ch.boiler:
            continue
        else:
            _collect(ch, under_link or ch.tag == "a", out)


def _stats(node: _Node) -> tuple[str, int, int]:
    """Return (normalized_text, total_chars, link_chars)."""
    frags: list = []
    _collect(node, node.tag == "a", frags)
    if len(frags) == 1:
        # dominant case (leaf blocks): one fragment means the region text IS
        # the normalized fragment, so total == len(text) and the per-fragment
        # split below would redo the same work — fast path, same values
        f, is_link = frags[0]
        text = _norm(f)
        n = len(text)
        return text, n, n if is_link else 0
    # region text: normalize the full concatenation (single canonical spacing)
    text = _norm("".join(f for f, _ in frags))
    # densities: per-fragment normalized lengths so they are insensitive to
    # how markup splits runs of text. len(_norm(f)) without building the
    # string: sum of word lengths + single separators
    total = 0
    link = 0
    for f, is_link in frags:
        ws = f.split()
        n = sum(map(len, ws)) + len(ws) - 1 if ws else 0
        total += n
        if is_link:
            link += n
    return text, total, link


def _count_elems(node: _Node) -> int:
    n = 0
    for ch in node.children:
        if isinstance(ch, _Node) and ch.tag not in _IGNORE_TAGS and not ch.boiler:
            n += 1 + _count_elems(ch)
    return n


def _has_block_descendant(node: _Node) -> bool:
    for ch in node.children:
        if isinstance(ch, _Node):
            if ch.tag in _IGNORE_TAGS or ch.boiler:
                continue
            if ch.tag in _EXPLICIT_BLOCKS or ch.tag in _CONTAINER_BLOCKS:
                return True
            if _has_block_descendant(ch):
                return True
    return False


def _confidence(text_len: int, link_density: float) -> float:
    """Deterministic confidence: (1 - link_density) scaled by a length factor."""
    length_factor = 0.5 + 0.5 * min(1.0, text_len / 120.0)
    return round((1.0 - link_density) * length_factor, 6)


# ------------------------------------------------------------ region harvest


def _evaluate(node: _Node, rtype: str) -> dict | None:
    text, total, link = _stats(node)
    n = len(text)
    if n < _MIN_CHARS[rtype]:
        return None
    link_density = round(link / total, 6) if total else 0.0
    if link_density > _MAX_LINK_DENSITY[rtype]:
        return None
    # elems only feeds text_density on ACCEPTED regions — counting it after
    # the gates skips a full subtree walk for every rejected candidate
    text_density = round(total / (1.0 + _count_elems(node)), 6)
    conf = _confidence(n, link_density)
    return {
        "type": rtype,
        "text": text,
        "link_density": link_density,
        "text_density": text_density,
        "confidence": conf,
        "needs_review": conf < _REVIEW_THRESHOLD,
    }


def _harvest(node: _Node, out: list) -> bool:
    """Emit regions from ``node``'s subtree in document order.

    Returns True if any region was emitted below (used for the
    div-as-paragraph fallback).
    """
    emitted = False
    for ch in node.children:
        if not isinstance(ch, _Node):
            continue
        if ch.tag in _IGNORE_TAGS or ch.boiler:
            continue
        if ch.tag in _EXPLICIT_BLOCKS:
            # li containing a nested list: recurse for item granularity
            if ch.tag in ("li", "dd") and _has_list_descendant(ch):
                emitted |= _harvest(ch, out)
                continue
            region = _evaluate(ch, _REGION_TYPE.get(ch.tag, "paragraph"))
            if region is not None:
                out.append(region)
                emitted = True
            continue
        child_emitted = _harvest(ch, out)
        if (
            not child_emitted
            and ch.tag in _CONTAINER_BLOCKS
            and not _has_block_descendant(ch)
        ):
            region = _evaluate(ch, "paragraph")
            if region is not None:
                out.append(region)
                child_emitted = True
        emitted |= child_emitted
    return emitted


def _has_list_descendant(node: _Node) -> bool:
    for ch in node.children:
        if isinstance(ch, _Node) and ch.tag not in _IGNORE_TAGS and not ch.boiler:
            if ch.tag in _LIST_CONTAINERS or _has_list_descendant(ch):
                return True
    return False


def _find_title(node: _Node) -> str | None:
    for ch in node.children:
        if isinstance(ch, _Node):
            if ch.tag in ("title", "h1"):
                t = _norm("".join(c for c in ch.children if isinstance(c, str)))
                if t:
                    return t
            found = _find_title(ch)
            if found:
                return found
    return None


# ------------------------------------------------------------------ kernel


def extract_html(data: bytes) -> dict:
    """Extract main content from raw HTML bytes.

    Returns ``{text, title, encoding, ok, error, regions:[{idx, type, text,
    span_start, span_end, link_density, text_density, confidence,
    needs_review}]}``. Deterministic; never raises on malformed markup.
    """
    try:
        raw, encoding = decode_with_fallback(data if data is not None else b"")
    except UnicodeDecodeError as e:  # unreachable with latin-1 in the chain
        return {
            "text": "",
            "title": None,
            "encoding": None,
            "ok": False,
            "error": f"decode-failed: {e.reason}",
            "regions": [],
        }
    try:
        root = _fast_build(raw)
    except Exception as e:  # tolerant by construction; belt and braces
        return {
            "text": "",
            "title": None,
            "encoding": encoding,
            "ok": False,
            "error": f"parse-failed: {type(e).__name__}",
            "regions": [],
        }
    regions: list[dict] = []
    _harvest(root, regions)
    # document text: regions joined with "\n\n" (reference page-join rule);
    # span offsets are char offsets into this exact string.
    offset = 0
    parts: list[str] = []
    for i, r in enumerate(regions):
        r["idx"] = i
        r["span_start"] = offset
        r["span_end"] = offset + len(r["text"])
        offset = r["span_end"] + 2  # len("\n\n")
        parts.append(r["text"])
    return {
        "text": "\n\n".join(parts),
        "title": _find_title(root),
        "encoding": encoding,
        "ok": True,
        "error": None,
        "metadata": {"n_regions": str(len(regions))},
        "regions": regions,
    }
