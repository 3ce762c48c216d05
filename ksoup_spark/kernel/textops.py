"""Text extraction and span emission.

Reimplements the reference's text assembly semantics:

- ``text()``: preorder traversal appending normalized text; a space is
  inserted at a block/``br`` head boundary when the accumulator is non-empty
  and doesn't end in whitespace, and after a block element followed by a text
  node or non-format-as-block element
  (/root/reference/ksoup/src/com/fleeksoft/ksoup/nodes/Element.kt:1312-1351).
- whitespace collapse treats U+00A0 (nbsp) as whitespace and drops U+200B /
  U+00AD (internal/StringUtil.kt:137-191); text inside ``pre``-like elements
  (checked ≤6 ancestor levels up, Element.kt:1885-1898) and CDATA is appended
  raw.
- ``wholeText()``: raw concatenation of text nodes with ``br`` -> "\\n"
  (Element.kt:1860-1868).
- ``ownText()``: direct children only, ``br`` -> space (Element.kt:1389-1404).

The span emitter is the graft's flagship operator: a single DFS that applies
the ``text()`` rules while segmenting at media elements (img/video/object),
emitting the ordered (kind, text, media_ref, offset) sequence with media refs
resolved against the document base URI (absUrl semantics, Node.kt:234-244).
"""

from __future__ import annotations

from . import dom
from .dom import Doc
from .tags import BLOCK_TAGS, PRESERVE_WS_TAGS, format_as_block

_ACTUAL_WS = frozenset(" \t\n\f\r ")
_INVISIBLE = frozenset("​­")
_TRIM = " \t\n\r\f\v"

MEDIA_KIND = {"img": "image", "video": "video", "object": "object"}
_MEDIA_REF_ATTR = {"img": "src", "video": "src", "object": "data"}


def normalise_whitespace(s: str) -> str:
    out: list[str] = []
    append_normalised(out, s, False)
    return "".join(out)


def append_normalised(accum: list[str], s: str, strip_leading: bool) -> None:
    """StringUtil.appendNormalisedWhitespace over a list-of-chunks accumulator."""
    last_was_white = False
    reached_non_white = False
    buf: list[str] = []
    for c in s:
        if c in _ACTUAL_WS:
            if (strip_leading and not reached_non_white) or last_was_white:
                continue
            buf.append(" ")
            last_was_white = True
        elif c not in _INVISIBLE:
            buf.append(c)
            last_was_white = False
            reached_non_white = True
    if buf:
        accum.append("".join(buf))


class _Accum:
    """Accumulator tracking whether the last char is whitespace."""

    __slots__ = ("parts", "last_char")

    def __init__(self) -> None:
        self.parts: list[str] = []
        self.last_char = ""

    def is_empty(self) -> bool:
        return not self.parts

    def last_is_ws(self) -> bool:
        return self.last_char == " " or self.last_char in _ACTUAL_WS

    def append(self, s: str) -> None:
        if s:
            self.parts.append(s)
            self.last_char = s[-1]

    def append_normalised(self, s: str) -> None:
        chunk: list[str] = []
        append_normalised(chunk, s, self.last_is_ws())
        if chunk:
            self.append(chunk[0])

    def value(self) -> str:
        return "".join(self.parts)


def _preserves_ws(doc: Doc, node: int) -> bool:
    """preserveWhitespace: element & ≤5 ancestors up (Element.kt:1885-1898)."""
    el = node
    i = 0
    while el != -1 and i < 6:
        if doc.kind[el] == dom.ELEMENT and doc.tag[el] in PRESERVE_WS_TAGS:
            return True
        el = doc.parent[el]
        i += 1
    return False


def _append_text_node(doc: Doc, accum: _Accum, node: int) -> None:
    t = doc.text[node] or ""
    if doc.kind[node] == dom.CDATA or _preserves_ws(doc, doc.parent[node]):
        accum.append(t)
    else:
        accum.append_normalised(t)


def _traverse(doc: Doc, root: int):
    """Yield ('head'|'tail', node_id) events in document order, skipping root
    tail/head text semantics mirror NodeTraversor.traverse."""
    stack: list[tuple[int, int]] = [(root, 0)]
    children = doc.children
    while stack:
        node, ci = stack[-1]
        kids = children[node]
        if ci == 0:
            yield "head", node
        if ci < len(kids):
            stack[-1] = (node, ci + 1)
            stack.append((kids[ci], 0))
        else:
            yield "tail", node
            stack.pop()


def _next_sibling(doc: Doc, node: int) -> int:
    p = doc.parent[node]
    if p == -1:
        return -1
    sibs = doc.children[p]
    i = sibs.index(node)
    return sibs[i + 1] if i + 1 < len(sibs) else -1


def element_text(doc: Doc, root: int) -> str:
    """Element.text(): normalized combined text of root's subtree."""
    accum = _Accum()
    is_text = (dom.TEXT, dom.CDATA)
    for ev, node in _traverse(doc, root):
        k = doc.kind[node]
        if ev == "head":
            if k in is_text:
                _append_text_node(doc, accum, node)
            elif k == dom.ELEMENT:
                if not accum.is_empty() and (
                    doc.tag[node] in BLOCK_TAGS or doc.tag[node] == "br"
                ) and not accum.last_is_ws():
                    accum.append(" ")
        else:
            if k == dom.ELEMENT and doc.tag[node] in BLOCK_TAGS:
                nxt = _next_sibling(doc, node)
                if nxt != -1 and not accum.last_is_ws():
                    nk = doc.kind[nxt]
                    if nk in is_text or (
                        nk == dom.ELEMENT
                        and not format_as_block(doc.tag[nxt] or "")
                    ):
                        accum.append(" ")
    return accum.value().strip(_TRIM)


def whole_text(doc: Doc, root: int) -> str:
    out: list[str] = []
    is_text = (dom.TEXT, dom.CDATA)
    for ev, node in _traverse(doc, root):
        if ev != "head":
            continue
        k = doc.kind[node]
        if k in is_text:
            out.append(doc.text[node] or "")
        elif k == dom.ELEMENT and doc.tag[node] == "br":
            out.append("\n")
    return "".join(out)


def own_text(doc: Doc, root: int) -> str:
    accum = _Accum()
    is_text = (dom.TEXT, dom.CDATA)
    for c in doc.children[root]:
        k = doc.kind[c]
        if k in is_text:
            _append_text_node(doc, accum, c)
        elif k == dom.ELEMENT and doc.tag[c] == "br" and not accum.last_is_ws():
            accum.append(" ")
    return accum.value().strip(_TRIM)


def data_text(doc: Doc, root: int) -> str:
    """Element.data(): concat of data/comment/cdata payloads (Element.kt:1463-1483)."""
    out: list[str] = []
    for node, _ in doc.preorder(root):
        if node == root:
            continue
        k = doc.kind[node]
        if k in (dom.DATA, dom.COMMENT, dom.CDATA):
            out.append(doc.text[node] or "")
    return "".join(out)


def doc_title(doc: Doc) -> str:
    t = doc.find_first("title")
    if t == -1:
        return ""
    return normalise_whitespace(element_text(doc, t)).strip(_TRIM)


# ---------------------------------------------------------------------------
# span emission (the flagship extraction operator)
# ---------------------------------------------------------------------------

def extract_spans(doc: Doc, root: int | None = None) -> list[tuple]:
    """Emit the ordered (kind, text, media_ref, offset) span sequence.

    Applies Element.text() normalization, flushing the text accumulator at
    each media element (img/video/object) so media spans interleave at their
    DOM positions. Media descendants' fallback content (inside video/object)
    is skipped; refs resolve via absUrl against the doc base URI.
    """
    if root is None:
        root = doc.body()
        if root == -1:
            root = doc.html_el()
        if root == -1:
            root = 0
    spans: list[tuple] = []
    accum = _Accum()
    is_text = (dom.TEXT, dom.CDATA)

    def flush() -> None:
        text = accum.value().strip(_TRIM)
        accum.parts = []
        accum.last_char = ""
        if text:
            spans.append(("text", text, None, len(spans)))

    skip_under = -1
    skip_depth = 0
    stack: list[tuple[int, int]] = [(root, 0)]
    children = doc.children
    while stack:
        node, ci = stack[-1]
        kids = children[node]
        if ci == 0 and skip_under == -1:
            k = doc.kind[node]
            if k in is_text:
                _append_text_node(doc, accum, node)
            elif k == dom.ELEMENT:
                tag = doc.tag[node] or ""
                mk = MEDIA_KIND.get(tag)
                if mk is not None and node != root:
                    flush()
                    ref_attr = _MEDIA_REF_ATTR[tag]
                    ref = doc.abs_url(node, ref_attr)
                    if not ref and tag == "video":
                        # fall back to first <source src>
                        for c in kids:
                            if doc.kind[c] == dom.ELEMENT and doc.tag[c] == "source":
                                ref = doc.abs_url(c, "src")
                                if ref:
                                    break
                    spans.append((mk, None, ref or "", len(spans)))
                    skip_under = node  # don't descend into fallback content
                    skip_depth = len(stack)
                elif not accum.is_empty() and (
                    tag in BLOCK_TAGS or tag == "br"
                ) and not accum.last_is_ws():
                    accum.append(" ")
        if ci < len(kids):
            stack[-1] = (node, ci + 1)
            stack.append((kids[ci], 0))
        else:
            # tail
            if skip_under == node and len(stack) == skip_depth:
                skip_under = -1
            elif skip_under == -1:
                k = doc.kind[node]
                if k == dom.ELEMENT and (doc.tag[node] or "") in BLOCK_TAGS:
                    nxt = _next_sibling(doc, node)
                    if nxt != -1 and not accum.last_is_ws():
                        nk = doc.kind[nxt]
                        if nk in is_text or (
                            nk == dom.ELEMENT
                            and not format_as_block(doc.tag[nxt] or "")
                        ):
                            accum.append(" ")
            stack.pop()
    flush()
    return spans
