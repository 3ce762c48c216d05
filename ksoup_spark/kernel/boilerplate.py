"""Main-content extraction: boilerplate strip + DOM heuristics.

The north-rule pipeline is "main-content extraction (HTML boilerplate strip,
DOM heuristics)": beyond the reference's faithful parse/select/text engine,
this module implements the readability-style heuristics a training-data
pipeline applies before span emission:

1. **strip_boilerplate** — remove scaffolding elements (script/style/nav/
   aside/form/...) and elements whose id/class names mark chrome
   (nav|sidebar|footer|ads|comments|cookie|...). Deterministic allow/deny
   tables, no randomness.
2. **main_content_node** — pick the content container: semantic tags first
   (``article``/``main``/``[role=main]``), else the block container with the
   best text-mass × (1 − link-density) score (boilerpipe/readability-style
   scoring).
3. **main_text / main_spans** — Element.text() / span emission restricted to
   the chosen container, so media spans stay interleaved at DOM positions.

All pure kernel functions (no Spark imports) — driven through Arrow-batched
UDFs in ksoup_spark.functions.html / operators.extract.
"""

from __future__ import annotations

import re

from . import dom, mutate
from .dom import Doc
from .selector import select, select_first
from .textops import element_text, extract_spans

# scaffolding that never carries main content
REMOVE_TAGS = frozenset(
    "script style noscript template iframe form button input select textarea "
    "option label nav aside canvas svg map area link meta base dialog".split()
)
# removed when their id/class also looks like chrome (see _BOILER_RE) or when
# they sit at top scaffold level; headers/footers inside article are kept
_CHROME_TAGS = frozenset("header footer".split())

_BOILER_RE = re.compile(
    r"(?:^|[-_ ])("
    r"nav|navbar|menu|sidebar|side-?bar|footer|header|banner|masthead|"
    r"ads?|advert(?:isement)?s?|sponsor(?:ed)?|promo|"
    r"social|share|sharing|comments?|related|recommend(?:ed|ations?)?|"
    r"breadcrumbs?|pag(?:er|ination)|cookie|consent|popup|modal|overlay|"
    r"subscribe|newsletter|signup|login|widget|toolbar|skip"
    r")(?:$|[-_ ])",
    re.IGNORECASE,
)

_CONTAINER_TAGS = frozenset("div section td article main body".split())
_MIN_SEMANTIC_CHARS = 25


def _looks_boiler(doc: Doc, el: int) -> bool:
    a = doc.attrs[el]
    if not a:
        return False
    ident = a.get("id") or ""
    cls = a.get("class") or ""
    probe = f"{ident} {cls}".strip()
    return bool(probe) and _BOILER_RE.search(probe) is not None


def strip_boilerplate(doc: Doc, root: int | None = None) -> int:
    """Remove scaffolding/chrome elements under ``root`` (default body).

    Returns the number of elements removed. Mutates ``doc`` in place.
    """
    if root is None:
        root = doc.body()
        if root == -1:
            root = 0
    body = doc.body()
    removed = 0
    victims: list[int] = []
    # scaffolding tags go wherever they appear (incl. <head> scripts)
    for n, _ in doc.preorder(0):
        if doc.kind[n] == dom.ELEMENT and (doc.tag[n] or "") in REMOVE_TAGS:
            victims.append(n)
    for n, _ in doc.preorder(root):
        if n == root or doc.kind[n] != dom.ELEMENT:
            continue
        tag = doc.tag[n] or ""
        if tag in _CHROME_TAGS:
            # top-level header/footer are page chrome; ones nested inside
            # content (e.g. <article><header>) are kept unless boiler-named
            if doc.parent[n] == body or _looks_boiler(doc, n):
                victims.append(n)
        elif tag in ("div", "section", "ul", "table"):
            if _looks_boiler(doc, n):
                victims.append(n)
    # preorder yields parents before children; detaching a parent makes its
    # descendants unreachable, so skip nodes already detached from root
    for n in victims:
        if _still_attached(doc, n, 0):
            mutate.remove(doc, n)
            removed += 1
    return removed


def _still_attached(doc: Doc, n: int, root: int) -> bool:
    while n != -1:
        if n == root:
            return True
        n = doc.parent[n]
    return False


def _text_mass(doc: Doc, el: int, stop_at_containers: bool = False
               ) -> tuple[int, int]:
    """(total_chars, anchor_chars) of text under ``el`` — one DFS.

    With ``stop_at_containers`` the walk does not descend into nested
    container candidates (div/section/td/article/main), yielding the
    element's OWN block text — the readability scoring unit; otherwise a
    parent container always outscores its children by inclusion.
    """
    total = 0
    anchor = 0
    stack = [(el, False)]
    while stack:
        n, in_a = stack.pop()
        k = doc.kind[n]
        if k == dom.TEXT:
            ln = len((doc.text[n] or "").strip())
            total += ln
            if in_a:
                anchor += ln
        elif k == dom.ELEMENT:
            if stop_at_containers and n != el and \
                    (doc.tag[n] or "") in _CONTAINER_TAGS:
                continue
            child_in_a = in_a or doc.tag[n] == "a"
            for c in doc.children[n]:
                stack.append((c, child_in_a))
    return total, anchor


def main_content_node(doc: Doc, root: int | None = None) -> int:
    """Choose the main-content container (readability-style).

    Semantic containers win when non-trivial; otherwise the block container
    with max text_mass × (1 − link_density), ties broken by document order.
    """
    if root is None:
        root = doc.body()
        if root == -1:
            root = doc.html_el()
        if root == -1:
            root = 0
    for q in ("article", "main", "[role=main]"):
        cand = select_first(doc, q, root)
        if cand != -1:
            total, _ = _text_mass(doc, cand)
            if total >= _MIN_SEMANTIC_CHARS:
                return cand
    best = root
    best_score = -1.0
    for n, _ in doc.preorder(root):
        if doc.kind[n] != dom.ELEMENT and n != root:
            continue
        tag = doc.tag[n] or ("body" if n == root else "")
        if tag not in _CONTAINER_TAGS:
            continue
        total, anchor = _text_mass(doc, n, stop_at_containers=True)
        if total == 0:
            continue
        link_density = anchor / total
        score = total * (1.0 - link_density)
        # strictly-greater keeps the first (document-order) best container
        if score > best_score:
            best_score = score
            best = n
    return best


def main_text(html: str, base_uri: str = "") -> str:
    """Boilerplate-stripped Element.text() of the main container."""
    from .treebuilder import parse

    doc = parse(html, base_uri)
    strip_boilerplate(doc)
    node = main_content_node(doc)
    return element_text(doc, node)


def main_spans(html: str, base_uri: str = "") -> list[tuple]:
    """Boilerplate-stripped (kind, text, media_ref, offset) span sequence of
    the main container — media spans stay interleaved at DOM positions."""
    from .treebuilder import parse

    doc = parse(html, base_uri)
    strip_boilerplate(doc)
    node = main_content_node(doc)
    return extract_spans(doc, node)
