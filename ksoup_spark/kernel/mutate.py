"""DOM mutations over the node-table ``Doc``.

Reimplements the reference's node/element mutation surface as node-table
rewrites (the pipeline is read-mostly, but Cleaner, ``:matchText``,
boilerplate-strip and user rewrites need structural edits):

- node ops: remove/before/after/wrap/unwrap/replaceWith
  (/root/reference/ksoup/src/com/fleeksoft/ksoup/nodes/Node.kt:338-491)
- element ops: appendChild/prependChild/append(html)/prepend(html)/empty/
  html(String)/text(String) (nodes/Element.kt:565-813)
- attribute/class ops: attr(k,v)/removeAttr/addClass/removeClass/toggleClass
  (nodes/Node.kt:102-160, nodes/Element.kt:1490-1577)
- ``Elements`` bulk list ops (select/Elements.kt:37-792)

Fragment HTML arguments are parsed with the real fragment parser and the
resulting nodes grafted into the target ``Doc`` with id remapping
(the reference allocates fresh objects; we allocate fresh rows).
"""

from __future__ import annotations

import re

from . import dom
from .dom import Doc


# -- fragment grafting -------------------------------------------------------

def import_fragment(dst: Doc, html: str, context: str = "body") -> list[int]:
    """Parse ``html`` as a fragment and copy its nodes into ``dst``.

    Returns the new (unattached) top-level node ids in ``dst``, in order.
    Mirrors Parser.parseFragment + node adoption (Parser.kt:193-220).
    """
    from .treebuilder import parse_fragment  # local import: cycle avoidance

    src, roots = parse_fragment(html, context, base_uri=dst.base_uri)
    if src.self_closing:
        # adopted nodes keep their Tag.selfClosing flag for "<x />" output
        if dst.self_closing is None:
            dst.self_closing = set()
        dst.self_closing.update(src.self_closing)
    return [_copy_subtree(dst, src, r) for r in roots]


def _copy_subtree(dst: Doc, src: Doc, node: int) -> int:
    attrs = src.attrs[node]
    nid = dst.new_node(src.kind[node], src.tag[node],
                       dict(attrs) if attrs else attrs,
                       src.text[node], src.ns[node])
    for c in src.children[node]:
        dst.append_child(nid, _copy_subtree(dst, src, c))
    return nid


# -- node ops (Node.kt:338-491) ---------------------------------------------

def remove(doc: Doc, node: int) -> None:
    """Node.remove (Node.kt:338-341): detach from parent."""
    doc.detach(node)


def before(doc: Doc, node: int, new: int) -> None:
    """Node.before(node) (Node.kt:359-366)."""
    doc.insert_before(node, new)


def after(doc: Doc, node: int, new: int) -> None:
    """Node.after(node) (Node.kt:384-391): detach `new` BEFORE resolving the
    reference index — when `new` is an earlier sibling of the same parent the
    pre-detach index would be stale by one."""
    p = doc.parent[node]
    if p == -1:
        raise ValueError("after(): reference node has no parent")
    doc.detach(new)
    sibs = doc.children[p]
    i = sibs.index(node)
    sibs.insert(i + 1, new)
    doc.parent[new] = p


def before_html(doc: Doc, node: int, html: str) -> None:
    """Node.before(html) (Node.kt:348-352): fragment inserted before node."""
    ctx = _fragment_context(doc, doc.parent[node])
    for nid in import_fragment(doc, html, ctx):
        doc.insert_before(node, nid)


def after_html(doc: Doc, node: int, html: str) -> None:
    """Node.after(html) (Node.kt:373-377)."""
    ctx = _fragment_context(doc, doc.parent[node])
    anchor = node
    for nid in import_fragment(doc, html, ctx):
        after(doc, anchor, nid)
        anchor = nid


def replace_with(doc: Doc, old: int, new: int) -> None:
    """Node.replaceWith (Node.kt:473-476)."""
    doc.insert_before(old, new)
    doc.detach(old)


def wrap(doc: Doc, node: int, html: str) -> int:
    """Node.wrap(html) (Node.kt:409-455): first fragment element becomes the
    wrapper, placed at node's position; node moves into the wrapper's deepest
    element descendant; remaining fragment nodes follow after. Returns the
    wrapper id (-1 if the fragment has no element)."""
    ctx = _fragment_context(doc, doc.parent[node])
    nodes = import_fragment(doc, html, ctx)
    wrapper = -1
    for nid in nodes:
        if doc.kind[nid] == dom.ELEMENT:
            wrapper = nid
            break
    if wrapper == -1:
        return -1
    deepest = _deep_child(doc, wrapper)
    if doc.parent[node] != -1:
        doc.insert_before(node, wrapper)
    doc.append_child(deepest, node)
    # trailing fragment nodes go after the wrapper (Node.kt:434-449)
    anchor = wrapper
    for nid in nodes:
        if nid != wrapper and doc.parent[nid] == -1:
            if doc.parent[anchor] != -1:
                after(doc, anchor, nid)
                anchor = nid
    return wrapper


def _deep_child(doc: Doc, el: int) -> int:
    """First-element-child chain descent (Node.kt:897-905)."""
    while True:
        kids = [c for c in doc.children[el] if doc.kind[c] == dom.ELEMENT]
        if not kids:
            return el
        el = kids[0]


def unwrap(doc: Doc, node: int) -> None:
    """Node.unwrap (Node.kt:457-463): replace node with its children."""
    for c in list(doc.children[node]):
        doc.insert_before(node, c)
    doc.detach(node)


def _fragment_context(doc: Doc, parent: int) -> str:
    if parent != -1 and doc.kind[parent] == dom.ELEMENT and doc.tag[parent]:
        return doc.tag[parent]
    return "body"


# -- element ops (Element.kt:565-813) ---------------------------------------

def _check_no_cycle(doc: Doc, el: int, child: int) -> None:
    """Reject reparenting a node under its own subtree — a parent cycle
    would make every traversal non-terminating."""
    n = el
    while n != -1:
        if n == child:
            raise ValueError(
                "cannot insert a node into its own subtree")
        n = doc.parent[n]


def append_child(doc: Doc, el: int, child: int) -> None:
    """Element.appendChild (Element.kt:572-578)."""
    _check_no_cycle(doc, el, child)
    doc.append_child(el, child)


def prepend_child(doc: Doc, el: int, child: int) -> None:
    """Element.prependChild (Element.kt:610-616)."""
    _check_no_cycle(doc, el, child)
    doc.detach(child)
    doc.children[el].insert(0, child)
    doc.parent[child] = el


def append_html(doc: Doc, el: int, html: str) -> None:
    """Element.append(html) (Element.kt:744-750)."""
    for nid in import_fragment(doc, html, doc.tag[el] or "body"):
        doc.append_child(el, nid)


def prepend_html(doc: Doc, el: int, html: str) -> None:
    """Element.prepend(html) (Element.kt:755-761)."""
    at = 0
    for nid in import_fragment(doc, html, doc.tag[el] or "body"):
        doc.detach(nid)
        doc.children[el].insert(at, nid)
        doc.parent[nid] = el
        at += 1


def empty(doc: Doc, el: int) -> None:
    """Element.empty (Element.kt:806-810): drop all children."""
    for c in list(doc.children[el]):
        doc.detach(c)


def set_html(doc: Doc, el: int, html: str) -> None:
    """Element.html(String) (Element.kt:1716-1721): empty + append."""
    empty(doc, el)
    append_html(doc, el, html)


def set_text(doc: Doc, el: int, text: str) -> None:
    """Element.text(String) (Element.kt:1406-1417): empty + one text node
    (data node for script/style, matching the reference)."""
    empty(doc, el)
    kind = dom.DATA if doc.tag[el] in ("script", "style") else dom.TEXT
    doc.append_child(el, doc.new_node(kind, text=text))


# -- attribute / class ops ---------------------------------------------------

def set_attr(doc: Doc, node: int, key: str, value: str | None) -> None:
    """Node.attr(k, v) (Node.kt:122-131); None = boolean attribute."""
    a = doc.attrs[node]
    if a is None:
        a = {}
        doc.attrs[node] = a
    kl = key.lower()
    for k in list(a):  # case-insensitive replace (Attributes.kt:504-533)
        if k.lower() == kl and k != key:
            del a[k]
    a[key] = value


def remove_attr(doc: Doc, node: int, key: str) -> None:
    """Node.removeAttr (Node.kt:155-160); case-insensitive."""
    a = doc.attrs[node]
    if not a:
        return
    kl = key.lower()
    for k in list(a):
        if k.lower() == kl:
            del a[k]


_CLASS_SPLIT = re.compile(r"[\t\n\r\f ]+")


def _classes(doc: Doc, el: int) -> list[str]:
    v = doc.get_attr(el, "class") or ""
    return [c for c in _CLASS_SPLIT.split(v) if c]


def add_class(doc: Doc, el: int, cls: str) -> None:
    """Element.addClass (Element.kt:1579-1586)."""
    cs = _classes(doc, el)
    if cls not in cs:
        cs.append(cls)
        set_attr(doc, el, "class", " ".join(cs))


def remove_class(doc: Doc, el: int, cls: str) -> None:
    """Element.removeClass (Element.kt:1591-1598)."""
    cs = [c for c in _classes(doc, el) if c != cls]
    set_attr(doc, el, "class", " ".join(cs))


def toggle_class(doc: Doc, el: int, cls: str) -> None:
    """Element.toggleClass (Element.kt:1603-1614)."""
    if cls in _classes(doc, el):
        remove_class(doc, el, cls)
    else:
        add_class(doc, el, cls)


# -- Elements bulk ops (select/Elements.kt) ----------------------------------

def bulk_attr(doc: Doc, nodes: list[int], key: str, value: str) -> None:
    """Elements.attr(k, v) (Elements.kt:58-76)."""
    for n in nodes:
        set_attr(doc, n, key, value)


def bulk_add_class(doc: Doc, nodes: list[int], cls: str) -> None:
    for n in nodes:
        add_class(doc, n, cls)


def bulk_remove_class(doc: Doc, nodes: list[int], cls: str) -> None:
    for n in nodes:
        remove_class(doc, n, cls)


def bulk_remove(doc: Doc, nodes: list[int]) -> None:
    """Elements.remove (Elements.kt:415-421)."""
    for n in nodes:
        doc.detach(n)


def bulk_unwrap(doc: Doc, nodes: list[int]) -> None:
    """Elements.unwrap (Elements.kt:393-399)."""
    for n in nodes:
        unwrap(doc, n)


def bulk_wrap(doc: Doc, nodes: list[int], html: str) -> None:
    """Elements.wrap (Elements.kt:378-384)."""
    for n in nodes:
        wrap(doc, n, html)


def eq(nodes: list[int], index: int) -> list[int]:
    """Elements.eq (Elements.kt:472-478)."""
    return [nodes[index]] if 0 <= index < len(nodes) else []


def not_(doc: Doc, nodes: list[int], query: str, root: int = 0) -> list[int]:
    """Elements.not (Elements.kt:444-451)."""
    from .selector import parse_query, EvalCtx

    ev = parse_query(query)
    ctx = EvalCtx(doc, root)
    return [n for n in nodes if not ev.matches(ctx, n)]


def next_(doc: Doc, nodes: list[int]) -> list[int]:
    """Elements.next (Elements.kt:487-493): next element siblings."""
    out: list[int] = []
    for n in nodes:
        p = doc.parent[n]
        if p == -1:
            continue
        sibs = doc.element_children(p)
        i = sibs.index(n)
        if i + 1 < len(sibs) and sibs[i + 1] not in out:
            out.append(sibs[i + 1])
    return out


def prev(doc: Doc, nodes: list[int]) -> list[int]:
    """Elements.prev (Elements.kt:517-523)."""
    out: list[int] = []
    for n in nodes:
        p = doc.parent[n]
        if p == -1:
            continue
        sibs = doc.element_children(p)
        i = sibs.index(n)
        if i > 0 and sibs[i - 1] not in out:
            out.append(sibs[i - 1])
    return out


def parents(doc: Doc, nodes: list[int]) -> list[int]:
    """Elements.parents (Elements.kt:545-553): all ancestors, deduped,
    in first-encounter order."""
    out: list[int] = []
    seen: set[int] = set()
    for n in nodes:
        p = doc.parent[n]
        while p > 0:
            if doc.kind[p] == dom.ELEMENT and p not in seen:
                seen.add(p)
                out.append(p)
            p = doc.parent[p]
    return out


def forms(doc: Doc, nodes: list[int]) -> list[int]:
    """Elements.forms (Elements.kt:640-646)."""
    return [n for n in nodes if doc.tag[n] == "form"]


def comments(doc: Doc, nodes: list[int]) -> list[int]:
    """Elements.comments (Elements.kt:650-656): comment children."""
    out: list[int] = []
    for n in nodes:
        out.extend(c for c in doc.children[n] if doc.kind[c] == dom.COMMENT)
    return out


def text_nodes(doc: Doc, nodes: list[int]) -> list[int]:
    """Elements.textNodes (Elements.kt:658-664): text-node children."""
    out: list[int] = []
    for n in nodes:
        out.extend(c for c in doc.children[n] if doc.kind[c] == dom.TEXT)
    return out


def data_nodes(doc: Doc, nodes: list[int]) -> list[int]:
    """Element.dataNodes (Element.kt:433-439): data-node children
    (script/style payloads), per element in order."""
    out: list[int] = []
    for n in nodes:
        out.extend(c for c in doc.children[n] if doc.kind[c] == dom.DATA)
    return out


def clone(doc: Doc, node: int) -> int:
    """Node.clone (Node.kt:770-791): standalone deep copy of the subtree
    within the same Doc; returned root is unattached."""
    return _copy_subtree(doc, doc, node)


def insert_children(doc: Doc, el: int, index: int, children: list[int]) -> None:
    """Element.insertChildren (Element.kt:630-668): insert at index among
    el's child NODES; index -1 appends (jsoup semantics)."""
    for c in children:
        _check_no_cycle(doc, el, c)
    # validate against the POST-detach length BEFORE mutating anything, so
    # an out-of-range index leaves the tree untouched (atomicity); a child
    # already in el's own list shifts positions once detached, hence the
    # adjusted length rather than validating after the detach
    post_len = len(doc.children[el]) - sum(
        1 for c in children if doc.parent[c] == el)
    if index < 0:
        index = post_len + index + 1
    if not 0 <= index <= post_len:
        raise ValueError(f"insert position {index} out of range")
    for c in children:
        doc.detach(c)
    for off, c in enumerate(children):
        doc.children[el].insert(index + off, c)
        doc.parent[c] = el


# -- Elements bulk getters / navigators (Elements.kt:70-90, 210-224, 495-566) -

def node_has_attr(doc: Doc, node: int, key: str) -> bool:
    """Node.hasAttr incl. the abs: prefix (Node.kt:151-158): abs:k is true
    only when k exists AND resolves to a non-empty absolute URL."""
    if key.startswith("abs:"):
        k = key[4:]
        if doc.get_attr(node, k) is not None and doc.abs_url(node, k):
            return True
        return doc.get_attr(node, key) is not None
    return doc.get_attr(node, key) is not None


def _attr_or_abs(doc: Doc, node: int, key: str) -> str:
    if key.startswith("abs:"):
        return doc.abs_url(node, key[4:])
    return doc.get_attr(node, key) or ""


def bulk_has_attr(doc: Doc, nodes: list[int], key: str) -> bool:
    """Elements.hasAttr (Elements.kt:70-75): any element has it."""
    return any(node_has_attr(doc, n, key) for n in nodes)


def each_attr(doc: Doc, nodes: list[int], key: str) -> list[str]:
    """Elements.eachAttr (Elements.kt:84-90): values of elements that HAVE
    the attribute — absent elements contribute nothing, not ''."""
    return [_attr_or_abs(doc, n, key) for n in nodes
            if node_has_attr(doc, n, key)]


def element_has_text(doc: Doc, node: int) -> bool:
    """Element.hasText (Element.kt:1433-1456): any non-blank text node in
    the subtree."""
    for n, _ in doc.preorder(node):
        if doc.kind[n] in (dom.TEXT, dom.CDATA):
            t = doc.text[n]
            if t and t.strip(" \t\n\f\r"):
                return True
    return False


def bulk_has_text(doc: Doc, nodes: list[int]) -> bool:
    """Elements.hasText (Elements.kt:210-212)."""
    return any(element_has_text(doc, n) for n in nodes)


def each_text(doc: Doc, nodes: list[int]) -> list[str]:
    """Elements.eachText (Elements.kt:222-224): texts of elements that have
    text — textless elements are skipped, not ''."""
    from .textops import element_text

    return [element_text(doc, n) for n in nodes if element_has_text(doc, n)]


def _sibling_walk(doc: Doc, nodes: list[int], query: str | None,
                  forward: bool, all_sibs: bool) -> list[int]:
    """Elements.next/prev/nextAll/prevAll (Elements.kt:543-566): walk each
    element's element-siblings, optionally filtered; no cross-element dedup
    (faithful to the reference's list semantics)."""
    from . import selector as S

    ev = S.parse_query(query) if query else None
    out: list[int] = []
    for e in nodes:
        cur = e
        while True:
            sib = (dom.next_element_sibling(doc, cur) if forward
                   else dom.previous_element_sibling(doc, cur))
            if sib == -1:
                break
            if ev is None or S.element_is(doc, sib, ev):
                out.append(sib)
            cur = sib
            if not all_sibs:
                break
    return out


def next_all(doc: Doc, nodes: list[int], query: str | None = None) -> list[int]:
    """Elements.nextAll (Elements.kt:495-506)."""
    return _sibling_walk(doc, nodes, query, True, True)


def prev_all(doc: Doc, nodes: list[int], query: str | None = None) -> list[int]:
    """Elements.prevAll (Elements.kt:516-527)."""
    return _sibling_walk(doc, nodes, query, False, True)


def select_within(doc: Doc, nodes: list[int], query: str) -> list[int]:
    """Elements.select via Selector.select(query, roots)
    (select/Selector.kt:123-141): per-root collect, identity-deduped in
    first-seen order."""
    from . import selector as S

    ev = S.parse_query(query)
    seen: set[int] = set()
    out: list[int] = []
    for root in nodes:
        for n in S.select(doc, ev, root):
            if n not in seen:
                seen.add(n)
                out.append(n)
    return out


# -- small Node/Document surface (Node.kt:802-850, Document.kt:57-162, 619) --

def shallow_clone(doc: Doc, node: int) -> int:
    """Node.shallowClone (Node.kt:848-850): copy without children,
    unattached."""
    attrs = doc.attrs[node]
    return doc.new_node(doc.kind[node], doc.tag[node],
                        dict(attrs) if attrs else attrs,
                        doc.text[node], doc.ns[node])


def has_same_value(doc: Doc, a: int, b: int) -> bool:
    """Node.hasSameValue (Node.kt:802-805): same node kind and identical
    outerHtml."""
    from .serialize import outer_html

    if a == b:
        return True
    if doc.kind[a] != doc.kind[b]:
        return False
    return outer_html(doc, a) == outer_html(doc, b)


def child_nodes_copy(doc: Doc, node: int) -> list[int]:
    """Node.childNodesCopy (Node.kt): independent deep copies of the
    children, unattached."""
    return [clone(doc, c) for c in doc.children[node]]


def clear_attributes(doc: Doc, node: int) -> None:
    """Node.clearAttributes."""
    doc.attrs[node] = None


def sibling_nodes(doc: Doc, node: int) -> list[int]:
    """Node.siblingNodes: all siblings of any kind, excluding self."""
    p = doc.parent[node]
    if p == -1:
        return []
    return [c for c in doc.children[p] if c != node]


def document_type(doc: Doc) -> int:
    """Document.documentType (Document.kt:57-68): the doctype if it leads
    the document's children (leaf nodes scan past, an element stops)."""
    for c in doc.children[0]:
        if doc.kind[c] == dom.DOCTYPE:
            return c
        if doc.kind[c] == dom.ELEMENT:
            break
    return -1


def expect_form(doc: Doc, css: str) -> int:
    """Document.expectForm (Document.kt:155-162): first <form> among the
    matches, else error."""
    from . import selector as S

    for n in S.select(doc, css):
        if doc.tag[n] == "form":
            return n
    raise ValueError(f"No form elements matched the query {css!r}")


def create_element(doc: Doc, tag: str) -> int:
    """Document.createElement: new unattached element owned by doc."""
    return doc.new_node(dom.ELEMENT, tag, None, None)


def create_shell(base_uri: str = "") -> Doc:
    """Document.createShell (Document.kt:619-625): html > head + body."""
    d = Doc()
    d.base_uri = base_uri
    html = d.new_node(dom.ELEMENT, "html")
    d.append_child(0, html)
    d.append_child(html, d.new_node(dom.ELEMENT, "head"))
    d.append_child(html, d.new_node(dom.ELEMENT, "body"))
    return d
