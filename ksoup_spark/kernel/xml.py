"""XML tree builder (Parser.xmlParser mode).

Mirrors the reference's XmlTreeBuilder
(/root/reference/ksoup/src/com/fleeksoft/ksoup/parser/XmlTreeBuilder.kt:16-156):
no HTML insertion rules — tokens build the stack directly, case is
preserved, self-closing tags are honored for any tag, and a bogus comment
that looks like ``<?xml ...?>`` is recovered as an XmlDeclaration node.
"""

from __future__ import annotations

from . import dom
from .dom import Doc
from .tokenizer import Tokenizer


class XmlTreeBuilder:
    """Steppable XML builder (reference parser/XmlTreeBuilder.kt): drives
    the same tokenizer in case-preserving mode with a simple open-element
    stack. parse_setup/parse_step mirror the HTML builder's incremental
    surface so StreamParser can early-exit XML documents too."""

    def __init__(self) -> None:
        self.doc = Doc()
        self.tok: Tokenizer | None = None
        self.stack: list[int] = [0]
        self.perrs = None
        self.src_track = False

    def parse_setup(self, xml: str, base_uri: str = "",
                    track_errors: int = 0,
                    track_positions: bool = False) -> "XmlTreeBuilder":
        from .parse_errors import ParseErrorList

        self.doc.base_uri = base_uri
        if track_errors > 0:
            self.perrs = ParseErrorList(track_errors, xml)
        if track_positions:
            self.src_track = True
            d = self.doc
            d.src_pos = {}
            d.src_range = {}
            d.src_end_range = {}
            d.attr_src = {}
            d.src_text = xml
            d.src_range[0] = (0, 0)
            d.src_pos[0] = 0
        self.tok = Tokenizer(xml, self.perrs)
        self.tok.track = self.src_track
        return self

    def parse_step(self) -> bool:
        t = self.tok.next_token()
        if t[0] == "eof":
            if self.perrs is not None:
                self.doc.parse_errors = list(self.perrs)
            if self.src_track:
                # elements left open close implicitly at EOF; then the doc
                n = self.tok.n
                er = self.doc.src_end_range
                for nid in reversed(self.stack):
                    if nid != 0 and nid not in er:
                        er[nid] = (n, n)
                er.setdefault(0, (n, n))
            return False
        _xml_process(self.doc, self.stack, t,
                     self.tok if self.src_track else None)
        return True


def parse_xml(xml: str, base_uri: str = "",
              track_errors: int = 0,
              track_positions: bool = False) -> Doc:
    b = XmlTreeBuilder().parse_setup(xml, base_uri, track_errors,
                                     track_positions)
    while b.parse_step():
        pass
    return b.doc


def _xml_process(doc: Doc, stack: list[int], t, tok=None) -> None:
    def _leaf_track(nid: int) -> None:
        doc.src_pos[nid] = tok.tok_start
        doc.src_range[nid] = (tok.tok_start, tok.tok_end)

    k = t[0]
    if k == "text":
        nid = doc.new_node(dom.TEXT, text=t[1], ns=dom.NS_XML)
        if tok is not None:
            _leaf_track(nid)
        doc.append_child(stack[-1], nid)
    elif k == "cdata":
        nid = doc.new_node(dom.CDATA, text=t[1], ns=dom.NS_XML)
        if tok is not None:
            _leaf_track(nid)
        doc.append_child(stack[-1], nid)
    elif k == "comment":
        data, bogus = t[1], t[2]
        nid = -1
        if bogus and len(data) > 1 and data[0] in "!?":
            # xml-declaration recovery from a bogus comment: strip the
            # lead and tail marker chars and re-parse "<content>" with
            # the HTML parser; the first element's name/attrs become the
            # declaration, else it stays a comment
            # (XmlTreeBuilder.insertCommentFor + Comment.asXmlDeclaration,
            # nodes/Comment.kt:53-88)
            content = data[1:-1]
            if not (len(content) > 1 and content[0] in "!?"):
                nid = _decl_from_content(doc, content, data[0] == "!")
        if nid == -1:
            nid = doc.new_node(dom.COMMENT, text=data, ns=dom.NS_XML)
        if tok is not None:
            _leaf_track(nid)
        doc.append_child(stack[-1], nid)
    elif k == "doctype":
        nid = doc.new_node(dom.DOCTYPE, text=t[1] or "", ns=dom.NS_XML)
        doc.attrs[nid] = {"name": t[1] or "", "publicid": t[2] or "",
                          "systemid": t[3] or ""}
        if tok is not None:
            _leaf_track(nid)
        doc.append_child(stack[-1], nid)
    elif k == "start":
        name = t[1]  # case preserved in XML mode
        attrs: dict = {}
        for ak, av in t[2]:
            if ak not in attrs:
                attrs[ak] = av
        nid = doc.new_node(dom.ELEMENT, name, attrs, ns=dom.NS_XML)
        if tok is not None:
            _leaf_track(nid)
            if tok.last_attr_pos:
                ap = {}
                for (raw, _), pos in zip(t[2], tok.last_attr_pos):
                    if raw and raw not in ap:  # first-dup-wins, raw-case
                        ap[raw] = pos
                if ap:
                    doc.attr_src[nid] = ap
            if t[3]:  # self-closing: inserted closed, same range
                doc.src_end_range[nid] = (tok.tok_start, tok.tok_end)
        doc.append_child(stack[-1], nid)
        if not t[3]:  # not self-closing
            stack.append(nid)
        else:
            # remember per tag name for <x /> serialization
            # (Tag.setSelfClosing, parser/Tag.kt:102-105)
            if doc.self_closing is None:
                doc.self_closing = set()
            doc.self_closing.add(name)
    elif k == "end":
        name = t[1]
        # pop to nearest matching open element; ignore if none
        for i in range(len(stack) - 1, 0, -1):
            if doc.tag[stack[i]] == name:
                if tok is not None:
                    # matched element closes explicitly on this token;
                    # anything above it closes implicitly at the token start
                    doc.src_end_range[stack[i]] = (tok.tok_start, tok.tok_end)
                    for x in stack[i + 1:]:
                        doc.src_end_range.setdefault(
                            x, (tok.tok_start, tok.tok_start))
                del stack[i:]
                break


def _decl_from_content(doc, content: str, bang: bool) -> int:
    """Parse declaration content as an HTML fragment and build an XMLDECL
    node from the first element (Comment.asXmlDeclaration, Comment.kt:63-81).
    Returns -1 when the content doesn't yield an element."""
    if not content.strip():
        return -1
    from .treebuilder import parse as _hparse

    hd = _hparse(f"<{content}>")
    body = hd.body()
    if body == -1:
        return -1
    el = next((c for c in hd.children[body] if hd.kind[c] == dom.ELEMENT), -1)
    if el == -1:
        return -1
    attrs = dict(hd.attrs[el] or {})
    if bang:
        attrs["/bang"] = ""  # internal marker: "<!...!>" form
    nid = doc.new_node(dom.XMLDECL, tag=hd.tag[el], attrs=attrs,
                       ns=dom.NS_XML)
    return nid
