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


def parse_xml(xml: str, base_uri: str = "") -> Doc:
    doc = Doc()
    doc.base_uri = base_uri
    tok = Tokenizer(xml)
    stack: list[int] = [0]
    while True:
        t = tok.next_token()
        k = t[0]
        if k == "eof":
            break
        if k == "text":
            nid = doc.new_node(dom.TEXT, text=t[1], ns=dom.NS_XML)
            doc.append_child(stack[-1], nid)
        elif k == "cdata":
            nid = doc.new_node(dom.CDATA, text=t[1], ns=dom.NS_XML)
            doc.append_child(stack[-1], nid)
        elif k == "comment":
            data, bogus = t[1], t[2]
            if bogus and data.startswith("?") is False and data.endswith("?"):
                # tokenizer strips '<?', keeps trailing '?'; e.g. '?xml ... ?'
                pass
            if bogus and data.endswith("?"):
                # <?xml version="1.0"?> style declaration
                nid = doc.new_node(dom.XMLDECL, text=data.rstrip("?"), ns=dom.NS_XML)
                decl = data.rstrip("?")
                parts = decl.split(None, 1)
                name = parts[0] if parts else ""
                attrs: dict = {}
                if len(parts) > 1:
                    import re as _re
                    for m in _re.finditer(
                        r'([^\s=]+)\s*=\s*("([^"]*)"|\'([^\']*)\'|(\S+))', parts[1]
                    ):
                        attrs[m.group(1)] = (
                            m.group(3) if m.group(3) is not None
                            else m.group(4) if m.group(4) is not None
                            else m.group(5)
                        )
                doc.tag[nid] = name
                doc.attrs[nid] = attrs
                doc.append_child(stack[-1], nid)
            else:
                nid = doc.new_node(dom.COMMENT, text=data, ns=dom.NS_XML)
                doc.append_child(stack[-1], nid)
        elif k == "doctype":
            nid = doc.new_node(dom.DOCTYPE, text=t[1] or "", ns=dom.NS_XML)
            doc.attrs[nid] = {"name": t[1] or "", "publicid": t[2] or "",
                              "systemid": t[3] or ""}
            doc.append_child(stack[-1], nid)
        elif k == "start":
            name = t[1]  # case preserved in XML mode
            attrs: dict = {}
            for ak, av in t[2]:
                if ak not in attrs:
                    attrs[ak] = av
            nid = doc.new_node(dom.ELEMENT, name, attrs, ns=dom.NS_XML)
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
                    del stack[i:]
                    break
    return doc
