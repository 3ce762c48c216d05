"""HTML serialization (outerHtml) — used for parse-golden tests & debugging.

Follows the reference's pretty-printing model
(/root/reference/ksoup/src/com/fleeksoft/ksoup/nodes/Element.kt:1650-1714,
TextNode.kt:61-91, Entities.kt:132-302): block-format elements indent onto
new lines, inline content stays flat, text is whitespace-normalized unless a
preserve-whitespace ancestor applies, and the base entity escapes are applied
(&amp; &lt; &gt; in text; plus &quot; in attributes; nbsp -> &nbsp;).

The span pipeline does not depend on this module; it exists for test parity
with the reference's expected-html assertions.
"""

from __future__ import annotations

from . import dom
from .dom import Doc
from .tags import VOID_TAGS, format_as_block
from .textops import _preserves_ws, normalise_whitespace


def _escape_text(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("\xa0", "&nbsp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def _escape_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("\xa0", "&nbsp;")
        .replace('"', "&quot;")
    )


def _attrs_html(attrs: dict | None) -> str:
    if not attrs:
        return ""
    parts = []
    for k, v in attrs.items():
        if k.startswith("/"):
            continue
        if v is None:
            parts.append(f" {k}")
        else:
            parts.append(f' {k}="{_escape_attr(v)}"')
    return "".join(parts)


def outer_html(doc: Doc, node: int = 0, pretty: bool = True) -> str:
    out: list[str] = []
    _emit(doc, node, 0, out, pretty)
    return "".join(out).strip("\n")


def inner_html(doc: Doc, node: int, pretty: bool = True) -> str:
    out: list[str] = []
    for c in doc.children[node]:
        _emit(doc, c, 0, out, pretty)
    return "".join(out).strip("\n") if pretty else "".join(out)


def _is_blank(s: str) -> bool:
    return not s.strip(" \t\n\r\f")


def _emit(doc: Doc, node: int, depth: int, out: list[str], pretty: bool) -> None:
    k = doc.kind[node]
    if k == dom.DOCUMENT:
        for c in doc.children[node]:
            _emit(doc, c, depth, out, pretty)
        return
    indent = "\n" + " " * depth if pretty else ""
    if k == dom.ELEMENT:
        tag = doc.tag[node] or ""
        block = pretty and format_as_block(tag)
        if block and out and not (out and out[-1].endswith("\n" + " " * depth)):
            out.append(indent)
        elif pretty and out and tag in ("html", "head", "body", "title") :
            out.append(indent)
        out.append(f"<{tag}{_attrs_html(doc.attrs[node])}")
        kids = doc.children[node]
        if tag in VOID_TAGS:
            out.append(">" if doc.ns[node] == dom.NS_HTML else " />")
            return
        if not kids and doc.ns[node] != dom.NS_HTML:
            out.append("></" + tag + ">")
            return
        out.append(">")
        for c in kids:
            _emit(doc, c, depth + 1, out, pretty)
        if block and any(
            doc.kind[c] == dom.ELEMENT and format_as_block(doc.tag[c] or "")
            for c in kids
        ):
            out.append(indent)
        out.append(f"</{tag}>")
        return
    if k in (dom.TEXT,):
        t = doc.text[node] or ""
        if pretty and not _preserves_ws(doc, doc.parent[node]):
            t = normalise_whitespace(t)
            if _is_blank(t):
                return
        out.append(_escape_text(t))
        return
    if k == dom.CDATA:
        out.append(f"<![CDATA[{doc.text[node] or ''}]]>")
        return
    if k == dom.DATA:
        out.append(doc.text[node] or "")
        return
    if k == dom.COMMENT:
        out.append(f"{indent if pretty else ''}<!--{doc.text[node] or ''}-->")
        return
    if k == dom.DOCTYPE:
        a = doc.attrs[node] or {}
        name = a.get("name", "")
        pub = a.get("publicid", "")
        sysid = a.get("systemid", "")
        s = f"<!doctype {name}" if name else "<!doctype"
        if pub:
            s += f' PUBLIC "{pub}"'
        if sysid:
            s += f' "{sysid}"'
        out.append(s + ">")
        return
    if k == dom.XMLDECL:
        out.append(f"<?{doc.text[node] or ''}?>")
        return
