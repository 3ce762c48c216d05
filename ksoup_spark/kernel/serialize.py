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

import re

from . import dom
from .dom import Doc
from .tags import VOID_TAGS, format_as_block
from .textops import _preserves_ws, normalise_whitespace


# output charset for the encodability fallback; None = no fallback (UTF).
# Set by outer_html for the duration of one serialization — the kernel is
# single-threaded per document (Parser.kt:13-14), so a module slot is safe.
_OUT_CHARSET: str | None = None
# escape mode (Entities.EscapeMode, Entities.kt:36-63): "xhtml" = the 4 XML
# entities only (nbsp goes numeric), "base" = HTML 4 core set (default),
# "extended" = prefer a named entity for chars the charset can't encode
_OUT_MODE: str = "base"


# ascii control chars < 0x20 other than \t \n \r escape numerically for XML
# compliance / readability (Entities.kt:236-243)
_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _escape_ctrl(s: str) -> str:
    return _CTRL_RE.sub(lambda m: f"&#x{ord(m.group()):x};", s)


def _nbsp_ref() -> str:
    # xhtml escape mode has no &nbsp; entity -> numeric (Entities.kt:40-44)
    return "&#xa0;" if _OUT_MODE == "xhtml" else "&nbsp;"


def _escape_text(s: str) -> str:
    s = (
        s.replace("&", "&amp;")
        .replace("\xa0", _nbsp_ref())
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )
    if _CTRL_RE.search(s):
        s = _escape_ctrl(s)
    if _OUT_CHARSET:
        s = _escape_unencodable(s, _OUT_CHARSET)
    return s


def _escape_attr(s: str, xml: bool = False) -> str:
    s = (
        s.replace("&", "&amp;")
        .replace("\xa0", _nbsp_ref())
        .replace('"', "&quot;")
    )
    if xml:
        # XML syntax requires &lt; in attribute values (Entities.kt:33-42);
        # HTML attribute values keep a literal '<'
        s = s.replace("<", "&lt;")
    if _CTRL_RE.search(s):
        s = _escape_ctrl(s)
    if _OUT_CHARSET:
        s = _escape_unencodable(s, _OUT_CHARSET)
    return s


# invalid chars in serialized HTML attribute names; runs are coerced to "_",
# un-coercible keys are dropped (Attribute.getValidKey, nodes/Attribute.kt:
# 256-315)
_BAD_ATTR_KEY = re.compile("[\x00-\x1f\x7f-\x9f \"'/=]+")


def _valid_key(k: str) -> str | None:
    if _BAD_ATTR_KEY.search(k):
        k = _BAD_ATTR_KEY.sub("_", k)
    return k or None


def _attrs_html(attrs: dict | None, xml: bool = False) -> str:
    if not attrs:
        return ""
    parts = []
    for k, v in attrs.items():
        if k.startswith("/"):
            continue
        k = _valid_key(k)
        if k is None:
            continue
        if v is None:
            parts.append(f" {k}")
        else:
            parts.append(f' {k}="{_escape_attr(v, xml)}"')
    return "".join(parts)


def outer_html(doc: Doc, node: int = 0, pretty: bool = True,
               charset: str | None = None,
               escape_mode: str = "base") -> str:
    """Serialize to HTML with OutputSettings semantics:

    - ``charset``: for non-UTF output charsets, characters they cannot
      encode escape as references — the charset-encodability fallback
      (nodes/Entities.kt:206-302, canEncode + ``&#x...;``);
    - ``escape_mode``: "xhtml" (4 XML entities, nbsp numeric), "base"
      (HTML core set, default), or "extended" (prefer named entities for
      unencodable chars) — Entities.EscapeMode (Entities.kt:36-63).
    """
    global _OUT_CHARSET, _OUT_MODE
    if charset and charset.lower().replace("_", "-") not in (
            "utf-8", "utf8", "utf-16", "utf-32"):
        _OUT_CHARSET = charset
    _OUT_MODE = escape_mode
    out: list[str] = []
    try:
        _emit(doc, node, 0, out, pretty)
    finally:
        _OUT_CHARSET = None
        _OUT_MODE = "base"
    return "".join(out).strip("\n")


def _escape_unencodable(s: str, charset: str) -> str:
    """Replace chars the target charset cannot encode with a named entity
    (extended escape mode) or ``&#xN;`` (Entities.kt:246-276 fallback)."""
    try:
        s.encode(charset)
        return s
    except LookupError:
        return s  # unknown charset name: no encodability constraint to apply
    except UnicodeEncodeError:
        pass
    rev = _extended_rev() if _OUT_MODE == "extended" else None
    out: list[str] = []
    for ch in s:
        try:
            ch.encode(charset)
            out.append(ch)
        except UnicodeEncodeError:
            name = rev.get(ch) if rev else None
            out.append(f"&{name};" if name else f"&#x{ord(ch):x};")
    return "".join(out)


_EXTENDED_REV: dict[str, str] | None = None


def _extended_rev() -> dict[str, str]:
    """char -> entity name, from the full WHATWG table (the reference's
    extended EscapeMode map, Entities.kt:393-408; 2125 names). Deterministic
    choice: lexicographically smallest name per char."""
    global _EXTENDED_REV
    if _EXTENDED_REV is None:
        from html.entities import html5

        rev: dict[str, str] = {}
        for name, value in html5.items():
            if not name.endswith(";") or len(value) != 1:
                continue
            n = name[:-1]
            if value not in rev or (not n.islower(), n) < \
                    (not rev[value].islower(), rev[value]):
                rev[value] = n
        _EXTENDED_REV = rev
    return _EXTENDED_REV


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
        if doc.pseudo is not None and node in doc.pseudo:
            # PseudoTextElement serializes transparently (children only) —
            # outerHtmlHead/Tail are no-ops (nodes/PseudoTextElement.kt:12-24)
            for c in doc.children[node]:
                _emit(doc, c, depth, out, pretty)
            return
        norm_tag = doc.tag[node] or ""
        tag = norm_tag
        if doc.tag_display is not None:
            # ParseSettings.preserveCase: serialize source-cased names;
            # matching/layout/void decisions still use the normalized name
            tag = doc.tag_display.get(node, tag)
        block = pretty and format_as_block(norm_tag)
        if block and out and not (out and out[-1].endswith("\n" + " " * depth)):
            out.append(indent)
        elif pretty and out and norm_tag in ("html", "head", "body", "title"):
            out.append(indent)
        out.append(f"<{tag}"
                   f"{_attrs_html(doc.attrs[node], doc.ns[node] == dom.NS_XML)}")
        kids = doc.children[node]
        if norm_tag in VOID_TAGS and doc.ns[node] != dom.NS_XML:
            # void semantics are an HTML-parser notion; XML elements named
            # like voids (<link>One</link>) keep their children
            out.append(">" if doc.ns[node] == dom.NS_HTML else " />")
            return
        if not kids and doc.self_closing and norm_tag in doc.self_closing:
            # tag name seen self-closing (unknown/foreign/XML):
            # "<x />" (Element.outerHtmlHead, Element.kt:1666-1674)
            out.append(" />")
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
        # XML syntax preserves the DOCTYPE keyword form
        kw = "<!DOCTYPE" if doc.ns[node] == dom.NS_XML else "<!doctype"
        s = f"{kw} {name}" if name else kw
        if pub:
            s += f' PUBLIC "{pub}"'
        if sysid:
            s += f' "{sysid}"'
        out.append(s + ">")
        return
    if k == dom.XMLDECL:
        # <?name attrs?> or <!name attrs!> (XmlDeclaration.outerHtmlHead,
        # nodes/XmlDeclaration.kt:58-70); legacy text payload as fallback
        tag = doc.tag[node]
        if tag:
            a = doc.attrs[node] or {}
            lead = "!" if "/bang" in a else "?"
            out.append(f"<{lead}{tag}{_attrs_html(a, xml=True)}{lead}>")
        else:
            out.append(f"<?{doc.text[node] or ''}?>")
        return
