"""Charset detection & byte decoding for HTML documents.

Mirrors the reference's DataUtil pipeline
(/root/reference/ksoup/src/com/fleeksoft/ksoup/helper/DataUtil.kt:38-259):

1. BOM sniff (UTF-8 / UTF-16LE/BE / UTF-32LE/BE); a BOM overrides everything
   and is consumed (DataUtil.kt:99-100, 235-259).
2. else trial-decode the first 5KB as UTF-8 and look for a declared charset in
   ``meta[http-equiv=content-type]``, ``meta[charset]``, or an XML
   declaration's ``encoding`` (DataUtil.kt:92-155, buffer size :26).
3. re-decode with the declared charset when it differs from UTF-8.

Also: gzip payloads transparently decompressed (Ksoup.parseFile handles .gz,
Ksoup.kt:87-114), and ``charset=`` extraction from Content-Type strings
(DataUtil.kt:198-207).
"""

from __future__ import annotations

import codecs
import gzip
import re

FIRST_READ_SIZE = 5 * 1024

_CHARSET_IN_CONTENT_TYPE = re.compile(
    r"charset=\s*['\"]?([^\s,;'\"]*)", re.IGNORECASE
)
_META_CHARSET = re.compile(
    rb"<meta[^>]+charset\s*=\s*['\"]?\s*([a-zA-Z0-9_\-]+)", re.IGNORECASE
)
_XML_DECL_ENC = re.compile(
    rb"<\?xml[^>]*encoding\s*=\s*['\"]([a-zA-Z0-9_\-]+)['\"]", re.IGNORECASE
)

_BOMS = (
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\xfe\xff", "utf-16-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xef\xbb\xbf", "utf-8"),
)


def charset_from_content_type(content_type: str | None) -> str | None:
    """Regex ``charset=`` out of a Content-Type (DataUtil.kt:198-207)."""
    if not content_type:
        return None
    m = _CHARSET_IN_CONTENT_TYPE.search(content_type)
    if m:
        name = m.group(1).strip().replace("charset=", "")
        return validate_charset(name)
    return None


def validate_charset(name: str | None) -> str | None:
    """None unless ``name`` is a real codec (DataUtil.validateCharset,
    DataUtil.kt:209-218). codecs.lookup, not b"".decode: CPython fast-paths
    empty-bytes decode without consulting the codec registry, so the decode
    probe accepts any name."""
    if not name:
        return None
    name = name.strip().strip("'\"")
    if not name:
        return None
    try:
        codecs.lookup(name)
        return name
    except (LookupError, ValueError):
        return None


def detect_bom(data: bytes) -> tuple[str | None, int]:
    """Returns (charset, bom_length)."""
    for bom, cs in _BOMS:
        if data.startswith(bom):
            return cs, len(bom)
    return None, 0


def sniff_meta_charset(prefix: bytes) -> str | None:
    """Scan a UTF-8-ish prefix for a declared charset."""
    m = _META_CHARSET.search(prefix)
    if m:
        cs = validate_charset(m.group(1).decode("ascii", "ignore"))
        if cs:
            return cs
    m = _XML_DECL_ENC.search(prefix)
    if m:
        return validate_charset(m.group(1).decode("ascii", "ignore"))
    return None


def decode_html_bytes(data: bytes, charset_hint: str | None = None) -> str:
    """bytes -> str with BOM > hint > meta-sniff > UTF-8 priority."""
    if data[:2] == b"\x1f\x8b":  # gzip magic
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    bom_cs, bom_len = detect_bom(data)
    if bom_cs:
        return data[bom_len:].decode(bom_cs, "replace")
    cs = validate_charset(charset_hint)
    if cs is None:
        cs = sniff_meta_charset(data[:FIRST_READ_SIZE])
    if cs is None:
        cs = "utf-8"
    return data.decode(cs, "replace")
