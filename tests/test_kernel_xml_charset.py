"""XML mode (parser/XmlTreeBuilderTest.kt semantics) and charset detection
(helper/DataUtilTest.kt, testResources/bomtests semantics)."""

from ksoup_spark.kernel import dom
from ksoup_spark.kernel.charset import (
    charset_from_content_type,
    decode_html_bytes,
    detect_bom,
    sniff_meta_charset,
)
from ksoup_spark.kernel.xml import parse_xml


def test_xml_preserves_case():
    d = parse_xml("<CHECK>One</CHECK><TEST ID=1>Two</TEST>")
    tags = [d.tag[n] for n, _ in d.preorder() if d.kind[n] == dom.ELEMENT]
    assert tags == ["CHECK", "TEST"]
    t = d.find_first("TEST")
    assert d.attrs[t] == {"ID": "1"}


def test_xml_self_closing_any_tag():
    d = parse_xml("<a/><b>x</b>")
    root_kids = [d.tag[c] for c in d.element_children(0)]
    assert root_kids == ["a", "b"]
    a = d.find_first("a")
    assert d.children[a] == []


def test_xml_declaration():
    d = parse_xml('<?xml version="1.0" encoding="UTF-8"?><root>x</root>')
    decls = [n for n, _ in d.preorder() if d.kind[n] == dom.XMLDECL]
    assert len(decls) == 1
    assert d.attrs[decls[0]].get("version") == "1.0"
    assert d.attrs[decls[0]].get("encoding") == "UTF-8"


def test_xml_no_html_rules():
    # no implicit html/body; <p> nests freely
    d = parse_xml("<p><p>nested</p></p>")
    outer = d.element_children(0)
    assert len(outer) == 1
    inner = d.element_children(outer[0])
    assert len(inner) == 1


def test_xml_cdata():
    d = parse_xml("<x><![CDATA[<raw>&amp;]]></x>")
    cd = [n for n, _ in d.preorder() if d.kind[n] == dom.CDATA]
    assert d.text[cd[0]] == "<raw>&amp;"


def test_bom_detection():
    assert detect_bom("﻿hi".encode("utf-8")) == ("utf-8", 3)
    assert detect_bom("﻿hi".encode("utf-16-le"))[0] == "utf-16-le"
    assert detect_bom("﻿hi".encode("utf-16-be"))[0] == "utf-16-be"
    assert detect_bom("﻿hi".encode("utf-32-le"))[0] == "utf-32-le"
    assert detect_bom("﻿hi".encode("utf-32-be"))[0] == "utf-32-be"
    assert detect_bom(b"plain") == (None, 0)


def test_bom_overrides_meta():
    data = '﻿<meta charset="iso-8859-1"><p>héllo</p>'.encode("utf-8")
    s = decode_html_bytes(data)
    assert "héllo" in s and not s.startswith("﻿")


def test_meta_charset_sniff():
    data = '<html><head><meta charset="iso-8859-5"></head></html>'.encode("ascii")
    assert sniff_meta_charset(data) == "iso-8859-5"
    data2 = b'<meta http-equiv="Content-Type" content="text/html; charset=gb2312">'
    assert sniff_meta_charset(data2) == "gb2312"


def test_meta_charset_redecode():
    body = "<meta charset=iso-8859-1><p>caf\xe9</p>"
    data = body.encode("iso-8859-1")
    assert "café" in decode_html_bytes(data)


def test_xml_decl_encoding():
    data = '<?xml version="1.0" encoding="ISO-8859-1"?><x>caf\xe9</x>'.encode("iso-8859-1")
    assert "café" in decode_html_bytes(data)


def test_charset_from_content_type():
    assert charset_from_content_type("text/html; charset=utf-8") == "utf-8"
    assert charset_from_content_type('text/html; charset="gb2312"') == "gb2312"
    assert charset_from_content_type("text/html") is None
    assert charset_from_content_type(None) is None


def test_gzip_transparent():
    import gzip
    data = gzip.compress("<p>zipped</p>".encode("utf-8"))
    assert "zipped" in decode_html_bytes(data)


def test_xml_pop_to_close():
    # XmlTreeBuilderTest.testPopToClose: </bar> with no open bar is ignored
    from ksoup_spark.kernel import textops as tx
    d = parse_xml("<doc><val>One<val>Two</val></bar>Three</doc>")
    docel = d.element_children(0)[0]
    assert tx.element_text(d, docel) == "OneTwoThree"
    vals = [n for n, _ in d.preorder() if d.tag[n] == "val"]
    assert len(vals) == 2


def test_xml_br_not_forced_void():
    # testDoesNotForceSelfClosingKnownTags: XML <br>one</br> keeps content
    d = parse_xml("<br>one</br>")
    br = d.find_first("br")
    assert [d.text[c] for c in d.children[br]] == ["one"]


def test_xml_eof_in_tag_emits_pending():
    # testDoesHandleEOFInTag (TokeniserState BeforeAttributeValue EOF)
    d = parse_xml('<img src=asdf onerror="alert(1)" x=')
    img = d.find_first("img")
    assert d.attrs[img] == {"src": "asdf", "onerror": "alert(1)", "x": ""}


def test_xml_declaration_attributes():
    d = parse_xml('<?xml version="1" encoding="UTF-8" something="else"?><val>One</val>')
    decl = [n for n, _ in d.preorder() if d.kind[n] == dom.XMLDECL][0]
    assert d.attrs[decl] == {"version": "1", "encoding": "UTF-8",
                             "something": "else"}


def test_xml_cdata_roundtrip():
    from ksoup_spark.kernel import textops as tx
    d = parse_xml('<div id=1><![CDATA[\n<html>\n <foo><&amp;]]></div>')
    div = d.find_first("div")
    assert tx.element_text(d, div) == "<html>\n <foo><&amp;"
    assert d.element_children(div) == []
    assert len(d.children[div]) == 1


import glob as _glob
import os as _os

_BOM_DIR = "/root/reference/ksoup-test/testResources/bomtests"


def test_reference_bom_fixtures():
    """DataUtilTest BOM fixtures: all five BOM encodings + gzip decode to
    readable documents with correct titles."""
    import pytest as _pytest
    if not _os.path.isdir(_BOM_DIR):
        _pytest.skip("reference BOM fixtures not available")
    from ksoup_spark.kernel import treebuilder as tb
    from ksoup_spark.kernel.textops import doc_title
    titles = {}
    for f in sorted(_glob.glob(f"{_BOM_DIR}/*")):
        d = tb.parse(decode_html_bytes(open(f, "rb").read()))
        titles[_os.path.basename(f)] = doc_title(d)
    assert titles["bom_utf16be.html"] == "UTF-16BE Encoded Korean Page with BOM"
    assert titles["bom_utf16le.html"] == "UTF-16LE Encoded Korean Page with BOM"
    assert titles["bom_utf32be.html"] == "UTF-32BE Encoded Korean Page with BOM"
    assert titles["bom_utf32le.html"] == "UTF-32LE Encoded Korean Page with BOM"
    assert titles["bom_utf8.html"] == "OK"
    assert titles["bom_utf8.html.gz"] == "OK"
