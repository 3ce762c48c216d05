"""DataUtilTest.kt ports not already covered by test_kernel_xml_charset:
content-type charset validation, spurious-BOM discard, wrong-meta fallback
serialization, meta-charset decode priority, and gzip file handling
(helper/DataUtilTest.kt)."""

import gzip
import os

import pytest

from ksoup_spark.kernel import textops as tx
from ksoup_spark.kernel.charset import (
    charset_from_content_type,
    decode_html_bytes,
)
from ksoup_spark.kernel.selector import select_first
from ksoup_spark.kernel.serialize import outer_html
from ksoup_spark.kernel.textops import doc_title, element_text
from ksoup_spark.kernel.treebuilder import parse

_HTMLTESTS = "/root/reference/ksoup-test/testResources/htmltests"


def test_charset_rejects_unknown_names():
    # DataUtilTest.testCharset / testQuotedCharset: names that aren't real
    # charsets come back null
    assert charset_from_content_type("text/html;charset=utf-8 ") == "utf-8"
    assert charset_from_content_type("text/html; charset=UTF-8") == "UTF-8"
    assert charset_from_content_type("text/html; charset=ISO-8859-1") == "ISO-8859-1"
    assert charset_from_content_type("text/html;charset=Unknown") is None
    assert charset_from_content_type('text/html; charset="utf-8"') == "utf-8"
    assert charset_from_content_type('text/html; charset="Unsupported"') is None
    assert charset_from_content_type("text/html; charset='UTF-8'") == "UTF-8"


def test_charset_empty_and_malformed():
    # shouldNotThrowExceptionOnEmptyCharset
    assert charset_from_content_type("text/html; charset=") is None
    assert charset_from_content_type("text/html; charset=;") is None
    # shouldReturnNullForIllegalCharsetNames
    assert charset_from_content_type("text/html; charset=$HJKDF§$/(") is None


def test_charset_first_of_multiple():
    # shouldSelectFirstCharsetOnWeirdMultileCharsetsInMetaTags
    assert charset_from_content_type(
        "text/html; charset=ISO-8859-1, charset=1251") == "ISO-8859-1"


def test_charset_duplicate_charset_string():
    # shouldCorrectCharsetForDuplicateCharsetString
    assert charset_from_content_type(
        "text/html; charset=charset=iso-8859-1") == "iso-8859-1"


def test_discards_spurious_byte_order_mark():
    # discardsSpuriousByteOrderMark(+WhenNoCharsetSet): a UTF-8 BOM is
    # consumed whether or not a charset was supplied
    html = "﻿<html><head><title>One</title></head><body>Two</body></html>"
    for hint in ("UTF-8", None):
        d = parse(decode_html_bytes(html.encode("utf-8"), hint))
        assert element_text(d, d.head()) == "One"


def test_wrong_meta_charset_fallback():
    # wrongMetaCharsetFallback: invalid declared charset (iso-8) falls back
    # to UTF-8 and the doc round-trips
    html = b"<html><head><meta charset=iso-8></head><body></body></html>"
    d = parse(decode_html_bytes(html, None))
    expected = ('<html>\n <head>\n  <meta charset="iso-8">\n </head>\n'
                ' <body></body>\n</html>')
    assert outer_html(d, d.html_el(), pretty=True) == expected


def test_second_meta_with_charset_parameter():
    # secondMetaElementWithContentTypeContainsCharsetParameter (euc-kr)
    html = ('<html><head>'
            '<meta http-equiv="Content-Type" content="text/html">'
            '<meta http-equiv="Content-Type" content="text/html; charset=euc-kr">'
            '</head><body>한국어</body></html>')
    d = parse(decode_html_bytes(html.encode("euc-kr"), None))
    assert element_text(d, d.body()) == "한국어"


def test_first_meta_with_charset_wins():
    # firstMetaElementWithCharsetShouldBeUsedForDecoding
    html = ('<html><head>'
            '<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
            '<meta http-equiv="Content-Type" content="text/html; charset=koi8-u">'
            '</head><body>Übergrößenträger</body></html>')
    d = parse(decode_html_bytes(html.encode("iso-8859-1"), None))
    assert element_text(d, d.body()) == "Übergrößenträger"


def test_no_extra_null_bytes():
    # noExtraNULLBytes
    b = ('<html><head><meta charset="UTF-8"></head>'
         '<body><div><u>ü</u>ü</div></body></html>').encode("utf-8")
    d = parse(decode_html_bytes(b, None))
    assert "\x00" not in outer_html(d, 0)


def test_supports_xml_charset_declaration():
    # supportsXmlCharsetDeclaration: html parse of an XHTML doc whose only
    # charset signal is the XML declaration
    enc = "iso-8859-1"
    soup = ('<?xml version="1.0" encoding="iso-8859-1"?>'
            '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" '
            '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">'
            '<html xmlns="http://www.w3.org/1999/xhtml" lang="en" xml:lang="en">'
            'Hellö Wörld!</html>').encode(enc)
    d = parse(decode_html_bytes(soup, None))
    assert element_text(d, d.body()) == "Hellö Wörld!"


@pytest.mark.skipif(not os.path.isdir(_HTMLTESTS),
                    reason="reference html fixtures not available")
class TestGzipFiles:
    def _load(self, name):
        return parse(decode_html_bytes(
            open(os.path.join(_HTMLTESTS, name), "rb").read(), None))

    def test_loads_gzip_file(self):
        # loadsGzipFile
        d = self._load("gzip.html.gz")
        assert doc_title(d) == "Gzip test"
        assert element_text(d, select_first(d, "p")) == \
            "This is a gzipped HTML file."

    def test_loads_z_gzip_file(self):
        # loadsZGzipFile (compressed on win, with .z suffix)
        d = self._load("gzip.html.z")
        assert doc_title(d) == "Gzip test"
        assert element_text(d, select_first(d, "p")) == \
            "This is a gzipped HTML file."

    def test_handles_fake_gzip_file(self):
        # handlesFakeGzipFile: .gz name but plain content reads as-is
        d = self._load("fake-gzip.html.gz")
        assert doc_title(d) == "This is not gzipped"
        assert element_text(d, select_first(d, "p")) == \
            "And should still be readable."

    def test_supports_zipped_utf8_bom(self):
        # supportsZippedUTF8BOM
        path = "/root/reference/ksoup-test/testResources/bomtests/bom_utf8.html.gz"
        if not os.path.exists(path):
            pytest.skip("fixture missing")
        d = parse(decode_html_bytes(open(path, "rb").read(), None))
        assert element_text(d, select_first(d, "title")) == "OK"
        assert element_text(d, d.body()) == (
            "There is a UTF8 BOM at the top (before the XML decl). If not "
            "read correctly, will look like a non-joining space.")

    def test_chunked_vs_string_parse_same_value(self):
        # handlesChunkedInputStream / testStringVsSourceReaderParse: byte
        # path and string path produce identical documents
        raw = gzip.decompress(
            open(os.path.join(_HTMLTESTS, "large.html.gz"), "rb").read())
        s = raw.decode("utf-8", "replace")
        d1 = parse(decode_html_bytes(raw, None))
        d2 = parse(s)
        assert outer_html(d1, 0) == outer_html(d2, 0)
