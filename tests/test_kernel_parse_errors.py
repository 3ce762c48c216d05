"""Parse-error tracking (Parser.setTrackErrors / ParseErrorList /
ParseError semantics): ports of the reference goldens in
ksoup-test/test/com/fleeksoft/ksoup/parser/HtmlParserTest.kt:1063-1120."""

from ksoup_spark.kernel.treebuilder import parse, parse_body_fragment


def test_tracks_errors_when_requested():
    html = ("<p>One</p href='no'>\n<!DOCTYPE html>\n&arrgh;"
            "<font />&#33 &amp &#x110000;<br /></div><foo")
    doc = parse(html, "http://example.com", track_errors=500)
    assert doc.parse_errors == [
        "<1:21>: Attributes incorrectly present on end tag [/p]",
        "<2:16>: Unexpected Doctype token [<!doctype html>] "
        "when in state [InBody]",
        "<3:2>: Invalid character reference: invalid named reference [arrgh]",
        "<3:16>: Tag [font] cannot be self closing; not a void tag",
        "<3:20>: Invalid character reference: missing semicolon on [&#33]",
        "<3:25>: Invalid character reference: missing semicolon on [&amp]",
        "<3:36>: Invalid character reference: character [1114112] "
        "outside of valid range",
        "<3:48>: Unexpected EndTag token [</div>] when in state [InBody]",
        "<3:53>: Unexpectedly reached end of file (EOF) "
        "in input state [TagName]",
    ]


def test_tracks_limited_errors_when_requested():
    html = "<p>One</p href='no'>\n<!DOCTYPE html>\n&arrgh;<font /><br /><foo"
    doc = parse(html, "http://example.com", track_errors=3)
    assert doc.parse_errors == [
        "<1:21>: Attributes incorrectly present on end tag [/p]",
        "<2:16>: Unexpected Doctype token [<!doctype html>] "
        "when in state [InBody]",
        "<3:2>: Invalid character reference: invalid named reference [arrgh]",
    ]


def test_no_errors_by_default():
    doc = parse("<p>One</p href='no'>&arrgh;<font /><br /><foo")
    assert doc.parse_errors == []


def test_optional_p_closers_are_not_errors():
    doc = parse("<body><div><p>One<p>Two</div></body>", track_errors=128)
    assert doc.parse_errors == []


def test_duplicate_attributes_error():
    doc = parse("<p id=a id=b>x</p>", track_errors=10)
    assert any("Dropped duplicate attribute(s) in tag [p]" in e
               for e in doc.parse_errors)


def test_eof_in_attribute_value():
    doc = parse('<p id="unclosed', track_errors=10)
    assert any("AttributeValue_doubleQuoted" in e for e in doc.parse_errors)


def test_fragment_parse_tracks_errors():
    doc = parse_body_fragment("<p>a</p b='c'>", track_errors=10)
    assert doc.parse_errors == [
        "<1:15>: Attributes incorrectly present on end tag [/p]"]


def test_error_cap_respected():
    html = "&arrgh; " * 50
    doc = parse(html, track_errors=7)
    assert len(doc.parse_errors) == 7


def test_xml_parse_tracks_tokenizer_errors():
    from ksoup_spark.kernel.xml import parse_xml

    doc = parse_xml("<root>&arrgh; ok</p bad='1'></root>", track_errors=10)
    assert any("invalid named reference [arrgh]" in e
               for e in doc.parse_errors)
    assert any("Attributes incorrectly present on end tag [/p]" in e
               for e in doc.parse_errors)
