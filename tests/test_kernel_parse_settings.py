"""ParseSettings case preservation (parser/ParseSettings.kt, ported from
ksoup-test/test/com/fleeksoft/ksoup/parser/ParserSettingsTest.kt), plus
HTML-level preserve-case parse/serialize behavior."""

from ksoup_spark.kernel import selector as sel
from ksoup_spark.kernel.parse_settings import (
    HTML_DEFAULT,
    PRESERVE_CASE,
    ParseSettings,
    normal_name,
)
from ksoup_spark.kernel.serialize import inner_html, outer_html
from ksoup_spark.kernel.treebuilder import parse


def test_case_support():
    both_on = ParseSettings(True, True)
    both_off = ParseSettings(False, False)
    tag_on = ParseSettings(True, False)
    attr_on = ParseSettings(False, True)
    assert both_on.normalize_tag("IMG") == "IMG"
    assert both_on.normalize_attribute("ID") == "ID"
    assert both_off.normalize_tag("IMG") == "img"
    assert both_off.normalize_attribute("ID") == "id"
    assert tag_on.normalize_tag("IMG") == "IMG"
    assert tag_on.normalize_attribute("ID") == "id"
    assert attr_on.normalize_tag("IMG") == "img"
    assert attr_on.normalize_attribute("ID") == "ID"


def test_attribute_case_normalization():
    assert ParseSettings(False, False).normalize_attribute("HIDDEN") == "hidden"
    assert normal_name(" DIV ") == "div"


def test_html_default_lowercases():
    d = parse("<DIV ID=One><P>x</P></DIV>")
    body = d.body()
    div = d.children[body][0]
    assert d.tag[div] == "div" and d.get_attr(div, "id") == "One"
    assert 'id="One"' in outer_html(d, div, pretty=False)


def test_preserve_case_parse_and_serialize():
    d = parse("<DIV ID=One><P CLASS=a>x</P><IMG SRC=i.png></DIV>",
              settings=PRESERVE_CASE)
    body = d.body()
    div = d.children[body][0]
    # normalized names drive the algorithm; display case survives output
    assert d.tag[div] == "div"
    got = inner_html(d, body, pretty=False)
    assert got == ('<DIV ID="One"><P CLASS="a">x</P><IMG SRC="i.png"></DIV>')


def test_preserve_case_selectors_still_match_normalized():
    d = parse("<DIV><SPAN CLASS=w>x</SPAN></DIV>", settings=PRESERVE_CASE)
    assert len(sel.select(d, sel.parse_query("div span"))) == 1
    # attribute selector on preserved-case attr: case-insensitive key lookup
    assert len(sel.select(d, sel.parse_query("span[class=w]"))) == 1


def test_preserve_tag_only():
    d = parse("<DIV ID=One>x</DIV>", settings=ParseSettings(True, False))
    body = d.body()
    out = inner_html(d, body, pretty=False)
    assert out == '<DIV id="One">x</DIV>'


def test_html_default_is_shared_default():
    assert not HTML_DEFAULT.preserve_tag_case
    assert not HTML_DEFAULT.preserve_attribute_case
