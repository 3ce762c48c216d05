"""Golden expectations lifted from the reference's own tests
(ksoup-test/test/com/fleeksoft/ksoup/parser/HtmlParserTest.kt:560-700 region
and related), asserted structurally (selects/text/tree shape)."""

from ksoup_spark.kernel import dom
from ksoup_spark.kernel import selector as sel
from ksoup_spark.kernel import textops as tx
from ksoup_spark.kernel import treebuilder as tb


def test_handles_known_empty_iframe():
    # HtmlParserTest.handlesKnownEmptyIframe
    d = tb.parse("<p>One</p><iframe id=1 /><p>Two")
    ps = sel.select(d, "p")
    assert [tx.element_text(d, p) for p in ps] == ["One", "Two"]
    iframe = d.find_first("iframe")
    assert d.children[iframe] == []


def test_handles_solidus_at_attribute_end():
    # <a href=/>link</a> -> href="/"
    d = tb.parse("<a href=/>link</a>")
    a = d.find_first("a")
    assert d.get_attr(a, "href") == "/"
    assert tx.element_text(d, a) == "link"


def test_handles_multi_closing_body():
    d = tb.parse("<body><p>Hello</body><p>there</p></body></body></html><p>now")
    assert len(sel.select(d, "p")) == 3
    assert len(d.element_children(d.body())) == 3


def test_no_auto_dl():
    # handlesUnclosedDefinitionLists: no <dl> auto-created
    d = tb.parse("<dt>Foo<dd>Bar<dt>Qux<dd>Zug")
    assert sel.select(d, "dl") == []
    assert len(sel.select(d, "dt, dd")) == 4
    dts = sel.select(d, "dt")
    assert len(dts) == 2
    # next element sibling of second dt is the dd holding "Zug"
    p = d.parent[dts[1]]
    sibs = d.element_children(p)
    nxt = sibs[sibs.index(dts[1]) + 1]
    assert tx.element_text(d, nxt) == "Zug"


def test_blocks_in_definitions():
    d = tb.parse("<dl><dt><div id=1>Term</div></dt><dd><div id=2>Def</div></dd></dl>")
    one = sel.select_first(d, "#1")
    two = sel.select_first(d, "#2")
    assert d.tag[d.parent[one]] == "dt"
    assert d.tag[d.parent[two]] == "dd"


def test_handles_frames_no_body():
    d = tb.parse("<html><head><script></script><noscript></noscript></head>"
                 "<frameset><frame src=foo></frame><frame src=foo></frameset></html>")
    fs = d.find_first("frameset")
    assert fs != -1
    frames = sel.select(d, "frame")
    assert len(frames) == 2
    # no body auto-vivification
    assert all(d.tag[c] != "body" for c in d.element_children(d.html_el()))


def test_ignores_content_after_frameset():
    d = tb.parse("<html><head><title>One</title></head><frameset>"
                 "<frame /><frame /></frameset><table></table></html>")
    assert d.find_first("table") == -1
    assert len(sel.select(d, "frame")) == 2


def test_javadoc_font():
    d = tb.parse('<TD BGCOLOR="#EEEEFF" CLASS="NavBarCell1">    '
                 '<A HREF="deprecated-list.html"><FONT CLASS="NavBarFont1">'
                 "<B>Deprecated</B></FONT></A>&nbsp;</TD>")
    a = sel.select_first(d, "a")
    assert tx.element_text(d, a) == "Deprecated"
    kids = d.element_children(a)
    assert d.tag[kids[0]] == "font"
    assert d.tag[d.element_children(kids[0])[0]] == "b"


def test_base_without_href():
    d = tb.parse("<head><base target='_blank'></head><body><a href=/foo>Test</a></body>",
                 base_uri="http://example.com/")
    a = sel.select_first(d, "a")
    assert d.get_attr(a, "href") == "/foo"
    assert d.abs_url(a, "href") == "http://example.com/foo"


def test_normalises_document_content_to_body():
    d = tb.parse("<!doctype html>One<html>Two<head>Three<link></head>Four"
                 "<body>Five </body>Six </html>Seven ")
    body = d.body()
    assert tx.element_text(d, body) == "OneTwoThree FourFive Six Seven"
    # link ends up in body (content before head forces body mode)
    link = d.find_first("link")
    assert d.tag[d.parent[link]] == "body"


def test_normalises_empty_document():
    d = tb.parse("")
    assert d.html_el() != -1
    assert d.head() != -1
    assert d.body() != -1


def test_body_after_content_attrs_merged():
    # normalisedBodyAfterContent
    d = tb.parse("<font face=Arial><body class=name><div>One</div></body></font>")
    body = d.body()
    assert d.get_attr(body, "class") == "name"
    assert tx.element_text(d, body) == "One"


def test_empty_anchor_edge_cases():
    for h in ("<a />One", "<a/>One", "<a></a>One"):
        d = tb.parse(h)
        assert tx.element_text(d, d.body()) == "One"


def test_nbsp_entity_is_text_whitespace():
    d = tb.parse("<p>a&nbsp;b</p>")
    # text() collapses nbsp to plain space; wholeText keeps U+00A0
    assert tx.element_text(d, d.body()) == "a b"
    assert tx.whole_text(d, d.body()) == "a b"


def test_input_in_table_hidden_stays():
    # handlesInputInTable
    h = ('<body>\n<input type="hidden" name="a" value="">\n<table>\n'
         '<input type="hidden" name="b" value="" />\n</table>\n</body>')
    d = tb.parse(h)
    assert len(sel.select(d, "table input")) == 1
    assert len(sel.select(d, "input")) == 2


def test_image_to_img_except_svg():
    # convertsImageToImg
    d = tb.parse("<body><image><svg><image /></svg></body>")
    assert d.find_first("img") != -1
    svg = d.find_first("svg")
    kids = d.element_children(svg)
    assert kids and d.tag[kids[0]] == "image"


def test_invalid_doctypes_no_crash():
    for h in ["<!DOCTYPE>", "<!DOCTYPE><html><p>Foo</p></html>", "<!DOCTYPE \x00>"]:
        tb.parse(h)


def test_many_children_scale():
    # handlesManyChildren: 25k text+br pairs parse fast, 50k body children
    body = "".join(f"{i}<br>" for i in range(25000))
    d = tb.parse_body_fragment(body)
    assert len(d.children[d.body()]) == 50000


def test_th_reinsertion_mode():
    # testReinsertionModeForThCelss
    d = tb.parse("<body> <table> <tr> <th> <table><tr><td></td></tr></table> "
                 "<div> <table><tr><td></td></tr></table> </div> <div></div> "
                 "<div></div> <div></div> </th> </tr> </table> </body>")
    assert len(d.element_children(d.body())) == 1


def test_isindex_expansion():
    # testNormalisesIsIndex: legacy isindex -> form/hr/label/input
    d = tb.parse("<body><isindex action='/submit'></body>")
    form = d.find_first("form")
    assert form != -1 and d.get_attr(form, "action") == "/submit"
    label = d.find_first("label")
    assert "searchable index" in tx.element_text(d, label)
    inp = d.find_first("input")
    assert d.get_attr(inp, "name") == "isindex"
    assert len(sel.select(d, "form > hr")) == 2
