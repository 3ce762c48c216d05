"""Tree-construction / malformed-markup goldens — semantics from
parser/HtmlParserTest.kt (unclosed elements :587/:807/:834/:899-976, implicit
structure :654/:670, tables/foster parenting, adoption agency) and
ParserIT.kt deep-stack bound."""

import time

from ksoup_spark.kernel import dom, serialize
from ksoup_spark.kernel import treebuilder as tb
from ksoup_spark.kernel import textops as tx


def names(d, parent):
    return [d.tag[c] for c in d.element_children(parent)]


def test_simple_document_structure():
    d = tb.parse('<html><head><title>First!</title></head><body><p>First post! <img src="foo.png" /></p></body></html>')
    html = d.html_el()
    assert names(d, html) == ["head", "body"]
    body = d.body()
    p = d.element_children(body)[0]
    assert d.tag[p] == "p"
    assert tx.own_text(d, p) == "First post!"
    img = d.element_children(p)[0]
    assert d.tag[img] == "img"
    assert d.get_attr(img, "src") == "foo.png"


def test_normalises_document():
    # implicit html/head/body creation
    d = tb.parse("<!doctype html>One<html>Two<head>Three<link></head>Four<body>Five </body>Six </html>Seven ")
    assert d.html_el() != -1
    assert d.head() != -1
    assert d.body() != -1
    assert "One" in tx.element_text(d, 0) or "One" in tx.element_text(d, d.body())


def test_normalises_headless_body():
    d = tb.parse("<html><body><span class=\"foo\">bar</span>")
    assert d.head() != -1
    assert tx.element_text(d, d.body()) == "bar"


def test_unclosed_definition_lists():
    d = tb.parse("<dl><dt>a<dd>b<dt>c<dd>d</dl>")
    dl = d.find_first("dl")
    assert names(d, dl) == ["dt", "dd", "dt", "dd"]
    assert tx.element_text(d, d.body()) == "a b c d"


def test_unclosed_formatting_adoption_agency():
    d = tb.parse("<p>1<b>2<i>3</b>4</i>5</p>")
    p = d.find_first("p")
    # <b> contains 2 and <i>3; a cloned <i> holds 4
    b = d.element_children(p)[0]
    assert d.tag[b] == "b"
    assert tx.element_text(d, b) == "23"
    assert tx.element_text(d, p) == "12345"
    # misnested <b><i></b></i>
    d2 = tb.parse("<b>1<i>2</b>3</i>")
    assert tx.element_text(d2, d2.body()) == "123"
    b2 = d2.find_first("b")
    assert tx.element_text(d2, b2) == "12"


def test_unclosed_anchors():
    # HtmlParserTest handlesUnclosedAnchors: </a> with <p> still open splits
    # the anchor around the block (adoption agency)
    d = tb.parse("<a href='http://example.com/'>Link<p>Error link</a>")
    anchors = [n for n, _ in d.preorder() if d.tag[n] == "a"]
    assert len(anchors) == 2
    assert all(d.get_attr(a, "href") == "http://example.com/" for a in anchors)
    p = d.find_first("p")
    assert d.tag[d.parent[anchors[1]]] == "p"
    assert tx.element_text(d, d.body()) == "Link Error link"


def test_unclosed_title_at_eof():
    d = tb.parse("<title>One <b>Two <b>Three</TITLE><p>Test</p>")
    assert tx.doc_title(d) == "One <b>Two <b>Three"
    assert tx.element_text(d, d.body()) == "Test"


def test_unclosed_script_at_eof():
    d = tb.parse("<script>var x = 1;")
    assert tx.data_text(d, d.find_first("script")) == "var x = 1;"


def test_implicit_tbody_tr():
    d = tb.parse("<table><td>one</td></table>")
    t = d.find_first("table")
    tbody = d.element_children(t)[0]
    assert d.tag[tbody] == "tbody"
    tr = d.element_children(tbody)[0]
    assert d.tag[tr] == "tr"
    assert d.tag[d.element_children(tr)[0]] == "td"


def test_foster_parenting():
    d = tb.parse("<table><tr><td>cell</td></tr>stray<tr>")
    body = d.body()
    kids = d.children[body]
    # stray text fostered before the table
    assert d.kind[kids[0]] == dom.TEXT
    assert d.text[kids[0]] == "stray"
    assert d.tag[kids[1]] == "table"


def test_nested_tables():
    d = tb.parse("<table><tr><td><table><tr><td>inner</td></tr></table></td></tr></table>")
    tables = [n for n, _ in d.preorder() if d.tag[n] == "table"]
    assert len(tables) == 2
    assert tx.element_text(d, d.body()) == "inner"


def test_table_in_p_not_closed_in_quirks():
    # quirks mode: <table> does NOT close <p>
    d = tb.parse("<p>one<table><tr><td>two</td></tr></table>")
    p = d.find_first("p")
    assert d.find_first("table", p) != -1


def test_headings_auto_pop():
    d = tb.parse("<h1>One<h2>Two</h2>")
    body = d.body()
    assert names(d, body) == ["h1", "h2"]


def test_li_auto_close():
    d = tb.parse("<ul><li>One<li>Two</ul>")
    ul = d.find_first("ul")
    assert names(d, ul) == ["li", "li"]
    assert tx.element_text(d, ul) == "One Two"


def test_p_closed_by_block():
    d = tb.parse("<p>One<div>Two</div>")
    body = d.body()
    assert names(d, body) == ["p", "div"]


def test_button_scope_p():
    d = tb.parse("<button><p>One<p>Two</button>")
    btn = d.find_first("button")
    assert names(d, btn) == ["p", "p"]


def test_select_option_autoclose():
    d = tb.parse("<select><option>One<option>Two</select>")
    s = d.find_first("select")
    assert names(d, s) == ["option", "option"]


def test_image_renamed_to_img():
    d = tb.parse("<image src=x.png>")
    assert d.find_first("img") != -1
    assert d.find_first("image") == -1


def test_frameset_replaces_body():
    d = tb.parse("<html><frameset><frame src=a></frameset></html>")
    assert d.find_first("frameset") != -1


def test_pre_leading_newline_skipped():
    d = tb.parse("<pre>\nOne\nTwo</pre>")
    assert tx.element_text(d, d.find_first("pre")) == "One\nTwo"


def test_deep_stack_terminates():
    # ParserIT.kt:34-60 scaled down: must terminate fast, no recursion error
    html = "<dl><dd>" * 6000
    t0 = time.time()
    d = tb.parse(html)
    assert time.time() - t0 < 20
    assert len(d.kind) > 10000


def test_attr_flood_capped():
    html = "<div " + " ".join(f"a{i}=x" for i in range(1000)) + ">t</div>"
    d = tb.parse(html)
    n = d.find_first("div")
    assert len(d.attrs[n]) == 512  # Token.kt:354 max attrs


def test_fragment_parse():
    d, nodes = tb.parse_fragment("<td>one</td><td>two</td>", context="tr")
    tags = [d.tag[n] for n in nodes if d.kind[n] == dom.ELEMENT]
    assert tags == ["td", "td"]


def test_body_fragment():
    d = tb.parse_body_fragment("<p>one</p><p>two</p>")
    assert names(d, d.body()) == ["p", "p"]


def test_serialization_roundtrip():
    d = tb.parse("<div><p>Hello <b>world</b></p></div>")
    out = serialize.outer_html(d, d.body(), pretty=False)
    d2 = tb.parse(out)
    assert tx.element_text(d2, d2.body()) == "Hello world"


def test_svg_foreign_content():
    d = tb.parse('<p><svg viewBox="0 0 1 1"><foreignObject><div>html</div></foreignObject></svg>after</p>')
    svg = d.find_first("svg")
    assert svg != -1 and d.ns[svg] == dom.NS_SVG
    assert d.get_attr(svg, "viewBox") == "0 0 1 1"
    fo = d.find_first("foreignObject")
    assert fo != -1
    assert tx.element_text(d, d.body()) == "html after"


def test_foreign_breakout():
    d = tb.parse("<svg><circle/><div>out</div>")
    div = d.find_first("div")
    assert d.ns[div] == dom.NS_HTML
    svg = d.find_first("svg")
    assert d.parent[div] != svg


# -- form control association (HtmlParserTest form tests + FormElement.kt) ---

parse = tb.parse

def test_creates_form_elements():
    # HtmlParserTest.createsFormElements
    from ksoup_spark.kernel import dom, selector as sel

    d = parse("<body><form><input id=1><input id=2></form></body>")
    [form] = sel.select(d, "form")
    controls = dom.form_elements(d, form)
    assert [d.get_attr(c, "id") for c in controls] == ["1", "2"]


def test_associated_form_controls_with_disjoint_forms():
    # HtmlParserTest.associatedFormControlsWithDisjointForms: the form is
    # closed by table parse rules, so the inputs are NOT its children —
    # but stay associated via the parse-time links
    from ksoup_spark.kernel import dom, selector as sel

    d = parse("<table><tr><form><input type=hidden id=1>"
              "<td><input type=text id=2></td><tr></table>")
    [form] = sel.select(d, "form")
    controls = dom.form_elements(d, form)
    assert [d.get_attr(c, "id") for c in controls] == ["1", "2"]
    assert d.children[form] == []  # the form itself ended up empty


def test_form_controls_include_linked_button():
    # FormElement.elements(): linked form-listed controls (button) are
    # included even though they are not in the submittable select set
    from ksoup_spark.kernel import dom, selector as sel

    d = parse("<form><select id=s></select><button id=b>x</button></form>")
    [form] = sel.select(d, "form")
    got = [(d.tag[c], d.get_attr(c, "id")) for c in dom.form_elements(d, form)]
    assert got == [("select", "s"), ("button", "b")]


def test_form_in_template_not_associated():
    # insertFormElement checkTemplateStack: a form inside <template> does
    # not become the document's open form, so a later control outside the
    # template is not linked to it
    from ksoup_spark.kernel import dom, selector as sel

    d = parse("<template><form id=tf></form></template><input id=x>")
    forms = sel.select(d, "form")
    for form in forms:
        assert dom.form_elements(d, form) == []


def test_detached_control_drops_from_form():
    # FormElement.elements() only returns controls still in the document
    from ksoup_spark.kernel import dom, mutate, selector as sel

    d = parse("<table><tr><form><input id=1><td><input id=2></td></table>")
    [form] = sel.select(d, "form")
    assert len(dom.form_elements(d, form)) == 2
    one = next(n for n in sel.select(d, "input")
               if d.get_attr(n, "id") == "1")
    mutate.remove(d, one)
    assert [d.get_attr(c, "id") for c in dom.form_elements(d, form)] == ["2"]
