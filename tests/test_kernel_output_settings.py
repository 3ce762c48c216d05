"""OutputSettings serialization knobs (nodes/Document.kt:368-470) —
ported from the reference's ElementTest formatting cases."""

from ksoup_spark.kernel import selector as sel
from ksoup_spark.kernel.serialize import inner_html, outer_html
from ksoup_spark.kernel.treebuilder import parse
from ksoup_spark.kernel.xml import parse_xml

FMT = ("<title>Format test</title><div><p>Hello <span>ksoup "
       "<span>users</span></span></p><p>Good.</p></div>")


def test_format_html():
    # ElementTest.testElementSiblingIndex / testFormatHtml default pretty
    d = parse(FMT)
    assert outer_html(d, d.html_el()) == (
        "<html>\n <head>\n  <title>Format test</title>\n </head>\n <body>"
        "\n  <div>\n   <p>Hello <span>ksoup <span>users</span></span></p>"
        "\n   <p>Good.</p>\n  </div>\n </body>\n</html>")


def test_format_outline():
    # ElementTest.testFormatOutline
    d = parse(FMT)
    assert outer_html(d, d.html_el(), outline=True) == (
        "<html>\n <head>\n  <title>Format test</title>\n </head>\n <body>"
        "\n  <div>\n   <p>\n    Hello \n    <span>\n     ksoup \n     "
        "<span>users</span>\n    </span>\n   </p>\n   <p>Good.</p>\n  "
        "</div>\n </body>\n</html>")


def test_set_indent_zero():
    # ElementTest.testSetIndent
    d = parse("<div><p>Hello\nthere</p></div>")
    assert outer_html(d, d.html_el(), indent_amount=0) == (
        "<html>\n<head></head>\n<body>\n<div>\n<p>Hello there</p>\n</div>"
        "\n</body>\n</html>")


def test_indent_level_max_padding():
    # ElementTest.testIndentLevel: default cap 30, then 32, then uncapped
    html = "<div>" * 40 + "Foo"
    d = parse(html)
    out = outer_html(d, d.html_el())
    assert ("\n" + " " * 30 + "<div>\n" + " " * 30 + "Foo\n"
            + " " * 30 + "</div>") in out
    out32 = outer_html(d, d.html_el(), max_padding_width=32)
    assert ("\n" + " " * 32 + "<div>\n" + " " * 32 + "Foo\n"
            + " " * 32 + "</div>") in out32
    out_unc = outer_html(d, d.html_el(), max_padding_width=-1)
    # uncapped: Foo sits one level deeper than its innermost div
    assert ("\n" + " " * 41 + "<div>\n" + " " * 42 + "Foo\n"
            + " " * 41 + "</div>") in out_unc


def test_not_pretty():
    # ElementTest.testNotPretty
    d = parse("<div>   \n<p>Hello\n there\n</p></div>")
    assert outer_html(d, d.html_el(), pretty=False) == (
        "<html><head></head><body><div>   \n<p>Hello\n there\n</p>"
        "</div></body></html>")
    [div] = sel.select(d, "div")
    assert inner_html(d, div, pretty=False) == "   \n<p>Hello\n there\n</p>"


def test_pretty_and_outline_with_endash_body():
    # ElementTest.testPrettyAndOutlineWithEnDashBody
    d = parse("<div><span>1:15</span>&ndash;<span>2:15</span>&nbsp;p.m.</div>")
    assert inner_html(d, d.body(), outline=True) == (
        "<div>\n <span>1:15</span>\n –\n <span>2:15</span>\n "
        "&nbsp;p.m.\n</div>")


def test_pretty_idempotent_with_outline_and_indent():
    # ElementTest.prettyPrintScriptsDoesNotGrowOnRepeat
    d = parse("<div>\nFoo\n<p>\nBar\nqux</p></div>\n"
              "<script>\n alert('Hello!');\n</script>")
    settings = dict(outline=True, indent_amount=4)
    html = outer_html(d, d.html_el(), **settings)
    d2 = parse(html)
    assert outer_html(d2, d2.html_el(), **settings) == html


def test_first_text_child_of_div_breaks():
    # default pretty: first text child of a format-as-block parent indents
    d = parse("<div>Foo</div>")
    assert inner_html(d, d.body()) == "<div>\n Foo\n</div>"


def test_text_after_br_breaks():
    # ElementTest.elementBrText serialization side
    d = parse("<p>Hello<br>World</p>")
    assert inner_html(d, d.body()) == "<p>Hello<br>\n World</p>"


def test_xml_syntax_self_closing_and_bool_attrs():
    # Syntax.xml: voids serialize <x />, boolean attributes get ="",
    # attribute values escape '<'
    d = parse('<div data-x="a<b"><img src=foo><input disabled></div>')
    out = inner_html(d, d.body(), syntax="xml", pretty=False)
    assert out == ('<div data-x="a&lt;b"><img src="foo" />'
                   '<input disabled="" /></div>')


def test_xml_syntax_sets_xhtml_escape():
    # syntax(xml) auto-selects EscapeMode.xhtml: nbsp goes numeric
    d = parse("<p>a&nbsp;b</p>")
    assert "&#xa0;" in inner_html(d, d.body(), syntax="xml", pretty=False)
    assert "&nbsp;" in inner_html(d, d.body(), pretty=False)


def test_xml_syntax_doctype_keyword():
    d = parse("<!doctype html><p>x</p>")
    assert outer_html(d, 0, syntax="xml", pretty=False).startswith("<!DOCTYPE")


def test_xml_parsed_doc_unaffected_by_html_defaults():
    # XML-parsed docs keep their parse-time serialization rules
    d = parse_xml("<root><item/><link>One</link></root>")
    out = outer_html(d, 0, pretty=False)
    assert "<item />" in out and "<link>One</link>" in out


def test_reprint_does_not_grow_in_preserve_whitespace():
    # Regression (fuzz-found): a pretty-print indent emitted INSIDE
    # preserve-whitespace content becomes literal text on reparse and
    # grows forever. Comments under <pre> and outline closing indents
    # were the two leaks.
    cases = [
        "<pre><svg><!-- c -->x</svg></pre>",
        "<pre>x<a>y</a></pre>",
        "<pre><svg>z</svg></pre>",
    ]
    for case in cases:
        for kw in ({}, {"outline": True}):
            s2 = outer_html(parse(outer_html(parse(case), 0, **kw)), 0, **kw)
            s3 = outer_html(parse(s2), 0, **kw)
            assert s2 == s3, (case, kw, s2, s3)


def test_reprint_reaches_fixed_point():
    # Pretty reprints may absorb one whitespace artifact per nesting level
    # (the reference's trailing-space-before-indent quirk) but must reach
    # a fixed point instead of growing without bound.
    html = ("<div><button><li><table><form><textarea><!-- c -->a"
            "</textarea></form></table><p>x<h1>a<!-- c --></h1>")
    for kw in ({}, {"outline": True}, {"indent_amount": 0}):
        s = outer_html(parse(html), 0, **kw)
        for _ in range(8):
            nxt = outer_html(parse(s), 0, **kw)
            if nxt == s:
                break
            s = nxt
        else:
            raise AssertionError(f"no fixed point under {kw}")
