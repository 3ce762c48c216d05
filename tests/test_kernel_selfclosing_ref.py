"""Self-closing / attribute-name-trim / control-char serialization goldens
from parser/HtmlParserTest.kt (:495-528 handlesKnownEmptyBlocks, :509-518
handlesUnknownNamespaceTags, :1030-1037 handlesNullInData, :1246-1251
convertsImageToImg, :1445-1448 handlesControlCodeInAttributeName)."""

import re

import pytest

from ksoup_spark.kernel import treebuilder as tb
from ksoup_spark.kernel.serialize import inner_html

CASES = [
    # handlesControlCodeInAttributeName: names trimmed of chars <= 0x20,
    # empty names dropped
    ("<p><a \x06=foo>One</a><a/\x06=bar><a foo\x06=bar>Two</a></p>",
     '<p><a>One</a><a></a><a foo="bar">Two</a></p>'),
    # handlesKnownEmptyBlocks: known tags force-closed on />, unknown tags
    # genuinely self-close and serialize "<x />"
    ("<div id='1' /><script src='/foo' /><div id=2><img /><img></div>"
     "<a id=3 /><i /><foo /><foo>One</foo> <hr /> hr text <hr> hr text two",
     '<div id="1"></div><script src="/foo"></script>'
     '<div id="2"><img><img></div><a id="3"></a><i></i><foo />'
     '<foo>One</foo><hr> hr text<hr> hr text two'),
    # convertsImageToImg: image -> img except inside svg; svg image keeps
    # the self-closing form
    ("<body><image><svg><image /></svg></body>",
     "<img><svg><image /></svg>"),
    # handlesNullInData: NULL literal in data serialized as &#x0;
    ("<p id=\x00>Blah \x00</p>", '<p id="�">Blah &#x0;</p>'),
    # handlesUnknownNamespaceTags
    ("<foo:bar id='1' /><abc:def id=2>Foo<p>Hello</p></abc:def>"
     "<foo:bar>There</foo:bar>",
     '<foo:bar id="1" /><abc:def id="2">Foo<p>Hello</p></abc:def>'
     '<foo:bar>There</foo:bar>'),
    # parsesQuiteRoughAttributes: '=' coerced to '_' on output
    ("<p =a>One<a <p>Something</p>Else",
     "<p _a>One<a></a></p><p><a>Something</a></p><a>Else</a>"),
    ("<p .....>", "<p .....></p>"),
    # self-closing title must not wedge the tokenizer into RCDATA
    ("<title />after", "after"),
]


def _norm(s: str) -> str:
    s = re.sub(r"\s+<", "<", s)
    s = re.sub(r">\s+", ">", s)
    return re.sub(r"\s+", " ", s).strip()


@pytest.mark.parametrize("html,want", CASES)
def test_selfclosing_golden(html, want):
    d = tb.parse(html)
    got = inner_html(d, d.body(), pretty=True)
    assert _norm(got) == _norm(want)


FOREIGN_TEMPLATE_CASES = [
    # end tags at integration points stay foreign (dispatch rule,
    # HtmlTreeBuilder.kt:126-171): </foreignObject> closes it, the next
    # <textPath> is svg-cased and a sibling
    ('<svg viewBox="0 0 1 1"><foreignObject><p>hi</p></foreignObject>'
     '<textPath>t</textPath></svg>',
     '<svg viewBox="0 0 1 1"><foreignObject><p>hi</p></foreignObject>'
     '<textPath>t</textPath></svg>'),
    # </mi> pops the MathML text integration point; annotation-xml keeps
    # the html-island children
    ('<math><mi>x</mi><annotation-xml encoding="text/html"><p>i</p>'
     '</annotation-xml></math>',
     '<math><mi>x</mi><annotation-xml encoding="text/html"><p>i</p>'
     '</annotation-xml></math>'),
    # mglyph start at a MathML text integration point stays foreign
    ('<math><mi><mglyph></mi></math>',
     '<math><mi><mglyph></mglyph></mi></math>'),
    # templateInHead (HtmlParserTest.kt:1868-1876)
    ('<head><template id=1><meta name=tmpl></template><title>Test</title>'
     '<style>One</style></head><body><p>Two</p>',
     None),  # checked via full doc below
]


@pytest.mark.parametrize("html,want",
                         [c for c in FOREIGN_TEMPLATE_CASES if c[1]])
def test_foreign_dispatch_golden(html, want):
    d = tb.parse(html)
    got = inner_html(d, d.body(), pretty=True)
    assert _norm(got) == _norm(want)


def test_template_goldens():
    from ksoup_spark.kernel.serialize import outer_html

    d = tb.parse("<head><template id=1><meta name=tmpl></template>"
                 "<title>Test</title><style>One</style></head><body><p>Two</p>")
    assert _norm(outer_html(d, 0, pretty=True)) == _norm(
        '<html><head><template id="1"><meta name="tmpl"></template>'
        '<title>Test</title><style>One</style></head>'
        '<body><p>Two</p></body></html>')
    d2 = tb.parse("<body><template id=1><table><tr><template id=2>"
                  "<td>One</td><td>Two</td></template></tr></template></body>")
    assert _norm(outer_html(d2, 0, pretty=True)) == _norm(
        '<html><head></head><body><template id="1"><table><tbody><tr>'
        '<template id="2"><td>One</td><td>Two</td></template></tr></tbody>'
        '</table></template></body></html>')
