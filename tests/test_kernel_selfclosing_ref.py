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
