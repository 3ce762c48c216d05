"""QueryParser behavioral parity (select/QueryParserTest.kt).

The reference suite is mostly sexpr-shape assertions over its internal
evaluator tree (EvaluatorDebug.sexpr) — our evaluator representation
differs by design, so those are not replayable. The behavioral cases are:
subquery combinator precedence via select results (QueryParserTest.kt:17-30),
parse failures on malformed selectors (:126-141), and whitespace tolerance
(:144-148).
"""

import pytest

from ksoup_spark.kernel.selector import SelectorError, parse_query, select
from ksoup_spark.kernel.textops import element_text
from ksoup_spark.kernel.treebuilder import parse


def _txt(d, nodes):
    return " ".join(element_text(d, n) for n in nodes)


def test_consume_sub_query():
    # QueryParserTest.testConsumeSubQuery: leading > in an Or branch binds
    # to the query root, and each Or branch re-anchors there
    d = parse("<html><head>h</head><body>"
              "<li><strong>l1</strong></li>"
              "<a><li><strong>l2</strong></li></a>"
              "<p><strong>yes</strong></p>"
              "</body></html>")
    body = d.body()
    assert _txt(d, select(d, ">p>strong,>li>strong", root=body)) == "l1 yes"
    assert _txt(d, select(d, "body>p>strong,body>*>li>strong")) == "l2 yes"
    assert _txt(d, select(d, "body>*>li>strong,body>p>strong")) == "l2 yes"
    assert _txt(d, select(d, "body>p>strong,body>*>li>strong")) == "l2 yes"


def test_exception_on_unclosed_attribute():
    with pytest.raises(SelectorError):
        parse_query('section > a[href="]')


def test_exception_on_unbalanced_quote_in_contains():
    with pytest.raises(SelectorError):
        parse_query('p:contains(One " One)')


def test_exception_on_empty_selector():
    with pytest.raises(SelectorError):
        parse_query("")
    with pytest.raises(SelectorError):
        parse_query("   ")


def test_ok_on_spaces_fore_and_aft():
    # QueryParserTest.okOnSpacesForeAndAft
    assert parse_query(" span div  ") is not None
    d = parse("<div><span><div>x</div></span></div>")
    assert len(select(d, " span div  ")) == 1


def test_structural_evaluator_chain_selects():
    # QueryParserTest.structuralEvaluatorsToString — replayed as behavior:
    # the chain parses and matches the element it describes
    q = "a:not(:has(span.foo)) b d > e + f ~ g"
    assert parse_query(q) is not None
    d = parse("<a><b><d><e></e><f></f><x></x><g>hit</g></d></b></a>")
    assert _txt(d, select(d, q)) == "hit"
    # and a span.foo inside the <a> kills the match
    d2 = parse("<a><span class=foo></span>"
               "<b><d><e></e><f></f><g>hit</g></d></b></a>")
    assert select(d2, q) == []


def test_or_after_attribute_selects():
    # QueryParserTest.parsesOrAfterAttribute — replayed as behavior
    d = parse("<div id=parent><p class='child thing'>in</p></div>"
              "<div class=some-other-selector><p class=nested>n</p></div>")
    got = select(d, "#parent [class*=child], .some-other-selector .nested")
    assert _txt(d, got) == "in n"
    got2 = select(d, "#parent [class*=child], .some-other-selector")
    assert len(got2) == 2
