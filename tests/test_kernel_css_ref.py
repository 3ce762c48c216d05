"""Full port of select/CssTest.kt — the exhaustive :nth-* / structural
pseudo matrix against the reference's own fixture document."""

import pytest

from ksoup_spark.kernel import selector as sel
from ksoup_spark.kernel import textops as tx
from ksoup_spark.kernel import treebuilder as tb


def _fixture() -> str:
    sb = ["<html><head></head><body>", "<div id='pseudo'>"]
    for i in range(1, 11):
        sb.append(f"<p>{i}</p>")
    sb.append("</div><div id='type'>")
    for i in range(1, 11):
        sb.append(f"<p>{i}</p><span>{i}</span><em>{i}</em><svg>{i}</svg>")
    sb.append("</div>")
    sb.append("<span id='onlySpan'><br /></span>")
    sb.append("<p class='empty'><!-- Comment only is still empty! --></p>")
    sb.append("<div id='only'>Some text before the <em>only</em> child in this div</div>")
    sb.append("</body></html>")
    return "".join(sb)


DOC = tb.parse(_fixture())


def check(query, *expected):
    got = [tx.own_text(DOC, n) for n in sel.select(DOC, query)]
    assert got == list(expected), query


def test_first_last_child():
    check("#pseudo :first-child", "1")
    check("html:first-child")
    check("#pseudo :last-child", "10")
    check("html:last-child")


@pytest.mark.parametrize("i", range(1, 11))
def test_nth_loops(i):
    check(f"#pseudo :nth-child({i})", str(i))
    check(f"#pseudo :nth-last-child({i})", str(11 - i))
    check(f"#type p:nth-of-type({i})", str(i))
    check(f"#type svg:nth-of-type({i})", str(i))
    check(f"#type :nth-last-of-type({i})",
          str(11 - i), str(11 - i), str(11 - i), str(11 - i))


def test_nth_child_advanced():
    check("#pseudo :nth-child(-5)")
    check("#pseudo :nth-child(odd)", "1", "3", "5", "7", "9")
    check("#pseudo :nth-child(2n-1)", "1", "3", "5", "7", "9")
    check("#pseudo :nth-child(2n+1)", "1", "3", "5", "7", "9")
    check("#pseudo :nth-child(2n+3)", "3", "5", "7", "9")
    check("#pseudo :nth-child(even)", "2", "4", "6", "8", "10")
    check("#pseudo :nth-child(2n)", "2", "4", "6", "8", "10")
    check("#pseudo :nth-child(3n-1)", "2", "5", "8")
    check("#pseudo :nth-child(-2n+5)", "1", "3", "5")
    check("#pseudo :nth-child(+5)", "5")


def test_nth_of_type_advanced():
    check("#type :nth-of-type(-5)")
    check("#type p:nth-of-type(odd)", "1", "3", "5", "7", "9")
    check("#type em:nth-of-type(2n-1)", "1", "3", "5", "7", "9")
    check("#type p:nth-of-type(2n+1)", "1", "3", "5", "7", "9")
    check("#type span:nth-of-type(2n+3)", "3", "5", "7", "9")
    check("#type p:nth-of-type(even)", "2", "4", "6", "8", "10")
    check("#type p:nth-of-type(2n)", "2", "4", "6", "8", "10")
    check("#type p:nth-of-type(3n-1)", "2", "5", "8")
    check("#type p:nth-of-type(-2n+5)", "1", "3", "5")
    check("#type :nth-of-type(+5)", "5", "5", "5", "5")


def test_nth_last_child_advanced():
    check("#pseudo :nth-last-child(-5)")
    check("#pseudo :nth-last-child(odd)", "2", "4", "6", "8", "10")
    check("#pseudo :nth-last-child(2n-1)", "2", "4", "6", "8", "10")
    check("#pseudo :nth-last-child(2n+1)", "2", "4", "6", "8", "10")
    check("#pseudo :nth-last-child(2n+3)", "2", "4", "6", "8")
    check("#pseudo :nth-last-child(even)", "1", "3", "5", "7", "9")
    check("#pseudo :nth-last-child(2n)", "1", "3", "5", "7", "9")
    check("#pseudo :nth-last-child(3n-1)", "3", "6", "9")
    check("#pseudo :nth-last-child(-2n+5)", "6", "8", "10")
    check("#pseudo :nth-last-child(+5)", "6")


def test_nth_last_of_type_advanced():
    check("#type :nth-last-of-type(-5)")
    check("#type p:nth-last-of-type(odd)", "2", "4", "6", "8", "10")
    check("#type em:nth-last-of-type(2n-1)", "2", "4", "6", "8", "10")
    check("#type p:nth-last-of-type(2n+1)", "2", "4", "6", "8", "10")
    check("#type span:nth-last-of-type(2n+3)", "2", "4", "6", "8")
    check("#type p:nth-last-of-type(even)", "1", "3", "5", "7", "9")
    check("#type p:nth-last-of-type(2n)", "1", "3", "5", "7", "9")
    check("#type p:nth-last-of-type(3n-1)", "3", "6", "9")
    check("#type span:nth-last-of-type(-2n+5)", "6", "8", "10")
    check("#type :nth-last-of-type(+5)", "6", "6", "6", "6")


def test_first_last_of_type():
    check("div:not(#only) :first-of-type", "1", "1", "1", "1", "1")
    check("div:not(#only) :last-of-type", "10", "10", "10", "10", "10")


def test_empty():
    got = sel.select(DOC, ":empty")
    assert [DOC.tag[n] for n in got] == ["head", "br", "p"]


def test_only_child():
    got = sel.select(DOC, "span :only-child")
    assert [DOC.tag[n] for n in got] == ["br"]
    check("#only :only-child", "only")


def test_only_of_type():
    got = sel.select(DOC, ":only-of-type")
    assert [DOC.tag[n] for n in got] == ["head", "body", "span", "br", "p", "em"]
    from ksoup_spark.kernel.dom import has_class
    assert has_class(DOC, got[4], "empty")


def test_root():
    got = sel.select(DOC, ":root")
    assert [DOC.tag[n] for n in got] == ["html"]
    body = DOC.body()
    got2 = sel.select(DOC, ":root", root=body)
    assert got2 == [body]
