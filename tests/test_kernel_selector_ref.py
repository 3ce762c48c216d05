"""Selector goldens ported from select/SelectorTest.kt (attribute matrix
:82-114, namespaced tags :118-185, attr regex :204-226, combined :228-236)."""

from ksoup_spark.kernel import selector as sel
from ksoup_spark.kernel import textops as tx
from ksoup_spark.kernel import treebuilder as tb


def ids(d, nodes):
    return [d.get_attr(n, "id") for n in nodes]


def test_attribute_matrix():
    h = ("<div Title=Foo /><div Title=Bar /><div Style=Qux />"
         "<div title=Balim /><div title=SLIM /><div data-name='with spaces'/>")
    d = tb.parse(h)
    assert len(sel.select(d, "[title]")) == 4
    assert len(sel.select(d, "[TITLE=foo]")) == 1
    assert len(sel.select(d, '[title="foo"]')) == 1
    assert len(sel.select(d, '[title="Foo"]')) == 1
    dn = sel.select(d, '[data-name="with spaces"]')
    assert len(dn) == 1 and d.get_attr(dn[0], "data-name") == "with spaces"
    notq = sel.select(d, "div[title!=bar]")
    assert len(notq) == 5 and d.get_attr(notq[0], "title") == "Foo"
    st = sel.select(d, "[title^=ba]")
    assert [d.get_attr(n, "title") for n in st] == ["Bar", "Balim"]
    en = sel.select(d, "[title$=im]")
    assert [d.get_attr(n, "title") for n in en] == ["Balim", "SLIM"]
    co = sel.select(d, "[title*=i]")
    assert [d.get_attr(n, "title") for n in co] == ["Balim", "SLIM"]


def test_namespaced_tags():
    d = tb.parse("<div><abc:def id=1>Hello</abc:def></div> "
                 "<abc:def class=bold id=2>There</abc:def>")
    assert ids(d, sel.select(d, "abc|def")) == ["1", "2"]
    assert ids(d, sel.select(d, ".bold")) == ["2"]
    assert ids(d, sel.select(d, "abc|def.bold")) == ["2"]
    assert ids(d, sel.select(d, "abc|def:contains(e)")) == ["1", "2"]
    assert ids(d, sel.select(d, "*|def")) == ["1", "2"]


def test_attribute_regex():
    d = tb.parse("<p><img src=foo.png id=1><img src=bar.jpg id=2>"
                 "<img src=qux.JPEG id=3><img src=old.gif><img></p>")
    assert ids(d, sel.select(d, "img[src~=(?i)\\.(png|jpe?g)]")) == ["1", "2", "3"]
    d2 = tb.parse("<p><img src=foo.png id=1><img src=bar.jpg id=2>"
                  "<img src=qux.JPEG id=3><img src=old.gif id=4></p>")
    assert ids(d2, sel.select(d2, "img[src~=[o]]")) == ["1", "4"]
    d3 = tb.parse("<div><table class=x><td>Hello</td></table></div>")
    got = sel.select(d3, "div table[class~=x|y]")
    assert len(got) == 1 and tx.element_text(d3, got[0]) == "Hello"


def test_combined_with_contains():
    d = tb.parse("<p id=1>One</p><p>Two +</p><p>Three +</p>")
    got = sel.select(d, "p#1 + :contains(+)")
    assert len(got) == 1
    assert tx.element_text(d, got[0]) == "Two +"
    assert d.tag[got[0]] == "p"


def test_attribute_starting():
    d = tb.parse('<p id=1 data-name=jsoup>Hello</p>'
                 '<p id=2 data-val=5 attrib-x=1>There</p>')
    with_data = sel.select(d, "[^data-]")
    assert ids(d, with_data) == ["1", "2"]
    assert ids(d, sel.select(d, "p[^data-val]")) == ["2"]
    assert len(sel.select(d, "[^attrib]")) == 1


def test_class_case_insensitive_matches_attr_form():
    h = "<p Class=One>One <p class=Two>Two <p CLASS=THREE>Three"
    d = tb.parse(h)
    from_attr = sel.select(d, "p[class=one]")
    from_class = sel.select(d, "p.one")
    assert len(from_attr) == len(from_class) == 1
    assert len(sel.select(d, "p.one, p.two, p.three")) == 3
