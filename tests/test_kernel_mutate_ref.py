"""Mutation-flow goldens ported from the reference's ElementTest
(ksoup-test/test/com/fleeksoft/ksoup/nodes/ElementTest.kt): parse, mutate
through the node-table ops, and compare the serialized body against the
reference's expected HTML (stripNewlines comparison)."""

import re

from ksoup_spark.kernel import mutate as M, selector as S
from ksoup_spark.kernel.serialize import inner_html
from ksoup_spark.kernel.treebuilder import parse


def _body(d) -> str:
    s = inner_html(d, d.body(), pretty=True)
    s = re.sub(r"\s+<", "<", s)
    s = re.sub(r">\s+", ">", s)
    return re.sub(r"\s+", " ", s).strip()


def _n(s: str) -> str:
    s = re.sub(r"\s+<", "<", s)
    s = re.sub(r">\s+", ">", s)
    return re.sub(r"\s+", " ", s).strip()


def test_append_row_to_table():  # ElementTest.kt:662-670
    d = parse("<table><tr><td>1</td></tr></table>")
    tbody = S.select_first(d, "tbody")
    M.append_html(d, tbody, "<tr><td>2</td></tr>")
    assert _body(d) == _n(
        "<table><tbody><tr><td>1</td></tr><tr><td>2</td></tr></tbody></table>")


def test_prepend_row_to_table():  # ElementTest.kt:672-687
    d = parse("<table><tr><td>1</td></tr></table>")
    tbody = S.select_first(d, "tbody")
    M.prepend_html(d, tbody, "<tr><td>2</td></tr>")
    assert _body(d) == _n(
        "<table><tbody><tr><td>2</td></tr><tr><td>1</td></tr></tbody></table>")


def test_wrap_twice():  # ElementTest.kt:803-816 testWrap
    d = parse("<div><p>Hello</p><p>There</p></div>")
    p = S.select(d, "p")[0]
    M.wrap(d, p, "<div class='head'></div>")
    assert _body(d) == _n(
        '<div><div class="head"><p>Hello</p></div><p>There</p></div>')
    M.wrap(d, p, "<div><div class=foo></div><p>What?</p></div>")
    assert _body(d) == _n(
        '<div><div class="head"><div><div class="foo"><p>Hello</p></div>'
        '<p>What?</p></div></div><p>There</p></div>')


def test_before():  # ElementTest.kt:858-872
    d = parse("<div><p>Hello</p><p>There</p></div>")
    p1 = S.select(d, "p")[0]
    M.before_html(d, p1, "<div>one</div><div>two</div>")
    assert _body(d) == _n(
        "<div><div>one</div><div>two</div><p>Hello</p><p>There</p></div>")
    M.before_html(d, S.select(d, "p")[-1], "<p>Three</p><!-- four -->")
    assert _body(d) == _n(
        "<div><div>one</div><div>two</div><p>Hello</p><p>Three</p>"
        "<!-- four --><p>There</p></div>")


def test_after():  # ElementTest.kt:874-888
    d = parse("<div><p>Hello</p><p>There</p></div>")
    p1 = S.select(d, "p")[0]
    M.after_html(d, p1, "<div>one</div><div>two</div>")
    assert _body(d) == _n(
        "<div><p>Hello</p><div>one</div><div>two</div><p>There</p></div>")
    M.after_html(d, S.select(d, "p")[-1], "<p>Three</p><!-- four -->")
    assert _body(d) == _n(
        "<div><p>Hello</p><div>one</div><div>two</div><p>There</p>"
        "<p>Three</p><!-- four --></div>")


def test_wrap_with_remainder():  # ElementTest.kt:890-899
    d = parse("<div><p>Hello</p></div>")
    p = S.select(d, "p")[0]
    M.wrap(d, p, "<div class='head'></div><p>There!</p>")
    assert _body(d) == _n(
        '<div><div class="head"><p>Hello</p></div><p>There!</p></div>')


def test_wrap_with_simple_remainder():  # ElementTest.kt:901-918
    d = parse("<p>Hello")
    p = S.select_first(d, "p")
    M.wrap(d, p, "<div></div> There")
    div = S.select_first(d, "div")
    assert d.parent[p] == div
    assert _body(d) == _n("<div><p>Hello</p></div> There")


def test_move_children():  # ElementTest.kt:2144-2155 moveChildren
    d = parse("<div><p>One<p>Two<p>Three</div><div></div>")
    a, b = S.select(d, "div")
    for c in list(d.children[a]):
        M.append_child(d, b, c)
    assert _body(d) == _n(
        "<div></div><div><p>One</p><p>Two</p><p>Three</p></div>")


def test_append_children():  # ElementTest.kt:2170-2182
    d = parse("<div><p>One<p>Two<p>Three</div><div><p>Four</div>")
    a, b = S.select(d, "div")
    for c in list(d.children[a]):
        M.append_child(d, b, c)
    assert _body(d) == _n(
        "<div></div><div><p>Four</p><p>One</p><p>Two</p><p>Three</p></div>")


def test_prepend_children():  # ElementTest.kt:2184-2196
    d = parse("<div><p>One<p>Two<p>Three</div><div><p>Four</div>")
    a, b = S.select(d, "div")
    at = 0
    for c in list(d.children[a]):
        d.detach(c)
        d.children[b].insert(at, c)
        d.parent[c] = b
        at += 1
    assert _body(d) == _n(
        "<div></div><div><p>One</p><p>Two</p><p>Three</p><p>Four</p></div>")


def test_looped_remove_attributes():  # ElementTest.kt:1447-1456
    d = parse("<a one two three four>Text</a><p foo>Two</p>")
    for el in S.select(d, "*"):
        attrs = d.attrs[el]
        if attrs:
            for k in list(attrs):
                M.remove_attr(d, el, k)
    assert _body(d) == _n("<a>Text</a><p>Two</p>")
