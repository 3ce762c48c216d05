"""NodeIterator / nodeStream parity: mutation-tolerant document-order
iteration (nodes/NodeIterator.kt, Node.kt:678-690).

Ports every replayable case from the reference suites
/root/reference/ksoup-test/test/com/fleeksoft/ksoup/nodes/NodeIteratorTest.kt
and NodeStreamTest.kt, using the same seen-string format
("tag", "tag#id", text, or node name, ';'-joined).
"""

import pytest

from ksoup_spark.kernel import dom, mutate
from ksoup_spark.kernel.selector import expect_first
from ksoup_spark.kernel.textops import element_text, own_text
from ksoup_spark.kernel.traverse import (
    KINDS_ELEMENT,
    KINDS_TEXT,
    NodeIterator,
    element_stream,
    node_stream,
)
from ksoup_spark.kernel.treebuilder import parse

HTML = "<div id=1><p>One<p>Two</div><div id=2><p>Three<p>Four</div>"


def track_seen(d, n):
    """NodeIteratorTest.trackSeen: element -> tag[#id], text -> text,
    other -> node name. The document root prints as #root (Document is an
    Element whose tagName is #root in the reference)."""
    k = d.kind[n]
    if k == dom.DOCUMENT:
        return "#root"
    if k == dom.ELEMENT:
        i = d.get_attr(n, "id")
        return f"{d.tag[n]}#{i}" if i else d.tag[n]
    if k in (dom.TEXT, dom.CDATA):
        return d.text[n]
    return dom.KIND_NAMES[k]


def seen_string(d, it):
    parts, previous = [], -1
    while it.has_next():
        n = it.next()
        assert n != previous
        parts.append(track_seen(d, n))
        previous = n
    return ";".join(parts) + (";" if parts else "")


def assert_contents(d, root, expected):
    assert seen_string(d, NodeIterator(d, root)) == expected


def test_can_iterate_nodes():
    d = parse(HTML)
    it = NodeIterator(d, 0)
    assert seen_string(d, it) == \
        "#root;html;head;body;div#1;p;One;p;Two;div#2;p;Three;p;Four;"
    assert not it.has_next()
    with pytest.raises(StopIteration):
        it.next()


def test_has_next_is_pure():
    d = parse(HTML)
    it = NodeIterator(d, 0)
    assert it.has_next()
    assert it.has_next()
    assert seen_string(d, it) == \
        "#root;html;head;body;div#1;p;One;p;Two;div#2;p;Three;p;Four;"
    assert not it.has_next()


def test_iterate_sub_tree():
    d = parse(HTML)
    div1 = expect_first(d, "div#1")
    it = NodeIterator(d, div1)
    assert seen_string(d, it) == "div#1;p;One;p;Two;"
    assert not it.has_next()

    div2 = expect_first(d, "div#2")
    it2 = NodeIterator(d, div2)
    assert seen_string(d, it2) == "div#2;p;Three;p;Four;"
    assert not it2.has_next()


def test_can_restart():
    d = parse(HTML)
    it = NodeIterator(d, 0)
    assert seen_string(d, it) == \
        "#root;html;head;body;div#1;p;One;p;Two;div#2;p;Three;p;Four;"
    it.restart(expect_first(d, "div#2"))
    assert seen_string(d, it) == "div#2;p;Three;p;Four;"


def test_can_iterate_just_one_sibling():
    d = parse(HTML)
    p2 = expect_first(d, "p:contains(Two)")
    assert element_text(d, p2) == "Two"

    it = NodeIterator(d, p2)
    assert seen_string(d, it) == "p;Two;"

    el_it = NodeIterator(d, p2, KINDS_ELEMENT)
    found = el_it.next()
    assert found == p2
    assert not el_it.has_next()


def test_can_iterate_first_empty_sibling():
    d = parse("<div><p id=1></p><p id=2>.</p><p id=3>..</p>")
    p1 = expect_first(d, "p#1")
    assert own_text(d, p1) == ""

    it = NodeIterator(d, p1)
    assert it.has_next()
    assert it.next() == p1
    assert not it.has_next()


OUTER = ("<div id=out1><div id=1><p>One<p>Two</div>"
         "<div id=2><p>Three<p>Four</div></div><div id=out2>Out2")


def _iterate_mutating(d, mutator):
    it, parts = NodeIterator(d, 0), []
    while it.has_next():
        n = it.next()
        mutator(it, n)
        parts.append(track_seen(d, n))
    return ";".join(parts) + ";"


def test_can_remove_via_iterator():
    d = parse(OUTER)
    seen = _iterate_mutating(
        d, lambda it, n: it.remove() if d.get_attr(n, "id") == "1" else None)
    assert seen == ("#root;html;head;body;div#out1;div#1;div#2;"
                    "p;Three;p;Four;div#out2;Out2;")
    assert_contents(d, 0, "#root;html;head;body;div#out1;div#2;"
                          "p;Three;p;Four;div#out2;Out2;")

    seen = _iterate_mutating(
        d, lambda it, n: it.remove() if d.get_attr(n, "id") == "2" else None)
    assert seen == "#root;html;head;body;div#out1;div#2;div#out2;Out2;"
    assert_contents(d, 0, "#root;html;head;body;div#out1;div#out2;Out2;")


def test_can_remove_via_node():
    d = parse(OUTER)
    seen = _iterate_mutating(
        d, lambda it, n: mutate.remove(d, n)
        if d.get_attr(n, "id") == "1" else None)
    assert seen == ("#root;html;head;body;div#out1;div#1;div#2;"
                    "p;Three;p;Four;div#out2;Out2;")
    assert_contents(d, 0, "#root;html;head;body;div#out1;div#2;"
                          "p;Three;p;Four;div#out2;Out2;")

    seen = _iterate_mutating(
        d, lambda it, n: mutate.remove(d, n)
        if d.get_attr(n, "id") == "2" else None)
    assert seen == "#root;html;head;body;div#out1;div#2;div#out2;Out2;"
    assert_contents(d, 0, "#root;html;head;body;div#out1;div#out2;Out2;")


def _replace_with_span(d, n, text):
    span = mutate.create_element(d, "span")
    mutate.set_text(d, span, text)
    mutate.replace_with(d, n, span)


def test_can_replace():
    d = parse(OUTER)
    seen = _iterate_mutating(
        d, lambda it, n: _replace_with_span(d, n, "Foo")
        if d.get_attr(n, "id") == "1" else None)
    # we don't see <p>One, do see the replaced-in <span>, then the rest
    assert seen == ("#root;html;head;body;div#out1;div#1;span;Foo;div#2;"
                    "p;Three;p;Four;div#out2;Out2;")
    assert_contents(d, 0, "#root;html;head;body;div#out1;span;Foo;div#2;"
                          "p;Three;p;Four;div#out2;Out2;")

    seen = _iterate_mutating(
        d, lambda it, n: _replace_with_span(d, n, "Bar")
        if d.get_attr(n, "id") == "2" else None)
    assert seen == ("#root;html;head;body;div#out1;span;Foo;div#2;span;Bar;"
                    "div#out2;Out2;")
    assert_contents(d, 0, "#root;html;head;body;div#out1;span;Foo;span;Bar;"
                          "div#out2;Out2;")


def test_can_wrap():
    d = parse(HTML)
    it, saw_inner = NodeIterator(d, 0), False
    while it.has_next():
        n = it.next()
        if d.get_attr(n, "id") == "1":
            mutate.wrap(d, n, "<div id=outer>")
        if d.kind[n] == dom.TEXT and d.text[n] == "One":
            saw_inner = True
    assert_contents(d, 0, "#root;html;head;body;div#outer;div#1;"
                          "p;One;p;Two;div#2;p;Three;p;Four;")
    assert saw_inner


def test_can_filter_for_elements():
    d = parse(HTML)
    it = NodeIterator(d, 0, KINDS_ELEMENT)
    assert seen_string(d, it) == "#root;html;head;body;div#1;p;p;div#2;p;p;"


def test_can_filter_for_text_nodes():
    d = parse(HTML)
    it = NodeIterator(d, 0, KINDS_TEXT)
    assert seen_string(d, it) == "One;Two;Three;Four;"
    assert_contents(d, 0, "#root;html;head;body;div#1;p;One;p;Two;"
                          "div#2;p;Three;p;Four;")


def test_can_modify_filtered_elements():
    d = parse(HTML)
    it, parts = NodeIterator(d, 0, KINDS_ELEMENT), []
    while it.has_next():
        n = it.next()
        if own_text(d, n):
            mutate.set_text(d, n, own_text(d, n) + "++")
        parts.append(track_seen(d, n))
    assert ";".join(parts) + ";" == \
        "#root;html;head;body;div#1;p;p;div#2;p;p;"
    assert_contents(d, 0, "#root;html;head;body;div#1;p;One++;p;Two++;"
                          "div#2;p;Three++;p;Four++;")


# -- NodeStreamTest.kt ports --------------------------------------------------


def test_can_stream():
    d = parse(HTML)
    seen = ";".join(track_seen(d, n) for n in node_stream(d, 0)) + ";"
    assert seen == "#root;html;head;body;div#1;p;One;p;Two;div#2;p;Three;p;Four;"


def test_can_stream_count():
    d = parse(HTML)
    assert sum(1 for _ in node_stream(d, 0)) == 14


def test_can_find_first():
    d = parse(HTML)
    first = next(node_stream(d, 0), None)
    assert first == 0


def test_can_filter_stream():
    d = parse(HTML)
    seen = ";".join(track_seen(d, n) for n in node_stream(d, 0)
                    if d.kind[n] == dom.TEXT) + ";"
    assert seen == "One;Two;Three;Four;"


def test_can_remove_from_stream():
    html = "<div id=1><p>One<p>Two</div><div id=2><p>Three<p>Four</div><div id=3><p>Five"
    d = parse(html)
    for n in node_stream(d, 0):
        if d.kind[n] == dom.ELEMENT and d.get_attr(n, "id") in ("1", "2"):
            mutate.remove(d, n)
    assert_contents(d, 0, "#root;html;head;body;div#3;p;Five;")


def test_element_stream():
    d = parse(HTML)
    seen = ";".join(track_seen(d, n) for n in element_stream(d, 0)) + ";"
    assert seen == "#root;html;head;body;div#1;p;p;div#2;p;p;"
