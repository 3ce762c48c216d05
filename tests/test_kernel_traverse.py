"""NodeTraversor/NodeFilter semantics (select/NodeTraversor.kt:22-129,
NodeFilter.kt): verdict-steered traversal incl. REMOVE-while-walking."""

from ksoup_spark.kernel import dom
from ksoup_spark.kernel.serialize import inner_html
from ksoup_spark.kernel.traverse import (
    CONTINUE,
    REMOVE,
    SKIP_CHILDREN,
    SKIP_ENTIRELY,
    STOP,
    filter_traverse,
    traverse,
)
from ksoup_spark.kernel.treebuilder import parse

_HTML = "<div id=out><p id=a>1<b id=b>2</b></p><p id=c>3</p></div>"


def _ids(d, nodes):
    return [d.get_attr(n, "id") or d.tag[n] or "#text" for n in nodes]


def test_traverse_head_tail_order():
    d = parse(_HTML)
    events = []
    traverse(d, d.body(),
             lambda n, depth: events.append(("h", d.tag[n] or "t")),
             lambda n, depth: events.append(("t", d.tag[n] or "t")))
    assert events[0] == ("h", "body") and events[-1] == ("t", "body")
    assert ("h", "b") in events and ("t", "b") in events


def test_filter_skip_children_still_tails():
    d = parse(_HTML)
    heads, tails = [], []

    def head(n, depth):
        heads.append(d.get_attr(n, "id"))
        return SKIP_CHILDREN if d.get_attr(n, "id") == "a" else CONTINUE

    def tail(n, depth):
        tails.append(d.get_attr(n, "id"))
        return CONTINUE

    filter_traverse(d, d.body(), head, tail)
    assert "b" not in heads          # subtree skipped
    assert "a" in tails              # but tail still ran
    assert "c" in heads              # siblings continue


def test_filter_skip_entirely_no_tail():
    d = parse(_HTML)
    tails = []

    def head(n, depth):
        return SKIP_ENTIRELY if d.get_attr(n, "id") == "a" else CONTINUE

    filter_traverse(d, d.body(), head,
                    lambda n, depth: (tails.append(d.get_attr(n, "id")),
                                      CONTINUE)[1])
    assert "a" not in tails and "c" in tails


def test_filter_remove_detaches():
    d = parse("<div>keep<!--x--><p>also<!--y--></p></div>")

    def head(n, depth):
        return REMOVE if d.kind[n] == dom.COMMENT else CONTINUE

    filter_traverse(d, 0, head)
    assert inner_html(d, d.body(), pretty=False) == "<div>keep<p>also</p></div>"


def test_filter_stop_aborts():
    d = parse(_HTML)
    seen = []

    def head(n, depth):
        seen.append(d.get_attr(n, "id"))
        return STOP if d.get_attr(n, "id") == "a" else CONTINUE

    assert filter_traverse(d, d.body(), head) == STOP
    assert "c" not in seen


def test_filter_remove_first_child_heads_parent_once():
    # regression: REMOVE on a first child must not re-run head on the parent
    d = parse("<div><a>1</a><b>2</b></div>")
    heads = []

    def head(n, depth):
        heads.append(d.tag[n] or "#t")
        return REMOVE if d.tag[n] == "a" else CONTINUE

    filter_traverse(d, d.body(), head)
    assert heads.count("div") == 1 and "b" in heads


def test_traverse_visitor_removing_current_keeps_siblings():
    # regression: detaching the current node must not skip the next sibling
    d = parse("<div><a>1</a><b>2</b><i>3</i></div>")
    seen = []

    def head(n, depth):
        seen.append(d.tag[n] or "#t")
        if d.tag[n] == "a":
            d.detach(n)

    traverse(d, d.body(), head)
    assert "b" in seen and "i" in seen


def test_traverse_visitor_removing_earlier_sibling_keeps_cursor():
    # regression (identity cursor): while visiting <b>, detach the already-
    # visited <a>; the index-based cursor would then skip <i>
    d = parse("<div><a>1</a><b>2</b><i>3</i><u>4</u></div>")
    body = d.body()
    div = d.children[body][0]
    a = d.children[div][0]
    seen = []

    def head(n, depth):
        seen.append(d.tag[n] or "#t")
        if d.tag[n] == "b":
            d.detach(a)  # merge-adjacent-text-nodes style mutation

    traverse(d, d.body(), head)
    assert "i" in seen and "u" in seen


def test_traverse_removing_current_and_earlier_together():
    d = parse("<div><a>1</a><b>2</b><i>3</i></div>")
    body = d.body()
    div = d.children[body][0]
    a = d.children[div][0]
    seen = []

    def head(n, depth):
        seen.append(d.tag[n] or "#t")
        if d.tag[n] == "b":
            d.detach(a)
            d.detach(n)

    traverse(d, d.body(), head)
    assert "i" in seen
