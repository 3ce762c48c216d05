"""Within-doc incremental StreamParser (parser/StreamParser.kt:16-140):
select_first/select_next suspend the parse; elements emit when complete."""

from ksoup_spark.kernel.stream_parser import StreamParser, stream_title
from ksoup_spark.kernel.textops import element_text
from ksoup_spark.kernel.treebuilder import parse


def test_select_first_early_exit():
    body = "<p>word</p>" * 2000
    html = f"<html><head><title>T</title></head><body>{body}</body></html>"
    sp = StreamParser(html)
    nid = sp.select_first("title")
    assert element_text(sp.doc, nid) == "T"
    # the payoff: the body was never tokenized
    assert sp.consumed < 100 < len(html)


def test_select_next_iterates_in_order():
    sp = StreamParser("<ul><li>a</li><li>b<b>!</b></li><li>c</li></ul>")
    seen = []
    while True:
        n = sp.select_next("li")
        if n == -1:
            break
        seen.append(element_text(sp.doc, n))
    assert seen == ["a", "b!", "c"]


def test_emitted_elements_are_complete_subtrees():
    sp = StreamParser("<div><p>one <b>two</b> three</p>tail</div>")
    n = sp.select_first("p")
    assert element_text(sp.doc, n) == "one two three"


def test_complete_finishes_document():
    sp = StreamParser("<p>x</p><p>y</p><p>z</p>")
    first = sp.select_first("p")
    assert element_text(sp.doc, first) == "x"
    d = sp.complete()
    assert len([c for c in d.children[d.body()]]) == 3


def test_stop_abandons_input():
    sp = StreamParser("<p>x</p><p>y</p>")
    sp.select_first("p")
    sp.stop()
    assert sp.select_next("p") == -1


def test_no_match_returns_minus_one():
    sp = StreamParser("<p>x</p>")
    assert sp.select_first("title") == -1


def test_stream_title_matches_full_parse():
    from ksoup_spark.kernel.textops import doc_title
    for html in [
        "<html><head><title>  Hello\nthere </title></head><body>x</body></html>",
        "<title>only title</title>",
        "<p>no title</p>",
        "<title>first</title><title>second</title>",
    ]:
        assert stream_title(html) == doc_title(parse(html)), html


def test_void_elements_emit_immediately():
    sp = StreamParser('<img src="a.png"><p>x</p>')
    n = sp.select_first("img")
    assert sp.doc.get_attr(n, "src") == "a.png"
