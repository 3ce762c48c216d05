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


def test_select_partial_then_next_ref_semantics():
    # StreamParserTest.select (StreamParserTest.kt:119-145): title emits at
    # the first <p>'s head; at that point the partial DOM has one empty p;
    # subsequent selectNext calls yield each p as it completes, and the
    # trailing unclosed p emits once EOF drains
    from ksoup_spark.kernel import selector as sel

    html = "<title>One</title><p id=1>P One</p><p id=2>P Two"
    sp = StreamParser(html)
    t = sp.select_first("title")
    assert element_text(sp.doc, t) == "One"
    # reference suspends one buffered token later (its partial DOM holds one
    # empty <p>); ours suspends at the title's own close — strictly earlier,
    # so no p exists yet
    assert sel.select(sp.doc, "p") == []
    p1 = sp.select_next("p")
    assert element_text(sp.doc, p1) == "P One"
    p2 = sp.select_next("p")
    assert element_text(sp.doc, p2) == "P Two"  # unclosed: emits at EOF
    assert sp.select_next("p") == -1


def test_select_with_has():
    # StreamParserTest.canSelectWithHas over the reference's basic() shape
    sp = StreamParser("<div>One</div><div><p>Two</p></div>")
    n = sp.select_next("div:has(p)")
    assert element_text(sp.doc, n) == "Two"


def test_select_with_sibling_pseudo():
    # StreamParserTest.canSelectWithSibling
    sp = StreamParser("<div>One</div><div>Two</div>")
    n = sp.select_next("div:first-of-type")
    assert element_text(sp.doc, n) == "One"
    assert sp.select_next("div:first-of-type") == -1


def test_stop_then_complete():
    # StreamParserTest.canStopAndCompleteAndReuse: stop() ends selection;
    # complete() still runs the parse to a full document
    from ksoup_spark.kernel import selector as sel

    sp = StreamParser("<p>One<p>Two")
    p = sp.select_first("p")
    assert element_text(sp.doc, p) == "One"
    sp.stop()
    assert sp.select_next("p") == -1
    d = sp.complete()
    ps = sel.select(d, "p")
    assert [element_text(d, x) for x in ps] == ["One", "Two"]


def test_works_with_xml_parser():
    # StreamParserTest.worksWithXmlParser: iterate p elements in XML mode
    sp = StreamParser("<doc><p>One</p><p>Two</p><p>Thr</p></doc>", xml=True)
    seen = []
    while True:
        n = sp.select_next("p")
        if n == -1:
            break
        seen.append(element_text(sp.doc, n))
    assert seen == ["One", "Two", "Thr"]


def test_xml_stream_early_exit():
    tail = "<item>x</item>" * 5000
    xml = f"<feed><title>T</title>{tail}</feed>"
    sp = StreamParser(xml, xml=True)
    n = sp.select_first("title")
    assert element_text(sp.doc, n) == "T"
    assert sp.consumed < 60 < len(xml)


def test_no_match_large_doc_is_linear():
    # Regression (round-3 advice): completed non-matching candidates used to
    # be re-evaluated on every pump, making a selector with no match O(n^2)
    # in element count (51s on this input). Must complete in linear time.
    import time

    body = "<p>word here</p>" * 4000
    html = f"<html><head></head><body>{body}</body></html>"
    sp = StreamParser(html)
    t0 = time.perf_counter()
    assert sp.select_first("title") == -1
    assert time.perf_counter() - t0 < 5.0  # was ~51s pre-fix


def test_stream_title_titleless_bails_without_parsing():
    body = "<p>word here</p>" * 4000
    html = f"<html><head></head><body>{body}</body></html>"
    import time

    t0 = time.perf_counter()
    assert stream_title(html) == ""
    assert time.perf_counter() - t0 < 0.1


def test_stable_selector_consumes_nonmatching_candidates():
    # Stream contract: elements pass by once; a stable selector evaluates
    # each completed element exactly once and discards misses.
    sp = StreamParser("<div>One</div><div class=x>Two</div><div>Three</div>")
    n = sp.select_next("div.x")
    assert element_text(sp.doc, n) == "Two"
    assert sp.select_next("div.x") == -1


def test_unstable_selector_still_rechecked():
    # Future-sibling-dependent pseudos keep the re-check path.
    sp = StreamParser("<ul><li>a</li><li>b</li></ul><p>tail</p>")
    n = sp.select_next("p")
    assert element_text(sp.doc, n) == "tail"
    sp2 = StreamParser("<div>One</div><span>x</span>")
    m = sp2.select_next("div:only-of-type")
    assert element_text(sp2.doc, m) == "One"


def test_prune_bounds_memory_on_giant_doc():
    # Reference conserve-memory contract (StreamParser.kt:20-23): emitted
    # elements can be removed from the DOM during the parse; pruning each
    # consumed element keeps retained payload bounded instead of O(doc).
    n_items = 5000
    body = "".join(f"<article><p>chunk {i} payload text here</p></article>"
                   for i in range(n_items))
    sp = StreamParser(f"<html><body>{body}</body></html>")
    seen = 0
    peak_retained = 0
    while True:
        nid = sp.select_next("article")
        if nid == -1:
            break
        seen += 1
        sp.prune(nid)
        if seen % 500 == 0:
            peak_retained = max(peak_retained, sp.retained_chars())
    assert seen == n_items
    # full doc holds ~n_items*25 chars of text; pruned peak stays tiny
    assert peak_retained < 2000, peak_retained
    assert sp.retained_chars() < 200


def test_pruned_elements_no_longer_selectable():
    from ksoup_spark.kernel import selector as sel

    sp = StreamParser("<div id=a>one</div><div id=b>two</div>")
    a = sp.select_next("div")
    sp.prune(a)
    b = sp.select_next("div")
    assert element_text(sp.doc, b) == "two"
    d = sp.complete()
    assert [element_text(d, n) for n in sel.select(d, "div")] == ["two"]
