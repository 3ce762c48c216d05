"""Source start-position tracking (Parser.setTrackPosition start-offset
semantics, TreeBuilder.trackNodePosition TreeBuilder.kt:295-333; assertion
style follows nodes/PositionTest.kt)."""

from ksoup_spark.kernel import selector as sel
from ksoup_spark.kernel.treebuilder import parse


def test_explicit_element_positions():
    html = "<html><head></head><body><p>one</p><div><b>x</b></div></body></html>"
    d = parse(html, track_positions=True)
    for css, tag in [("p", "<p>"), ("div", "<div>"), ("b", "<b>")]:
        n = sel.select_first(d, css)
        assert d.src_pos[n] == html.index(tag), css


def test_implicit_elements_collapse_to_trigger_token():
    # no <html>/<head>/<body> in source: they collapse to the start of the
    # token that forced their creation (reference collapsed-range start)
    html = "<p>hello</p>"
    d = parse(html, track_positions=True)
    assert d.src_pos[d.body()] == 0
    assert d.src_pos[d.head()] == 0


def test_text_comment_positions():
    html = "lead<p>mid</p><!--c-->tail"
    d = parse(html, track_positions=True)
    by_pos = {pos: nid for nid, pos in d.src_pos.items()}
    assert html.index("lead") in by_pos
    assert html.index("mid") in by_pos
    assert html.index("<!--") in by_pos
    assert html.index("tail") in by_pos


def test_positions_off_by_default():
    d = parse("<p>x</p>")
    assert d.src_pos is None


def test_rcdata_and_attrs_do_not_shift():
    html = '<title>t</title><p id="a" class="b c">x</p>'
    d = parse(html, track_positions=True)
    p = sel.select_first(d, "p")
    assert d.src_pos[p] == html.index("<p")
