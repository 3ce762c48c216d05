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


# -- full Range semantics (nodes/PositionTest.kt ports) ----------------------

from ksoup_spark.kernel import dom
from ksoup_spark.kernel.xml import parse_xml


def _rng(d, n):
    return dom.range_str(d, dom.source_range(d, n))


def _erng(d, n):
    return dom.range_str(d, dom.end_source_range(d, n))


def accumulate_positions(d, nodes):
    """PositionTest.accumulatePositions: 'name:ss-se~es-ee; ' per node."""
    out = []
    for n in nodes:
        r = dom.source_range(d, n) or (-1, -1)
        name = d.tag[n] if d.kind[n] == dom.ELEMENT else dom.KIND_NAMES[d.kind[n]]
        s = f"{name}:{r[0]}-{r[1]}"
        if d.kind[n] in (dom.ELEMENT, dom.DOCUMENT):
            e = dom.end_source_range(d, n) or (-1, -1)
            s += f"~{e[0]}-{e[1]}"
        out.append(s + "; ")
    return "".join(out)


def accumulate_attr_positions(d, n):
    out = []
    if d.kind[n] != dom.ELEMENT or not (d.attrs[n] or {}):
        return ""
    for k in d.attrs[n]:
        ar = dom.attr_source_range(d, n, k)
        if ar is None:
            continue
        out.append(f"{k}:{ar[0]}-{ar[1]}={ar[2]}-{ar[3]}; ")
    return "".join(out)


def _els(d, root=None):
    start = d.html_el() if root is None else root
    return [n for n, _ in d.preorder(start) if d.kind[n] == dom.ELEMENT]


def test_tracks_position():
    # PositionTest.tracksPosition
    content = ("<p id=1\n class=foo>\n<span>Hello\n &reg;\n there &copy."
               "</span> now.\n <!-- comment --> ")
    d = parse(content, track_positions=True)
    html = d.html_el()
    body = d.body()
    [p] = sel.select(d, "p")
    [span] = sel.select(d, "span")
    text = d.children[span][0]
    sibs = d.children[d.parent[span]]
    now = sibs[sibs.index(span) + 1]
    comment = sibs[sibs.index(span) + 2]

    assert dom.range_is_implicit(dom.source_range(d, body))
    assert dom.range_is_implicit(dom.end_source_range(d, body))
    assert _rng(d, html) == "1,1:0-1,1:0"
    assert dom.source_range(d, html) == dom.source_range(d, body)
    assert dom.end_source_range(d, html) == dom.end_source_range(d, body)
    assert _rng(d, p) == "1,1:0-2,12:19"
    assert not dom.range_is_implicit(dom.source_range(d, p))
    assert dom.range_is_implicit(dom.end_source_range(d, p))
    assert _erng(d, p) == "6,19:83-6,19:83"
    assert dom.end_source_range(d, p) == dom.end_source_range(d, html)
    assert dom.position_str(d, dom.source_range(d, p)[0]) == "1,1:0"
    assert dom.position_str(d, dom.source_range(d, p)[1]) == "2,12:19"
    assert _rng(d, span) == "3,1:20-3,7:26"
    assert _erng(d, span) == "5,14:52-5,21:59"
    tr = dom.source_range(d, text)
    assert tr[1] - tr[0] == len("Hello\n &reg;\n there &copy.")
    assert dom.position_str(d, tr[0]) == "3,7:26"
    assert dom.position_str(d, tr[1]) == "5,14:52"
    cr = dom.source_range(d, comment)
    assert dom.position_str(d, cr[0]) == "6,2:66"
    assert dom.position_str(d, cr[1]) == "6,18:82"
    assert d.kind[now] == dom.TEXT and d.kind[comment] == dom.COMMENT


def test_tracks_expected_popped_elements():
    # PositionTest.tracksExpectedPoppedElements
    html = "<html><head><meta></head><body><img><p>One</p><p>Two</p></body></html>"
    d = parse(html, track_positions=True)
    got = accumulate_positions(d, _els(d))
    assert got == ("html:0-6~63-70; head:6-12~18-25; meta:12-18~12-18; "
                   "body:25-31~56-63; img:31-36~31-36; p:36-39~42-46; "
                   "p:46-49~52-56; ")
    for n in _els(d):
        assert not dom.range_is_implicit(dom.source_range(d, n))
        assert not dom.range_is_implicit(dom.end_source_range(d, n))
    texts = [n for n, _ in d.preorder(0) if d.kind[n] == dom.TEXT]
    got_t = accumulate_positions(d, texts)
    assert got_t == "#text:39-42; #text:49-52; "


def test_tracks_implicit_popped_elements():
    # PositionTest.tracksImplicitPoppedElements
    html = "<meta><img><p>One<p>Two<p>Three"
    d = parse(html, track_positions=True)
    got = accumulate_positions(d, _els(d))
    assert got == ("html:0-0~31-31; head:0-0~6-6; meta:0-6~0-6; "
                   "body:6-6~31-31; img:6-11~6-11; p:11-14~17-17; "
                   "p:17-20~23-23; p:23-26~31-31; ")
    [p0] = [n for n in _els(d) if d.tag[n] == "p"][:1]
    assert dom.range_is_implicit(dom.end_source_range(d, p0))
    [meta] = [n for n in _els(d) if d.tag[n] == "meta"]
    assert not dom.range_is_implicit(dom.end_source_range(d, meta))


def test_tracks_markup():
    # PositionTest.tracksMarkup
    html = ("<!doctype\nhtml>\n<title>ksoup &copy;\n2022</title><body>"
            "\n<![CDATA[\n<ksoup>\n]]>")
    d = parse(html, track_positions=True)
    doctype = next(n for n, _ in d.preorder(0) if d.kind[n] == dom.DOCTYPE)
    assert _rng(d, doctype) == "1,1:0-2,6:15"
    [title] = sel.select(d, "title")
    ttext = d.children[title][0]
    assert _rng(d, title) == "3,1:16-3,8:23"
    assert _rng(d, ttext) == "3,8:23-4,5:40"
    cdata = next(n for n, _ in d.preorder(0) if d.kind[n] == dom.CDATA)
    assert _rng(d, cdata) == "5,1:55-7,4:76"


def test_tracks_data_nodes():
    # PositionTest.tracksDataNodes
    html = "<head>\n<script>foo;\nbar()\n5 <= 4;</script>"
    d = parse(html, track_positions=True)
    [script] = sel.select(d, "script")
    assert _rng(d, script) == "2,1:7-2,9:15"
    data = d.children[script][0]
    assert _rng(d, data) == "2,9:15-4,8:33"


def test_tracks_xml():
    # PositionTest.tracksXml
    xml = ('<?xml version="1.0" encoding="utf-8"?>\n<!doctype html>\n'
           '<rss url=foo>\nXML\n</rss>\n<!-- comment -->')
    d = parse_xml(xml, track_positions=True)
    kids = d.children[0]
    decl = kids[0]
    assert d.kind[decl] == dom.XMLDECL
    assert _rng(d, decl) == "1,1:0-1,39:38"
    doctype = kids[2]
    assert d.kind[doctype] == dom.DOCTYPE
    assert _rng(d, doctype) == "2,1:39-2,16:54"
    rss = next(n for n in kids if d.kind[n] == dom.ELEMENT)
    assert _rng(d, rss) == "3,1:55-3,14:68"
    assert _erng(d, rss) == "5,1:73-5,7:79"
    text = d.children[rss][0]
    assert _rng(d, text) == "3,14:68-5,1:73"
    comment = kids[-1]
    assert d.kind[comment] == dom.COMMENT
    assert _rng(d, comment) == "6,1:80-6,17:96"


def test_tracks_table_moved_text():
    # PositionTest.tracksTableMovedText. Documented deviation: the
    # reference emits five separate foster-parented TextNodes (7-10,
    # 14-17, 21-24, 29-32, 37-40); this builder merges adjacent foster
    # siblings, so the moved runs become one node spanning the union of
    # their source ranges, with identical .text() output.
    html = "<table>foo<tr>bar<td>baz</td>qux</tr>coo</table>"
    d = parse(html, track_positions=True)
    texts = [n for n, _ in d.preorder(0) if d.kind[n] == dom.TEXT]
    vals = [d.text[n] for n in texts]
    assert vals == ["foobarquxcoo", "baz"]
    assert dom.source_range(d, texts[0]) == (7, 48)  # union of moved runs
    assert dom.source_range(d, texts[1]) == (21, 24)  # "baz" exact


def test_tracks_closing_html_tags_in_xml():
    # PositionTest.tracksClosingHtmlTagsInXml
    xml = "<p>One</p><title>Two</title><data>Three</data>"
    d = parse_xml(xml, track_positions=True)
    for n in [c for c in d.children[0] if d.kind[c] == dom.ELEMENT]:
        assert dom.source_range(d, n) is not None
        assert dom.end_source_range(d, n) is not None


def test_tracks_closing_heading_tags():
    # PositionTest.tracksClosingHeadingTags
    html = "<h1>One</h1><h2>Two</h2><h10>Ten</h10>"
    d = parse(html, track_positions=True)
    for n in [c for c in d.element_children(d.body())]:
        assert dom.source_range(d, n) is not None
        assert dom.end_source_range(d, n) is not None
    [h2] = sel.select(d, "h2")
    assert _rng(d, h2) == "1,13:12-1,17:16"
    assert _erng(d, h2) == "1,20:19-1,25:24"


def test_tracks_attributes():
    # PositionTest.tracksAttributes
    html = ('<div one="Hello there" id=1 class=foo attr1 = "bar &amp; qux" '
            "attr2='val &gt x' attr3=\"\" attr4 attr5>Text")
    d = parse(html, track_positions=True)
    [div] = sel.select(d, "div")
    for k, v in d.attrs[div].items():
        ar = dom.attr_source_range(d, div, k)
        assert ar is not None
        assert ar[0] != ar[1]  # name range never implicit
        if not v:
            assert ar[2] == ar[3]  # empty value -> implicit
        else:
            assert ar[2] != ar[3]
    got = accumulate_attr_positions(d, div)
    assert got == ("one:5-8=10-21; id:23-25=26-27; class:28-33=34-37; "
                   "attr1:38-43=47-60; attr2:62-67=69-78; attr3:80-85=85-85; "
                   "attr4:89-94=94-94; attr5:95-100=100-100; ")


def test_tracks_attributes_across_lines():
    # PositionTest.tracksAttributesAcrossLines
    html = "<div one=\"Hello\nthere\" \nid=1 \nclass=\nfoo\nattr5>Text"
    d = parse(html, track_positions=True)
    [div] = sel.select(d, "div")
    got = accumulate_attr_positions(d, div)
    assert got == ("one:5-8=10-21; id:24-26=27-28; class:30-35=37-40; "
                   "attr5:41-46=46-46; ")
    assert d.attrs[div]["class"] == "foo"
    ar = dom.attr_source_range(d, div, "class")
    assert (f"{dom.position_str(d, ar[0])}-{dom.position_str(d, ar[1])}="
            f"{dom.position_str(d, ar[2])}-{dom.position_str(d, ar[3])}") == \
        "4,1:30-4,6:35=5,1:37-5,4:40"


def test_track_attribute_position_in_first_element():
    # PositionTest.trackAttributePositionInFirstElement
    html = "<html lang=en class=dark><p hidden></p></html>"
    d = parse(html, track_positions=True)
    out = []
    for n, _ in d.preorder(d.html_el()):
        r = dom.source_range(d, n) or (-1, -1)
        name = d.tag[n] if d.kind[n] == dom.ELEMENT else dom.KIND_NAMES[d.kind[n]]
        s = f"{name}:{r[0]}-{r[1]}"
        if d.kind[n] == dom.ELEMENT:
            e = dom.end_source_range(d, n) or (-1, -1)
            s += f"~{e[0]}-{e[1]}"
        out.append(s + "; ")
        out.append(accumulate_attr_positions(d, n))
    got = "".join(out)
    assert got == ("html:0-25~39-46; lang:6-10=11-13; class:14-19=20-24; "
                   "head:25-25~25-25; body:25-25~46-46; p:25-35~35-39; "
                   "hidden:28-34=34-34; ")

    dx = parse_xml(html, track_positions=True)
    outx = []
    root = next(c for c in dx.children[0] if dx.kind[c] == dom.ELEMENT)
    for n, _ in dx.preorder(root):
        r = dom.source_range(dx, n) or (-1, -1)
        name = dx.tag[n]
        e = dom.end_source_range(dx, n) or (-1, -1)
        outx.append(f"{name}:{r[0]}-{r[1]}~{e[0]}-{e[1]}; ")
        outx.append(accumulate_attr_positions(dx, n))
    assert "".join(outx) == ("html:0-25~39-46; lang:6-10=11-13; "
                             "class:14-19=20-24; p:25-35~35-39; "
                             "hidden:28-34=34-34; ")


def test_track_attributes_positions_dedupes():
    # PositionTest.trackAttributesPositionsDedupes (html lowercase + xml raw)
    html = "<p id=1 id=2 Id=3 Id=4 id=5 Id=6>"
    d = parse(html, track_positions=True)
    [p] = sel.select(d, "p")
    assert accumulate_attr_positions(d, p) == "id:3-5=6-7; "
    dx = parse_xml(html, track_positions=True)
    px = next(c for c in dx.children[0] if dx.kind[c] == dom.ELEMENT)
    assert accumulate_attr_positions(dx, px) == "id:3-5=6-7; Id:13-15=16-17; "


def test_track_attributes_positions_directional_dedupes():
    # PositionTest.trackAttributesPositionsDirectionalDedupes
    html = "<p Id=1 id=2 Id=3 Id=4 id=5 Id=6>"
    d = parse(html, track_positions=True)
    [p] = sel.select(d, "p")
    assert accumulate_attr_positions(d, p) == "id:3-5=6-7; "
    dx = parse_xml(html, track_positions=True)
    px = next(c for c in dx.children[0] if dx.kind[c] == dom.ELEMENT)
    assert accumulate_attr_positions(dx, px) == "Id:3-5=6-7; id:8-10=11-12; "


def test_tracks_frag():
    # PositionTest.tracksFrag
    from ksoup_spark.kernel.treebuilder import parse_fragment

    html = "<h1 id=1>One</h1>\n<h2 id=2>Two</h2><h10>Ten</h10>"
    d, nodes = parse_fragment(html, "body", track_positions=True)
    out = []
    for top in nodes:
        for n, _ in d.preorder(top):
            r = dom.source_range(d, n) or (-1, -1)
            name = (d.tag[n] if d.kind[n] == dom.ELEMENT
                    else dom.KIND_NAMES[d.kind[n]])
            s = f"{name}:{r[0]}-{r[1]}"
            if d.kind[n] == dom.ELEMENT:
                e = dom.end_source_range(d, n) or (-1, -1)
                s += f"~{e[0]}-{e[1]}"
            out.append(s + "; ")
            out.append(accumulate_attr_positions(d, n))
    assert "".join(out) == ("h1:0-9~12-17; id:4-6=7-8; #text:9-12; "
                            "#text:17-18; h2:18-27~30-35; id:22-24=25-26; "
                            "#text:27-30; h10:35-40~43-49; #text:40-43; ")


def test_tracks_after_p_self_close():
    # PositionTest.tracksAfterPSelfClose
    html = "foo<p/>bar &amp; 2"
    d = parse(html, track_positions=True)
    got = accumulate_positions(
        d, [n for n, _ in d.preorder(d.body())])
    assert got == "body:0-0~18-18; #text:0-3; p:3-7~3-7; #text:7-18; "


def test_tracks_first_textnode():
    # PositionTest.tracksFirstTextnode
    html = "foo<p></p>bar<p></p><div><b>baz</b></div>"
    d = parse(html, track_positions=True)
    got = accumulate_positions(d, [n for n, _ in d.preorder(d.body())])
    assert got == ("body:0-0~41-41; #text:0-3; p:3-6~6-10; #text:10-13; "
                   "p:13-16~16-20; div:20-25~35-41; b:25-28~31-35; "
                   "#text:28-31; ")


def test_tracks_document():
    # PositionTest.tracksDocument
    html = "<!doctype html><title>Foo</title><p>Bar."
    d = parse(html, track_positions=True)
    got = accumulate_positions(d, [n for n, _ in d.preorder(0)])
    assert got == ("#document:0-0~40-40; #doctype:0-15; html:15-15~40-40; "
                   "head:15-15~33-33; title:15-22~15-33; #text:22-25; "
                   "body:33-33~40-40; p:33-36~40-40; #text:36-40; ")


def test_tracks_document_xml():
    # PositionTest.tracksDocumentXml
    html = "<!doctype html><title>Foo</title><p>Bar."
    d = parse_xml(html, track_positions=True)
    got = accumulate_positions(d, [n for n, _ in d.preorder(0)])
    assert got == ("#document:0-0~40-40; #doctype:0-15; title:15-22~25-33; "
                   "#text:22-25; p:33-36~40-40; #text:36-40; ")
