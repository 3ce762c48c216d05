"""Attributes.Dataset / small Element accessor ports.

Reference: nodes/Attributes.kt:535-566 (Dataset), Element.kt:292 (dataset),
433 (dataNodes), 886 (siblingElements); test from ElementTest.kt:930-952.
"""

from ksoup_spark.kernel import dom, mutate, selector as S
from ksoup_spark.kernel import treebuilder as tb


def test_dataset_live_view():
    # ElementTest.kt:930-952
    d = tb.parse(
        "<div id=1 data-name=ksoup class=new data-package=jar>Hello</div>"
        "<p id=2>Hello</p>")
    div = S.select(d, "div")[0]
    ds = dom.dataset(d, div)

    assert len(ds) == 2
    assert ds["name"] == "ksoup"
    assert ds["package"] == "jar"
    ds["name"] = "ksoup updated"
    ds["language"] = "java"
    ds.remove("package")
    assert len(ds) == 2
    assert len(d.attrs[div]) == 4
    assert d.get_attr(div, "data-name") == "ksoup updated"
    assert ds["name"] == "ksoup updated"
    assert d.get_attr(div, "data-language") == "java"
    assert ds["language"] == "java"
    # writes through the plain attr API surface in the view too
    mutate.set_attr(d, div, "data-food", "bacon")
    assert len(ds) == 3
    assert ds["food"] == "bacon"
    # bare "data-" key (no name) is not a data attribute
    mutate.set_attr(d, div, "data-", "empty")
    assert len(ds) == 3
    assert ds[""] is None


def test_data_nodes():
    d = tb.parse("<script>a=1</script><style>.x{}</style><p>t</p>")
    script = S.select(d, "script")[0]
    style = S.select(d, "style")[0]
    p = S.select(d, "p")[0]
    assert [d.text[n] for n in mutate.data_nodes(d, [script, style])] == \
        ["a=1", ".x{}"]
    assert mutate.data_nodes(d, [p]) == []


def test_sibling_elements():
    d = tb.parse("<div><p id=a>1</p>text<p id=b>2</p><span id=c>3</span></div>")
    b = S.select(d, "#b")[0]
    sibs = dom.sibling_elements(d, b)
    assert [d.get_attr(n, "id") for n in sibs] == ["a", "c"]
    # root html has no element siblings
    html = S.select(d, "html")[0]
    assert dom.sibling_elements(d, html) == []


def test_elements_bulk_getters():
    # Elements.hasAttr/eachAttr (Elements.kt:70-90): absent -> skipped
    d = tb.parse('<head><base href="http://x.y/"></head>'
                 '<a href=/p>1</a><a>2</a><a href=http://z/>3</a>')
    links = S.select(d, "a")
    assert mutate.bulk_has_attr(d, links, "href")
    assert not mutate.bulk_has_attr(d, links, "rel")
    assert mutate.each_attr(d, links, "href") == ["/p", "http://z/"]
    # abs: prefix resolves against the base latch (Node.kt:151-158)
    assert mutate.each_attr(d, links, "abs:href") == \
        ["http://x.y/p", "http://z/"]
    assert mutate.bulk_has_attr(d, links, "abs:href")


def test_elements_each_text_skips_textless():
    # Elements.eachText (Elements.kt:222-224)
    d = tb.parse("<div>one</div><div></div><div>  </div><div>two</div>")
    divs = S.select(d, "div")
    assert mutate.each_text(d, divs) == ["one", "two"]
    assert mutate.bulk_has_text(d, divs)
    assert not mutate.bulk_has_text(d, divs[1:3])


def test_next_all_prev_all():
    # Elements.nextAll/prevAll (Elements.kt:495-527)
    d = tb.parse("<p id=1>1</p><p id=2>2</p><p id=3>3</p><p id=4>4</p>")
    second = S.select(d, "#2")
    assert [d.get_attr(n, "id") for n in mutate.next_all(d, second)] == \
        ["3", "4"]
    assert [d.get_attr(n, "id") for n in mutate.prev_all(d, second)] == ["1"]
    third = S.select(d, "#3")
    assert [d.get_attr(n, "id")
            for n in mutate.prev_all(d, third, "p:not(#1)")] == ["2"]


def test_select_within_dedups_in_order():
    # Selector.select(query, roots) (Selector.kt:123-141)
    d = tb.parse("<div id=a><span id=s1>x</span></div>"
                 "<div id=b><div id=c><span id=s2>y</span></div></div>")
    roots = S.select(d, "div")  # a, b, c — c nested under b
    got = [d.get_attr(n, "id") for n in mutate.select_within(d, roots, "span")]
    assert got == ["s1", "s2"]  # s2 reachable from both b and c: deduped


def test_node_document_small_surface():
    # Node.kt:802-850, Document.kt:57-162, 619-625
    d = tb.parse("<!doctype html><!--c--><html><body>"
                 "<p id=a>x</p><p id=b>x</p><p id=c>y</p>text</body></html>")
    pa, pb, pc = S.select(d, "p")
    assert mutate.has_same_value(d, pa, pa)
    assert not mutate.has_same_value(d, pa, pb)  # ids differ
    assert not mutate.has_same_value(d, pa, pc)
    sc = mutate.shallow_clone(d, pa)
    assert d.parent[sc] == -1 and d.children[sc] == [] and \
        d.get_attr(sc, "id") == "a"
    # doctype found past the leading comment? comment comes after doctype
    assert d.kind[mutate.document_type(d)] == dom.DOCTYPE
    sibs = mutate.sibling_nodes(d, pb)
    assert pa in sibs and pc in sibs and pb not in sibs
    assert len(sibs) == 3  # two <p> + the trailing text node
    cps = mutate.child_nodes_copy(d, S.select(d, "body")[0])
    assert len(cps) == 4 and all(d.parent[c] == -1 for c in cps)
    mutate.clear_attributes(d, pa)
    assert d.get_attr(pa, "id") is None


def test_expect_form_and_create_shell():
    d = tb.parse("<div><form id=f><input name=q></form></div>")
    assert d.get_attr(mutate.expect_form(d, "form"), "id") == "f"
    try:
        mutate.expect_form(d, "div")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    shell = mutate.create_shell("http://x/")
    from ksoup_spark.kernel.serialize import outer_html
    assert outer_html(shell, shell.html_el(), pretty=False) == \
        "<html><head></head><body></body></html>"
    el = mutate.create_element(shell, "span")
    assert shell.tag[el] == "span" and shell.parent[el] == -1
