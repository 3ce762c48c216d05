"""Mutations, :matchText, boilerplate/main-content, charset-fallback tests.

Semantic content mirrors the reference suites: NodeTest (remove/before/
after/wrap/unwrap/replaceWith), ElementTest (append/prepend/html/text/
class ops), ElementsTest bulk ops, SelectorTest :matchText cases
(ksoup-test/test/com/fleeksoft/ksoup/...).
"""

from ksoup_spark.kernel import dom, mutate as M, selector as S
from ksoup_spark.kernel.boilerplate import (
    main_content_node,
    main_spans,
    main_text,
    strip_boilerplate,
)
from ksoup_spark.kernel.serialize import inner_html, outer_html
from ksoup_spark.kernel.textops import element_text
from ksoup_spark.kernel.treebuilder import parse


def _body_html(d):
    return inner_html(d, d.body(), pretty=False)


# -- node ops ---------------------------------------------------------------

def test_remove_and_empty():
    d = parse("<div><p>One</p><p>Two</p></div>")
    M.remove(d, S.select_first(d, "p"))
    assert _body_html(d) == "<div><p>Two</p></div>"
    M.empty(d, S.select_first(d, "div"))
    assert _body_html(d) == "<div></div>"


def test_before_after_html():
    d = parse("<div><p>mid</p></div>")
    p = S.select_first(d, "p")
    M.before_html(d, p, "<em>a</em>")
    M.after_html(d, p, "<i>b</i><i>c</i>")
    assert _body_html(d) == "<div><em>a</em><p>mid</p><i>b</i><i>c</i></div>"


def test_wrap_and_unwrap():
    # NodeTest wrap semantics: wrapper at node position, node in deepest child
    d = parse("<p>One</p>")
    p = S.select_first(d, "p")
    M.wrap(d, p, "<div class='o'><section></section></div>")
    assert _body_html(d) == '<div class="o"><section><p>One</p></section></div>'
    M.unwrap(d, S.select_first(d, "section"))
    assert _body_html(d) == '<div class="o"><p>One</p></div>'


def test_unwrap_keeps_text_children():
    d = parse("<div>One <span>Two <b>Three</b></span> Four</div>")
    M.unwrap(d, S.select_first(d, "span"))
    assert _body_html(d) == "<div>One Two <b>Three</b> Four</div>"


def test_replace_with():
    d = parse("<div><p>old</p></div>")
    new = M.import_fragment(d, "<h2>new</h2>")[0]
    M.replace_with(d, S.select_first(d, "p"), new)
    assert _body_html(d) == "<div><h2>new</h2></div>"


def test_set_html_and_text():
    d = parse("<div><p>x</p></div>")
    div = S.select_first(d, "div")
    M.set_html(d, div, "<b>bold</b> tail")
    assert _body_html(d) == "<div><b>bold</b> tail</div>"
    M.set_text(d, div, "plain <not-a-tag>")
    assert element_text(d, div) == "plain <not-a-tag>"
    assert "&lt;not-a-tag&gt;" in _body_html(d)


def test_set_text_script_is_data():
    d = parse("<script>a()</script>")
    sc = d.find_first("script")
    M.set_text(d, sc, "b()")
    assert d.kind[d.children[sc][0]] == dom.DATA


def test_append_prepend_child_and_html():
    d = parse("<ol><li>one</li></ol>")
    ol = S.select_first(d, "ol")
    M.append_html(d, ol, "<li>two</li>")
    M.prepend_html(d, ol, "<li>zero</li>")
    assert [element_text(d, li) for li in S.select(d, "li")] == \
        ["zero", "one", "two"]


# -- attribute / class ops ---------------------------------------------------

def test_attr_ops_case_insensitive():
    d = parse('<p CLASS="a">t</p>')
    p = S.select_first(d, "p")
    M.set_attr(d, p, "Class", "b")
    assert d.get_attr(p, "class") == "b"
    M.remove_attr(d, p, "CLASS")
    assert d.get_attr(p, "class") is None


def test_class_ops():
    d = parse('<p class="a b">t</p>')
    p = S.select_first(d, "p")
    M.add_class(d, p, "c")
    M.remove_class(d, p, "a")
    M.toggle_class(d, p, "b")
    M.toggle_class(d, p, "d")
    assert d.get_attr(p, "class") == "c d"


# -- Elements bulk ops -------------------------------------------------------

def test_bulk_ops():
    d = parse("<div><p>1</p><p>2</p><p>3</p></div>")
    ps = S.select(d, "p")
    M.bulk_attr(d, ps, "data-x", "y")
    assert all(d.get_attr(p, "data-x") == "y" for p in ps)
    assert M.eq(ps, 1) == [ps[1]]
    assert M.eq(ps, 9) == []
    assert M.not_(d, ps, ":contains(2)") == [ps[0], ps[2]]
    assert M.next_(d, [ps[0]]) == [ps[1]]
    assert M.prev(d, [ps[2]]) == [ps[1]]
    par = M.parents(d, [ps[0]])
    assert d.tag[par[0]] == "div"
    M.bulk_remove(d, [ps[1]])
    assert len(S.select(d, "p")) == 2


def test_bulk_forms_comments_textnodes():
    d = parse("<form id=f><input></form><div><!--c-->text</div>")
    div = S.select_first(d, "div")
    assert M.forms(d, S.select(d, "*")) == [S.select_first(d, "form")]
    assert [d.text[c] for c in M.comments(d, [div])] == ["c"]
    assert [d.text[t] for t in M.text_nodes(d, [div])] == ["text"]


# -- :matchText --------------------------------------------------------------

def test_match_text_br_split():
    d = parse("<p>One <br>Two</p>")
    got = S.select(d, "p:matchText")
    assert [element_text(d, n) for n in got] == ["One", "Two"]


def test_match_text_serialization_transparent():
    d = parse("<p>One <br>Two</p>")
    S.select(d, "p:matchText")
    assert outer_html(d, d.body(), pretty=False) == \
        "<body><p>One <br>Two</p></body>"


def test_match_text_combined():
    # only text runs directly under div match div:matchText
    d = parse("<div>head<p>inner</p>tail</div>")
    got = S.select(d, "div:matchText")
    assert [element_text(d, n) for n in got] == ["head", "tail"]


# -- charset-encodability fallback ------------------------------------------

def test_charset_fallback_ascii():
    d = parse("<p title='café'>你好</p>")
    html = outer_html(d, d.body(), pretty=False, charset="ascii")
    assert html == '<body><p title="caf&#xe9;">&#x4f60;&#x597d;</p></body>'


def test_charset_fallback_latin1_keeps_encodable():
    d = parse("<p>café — x</p>")
    html = outer_html(d, d.body(), pretty=False, charset="latin-1")
    assert "café" in html and "&#x2014;" in html


def test_charset_utf8_no_escaping():
    d = parse("<p>你好</p>")
    assert "你好" in outer_html(d, d.body(), pretty=False, charset="utf-8")


# -- boilerplate / main content ----------------------------------------------

_PAGE = """<html><head><script>t()</script></head><body>
<header class="masthead"><nav><a href="/">Home</a></nav></header>
<div class="sidebar"><a href="/x">x</a> promo</div>
<article><h2>Title</h2><p>Real body text that should survive.</p>
<img src="i.png"></article>
<div class="comments"><p>junk</p></div>
<footer>(c)</footer></body></html>"""


def test_strip_boilerplate_removes_chrome():
    d = parse(_PAGE)
    n = strip_boilerplate(d)
    assert n >= 4  # script, header, sidebar, comments, footer
    assert S.select(d, "nav, footer, .sidebar, .comments, script") == []
    assert S.select_first(d, "article") != -1


def test_main_text_semantic_container():
    assert main_text(_PAGE) == "Title Real body text that should survive."


def test_main_spans_interleaved_media():
    spans = main_spans(_PAGE)
    assert [s[0] for s in spans] == ["text", "image"]
    assert spans[1][2] == "i.png"


def test_main_content_scoring_without_semantic_tags():
    html = ("<body><div class='x'><a href='a'>A</a><a href='b'>B</a></div>"
            "<div><p>Long real content text wins the scoring contest.</p></div>"
            "</body>")
    assert main_text(html) == "Long real content text wins the scoring contest."


def test_main_content_link_density_penalty():
    # same text mass, but one container is all links
    html = ("<body><div><a href='1'>aaaa bbbb cccc dddd eeee</a></div>"
            "<div>aaaa bbbb cccc dddd eeee</div></body>")
    d = parse(html)
    node = main_content_node(d)
    assert d.children[node] and d.kind[d.children[node][0]] == dom.TEXT


def test_escape_modes():
    # Entities.EscapeMode parity: xhtml -> nbsp numeric; extended -> named
    # entities for unencodable chars (Entities.kt:36-63, test goldens
    # xmlSyntaxSetsEscapeMode / relaxedBaseEntityMatchAndStrictExtendedMatch)
    d = parse("<p>Foo ≻</p>")
    assert outer_html(d, d.body(), pretty=False, charset="ascii",
                      escape_mode="xhtml") == "<body><p>Foo&#xa0;&#x227b;</p></body>"
    d2 = parse("<p>и \U0001d559</p>")
    assert outer_html(d2, d2.body(), pretty=False, charset="ascii",
                      escape_mode="extended") == "<body><p>&icy; &hopf;</p></body>"


def test_fragment_keeps_selfclosing_marks():
    # adopted nodes keep the "<x />" form (Tag.selfClosing travels)
    d = parse("<div></div>")
    M.append_html(d, S.select_first(d, "div"), "<foo /><foo>x</foo>")
    assert _body_html(d) == "<div><foo /><foo>x</foo></div>"


def test_after_on_detached_raises():
    import pytest as _pytest

    d = parse("<p>x</p>")
    p = S.select_first(d, "p")
    M.remove(d, p)
    with _pytest.raises(ValueError):
        M.after(d, p, d.new_node(dom.TEXT, text="y"))


def test_clone_and_insert_children_as_copy():
    # insertChildrenAsCopy flow (ElementTest.kt:2157-2168): source keeps its
    # children, target receives standalone deep copies
    d = parse("<div id=1>Text<p>One</p>Text<p>Two</p></div><div id=2></div>")
    a, b = S.select(d, "div")
    copies = [M.clone(d, c) for c in d.children[a]]
    M.insert_children(d, b, -1, copies)
    assert _body_html(d) == (
        '<div id="1">Text<p>One</p>Text<p>Two</p></div>'
        '<div id="2">Text<p>One</p>Text<p>Two</p></div>')


def test_insert_children_at_index():
    d = parse("<ol><li>a</li><li>c</li></ol>")
    ol = S.select_first(d, "ol")
    M.insert_children(d, ol, 1, M.import_fragment(d, "<li>b</li>"))
    assert _body_html(d) == "<ol><li>a</li><li>b</li><li>c</li></ol>"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        M.insert_children(d, ol, 99, [])


def test_after_with_existing_earlier_sibling():
    # regression (Node.kt:384-390): after(b, a) where a precedes b in the
    # same parent must yield [b, a, c], not [b, c, a]
    d = parse("<div><a>1</a><b>2</b><i>3</i></div>")
    div = d.children[d.body()][0]
    a, b, _i = d.children[div]
    M.after(d, b, a)
    assert [d.tag[c] for c in d.children[div]] == ["b", "a", "i"]


def test_insert_children_with_existing_earlier_child():
    # moving an existing earlier child to a later index must not land one
    # slot right of the requested position (stale-index regression)
    d = parse("<ol><li>a</li><li>b</li><li>c</li></ol>")
    ol = d.children[d.body()][0]
    first = d.children[ol][0]
    M.insert_children(d, ol, 2, [first])
    assert [element_text(d, c) for c in d.children[ol]] == ["b", "c", "a"]


def test_insert_children_invalid_index_is_atomic():
    # Regression: an out-of-range index used to raise AFTER detaching the
    # children, leaving them orphaned. The operation must be atomic.
    import pytest

    from ksoup_spark.kernel import mutate, selector as sel
    from ksoup_spark.kernel.treebuilder import parse

    d = parse("<div id=a><p>one</p></div><div id=b><span>s</span></div>")
    [a] = sel.select(d, "#a")
    [span] = sel.select(d, "span")
    [b] = sel.select(d, "#b")
    with pytest.raises(ValueError):
        mutate.insert_children(d, a, 99, [span])
    # span must still be attached to its original parent
    assert d.parent[span] == b
    assert span in d.children[b]


def test_insert_children_index_accounts_for_own_children():
    # moving el's own child to the end: index len-1 post-detach is valid
    from ksoup_spark.kernel import mutate, selector as sel
    from ksoup_spark.kernel.serialize import inner_html
    from ksoup_spark.kernel.treebuilder import parse

    d = parse("<div id=a><p>one</p><p>two</p><p>three</p></div>")
    [a] = sel.select(d, "#a")
    first = d.children[a][0]
    mutate.insert_children(d, a, 2, [first])
    assert inner_html(d, a, pretty=False) == \
        "<p>two</p><p>three</p><p>one</p>"
