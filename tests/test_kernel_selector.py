"""Selector goldens — semantics from select/SelectorTest.kt:17-80,
CssTest.kt:30-60, QueryParserTest.kt."""

import pytest

from ksoup_spark.kernel import selector as sel
from ksoup_spark.kernel import treebuilder as tb


def ids(d, nodes):
    return [d.get_attr(n, "id") for n in nodes]


def q(html, query):
    d = tb.parse(html)
    return ids(d, sel.select(d, query))


def test_by_tag_case_insensitive():
    assert q("<div id=1><div id=2><p>Hello</p></div></div><div id=3>", "DIV") == ["1", "2", "3"]


def test_escaped_identifiers():
    assert q('<p class="p.p" id=1>x</p>', r"p.p\.p") == ["1"]
    assert q('<div id="i.d">x</div>', r"#i\.d") == ["i.d"]
    assert q('<p id="one-two/three">x</p>', r"p#one-two\/three") == ["one-two/three"]


def test_class_case_insensitive():
    assert q("<p class='ONE two' id=1>x</p><p class=one id=2>y</p>", "P.One") == ["1", "2"]


def test_attribute_selectors():
    h = ('<a href=x id=1></a><span data-a=1 data-b=2 id=2></span>'
         '<p title="The Title" id=3></p><p title="title two" id=4></p>')
    assert q(h, "[href]") == ["1"]
    assert q(h, "[^data-]") == ["2"]
    assert q(h, "[title=the title]") == ["3"]  # trim + case-insensitive
    assert q(h, "[title^=title]") == ["4"]
    assert q(h, "[title$=Title]") == ["3"]
    assert q(h, "[title*=itle]") == ["3", "4"]
    assert q(h, r"[title~=t[a-z]+o]") == ["4"]
    # != matches attribute-absent elements too
    got = q(h, "p[title!=the title]")
    assert got == ["4"]
    # [*] = any attribute present (QueryParser.kt:254-256 maps it to
    # AttributeStarting(""); caught by the reference sweep in round 4)
    h2 = h + "<b id=5></b><i></i>"
    assert q(h2, "[*]") == ["1", "2", "3", "4", "5"]
    assert q(h2, "i[*]") == []


def test_combinators():
    h = ('<div id=1><p id=2>a</p><p id=3>b</p><span id=4>c</span></div>'
         '<div id=5><div id=6><p id=7>d</p></div></div>')
    assert q(h, "div p") == ["2", "3", "7"]
    assert q(h, "div > p") == ["2", "3", "7"]
    assert q(h, "div > div > p") == ["7"]
    assert q(h, "p + p") == ["3"]
    assert q(h, "p ~ span") == ["4"]
    assert q(h, "#2, #4") == ["2", "4"]
    assert q(h, "#1 > *") == ["2", "3", "4"]


def test_or_precedence():
    # ',' binds loosest: "a b, c" = (a b), c
    h = '<div><p id=1>x</p></div><span id=2>y</span>'
    assert q(h, "div p, span") == ["1", "2"]


@pytest.mark.parametrize("i", range(1, 11))
def test_nth_child_loop(i):
    # CssTest.kt:30-60 style exhaustive loop
    h = "<ul>" + "".join(f"<li id={j}>{j}</li>" for j in range(1, 11)) + "</ul>"
    d = tb.parse(h)
    got = ids(d, sel.select(d, f"li:nth-child({i})"))
    assert got == [str(i)]
    got_last = ids(d, sel.select(d, f"li:nth-last-child({i})"))
    assert got_last == [str(11 - i)]


def test_nth_of_type():
    h = "<div><p id=p1></p><span id=s1></span><p id=p2></p><span id=s2></span></div>"
    assert q(h, "p:nth-of-type(2)") == ["p2"]
    assert q(h, "span:first-of-type") == ["s1"]
    assert q(h, "span:last-of-type") == ["s2"]
    assert q(h, "p:only-of-type") == []
    h2 = "<div><p id=a></p><span></span></div>"
    assert q(h2, "p:only-of-type") == ["a"]


def test_structural_pseudos():
    h = "<div id=1><p id=2></p></div><div id=3></div>"
    assert q(h, "div:has(p)") == ["1"]
    assert q(h, "div:not(:has(p))") == ["3"]
    assert q(h, "div:empty") == ["3"]
    assert q(h, ":root") == [None]  # html element has no id
    h2 = "<div id=o><span id=only></span></div>"
    assert q(h2, "span:only-child") == ["only"]


def test_has_relative():
    h = "<div id=1><a>x</a></div><div id=2><p><a>y</a></p></div>"
    assert q(h, "div:has(> a)") == ["1"]
    assert q(h, "div:has(a)") == ["1", "2"]


def test_contains_family():
    h = ('<div id=1>Hello <b>World</b></div><div id=2>plain</div>'
         '<script id=s>data here</script>')
    assert q(h, "div:contains(hello world)") == ["1"]
    assert q(h, "div:containsOwn(hello)") == ["1"]
    assert q(h, "div:containsOwn(world)") == []
    assert q(h, "div:matches(W\\w+d)") == ["1"]
    assert q(h, "div:matchesOwn(^plain$)") == ["2"]
    assert q(h, "script:containsData(data)") == ["s"]


def test_contains_whole_text():
    h = "<p id=1>Hello  World</p><p id=2>hello world</p>"
    assert q(h, "p:containsWholeText(Hello  World)") == ["1"]


def test_index_pseudos():
    h = "<ul><li id=0>a<li id=1>b<li id=2>c</ul>"
    assert q(h, "li:lt(2)") == ["0", "1"]
    assert q(h, "li:gt(1)") == ["2"]
    assert q(h, "li:eq(1)") == ["1"]


def test_is_pseudo():
    h = "<div id=1><p id=2>x</p></div><span id=3>y</span>"
    assert q(h, ":is(p, span)") == ["2", "3"]


def test_root_anchored_query():
    d = tb.parse("<div id=1><p id=2><span id=3></span></p></div>")
    div = sel.select_first(d, "div")
    got = ids(d, sel.select(d, "> p", root=div))
    assert got == ["2"]


def test_select_first_short_circuit():
    d = tb.parse("<p id=a>x</p><p id=b>y</p>")
    n = sel.select_first(d, "p")
    assert d.get_attr(n, "id") == "a"


def test_pseudo_arg_with_parens():
    h = "<p id=1>1(2)3</p>"
    assert q(h, "p:contains(1(2)3)") == ["1"]


def test_unknown_pseudo_raises():
    with pytest.raises(sel.SelectorError):
        sel.parse_query(":bogus-pseudo")


def test_namespaced_tags():
    h = "<svg><text id=t>x</text></svg>"
    assert q(h, "svg text") == ["t"]


def test_invalid_regex_is_selector_error():
    import pytest as _pytest

    from ksoup_spark.kernel.selector import SelectorError, parse_query

    for q in (":matches([)", ":matchesOwn(*)", "[a~=(]"):
        with _pytest.raises(SelectorError):
            parse_query(q)
