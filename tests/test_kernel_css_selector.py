"""Element.cssSelector ports.

Reference: nodes/Element.kt:836-880 (cssSelector/cssSelectorComponent),
parser/TokenQueue.kt:366-377 (escapeCssIdentifier); tests from
ElementTest.kt:1214-1240 (testCssPath, testCssPathDuplicateIds) and
TokenQueueTest.kt:56-58,90-110 (escapeCssIdentifier, testNestedQuotes).
"""

from ksoup_spark.kernel import selector as S
from ksoup_spark.kernel import treebuilder as tb


def _sel(html: str, query: str) -> tuple:
    d = tb.parse(html)
    return d, S.select(d, query)


def test_css_path():
    # ElementTest.kt:1214-1226
    d, divs = _sel(
        '<div id="id1">A</div><div>B</div><div class="c1 c2">C</div>', "div")
    a, b, c = divs
    assert S.css_selector(d, a) == "#id1"
    assert S.css_selector(d, b) == "html > body > div:nth-child(2)"
    assert S.css_selector(d, c) == "html > body > div.c1.c2"
    # and the paths round-trip: select(cssSelector) finds exactly that node
    for n in (a, b, c):
        got = S.select(d, S.css_selector(d, n))
        assert got and got[0] == n


def test_css_path_duplicate_ids():
    # ElementTest.kt:1229-1240: non-unique ids fall back to the positional path
    d, divs = _sel(
        '<article><div id="dupe">A</div><div id="dupe">B</div>'
        '<div class="c1">C</div></article>', "div")
    a, b, c = divs
    assert S.css_selector(d, a) == "html > body > article > div:nth-child(1)"
    assert S.css_selector(d, b) == "html > body > article > div:nth-child(2)"
    assert S.css_selector(d, c) == "html > body > article > div.c1"
    for n in (a, b, c):
        got = S.select(d, S.css_selector(d, n))
        assert got and got[0] == n


def test_escape_css_identifier():
    # TokenQueueTest.kt:56-58
    assert S.escape_css_identifier("one#two.three/four\\five") == \
        "one\\#two\\.three\\/four\\\\five"


def test_css_selector_escaped_id():
    # an id needing escapes still prefers the #id form and round-trips
    d, els = _sel('<p id="i.d">x</p>', "p")
    path = S.css_selector(d, els[0])
    assert path == "#i\\.d"
    assert S.select(d, path) == [els[0]]


def test_nested_quotes_css_selector():
    # TokenQueueTest.kt:90-110: attribute selectors with nested quotes
    cases = [
        ('<html><body><a id="identifier" onclick="func(\'arg\')" /></body></html>',
         'a[onclick*="(\'arg"]'),
        ("<html><body><a id=\"identifier\" onclick=func('arg') /></body></html>",
         'a[onclick*="(\'arg"]'),
        ('<html><body><a id="identifier" onclick=\'func("arg")\' /></body></html>',
         "a[onclick*='(\"arg']"),
    ]
    for html, query in cases:
        d, els = _sel(html, query)
        assert els, f"select failed: {query}"
        assert S.css_selector(d, els[0]) == "#identifier"


def test_namespaced_tag_renders_pipe():
    # escaped namespace colon becomes CSS ns|tag (Element.kt:862)
    d = tb.parse("<fb:comment>hi</fb:comment>")
    els = S.select(d, "fb|comment")
    assert els
    assert S.css_selector(d, els[0]).endswith("fb|comment")


def test_element_is_and_expect_first():
    # Element.is (Element.kt:522-533) / expectFirst (Element.kt:498-508)
    d = tb.parse('<div><p class=a>one</p><p>two</p></div>')
    pa, pb = S.select(d, "p")
    assert S.element_is(d, pa, "p.a")
    assert not S.element_is(d, pb, "p.a")
    assert S.element_is(d, pa, "div > p:first-child")
    assert S.expect_first(d, "p.a") == pa
    try:
        S.expect_first(d, "blockquote")
        raise AssertionError("expected SelectorError")
    except S.SelectorError:
        pass
