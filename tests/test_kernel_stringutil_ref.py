"""StringUtil.resolve parity (internal/StringUtilTest.kt:119-164): the full
published resolve table including the RFC 3986 §5.4.2 examples, plus
control-char stripping and the absUrl contract over it."""

from ksoup_spark.kernel.dom import resolve_url
from ksoup_spark.kernel.selector import select_first
from ksoup_spark.kernel.treebuilder import parse

RESOLVE_TABLE = [
    ("http://example.com", "./one/two?three", "http://example.com/one/two?three"),
    ("http://example.com?one", "./one/two?three", "http://example.com/one/two?three"),
    ("http://example.com", "./one/two?three#four",
     "http://example.com/one/two?three#four"),
    ("http://example.com/", "https://example.com/one", "https://example.com/one"),
    ("http://example.com/two/", "../one/two.html",
     "http://example.com/one/two.html"),
    ("https://example.com/", "//example2.com/one", "https://example2.com/one"),
    ("https://example.com:8080", "./one", "https://example.com:8080/one"),
    ("http://example.com/", "https://example2.com/one", "https://example2.com/one"),
    ("wrong", "https://example.com/one", "https://example.com/one"),
    ("https://example.com/one", "", "https://example.com/one"),
    ("https://example.com/one/two/", "../two.c", "https://example.com/one/two.c"),
    ("https://example.com/one/two", "../two.c", "https://example.com/two.c"),
    ("wrong", "also wrong", ""),
    ("ftp://example.com/two/", "../one", "ftp://example.com/one"),
    ("ftp://example.com/one/", "./two.c", "ftp://example.com/one/two.c"),
    ("ftp://example.com/one/", "two.c", "ftp://example.com/one/two.c"),
    # rfc3986 section 5.4.2
    ("http://example.com/b/c/d;p?q", "../../../g", "http://example.com/g"),
    ("http://example.com/b/c/d;p?q", "../../../../g", "http://example.com/g"),
    ("http://example.com/b/c/d;p?q", "/./g", "http://example.com/g"),
    ("http://example.com/b/c/d;p?q", "/../g", "http://example.com/g"),
    ("http://example.com/b/c/d;p?q", "g.", "http://example.com/b/c/g."),
    ("http://example.com/b/c/d;p?q", ".g", "http://example.com/b/c/.g"),
    ("http://example.com/b/c/d;p?q", "g..", "http://example.com/b/c/g.."),
    ("http://example.com/b/c/d;p?q", "..g", "http://example.com/b/c/..g"),
    ("http://example.com/b/c/d;p?q", "./../g", "http://example.com/b/g"),
    ("http://example.com/b/c/d;p?q", "./g/.", "http://example.com/b/c/g/"),
    ("http://example.com/b/c/d;p?q", "g/./h", "http://example.com/b/c/g/h"),
    ("http://example.com/b/c/d;p?q", "g/../h", "http://example.com/b/c/h"),
    ("http://example.com/b/c/d;p?q", "g;x=1/./y", "http://example.com/b/c/g;x=1/y"),
    ("http://example.com/b/c/d;p?q", "g;x=1/../y", "http://example.com/b/c/y"),
    ("http://example.com/b/c/d;p?q", "g?y/./x", "http://example.com/b/c/g?y/./x"),
    ("http://example.com/b/c/d;p?q", "g?y/../x", "http://example.com/b/c/g?y/../x"),
    ("http://example.com/b/c/d;p?q", "g#s/./x", "http://example.com/b/c/g#s/./x"),
    ("http://example.com/b/c/d;p?q", "g#s/../x", "http://example.com/b/c/g#s/../x"),
]


def test_resolves_relative_urls():
    for base, rel, want in RESOLVE_TABLE:
        assert resolve_url(base, rel) == want, (base, rel)


def test_strips_control_chars_from_urls():
    # StringUtilTest.stripsControlCharsFromUrls
    assert resolve_url("\nhttps://\texample.com/", "\r\nfo\to:ba\br") == "foo:bar"


def test_abs_url_unresolvable_relative_is_empty():
    # Node.absUrl (Node.kt:234-244): no base + relative href -> ""
    d = parse('<a href="/rel">x</a>')
    a = select_first(d, "a")
    assert d.abs_url(a, "href") == ""
    assert d.get_attr(a, "href") == "/rel"


def test_abs_url_absolute_value_without_base():
    d = parse('<a href="https://example.com/one">x</a>')
    a = select_first(d, "a")
    assert d.abs_url(a, "href") == "https://example.com/one"
