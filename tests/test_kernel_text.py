"""Text extraction goldens — semantics from nodes/ElementTest.kt:82-178
(testGetText, testNormalisesText, testKeepsPreText*, testBrHasSpace,
testWholeText) and internal/StringUtil.kt:137-191 whitespace rules."""

import pytest

from ksoup_spark.kernel import treebuilder as tb
from ksoup_spark.kernel import textops as tx


def text_of(html: str) -> str:
    d = tb.parse(html)
    return tx.element_text(d, d.body())


@pytest.mark.parametrize(
    "html,want",
    [
        ("<p>Hello <b>there</b> now", "Hello there now"),
        (
            "<p>Hello<p>There.</p> \n <p>Here <b>is</b> \n s<b>om</b>e text.",
            "Hello There. Here is some text.",
        ),
        ("<div>One</div>Two", "One Two"),
        ("<p>Hello \n \n there.</p> <div><pre>  What's \n\n  that?</pre>",
         "Hello there.   What's \n\n  that?"),
        ("<pre><code>code\n\ncode</code></pre>", "code\n\ncode"),
        ("<textarea>You&I</textarea>", "You&I"),
        # nbsp is whitespace; zero-width space / soft hyphen dropped
        ("<div>a b</div>", "a b"),
        ("<div> a b​­</div>", "a b"),
        ("<span>Hello</span><span>World</span>", "HelloWorld"),
        ("<div><span>Hello</span></div><div>World</div>", "Hello World"),
        # heading auto-close + block boundaries
        ("<h1>One</h1><h2>Two</h2>", "One Two"),
    ],
)
def test_text_goldens(html, want):
    assert text_of(html) == want


def test_br_space_in_text():
    # ElementTest testBrHasSpace: br contributes a space in text()
    assert text_of("<p>Hello<br>there</p>") == "Hello there"
    assert text_of("<p>Hello <br> there</p>") == "Hello there"


def test_whole_text_br_newline():
    d = tb.parse("<p>Hello<br>there</p>")
    assert tx.whole_text(d, d.body()) == "Hello\nthere"


def test_whole_text_preserves_source_ws():
    d = tb.parse("<p>Hello  \n  there</p>")
    assert tx.whole_text(d, d.body()) == "Hello  \n  there"


def test_own_text():
    d = tb.parse("<p>Hello <b>there</b> now!</p>")
    p = d.find_first("p")
    assert tx.own_text(d, p) == "Hello now!"
    assert tx.element_text(d, p) == "Hello there now!"


def test_pre_depth_limit():
    # preserve-whitespace lookup only extends 6 levels up (Element.kt:1885-1898)
    html = "<pre><div><div><div><div><div><div><span>  a  b  </span></div></div></div></div></div></div></pre>"
    d = tb.parse(html)
    # 7 levels: normalization applies again
    assert "a b" in tx.element_text(d, d.body())


def test_data_nodes_not_text():
    d = tb.parse("<p>one</p><script>var x = 1;</script><style>.a{}</style>")
    assert tx.element_text(d, d.body()) == "one"
    s = d.find_first("script")
    assert tx.data_text(d, s) == "var x = 1;"


def test_title_normalised():
    d = tb.parse("<head><title>  Hello\nthere   </title></head>")
    assert tx.doc_title(d) == "Hello there"


def test_cdata_raw_in_text():
    d = tb.parse("<p><svg><![CDATA[  raw  text ]]></svg></p>")
    assert "  raw  text " in tx.whole_text(d, d.body())


def test_whole_text_runs():
    # ElementTest.wholeTextRuns
    d = tb.parse("<div><p id=1></p><p id=2> </p><p id=3>.  </p>")
    from ksoup_spark.kernel import selector as sel
    p1 = sel.select_first(d, "#1")
    p2 = sel.select_first(d, "#2")
    p3 = sel.select_first(d, "#3")
    assert tx.whole_text(d, p1) == ""
    assert tx.whole_text(d, p2) == " "
    assert tx.whole_text(d, p3) == ".  "


def test_button_text_has_space():
    # ElementTest.buttonTextHasSpace: button is block-ish boundary in text()
    d = tb.parse("<html><button>Reply</button><button>All</button></html>")
    assert tx.element_text(d, d.body()) == "Reply All"
    assert tx.whole_text(d, d.body()) == "ReplyAll"


def test_whole_text_block_boundary_preserved():
    d = tb.parse("<p>Hello  <div>\n  there</div></p>")
    assert tx.whole_text(d, d.body()) == "Hello  \n  there"


def test_sibling_navigation():
    # ElementTest.testGetSiblings / nextElementSibling / prevElementSibling
    from ksoup_spark.kernel import dom as D
    from ksoup_spark.kernel import selector as sel
    d = tb.parse("<div><p>Hello<p id=1>there<p>this<p>is<p>an<p id=last>element</div>")
    p = sel.select_first(d, "#1")
    assert tx.element_text(d, p) == "there"
    assert tx.element_text(d, D.previous_element_sibling(d, p)) == "Hello"
    assert tx.element_text(d, D.next_element_sibling(d, p)) == "this"
    d2 = tb.parse("<p>One</p>Two<p>Three</p>")
    first = sel.select_first(d2, "p")
    assert D.previous_element_sibling(d2, first) == -1
    nxt = D.next_element_sibling(d2, first)
    assert tx.element_text(d2, nxt) == "Three"
    assert D.next_element_sibling(d2, nxt) == -1
