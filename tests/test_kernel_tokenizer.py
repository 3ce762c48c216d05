"""Tokenizer & entity cases — semantics from parser/TokeniserTest.kt,
TokeniserStateTest.kt:14-45 and nodes/EntitiesTest.kt."""

import pytest

from ksoup_spark.kernel import treebuilder as tb
from ksoup_spark.kernel import textops as tx
from ksoup_spark.kernel.entities import unescape


def text_of(html: str) -> str:
    d = tb.parse(html)
    return tx.element_text(d, d.body())


@pytest.mark.parametrize("ws", ["\t", "\n", "\r", "\f", " ", "  \t"])
def test_whitespace_in_tags(ws):
    # TokeniserStateTest whitespace matrix: <div WS> parses fine
    d = tb.parse(f"<div{ws}>test</div{ws}>")
    assert tx.element_text(d, d.body()) == "test"
    d2 = tb.parse(f"<div{ws}id=x>test</div>")
    assert d2.get_attr(d2.find_first("div"), "id") == "x"


def test_charref_in_rcdata():
    assert text_of("<textarea>You&I</textarea>") == "You&I"
    assert text_of("<textarea>You&amp;I</textarea>") == "You&I"


def test_numeric_refs():
    assert text_of("<p>&#65;&#x42;c</p>") == "ABc"
    # out of range -> U+FFFD
    assert text_of("<p>&#x110000;</p>") == "�"
    # win-1252 remap of 0x80-0x9F (Tokeniser.kt:345-353)
    assert text_of("<p>&#x80;</p>") == "€"
    assert text_of("<p>&#146;</p>") == "’"


def test_named_entities_base_vs_extended():
    # base entity matches without ';'
    assert text_of("<p>&amp x</p>") == "& x"
    assert text_of("<p>&lt&gt</p>") == "<>"
    # base (HTML4/legacy) set matches without ';' too
    assert text_of("<p>&frac12 x</p>") == "½ x"
    # extended requires ';'
    assert text_of("<p>&there4;</p>") == "∴"
    assert text_of("<p>&there4 x</p>") == "&there4 x"
    # unknown named ref stays literal
    assert text_of("<p>&ampx;</p>") == "&ampx;"
    # multi-codepoint entity
    assert unescape("&NotEqualTilde;") == "≂̸"


def test_entity_in_attr_suppression():
    # &not followed by '=' inside attribute: kept literal (Tokeniser.kt:205-208)
    d = tb.parse('<a href="?a=1&not=2">x</a>')
    assert d.get_attr(d.find_first("a"), "href") == "?a=1&not=2"
    d2 = tb.parse('<a href="?a=1&amp;b=2">x</a>')
    assert d2.get_attr(d2.find_first("a"), "href") == "?a=1&b=2"


def test_attribute_quoting_modes():
    d = tb.parse("<div a=1 b='two' c=\"three\" d e=''>x</div>")
    n = d.find_first("div")
    assert d.attrs[n] == {"a": "1", "b": "two", "c": "three", "d": None, "e": ""}


def test_rough_attribute_survives():
    # HtmlParserTest.kt:30-39: class="foo > bar"
    d = tb.parse('<p class="foo > bar">x</p>')
    assert d.get_attr(d.find_first("p"), "class") == "foo > bar"


def test_duplicate_attribute_first_kept():
    # HtmlParserTest.kt:41-55
    d = tb.parse('<p One=One ONE=Two one=Three>x</p>')
    assert d.attrs[d.find_first("p")] == {"one": "One"}
    assert d.errors >= 0


def test_comments():
    d = tb.parse("<p>a</p><!-- comment --><p>b</p>")
    from ksoup_spark.kernel import dom
    comments = [n for n, _ in d.preorder() if d.kind[n] == dom.COMMENT]
    assert len(comments) == 1
    assert d.text[comments[0]] == " comment "
    # bang-close and empty comments
    d2 = tb.parse("<!--c--!><p>x</p>")
    assert text_of("<!--c--!><p>x</p>") == "x"
    assert text_of("<!--><p>x</p>") == "x"


def test_bogus_comment():
    from ksoup_spark.kernel import dom
    d = tb.parse("<?php echo 1 ?><p>x</p>")
    comments = [n for n, _ in d.preorder() if d.kind[n] == dom.COMMENT]
    assert len(comments) == 1


def test_unterminated_structures_no_crash():
    for html in ["<p", "<p a", "<p a=", "<p a='b", "<!--", "<!-- x", "<!doctype",
                 "<![CDATA[x", "<title>x", "<script>x", "</", "<"]:
        tb.parse(html)  # must not raise


def test_self_closing_unknown_tag():
    d = tb.parse("<foo /><p>x</p>")
    assert d.find_first("foo") != -1
    assert text_of("<foo /><p>x</p>") == "x"


def test_null_in_tag_name_and_attr():
    d = tb.parse("<di\x00v att\x00r=v\x00al>x</di\x00v>")
    n = d.children[d.body()][0]
    assert d.tag[n] == "di�v"
    assert d.attrs[n] == {"att�r": "v�al"}


def test_script_data_escapes():
    d = tb.parse("<script><!-- if (a<b) --></script><p>after</p>")
    s = d.find_first("script")
    assert tx.data_text(d, s) == "<!-- if (a<b) -->"
    assert text_of("<script><!-- if (a<b) --></script><p>after</p>") == "after"
    # double-escaped: inner </script> inside <!-- <script> ... stays data
    html = '<script><!--<script>x</script>--></script><p>end</p>'
    d2 = tb.parse(html)
    assert tx.data_text(d2, d2.find_first("script")) == "<!--<script>x</script>-->"


def test_cdata_token():
    from ksoup_spark.kernel import dom
    d = tb.parse("<p><![CDATA[<sender>x</sender>]]></p>")
    cd = [n for n, _ in d.preorder() if d.kind[n] == dom.CDATA]
    assert len(cd) == 1 and d.text[cd[0]] == "<sender>x</sender>"


def test_doctype_parsing():
    from ksoup_spark.kernel import dom
    d = tb.parse('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" "http://x">' "<p>y</p>")
    dt = [n for n, _ in d.preorder() if d.kind[n] == dom.DOCTYPE]
    assert len(dt) == 1
    assert d.attrs[dt[0]]["publicid"] == "-//W3C//DTD XHTML 1.0 Strict//EN"
    assert d.quirks == 0
    d2 = tb.parse("<p>x</p>")
    assert d2.quirks == 1  # no doctype -> quirks


def test_unescape_reference_cases():
    # EntitiesTest.getByName / unescapeMultiChars semantics
    assert unescape("&nGt;") == "≫⃒"
    assert unescape("&fjlig;") == "fj"
    assert unescape("&gg;") == "≫"
    assert unescape("&copy;") == "©"
    assert unescape("&Gt; &Gg;&#x338; &Gt;&#x20D2; &Gt;&#x338; &Gt; &Gt;") \
        == "≫ ⋙̸ ≫⃒ ≫̸ ≫ ≫"


def test_unescape_strict_vs_loose():
    # base entities without ';' decode in text; unknown stays literal
    assert unescape("Hello &amp;&LT; &reg; &icy; &hopf; &icy &hopf") \
        == "Hello &< ® и 𝕙 &icy &hopf"


def test_nested_quotes_in_attrs():
    d = tb.parse('<p foo=\'bar "qux" baz\'>x</p>')
    assert d.get_attr(d.find_first("p"), "foo") == 'bar "qux" baz'
    d2 = tb.parse('<p foo="bar \'qux\' baz">x</p>')
    assert d2.get_attr(d2.find_first("p"), "foo") == "bar 'qux' baz"


def _sel_text(h, q):
    from ksoup_spark.kernel import selector as sel
    d = tb.parse(h)
    n = sel.select_first(d, q)
    return tx.element_text(d, n) if n != -1 else None


def test_end_tag_open_states():
    # TokeniserStateTest.testEndTagOpen
    assert _sel_text("<div>hello world</", "div") == "hello world</"
    assert _sel_text("<div>hello world</div>", "div") == "hello world"
    assert _sel_text("<div>fake</></div>", "div") == "fake"
    assert _sel_text("<div>fake</?</div>", "div") == "fake"


def test_rcdata_lessthan_sign():
    # TokeniserStateTest.testRcdataLessthanSign incl. the bail-out deviation
    assert _sel_text("<textarea><fake></textarea>", "textarea") == "<fake>"
    assert _sel_text("<textarea><open", "textarea") == ""
    assert _sel_text("<textarea>hello world</?fake</textarea>", "textarea") \
        == "hello world</?fake"


def test_rcdata_bailout_reparses_content():
    # title without end tag: following markup parses as real elements
    d = tb.parse("<title>No end tag <p>Real para")
    assert tx.doc_title(d) == "No end tag"
    assert _sel_text("<title>No end tag <p>Real para", "p") == "Real para"


@pytest.mark.parametrize("c", ["\t", "\n", "\r", "\f", " "])
def test_rcdata_end_tag_name_whitespace(c):
    assert _sel_text(f"<textarea>data</textarea{c}>", "textarea") == "data"


def test_comment_end_coverage():
    from ksoup_spark.kernel import dom
    d = tb.parse("<html><head></head><body><img src=foo>"
                 "<!-- <table><tr><td></table> --! --- --><p>Hello</p></body></html>")
    comments = [n for n, _ in d.preorder() if d.kind[n] == dom.COMMENT]
    assert d.text[comments[0]] == " <table><tr><td></table> --! --- "
    d2 = tb.parse("<html><head></head><body><img src=foo>"
                  "<!-- <table><tr><td></table> --!---><p>Hello</p></body></html>")
    comments2 = [n for n, _ in d2.preorder() if d2.kind[n] == dom.COMMENT]
    assert d2.text[comments2[0]] == " <table><tr><td></table> --!-"


def test_less_in_tag_as_new_tag():
    # handlesLessInTagThanAsNewTag (out-of-spec reference behavior)
    from ksoup_spark.kernel.serialize import inner_html
    d = tb.parse("<p\n<p<div id=one <span>Two")
    got = inner_html(d, d.body(), pretty=False)
    assert got == '<p></p><p></p><div id="one"><span>Two</span></div>'


def test_bogus_end_tag_comment_keeps_solidus():
    # TokeniserState.EndTagOpen pushes the '/' back into the bogus comment
    # (kt:147-149): '</ foo>' -> comment '/ foo'
    from ksoup_spark.kernel.treebuilder import parse
    from ksoup_spark.kernel.serialize import inner_html

    d = parse("x</ foo>y")
    assert inner_html(d, d.body(), pretty=False) == "x<!--/ foo-->y"
