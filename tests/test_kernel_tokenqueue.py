"""TokenQueue parity — ports of the remaining reference TokenQueueTest.kt
cases (escapeCssIdentifier and testNestedQuotes already live in
test_kernel_css_selector.py). Reference: ksoup-test/test/com/fleeksoft/
ksoup/parser/TokenQueueTest.kt."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksoup_spark.kernel import treebuilder as tb  # noqa: E402
from ksoup_spark.kernel import selector as S  # noqa: E402
from ksoup_spark.kernel.selector import SelectorError, TokenQueue  # noqa: E402


def test_chomp_balanced():
    # TokenQueueTest.kt:15-24
    tq = TokenQueue(":contains(one (two) three) four")
    pre = tq.consume_to("(")
    guts = tq.chomp_balanced("(", ")")
    remainder = tq.remainder()
    assert pre == ":contains"
    assert guts == "one (two) three"
    assert remainder == " four"


def test_chomp_escaped_balanced():
    # TokenQueueTest.kt:26-36
    tq = TokenQueue(":contains(one (two) \\( \\) \\) three) four")
    pre = tq.consume_to("(")
    guts = tq.chomp_balanced("(", ")")
    remainder = tq.remainder()
    assert pre == ":contains"
    assert guts == "one (two) \\( \\) \\) three"
    assert TokenQueue.unescape(guts) == "one (two) ( ) ) three"
    assert remainder == " four"


def test_chomp_balanced_matches_as_much_as_possible():
    # TokenQueueTest.kt:38-44
    tq = TokenQueue("unbalanced(something(or another)) else")
    tq.consume_to("(")
    match = tq.chomp_balanced("(", ")")
    assert match == "something(or another)"


def test_unescape():
    # TokenQueueTest.kt:46-49
    assert TokenQueue.unescape("one \\( \\) \\\\") == "one ( ) \\"


def test_unescape_2():
    # TokenQueueTest.kt:51-54
    assert TokenQueue.unescape("\\\\\\&") == "\\&"


def test_chomp_to_ignore_case():
    # TokenQueueTest.kt:60-69
    t = "<textarea>one < two </TEXTarea>"
    tq = TokenQueue(t)
    data = tq.chomp_to_ignore_case("</textarea")
    assert data == "<textarea>one < two "
    tq = TokenQueue("<textarea> one two < three </oops>")
    data = tq.chomp_to_ignore_case("</textarea")
    assert data == "<textarea> one two < three </oops>"


def test_add_first():
    # TokenQueueTest.kt:71-77
    tq = TokenQueue("One Two")
    tq.consume_word()
    tq.add_first("Three")
    assert tq.remainder() == "Three Two"


def test_consume_to_ignore_second_call():
    # TokenQueueTest.kt:79-87
    t = "<textarea>one < two </TEXTarea> third </TEXTarea>"
    tq = TokenQueue(t)
    data = tq.chomp_to_ignore_case("</textarea>")
    assert data == "<textarea>one < two "
    data = tq.chomp_to_ignore_case("</textarea>")
    assert data == " third "


def test_chomp_balanced_throws_on_unbalanced():
    # TokenQueueTest.kt:112-122 — exact reference error message
    tq = TokenQueue("unbalanced(something(or another)) else")
    tq.consume_to("(")
    with pytest.raises(SelectorError) as exc:
        tq.chomp_balanced("(", "+")
    assert str(exc.value) == \
        "Did not find balanced marker at 'something(or another)) else'"


def _re_escape_kotlin(s: str) -> str:
    """Kotlin Regex.escape emits \\Q..\\E quoting (what the reference test
    feeds :matches)."""
    return "\\Q" + s + "\\E"


def test_quoted_pattern():
    # TokenQueueTest.kt:124-139: :matches with Pattern.quote-style \\Q..\\E
    d = tb.parse("<div>\\) foo1</div><div>( foo2</div><div>1) foo3</div>")

    def first_text(query):
        els = S.select(d, query)
        assert els, query
        kids = d.children[els[0]]
        assert kids
        return d.text[kids[0]]

    assert first_text("div:matches(" + _re_escape_kotlin("\\)") + ")") \
        == "\\) foo1"
    assert first_text("div:matches(" + _re_escape_kotlin("(") + ")") \
        == "( foo2"
    assert first_text("div:matches(" + _re_escape_kotlin("1)") + ")") \
        == "1) foo3"


def test_consume_escaped_tag():
    # TokenQueueTest.kt:141-152
    q = TokenQueue("p\\\\p p\\.p p\\:p p\\!p")
    assert q.consume_element_selector() == "p\\p"
    assert q.consume_whitespace()
    assert q.consume_element_selector() == "p.p"
    assert q.consume_whitespace()
    assert q.consume_element_selector() == "p:p"
    assert q.consume_whitespace()
    assert q.consume_element_selector() == "p!p"
    assert q.is_empty()


def test_consume_escaped_id():
    # TokenQueueTest.kt:154-161
    q = TokenQueue("i\\.d i\\\\d")
    assert q.consume_css_identifier() == "i.d"
    assert q.consume_whitespace()
    assert q.consume_css_identifier() == "i\\d"
    assert q.is_empty()
