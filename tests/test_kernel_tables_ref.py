"""Table-construction goldens from parser/HtmlParserTest.kt (:290-345,
:795-870): implicit tbody/tr, nested tables, caption close, formatting
markers, foster parenting — compared by serialized structure with
whitespace-only text differences normalized (the reference expectations are
pretty-printed then newline-stripped)."""

import re

import pytest

from ksoup_spark.kernel import treebuilder as tb
from ksoup_spark.kernel.serialize import inner_html

CASES = [
    # handlesNestedImplicitTable
    ("<table><td>1</td></tr> <td>2</td></tr> <td> <table><td>3</td> <td>4</td></table> <tr><td>5</table>",
     "<table><tbody><tr><td>1</td></tr><tr><td>2</td></tr><tr><td><table><tbody><tr><td>3</td><td>4</td></tr></tbody></table></td></tr><tr><td>5</td></tr></tbody></table>"),
    # handlesTbodyTable
    ("<html><head></head><body><table><tbody><tr><td>aaa</td><td>bbb</td></tr></tbody></table></body></html>",
     "<table><tbody><tr><td>aaa</td><td>bbb</td></tr></tbody></table>"),
    # handlesImplicitCaptionClose
    ("<table><caption>A caption<td>One<td>Two",
     "<table><caption>A caption</caption><tbody><tr><td>One</td><td>Two</td></tr></tbody></table>"),
    # noTableDirectInTable
    ("<table> <td>One <td><table><td>Two</table> <table><td>Three",
     "<table><tbody><tr><td>One</td><td><table><tbody><tr><td>Two</td></tr></tbody></table><table><tbody><tr><td>Three</td></tr></tbody></table></td></tr></tbody></table>"),
    # ignoresDupeEndTrTag
    ("<table><tr><td>One</td><td><table><tr><td>Two</td></tr></tr></table></td><td>Three</td></tr></table>",
     "<table><tbody><tr><td>One</td><td><table><tbody><tr><td>Two</td></tr></tbody></table></td><td>Three</td></tr></tbody></table>"),
    # handlesUnexpectedMarkupInTables (formatting markers + foster parenting)
    ("<table><b><tr><td>aaa</td></tr>bbb</table>ccc",
     "<b></b><b>bbb</b><table><tbody><tr><td>aaa</td></tr></tbody></table><b>ccc</b>"),
    # reconstructFormattingElementsInTable (markers isolate <b>/<i>)
    ("<p><b>One</p> <table><tr><td><p><i>Three<p>Four</i></td></tr></table> <p>Five</p>",
     "<p><b>One</b></p><b><table><tbody><tr><td><p><i>Three</i></p><p><i>Four</i></p></td></tr></tbody></table><p>Five</p></b>"),
    # reconstructFormattingElements
    ("<p><b class=one>One <i>Two <b>Three</p><p>Hello</p>",
     '<p><b class="one">One <i>Two <b>Three</b></i></b></p><p><b class="one"><i><b>Hello</b></i></b></p>'),
    # commentBeforeHtml (body part)
    ("<!-- comment --><!-- comment 2 --><p>One</p>", "<p>One</p>"),
]


def _norm(s: str) -> str:
    s = re.sub(r"\s+<", "<", s)
    s = re.sub(r">\s+", ">", s)
    return s.strip()


@pytest.mark.parametrize("html,want", CASES)
def test_table_structure_golden(html, want):
    d = tb.parse(html)
    got = inner_html(d, d.body(), pretty=False)
    assert _norm(got) == _norm(want)


def test_whatwg_expenses_table():
    d = tb.parse(
        "<table> <colgroup> <col> <colgroup> <col> <col> <col> <thead> <tr> "
        "<th> <th>2008 <th>2007 <th>2006 <tbody> <tr> <th scope=rowgroup> "
        "Research and development <td> $ 1,109 <td> $ 782 <td> $ 712 <tr> "
        "<th scope=row> Percentage of net sales <td> 3.4% <td> 3.3% <td> "
        "3.7% <tbody> <tr> <th scope=rowgroup> Selling, general, and "
        "administrative <td> $ 3,761 <td> $ 2,963 <td> $ 2,433 <tr> "
        "<th scope=row> Percentage of net sales <td> 11.6% <td> 12.3% <td> "
        "12.6% </table>"
    )
    from ksoup_spark.kernel import selector as sel
    assert len(sel.select(d, "colgroup")) == 2
    assert len(sel.select(d, "tbody")) == 2
    assert len(sel.select(d, "thead tr th")) == 4
    assert len(sel.select(d, "tbody tr")) == 4
    from ksoup_spark.kernel import textops as tx
    assert tx.element_text(d, sel.select(d, "tbody td")[0]) == "$ 1,109"
