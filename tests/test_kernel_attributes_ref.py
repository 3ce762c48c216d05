"""Ports of the reference's AttributesTest.kt parse-facing assertions
(/root/reference/ksoup-test/test/com/fleeksoft/ksoup/nodes/AttributesTest.kt).

The reference file mostly exercises its standalone ``Attributes`` collection
class (iterators, internal keys, clone/equality) — our DOM stores attributes
as plain per-node dicts, so those collection-API tests have no counterpart.
What IS portable is every assertion reachable through parse + serialize:
boolean-attribute collapse, case handling, duplicate handling, escaping.
"""

from __future__ import annotations

from ksoup_spark.kernel.treebuilder import parse
from ksoup_spark.kernel.serialize import inner_html, outer_html
from ksoup_spark.kernel.parse_settings import ParseSettings


def _body_html(html: str, **kw) -> str:
    d = parse(html)
    return inner_html(d, d.body(), pretty=False, **kw)


def test_booleans_collapse():
    # AttributesTest.kt testBooleans: known boolean attrs collapse when the
    # value is empty or equals the key; unknown attrs keep their value
    got = _body_html(
        '<a foo bar="" async=async qux=qux defer=deferring ismap inert="">')
    assert got == ('<a foo bar="" async qux="qux" defer="deferring" '
                   'ismap inert></a>')


def test_boolean_null_attribute():
    # AttributesTest.kt booleanNullAttributesConsistent: valueless attr
    # serializes as the bare key
    assert _body_html("<div key>x</div>") == "<div key>x</div>"


def test_boolean_empty_string():
    # AttributesTest.kt booleanEmptyString: checked="" -> checked
    assert _body_html('<input checked="">') == "<input checked>"


def test_boolean_case_insensitive():
    # AttributesTest.kt booleanCaseInsensitive: checked=CHECKED -> checked
    assert _body_html('<input checked="CHECKED">') == "<input checked>"


def test_boolean_value_differs_keeps_value():
    # shouldCollapseAttribute: boolean attr with a non-matching value keeps it
    assert _body_html('<div defer="deferring">x</div>') \
        == '<div defer="deferring">x</div>'


def test_collapse_html_syntax_only():
    # Attribute.kt:341 — collapse applies only under html syntax; xml gets
    # an explicit empty value
    d = parse("<input checked>")
    assert outer_html(d, d.body(), syntax="xml", pretty=False) \
        == '<body><input checked="" /></body>'


def test_attr_value_escaping():
    # AttributesTest.kt html(): values escape &, keys pass through
    assert _body_html('<p tot="a&p">x</p>') == '<p tot="a&amp;p">x</p>'


def test_attr_case_preserved_with_settings():
    # AttributesTest.kt html(): "Tot" keeps case under preserveCase settings
    d = parse('<p Tot="a&p" Hello="There" data-name="Ksoup">x</p>',
              settings=ParseSettings(preserve_tag_case=True,
                                     preserve_attribute_case=True))
    assert inner_html(d, d.body(), pretty=False) \
        == '<p Tot="a&amp;p" Hello="There" data-name="Ksoup">x</p>'


def test_attr_keys_lowercased_by_default():
    # default settings normalize keys; first duplicate wins after folding
    assert _body_html('<p Tot="a" tot="b">x</p>') == '<p tot="a">x</p>'


def test_dataset_attributes_roundtrip():
    # AttributesTest.kt html()/dataset: data-* attrs serialize verbatim
    assert _body_html('<p data-name="Ksoup">x</p>') \
        == '<p data-name="Ksoup">x</p>'
