"""Span emission goldens — graft-specific interleaved media semantics
(FIXTURES.md §F; DOM ordering per select/NodeTraversor.kt:22-65, absUrl per
nodes/Node.kt:234-244, base latching per parser/HtmlTreeBuilder.kt:207-218)."""

from ksoup_spark.kernel import treebuilder as tb
from ksoup_spark.kernel.textops import extract_spans


def spans_of(html: str):
    d = tb.parse(html)
    return [(k, t, m) for k, t, m, _ in extract_spans(d)]


def test_interleaved_media():
    got = spans_of("<p>Intro <img src=a.png> middle <video src=b.mp4></video> end</p>")
    assert got == [
        ("text", "Intro", None),
        ("image", None, "a.png"),
        ("text", "middle", None),
        ("video", None, "b.mp4"),
        ("text", "end", None),
    ]


def test_base_href_resolution():
    got = spans_of(
        '<base href="http://ex.com/dir/"><p>x <img src=a.png> '
        '<video src="/v/b.mp4"></video> <object data="../o.swf"></object></p>'
    )
    assert got == [
        ("text", "x", None),
        ("image", None, "http://ex.com/dir/a.png"),
        ("video", None, "http://ex.com/v/b.mp4"),
        ("object", None, "http://ex.com/o.swf"),
    ]


def test_offsets_are_ordinal():
    d = tb.parse("<p>a<img src=1.png>b</p>")
    sp = extract_spans(d)
    assert [s[3] for s in sp] == list(range(len(sp)))


def test_media_fallback_content_skipped():
    got = spans_of("<p>A <video src=v.mp4>fallback text</video> B</p>")
    assert got == [
        ("text", "A", None),
        ("video", None, "v.mp4"),
        ("text", "B", None),
    ]


def test_video_source_child_ref():
    got = spans_of("<video><source src=v.webm type=video/webm></video>")
    assert got == [("video", None, "v.webm")]


def test_nested_media_keep_document_order():
    got = spans_of('<div><a href=x><img src=i.png></a>tail</div><p>para</p>')
    assert got == [
        ("image", None, "i.png"),
        ("text", "tail para", None),
    ]


def test_block_boundaries_inside_text_span():
    got = spans_of("<div>One</div>Two<img src=z.png>")
    assert got == [("text", "One Two", None), ("image", None, "z.png")]


def test_empty_doc():
    assert spans_of("") == []
    assert spans_of("<p>  \n  </p>") == []


def test_media_without_ref():
    got = spans_of("<p>a<img>b</p>")
    assert got == [("text", "a", None), ("image", None, ""), ("text", "b", None)]


def test_whole_document_structure_ignored_outside_body():
    got = spans_of("<head><title>T</title><style>.x{}</style></head><body><p>only body</p></body>")
    assert got == [("text", "only body", None)]
