"""Minimal text-PDF layout parser (ksoup_spark/kernel/pdf.py): object scan,
page mapping, Flate streams, text operators, strings, image placement."""

import zlib

import pytest

from ksoup_spark.kernel.pdf import (
    PdfParseError,
    make_minimal_pdf,
    parse_pdf_layout,
)


def test_single_block_geometry():
    pdf = make_minimal_pdf([(72, 720, 12, "Doc 42")])
    [b] = parse_pdf_layout(pdf, strict=True)
    assert b["kind"] == "text" and b["text"] == "Doc 42"
    assert (b["x0"], b["y0"], b["y1"]) == (72.0, 720.0, 732.0)
    assert b["x1"] == round(72 + 0.6 * 12 * len("Doc 42"), 2)
    assert (b["page"], b["block"]) == (0, 0)


def test_multiple_blocks_ordered():
    pdf = make_minimal_pdf([(72, 720, 12, "title"), (72, 700, 10, "body text")])
    rows = parse_pdf_layout(pdf, strict=True)
    assert [r["block"] for r in rows] == [0, 1]
    assert [r["text"] for r in rows] == ["title", "body text"]


def test_flate_compressed_stream():
    pdf = make_minimal_pdf([(10, 20, 12, "compressed")], compress=True)
    [b] = parse_pdf_layout(pdf, strict=True)
    assert b["text"] == "compressed" and b["x0"] == 10.0


def test_escapes_and_nested_parens():
    pdf = make_minimal_pdf([(0, 0, 12, "a(b)c\\d")])
    [b] = parse_pdf_layout(pdf, strict=True)
    assert b["text"] == "a(b)c\\d"


def test_octal_and_named_escapes():
    raw = (b"%PDF-1.4\n1 0 obj <</Length 40>> stream\n"
           b"BT 5 5 Td (A\\101\\x\\n\\t) Tj ET\nendstream endobj\n%%EOF")
    [b] = parse_pdf_layout(raw, strict=True)
    assert b["text"] == "AAx\n\t"


def test_hex_string_and_tj_array():
    raw = (b"%PDF-1.4\n1 0 obj <</Length 50>> stream\n"
           b"BT 5 5 Td [(ab) -120 (cd)] TJ <4546> Tj ET\nendstream endobj")
    [b] = parse_pdf_layout(raw, strict=True)
    assert b["text"] == "abcdEF"


def test_multiline_block_td_tstar():
    raw = (b"%PDF-1.4\n1 0 obj <</Length 99>> stream\n"
           b"BT /F1 12 Tf 14 TL 72 720 Td (line one) Tj T* "
           b"(line two longer) Tj ET\nendstream endobj")
    [b] = parse_pdf_layout(raw, strict=True)
    assert b["text"] == "line one\nline two longer"
    assert b["y0"] == 706.0 and b["y1"] == 732.0  # two lines, TL=14
    assert b["x1"] == round(72 + 0.6 * 12 * len("line two longer"), 2)


def test_image_placement_cm_do():
    raw = (b"%PDF-1.4\n1 0 obj <</Length 60>> stream\n"
           b"q 100 0 0 50 30 40 cm /Im0 Do Q\nendstream endobj")
    [b] = parse_pdf_layout(raw, strict=True)
    assert b["kind"] == "image" and b["text"] is None
    assert (b["x0"], b["y0"], b["x1"], b["y1"]) == (30.0, 40.0, 130.0, 90.0)


def test_two_pages_via_page_objects():
    c1 = b"BT 72 720 Td (page one) Tj ET"
    c2 = b"BT 72 720 Td (page two) Tj ET"
    pdf = (b"%%PDF-1.4\n"
           b"1 0 obj <</Type /Catalog /Pages 2 0 R>> endobj\n"
           b"2 0 obj <</Type /Pages /Kids [3 0 R 5 0 R] /Count 2>> endobj\n"
           b"3 0 obj <</Type /Page /Contents 4 0 R>> endobj\n"
           b"4 0 obj <</Length %d>>\nstream\n%s\nendstream endobj\n"
           b"5 0 obj <</Type /Page /Contents 6 0 R>> endobj\n"
           b"6 0 obj <</Length %d>>\nstream\n%s\nendstream endobj\n"
           b"%%%%EOF" % (len(c1), c1, len(c2), c2))
    rows = parse_pdf_layout(pdf, strict=True)
    assert [(r["page"], r["text"]) for r in rows] == [
        (0, "page one"), (1, "page two")]


def test_non_pdf_payload():
    assert parse_pdf_layout(b"just bytes") == []
    with pytest.raises(PdfParseError):
        parse_pdf_layout(b"just bytes", strict=True)


def test_unsupported_filter():
    raw = (b"%PDF-1.4\n1 0 obj <</Filter /DCTDecode /Length 3>> stream\n"
           b"xyz\nendstream endobj")
    assert parse_pdf_layout(raw) == []
    with pytest.raises(PdfParseError):
        parse_pdf_layout(raw, strict=True)


def test_corrupt_flate_stream():
    raw = (b"%PDF-1.4\n1 0 obj <</Filter /FlateDecode /Length 3>> stream\n"
           b"xyz\nendstream endobj")
    assert parse_pdf_layout(raw) == []
    with pytest.raises(PdfParseError):
        parse_pdf_layout(raw, strict=True)


def test_roundtrip_zlib_sanity():
    # make_minimal_pdf(compress=True) really flate-encodes
    pdf = make_minimal_pdf([(0, 0, 10, "x")], compress=True)
    assert b"FlateDecode" in pdf
    assert zlib.decompress(
        pdf.split(b"stream\n", 1)[1].split(b"\nendstream")[0]
    ).startswith(b"BT")


def test_cm_does_not_leak_past_q_restore():
    # q a b c d e f cm /Im0 Do Q followed by a second Do without its own
    # cm: the second image must get the identity transform, not the first
    # image's (graphics-state save/restore; composition inside q..Q).
    raw = (b"%PDF-1.4\n1 0 obj <</Length 99>> stream\n"
           b"q 100 0 0 50 30 40 cm /Im0 Do Q /Im1 Do\nendstream endobj")
    b1, b2 = parse_pdf_layout(raw, strict=True)
    assert (b1["x0"], b1["y0"], b1["x1"], b1["y1"]) == (30.0, 40.0, 130.0, 90.0)
    assert (b2["x0"], b2["y0"], b2["x1"], b2["y1"]) == (0.0, 0.0, 1.0, 1.0)


def test_successive_cm_compose():
    # two cm in sequence compose (CTM' = M . CTM): translate then scale
    raw = (b"%PDF-1.4\n1 0 obj <</Length 99>> stream\n"
           b"q 2 0 0 2 10 20 cm 50 0 0 25 5 5 cm /Im0 Do Q\n"
           b"endstream endobj")
    [b] = parse_pdf_layout(raw, strict=True)
    # inner cm maps unit square to [5,55]x[5,30]; outer doubles + offsets
    assert (b["x0"], b["y0"]) == (2 * 5 + 10, 2 * 5 + 20)
    assert (b["x1"], b["y1"]) == (2 * 55 + 10, 2 * 30 + 20)


def test_nested_q_restore_depth():
    raw = (b"%PDF-1.4\n1 0 obj <</Length 99>> stream\n"
           b"q 2 0 0 2 0 0 cm q 3 0 0 3 1 1 cm Q /Im0 Do Q\n"
           b"endstream endobj")
    [b] = parse_pdf_layout(raw, strict=True)
    # inner q/Q popped: only the outer 2x scale applies
    assert (b["x0"], b["y0"], b["x1"], b["y1"]) == (0.0, 0.0, 2.0, 2.0)
