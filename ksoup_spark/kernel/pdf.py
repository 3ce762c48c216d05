"""Minimal text-PDF layout parser (stdlib only).

Parses the subset of ISO 32000 a layout-extraction stage needs from
machine-generated text PDFs:

- object scanning (``N G obj ... endobj``) without the xref table,
- ``/Type /Page`` -> ``/Contents N 0 R`` page mapping (document order),
- content streams, raw or ``/FlateDecode`` (zlib),
- text operators ``BT ET Tf Td TD TL T* Tm Tj ' " TJ`` with PDF literal
  strings (nested parens, ``\\``-escapes, octal) and hex strings,
- image placement ``q a b c d e f cm /Name Do Q``.

Geometry model (documented approximation — no font metrics without
embedded-font parsing): each ``BT..ET`` is one text block anchored at its
first glyph position; width = ``0.6 * fontsize * chars`` of the longest
line, height = one fontsize per line; image bbox comes from the active
``cm`` translation+scale. All coordinates are PDF page units (points,
origin bottom-left).

The reference repo (fleeksoft/ksoup) has no PDF stage; this implements the
north-rule "PDF/layout parse" requirement from scratch. Unsupported stream
filters raise under ``strict=True`` and are skipped otherwise.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.DOTALL)
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/([A-Za-z0-9]+)")

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_CHAR_W = 0.6  # width units per char per point of font size


class PdfParseError(ValueError):
    pass


def _extract_streams(body: bytes, strict: bool) -> bytes | None:
    """Content-stream bytes of one object body (decompressed), or None."""
    m = _STREAM_RE.search(body)
    if not m:
        return None
    data = m.group(1)
    head = body[: m.start()]
    if _FLATE_RE.search(head):
        try:
            return zlib.decompress(data)
        except zlib.error as e:
            if strict:
                raise PdfParseError(f"bad FlateDecode stream: {e}") from e
            return None
    fm = _FILTER_RE.search(head)
    if fm and fm.group(1) != b"FlateDecode":
        if strict:
            raise PdfParseError(
                f"unsupported stream filter /{fm.group(1).decode()}")
        return None
    return data


def _page_streams(data: bytes, strict: bool) -> list[bytes]:
    """Per-page content streams in document order.

    Uses /Type /Page -> /Contents when present; falls back to one page per
    stream object, then to the whole buffer if it holds bare text operators
    (fragment PDFs from tests).
    """
    objs: dict[int, bytes] = {}
    order: list[int] = []
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        objs[num] = m.group(2)
        order.append(num)
    pages: list[bytes] = []
    page_objs = [n for n in order if _PAGE_RE.search(objs[n])
                 and b"stream" not in objs[n][:200]]
    if page_objs:
        for n in page_objs:
            cm = _CONTENTS_RE.search(objs[n])
            if not cm:
                continue
            ref = int(cm.group(1))
            body = objs.get(ref)
            if body is None:
                if strict:
                    raise PdfParseError(f"missing /Contents object {ref}")
                continue
            s = _extract_streams(body, strict)
            if s is not None:
                pages.append(s)
        return pages
    for n in order:
        s = _extract_streams(objs[n], strict)
        if s is not None:
            pages.append(s)
    if not pages and b"BT" in data:
        pages.append(data)
    return pages


def _pdf_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a literal string starting at data[i] == '('; returns (text,
    index past the closing paren). Handles nesting, escapes, octal."""
    assert data[i] == 0x28
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out.append({0x6E: "\n", 0x72: "\r", 0x74: "\t",
                            0x62: "\b", 0x66: "\f"}[e])
                i += 1
            elif e in b"()\\":
                out.append(chr(e))
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = chr(e)
                i += 1
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits += chr(data[i])
                    i += 1
                out.append(chr(int(oct_digits, 8) & 0xFF))
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(chr(e))
                i += 1
            continue
        if c == 0x28:
            depth += 1
            out.append("(")
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
        else:
            out.append(chr(c))
        i += 1
    return "".join(out), i


def _hex_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse <hex> string at data[i] == '<' (not '<<')."""
    j = data.find(b">", i)
    if j == -1:
        j = len(data)
    hexs = re.sub(rb"\s", b"", data[i + 1 : j])
    if len(hexs) % 2:
        hexs += b"0"
    try:
        return bytes.fromhex(hexs.decode("ascii")).decode("latin-1"), j + 1
    except ValueError:
        return "", j + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


class _Block:
    __slots__ = ("x", "y", "fs", "lines", "min_y", "max_y")

    def __init__(self) -> None:
        self.x = 0.0
        self.y = 0.0
        self.fs = 12.0
        self.lines: list[str] = []
        self.min_y = 0.0
        self.max_y = 0.0


def _parse_content(stream: bytes, strict: bool) -> list[dict]:
    """One content stream -> ordered layout blocks."""
    blocks: list[dict] = []
    i, n = 0, len(stream)
    stack: list = []  # operand stack
    # text state
    lx, ly = 0.0, 0.0  # line matrix origin
    fs = 12.0
    leading = 0.0
    in_text = False
    blk: _Block | None = None
    pending_newline = False
    cm = (1.0, 1.0, 0.0, 0.0)  # a, d, e, f of the active transform
    gs_stack: list[tuple[float, float, float, float]] = []  # q/Q saves

    def show(s: str) -> None:
        nonlocal blk, pending_newline
        if not in_text:
            return
        if blk is None:
            blk = _Block()
        if not blk.lines:
            blk.x, blk.y, blk.fs = lx, ly, fs
            blk.min_y = blk.max_y = ly
            blk.lines = [s]
        elif pending_newline:
            blk.lines.append(s)
            blk.min_y = min(blk.min_y, ly)
            blk.max_y = max(blk.max_y, ly)
        else:
            blk.lines[-1] += s
        pending_newline = False

    def flush() -> None:
        nonlocal blk, pending_newline
        if blk is not None and blk.lines:
            width = _CHAR_W * blk.fs * max(len(ln) for ln in blk.lines)
            blocks.append({
                "kind": "text",
                "x0": round(blk.x, 2),
                "y0": round(blk.min_y, 2),
                "x1": round(blk.x + width, 2),
                "y1": round(blk.max_y + blk.fs, 2),
                "text": "\n".join(blk.lines),
            })
        blk = None
        pending_newline = False

    while i < n:
        c = stream[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:  # % comment to EOL
            j = stream.find(b"\n", i)
            i = n if j == -1 else j + 1
            continue
        if c == 0x28:  # literal string
            s, i = _pdf_string(stream, i)
            stack.append(s)
            continue
        if c == 0x3C:  # '<'
            if i + 1 < n and stream[i + 1] == 0x3C:  # dict: skip balanced
                depth = 0
                while i < n - 1:
                    if stream[i : i + 2] == b"<<":
                        depth += 1
                        i += 2
                    elif stream[i : i + 2] == b">>":
                        depth -= 1
                        i += 2
                        if depth == 0:
                            break
                    else:
                        i += 1
                continue
            s, i = _hex_string(stream, i)
            stack.append(s)
            continue
        if c == 0x2F:  # /name
            j = i + 1
            while j < n and stream[j] not in _WS and stream[j] not in _DELIM:
                j += 1
            stack.append("/" + stream[i + 1 : j].decode("latin-1"))
            i = j
            continue
        if c in b"[]":
            # TJ arrays: keep collecting operands; ']' is a no-op marker
            i += 1
            continue
        m = _NUM_RE.match(stream, i)
        if m and (c < 0x41 or c in b"+-."):  # number
            stack.append(float(m.group(0)))
            i = m.end()
            continue
        m = _OP_RE.match(stream, i)
        if not m:
            i += 1
            continue
        op = m.group(0)
        i = m.end()
        try:
            if op == b"BT":
                in_text = True
                lx, ly = 0.0, 0.0
                blk = None
                pending_newline = False
            elif op == b"ET":
                flush()
                in_text = False
            elif op == b"Tf":
                fs = float(stack[-1])
            elif op == b"Td":
                lx += float(stack[-2])
                ly += float(stack[-1])
                pending_newline = blk is not None and bool(blk.lines)
            elif op == b"TD":
                leading = -float(stack[-1])
                lx += float(stack[-2])
                ly += float(stack[-1])
                pending_newline = blk is not None and bool(blk.lines)
            elif op == b"TL":
                leading = float(stack[-1])
            elif op == b"Tm":
                lx = float(stack[-2])
                ly = float(stack[-1])
                pending_newline = blk is not None and bool(blk.lines)
            elif op == b"T*":
                ly -= leading if leading else fs
                pending_newline = blk is not None and bool(blk.lines)
            elif op == b"Tj":
                show(str(stack[-1]))
            elif op in (b"'", b'"'):
                ly -= leading if leading else fs
                pending_newline = blk is not None and bool(blk.lines)
                show(str(stack[-1]))
            elif op == b"TJ":
                s = "".join(x for x in stack if isinstance(x, str)
                            and not x.startswith("/"))
                show(s)
            elif op == b"q":
                gs_stack.append(cm)
            elif op == b"Q":
                cm = gs_stack.pop() if gs_stack else (1.0, 1.0, 0.0, 0.0)
            elif op == b"cm":
                # compose with the current transform (CTM' = M · CTM), so
                # 'q ... cm ... Do Q' does not leak its transform into a
                # later Do; only scale+translate terms are modeled
                if len(stack) >= 6:
                    ma, md = float(stack[-6]), float(stack[-3])
                    me, mf = float(stack[-2]), float(stack[-1])
                    cm = (ma * cm[0], md * cm[1],
                          me * cm[0] + cm[2], mf * cm[1] + cm[3])
            elif op == b"Do":
                a, d, e, f = cm
                blocks.append({
                    "kind": "image",
                    "x0": round(e, 2), "y0": round(f, 2),
                    "x1": round(e + a, 2), "y1": round(f + d, 2),
                    "text": None,
                })
        except (IndexError, TypeError, ValueError) as exc:
            if strict:
                raise PdfParseError(
                    f"malformed operand stack at {op!r}: {exc}") from exc
        stack.clear()
    flush()
    return blocks


def parse_pdf_layout(data: bytes, strict: bool = False) -> list[dict]:
    """PDF bytes -> ordered layout blocks.

    Each block: {page, block, kind('text'|'image'), x0, y0, x1, y1, text}.
    Non-PDF payloads return [] (or raise under strict).
    """
    if not data.startswith(b"%PDF"):
        if strict:
            raise PdfParseError("payload is not a PDF (missing %PDF header)")
        return []
    rows: list[dict] = []
    for page_no, stream in enumerate(_page_streams(data, strict)):
        for block_no, blk in enumerate(_parse_content(stream, strict)):
            blk["page"] = page_no
            blk["block"] = block_no
            rows.append(blk)
    return rows


def make_minimal_pdf(texts: list[tuple[float, float, float, str]],
                     compress: bool = False) -> bytes:
    """Build a one-page text PDF: [(x, y, fontsize, text), ...] -> bytes.
    Test/corpus generator twin of the parser (not used in queries — those
    build the PDF via Spark SQL concat so the oracle can mirror it)."""
    parts = []
    for (x, y, size, text) in texts:
        esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        parts.append(f"BT /F1 {size:g} Tf {x:g} {y:g} Td ({esc}) Tj ET")
    content = ("\n".join(parts) + "\n").encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"<</Type /Catalog /Pages 2 0 R>>",
        b"<</Type /Pages /Kids [3 0 R] /Count 1>>",
        b"<</Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R>>",
        b"<<" + filt + b"/Length " + str(len(content)).encode()
        + b">>\nstream\n" + content + b"\nendstream",
    ]
    out = [b"%PDF-1.4"]
    for k, body in enumerate(objs, start=1):
        out.append(f"{k} 0 obj ".encode() + body + b" endobj")
    out.append(b"%%EOF")
    return b"\n".join(out)
