"""Character-reference (entity) decoding.

Semantics mirror the reference tokenizer's consumeCharacterReference
(/root/reference/ksoup/src/com/fleeksoft/ksoup/parser/Tokeniser.kt:150-227):

- numeric refs ``&#123;`` / ``&#x1F4A9;``: out-of-range -> U+FFFD; values in
  0x80..0x9F are remapped through the Windows-1252 table
  (Tokeniser.kt:345-353, per the HTML5 numeric-character-reference-end state).
- named refs: a "base" entity (the legacy set) matches without a trailing
  semicolon; extended entities require one (Tokeniser.kt:193-213). In
  attributes, a semicolonless match followed by ``=``, ``-`` or ``_`` is
  rejected (Tokeniser.kt:205-208).
- the name is consumed as a letters-then-digits run (CharacterReader
  consumeLetterThenDigitSequence), then looked up exactly — NOT the spec's
  longest-prefix match; unknown names emit the raw text.

Entity tables come from the WHATWG list shipped in the Python stdlib
(html.entities.html5) — equivalent content to the reference's packed tables
(nodes/Entities.kt:353-408; base=106, extended=2125 names).
"""

from __future__ import annotations

import re
from html.entities import html5 as _HTML5

# Names that may match WITHOUT a trailing semicolon (the legacy/base set).
BASE_ENTITIES: dict[str, str] = {
    name: value for name, value in _HTML5.items() if not name.endswith(";")
}
# All names (semicolon forms), keyed without the semicolon.
ALL_ENTITIES: dict[str, str] = {
    name[:-1]: value for name, value in _HTML5.items() if name.endswith(";")
}

WIN1252_START = 0x80
WIN1252_EXTENSIONS = (
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178,
)

REPLACEMENT = "�"

# After '&': chars that can never start a reference (Tokeniser.kt:341).
_NOT_CHARREF = frozenset("\t\n\r\f <&")

_LETTER_DIGIT = re.compile(r"[A-Za-z]+[0-9]*")
_HEX = re.compile(r"[0-9A-Fa-f]+")
_DEC = re.compile(r"[0-9]+")


def consume_charref(
    s: str,
    i: int,
    additional_allowed: str | None = None,
    in_attribute: bool = False,
    err=None,
) -> tuple[str, int] | None:
    """Try to decode a character reference at s[i] (i points AFTER '&').

    Returns (decoded_text, next_index) or None if '&' is literal.

    `err(msg, pos)` (optional) receives the reference's
    characterReferenceError messages (Tokeniser.kt:150-230) with `pos` the
    index in `s` where the reference's reader would sit when erroring.
    """
    n = len(s)
    if i >= n:
        return None
    c = s[i]
    if c in _NOT_CHARREF:
        return None
    if additional_allowed is not None and c == additional_allowed:
        return None
    if c == "#":
        j = i + 1
        hex_mode = j < n and s[j] in "xX"
        if hex_mode:
            j += 1
        m = (_HEX if hex_mode else _DEC).match(s, j)
        if m is None:
            if err is not None:
                err("numeric reference with no numerals", j)
            return None  # -> literal '&'
        num = m.group()
        j = m.end()
        if j < n and s[j] == ";":
            j += 1
        elif err is not None:
            err(f"missing semicolon on [&#{num}]", j)
        try:
            cp = int(num, 16 if hex_mode else 10)
        except ValueError:
            cp = -1
        if cp > 0x7FFFFFFF:
            cp = -1  # reference parses into a 32-bit Int: overflow -> -1
        if cp == -1 or cp > 0x10FFFF:
            if err is not None:
                err(f"character [{cp}] outside of valid range", j)
            return REPLACEMENT, j
        if WIN1252_START <= cp < WIN1252_START + len(WIN1252_EXTENSIONS):
            if err is not None:
                err(f"character [{cp}] is not a valid unicode code point", j)
            cp = WIN1252_EXTENSIONS[cp - WIN1252_START]
        if 0xD800 <= cp <= 0xDFFF or cp == 0:
            return REPLACEMENT, j
        return chr(cp), j
    m = _LETTER_DIGIT.match(s, i)
    if m is None:
        return None
    name = m.group()
    j = m.end()
    looks_legit = j < n and s[j] == ";"
    found = name in BASE_ENTITIES or (looks_legit and name in ALL_ENTITIES)
    if not found:
        if looks_legit and err is not None:
            err(f"invalid named reference [{name}]", i)
        return None
    if in_attribute and not looks_legit and j < n and s[j] in "=-_":
        return None  # e.g. href="?a=1&not=2" keeps "&not" literal
    value = ALL_ENTITIES.get(name) if looks_legit else None
    if value is None:
        value = BASE_ENTITIES.get(name) or ALL_ENTITIES[name]
    if looks_legit:
        j += 1
    elif err is not None:
        err(f"missing semicolon on [&{name}]", j)
    return value, j


def unescape(s: str, in_attribute: bool = False) -> str:
    """Decode all character references in a plain string (no markup)."""
    if "&" not in s:
        return s
    out: list[str] = []
    i = 0
    n = len(s)
    while True:
        amp = s.find("&", i)
        if amp == -1:
            out.append(s[i:])
            break
        out.append(s[i:amp])
        res = consume_charref(s, amp + 1, None, in_attribute)
        if res is None:
            out.append("&")
            i = amp + 1
        else:
            out.append(res[0])
            i = res[1]
    return "".join(out)
