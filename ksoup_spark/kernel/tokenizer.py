"""HTML5 tokenizer.

A from-scratch Python implementation of the HTML5 tokenization state
machine with the reference engine's behaviors
(/root/reference/ksoup/src/com/fleeksoft/ksoup/parser/TokeniserState.kt:8-1768,
Tokeniser.kt:36-227):

- bulk scanning instead of char-at-a-time: Data/RCDATA/Rawtext/ScriptData and
  attribute values advance with ``str.find``/regex runs, the same optimization
  as the reference's CharacterReader fast loops (CharacterReader.kt:360-464);
- RCDATA bail-out deviation: if no appropriate end tag lies ahead, the rest of
  the input is consumed as text (TokeniserState.kt:196-209);
- character references per entities.py (win-1252 remap, base-without-semicolon);
- max 512 attributes per tag (Token.kt:350-355) — extras dropped;
- NULL handling: U+FFFD in tag/attr/rcdata/rawtext content, literal in Data.

Token tuples (consumed by treebuilder):
    ("text", data)                      coalesced character runs
    ("start", name, attrs, selfclosing) attrs: list[(name, value|None)]
    ("end", name)
    ("comment", data, bogus)
    ("cdata", data)
    ("doctype", name, public_id, system_id, force_quirks)
    ("eof",)

Plain strings in, plain tuples out — no Spark dependency; this module runs
inside Arrow-batched UDF kernels on executors.
"""

from __future__ import annotations

import re

from .entities import consume_charref

# tokenizer content states (set by the tree builder after certain start tags)
DATA = 0
RCDATA = 1
RAWTEXT = 2
SCRIPT_DATA = 3
PLAINTEXT = 4

_WS = "\t\n\r\f "
_TAG_NAME = re.compile(r"[^\t\n\r\f /><\x00]+")
_ATTR_NAME = re.compile(r"[^\t\n\r\f /=><\x00]+")
# fast path for the dominant clean-attribute shapes: ws* name ws* = ws*
# then a quoted or unquoted value with no charref/NULL inside. One C-level
# match replaces ~6 Python-level steps of the general loop below. The
# unquoted alternative mirrors _UNQUOTED_CHUNK (stops at ws/>/&/NUL, so
# '/' and mid-value quotes stay in the value), must not START with a
# quote (that shape is the quoted alternatives'), and must not be
# FOLLOWED by '&' or NUL: the unquoted value continues through those
# (charref decode / U+FFFD — TokeniserState.kt:911-918 AttributeValue_
# unquoted), so such shapes take the general loop. The possessive
# quantifier (++) keeps the run maximal — without it the lookahead would
# backtrack the value to a shorter prefix and split it.
_ATTR_FAST_Q = re.compile(
    r"[\t\n\r\f ]*([^\t\n\r\f /=><\x00]+)[\t\n\r\f ]*=[\t\n\r\f ]*"
    r"(?:\"([^\"&\x00]*)\"|'([^'&\x00]*)'"
    r"|(?![\"'])([^\t\n\r\f >&\x00]++)(?![&\x00]))"
)
_UNQUOTED_CHUNK = re.compile(r"[^\t\n\r\f >&\x00]+")
_DOCTYPE_KW = re.compile(r"doctype", re.IGNORECASE)
_CDATA_OPEN = "[CDATA["

MAX_ATTRS = 512

# attribute names are trimmed of chars <= U+0020 at finalization; names that
# collapse to empty are dropped (Token.kt:136-154 `name.trim { it <= ' ' }`)
_LE_SPACE = "".join(chr(i) for i in range(0x21))


def _push_attr(attrs: list, aname: str, val) -> None:
    if aname and (aname[0] <= " " or aname[-1] <= " "):
        aname = aname.strip(_LE_SPACE)
    if aname and len(attrs) < MAX_ATTRS:
        attrs.append((aname, val))


class Tokenizer:
    __slots__ = ("s", "_low", "n", "p", "state", "rawtext_tag", "pending",
                 "has_null", "next_amp", "errors", "_cref", "tok_start",
                 "pending_start", "tok_end", "pending_end", "markup_start",
                 "track", "last_attr_pos")

    @property
    def low(self) -> str:
        lo = self._low
        if lo is None:
            lo = self._low = self.s.lower()
        return lo

    def __init__(self, s: str, errors=None):
        self.s = s
        self._low = None  # lazy: only rawtext/script/doctype scans need it
        self.n = len(s)
        self.p = 0
        self.state = DATA
        self.rawtext_tag: str | None = None
        self.pending: list = []
        self.has_null = "\x00" in s
        # memoized position of the next '&' at/after p — without it every
        # text segment would rescan to the next amp (possibly EOF), turning
        # amp-free documents quadratic
        self.next_amp = -2
        # optional ParseErrorList (Parser.setTrackErrors); None = no tracking,
        # zero overhead on the hot path beyond a None check
        self.errors = errors
        self._cref = None if errors is None else (
            lambda msg, pos: self._perr(
                pos, "Invalid character reference: " + msg))
        # source offset where the token just returned by next_token began
        # (Token.startPos analogue; pending batches share their construct's
        # start). Consumed by the tree builder's position tracking.
        self.tok_start = 0
        self.pending_start = 0
        # token END offsets (Token.endPos analogue) + the reference's
        # markupStartPos semantics: updated only when a '<' opens markup in
        # the data state, so rcdata/rawtext end tags inherit the OPENING
        # tag's start (Tokeniser.kt:140 — the quirk behind the reference's
        # "title end range starts at the start tag" fixtures)
        self.tok_end = 0
        self.pending_end = 0
        self.markup_start = 0
        # position tracking (Parser.setTrackPosition): when True, _tag
        # records per-attribute name/value source spans in last_attr_pos
        # (aligned with the token's attrs list); zero cost when False
        self.track = False
        self.last_attr_pos: list | None = None

    def _perr(self, pos: int, msg: str) -> None:
        el = self.errors
        if el is not None and el.can_add():
            el.add_at(pos, msg)

    # -- public API -------------------------------------------------------

    def next_token(self):
        if self.pending:
            self.tok_start = self.pending_start
            self.tok_end = self.pending_end
            return self.pending.pop()
        self.tok_start = self.p
        if self.p >= self.n:
            self.tok_end = self.n
            return ("eof",)
        st = self.state
        if st == DATA:
            return self._data()
        if st == RCDATA:
            return self._rcdata_or_rawtext(decode_refs=True)
        if st == RAWTEXT:
            return self._rcdata_or_rawtext(decode_refs=False)
        if st == SCRIPT_DATA:
            return self._script_data()
        return self._plaintext()

    # -- Data state --------------------------------------------------------

    def _data(self):
        s, n = self.s, self.n
        buf: list[str] = []
        p = self.p
        while p < n:
            lt = s.find("<", p)
            amp = self.next_amp
            if amp != -1 and amp < p:
                amp = s.find("&", p)
                self.next_amp = amp
            if lt == -1 and amp == -1:
                buf.append(s[p:])
                p = n
                break
            if amp != -1 and (lt == -1 or amp < lt):
                if amp > p:
                    buf.append(s[p:amp])
                res = consume_charref(s, amp + 1, None, False, self._cref)
                if res is None:
                    buf.append("&")
                    p = amp + 1
                else:
                    buf.append(res[0])
                    p = res[1]
                continue
            # '<' first
            if lt > p:
                buf.append(s[p:lt])
            self.p = lt
            self.pending_start = lt
            self.markup_start = lt
            toks = self._markup()
            if toks is None:  # literal '<'
                buf.append("<")
                p = self.p
                continue
            self.pending_end = self.p
            if not buf and len(toks) == 1:
                # common case: a lone tag with no preceding text — skip
                # the pending round-trip entirely
                self.tok_start = lt
                self.tok_end = self.p
                return toks[0]
            text = "".join(buf)
            self.pending.extend(reversed(toks))
            if text:
                self.tok_end = lt
                return ("text", text)
            if self.pending:
                self.tok_start = self.pending_start
                self.tok_end = self.pending_end
                return self.pending.pop()
            p = self.p  # dropped token (e.g. '</>'); keep scanning
            buf = []
            continue
        self.p = p
        self.tok_end = p
        text = "".join(buf)
        if text:
            return ("text", text)
        return ("eof",)

    # -- markup after '<' ---------------------------------------------------

    def _markup(self):
        """Parse markup at self.p (pointing at '<').

        Returns a list of tokens, or None if '<' is literal text
        (self.p advanced past the '<' in that case).
        """
        s, n = self.s, self.n
        p = self.p
        if p + 1 >= n:
            self.p = p + 1
            return None
        c = s[p + 1]
        if c.isalpha():  # start tag: by far the most common case
            tok = self._tag(p + 1, start=True)
            return [] if tok is None else [tok]
        if c == "!":
            return self._markup_declaration(p + 2)
        if c == "?":
            return self._bogus_comment(p + 1)
        if c == "/":
            if p + 2 >= n:
                # EOF after '</': '<' and '/' become literal text
                self.p = p + 1
                return None
            c2 = s[p + 2]
            if c2.isalpha():
                tok = self._tag(p + 2, start=False)
                if tok is None:
                    return []
                if tok[2]:  # end tags carry no attrs (Tokeniser.kt:78)
                    self._perr(
                        self.p,
                        "Attributes incorrectly present on end tag "
                        f"[/{tok[1].lower()}]")
                return [("end", tok[1])]
            if c2 == ">":  # '</>' dropped entirely
                self.p = p + 3
                return []
            # bogus end tag: the '/' is pushed back into the comment data
            # (TokeniserState.EndTagOpen, kt:147-149)
            return self._bogus_comment(p + 1)
        self.p = p + 1
        return None

    def _tag(self, p: int, start: bool):
        """Parse tag name + attributes from p (first char of name).

        Returns ("start", name, attrs, selfclosing) or None at EOF-in-tag.
        """
        s, n = self.s, self.n
        track = self.track
        apos: list | None = [] if track else None
        if track:
            self.last_attr_pos = apos
        m = _TAG_NAME.match(s, p)
        p = m.end()
        # fast path: plain <name> with no attributes (the common case)
        if p < n and s[p] == ">":
            self.p = p + 1
            return ("start", m.group(), [], False)
        name_parts = [m.group()]
        while p < n and s[p] == "\x00":  # NULL in tag name -> U+FFFD
            name_parts.append("�")
            p += 1
            m = _TAG_NAME.match(s, p)
            if m:
                name_parts.append(m.group())
                p = m.end()
        name = "".join(name_parts)
        name_end = p
        attrs: list = []
        selfclosing = False
        while True:
            while p < n and s[p] in _WS:
                p += 1
            if p < n:
                c = s[p]
                if c == ">":
                    self.p = p + 1
                    return ("start", name, attrs, selfclosing)
                if c == "<":
                    # out-of-spec reference behavior: '<' ends the tag and
                    # is reprocessed (CharacterReader.kt:448-464)
                    self.p = p
                    return ("start", name, attrs, selfclosing)
                if c == "/":
                    if p + 1 < n and s[p + 1] == ">":
                        self.p = p + 2
                        return ("start", name, attrs, True)
                    p += 1  # stray '/': error, skip
                    continue
            m = _ATTR_FAST_Q.match(s, p)
            if m:
                if len(attrs) < MAX_ATTRS:
                    g2, g3, g4 = m.group(2, 3, 4)
                    v = g2 if g2 is not None else (
                        g3 if g3 is not None else g4)
                    if not track:
                        _push_attr(attrs, m.group(1), v)
                    else:
                        before = len(attrs)
                        _push_attr(attrs, m.group(1), v)
                        if len(attrs) > before:
                            g = 2 if g2 is not None else (
                                3 if g3 is not None else 4)
                            vs, ve = m.start(g), m.end(g)
                            if vs == ve:  # empty value: implicit @ name end
                                vs = ve = m.end(1)
                            apos.append((m.start(1), m.end(1), vs, ve))
                p = m.end()
                continue
            if p >= n:
                if self.errors is not None:
                    if p == name_end:
                        st = "TagName"
                    elif s[p - 1] in _WS:
                        st = "BeforeAttributeName"
                    else:
                        st = "AttributeName"
                    # reference reader reports EOF one past the last char
                    self._perr(n + 1, "Unexpectedly reached end of file "
                                      f"(EOF) in input state [{st}]")
                self.p = n
                return None  # EOF inside tag: drop it
            c = s[p]
            # attribute name (>, <, /, whitespace handled above)
            a_start = p
            if c == "=":
                aname = "="
                p += 1
                m = _ATTR_NAME.match(s, p)
                if m:
                    aname += m.group()
                    p = m.end()
            else:
                parts = []
                while True:
                    m = _ATTR_NAME.match(s, p)
                    if m:
                        parts.append(m.group())
                        p = m.end()
                    if p < n and s[p] == "\x00":
                        parts.append("�")
                        p += 1
                        continue
                    break
                aname = "".join(parts)
                if not aname:
                    p += 1  # stray '<' handled above; defensive skip
                    continue
            a_end = p
            # after attribute name
            while p < n and s[p] in _WS:
                p += 1
            if p < n and s[p] == "=":
                p += 1
                while p < n and s[p] in _WS:
                    p += 1
                if p >= n:
                    # EOF in before-attribute-value: the reference emits the
                    # pending tag here (TokeniserState.kt:795-799), unlike
                    # other in-tag EOF states which drop it
                    before = len(attrs)
                    _push_attr(attrs, aname, "")
                    if track and len(attrs) > before:
                        apos.append((a_start, a_end, a_end, a_end))
                    self.p = n
                    return ("start", name, attrs, selfclosing)
                v_start = p
                quoted = s[p] in "\"'"
                val, p2 = self._attr_value(p)
                if p2 is None:
                    if self.errors is not None:
                        if p < n and s[p] == '"':
                            st = "AttributeValue_doubleQuoted"
                        elif p < n and s[p] == "'":
                            st = "AttributeValue_singleQuoted"
                        else:
                            st = "BeforeAttributeValue"
                        self._perr(n + 1, "Unexpectedly reached end of "
                                          f"file (EOF) in input state [{st}]")
                    self.p = n
                    return None
                p = p2
                before = len(attrs)
                _push_attr(attrs, aname, val)
                if track and len(attrs) > before:
                    if not val:  # empty value: implicit at name end
                        vs = ve = a_end
                    elif quoted:
                        vs, ve = v_start + 1, p2 - 1
                    else:
                        vs, ve = v_start, p2
                    apos.append((a_start, a_end, vs, ve))
            else:
                before = len(attrs)
                _push_attr(attrs, aname, None)  # boolean attribute
                if track and len(attrs) > before:
                    apos.append((a_start, a_end, a_end, a_end))

    def _attr_value(self, p: int):
        """Parse an attribute value at p. Returns (value, next_p) — next_p None at EOF."""
        s, n = self.s, self.n
        if p >= n:
            return "", None
        c = s[p]
        if c == '"' or c == "'":
            quote = c
            p += 1
            out: list[str] = []
            while True:
                if p >= n:
                    return "".join(out), None
                q = s.find(quote, p)
                stop = q if q != -1 else n
                chunk = s[p:stop]
                # handle & and NULL inside the chunk
                if "&" in chunk or (self.has_null and "\x00" in chunk):
                    out.append(self._decode_value(chunk, quote, p))
                else:
                    out.append(chunk)
                if q == -1:
                    return "".join(out), None
                return "".join(out), q + 1
        # unquoted
        out = []
        while p < n:
            m = _UNQUOTED_CHUNK.match(s, p)
            if m:
                out.append(m.group())
                p = m.end()
            if p >= n:
                break
            c = s[p]
            if c in _WS or c == ">":
                break
            if c == "\x00":
                out.append("�")
                p += 1
            elif c == "&":
                res = consume_charref(s, p + 1, ">", True, self._cref)
                if res is None:
                    out.append("&")
                    p += 1
                else:
                    out.append(res[0])
                    p = res[1]
        return "".join(out), p

    def _decode_value(self, chunk: str, quote: str, base: int = 0) -> str:
        err = None
        if self._cref is not None:
            err = (lambda msg, pos:
                   self._perr(base + pos, "Invalid character reference: " + msg))
        out: list[str] = []
        i, m = 0, len(chunk)
        while i < m:
            c = chunk[i]
            if c == "&":
                res = consume_charref(chunk, i + 1, quote, True, err)
                if res is None:
                    out.append("&")
                    i += 1
                else:
                    out.append(res[0])
                    i = res[1]
            elif c == "\x00":
                out.append("�")
                i += 1
            else:
                j = chunk.find("&", i)
                k = chunk.find("\x00", i) if self.has_null else -1
                stop = m
                if j != -1:
                    stop = j
                if k != -1 and k < stop:
                    stop = k
                out.append(chunk[i:stop])
                i = stop
        return "".join(out)

    # -- <! markup ----------------------------------------------------------

    def _markup_declaration(self, p: int):
        s, n = self.s, self.n
        if s.startswith("--", p):
            return self._comment(p + 2)
        if _DOCTYPE_KW.match(s, p):
            return self._doctype(p + 7)
        if s.startswith(_CDATA_OPEN, p):
            end = s.find("]]>", p + 7)
            if end == -1:
                data = s[p + 7 :]
                self.p = n
            else:
                data = s[p + 7 : end]
                self.p = end + 3
            return [("cdata", data)]
        return self._bogus_comment(p)

    def _comment(self, p: int):
        s, n = self.s, self.n
        # <!--> and <!---> are empty comments
        if p < n and s[p] == ">":
            self.p = p + 1
            return [("comment", "", False)]
        if s.startswith("->", p):
            self.p = p + 2
            return [("comment", "", False)]
        e1 = s.find("-->", p)
        e2 = s.find("--!>", p)
        if e2 != -1 and (e1 == -1 or e2 < e1):
            data = s[p:e2]
            self.p = e2 + 4
        elif e1 != -1:
            data = s[p:e1]
            self.p = e1 + 3
        else:
            data = s[p:]
            self.p = n
        if self.has_null:
            data = data.replace("\x00", "�")
        return [("comment", data, False)]

    def _bogus_comment(self, p: int):
        """Consume until '>' as a bogus comment; includes '?'/'!' lead chars."""
        s, n = self.s, self.n
        gt = s.find(">", p)
        if gt == -1:
            data = s[p:]
            self.p = n
        else:
            data = s[p:gt]
            self.p = gt + 1
        if self.has_null:
            data = data.replace("\x00", "�")
        return [("comment", data, True)]

    def _doctype(self, p: int):
        s, n = self.s, self.n
        force_quirks = False
        name = pub = sysid = None
        while p < n and s[p] in _WS:
            p += 1
        if p >= n:
            self.p = n
            return [("doctype", None, None, None, True)]
        if s[p] == ">":
            self.p = p + 1
            return [("doctype", None, None, None, True)]
        # name
        q = p
        while q < n and s[q] not in _WS and s[q] != ">":
            q += 1
        name = s[p:q].replace("\x00", "�")
        p = q
        while p < n and s[p] in _WS:
            p += 1
        if p < n and s[p] == ">":
            self.p = p + 1
            return [("doctype", name, None, None, False)]
        kw = self.low[p : p + 6]
        if kw == "public" or kw == "system":
            p += 6
            while p < n and s[p] in _WS:
                p += 1
            ident, p, ok = self._doctype_quoted(p)
            if not ok:
                return self._doctype_bogus(p, name, None, None)
            if kw == "public":
                pub = ident
                while p < n and s[p] in _WS:
                    p += 1
                if p < n and (s[p] == '"' or s[p] == "'"):
                    sysid, p, ok = self._doctype_quoted(p)
                    if not ok:
                        return self._doctype_bogus(p, name, pub, None)
            else:
                sysid = ident
            while p < n and s[p] in _WS:
                p += 1
            if p < n and s[p] == ">":
                self.p = p + 1
                return [("doctype", name, pub, sysid, False)]
            return self._doctype_bogus(p, name, pub, sysid, quirks=True)
        return self._doctype_bogus(p, name, None, None, quirks=True)

    def _doctype_quoted(self, p: int):
        s, n = self.s, self.n
        if p >= n or (s[p] != '"' and s[p] != "'"):
            return None, p, False
        quote = s[p]
        end = s.find(quote, p + 1)
        if end == -1:
            return s[p + 1 :], n, False
        return s[p + 1 : end], end + 1, True

    def _doctype_bogus(self, p: int, name, pub, sysid, quirks: bool = True):
        gt = self.s.find(">", p)
        self.p = self.n if gt == -1 else gt + 1
        return [("doctype", name, pub, sysid, quirks)]

    # -- RCDATA / RAWTEXT ----------------------------------------------------

    def _rcdata_or_rawtext(self, decode_refs: bool):
        """Scan until the appropriate end tag </{rawtext_tag}.

        Reference deviation preserved: if no appropriate end tag lies ahead,
        the remaining input is consumed as text (TokeniserState.kt:196-209).
        """
        s, low, n = self.s, self.low, self.n
        tag = self.rawtext_tag or ""
        needle = "</" + tag
        p = self.p
        search = p
        while True:
            idx = low.find(needle, search)
            if idx == -1:
                if decode_refs:
                    # RCDATA bail-out deviation (TokeniserState.kt:196-209):
                    # no appropriate end tag ahead — at the first '<'+letter
                    # emit a synthesized end tag and reparse from the '<' as
                    # a regular start tag instead of consuming to EOF
                    j = p
                    while True:
                        j = s.find("<", j)
                        if j == -1 or j + 1 >= n:
                            break
                        c1 = s[j + 1]
                        if "a" <= c1 <= "z" or "A" <= c1 <= "Z":
                            text = s[p:j]
                            self.p = j
                            self.state = DATA
                            return self._emit_raw_text(
                                text, decode_refs, [("end", tag)],
                                text_end=j, tail_start=j, tail_end=j
                            )
                        j += 1
                text = s[p:]
                self.p = n
                self.state = DATA
                return self._emit_raw_text(text, decode_refs, [("eof",)],
                                           text_end=n, tail_start=n,
                                           tail_end=n)
            after = idx + len(needle)
            if after < n and (s[after] in _WS or s[after] in "/>"):
                text = s[p:idx]
                self.p = after
                # consume the rest of the end tag (attrs ignored)
                self._skip_to_tag_close()
                self.state = DATA
                # end tag's start inherits markup_start (the OPENING tag's
                # '<'): rcdata end tags never pass through TagOpen, so the
                # reference never refreshes markupStartPos for them
                return self._emit_raw_text(text, decode_refs, [("end", tag)],
                                           text_end=idx,
                                           tail_start=self.markup_start,
                                           tail_end=self.p)
            if after >= n:
                text = s[p:]
                self.p = n
                self.state = DATA
                return self._emit_raw_text(text, decode_refs, [("eof",)],
                                           text_end=n, tail_start=n,
                                           tail_end=n)
            search = idx + 2

    def _skip_to_tag_close(self):
        gt = self.s.find(">", self.p)
        self.p = self.n if gt == -1 else gt + 1

    def _emit_raw_text(self, text: str, decode_refs: bool, tail_tokens: list,
                       text_end: int | None = None,
                       tail_start: int | None = None,
                       tail_end: int | None = None):
        """Emit raw text followed by pending tail tokens, carrying source
        ranges: text spans [tok_start, text_end); the tail (an end tag or
        EOF) spans [tail_start, tail_end). Defaults collapse to the cursor
        for callers that don't care (tail ranges then match the reference's
        markupStartPos inheritance only when passed explicitly)."""
        if self.has_null and "\x00" in text:
            text = text.replace("\x00", "�")
        if decode_refs and "&" in text:
            out: list[str] = []
            i, m = 0, len(text)
            while i < m:
                amp = text.find("&", i)
                if amp == -1:
                    out.append(text[i:])
                    break
                out.append(text[i:amp])
                res = consume_charref(text, amp + 1, None, False)
                if res is None:
                    out.append("&")
                    i = amp + 1
                else:
                    out.append(res[0])
                    i = res[1]
            text = "".join(out)
        self.pending_start = self.p if tail_start is None else tail_start
        self.pending_end = self.p if tail_end is None else tail_end
        self.pending.extend(reversed(tail_tokens))
        if text:
            self.tok_end = self.p if text_end is None else text_end
            return ("text", text)
        self.tok_start = self.pending_start
        self.tok_end = self.pending_end
        return self.pending.pop()

    # -- script data (with <!-- escape / double-escape handling) -------------

    def _script_data(self):
        """Condensed ScriptData* state family (TokeniserState.kt:246-651).

        Content is data text; '<!--' enters escaped mode where '</script>'
        still ends the element unless a nested '<script' put us in
        double-escaped mode (then '</script' drops back to escaped and only
        '-->' exits).
        """
        s, low, n = self.s, self.low, self.n
        p = self.p
        pos = p
        mode = 0  # 0 plain, 1 escaped, 2 double-escaped
        while pos < n:
            if mode == 0:
                i_end = low.find("</script", pos)
                i_esc = s.find("<!--", pos)
                if i_end != -1 and self._valid_tag_boundary(i_end + 8) and (
                    i_esc == -1 or i_end < i_esc
                ):
                    return self._finish_script(p, i_end)
                if i_esc != -1 and (i_end == -1 or i_esc < i_end):
                    mode = 1
                    pos = i_esc + 4
                    continue
                if i_end != -1:
                    pos = i_end + 2
                    continue
                break
            if mode == 1:
                i_end = low.find("</script", pos)
                i_close = s.find("-->", pos)
                i_open = low.find("<script", pos)
                cands = [
                    (i, k)
                    for i, k in ((i_end, "end"), (i_close, "close"), (i_open, "open"))
                    if i != -1
                ]
                if not cands:
                    break
                i, k = min(cands)
                if k == "end" and self._valid_tag_boundary(i + 8):
                    return self._finish_script(p, i)
                if k == "close":
                    mode = 0
                    pos = i + 3
                elif k == "open" and self._valid_tag_boundary(i + 7):
                    mode = 2
                    pos = i + 7
                else:
                    pos = i + 2
                continue
            # mode == 2 (double-escaped)
            i_end = low.find("</script", pos)
            i_close = s.find("-->", pos)
            cands = [(i, k) for i, k in ((i_end, "end"), (i_close, "close")) if i != -1]
            if not cands:
                break
            i, k = min(cands)
            if k == "end" and self._valid_tag_boundary(i + 8):
                mode = 1
                pos = i + 8
            elif k == "close":
                mode = 0
                pos = i + 3
            else:
                pos = i + 2
        # EOF: everything is data
        text = s[p:]
        self.p = n
        self.state = DATA
        return self._emit_raw_text(text, False, [("eof",)],
                                   text_end=n, tail_start=n, tail_end=n)

    def _valid_tag_boundary(self, after: int) -> bool:
        return after >= self.n or self.s[after] in _WS or self.s[after] in "/>"

    def _finish_script(self, p: int, idx: int):
        text = self.s[p:idx]
        self.p = idx + 8
        self._skip_to_tag_close()
        self.state = DATA
        return self._emit_raw_text(text, False, [("end", "script")],
                                   text_end=idx,
                                   tail_start=self.markup_start,
                                   tail_end=self.p)

    # -- plaintext ------------------------------------------------------------

    def _plaintext(self):
        text = self.s[self.p :]
        self.p = self.n
        if "\x00" in text:
            text = text.replace("\x00", "�")
        self.pending_start = self.pending_end = self.tok_end = self.n
        self.pending.append(("eof",))
        if text:
            return ("text", text)
        self.tok_start = self.n
        return self.pending.pop()
