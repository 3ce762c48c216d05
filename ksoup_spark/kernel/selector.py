"""CSS selector engine: query parser + evaluators.

Reimplements the reference's selector algebra
(/root/reference/ksoup/src/com/fleeksoft/ksoup/select/QueryParser.kt,
Evaluator.kt, StructuralEvaluator.kt, Collector.kt) over the int-indexed
node table:

- grammar: compound selectors joined by combinators `' ' > + ~`, with `,`
  (OR) at lowest precedence (QueryParser.kt:52-119); CSS identifier escapes
  (TokenQueue.kt:285-366); balanced-paren sub-query chomping;
  `(an+b | odd | even | b)` nth grammar (QueryParser.kt:293-345).
- evaluation: full preorder scan of the subtree testing the compiled
  evaluator per element (Collector.kt:17-41), with:
  * cost-ordered conjunct evaluation (Evaluator.kt cost(), sorted at
    CombiningEvaluator.kt:41-53),
  * memoized structural matches (StructuralEvaluator.kt:13-31) — memo dicts
    keyed by (evaluator id, node id),
  * consecutive `>` fused into an immediate-parent run
    (QueryParser.kt:70-81).
- semantics details preserved: attribute values matched trimmed +
  case-insensitive (Evaluator.kt:188-203), class tokens ASCII-case-insensitive
  (Element.hasClass, Element.kt:1528-1577), `:nth-*` count elements only,
  `[a!=v]` matches attribute-absent elements, `:contains` lowercases
  whitespace-normalized text.
"""

from __future__ import annotations

import re

from . import dom
from .dom import Doc
from .textops import (element_text, normalise_whitespace, own_text,
                      whole_text, whole_own_text, data_text)

_WS = " \t\n\r\f"
_COMBINATORS = ">+~,"


class SelectorError(ValueError):
    pass


_QE_SPAN = re.compile(r"\\Q(.*?)(?:\\E|$)", re.DOTALL)


def _compile_re(pattern: str):
    """Compile a :matches*/[a~=re] pattern; invalid patterns are query
    errors, not raw re.error leaks.

    Kotlin/JVM Regex supports ``\\Q..\\E`` literal quoting (what
    Regex.escape()/Pattern.quote() emit, exercised by
    TokenQueueTest.kt:testQuotedPattern); Python re does not, so those
    spans are rewritten to re.escape'd literals first."""
    if "\\Q" in pattern:
        pattern = _QE_SPAN.sub(lambda m: re.escape(m.group(1)), pattern)
    try:
        return re.compile(pattern)
    except re.error as e:
        raise SelectorError(f"invalid regex {pattern!r}: {e}") from None


# ---------------------------------------------------------------------------
# token queue
# ---------------------------------------------------------------------------

_IDENT_START = re.compile(r"[a-zA-Z0-9_\--￿]")
_HEX_ESCAPE = re.compile(r"[0-9a-fA-F]{1,6}")


class TokenQueue:
    def __init__(self, q: str):
        self.q = q
        self.pos = 0

    def is_empty(self) -> bool:
        return self.pos >= len(self.q)

    def current(self) -> str:
        return self.q[self.pos]

    def consume_whitespace(self) -> bool:
        seen = False
        while not self.is_empty() and self.q[self.pos] in _WS:
            self.pos += 1
            seen = True
        return seen

    def match_chomp(self, seq: str) -> bool:
        if self.q.startswith(seq, self.pos):
            self.pos += len(seq)
            return True
        return False

    def matches(self, seq: str) -> bool:
        return self.q.startswith(seq, self.pos)

    def remainder(self) -> str:
        """parser/TokenQueue.kt:316-321: consume-and-return the rest."""
        out = self.q[self.pos:]
        self.pos = len(self.q)
        return out

    def consume_to(self, seq: str) -> str:
        """Consume up to (not including) seq, or the remainder if absent —
        case-SENSITIVE (TokenQueue.kt:126-135)."""
        off = self.q.find(seq, self.pos)
        if off == -1:
            return self.remainder()
        out = self.q[self.pos:off]
        self.pos = off
        return out

    def _matches_ic(self, seq: str) -> bool:
        return self.q[self.pos:self.pos + len(seq)].lower() == seq.lower()

    def consume_to_ignore_case(self, seq: str) -> str:
        """TokenQueue.kt:137-160 — scan to a case-insensitive match of seq
        (or the end), leaving the terminator on the queue."""
        start = self.pos
        while not self.is_empty() and not self._matches_ic(seq):
            self.pos += 1
        return self.q[start:self.pos]

    def chomp_to_ignore_case(self, seq: str) -> str:
        """TokenQueue.kt:192-196: consumeToIgnoreCase + chomp the matched
        terminator (case-insensitively; a missing terminator is a no-op)."""
        out = self.consume_to_ignore_case(seq)
        if self._matches_ic(seq):
            self.pos += len(seq)
        return out

    def add_first(self, seq: str) -> None:
        """TokenQueue.kt:25-29: push seq back onto the queue head."""
        self.q = seq + self.q[self.pos:]
        self.pos = 0

    def consume_word(self) -> str:
        """TokenQueue.kt:272-277: next run of letters/digits."""
        start = self.pos
        while not self.is_empty() and self.q[self.pos].isalnum():
            self.pos += 1
        return self.q[start:self.pos]

    def consume_css_identifier(self) -> str:
        out: list[str] = []
        q, n = self.q, len(self.q)
        while self.pos < n:
            c = q[self.pos]
            if c == "\\" and self.pos + 1 < n:
                m = _HEX_ESCAPE.match(q, self.pos + 1)
                if m:
                    out.append(chr(int(m.group(), 16)))
                    self.pos = m.end()
                    if self.pos < n and q[self.pos] == " ":
                        self.pos += 1
                else:
                    out.append(q[self.pos + 1])
                    self.pos += 2
            elif _IDENT_START.match(c):
                out.append(c)
                self.pos += 1
            else:
                break
        return "".join(out)

    def consume_element_selector(self) -> str:
        """identifier that may include | and * (namespaces, wildcards)."""
        out: list[str] = []
        while not self.is_empty():
            c = self.q[self.pos]
            if c in "*|":
                out.append(c)
                self.pos += 1
            else:
                ident = self.consume_css_identifier()
                if not ident:
                    break
                out.append(ident)
        return "".join(out)

    @staticmethod
    def unescape(s: str) -> str:
        """TokenQueue.unescape (parser/TokenQueue.kt:344-360): drop lone
        backslashes, collapse doubled ones."""
        out: list[str] = []
        last = ""
        for c in s:
            if c == "\\":
                if last == "\\":
                    out.append(c)
                    c = ""
            else:
                out.append(c)
            last = c
        return "".join(out)

    def chomp_balanced(self, open_c: str, close_c: str) -> str:
        """Scan-forward balanced chomp (parser/TokenQueue.kt:207-255):
        consumes until the balance closes, hiding openers/closers inside
        quotes (when the quote char isn't itself the opener), honoring
        ``\\Q..\\E`` regex quoting from Pattern.quote(), and preserving
        backslash escapes in the output (suitable for regexes; use
        unescape() for contains-text strings)."""
        start = -1
        end = -1
        depth = 0
        last = "\0"
        in_sq = in_dq = in_qe = False
        q = self.q
        while True:
            if self.is_empty():
                break
            c = q[self.pos]
            self.pos += 1
            if last != "\\":
                if c == "'" and c != open_c and not in_dq:
                    in_sq = not in_sq
                elif c == '"' and c != open_c and not in_sq:
                    in_dq = not in_dq
                if in_sq or in_dq or in_qe:
                    last = c
                    if depth > 0:
                        continue
                    break
                if c == open_c:
                    depth += 1
                    if start == -1:
                        start = self.pos
                elif c == close_c:
                    depth -= 1
            elif c == "Q":
                in_qe = True
            elif c == "E":
                in_qe = False
            if depth > 0 and last != "\0":
                end = self.pos  # don't include the outer match pair
            last = c
            if depth <= 0:
                break
        out = q[start:end] if end >= 0 else ""
        if depth > 0:  # ran out of queue before seeing enough closers
            raise SelectorError(f"Did not find balanced marker at '{out}'")
        return out

    def consume_to_any(self, *seqs: str) -> str:
        start = self.pos
        q, n = self.q, len(self.q)
        while self.pos < n:
            for s in seqs:
                if q.startswith(s, self.pos):
                    return q[start : self.pos]
            self.pos += 1
        return q[start:]


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] in "'\"" and s[-1] == s[0]:
        return s[1:-1]
    return s


# ---------------------------------------------------------------------------
# evaluation context
# ---------------------------------------------------------------------------

_tq_unescape = TokenQueue.unescape


class EvalCtx:
    """Per-select state: doc, selection root, memo tables, text caches."""

    __slots__ = ("doc", "root", "memo", "text_cache", "own_cache", "whole_cache")

    def __init__(self, doc: Doc, root: int):
        self.doc = doc
        self.root = root
        self.memo: dict = {}
        self.text_cache: dict[int, str] = {}
        self.own_cache: dict[int, str] = {}
        self.whole_cache: dict[int, str] = {}

    def text(self, el: int) -> str:
        t = self.text_cache.get(el)
        if t is None:
            t = element_text(self.doc, el)
            self.text_cache[el] = t
        return t

    def own(self, el: int) -> str:
        t = self.own_cache.get(el)
        if t is None:
            t = own_text(self.doc, el)
            self.own_cache[el] = t
        return t

    def whole(self, el: int) -> str:
        t = self.whole_cache.get(el)
        if t is None:
            t = whole_text(self.doc, el)
            self.whole_cache[el] = t
        return t


# ---------------------------------------------------------------------------
# evaluators
# ---------------------------------------------------------------------------

class Evaluator:
    cost = 2

    def matches(self, ctx: EvalCtx, el: int) -> bool:  # pragma: no cover
        raise NotImplementedError


class AllElements(Evaluator):
    cost = 10

    def matches(self, ctx, el):
        return True


class Tag(Evaluator):
    cost = 1

    def __init__(self, name: str):
        self.name = name

    def matches(self, ctx, el):
        return (ctx.doc.tag[el] or "").lower() == self.name


class TagStartsWith(Evaluator):
    cost = 1

    def __init__(self, prefix: str):
        self.prefix = prefix

    def matches(self, ctx, el):
        return (ctx.doc.tag[el] or "").lower().startswith(self.prefix)


class TagEndsWith(Evaluator):
    cost = 1

    def __init__(self, suffix: str):
        self.suffix = suffix

    def matches(self, ctx, el):
        t = (ctx.doc.tag[el] or "").lower()
        return t.endswith(self.suffix) or t == self.suffix.lstrip(":")


class Id(Evaluator):
    cost = 2

    def __init__(self, ident: str):
        self.ident = ident

    def matches(self, ctx, el):
        return ctx.doc.get_attr(el, "id") == self.ident


class ClassEval(Evaluator):
    cost = 6

    def __init__(self, cls: str):
        self.cls = cls.lower()

    def matches(self, ctx, el):
        v = ctx.doc.get_attr(el, "class")
        if not v:
            return False
        return self.cls in v.lower().split()


class HasAttr(Evaluator):
    cost = 2

    def __init__(self, key: str):
        self.key = key.lower()

    def matches(self, ctx, el):
        a = ctx.doc.attrs[el]
        if not a:
            return False
        if self.key in a:
            return True
        return any(k.lower() == self.key for k in a)


class AttrStarting(Evaluator):
    cost = 6

    def __init__(self, prefix: str):
        self.prefix = prefix.lower()

    def matches(self, ctx, el):
        a = ctx.doc.attrs[el]
        if not a:
            return False
        return any(k.lower().startswith(self.prefix) for k in a)


class _AttrValueBase(Evaluator):
    cost = 3

    def __init__(self, key: str, value: str):
        self.key = key.lower()
        self.value = _unquote(value).lower()

    def _get(self, ctx, el):
        v = ctx.doc.get_attr(el, self.key)
        return None if v is None else v


class AttrValue(_AttrValueBase):
    def matches(self, ctx, el):
        v = self._get(ctx, el)
        return v is not None and v.strip().lower() == self.value


class AttrValueNot(_AttrValueBase):
    def matches(self, ctx, el):
        v = self._get(ctx, el)
        return v is None or v.strip().lower() != self.value


class AttrValueStarting(_AttrValueBase):
    cost = 4

    def matches(self, ctx, el):
        v = self._get(ctx, el)
        return v is not None and v.lower().startswith(self.value)


class AttrValueEnding(_AttrValueBase):
    cost = 4

    def matches(self, ctx, el):
        v = self._get(ctx, el)
        return v is not None and v.lower().endswith(self.value)


class AttrValueContaining(_AttrValueBase):
    cost = 6

    def matches(self, ctx, el):
        v = self._get(ctx, el)
        return v is not None and self.value in v.lower()


class AttrValueMatching(Evaluator):
    cost = 8

    def __init__(self, key: str, pattern: str):
        self.key = key.lower()
        self.re = _compile_re(pattern)

    def matches(self, ctx, el):
        v = ctx.doc.get_attr(el, self.key)
        return v is not None and self.re.search(v) is not None


class IndexLessThan(Evaluator):
    def __init__(self, idx: int):
        self.idx = idx

    def matches(self, ctx, el):
        return el != ctx.root and _elem_index(ctx.doc, el) < self.idx


class IndexGreaterThan(Evaluator):
    def __init__(self, idx: int):
        self.idx = idx

    def matches(self, ctx, el):
        return _elem_index(ctx.doc, el) > self.idx


class IndexEquals(Evaluator):
    def __init__(self, idx: int):
        self.idx = idx

    def matches(self, ctx, el):
        return _elem_index(ctx.doc, el) == self.idx


def _elem_index(doc: Doc, el: int) -> int:
    p = doc.parent[el]
    if p == -1:
        return 0
    i = 0
    for c in doc.children[p]:
        if c == el:
            return i
        if doc.kind[c] == dom.ELEMENT:
            i += 1
    return 0


def _elem_siblings(doc: Doc, el: int) -> list[int]:
    p = doc.parent[el]
    if p == -1:
        return [el]
    return [c for c in doc.children[p] if doc.kind[c] == dom.ELEMENT]


class IsFirstChild(Evaluator):
    def matches(self, ctx, el):
        p = ctx.doc.parent[el]
        if p == -1 or ctx.doc.kind[p] == dom.DOCUMENT:
            return False
        return _elem_index(ctx.doc, el) == 0


class IsLastChild(Evaluator):
    def matches(self, ctx, el):
        p = ctx.doc.parent[el]
        if p == -1 or ctx.doc.kind[p] == dom.DOCUMENT:
            return False
        sibs = _elem_siblings(ctx.doc, el)
        return bool(sibs) and sibs[-1] == el


class IsNth(Evaluator):
    """nth-child family: pos matched by a*n+b (Evaluator.kt:434-500)."""

    def __init__(self, a: int, b: int, last: bool = False, of_type: bool = False):
        self.a, self.b, self.last, self.of_type = a, b, last, of_type

    def matches(self, ctx, el):
        doc = ctx.doc
        p = doc.parent[el]
        if p == -1 or doc.kind[p] == dom.DOCUMENT:
            return False
        sibs = _elem_siblings(doc, el)
        if self.of_type:
            tag = doc.tag[el]
            sibs = [s for s in sibs if doc.tag[s] == tag]
        idx = sibs.index(el)
        pos = (len(sibs) - idx) if self.last else (idx + 1)
        if self.a == 0:
            return pos == self.b
        return (pos - self.b) * self.a >= 0 and (pos - self.b) % self.a == 0


class IsOnlyChild(Evaluator):
    def matches(self, ctx, el):
        p = ctx.doc.parent[el]
        if p == -1 or ctx.doc.kind[p] == dom.DOCUMENT:
            return False
        return len(_elem_siblings(ctx.doc, el)) == 1


class IsOnlyOfType(Evaluator):
    def matches(self, ctx, el):
        p = ctx.doc.parent[el]
        if p == -1 or ctx.doc.kind[p] == dom.DOCUMENT:
            return False
        doc = ctx.doc
        tag = doc.tag[el]
        return sum(1 for s in _elem_siblings(doc, el) if doc.tag[s] == tag) == 1


class IsRoot(Evaluator):
    def matches(self, ctx, el):
        doc = ctx.doc
        r = ctx.root
        if doc.kind[r] == dom.DOCUMENT:
            r = doc.html_el()
        return el == r


class IsEmpty(Evaluator):
    def matches(self, ctx, el):
        doc = ctx.doc
        for c in doc.children[el]:
            k = doc.kind[c]
            if k == dom.ELEMENT or k == dom.CDATA:
                return False
            if k == dom.TEXT and (doc.text[c] or "").strip(_WS + " "):
                return False
        return True


class ContainsText(Evaluator):
    cost = 10

    def __init__(self, text: str):
        self.text = normalise_whitespace(_unquote(text)).lower()

    def matches(self, ctx, el):
        return self.text in ctx.text(el).lower()


class ContainsOwnText(Evaluator):
    cost = 7

    def __init__(self, text: str):
        self.text = normalise_whitespace(_unquote(text)).lower()

    def matches(self, ctx, el):
        return self.text in ctx.own(el).lower()


class ContainsWholeText(Evaluator):
    cost = 10

    def __init__(self, text: str):
        self.text = _unquote(text)

    def matches(self, ctx, el):
        return self.text in ctx.whole(el)


class ContainsWholeOwnText(Evaluator):
    cost = 7

    def __init__(self, text: str):
        self.text = _unquote(text)

    def matches(self, ctx, el):
        return self.text in whole_own_text(ctx.doc, el)


class ContainsData(Evaluator):
    cost = 7

    def __init__(self, text: str):
        self.text = _unquote(text).lower()

    def matches(self, ctx, el):
        return self.text in data_text(ctx.doc, el).lower()


class Matches(Evaluator):
    cost = 8

    def __init__(self, pattern: str):
        self.re = _compile_re(pattern)

    def matches(self, ctx, el):
        return self.re.search(ctx.text(el)) is not None


class MatchesOwn(Evaluator):
    cost = 7

    def __init__(self, pattern: str):
        self.re = _compile_re(pattern)

    def matches(self, ctx, el):
        return self.re.search(ctx.own(el)) is not None


class MatchesWholeText(Evaluator):
    cost = 8

    def __init__(self, pattern: str):
        self.re = _compile_re(pattern)

    def matches(self, ctx, el):
        return self.re.search(ctx.whole(el)) is not None


class MatchesWholeOwnText(Evaluator):
    cost = 7

    def __init__(self, pattern: str):
        self.re = _compile_re(pattern)

    def matches(self, ctx, el):
        return self.re.search(whole_own_text(ctx.doc, el)) is not None


class MatchText(Evaluator):
    """:matchText (Evaluator.kt:809-840): text nodes become selectable
    PseudoTextElements. The reference mutates lazily during the scan with
    cost -1 forcing first evaluation; we run the equivalent rewrite as a
    pre-pass (prepare_match_text) before the preorder scan — identical
    observable results, since preorder reaches a parent before its children.
    """

    cost = -1

    def matches(self, ctx, el):
        ps = ctx.doc.pseudo
        return ps is not None and el in ps


def prepare_match_text(doc: Doc, root: int = 0) -> None:
    """Wrap every element's text-node children in PseudoTextElements carrying
    the parent's tag + attributes (Evaluator.kt:816-829). Idempotent."""
    if doc.pseudo is None:
        doc.pseudo = set()
    pseudo = doc.pseudo
    snapshot = [n for n, _ in doc.preorder(root)
                if doc.kind[n] == dom.ELEMENT and n not in pseudo]
    for el in snapshot:
        for c in list(doc.children[el]):
            if doc.kind[c] == dom.TEXT:
                attrs = doc.attrs[el]
                pel = doc.new_node(dom.ELEMENT, doc.tag[el],
                                   dict(attrs) if attrs else None,
                                   ns=doc.ns[el])
                pseudo.add(pel)
                doc.insert_before(c, pel)
                doc.append_child(pel, c)


class And(Evaluator):
    def __init__(self, evals: list[Evaluator]):
        # cost-ordered conjunct evaluation (CombiningEvaluator.kt:41-53)
        self.evals = sorted(evals, key=lambda e: e.cost)
        self.cost = sum(e.cost for e in evals)

    def matches(self, ctx, el):
        return all(e.matches(ctx, el) for e in self.evals)


class Or(Evaluator):
    def __init__(self, evals: list[Evaluator]):
        self.evals = evals
        self.cost = sum(e.cost for e in evals)

    def matches(self, ctx, el):
        return any(e.matches(ctx, el) for e in self.evals)


class Not(Evaluator):
    def __init__(self, inner: Evaluator):
        self.inner = inner
        self.cost = inner.cost + 2

    def matches(self, ctx, el):
        return not self.inner.matches(ctx, el)


class Root(Evaluator):
    cost = 1

    def matches(self, ctx, el):
        return el == ctx.root


class Ancestor(Evaluator):
    """Descendant combinator E F: any ancestor of F matches E (memoized)."""

    def __init__(self, inner: Evaluator):
        self.inner = inner
        self.cost = 2 * inner.cost

    def matches(self, ctx, el):
        key = (id(self), el)
        memo = ctx.memo
        hit = memo.get(key)
        if hit is not None:
            return hit
        doc = ctx.doc
        node = doc.parent[el]
        result = False
        while node != -1:
            if doc.kind[node] == dom.ELEMENT or node == ctx.root:
                if self.inner.matches(ctx, node):
                    result = True
                    break
                sub = memo.get((id(self), node))
                if sub is not None:
                    result = sub
                    break
            if node == ctx.root:
                break
            node = doc.parent[node]
        memo[key] = result
        return result


class ImmediateParentRun(Evaluator):
    """Fused chain a > b > c (StructuralEvaluator.kt:164-200)."""

    def __init__(self, chain: list[Evaluator]):
        # chain listed outermost-first; last entry matches the element itself
        self.chain = chain
        self.cost = sum(e.cost for e in chain) + 2

    def matches(self, ctx, el):
        doc = ctx.doc
        node = el
        for e in reversed(self.chain):
            if node == -1:
                return False
            if not e.matches(ctx, node):
                return False
            node = doc.parent[node]
            if node != -1 and doc.kind[node] == dom.DOCUMENT:
                node = -1 if not isinstance(self.chain[0], Root) else node
        return True


class ImmediatePrevious(Evaluator):
    """E + F"""

    def __init__(self, inner: Evaluator):
        self.inner = inner
        self.cost = inner.cost + 2

    def matches(self, ctx, el):
        doc = ctx.doc
        p = doc.parent[el]
        if p == -1:
            return False
        prev = -1
        for c in doc.children[p]:
            if c == el:
                break
            if doc.kind[c] == dom.ELEMENT:
                prev = c
        return prev != -1 and self.inner.matches(ctx, prev)


class PreviousSibling(Evaluator):
    """E ~ F (memoized)"""

    def __init__(self, inner: Evaluator):
        self.inner = inner
        self.cost = 3 * inner.cost

    def matches(self, ctx, el):
        key = (id(self), el)
        hit = ctx.memo.get(key)
        if hit is not None:
            return hit
        doc = ctx.doc
        p = doc.parent[el]
        result = False
        if p != -1:
            for c in doc.children[p]:
                if c == el:
                    break
                if doc.kind[c] == dom.ELEMENT and self.inner.matches(ctx, c):
                    result = True
                    break
        ctx.memo[key] = result
        return result


class Has(Evaluator):
    """:has(sel): any descendant (self excluded) matches (StructuralEvaluator.kt:50-99)."""

    def __init__(self, inner: Evaluator, relative_root: bool):
        self.inner = inner
        self.relative_root = relative_root
        self.cost = 10 * inner.cost

    def matches(self, ctx, el):
        doc = ctx.doc
        sub = EvalCtx(doc, el)
        sub.text_cache = ctx.text_cache
        sub.own_cache = ctx.own_cache
        sub.whole_cache = ctx.whole_cache
        for node, _ in doc.preorder(el):
            if node == el:
                continue
            if doc.kind[node] == dom.ELEMENT and self.inner.matches(sub, node):
                return True
        return False


class Is(Evaluator):
    def __init__(self, inner: Evaluator):
        self.inner = inner
        self.cost = inner.cost + 2

    def matches(self, ctx, el):
        return self.inner.matches(ctx, el)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_NTH = re.compile(
    r"^(?:(odd)|(even)|([+-]?\d+)|(([+-]?\d*)n([+-]\d+)?))$", re.IGNORECASE
)


def _parse_nth(arg: str) -> tuple[int, int]:
    arg = arg.strip().replace(" ", "")
    m = _NTH.match(arg)
    if not m:
        raise SelectorError(f"could not parse nth-index {arg!r}")
    if m.group(1):
        return 2, 1
    if m.group(2):
        return 2, 0
    if m.group(3):
        return 0, int(m.group(3))
    a_txt = m.group(5)
    a = 1 if a_txt in ("", "+") else (-1 if a_txt == "-" else int(a_txt))
    b = int(m.group(6)) if m.group(6) else 0
    return a, b


class QueryParser:
    def __init__(self, query: str):
        self.tq = TokenQueue(query.strip())
        self.query = query

    def parse(self) -> Evaluator:
        evals = self._parse_or()
        if not self.tq.is_empty():
            raise SelectorError(f"could not parse query {self.query!r}")
        return evals

    def _parse_or(self) -> Evaluator:
        parts = [self._parse_sequence()]
        while self.tq.match_chomp(","):
            self.tq.consume_whitespace()
            parts.append(self._parse_sequence())
        return parts[0] if len(parts) == 1 else Or(parts)

    def _parse_sequence(self) -> Evaluator:
        tq = self.tq
        tq.consume_whitespace()
        # leading combinator: root-anchored query (QueryParser.kt:25-28)
        if not tq.is_empty() and tq.current() in ">+~":
            left: Evaluator = Root()
        else:
            left = self._parse_compound()
        while True:
            seen_ws = tq.consume_whitespace()
            if tq.is_empty() or tq.current() == ",":
                break
            c = tq.current()
            if c in ">+~":
                tq.pos += 1
                tq.consume_whitespace()
                right = self._parse_compound()
                if c == ">":
                    if isinstance(left, ImmediateParentRun):
                        left.chain.append(right)
                        left.cost += right.cost
                    else:
                        left = ImmediateParentRun([left, right])
                    continue
                if c == "+":
                    left = And([right, ImmediatePrevious(left)])
                else:
                    left = And([right, PreviousSibling(left)])
            elif seen_ws:
                right = self._parse_compound()
                left = And([right, Ancestor(left)])
            else:
                raise SelectorError(f"could not parse at {tq.pos} in {self.query!r}")
        return left

    def _parse_compound(self) -> Evaluator:
        tq = self.tq
        evals: list[Evaluator] = []
        while not tq.is_empty():
            c = tq.current()
            if c in _WS or c in _COMBINATORS:
                break
            if c == "#":
                tq.pos += 1
                evals.append(Id(tq.consume_css_identifier()))
            elif c == ".":
                tq.pos += 1
                evals.append(ClassEval(tq.consume_css_identifier()))
            elif c == "[":
                evals.append(self._parse_attr())
            elif c == "*":
                sel = tq.consume_element_selector()
                evals.append(self._by_tag(sel))
            elif c == ":":
                evals.append(self._parse_pseudo())
            else:
                sel = tq.consume_element_selector()
                if not sel:
                    raise SelectorError(
                        f"could not parse at {tq.pos} in {self.query!r}")
                evals.append(self._by_tag(sel))
        if not evals:
            raise SelectorError(f"empty compound in {self.query!r}")
        return evals[0] if len(evals) == 1 else And(evals)

    def _by_tag(self, sel: str) -> Evaluator:
        sel = sel.lower()
        if sel == "*" or sel == "*|*":
            return AllElements()
        if sel.startswith("*|"):
            return TagEndsWith(":" + sel[2:])
        if sel.endswith("|*"):
            return TagStartsWith(sel[:-2] + ":")
        if "|" in sel:
            sel = sel.replace("|", ":")
        return Tag(sel)

    def _parse_attr(self) -> Evaluator:
        body = self.tq.chomp_balanced("[", "]")
        cq = TokenQueue(body.strip())
        if cq.match_chomp("^"):
            return AttrStarting(cq.q[cq.pos:])
        key = cq.consume_to_any("=", "!=", "^=", "$=", "*=", "~=").strip()
        if not key:
            raise SelectorError(f"empty attr key in [{body}]")
        if cq.is_empty():
            if key == "*":  # [*]: any attribute (QueryParser.kt:254-256)
                return AttrStarting("")
            return HasAttr(key)
        rest = cq.q[cq.pos:]
        if rest.startswith("!="):
            return AttrValueNot(key, rest[2:])
        if rest.startswith("^="):
            return AttrValueStarting(key, rest[2:])
        if rest.startswith("$="):
            return AttrValueEnding(key, rest[2:])
        if rest.startswith("*="):
            return AttrValueContaining(key, rest[2:])
        if rest.startswith("~="):
            return AttrValueMatching(key, rest[2:])
        if rest.startswith("="):
            return AttrValue(key, rest[1:])
        raise SelectorError(f"could not parse attr [{body}]")

    def _parse_pseudo(self) -> Evaluator:
        tq = self.tq
        assert tq.current() == ":"
        tq.pos += 1
        name = tq.consume_css_identifier().lower()
        arg = None
        if not tq.is_empty() and tq.current() == "(":
            arg = tq.chomp_balanced("(", ")")
        if name == "lt":
            return IndexLessThan(int(arg))
        if name == "gt":
            return IndexGreaterThan(int(arg))
        if name == "eq":
            return IndexEquals(int(arg))
        if name == "has":
            inner_q = arg.strip()
            relative = inner_q[:1] in ">+~"
            return Has(parse_query(inner_q), relative)
        if name == "is":
            return Is(parse_query(arg))
        if name == "not":
            return Not(parse_query(arg))
        # contains-family args are TokenQueue.unescape'd (QueryParser.kt:413,
        # 420); :matches regexes are NOT (QueryParser.kt:435 — regex bits
        # carry their own escapes)
        if name == "contains":
            return ContainsText(_tq_unescape(arg))
        if name == "containsown":
            return ContainsOwnText(_tq_unescape(arg))
        if name == "containswholetext":
            return ContainsWholeText(_tq_unescape(arg))
        if name == "containswholeowntext":
            return ContainsWholeOwnText(_tq_unescape(arg))
        if name == "containsdata":
            return ContainsData(_tq_unescape(arg))
        if name == "matches":
            return Matches(arg)
        if name == "matchesown":
            return MatchesOwn(arg)
        if name == "matcheswholetext":
            return MatchesWholeText(arg)
        if name == "matcheswholeowntext":
            return MatchesWholeOwnText(arg)
        if name == "nth-child":
            a, b = _parse_nth(arg)
            return IsNth(a, b)
        if name == "nth-last-child":
            a, b = _parse_nth(arg)
            return IsNth(a, b, last=True)
        if name == "nth-of-type":
            a, b = _parse_nth(arg)
            return IsNth(a, b, of_type=True)
        if name == "nth-last-of-type":
            a, b = _parse_nth(arg)
            return IsNth(a, b, last=True, of_type=True)
        if name == "first-child":
            return IsFirstChild()
        if name == "last-child":
            return IsLastChild()
        if name == "first-of-type":
            return IsNth(0, 1, of_type=True)
        if name == "last-of-type":
            return IsNth(0, 1, last=True, of_type=True)
        if name == "only-child":
            return IsOnlyChild()
        if name == "only-of-type":
            return IsOnlyOfType()
        if name == "empty":
            return IsEmpty()
        if name == "root":
            return IsRoot()
        if name == "matchtext":
            return MatchText()
        raise SelectorError(f"unknown pseudo selector :{name}")


_QUERY_CACHE: dict[str, Evaluator] = {}


def parse_query(query: str) -> Evaluator:
    ev = _QUERY_CACHE.get(query)
    if ev is None:
        ev = QueryParser(query).parse()
        if len(_QUERY_CACHE) > 4096:
            _QUERY_CACHE.clear()
        _QUERY_CACHE[query] = ev
    return ev


def _contains_match_text(ev: Evaluator) -> bool:
    if isinstance(ev, MatchText):
        return True
    for attr in ("evals", "chain"):
        subs = getattr(ev, attr, None)
        if subs and any(_contains_match_text(e) for e in subs):
            return True
    inner = getattr(ev, "inner", None)
    return inner is not None and _contains_match_text(inner)


def select(doc: Doc, query: str | Evaluator, root: int | None = None) -> list[int]:
    """Collector.collect: preorder scan testing the evaluator per element.

    The Document node itself is a candidate: the reference's Document IS an
    Element (tag "#root"), so tagless predicates match it from a root-level
    select — SelectorTest.testAllElements asserts select("*") counts it, and
    testPseudoContains counts it for ":contains(rain)".
    """
    if root is None:
        root = 0
    ev = parse_query(query) if isinstance(query, str) else query
    if _contains_match_text(ev):
        prepare_match_text(doc, root)
    ctx = EvalCtx(doc, root)
    out: list[int] = []
    kinds = doc.kind
    for node, _ in doc.preorder(root):
        k = kinds[node]
        if (k == dom.ELEMENT or k == dom.DOCUMENT) and ev.matches(ctx, node):
            out.append(node)
    return out


def select_first(doc: Doc, query: str | Evaluator, root: int | None = None) -> int:
    if root is None:
        root = 0
    ev = parse_query(query) if isinstance(query, str) else query
    if _contains_match_text(ev):
        prepare_match_text(doc, root)
    ctx = EvalCtx(doc, root)
    kinds = doc.kind
    for node, _ in doc.preorder(root):
        k = kinds[node]
        if (k == dom.ELEMENT or k == dom.DOCUMENT) and ev.matches(ctx, node):
            return node
    return -1


def element_is(doc: Doc, node: int, query: str | Evaluator) -> bool:
    """Element.is / elementIs (Element.kt:522-533, 163): does this element
    match the query, evaluated against its owner document root."""
    ev = parse_query(query) if isinstance(query, str) else query
    if _contains_match_text(ev):
        prepare_match_text(doc, 0)
    return ev.matches(EvalCtx(doc, 0), node)


def expect_first(doc: Doc, query: str | Evaluator, root: int | None = None) -> int:
    """Element.expectFirst (Element.kt:498-508): selectFirst that raises
    instead of returning a no-match sentinel."""
    n = select_first(doc, query, root)
    if n == -1:
        raise SelectorError(f"no element matching {query!r}")
    return n


# chars OUTSIDE this class keep the slow exact path; a pure ASCII
# alnum/-/_ string needs no escapes (the common case for tags/classes)
_CSS_IDENT_UNSAFE = re.compile(r"[^0-9A-Za-z_-]")


def escape_css_identifier(s: str) -> str:
    """TokenQueue.escapeCssIdentifier (parser/TokenQueue.kt:366-377):
    backslash-escape every char that is not alphanumeric, '-', or '_'."""
    if not _CSS_IDENT_UNSAFE.search(s):
        return s
    return "".join(c if (c.isalnum() or c in "-_") else "\\" + c for c in s)


def _css_component(doc: Doc, el: int, memo: dict | None = None) -> str:
    """One path segment: tag.classes[:nth-child(n)] (Element.kt:860-880).

    memo (shared by css_selectors) caches per-(parent, selector) sibling
    match counts and per-parent element-children lists — without it a
    bulk path computation over W same-parent elements is O(W²)."""
    if memo is None:
        memo = {}
    cached = memo.get(el)
    if cached is not None:
        return cached
    name = (doc.tag_display or {}).get(el) or doc.tag[el] or ""
    # escaped namespace colon renders as CSS namespace syntax ns|tag
    sel = escape_css_identifier(name).replace("\\:", "|")
    classes = [escape_css_identifier(c) for c in dom.class_names(doc, el)]
    if classes:
        sel += "." + ".".join(classes)
    p = doc.parent[el]
    if p == -1 or doc.kind[p] == dom.DOCUMENT:
        # don't add Document to the path: there is always a lone html node
        memo[el] = sel
        return sel
    pos = memo.get(("pos", p))
    if pos is None:
        sibs = [c for c in doc.children[p] if doc.kind[c] == dom.ELEMENT]
        pos = {c: i for i, c in enumerate(sibs)}
        memo[("pos", p)] = pos
        memo[("sibs", p)] = sibs
    n_match = memo.get((p, sel))
    if n_match is None:
        ev = parse_query(sel)
        ctx = EvalCtx(doc, p)
        n_match = sum(1 for c in memo[("sibs", p)] if ev.matches(ctx, c))
        memo[(p, sel)] = n_match
    out = " > " + sel
    if n_match > 1:
        out = f"{out}:nth-child({pos[el] + 1})"
    memo[el] = out
    return out


def _css_selector_one(doc: Doc, node: int, memo: dict) -> str:
    el_id = doc.get_attr(node, "id") or ""
    if el_id:
        id_sel = "#" + escape_css_identifier(el_id)
        n_ids = memo.get(("id", id_sel))
        if n_ids is None:
            n_ids = select(doc, id_sel)
            memo[("id", id_sel)] = n_ids
        if len(n_ids) == 1 and n_ids[0] == node:
            return id_sel
    parts: list[str] = []
    el = node
    while el != -1 and doc.kind[el] != dom.DOCUMENT:
        parts.insert(0, _css_component(doc, el, memo))
        el = doc.parent[el]
    return "".join(parts)


def css_selector(doc: Doc, node: int) -> str:
    """Element.cssSelector (nodes/Element.kt:836-858): a CSS path that
    uniquely selects this element — #id when the id is document-unique,
    else parent-path > tag.classes with :nth-child disambiguators."""
    return _css_selector_one(doc, node, {})


def css_selectors(doc: Doc, nodes: list[int]) -> list[str]:
    """Bulk cssSelector sharing the per-parent match-count memo across
    elements (linear in total path length instead of O(W²) for W
    same-parent subjects)."""
    memo: dict = {}
    return [_css_selector_one(doc, n, memo) for n in nodes]
