"""Within-document incremental parsing: the StreamParser surface.

Reimplements the reference's StreamParser semantics
(/root/reference/ksoup/src/com/fleeksoft/ksoup/parser/StreamParser.kt:16-140):
the parse advances token by token and SUSPENDS as soon as a requested
element is available, so metadata-only queries ("give me the <title>")
never tokenize the rest of the document. Elements are emitted when they
COMPLETE (their end tag is processed, or they are void), in completion
order, with their full subtree parsed — matching the reference's
emitted-when-closed contract.

Differences from the reference, documented: emission is pull-based
(select_next) rather than sequence-based. The reference's conserve-memory
contract ("Elements may be removed from the DOM during the parse")
maps to prune(): the caller prunes emitted elements it has consumed,
which detaches the subtree and releases its payloads — the arena keeps
O(1) small tombstone slots per pruned node while the dominant memory
(text strings, attribute dicts) is freed, bounding memory on giant
documents. The across-document streaming path is Structured Streaming
(ksoup_spark/streaming/).
"""

from __future__ import annotations

import re

from . import dom
from . import selector as sel
from .dom import Doc
from .treebuilder import HtmlTreeBuilder

# Evaluators whose verdict on a COMPLETED element can still flip as later
# siblings arrive. Everything else is decided the moment the element's end
# tag is processed (its subtree, ancestors, and preceding siblings are
# final), so it is safe to evaluate once and discard on a miss.
_FUTURE_SIBLING_DEPENDENT = (
    sel.IsLastChild,
    sel.IsOnlyChild,
    sel.IsOnlyOfType,
    sel.MatchText,   # whole-doc pre-pass; conservative
)


def _inner_evals(ev: sel.Evaluator) -> list[sel.Evaluator]:
    out = []
    v = getattr(ev, "inner", None)
    if isinstance(v, sel.Evaluator):
        out.append(v)
    for attr in ("evals", "chain"):
        vs = getattr(ev, attr, None)
        if isinstance(vs, list):
            out.extend(x for x in vs if isinstance(x, sel.Evaluator))
    return out


def _is_stable(ev: sel.Evaluator) -> bool:
    """True if a completed element's match result can never change later."""
    if isinstance(ev, _FUTURE_SIBLING_DEPENDENT):
        return False
    if isinstance(ev, sel.IsNth) and ev.last:
        return False
    return all(_is_stable(c) for c in _inner_evals(ev))


class StreamParser:
    """Incremental document parse with early-exit element selection.

    xml=True drives the XML tree builder instead (reference
    StreamParserTest.worksWithXmlParser)."""

    def __init__(self, html: str, base_uri: str = "", xml: bool = False,
                 **parse_kwargs):
        if xml:
            from .xml import XmlTreeBuilder

            self._tb = XmlTreeBuilder().parse_setup(html, base_uri,
                                                    **parse_kwargs)
        else:
            # use_c=False: the stream surface meters tok.p per step (the
            # `consumed` property / early-exit evidence) and the C batch
            # tokenizer reports byte offsets in coarse batches
            self._tb = HtmlTreeBuilder().parse_setup(html, base_uri,
                                                     use_c=False,
                                                     **parse_kwargs)
        self.doc: Doc = self._tb.doc
        self._scan_from = 1    # node ids below this already collected
        self._candidates: list[int] = []  # elements awaiting completion
        self._eof = False
        self._stopped = False

    # -- core pump ---------------------------------------------------------

    def _collect_new(self) -> None:
        d = self.doc
        hi = len(d.kind)
        for nid in range(self._scan_from, hi):
            if d.kind[nid] == dom.ELEMENT:
                self._candidates.append(nid)
        self._scan_from = hi

    def _pop_complete(self, ev, stable: bool) -> int:
        """First candidate (in creation order) that is complete and matches.

        After EOF everything counts as complete (StreamParserTest.select:
        an unclosed trailing <p> still emits once the input is drained).

        For stable selectors (the common case) each candidate is evaluated
        exactly ONCE, at completion, and dropped on a miss — matching the
        reference's emitted-once stream contract and keeping the whole parse
        linear in element count. Only future-sibling-dependent pseudos
        (:last-child, :only-child, ...) keep the re-check-every-pump path.
        """
        d = self.doc
        open_set = () if self._eof else set(self._tb.stack)
        ctx = sel.EvalCtx(d, 0)
        if stable:
            keep: list[int] = []
            cands = self._candidates
            for i, nid in enumerate(cands):
                if nid in open_set:
                    keep.append(nid)  # not complete yet; check next pump
                    continue
                if d.parent[nid] == -1 and nid != 0:
                    continue  # discarded by the builder (e.g. dropped tag)
                if ev.matches(ctx, nid):
                    keep.extend(cands[i + 1:])
                    self._candidates = keep
                    return nid
                # complete, evaluated once, no match: consumed by the stream
            self._candidates = keep
            return -1
        for i, nid in enumerate(self._candidates):
            if nid in open_set:
                continue
            if d.parent[nid] == -1 and nid != 0:
                continue
            if ev.matches(ctx, nid):
                del self._candidates[i]
                return nid
        return -1

    def select_next(self, css: str | sel.Evaluator) -> int:
        """Advance the parse until the next COMPLETE element matching `css`
        exists; returns its node id, or -1 at document end. The tail of the
        input past the match is left untokenized (the early-exit payoff)."""
        if self._stopped:
            return -1
        ev = sel.parse_query(css) if isinstance(css, str) else css
        stable = _is_stable(ev)
        while True:
            got = self._pop_complete(ev, stable)
            if got != -1:
                return got
            if self._eof:
                return -1
            self._eof = not self._tb.parse_step()
            self._collect_new()

    def select_first(self, css: str | sel.Evaluator) -> int:
        """Parse just far enough for the first match (StreamParser.kt:45)."""
        return self.select_next(css)

    def stop(self) -> None:
        """Abandon the rest of the input (StreamParser.stop)."""
        self._stopped = True

    def prune(self, nid: int) -> None:
        """Release an emitted element's subtree (the reference's
        conserve-memory contract, StreamParser.kt:20-23): detaches the
        node and tombstones every slot in it — text, attributes, and
        child lists are freed; per-node bookkeeping shrinks to a few
        small ints. Pruned nodes can no longer match selections (they are
        unreachable from the root and their candidates are discarded)."""
        d = self.doc
        subtree = [n for n, _ in d.preorder(nid)]
        d.detach(nid)
        for n in subtree:
            d.text[n] = None
            d.attrs[n] = None
            d.children[n] = []
            d.parent[n] = -1

    def retained_chars(self) -> int:
        """Characters of text/attribute payload currently held by the
        partial DOM (the bounded-memory meter prune() drives down)."""
        d = self.doc
        total = 0
        for t in d.text:
            if t:
                total += len(t)
        for a in d.attrs:
            if a:
                total += sum(len(k) + len(v or "") for k, v in a.items())
        return total

    def complete(self) -> Doc:
        """Run the parse to EOF and return the full document."""
        while not self._eof:
            self._eof = not self._tb.parse_step()
        self._collect_new()
        return self.doc

    @property
    def consumed(self) -> int:
        """Characters of input tokenized so far (early-exit meter)."""
        return self._tb.tok.p if self._tb.tok else 0


def stream_title(html: str) -> str:
    """Early-exit Document.title(): stops tokenizing at `</title>` —
    the metadata-only fast path for huge documents. Normalization matches
    textops.doc_title exactly."""
    from .textops import _TRIM, element_text, normalise_whitespace

    # Cheap bail-out: a <title> element can only arise from a literal
    # "<title" in the source (any case). Title-less giant documents skip
    # the parse entirely instead of tokenizing to EOF.
    if not re.search(r"<[tT][iI][tT][lL][eE]", html):
        return ""
    sp = StreamParser(html)
    nid = sp.select_first("title")
    if nid == -1:
        return ""
    return normalise_whitespace(element_text(sp.doc, nid)).strip(_TRIM)
