"""CSS-to-DataFrame compiler: run selectors as Catalyst plans over the
exploded node table.

The kernel evaluates selectors per document (Collector semantics); this
module compiles the common selector subset into RELATIONAL operations over
``node_table_df`` output, so corpus-wide structural queries run fully
JVM-side with Catalyst doing predicate pushdown/join planning:

- simple selectors -> column predicates (tag/id/class/attr families)
- ``E F`` (descendant) -> preorder-interval range join
  (anc.node_id < d.node_id <= anc.subtree_end, per SURVEY §2.E "the closest
  thing the reference has to a join")
- ``E > F`` (child) -> equi-join on (doc_id, parent_id)
- ``E + F`` / ``E ~ F`` -> sibling joins on (doc_id, parent_id) with
  elem_sibling_index arithmetic
- positional pseudos (:first-child, :nth-child(an+b) incl. odd/even,
  :lt/:gt/:eq) -> index arithmetic on elem_sibling_index, with the
  kernel's document-parent/root guards (html is nobody's :first-child;
  the #root Document matches :eq(0) but never :lt)
- ``:has(compound)`` -> subtree-interval LEFT-SEMI join against matching
  descendants; ``:not(compound)`` / ``:is(compound)`` -> null-safe negated /
  pass-through predicates

``:has`` compiles for structural inners too (round 5):

- ``:has(div p)`` -> three-way interval join: a descendant d matching the
  subject-pred, an ancestor a of d matching the outer pred, with a bounded
  to the subject's subtree-or-self (the kernel's Has walk stops at the
  subject root — StructuralEvaluator.kt:50-99)
- ``:has(span > p)`` / ``:has(> p)`` / ``:has(> div > p)`` -> chained
  parent equi-joins; a Root-anchored chain pins its topmost parent to the
  subject's node_id
- ``:has(p + span)`` / ``:has(p ~ span)`` -> sibling-index witness join

Unsupported pieces (text pseudos other than :contains-with-elem_text,
sibling-of-root :has forms like ``:has(~ p)`` (kernel: never match),
multi-level descendant inners like ``:has(a b c)``, nth-last-child /
nth-of-type families — they need sibling counts / per-type indexes the
node table doesn't carry) raise UnsupportedSelector — callers fall back
to the kernel path (operators.extract.select_elements_df), which covers
everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import selector as S

ELEMENT_KIND = 1
DOCUMENT_KIND = 0  # the Document IS an element (#root) in subject position


class UnsupportedSelector(ValueError):
    pass


def _compound_predicate(ev, has_text: bool = False) -> "F.Column":
    """Column predicate for a non-structural evaluator."""
    if isinstance(ev, S.And):
        pred = F.lit(True)
        for e in ev.evals:
            pred = pred & _compound_predicate(e, has_text)
        return pred
    if isinstance(ev, S.Or):
        pred = F.lit(False)
        for e in ev.evals:
            pred = pred | _compound_predicate(e, has_text)
        return pred
    if isinstance(ev, S.ContainsText):
        # ev.text is pre-normalized+lowered (Evaluator ctor); elem_text is
        # the kernel's normalized element text, so this is exactly the
        # kernel's `self.text in ctx.text(el).lower()`
        if not has_text:
            raise UnsupportedSelector(
                "ContainsText (node table lacks elem_text — build it with "
                "node_table_df(include_elem_text=True))")
        return F.lower(F.coalesce(F.col("elem_text"), F.lit(""))).contains(
            ev.text)
    if isinstance(ev, S.AllElements):
        return F.lit(True)
    if isinstance(ev, S.Tag):
        return F.lower(F.col("tag")) == ev.name
    if isinstance(ev, S.TagStartsWith):
        return F.lower(F.col("tag")).startswith(ev.prefix)
    if isinstance(ev, S.TagEndsWith):
        return F.lower(F.col("tag")).endswith(ev.suffix) | (
            F.lower(F.col("tag")) == ev.suffix.lstrip(":")
        )
    if isinstance(ev, S.Id):
        return F.col("attrs")["id"] == ev.ident
    if isinstance(ev, S.ClassEval):
        return F.array_contains(
            F.split(F.lower(F.coalesce(F.col("attrs")["class"], F.lit(""))),
                    r"\s+"),
            ev.cls,
        )
    if isinstance(ev, S.HasAttr):
        return F.array_contains(
            F.transform(F.map_keys("attrs"), lambda k: F.lower(k)), ev.key
        )
    if isinstance(ev, S.AttrStarting):
        return F.exists(
            F.map_keys("attrs"), lambda k: F.lower(k).startswith(ev.prefix)
        )
    if isinstance(ev, (S.AttrValue, S.AttrValueNot, S.AttrValueStarting,
                       S.AttrValueEnding, S.AttrValueContaining)):
        v = F.lower(F.trim(F.coalesce(F.col("attrs")[ev.key], F.lit(""))))
        raw = F.lower(F.coalesce(F.col("attrs")[ev.key], F.lit("")))
        has = F.array_contains(
            F.transform(F.map_keys("attrs"), lambda k: F.lower(k)), ev.key
        )
        if isinstance(ev, S.AttrValue):
            return has & (v == ev.value)
        if isinstance(ev, S.AttrValueNot):
            return ~has | (v != ev.value)
        if isinstance(ev, S.AttrValueStarting):
            return has & raw.startswith(ev.value)
        if isinstance(ev, S.AttrValueEnding):
            return has & raw.endswith(ev.value)
        return has & raw.contains(ev.value)
    if isinstance(ev, S.AttrValueMatching):
        return F.coalesce(F.col("attrs")[ev.key], F.lit("")).rlike(
            ev.re.pattern
        )
    if isinstance(ev, S.IsFirstChild):
        # kernel guard: no match when the parent is the Document (html) or
        # absent — parent_id 0 is the document row, -1 the document itself
        return (F.col("parent_id") > 0) & (F.col("elem_sibling_index") == 0)
    if isinstance(ev, S.IndexLessThan):
        # kernel: el != ctx.root — the #root Document (node 0) never matches
        return (F.col("node_id") > 0) & (F.col("elem_sibling_index") < ev.idx)
    if isinstance(ev, S.IndexGreaterThan):
        return F.col("elem_sibling_index") > ev.idx
    if isinstance(ev, S.IndexEquals):
        pred = F.col("elem_sibling_index") == ev.idx
        if ev.idx == 0:
            # kernel _elem_index of the #root Document is 0 (no parent)
            pred = pred | (F.col("node_id") == 0)
        return pred
    if isinstance(ev, S.IsNth) and not ev.last and not ev.of_type:
        # nth-child(an+b), pos = elem_sibling_index + 1, with the kernel's
        # document-parent guard; general a: (pos-b)*a >= 0 and a | (pos-b)
        guard = F.col("parent_id") > 0
        pos = F.col("elem_sibling_index") + 1
        if ev.a == 0:
            return guard & (pos == ev.b)
        return (guard
                & ((pos - ev.b) * ev.a >= 0)
                & ((pos - ev.b) % ev.a == 0))
    if isinstance(ev, S.Is):
        return _compound_predicate(ev.inner, has_text)
    if isinstance(ev, S.Not):
        # null-safe negation: a NULL inner predicate (missing attr/map)
        # means "didn't match", so :not() must keep the row — Spark's
        # three-valued ~NULL would silently drop it
        return ~F.coalesce(_compound_predicate(ev.inner, has_text), F.lit(False))
    raise UnsupportedSelector(type(ev).__name__)


def _split_structural(ev, has_text: bool = False):
    """Decompose And(compound..., structural, :has...) ->
    (compound pred, structural, has_evals)."""
    _STRUCT = (S.Ancestor, S.ImmediateParentRun, S.ImmediatePrevious,
               S.PreviousSibling)
    if isinstance(ev, S.And):
        structural, has_evals, plain = [], [], []
        for e in ev.evals:
            if isinstance(e, _STRUCT):
                structural.append(e)
            elif isinstance(e, S.Has):
                has_evals.append(e)
            else:
                plain.append(e)
        if len(structural) > 1:
            raise UnsupportedSelector("multiple structural conjuncts")
        pred = (_compound_predicate(S.And(plain), has_text)
                if plain else F.lit(True))
        return pred, (structural[0] if structural else None), has_evals
    if isinstance(ev, _STRUCT):
        return F.lit(True), ev, []
    if isinstance(ev, S.Has):
        return F.lit(True), None, [ev]
    return _compound_predicate(ev, has_text), None, []


def compile_selector(nodes: DataFrame, css: str) -> DataFrame:
    """node table + CSS -> DataFrame of matched element rows.

    Catalyst sees only joins/filters — whole-stage codegen end to end.
    When the table carries elem_text (node_table_df include_elem_text),
    :contains compiles to a JVM string predicate too.
    """
    ev = S.parse_query(css)
    return _compile_eval(nodes, ev, "elem_text" in nodes.columns)


def _split_inner(inner, has_text: bool = False):
    """Decompose a :has inner evaluator into (plain predicate, structural).

    Raises UnsupportedSelector for shapes the relational form can't
    express (nested :has, >1 structural conjunct, Or over structural)."""
    _STRUCT = (S.Ancestor, S.ImmediateParentRun, S.ImmediatePrevious,
               S.PreviousSibling)
    if isinstance(inner, S.And):
        structural, plain = [], []
        for e in inner.evals:
            if isinstance(e, _STRUCT):
                structural.append(e)
            else:
                plain.append(e)
        if len(structural) > 1:
            raise UnsupportedSelector(":has with multiple structural conjuncts")
        pred = (_compound_predicate(S.And(plain), has_text)
                if plain else F.lit(True))
        return pred, (structural[0] if structural else None)
    if isinstance(inner, _STRUCT):
        return F.lit(True), inner
    return _compound_predicate(inner, has_text), None


def _interval_semi(out: DataFrame, w: DataFrame) -> DataFrame:
    """Keep subject rows with a witness (_w_doc, _w_d) in their STRICT
    subtree (anc.node_id < d <= anc.subtree_end) — the Has preorder loop
    skips the subject itself."""
    return out.join(
        w,
        (out["doc_id"] == w["_w_doc"])
        & (out["node_id"] < w["_w_d"])
        & (w["_w_d"] <= out["subtree_end"]),
        "left_semi",
    )


def _has_semi_join(nodes: DataFrame, out: DataFrame, has_ev,
                   has_text: bool = False) -> DataFrame:
    """:has(sel) as subtree-interval LEFT-SEMI joins — the reference's Has
    semantics (select/StructuralEvaluator.kt:50-99) relationally, staying
    pure-JVM for corpus-wide node-table queries.

    Compiled inner shapes:
    - compound: witness = matching elements; strict-subtree semi-join
    - ``div p`` (Ancestor): the kernel evaluates the inner with the SUBJECT
      as root, so the ancestor walk from the candidate stops at (and
      includes) the subject — witness = (a, d) pairs with a an ancestor of
      d; semi-join pins subject.node_id <= a and d <= subject.subtree_end,
      bounding a to the subject's subtree-or-self
    - ``span > p`` / ``> p`` chains: chained parent equi-joins; the kernel's
      ImmediateParentRun walk is NOT root-bounded (parents above the
      subject can match), so non-rooted chains are subject-independent;
      a Root anchor pins the topmost parent to the subject's node_id
    - ``p + span`` / ``p ~ span``: sibling-index witness joins (element-only
      sibling index; also subject-independent in the kernel)

    Sibling-of-root forms (':has(~ p)') and multi-level descendant inners
    (':has(a b c)') raise UnsupportedSelector -> kernel fallback."""
    plain, struct = _split_inner(has_ev.inner, has_text)
    elems = nodes.filter(F.col("kind") == ELEMENT_KIND)

    if struct is None:
        w = elems.filter(plain).select(
            F.col("doc_id").alias("_w_doc"), F.col("node_id").alias("_w_d"))
        return _interval_semi(out, w)

    if isinstance(struct, S.Ancestor):
        # inner of the Ancestor must itself be predicate-only: a deeper
        # structural level (':has(a b c)') would need its own root bound
        apred = _compound_predicate(struct.inner, has_text)
        d = elems.filter(plain).select(
            F.col("doc_id").alias("_w_doc"), F.col("node_id").alias("_w_d"))
        # the bounded walk may stop AT the subject, which can be the
        # Document (#root) row — include kind-0 rows; the node_id <= _w_a
        # bound below pins any document witness to the subject row itself
        a = nodes.filter(
            ((F.col("kind") == ELEMENT_KIND)
             | (F.col("kind") == DOCUMENT_KIND)) & apred
        ).select(
            F.col("doc_id").alias("_a_doc"),
            F.col("node_id").alias("_w_a"),
            F.col("subtree_end").alias("_a_end"),
        )
        w = d.join(
            a,
            (d["_w_doc"] == a["_a_doc"])
            & (a["_w_a"] < d["_w_d"])
            & (d["_w_d"] <= a["_a_end"]),
        ).select("_w_doc", "_w_a", "_w_d")
        return out.join(
            w,
            (out["doc_id"] == w["_w_doc"])
            & (out["node_id"] <= w["_w_a"])
            & (w["_w_d"] <= out["subtree_end"]),
            "left_semi",
        )

    if isinstance(struct, S.ImmediateParentRun):
        chain = struct.chain
        rooted = isinstance(chain[0], S.Root)
        entries = list(chain[1:]) if rooted else list(chain)
        if not entries or any(isinstance(e, S.Root) for e in entries):
            raise UnsupportedSelector(":has chain shape")
        dpred = _compound_predicate(entries[-1], has_text) & plain
        w = elems.filter(dpred).select(
            F.col("doc_id").alias("_w_doc"), F.col("node_id").alias("_w_d"),
            F.col("parent_id").alias("_w_up"))
        for e in reversed(entries[:-1]):
            # parents filter to kind==ELEMENT: the kernel walk fails on
            # reaching the document for non-Root entries
            par = elems.filter(_compound_predicate(e, has_text)).select(
                F.col("doc_id").alias("_p_doc"),
                F.col("node_id").alias("_p_id"),
                F.col("parent_id").alias("_p_up"))
            w = (
                w.join(par, (w["_w_doc"] == par["_p_doc"])
                       & (w["_w_up"] == par["_p_id"]))
                .select("_w_doc", "_w_d", F.col("_p_up").alias("_w_up"))
            )
        if rooted:
            # Root consumes the next parent step: the subject IS that node
            # (works for a Document subject too — node_id equality)
            return out.join(
                w,
                (out["doc_id"] == w["_w_doc"])
                & (out["node_id"] == w["_w_up"]),
                "left_semi",
            )
        return _interval_semi(out, w.select("_w_doc", "_w_d"))

    # ImmediatePrevious / PreviousSibling
    if isinstance(struct.inner, S.Root):
        # ':has(~ p)' / ':has(+ p)': the Has loop only visits descendants,
        # and a sibling of the subject is never a descendant — the kernel
        # never matches these; keep them on the (equally empty) kernel path
        raise UnsupportedSelector(":has sibling-of-root")
    xpred = _compound_predicate(struct.inner, has_text)
    d = elems.filter(plain).select(
        F.col("doc_id").alias("_w_doc"), F.col("node_id").alias("_w_d"),
        F.col("parent_id").alias("_d_par"),
        F.col("elem_sibling_index").alias("_d_si"))
    prev = elems.filter(xpred).select(
        F.col("doc_id").alias("_p_doc"), F.col("parent_id").alias("_p_par"),
        F.col("elem_sibling_index").alias("_p_si"))
    sicond = (
        (d["_d_si"] == prev["_p_si"] + 1)
        if isinstance(struct, S.ImmediatePrevious)
        else (d["_d_si"] > prev["_p_si"])
    )
    w = d.join(
        prev,
        (d["_w_doc"] == prev["_p_doc"]) & (d["_d_par"] == prev["_p_par"])
        & sicond,
    ).select("_w_doc", "_w_d")
    return _interval_semi(out, w)


def _compile_eval(nodes: DataFrame, ev, has_text: bool = False) -> DataFrame:
    # document rows participate as #root elements (kernel select() parity:
    # the reference's Document extends Element, so tagless predicates match
    # it — SelectorTest.testAllElements counts select("*") = elements + 1)
    elements = nodes.filter(
        (F.col("kind") == ELEMENT_KIND) | (F.col("kind") == DOCUMENT_KIND))
    if isinstance(ev, S.Or):
        out = None
        for sub in ev.evals:
            part = _compile_eval(nodes, sub, has_text)
            out = part if out is None else out.unionByName(part)
        return out.dropDuplicates(["doc_id", "node_id"])
    pred, structural, has_evals = _split_structural(ev, has_text)
    subject = elements.filter(pred)
    if structural is None:
        out = subject
        for h in has_evals:
            out = _has_semi_join(nodes, out, h, has_text)
        return out
    if has_evals:
        # apply :has to the subject side first (left-semi keeps columns),
        # then the structural join below proceeds unchanged
        for h in has_evals:
            subject = _has_semi_join(nodes, subject, h, has_text)
    if isinstance(ev := structural, S.Ancestor):
        anc = _compile_eval(nodes, ev.inner, has_text).select(
            "doc_id",
            F.col("node_id").alias("_anc_id"),
            F.col("subtree_end").alias("_anc_end"),
        )
        return (
            subject.join(anc, "doc_id")
            .filter((F.col("node_id") > F.col("_anc_id"))
                    & (F.col("node_id") <= F.col("_anc_end")))
            .drop("_anc_id", "_anc_end")
            .dropDuplicates(["doc_id", "node_id"])
        )
    if isinstance(ev, S.ImmediateParentRun):
        # chain outermost-first; subject matches the last entry
        out = subject
        chain = ev.chain
        for parent_ev in reversed(chain[:-1]):
            if isinstance(parent_ev, S.Root):
                raise UnsupportedSelector("root-anchored child run")
            par = _compile_eval(nodes, parent_ev, has_text).select(
                "doc_id", F.col("node_id").alias("_p_id")
            )
            out = (
                out.join(
                    par,
                    (out["doc_id"] == par["doc_id"])
                    & (out["parent_id"] == par["_p_id"]),
                )
                .drop(par["doc_id"])
                .drop("_p_id")
            )
        # subject predicate: the final chain entry
        out = out.filter(_compound_predicate(chain[-1], has_text))
        return out.dropDuplicates(["doc_id", "node_id"])
    if isinstance(ev, (S.ImmediatePrevious, S.PreviousSibling)):
        prev = _compile_eval(nodes, ev.inner, has_text).select(
            "doc_id",
            F.col("parent_id").alias("_sp"),
            F.col("elem_sibling_index").alias("_si"),
        )
        cond = (
            (subject["doc_id"] == prev["doc_id"])
            & (subject["parent_id"] == prev["_sp"])
        )
        if isinstance(ev, S.ImmediatePrevious):
            cond = cond & (subject["elem_sibling_index"] == prev["_si"] + 1)
        else:
            cond = cond & (subject["elem_sibling_index"] > prev["_si"])
        return (
            subject.join(prev, cond)
            .drop(prev["doc_id"])
            .drop("_sp", "_si")
            .dropDuplicates(["doc_id", "node_id"])
        )
    raise UnsupportedSelector(type(structural).__name__)


def select_nodes(nodes: DataFrame, css: str) -> DataFrame:
    """compile_selector + document-order output columns."""
    return compile_selector(nodes, css).orderBy("doc_id", "node_id")
