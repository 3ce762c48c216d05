"""CSS-to-DataFrame compiler vs the kernel selector (differential test:
both paths must return identical (doc_id, node_id) sets)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksoup_spark.kernel import selector as sel  # noqa: E402
from ksoup_spark.kernel import treebuilder as tb  # noqa: E402
from ksoup_spark.operators import extract, nodequery  # noqa: E402

DOCS = [
    ("d1", '<div id=a class="x y"><p id=p1>one</p><p id=p2>two</p>'
           '<span data-k=v>s</span></div><div class=z><p id=p3>three</p></div>'),
    ("d2", '<ul><li id=l1>1<li id=l2 class=X>2<li id=l3>3</ul>'
           '<table><tr><td id=t1>c</td></tr></table>'),
    ("d3", '<article><section><p id=q1 title="The Title">deep</p></section>'
           '</article><p id=q2>top</p>'),
    # nesting for structural :has inners — divs inside divs, chains, siblings
    ("d4", '<div id=o1><div id=i1><p id=w1>a</p><span id=w2>b</span></div>'
           '<p id=w3>c</p></div>'
           '<div id=o2><section id=s1><div id=i2><p id=w4>d</p></div>'
           '</section></div>'
           '<div id=o3><p id=w5>e</p><em>f</em><span id=w6>g</span></div>'),
    # same-tag runs, only-children, empties (round 5: counted positional
    # pseudos + :empty + :root)
    ("d5", '<div id=m><p>1</p><p>2</p><span>s1</span><p>3</p><em>e</em>'
           '<span>s2</span></div>'
           '<div id=only><p id=solo>x</p></div>'
           '<div id=e1></div><div id=e2> \t\n</div><div id=e3><!--c--></div>'
           '<div id=e4>&nbsp;</div><p id=e5>text</p>'),
    # deep descendant chains for multi-level :has inners, incl. the
    # subject-is-intermediate-witness shape (outer level above the subject)
    ("d6", '<div id=top><section id=mid><article id=art><p id=deep>t</p>'
           '</article></section></div>'
           '<section id=plain><p>u</p></section>'
           '<div id=solo2><span><b>z</b></span></div>'),
    # interleaved text/comment siblings: element-sibling-index vs overall
    # sibling-index must not be conflated by the window arithmetic
    ("d7", '<div id=ix>head<p>a</p> mid <!--x--><span>b</span><p>c</p>'
           'tail<span>d</span><!--y--><p>e</p></div>'
           '<ul id=ux><!--c--><li>1</li>txt<li>2</li><li>3</li> <li>4</li></ul>'),
    # raw-whitespace/own/whole/data text views (round 5 text-pseudo compile)
    ("d8", '<pre id=pre1>  keep   space\nline2</pre>'
           '<script>var Q = 1;</script><style>.x{color:red}</style>'
           '<p id=br1>a<br>b <b>bold</b> tail</p>'
           '<p id=ws> \t </p>'),
]

QUERIES = [
    "p",
    "*",
    "div p",
    "div > p",
    "article p",
    "li + li",
    "#l1 ~ li",
    "div.x p",
    ".x",
    "[data-k]",
    "[data-k=v]",
    "[title^=the]",
    "p:first-child",
    "li:nth-child(2)",
    "li:lt(2)",
    # root/document-guard parity + general an+b (round 5)
    "*:first-child",
    "*:eq(0)",
    "*:lt(2)",
    "*:gt(0)",
    "li:nth-child(2n+1)",
    "li:nth-child(odd)",
    "li:nth-child(even)",
    "p:nth-child(-n+2)",
    "li:nth-child(3n)",
    "*:nth-child(2n+1)",
    "p, span",
    "ul > li.x",
    # 3+-level child chains: each join level must walk UP one ancestor
    # (a 2-level chain can't catch conflating parent with grandparent)
    "div > div > p",
    "div > section > div > p",
    "body > div > p",
    "#o2 > section > div",
    "div > div > p:only-child",
    # :has / :not / :is — compiled since round 4
    "div:has(p)",
    "div:has(.x)",
    "section:has(p[title])",
    "article:has(p)",
    "div:has(p):has(span)",
    "div:has(p) > p",
    "article :has(p)",
    # structural :has inners — compiled since round 5
    "div:has(div p)",
    "div:has(section p)",
    "body:has(div p)",
    "div:has(span > p)",
    "div:has(section > div > p)",
    "div:has(> p)",
    "*:has(> p)",
    "div:has(> div > p)",
    "div:has(p + span)",
    "div:has(p ~ span)",
    "div:has(p ~ em)",
    "section:has(div p)",
    "div:has(.x p)",
    "ul:has(li + li)",
    "table:has(tr > td)",
    "article:has(section > p)",
    "div:has(* > p)",           # tagless parent: must NOT match the document
    "*:has(* p)",
    "div:has(> div > p):has(span)",
    "li:not(.x)",
    "p:not(#p1)",
    "div:not([data-k])",
    "p:is(#p1)",
    "p[*]",
    "span[*]",
    # counted positional family — compiled via windows since round 5
    "p:last-child",
    "li:last-child",
    "*:last-child",
    "p:nth-last-child(1)",
    "li:nth-last-child(2n)",
    "span:nth-last-child(-n+2)",
    "p:nth-last-child(odd)",
    "p:first-of-type",
    "span:last-of-type",
    "p:nth-of-type(2)",
    "p:nth-of-type(2n+1)",
    "*:nth-of-type(1)",
    "span:nth-last-of-type(1)",
    "p:nth-last-of-type(odd)",
    "p:only-child",
    "td:only-child",
    "*:only-child",
    "em:only-of-type",
    "p:only-of-type",
    "div:empty",
    "*:empty",
    "div:not(:empty)",
    ":root",
    "html:root",
    "div:root",
    "div:has(p:only-child)",
    "div:has(p:last-child)",
    "div:has(span:first-of-type)",
    "div > p:nth-last-child(2)",
    # multi-level :has descendant inners — compiled since round 5
    "div:has(div section p)",
    "section:has(div section p)",   # subject IS the intermediate witness
    "div:has(section article p)",
    "body:has(div section p)",
    "*:has(* * *)",
    "article:has(div section p)",
    "div:has(div span b)",
    "span:has(div span b)",         # intermediate witness + outer div above
    "section:has(* article p)",
    "div:has(section article p):has(span)",
    # MIXED spines (descendant + child + sibling links) — round 5
    "div:has(div > p)",
    "body:has(section > div p)",
    "div:has(a > b c)",
    "body:has(div > section p)",
    "body:has(div > p span)",
    "div:has(section > div p)",
    "body:has(div section > div)",
    "div:has(section article > p)",
    "div:has(div p > span)",
    "*:has(div > p)",
    "body:has(div > section > article p)",
    "div:has(section div > p)",
    "div:has(div section > article)",
    "div:has(p + span b)",
    "div:has(p ~ em span)",
    "div:has(div p + span)",
    "div:has(p em + span)",
    "body:has(div p + span)",
    "body:has(div > section article > p)",
    "*:has(section > article > p)",
    "div:has(section > article p):has(span)",
    "div:not(:has(div > p))",
    "section:not(:has(article > p span)) p",
    # nested :has / sibling-of-sibling / set-form :not — round 5
    "div:has(p:has(span))",
    "body:has(div:has(p) span)",
    "div:has(section:has(article) > div)",
    "*:has(p:has(em):has(span))",
    "div:has(p:not(:has(span)))",
    "body:has(div:has(p:has(span)))",
    "div:has(em ~ p + span)",
    "body:has(a ~ p ~ span)",
    "div:has(div em + p ~ span)",
    "section:has(p + p + p)",
    "div:has(> p:has(span))",
    "body:has(> div:has(p) > section)",
    "div:not(p + div)",
    "div:not(section > div)",
    "span:not(div b)",
    "body *:not(div p)",
    "div:not(:has(p:has(span)))",
    # :has inside top-level child-chain tails — round 5
    "section > div:has(p)",
    "body > div:has(span) em",
    "section > div:not(:has(p))",
    "div:has(p) > span",
    # rooted runs with tails (the _RootPin spine form) — round 5
    "div:has(> p span)",
    "div:has(> div p)",
    "body:has(> div > section p)",
    "div:has(> section b em)",
    "section:has(> div + div)",
    "div:has(> p ~ span)",
    "body:has(> div ~ div p)",
    "div:has(> div:has(p) span)",
    "*:has(> p b)",
    "div:not(:has(> div p))",
    # ctx-root-insensitive :not/:is chains inside :has (global
    # anti/semi-join — round 5)
    "div:has(p:not(a > p))",
    "div:has(p:not(div > p))",
    "div:has(span:not(p > span))",
    "div:has(p:not(em + p))",
    "div:has(p:not(em ~ p))",
    "div:has(*:not(section > div):not(p):not(span):not(em):not(b))",
    "div:has(p:is(div > p))",
    "section:has(div:not(body > div) p)",
    "div:has(span:not(p:has(b) > span))",
    "body:has(div:not(a + div) > p)",
    "div:not(:has(p:not(div > p)))",
    # subject-BOUNDED :not/:is descendant chains on the :has witness
    # (pair-aware anti/semi over the subject×witness frame — round 5)
    "div:has(p:not(a p))",
    "div:has(p:not(div p))",
    "div:has(p:not(a div p))",
    "div:has(p:not(body a p))",
    "div:has(p:is(div p))",
    "div:has(span:not(div p span))",
    "div:has(p:not(a > div p))",
    "div:has(p:not(div > div p))",
    "div:has(p:not(section > div p))",
    "section:has(p:not(section p))",
    "*:has(p:not(div p))",
    "div:not(:has(p:not(div p)))",
    "body:has(em:not(section em))",
    "div:has(p:is(section div p))",
    # root-anchored child runs at the top level (ctx.root = Document;
    # the kernel keeps the walk through a DOCUMENT parent only when
    # chain[0] is Root — round 5)
    "> html",
    "> div",
    "> html > body",
    "> html > body > div",
    "> * > body",
    "> * > *",
    "> * > html",
    "> body",
    ">p>strong,>li>strong",
    "> html > body p, section > div",
    "> html body span",
    "> html > body div p",
    # non-rooted chains must DIE at a document parent ('* > html' is the
    # kernel's never-match: the walk nulls at the DOCUMENT node)
    "* > html",
    "*|* > html",
    "* > body",
    "* > * > html",
    # :lt inside :has inners — the kernel binds IndexLessThan to
    # ctx.root = the SUBJECT (el != root && index < n); compiled via
    # per-branch pred/pred_subj digest variants (round 5)
    "div:has(p:lt(3))",
    "div:has(p:lt(1))",
    "*:has(*:lt(2))",
    "div:has(div:lt(2) p)",           # anc-chain top carrying :lt
    "div:has(div:lt(1) p)",
    "*:has(div:lt(3) span)",
    "body:has(div:lt(2) p)",
    # the distinguishing shape: :not(:lt(big)) is FALSE at every
    # strictly-placed node but TRUE at el == subject (kernel: el != root
    # fails, so :lt dies and :not holds) — only the at-subject variant
    # branches catch these matches
    "div:has(div:not(:lt(99)) p)",
    "section:has(* section:not(:lt(99)) p)",
    "div:has(div:not(:lt(99)) > p)",
    "div:has(p:not(:lt(2)))",
    "div:has(div:lt(2) > p)",         # pure child chain -> _has_spine route
    "body:has(div:lt(1) > div > p)",
    "div:has(div:not(:lt(99)) > div > p)",
    "div:has(section:lt(2) > div p)",     # mixed spine
    "section:has(div:lt(3) section p)",
    "div:has(div:lt(2) section p)",       # subject-capable :lt level
    "section:has(* section:lt(9) p)",     # :lt dies at the subject branch
    "div:has(> div:lt(2) p)",         # pinned chain: strictly inside
    "div:has(> p:lt(3))",
    "div:has(p:lt(2) + span)",        # witness sibling set carrying :lt
    "div:has(em ~ span:lt(5))",
    "div:has(p:lt(2), > span)",       # Or inner branches
    "div:not(:has(div:not(:lt(99)) p))",
    "div:not(:has(div:lt(2) p))",
    "div:has(div:lt(2):has(p) p)",    # :lt level with a nested :has
    # Document subject through the at-subject eq branch: #root (node 0)
    # matches iff the chain top tests TRUE at el == ctx.root
    "*:has(*:not(:lt(99)) p)",
    "*:has(*:lt(99) p)",
    "*:has(*:not(:lt(99)) > p)",
    "*:has(*:lt(0) p)",
    # :has with a structural Or inner — union of per-branch witness sets
    "p:has(> span, > i)",
    "div:has(> span, > em)",
    "div:has(> p, > section)",
    "section:has(> div, article)",
    "div:has(p span, em)",
    "div:has(p + span, b)",
    "body:has(div > p, section article)",
    "div:not(:has(> span, > em))",
    "div:not(:has(p span, b))",
    "*:has(> p, > em)",
    "section > div:has(p, em)",
    "div:has(> p:has(span), em)",
    # non-structural Or inners carrying a nested :has — existence
    # distributes over ANY union, so these ride the per-branch path too
    "div:has(p, span:has(em))",
    "*:has(p, div:has(p))",
    "div:has(.x, p:not(:has(span)))",
    "div:has(p:has(span), span:has(b))",
    "li:has(li:nth-child(2n), #mid:not(li):has(#i1))",
]


@pytest.fixture(scope="module")
def nodes(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, html string")
    return extract.node_table_df(df).cache()


def _kernel_matches(css):
    out = set()
    for did, html in DOCS:
        d = tb.parse(html)
        remap = {}
        for new_id, (old, _) in enumerate(d.preorder(0)):
            remap[old] = new_id
        for n in sel.select(d, css):
            out.add((did, remap[n]))
    return out


@pytest.mark.parametrize("css", QUERIES)
def test_compiled_matches_kernel(spark, nodes, css):
    got = {
        (r["doc_id"], r["node_id"])
        for r in nodequery.compile_selector(nodes, css).collect()
    }
    assert got == _kernel_matches(css), css


def test_unsupported_falls_back(spark, nodes):
    with pytest.raises(nodequery.UnsupportedSelector):
        nodequery.compile_selector(nodes, "p:contains(x)")
    # subject-bounded :not chain on a :has SPINE level (not the witness)
    # — intermediate-witness branches change the walk's bound per pair
    with pytest.raises(nodequery.UnsupportedSelector):
        nodequery.compile_selector(nodes, "div:has(p:not(a b) span)")
    # :root in structural :has inners: the kernel binds it to the :has
    # subject and its meaning differs per subject KIND — kernel fallback
    with pytest.raises(nodequery.UnsupportedSelector):
        nodequery.compile_selector(nodes, "div:has(:root p)")
    # :lt now compiles in pred positions (per-branch variants), but stays
    # a fallback where a SET-tested node can be the subject: a spine
    # level's anti set, or a sibling set on an outer spine level
    with pytest.raises(nodequery.UnsupportedSelector):
        nodequery.compile_selector(
            nodes, "div:has(div:not(span:lt(1) + div) p)")
    with pytest.raises(nodequery.UnsupportedSelector):
        nodequery.compile_selector(
            nodes, "div:has(em:lt(2) + div section p)")
    # :matchText without the match_text rewrite — kernel fallback
    with pytest.raises(nodequery.UnsupportedSelector):
        nodequery.compile_selector(nodes, "p:matchText")


def test_sibling_of_root_has_compiles_to_never_match(spark, nodes):
    # the kernel's Has loop only visits descendants, so ':has(~ p)' /
    # ':has(+ p)' never match — the compiled form returns the same empty
    # set (and the kernel agrees on docs where such siblings DO exist)
    for css in ("div:has(~ p)", "div:has(+ p)", "p:has(~ span)",
                "li:has(+ li)"):
        assert _kernel_matches(css) == set(), css
        assert nodequery.compile_selector(nodes, css).count() == 0, css


def test_structural_has_plan_is_jvm_only(spark, nodes):
    for css in ("div:has(div p)", "div:has(> p)", "div:has(span > p)",
                "div:has(p + span)", "div:has(p ~ span)"):
        plan = nodequery.compile_selector(nodes, css) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, css
        assert "BatchEvalPython" not in plan, css
        assert "LeftSemi" in plan, css
        assert "CartesianProduct" not in plan, css


def test_compiled_plan_is_jvm_only(spark, nodes):
    plan = nodequery.compile_selector(nodes, "div > p")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_counted_positional_plan_is_jvm_window(spark, nodes):
    # nth-last/of-type/only/empty ride JVM window aggregates / joins —
    # never a Python eval node, never a cartesian
    for css in ("p:last-child", "p:nth-of-type(2)", "p:only-child",
                "div:empty", "span:nth-last-of-type(1)", ":root"):
        plan = nodequery.compile_selector(nodes, css) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, css
        assert "BatchEvalPython" not in plan, css
        assert "CartesianProduct" not in plan, css
    # the window is only paid when the query needs it
    plain = nodequery.compile_selector(nodes, "div > p") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plain


def test_multilevel_has_plan_is_jvm_only(spark, nodes):
    for css in ("div:has(div section p)", "section:has(div section p)"):
        plan = nodequery.compile_selector(nodes, css) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, css
        assert "BatchEvalPython" not in plan, css
        assert "CartesianProduct" not in plan, css
        assert "LeftSemi" in plan, css


def test_has_plan_is_jvm_semi_join(spark, nodes):
    plan = nodequery.compile_selector(nodes, "div:has(p)") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


# -- :contains over the opt-in elem_text column -------------------------------

CONTAINS_QUERIES = [
    ":contains(one)",
    "p:contains(one)",
    "div:contains(two)",
    "p:contains(ONE)",           # case-insensitive
    "div:has(p:contains(three))",
    "div:contains(one) > p",
    "li:not(:contains(2))",
    "p:contains(the title), span",
    # :matches over elem_text (rlike) — compiled since round 5
    "p:matches(^one$)",
    "p:matches((?i)ONE)",
    "p:matches(\\w+)",
    "div:matches(one two)",
    "li:matches([0-9])",
    "div:has(p:matches(thr))",
    "p:not(:matches(e))",
    # :not(:has(sel)) — anti-join on the witness keys (round 5)
    "div:not(:has(p))",
    "div:not(:has(span))",
    "*:not(:has(p))",
    "div:not(:has(div p))",
    "section:not(:has(> p))",
    "div:not(:has(p)) > p",
    "ul:not(:has(li + li))",
    "div:not(:has(p)):has(span)",
    # own/whole/data text views — compiled since round 5
    "p:containsOwn(one)",
    "p:containsOwn(a)",
    "p:matchesOwn(^one$)",
    "p:matchesOwn((?i)ONE)",
    "div:containsOwn(c)",
    "pre:containsWholeText(keep   space)",
    "pre:matchesWholeText(keep\\s+space)",
    "p:matchesWholeText(^\\s+$)",
    "p:containsWholeOwnText(a\nb )",
    "p:matchesWholeOwnText(a\\nb)",
    "script:containsData(var q)",
    "style:containsData(color:red)",
    "div:has(p:matchesOwn(e)):not(:has(section))",
]


@pytest.fixture(scope="module")
def nodes_text(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, html string")
    return extract.node_table_df(
        df, text_columns=("text", "own", "whole", "whole_own", "data")
    ).cache()


@pytest.mark.parametrize("css", CONTAINS_QUERIES)
def test_contains_compiled_matches_kernel(spark, nodes_text, css):
    got = {
        (r["doc_id"], r["node_id"])
        for r in nodequery.compile_selector(nodes_text, css).collect()
    }
    assert got == _kernel_matches(css), css


@pytest.mark.parametrize("css", QUERIES)
def test_elem_text_table_matches_kernel_on_base_queries(spark, nodes_text, css):
    got = {
        (r["doc_id"], r["node_id"])
        for r in nodequery.compile_selector(nodes_text, css).collect()
    }
    assert got == _kernel_matches(css), css


def test_contains_plan_is_jvm_only(spark, nodes_text):
    plan = nodequery.compile_selector(nodes_text, "p:contains(one)") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_contains_without_elem_text_still_falls_back(spark, nodes):
    with pytest.raises(nodequery.UnsupportedSelector):
        nodequery.compile_selector(nodes, "p:contains(x)")


# -- :matchText over the opt-in match_text rewrite ----------------------------

MATCHTEXT_QUERIES = [
    "p:matchText",
    "div:matchText",
    "*:matchText",
    "li:matchText",
    "td:matchText",
    "pre:matchText",
    # positional/counted pseudos see the REWRITTEN sibling structure
    "p:matchText:first-child",
    "p:matchText:last-child",
    "div:matchText:nth-child(2)",
    "p:matchText:only-child",
    # combinators over pseudo rows (pseudo p elements are children of p)
    "p > p:matchText",
    "div p:matchText",
    "span ~ p:matchText",
    "li:matchText + li:matchText",
    # :has with a pseudo witness; non-matchText selectors still evaluate
    # against the rewritten tree (the reference's own mutating semantics)
    "div:has(p:matchText)",
    "p:not(:matchText)",
]


@pytest.fixture(scope="module")
def nodes_mt(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, html string")
    return extract.node_table_df(
        df, text_columns=("text", "own", "whole", "whole_own", "data"),
        match_text=True,
    ).cache()


def _kernel_matches_mt(css):
    """Kernel truth over the prepare_match_text-rewritten tree (the
    reference mutates the document on the first :matchText evaluation)."""
    out = set()
    for did, html in DOCS:
        d = tb.parse(html)
        sel.prepare_match_text(d)
        remap = {}
        for new_id, (old, _) in enumerate(d.preorder(0)):
            remap[old] = new_id
        for n in sel.select(d, css):
            out.add((did, remap[n]))
    return out


@pytest.mark.parametrize("css", MATCHTEXT_QUERIES)
def test_matchtext_compiled_matches_kernel(spark, nodes_mt, css):
    got = {
        (r["doc_id"], r["node_id"])
        for r in nodequery.compile_selector(nodes_mt, css).collect()
    }
    assert got == _kernel_matches_mt(css), css


def test_matchtext_plan_is_jvm_only(spark, nodes_mt):
    plan = nodequery.compile_selector(nodes_mt, "p:matchText:last-child") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# -- mixed-spine fuzz: random trees x random :has inners ----------------------

def _gen_fuzz_docs_and_queries():
    """Fixed-seed random corpus + mixed :has selectors (descendant/child/
    sibling links in one inner).  Every generated shape must compile —
    the spine builder covers the full  [compound (' '|' > '|' + '|' ~ ')]*
    grammar — and must agree with the kernel."""
    import random
    rng = random.Random(97)
    tags = ["a", "b", "c", "d", "p", "span", "em", "section", "div"]

    def tree(depth, breadth):
        tag = rng.choice(tags)
        cls = f' class="x{rng.randint(0, 2)}"' if rng.random() < 0.4 else ""
        if depth == 0:
            return f"<{tag}{cls}>t</{tag}>"
        kids = "".join(tree(rng.randint(0, depth - 1), breadth)
                       for _ in range(rng.randint(1, breadth)))
        return f"<{tag}{cls}>{kids}</{tag}>"

    docs = [(f"f{i}", "".join(tree(rng.randint(2, 4), 3)
                              for _ in range(rng.randint(1, 3))))
            for i in range(10)]

    def compound(depth=0):
        t = rng.choice(tags + ["*"])
        if rng.random() < 0.3:
            t += f".x{rng.randint(0, 2)}"
        if depth < 2:
            r = rng.random()
            if r < 0.15:
                t += f":has({compound(depth + 1)})"
            elif r < 0.22:
                t += f":not(:has({compound(depth + 1)}))"
        return t

    queries = []
    for _ in range(60):
        n = rng.randint(2, 4)
        parts = [compound()]
        for _ in range(n - 1):
            parts.append(rng.choice([" ", " > "]))
            parts.append(compound())
        # swap up to two combinators for sibling links (adjacent swaps
        # produce sibling-of-sibling chains)
        for _ in range(2):
            if rng.random() < 0.4:
                parts[rng.randrange(1, len(parts), 2)] = \
                    rng.choice([" + ", " ~ "])
        inner = "".join(parts)
        if rng.random() < 0.3:
            inner = "> " + inner  # rooted run -> the _RootPin spine form
        css = f"{compound()}:has({inner})"
        if rng.random() < 0.25:
            css = f"{compound()}:not(:has({inner}))"
        queries.append(css)
    return docs, queries


_FUZZ_DOCS, _FUZZ_QUERIES = _gen_fuzz_docs_and_queries()


@pytest.fixture(scope="module")
def fuzz_nodes(spark):
    df = spark.createDataFrame(_FUZZ_DOCS, "doc_id string, html string")
    return extract.node_table_df(df).cache()


def _fuzz_kernel_matches(css):
    out = set()
    for did, html in _FUZZ_DOCS:
        d = tb.parse(html)
        remap = {old: new for new, (old, _) in enumerate(d.preorder(0))}
        for n in sel.select(d, css):
            out.add((did, remap[n]))
    return out


@pytest.mark.parametrize("css", _FUZZ_QUERIES)
def test_mixed_spine_fuzz_matches_kernel(spark, fuzz_nodes, css):
    got = {
        (r["doc_id"], r["node_id"])
        for r in nodequery.compile_selector(fuzz_nodes, css).collect()
    }
    assert got == _fuzz_kernel_matches(css), css


def _gen_bounded_not_queries():
    """Fixed-seed :has witnesses carrying subject-BOUNDED :not/:is
    descendant chains — the pair-aware anti/semi path
    (_bounded_pair_sets).  Every shape must compile and agree with the
    kernel, which binds the chain's Ancestor walks to the :has subject."""
    import random
    rng = random.Random(151)
    tags = ["a", "b", "c", "d", "p", "span", "em", "section", "div"]

    def comp():
        t = rng.choice(tags + ["*"])
        if rng.random() < 0.25:
            t += f".x{rng.randint(0, 2)}"
        return t

    queries = []
    for _ in range(40):
        n = rng.randint(2, 4)
        parts = [comp()]
        for _ in range(n - 1):
            # descendant links keep the chain subject-bounded; sprinkle
            # child links (unbounded in the kernel's IPR walk) to cross
            # the two regimes inside one chain
            parts.append(" > " if rng.random() < 0.3 else " ")
            parts.append(comp())
        chain = "".join(parts)
        if " " not in chain:
            chain = comp() + " " + chain  # ensure at least one anc link
        pseudo = ":is" if rng.random() < 0.25 else ":not"
        css = f"{comp()}:has({comp()}{pseudo}({chain}))"
        if rng.random() < 0.2:
            css = f"{comp()}:not(:has({comp()}:not({chain})))"
        queries.append(css)
    return queries


@pytest.mark.parametrize("css", _gen_bounded_not_queries())
def test_bounded_not_fuzz_matches_kernel(spark, fuzz_nodes, css):
    got = {
        (r["doc_id"], r["node_id"])
        for r in nodequery.compile_selector(fuzz_nodes, css).collect()
    }
    assert got == _fuzz_kernel_matches(css), css


def test_mixed_spine_plan_is_jvm_only(spark, nodes):
    for css in ("div:has(a > b c)", "body:has(div > p span)",
                "div:has(div p + span)", "div:has(p ~ em span)",
                "div:has(p:not(a div p))", "div:has(p:is(section p))"):
        plan = nodequery.compile_selector(nodes, css) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, css
        assert "BatchEvalPython" not in plan, css
        assert "CartesianProduct" not in plan, css
        assert "LeftSemi" in plan, css
