"""Seeded random-selector differential fuzz: every generated selector the
CSS compiler accepts must return exactly the kernel's (doc_id, node_id)
set over the adversarial doc corpus.

The hand-written differential (test_nodequery.py) pins ~200 curated
shapes; this module walks the compiler's grammar randomly (fixed seed —
deterministic, reproducible failures) to catch interaction bugs between
features the curated list never combines: positional pseudos under
:has spines, :not chains beside text pseudos, comma unions of sibling
runs, etc.  Selectors the compiler rejects (UnsupportedSelector) are
skipped — the kernel fallback covers them in production — but the run
asserts a compile-rate floor so grammar drift can't quietly hollow the
test out.
"""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ksoup_spark.kernel import selector as sel  # noqa: E402
from ksoup_spark.kernel import treebuilder as tb  # noqa: E402
from ksoup_spark.operators import extract, nodequery  # noqa: E402

from test_nodequery import DOCS  # noqa: E402

SEED = 20260818
N_SELECTORS = 220
MIN_COMPILE_RATE = 0.45  # floor: the fuzz must actually exercise the compiler

TAGS = ["p", "div", "span", "li", "em", "section", "article", "ul", "b",
        "pre", "td", "*"]
CLASSES = ["x", "y", "z", "X"]
IDS = ["a", "p1", "l2", "q1", "o1", "i1", "m", "solo", "top", "mid", "ix"]
ATTRS = ["data-k", "title", "class", "id"]
ATTR_OPS = ["", "=", "^=", "$=", "*=", "~="]
ATTR_VALS = ["v", "the", "x", "a", "1", "itle"]
NTH_ARGS = ["1", "2", "3", "odd", "even", "2n", "2n+1", "3n+1", "-n+2",
            "3n-1"]
WORDS = ["one", "two", "three", "deep", "top", "bold", "tail", "keep",
         "space", "a", "b", "c", "1", "2"]
REGEXES = ["[a-z]+", "\\d", "^t", "e{2}", "o.e", "(?i)DEEP"]
POS_PSEUDOS = [":first-child", ":last-child", ":only-child", ":empty",
               ":first-of-type", ":last-of-type", ":only-of-type"]
TEXT_PSEUDOS = [":contains(%w)", ":containsOwn(%w)",
                ":containsWholeText(%w)", ":containsWholeOwnText(%w)",
                ":matches(%r)", ":matchesOwn(%r)"]
LINKS = [" ", " > ", " + ", " ~ "]


def _simple(rng):
    r = rng.random()
    if r < 0.45:
        return rng.choice(TAGS)
    if r < 0.6:
        return "." + rng.choice(CLASSES)
    if r < 0.7:
        return "#" + rng.choice(IDS)
    a = rng.choice(ATTRS)
    op = rng.choice(ATTR_OPS)
    if not op:
        return f"[{a}]"
    return f"[{a}{op}{rng.choice(ATTR_VALS)}]"


def _pseudo(rng, depth):
    r = rng.random()
    if r < 0.3:
        return rng.choice(POS_PSEUDOS)
    if r < 0.45:
        kind = rng.choice([":nth-child", ":nth-last-child", ":nth-of-type",
                           ":nth-last-of-type"])
        return f"{kind}({rng.choice(NTH_ARGS)})"
    if r < 0.55:
        return rng.choice([":lt", ":gt", ":eq"]) + f"({rng.randrange(4)})"
    if r < 0.7:
        t = rng.choice(TEXT_PSEUDOS)
        return (t.replace("%w", rng.choice(WORDS))
                 .replace("%r", rng.choice(REGEXES)))
    if depth <= 0:
        return rng.choice(POS_PSEUDOS)
    if r < 0.85:
        inner = (_compound(rng, depth - 1) if rng.random() < 0.5
                 else _chain(rng, depth - 1, max_units=2))
        return f":not({inner})"
    inner = _chain(rng, depth - 1, max_units=2)
    if rng.random() < 0.25:
        inner = "> " + inner
    if rng.random() < 0.2:
        # structural-Or inner (':has(> span, > i)'): union of per-branch
        # witness sets — round 5
        other = _chain(rng, depth - 1, max_units=2)
        if rng.random() < 0.5:
            other = "> " + other
        inner = f"{inner}, {other}"
    return f":has({inner})"


def _compound(rng, depth):
    out = _simple(rng)
    while rng.random() < 0.4:
        p = _pseudo(rng, depth)
        # tag must lead; pseudos/classes append
        out += p if p.startswith(":") else ""
        if not p.startswith(":"):
            break
        if len(out) > 60:
            break
    return out


def _chain(rng, depth, max_units=3):
    n = rng.randrange(1, max_units + 1)
    parts = [_compound(rng, depth)]
    for _ in range(n - 1):
        parts.append(rng.choice(LINKS))
        parts.append(_compound(rng, depth))
    return "".join(parts)


def _selector(rng):
    s = _chain(rng, depth=2)
    if rng.random() < 0.1:
        # root-anchored run: ctx.root = Document at the corpus level
        s = "> " + s
    if rng.random() < 0.15:
        tail = _chain(rng, depth=1, max_units=2)
        if rng.random() < 0.1:
            tail = "> " + tail
        s += ", " + tail
    return s


def _kernel_matches(css):
    out = set()
    for did, html in DOCS:
        d = tb.parse(html)
        remap = {nid: i for i, (nid, _) in enumerate(d.preorder(0))}
        for n in sel.select(d, css):
            out.add((did, remap[n]))
    return out


@pytest.fixture(scope="module")
def nodes(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, html string")
    t = extract.node_table_df(
        df, text_columns=("text", "own", "whole", "whole_own", "data"))
    t = t.cache()
    t.count()
    return t


def test_random_selectors_match_kernel(spark, nodes):
    rng = random.Random(SEED)
    seen = set()
    while len(seen) < N_SELECTORS:
        seen.add(_selector(rng))
    compiled = skipped = 0
    mismatches = []
    for css in sorted(seen):
        try:
            want = _kernel_matches(css)
        except Exception:
            # the generator emitted something the kernel grammar rejects;
            # the compiler must reject it too (never invent semantics)
            with pytest.raises(Exception):
                nodequery.compile_selector(nodes, css).collect()
            continue
        try:
            cdf = nodequery.compile_selector(nodes, css)
        except nodequery.UnsupportedSelector:
            skipped += 1
            continue
        compiled += 1
        got = {(r["doc_id"], r["node_id"])
               for r in cdf.select("doc_id", "node_id").collect()}
        if got != want:
            mismatches.append(
                (css, sorted(want - got)[:5], sorted(got - want)[:5]))
    assert not mismatches, mismatches
    total = compiled + skipped
    assert compiled / max(total, 1) >= MIN_COMPILE_RATE, (
        f"compile rate collapsed: {compiled}/{total}")
