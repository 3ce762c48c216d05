"""Replay the reference's select-result assertions through the Catalyst
CSS compiler.

test_kernel_ref_sweep mechanically extracts size/text/attr/tag assertions
from the reference's own suites (SelectorTest, CssTest, ElementsTest, ...)
and replays them against the kernel.  This module replays the SAME cases
against operators.nodequery.compile_selector — the relational node-table
path — wherever the selector compiles.  Selectors the relational form
doesn't support (UnsupportedSelector) are skipped here: they're covered
by the kernel sweep and reach production through the kernel fallback.

One node table is built for ALL cases (one doc per case), and each
distinct selector compiles once over the whole table — the same
corpus-wide shape production uses.
"""

import os
import sys
from collections import defaultdict

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_kernel_ref_sweep import _SEL_EQ_CASES  # noqa: E402

from ksoup_spark.operators import extract, nodequery  # noqa: E402


def _get_attr(attrs, key):
    """Case-insensitive attribute get, exact key preferred (kernel
    dom.get_attr semantics)."""
    if attrs is None:
        return ""
    if key in attrs:
        return attrs[key] or ""
    lk = key.lower()
    for k, v in attrs.items():
        if k.lower() == lk:
            return v or ""
    return ""


@pytest.fixture(scope="module")
def compiled(spark):
    """case index -> ordered match rows (None = selector not compilable)."""
    if not _SEL_EQ_CASES:
        pytest.skip("reference checkout not available")
    docs = [(str(i), c[1]) for i, c in enumerate(_SEL_EQ_CASES)]
    df = spark.createDataFrame(docs, "doc_id string, html string")
    tviews = ("text", "own", "whole", "whole_own", "data")
    nodes = extract.node_table_df(df, text_columns=tviews).cache()
    nodes.count()
    # :matchText queries evaluate over the rewritten tree (the reference
    # mutates the document) — route them to a match_text node table
    mt_docs = [(str(i), c[1]) for i, c in enumerate(_SEL_EQ_CASES)
               if ":matchText" in c[2]]
    nodes_mt = None
    if mt_docs:
        df_mt = spark.createDataFrame(mt_docs, "doc_id string, html string")
        nodes_mt = extract.node_table_df(
            df_mt, text_columns=tviews, match_text=True).cache()
        nodes_mt.count()
    by_query = defaultdict(list)
    for i, c in enumerate(_SEL_EQ_CASES):
        by_query[c[2]].append(i)
    out = {}
    for query, idxs in by_query.items():
        src = nodes_mt if ":matchText" in query else nodes
        try:
            m = nodequery.compile_selector(src, query)
        except nodequery.UnsupportedSelector:
            for i in idxs:
                out[i] = None
            continue
        rows = m.select("doc_id", "node_id", "tag", "attrs",
                        "elem_text").collect()
        per = defaultdict(list)
        for r in sorted(rows, key=lambda r: (int(r["doc_id"]), r["node_id"])):
            per[int(r["doc_id"])].append(r)
        for i in idxs:
            out[i] = per.get(i, [])
    nodes.unpersist()
    if nodes_mt is not None:
        nodes_mt.unpersist()
    return out


def test_compiled_sweep_covers_most_cases(compiled):
    supported = sum(1 for v in compiled.values() if v is not None)
    # text pseudos ride the text-view columns, :matchText the match_text
    # rewrite — every sweep case compiles into the Catalyst path
    assert supported == len(_SEL_EQ_CASES), (
        f"only {supported}/{len(_SEL_EQ_CASES)} compiled")


@pytest.mark.parametrize(
    "idx", range(len(_SEL_EQ_CASES)),
    ids=[c[0] for c in _SEL_EQ_CASES])
def test_compiled_select_eq_sweep(compiled, idx):
    name, html, query, op, arg, want = _SEL_EQ_CASES[idx]
    got = compiled[idx]
    if got is None:
        pytest.skip(f"not compilable: {query}")
    if op == "size":
        assert len(got) == want, query
    elif op == "text":
        assert " ".join(r["elem_text"] for r in got) == want, query
    elif op == "attr":
        pick, key = arg
        assert got, f"empty select for {query}"
        assert _get_attr(got[pick]["attrs"], key) == want, query
    elif op == "tag":
        assert got, f"empty select for {query}"
        assert got[arg]["tag"] == want, query
