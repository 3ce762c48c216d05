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
    nodes = extract.node_table_df(
        df, text_columns=("text", "own", "whole", "whole_own", "data")
    ).cache()
    nodes.count()
    by_query = defaultdict(list)
    for i, c in enumerate(_SEL_EQ_CASES):
        by_query[c[2]].append(i)
    out = {}
    for query, idxs in by_query.items():
        try:
            m = nodequery.compile_selector(nodes, query)
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
    return out


def test_compiled_sweep_covers_most_cases(compiled):
    supported = sum(1 for v in compiled.values() if v is not None)
    # with the text-view columns, only :matchText shapes stay kernel-only
    assert supported >= len(_SEL_EQ_CASES) * 0.9, (
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
