"""Mechanical parity sweep against the reference's OWN test sources.

Extracts every single-parse, non-mutating ``assertEquals(expected,
doc.body().html())`` / ``doc.text()`` assertion from the reference test
files (read-only fixtures) and replays it through our kernel. This guards
~50 reference goldens wholesale — any fidelity regression in the
tokenizer/tree/serializer surfaces as a sweep failure naming the reference
test. Skipped when the reference checkout is absent.
"""

from __future__ import annotations

import pathlib
import re

import pytest

from ksoup_spark.kernel import treebuilder as tb
from ksoup_spark.kernel.serialize import inner_html
from ksoup_spark.kernel.textops import element_text

_REF = pathlib.Path("/root/reference/ksoup-test/test/com/fleeksoft/ksoup")
_FILES = [
    "parser/HtmlParserTest.kt",
    "nodes/ElementTest.kt",
    "nodes/TextNodeTest.kt",
    "nodes/DocumentTest.kt",
    "nodes/NodeTest.kt",
]
_KSTR = r'"((?:[^"\\\n]|\\.)*)"'
# tests that mutate the DOM between parse and assert are out of scope here
_MUTATING = re.compile(
    r'\.(append|prepend|before|after|wrap|remove|attr\(\s*"[^"]+"\s*,'
    r'|addClass|removeClass|toggleClass|html\(\s*"|text\(\s*"'
    r'|insertChildren|replaceWith|unwrap|empty\(\)|clearAttributes'
    r'|removeAttr|forEach|filter|val\(|tagName\()'
)
# known divergences: OutputSettings API (escape mode / charset objects) not
# modeled by the plain body().html() replay
_EXCLUDED = {
    "relaxedBaseEntityMatchAndStrictExtendedMatch",
    "xmlSyntaxSetsEscapeMode",
    "testXhtmlReferences",
    "parseBodyIsIndexNoAttributes",  # multi-assert pairing ambiguity
}


def _unkotlin(s: str) -> str:
    return s.encode().decode("unicode_escape")


def _norm(s: str) -> str:
    s = re.sub(r"\s+<", "<", s)
    s = re.sub(r">\s+", ">", s)
    return re.sub(r"\s+", " ", s).strip()


def _extract_cases():
    cases = []
    for rel in _FILES:
        path = _REF / rel
        if not path.exists():
            continue
        src = path.read_text()
        for t in re.split(r"@Test\s*\n\s*fun ", src)[1:]:
            name = t.split("(", 1)[0]
            if name in _EXCLUDED or _MUTATING.search(t):
                continue
            if len(re.findall(r"Ksoup\.parse\(", t)) != 1:
                continue
            vars_ = dict(re.findall(r"val (\w+)(?::\s*String)? = " + _KSTR, t))
            mp = re.search(r"Ksoup\.parse\(\s*" + _KSTR + r"\s*[,)]", t)
            if mp:
                html = _unkotlin(mp.group(1))
            else:
                mv = re.search(r"Ksoup\.parse\((\w+)\s*[,)]", t)
                if not (mv and mv.group(1) in vars_):
                    continue
                html = _unkotlin(vars_[mv.group(1)])
            me = re.search(
                r"assertEquals\(\s*\n?\s*" + _KSTR +
                r"\s*,\s*\n?\s*(?:TextUtil\.stripNewlines\()?doc\.body\(\)\.html\(\)",
                t)
            mt = re.search(
                r"assertEquals\(\s*\n?\s*" + _KSTR +
                r"\s*,\s*\n?\s*doc\.text\(\)", t)
            if me:
                cases.append((f"{rel}:{name}:bodyhtml", html,
                              _unkotlin(me.group(1)), "body"))
            if mt:
                cases.append((f"{rel}:{name}:text", html,
                              _unkotlin(mt.group(1)), "text"))
    return cases


_CASES = _extract_cases()


@pytest.mark.skipif(not _CASES, reason="reference checkout not available")
def test_reference_sweep_counts():
    # the corpus should stay substantial; shrinkage means extraction broke
    assert len(_CASES) >= 40


@pytest.mark.parametrize("name,html,want,kind", _CASES,
                         ids=[c[0] for c in _CASES])
def test_reference_sweep(name, html, want, kind):
    d = tb.parse(html)
    if kind == "body":
        b = d.body()
        got = inner_html(d, b if b != -1 else 0, pretty=True)
        assert _norm(got) == _norm(want)
    else:
        assert element_text(d, 0) == want


# -- selector sweep: assertSelectedIds replays -------------------------------

def _extract_selector_cases():
    path = _REF / "select/SelectorTest.kt"
    if not path.exists():
        return []
    src = path.read_text()
    cases = []
    for t in re.split(r"@Test\s*\n\s*fun ", src)[1:]:
        name = t.split("(", 1)[0]
        vars_ = dict(re.findall(r"val (\w+)(?::\s*String)? = " + _KSTR, t))
        n_parse = len(re.findall(r"Ksoup\.parse\(", t))
        if n_parse != 1:
            # also allow the inline parse(...).select(...) form repeated N
            # times with literal args — handled below per statement
            pass
        # statement form: val X = Ksoup.parse("H").select("Q") ... asserts
        env = {}
        for m in re.finditer(
            r"val (\w+)(?::\s*Elements)? =\s*\n?\s*Ksoup\.parse\(\s*" + _KSTR +
            r"\s*\)\s*\.select\(\s*" + _KSTR + r"\s*\)"
            r"|val (\w+)(?::\s*Elements)? =\s*\n?\s*(?:doc|document)\.select\(\s*"
            + _KSTR + r"\s*\)"
            r"|assertSelectedIds\(\s*(\w+)\s*((?:,\s*\"(?:[^\"\\\n]|\\.)*\"\s*)*)\)",
            t):
            if m.group(1):
                env[m.group(1)] = (_unkotlin(m.group(2)), _unkotlin(m.group(3)))
            elif m.group(4):
                if n_parse == 1:
                    mp = re.search(r"Ksoup\.parse\(\s*" + _KSTR + r"\s*[,)]", t)
                    html = _unkotlin(mp.group(1)) if mp else vars_.get(
                        (re.search(r"Ksoup\.parse\((\w+)", t) or [None, ""])[1])
                    if html:
                        env[m.group(4)] = (html if mp else _unkotlin(html),
                                           _unkotlin(m.group(5)))
            elif m.group(6) and m.group(6) in env:
                html, query = env.pop(m.group(6))
                want = [_unkotlin(i) for i in re.findall(_KSTR, m.group(7) or "")]
                cases.append((f"{name}:{query}", html, query, want))
    return cases


_SEL_CASES = _extract_selector_cases()


@pytest.mark.skipif(not _SEL_CASES, reason="reference checkout not available")
def test_selector_sweep_count():
    assert len(_SEL_CASES) >= 8


@pytest.mark.parametrize("name,html,query,want", _SEL_CASES,
                         ids=[c[0] for c in _SEL_CASES])
def test_selector_sweep(name, html, query, want):
    from ksoup_spark.kernel import selector as S

    d = tb.parse(html)
    got = [d.get_attr(n, "id") or "" for n in S.select(d, query)]
    assert got == want
