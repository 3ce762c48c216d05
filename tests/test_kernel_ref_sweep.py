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
    # round 5: every other suite with single-parse body/text replays.
    # (There is no FormElementTest.kt in this checkout — FormElement
    # assertions live in HtmlParserTest.kt, already swept; its non-replay
    # surface is ported by hand in test_kernel_dataset.py / test_spark_ops.)
    "parser/ParserTest.kt",
    "parser/HtmlTreeBuilderTest.kt",
    "parser/AttributeParseTest.kt",
    "parser/TagTest.kt",
    "nodes/CommentTest.kt",
    "nodes/DataNodeTest.kt",
    "nodes/DocumentTypeTest.kt",
    "nodes/LeafNodeTest.kt",
    "nodes/AttributeTest.kt",
    "select/ElementsTest.kt",
    "select/TraversorTest.kt",
    "safety/CleanerTest.kt",
]
# NOTE: the round-5 additions yield no extra body/text replays — those
# suites assert through mutations (covered by the hand-ports in
# test_kernel_mutate_ref.py / test_kernel_dataset.py) or helper functions
# the mechanical harvest can't pair. Kept listed so future upstream test
# additions in the replayable shape are picked up automatically.
_KSTR = r'"((?:[^"\\\n]|\\.)*)"'
# tests that mutate the DOM between parse and assert are out of scope here
_MUTATING = re.compile(
    r'\.(append|prepend|before|after|wrap|remove|attr\(\s*"[^"]+"\s*,'
    r'|addClass|removeClass|toggleClass|html\(\s*"|text\(\s*"'
    r'|insertChildren|replaceWith|unwrap|empty\(\)|clearAttributes'
    r'|removeAttr|forEach|filter|val\(|tagName\(\s*"|clear\(\)'
    r'|removeAll\(|retainAll\()'
)
# known divergences: OutputSettings API (escape mode / charset objects) not
# modeled by the plain body().html() replay
_EXCLUDED = {
    "relaxedBaseEntityMatchAndStrictExtendedMatch",
    "xmlSyntaxSetsEscapeMode",
    "testXhtmlReferences",
    "parseBodyIsIndexNoAttributes",  # multi-assert pairing ambiguity
}


_K_ESC = re.compile(r"\\u([0-9a-fA-F]{4})|\\(.)")
_K_SIMPLE = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
             "0": "\0"}


def _unkotlin(s: str) -> str:
    """Decode Kotlin string-literal escapes: \\uXXXX (with surrogate pairs
    recombined, as Kotlin/JVM strings do), simple escapes, and pass
    literal UTF-8 characters through untouched (the old unicode_escape
    round-trip mangled them to latin-1 mojibake)."""
    def sub(m):
        if m.group(1):
            return chr(int(m.group(1), 16))
        c = m.group(2)
        return _K_SIMPLE.get(c, c)

    s = _K_ESC.sub(sub, s)
    return s.encode("utf-16", "surrogatepass").decode("utf-16")


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
            r"|assertSelected(Ids|OwnText)\(\s*(\w+)\s*"
            r"((?:,\s*\"(?:[^\"\\\n]|\\.)*\"\s*)*)\)",
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
            elif m.group(7) and m.group(7) in env:
                html, query = env.pop(m.group(7))
                want = [_unkotlin(i) for i in re.findall(_KSTR, m.group(8) or "")]
                kind = "ids" if m.group(6) == "Ids" else "owntext"
                cases.append((f"{name}:{kind}:{query}", html, query, want,
                              kind))
    return cases


_SEL_CASES = _extract_selector_cases()


@pytest.mark.skipif(not _SEL_CASES, reason="reference checkout not available")
def test_selector_sweep_count():
    assert len(_SEL_CASES) >= 8


@pytest.mark.parametrize("name,html,query,want,kind", _SEL_CASES,
                         ids=[c[0] for c in _SEL_CASES])
def test_selector_sweep(name, html, query, want, kind):
    from ksoup_spark.kernel import selector as S
    from ksoup_spark.kernel.textops import own_text

    d = tb.parse(html)
    if kind == "ids":
        got = [d.get_attr(n, "id") or "" for n in S.select(d, query)]
    else:  # assertSelectedOwnText (SelectorTest.kt:1290-1299)
        got = [own_text(d, n) for n in S.select(d, query)]
    assert got == want


# -- select-result sweep: SelectorTest.kt size/text/attr assertions -----------
#
# The dominant SelectorTest shape (343 assertEquals) is
#   val els = doc.select("Q")
#   assertEquals(N, els.size) / ("T", els.text()) / ("V", els.first()!!.attr(k))
# Harvest every such assertion from single-literal-parse, non-mutating tests
# and replay through our selector. Elements.text() is joinToString(" ") over
# per-element text (select/Elements.kt:201-203).

_SEL_EQ_STR = r'"((?:[^"\\\n]|\\.)*)"'


_SEL_EQ_FILES = [
    "select/SelectorTest.kt",
    # round 5: the same size/text/attr shapes appear across these suites
    "select/CssTest.kt",
    "select/ElementsTest.kt",
    "parser/HtmlParserTest.kt",
    "parser/HtmlTreeBuilderTest.kt",
    "parser/ParserTest.kt",
    "nodes/ElementTest.kt",
]


def _extract_select_eq_cases():
    cases = []
    for rel in _SEL_EQ_FILES:
        path = _REF / rel
        if path.exists():
            cases.extend(_extract_select_eq_file(rel, path))
    return cases


def _extract_select_eq_file(rel, path):
    src = path.read_text()
    cases = []
    for t in re.split(r"@Test\s*\n\s*fun ", src)[1:]:
        name = f"{rel}:{t.split('(', 1)[0]}"
        if _MUTATING.search(t):
            continue
        if len(re.findall(r"Ksoup\.parse\(", t)) != 1:
            continue
        vars_ = dict(re.findall(r"val (\w+)(?::\s*String)? = " + _KSTR, t))
        # raw-string vals: Kotlin """...""" has NO escapes — keep verbatim
        raw_vars = dict(
            (m.group(1), m.group(2)) for m in re.finditer(
                r'val (\w+)(?::\s*String)? =\s*\n?\s*"""(.*?)"""',
                t, re.DOTALL))
        mraw = re.search(r'Ksoup\.parse\(\s*"""(.*?)"""', t, re.DOTALL)
        mp = re.search(r"Ksoup\.parse\(\s*" + _KSTR + r"\s*[,)]", t)
        if mraw:
            html = mraw.group(1)
        elif mp:
            html = _unkotlin(mp.group(1))
        else:
            mv = re.search(r"Ksoup\.parse\((\w+)\s*[,)]", t)
            if not mv:
                continue
            if mv.group(1) in raw_vars:
                html = raw_vars[mv.group(1)]
            elif mv.group(1) in vars_:
                html = _unkotlin(vars_[mv.group(1)])
            else:
                continue
        # bind select-result vars: val X = doc.select("Q") — the statement
        # must END there (a trailing .eachText()/[1]/.first() binds X to a
        # derived value, not the Elements)
        sel_vars = dict(
            (m.group(1), _unkotlin(m.group(2)))
            for m in re.finditer(
                r"val (\w+)(?::\s*Elements)? =\s*\n?\s*(?:doc|document)"
                r"\.select\(\s*" + _KSTR + r"\s*\)(?!\s*[.\[!])", t))

        def _emit(query, op, arg, want, i):
            cases.append((f"{name}:{i}:{op}:{query}", html, query, op, arg,
                          want))

        i = 0
        for m in re.finditer(
            r"assertEquals\(\s*\n?\s*(?:(\d+)|" + _SEL_EQ_STR + r")\s*,"
            r"\s*\n?\s*(\w+)"
            r"(?:\.size|\.text\(\)"
            r"|\.(first|last)\(\)!!\.(?:attr\(\s*" + _SEL_EQ_STR +
            r"\s*\)|(id|tagName)\(\)))",
            t,
        ):
            n_want, s_want, var, fl, attr_key, idtag = m.groups()
            # inline form: doc.select("Q").size — var is not a select var
            if var in ("doc", "document"):
                continue
            if var not in sel_vars:
                continue
            query = sel_vars[var]
            whole = m.group(0)
            i += 1
            if whole.endswith(".size") and n_want is not None:
                _emit(query, "size", None, int(n_want), i)
            elif whole.endswith(".text()") and s_want is not None:
                _emit(query, "text", None, _unkotlin(s_want), i)
            elif fl and s_want is not None:
                pick = 0 if fl == "first" else -1
                if attr_key is not None:
                    _emit(query, "attr", (pick, _unkotlin(attr_key)),
                          _unkotlin(s_want), i)
                elif idtag == "id":
                    _emit(query, "attr", (pick, "id"), _unkotlin(s_want), i)
                elif idtag == "tagName":
                    _emit(query, "tag", pick, _unkotlin(s_want), i)
        # inline size form: assertEquals(N, doc.select("Q").size)
        for m in re.finditer(
            r"assertEquals\(\s*\n?\s*(\d+)\s*,\s*\n?\s*(?:doc|document)"
            r"\.select\(\s*" + _KSTR + r"\s*\)\.size", t):
            i += 1
            _emit(_unkotlin(m.group(2)), "size", None, int(m.group(1)), i)
    return cases


_SEL_EQ_CASES = _extract_select_eq_cases()


@pytest.mark.skipif(not _SEL_EQ_CASES, reason="reference checkout not available")
def test_select_eq_sweep_count():
    assert len(_SEL_EQ_CASES) >= 100


@pytest.mark.parametrize("name,html,query,op,arg,want", _SEL_EQ_CASES,
                         ids=[c[0] for c in _SEL_EQ_CASES])
def test_select_eq_sweep(name, html, query, op, arg, want):
    from ksoup_spark.kernel import selector as S
    from ksoup_spark.kernel.textops import element_text

    d = tb.parse(html)
    got_nodes = S.select(d, query)
    if op == "size":
        assert len(got_nodes) == want
    elif op == "text":
        assert " ".join(element_text(d, n) for n in got_nodes) == want
    elif op == "attr":
        pick, key = arg
        assert got_nodes, f"empty select for {query}"
        assert (d.get_attr(got_nodes[pick], key) or "") == want
    elif op == "tag":
        assert got_nodes, f"empty select for {query}"
        assert d.tag[got_nodes[arg]] == want


# -- XML builder sweep: XmlTreeBuilderTest.kt doc.html() replays --------------

_XML_EXCLUDED = {
    # OutputSettings / charset-declaration behaviors the plain replay
    # can't pair mechanically (multi-parse or settings mutation)
    "testDetectCharsetEncodingDeclaration",
    "testParseDeclarationAttributes",
    "caseSensitiveDeclaration",
    "handlesLTinScript",
}


def _extract_xml_cases():
    path = _REF / "parser/XmlTreeBuilderTest.kt"
    if not path.exists():
        return []
    cases = []
    src = path.read_text()
    for t in re.split(r"@Test\s*\n\s*fun ", src)[1:]:
        name = t.split("(", 1)[0]
        if name in _XML_EXCLUDED or _MUTATING.search(t):
            continue
        # one xml parse per test: tb.parse(input=X) or Ksoup.parse(X, ...,
        # parser = Parser.xmlParser())
        parses = re.findall(
            r"(?:tb\.parse\(\s*input\s*=|Ksoup\.parse\()", t)
        if len(parses) != 1:
            continue
        if "xmlParser()" not in t and "tb.parse" not in t:
            continue
        vars_ = dict(re.findall(r"val (\w+)(?::\s*String)? = " + _KSTR, t))
        mp = re.search(
            r"(?:tb\.parse\(\s*input\s*=|Ksoup\.parse\()\s*" + _KSTR, t)
        if mp:
            xml = _unkotlin(mp.group(1))
        else:
            mv = re.search(
                r"(?:tb\.parse\(\s*input\s*=|Ksoup\.parse\()\s*(\w+)", t)
            if not (mv and mv.group(1) in vars_):
                continue
            xml = _unkotlin(vars_[mv.group(1)])
        me = re.search(
            r"assertEquals\(\s*\n?\s*" + _KSTR +
            r"\s*,\s*\n?\s*(?:TextUtil\.stripNewlines\()?"
            r"(?:doc|xmlDoc|document)\.(?:html|outerHtml)\(\)", t)
        if me:
            cases.append((f"XmlTreeBuilderTest.kt:{name}", xml,
                          _unkotlin(me.group(1))))
    return cases


_XML_CASES = _extract_xml_cases()


@pytest.mark.skipif(not _XML_CASES, reason="reference checkout not available")
def test_xml_sweep_count():
    # most XmlTreeBuilderTest cases assert node names/counts/settings, not
    # serialized html; the single-parse html() replays are a small set
    assert len(_XML_CASES) >= 3


@pytest.mark.parametrize("name,xml,want", _XML_CASES,
                         ids=[c[0] for c in _XML_CASES])
def test_xml_sweep(name, xml, want):
    from ksoup_spark.kernel.xml import parse_xml

    d = parse_xml(xml)
    got = inner_html(d, 0, pretty=True, xml_mode=True)
    assert _norm(got) == _norm(want)


# -- entities sweep: EntitiesTest.kt Entities.unescape replays ----------------

def _extract_unescape_cases():
    path = _REF / "nodes/EntitiesTest.kt"
    if not path.exists():
        return []
    src = path.read_text()
    cases = []
    # literal-to-literal: assertEquals("want", Entities.unescape("input"))
    for name_block in re.split(r"@Test\s*\n\s*fun ", src)[1:]:
        name = name_block.split("(", 1)[0]
        vars_ = dict(re.findall(
            r"val (\w+)(?::\s*String)? = " + _KSTR, name_block))
        for m in re.finditer(
            r"assertEquals\(\s*(?:" + _KSTR + r"|(\w+))\s*,\s*"
            r"Entities\.unescape\(\s*(?:" + _KSTR + r"|(\w+))\s*\)",
            name_block,
        ):
            want = _unkotlin(m.group(1)) if m.group(1) is not None else \
                (_unkotlin(vars_[m.group(2)]) if m.group(2) in vars_ else None)
            inp = _unkotlin(m.group(3)) if m.group(3) is not None else \
                (_unkotlin(vars_[m.group(4)]) if m.group(4) in vars_ else None)
            if want is not None and inp is not None:
                cases.append((f"EntitiesTest.kt:{name}", inp, want))
    return cases


_UNESC_CASES = _extract_unescape_cases()


@pytest.mark.skipif(not _UNESC_CASES, reason="reference checkout not available")
def test_unescape_sweep_count():
    assert len(_UNESC_CASES) >= 3


@pytest.mark.parametrize("name,inp,want", _UNESC_CASES,
                         ids=[f"{c[0]}:{i}" for i, c in enumerate(_UNESC_CASES)])
def test_unescape_sweep(name, inp, want):
    from ksoup_spark.kernel.entities import unescape

    assert unescape(inp) == want
