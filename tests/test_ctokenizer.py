"""C tokenizer (kernel/_ctok_src.c via kernel/ctokenizer.py): differential
parity against the pure-Python tokenizer, selection rules, and fallback.

The C module is a byte-level mirror of tokenizer.py's state machine
(reference semantics: /root/reference/ksoup/src/com/fleeksoft/ksoup/parser/
TokeniserState.kt, Tokeniser.kt). Every test here asserts EQUALITY with the
Python path, so the Python tokenizer's own reference-parity suite transfers.
"""

from __future__ import annotations

import glob
import gzip
import random

import pytest

from ksoup_spark.kernel import ctokenizer as ct
from ksoup_spark.kernel import treebuilder as tb_mod
from ksoup_spark.kernel.tokenizer import Tokenizer

HAVE_C = ct._load() is not None

pytestmark = pytest.mark.skipif(
    not HAVE_C, reason="C tokenizer unavailable (no gcc/headers)")


def _parse_with(html: str, tok_cls):
    b = tb_mod.HtmlTreeBuilder()
    b.parse_setup(html)
    b.tok = tok_cls(html)
    b.tok.track = False
    while True:
        tok = b.tok.next_token()
        b.process(tok)
        if tok[0] == "eof":
            break
    return b.doc


def _table(d):
    return (list(d.kind), list(d.tag), list(d.text),
            [a if a is None else sorted(a.items()) for a in d.attrs],
            list(d.parent), list(d.children), list(d.ns))


def _assert_same_dom(html: str):
    t_py = _table(_parse_with(html, Tokenizer))
    t_c = _table(_parse_with(html, ct.CTokenizer))
    assert t_py == t_c, f"DOM divergence for {html[:200]!r}"


def _assert_same_tokens(html: str):
    """Token-for-token equality in DATA-driven flows (no state switches)."""
    pt, c = Tokenizer(html), ct.CTokenizer(html)
    i = 0
    while True:
        a, b = pt.next_token(), c.next_token()
        assert a == b, f"token {i} diverged for {html[:120]!r}: {a!r} != {b!r}"
        if a[0] == "eof":
            return
        i += 1


TRICKY = [
    # entities: base w/o semicolon, extended needs one, attr =-_ rule,
    # numeric/hex, win-1252 remap, overflow, surrogates
    "&amp &amp; &notin &notin; &nosuch; &not=1 x",
    '<a href="?a=1&not=2&amp=3&lt;4">t</a>',
    "&#65;&#x41;&#X41;&#128;&#x80;&#xD800;&#0;&#x110000;&#99999999999999999999;&#;&#x;",
    "&aacute&aacutex&CounterClockwiseContourIntegral;&frac12&frac12;",
    # tags and attributes
    "<p>", "<p/>", "<p />", "<p a>", "<p a=>", "<p a= >", "<p a=b>",
    "<p a='b'>", '<p a="b">', "<p a=b c='d' e=\"f\" g>", "<p =x>", "<p ==>",
    "<p a =b>", "<p a= b>", "<p a\x00b=c>", "<p\x00q>", "<p a='b&amp;c'>",
    "<p a=b&gt;c>", "<p a='b<c'>", "<p a b < q>", "<p a/b>", "<p/ >",
    "<p " + " ".join(f"a{i}=v{i}" for i in range(520)) + ">x",  # 512 cap
    "<p \x01x=1 y\x02=2>", "<p a='unterminated", "<p a=unterminated",
    "<p a=\"v1\" a='v2' A=v3>dups</p>",
    # markup declarations
    "<!-- c -->", "<!--\n-->", "<!-->x", "<!--->x", "<!-- a --!> b -->",
    "<!-- unterminated", "<!x y>", "<?php ?>", "<?>", "<!", "<?",
    "<![CDATA[x]]>", "<![CDATA[ unterminated", "<![cdata[x]]>",
    "<!DOCTYPE html>", "<!doctype HTML>", "<!DOCTYPE>", "<!DOCTYPE >",
    '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" "http://x">',
    "<!DOCTYPE html SYSTEM 'about:legacy-compat'>",
    "<!DOCTYPE html PUBLIC>", "<!DOCTYPE html PUBLIC 'a' 'b' junk>",
    "<!DOCTYPE html PUBLIC 'unterminated", "<!DOCTYPE \x00na\x00me>",
    # end tags
    "a</>b", "</ x>", "</!x>", "</", "a</p attr=1>b", "x</p", "<</p>",
    # literal '<'
    "a < b", "a <1 b", "a <\x00 b", "a <", "5 < 6 and 7 > 4",
    # rcdata / rawtext / script / plaintext
    "<title>a &amp; b</title>rest",
    "<title>no end tag <div>bail</div>",
    "<title>almost</title x></title>done",
    "<textarea>a<b></textarea>c",
    "<style>p { color: red; } </style>after",
    "<style>unterminated",
    "<script>var a = '<div>';</script>x",
    "<script><!-- escaped </script> still -->past</script>q",
    "<script><!--<script>double</script>--></script>tail",
    "<script><!--<script>deep esc </script>back</script>z",
    "<script>unterminated <!-- forever",
    "<xmp><p>raw</p></xmp>done", "<iframe>raw</iframe>t",
    "<noembed>x</noembed>y", "<noframes>z</noframes>w",
    "<plaintext>everything <after> is text",
    "<title></TITLE>case</title>x", "<TITLE>up</TITLE>y",
    # NULs in every state
    "da\x00ta", "<p>\x00</p>", "<title>\x00</title>", "<style>\x00</style>",
    "<!--\x00-->", "<?b\x00gus>", "<p a='\x00'>", "<p a=\x00b>",
    # non-ASCII: tag-ish after '<'
    "a<é>b", "a<°>b", "<p>héllo wörld</p>", "<div title='日本語'>中文</div>",
    "<p>\U0001F600 emoji</p>", "a</é>b",
    # EOF edges
    "<p", "<p ", "<p a", "<p a=", "<p a='x", "<p a=\"x", "<", "</", "<!-",
    "<!d", "<!doctyp", "<!DOCTYPE html PUBLIC 'x'",
]


@pytest.mark.parametrize("case_idx", range(len(TRICKY)))
def test_token_stream_parity(case_idx):
    _assert_same_tokens(TRICKY[case_idx])


def test_dom_parity_tricky():
    for html in TRICKY:
        _assert_same_dom(html)


def test_dom_parity_reference_fuzz_corpus():
    """All 36 reference crash corpora parse to identical node tables."""
    files = sorted(glob.glob(
        "/root/reference/ksoup-test/testResources/fuzztests/*.html.gz"))
    if not files:
        pytest.skip("reference fuzz corpus not available")
    for f in files:
        raw = open(f, "rb").read()
        try:
            data = gzip.decompress(raw)
        except OSError:
            data = raw
        _assert_same_dom(data.decode("utf-8", errors="replace"))


def test_dom_parity_anchor_page():
    path = "/root/reference/ksoup-test/testResources/test.txt"
    try:
        html = open(path, encoding="utf-8").read()
    except OSError:
        pytest.skip("reference benchmark page not available")
    _assert_same_dom(html)


def test_dom_parity_random_soup():
    random.seed(20260817)
    alphabet = [
        "<", ">", "/", "&", "&amp;", "&#65;", "&#x41;", "&no", "&not",
        "&notin;", "=", '"', "'", "a", "b", " ", "\t", "\n", "\x00", "p",
        "div", "<p>", "</p>", "<!--", "-->", "--!>", "<script>",
        "</script>", "<!doctype html>", "<![CDATA[", "]]>", "<title>",
        "</title>", "<textarea>", "<style>", "</style>", "<xmp>", "</xmp>",
        "<plaintext>", "é", "日", "<svg>", "</svg>", "<table>", "<tr>",
        "<td>", "<iframe>", "<!", "<?", "<!x", "</ >", "x=", "x=1",
        'x="v"', "x='v'", "x = 'v'", "PUBLIC", "SYSTEM", "<!DOCTYPE", "foo",
    ]
    for _ in range(400):
        html = "".join(random.choice(alphabet)
                       for _ in range(random.randint(1, 30)))
        _assert_same_dom(html)


def test_factory_selection_rules():
    # untracked parse gets the C tokenizer
    assert isinstance(ct.make_tokenizer("<p>"), ct.CTokenizer)
    # error tracking / position tracking fall back to Python
    from ksoup_spark.kernel.parse_errors import ParseErrorList

    assert isinstance(ct.make_tokenizer("<p>", errors=ParseErrorList(10, "")),
                      Tokenizer)
    assert isinstance(ct.make_tokenizer("<p>", track=True), Tokenizer)
    # lone surrogates can't round-trip UTF-8: Python path
    assert isinstance(ct.make_tokenizer("<p>\ud800</p>"), Tokenizer)


def test_tracked_parse_uses_python_tokenizer():
    d = tb_mod.parse("<p id=a>x</p>", track_positions=True)
    assert d.src_range  # positions populated (Python tokenizer path)
    d2 = tb_mod.parse("<p></p junk=1>", track_errors=10)
    assert d2.parse_errors  # "Attributes incorrectly present on end tag"


def test_pause_batching_bounded():
    """A giant doc is tokenized in bounded batches (StreamParser memory
    contract). The C scan checks the cap at markup boundaries, so a batch
    can exceed it by the trailing text+tag pair — bounded by _BATCH + 2."""
    html = "<i>x</i>" * (ct._BATCH * 2)
    tok = ct.CTokenizer(html)
    n = 0
    while tok.next_token()[0] != "eof":
        n += 1
        assert len(tok._toks) <= ct._BATCH + 2
    assert n == ct._BATCH * 2 * 3  # start, text, end per repetition


def test_fallback_when_module_disabled(monkeypatch):
    monkeypatch.setattr(ct, "_c", None)
    monkeypatch.setattr(ct, "_tried", True)
    assert isinstance(ct.make_tokenizer("<p>"), Tokenizer)
    d = tb_mod.parse("<p>fallback</p>")
    assert len(d.kind) > 0
