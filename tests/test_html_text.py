"""WET-style HTML→text extraction (datapipe/html_text.py): scalar spec
pins, the Spark struct-UDF surface, and a hostile-input soak (fuzz
family 15). The contract here is STRONGER than the codec err channel:
broken HTML still has usable prose, so ``html_to_text`` never raises on
any ``str`` input — and must stay linear in input bytes (all parsing is
``str.find`` with advancing cursors; the quote-aware tag-end scan and
the raw-text close search are the two spots a naive form goes
quadratic)."""

import time

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonextract_spark.datapipe.html_text import html_to_text

pytestmark = []


# -- scalar spec pins ----------------------------------------------------------

CASES = [
    ("", ("", "", 0, 0)),
    ("plain text only", ("plain text only", "", 0, 0)),
    # block tags split lines; empty lines drop
    ("<p>a</p><p></p><p>b</p>", ("a\nb", "", 0, 0)),
    ("a<br>b", ("a\nb", "", 0, 0)),
    ("<div>a<span>b</span>c</div>", ("abc", "", 0, 0)),
    # whitespace collapses per line (tabs, newlines, runs)
    ("<p>  a\t\tb \n c  </p>", ("a b c", "", 0, 0)),
    # '<' followed by a non-letter is literal text (HTML5)
    ("x < 3 and y > 1", ("x < 3 and y > 1", "", 0, 0)),
    # quoted '>' inside an attribute value does not end the tag
    ("<a href='x>y'>link text</a> out", ("link text out", "", 1, 9)),
    # self-closed <a/> is not a link
    ("<a/>none", ("none", "", 0, 0)),
    # tag names are case-insensitive
    ("<A HREF=x>Up</A>", ("Up", "", 1, 2)),
    ("<ScRiPt>var a=1;</sCrIpT>shown", ("shown", "", 0, 0)),
    # raw-text elements vanish with their content
    ("<style>p {c:1}</style>kept", ("kept", "", 0, 0)),
    ("<textarea><p>hidden</p></textarea>ok", ("ok", "", 0, 0)),
    # unterminated constructs drop the remainder, never raise
    ("<script>a</script", ("", "", 0, 0)),
    ("<!-- unclosed", ("", "", 0, 0)),
    ("a<p unclosed", ("a", "", 0, 0)),
    ("a<a href='unclosed", ("a", "", 0, 0)),
    # comments / CDATA / doctype / processing instructions vanish
    ("a<!-- <p>x</p> -->b", ("ab", "", 0, 0)),
    ("<![CDATA[<p>no</p>]]>yes", ("yes", "", 0, 0)),
    ("<!DOCTYPE html>t", ("t", "", 0, 0)),
    ("<?php echo ?>after", ("after", "", 0, 0)),
    ("</3 bogus>text", ("text", "", 0, 0)),
    # entities decode per segment; &#10; is whitespace after decode
    ("a &lt;b&gt; &#10; c", ("a <b> c", "", 0, 0)),
    ("&amp;&amp;", ("&&", "", 0, 0)),
    # link_chars is the PER-SEGMENT normalized sum (x,y,z → 1+1+1)
    ("<div>nested <a>x <a>y</a> z</a> tail</div>",
     ("nested x y z tail", "", 2, 3)),
    # title: first one wins, captured only if it produced a line
    ("pre<title>The Title</title>post",
     ("pre\nThe Title\npost", "The Title", 0, 0)),
    ("<title></title><p>body</p>", ("body", "", 0, 0)),
    ("<title>  </title><p>body</p>", ("body", "", 0, 0)),
    ("<title>A</title><title>B</title>", ("A\nB", "A", 0, 0)),
    # stray close tags are harmless
    ("</p></div>x", ("x", "", 0, 0)),
]


@pytest.mark.parametrize("html,want", CASES)
def test_scalar_cases(html, want):
    assert html_to_text(html) == want


def test_full_page_shape():
    h = ("<html><head><title>Doc 7 &amp; es</title>"
         "<style>p {x:1}</style></head>"
         "<body><h1>Doc 7</h1><script>var x = {id: 7};</script>"
         "<p>the fast key</p>"
         '<div>See <a href="/d/7">doc 7 link</a> &amp; more.</div>'
         "<!-- secret --></body></html>")
    text, title, n_links, link_chars = html_to_text(h)
    assert text == "Doc 7 & es\nDoc 7\nthe fast key\nSee doc 7 link & more."
    assert title == "Doc 7 & es"
    assert (n_links, link_chars) == (1, len("doc 7 link"))


def test_link_density_signal_orders_boilerplate():
    """The signal the operator exists for: a nav-bar page measures
    link-heavier than a prose page."""
    nav = "<ul>" + "".join(
        f"<li><a href='/{i}'>section {i}</a></li>" for i in range(10)) + \
        "</ul><p>hi</p>"
    prose = "<p>" + "word " * 100 + "</p><a href='/'>home</a>"

    def density(h):
        text, _, _, lc = html_to_text(h)
        return lc / len(text)

    assert density(nav) > 0.8 > 0.2 > density(prose)


# -- Spark surface -------------------------------------------------------------

@pytest.mark.spark
def test_extract_text_dataframe(spark):
    from pyspark.sql import functions as F

    from jsonextract_spark.datapipe.html_text import extract_text

    df = spark.createDataFrame(
        [(0, "<title>T</title><p>a b</p><a href='/'>c</a>"),
         (1, "<p>only prose here</p>"),
         (2, None)],
        "id long, html string")
    out = extract_text(df, "html").orderBy("id").collect()
    assert out[0].text == "T\na b\nc"
    assert out[0].title == "T"
    assert (out[0].n_links, out[0].link_chars) == (1, 1)
    assert out[0].link_density == 1 / len("T\na b\nc")
    assert out[1] .text == "only prose here"
    assert out[1].n_links == 0 and out[1].link_density == 0.0
    assert out[2].text is None and out[2].n_links is None

    # one Python crossing: a single ArrowEvalPython node in the plan
    plan = (extract_text(df, "html")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("ArrowEvalPython") == 1


# -- fuzz family 15: hostile HTML ------------------------------------------------

def _page(n_paras: int, n_links: int, raw: bool) -> str:
    paras = "".join(f"<p>para {i} text</p>" for i in range(n_paras))
    links = "".join(f'<a href="/l/{i}">link {i}</a>' for i in range(n_links))
    chaff = "<script>var x = '</scr'+'ipt>';</script>" if raw else ""
    return (f"<html><head><title>T</title>{chaff}</head>"
            f"<body>{paras}<div>{links}</div><!-- c --></body></html>")


_MUT = st.lists(
    st.tuples(st.sampled_from(["truncate", "flip", "insert", "double"]),
              st.integers(0, 1 << 16),
              st.sampled_from(list("<>/\"'&;!-x"))),
    min_size=1, max_size=6)


def _mutate(s: str, ops) -> str:
    for kind, a, ch in ops:
        if not s:
            break
        a %= len(s) + 1
        if kind == "truncate":
            s = s[:a]
        elif kind == "flip":
            if a < len(s):
                s = s[:a] + ch + s[a + 1:]
        elif kind == "insert":
            s = s[:a] + ch * 3 + s[a:]
        elif kind == "double":
            s = s[:a] + s[:a] + s[a:]
    return s


@settings(max_examples=150, deadline=None)
@given(n_paras=st.integers(0, 10), n_links=st.integers(0, 5),
       raw=st.booleans(), ops=_MUT)
def test_hostile_mutations_never_raise(n_paras, n_links, raw, ops):
    text, title, n, lc = html_to_text(_mutate(_page(n_paras, n_links, raw),
                                              ops))
    assert isinstance(text, str) and isinstance(title, str)
    assert n >= 0 and lc >= 0
    assert "\n\n" not in text and not text.startswith("\n")


@settings(max_examples=100, deadline=None)
@given(s=st.text(max_size=2048))
def test_arbitrary_text_never_raises(s):
    text, title, n, lc = html_to_text(s)
    assert isinstance(text, str)
    for line in text.split("\n") if text else ():
        assert line == " ".join(line.split()) and line


def _cost(doc: str) -> float:
    t0 = time.time()
    html_to_text(doc)
    return time.time() - t0


@pytest.mark.parametrize("unit", [
    '<a b="c" d="e" f="g" h=',      # quote-heavy attributes, no '>'
    "<p><a><b>",                     # open tags, never closed
    "</x" * 4,                       # bogus comments
    "<!--x-->",                      # comments
    "&amp;" * 4,                     # entity runs
    "<script>x</script>",            # raw-text skip
    '<div id="a>b">t</div>',         # quoted '>'
], ids=["quotes", "opens", "bogus", "comments", "entities", "raw",
        "quoted-gt"])
def test_linear_time(unit):
    """4x the bytes may cost at most 16x the time (catastrophe margin —
    a quadratic scan costs 16x at 4x and explodes past it)."""
    _cost(unit * 500)                                   # warm-up
    small, big = _cost(unit * 4000), _cost(unit * 16000)
    assert big < 16 * small + 1.0, (small, big)


# -- link extraction -------------------------------------------------------------

LINK_CASES = [
    ('<a href="/x">go</a>', "https://h.example/p/1",
     [("https://h.example/x", "go")]),
    # query kept, fragment stripped, relative resolution
    ('<a href="q?a=1#frag">q</a>', "https://h.example/d/",
     [("https://h.example/d/q?a=1", "q")]),
    # unquoted href; fragment-only and mailto drop
    ('<a href=bare>b</a> <a href="#top">t</a> <a href="mailto:x@y">m</a>',
     "https://h.example/", [("https://h.example/bare", "b")]),
    # first-seen dedup keeps the FIRST anchor text
    ('<a href="/dup">first</a><a href="/dup">second</a>',
     "https://h.example/", [("https://h.example/dup", "first")]),
    # inline markup inside the anchor collapses into its text
    ('<a href="https://other.example/abs">abs <b>bold</b></a>', None,
     [("https://other.example/abs", "abs bold")]),
    # unclosed <a> implicitly closes at the next <a> (practical
    # adoption-agency effect)
    ('<a href="/1">one <a href="/2">two</a>', "https://h.example/",
     [("https://h.example/1", "one"), ("https://h.example/2", "two")]),
    # entities decode in both href-adjacent text and anchors
    ('<a href="/e">x &amp; y</a>', "https://h.example/",
     [("https://h.example/e", "x & y")]),
    # quoted '>' inside another attribute
    ('<a href="/u" title="a>b">t</a>', "https://h.example/",
     [("https://h.example/u", "t")]),
    # no href / empty href / javascript: all drop
    ('<a>no href</a><a href>empty</a>', "https://h.example/", []),
    ('<a href="JavaScript:void(0)">js</a>', None, []),
    # block tags / <br> inside the anchor separate words (review
    # finding: ""-join merged them into 'foobar')
    ('<a href="/x">foo<br>bar</a>', None, [("/x", "foo bar")]),
    ('<a href="/x">Read<p>more</p></a>', None, [("/x", "Read more")]),
]


@pytest.mark.parametrize("html,base,want", LINK_CASES)
def test_extract_links(html, base, want):
    from jsonextract_spark.datapipe.html_text import extract_links
    assert extract_links(html, base) == want


@settings(max_examples=100, deadline=None)
@given(n_paras=st.integers(0, 6), n_links=st.integers(0, 5),
       raw=st.booleans(), ops=_MUT)
def test_extract_links_never_raises(n_paras, n_links, raw, ops):
    from jsonextract_spark.datapipe.html_text import extract_links
    got = extract_links(_mutate(_page(n_paras, n_links, raw), ops),
                        "https://h.example/base/")
    for href, anchor in got:
        assert isinstance(href, str) and isinstance(anchor, str)
        assert "#" not in href.split("?")[-1] or "#" not in href


# -- robots directives -----------------------------------------------------------

DIRECTIVE_CASES = [
    ('<meta name="robots" content="noindex, nofollow">', (True, True, "")),
    ('<meta name="ROBOTS" content="NOINDEX">', (True, False, "")),
    ('<meta name=robots content=none>', (True, True, "")),   # de-facto
    ('<meta name="robots" content="index, follow">', (False, False, "")),
    ('<meta name="description" content="noindex">', (False, False, "")),
    ('<link rel="canonical" href="https://c.example/x">',
     (False, False, "https://c.example/x")),
    ('<link rel="stylesheet canonical" href="/y">', (False, False, "/y")),
    # first canonical wins
    ('<link rel="canonical" href="/1"><link rel="canonical" href="/2">',
     (False, False, "/1")),
    # meta inside a script string / a comment never counts
    ('<script>var s = \'<meta name="robots" content="noindex">\';'
     "</script>", (False, False, "")),
    ('<!-- <meta name="robots" content="noindex"> -->', (False, False, "")),
    # CDATA content is skipped like the prose pass does (review
    # finding: the bogus-comment path leaked the tail after the
    # first '>' back into the tag walk)
    ('<![CDATA[ x> <meta name="robots" content="noindex"> ]]>ok',
     (False, False, "")),
    ("", (False, False, "")),
    ('<meta name="robots"', (False, False, "")),   # truncated: drop
]


@pytest.mark.parametrize("html,want", DIRECTIVE_CASES)
def test_page_directives(html, want):
    from jsonextract_spark.datapipe.html_text import page_directives
    assert page_directives(html) == want


@settings(max_examples=80, deadline=None)
@given(s=st.text(max_size=2048))
def test_page_directives_never_raises(s):
    from jsonextract_spark.datapipe.html_text import page_directives
    noindex, nofollow, canonical = page_directives(s)
    assert isinstance(noindex, bool) and isinstance(canonical, str)
