"""HTML → plain-text extraction (WET-style), the Common-Crawl corpus
step between a WARC archive and a documents table.

The reference extracts embedded JSON from pages (reader.go scan loop);
an LLM training pipeline also needs the *prose* — this module turns raw
HTML into whitespace-normalized text plus cheap boilerplate signals
(link counts, link-text mass, title), all computable in one linear pass.

Design rules (hard-won on other untrusted-byte parsers in this repo):

* **No regex over untrusted bytes.** Everything is ``str.find`` with
  monotonically advancing cursors — a non-greedy dotall regex on an
  unclosed tag is quadratic (the r8 sitemap lesson), and a crafted page
  must not cost more than O(bytes).
* **Never a raising error channel.** Any byte sequence yields *some*
  text; malformed trailing markup is dropped, never thrown. (Codecs
  raise ValueError because a broken image has no usable pixels; broken
  HTML still has usable prose.)
* **Arrow-batched.** The scalar core is pure per-document CPython; the
  Spark surface is a struct-returning pandas UDF, so the DataFrame plan
  stays one ArrowEvalPython over a projected column — embarrassingly
  parallel, no shuffle, linear in input bytes. At 100 TB this is a
  map-only pass whose cost rides the same scan as extraction.

Output spec (documented precisely so oracles can restate it):

* Raw-text elements (``script style noscript template textarea``) are
  skipped whole, including their content.
* Comments ``<!-- -->``, CDATA sections, doctypes/bogus comments
  (``<!…>``, ``<?…>``, ``</`` + non-letter) contribute nothing.
* Block-level tags (open or close) end the current output line; inline
  tags vanish. ``<br>`` ends a line.
* Entities are decoded per text segment (``html.unescape``); an entity
  split across tags stays literal.
* Each output line is ``" ".join(segment.split())`` of its accumulated
  inline text — all Unicode whitespace collapsed, empty lines dropped;
  lines join with ``"\n"``.
* ``title`` is the first <title>'s normalized content ("" if none).
* ``n_links`` counts ``<a …>`` open tags (self-closed ``<a/>``
  excluded); ``link_chars`` sums the per-segment normalized lengths of
  text seen while at least one <a> is open — ``link_chars /
  len(text)`` is the classic boilerplate link-density signal.
"""

from __future__ import annotations

from html import unescape

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_ASCII_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_NAME_CHARS = _ASCII_LETTERS | frozenset("0123456789")

# content skipped entirely (HTML5 raw-text / escapable-raw-text, plus
# template whose content never renders)
_RAW_TEXT = frozenset(
    {"script", "style", "noscript", "template", "textarea"})

# tags that terminate the current output line (open or close)
_BLOCK = frozenset({
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hr",
    "html", "li", "main", "nav", "ol", "option", "p", "pre", "section",
    "select", "table", "tbody", "td", "tfoot", "th", "thead",
    "title", "tr", "ul",
})


def _tag_end(s: str, i: int) -> int:
    """Index of the ``>`` closing the tag whose attributes start at
    ``i``, honoring quoted attribute values (``<a href="a>b">``).
    Amortized linear: the ``>`` candidate only moves forward, each loop
    iteration consumes one quote pair. -1 = unterminated (drop rest)."""
    g = s.find(">", i)
    while g >= 0:
        dq = s.find('"', i, g)
        sq = s.find("'", i, g)
        q = dq if sq < 0 else sq if dq < 0 else min(dq, sq)
        if q < 0:
            return g
        close = s.find(s[q], q + 1)
        if close < 0:
            return -1
        i = close + 1
        if i > g:
            g = s.find(">", i)
    return -1


def _raw_close(s: str, pos: int, name: str) -> int:
    """Index of the case-insensitive ``</name`` at or after ``pos``
    whose next char legally ends the tag name; -1 if absent. Manual
    walk — ``s.lower()`` can change string LENGTH for some codepoints,
    so a lowered copy cannot be used for index math."""
    n = len(s)
    k = len(name)
    while True:
        c = s.find("</", pos)
        if c < 0:
            return -1
        if s[c + 2:c + 2 + k].lower() == name:
            after = c + 2 + k
            if after >= n or s[after] in ">/ \t\r\n\f":
                return c
        pos = c + 2


def _attr(tag_body: str, name: str) -> str | None:
    """Value of attribute ``name`` in a tag's attribute text — linear
    name=value walk, quote-aware, case-insensitive name, entities
    decoded. None when absent; "" for a valueless attribute."""
    i, n = 0, len(tag_body)
    while i < n:
        while i < n and tag_body[i] in " \t\r\n\f/":
            i += 1
        if i >= n:
            return None
        a0 = i
        while i < n and tag_body[i] not in " \t\r\n\f=/":
            i += 1
        aname = tag_body[a0:i].lower()
        while i < n and tag_body[i] in " \t\r\n\f":
            i += 1
        val = ""
        if i < n and tag_body[i] == "=":
            i += 1
            while i < n and tag_body[i] in " \t\r\n\f":
                i += 1
            if i < n and tag_body[i] in "\"'":
                q = tag_body[i]
                j = tag_body.find(q, i + 1)
                if j < 0:
                    j = n
                val = tag_body[i + 1:j]
                i = j + 1
            else:
                v0 = i
                while i < n and tag_body[i] not in " \t\r\n\f":
                    i += 1
                val = tag_body[v0:i]
        if aname == name:
            return unescape(val)
    return None


def html_to_text(html: str) -> tuple[str, str, int, int]:
    """One linear pass: (text, title, n_links, link_chars) per the
    module spec. Never raises on any ``str`` input."""
    text, title, n_links, link_chars, _ = html_to_text_full(html)
    return text, title, n_links, link_chars


def html_to_text_full(html: str, collect_links: bool = False,
                      assemble_text: bool = True
                      ) -> tuple[str, str, int, int,
                                 list[tuple[str, str]]]:
    """As :func:`html_to_text`, plus (href, anchor_text) pairs for
    every ``<a href>`` when ``collect_links`` — anchor text is the
    whitespace-collapsed text between the tag and its close (an
    opening <a> while one is open implicitly closes it, per the HTML5
    adoption rule's practical effect; block tags and <br> inside the
    anchor act as word separators, matching the prose pass).
    ``assemble_text=False`` skips the prose/title assembly entirely —
    the links-only mode the fetch kernel uses per page, which avoids
    entity-decoding the non-anchor text it would throw away."""
    n = len(html)
    lines: list[str] = []
    cur: list[str] = []
    title = ""
    title_at = -1          # index into lines where <title> content lands
    title_done = False
    n_links = 0
    link_chars = 0
    a_depth = 0
    links: list[tuple[str, str]] = []
    a_href: str | None = None
    anchor_parts: list[str] = []

    def finalize_anchor() -> None:
        nonlocal a_href
        if a_href is not None:
            links.append((a_href,
                          " ".join("".join(anchor_parts).split())))
        a_href = None
        anchor_parts.clear()

    def emit(seg: str) -> None:
        nonlocal link_chars
        if not seg:
            return
        if a_depth <= 0 and not assemble_text:
            return                      # links-only mode: dead text
        decoded = unescape(seg)
        if a_depth > 0:
            link_chars += len(" ".join(decoded.split()))
            if collect_links:
                anchor_parts.append(decoded)
        if assemble_text:
            cur.append(decoded)

    def flush() -> None:
        line = " ".join("".join(cur).split())
        cur.clear()
        if line:
            lines.append(line)

    i = 0
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            emit(html[i:])
            break
        emit(html[i:lt])
        nxt = html[lt + 1] if lt + 1 < n else ""
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if html.startswith("<![CDATA[", lt):
            end = html.find("]]>", lt + 9)
            i = n if end < 0 else end + 3
            continue
        if nxt in ("!", "?"):
            end = html.find(">", lt + 2)       # doctype / bogus comment
            i = n if end < 0 else end + 1
            continue
        closing = nxt == "/"
        k = lt + (2 if closing else 1)
        if k >= n or html[k] not in _ASCII_LETTERS:
            if closing:                         # </3 → bogus comment
                end = html.find(">", k)
                i = n if end < 0 else end + 1
            else:                               # literal '<' in text
                emit("<")
                i = lt + 1
            continue
        m = k + 1
        while m < n and html[m] in _NAME_CHARS:
            m += 1
        name = html[k:m].lower()
        gt = _tag_end(html, m)
        if gt < 0:
            break                               # unterminated tag: drop rest
        if not closing and name in _RAW_TEXT:
            c = _raw_close(html, gt + 1, name)
            if c < 0:
                break
            gt2 = _tag_end(html, c + 2 + len(name))
            if gt2 < 0:
                break
            i = gt2 + 1
            continue
        if name == "a":
            if closing:
                a_depth = max(0, a_depth - 1)
                if collect_links:
                    finalize_anchor()
            elif html[gt - 1] != "/":
                a_depth += 1
                n_links += 1
                if collect_links:
                    finalize_anchor()      # implicit close on re-open
                    a_href = _attr(html[m:gt], "href")
        if name in _BLOCK:
            flush()
            if collect_links and a_depth > 0:
                # a block break inside an anchor separates its words
                # (matches the prose pass: <a>Read<br>more</a> is
                # "Read more", never "Readmore")
                anchor_parts.append(" ")
            if name == "title" and not title_done:
                if closing:
                    # content produced exactly one line iff non-empty
                    if title_at >= 0:
                        title_done = True
                        if len(lines) > title_at:
                            title = lines[title_at]
                else:
                    title_at = len(lines)
        i = gt + 1
    flush()
    if collect_links:
        finalize_anchor()
    return "\n".join(lines), title, n_links, link_chars, links


def page_directives(html: str) -> tuple[bool, bool, str]:
    """(noindex, nofollow, canonical) — the page's robots <meta>
    directives and its rel=canonical target, the compliance signals a
    training corpus filters on (a noindex page asked to stay out of
    indexes; canonical is the publisher's own dedup hint). Same linear
    tag walk as the tokenizer (comments/raw-text skipped, so a <meta>
    inside a script string never counts); 'robots' and 'none' both
    read per the de-facto standard (none = noindex,nofollow). Never
    raises.

    This is a second copy of the tokenizer's tag walk, kept separate
    DELIBERATELY: a shared per-token generator would tax the hot WET
    path (html_to_text_full runs per fetched page) with generator
    dispatch for every text segment; the skip rules below must stay
    in lockstep with html_to_text_full's (the CDATA consistency test
    pins the one divergence a review found)."""
    n = len(html)
    noindex = nofollow = False
    canonical = ""
    i = 0
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            break
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if html.startswith("<![CDATA[", lt):
            end = html.find("]]>", lt + 9)
            i = n if end < 0 else end + 3
            continue
        nxt = html[lt + 1] if lt + 1 < n else ""
        if nxt in ("!", "?"):
            end = html.find(">", lt + 2)
            i = n if end < 0 else end + 1
            continue
        closing = nxt == "/"
        k = lt + (2 if closing else 1)
        if k >= n or html[k] not in _ASCII_LETTERS:
            i = lt + 1
            continue
        m = k + 1
        while m < n and html[m] in _NAME_CHARS:
            m += 1
        name = html[k:m].lower()
        gt = _tag_end(html, m)
        if gt < 0:
            break
        if not closing and name in _RAW_TEXT:
            c = _raw_close(html, gt + 1, name)
            if c < 0:
                break
            gt2 = _tag_end(html, c + 2 + len(name))
            if gt2 < 0:
                break
            i = gt2 + 1
            continue
        if not closing and name == "meta":
            body = html[m:gt]
            if (_attr(body, "name") or "").strip().lower() == "robots":
                content = (_attr(body, "content") or "").lower()
                toks = {t.strip() for t in content.split(",")}
                if "none" in toks:
                    toks |= {"noindex", "nofollow"}
                noindex = noindex or "noindex" in toks
                nofollow = nofollow or "nofollow" in toks
        elif not closing and name == "link" and not canonical:
            body = html[m:gt]
            rels = (_attr(body, "rel") or "").lower().split()
            if "canonical" in rels:
                canonical = (_attr(body, "href") or "").strip()
        i = gt + 1
    return noindex, nofollow, canonical


_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "about:")


def extract_links(html: str, base_url: str | None = None
                  ) -> list[tuple[str, str]]:
    """(resolved_href, anchor_text) for every ``<a href>`` — the
    crawl's real-page link discovery. Relative hrefs resolve against
    ``base_url``; fragment-only targets, non-navigational schemes
    (javascript:/mailto:/tel:/data:/about:) and empty hrefs drop;
    fragments strip; duplicates keep their FIRST anchor text (document
    order). Linear, never raises."""
    from urllib.parse import urldefrag, urljoin

    _, _, _, _, raw = html_to_text_full(html, collect_links=True,
                                        assemble_text=False)
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for href, anchor in raw:
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        if base_url is not None:
            try:
                href = urljoin(base_url, href)
            except ValueError:
                continue
        href = urldefrag(href)[0]
        if not href or href in seen:
            continue
        seen.add(href)
        out.append((href, anchor))
    return out


def page_hrefs(html: str, base_url: str | None = None) -> list[str]:
    """Just the resolved href list (the fetch kernel's shape)."""
    return [h for h, _ in extract_links(html, base_url)]


_HTML_TEXT_TYPE = StructType([
    StructField("text", StringType()),
    StructField("title", StringType()),
    StructField("n_links", LongType()),
    StructField("link_chars", LongType()),
])

_LINKS_TYPE = ArrayType(StructType([
    StructField("href", StringType()),
    StructField("anchor", StringType()),
]))


_DIRECTIVES_TYPE = StructType([
    StructField("noindex", BooleanType()),
    StructField("nofollow", BooleanType()),
    StructField("canonical", StringType()),
])


@F.pandas_udf(_DIRECTIVES_TYPE)
def page_directives_udf(pages: pd.Series) -> pd.DataFrame:
    def one(p):
        if p is None:
            return (None, None, None)
        if isinstance(p, (bytes, bytearray)):
            p = bytes(p).decode("utf-8", "replace")
        return page_directives(p)

    return pd.DataFrame([one(p) for p in pages],
                        columns=["noindex", "nofollow", "canonical"])


@F.pandas_udf(_LINKS_TYPE)
def extract_links_udf(pages: pd.Series, bases: pd.Series) -> pd.Series:
    """(html, base_url) → array<struct<href, anchor>> — the link-graph
    building block (outlink edges with anchor text). Accepts string or
    binary pages like html_text_udf."""
    def one(p, b):
        if p is None:
            return None
        if isinstance(p, (bytes, bytearray)):
            p = bytes(p).decode("utf-8", "replace")
        return extract_links(p, None if b is None else b)

    return pd.Series([one(p, b) for p, b in zip(pages, bases)])


@F.pandas_udf(_HTML_TEXT_TYPE)
def html_text_udf(pages: pd.Series) -> pd.DataFrame:
    """Accepts string OR binary pages. Binary decodes as UTF-8 with
    replacement here, python-side — Spark's own ``decode`` raises
    [MALFORMED_CHARACTER_CODING] on the first mojibake byte, and a
    crawl archive always contains some."""
    def one(p):
        if p is None:
            return (None, None, None, None)
        if isinstance(p, (bytes, bytearray)):
            p = bytes(p).decode("utf-8", "replace")
        return html_to_text(p)

    rows = [one(p) for p in pages]
    return pd.DataFrame(rows, columns=["text", "title", "n_links",
                                       "link_chars"])


def extract_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Append text/title/n_links/link_chars/link_density columns.

    One ArrowEvalPython node; everything downstream (density filter,
    length filter) is codegen'd JVM work that Catalyst can reorder."""
    s = html_text_udf(F.col(html_col))
    return (df.withColumn("_ht", s)
              .withColumn("text", F.col("_ht.text"))
              .withColumn("title", F.col("_ht.title"))
              .withColumn("n_links", F.col("_ht.n_links"))
              .withColumn("link_chars", F.col("_ht.link_chars"))
              .withColumn(
                  "link_density",
                  F.when(F.length("text") > 0,
                         F.col("link_chars") / F.length("text"))
                   .otherwise(F.lit(0.0)))
              .drop("_ht"))
