"""Hostile-bytes fuzzing of the crawl's newest untrusted-input
parsers (fuzz family 14): the sitemap XML/gzip scanner and the WARC
gzip-member walk.

Both consume attacker-controlled bytes executor-side, and the escape
class keeps recurring across rounds (zlib.error r7, hostile-DHT
OverflowError r7, w32 IndexError r8, quadratic sitemap regex r8), so
every new parser gets this soak IMMEDIATELY: random truncations,
byte flips, splices and junk insertions of valid documents must
produce a result or ValueError — never IndexError / struct.error /
zlib.error / OverflowError / MemoryError, any of which would kill the
Spark task instead of landing in the per-row err channel — and must
finish in time linear in the input (the quadratic-regex lesson; the
WARC walk's whole-tail slices were the same disease, fixed alongside
this family with a measured 2k/4k/8k-member 0.035/0.31/1.54s → linear
profile).

The sharpest specimens found by earlier soaks are pinned as explicit
cases in test_sitemaps.py / test_warc.py; this file searches the
neighborhood those pins never wrote down.
"""

import gzip
from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from jsonextract_spark.crawl import sitemaps as SM
from jsonextract_spark.crawl import warc as W

# the ONLY exception the untrusted-bytes contract allows parsers to
# raise (NotImplementedError is the codec-missing channel, not a
# parse outcome)
_ALLOWED = ValueError


# -- document builders ---------------------------------------------------------

def _sitemap_doc(n_urls: int, n_children: int, entities: bool) -> bytes:
    amp = "&amp;" if entities else "x"
    urls = "".join(
        f"<url><loc> https://h{i}.example/p/{i}?a={amp} </loc></url>"
        for i in range(n_urls))
    kids = "".join(
        f"<sitemap><loc>https://h.example/sm{i}.xml.gz</loc>"
        f"<lastmod>2026-0{(i % 9) + 1}-01</lastmod></sitemap>"
        for i in range(n_children))
    return (f"<?xml version='1.0'?><sitemapindex>{kids}</sitemapindex>"
            f"<urlset>{urls}</urlset>").encode()


def _warc_stream(n_records: int, payload_len: int) -> bytes:
    return b"".join(
        gzip.compress(W.warc_record(
            f"https://h{i}.example/p/{i}",
            datetime(2026, 8, 18, 1, 2, 3, i % 1000000),
            bytes([i % 256]) * payload_len))
        for i in range(n_records))


# -- byte-level mutators -------------------------------------------------------
#
# each mutation is (kind, a, b) applied in sequence; offsets are taken
# modulo the current length so shrinking stays meaningful

def _mutate(data: bytes, ops) -> bytes:
    for kind, a, b in ops:
        if not data:
            break
        a %= len(data) + 1
        if kind == "truncate":
            data = data[:a]
        elif kind == "flip":
            if a < len(data):
                data = (data[:a] + bytes([data[a] ^ (b | 1)])
                        + data[a + 1:])
        elif kind == "insert":
            data = data[:a] + bytes([b]) * 3 + data[a:]
        elif kind == "splice":
            data = data[:a] + data[(a + b) % (len(data) + 1):]
        elif kind == "double":
            data = data[:a] + data[:a] + data[a:]
    return data


_OPS = st.lists(
    st.tuples(st.sampled_from(["truncate", "flip", "insert", "splice",
                               "double"]),
              st.integers(0, 1 << 20), st.integers(0, 255)),
    min_size=1, max_size=6)


# -- sitemap family ------------------------------------------------------------

@settings(max_examples=120, deadline=None)
@given(n_urls=st.integers(0, 30), n_children=st.integers(0, 5),
       entities=st.booleans(), gz=st.booleans(), ops=_OPS)
def test_sitemap_hostile_bytes(n_urls, n_children, entities, gz, ops):
    doc = _sitemap_doc(n_urls, n_children, entities)
    if gz:
        doc = gzip.compress(doc)
    data = _mutate(doc, ops)
    try:
        pages, children = SM.extract_sitemap_locs(data)
    except _ALLOWED:
        return
    # whatever survives must honor the documented shape and caps
    assert isinstance(pages, list) and isinstance(children, list)
    assert len(pages) <= SM.SITEMAP_MAX_URLS
    assert len(children) <= SM.SITEMAP_MAX_URLS
    for u in pages + children:
        assert isinstance(u, str) and len(u) <= 4096


@settings(max_examples=60, deadline=None)
@given(data=st.binary(max_size=4096))
def test_sitemap_arbitrary_bytes(data):
    try:
        SM.extract_sitemap_locs(data)
    except _ALLOWED:
        pass


# -- WARC family ---------------------------------------------------------------

def _walk_warc(data: bytes):
    out = []
    for rec in W._iter_members(data):
        parsed = W.parse_warc_member(rec)
        if parsed is not None:
            out.append(parsed)
    return out


@settings(max_examples=120, deadline=None)
@given(n=st.integers(1, 8), plen=st.integers(0, 200), ops=_OPS)
def test_warc_hostile_mutations(n, plen, ops):
    data = _mutate(_warc_stream(n, plen), ops)
    try:
        recs = _walk_warc(data)
    except _ALLOWED:
        return
    # surviving records must be structurally sound
    for url, date, body in recs:
        assert isinstance(url, str)
        assert isinstance(body, bytes)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(max_size=4096))
def test_warc_arbitrary_bytes(data):
    try:
        _walk_warc(data)
    except _ALLOWED:
        pass


@settings(max_examples=40, deadline=None)
@given(rec=st.binary(max_size=2048))
def test_warc_member_parse_arbitrary_bytes(rec):
    """parse_warc_member directly (the member walk normally feeds it
    inflated bytes — fuzz the post-inflation surface on its own)."""
    try:
        W.parse_warc_member(rec)
    except _ALLOWED:
        pass


def test_warc_member_walk_linear_time():
    """Pin the r9 fix: the member walk must scale linearly in shard
    bytes (the whole-remaining-tail slices it replaced were measured
    quadratic — 2k→8k tiny members cost 44x, not 4x). Catastrophe-only
    margin: 4x the bytes may cost at most 16x the time."""
    import time

    rec = W.warc_record("https://a.example/x", datetime(2026, 1, 1),
                        b"B" * 100)
    m = gzip.compress(rec)

    def cost(k):
        t0 = time.time()
        assert sum(1 for _ in W._iter_members(m * k)) == k
        return time.time() - t0

    cost(500)                       # warm-up
    small, big = cost(2000), cost(8000)
    assert big < 16 * small + 2.0
