"""End-to-end training-corpus build (datapipe/corpus.py): WARC shards
of planted pages → filters → rare-gram gate → exact dedup → optional
minhash near-dedup → learned BPE. The page set is constructed so each
gate has exactly one designed victim:

* 20 prose pages — permutations of a 20-word vocabulary whose words
  are all rotations of one character cycle, so intra-word trigrams are
  corpus-common (rare filter passes) while word ADJACENCY differs per
  page (pairwise shingle Jaccard ≪ 0.8, so near-dedup must NOT fire
  between them; the verify stage is what guarantees this)
* 3 byte-identical copies of page 0 at other URLs — exact dedup
  collapses the 4 into one min-hash representative with dup_count=4
* pages 18/19 differ by one word — Jaccard ≈ 0.95, the only verified
  near-dup pair
* a link farm (link_density ≈ 1), a 2-token stub, and a junk page
  whose characters never appear in the prose alphabet (rare_frac ≈ 1)
  — one victim per filter
"""

import gzip
import random
from datetime import datetime

import pytest

from jsonextract_spark.crawl import warc as W

pytestmark = pytest.mark.spark

_VOCAB = ["".join(chr(97 + (i * 17 + k * 5) % 23) for k in range(10))
          for i in range(20)]          # 20 distinct 10-char words,
                                       # all rotations of one cycle


def _prose(i: int) -> str:
    words = list(_VOCAB)
    random.Random(1000 + i).shuffle(words)
    return " ".join(words * 3)          # 60 tokens


def _page(text: str) -> bytes:
    return f"<html><body><p>{text}</p></body></html>".encode()


def _build_pages():
    pages = []
    for i in range(20):
        text = _prose(i)
        if i == 19:                     # near-dup of page 18
            text = _prose(18).rsplit(" ", 1)[0] + " " + _VOCAB[0]
        pages.append((f"https://h{i % 4}.example/p/{i}", _page(text)))
    for j in range(3):                  # exact copies of page 0
        pages.append((f"https://dup.example/copy/{j}",
                      _page(_prose(0))))
    farm = "".join(f'<a href="/l/{k}">{_VOCAB[k % 20]}</a> '
                   for k in range(40))
    pages.append(("https://farm.example/nav", farm.encode()))
    pages.append(("https://stub.example/tiny", _page("xy zy")))
    pages.append(("https://junk.example/mojibake",
                  _page("zx0zx1 zx2zx3 zx4zx5 zx6zx7 zx8zx9 zx0zx1")))
    return pages


@pytest.fixture()
def warc_glob(tmp_path):
    blob = b"".join(
        gzip.compress(W.warc_record(u, datetime(2026, 8, 18, 4, 0, 0, i),
                                    body))
        for i, (u, body) in enumerate(_build_pages()))
    (tmp_path / "shard-0.warc.gz").write_bytes(blob)
    return str(tmp_path / "*.warc.gz")


def _urls(df):
    return {r.url for r in df.select("url").collect()}


def test_corpus_build_exact(spark, warc_glob):
    from jsonextract_spark.datapipe.bpe import BpeTokenizer
    from jsonextract_spark.datapipe.corpus import build_training_corpus

    corpus, funnel = build_training_corpus(
        spark, warc_glob, min_tokens=4, max_link_density=0.5,
        max_rare_frac=0.5, rare_max_count=3, n_merges=64)
    rows = corpus.collect()
    urls = {r.url for r in rows}

    # every designed victim is gone, by its designed gate
    assert "https://farm.example/nav" not in urls          # density
    assert "https://stub.example/tiny" not in urls         # min_tokens
    assert "https://junk.example/mojibake" not in urls     # rare grams
    # exact dedup: ONE survivor of the 4-copy cluster, dup_count 4
    cluster = [r for r in rows
               if r.url == "https://h0.example/p/0"
               or r.url.startswith("https://dup.example/")]
    assert len(cluster) == 1 and cluster[0].dup_count == 4
    # all other prose pages survive with dup_count 1
    assert len(rows) == 20
    assert sorted(r.dup_count for r in rows) == [1] * 19 + [4]

    # BPE tokenization is lossless on every surviving row
    tok = BpeTokenizer(funnel["merges"])
    for r in rows[:5]:
        assert tok.decode(r.bpe_ids) == r.text
        assert r.bpe_n_tokens == len(r.bpe_ids) > 0

    # the funnel observation rode the collect — no extra action
    got = funnel["get"]()
    assert got["kept_docs"] == 20
    assert got["collapsed_docs"] == 23         # 20 prose + 3 copies
    assert got["bpe_tokens"] == sum(r.bpe_n_tokens for r in rows)


def test_corpus_build_near_dedup(spark, warc_glob):
    from jsonextract_spark.datapipe.corpus import build_training_corpus

    corpus, _ = build_training_corpus(
        spark, warc_glob, min_tokens=4, max_link_density=0.5,
        max_rare_frac=0.5, rare_max_count=3, n_merges=64,
        minhash_near_dedup=True, jaccard_threshold=0.8)
    rows = corpus.collect()
    urls = _urls(corpus)

    # exactly one of the 18/19 near-dup pair dropped — and nothing
    # else (the verify stage protects the low-jaccard prose pages
    # from band-collision false positives)
    pair = {u for u in urls if u.endswith("/p/18") or u.endswith("/p/19")}
    assert len(pair) == 1
    assert len(rows) == 19


def test_short_doc_passes_rare_gate(spark, tmp_path):
    """r9 review finding: a doc too short to have any n-gram has no
    rare_gram row; the LEFT join must keep it (no grams = no rare
    grams), not silently drop it through an inner join."""
    from jsonextract_spark.datapipe.corpus import build_training_corpus

    blob = b"".join(
        gzip.compress(W.warc_record(u, datetime(2026, 8, 18, 5, 0, 0, i),
                                    _page(t)))
        for i, (u, t) in enumerate([
            ("https://a.example/one", "ab"),               # no trigram
            ("https://a.example/two", " ".join(_VOCAB * 3)),
        ]))
    (tmp_path / "s.warc.gz").write_bytes(blob)
    corpus, funnel = build_training_corpus(
        spark, str(tmp_path / "*.warc.gz"), min_tokens=1,
        max_link_density=1.0, max_rare_frac=0.5, rare_max_count=0,
        n_merges=16)
    urls = {r.url for r in corpus.collect()}
    funnel["cleanup"]()
    assert urls == {"https://a.example/one", "https://a.example/two"}
