"""WARC→documents ingestion (datapipe/ingest.py): decode hygiene, the
URL-identity drop contract, and the map-only plan shape."""

import gzip
from datetime import datetime

import pytest

from jsonextract_spark.crawl import warc as W

pytestmark = pytest.mark.spark


def _shard(tmp_path, records):
    p = tmp_path / "shard-000.warc.gz"
    p.write_bytes(b"".join(gzip.compress(W.warc_record(u, t, b))
                           for u, t, b in records))
    return str(tmp_path / "*.warc.gz")


def test_warc_to_documents(spark, tmp_path):
    from jsonextract_spark.datapipe.ingest import warc_to_documents

    glob = _shard(tmp_path, [
        ("https://A.example/p/1",                  # host must lowercase
         datetime(2026, 8, 18, 1, 2, 3, 456789),
         b"<title>the T</title><p>of words</p><a href=/x>go</a>"),
        ("https://b.example/p/2",
         datetime(2026, 8, 18, 2, 0, 0),
         b"plain \xff mojibake"),                  # invalid UTF-8 byte
        ("not a crawlable url",
         datetime(2026, 8, 18, 3, 0, 0),
         b"<p>dropped</p>"),                       # identity -> NULL
    ])
    docs = warc_to_documents(spark, glob)
    rows = {r.url: r for r in docs.collect()}
    assert set(rows) == {"https://a.example/p/1", "https://b.example/p/2"}

    a = rows["https://a.example/p/1"]
    assert a.host == "a.example"
    assert a.title == "the T"
    assert a.text == "the T\nof words\ngo"
    assert (a.n_links, a.link_chars) == (1, 2)
    assert a.n_tokens == 5 and a.n_chars == len(a.text)
    assert a.lang == "en"
    assert a.fetched_at == datetime(2026, 8, 18, 1, 2, 3, 456789)
    assert isinstance(a.url_hash, int)

    b = rows["https://b.example/p/2"]
    assert b.n_bytes == len(b"plain \xff mojibake")
    assert "mojibake" in b.text          # replacement char, not a crash
    assert b.n_links == 0 and b.link_density == 0.0

    # map-only composition: no shuffle anywhere in the plan
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
