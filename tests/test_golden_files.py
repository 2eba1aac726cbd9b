"""End-to-end golden-file fixtures.

Reads the reference's own fixture documents (pure data files) from
/root/reference/testdata when present; expected outputs transcribed from
reader_test.go:176-211 and objects_test.go:375-536.
"""

import json
import os

import pytest

from jsonextract_spark.kernel.scanner import extract_objects
from jsonextract_spark.kernel.objects import ObjectOption, extract_and_match

REF = "/root/reference/testdata"

TEST_HTML_EXPECTED = [
    b'{"value":25,"another":"test","quoted":{"is this even valid in JS?":75},'
    b'"nextkey":"this\\ntemplate literal\\n\\nspans\\n\\nmany \\n\\n\\nlines"}',
    b'{"subkey":"value"}',
    b'{"subkey":"value"}',
    b'{"@context":"https://schema.org","@type":"Product","aggregateRating":'
    b'{"@type":"AggregateRating","ratingValue":"3.5","reviewCount":"11"},'
    b'"description":"jsonextract is a Go library","name":"jsonextract",'
    b'"image":"microwave.jpg","offers":{"@type":"Offer","availability":'
    b'"https://schema.org/InStock","price":"00.00","priceCurrency":"USD"},'
    b'"review":[{"@type":"Review","author":"Ellie","datePublished":'
    b'"2012-09-06","reviewBody":"I\'m still not sure if this works.",'
    b'"name":"Test","reviewRating":{"@type":"Rating","bestRating":"5",'
    b'"ratingValue":"1","worstRating":"1"}},{"@type":"Review","author":'
    b'"Lucas","datePublished":"2014-02-21","reviewBody":'
    b'"Great microwave for the price.","name":"Value purchase",'
    b'"reviewRating":{"@type":"Rating","bestRating":"5","ratingValue":"4",'
    b'"worstRating":"1"}}]}',
    b"{}",
    b"[]",
    b'[" this is a template string. ",'
    b'"in JS you can escape` the quote character `"]',
]


@pytest.mark.skipif(not os.path.exists(f"{REF}/test.html"),
                    reason="reference fixtures not mounted")
def test_html_file():
    with open(f"{REF}/test.html", "rb") as f:
        data = f.read()
    assert extract_objects(data) == TEST_HTML_EXPECTED


@pytest.mark.skipif(not os.path.exists(f"{REF}/repo.json"),
                    reason="reference fixtures not mounted")
def test_objects_json_file():
    # objects_test.go:375-441 — nested license + owner extraction
    with open(f"{REF}/repo.json", "rb") as f:
        data = f.read()
    license_opt = ObjectOption(keys=["key", "name", "spdx_id"], limit=1)
    owner_opt = ObjectOption(keys=["login", "id", "html_url"], limit=1)
    extract_and_match(data, [license_opt, owner_opt])
    lic = json.loads(license_opt.matches[0])
    own = json.loads(owner_opt.matches[0])
    assert lic["key"] and lic["name"] and lic["spdx_id"]
    assert own["login"] and own["html_url"]


@pytest.mark.skipif(not os.path.exists(f"{REF}/playlist.html"),
                    reason="reference fixtures not mounted")
def test_objects_html_playlist():
    # objects_test.go:443-536 — exactly 10 videos + playlist metadata
    with open(f"{REF}/playlist.html", "rb") as f:
        data = f.read()
    videos = ObjectOption(keys=["videoId", "title"])
    playlist = ObjectOption(keys=["title", "urlCanonical"], limit=1)
    extract_and_match(data, [videos, playlist])
    good = []
    for raw in videos.matches:
        v = json.loads(raw)
        if v.get("videoId") and v.get("title", {}).get("runs"):
            good.append(v)
    assert len(good) == 10
    pl = json.loads(playlist.matches[0])
    assert pl["title"] and pl["urlCanonical"]
