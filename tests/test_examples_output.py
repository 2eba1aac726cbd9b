"""Exact-output ports of the reference's runnable examples.

The reference pins two end-to-end behaviors as ``// Output:`` assertions
(examples_test.go:11-103 nested-objects, examples_test.go:106-177
playlist multiple+list). These tests reproduce each example twice —
over the kernel Objects API and over the Spark operator surface — and
assert the EXACT final output strings the Go examples print.
"""

import json
import os

import pytest

from jsonextract_spark.kernel.objects import (
    ERR_STOP,
    ObjectOption,
    extract_and_match,
)

PLAYLIST = "/root/reference/testdata/playlist.html"

# Input transcribed from examples_test.go:13-43 (fixture data).
NESTED_INPUT = b"""
\t<script>
\tvar x = {
\t\t"id": 339750489,
\t\t// This comment makes the input invalid JSON
\t\t"node_id": "MDEwOlJlcG9zaXRvcnkzMzk3NTA0ODk=",
\t\t"name": "jsonextract",
\t\t"full_name": "xarantolus/jsonextract",
\t\t"private": false,
\t\t"owner": {
\t\t\t"login": "xarantolus",
\t\t\t"id": 32465636,
\t\t\t"node_id": "MDQ6VXNlcjMyNDY1NjM2",
\t\t\t"avatar_url": "https://avatars.githubusercontent.com/u/32465636?v=4",
\t\t\t"gravatar_id": "",
\t\t\t"html_url": "https://github.com/xarantolus",
\t\t\t"type": "User",
\t\t\t"site_admin": false
\t\t},
\t\t"html_url": "https://github.com/xarantolus/jsonextract",
\t\t"description": "Go package",
\t\t"open_issues_count": 0,
\t\t"license": {
\t\t\t"key": "mit",
\t\t\t"name": "MIT License",
\t\t\t"spdx_id": "MIT",
\t\t\t"url": "https://api.github.com/licenses/mit",
\t\t\t"node_id": "MDc6TGljZW5zZTEz"
\t\t},
\t}
\t</script>"""


def _unmarshal_until(target: dict, verify):
    """The reference Unmarshal(pointer, verify) callback shape
    (objects.go:15-30): decode errors are ignored, the pointer keeps the
    last successful decode, ERR_STOP once verify() approves."""
    def cb(raw: str):
        try:
            obj = json.loads(raw)
        except ValueError:
            return None
        target.clear()
        target.update(obj)
        return ERR_STOP if verify() else None
    return cb


def test_example_nested_objects_output():
    """examples_test.go:11-103 — expected:
    'xarantolus has published their package under the MIT License'."""
    license_, owner = {}, {}
    extract_and_match(NESTED_INPUT, [
        ObjectOption(
            keys=["key", "name", "spdx_id", "node_id"],
            callback=_unmarshal_until(
                license_,
                lambda: license_.get("key") and license_.get("name")),
            required=True),
        ObjectOption(
            keys=["login", "id", "html_url", "node_id"],
            callback=_unmarshal_until(
                owner,
                lambda: owner.get("login") and owner.get("html_url")),
            required=True),
    ])
    out = (f"{owner['login']} has published their package under "
           f"the {license_['name']}")
    assert out == ("xarantolus has published their package under "
                   "the MIT License")


def test_example_multiple_list_output_kernel():
    """examples_test.go:106-177 — expected:
    'The "Starship" playlist has 10 videos'."""
    videos = []

    def collect_video(raw: str):
        try:
            vid = json.loads(raw)
        except ValueError:
            return None
        if not vid.get("videoId"):
            return None
        if not (vid.get("title") or {}).get("runs"):
            return None
        videos.append(vid)
        return None  # keep collecting (the Go callback returns nil)

    playlist = {}
    with open(PLAYLIST, "rb") as f:
        data = f.read()
    extract_and_match(data, [
        ObjectOption(keys=["videoId", "title"], callback=collect_video),
        ObjectOption(
            keys=["title", "urlCanonical"],
            callback=_unmarshal_until(
                playlist,
                lambda: playlist.get("title")
                and playlist.get("urlCanonical"))),
    ])
    out = f'The "{playlist["title"]}" playlist has {len(videos)} videos'
    assert out == 'The "Starship" playlist has 10 videos'


@pytest.mark.spark
def test_example_multiple_list_output_spark(spark):
    """The same playlist example through the Spark operator surface:
    extract UDF -> Objects-dispatch UDF (the recursive walk that finds
    nested matches, like the reference) -> from_json decode."""
    from pyspark.sql import functions as F

    from jsonextract_spark.functions.udfs import (
        extract_objects_udf,
        make_match_objects_udf,
    )
    from jsonextract_spark.operators import unmarshal_first

    with open(PLAYLIST, "r", encoding="utf-8") as f:
        page = f.read()
    df = spark.createDataFrame([(os.path.basename(PLAYLIST), page)],
                               "url string, page string")
    match_udf = make_match_objects_udf([
        {"keys": ["videoId", "title"]},
        {"keys": ["title", "urlCanonical"]},
    ])
    calls = (df.select(
        "url",
        F.posexplode(match_udf(extract_objects_udf("page")))
        .alias("pos", "c"))
        .select("url", "pos", F.col("c.opt").alias("opt"),
                F.col("c.obj").alias("obj")))

    vid_schema = ("videoId string, "
                  "title struct<runs: array<struct<text: string>>>")
    n_videos = (calls.filter("opt = 0")
                .withColumn("decoded", F.from_json("obj", vid_schema))
                .filter(F.col("decoded.videoId").isNotNull() &
                        (F.size("decoded.title.runs") > 0))
                .count())

    pl_schema = "urlCanonical string, title string"
    pl = unmarshal_first(
        calls.filter("opt = 1"), pl_schema,
        lambda d: d["title"].isNotNull() & d["urlCanonical"].isNotNull())
    title = pl.select("decoded.title").collect()[0][0]

    assert (f'The "{title}" playlist has {n_videos} videos'
            == 'The "Starship" playlist has 10 videos')
