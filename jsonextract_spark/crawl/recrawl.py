"""Recrawl / refresh scheduling.

A crawl is never done: pages expire and must be refetched. This module
selects refresh candidates by age and re-opens them in the frontier,
using the cuckoo filter's DELETE support (the reason the seen set
offers that codec) so the bloom/cuckoo prune layer stops short-
circuiting the refreshed URLs.

Exactness note: the exact ``seen`` table keeps the hash (history is
append-only); re-opening works by inserting the URL back into the
frontier directly, bypassing the seen gate — the gate only filters
*newly discovered* links. The filter deletion is an optimization that
keeps prune stats honest for recrawled hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from jsonextract_spark.crawl.scheduler import priority_of


def refresh_candidates(fetched: DataFrame, now_ts: float,
                       max_age_sec: float,
                       refresh_boost: float = 0.5) -> DataFrame:
    """fetched(url, url_hash?, depth, ...) + per-url last fetch time ->
    frontier rows for pages older than ``max_age_sec``.

    Expects a ``fetched_ts`` (double epoch) column; priority gets a
    refresh boost relative to same-depth fresh discoveries so refreshes
    interleave rather than starve.
    """
    stale = fetched.filter(F.col("fetched_ts") < now_ts - max_age_sec)
    return (stale
            .withColumn("priority",
                        priority_of(F.col("depth")) * F.lit(refresh_boost))
            .select("url", "url_hash", "host", "depth", "priority"))


def reopen_in_frontier(frontier: DataFrame,
                       refresh: DataFrame) -> DataFrame:
    """Union refresh rows into the frontier, newest priority wins for
    duplicates already pending."""
    return (frontier.unionByName(refresh)
            .groupBy("url_hash")
            .agg(F.min("url").alias("url"),
                 F.min("host").alias("host"),
                 F.min("depth").alias("depth"),
                 F.max("priority").alias("priority"))
            .select("url", "url_hash", "host", "depth", "priority"))


def schedule_recrawl(spark, wh, after_round: int, max_age_sec: float,
                     now_ts: float | None = None,
                     refresh_boost: float = 0.5) -> int:
    """Pipeline maintenance step: re-open stale fetched URLs as a
    dedicated maintenance ROUND (``after_round + 1``), so the next crawl
    round refetches them.

    Fetch time per URL is the commit timestamp of the round that fetched
    it (ledger-side; the hot fetched table carries no extra column), and
    the newest fetch wins per URL. The refreshed frontier is written as
    a new round version with an EMPTY seen delta (``is_new=0``
    everywhere — recrawl re-opens URLs, it never forgets them), with
    filter/host state carried forward, and its own ledger entry — the
    original rounds' deltas, stats and resume points stay intact.
    Intended to run every N rounds like seen compaction, not per round.
    Returns the number of re-opened URLs.
    """
    import time as _time

    from jsonextract_spark.functions.udfs import (
        canonicalize_url_udf, murmur3_64_udf, url_host_udf)

    now_ts = _time.time() if now_ts is None else now_ts
    round_ts = {r["round"]: float(r["ts"])
                for r in wh.ledger()["rounds"]
                if r.get("status") == "committed"}
    parts = [wh.load(spark, "fetched", r)
             .select("url", "depth", F.lit(round_ts[r]).alias("fetched_ts"))
             for r in range(1, after_round + 1)
             if wh.exists("fetched", r) and r in round_ts]
    if not parts:
        return 0
    fetched = parts[0]
    for p in parts[1:]:
        fetched = fetched.unionByName(p)
    latest = (fetched.groupBy("url")
              .agg(F.max("fetched_ts").alias("fetched_ts"),
                   F.min("depth").alias("depth")))
    stale = (latest
             .withColumn("url", canonicalize_url_udf(F.col("url")))
             .filter(F.col("url").isNotNull())
             .withColumn("url_hash", murmur3_64_udf("url"))
             .withColumn("host", url_host_udf("url")))
    refresh = refresh_candidates(stale, now_ts, max_age_sec,
                                 refresh_boost).cache()
    n = refresh.count()
    if n == 0:
        # nothing stale: no frontier rewrite, no round consumed
        refresh.unpersist()
        return 0
    rn = after_round + 1
    frontier = wh.load(spark, "frontier", after_round).drop("is_new")
    merged = (reopen_in_frontier(frontier, refresh)
              .withColumn("is_new", F.lit(0)))
    wh.save(merged, "frontier", rn, partition_by="is_new")
    if wh.exists("seen_filter", after_round):
        from jsonextract_spark.crawl.seen import delete_from_filters

        filters = wh.load(spark, "seen_filter", after_round)
        # cuckoo buckets support deletion: dropping the reopened URLs'
        # fingerprints keeps the prune layer's stats honest for
        # recrawled hosts (bloom buckets pass through unchanged — they
        # cannot delete, and the exact anti-join stays the backstop)
        wh.save(delete_from_filters(filters,
                                    refresh.select("url_hash")),
                "seen_filter", rn)
    if wh.exists("host_stats", after_round):
        wh.copy_forward("host_stats", after_round, rn)
    wh.commit_round(rn, {"phase": "recrawl", "reopened": n})
    refresh.unpersist()
    return n
