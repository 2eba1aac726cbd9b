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
