"""Recrawl / refresh scheduling.

A crawl is never done: pages expire and must be refetched. This module
selects refresh candidates by age and re-opens them in the frontier.

Exactness note: the exact ``seen`` table keeps the hash (history is
append-only); re-opening works by inserting the URL back into the
frontier directly, bypassing the seen gate — the gate only filters
*newly discovered* links. The prune filters are deliberately NOT
touched: the gate treats a filter miss as *definitely new* and skips
the exact anti-join for that row (seen.new_urls fast path), so deleting
reopened hashes from a cuckoo bucket would turn links to those URLs —
still present in the exact seen set — into spurious re-enqueues (and
``delete_many`` can evict fingerprint-collision victims, breaking the
no-false-negative invariant for unrelated URLs). ``delete_from_filters``
remains available for flows that also retire the keys from the exact
set (true forget, e.g. GDPR purge), where filter and set stay in sync.
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
            .withColumn("attempts", F.lit(0))  # a refresh starts over
            .select("url", "url_hash", "host", "depth", "priority",
                    "attempts"))


def reopen_in_frontier(frontier: DataFrame,
                       refresh: DataFrame) -> DataFrame:
    """Union refresh rows into the frontier, newest priority wins for
    duplicates already pending."""
    for col in ("attempts",):            # pre-column callers/warehouses
        if col not in frontier.columns:
            frontier = frontier.withColumn(col, F.lit(0))
        if col not in refresh.columns:
            refresh = refresh.withColumn(col, F.lit(0))
    return (frontier.unionByName(refresh)
            .groupBy("url_hash")
            .agg(F.min("url").alias("url"),
                 F.min("host").alias("host"),
                 F.min("depth").alias("depth"),
                 F.max("priority").alias("priority"),
                 F.min("attempts").alias("attempts"))
            .select("url", "url_hash", "host", "depth", "priority",
                    "attempts"))


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

    from jsonextract_spark.functions.udfs import url_identity_udf

    now_ts = _time.time() if now_ts is None else now_ts
    round_ts = {r["round"]: float(r["ts"])
                for r in wh.ledger()["rounds"]
                if r.get("status") == "committed"}
    committed = [r for r in range(1, after_round + 1)
                 if wh.exists("fetched", r) and r in round_ts]
    if not committed:
        return 0
    # ONE scan relation over the committed round dirs (a per-round
    # Python union loop builds an O(rounds) plan — analysis time grows
    # with crawl age); ``basePath`` surfaces the hive ``round``
    # partition column, which a tiny broadcast-joined map turns into
    # the per-round commit timestamp. mergeSchema covers warehouses
    # whose early rounds predate the ``blocked`` column.
    fetched = (spark.read.option("mergeSchema", "true")
               .option("basePath", wh._path("fetched"))
               .parquet(*[wh._path("fetched", r) for r in committed]))
    if "blocked" in fetched.columns:
        # robots-blocked ledger rows were never fetched — nothing to
        # refresh (they'd only be re-blocked); null for pre-column
        # rounds in a mixed warehouse = not blocked
        fetched = fetched.filter(
            ~F.coalesce(F.col("blocked"), F.lit(False)))
    ts_df = spark.createDataFrame(
        [(r, round_ts[r]) for r in committed],
        "round int, fetched_ts double")
    fetched = (fetched
               .join(F.broadcast(ts_df),
                     fetched["round"].cast("int") == ts_df["round"])
               .select("url", "depth", "fetched_ts"))
    latest = (fetched.groupBy("url")
              .agg(F.max("fetched_ts").alias("fetched_ts"),
                   F.min("depth").alias("depth")))
    stale = (latest
             .withColumn("_uid", url_identity_udf(F.col("url")))
             .filter(F.col("_uid.url").isNotNull())
             .withColumn("url", F.col("_uid.url"))
             .withColumn("url_hash", F.col("_uid.url_hash"))
             .withColumn("host", F.col("_uid.host"))
             .drop("_uid"))
    refresh = refresh_candidates(stale, now_ts, max_age_sec,
                                 refresh_boost).cache()
    n = refresh.count()
    if n == 0:
        # nothing stale: no frontier rewrite, no round consumed
        refresh.unpersist()
        return 0
    rn = after_round + 1
    from jsonextract_spark.crawl.pipeline import (
        _drop_stale_compact, _drop_uncommitted_round_state, load_frontier)

    # if run_round(rn) crashed after some writes and the operator
    # resumes via schedule_recrawl instead of re-running the round,
    # committing rn would adopt the crashed attempt's debris: its
    # frontier_delta becomes the round's seen delta (URLs marked seen
    # but absent from the reopened frontier — never crawled), its
    # host_stats_delta double-counts into politeness stats, and its
    # fetched rows surface in crawl_order / later recrawl ages. Same
    # cleanup run_round performs at entry, plus the compaction
    # checkpoints a crashed attempt of rn may have written.
    _drop_uncommitted_round_state(wh, rn)
    for tbl in ("seen_compact", "host_stats_compact"):
        _drop_stale_compact(wh, tbl, rn)
    frontier = load_frontier(spark, wh, after_round)
    merged = (reopen_in_frontier(frontier, refresh)
              .withColumn("is_new", F.lit(0)))
    # the merged frontier is written as a NEW FULL BASE (is_new=0
    # everywhere — recrawl re-opens URLs, it never forgets them), so
    # load_frontier's event replay restarts from this round
    # rebalance: this base is re-read by EVERY later round's replay —
    # without it the write inherits the union's task fan-out as tiny
    # files (guide §6; no observation rides this write, so the AQE
    # REBALANCE form is safe here)
    wh.save(merged, "frontier", rn, partition_by="is_new",
            rebalance=True)
    if wh.exists("seen_filter", after_round):
        # filters carry forward UNCHANGED: reopened URLs stay in the
        # prune layer because they stay in the exact seen set — a
        # filter miss short-circuits the anti-join as definitely-new,
        # so a deletion here would re-enqueue links to reopened URLs
        # and duplicate their seen-delta rows (see module docstring)
        wh.copy_forward("seen_filter", after_round, rn)
    if wh.exists("host_stats", after_round):
        # legacy cumulative layout only — delta-layout host_stats needs
        # no carry (load_host_stats reads a round RANGE and skips
        # rounds without a delta, so the maintenance round is a no-op)
        wh.copy_forward("host_stats", after_round, rn)
    wh.commit_round(rn, {"phase": "recrawl", "reopened": n})
    refresh.unpersist()
    return n
