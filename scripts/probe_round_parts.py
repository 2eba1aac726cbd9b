"""Time the individual sub-plans of one crawl round (noop-sink isolation,
guide §1.4) on a warehouse prepared to round-1-committed state."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:42s} {best*1000:8.0f} ms")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from jsonextract_spark.session import build_session
    from jsonextract_spark.crawl.pipeline import (
        load_frontier, load_seen, load_host_stats, make_robots,
        run_crawl, _with_url_identity, _committed_info,
        _est_host_stats_rows, _est_frontier_upper, BROADCAST_MAX_EST_ROWS)
    from jsonextract_spark.crawl.scheduler import pop_batch
    from jsonextract_spark.crawl import seen as seen_mod
    from jsonextract_spark.crawl import synth
    from jsonextract_spark.crawl.tables import Warehouse
    import bench

    spark = build_session("probe-parts")
    bench.bench_extract(spark, 2000)  # warm workers

    whp = "/tmp/jsx_prob_wh"
    SF = 0.1
    run_crawl(spark, whp, rounds=1, n_seeds=int(40_000 * SF),
              host_budget=int(40_000 * SF), batch_size=int(120_000 * SF))
    wh = Warehouse(whp)
    prev = 1

    t("load_frontier noop", lambda: noop(load_frontier(spark, wh, prev)))
    t("load_seen noop", lambda: noop(load_seen(spark, wh, prev)))
    t("load_host_stats noop",
      lambda: noop(load_host_stats(spark, wh, prev)))
    t("filters load noop",
      lambda: noop(wh.load(spark, "seen_filter", prev)))

    frontier = load_frontier(spark, wh, prev)
    robots = make_robots(spark)
    host_stats = load_host_stats(spark, wh, prev)
    lg = _committed_info(wh)
    bt = int(120_000 * SF)

    def mk_batch():
        return pop_batch(frontier, robots, int(40_000 * SF), bt,
                         host_stats=host_stats, now_ts=time.time(),
                         default_delay_sec=0.0)

    t("pop_batch noop", lambda: noop(mk_batch()))

    batch = mk_batch().withColumn("batch_id", F.lit(2)).cache()
    t("batch cache count (pop+cache)", lambda: batch.count(), reps=1)

    salt = F.pmod(F.col("url_hash"), F.lit(8))
    fetch_input = batch.repartition(32, F.col("host"), salt)
    enriched = (fetch_input
                .mapInPandas(synth.fetch_extract_partition,
                             synth.FETCH_EXTRACT_SCHEMA)
                .withColumn("partition_id", F.spark_partition_id()))
    t("fetch+extract noop (from cached batch)", lambda: noop(enriched))

    enriched = enriched.cache()
    enriched.count()
    discovered = enriched.select("depth", F.explode("links").alias("raw_url"))
    t("link explode + identity noop",
      lambda: noop(_with_url_identity(discovered, "raw_url").drop("raw_url")))
    cand = (_with_url_identity(discovered, "raw_url").drop("raw_url")
            .groupBy("url_hash")
            .agg(F.min("url").alias("url"), F.min("host").alias("host"),
                 (F.min("depth") + 1).alias("depth")))
    t("cand groupBy noop", lambda: noop(cand))
    seen = load_seen(spark, wh, prev)
    filters = wh.load(spark, "seen_filter", prev)
    t("gate (bloom+anti) noop",
      lambda: noop(seen_mod.new_urls(cand, seen, filters)))
    fresh = seen_mod.new_urls(cand, seen, filters).cache()
    fresh.count()
    t("filter merge noop",
      lambda: noop(seen_mod.merge_filters(filters, fresh, kind="bloom")))
    host_delta = (enriched.filter(~F.col("blocked"))
                  .groupBy("host")
                  .agg(F.count(F.lit(1)).cast("double").alias("crawled"),
                       F.max(F.col("warc_ts").cast("double"))
                       .alias("last_fetch_ts")))
    t("host_stats delta noop", lambda: noop(host_delta))
    spark.stop()


if __name__ == "__main__":
    main()
