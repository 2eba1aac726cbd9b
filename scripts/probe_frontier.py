"""Drill into load_frontier / pop_batch sub-plans (guide §1.4)."""
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
    print(f"{label:46s} {best*1000:8.0f} ms")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from jsonextract_spark.session import build_session
    from jsonextract_spark.crawl.pipeline import (
        _frontier_sources, _est_replay_events, _hint_small, load_frontier,
        load_host_stats, make_robots, run_crawl, _FRONTIER_COLS)
    from jsonextract_spark.crawl.scheduler import salted_top_k_per_group
    from jsonextract_spark.crawl.tables import Warehouse
    import bench

    spark = build_session("probe-frontier")
    bench.bench_extract(spark, 2000)

    whp = "/tmp/jsx_prob_wh2"
    SF = 0.1
    run_crawl(spark, whp, rounds=1, n_seeds=int(40_000 * SF),
              host_budget=int(40_000 * SF), batch_size=int(120_000 * SF))
    wh = Warehouse(whp)
    prev = 1

    t0 = time.time()
    base, add_paths, rm_paths, base_round = _frontier_sources(spark, wh, prev)
    print(f"_frontier_sources driver-side       {1000*(time.time()-t0):8.0f} ms "
          f"(adds={len(add_paths)}, rms={len(rm_paths)})")
    t("base scan noop", lambda: noop(base))

    def _ranged(paths, table):
        return (spark.read.option("basePath", wh._path(table))
                .parquet(*paths))

    adds = (_ranged(add_paths, "frontier_delta")
            .withColumn("_ev", F.col("round").cast("long") * 2 + 1)
            .select(*_FRONTIER_COLS, "_ev"))
    rms = (_ranged(rm_paths, "fetched")
           .select("url_hash", (F.col("round").cast("long") * 2).alias("_ev")))
    t("adds scan noop", lambda: noop(adds))
    t("rms scan noop", lambda: noop(rms))
    events = adds.select("url_hash", "_ev").unionByName(rms)
    last = events.groupBy("url_hash").agg(F.max("_ev").alias("_last_ev"))
    t("last agg noop", lambda: noop(last))
    est = _est_replay_events(wh, base_round, prev, add_paths, rm_paths)
    print("est events:", est)
    alive = (adds.join(_hint_small(last, est),
                       (adds["url_hash"] == last["url_hash"])
                       & (adds["_ev"] == last["_last_ev"]), "left_semi")
             .select(*_FRONTIER_COLS))
    t("alive semi noop", lambda: noop(alive))
    out = base.join(_hint_small(last.select("url_hash"), est),
                    "url_hash", "left_anti").select(*_FRONTIER_COLS)
    t("base anti noop", lambda: noop(out))
    t("full replay union noop", lambda: noop(out.unionByName(alive)))

    frontier = load_frontier(spark, wh, prev)
    robots = make_robots(spark)
    host_stats = load_host_stats(spark, wh, prev)
    allowed = (frontier.join(F.broadcast(robots), "host", "left")
               .filter(F.coalesce(F.col("allowed"), F.lit(True)))
               .drop("allowed"))
    t("frontier+robots noop", lambda: noop(allowed))
    allowed2 = (allowed.join(F.broadcast(host_stats), "host", "left")
                .withColumn("priority", F.col("priority") /
                            (F.lit(1.0) + F.log1p(
                                F.coalesce(F.col("crawled"), F.lit(0.0)))))
                .drop("crawled", "last_fetch_ts"))
    t("+host_stats noop", lambda: noop(allowed2))
    order = [F.col("priority").desc(), F.col("depth").asc(),
             F.col("url").asc()]
    topk = salted_top_k_per_group(allowed2, ["host"], order,
                                  int(40_000 * SF))
    t("+topk window noop", lambda: noop(topk))
    capped = topk.drop("rank_in_group").orderBy(*order).limit(
        int(120_000 * SF))
    t("+orderBy.limit noop", lambda: noop(capped))
    from pyspark.sql import Window
    w = Window.orderBy(*order)
    ranked = capped.withColumn("rank", F.row_number().over(w))
    t("+rank window noop", lambda: noop(ranked))
    spark.stop()


if __name__ == "__main__":
    main()
