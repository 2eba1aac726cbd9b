"""Capture .explain('formatted') for the r10-touched queries.

Usage: python capture_plans.py <tree_root> <out_dir> <suffix> [sf_dir]

Runs from either the round-start tree (suffix 'before') or the current
tree (suffix 'after'); writes <out_dir>/<query>_<suffix>.txt.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

tree, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
sys.path.insert(0, tree)
os.makedirs(outdir, exist_ok=True)

from jsonextract_spark.session import build_session  # noqa: E402

QUERIES = ["q_frontier_state", "q_host_stats", "q_ann_topk",
           "q_lsh_ann", "q_ivf_ann", "q_embed_dup", "q_components"]


def dump(name, df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path)


def main():
    spark = build_session(f"plans-{suffix}")
    import __spark_entry__ as e

    qs = e.queries()
    for name in QUERIES:
        try:
            dump(name, qs[name](spark, sf_dir))
        except Exception as ex:
            print(name, "FAILED", str(ex)[:200])

    # crawl internals: the replay and pop plans (shared signature in
    # both trees) over a small committed warehouse
    from jsonextract_spark.crawl.pipeline import (load_frontier,
                                                  load_host_stats,
                                                  make_robots, run_crawl)
    from jsonextract_spark.crawl.scheduler import pop_batch
    from jsonextract_spark.crawl.tables import Warehouse
    import time

    whp = f"/tmp/jsx_plans_wh_{suffix}"
    run_crawl(spark, whp, rounds=2, n_seeds=200, host_budget=50,
              batch_size=600)
    wh = Warehouse(whp)
    last = wh.last_committed_round()
    dump("crawl_replay", load_frontier(spark, wh, last))
    dump("crawl_pop", pop_batch(
        load_frontier(spark, wh, last), make_robots(spark), 50, 600,
        host_stats=load_host_stats(spark, wh, last), now_ts=time.time(),
        default_delay_sec=0.0))
    spark.stop()


if __name__ == "__main__":
    main()
