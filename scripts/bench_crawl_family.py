"""Quick single-rep run of the crawl-family bench functions (the exact
bench.py workloads) for before/after comparison during optimization.
Not the official bench — bench.py stays frozen."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from jsonextract_spark.session import build_session  # noqa: E402


def main():
    spark = build_session("bench-crawl-family",
                         master=f"local[{bench.CPUS}]")
    bench.bench_extract(spark, 2000)
    bench._calib_sec(spark)
    out = {}
    for wh in ("/tmp/jsx_bench_wh", "/tmp/jsx_bench_wh_big",
               "/tmp/jsx_bench_wh_steady", "/tmp/jsx_bench_wh_compact"):
        shutil.rmtree(wh, ignore_errors=True)
    t0 = time.time()
    dt, fetched = bench.bench_crawl(spark)
    out["q_crawl"] = round(dt, 2)
    out["crawl_calib"] = round(bench._calib_sec(spark), 3)
    dt, fetched, round_sec = bench.bench_crawl_bigbatch(spark)
    out["q_crawl_bigbatch"] = round(dt, 2)
    out["bigbatch_round_sec"] = round(round_sec, 2)
    dt, steady = bench.bench_crawl_bigbatch_steady(spark)
    out["q_crawl_bigbatch_steady"] = round(dt, 2)
    out["steady"] = steady
    dt, compact = bench.bench_crawl_compaction(spark)
    out["q_crawl_compaction"] = round(dt, 2)
    out["compaction"] = compact
    out["wall"] = round(time.time() - t0, 1)
    import json
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
