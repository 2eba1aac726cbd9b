"""Profile one crawl bench shape at job/stage granularity via the Spark
event log (guide §1: measure first, §7.1: map stages back to operators).

Usage: python scripts/profile_crawl.py [crawl|bigbatch|dedup|pop]

Writes a per-job table (group, description, wall ms, stages) to stdout so
the per-round action latency can be attributed to specific exchanges /
Python stages instead of guessed at.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/jsx_eventlog"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF = 0.1


def build(app):
    from jsonextract_spark.session import build_session

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    return build_session(app, extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
        "spark.eventLog.dir": f"file://{EVDIR}",
    })


def parse_eventlog():
    files = [f for f in glob.glob(f"{EVDIR}/*") if not f.endswith(".inprogress")] \
        or glob.glob(f"{EVDIR}/*")
    path = max(files, key=os.path.getmtime)
    jobs = {}        # id -> dict
    stages = {}      # id -> dict
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties", {})
            jobs[ev["Job ID"]] = {
                "start": ev["Submission Time"],
                "group": props.get("spark.jobGroup.id", ""),
                "desc": props.get("spark.job.description", "")[:90],
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"],
                "tasks": si["Number of Tasks"],
                "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
            }
    return jobs, stages


def report(label):
    jobs, stages = parse_eventlog()
    print(f"\n== {label}: {len(jobs)} jobs ==")
    bygroup = {}
    for jid in sorted(jobs):
        j = jobs[jid]
        dur = j.get("end", j["start"]) - j["start"]
        bygroup.setdefault(j["group"], []).append((jid, dur, j))
    for g in sorted(bygroup, key=str):
        js = bygroup[g]
        tot = sum(d for _, d, _ in js)
        print(f"\n-- group {g or '(none)'}: {len(js)} jobs, {tot} ms total")
        for jid, dur, j in js:
            st = [(stages[s]["ms"], stages[s]["tasks"],
                   stages[s]["name"].split(" at ")[0])
                  for s in j["stages"] if s in stages]
            st.sort(reverse=True)
            stxt = "; ".join(f"{ms}ms/{nt}t {nm}" for ms, nt, nm in st[:3])
            print(f"  job {jid:3d} {dur:6d} ms  {j['desc'][:60]!r:62s} [{stxt}]")


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "crawl"
    spark = build(f"profile-{what}")
    import bench

    bench.bench_extract(spark, 2000)   # warm workers
    if what == "crawl":
        from jsonextract_spark.crawl.pipeline import run_crawl
        wh = "/tmp/jsx_prof_wh"
        t0 = time.time()
        stats = run_crawl(spark, wh, rounds=2,
                          n_seeds=int(40_000 * SF),
                          host_budget=int(40_000 * SF),
                          batch_size=int(120_000 * SF))
        print("wall", round(time.time() - t0, 2), "rounds",
              [round(s["sec"], 2) for s in stats])
    elif what == "bigbatch":
        from jsonextract_spark.crawl.pipeline import run_crawl
        wh = "/tmp/jsx_prof_wh_big"
        n = int(500_000 * SF)
        t0 = time.time()
        stats = run_crawl(spark, wh, rounds=1, n_seeds=n, host_budget=n,
                          batch_size=n)
        print("wall", round(time.time() - t0, 2), "rounds",
              [round(s["sec"], 2) for s in stats])
    elif what == "dedup":
        t, stagesec = bench.bench_dedup(spark, bench.N_PAGES)
        print("dedup", round(t, 2), stagesec)
        t2 = bench.bench_simhash(spark, bench.N_PAGES)
        print("simhash", round(t2, 2))
    elif what == "oracle":
        t = bench.bench_oracle_suite(spark)
        print("oracle", round(t, 2))
    spark.stop()
    time.sleep(1.0)
    report(what)


if __name__ == "__main__":
    main()
