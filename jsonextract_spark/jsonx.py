"""`jsonx` CLI parity — the reference's end-to-end program
(/root/reference/cmd/jsonx/main.go:34-135) re-expressed:

    python -m jsonextract_spark.jsonx <file|url|-> [key1 key2 ...] [-limit N]

* no keys: print every extracted object/array, one per line
* keys: print only objects containing ALL keys (Objects semantics)
* -limit N: stop after N values (ErrStop)
* `-` reads stdin; http(s):// URLs fetch with browser-ish headers
* --glob PATTERN: distributed mode — run the same query over many files
  with Spark and write results to --out (parquet) or stdout

Single-input mode runs the kernel in-process (like the Go CLI); glob
mode is the Spark batch path.
"""

from __future__ import annotations

import argparse
import sys


def _read_source(src: str) -> bytes:
    if src == "-":
        return sys.stdin.buffer.read()
    if src.startswith("http://") or src.startswith("https://"):
        from urllib.request import Request, urlopen

        req = Request(src, headers={
            # browser-ish headers like the reference (main.go:19-32)
            "User-Agent": "Mozilla/5.0 (X11; Linux x86_64) "
                          "AppleWebKit/537.36 (KHTML, like Gecko) "
                          "Chrome/120.0 Safari/537.36",
            "Accept": "text/html,application/xhtml+xml,*/*;q=0.8",
            "Accept-Language": "en-US,en;q=0.9",
        })
        with urlopen(req, timeout=60) as resp:
            return resp.read()
    with open(src, "rb") as f:
        return f.read()


def run_single(src: str, keys: list[str], limit: int | None,
               out=sys.stdout) -> int:
    from jsonextract_spark.kernel.scanner import extract_objects
    from jsonextract_spark.kernel.objects import (
        ObjectOption, match_objects)

    data = _read_source(src)
    if not keys:
        vals = extract_objects(data, limit=limit)
        for v in vals:
            out.write(v.decode("utf-8", "replace") + "\n")
        return 0
    opt = ObjectOption(keys=keys, limit=limit)
    values = [m.decode("utf-8", "replace") for m in extract_objects(data)]
    match_objects(values, [opt])
    for v in opt.matches:
        out.write(v + "\n")
    return 0


def run_glob(pattern: str, keys: list[str], limit: int | None,
             out_path: str | None) -> int:
    from pyspark.sql import functions as F
    from jsonextract_spark.session import build_session
    from jsonextract_spark.functions.udfs import (
        extract_objects_udf, make_match_objects_udf)

    spark = build_session("jsonx")
    df = (spark.read.format("binaryFile").load(pattern)
          .select(F.col("path").alias("url"),
                  F.decode("content", "utf-8").alias("text")))
    objs = df.select("url", extract_objects_udf("text").alias("objs"))
    if keys:
        match = make_match_objects_udf([{"keys": keys, "limit": limit}])
        res = (objs.select("url", F.explode(match("objs")).alias("c"))
               .select("url", F.col("c.obj").alias("obj")))
    else:
        res = (objs.select("url",
                           F.posexplode("objs").alias("pos", "obj")))
        if limit is not None:
            from pyspark.sql import Window
            w = Window.partitionBy("url").orderBy("pos")
            res = (res.withColumn("rn", F.row_number().over(w))
                   .filter(F.col("rn") <= limit).drop("rn"))
        res = res.drop("pos")
    if out_path:
        res.write.mode("overwrite").parquet(out_path)
    else:
        for r in res.collect():
            print(r["obj"])
    spark.stop()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="jsonx")
    ap.add_argument("source", help="file path, URL, '-' for stdin")
    ap.add_argument("keys", nargs="*", help="require all keys present")
    ap.add_argument("-limit", "--limit", type=int, default=None)
    ap.add_argument("--glob", action="store_true",
                    help="treat source as a file glob; use Spark")
    ap.add_argument("--out", default=None, help="parquet output (glob mode)")
    args = ap.parse_args(argv)
    # Go flag semantics: -limit 0 (the default there) means unlimited
    limit = args.limit if args.limit and args.limit > 0 else None
    try:
        if args.glob:
            return run_glob(args.source, args.keys, limit, args.out)
        return run_single(args.source, args.keys, limit)
    except OSError as e:
        print(f"jsonx: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
