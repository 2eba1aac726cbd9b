"""Real HTTP fetch stage (production path for crawl/synth.py's slot).

`mapInPandas` batch fetcher: each task owns a politeness bucket of URLs
(the pipeline repartitions by salted host before calling this), fetches
sequentially within the task with a per-request delay — so per-host
politeness is enforced structurally by partitioning, not by a global
rate limiter. Browser-ish headers match the reference CLI
(/root/reference/cmd/jsonx/main.go:19-32, 64-87).

No external network exists in the sandbox; tests drive this against a
local http.server. On a cluster this is the drop-in fetch stage:
``pages = batch.repartition(N, host, salt).mapInPandas(
make_fetcher(...), FETCH_HTTP_SCHEMA)``.
"""

from __future__ import annotations

import time
from typing import Iterable, Iterator

import pandas as pd

FETCH_HTTP_SCHEMA = ("url string, status int, fetched_ts double,"
                     " html binary, text string, err string")

_HEADERS = {
    "User-Agent": "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
                  "(KHTML, like Gecko) Chrome/120.0 Safari/537.36",
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,"
              "*/*;q=0.8",
    "Accept-Language": "en-US,en;q=0.9",
}


def _fetch_one(url: str, timeout_sec: float,
               max_bytes: int) -> tuple[int, bytes, str | None]:
    """One isolated GET shared by both fetch stages: returns
    (status, body, err); failures never raise."""
    from urllib.request import Request, urlopen

    try:
        req = Request(url, headers=_HEADERS)
        with urlopen(req, timeout=timeout_sec) as resp:
            return resp.status, resp.read(max_bytes), None
    except Exception as e:  # noqa: BLE001 — per-url isolation
        return 0, b"", f"{type(e).__name__}: {e}"


def make_fetch_extract_kernel(timeout_sec: float = 30.0,
                              delay_sec: float = 0.0,
                              max_bytes: int = 4 << 20):
    """Compose the real HTTP fetcher with extraction + link discovery
    into the pipeline's fused kernel shape (synth.FETCH_EXTRACT_SCHEMA),
    so ``run_crawl(..., fetch_kernel=make_fetch_extract_kernel(...))``
    crawls live HTTP instead of the synthetic corpus. Failed fetches
    yield a row with n_objects=0 and no links (the crawl keeps going;
    the error detail lives in the fetched bytes=0 signal)."""
    import pandas as pd  # noqa: F811 (executor-side import)

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from jsonextract_spark.functions.udfs import (
            _budget, _links_from_objs)
        from jsonextract_spark.kernel.scanner import extract_objects_str

        for pdf in batches:
            texts, stamps, sizes = [], [], []
            for url in pdf["url"]:
                _status, body, _err = _fetch_one(url, timeout_sec,
                                                 max_bytes)
                sizes.append(len(body))  # bytes fetched, not chars
                texts.append(body.decode("utf-8", "replace"))
                stamps.append(time.time())
                if delay_sec:
                    time.sleep(delay_sec)
            objs = [extract_objects_str(t, work_budget=_budget(len(t)))
                    for t in texts]
            yield pd.DataFrame({
                "url": pdf["url"],
                "host": pdf["host"],
                # whole microseconds: float-seconds ns remainders fail
                # Arrow's safe cast to timestamp[us]
                "warc_ts": pd.to_datetime(
                    [int(s * 1e6) for s in stamps], unit="us"),
                "text": texts,
                "lang": "und",
                "depth": pdf["depth"],
                "batch_id": pdf["batch_id"],
                "rank": pdf["rank"],
                "n_objects": [len(o) for o in objs],
                "links": [_links_from_objs(o) for o in objs],
                "bytes": sizes,
            })

    return kernel


def make_fetcher(timeout_sec: float = 60.0, delay_sec: float = 0.0,
                 max_bytes: int = 4 << 20):
    """Build the mapInPandas kernel. ``delay_sec`` spaces requests inside
    a task (politeness within the host bucket)."""

    def fetch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "status": [], "fetched_ts": [],
                    "html": [], "text": [], "err": []}
            for url in pdf["url"]:
                status, body, err = _fetch_one(url, timeout_sec,
                                               max_bytes)
                rows["url"].append(url)
                rows["status"].append(status)
                rows["fetched_ts"].append(time.time())
                rows["html"].append(body)
                rows["text"].append(body.decode("utf-8", "replace"))
                rows["err"].append(err)
                if delay_sec:
                    time.sleep(delay_sec)
            yield pd.DataFrame(rows)

    return fetch
