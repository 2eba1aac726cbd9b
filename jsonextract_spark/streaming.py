"""Structured Streaming surfaces.

The crawl itself is batch-incremental by design (checkpoint-resumable
rounds, SURVEY §2.5), but the extraction payload and the metrics layer
are also exposed as streams:

* ``stream_extract`` — continuous extraction over arriving page files:
  readStream -> Arrow extract UDF -> posexplode -> parquet sink with
  exactly-once file-source checkpointing.
* ``stream_event_counts`` — watermarked sliding-window aggregation over
  the events shape (late data handled by the watermark).
* ``stream_sessionize`` — a CUSTOM STATEFUL operator via
  ``applyInPandasWithState``: per-user session counting whose state
  (last event time, totals) lives in the streaming state store and
  survives restarts through the checkpoint.

All run with ``Trigger.AvailableNow`` in tests (drain-what-exists),
and unchanged as long-running streams in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from jsonextract_spark.functions.udfs import extract_objects_udf

PAGE_STREAM_SCHEMA = "url string, text string"


def stream_extract(spark: SparkSession, in_dir: str, out_dir: str,
                   checkpoint: str, fmt: str = "json"):
    """Watch ``in_dir`` for page files; append extracted values to
    ``out_dir``. Returns the StreamingQuery (AvailableNow trigger)."""
    pages = (spark.readStream.format(fmt)
             .schema(PAGE_STREAM_SCHEMA)
             .option("maxFilesPerTrigger", 64)
             .load(in_dir))
    out = (pages
           .withColumn("objs", extract_objects_udf("text"))
           .select("url", F.posexplode("objs").alias("pos", "obj")))
    return (out.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


SESSION_STATE_SCHEMA = "last_ts_us long, n_sessions long, n_events long"
SESSION_OUTPUT_SCHEMA = "user_id long, n_events long, n_sessions long"


def stream_sessionize(events: DataFrame, gap_sec: int = 600) -> DataFrame:
    """Stateful per-user sessionization over a streaming DataFrame with
    (user_id long, ts timestamp, event_id long).

    Custom stateful operator (``applyInPandasWithState``): per user we
    keep (last event micros, session count, event count) in the state
    store; a new session starts when the gap to the previous event
    exceeds ``gap_sec``. Each micro-batch emits the user's updated
    cumulative totals ("update" mode), and the state survives query
    restarts via the checkpoint — the same µs-exact gap rule as the
    batch q_sessionize query, so a single-user history replayed through
    any number of micro-batches (in event-time order; use watermarks
    upstream for late data) matches the batch computation.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_sec * 1_000_000

    def update(key, pdfs, state: GroupState):
        if state.exists:
            last_us, n_sessions, n_events = state.get
        else:
            last_us, n_sessions, n_events = None, 0, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        ts_us = (batch["ts"].astype("datetime64[us]").astype("int64")
                 .sort_values())
        for t in ts_us:
            t = int(t)
            if last_us is None or t - last_us > gap_us:
                n_sessions += 1
            last_us = t
            n_events += 1
        state.update((last_us, n_sessions, n_events))
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_events": [n_events],
                            "n_sessions": [n_sessions]})

    return (events
            .groupBy("user_id")
            .applyInPandasWithState(update, SESSION_OUTPUT_SCHEMA,
                                    SESSION_STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def stream_event_counts(events: DataFrame, window: str = "10 minutes",
                        slide: str | None = None,
                        watermark: str = "30 minutes") -> DataFrame:
    """Windowed per-type counts with a watermark for late rows. Input
    must be a streaming DataFrame with (ts timestamp, event_type string).
    """
    w = (F.window("ts", window, slide) if slide
         else F.window("ts", window))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(w.alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "event_type", "n"))
