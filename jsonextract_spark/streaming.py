"""Structured Streaming surfaces.

The crawl itself is batch-incremental by design (checkpoint-resumable
rounds, SURVEY §2.5), but the extraction payload and the metrics layer
are also exposed as streams:

* ``stream_extract`` — continuous extraction over arriving page files:
  readStream -> Arrow extract UDF -> posexplode -> parquet sink with
  exactly-once file-source checkpointing.
* ``stream_event_counts`` — watermarked sliding-window aggregation over
  the events shape (late data handled by the watermark).

Both run with ``Trigger.AvailableNow`` in tests (drain-what-exists),
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
