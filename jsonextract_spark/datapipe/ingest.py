"""Corpus ingestion: WARC shards → documents table.

The composition step between the crawl's archive and every datapipe
operator: ``read_warc`` (crawl/warc.py:232) supplies (url, warc_ts,
payload); this module decodes, extracts WET-style text with boilerplate
signals (datapipe/html_text.py), resolves the canonical URL identity
(functions/udfs.url_identity_udf — same fused UDF the crawl's link gate
uses, so an archived page and a crawled page can never hash apart), and
lands the analyzable columns the dedup/quality/tokenize operators
consume.

Plan shape — map-only, no shuffle, three Python crossings all riding
the same scan:

  binaryFile scan → mapInPandas(member walk) → ArrowEvalPython(url
  identity) → ArrowEvalPython(html→text) → ArrowEvalPython(langid)
  → JVM projections (lengths, token counts, densities)

At 100 TB this is the classic Common-Crawl WET build: embarrassingly
parallel over shards, output partitioning inherited from the input
listing, every downstream groupBy/join free to repartition as it needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def warc_to_documents(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC shards → DataFrame(url, url_hash, host, fetched_at,
    n_bytes, title, text, n_chars, n_tokens, lang, n_links,
    link_chars, link_density).

    Payloads decode as UTF-8 with replacement inside the text UDF (a
    crawl archive always contains some mojibake; Spark's JVM ``decode``
    raises on the first bad byte, so binary goes to Python directly).
    Rows whose URL fails canonicalization (url_identity contract:
    url=NULL) are dropped — they could never have entered a crawl
    frontier."""
    from jsonextract_spark.crawl.warc import read_warc
    from jsonextract_spark.datapipe.html_text import extract_text
    from jsonextract_spark.datapipe.textstats import langid_udf
    from jsonextract_spark.functions.udfs import url_identity_udf

    w = read_warc(spark, path_glob)
    pages = w.select(
        url_identity_udf("url").alias("_id"),
        F.col("warc_ts").alias("fetched_at"),
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.col("payload").alias("html"))
    docs = extract_text(pages, "html")
    return (docs
            .filter(F.col("_id.url").isNotNull())
            .select(
                F.col("_id.url").alias("url"),
                F.col("_id.url_hash").alias("url_hash"),
                F.col("_id.host").alias("host"),
                "fetched_at", "n_bytes", "title", "text",
                F.length("text").cast("bigint").alias("n_chars"),
                F.when(F.length("text") > 0,
                       F.size(F.split("text", "\\s+")))
                 .otherwise(F.lit(0)).cast("bigint").alias("n_tokens"),
                langid_udf("text").alias("lang"),
                "n_links", "link_chars", "link_density"))
