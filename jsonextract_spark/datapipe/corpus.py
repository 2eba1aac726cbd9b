"""The end-to-end training-corpus build: WARC archive → filtered,
deduplicated, tokenized corpus.

This is the composition the whole datapipe exists for — the path a
user walks from "I have a crawl archive" to "I have training data":

  warc_to_documents (ingest.py)          WET text + signals
    → heuristic filters                   n_tokens, link_density
    → corpus-relative quality             rare_gram_quality
    → exact dedup                         hash-groupBy, min-id rep
    → (optional) MinHash near-dedup       banded LSH, capped buckets
    → learned BPE tokenization            distributed trainer

Every stage is an existing, individually-oracled operator; this module
only owns the plumbing and the bookkeeping (per-stage survivor counts
via Dataset.observe so the funnel costs zero extra actions).

Scale shape: the filters are codegen'd scans; rare_gram_quality
broadcasts its alphabet-bounded gram table; exact dedup shuffles a
16-byte key, never text; MinHash candidates are hot-bucket-capped; the
BPE trainer reduces the corpus to its Zipf-bounded word-frequency
table before any driver work. Nothing here collects document bytes to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def build_training_corpus(
        spark: SparkSession, warc_glob: str, *,
        min_tokens: int = 4,
        max_link_density: float = 0.5,
        max_rare_frac: float = 0.5,
        rare_max_count: int = 100,
        n_merges: int = 256,
        minhash_near_dedup: bool = False,
        jaccard_threshold: float = 0.8) -> tuple[DataFrame, dict]:
    """Returns (corpus, funnel) where ``corpus`` has one row per kept
    document — url, url_hash, host, fetched_at, title, text, lang,
    dup_count (collapsed exact duplicates), n_tokens (whitespace) and
    bpe_ids/bpe_n_tokens from merges learned on the surviving corpus —
    and ``funnel`` is a dict of per-stage survivor counts (filled by
    one Observation riding the corpus' first action; call
    ``funnel["get"]()`` after an action has run).

    ``minhash_near_dedup=True`` additionally drops near-duplicate
    CLUSTERS down to their min-hash representative via the banded-LSH
    pair generator (capped buckets — see dedup.py for the recall
    trade)."""
    from jsonextract_spark.datapipe.bpe import (
        learn_merges_distributed, make_bpe_udfs)
    from jsonextract_spark.datapipe.dedup import (
        exact_dedup, minhash_dedup_pairs)
    from jsonextract_spark.datapipe.ingest import warc_to_documents
    from jsonextract_spark.datapipe.textstats import rare_gram_quality

    docs = warc_to_documents(spark, warc_glob)

    kept = docs.filter((F.col("n_tokens") >= min_tokens)
                       & (F.col("link_density") <= max_link_density))
    rare = rare_gram_quality(kept, "text", rare_max_count=rare_max_count,
                             id_col="url_hash")
    # left join: a doc too short to have any n-gram has no rare row —
    # no grams means no rare grams, not an extra silent filter
    kept = (kept.join(rare.select("url_hash", "rare_frac"),
                      "url_hash", "left")
                .filter(F.coalesce(F.col("rare_frac"), F.lit(0.0))
                        <= max_rare_frac)
                .drop("rare_frac"))
    # the ingest lineage (WARC member walk + three Python UDF stages)
    # feeds every downstream branch — the dedup rep join, the optional
    # near-dedup band/verify joins, the BPE trainer's own action, and
    # the final corpus action. Persist once so it runs once; the
    # trainer action below materializes it. Callers can release it via
    # funnel["cleanup"]() once the corpus has been written/collected.
    kept = kept.persist()
    persisted = [kept]        # funnel["cleanup"] releases all of these

    reps = exact_dedup(kept, "text", "url_hash")
    corpus = kept.join(reps, "url_hash")   # keeps min-id rep per text

    if minhash_near_dedup:
        from jsonextract_spark.datapipe.graph import connected_components

        pairs = minhash_dedup_pairs(corpus, "text", "url_hash",
                                    threshold=jaccard_threshold)
        # transitive cluster resolution: ONE survivor (the min id) per
        # connected component of verified pairs — a pairwise
        # greatest-drop keeps every local minimum, i.e. can keep TWO
        # docs of one cluster when the pair between them never
        # band-collided (edges (1,5),(3,5) keep both 1 and 3)
        cc = connected_components(pairs, src_col="a", dst_col="b")
        losers = (cc.filter(F.col("node") != F.col("component"))
                  .select(F.col("node").alias("url_hash")))
        corpus = corpus.join(losers, "url_hash", "left_anti")

    merges = learn_merges_distributed(corpus, "text", n_merges=n_merges)
    ids_udf, count_udf = make_bpe_udfs(merges)
    corpus = corpus.withColumns({
        "bpe_ids": ids_udf("text"),
        "bpe_n_tokens": count_udf("text"),
    })

    obs = Observation("corpus_funnel")
    corpus = corpus.observe(
        obs,
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("dup_count").alias("collapsed_docs"),
        F.sum("bpe_n_tokens").alias("bpe_tokens"),
        F.sum(F.length("text")).alias("text_chars"))
    funnel = {"merges": merges, "get": lambda: dict(obs.get),
              "cleanup": lambda: [d.unpersist() for d in persisted]}
    return corpus, funnel
