"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction query at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator Spark vs DuckDB
cross-checks at sf0.01 (row count + schema + order-insensitive value
hash). Since r7 EVERY query is hash-oracled: q_simhash_pairs and
q_fingerprint — rows-only through r6 because their hashes need
wrapping 64-bit arithmetic — now have from-scratch DuckDB restatements
built on HUGEINT multiply-mod-2^64 (see the hash-oracle SQL generator
section). Their invariant-oracle twins (q_simhash_stable,
q_fingerprint_stable) and pytest pins (batch-partitioning-invariance
property, reference cross-check, murmur3 batch/scalar parity) remain
as independent checks of the same families.

Type discipline: every count/rank is cast to BIGINT on the Spark side
because DuckDB's COUNT/ROW_NUMBER produce BIGINT; ratios stay DOUBLE.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# JS page wrapper used by extraction queries: mixed notation (unquoted
# keys, single quotes, trailing comma) + one strict ld+json block + one
# decoy the extractor must reject (reader_test.go:700 semantics).
def _pages_from_docs(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "page",
        F.concat(
            F.lit('<script type="application/ld+json">{"@type": "Doc", "pid": '),
            F.col("doc_id"), F.lit("}</script>"),
            F.lit("<script>var cfg = {id: "), F.col("doc_id"),
            F.lit(", lang: '"), F.col("lang"),
            F.lit("', src: '"), F.col("source"),
            F.lit("', };\nvar broken = {oops: 1+1 };</script>"),
            F.col("text")))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages -> extract -> posexplode -> key filter -> top-1 per
    doc (the reference CLI's `jsonx <src> key1 key2 -limit 1` shape,
    cmd/jsonx/main.go:100-135)."""
    from jsonextract_spark.functions.udfs import extract_objects_udf

    docs = _docs(spark, "/root/testdata/sf0.001")
    pages = _pages_from_docs(docs)
    exploded = (pages
                .select("doc_id",
                        F.posexplode(extract_objects_udf("page"))
                        .alias("pos", "obj")))
    keyed = exploded.filter(
        F.get_json_object("obj", "$.id").isNotNull() &
        F.get_json_object("obj", "$.lang").isNotNull())
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (keyed.withColumn("rn", F.row_number().over(w))
                 .filter("rn = 1")
                 .select("doc_id", "pos", "obj"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_extract_props(spark, sf_dir):
    from jsonextract_spark.functions.udfs import extract_objects_udf

    ev = _events(spark, sf_dir)
    return (ev.select("event_id",
                      F.element_at(extract_objects_udf("props"), 1)
                      .alias("obj"))
              .select("event_id",
                      F.get_json_object("obj", "$.k").cast("bigint")
                      .alias("k")))


def _q_extract_js_roundtrip(spark, sf_dir):
    from jsonextract_spark.functions.udfs import extract_objects_udf

    pages = _pages_from_docs(_docs(spark, sf_dir))
    return (pages
            .select("doc_id",
                    F.element_at(extract_objects_udf("page"), 2).alias("obj"))
            .select("doc_id",
                    F.get_json_object("obj", "$.id").cast("bigint")
                    .alias("id2"),
                    F.get_json_object("obj", "$.lang").alias("lang2"),
                    F.get_json_object("obj", "$.src").alias("src2")))


def _q_extract_object_counts(spark, sf_dir):
    from jsonextract_spark.functions.udfs import extract_objects_udf

    pages = _pages_from_docs(_docs(spark, sf_dir))
    return (pages
            .select("lang", F.size(extract_objects_udf("page")).alias("n"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.sum("n").cast("bigint").alias("total_objs"))
            .select("lang", "docs", "total_objs"))


def _q_topk_per_type(spark, sf_dir):
    from jsonextract_spark.crawl.scheduler import salted_top_k_per_group

    ev = _events(spark, sf_dir)
    order = [F.col("value").desc(), F.col("event_id").asc()]
    top = salted_top_k_per_group(ev, ["event_type"], order, k=3,
                                 salt_on="event_id")
    return top.select("event_type", "event_id", "value",
                      F.col("rank_in_group").cast("bigint").alias("rnk"))


def _q_customers_without_orders(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey,
                      "left_anti")
            .select("c_custkey"))


def _q_frontier_union(spark, sf_dir):
    ev = _events(spark, sf_dir).select(F.col("user_id").alias("id"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select(F.col("o_custkey").alias("id"))
    return ev.unionByName(orders).distinct()


def _q_order_rank_window(spark, sf_dir):
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (orders.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter("rnk <= 2")
            .select("o_orderkey", "o_custkey", "o_totalprice", "rnk"))


def _q_lang_metrics(spark, sf_dir):
    return (_docs(spark, sf_dir)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.sum("n_chars").cast("bigint").alias("total_chars")))


def _q_region_order_stats(spark, sf_dir):
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = (region.join(nation,
                       region.r_regionkey == nation.n_regionkey)
           .select("n_nationkey", "r_name"))
    return (orders
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(dim), cust.c_nationkey == dim.n_nationkey)
            .groupBy("r_name")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("decimal(28,2)").alias("total_price")))


def _q_exact_dedup(spark, sf_dir):
    from jsonextract_spark.datapipe.dedup import exact_dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 100000))
    out = exact_dedup(doubled, "text", "doc_id")
    return out.select("doc_id", F.col("dup_count").cast("bigint")
                      .alias("dup_count"))


def _q_token_stats(spark, sf_dir):
    from jsonextract_spark.datapipe.textstats import (
        char_count, token_count)

    docs = _docs(spark, sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).cast("bigint").alias("n_tokens"),
        char_count(t, "e").cast("bigint").alias("n_e"))


def _q_quality(spark, sf_dir):
    """The quality_features operator itself (all JVM built-ins), with
    the SQL-expressible feature columns oracle-checked."""
    from jsonextract_spark.datapipe.textstats import quality_features

    docs = _docs(spark, sf_dir)
    feats = quality_features(docs, "text")
    return feats.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("space_ratio").cast("double").alias("space_ratio"),
        F.col("digit_ratio").cast("double").alias("digit_ratio"),
        F.col("punct_ratio").cast("double").alias("punct_ratio"),
        F.col("stopword_hits").cast("bigint").alias("stopword_hits"))


def _q_ann_topk(spark, sf_dir):
    from jsonextract_spark.datapipe.similarity import brute_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.filter("vec_id < 5")
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    corpus = emb.filter("vec_id >= 5")
    out = brute_topk(corpus, queries, k=5)
    return out.select("query_id", "neighbor_id",
                      F.col("rank").cast("bigint").alias("rnk"))


def _q_crawl_reachable(spark, sf_dir):
    """BFS closure (depth<=2) over the synthetic affine link graph from
    doc_id<10 seeds — the relational heart of the crawl (anti-join +
    union + min-depth), oracle'd by DuckDB WITH RECURSIVE."""
    seeds = (_docs(spark, sf_dir).filter("doc_id < 10")
             .select(F.col("doc_id").cast("bigint").alias("id"))
             .withColumn("depth", F.lit(0).cast("bigint")))
    u = 100000
    frontier = seeds
    reach = seeds
    for d in (1, 2):
        nxt = (frontier.select(F.explode(F.array(
            (F.col("id") * 7 + 1) % u,
            (F.col("id") * 7 + 2) % u,
            (F.col("id") * 13 + 5) % u,
            (F.col("id") * 31 + 11) % u)).alias("id"))
            .distinct()
            .join(reach.select("id"), "id", "left_anti")
            .withColumn("depth", F.lit(d).cast("bigint")))
        reach = reach.unionByName(nxt)
        frontier = nxt
    return reach.groupBy("id").agg(F.min("depth").alias("depth"))


def _q_bpe_tokens(spark, sf_dir):
    """BPE-ish regex tokenization (letters runs / digit runs / single
    punctuation) — JVM-side regexp, cross-checked against DuckDB RE2."""
    docs = _docs(spark, sf_dir)
    pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
        .cast("bigint").alias("n_bpe_tokens"))


def _q_bpe_real(spark, sf_dir):
    """REAL byte-level BPE (datapipe/bpe.py): the merge table is
    LEARNED from a seeded bounded sample of this corpus (classic
    greedy pair-frequency BPE, deterministic tie-breaks), then every
    document is encoded with rank-ordered merges. Two independent exact
    checks: (a) decode(encode(text)) must equal text byte-for-byte
    (base vocab = all 256 bytes), (b) the corpus's word vocabulary is
    small enough that training SATURATES — every space-prefixed word
    becomes exactly one token — so the token count must equal the word
    count, which DuckDB computes with no BPE at all. The reference repo
    has no tokenizer; this is an LLM-datapipe operator the brief adds
    beyond it."""
    from jsonextract_spark.datapipe.bpe import (
        learn_merges_from_df, make_bpe_roundtrip_udf, make_bpe_udfs)

    docs = _docs(spark, sf_dir)
    merges = learn_merges_from_df(docs, "text", n_merges=4096,
                                  sample_docs=2000)
    _ids_udf, count_udf = make_bpe_udfs(merges)
    roundtrip_udf = make_bpe_roundtrip_udf(merges)
    return docs.select(
        "doc_id",
        roundtrip_udf("text").alias("roundtrip_ok"),
        count_udf("text").alias("n_tokens"))


def _q_embed_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs: corpus ∪ exact copy (ids+10000)
    → pairs with cosine ≥ 0.999 (the planted copies), found through the
    LSH-bucketed equi-join (identical vectors always share every bucket,
    so recall on the copies is exact). The DuckDB oracle stays the
    all-pairs form — the cheap-at-sf0.01 ground truth the bucketed plan
    must reproduce."""
    from jsonextract_spark.datapipe.similarity import embedding_dup_pairs

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding"))
    # cap=None: the oracle is an EXACT all-pairs DuckDB restatement,
    # so the scale-path hot-bucket cap (lossy by design on >cap
    # clusters) must be off for the comparison to hold at any sf
    return (embedding_dup_pairs(corpus, "vec_id", "embedding",
                                max_docs_per_bucket=None,
                                threshold=0.999)
            .select("a", "b"))


def _q_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microsecond gaps (exact), matching DuckDB epoch_us(ts) —
    # unix_timestamp() would truncate and flip borderline gaps
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    return (ev.withColumn("new_sess",
                          F.when(gap.isNull() | (gap > 600_000_000), 1)
                          .otherwise(0))
            .groupBy("user_id")
            .agg(F.sum("new_sess").cast("bigint").alias("n_sessions")))


def _q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH candidates + exact-Jaccard verify. Oracle'd by an
    all-pairs inverted-index Jaccard in DuckDB — a hash-match proves the
    LSH band recall was 100% at this threshold AND the verify math is
    right (UTF-8 byte 5-shingle sets incl. short-text space padding,
    |A∩B|/|A∪B|)."""
    from jsonextract_spark.datapipe.dedup import (minhash_candidate_pairs,
                                                  minhash_dedup_pairs)

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    # plant exact + near duplicates: identical copy and a one-word edit
    near = docs.filter("doc_id % 25 = 0").select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"))
    dup = docs.filter("doc_id % 25 = 0").select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text")
    corpus = docs.unionByName(near).unionByName(dup)
    # cap=None: exact-oracle comparison (see _q_embed_dup note)
    return (minhash_dedup_pairs(corpus, "text", "doc_id", threshold=0.8,
                                pairs=minhash_candidate_pairs(
                                    corpus, "text", "doc_id",
                                    max_docs_per_bucket=None))
            .select("a", "b", F.round("jaccard", 4).alias("jaccard")))


# -- hash-family queries (rows-only through r6; oracled since r7 via the
# HUGEINT SQL generators further down) ---------------------------------------


def _q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup candidate pairs. Oracled since r7: combination
    blocking has EXACT recall at the hamming threshold (pigeonhole),
    so the output equals the all-pairs hamming≤3 set the DuckDB oracle
    computes from its own from-scratch simhash (HUGEINT wrapping
    arithmetic) — a full value-level check of tokenization, token
    hashing, bit-majority packing, blocking recall, and the verify
    filter at once."""
    from jsonextract_spark.datapipe.dedup import simhash_candidates

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dup = docs.filter("doc_id % 25 = 0").select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text")
    corpus = docs.unionByName(dup)
    # cap=None: exact-oracle comparison (see _q_embed_dup note)
    return (simhash_candidates(corpus, "text", "doc_id", max_hamming=3,
                               max_docs_per_bucket=None)
            .select("a", "b", F.col("hamming").cast("bigint")
                    .alias("hamming")))


def _q_langid(spark, sf_dir):
    """Heuristic stopword language-ID (Arrow UDF). The model is small
    enough to restate exactly in SQL (list_filter scoring + argmax with
    sorted-key tie-break + CJK fallback), so it IS oracle-able."""
    from jsonextract_spark.datapipe.textstats import langid_udf

    return (_docs(spark, sf_dir)
            .select("doc_id", "lang", langid_udf("text").alias("lang_pred")))


def _q_lsh_ann(spark, sf_dir):
    """LSH-bucketed ANN, projected to the rank-1 invariant: queries are
    corpus members, and cosine(x,x)=1 beats every other candidate, so the
    top-1 neighbor of each query must be itself regardless of which other
    vectors happen to share a bucket. That invariant is exact SQL (the
    oracle); the full k=5 ranking stays pinned in pytest."""
    from jsonextract_spark.datapipe.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.filter("vec_id < 5")
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return (lsh_topk(emb, queries, k=5, n_tables=8)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("bigint").alias("rnk"))
            .filter(F.col("rnk") == 1))


def _q_ngram_jaccard(spark, sf_dir):
    """Word-3-gram Jaccard near-dup pairs via the inverted-index join.
    The driver slice disables the stop-gram cap (max_docs_per_token high
    enough that nothing drops) so the DuckDB oracle is the plain
    all-pairs gram jaccard; the capped path is pinned in pytest."""
    from jsonextract_spark.datapipe.dedup import ngram_jaccard_pairs

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dup = docs.filter("doc_id % 25 = 0").select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text")
    near = docs.filter("doc_id % 25 = 5").select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail words here")).alias("text"))
    corpus = docs.unionByName(dup).unionByName(near)
    return (ngram_jaccard_pairs(corpus, "text", "doc_id", n=3,
                                threshold=0.5,
                                max_docs_per_token=10_000_000)
            .select("a", "b", F.round("jaccard", 4).alias("jaccard")))


def _q_fingerprint_stable(spark, sf_dir):
    """The fingerprint's documented invariant, machine-checked: the
    64-bit doc fingerprint is stable under case changes and whitespace
    reflow (fp lowercases and whitespace-normalizes before hashing), and
    changes when the text actually changes."""
    from jsonextract_spark.datapipe.textstats import fingerprint_udf

    docs = _docs(spark, sf_dir)
    reflowed = F.upper(F.replace(F.col("text"), F.lit(" "), F.lit("  ")))
    changed = F.concat(F.col("text"), F.lit(" zzz"))
    return docs.select(
        "doc_id",
        (fingerprint_udf("text") == fingerprint_udf(reflowed))
        .alias("stable"),
        (fingerprint_udf("text") != fingerprint_udf(changed))
        .alias("sensitive"))


def _q_multimodal_real(spark, sf_dir):
    """The REAL image codec path (datapipe/codecs.py — netpbm P6 parse
    + pixel feature extraction, no fake hashing anywhere): solid-color
    P6 payloads are built per doc_id, so every pixel-derived feature
    has a closed form DuckDB can compute from doc_id alone — channel
    means r/255, zero std, exact aspect ratio, and the full-mass
    histogram bin. Feature values are float32, so the compare uses
    float32-EXACT representations only: mean*255 rounded to the integer
    channel value (|f32(r/255)*255 - r| <= 2e-5, so round-to-int is
    exact; rounding r/255 itself to 6 digits is NOT safe — f32 error
    crosses the half-boundary for 18/500 docs), plus std 0.0 and the
    small-rational aspect ratios, both exactly representable."""
    import numpy as np
    import pandas as pd

    from jsonextract_spark.datapipe import codecs
    from jsonextract_spark.datapipe.multimodal import (
        MEDIA_SCHEMA, decode_features)

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            payloads, ws, hs = [], [], []
            for i in ids:
                w, h = 2 + i % 3, 1 + i % 2
                img = np.empty((h, w, 3), dtype=np.uint8)
                img[..., 0] = i % 256
                img[..., 1] = (7 * i) % 256
                img[..., 2] = (13 * i) % 256
                payloads.append(codecs.encode_ppm(img))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({
                "doc_id": ids, "media_type": "image/ppm",
                "payload": payloads, "width": ws, "height": hs,
                "n_frames": 1})

    media = docs.mapInPandas(gen, MEDIA_SCHEMA)
    feats = decode_features(media, decode_mode="real")
    bin_r = (F.pmod(F.col("doc_id"), F.lit(256)) / 32).cast("int") + 1
    def chan(idx, name):
        return F.round(F.element_at("feat", idx).cast("double") * 255,
                       0).alias(name)

    return feats.select(
        "doc_id", "ok",
        chan(25, "chan_r"), chan(26, "chan_g"), chan(27, "chan_b"),
        F.element_at("feat", 28).cast("double").alias("std_r"),
        F.element_at("feat", 32).cast("double").alias("aspect"),
        (F.element_at("feat", bin_r) == F.lit(1.0)).alias("hist_solid"))


def _q_png_real(spark, sf_dir):
    """The REAL PNG codec path (datapipe/codecs.py parse_png — stdlib
    zlib inflate + per-scanline unfilter, r7): solid-color payloads
    are assembled HERE straight from the PNG spec (struct + zlib, not
    via the codec's own encoder), with scanline y filtered as type
    y % 5 — so every doc with h=8 routes all five filter types
    (None/Sub/Up/Average/Paeth) through the decoder before the
    closed-form features DuckDB recomputes from doc_id can match.
    Feature exactness discipline is q_multimodal_real's: channel
    means round-to-int, std 0.0, aspect ratios kept to w / 2^k so
    float32 holds them exactly."""
    import struct
    import zlib

    import numpy as np
    import pandas as pd

    from jsonextract_spark.datapipe.multimodal import (
        MEDIA_SCHEMA, decode_features)

    docs = _docs(spark, sf_dir).select("doc_id")

    def filt_rows(img: "np.ndarray") -> bytes:
        """Filter scanlines per the PNG spec, type = y % 5."""
        h, stride = img.shape[0], img.shape[1] * 3
        flat = img.reshape(h, stride).astype(int)
        prev = [0] * stride
        out = []
        for y in range(h):
            f = y % 5
            rec = flat[y].tolist()
            raw = bytearray()
            for x in range(stride):
                a = rec[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else \
                        b if pb <= pc else c
                raw.append((rec[x] - pred) & 0xFF)
            out.append(bytes([f]) + bytes(raw))
            prev = rec
        return b"".join(out)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            payloads, ws, hs = [], [], []
            for i in ids:
                w, h = 3 + i % 4, (1, 2, 8)[i % 3]
                img = np.empty((h, w, 3), dtype=np.uint8)
                img[..., 0] = i % 256
                img[..., 1] = (7 * i) % 256
                img[..., 2] = (13 * i) % 256
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                payloads.append(
                    b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(filt_rows(img)))
                    + chunk(b"IEND", b""))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({
                "doc_id": ids, "media_type": "image/png",
                "payload": payloads, "width": ws, "height": hs,
                "n_frames": 1})

    media = docs.mapInPandas(gen, MEDIA_SCHEMA)
    feats = decode_features(media, decode_mode="real")
    bin_r = (F.pmod(F.col("doc_id"), F.lit(256)) / 32).cast("int") + 1

    def chan(idx, name):
        return F.round(F.element_at("feat", idx).cast("double") * 255,
                       0).alias(name)

    return feats.select(
        "doc_id", "ok",
        chan(25, "chan_r"), chan(26, "chan_g"), chan(27, "chan_b"),
        F.element_at("feat", 28).cast("double").alias("std_r"),
        F.element_at("feat", 32).cast("double").alias("aspect"),
        (F.element_at("feat", bin_r) == F.lit(1.0)).alias("hist_solid"))


def _q_jpeg_real(spark, sf_dir):
    """The REAL baseline-JPEG codec path (datapipe/jpeg.py — from-spec
    Huffman entropy decode, dequant, IDCT, late r7): flat grayscale
    payloads encoded with an all-8 quantization table quantize
    LOSSLESSLY (DC of a flat block of value v-128 is exactly
    8(v-128)), so the decoded image equals the input EXACTLY and
    every feature has a closed form DuckDB computes from doc_id alone
    — the expectation comes from arithmetic, not from either side of
    the codec, so a mutually-cancelling encoder/decoder bug cannot
    pass. Dimensions 8x8 / 16x8 keep aspect ratios float32-exact.
    Odd doc_ids take the PROGRESSIVE stream (three scans: DC at Al=1,
    spectral AC, DC refinement — flat blocks stay lossless there
    too), so the driver's gate certifies both entropy-decode paths."""
    import numpy as np
    import pandas as pd

    from jsonextract_spark.datapipe import jpeg as jpeg_mod
    from jsonextract_spark.datapipe.multimodal import (
        MEDIA_SCHEMA, decode_features)

    docs = _docs(spark, sf_dir).select("doc_id")
    q8 = np.full((8, 8), 8, np.int32)

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            payloads, ws = [], []
            for i in ids:
                v, w = i % 256, 8 * (1 + i % 2)
                img = np.full((8, w), v, dtype=np.uint8)
                enc = (jpeg_mod.encode_jpeg_progressive_gray
                       if i % 2 else
                       lambda im, qtable: jpeg_mod.encode_jpeg(
                           im, qtable=qtable, gray=True))
                payloads.append(enc(img, qtable=q8))
                ws.append(w)
            yield pd.DataFrame({
                "doc_id": ids, "media_type": "image/jpeg",
                "payload": payloads, "width": ws, "height": 8,
                "n_frames": 1})

    media = docs.mapInPandas(gen, MEDIA_SCHEMA)
    feats = decode_features(media, decode_mode="real")
    bin_v = (F.pmod(F.col("doc_id"), F.lit(256)) / 32).cast("int") + 1

    def chan(idx, name):
        return F.round(F.element_at("feat", idx).cast("double") * 255,
                       0).alias(name)

    return feats.select(
        "doc_id", "ok",
        chan(25, "chan_r"), chan(26, "chan_g"), chan(27, "chan_b"),
        F.element_at("feat", 28).cast("double").alias("std_r"),
        F.element_at("feat", 32).cast("double").alias("aspect"),
        (F.element_at("feat", bin_v) == F.lit(1.0)).alias("hist_solid"))


def _gif_lzw_flat(v: int, npix: int) -> bytes:
    """Spec-assembled LZW for a solid frame of index ``v``: a CLEAR
    code before every literal keeps the decoder's dictionary empty and
    the code width pinned at 3 bits (mcs=2) — the classic
    uncompressed-GIF trick, trivially bit-packable here WITHOUT using
    the gif module's own encoder (oracle independence, same discipline
    as q_png_real's spec-assembled payloads)."""
    codes = [4]                       # CLEAR (mcs=2 -> clear=4, eoi=5)
    for px in range(npix):
        codes.append(v)
        if px != npix - 1:
            codes.append(4)
    codes.append(5)                   # EOI
    acc = nbits = 0
    out = bytearray()
    for c in codes:                   # LSB-first packing per the spec
        acc |= c << nbits
        nbits += 3
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_payload(i: int) -> tuple[bytes, int, int, int]:
    """Animated GIF payload assembled straight from the GIF89a spec
    (struct + the flat-LZW helper): frame 1 is solid color index 0;
    frames 2..n are FULLY TRANSPARENT overlays (GCE transparent
    index drawn everywhere), so every rendered canvas equals frame 1
    and the features/frame bytes have closed forms from doc_id alone.
    h=8 docs set the interlace flag on frame 1 (row-permutation of a
    solid frame is content-invariant; random-frame interlace
    correctness is pinned in pytest). Colors stay in 1..127 so the
    frame-hash oracle can rebuild the P6 bytes with ASCII-safe
    chr() in DuckDB. Returns (payload, w, h, n_frames)."""
    import struct as _st

    w, h = 3 + i % 4, (1, 2, 8)[i % 3]
    r, g, b = 1 + i % 127, 1 + (7 * i) % 127, 1 + (13 * i) % 127
    n = 1 + i % 3
    out = bytearray(b"GIF89a")
    out += _st.pack("<HH", w, h)
    out += bytes([0x80 | 1, 0, 0])    # 4-entry GCT, bg index 0
    out += bytes([r, g, b, 0, 0, 0, 10, 20, 30, 40, 50, 60])
    lzw0 = _gif_lzw_flat(0, w * h)
    lzw1 = _gif_lzw_flat(1, w * h)
    for f in range(n):
        if f > 0:                     # GCE: transparent index 1
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 1, 0])
        out += b"\x2C" + _st.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if (h == 8 and f == 0) else 0])
        body = lzw1 if f > 0 else lzw0
        out += bytes([2, len(body)]) + body + b"\x00"
    out += b"\x3B"
    return bytes(out), w, h, n


def _gif_media(spark, sf_dir, limit: int | None = None):
    import pandas as pd

    from jsonextract_spark.datapipe.multimodal import MEDIA_SCHEMA

    docs = _docs(spark, sf_dir).select("doc_id")
    if limit is not None:
        docs = docs.filter(F.col("doc_id") < limit)

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            payloads, ws, hs, ns = [], [], [], []
            for i in ids:
                payload, w, h, n = _gif_payload(int(i))
                payloads.append(payload)
                ws.append(w)
                hs.append(h)
                ns.append(n)
            yield pd.DataFrame({
                "doc_id": ids, "media_type": "image/gif",
                "payload": payloads, "width": ws, "height": hs,
                "n_frames": ns})

    return docs.mapInPandas(gen, MEDIA_SCHEMA)


def _q_gif_real(spark, sf_dir):
    """The REAL GIF codec path (datapipe/gif.py — LZW, palettes,
    transparency, disposal, interlace, animation, r8): spec-assembled
    animated payloads (see _gif_payload) route global color table +
    transparency GCEs + interlacing through the decoder; features come
    from the first rendered frame, whose solid color gives exact
    closed forms (mean*255 = palette channel, std 0, aspect w / 2^k
    float32-exact, full histogram mass in one bin)."""
    from jsonextract_spark.datapipe.multimodal import decode_features

    media = _gif_media(spark, sf_dir)
    feats = decode_features(media, decode_mode="real")
    bin_r = ((1 + F.pmod(F.col("doc_id"), F.lit(127))) / 32) \
        .cast("int") + 1

    def chan(idx, name):
        return F.round(F.element_at("feat", idx).cast("double") * 255,
                       0).alias(name)

    return feats.select(
        "doc_id", "ok",
        chan(25, "chan_r"), chan(26, "chan_g"), chan(27, "chan_b"),
        F.element_at("feat", 28).cast("double").alias("std_r"),
        F.element_at("feat", 32).cast("double").alias("aspect"),
        (F.element_at("feat", bin_r) == F.lit(1.0)).alias("hist_solid"))


def _q_gif_frames(spark, sf_dir):
    """Real animated-GIF frame sampling (r8): sample_frames
    decode_mode='real' decodes the spec-assembled animations through
    datapipe/gif.py, takes n from the PARSED frame list, and emits
    each sampled canvas as canonical P6 bytes — every canvas equals
    the solid first frame, so DuckDB rebuilds the exact P6 byte
    string from doc_id (ASCII-safe colors) and hashes it."""
    from jsonextract_spark.datapipe.multimodal import sample_frames

    media = _gif_media(spark, sf_dir, limit=100)
    sf = sample_frames(media, k=4, decode_mode="real")
    return sf.select(
        "doc_id",
        F.col("sample_no").cast("long").alias("sample_no"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.substring(F.sha2(F.col("frame"), 256), 1, 16).alias("pfx"))


def _q_bmp_real(spark, sf_dir):
    """The REAL BMP/ICO codec path (datapipe/codecs.py, r8 — the
    favicon formats): solid-color payloads rotate through four
    container forms by doc_id (24-bit bottom-up, 24-bit top-down,
    8-bit palette, classic doubled-height ICO DIB), so row order,
    padding, palette indexing and the ICO container all route through
    the decoder before the closed-form features DuckDB recomputes from
    doc_id can match. Exactness discipline as q_png_real: solid color
    => mean*255 = channel exactly, std 0, aspect w / 2^k
    float32-exact, full histogram mass in one bin."""
    import numpy as np
    import pandas as pd

    from jsonextract_spark.datapipe import codecs
    from jsonextract_spark.datapipe.multimodal import (
        MEDIA_SCHEMA, decode_features)

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            payloads, ws, hs, types = [], [], [], []
            for i in ids:
                i = int(i)
                w, h = 3 + i % 4, (1, 2, 8)[i % 3]
                rgb = np.array([i % 256, (7 * i) % 256, (13 * i) % 256],
                               np.uint8)
                img = np.broadcast_to(rgb, (h, w, 3)).astype(np.uint8)
                form = i % 4
                if form == 0:
                    payloads.append(codecs.encode_bmp(img))
                    types.append("image/bmp")
                elif form == 1:
                    payloads.append(codecs.encode_bmp(img,
                                                      topdown=True))
                    types.append("image/bmp")
                elif form == 2:
                    pal = np.zeros((4, 3), np.uint8)
                    pal[2] = rgb
                    idx = np.full((h, w), 2, np.uint8)
                    payloads.append(codecs.encode_bmp_pal8(idx, pal))
                    types.append("image/bmp")
                else:
                    payloads.append(codecs.encode_ico_bmp(img))
                    types.append("image/x-icon")
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({
                "doc_id": ids, "media_type": types,
                "payload": payloads, "width": ws, "height": hs,
                "n_frames": 1})

    media = docs.mapInPandas(gen, MEDIA_SCHEMA)
    feats = decode_features(media, decode_mode="real")
    bin_r = (F.pmod(F.col("doc_id"), F.lit(256)) / 32).cast("int") + 1

    def chan(idx, name):
        return F.round(F.element_at("feat", idx).cast("double") * 255,
                       0).alias(name)

    return feats.select(
        "doc_id", "ok",
        chan(25, "chan_r"), chan(26, "chan_g"), chan(27, "chan_b"),
        F.element_at("feat", 28).cast("double").alias("std_r"),
        F.element_at("feat", 32).cast("double").alias("aspect"),
        (F.element_at("feat", bin_r) == F.lit(1.0)).alias("hist_solid"))


def _q_tiff_real(spark, sf_dir):
    """The REAL TIFF codec path (datapipe/tiff.py, r9): solid-color
    payloads rotate through four container forms by doc_id — RGB
    little-endian uncompressed, RGB big-endian PackBits with 1-row
    strips, WhiteIsZero grayscale PackBits (plane stored inverted so
    decode returns the closed-form gray), and 8-bit palette — so byte
    order, strip assembly, PackBits, photometric inversion and the
    ColorMap high-byte reduction all route through the decoder before
    the features DuckDB recomputes from doc_id can match. Exactness
    discipline as q_bmp_real: solid color ⇒ mean*255 = channel, std 0,
    aspect w / 2^k float32-exact, full histogram mass in one bin."""
    import numpy as np
    import pandas as pd

    from jsonextract_spark.datapipe.multimodal import (
        MEDIA_SCHEMA, decode_features)
    from jsonextract_spark.datapipe.tiff import encode_tiff

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            payloads, ws, hs = [], [], []
            for i in ids:
                i = int(i)
                w, h = 3 + i % 4, (1, 2, 8)[i % 3]
                g = i % 256
                rgb = np.array([g, (7 * i) % 256, (13 * i) % 256],
                               np.uint8)
                img = np.broadcast_to(rgb, (h, w, 3)).astype(np.uint8)
                form = i % 4
                if form == 0:
                    payloads.append(encode_tiff(img, byte_order="<"))
                elif form == 1:
                    payloads.append(encode_tiff(
                        img, byte_order=">", compression=32773,
                        rows_per_strip=1))
                elif form == 2:
                    inv = np.full((h, w), 255 - g, np.uint8)
                    payloads.append(encode_tiff(
                        inv, photometric=0, compression=32773))
                else:
                    pal = np.zeros((256, 3), np.uint8)
                    pal[2] = rgb
                    idx = np.full((h, w), 2, np.uint8)
                    payloads.append(encode_tiff(idx, photometric=3,
                                                palette=pal))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({
                "doc_id": ids, "media_type": "image/tiff",
                "payload": payloads, "width": ws, "height": hs,
                "n_frames": 1})

    media = docs.mapInPandas(gen, MEDIA_SCHEMA)
    feats = decode_features(media, decode_mode="real")
    bin_r = (F.pmod(F.col("doc_id"), F.lit(256)) / 32).cast("int") + 1

    def chan(idx, name):
        return F.round(F.element_at("feat", idx).cast("double") * 255,
                       0).alias(name)

    return feats.select(
        "doc_id", "ok",
        chan(25, "chan_r"), chan(26, "chan_g"), chan(27, "chan_b"),
        F.element_at("feat", 28).cast("double").alias("std_r"),
        F.element_at("feat", 32).cast("double").alias("aspect"),
        (F.element_at("feat", bin_r) == F.lit(1.0)).alias("hist_solid"))


def _q_webp_real(spark, sf_dir):
    """The REAL WebP-lossless codec path (datapipe/webp.py, r9 —
    from-spec VP8L: RIFF container, transforms, meta-Huffman, color
    cache, LZ77 plane codes): solid-color payloads rotate through SIX
    encode forms by doc_id (plain literals, subtract-green, predictor
    mode 2, color-indexing with bundling, color cache, whole-row LZ77
    backrefs), so every decoder branch routes real bytes before the
    closed-form features DuckDB recomputes from doc_id can match.
    Exactness discipline as q_bmp_real: solid color => mean*255 =
    channel exactly, std 0, aspect w / 2^k float32-exact, full
    histogram mass in one bin."""
    import numpy as np
    import pandas as pd

    from jsonextract_spark.datapipe.multimodal import (
        MEDIA_SCHEMA, decode_features)
    from jsonextract_spark.datapipe.webp import encode_webp_lossless

    docs = _docs(spark, sf_dir).select("doc_id")
    forms = ({}, {"subtract_green": True}, {"predictor_mode": 2},
             {"palette": True}, {"cache_bits": 4},
             {"row_backrefs": True})

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            payloads, ws, hs = [], [], []
            for i in ids:
                i = int(i)
                w, h = 3 + i % 4, (1, 2, 8)[i % 3]
                rgb = np.array([i % 256, (7 * i) % 256,
                                (13 * i) % 256], np.uint8)
                img = np.broadcast_to(rgb, (h, w, 3)).astype(np.uint8)
                payloads.append(
                    encode_webp_lossless(img, **forms[i % 6]))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({
                "doc_id": ids, "media_type": "image/webp",
                "payload": payloads, "width": ws, "height": hs,
                "n_frames": 1})

    media = docs.mapInPandas(gen, MEDIA_SCHEMA)
    feats = decode_features(media, decode_mode="real")
    bin_r = (F.pmod(F.col("doc_id"), F.lit(256)) / 32).cast("int") + 1

    def chan(idx, name):
        return F.round(F.element_at("feat", idx).cast("double") * 255,
                       0).alias(name)

    return feats.select(
        "doc_id", "ok",
        chan(25, "chan_r"), chan(26, "chan_g"), chan(27, "chan_b"),
        F.element_at("feat", 28).cast("double").alias("std_r"),
        F.element_at("feat", 32).cast("double").alias("aspect"),
        (F.element_at("feat", bin_r) == F.lit(1.0)).alias("hist_solid"))


def _q_audio_real(spark, sf_dir):
    """The REAL audio codec path (RIFF/WAVE 16-bit PCM parse + sample
    features): two-sample payloads [a, -a] with a = doc_id % 32768 at
    rate 8192 Hz make every selected feature float32-EXACT — a/32768 is
    a <=15-bit mantissa times 2^-15, duration 2/8192 = 2^-12 — so
    DuckDB reproduces them with no rounding step at all."""
    import struct

    import pandas as pd

    from jsonextract_spark.datapipe.multimodal import (
        MEDIA_SCHEMA, decode_features)

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            payloads = []
            for i in ids:
                a = int(i) % 32768
                data = struct.pack("<hh", a, -a)
                fmt = struct.pack("<HHIIHH", 1, 1, 8192, 8192 * 2, 2, 16)
                body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt))
                        + fmt + b"data" + struct.pack("<I", len(data))
                        + data)
                payloads.append(b"RIFF" + struct.pack("<I", len(body))
                                + body)
            yield pd.DataFrame({
                "doc_id": ids, "media_type": "audio/wav",
                "payload": payloads, "width": 0, "height": 0,
                "n_frames": 0})

    feats = decode_features(docs.mapInPandas(gen, MEDIA_SCHEMA),
                            decode_mode="real")

    def f(idx, name):
        return F.element_at("feat", idx).cast("double").alias(name)

    return feats.select(
        "doc_id", "ok",
        f(25, "rms"), f(26, "peak"), f(27, "mean_amp"), f(28, "std_amp"),
        f(29, "zcr"), f(30, "duration"), f(32, "present"))


def _q_simhash_stable(spark, sf_dir):
    """SimHash's construction invariant, machine-checked: the signature
    sums per-token sign vectors (datapipe/dedup.py _simhash_batch), so
    it is EXACTLY invariant under word reordering — simhash(text) ==
    simhash(reverse-word-order text) — and changes when the token
    multiset changes by a margin-safe edit (50 appended distinct tokens
    overwhelm any per-bit vote margin in this corpus; deterministic,
    verified over the fixed sf0.01/sf0.001 tables)."""
    from jsonextract_spark.datapipe.dedup import simhash_udf

    docs = _docs(spark, sf_dir)
    reversed_words = F.array_join(F.reverse(F.split(F.col("text"), " ")),
                                  " ")
    edit = " ".join(f"zq{i}x" for i in range(50))
    edited = F.concat(F.col("text"), F.lit(" " + edit))
    return docs.select(
        "doc_id",
        (simhash_udf("text") == simhash_udf(reversed_words))
        .alias("stable"),
        (simhash_udf("text") != simhash_udf(edited)).alias("sensitive"))


def _q_ivf_ann(spark, sf_dir):
    """IVF-bucketed ANN (sample → spherical-k-means → cell equi-join),
    projected to the same rank-1 self-retrieval invariant as q_lsh_ann:
    a member query always probes its own cell, and cosine(x,x)=1 beats
    every cell-mate."""
    from jsonextract_spark.datapipe.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.filter("vec_id < 5")
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return (ivf_topk(emb, queries, k=5, n_cells=32, n_probe=4)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("bigint").alias("rnk"))
            .filter(F.col("rnk") == 1))


def _q_multimodal(spark, sf_dir):
    """Multimodal plumbing: binary payloads -> mapInPandas fake decode.
    The fake-decode output shape is closed-form in doc_id (media_type by
    parity, ok=true, dim=FEAT_DIM), so the whole Arrow path is oracle-able.
    doc_id < 200 (not .limit) keeps the slice deterministic."""
    from jsonextract_spark.datapipe.multimodal import (
        decode_features, synth_media)

    docs = _docs(spark, sf_dir).filter("doc_id < 200")
    media = synth_media(spark, docs)
    feats = decode_features(media, decode_mode="fake")
    return feats.select("doc_id", "media_type", "ok",
                        F.size("feat").cast("bigint").alias("dim"))


def _q_multimodal_resize(spark, sf_dir):
    """Resize plumbing: fake kernel emits sha256(payload + ':WxH') hex,
    which DuckDB reproduces — the mapInPandas path is value-checked."""
    from jsonextract_spark.datapipe.multimodal import (
        resize_media, synth_media)

    docs = _docs(spark, sf_dir).filter("doc_id < 200")
    out = resize_media(synth_media(spark, docs), 64, 48)
    return out.select(
        "doc_id", "width", "height",
        F.substring(F.decode("payload", "utf-8"), 1, 16).alias("pfx"))


def _q_frame_sample(spark, sf_dir):
    """Frame-sample fan-out: k=4 evenly spaced frames per item
    (frame_idx = (j*n)//k), zero-frame items emit nothing; fake frame
    bytes are sha256(payload + ':f<idx>') hex — all SQL-reproducible."""
    from jsonextract_spark.datapipe.multimodal import (
        sample_frames, synth_media)

    docs = _docs(spark, sf_dir).filter("doc_id < 100")
    out = sample_frames(synth_media(spark, docs), k=4)
    return out.select(
        "doc_id", "sample_no", "frame_idx",
        F.substring(F.decode("frame", "utf-8"), 1, 16).alias("pfx"))


def _q_fingerprint(spark, sf_dir):
    from jsonextract_spark.datapipe.textstats import fingerprint_udf

    return (_docs(spark, sf_dir)
            .select("doc_id", fingerprint_udf("text").alias("fp")))


# warehouse used by q_host_stats: keyed by sf so the oracle SQL (which
# is a static string, evaluated at sf0.01) reads the matching crawl
def _host_stats_wh(sf_dir: str) -> str:
    return ("/tmp/jsx_entry_hoststats_"
            + os.path.basename(os.path.normpath(sf_dir)))


def _q_host_stats(spark, sf_dir):
    """The stored host_stats state table vs an independent recompute
    from the crawl's fetched ledger. host_stats is append-only
    per-round deltas + periodic checkpoints (pipeline.load_host_stats
    sums them on read); the oracle recomputes cumulative per-host
    fetch counts and newest fetch timestamp directly from the ledger
    parquet in DuckDB — if the delta write, the threaded overlap, or
    the read-side fold ever drop or double-count a round, the two
    tables diverge. The crawl is the deterministic synthetic corpus
    (fixed seeds/budget/batch), run fresh into a fixed per-sf path the
    oracle SQL reads."""
    from jsonextract_spark.crawl.pipeline import (load_host_stats,
                                                  run_crawl)
    from jsonextract_spark.crawl.tables import Warehouse

    wh_dir = _host_stats_wh(sf_dir)
    run_crawl(spark, wh_dir, rounds=3, n_seeds=40, host_budget=4,
              batch_size=120)
    wh = Warehouse(wh_dir)
    hs = load_host_stats(spark, wh, wh.last_committed_round())
    return hs.select(
        "host",
        F.col("crawled").cast("bigint").alias("crawled"),
        F.col("last_fetch_ts").cast("double").alias("last_fetch_ts"))


def _frontier_wh(sf_dir: str) -> str:
    return ("/tmp/jsx_entry_frontier_"
            + os.path.basename(os.path.normpath(sf_dir)))


def _q_frontier_state(spark, sf_dir):
    """The reconstructed frontier (base + per-round deltas, r6:
    rounds write only their additions; removals ride the fetched
    ledger's url_hash column) vs an independent DuckDB event replay —
    newest event per url_hash wins, same-round re-adds outrank the
    pop. If the delta write, the removal derivation, or the replay
    join ever disagree, the pending sets diverge. Deterministic
    synthetic crawl into a fixed per-sf path the oracle SQL reads."""
    from jsonextract_spark.crawl.pipeline import load_frontier, run_crawl
    from jsonextract_spark.crawl.tables import Warehouse

    wh_dir = _frontier_wh(sf_dir)
    run_crawl(spark, wh_dir, rounds=3, n_seeds=40, host_budget=4,
              batch_size=120)
    wh = Warehouse(wh_dir)
    return (load_frontier(spark, wh, wh.last_committed_round())
            .select("url_hash", F.col("depth").cast("int").alias("depth"),
                    F.col("priority").cast("double").alias("priority")))


_WARC_N = 400
_WARC_BASE_US = 1_755_000_000_000_000    # 2025-08-12T11:20:00Z in µs


def _warc_dir(sf_dir: str) -> str:
    return ("/tmp/jsx_entry_warc_"
            + os.path.basename(os.path.normpath(sf_dir)))


def _q_warc(spark, sf_dir):
    """Full WARC sink→source roundtrip (crawl/warc.py:69,157) against
    a closed-form oracle: pages are a pure function of the row id
    (url, µs-precision timestamp, repeated-text payload), written as
    gzip-member WARC shards and read back via the binaryFile member
    walk. The query returns sha256 + byte length of every payload and
    the exact epoch-µs timestamp; the oracle recomputes all of it from
    the generating function in DuckDB — any byte or microsecond the
    shard format drops or mangles breaks the hash."""
    import shutil

    from jsonextract_spark.crawl import warc as W

    out = _warc_dir(sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    pages = spark.range(_WARC_N).select(
        F.concat(F.lit("https://w"), F.col("id") % 7,
                 F.lit(".example/p/"), "id").alias("url"),
        F.timestamp_micros(
            F.lit(_WARC_BASE_US) + F.col("id") * 1000003
        ).alias("warc_ts"),
        F.encode(F.repeat(
            F.concat(F.lit("page "), "id", F.lit(" of w"),
                     F.col("id") % 7, F.lit(";")),
            (F.col("id") % 5 + 1).cast("int")), "utf-8").alias("html"))
    W.write_warc(pages.repartition(4), out).collect()
    back = W.read_warc(spark, out + "/*.warc.gz")
    return back.select(
        "url",
        F.unix_micros("warc_ts").alias("ts_us"),
        F.sha2("payload", 256).alias("payload_sha"),
        F.length("payload").cast("bigint").alias("payload_len"))


def _sitemap_wh(sf_dir: str) -> str:
    return ("/tmp/jsx_entry_sitemap_"
            + os.path.basename(os.path.normpath(sf_dir)))


# deterministic page ids the fake sitemap advertises as NEW: far
# outside the crawled neighborhood; the already-seen half comes from
# synth.seed_urls (round-0 seeds are in the seen set by construction,
# so the seen gate must drop them)
_SITEMAP_NEW_IDS = tuple(range(80000, 80060))


def _q_sitemap_seed(spark, sf_dir):
    """Sitemap-seeded crawl (crawl/sitemaps.py:184) vs the frontier
    event-replay oracle. A 2-round synthetic crawl runs; a
    deterministic sitemap source then advertises 10 already-seen page
    urls (gated away) and 60 new ones, which seed_from_sitemaps writes
    as a fresh full frontier base at round 3 (is_new=1 doubling as the
    seen delta); the crawl then RESUMES through rounds 4-5 so the
    seeded urls get popped, removed, and re-linked like any others.
    The query returns the final reconstructed frontier; the oracle
    replays base-at-3 + later deltas + fetched-ledger removals in
    DuckDB — if the sitemap base, the seen gate, or the post-seed
    resume ever diverge from the delta algebra, the pending sets
    differ."""
    from jsonextract_spark.crawl import synth
    from jsonextract_spark.crawl.pipeline import load_frontier, run_crawl
    from jsonextract_spark.crawl.sitemaps import seed_from_sitemaps
    from jsonextract_spark.crawl.tables import Warehouse

    wh_dir = _sitemap_wh(sf_dir)
    run_crawl(spark, wh_dir, rounds=2, n_seeds=40, host_budget=4,
              batch_size=120)
    wh = Warehouse(wh_dir)

    urls = (synth.seed_urls(40)[:10]
            + [synth.url_of(i) for i in _SITEMAP_NEW_IDS])

    def source_kernel(batches):
        import pandas as pd
        emitted = False
        for pdf in batches:
            if emitted or not len(pdf):
                continue
            emitted = True      # one copy per partition; deduped later
            yield pd.DataFrame({
                "host": [u.split("/")[2] for u in urls], "url": urls})

    n = seed_from_sitemaps(spark, wh, 2, source_kernel=source_kernel)
    # the synthetic link graph may have organically reached a few of
    # the "new" ids already — the invariant is the gate itself: every
    # round-0 seed is dropped (n < 70) and most new ids survive
    assert 0 < n <= len(_SITEMAP_NEW_IDS), n
    run_crawl(spark, wh_dir, rounds=5, host_budget=4, batch_size=120,
              resume=True)
    return (load_frontier(spark, wh, wh.last_committed_round())
            .select("url_hash", F.col("depth").cast("int").alias("depth"),
                    F.col("priority").cast("double").alias("priority")))


def _q_html_text(spark, sf_dir):
    """WET-style HTML→text extraction (datapipe/html_text.py) against a
    closed-form oracle: pages are assembled from the documents table
    with title/h1/p/link structure plus script/style/comment chaff; the
    extractor must recover exactly the prose lines, decode the &amp;
    entities, skip the chaff, count the single link, and measure its
    normalized text mass (link-density boilerplate signal)."""
    from jsonextract_spark.datapipe.html_text import extract_text

    docs = _docs(spark, sf_dir)
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc "), "doc_id",
            F.lit(" &amp; "), "lang",
            F.lit("</title><style>p {color: red}</style></head>"
                  "<body><h1>Doc "), "doc_id",
            F.lit("</h1><script>var x = {id: "), "doc_id",
            F.lit("};</script><p>"), F.col("text"),
            F.lit('</p><div>See <a href="/d/'), "doc_id",
            F.lit('">doc '), "doc_id",
            F.lit(" link</a> &amp; more.</div><!-- secret -->"
                  "</body></html>")).alias("html"))
    out = extract_text(pages, "html")
    return out.select(
        "doc_id", "title",
        F.col("text").alias("wet_text"),
        F.col("n_links").cast("bigint").alias("n_links"),
        F.col("link_chars").cast("bigint").alias("link_chars"),
        F.col("link_density").cast("double").alias("link_density"))


_DIRECTIVE_HEADS = [
    '<meta name="robots" content="noindex, nofollow">',
    '<META NAME="ROBOTS" CONTENT="NOINDEX">',
    "<meta name=robots content=none>",
    '<meta name="robots" content="index, follow">',
    "",                                   # canonical appended below
]


def _q_directives(spark, sf_dir):
    """Page compliance directives (html_text.page_directives_udf):
    each page plants one robots-meta variant (or a rel=canonical
    link) plus a script-string decoy that must NOT count; the oracle
    is the closed-form CASE over doc_id."""
    from jsonextract_spark.datapipe.html_text import page_directives_udf

    docs = _docs(spark, sf_dir)
    head = F.element_at(
        F.array(*[F.lit(h) for h in _DIRECTIVE_HEADS]),
        (F.col("doc_id") % 5).cast("int") + 1)
    canon = F.when(
        F.col("doc_id") % 5 == 4,
        F.concat(F.lit('<link rel="canonical" href="https://c.example/d/'),
                 "doc_id", F.lit('">'))).otherwise(F.lit(""))
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head>"), head, canon,
            F.lit('<script>var s = \'<meta name="robots" '
                  'content="noindex">\';</script></head><body><p>'),
            F.col("text"), F.lit("</p></body></html>")).alias("html"))
    d = pages.select("doc_id",
                     page_directives_udf("html").alias("d"))
    return d.select("doc_id",
                    F.col("d.noindex").alias("noindex"),
                    F.col("d.nofollow").alias("nofollow"),
                    F.col("d.canonical").alias("canonical"))


_CC_N = 600


def _q_components(spark, sf_dir):
    """Connected components (datapipe/graph.py) — the transitive
    cluster resolution near-dedup needs: 5-node chains (i→i+1 unless
    i%5==4) with every 50th chain bridged to its neighbor (i→i+5 when
    i%50==0), so components are mostly {5k..5k+4} with min 5k, and
    the bridged ones are 10-node components whose min must propagate
    across the bridge. Oracle = undirected transitive closure via a
    recursive CTE, min reachable node per node — pure integers."""
    from jsonextract_spark.datapipe.graph import connected_components

    ids = spark.range(_CC_N)
    chain = (ids.filter(F.col("id") % 5 != 4)
             .select(F.col("id").alias("src"),
                     (F.col("id") + 1).alias("dst")))
    bridge = (ids.filter(F.col("id") % 50 == 0)
              .select(F.col("id").alias("src"),
                      (F.col("id") + 5).alias("dst")))
    cc = connected_components(chain.union(bridge))
    return cc.select(F.col("node").cast("bigint").alias("node"),
                     F.col("component").cast("bigint")
                     .alias("component"))


_PR_N = 512          # power of two: every rank is an exact dyadic
_PR_ITERS = 6


def _q_pagerank(spark, sf_dir):
    """Power-iteration PageRank (datapipe/graph.py) over a
    deterministic 512-node graph (i → 2i+1, 2i+2 mod N; uniform
    out-degree 2, one self-loop at 511). With damping 0.5 and
    power-of-two N every intermediate is an exact binary fraction, so
    Spark's partial-aggregated sums and DuckDB's serial unrolled-CTE
    sums agree BIT-EXACTLY — a hash oracle over floating point, no
    tolerance needed."""
    from jsonextract_spark.datapipe.graph import pagerank

    ids = spark.range(_PR_N)
    edges = (ids.select(F.col("id").alias("src"),
                        ((F.col("id") * 2 + 1) % _PR_N).alias("dst"))
             .union(ids.select(
                 F.col("id").alias("src"),
                 ((F.col("id") * 2 + 2) % _PR_N).alias("dst"))))
    pr = pagerank(edges, n_iter=_PR_ITERS, damping=0.5)
    return pr.select(F.col("node").cast("bigint").alias("node"),
                     F.col("rank").cast("double").alias("rank"))


def _pagerank_sql(n: int, iters: int) -> str:
    """Unrolled power iteration as chained CTEs (standard SQL forbids
    aggregates in a recursive term, so the loop unrolls)."""
    gen = f"(SELECT range AS i FROM range(0, {n}))"
    ctes = [
        f"e AS (SELECT i AS src, (2*i+1) % {n} AS dst FROM {gen} "
        f"UNION ALL SELECT i, (2*i+2) % {n} FROM {gen})",
        f"p0 AS (SELECT range AS node, 1.0/{n} AS r FROM range(0, {n}))",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"p{k} AS (SELECT n.node, 0.5/{n} + 0.5*COALESCE(s.c, 0) "
            f"AS r FROM p{k - 1} n LEFT JOIN ("
            f"SELECT e.dst, sum(p.r/2) AS c FROM e "
            f"JOIN p{k - 1} p ON p.node = e.src GROUP BY e.dst) s "
            f"ON s.dst = n.node)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT CAST(node AS BIGINT) AS node, r AS rank "
              f"FROM p{iters}")


def _q_links(spark, sf_dir):
    """Anchor-text link extraction (html_text.extract_links_udf — the
    link-graph edge builder): each page carries one relative href (to
    be resolved against the page URL), one absolute href with a
    fragment (to be stripped), and two non-navigational links
    (fragment-only + mailto, to be dropped); the oracle rebuilds the
    surviving (href, anchor, pos) edges closed-form."""
    from jsonextract_spark.datapipe.html_text import extract_links_udf

    docs = _docs(spark, sf_dir)
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("https://w"), F.col("doc_id") % 7,
                 F.lit(".example/p/"), "doc_id").alias("base"),
        F.concat(
            F.lit('<p>intro</p><a href="/d/'), "doc_id",
            F.lit('">doc '), "doc_id",
            F.lit(' here</a><a href="#top">skip</a>'
                  '<a href="https://abs.example/x?q='), "doc_id",
            F.lit('#frag">abs &amp; '), "doc_id",
            F.lit('</a><a href="mailto:a@b">skip</a>')).alias("html"))
    links = pages.select(
        "doc_id",
        F.posexplode(extract_links_udf("html", "base"))
         .alias("pos", "link"))
    return links.select(
        "doc_id", F.col("pos").cast("bigint").alias("pos"),
        F.col("link.href").alias("href"),
        F.col("link.anchor").alias("anchor"))


_NORM_SUFFIXES = [
    " ﬁsh",            # ﬁ ligature → fish
    " x²y",            # superscript two → x2y
    " Ａ１",        # fullwidth A1 → A1
    " éclair",        # combining acute → composed é
    " a\x00b\u200bc",   # NUL (Cc) + zero-width space (Cf) dropped
    " a\u00adb  c",      # soft hyphen dropped, run collapsed
]


def _q_normalize(spark, sf_dir):
    """Unicode normalization (textstats.normalize_text_udf): each doc
    gets a planted suffix whose NFKC + control-strip + whitespace-
    collapse result is known exactly; the oracle concatenates the
    closed-form normalized literal instead — compatibility ligatures,
    fullwidth forms, combining sequences, and invisible Cc/Cf
    characters all route through the operator."""
    from jsonextract_spark.datapipe.textstats import normalize_text_udf

    docs = _docs(spark, sf_dir)
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in _NORM_SUFFIXES]),
        (F.col("doc_id") % 6).cast("int") + 1)
    out = docs.select(
        "doc_id",
        normalize_text_udf(F.concat("text", suffix)).alias("norm_text"))
    return out.select("doc_id", "norm_text",
                      F.length("norm_text").cast("bigint")
                      .alias("n_chars_norm"))


def _q_dedup_incremental(spark, sf_dir):
    """The continual-pretraining gate (dedup.exact_dedup_against):
    a 'historical corpus' is planted holding exactly the texts of
    every doc_id % 5 == 0 document (at shifted ids); the anti-join on
    (xxhash64, length) must drop precisely those new docs and keep
    the rest — text bytes never shuffle."""
    from jsonextract_spark.datapipe.dedup import exact_dedup_against

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    old = (docs.filter(F.col("doc_id") % 5 == 0)
               .select((F.col("doc_id") + 500000).alias("doc_id"),
                       "text"))
    kept = exact_dedup_against(docs, old, "text")
    return kept.select("doc_id")


def _q_rare_grams(spark, sf_dir):
    """Corpus-relative rare-trigram quality signal
    (textstats.rare_gram_quality): char-trigram corpus frequencies →
    per-doc rare fraction, all integer counts until the final
    division, so DuckDB restates it exactly."""
    from jsonextract_spark.datapipe.textstats import rare_gram_quality

    docs = _docs(spark, sf_dir)
    out = rare_gram_quality(docs, "text", n=3, rare_max_count=100)
    return out.select("doc_id", "n_grams", "n_rare",
                      F.col("rare_frac").cast("double").alias("rare_frac"))


_CORPUS_GROUP = 8          # identical-text copies per dedup group


def _q_corpus_build(spark, sf_dir):
    """The end-to-end corpus builder (datapipe/corpus.py) against a
    closed-form oracle: 400 pages in groups of 8 byte-identical texts
    at distinct URLs → WARC → build_training_corpus. Filters are set
    to pass everything (rare_max_count=0 ⇒ rare_frac 0 exactly), so
    the oracle pins the COMPOSITION's dedup algebra: one survivor per
    text group with dup_count=8, and the survivor is the group's
    min-url_hash row — which the oracle decides by computing murmur3
    over all 400 URLs in SQL and taking the arg_min per group."""
    import shutil

    from jsonextract_spark.crawl import warc as W
    from jsonextract_spark.datapipe.corpus import build_training_corpus

    out = _warc_dir(sf_dir) + "_corpus"
    shutil.rmtree(out, ignore_errors=True)
    g = (F.col("id") / _CORPUS_GROUP).cast("long")
    pages = spark.range(_WARC_N).select(
        F.concat(F.lit("https://w"), F.col("id") % 7,
                 F.lit(".example/p/"), "id").alias("url"),
        F.timestamp_micros(
            F.lit(_WARC_BASE_US) + F.col("id") * 1000003
        ).alias("warc_ts"),
        F.encode(F.concat(
            F.lit("<html><head><title>Group "), g,
            F.lit("</title></head><body><p>the shared body of group "),
            g, F.lit(" with plenty of words here</p></body></html>")),
            "utf-8").alias("html"))
    W.write_warc(pages.repartition(4), out).collect()
    corpus, _ = build_training_corpus(
        spark, out + "/*.warc.gz", min_tokens=4, max_link_density=0.5,
        max_rare_frac=1.0, rare_max_count=0, n_merges=64)
    return corpus.select(
        "url", "host", F.col("dup_count").cast("bigint").alias("dup_count"),
        "n_tokens", "n_chars", "title")


_MP4_LANGS = ["eng", "fre", "deu", "spa", "ita"]
_MP4_CODECS = ["avc1", "hvc1", "av01"]


def _q_mp4_meta(spark, sf_dir):
    """MP4/ISO BMFF container metadata (datapipe/mp4.py): payloads are
    assembled per doc_id by the independent builder transcription
    (video+audio tracks, rotating codecs/languages/dimensions, every
    7th file wrapped in a 64-bit largesize moov), parsed by
    extract_mp4_meta into per-track rows; the oracle restates every
    column closed-form from the doc_id arithmetic — durations are
    exact (duration/timescale divides to a representable integer),
    16.16 fixed-point dimensions are exact multiples, keyframe counts
    are the stss arithmetic (24k samples / every 12th = 2k), and the
    audio track pins the no-stss ⇒ all-sync spec rule (8.6.2)."""
    import pandas as pd

    from jsonextract_spark.datapipe.mp4 import build_mp4, extract_mp4_meta

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                d = int(i)
                k = d % 60 + 1
                s = 1 + d % 4
                payloads.append(build_mp4(
                    brand="mp42", movie_timescale=1000,
                    movie_duration=1000 * k, wide=(d % 7 == 0),
                    tracks=[
                        dict(kind="video", track_id=1, timescale=600,
                             duration=600 * k,
                             language=_MP4_LANGS[d % 5],
                             codec=_MP4_CODECS[d % 3],
                             n_samples=24 * k,
                             keyframes=list(range(1, 24 * k + 1, 12)),
                             width=160 * s, height=90 * s),
                        dict(kind="audio", track_id=2, timescale=8000,
                             duration=8000 * k, language="und",
                             codec="mp4a", n_samples=40 * k,
                             keyframes=None, channels=1 + d % 2,
                             sample_rate=8000.0),
                    ]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id long, payload binary")
    # absent fields (channels on video, sample_rate on video) surface
    # as NULL from the operator; pin them to 0 here so every output
    # column is single-typed for the driver's row sort/hash
    return extract_mp4_meta(media).select(
        "doc_id", "brand", "movie_duration_sec", "track_id", "handler",
        "codec", "width", "height",
        F.coalesce("channels", F.lit(0)).cast("bigint").alias("channels"),
        F.coalesce("sample_rate", F.lit(0.0)).cast("double")
         .alias("sample_rate"),
        "n_samples", "n_keyframes", "track_duration_sec", "language",
        "ok")


def _q_warc_extract(spark, sf_dir):
    """The full corpus-build composition (datapipe/ingest.py):
    generated HTML pages → write_warc → read_warc → URL identity →
    WET text + boilerplate signals + langid → documents table. The
    oracle rebuilds every column closed-form from the generating
    function — including url_hash through the from-scratch murmur3
    SQL, so the archive path and the crawl's link gate can never hash
    the same URL apart."""
    import shutil

    from jsonextract_spark.crawl import warc as W
    from jsonextract_spark.datapipe.ingest import warc_to_documents

    out = _warc_dir(sf_dir) + "_ext"
    shutil.rmtree(out, ignore_errors=True)
    pages = spark.range(_WARC_N).select(
        F.concat(F.lit("https://w"), F.col("id") % 7,
                 F.lit(".example/p/"), "id").alias("url"),
        F.timestamp_micros(
            F.lit(_WARC_BASE_US) + F.col("id") * 1000003
        ).alias("warc_ts"),
        F.encode(F.concat(
            F.lit("<html><head><title>Page "), "id",
            F.lit(" of w"), F.col("id") % 7,
            F.lit("</title></head><body><p>the content of page "), "id",
            F.lit('</p><ul><li><a href="/p/'), F.col("id") + 1,
            F.lit('">next '), F.col("id") + 1,
            F.lit('</a></li><li><a href="/p/'), "id",
            F.lit('?x=1">self</a></li></ul>'
                  "<script>var s = 1;</script></body></html>")),
            "utf-8").alias("html"))
    W.write_warc(pages.repartition(4), out).collect()
    docs = warc_to_documents(spark, out + "/*.warc.gz")
    return docs.select(
        "url", "url_hash", "host",
        F.unix_micros("fetched_at").alias("ts_us"),
        "n_bytes", "title",
        F.col("text").alias("wet_text"),
        "n_chars", "n_tokens", "lang", "n_links", "link_chars",
        F.col("link_density").cast("double").alias("link_density"))


# -- wrapping-64-bit hash oracles in pure DuckDB SQL -------------------------
#
# DuckDB integer ops raise on overflow instead of wrapping, which is
# why q_fingerprint (murmur3_x64_128 low word) and q_simhash_pairs
# (FNV-roll + splitmix64 token hashes) were rows-only checks through
# r6. HUGEINT (native int128) closes that: a wrapping 64-bit multiply
# is exact in HUGEINT followed by % 2^64 — with one care, a*b for two
# 64-bit operands can reach 2^128 and overflow SIGNED int128, so
# multiplies split the (always-constant) multiplier into 32-bit
# halves, keeping every intermediate under 2^97. xor / right-shift run
# on UBIGINT (native); left-shift-by-constant is HUGEINT multiply+mod
# (DuckDB's << raises on bit-63 overflow even for UBIGINT).
#
# The SQL below is generated by tiny expression helpers, restating the
# public-domain algorithms (Appleby's MurmurHash3, Vigna's SplitMix64,
# FNV) independently of jsonextract_spark — the helpers emit SQL text
# only and share no code with the Spark-side implementations.
#
# The murmur3 16-byte block loop is a recursive CTE, NOT list_reduce:
# DuckDB 1.0's list_reduce with a STRUCT accumulator updates fields in
# place in field order, so a later field's lambda expression observes
# the earlier field's NEW value (verified: (acc,b) -> struct(x :=
# acc.x*2 + b.x, y := acc.y*3 + b.y + acc.x) folded over
# [(1,1),(2,2),(3,3)] yields y=32 where standard fold semantics give
# 25). A recursive CTE has standard SQL semantics.

_M64 = "18446744073709551616"                     # 2^64


def _s_mul64(x: str, c: int) -> str:
    """Wrapping 64-bit multiply of HUGEINT expr in [0,2^64) by const."""
    lo, hi = c & 0xFFFFFFFF, c >> 32
    if hi == 0:
        return f"((({x}) * {lo}) % {_M64})"
    return (f"(((({x}) * {lo}) + (((({x}) * {hi}) % 4294967296) "
            f"* 4294967296)) % {_M64})")


def _s_xor64(a: str, b: str) -> str:
    return (f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT)) "
            f"AS HUGEINT)")


def _s_shr(x: str, r: int) -> str:
    return f"(({x}) // {1 << r})"


def _s_rotl64(x: str, r: int) -> str:
    # the two halves occupy disjoint bit ranges, so | == +
    return f"((((({x}) * {1 << r}) % {_M64}) + (({x}) // {1 << (64 - r)})))"


def _s_fmix64(x: str) -> str:
    e = _s_xor64(x, _s_shr(x, 33))
    e = _s_mul64(e, 0xFF51AFD7ED558CCD)
    e = _s_xor64(e, _s_shr(e, 33))
    e = _s_mul64(e, 0xC4CEB9FE1A85EC53)
    return _s_xor64(e, _s_shr(e, 33))


def _s_splitmix64(x: str) -> str:
    e = f"((({x}) + {0x9E3779B97F4A7C15}) % {_M64})"
    e = _s_mul64(_s_xor64(e, _s_shr(e, 30)), 0xBF58476D1CE4E5B9)
    e = _s_mul64(_s_xor64(e, _s_shr(e, 27)), 0x94D049BB133111EB)
    return _s_xor64(e, _s_shr(e, 31))


def _s_signed(x: str) -> str:
    return (f"CAST(CASE WHEN ({x}) >= 9223372036854775808 "
            f"THEN ({x}) - {_M64} ELSE ({x}) END AS BIGINT)")


_MM3_C1, _MM3_C2 = 0x87C37B91114253D5, 0x4CF5AD432745937F


def _s_mm3_k(k: str, c_first: int, r: int, c_second: int) -> str:
    """The k1/k2 pre-mix shared by murmur3 block and tail rounds."""
    return _s_mul64(_s_rotl64(_s_mul64(k, c_first), r), c_second)


# UTF-8 byte values of a string as an int list, via its hex dump
# (DuckDB has no direct BLOB indexing); {v} is the 0-based byte index,
# `hx` the hex(encode(..)) column in scope
_S_HEXBYTE = ("(strpos('0123456789ABCDEF', hx[2*{v}+1]) - 1) * 16 + "
              "strpos('0123456789ABCDEF', hx[2*{v}+2]) - 1")

_S_POW256 = "[" + ", ".join(f"{256 ** j}::HUGEINT" for j in range(8)) + "]"
_S_POW2 = "[" + ", ".join(f"{1 << i}::HUGEINT" for i in range(64)) + "]"

# whitespace runs as Python str.split() sees them (RE2 \s is
# ASCII-only; the explicit ranges add the C1/Unicode whitespace
# Python's .split() also breaks on)
_S_WS = (r"[\s\x0b\x1c-\x1f\x{0085}\x{00a0}\x{1680}\x{2000}-\x{200a}"
         r"\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+")


def _s_le8(off: str, count: str) -> str:
    """Little-endian HUGEINT from ``count`` bytes of list col ``bytes``
    at 0-based offset ``off`` (SQL list indexing is 1-based)."""
    return (f"CAST(COALESCE(list_sum(list_transform(range({count}), "
            f"j -> CAST(bytes[({off}) + j + 1] AS HUGEINT) "
            f"* {_S_POW256}[j + 1])), 0) AS HUGEINT)")


def _s_norm(text: str) -> str:
    """lower + whitespace-normalize, as `' '.join(t.lower().split())`."""
    return (f"COALESCE(array_to_string(list_filter(string_split_regex("
            f"lower({text}), '{_S_WS}'), w -> w <> ''), ' '), '')")


def _murmur3_fp_sql(corpus_sql: str) -> str:
    """doc_id, fp = signed low-64 of murmur3_x64_128(text) over a
    (doc_id, text) corpus query — the fingerprint_udf contract
    (normalization happens in ``corpus_sql`` via ``_s_norm``)."""
    k1x, k2x = "blk.ks[2*st.i + 1]", "blk.ks[2*st.i + 2]"
    k1p = _s_mm3_k(k1x, _MM3_C1, 31, _MM3_C2)
    h1a = _s_xor64("st.h1", k1p)
    h1b = f"(({_s_rotl64(h1a, 27)} + st.h2) % {_M64})"
    h1n = f"((({h1b}) * 5 + {0x52DCE729}) % {_M64})"
    k2p = _s_mm3_k(k2x, _MM3_C2, 33, _MM3_C1)
    h2a = _s_xor64("st.h2", k2p)
    h2b = f"(({_s_rotl64(h2a, 31)} + ({h1n})) % {_M64})"
    h2n = f"((({h2b}) * 5 + {0x38495AB5}) % {_M64})"
    h1t = (f"CASE WHEN tl > 0 THEN "
           f"{_s_xor64('h1', _s_mm3_k('tk1', _MM3_C1, 31, _MM3_C2))} "
           f"ELSE h1 END")
    h2t = (f"CASE WHEN tl > 8 THEN "
           f"{_s_xor64('h2', _s_mm3_k('tk2', _MM3_C2, 33, _MM3_C1))} "
           f"ELSE h2 END")
    return f"""
WITH RECURSIVE corpus AS ({corpus_sql}),
nrm AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM corpus
),
byt AS MATERIALIZED (
  SELECT doc_id, n,
         list_transform(range(n), i -> {_S_HEXBYTE.format(v='i')}) AS bytes
  FROM nrm
),
-- MATERIALIZED: the recursive block loop below references blk every
-- iteration; without it DuckDB re-inlines (and re-runs) the whole
-- hex-parse + block-assembly pipeline per iteration (measured 10.5s
-- -> 1.4s at sf0.01)
blk AS MATERIALIZED (
  SELECT doc_id, n, bytes, n // 16 AS nb, n % 16 AS tl,
         list_transform(range(2 * (n // 16)),
                        i -> {_s_le8('8*i', '8')}) AS ks
  FROM byt
),
st AS (
  SELECT doc_id, 0 AS i, 0::HUGEINT AS h1, 0::HUGEINT AS h2 FROM blk
  UNION ALL
  SELECT st.doc_id, st.i + 1, {h1n} AS h1, {h2n} AS h2
  FROM st JOIN blk USING (doc_id)
  WHERE st.i < blk.nb
),
looped AS (
  SELECT st.doc_id, st.h1, st.h2, blk.n, blk.tl,
         {_s_le8('16*blk.nb', 'least(blk.tl, 8)')} AS tk1,
         {_s_le8('16*blk.nb + 8', 'greatest(blk.tl - 8, 0)')} AS tk2
  FROM st JOIN blk USING (doc_id)
  WHERE st.i = blk.nb
),
tailed AS (
  SELECT doc_id,
         {h1t} AS h1t, {h2t} AS h2t,
         {_s_xor64('h1t', 'n')} AS h1x, {_s_xor64('h2t', 'n')} AS h2x,
         (h1x + h2x) % {_M64} AS h1s,
         (h2x + h1s) % {_M64} AS h2s,
         {_s_fmix64('h1s')} AS h1m,
         {_s_fmix64('h2s')} AS h2m,
         (h1m + h2m) % {_M64} AS h1f
  FROM looped
)
SELECT doc_id, {_s_signed('h1f')} AS fp FROM tailed
"""


def _simhash_sql(corpus_sql: str) -> str:
    """doc_id, sh = 64-bit SimHash over a (doc_id, text) corpus query:
    whitespace tokens of lowercased text, token hash = splitmix64(
    FNV-roll(bytes) XOR byte_len), per-bit ±1 majority vote."""
    tok_hash = _s_splitmix64(_s_xor64(
        f"list_reduce(list_prepend(0::HUGEINT, bytes), "
        f"(a, b) -> (a * 1099511628211 + b) % {_M64})",
        "octet_length(encode(tok))"))
    return f"""
WITH corpus AS ({corpus_sql}),
toks AS (
  SELECT doc_id, unnest(list_filter(
      string_split_regex(lower(text), '{_S_WS}'), w -> w <> '')) AS tok
  FROM corpus
),
th AS (
  SELECT tok, {tok_hash} AS th
  FROM (
    SELECT tok, hex(encode(tok)) AS hx,
           list_transform(range(octet_length(encode(tok))),
                          i -> {_S_HEXBYTE.format(v='i')}) AS bytes
    FROM (SELECT DISTINCT tok FROM toks)
  )
),
bits AS (
  SELECT t.doc_id, b.i,
         SUM(CASE WHEN (CAST(h.th AS UBIGINT) >> CAST(b.i AS UBIGINT))
                       & 1::UBIGINT = 1::UBIGINT
                  THEN 1 ELSE -1 END) AS acc
  FROM toks t
  JOIN th h USING (tok)
  CROSS JOIN (SELECT unnest(range(64)) AS i) b
  GROUP BY t.doc_id, b.i
),
packed AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN acc > 0 THEN {_S_POW2}[i + 1]
                       ELSE 0::HUGEINT END) AS HUGEINT) AS shu
  FROM bits GROUP BY doc_id
)
SELECT c.doc_id, {_s_signed('COALESCE(p.shu, 0)')} AS sh
FROM corpus c LEFT JOIN packed p USING (doc_id)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_extract_props": _q_extract_props,
        "q_extract_js_roundtrip": _q_extract_js_roundtrip,
        "q_extract_object_counts": _q_extract_object_counts,
        "q_topk_per_type": _q_topk_per_type,
        "q_customers_without_orders": _q_customers_without_orders,
        "q_frontier_union": _q_frontier_union,
        "q_order_rank_window": _q_order_rank_window,
        "q_lang_metrics": _q_lang_metrics,
        "q_region_order_stats": _q_region_order_stats,
        "q_exact_dedup": _q_exact_dedup,
        "q_token_stats": _q_token_stats,
        "q_quality": _q_quality,
        "q_ann_topk": _q_ann_topk,
        "q_crawl_reachable": _q_crawl_reachable,
        "q_sessionize": _q_sessionize,
        "q_bpe_tokens": _q_bpe_tokens,
        "q_bpe_real": _q_bpe_real,
        "q_embed_dup": _q_embed_dup,
        "q_minhash_pairs": _q_minhash_pairs,
        "q_ngram_jaccard": _q_ngram_jaccard,
        "q_fingerprint_stable": _q_fingerprint_stable,
        "q_simhash_stable": _q_simhash_stable,
        "q_multimodal_real": _q_multimodal_real,
        "q_png_real": _q_png_real,
        "q_gif_real": _q_gif_real,
        "q_gif_frames": _q_gif_frames,
        "q_bmp_real": _q_bmp_real,
        "q_tiff_real": _q_tiff_real,
        "q_webp_real": _q_webp_real,
        "q_jpeg_real": _q_jpeg_real,
        "q_audio_real": _q_audio_real,
        "q_langid": _q_langid,
        "q_lsh_ann": _q_lsh_ann,
        "q_ivf_ann": _q_ivf_ann,
        "q_multimodal": _q_multimodal,
        "q_multimodal_resize": _q_multimodal_resize,
        "q_frame_sample": _q_frame_sample,
        "q_host_stats": _q_host_stats,
        "q_frontier_state": _q_frontier_state,
        "q_warc": _q_warc,
        "q_sitemap_seed": _q_sitemap_seed,
        "q_html_text": _q_html_text,
        "q_warc_extract": _q_warc_extract,
        "q_mp4_meta": _q_mp4_meta,
        "q_rare_grams": _q_rare_grams,
        "q_corpus_build": _q_corpus_build,
        "q_dedup_incremental": _q_dedup_incremental,
        "q_normalize": _q_normalize,
        "q_links": _q_links,
        "q_pagerank": _q_pagerank,
        "q_components": _q_components,
        "q_directives": _q_directives,
        # oracled since r7 via HUGEINT wrapping arithmetic (see the
        # hash-oracle SQL generator section above):
        "q_simhash_pairs": _q_simhash_pairs,
        "q_fingerprint": _q_fingerprint,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q_extract_props": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "q_extract_js_roundtrip": """
            SELECT doc_id,
                   CAST(doc_id AS BIGINT) AS id2,
                   lang AS lang2,
                   source AS src2
            FROM documents
        """,
        "q_extract_object_counts": """
            SELECT lang,
                   count(*) AS docs,
                   2 * count(*) AS total_objs
            FROM documents
            GROUP BY lang
        """,
        "q_topk_per_type": """
            SELECT event_type, event_id, value, rnk FROM (
                SELECT event_type, event_id, value,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY value DESC, event_id ASC) AS rnk
                FROM events
            ) WHERE rnk <= 3
        """,
        "q_customers_without_orders": """
            SELECT c_custkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey)
        """,
        "q_frontier_union": """
            SELECT DISTINCT id FROM (
                SELECT user_id AS id FROM events
                UNION ALL
                SELECT o_custkey AS id FROM orders
            )
        """,
        "q_order_rank_window": """
            SELECT o_orderkey, o_custkey, o_totalprice, rnk FROM (
                SELECT o_orderkey, o_custkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
                FROM orders
            ) WHERE rnk <= 2
        """,
        "q_lang_metrics": """
            SELECT lang, count(*) AS docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang
        """,
        "q_region_order_stats": """
            SELECT r_name,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(28,2)) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "q_exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000, text FROM documents
            ) GROUP BY text
        """,
        "q_token_stats": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(length(text) - length(replace(text, 'e', ''))
                        AS BIGINT) AS n_e
            FROM documents
        """,
        "q_quality": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT)
                       AS n_tokens,
                   CAST(length(text) - length(replace(text, ' ', ''))
                        AS DOUBLE) / length(text) AS space_ratio,
                   CAST(length(text) - length(
                            regexp_replace(text, '[0-9]', '', 'g'))
                        AS DOUBLE) / length(text) AS digit_ratio,
                   CAST(length(text) - length(
                            regexp_replace(text, '[\\.,;:!\\?''"]', '',
                                           'g'))
                        AS DOUBLE) / length(text) AS punct_ratio,
                   CAST(len(list_filter(string_split(text, ' '),
                            x -> x IN ('the','a','of','and','in')))
                        AS BIGINT) AS stopword_hits
            FROM documents
        """,
        "q_ann_topk": """
            SELECT query_id, neighbor_id, rnk FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(c.embedding AS DOUBLE[]),
                               CAST(q.embedding AS DOUBLE[])) DESC,
                               c.vec_id ASC) AS rnk
                FROM embeddings c, embeddings q
                WHERE q.vec_id < 5 AND c.vec_id >= 5
            ) WHERE rnk <= 5
        """,
        "q_crawl_reachable": """
            WITH RECURSIVE reach(id, depth) AS (
                SELECT CAST(doc_id AS BIGINT), CAST(0 AS BIGINT)
                FROM documents WHERE doc_id < 10
                UNION ALL
                SELECT nxt, depth + 1 FROM (
                    SELECT unnest([(id*7+1) % 100000, (id*7+2) % 100000,
                                   (id*13+5) % 100000,
                                   (id*31+11) % 100000]) AS nxt,
                           depth
                    FROM reach
                ) WHERE depth < 2
            )
            SELECT id, min(depth) AS depth FROM reach GROUP BY id
        """,
        "q_bpe_tokens": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
                       AS n_bpe_tokens
            FROM documents
        """,
        # Real-BPE invariants, both independently checkable in SQL:
        # decode-roundtrip is exact by construction, and the learned
        # merge table saturates this corpus's small word vocabulary, so
        # BPE token count == whitespace word count (computed here with
        # no BPE at all).
        "q_bpe_real": """
            SELECT doc_id, true AS roundtrip_ok,
                   CAST(len(string_split(text, ' ')) AS BIGINT)
                       AS n_tokens
            FROM documents
        """,
        "q_embed_dup": """
            WITH corpus AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
                UNION ALL
                SELECT vec_id + 10000, CAST(embedding AS DOUBLE[])
                FROM embeddings
            )
            SELECT x.vec_id AS a, y.vec_id AS b
            FROM corpus x, corpus y
            WHERE x.vec_id < y.vec_id
              AND list_cosine_similarity(x.v, y.v) >= 0.999
        """,
        "q_sessionize": """
            SELECT user_id,
                   CAST(sum(CASE WHEN gap IS NULL OR gap > 600000000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
            FROM (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS gap
                FROM events
            ) GROUP BY user_id
        """,
        # All-pairs exact Jaccard over UTF-8 BYTE 5-shingle sets via an
        # inverted-index join (no LSH): hash-match proves band recall was
        # 100% at threshold AND the Spark-side verify math is exact.
        # Byte shingles (not chars) mirror _shingle_hashes exactly:
        # DuckDB has no blob substring, so each byte 5-gram is taken as
        # a 10-hex-char slice of hex(encode(text)), with short texts
        # space-padded ('20') like the kernel's ljust.
        "q_minhash_pairs": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 200000, text || ' tail'
                FROM documents WHERE doc_id % 25 = 0
                UNION ALL
                SELECT doc_id + 300000, text
                FROM documents WHERE doc_id % 25 = 0
            ),
            hexed AS (
                SELECT doc_id,
                       hex(encode(text)) ||
                       repeat('20', greatest(
                           5 - octet_length(encode(text)), 0)) AS h,
                       octet_length(encode(text)) AS n
                FROM corpus
            ),
            sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                         range(1, greatest(n - 4, 1) + 1),
                         i -> substr(h, 2 * i - 1, 10)))) AS g
                FROM hexed
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
                SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
                FROM sh l JOIN sh r USING (g)
                WHERE l.doc_id < r.doc_id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   round(inter::DOUBLE / (sa.sz + sb.sz - inter), 4)
                       AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.8
        """,
        # All-pairs word-3-gram Jaccard (cap disabled in the query, so
        # the plain inverted-index jaccard IS the ground truth).
        "q_ngram_jaccard": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 300000, text
                FROM documents WHERE doc_id % 25 = 0
                UNION ALL
                SELECT doc_id + 400000, text || ' tail words here'
                FROM documents WHERE doc_id % 25 = 5
            ),
            sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                         range(1, greatest(len(w) - 2, 1) + 1),
                         i -> array_to_string(w[i:i+2], ' ')))) AS g
                FROM (SELECT doc_id, string_split(text, ' ') AS w
                      FROM corpus)
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
                SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
                FROM sh l JOIN sh r USING (g)
                WHERE l.doc_id < r.doc_id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   round(inter::DOUBLE / (sa.sz + sb.sz - inter), 4)
                       AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5
        """,
        # The fingerprint invariants hold for every document.
        "q_fingerprint_stable": """
            SELECT doc_id, true AS stable, true AS sensitive
            FROM documents
        """,
        # SimHash is exactly word-order-invariant (signature = sum of
        # per-token sign vectors) and flips under a margin-safe token
        # edit — both hold for every document.
        "q_simhash_stable": """
            SELECT doc_id, true AS stable, true AS sensitive
            FROM documents
        """,
        # Closed-form pixel features of the solid-color P6 payloads the
        # Spark side builds from doc_id (real netpbm decode, no fake
        # hashing): mean_c = c/255, std 0, exact w/h, full-mass hist bin.
        "q_multimodal_real": """
            SELECT doc_id, true AS ok,
                   CAST(doc_id % 256 AS DOUBLE)        AS chan_r,
                   CAST((doc_id * 7) % 256 AS DOUBLE)  AS chan_g,
                   CAST((doc_id * 13) % 256 AS DOUBLE) AS chan_b,
                   CAST(0.0 AS DOUBLE) AS std_r,
                   CAST(2 + doc_id % 3 AS DOUBLE)
                       / (1 + doc_id % 2)              AS aspect,
                   true AS hist_solid
            FROM documents
        """,
        # Same closed forms for the spec-assembled PNG payloads (real
        # zlib inflate + all-five-filter-types unfilter on the Spark
        # side); aspect = w / h with h ∈ {1, 2, 8} so every ratio is
        # float32-exact.
        "q_png_real": """
            SELECT doc_id, true AS ok,
                   CAST(doc_id % 256 AS DOUBLE)        AS chan_r,
                   CAST((doc_id * 7) % 256 AS DOUBLE)  AS chan_g,
                   CAST((doc_id * 13) % 256 AS DOUBLE) AS chan_b,
                   CAST(0.0 AS DOUBLE) AS std_r,
                   CAST(3 + doc_id % 4 AS DOUBLE)
                       / (CASE doc_id % 3 WHEN 0 THEN 1
                          WHEN 1 THEN 2 ELSE 8 END)    AS aspect,
                   true AS hist_solid
            FROM documents
        """,
        # Closed forms for the spec-assembled solid animated GIFs
        # (real LZW + palette + transparency + interlace decode on the
        # Spark side; first rendered frame is solid, so every feature
        # is exact arithmetic on doc_id).
        "q_gif_real": """
            SELECT doc_id, true AS ok,
                   CAST(1 + doc_id % 127 AS DOUBLE)        AS chan_r,
                   CAST(1 + (doc_id * 7) % 127 AS DOUBLE)  AS chan_g,
                   CAST(1 + (doc_id * 13) % 127 AS DOUBLE) AS chan_b,
                   CAST(0.0 AS DOUBLE) AS std_r,
                   CAST(3 + doc_id % 4 AS DOUBLE)
                       / (CASE doc_id % 3 WHEN 0 THEN 1
                          WHEN 1 THEN 2 ELSE 8 END)        AS aspect,
                   true AS hist_solid
            FROM documents
        """,
        # Real animated-GIF frame sampling: every rendered canvas
        # equals the solid first frame (later frames are fully
        # transparent overlays), so the P6 bytes rebuild exactly from
        # doc_id — colors stay in 1..127, keeping chr() single-byte
        # (ASCII) so the hash sees the same bytes Spark's sha2 does.
        "q_gif_frames": """
            SELECT doc_id,
                   CAST(j AS BIGINT) AS sample_no,
                   CAST((j * (1 + doc_id % 3)) // 4 AS BIGINT)
                       AS frame_idx,
                   substr(sha256(
                       'P6' || chr(10)
                       || CAST(3 + doc_id % 4 AS VARCHAR) || ' '
                       || CAST(CASE doc_id % 3 WHEN 0 THEN 1
                               WHEN 1 THEN 2 ELSE 8 END AS VARCHAR)
                       || chr(10) || '255' || chr(10)
                       || repeat(chr(CAST(1 + doc_id % 127 AS INTEGER))
                                 || chr(CAST(1 + (doc_id * 7) % 127
                                             AS INTEGER))
                                 || chr(CAST(1 + (doc_id * 13) % 127
                                             AS INTEGER)),
                                 (3 + doc_id % 4)
                                 * (CASE doc_id % 3 WHEN 0 THEN 1
                                    WHEN 1 THEN 2 ELSE 8 END))),
                       1, 16) AS pfx
            FROM documents, unnest([0, 1, 2, 3]) AS t(j)
            WHERE doc_id < 100
        """,
        # Closed forms for the solid BMP/ICO payloads (real DIB +
        # ICO-container decode on the Spark side; same arithmetic as
        # q_png_real, identical for all four container forms).
        # Same closed forms as q_bmp_real — the WebP payloads encode
        # the identical solid images through six VP8L paths; only the
        # bytes differ, never the pixels.
        "q_webp_real": """
            SELECT doc_id, true AS ok,
                   CAST(doc_id % 256 AS DOUBLE)        AS chan_r,
                   CAST((doc_id * 7) % 256 AS DOUBLE)  AS chan_g,
                   CAST((doc_id * 13) % 256 AS DOUBLE) AS chan_b,
                   CAST(0.0 AS DOUBLE) AS std_r,
                   CAST(3 + doc_id % 4 AS DOUBLE)
                       / (CASE doc_id % 3 WHEN 0 THEN 1
                          WHEN 1 THEN 2 ELSE 8 END)    AS aspect,
                   true AS hist_solid
            FROM documents
        """,
        "q_bmp_real": """
            SELECT doc_id, true AS ok,
                   CAST(doc_id % 256 AS DOUBLE)        AS chan_r,
                   CAST((doc_id * 7) % 256 AS DOUBLE)  AS chan_g,
                   CAST((doc_id * 13) % 256 AS DOUBLE) AS chan_b,
                   CAST(0.0 AS DOUBLE) AS std_r,
                   CAST(3 + doc_id % 4 AS DOUBLE)
                       / (CASE doc_id % 3 WHEN 0 THEN 1
                          WHEN 1 THEN 2 ELSE 8 END)    AS aspect,
                   true AS hist_solid
            FROM documents
        """,
        # TIFF closed forms: the gray WhiteIsZero form (doc_id%4==2)
        # decodes to (g,g,g); the three color forms decode to the RGB
        # triple — everything else identical to the BMP discipline.
        "q_tiff_real": """
            SELECT doc_id, true AS ok,
                   CAST(doc_id % 256 AS DOUBLE) AS chan_r,
                   CAST(CASE WHEN doc_id % 4 = 2 THEN doc_id % 256
                        ELSE (doc_id * 7) % 256 END AS DOUBLE)
                       AS chan_g,
                   CAST(CASE WHEN doc_id % 4 = 2 THEN doc_id % 256
                        ELSE (doc_id * 13) % 256 END AS DOUBLE)
                       AS chan_b,
                   CAST(0.0 AS DOUBLE) AS std_r,
                   CAST(3 + doc_id % 4 AS DOUBLE)
                       / (CASE doc_id % 3 WHEN 0 THEN 1
                          WHEN 1 THEN 2 ELSE 8 END)    AS aspect,
                   true AS hist_solid
            FROM documents
        """,
        # Closed forms for the flat grayscale baseline-JPEG payloads
        # (real from-spec Huffman+IDCT decode on the Spark side; the
        # all-8 quant table makes flat blocks quantize losslessly, so
        # decode == input EXACTLY — gray replicates to all channels).
        "q_jpeg_real": """
            SELECT doc_id, true AS ok,
                   CAST(doc_id % 256 AS DOUBLE) AS chan_r,
                   CAST(doc_id % 256 AS DOUBLE) AS chan_g,
                   CAST(doc_id % 256 AS DOUBLE) AS chan_b,
                   CAST(0.0 AS DOUBLE) AS std_r,
                   CAST(1 + doc_id % 2 AS DOUBLE) AS aspect,
                   true AS hist_solid
            FROM documents
        """,
        # Closed-form sample features of the [a, -a] PCM payloads the
        # Spark side builds from doc_id (real RIFF/WAVE decode). All
        # values are float32-exact, so no rounding anywhere: rms = peak
        # = std = a/32768, mean 0, one sign change unless a = 0,
        # duration 2 samples / 8192 Hz.
        "q_audio_real": """
            SELECT doc_id, true AS ok,
                   (doc_id % 32768) / 32768.0 AS rms,
                   (doc_id % 32768) / 32768.0 AS peak,
                   CAST(0.0 AS DOUBLE) AS mean_amp,
                   (doc_id % 32768) / 32768.0 AS std_amp,
                   CASE WHEN doc_id % 32768 = 0 THEN CAST(0.0 AS DOUBLE)
                        ELSE CAST(1.0 AS DOUBLE) END AS zcr,
                   CAST(2.0 / 8192 AS DOUBLE) AS duration,
                   CAST(1.0 AS DOUBLE) AS present
            FROM documents
        """,
        # Exact SQL restatement of textstats._langid: distinct first-200
        # lowercased tokens, per-language stopword hits, argmax with ties
        # to the first language in sorted key order, CJK fallback when no
        # stopword hits at all.
        "q_langid": """
            WITH w AS (
                SELECT doc_id, lang, text,
                       list_distinct(
                           string_split(lower(text), ' ')[1:200]) AS words
                FROM documents
            ), s AS (
                SELECT doc_id, lang, text,
                    len(list_filter(words, x -> x IN
                        ('der','die','das','und','ist','von','mit','den',
                         'nicht','ein'))) AS s_de,
                    len(list_filter(words, x -> x IN
                        ('the','and','of','to','in','is','that','it','for',
                         'was'))) AS s_en,
                    len(list_filter(words, x -> x IN
                        ('el','la','los','de','y','es','en','un','una',
                         'por'))) AS s_es,
                    len(list_filter(words, x -> x IN
                        ('le','la','les','et','est','des','un','une','du',
                         'que'))) AS s_fr,
                    len(list_filter(words, x -> x IN
                        ('的','是','了','在','和','有','我','不','人','这')))
                        AS s_zh
                FROM w
            )
            SELECT doc_id, lang,
              CASE WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) = 0 THEN
                     CASE WHEN regexp_matches(substr(text,1,400), '[一-鿿]')
                          THEN 'zh' ELSE 'und' END
                   WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
                   WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
                   WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
                   WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
                   ELSE 'zh' END AS lang_pred
            FROM s
        """,
        # Self-retrieval invariant: every member query's top-1 neighbor is
        # itself (cosine(x,x)=1 outranks any bucket-mate).
        "q_lsh_ann": """
            SELECT vec_id AS query_id, vec_id AS neighbor_id,
                   CAST(1 AS BIGINT) AS rnk
            FROM embeddings WHERE vec_id < 5
        """,
        # Same invariant for the IVF index (member query probes its own
        # cell, so self is always a candidate and always ranks first).
        "q_ivf_ann": """
            SELECT vec_id AS query_id, vec_id AS neighbor_id,
                   CAST(1 AS BIGINT) AS rnk
            FROM embeddings WHERE vec_id < 5
        """,
        # The fake decode's output is closed-form in doc_id.
        "q_multimodal": """
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                        ELSE 'audio/wav' END AS media_type,
                   true AS ok,
                   CAST(32 AS BIGINT) AS dim
            FROM documents WHERE doc_id < 200
        """,
        # DuckDB recomputes the fake resize digest byte-for-byte.
        "q_multimodal_resize": """
            SELECT doc_id,
                   CAST(64 AS INT) AS width,
                   CAST(48 AS INT) AS height,
                   substr(sha256('payload-' || doc_id || ':64x48'),
                          1, 16) AS pfx
            FROM documents WHERE doc_id < 200
        """,
        # Evenly spaced frame sampling: frame_idx = (j*n)//k over the
        # per-doc frame count n = doc_id % 24; zero-frame docs vanish.
        "q_frame_sample": """
            SELECT doc_id,
                   CAST(j AS BIGINT) AS sample_no,
                   CAST((j * (doc_id % 24)) // 4 AS BIGINT) AS frame_idx,
                   substr(sha256('payload-' || doc_id || ':f' ||
                          CAST((j * (doc_id % 24)) // 4 AS BIGINT)),
                          1, 16) AS pfx
            FROM documents, unnest([0, 1, 2, 3]) AS t(j)
            WHERE doc_id < 100 AND doc_id % 24 <> 0
        """,
        # Recompute the cumulative host_stats state table (stored as
        # per-round deltas + checkpoints, summed by
        # pipeline.load_host_stats) straight from the crawl's fetched
        # ledger: count + newest warc_ts per host, excluding
        # robots-blocked rows. epoch_us/1e6 is bit-identical to
        # Spark's timestamp→double cast (both divide integer µs by
        # 1e6 in IEEE double). The warehouse path is written by the
        # q_host_stats Spark query, which the driver runs first.
        "q_host_stats": f"""
            SELECT host,
                   CAST(count(*) AS BIGINT) AS crawled,
                   max(epoch_us(warc_ts) / 1000000.0) AS last_fetch_ts
            FROM read_parquet(
                '{_host_stats_wh(os.environ.get(
                    "SPARK_GRAFT_ORACLE_SF",
                    "/root/testdata/sf0.01"))}/fetched/round=*/*.parquet')
            WHERE NOT blocked
            GROUP BY host
        """,
        # Independent event replay of the delta-layout frontier: every
        # addition (round-0 seeds + per-round frontier_delta rows, ev =
        # 2*round+1) raced against every removal (the popped rows in
        # the fetched ledger, ev = 2*round); a url_hash is pending iff
        # its newest event is an addition, whose stored depth/priority
        # must match the Spark-side reconstruction bit-for-bit.
        "q_frontier_state": f"""
            WITH ev AS (
                SELECT url_hash, CAST(1 AS BIGINT) AS ev, depth,
                       priority
                FROM '{_frontier_wh(os.environ.get(
                    "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
                ))}/frontier/round=0/is_new=1/*.parquet'
                UNION ALL
                SELECT url_hash, CAST(round AS BIGINT) * 2 + 1, depth,
                       priority
                FROM read_parquet('{_frontier_wh(os.environ.get(
                    "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
                ))}/frontier_delta/*/*/*.parquet',
                    hive_partitioning = true)
                UNION ALL
                SELECT url_hash, CAST(round AS BIGINT) * 2, NULL, NULL
                FROM read_parquet('{_frontier_wh(os.environ.get(
                    "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
                ))}/fetched/*/*.parquet', hive_partitioning = true)
            )
            SELECT url_hash,
                   CAST(arg_max(depth, ev) AS INT) AS depth,
                   arg_max(priority, ev) AS priority
            FROM ev GROUP BY url_hash HAVING max(ev) % 2 = 1
        """,
        # Closed-form restatement of the WARC roundtrip's source table:
        # the pages are a pure function of the row id, so the oracle
        # regenerates url, epoch-µs timestamp, payload sha256 and byte
        # length without touching the shards — the Spark side earns
        # equality only if write_warc→read_warc preserves every byte
        # and microsecond.
        "q_warc": f"""
            WITH g AS (SELECT range AS i FROM range(0, {_WARC_N}))
            SELECT 'https://w' || (i % 7) || '.example/p/' || i AS url,
                   CAST({_WARC_BASE_US} + i * 1000003 AS BIGINT)
                       AS ts_us,
                   sha256(repeat(
                       'page ' || i || ' of w' || (i % 7) || ';',
                       CAST(i % 5 + 1 AS INTEGER))) AS payload_sha,
                   CAST((i % 5 + 1) * length(
                       'page ' || i || ' of w' || (i % 7) || ';')
                       AS BIGINT) AS payload_len
            FROM g
        """,
        # q_frontier_state's event replay extended with a sitemap
        # maintenance round: the full frontier base written at round 3
        # (old pending rows + the seen-gated sitemap urls) enters the
        # replay as an addition at ev 2*3+1, superseding every earlier
        # event; rounds 4-5 contribute deltas (adds) and fetched-ledger
        # rows (removals) as usual. Pre-base delta/fetched events stay
        # in the union — they only ever lose to the base for in-base
        # urls and resolve non-pending urls identically.
        "q_sitemap_seed": f"""
            WITH ev AS (
                SELECT url_hash, CAST(7 AS BIGINT) AS ev, depth,
                       priority
                FROM read_parquet('{_sitemap_wh(os.environ.get(
                    "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
                ))}/frontier/round=3/*/*.parquet',
                    hive_partitioning = true)
                UNION ALL
                SELECT url_hash, CAST(round AS BIGINT) * 2 + 1, depth,
                       priority
                FROM read_parquet('{_sitemap_wh(os.environ.get(
                    "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
                ))}/frontier_delta/*/*/*.parquet',
                    hive_partitioning = true)
                UNION ALL
                SELECT url_hash, CAST(round AS BIGINT) * 2, NULL, NULL
                FROM read_parquet('{_sitemap_wh(os.environ.get(
                    "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
                ))}/fetched/*/*.parquet', hive_partitioning = true)
            )
            SELECT url_hash,
                   CAST(arg_max(depth, ev) AS INT) AS depth,
                   arg_max(priority, ev) AS priority
            FROM ev GROUP BY url_hash HAVING max(ev) % 2 = 1
        """,
        # Closed-form restatement of the WET extraction spec over the
        # synthetic page template: documents.text is already
        # whitespace-normalized (verified for every sf), so the prose
        # lines, decoded entities, link count, and per-segment link
        # text mass are all pure string algebra over (doc_id, lang,
        # text). link_density divides the same two BIGINTs Spark does.
        "q_html_text": """
            WITH p AS (
                SELECT doc_id,
                       'Doc ' || doc_id || ' & ' || lang AS title,
                       'Doc ' || doc_id || ' & ' || lang || chr(10) ||
                       'Doc ' || doc_id || chr(10) ||
                       text || chr(10) ||
                       'See doc ' || doc_id || ' link & more.' AS wet_text,
                       CAST(9 + length(CAST(doc_id AS VARCHAR)) AS BIGINT)
                           AS link_chars
                FROM documents)
            SELECT doc_id, title, wet_text,
                   CAST(1 AS BIGINT) AS n_links, link_chars,
                   link_chars / length(wet_text) AS link_density
            FROM p
        """,
        # The corpus builder's dedup algebra: 50 groups of 8
        # identical texts; one survivor per group with dup_count 8,
        # and WHICH row survives is decided by recomputing murmur3
        # over all 400 URLs in SQL and taking the per-group arg_min —
        # the composition (ingest → filters → exact dedup → rep join)
        # must agree on every byte.
        "q_corpus_build": f"""
            WITH gen AS (SELECT range AS i FROM range(0, {_WARC_N})),
            u AS (
                SELECT i, i // {_CORPUS_GROUP} AS grp,
                       'https://w' || (i % 7) || '.example/p/' || i
                           AS url,
                       'w' || (i % 7) || '.example' AS host
                FROM gen),
            h AS ({_murmur3_fp_sql(
                "SELECT i AS doc_id, "
                "'https://w' || (i % 7) || '.example/p/' || i AS text "
                f"FROM (SELECT range AS i FROM range(0, {_WARC_N}))")}),
            j AS (SELECT u.*, h.fp FROM u JOIN h ON h.doc_id = u.i),
            rep AS (
                SELECT grp, arg_min(url, fp) AS url,
                       arg_min(host, fp) AS host
                FROM j GROUP BY grp)
            SELECT url, host,
                   CAST({_CORPUS_GROUP} AS BIGINT) AS dup_count,
                   CAST(13 AS BIGINT) AS n_tokens,
                   CAST(length('Group ' || grp) + 1 +
                        length('the shared body of group ' || grp ||
                               ' with plenty of words here')
                        AS BIGINT) AS n_chars,
                   'Group ' || grp AS title
            FROM rep
        """,
        # Directive truth table per planted head (case-insensitive
        # names, none = noindex+nofollow, script decoys never count).
        "q_directives": """
            SELECT doc_id,
                   CAST(doc_id % 5 IN (0, 1, 2) AS BOOLEAN) AS noindex,
                   CAST(doc_id % 5 IN (0, 2) AS BOOLEAN) AS nofollow,
                   CASE WHEN doc_id % 5 = 4
                        THEN 'https://c.example/d/' || doc_id
                        ELSE '' END AS canonical
            FROM documents
        """,
        # Ground-truth components: undirected transitive closure via
        # a recursive CTE (UNION dedups the frontier), component =
        # min reachable node. Integer-exact.
        "q_components": f"""
            WITH RECURSIVE g AS (SELECT range AS i FROM range(0, {_CC_N})),
            e AS (
                SELECT i AS a, i + 1 AS b FROM g WHERE i % 5 <> 4
                UNION ALL
                SELECT i, i + 5 FROM g WHERE i % 50 = 0),
            sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
            nodes AS (SELECT DISTINCT a AS node FROM sym),
            reach AS (
                SELECT node, node AS r FROM nodes
                UNION
                SELECT reach.node, sym.b FROM reach
                JOIN sym ON sym.a = reach.r)
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(min(r) AS BIGINT) AS component
            FROM reach GROUP BY node
        """,
        # Bit-exact PageRank: unrolled power iteration (see
        # _pagerank_sql) — dyadic damping + power-of-two N make every
        # float exact, so the hash compare needs no tolerance.
        "q_pagerank": _pagerank_sql(_PR_N, _PR_ITERS),
        # The two surviving link edges per page, closed-form: the
        # relative href resolved against the page URL, the absolute
        # href with its fragment stripped, anchors entity-decoded;
        # fragment-only and mailto links never appear.
        "q_links": """
            SELECT doc_id, CAST(0 AS BIGINT) AS pos,
                   'https://w' || (doc_id % 7) || '.example/d/' ||
                       doc_id AS href,
                   'doc ' || doc_id || ' here' AS anchor
            FROM documents
            UNION ALL
            SELECT doc_id, CAST(1 AS BIGINT),
                   'https://abs.example/x?q=' || doc_id,
                   'abs & ' || doc_id
            FROM documents
        """,
        # Closed-form normalized literals for each planted suffix
        # (composed é in case 3 — NFKC composes the combining acute).
        # The base text is ASCII and already whitespace-normalized at
        # every sf, so it passes through the operator unchanged.
        "q_normalize": """
            SELECT doc_id,
                   text || CASE CAST(doc_id % 6 AS INTEGER)
                       WHEN 0 THEN ' fish'
                       WHEN 1 THEN ' x2y'
                       WHEN 2 THEN ' A1'
                       WHEN 3 THEN ' éclair'
                       WHEN 4 THEN ' abc'
                       ELSE ' ab c' END AS norm_text,
                   CAST(length(text) + CASE CAST(doc_id % 6 AS INTEGER)
                       WHEN 0 THEN 5 WHEN 1 THEN 4 WHEN 2 THEN 3
                       WHEN 3 THEN 7 WHEN 4 THEN 4 ELSE 5 END
                       AS BIGINT) AS n_chars_norm
            FROM documents
        """,
        # The planted history holds exactly the doc_id % 5 == 0 texts,
        # so the hash anti-join must keep exactly the complement (all
        # documents texts are distinct at every sf).
        "q_dedup_incremental": """
            SELECT doc_id FROM documents WHERE doc_id % 5 <> 0
        """,
        # Exact SQL restatement of the rare-trigram signal: same gram
        # extraction (1-based substr, lowercase a no-op on this
        # corpus), same corpus count, same inclusive threshold; the
        # only float is the final BIGINT/BIGINT division, identical
        # IEEE in both engines.
        "q_rare_grams": """
            WITH g AS (
                SELECT doc_id,
                       substr(lower(text), CAST(i AS INTEGER), 3) AS gram
                FROM documents,
                     UNNEST(range(1, length(text) - 1)) AS t(i)
                WHERE length(text) >= 3
            ),
            freq AS (SELECT gram, count(*) AS c FROM g GROUP BY gram)
            SELECT doc_id,
                   count(*) AS n_grams,
                   CAST(sum(CASE WHEN c <= 100 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_rare,
                   CAST(sum(CASE WHEN c <= 100 THEN 1 ELSE 0 END)
                        AS BIGINT) / count(*) AS rare_frac
            FROM g JOIN freq USING (gram)
            GROUP BY doc_id
        """,
        # Per-track container metadata restated from the doc_id
        # arithmetic: exact durations (duration/timescale divides to a
        # representable integer), exact 16.16 dimensions, stss
        # keyframe arithmetic, and the no-stss ⇒ all-sync rule on the
        # audio track. The audio tkhd carries 0x0 presentation
        # dimensions (the builder's spec-shaped default), not NULL.
        "q_mp4_meta": """
            WITH d AS (
                SELECT doc_id, doc_id % 60 + 1 AS k, 1 + doc_id % 4 AS s
                FROM documents)
            SELECT doc_id, 'mp42' AS brand,
                   CAST(k AS DOUBLE) AS movie_duration_sec,
                   CAST(1 AS BIGINT) AS track_id, 'vide' AS handler,
                   ['avc1','hvc1','av01'][CAST(doc_id % 3 AS INTEGER) + 1]
                       AS codec,
                   CAST(160 * s AS DOUBLE) AS width,
                   CAST(90 * s AS DOUBLE) AS height,
                   CAST(0 AS BIGINT) AS channels,
                   CAST(0.0 AS DOUBLE) AS sample_rate,
                   CAST(24 * k AS BIGINT) AS n_samples,
                   CAST(2 * k AS BIGINT) AS n_keyframes,
                   CAST(k AS DOUBLE) AS track_duration_sec,
                   ['eng','fre','deu','spa','ita']
                       [CAST(doc_id % 5 AS INTEGER) + 1] AS language,
                   true AS ok
            FROM d
            UNION ALL
            SELECT doc_id, 'mp42', CAST(k AS DOUBLE),
                   2, 'soun', 'mp4a', 0.0, 0.0,
                   CAST(1 + doc_id % 2 AS BIGINT), 8000.0,
                   CAST(40 * k AS BIGINT), CAST(40 * k AS BIGINT),
                   CAST(k AS DOUBLE), 'und', true
            FROM d
        """,
        # Every ingest column rebuilt closed-form from the page
        # generator: url/host/timestamp from the id arithmetic, the
        # WET text and link signals from the template's string algebra
        # (12 whitespace tokens per page by construction), n_bytes
        # from rebuilding the exact HTML, lang from the stopword model
        # ('the'+'of' → en), and url_hash through the from-scratch
        # murmur3 SQL over the URL strings (no normalization — the
        # identity UDF hashes the canonical URL verbatim).
        "q_warc_extract": f"""
            WITH g AS (SELECT range AS i FROM range(0, {_WARC_N})),
            p AS (
                SELECT i,
                    'https://w' || (i % 7) || '.example/p/' || i AS url,
                    'w' || (i % 7) || '.example' AS host,
                    CAST({_WARC_BASE_US} + i * 1000003 AS BIGINT)
                        AS ts_us,
                    'Page ' || i || ' of w' || (i % 7) AS title,
                    'Page ' || i || ' of w' || (i % 7) || chr(10) ||
                    'the content of page ' || i || chr(10) ||
                    'next ' || (i + 1) || chr(10) || 'self' AS wet_text,
                    CAST(length(
                        '<html><head><title>Page ' || i || ' of w' ||
                        (i % 7) ||
                        '</title></head><body><p>the content of page '
                        || i || '</p><ul><li><a href="/p/' || (i + 1) ||
                        '">next ' || (i + 1) ||
                        '</a></li><li><a href="/p/' || i ||
                        '?x=1">self</a></li></ul>' ||
                        '<script>var s = 1;</script></body></html>')
                        AS BIGINT) AS n_bytes,
                    CAST(9 + length(CAST(i + 1 AS VARCHAR)) AS BIGINT)
                        AS link_chars
                FROM g),
            h AS ({_murmur3_fp_sql(
                "SELECT i AS doc_id, "
                "'https://w' || (i % 7) || '.example/p/' || i AS text "
                f"FROM (SELECT range AS i FROM range(0, {_WARC_N}))")})
            SELECT p.url, h.fp AS url_hash, p.host, p.ts_us, p.n_bytes,
                   p.title, p.wet_text,
                   CAST(length(p.wet_text) AS BIGINT) AS n_chars,
                   CAST(12 AS BIGINT) AS n_tokens,
                   'en' AS lang,
                   CAST(2 AS BIGINT) AS n_links,
                   p.link_chars,
                   p.link_chars / length(p.wet_text) AS link_density
            FROM p JOIN h ON h.doc_id = p.i
        """,
        # From-scratch murmur3_x64_128 low word over the normalized
        # text, all in SQL (recursive-CTE block loop, HUGEINT wrapping
        # multiplies) — a full value-level check of the fingerprint
        # path: normalization, UTF-8 bytes, block/tail/finalize mixing,
        # signed wrap.
        "q_fingerprint": _murmur3_fp_sql(
            f"SELECT doc_id, {_s_norm('text')} AS text FROM documents"),
        # From-scratch simhash over the same planted-duplicate corpus
        # as the Spark query, then ALL-PAIRS hamming≤3 — equal to the
        # blocked Spark output because combination blocking has exact
        # recall at the threshold.
        "q_simhash_pairs": f"""
            WITH sh AS ({_simhash_sql('''
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 300000, text FROM documents
                WHERE doc_id % 25 = 0''')})
            SELECT l.doc_id AS a, r.doc_id AS b,
                   CAST(bit_count(xor(l.sh, r.sh)) AS BIGINT) AS hamming
            FROM sh l JOIN sh r ON l.doc_id < r.doc_id
            WHERE bit_count(xor(l.sh, r.sh)) <= 3
        """,
    }
