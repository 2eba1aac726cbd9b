"""Similarity search over an embedding column (array<float>).

* ``brute_topk`` — exact cosine top-k: broadcast the (small) query set,
  JVM-side dot product via ``F.zip_with`` + ``F.aggregate`` (no Python in
  the hot loop), skew-proof salted top-k for the ranking.
* ``lsh_topk`` — the scale path: random-hyperplane signatures bucket the
  corpus; only same-bucket candidates are scored. Recall is tunable via
  ``n_tables`` (OR-amplification); report coverage instead of silently
  under-filling k.

Determinism: hyperplanes come from a fixed-seed RNG; ranking ties break
on neighbor id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

from jsonextract_spark.crawl.scheduler import salted_top_k_per_group

N_PLANES = 16     # bits per signature
N_TABLES = 4      # OR-amplified tables
DIM = 64


def _cosine_expr(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.zip_with(a, a, lambda x, y: x * y),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.zip_with(b, b, lambda x, y: x * y),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def brute_topk(corpus: DataFrame, queries: DataFrame, k: int,
               id_col: str = "vec_id", vec_col: str = "embedding",
               qid_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    queries: (query_id, embedding). Broadcast — the query side is small
    by construction; the corpus side streams through one stage.
    Returns (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(F.col(qid_col),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
               .withColumn("cosine", _cosine_expr(F.col("cv"), F.col("qv")))
               .select(qid_col, "neighbor_id", "cosine"))
    order = [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    return (salted_top_k_per_group(scored, [qid_col], order, k,
                                   salt_on="neighbor_id")
            .withColumnRenamed("rank_in_group", "rank"))


def _planes(n_tables: int, n_planes: int, dim: int) -> np.ndarray:
    rng = np.random.RandomState(42_2026)
    return rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)


def make_signature_udf(n_tables: int = N_TABLES, n_planes: int = N_PLANES,
                       dim: int = DIM):
    planes = _planes(n_tables, n_planes, dim)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(vecs: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            x = np.asarray(v, dtype=np.float64)
            if x.shape[0] != dim:
                x = np.resize(x, dim)
            bits = (np.einsum("tpd,d->tp", planes, x) > 0)
            return [int(b.dot(1 << np.arange(n_planes))) for b in bits]
        return vecs.map(one)

    return sig_udf


def embedding_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.999,
                        n_tables: int = N_TABLES) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the scale
    path — never all-pairs).

    Candidates are pairs sharing an LSH ``(table, bucket)`` cell — an
    equi-join, so candidate volume scales with bucket collisions, not
    n². Identical vectors hash identically in every table, so recall for
    exact copies is 1.0 by construction; for near-copies at cosine c the
    per-table collision probability is ``(1 - acos(c)/pi)^n_planes``
    (~0.80 at c=0.999 with 16 planes), OR-amplified to ~0.998 over 4
    tables. Returns (a, b, cos) with a < b and cos >= threshold.
    """
    sig = make_signature_udf(n_tables=n_tables)
    e = (df.select(F.col(id_col).alias("id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
           .withColumn("sigs", sig(F.col("v")))
           .select("id", "v",
                   F.posexplode("sigs").alias("table", "bucket")))
    left, right = e.alias("l"), e.alias("r")
    cand = (left.join(right,
                      (F.col("l.table") == F.col("r.table")) &
                      (F.col("l.bucket") == F.col("r.bucket")) &
                      (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                    F.col("l.v").alias("va"), F.col("r.v").alias("vb"))
            .dropDuplicates(["a", "b"]))
    return (cand.withColumn("cos", _cosine_expr(F.col("va"), F.col("vb")))
                .filter(F.col("cos") >= threshold)
                .select("a", "b", "cos"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "query_id",
             n_tables: int = N_TABLES) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates.

    At 100 TB the crossJoin of brute_topk is impossible; here candidate
    volume ≈ corpus × (collision rate), and the bucket join co-partitions
    both sides on (table, bucket) — one shuffle each.
    """
    sig = make_signature_udf(n_tables=n_tables)
    c = (corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).cast("array<double>").alias("cv"))
         .withColumn("sigs", sig(F.col("cv")))
         .select("neighbor_id", "cv",
                 F.posexplode("sigs").alias("table", "bucket")))
    q = (queries.select(F.col(qid_col),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .withColumn("sigs", sig(F.col("qv")))
         .select(qid_col, "qv", F.posexplode("sigs").alias("table", "bucket")))
    cand = (c.join(q, ["table", "bucket"])
            .select(qid_col, "neighbor_id", "cv", "qv")
            .dropDuplicates([qid_col, "neighbor_id"]))
    scored = (cand.withColumn("cosine",
                              _cosine_expr(F.col("cv"), F.col("qv")))
                  .select(qid_col, "neighbor_id", "cosine"))
    order = [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    return (salted_top_k_per_group(scored, [qid_col], order, k,
                                   salt_on="neighbor_id")
            .withColumnRenamed("rank_in_group", "rank"))
