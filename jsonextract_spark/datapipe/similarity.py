"""Similarity search over an embedding column (array<float>).

* ``brute_topk`` — exact cosine top-k: broadcast the (small) query set,
  JVM-side dot product via ``F.zip_with`` + ``F.aggregate`` (no Python in
  the hot loop), skew-proof salted top-k for the ranking.
* ``lsh_topk`` — scale path #1: random-hyperplane signatures bucket the
  corpus; only same-bucket candidates are scored. Recall is tunable via
  ``n_tables`` (OR-amplification); report coverage instead of silently
  under-filling k.
* ``ivf_topk`` — scale path #2: an inverted-file index (sample →
  spherical-k-means coarse quantizer → broadcast centroids → cell
  equi-join with ``n_probe`` query fan-out).
* ``embedding_dup_pairs`` — near-duplicate pairs via the LSH bucket
  self-join (never all-pairs).

Determinism: hyperplanes come from a fixed-seed RNG; ranking ties break
on neighbor id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

from jsonextract_spark.crawl.scheduler import salted_top_k_per_group

N_PLANES = 16     # bits per signature
N_TABLES = 4      # OR-amplified tables
DIM = 64


def _norm_expr(a):
    return F.sqrt(F.aggregate(F.zip_with(a, a, lambda x, y: x * y),
                              F.lit(0.0), lambda acc, v: acc + v))


def _cosine_expr(a, b, na=None, nb=None):
    """Cosine of two vector columns. ``na``/``nb`` take PRE-COMPUTED
    norm columns (r10): inside a candidate join every corpus/query
    vector appears in many pairs, and inlining the norms made each
    pair pay two O(dim) folds that are a per-ROW quantity — hoisting
    them to columns computed once per side before the join removes
    two thirds of the scoring arithmetic with bit-identical results
    (same fold expression over the same values, same multiply/divide
    shape)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = _norm_expr(a) if na is None else na
    nb = _norm_expr(b) if nb is None else nb
    return dot / (na * nb)


def brute_topk(corpus: DataFrame, queries: DataFrame, k: int,
               id_col: str = "vec_id", vec_col: str = "embedding",
               qid_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    queries: (query_id, embedding). Broadcast — the query side is small
    by construction; the corpus side streams through one stage.
    Returns (query_id, neighbor_id, cosine, rank).
    """
    q = (queries.select(F.col(qid_col),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .withColumn("_qn", _norm_expr(F.col("qv"))))
    c = (corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).cast("array<double>").alias("cv"))
         .withColumn("_cn", _norm_expr(F.col("cv"))))
    scored = (c.crossJoin(F.broadcast(q))
               .withColumn("cosine", _cosine_expr(F.col("cv"), F.col("qv"),
                                                  F.col("_cn"), F.col("_qn")))
               .select(qid_col, "neighbor_id", "cosine"))
    order = [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    return (salted_top_k_per_group(scored, [qid_col], order, k,
                                   salt_on="neighbor_id")
            .withColumnRenamed("rank_in_group", "rank"))


def _planes(n_tables: int, n_planes: int, dim: int) -> np.ndarray:
    rng = np.random.RandomState(42_2026)
    return rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)


def _stack_vecs(vs, dim: int) -> np.ndarray:
    """(n, dim) float64 matrix from a sequence of array-likes (short
    rows TILE to fit — np.resize repeats the row, it does not zero-pad —
    long rows truncate; the per-row np.resize contract, batched)."""
    x = np.zeros((len(vs), dim), dtype=np.float64)
    for i, v in enumerate(vs):
        a = np.asarray(v, dtype=np.float64)[:dim]
        if a.shape[0] == dim:
            x[i] = a
        else:                       # np.resize semantics: tile to fit
            x[i] = np.resize(a, dim)
    return x


def make_signature_udf(n_tables: int = N_TABLES, n_planes: int = N_PLANES,
                       dim: int = DIM):
    planes = _planes(n_tables, n_planes, dim)
    pows = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(vecs: pd.Series) -> pd.Series:
        """Whole-batch signatures: ONE einsum over the (n, dim) matrix
        and vectorized bit packing — no per-row Python linear algebra."""
        mask = vecs.notna().to_numpy()
        vals = [None] * len(vecs)
        if mask.any():
            x = _stack_vecs(vecs[mask].tolist(), dim)
            bits = np.einsum("tpd,nd->ntp", planes, x) > 0   # (n, t, p)
            sigs = bits @ pows                               # (n, t)
            for row, i in zip(sigs, np.flatnonzero(mask)):
                vals[i] = [int(v) for v in row]
        return pd.Series(vals, index=vecs.index, dtype=object)

    return sig_udf


def _spherical_kmeans(sample: np.ndarray, k: int, iters: int = 10,
                      seed: int = 20260816) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample: the IVF
    coarse quantizer. Rows are L2-normalized; assignment is argmax dot
    product; empty cells respawn on the farthest points (keeps exactly k
    usable cells)."""
    rng = np.random.RandomState(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True),
                            1e-12)
    c = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ c.T                      # (n, k)
        assign = sims.argmax(axis=1)
        newc = np.zeros_like(c)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                newc[j] = members.sum(axis=0)
            else:  # respawn dead cell on the worst-covered point
                newc[j] = x[sims.max(axis=1).argmin()]
        c = newc / np.maximum(np.linalg.norm(newc, axis=1, keepdims=True),
                              1e-12)
    return c


def make_cell_udfs(centroids: np.ndarray, n_probe: int):
    """(assign_udf, probe_udf): nearest cell for corpus rows; the
    ``n_probe`` nearest cells for query rows. The centroid matrix rides
    to executors inside the UDF closure (broadcast-sized by
    construction: n_cells × dim floats)."""
    c = centroids

    def _cells(vecs: pd.Series, top: int) -> pd.Series:
        """Whole-batch assignment: one (n, dim) @ (dim, k) matmul and
        one argsort pass — no per-row Python linear algebra. Rows are
        L2-normalized batch-wise (cosine == dot on normalized rows)."""
        mask = vecs.notna().to_numpy()
        vals = [None] * len(vecs)
        if mask.any():
            x = _stack_vecs(vecs[mask].tolist(), c.shape[1])
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                            1e-12)
            sims = x @ c.T                                  # (n, k)
            # argsort for every `top` (incl. 1) so assign and probe
            # break centroid ties identically — the self-retrieval
            # invariant needs a member's assigned cell ∈ its probe set
            order = np.argsort(-sims, axis=1)[:, :top]
            for row, i in zip(order, np.flatnonzero(mask)):
                vals[i] = [int(v) for v in row]
        return pd.Series(vals, index=vecs.index, dtype=object)

    @F.pandas_udf(ArrayType(LongType()))
    def assign_udf(vecs: pd.Series) -> pd.Series:
        return _cells(vecs, 1)

    @F.pandas_udf(ArrayType(LongType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        return _cells(vecs, n_probe)

    return assign_udf, probe_udf


_TRAIN_SEED = 20260816


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "query_id",
             n_cells: int = 64, n_probe: int = 8,
             train_rows: int = 4096,
             train_fraction: float = 1.0) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path
    next to ``lsh_topk``.

    Train: ONE bounded driver job fits a spherical-k-means coarse
    quantizer on a deterministic UNIFORM sample: rows ranked by a seeded
    hash of their id, top ``train_rows`` kept (TakeOrderedAndProject —
    a per-partition size-n heap + driver merge, bounded memory, no
    shuffle of vectors, no lexical-id bias). At 100 TB set
    ``train_fraction`` ≈ ``8 * train_rows / |corpus|`` to pre-thin the
    scan with a seeded Bernoulli sample before the ranking (the hash
    ranking then picks uniformly among survivors). Serve: corpus rows go
    to their nearest cell, queries probe their ``n_probe`` nearest
    cells, and only same-cell candidates are scored — an equi-join on
    cell id, never all-pairs. A query that is also a corpus member
    always probes its own cell, so self-retrieval at rank 1 is
    guaranteed (the oracle invariant).
    """
    import numpy as np  # noqa: F811 (explicit for the driver-side fit)

    src = (corpus if train_fraction >= 1.0
           else corpus.sample(fraction=train_fraction, seed=_TRAIN_SEED))
    sample = (src.select(F.col(vec_col).cast("array<double>")
                         .alias("v"), F.col(id_col).alias("id"))
              .orderBy(F.xxhash64(F.col("id"), F.lit(_TRAIN_SEED)), "id")
              .limit(train_rows).collect())
    centroids = _spherical_kmeans(
        np.asarray([r["v"] for r in sample], dtype=np.float64), n_cells)
    assign_udf, probe_udf = make_cell_udfs(centroids, n_probe)

    c = (corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).cast("array<double>").alias("cv"))
         .withColumn("_cn", _norm_expr(F.col("cv")))
         .withColumn("cell", F.element_at(assign_udf(F.col("cv")), 1)))
    q = (queries.select(F.col(qid_col),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .withColumn("_qn", _norm_expr(F.col("qv")))
         .withColumn("cell", F.explode(probe_udf(F.col("qv")))))
    cand = c.join(q, "cell").select(qid_col, "neighbor_id", "cv", "qv",
                                    "_cn", "_qn")
    scored = (cand.withColumn("cosine",
                              _cosine_expr(F.col("cv"), F.col("qv"),
                                           F.col("_cn"), F.col("_qn")))
                  .select(qid_col, "neighbor_id", "cosine"))
    order = [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    return (salted_top_k_per_group(scored, [qid_col], order, k,
                                   salt_on="neighbor_id")
            .withColumnRenamed("rank_in_group", "rank"))


MAX_DOCS_PER_BUCKET = 1000   # hot-bucket cap for the LSH self-join


def embedding_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.999,
                        n_tables: int = N_TABLES,
                        max_docs_per_bucket: int | None =
                        MAX_DOCS_PER_BUCKET,
                        log_dropped: bool = False) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the scale
    path — never all-pairs).

    Candidates are pairs sharing an LSH ``(table, bucket)`` cell — an
    equi-join, so candidate volume scales with bucket collisions, not
    n². Identical vectors hash identically in every table, so recall for
    exact copies is 1.0 by construction; for near-copies at cosine c the
    per-table collision probability is ``(1 - acos(c)/pi)^n_planes``
    (~0.80 at c=0.999 with 16 planes), OR-amplified to ~0.998 over 4
    tables. Returns (a, b, cos) with a < b and cos >= threshold.

    ``max_docs_per_bucket`` drops hot ``(table, bucket)`` cells before
    the self-join (same cap as ``dedup.minhash_candidate_pairs``):
    embedding corpora cluster — 10^5 near-identical embeddings of
    boilerplate pages share a cell in every table, and the self-join
    inside one such cell is quadratic (5·10^9 candidates from a single
    100k cell). The cap is LOSSY by design on >cap clusters: their
    intra-cluster pairs AND pairs with vectors near enough to share
    the cluster's cells in every table are dropped — bounded join
    volume traded for recall on dense duplicate families; pass
    ``None`` (as the driver oracle query does) for exact semantics.
    The size count is a
    window over the join key itself, so the filter rides the join's own
    exchange. ``log_dropped=True`` prints how many cells were dropped;
    ``None`` disables.
    """
    sig = make_signature_udf(n_tables=n_tables)
    e = (df.select(F.col(id_col).alias("id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
           .withColumn("_n", _norm_expr(F.col("v")))
           .withColumn("sigs", sig(F.col("v")))
           .select("id", "v", "_n",
                   F.posexplode("sigs").alias("table", "bucket")))
    if max_docs_per_bucket is not None:
        w = Window.partitionBy("table", "bucket")
        sized = e.withColumn("_bsz", F.count(F.lit(1)).over(w))
        if log_dropped:
            n_hot = (sized.filter(F.col("_bsz") > max_docs_per_bucket)
                     .select("table", "bucket").distinct().count())
            print(f"embedding_dup_pairs: dropped {n_hot} hot cells "
                  f"(> {max_docs_per_bucket} docs)")
        e = sized.filter(F.col("_bsz") <= max_docs_per_bucket).drop("_bsz")
    left, right = e.alias("l"), e.alias("r")
    cand = (left.join(right,
                      (F.col("l.table") == F.col("r.table")) &
                      (F.col("l.bucket") == F.col("r.bucket")) &
                      (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                    F.col("l.v").alias("va"), F.col("r.v").alias("vb"),
                    F.col("l._n").alias("_na"), F.col("r._n").alias("_nb"))
            .dropDuplicates(["a", "b"]))
    return (cand.withColumn("cos", _cosine_expr(F.col("va"), F.col("vb"),
                                                F.col("_na"), F.col("_nb")))
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
         .withColumn("_cn", _norm_expr(F.col("cv")))
         .withColumn("sigs", sig(F.col("cv")))
         .select("neighbor_id", "cv", "_cn",
                 F.posexplode("sigs").alias("table", "bucket")))
    q = (queries.select(F.col(qid_col),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .withColumn("_qn", _norm_expr(F.col("qv")))
         .withColumn("sigs", sig(F.col("qv")))
         .select(qid_col, "qv", "_qn",
                 F.posexplode("sigs").alias("table", "bucket")))
    cand = (c.join(q, ["table", "bucket"])
            .select(qid_col, "neighbor_id", "cv", "qv", "_cn", "_qn")
            .dropDuplicates([qid_col, "neighbor_id"]))
    scored = (cand.withColumn("cosine",
                              _cosine_expr(F.col("cv"), F.col("qv"),
                                           F.col("_cn"), F.col("_qn")))
                  .select(qid_col, "neighbor_id", "cosine"))
    order = [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    return (salted_top_k_per_group(scored, [qid_col], order, k,
                                   salt_on="neighbor_id")
            .withColumnRenamed("rank_in_group", "rank"))
