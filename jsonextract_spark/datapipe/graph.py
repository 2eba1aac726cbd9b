"""Link-graph analytics over crawl edges.

The crawl produces an edge list — (src url_hash, dst url_hash) from
``html_text.extract_links`` / the fetch kernel's link discovery — and
the classic consumer is PageRank-style authority scoring for crawl
prioritization and corpus weighting.

``pagerank`` is the standard power iteration expressed as DataFrame
joins (no GraphX/graphframes dependency — plain Catalyst):

    contribs = edges ⋈ ranks on src → groupBy dst → Σ rank/out_deg
    ranks'   = (1-d)/N + d * contribs      (per node, LEFT join)

Scale shape: the edge table is hash-partitioned ON src ONCE and
persisted — every iteration's join then reuses that partitioning (the
rank table, keyed by node, shuffles to meet it; ranks are one row per
node, orders of magnitude smaller than edges). Each iteration is one
shuffle-join + one aggregation; the loop materializes the new rank
table and unpersists the previous one, so lineage stays one iteration
deep (no exponential plan growth — the classic iterative-algorithm
trap). Dangling nodes (no out-edges) leak their damped mass, the
"sink loss" variant — documented, deterministic, and exactly what the
oracle restates.

Numerics note for testing: with damping a dyadic rational (e.g. 0.5)
and power-of-two node counts/out-degrees, every intermediate value is
an exact binary fraction far under 53 significand bits, so floating
addition is EXACT in any order — Spark's partial aggregation and
DuckDB's serial sum produce bit-identical ranks. That is what lets
q_pagerank be a hash-exact oracle rather than a tolerance check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src_col: str = "src",
                         dst_col: str = "dst",
                         max_iter: int = 50) -> DataFrame:
    """(node, component) with component = min node id reachable in the
    UNDIRECTED closure — the transitive cluster resolution near-dedup
    needs (pairwise a<b drops under-merge chains: a–b, b–c is ONE
    cluster, and the representative must be min(a,b,c), not whatever
    pair order implies).

    Min-label propagation: every node repeatedly adopts the smallest
    label among itself and its neighbors, a driver loop of
    join+groupBy rounds that stops when an iteration changes nothing
    (O(diameter) rounds; near-dup clusters have tiny diameters — a
    chain of template variants, not a web graph). Every round ends in
    ``localCheckpoint(eager=True)``: the label table is referenced
    TWICE per round (join probe + neighbor aggregate), so merely
    persisting leaves the LOGICAL plan doubling per round — at ~20
    rounds the plan tree alone OOMs the driver (reproduced: java heap
    exhausted rendering the plan string). Checkpointing truncates the
    plan; the executor-local blocks are GC-cleaned when unreferenced.
    (On a real cluster localCheckpoint trades executor-failure
    tolerance for speed — use a checkpoint dir where that matters.)
    Exhausting ``max_iter`` without converging RAISES: silently
    returning split labels would reintroduce exactly the under-merge
    bug this operator exists to fix (raise ``max_iter`` for
    huge-diameter graphs)."""
    # Persisted HASH-PARTITIONED ON b, the per-iteration join key (r10;
    # the same discipline pagerank already applies to its edge table):
    # distinct() leaves sym partitioned on (a, b), so every label-
    # propagation round would re-shuffle the FULL edge table to meet
    # the join's b-distribution — O(edges) exchange × O(diameter)
    # rounds. Repartitioned once on b, each round's join moves only
    # the small label table; the groupBy("a") result is the only other
    # per-round exchange and is O(nodes).
    sym = (edges.select(F.col(src_col).alias("a"),
                        F.col(dst_col).alias("b"))
           .union(edges.select(F.col(dst_col).alias("a"),
                               F.col(src_col).alias("b")))
           .distinct().repartition("b").persist())
    labels = (sym.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=True))
    converged = False
    for _ in range(max_iter):
        neigh = (sym.join(labels, sym.b == labels.node)
                 .groupBy("a").agg(F.min("component").alias("nc")))
        new_labels = (labels.join(neigh, labels.node == neigh.a, "left")
                      .select("node",
                              F.least("component",
                                      F.coalesce("nc", F.col("component")))
                              .alias("component"),
                              (F.coalesce("nc", F.col("component"))
                               < F.col("component")).alias("_chg"))
                      .localCheckpoint(eager=True))
        changed = new_labels.filter("_chg").count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise ValueError(
            f"connected_components: not converged after {max_iter} "
            f"rounds (component diameter exceeds max_iter — raise it)")
    return labels


def pagerank(edges: DataFrame, n_iter: int = 8, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             partitions: int | None = None) -> DataFrame:
    """Power-iteration PageRank over an edge DataFrame. Returns
    (node, rank). Nodes are everything appearing as src OR dst;
    initial rank 1/N; dangling mass is lost (sink-loss variant).
    Each iteration ends in ``localCheckpoint(eager=True)`` — the plan
    would otherwise grow with the iteration count (see
    connected_components for the exponential variant of that trap) and
    persisted results would leak CacheManager entries no caller
    unpersists."""
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    if partitions:
        e = e.repartition(partitions, "src")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e = e.join(out_deg, "src").persist()

    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    n = nodes.count()          # materializes both persists
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    teleport = (1.0 - damping) / n
    ranks = (nodes.withColumn("rank", F.lit(1.0 / n))
             .localCheckpoint(eager=True))
    for _ in range(n_iter):
        contribs = (e.join(ranks, e.src == ranks.node)
                     .select("dst", (F.col("rank")
                                     / F.col("out_deg")).alias("c"))
                     .groupBy("dst").agg(F.sum("c").alias("c")))
        ranks = (nodes.join(contribs, nodes.node == contribs.dst,
                            "left")
                 .select("node",
                         (F.lit(teleport) + F.lit(damping)
                          * F.coalesce("c", F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    e.unpersist()
    nodes.unpersist()
    return ranks
