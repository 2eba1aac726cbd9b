"""Frontier pop: robots gate, priority scoring, per-host politeness top-k.

Scale notes
-----------
* robots is a tiny per-host table → **broadcast join**.
* per-host budget is a top-k per group. A naive window over ``host``
  sorts each host's rows inside one task — with 10^9 URLs on one hot
  host that task is the straggler. We use a **salted two-phase top-k**:
  phase 1 takes top-k within (host, salt) over S salts (bounded work per
  task), phase 2 re-ranks the ≤ k·S survivors per host. Same result,
  skew-proof. (north_star: "salted repartitioning to defeat host skew")
* all orderings have total tie-breaks (priority DESC, depth ASC, url ASC)
  so the pop is identical at any parallelism — required for reproducible
  crawl ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SALT_PARTS = 16


def salted_top_k_per_group(df: DataFrame, group_cols: list[str],
                           order_cols: list, k: int,
                           salts: int = SALT_PARTS,
                           salt_on: str = "url") -> DataFrame:
    """Deterministic top-k per group that survives heavy group skew.

    ``order_cols`` must define a total order (include a unique tie-break);
    ``salt_on`` is any column that spreads rows inside a group.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salts)))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    phase1 = (salted.withColumn("_r1", F.row_number().over(w1))
                    .filter(F.col("_r1") <= k)
                    .drop("_salt", "_r1"))
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (phase1.withColumn("rank_in_group", F.row_number().over(w2))
                  .filter(F.col("rank_in_group") <= k))


def pop_batch(frontier: DataFrame, robots: DataFrame, host_budget: int,
              batch_size: int, salts: int = SALT_PARTS,
              host_stats: DataFrame | None = None,
              now_ts: float | None = None,
              politeness_budget_sec: float = 15.0,
              default_delay_sec: float = 0.0,
              hot_hosts=None) -> DataFrame:
    """Select this round's fetch set.

    frontier:   url, url_hash, host, depth, priority
    robots:     host, allowed (small; broadcast), optionally crawl_delay
                (the host's robots Crawl-delay ask in seconds, null when
                unspecified — carried onto the batch)
    host_stats: host, crawled (cumulative fetch count; small; broadcast),
                optionally last_fetch_ts (epoch seconds of the host's
                newest fetch). When given, effective priority is
                discounted by how much of the host's budget history is
                already spent (north_star: "depth + host-budget
                scoring").
    now_ts:     when given alongside an effective delay + last_fetch_ts,
                hosts whose last fetch is younger than their delay are
                ineligible THIS round (their frontier rows simply aren't
                popped) — without this gate, within-task pacing honors
                the delay inside a round but consecutive rounds hit the
                host at full rate.
    default_delay_sec / hot_hosts: the POLITENESS FLOOR for hosts whose
                robots.txt is silent about rate — an explicit robots ask
                always wins; hosts in ``hot_hosts`` (an operator-marked
                small collection that the caller has clearance to hit at
                full parallel rate) are exempt and stay salted. The
                resulting per-row ``eff_delay`` (null = unconstrained)
                drives the cross-round gate and the per-round pop cap
                here, and single-task routing + within-round pacing in
                the pipeline/kernel.
    Returns the batch with a deterministic global ``rank`` and the
    ``eff_delay`` politeness column.
    """
    allowed = (frontier
               .join(F.broadcast(robots), "host", "left")
               .filter(F.coalesce(F.col("allowed"), F.lit(True)))
               .drop("allowed"))
    ask = (F.col("crawl_delay") if "crawl_delay" in robots.columns
           else F.lit(None).cast("double"))
    floor = (F.lit(float(default_delay_sec)) if default_delay_sec > 0
             else F.lit(None).cast("double"))
    if hot_hosts:
        floor = (F.when(F.col("host").isin(list(hot_hosts)),
                        F.lit(None).cast("double"))
                 .otherwise(floor))
    allowed = allowed.withColumn("eff_delay", F.coalesce(ask, floor))
    if host_stats is not None:
        allowed = (allowed
                   .join(F.broadcast(host_stats), "host", "left")
                   .withColumn(
                       "priority",
                       F.col("priority") /
                       (F.lit(1.0) + F.log1p(
                           F.coalesce(F.col("crawled"), F.lit(0.0))))))
        if now_ts is not None and "last_fetch_ts" in host_stats.columns:
            # gate ONLY hosts with an effective delay (robots ask or
            # the configured floor): an unconstrained host must never
            # be filtered — a coalesce(delay, 0) form would reduce to
            # last_fetch_ts <= now for every host, which is vacuous
            # locally but stalls whole rounds under executor-vs-driver
            # clock skew on a real cluster. With a floor the gate is a
            # real intentional rate: worst-case skew delays a host by
            # skew+floor seconds, it cannot stall the round.
            allowed = allowed.filter(
                F.col("eff_delay").isNull()
                | F.col("last_fetch_ts").isNull()
                | (F.col("last_fetch_ts") + F.col("eff_delay")
                   <= F.lit(float(now_ts))))
        allowed = allowed.drop("crawled", "last_fetch_ts")

    order = [F.col("priority").desc(), F.col("depth").asc(),
             F.col("url").asc()]
    per_host = salted_top_k_per_group(
        allowed, ["host"], order, host_budget, salts)
    # a delay-constrained host's URLs run sequentially in ONE task
    # spaced eff_delay apart, so popping k of them occupies that task
    # ~(k-1)*delay seconds — cap k by ``politeness_budget_sec`` so a
    # single polite host can't straggle the whole round (its remaining
    # URLs simply stay in the frontier for later rounds)
    limit = F.when(
        F.col("eff_delay").isNotNull() & (F.col("eff_delay") > 0),
        F.least(
            F.lit(host_budget),
            (F.lit(1) + F.floor(
                F.lit(float(politeness_budget_sec))
                / F.col("eff_delay"))).cast("int"))
    ).otherwise(F.lit(host_budget))
    per_host = per_host.filter(F.col("rank_in_group") <= limit)

    # Global cap: orderBy+limit compiles to TakeOrderedAndProject — a
    # distributed tree top-k, NOT a single-task global sort. The dense
    # rank (the crawl order the determinism tests pin) is then assigned
    # over the already-capped batch, which is bounded by batch_size, so
    # the single-partition window is O(batch), never O(frontier).
    capped = per_host.drop("rank_in_group").orderBy(*order).limit(batch_size)
    w = Window.orderBy(F.col("priority").desc(), F.col("depth").asc(),
                       F.col("url").asc())
    return capped.withColumn("rank", F.row_number().over(w))


def priority_of(depth_col, host_crawled_col=None):
    """Scoring per north_star: BFS-flavored depth decay, discounted by how
    much of the host's budget has been consumed historically."""
    if isinstance(depth_col, str):
        depth_col = F.col(depth_col)
    p = F.lit(1.0) / (F.lit(1.0) + depth_col)
    if host_crawled_col is not None:
        p = p / (F.lit(1.0) + F.log1p(host_crawled_col))
    return p
