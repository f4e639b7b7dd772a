"""Iterative graph algorithms as DataFrame loops — PageRank.

Beyond the label-propagation connected components (dedup/components.py)
this adds the other canonical iterative-relational workload: PageRank,
expressed as a driver-side loop of join+aggregate DataFrame steps.

Scale notes:
- The edge table — the big side at scale — is shuffled ONCE, at build:
  ``repartition(src)`` before the persist means the cached partitioning
  satisfies every iteration's join requirement, so per iteration only
  the node-sized rank table moves to the edges' partitioning, plus one
  contribution shuffle on dst. (Without this, every iteration re-
  shuffles the full edge set — 5× the dominant cost.)
- Iterations build ONE lazy persisted chain and materialize in a
  single final action instead of a per-iteration ``count()`` barrier:
  each cached step is computed (and cached) exactly once as the final
  job walks the chain, but we skip N job-submission round-trips —
  measured 2× end-to-end at sf0.1. ``barrier_every`` bounds lineage
  depth and the persisted working set for deep iteration counts by
  forcing a materialize-and-release cycle every K rounds (default 8;
  the 5-round catalog query never hits it).
- Determinism for the DuckDB oracle: per-iteration contributions are
  rounded to ``round_dp`` decimals and summed in DECIMAL(30,dp) —
  exact integer-scaled addition, so float summation order cannot
  diverge between engines; the only float ops per iteration (one
  division, one multiply-add) are correctly-rounded and identical.
- Simplified semantics (documented, replayed identically by the
  oracle): dangling-node mass is NOT redistributed; nodes with no
  in-edges hold the teleport term (1−d)/N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
    round_dp: int = 12,
    barrier_every: int = 8,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank rounds
    over the DISTINCT directed edge set.

    The returned DataFrame is PERSISTED and already materialized (the
    final action here lets every intermediate handle be released before
    returning). The CALLER owns the release of the result only:
    consume it, then ``result.unpersist()`` — see
    plans/patterns.py:q_graph_pagerank."""
    # distinct() leaves hashpartitioning(src, dst) — it does NOT satisfy
    # a join on src alone, so repartition by src before caching: the big
    # table is shuffled once, here, instead of once per iteration.
    e = edges.select(src, dst).distinct().repartition(F.col(src)).persist()
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
        .repartition("node")
        .persist()
    )
    n = nodes.count()  # scalar driver boundary, like stats/variance.py
    outdeg = e.groupBy(src).agg(F.count(F.lit(1)).alias("deg")).persist()
    teleport = (1.0 - damping) / n

    ranks = nodes.select("node", F.round(F.lit(1.0 / n), round_dp).alias("rank"))
    ranks = ranks.persist()
    pending = [ranks]  # persisted-but-unreleased iteration steps
    for it in range(1, iterations + 1):
        # join outdeg into the NODE-sized ranks table first (small ⋈
        # small), so the edge table — the big side at scale — is joined
        # exactly once per iteration, not twice
        rate = ranks.join(outdeg, ranks.node == outdeg[src]).select(
            "node",
            F.round(F.col("rank") / F.col("deg"), round_dp)
            .cast(f"decimal(30,{round_dp})")
            .alias("c"),
        )
        contribs = (
            e.join(rate, e[src] == rate.node)
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(F.col("mass").cast("double"), F.lit(0.0)),
                    round_dp,
                ).alias("rank"),
            )
            .persist()
        )
        pending.append(ranks)
        if it % barrier_every == 0 and it < iterations:
            # deep-iteration safety valve: truncate effective lineage
            # and bound the persisted working set
            ranks.count()
            for h in pending[:-1]:
                h.unpersist()
            pending = [ranks]
    ranks.count()  # single materialization walks (and caches) the chain
    for h in pending[:-1]:
        h.unpersist()
    e.unpersist()
    nodes.unpersist()
    outdeg.unpersist()
    return ranks
