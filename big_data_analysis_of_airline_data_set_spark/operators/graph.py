"""Iterative graph algorithms as DataFrame loops — PageRank.

Beyond the label-propagation connected components (dedup/components.py)
this adds the other canonical iterative-relational workload: PageRank,
expressed as a driver-side loop of join+aggregate DataFrame steps.

Scale notes:
- Each iteration is ONE shuffle: edges ⋈ ranks on src (ranks is the
  small side after the first iteration only if the graph is small —
  in general both sides are big, so the join shuffles on src and the
  contribution aggregate reuses the dst hash partitioning).
- Ranks are persisted per iteration and the previous iteration is
  unpersisted — the working set is two rank tables, never the lineage.
  For deep iteration counts add ``localCheckpoint`` every ~10 rounds
  to truncate lineage; at 5 rounds the plan stays small.
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
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank rounds
    over the DISTINCT directed edge set.

    The returned DataFrame is PERSISTED (unpersisting here would force
    the whole iteration chain to recompute at collection, since every
    intermediate has already been released). The CALLER owns the
    release: consume the result, then ``result.unpersist()`` — see
    plans/patterns.py:q_graph_pagerank."""
    e = edges.select(src, dst).distinct().persist()
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # scalar driver boundary, like stats/variance.py
    outdeg = e.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    teleport = (1.0 - damping) / n

    ranks = nodes.select("node", F.round(F.lit(1.0 / n), round_dp).alias("rank"))
    ranks.persist().count()
    outdeg = outdeg.persist()
    for _ in range(iterations):
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
        new_ranks = (
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
        )
        new_ranks.persist().count()
        ranks.unpersist()
        ranks = new_ranks
    e.unpersist()
    nodes.unpersist()
    outdeg.unpersist()
    return ranks
