"""Connected components over near-duplicate pair edges.

The final step of every production dedup pipeline: pair edges (from
MinHash/SimHash/embedding banding) are transitive — A≈B and B≈C puts
all three in one cluster even when A≈C was never emitted — so keep/drop
decisions need the connected component, not the raw pairs. Each doc
gets ``cluster_id`` = the minimum doc id reachable from it; the doc
equal to its cluster id is the canonical copy to keep.

Algorithm: iterative min-label propagation (the simplified
alternating-star shape used at scale): every round each node takes the
min of its own label and its neighbors' labels; converged when no
label changes. Rounds = graph diameter ≤ log n after path shortcuts —
near-dup clusters are tiny and dense, so 2-4 rounds in practice. Each
round is one shuffle join + one aggregation; labels persist
round-over-round; the only driver-side values are the per-round
changed-count scalars (the reference's O1 driver-boundary pattern).

Not a recursive SQL engine feature: Spark has no RECURSIVE CTE, so the
loop lives in the driver — but DuckDB does, which is exactly what the
oracle uses (reachability via WITH RECURSIVE), making this iterative
algorithm fully hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, cluster_id) — cluster_id = min node id in the component.

    ``nodes``: one column ``id_col`` (singletons become their own
    cluster). ``edges``: undirected pairs (each emitted once).
    """
    sym = (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
        .union(edges.select(F.col(dst_col).alias("_src"), F.col(src_col).alias("_dst")))
        .distinct()
        .persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("_id"), F.col(id_col).alias("_label")
    ).persist()
    labels.count()

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["_src"] == labels["_id"])
            .groupBy("_dst")
            .agg(F.min("_label").alias("_nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["_id"] == neighbor_min["_dst"], "left")
            .select(
                "_id",
                F.least(F.col("_label"), F.coalesce(F.col("_nmin"), F.col("_label"))).alias(
                    "_label"
                ),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n._id") == F.col("o._id"))
            .filter(F.col("n._label") != F.col("o._label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
    return labels.select(F.col("_id").alias(id_col), F.col("_label").alias("cluster_id"))


def keeper_by_quality(
    clustered: DataFrame,
    *,
    id_col: str,
    cluster_col: str = "cluster_id",
    quality_col: str,
) -> DataFrame:
    """Canonical-copy selection by QUALITY rather than min-id: within
    each cluster keep the row with the highest ``quality_col`` (ties →
    lowest id — deterministic). Min-id keepers discard the best copy
    whenever the best copy isn't the oldest; production curation ranks
    by quality score. One window pass over the clustered output — the
    cluster-keyed shuffle; near-dup clusters are tiny so no skew risk.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(cluster_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return clustered.withColumn(
        "keep", F.row_number().over(w) == 1
    )
