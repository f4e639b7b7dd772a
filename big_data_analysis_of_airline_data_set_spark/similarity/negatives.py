"""Hard-negative mining over a labeled embedding table.

Contrastive training (retrieval, reranking, embedding models) needs,
for each anchor, the most-similar examples with a DIFFERENT label —
"hard" negatives that sit near the decision boundary. This is the
batch-mining job a training-data pipeline runs before building
contrastive pairs.

Scale shape (100 TB):

- anchors are a small, explicitly bounded set → broadcast; the
  label-inequality predicate makes this a broadcast nested-loop join,
  which is the CORRECT plan here (each corpus row is scored against a
  constant-size anchor block in one scan — no shuffle of the corpus).
- per-anchor top-k with FEW anchors is the classic window hot spot
  (one task per anchor would serialize the corpus), so the top-k runs
  in two phases: a salted window keeps k per (anchor, salt) in
  parallel, then a final window over the ≤ salt·k survivors picks the
  true top-k. Result is identical to the naive single window — the
  true top-k of a union is contained in the union of per-part top-ks.

Deterministic (rounded-cosine then id tie-break) → DuckDB-oracled in
plans/content.py. Swap the brute scoring for an IVF probe
(similarity/ivf.py) when anchors number in the millions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..dedup.embedding import cosine_sim_expr


def hard_negatives(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    label_col: str,
    n_anchors: int,
    k: int = 5,
    salt: int = 8,
) -> DataFrame:
    """(anchor_id, neg_id, rank, cosine): the ``k`` nearest
    different-label rows for each anchor (rows with id < ``n_anchors``),
    ranked by cosine descending with id tie-break."""
    anchors = df.filter(F.col(id_col) < n_anchors).select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("_avec"),
        F.col(label_col).alias("_albl"),
    )
    cand = df.join(
        F.broadcast(anchors), F.col(label_col) != F.col("_albl")
    ).select(
        "anchor_id",
        F.col(id_col).alias("neg_id"),
        F.round(cosine_sim_expr(F.col(vec_col), F.col("_avec")), 6).alias("cosine"),
    )
    salted = cand.withColumn("_salt", F.pmod(F.col("neg_id"), F.lit(salt)))
    w_salt = Window.partitionBy("anchor_id", "_salt").orderBy(
        F.desc("cosine"), F.asc("neg_id")
    )
    pruned = (
        salted.withColumn("_r", F.row_number().over(w_salt))
        .filter(F.col("_r") <= k)
        .drop("_r", "_salt")
    )
    w_final = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("neg_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w_final).cast("long"))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "neg_id", "rank", "cosine")
    )
