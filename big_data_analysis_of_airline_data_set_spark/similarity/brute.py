"""Brute-force cosine top-k over an embedding column — the exact
baseline for ANN. One scan, JVM-side arithmetic, top-k via
orderBy+limit (Spark plans a TakeOrderedAndProject: per-partition
heaps, no full sort shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.embedding import cosine_to_const_expr


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """(id, cosine) of the k nearest rows to ``query_vec`` by cosine,
    deterministic tie-break on id."""
    # const-query cosine: Literal query array + driver-side q-norm
    # (r11 expression-shape audit — the generic form re-built the
    # query CreateArray and re-folded sqrt(q*q) per row)
    cos = F.round(cosine_to_const_expr(F.col(vec_col), query_vec), 6)
    return (
        df.select(F.col(id_col).alias("id"), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
