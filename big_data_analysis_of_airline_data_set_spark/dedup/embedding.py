"""Embedding-cosine near-duplicate pairs.

Cosine is computed with JVM built-ins (zip_with product + aggregate
sum) over ``array<float>`` columns cast to double — no Python on the
data path. The brute-force pair join is the exact baseline; blocked
variants (LSH buckets) live in ``similarity.lsh``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_sim_expr(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<numeric> columns (double math)."""
    ad, bd = _to_double(a), _to_double(b)
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with cosine >= threshold."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.round(cosine_sim_expr(F.col("va"), F.col("vb")), 6)
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
