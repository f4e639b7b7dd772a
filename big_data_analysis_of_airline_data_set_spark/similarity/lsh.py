"""LSH-bucketed approximate nearest neighbor — the scale path.

BucketedRandomProjectionLSH over L2-normalized vectors: for unit
vectors, Euclidean distance is monotone in cosine
(d² = 2 - 2·cos), so approxNearestNeighbors on normalized vectors IS
approximate cosine ANN. Candidates come from hash-bucket collisions
(multi-probe across numHashTables); only candidates pay the exact
distance computation.

At 100 TB: the index (hash values) is computed in one pass and the
query probes touch only colliding buckets — this is the IVF/LSH
shape the north star asks for.
"""

from __future__ import annotations

import math

from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 777


def _normalized_vectors(df: DataFrame, *, id_col: str, vec_col: str) -> DataFrame:
    vec = df.select(
        F.col(id_col).alias("_id"), array_to_vector(F.col(vec_col)).alias("_vec_raw")
    )
    return Normalizer(inputCol="_vec_raw", outputCol="_vec", p=2.0).transform(vec)


def fit_lsh_model(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    bucket_length: float = 0.5,
    num_hash_tables: int = 8,
):
    """Returns (model, indexed_df) ready for approx queries."""
    normed = _normalized_vectors(df, id_col=id_col, vec_col=vec_col)
    lsh = BucketedRandomProjectionLSH(
        inputCol="_vec",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=SEED,
    )
    model = lsh.fit(normed)
    return model, model.transform(normed)


def lsh_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    threshold: float = 0.3,
    bucket_length: float = 0.5,
    num_hash_tables: int = 8,
) -> DataFrame:
    """(id_a, id_b, cosine_approx) for candidate pairs with cosine >=
    threshold — the LSH-bucketed scale path for dedup.embedding's exact
    O(n²) pair join. cosine >= t ⇔ unit-Euclidean d <= sqrt(2-2t)."""
    model, indexed = fit_lsh_model(
        df,
        id_col=id_col,
        vec_col=vec_col,
        bucket_length=bucket_length,
        num_hash_tables=num_hash_tables,
    )
    d_max = math.sqrt(max(0.0, 2.0 - 2.0 * threshold))
    joined = model.approxSimilarityJoin(indexed, indexed, d_max, distCol="_dist")
    return (
        joined.filter(F.col("datasetA._id") < F.col("datasetB._id"))
        .select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            F.round(1.0 - F.col("_dist") * F.col("_dist") / 2.0, 6).alias("cosine_approx"),
        )
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    candidate_factor: int = 2,
    bucket_length: float = 0.5,
    num_hash_tables: int = 8,
) -> DataFrame:
    """(id, cosine) — LSH-candidate top-k with EXACT cosine rerank.

    The standard ANN serve shape: the LSH index proposes
    ``candidate_factor·k`` nearest candidates from bucket collisions
    (normalized Euclidean ANN: d² = 2 − 2·cos on unit vectors); the
    exact cosine is computed only for those candidates and the top-k is
    taken from the rerank. Whenever the true top-k are inside the
    candidate pool (recall 1.0 — floor-tested, held at every scale),
    the output IS the exact top-k, which makes this query checkable
    against the brute-force oracle."""
    from pyspark.ml.linalg import Vectors

    from ..dedup.embedding import cosine_to_const_expr

    model, indexed = fit_lsh_model(
        df,
        id_col=id_col,
        vec_col=vec_col,
        bucket_length=bucket_length,
        num_hash_tables=num_hash_tables,
    )
    norm = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q = Vectors.dense([x / norm for x in query_vec])
    neighbors = model.approxNearestNeighbors(
        indexed, q, k * candidate_factor, distCol="_dist"
    )
    cand = neighbors.select(F.col("_id").alias("id"))
    raw = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_arr"))
    return (
        cand.join(raw, "id")
        .select(
            "id",
            F.round(cosine_to_const_expr(F.col("_arr"), query_vec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
