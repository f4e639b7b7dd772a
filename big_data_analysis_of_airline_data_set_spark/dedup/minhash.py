"""MinHash-LSH near-duplicate detection — the scale path.

shingle → HashingTF (binary sparse vector) → MinHashLSH → banded
``approxSimilarityJoin``. At 100 TB this replaces the O(n²) pair join
of ``dedup.ngram`` with a shuffle on hash-bucket keys: candidate pairs
only where at least one band collides; Jaccard distance is then exact
on the candidates (MLlib computes it from the feature vectors).

numHashTables trades recall for shuffle volume; 5 is a reasonable
default for a 0.5 threshold.
"""

from __future__ import annotations

from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import shingles_col

SEED = 777


def minhash_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    num_hash_tables: int = 5,
    num_features: int = 1 << 18,
) -> DataFrame:
    """(id_a, id_b, jaccard_distance) for candidate pairs with distance
    <= 1 - threshold. Docs with no shingles are excluded (MinHash is
    undefined on empty sets)."""
    base = df.select(
        F.col(id_col).alias("_id"), shingles_col(F.col(text_col), n).alias("_sh")
    ).filter(F.size("_sh") > 0)
    tf = HashingTF(inputCol="_sh", outputCol="_features", numFeatures=num_features, binary=True)
    feats = tf.transform(base)
    lsh = MinHashLSH(inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=SEED)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="jaccard_distance")
    return (
        joined.filter(F.col("datasetA._id") < F.col("datasetB._id"))
        .select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
    )
