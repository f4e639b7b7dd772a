from .exact import exact_dedup_groups, drop_exact_duplicates
from .ngram import shingles_col, jaccard_pairs
from .minhash import minhash_near_dup_pairs
from .simhash import simhash_col, simhash_near_dup_pairs
from .embedding import (
    banded_embedding_near_dup_pairs,
    cosine_sim_expr,
    embedding_near_dup_pairs,
)

__all__ = [
    "exact_dedup_groups",
    "drop_exact_duplicates",
    "shingles_col",
    "jaccard_pairs",
    "minhash_near_dup_pairs",
    "simhash_col",
    "simhash_near_dup_pairs",
    "cosine_sim_expr",
    "embedding_near_dup_pairs",
    "banded_embedding_near_dup_pairs",
]
