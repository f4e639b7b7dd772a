from .brute import brute_force_topk
from .lsh import lsh_topk, fit_lsh_model, lsh_near_dup_pairs
from .ivf import ivf_topk, build_ivf_index
from .pandas_cosine import brute_force_topk_pandas, cosine_to_query_udf

__all__ = [
    "brute_force_topk",
    "lsh_topk",
    "fit_lsh_model",
    "lsh_near_dup_pairs",
    "ivf_topk",
    "build_ivf_index",
    "brute_force_topk_pandas",
    "cosine_to_query_udf",
]
