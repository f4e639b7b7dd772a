from .brute import brute_force_topk
from .lsh import lsh_topk, fit_lsh_model

__all__ = ["brute_force_topk", "lsh_topk", "fit_lsh_model"]
