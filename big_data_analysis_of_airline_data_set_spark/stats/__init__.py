from .correlation import correlation_matrix, correlation_pairs_df
from .chisquare import chi_square_test, index_categoricals
from .variance import (
    column_variances,
    summarizer_variances,
    kth_largest_variance_threshold,
    variance_threshold_select,
)
from .selectors import select_univariate_categorical, select_univariate_continuous

__all__ = [
    "correlation_matrix",
    "correlation_pairs_df",
    "chi_square_test",
    "index_categoricals",
    "column_variances",
    "summarizer_variances",
    "kth_largest_variance_threshold",
    "variance_threshold_select",
    "select_univariate_categorical",
    "select_univariate_continuous",
]
