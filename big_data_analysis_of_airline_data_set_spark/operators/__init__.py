from .transforms import (
    project_without,
    keep_columns_matching,
    filter_eq,
    drop_any_null,
    union_positional,
    union_by_name,
    deterministic_sample,
    bernoulli_sample,
)
from .cleaning import clean_flights, engineer_features, visualization_dataset

__all__ = [
    "project_without",
    "keep_columns_matching",
    "filter_eq",
    "drop_any_null",
    "union_positional",
    "union_by_name",
    "deterministic_sample",
    "bernoulli_sample",
    "clean_flights",
    "engineer_features",
    "visualization_dataset",
]
