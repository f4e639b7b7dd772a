from .pipeline import build_pipeline, infer_feature_columns
from .estimators import ESTIMATOR_FAMILIES, make_estimator, reference_grid, quick_grid
from .tuning import fit_tvs, fit_cv, best_params
from .evaluation import evaluate_predictions, METRIC_NAMES
from .train_job import temporal_split, run_training_job

__all__ = [
    "build_pipeline",
    "infer_feature_columns",
    "ESTIMATOR_FAMILIES",
    "make_estimator",
    "reference_grid",
    "quick_grid",
    "fit_tvs",
    "fit_cv",
    "best_params",
    "evaluate_predictions",
    "METRIC_NAMES",
    "temporal_split",
    "run_training_job",
]
