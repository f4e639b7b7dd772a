"""Hyperparameter tuning: TrainValidationSplit (M19) and CrossValidator
(M20), with the reference's driver-side best-param extraction (O1).

Reference: TVS trainRatio=0.8 + AUC evaluator (Scripts/3_...py:94-99);
CV numFolds=10, parallelism=10 (Scripts/10_...py:93-97). Seeds pinned
for reproducibility (the reference leaves TVS's randomSplit unseeded —
deliberately fixed here, SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.tuning import CrossValidator, TrainValidationSplit
from pyspark.sql import DataFrame

from .estimators import SEED


def _auc_evaluator() -> BinaryClassificationEvaluator:
    return BinaryClassificationEvaluator(metricName="areaUnderROC")


def fit_tvs(pipeline, param_maps: list, train: DataFrame, *, train_ratio: float = 0.8,
            parallelism: int = 4, seed: int = SEED):
    """TrainValidationSplit fit (Scripts/3_...py:94-99), parallel grid."""
    tvs = TrainValidationSplit(
        estimator=pipeline,
        estimatorParamMaps=param_maps,
        evaluator=_auc_evaluator(),
        trainRatio=train_ratio,
        parallelism=parallelism,
        seed=seed,
    )
    return tvs.fit(train)


def fit_cv(pipeline, param_maps: list, train: DataFrame, *, num_folds: int = 10,
           parallelism: int = 10, seed: int = SEED):
    """CrossValidator fit (Scripts/10_...py:93-97)."""
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=param_maps,
        evaluator=_auc_evaluator(),
        numFolds=num_folds,
        parallelism=parallelism,
        seed=seed,
    )
    return cv.fit(train)


def best_params(model) -> dict[str, object]:
    """Driver-side sort of (validation metric, param map) — the
    reference's ``sorted(zip(...), reverse=True)[0]``
    (Scripts/3_...py:101-102 / Scripts/10_...py:100). Works for both
    TVS (validationMetrics) and CV (avgMetrics) models."""
    metrics = getattr(model, "validationMetrics", None) or model.avgMetrics
    ranked = sorted(
        zip(metrics, model.getEstimatorParamMaps()), key=lambda x: x[0], reverse=True
    )
    best = ranked[0][1]
    return {p.name: v for p, v in best.items()}
