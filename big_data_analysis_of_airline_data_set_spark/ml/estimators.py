"""Estimator registry: the reference's 7 classifier families (M12-M18)
plus the CV-LR variant, each with its published hyperparameter grid.

``reference_grid`` reproduces the exact grids from scripts 3-10 (full
runs); ``quick_grid`` is a 1-2-candidate, low-iteration variant used by
the sf0.01 catalog queries so the correctness harness stays fast. Seeds
are pinned everywhere a family accepts one (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.ml.classification import (
    DecisionTreeClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    NaiveBayes,
    RandomForestClassifier,
)
from pyspark.ml.tuning import ParamGridBuilder

SEED = 777

ESTIMATOR_FAMILIES = (
    "logistic_regression",
    "decision_tree",
    "random_forest",
    "gbt",
    "linear_svc",
    "naive_bayes",
    "mlp",
)


def make_estimator(family: str, *, mlp_layers: list[int] | None = None):
    """Fresh estimator instance for ``family`` (label col 'label',
    features col 'features' — pipeline defaults)."""
    if family == "logistic_regression":
        return LogisticRegression()
    if family == "decision_tree":
        return DecisionTreeClassifier(seed=SEED)
    if family == "random_forest":
        return RandomForestClassifier(seed=SEED)
    if family == "gbt":
        return GBTClassifier(seed=SEED)
    if family == "linear_svc":
        return LinearSVC()
    if family == "naive_bayes":
        # Gaussian NB as in Scripts/8_cs_777_naive_bayes.py:81
        return NaiveBayes(modelType="gaussian")
    if family == "mlp":
        if mlp_layers is None:
            raise ValueError("mlp requires explicit layers (input dim data-dependent)")
        return MultilayerPerceptronClassifier(seed=SEED, layers=mlp_layers)
    raise ValueError(f"unknown family: {family}")


def reference_grid(family: str, est) -> list:
    """Published grids: Scripts/3_...py:87-90 (LR), 4:87-90 (DT),
    5:87-91 (RF), 6:87-89 (GBT), 7:87-89 (SVC), 8:87-89 (NB);
    MLP (script 9) sweeps layer shapes manually, so its grid is the
    estimator's own layers param."""
    b = ParamGridBuilder()
    if family == "logistic_regression":
        return (
            b.addGrid(est.regParam, [0.1, 0.01, 0.05])
            .addGrid(est.elasticNetParam, [0.0, 0.5, 1.0])
            .build()
        )
    if family == "decision_tree":
        return (
            b.addGrid(est.impurity, ["gini", "entropy"])
            .addGrid(est.maxDepth, [5, 10, 15, 20])
            .build()
        )
    if family == "random_forest":
        return (
            b.addGrid(est.impurity, ["gini", "entropy"])
            .addGrid(est.maxDepth, [5, 10, 15, 20])
            .addGrid(est.numTrees, [5, 10, 15, 20])
            .build()
        )
    if family == "gbt":
        return b.addGrid(est.maxDepth, [5, 10, 15, 20]).build()
    if family == "linear_svc":
        return b.addGrid(est.regParam, [0.0, 0.3, 0.5, 1.0, 2.0]).build()
    if family == "naive_bayes":
        return b.addGrid(est.smoothing, [0.0, 0.3, 0.5, 0.7, 1.0]).build()
    if family == "mlp":
        return b.build()  # layer sweep is done across estimator instances
    raise ValueError(f"unknown family: {family}")


def quick_grid(family: str, est) -> list:
    """Small grids + capped iterations for harness-scale runs."""
    b = ParamGridBuilder()
    if family == "logistic_regression":
        est.setMaxIter(20)
        return b.addGrid(est.regParam, [0.1, 0.01]).build()
    if family == "decision_tree":
        return b.addGrid(est.impurity, ["gini", "entropy"]).addGrid(est.maxDepth, [5]).build()
    if family == "random_forest":
        return b.addGrid(est.maxDepth, [5]).addGrid(est.numTrees, [5]).build()
    if family == "gbt":
        est.setMaxIter(5)
        return b.addGrid(est.maxDepth, [5]).build()
    if family == "linear_svc":
        est.setMaxIter(20)
        return b.addGrid(est.regParam, [0.5]).build()
    if family == "naive_bayes":
        return b.addGrid(est.smoothing, [0.5, 1.0]).build()
    if family == "mlp":
        est.setMaxIter(15)
        return b.build()
    raise ValueError(f"unknown family: {family}")
