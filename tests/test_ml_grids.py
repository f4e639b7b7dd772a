"""Reference hyperparameter grids (M12-M18) must match the published
shapes exactly (SURVEY.md §2.11), and the MLP layer sweep mirrors
script 9's manual loop."""

from __future__ import annotations

import pytest

from big_data_analysis_of_airline_data_set_spark.ml import make_estimator, reference_grid
from big_data_analysis_of_airline_data_set_spark.ml.mlp_sweep import mlp_layer_sweep
from big_data_analysis_of_airline_data_set_spark.ml.train_job import temporal_split
from big_data_analysis_of_airline_data_set_spark.plans.ml_queries import (
    _CATEGORICAL,
    _MLP_LAYERS,
    _NUMERIC,
    _TEST_YEAR,
    _supervised_lineitem,
)

# family → (grid size, param names) per Scripts/3-8's published grids
EXPECTED = {
    "logistic_regression": (9, {"regParam", "elasticNetParam"}),
    "decision_tree": (8, {"impurity", "maxDepth"}),
    "random_forest": (32, {"impurity", "maxDepth", "numTrees"}),
    "gbt": (4, {"maxDepth"}),
    "linear_svc": (5, {"regParam"}),
    "naive_bayes": (5, {"smoothing"}),
}


@pytest.mark.parametrize("family", sorted(EXPECTED))
def test_reference_grid_shapes(spark, family):
    est = make_estimator(family, mlp_layers=[4, 2, 2] if family == "mlp" else None)
    grid = reference_grid(family, est)
    size, params = EXPECTED[family]
    assert len(grid) == size
    assert {p.name for p in grid[0].keys()} == params


def test_mlp_reference_grid_is_manual_sweep(spark):
    est = make_estimator("mlp", mlp_layers=[4, 2, 2])
    assert len(reference_grid("mlp", est)) == 1  # sweep is across instances


def test_mlp_layer_sweep(spark, sf_dir):
    df = _supervised_lineitem(spark, sf_dir)
    train, test = temporal_split(df, "Year", _TEST_YEAR)
    out = mlp_layer_sweep(
        spark,
        train,
        test,
        categorical_cols=_CATEGORICAL,
        numeric_cols=_NUMERIC,
        layer_options=[_MLP_LAYERS, [_MLP_LAYERS[0], 4, 2]],
        max_iter=5,
    ).collect()
    assert len(out) == 2
    assert sum(r.is_best for r in out) >= 1
    assert all(0.0 <= r.area_ROC <= 1.0 for r in out)
