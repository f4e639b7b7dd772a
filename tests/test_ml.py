"""ML pipeline invariants (SURVEY.md §5.2): seeded determinism, metric
sanity bands, vector dimensions, handleInvalid row-drop semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.ml import (
    build_pipeline,
    infer_feature_columns,
    make_estimator,
    quick_grid,
    fit_tvs,
    best_params,
    temporal_split,
)
from big_data_analysis_of_airline_data_set_spark.plans.ml_queries import (
    _MLP_LAYERS,
    _supervised_lineitem,
    _CATEGORICAL,
    _NUMERIC,
    _TEST_YEAR,
)


def test_infer_feature_columns(spark, sf_dir):
    df = _supervised_lineitem(spark, sf_dir)
    cats, nums = infer_feature_columns(df)
    assert cats == _CATEGORICAL
    assert nums == _NUMERIC  # Year and label excluded


def test_temporal_split_is_disjoint_and_complete(spark, sf_dir):
    df = _supervised_lineitem(spark, sf_dir)
    train, test = temporal_split(df, "Year", _TEST_YEAR)
    assert train.filter(F.col("Year") == _TEST_YEAR).count() == 0
    assert test.filter(F.col("Year") != _TEST_YEAR).count() == 0
    assert train.count() + test.count() == df.count()
    assert test.count() > 0  # the split year exists in the data


def test_feature_vector_dimension(spark, sf_dir):
    """OHE dims: 3-cat returnflag → 2, 2-cat linestatus → 1, +2 scaled
    numerics = 5 (the reference pins MLP input dims the same way,
    Scripts/9_...py:113-115)."""
    df = _supervised_lineitem(spark, sf_dir)
    pipe = build_pipeline(_CATEGORICAL, _NUMERIC, make_estimator("logistic_regression"))
    model = pipe.fit(df)
    row = model.transform(df).select("features").first()
    assert row.features.size == _MLP_LAYERS[0]


def test_lr_tvs_deterministic_and_sane(spark, sf_dir):
    df = _supervised_lineitem(spark, sf_dir)
    train, test = temporal_split(df, "Year", _TEST_YEAR)

    def run() -> tuple[dict, float]:
        est = make_estimator("logistic_regression")
        grid = quick_grid("logistic_regression", est)
        model = fit_tvs(build_pipeline(_CATEGORICAL, _NUMERIC, est), grid, train)
        from big_data_analysis_of_airline_data_set_spark.ml import evaluate_predictions

        metrics = evaluate_predictions(model.transform(test))
        return best_params(model), metrics["area_ROC"]

    p1, auc1 = run()
    p2, auc2 = run()
    assert p1 == p2
    assert abs(auc1 - auc2) < 1e-9  # pinned seeds ⇒ reproducible
    assert 0.0 <= auc1 <= 1.0


def test_string_indexer_skip_drops_unseen_categories(spark):
    """handleInvalid='skip' (Scripts/3_...py:57): test-time categories
    unseen at fit silently drop rows (SURVEY.md §2.12.6)."""
    train = spark.createDataFrame(
        [("a", 1.0, 0.0), ("b", 2.0, 1.0), ("a", 3.0, 1.0)], "cat string, x double, label double"
    )
    test = spark.createDataFrame(
        [("a", 1.5, 0.0), ("zz", 9.0, 1.0)], "cat string, x double, label double"
    )
    pipe = build_pipeline(["cat"], ["x"], make_estimator("logistic_regression"))
    model = pipe.fit(train)
    assert model.transform(test).count() == 1  # 'zz' row dropped
