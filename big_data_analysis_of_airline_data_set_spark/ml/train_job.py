"""End-to-end training job — reference entry-point C
(Scripts/3_cs_777_logistic_regression.py and twins, SURVEY.md §3.3):

read → rename label → temporal split by year → pipeline fit (TVS/CV
over a grid) → predict test → 6 metrics off cached predictions →
small metrics table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .estimators import make_estimator, quick_grid, reference_grid
from .evaluation import evaluate_predictions
from .pipeline import build_pipeline
from .tuning import best_params, fit_cv, fit_tvs


def temporal_split(df: DataFrame, year_col: str, test_year: int) -> tuple[DataFrame, DataFrame]:
    """Train = all years except ``test_year``; test = ``test_year``
    (Scripts/3_...py:52-53 — NOT a random split). With the table
    partitioned by year this is static partition pruning on both sides."""
    train = df.filter(F.col(year_col) != test_year)
    test = df.filter(F.col(year_col) == test_year)
    return train, test


def run_training_job(
    spark: SparkSession,
    df: DataFrame,
    *,
    categorical_cols: list[str],
    numeric_cols: list[str],
    family: str,
    year_col: str = "Year",
    test_year: int,
    tuner: str = "tvs",
    grid: str = "quick",
    mlp_layers: list[int] | None = None,
    num_folds: int = 3,
    round_to: int = 3,
) -> DataFrame:
    """Returns the reference-shaped metrics table: rows of
    (parameter, value) — best params first, then the 6 metrics
    (Scripts/3_...py:113-118)."""
    train, test = temporal_split(df, year_col, test_year)
    est = make_estimator(family, mlp_layers=mlp_layers)
    grid_fn = quick_grid if grid == "quick" else reference_grid
    param_maps = grid_fn(family, est)
    pipeline = build_pipeline(categorical_cols, numeric_cols, est)

    if tuner == "cv":
        model = fit_cv(pipeline, param_maps, train, num_folds=num_folds)
    else:
        model = fit_tvs(pipeline, param_maps, train)

    predictions = model.transform(test)
    metrics = evaluate_predictions(predictions)
    best = best_params(model) if param_maps else {}

    def fmt(v) -> str:
        # param values may be categorical ('gini'); metrics are floats
        return str(round(float(v), round_to)) if isinstance(v, (int, float)) else str(v)

    rows = [(k, fmt(v)) for k, v in best.items()]
    rows += [(k, fmt(v)) for k, v in metrics.items()]
    return spark.createDataFrame(rows, "parameter string, value string")
