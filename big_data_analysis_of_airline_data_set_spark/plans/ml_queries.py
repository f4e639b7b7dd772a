"""ML query catalog — one end-to-end training query per estimator
family (M12-M20), on a supervised task derived from the testdata
(FIXTURES.md §B: rows-only checks; metric determinism comes from pinned
seeds, SURVEY.md §5.2).

Task shape mirrors the flight problem exactly:
- label: Delay_Status CASE rule on (l_discount, l_tax-0.02) — the
  "both legs on time" semantic of Scripts/1_...py:68;
- label-driving columns dropped from features (as DepDelay/ArrDelay
  are dropped, Scripts/1_...py:71-72);
- temporal split on year(l_shipdate): test = 2001
  (Scripts/3_...py:52-53 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.flight_exprs import delay_status
from ..ml.train_job import run_training_job
from ..sources.readers import read_testdata_table
from .spec import QuerySpec

_CATEGORICAL = ["l_returnflag", "l_linestatus"]
_NUMERIC = ["l_quantity", "l_extendedprice"]
_TEST_YEAR = 2001


def _supervised_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata_table(spark, sf_dir, "lineitem")
    return li.select(
        *_CATEGORICAL,
        *_NUMERIC,
        F.year("l_shipdate").alias("Year"),
        # thresholds put ~30% of rows in class 0 (balanced enough that
        # fits aren't degenerate majority predictors)
        delay_status(F.col("l_discount") - 0.05, F.col("l_tax") - 0.04)
        .cast("double")
        .alias("label"),
    )


def _family_query(family: str, tuner: str = "tvs", mlp_layers: list[int] | None = None):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _supervised_lineitem(spark, sf_dir)
        return run_training_job(
            spark,
            df,
            categorical_cols=_CATEGORICAL,
            numeric_cols=_NUMERIC,
            family=family,
            test_year=_TEST_YEAR,
            tuner=tuner,
            grid="quick",
            mlp_layers=mlp_layers,
        )

    fn.__name__ = f"q_ml_{family}_{tuner}"
    return fn


# MLP input dim: OHE of l_returnflag (3 cats → 2) + l_linestatus (2 → 1)
# + 2 scaled numerics = 5 features (dropLast=True default, M2 semantics).
_MLP_LAYERS = [5, 8, 2]

QUERIES: dict[str, QuerySpec] = {
    "ml_logistic_regression_tvs": QuerySpec(
        "ml_logistic_regression_tvs",
        _family_query("logistic_regression"),
        None,
        "M12+M19 LR with TVS grid",
    ),
    "ml_decision_tree_tvs": QuerySpec(
        "ml_decision_tree_tvs",
        _family_query("decision_tree"),
        None,
        "M13+M19 DT with TVS grid",
    ),
    "ml_random_forest_tvs": QuerySpec(
        "ml_random_forest_tvs",
        _family_query("random_forest"),
        None,
        "M14+M19 RF with TVS grid",
    ),
    "ml_gbt_tvs": QuerySpec(
        "ml_gbt_tvs",
        _family_query("gbt"),
        None,
        "M15+M19 GBT with TVS grid",
    ),
    "ml_linear_svc_tvs": QuerySpec(
        "ml_linear_svc_tvs",
        _family_query("linear_svc"),
        None,
        "M16+M19 LinearSVC with TVS grid",
    ),
    "ml_naive_bayes_tvs": QuerySpec(
        "ml_naive_bayes_tvs",
        _family_query("naive_bayes"),
        None,
        "M17+M19 Gaussian NB with TVS grid",
    ),
    "ml_mlp_tvs": QuerySpec(
        "ml_mlp_tvs",
        _family_query("mlp", mlp_layers=_MLP_LAYERS),
        None,
        "M18+M19 MLP (layer sweep via estimator instances)",
    ),
    "ml_logistic_regression_cv": QuerySpec(
        "ml_logistic_regression_cv",
        _family_query("logistic_regression", tuner="cv"),
        None,
        "M20 CrossValidator LR (numFolds=3 at harness scale; 10 in module API)",
    ),
}
