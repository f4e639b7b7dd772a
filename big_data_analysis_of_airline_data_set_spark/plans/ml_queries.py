"""ML query catalog — one end-to-end training query per estimator
family (M12-M20), on a supervised task derived from the testdata
(FIXTURES.md §B).

Task shape mirrors the flight problem exactly:
- label: Delay_Status CASE rule on (l_discount-0.05, l_tax-0.04) — the
  "both legs on time" semantic of Scripts/1_...py:68;
- label-driving columns dropped from features (as DepDelay/ArrDelay
  are dropped, Scripts/1_...py:71-72);
- temporal split on year(l_shipdate): test = 2001
  (Scripts/3_...py:52-53 semantics).

Two views per family, ONE fit (cached per session × sf_dir):

- ``ml_<family>_tvs`` / ``ml_..._cv`` — the HARD-CHECKED invariant
  projection of the tuned fit: (family, n_param_combos, train_rows,
  test_rows, feature_dim, n_classes). Every column is predictable from
  the input data + the published grid, so a DuckDB oracle verifies the
  pipeline scaffolding (split semantics, OHE dropLast vector layout,
  label cardinality, grid construction) end-to-end even though metric
  values are engine-specific.
- ``ml_<family>_metrics`` — the reference-shaped (parameter, value)
  metrics table (best params + 6 evaluator metrics,
  Scripts/3_...py:113-118). Rows-only by contract: metric VALUES depend
  on MLlib's optimizer internals; their regression guard is the pytest
  metric-band suite (tests/test_reference_metrics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.flight_exprs import delay_status
from ..ml.train_job import fit_family, run_training_job, training_invariants
from ..sources.readers import read_testdata_table
from .spec import QuerySpec

_CATEGORICAL = ["l_returnflag", "l_linestatus"]
_NUMERIC = ["l_quantity", "l_extendedprice"]
_TEST_YEAR = 2001

# quick_grid sizes (ml/estimators.py) — pinned here so the oracle SQL
# can assert grid construction; a drifted grid breaks the driver check.
_QUICK_GRID_SIZE = {
    "logistic_regression": 2,
    "decision_tree": 2,
    "random_forest": 1,
    "gbt": 1,
    "linear_svc": 1,
    "naive_bayes": 2,
    "mlp": 1,  # ParamGridBuilder().build() == [{}]; layer sweep is cross-instance
}


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


# MLP input dim: OHE of l_returnflag (3 cats → 2) + l_linestatus (2 → 1)
# + 2 scaled numerics = 5 features (dropLast=True default, M2 semantics).
_MLP_LAYERS = [5, 8, 2]

# One tuned fit per (session, sf_dir, family, tuner) — the invariant and
# metrics queries are two projections of the SAME result (same pattern
# as the persisted IVF index in plans/content.py: never refit per view).
_FIT_CACHE: dict[tuple, tuple] = {}


def _fitted(spark: SparkSession, sf_dir: str, family: str, tuner: str) -> tuple:
    key = (spark.sparkContext.applicationId, sf_dir, family, tuner)
    hit = _FIT_CACHE.get(key)
    if hit is None:
        df = _supervised_lineitem(spark, sf_dir)
        hit = fit_family(
            df,
            categorical_cols=_CATEGORICAL,
            numeric_cols=_NUMERIC,
            family=family,
            test_year=_TEST_YEAR,
            tuner=tuner,
            grid="quick",
            mlp_layers=_MLP_LAYERS if family == "mlp" else None,
        )
        _FIT_CACHE[key] = hit
    return hit


def _invariants_query(family: str, tuner: str = "tvs"):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        model, train, test, param_maps = _fitted(spark, sf_dir, family, tuner)
        return training_invariants(
            spark, model, train, test, param_maps, family=family
        )

    fn.__name__ = f"q_ml_{family}_{tuner}_invariants"
    return fn


def _metrics_query(family: str, tuner: str = "tvs"):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        fitted = _fitted(spark, sf_dir, family, tuner)
        return run_training_job(
            spark,
            _supervised_lineitem(spark, sf_dir),
            categorical_cols=_CATEGORICAL,
            numeric_cols=_NUMERIC,
            family=family,
            test_year=_TEST_YEAR,
            tuner=tuner,
            grid="quick",
            mlp_layers=_MLP_LAYERS if family == "mlp" else None,
            fitted=fitted,
        )

    fn.__name__ = f"q_ml_{family}_{tuner}_metrics"
    return fn


def _invariants_oracle(family: str) -> str:
    """DuckDB replay of every invariant column: temporal-split counts are
    plain SQL; feature_dim = Σ(train-distinct cardinality − 1 per
    categorical, OHE dropLast) + |numerics|; n_classes = train label
    cardinality; n_param_combos = published quick-grid size."""
    return f"""
WITH sup AS (
  SELECT l_returnflag, l_linestatus,
         year(l_shipdate) AS yr,
         CASE WHEN l_discount - 0.05 <= 0 AND l_tax - 0.04 <= 0
              THEN 0 ELSE 1 END AS label
  FROM lineitem
),
train AS (SELECT * FROM sup WHERE yr <> {_TEST_YEAR})
SELECT '{family}' AS family,
       CAST({_QUICK_GRID_SIZE[family]} AS BIGINT) AS n_param_combos,
       (SELECT count(*) FROM train) AS train_rows,
       (SELECT count(*) FROM sup WHERE yr = {_TEST_YEAR}) AS test_rows,
       (SELECT (count(DISTINCT l_returnflag) - 1)
             + (count(DISTINCT l_linestatus) - 1)
             + {len(_NUMERIC)} FROM train) AS feature_dim,
       (SELECT count(DISTINCT label) FROM train) AS n_classes
"""


def _family_entries(family: str, m_tag: str, label: str) -> dict[str, QuerySpec]:
    return {
        f"ml_{family}_tvs": QuerySpec(
            f"ml_{family}_tvs",
            _invariants_query(family),
            _invariants_oracle(family),
            f"{m_tag}+M19 {label} TVS fit — oracled scaffolding invariants",
        ),
        f"ml_{family}_metrics": QuerySpec(
            f"ml_{family}_metrics",
            _metrics_query(family),
            None,
            f"{m_tag} {label} metrics table (rows-only; band-tested in pytest)",
        ),
    }


QUERIES: dict[str, QuerySpec] = {
    **_family_entries("logistic_regression", "M12", "LR"),
    **_family_entries("decision_tree", "M13", "DT"),
    **_family_entries("random_forest", "M14", "RF"),
    **_family_entries("gbt", "M15", "GBT"),
    **_family_entries("linear_svc", "M16", "LinearSVC"),
    **_family_entries("naive_bayes", "M17", "Gaussian NB"),
    **_family_entries("mlp", "M18", "MLP"),
    "ml_logistic_regression_cv": QuerySpec(
        "ml_logistic_regression_cv",
        _invariants_query("logistic_regression", tuner="cv"),
        _invariants_oracle("logistic_regression"),
        "M20 CrossValidator LR (numFolds=3 at harness scale; 10 in module API)"
        " — oracled scaffolding invariants",
    ),
    "ml_logistic_regression_cv_metrics": QuerySpec(
        "ml_logistic_regression_cv_metrics",
        _metrics_query("logistic_regression", tuner="cv"),
        None,
        "M20 CV-LR metrics table (rows-only; band-tested in pytest)",
    ),
}
