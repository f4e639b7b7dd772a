"""ML pipeline builder — the reference's ``pipeline_creator``
(Scripts/3_cs_777_logistic_regression.py:56-72, identical in scripts
4-10) re-expressed with two scale fixes:

- ONE multi-column StringIndexer + ONE multi-column OneHotEncoder stage
  instead of per-column stages (the reference builds 2·N stages whose
  fits run as N sequential distributed jobs; SURVEY.md §7.4.5).
- ``handleInvalid='skip'`` preserved on the indexer (documented semantic:
  unseen test-time categories drop rows, SURVEY.md §2.12.6).

Stage order and vector layout match the reference exactly:
indexer → encoder → VectorAssembler(numerics)='vector_num' →
StandardScaler='vector_num_scaled' → VectorAssembler(encoded cats +
scaled nums)='features' → estimator. StandardScaler keeps MLlib
defaults (unit std, no centering) as in Scripts/3_...py:60.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame


def infer_feature_columns(
    df: DataFrame, *, exclude: tuple[str, ...] = ("Year", "Delay_Status", "label")
) -> tuple[list[str], list[str]]:
    """dtypes-driven categorical/numeric split, mirroring the reference's
    runtime schema introspection (Scripts/3_...py:44-48): strings are
    categorical; everything else except the excluded cols is numeric."""
    categorical = [name for name, dtype in df.dtypes if dtype == "string"]
    numeric = [
        name
        for name, dtype in df.dtypes
        if dtype != "string" and name not in exclude
    ]
    return categorical, numeric


def feature_stages(
    categorical_cols: list[str], numeric_cols: list[str]
) -> list:
    """The parameter-free transform prefix: indexers → encoders →
    assembler → scaler → assembler ending in the ``features`` vector.
    Split out (round 12) so tuners can fit it ONCE per feature set
    instead of once per grid candidate inside TVS — none of these
    stages carries a tuned parameter, so re-fitting them per candidate
    is pure repeated work (at scale, hours of it)."""
    stages = []
    encoded_cols = [f"{c}_encoded" for c in categorical_cols]
    if categorical_cols:
        indexed_cols = [f"{c}_string" for c in categorical_cols]
        stages.append(
            StringIndexer(
                inputCols=categorical_cols,
                outputCols=indexed_cols,
                handleInvalid="skip",
            )
        )
        stages.append(OneHotEncoder(inputCols=indexed_cols, outputCols=encoded_cols))
    stages.append(VectorAssembler(inputCols=numeric_cols, outputCol="vector_num"))
    stages.append(StandardScaler(inputCol="vector_num", outputCol="vector_num_scaled"))
    stages.append(
        VectorAssembler(
            inputCols=encoded_cols + ["vector_num_scaled"], outputCol="features"
        )
    )
    return stages


def build_feature_pipeline(
    categorical_cols: list[str], numeric_cols: list[str]
) -> Pipeline:
    """Estimator-less Pipeline over :func:`feature_stages`."""
    return Pipeline(stages=feature_stages(categorical_cols, numeric_cols))


def build_pipeline(categorical_cols: list[str], numeric_cols: list[str], estimator) -> Pipeline:
    """indexers → encoders → assembler → scaler → assembler → estimator."""
    return Pipeline(
        stages=feature_stages(categorical_cols, numeric_cols) + [estimator]
    )
