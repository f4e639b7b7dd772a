"""Column variances + the reference's variance-threshold selection rule
(reference A2/M10/M11).

Reference: ``Summarizer.metrics('variance')`` over an assembled vector,
driver-side ``sorted(...)[5]`` to pick the 6th-largest variance as the
``VarianceThresholdSelector`` threshold (Scripts/2_cs_777_statistical_
analysis_feature_selection.py:124-131). The "pick kth largest" is a
driver sort of ≤ dozens of scalars — fine at any scale (SURVEY.md §2.6).

Here the variance pass is a single ``df.agg`` of ``var_samp`` columns —
one distributed job, no vector assembly needed — and the selection rule
is explicit and configurable (SURVEY.md §7.2.5): keep features whose
variance is strictly greater than the kth-largest variance, matching
``VarianceThresholdSelector``'s ``> threshold`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_variances(df: DataFrame, cols: list[str]) -> dict[str, float]:
    """Sample variance per column in ONE aggregation job."""
    row = df.agg(*[F.var_samp(c).alias(c) for c in cols]).collect()[0]
    return {c: float(row[c]) for c in cols}


def summarizer_variances(df: DataFrame, cols: list[str]) -> dict[str, float]:
    """Reference-API path (M10): ``Summarizer.metrics('variance')`` over an
    assembled vector (Scripts/2_...py:124-126). Numerically equivalent to
    ``column_variances`` (both unbiased); kept for MLlib-surface parity."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Summarizer

    vec_col = "__var_features"
    assembled = VectorAssembler(inputCols=cols, outputCol=vec_col).transform(df.select(cols))
    vec = assembled.select(Summarizer.metrics("variance").summary(F.col(vec_col))).collect()[
        0
    ][0][0]
    return {c: float(v) for c, v in zip(cols, vec)}


def kth_largest_variance_threshold(variances: dict[str, float], k: int) -> float:
    """The reference's ``sorted(..., reverse=True)[k-1]`` rule
    (k=6 in Scripts/2_...py:126)."""
    ordered = sorted(variances.values(), reverse=True)
    if not 1 <= k <= len(ordered):
        raise ValueError(f"k={k} out of range for {len(ordered)} features")
    return ordered[k - 1]


def variance_threshold_select(
    df: DataFrame, cols: list[str], *, k: int
) -> tuple[list[str], float]:
    """Keep columns with variance STRICTLY above the kth-largest variance
    (VarianceThresholdSelector keeps features with variance > threshold,
    so exactly the top k-1 survive, ties aside)."""
    variances = column_variances(df, cols)
    threshold = kth_largest_variance_threshold(variances, k)
    selected = [c for c in cols if variances[c] > threshold]
    return selected, threshold
