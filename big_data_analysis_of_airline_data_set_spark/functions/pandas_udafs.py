"""Grouped-map Pandas UDAF example: per-group trimmed mean.

The guide's UDAF recipe — ``applyInPandas`` with a one-row-per-group
output — for aggregates SQL can't express directly. Trimmed mean IS
SQL-expressible (quantile bounds + filtered avg), which is exactly why
it's the demo: the DuckDB oracle validates the whole Arrow/pandas path
value-for-value (np.quantile 'linear' == quantile_cont interpolation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def trimmed_mean(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    lower_q: float = 0.1,
    upper_q: float = 0.9,
    round_to: int = 6,
) -> DataFrame:
    """(group, trimmed_mean, n_kept): mean of values within the
    [lower_q, upper_q] interpolated-quantile band, inclusive."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].to_numpy(dtype=np.float64)
        lo = np.quantile(v, lower_q)
        hi = np.quantile(v, upper_q)
        kept = v[(v >= lo) & (v <= hi)]
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "trimmed_mean": [round(float(kept.mean()), round_to)],
                "n_kept": [int(kept.size)],
            }
        )

    schema = f"{group_col} string, trimmed_mean double, n_kept long"
    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(agg, schema)
