"""Per-group closed-form OLS — distributed regression without MLlib.

The analytic companion to correlation (stats/correlation.py): for each
group, fit y = a + b·x by least squares using only ALGEBRAIC moment
sums (n, Σx, Σy, Σxy, Σx², Σy²) — one map-side-combined aggregation,
no iteration, no driver data. This is how per-segment trend lines are
fit over 100 TB: the shuffle carries six numbers per group.

Engine-exact by construction (the repo's decimal-moment discipline):
inputs with bounded decimal scale accumulate in DECIMAL(38,s) — exact,
order-independent — and only the FINAL closed-form arithmetic runs in
doubles, where both engines execute the identical correctly-rounded
IEEE expression tree. Spark's/DuckDB's own ``regr_slope`` et al.
accumulate floating covariances whose partial-aggregation order differs
per engine/partitioning — fine for analysis, wrong for a value-hash
oracle, which is why this module does not use them.

    b  = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    a  = (Σy − b·Σx) / n
    r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))

Degenerate groups (constant x → zero denominator) yield NULL slope —
stated, and replayed identically by the oracle via NULLIF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_ols(
    df: DataFrame,
    *,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    x_scale: int = 2,
    y_scale: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """(group…, n, slope, intercept, r2) per group, round(round_dp).

    ``x_scale``/``y_scale``: decimal scale of the inputs — the moment
    sums use DECIMAL(38, scale·2) so products stay exact."""
    x = F.col(x_col).cast(f"decimal(19,{x_scale})")
    y = F.col(y_col).cast(f"decimal(19,{y_scale})")

    def dsum(c: Column, scale: int) -> Column:
        return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")

    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(x, x_scale).alias("sx"),
        dsum(y, y_scale).alias("sy"),
        dsum(x * y, x_scale + y_scale).alias("sxy"),
        dsum(x * x, x_scale * 2).alias("sxx"),
        dsum(y * y, y_scale * 2).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.nullif(n * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0))
    var_y = F.nullif(n * F.col("syy") - F.col("sy") * F.col("sy"), F.lit(0.0))
    slope = cov_n / var_x
    return agg.select(
        *group_cols,
        "n",
        F.round(slope, round_dp).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, round_dp).alias("intercept"),
        F.round(cov_n * cov_n / (var_x * var_y), round_dp).alias("r2"),
    )
