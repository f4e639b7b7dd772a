"""One-scan table profiling: per-column null counts, exact distinct
cardinalities, and numeric ranges — the dataset health report a
pipeline owner reads before trusting a new 100 TB drop.

Scale posture: every statistic folds into a single wide aggregation
(Catalyst plans multi-distinct via Expand — one shuffle, no per-column
rescans), and the result is one row per column — driver-tiny. The
long-format pivot happens AFTER aggregation via ``stack``, so nothing
row-sized crosses an extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    *,
    numeric_cols: tuple[str, ...] | list[str] = (),
    other_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Profile the given columns in one aggregation pass.

    Returns one row per column: ``col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num`` (the numeric range columns are NULL
    for non-numeric columns).
    """
    cols = [(c, True) for c in numeric_cols] + [(c, False) for c in other_cols]
    if not cols:
        raise ValueError("profile_table: no columns given")
    aggs: list = [F.count(F.lit(1)).alias("_n")]
    for c, is_num in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"_nulls_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
        if is_num:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_max_{c}"))
    one = df.agg(*aggs)
    stacked = ", ".join(
        "'{c}', _nulls_{c}, _dist_{c}, {mn}, {mx}".format(
            c=c,
            mn=f"_min_{c}" if is_num else "CAST(NULL AS DOUBLE)",
            mx=f"_max_{c}" if is_num else "CAST(NULL AS DOUBLE)",
        )
        for c, is_num in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "col_name",
        "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_num",
        "max_num",
    )
