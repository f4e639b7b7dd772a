"""Leave-one-out target encoding — the categorical encoder OHE can't be.

High-cardinality categoricals (airport, carrier, tail number at the
reference's scale; URL domain, author id at corpus scale) blow up
one-hot width; target encoding replaces the category with the mean of
the label over that category. The naive version leaks the row's own
label into its feature; the standard fix is LEAVE-ONE-OUT:

    enc(row) = (Σ_cat y − y_row) / (n_cat − 1)

Singleton categories have no leave-one-out sample → NULL (callers
impute with the global prior; emitting the prior here would hide the
singleton signal the caller usually wants to see).

Everything is exact integer/decimal aggregation followed by one IEEE
division, so a SQL oracle hash-checks every encoded value — unlike
fitted encoders whose smoothing constants drift. Scale shape: one
groupBy (category sums broadcast back — category cardinality ≪ rows)
and a map-side expression; no window, no per-row state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    *,
    category_col: str,
    label_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Input rows + ``target_enc`` column (NULL for singletons AND for
    NULL categories — a LEFT join keeps every input row; an inner join
    would silently drop NULL-category rows because NULL never
    equi-joins). ``label_col`` must be integer-valued (0/1 labels or
    counts) so the category sums are exact."""
    sums = df.groupBy(category_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_cat"),
        F.sum(F.col(label_col).cast("long")).alias("_sum_cat"),
    ).filter(F.col(category_col).isNotNull())
    out = df.join(F.broadcast(sums), [category_col], "left")
    enc = (
        (F.col("_sum_cat") - F.col(label_col).cast("long")).cast("double")
        / (F.col("_n_cat") - 1).cast("double")
    )
    return out.withColumn(
        "target_enc",
        F.when(F.col("_n_cat") > 1, F.round(enc, round_dp)),
    ).drop("_n_cat", "_sum_cat")
