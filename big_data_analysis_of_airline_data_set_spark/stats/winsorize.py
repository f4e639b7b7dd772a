"""Per-group winsorization audit — outlier clipping for feature columns.

Standard feature-engineering step before training: clip a numeric
column at its per-group [p_lo, p_hi] percentiles so tail outliers
cannot dominate gradient updates or scaler fits. This operator emits
the audit table (clip thresholds, clipped-row counts, winsorized mean)
rather than mutating rows — the same two-pass shape either way.

Scale notes:
- Pass 1 computes per-group clip thresholds. The DEFAULT is
  ``approx_percentile`` (KLL-style sketch, map-side partial merge, one
  shuffle of constant-size sketch state per group) — at 100 TB a full
  sort per group for thresholds that don't need exactness, only
  stability, is the wrong plan. ``exact=True`` keeps the interpolated
  ``percentile`` (sort-based aggregation) as the oracle-checkable
  baseline — the same default-approx / exact-twin pairing as the
  ``quantiles_approx`` vs ``quantiles`` catalog queries
  (plans/patterns.py).
- With ``accuracy`` a, the sketch's rank error is bounded by n/a, so
  downstream count-of-clipped checks can assert
  |n_clipped_low − p_lo·n| ≤ n/a + ties without ever computing the
  exact percentile (plans/statistics.py uses a 10× slack).
- Pass 2 re-joins thresholds (tiny per-group table → broadcast) and
  aggregates — one shuffle on the group key total.
- Thresholds are rounded to 6 dp BEFORE comparison on both engines, and
  the winsorized mean accumulates in DECIMAL so float addition order
  cannot flip a value hash (spec.py conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize_summary(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """(group, lo, hi, n_rows, n_clipped_low, n_clipped_high,
    winsorized_mean) per group.

    ``exact=False`` (default): sketch-based thresholds via
    ``approx_percentile`` — the scale path. ``exact=True``: interpolated
    ``percentile`` — the deterministic oracle twin.
    """
    if exact:
        lo_expr = F.expr(f"percentile({value_col}, {p_lo})")
        hi_expr = F.expr(f"percentile({value_col}, {p_hi})")
    else:
        lo_expr = F.expr(f"approx_percentile({value_col}, {p_lo}, {accuracy})")
        hi_expr = F.expr(f"approx_percentile({value_col}, {p_hi}, {accuracy})")
    pct = df.groupBy(group_col).agg(
        F.round(lo_expr, 6).alias("lo"),
        F.round(hi_expr, 6).alias("hi"),
    )
    v = F.col(value_col)
    clipped = F.greatest(F.least(v, F.col("hi")), F.col("lo"))
    return (
        df.join(F.broadcast(pct), group_col)
        .groupBy(group_col, "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum((v < F.col("lo")).cast("long")).alias("n_clipped_low"),
            F.sum((v > F.col("hi")).cast("long")).alias("n_clipped_high"),
            F.round(
                F.sum(F.round(clipped, 6).cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
        )
        .select(
            group_col, "lo", "hi", "n_rows",
            "n_clipped_low", "n_clipped_high", "winsorized_mean",
        )
    )
