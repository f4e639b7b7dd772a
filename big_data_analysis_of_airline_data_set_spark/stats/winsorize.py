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


def spread_rows_for_heavy_agg(df: DataFrame, spread_col: str) -> DataFrame:
    """Redistribute rows across the session shuffle width before a
    buffering-heavy aggregate partial (exact interpolated percentile =
    ObjectHashAggregate value→count maps) when the input's own
    partitioning is narrower than half the session width.

    Why (round-13, guide §2.5 input skew): parquet cannot split below
    row-group boundaries, so a small input (one or two row groups)
    feeds such partials from 1–3 tasks regardless of core count —
    measured −35% on the exact-percentile pass at sf0.1 once spread.
    Keyed by the VALUE column (a deterministic hash — never rand(),
    guide §2.5 retry hazard) so equal values co-locate for the partial
    count-maps. Scale posture: at real scale the scan is already wider
    than the session width and the gate makes this a NO-OP, so the
    exact twin's plan gains no extra exchange where it already
    parallelizes; the sketch twins remain the scale default either
    way. Values are unaffected — percentile is placement-insensitive.
    """
    try:
        width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return df
    if width <= 1 or df.rdd.getNumPartitions() * 2 > width:
        return df
    return df.repartition(F.col(spread_col))


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
        # exact percentile partials buffer value→count maps; spread a
        # narrowly-partitioned input first (no-op at scale — see helper)
        pct_in = spread_rows_for_heavy_agg(
            df.select(group_col, value_col), value_col
        )
    else:
        lo_expr = F.expr(f"approx_percentile({value_col}, {p_lo}, {accuracy})")
        hi_expr = F.expr(f"approx_percentile({value_col}, {p_hi}, {accuracy})")
        pct_in = df
    pct = pct_in.groupBy(group_col).agg(
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
