"""Closed-form distributional statistics: per-group OLS, two-sample KS.

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


def ks_two_sample(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_dp: int = 6,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the
    ``value_col`` distributions of two groups — the drift test a data
    pipeline runs between snapshots/sources when a mean shift isn't
    enough (KS sees shape changes the mean hides).

    D = max over pooled values x of |F_a(x) − F_b(x)|, computed exactly:
    one window over the pooled rows ordered by value with a RANGE frame
    (ties included on both CDFs simultaneously — the textbook
    right-continuous empirical CDF), cumulative counts divided by group
    sizes. Integer counts → identical IEEE divisions on every engine,
    so the statistic is value-hash stable. MLlib's KolmogorovSmirnovTest
    is one-sample-vs-theoretical only; this is the two-sample form.

    Scale shape: one shuffle (the global ordering window). For 100 TB
    drift checks, run it per partition-key stratum (add the stratum to
    the window's partitionBy) so no global sort is needed.
    """
    from pyspark.sql.window import Window as W

    g = F.col(group_col)
    # NULL values are excluded, not 'observations': Spark's window
    # ORDER BY sorts NULLs first while DuckDB sorts them last, so a
    # NULL row would both distort the CDFs and break oracle parity
    pooled = df.filter(
        g.isin([group_a, group_b]) & F.col(value_col).isNotNull()
    ).select(g.alias("_g"), F.col(value_col).alias("_v"))
    w = W.orderBy("_v").rangeBetween(W.unboundedPreceding, 0)
    ca = F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0)).over(w)
    cb = F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0)).over(w)
    na = F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0)).over(
        W.partitionBy()
    )
    nb = F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0)).over(
        W.partitionBy()
    )
    diffs = pooled.select(
        F.abs(
            ca.cast("double") / na.cast("double")
            - cb.cast("double") / nb.cast("double")
        ).alias("_d"),
        na.alias("_na"),
        nb.alias("_nb"),
    )
    return diffs.agg(
        F.max("_na").cast("long").alias("n_a"),
        F.max("_nb").cast("long").alias("n_b"),
        F.round(F.max("_d"), round_dp).alias("ks_d"),
    ).select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        "n_a",
        "n_b",
        "ks_d",
    )


def ab_proportion_ztest(
    df: DataFrame,
    *,
    unit_col: str,
    variant_col,
    conversion_col,
    round_dp: int = 6,
) -> DataFrame:
    """Two-proportion z-test over experiment units — the A/B readout:
    per variant (exactly two expected, 'a' < 'b' lexicographically),
    unit-level conversion (a unit converts if ANY of its rows has
    ``conversion_col`` true), pooled-variance z statistic. The emitted
    ``n_variants`` column is the guard against malformed experiments:
    a ONE-variant input (bad variant expression, unlaunched B) yields
    NULL b-side columns and NULL z, never a fake z=0 'no effect'; a
    THREE-plus-variant input likewise NULLs the b side and the z —
    silently reducing it to the lexicographic min/max arms would
    report a plausible-looking 2-arm z with the middle arms dropped
    and no signal that anything was ignored.

        z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))

    Counts are exact integers; the divisions and the single sqrt are
    correctly-rounded IEEE ops, so the statistic is value-hash stable.
    The p-value needs a normal CDF (erf) whose libm implementations
    differ across engines — deliberately NOT emitted; compare |z| to
    the 1.96/2.58 thresholds downstream.

    Scale shape: one unit-level aggregation (map-side combined), one
    2-row variant aggregation, one scalar combine. No window, no sort.
    """
    units = df.groupBy(F.col(unit_col).alias("unit")).agg(
        F.max(variant_col).alias("variant"),
        F.max(conversion_col.cast("int")).alias("converted"),
    )
    per_variant = units.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = (
        per_variant.agg(
            F.min_by(F.struct("n_units", "n_converted"), "variant").alias("_a"),
            F.max_by(F.struct("n_units", "n_converted"), "variant").alias("_b"),
            F.min("variant").alias("variant_a"),
            F.max("variant").alias("variant_b"),
            # per_variant has exactly one row per variant, so a plain
            # count IS count_distinct(variant) — the 3+-arm guard
            F.count(F.lit(1)).cast("long").alias("n_variants"),
        )
    )
    na = F.col("_a.n_units").cast("double")
    nb = F.col("_b.n_units").cast("double")
    ca = F.col("_a.n_converted").cast("double")
    cb = F.col("_b.n_converted").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    # degenerate experiments (0% or 100% pooled conversion) have zero
    # pooled variance → z undefined; NULL, not an ANSI divide-by-zero
    z = (pa - pb) / F.nullif(
        F.sqrt(pool * (1 - pool) * (1 / na + 1 / nb)), F.lit(0.0)
    )
    # malformed 'experiments' must not read as a clean 2-arm readout:
    # one arm (min_by == max_by) or 3+ arms (middle arms would be
    # silently dropped) both NULL the B side and the statistic; the
    # emitted n_variants says which
    two_armed = F.col("n_variants") == 2
    return wide.select(
        "variant_a",
        F.when(two_armed, F.col("variant_b")).alias("variant_b"),
        "n_variants",
        F.col("_a.n_units").alias("n_a"),
        F.col("_a.n_converted").alias("conv_a"),
        F.when(two_armed, F.col("_b.n_units")).alias("n_b"),
        F.when(two_armed, F.col("_b.n_converted")).alias("conv_b"),
        F.round(pa, round_dp).alias("rate_a"),
        F.when(two_armed, F.round(pb, round_dp)).alias("rate_b"),
        F.when(two_armed, F.round(z, round_dp)).alias("z_stat"),
    )
