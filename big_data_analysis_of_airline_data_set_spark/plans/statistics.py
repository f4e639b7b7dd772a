"""Statistics query catalog (reference A2-A4 / M6-M11 surface).

MLlib computations cross-checked against relational SQL oracles where
expressible (correlation matrix, chi-square statistic/dof, variance
threshold selection). The univariate selectors rank by p-value, whose
CDFs aren't SQL-expressible in DuckDB — but both selector queries are
constructed so every candidate feature shares the same dof/df-pair,
making the p-value ordering monotone in the raw statistic, which IS
SQL-computable: the oracles rank by chi-square statistic / explicit
ANOVA F instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import read_testdata_table
from ..stats.chisquare import chi_square_test
from ..stats.correlation import correlation_pairs_df
from ..stats.selectors import (
    select_univariate_categorical,
    select_univariate_continuous,
)
from ..stats.variance import variance_threshold_select
from .spec import QuerySpec

_LINEITEM_NUMERIC = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_mllib_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — full Pearson matrix via one MLlib treeAggregate job
    (Scripts/2_...py:59-61), flattened to the upper triangle."""
    li = read_testdata_table(spark, sf_dir, "lineitem")
    return correlation_pairs_df(spark, li, _LINEITEM_NUMERIC)


def _corr_matrix_oracle() -> str:
    cols = _LINEITEM_NUMERIC
    selects = []
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            selects.append(
                f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b, "
                f"round(corr({cols[i]}, {cols[j]}), 6) AS corr FROM lineitem"
            )
    return " UNION ALL ".join(selects)


def q_mllib_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 — ChiSquareTest over one-fit-indexed categoricals
    (Scripts/2_...py:56-57,91-93). Label = o_orderkey % 2.
    p-value kept out of the oracled projection (no chi2 CDF in SQL)."""
    o = read_testdata_table(spark, sf_dir, "orders").withColumn(
        "label", (F.col("o_orderkey") % 2).cast("double")
    )
    res = chi_square_test(spark, o, ["o_orderpriority", "o_orderstatus"], "label")
    return res.select("feature", "statistic", "dof")


def _chi2_feature_sql(
    col: str,
    name: str | None = None,
    *,
    table: str = "orders",
    label: str = "o_orderkey % 2",
) -> str:
    """Chi-square statistic + dof for one categorical column (or column
    expression) vs a binary label expression, INCLUDING empty cells
    (MLlib builds the full contingency table, so absent combinations
    contribute exp)."""
    name = name or col
    return f"""
    SELECT '{name}' AS feature,
           round(sum(pow(obs - rc*cc/n, 2) / (rc*cc/n)), 6) AS statistic,
           (count(DISTINCT v) - 1) * (count(DISTINCT lab) - 1) AS dof
    FROM (
      SELECT g.v, g.lab, coalesce(o.c, 0)::DOUBLE AS obs
      FROM (SELECT v, lab FROM (SELECT DISTINCT {col} AS v FROM {table})
            CROSS JOIN (SELECT DISTINCT CAST({label} AS BIGINT) AS lab FROM {table})) g
      LEFT JOIN (SELECT {col} AS v, CAST({label} AS BIGINT) AS lab,
                        CAST(count(*) AS DOUBLE) AS c
                 FROM {table} GROUP BY 1, 2) o
      USING (v, lab)
    ) cells
    JOIN (SELECT {col} AS v, CAST(count(*) AS DOUBLE) AS rc FROM {table} GROUP BY 1) rt USING (v)
    JOIN (SELECT CAST({label} AS BIGINT) AS lab, CAST(count(*) AS DOUBLE) AS cc
          FROM {table} GROUP BY 1) ct USING (lab)
    CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS n FROM {table}) tot
    """


def q_spearman_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 spearman variant: MLlib rank correlation, oracled against the
    average-rank Pearson formula in SQL (l_quantity's heavy ties make
    this a real tie-handling check)."""
    li = read_testdata_table(spark, sf_dir, "lineitem")
    pairs = correlation_pairs_df(
        spark, li, ["l_quantity", "l_extendedprice"], method="spearman"
    )
    return pairs.filter(F.col("col_a") != F.col("col_b"))


_SPEARMAN_ORACLE = """
WITH ranked AS (
  SELECT
    rank() OVER (ORDER BY l_quantity)
      + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS r_q,
    rank() OVER (ORDER BY l_extendedprice)
      + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS r_p
  FROM lineitem
)
SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
       round(corr(r_q, r_p), 6) AS corr
FROM ranked
"""


def q_variance_threshold_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10/M11 — the "kth-largest variance as threshold" selection rule
    (Scripts/2_...py:124-131), k=3 over the 4 lineitem numerics → the
    top-2 variance columns survive (strict > semantics)."""
    li = read_testdata_table(spark, sf_dir, "lineitem")
    selected, _ = variance_threshold_select(li, _LINEITEM_NUMERIC, k=3)
    return spark.createDataFrame([(c,) for c in selected], "feature string")


_VARIANCE_THRESHOLD_ORACLE = """
WITH v AS (
  SELECT var_samp(l_quantity) AS l_quantity,
         var_samp(l_extendedprice) AS l_extendedprice,
         var_samp(l_discount) AS l_discount,
         var_samp(l_tax) AS l_tax
  FROM lineitem
), long AS (
  SELECT 'l_quantity' AS feature, l_quantity AS x FROM v
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM v
  UNION ALL SELECT 'l_discount', l_discount FROM v
  UNION ALL SELECT 'l_tax', l_tax FROM v
), thr AS (SELECT x AS t FROM long ORDER BY x DESC LIMIT 1 OFFSET 2)
SELECT feature FROM long CROSS JOIN thr WHERE x > t
"""


def q_univariate_select_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 — chi-square top-N categorical selector (Scripts/2_...py:103-107).

    Oracle-able because BOTH candidate features have 5 levels: with equal
    dof the chi-square p-value (what numTopFeatures ranks by, no CDF in
    SQL) is monotone in the raw statistic, which IS SQL-computable."""
    o = (
        read_testdata_table(spark, sf_dir, "orders")
        .withColumn("label", (F.col("o_orderkey") % 2).cast("double"))
        .withColumn("custkey_band", (F.col("o_custkey") % 5).cast("string"))
    )
    sel = select_univariate_categorical(
        o, ["o_orderpriority", "custkey_band"], "label", num_top=1
    )
    return spark.createDataFrame([(c,) for c in sel], "feature string")


_UNIVARIATE_CAT_ORACLE = f"""
WITH stats AS (
  {_chi2_feature_sql("o_orderpriority")}
  UNION ALL
  {_chi2_feature_sql("CAST(o_custkey % 5 AS VARCHAR)", "custkey_band")}
)
SELECT feature FROM stats ORDER BY statistic DESC LIMIT 1
"""


def _anova_f_sql(col: str) -> str:
    """One-way ANOVA F for one continuous column against the 2-class
    l_orderkey%2 label: SSB/(k-1) over SSW/(n-k), k=2. Same closed form
    MLlib's ANOVATest evaluates; with k identical across features the
    F-ordering equals the p-value ordering the selector uses."""
    return f"""
    SELECT '{col}' AS feature,
           (n0*(m0-m)*(m0-m) + n1*(m1-m)*(m1-m))
             / ((n0*v0 + n1*v1) / (n - 2)) AS f
    FROM (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg({col}) AS m,
             CAST(count(*) FILTER (WHERE l_orderkey % 2 = 0) AS DOUBLE) AS n0,
             avg({col}) FILTER (WHERE l_orderkey % 2 = 0) AS m0,
             var_pop({col}) FILTER (WHERE l_orderkey % 2 = 0) AS v0,
             CAST(count(*) FILTER (WHERE l_orderkey % 2 = 1) AS DOUBLE) AS n1,
             avg({col}) FILTER (WHERE l_orderkey % 2 = 1) AS m1,
             var_pop({col}) FILTER (WHERE l_orderkey % 2 = 1) AS v1
      FROM lineitem
    )
    """


def q_univariate_select_continuous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 — ANOVA-F top-N continuous selector (Scripts/2_...py:110-114).
    Oracle: explicit one-way-ANOVA F per feature (k=2 for all features,
    so F-ordering == p-value ordering)."""
    li = read_testdata_table(spark, sf_dir, "lineitem").withColumn(
        "label", (F.col("l_orderkey") % 2).cast("double")
    )
    sel = select_univariate_continuous(li, _LINEITEM_NUMERIC, "label", num_top=2)
    return spark.createDataFrame([(c,) for c in sel], "feature string")


_UNIVARIATE_CONT_ORACLE = (
    "WITH stats AS (\n"
    + "\n  UNION ALL\n".join(_anova_f_sql(c) for c in _LINEITEM_NUMERIC)
    + "\n)\nSELECT feature FROM stats ORDER BY f DESC LIMIT 2"
)


def q_stats_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (stats/regression.py): price ~
    quantity per return flag — slope/intercept/R² from exact DECIMAL
    moment sums, one aggregation pass. The oracle replays the same
    closed form from the same exact sums (NOT regr_slope, whose float
    accumulation order is engine-specific)."""
    from ..stats.regression import group_ols

    li = read_testdata_table(spark, sf_dir, "lineitem")
    return group_ols(
        li,
        group_cols=["l_returnflag"],
        x_col="l_quantity",
        y_col="l_extendedprice",
        x_scale=2,
        y_scale=2,
    )


_GROUP_OLS_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,2)) AS DECIMAL(38,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(19,2)) AS DECIMAL(38,2))) AS DOUBLE) AS sy,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,2)) * CAST(l_extendedprice AS DECIMAL(19,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,2)) * CAST(l_quantity AS DECIMAL(19,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(19,2)) * CAST(l_extendedprice AS DECIMAL(19,2)) AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / nullif(CAST(n AS DOUBLE) * sxx - sx * sx, 0.0), 6) AS slope,
       round((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / nullif(CAST(n AS DOUBLE) * sxx - sx * sx, 0.0)) * sx)
             / CAST(n AS DOUBLE), 6) AS intercept,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             * (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (nullif(CAST(n AS DOUBLE) * sxx - sx * sx, 0.0)
                * nullif(CAST(n AS DOUBLE) * syy - sy * sy, 0.0)), 6) AS r2
FROM m
"""


_KS_A, _KS_B = "1-URGENT", "5-LOW"


def q_stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS distance (stats/regression.py:ks_two_sample)
    between order-value distributions of two priority classes — the
    snapshot/source drift test. Range-frame CDFs make ties exact, so
    the statistic is value-hash stable across engines."""
    from ..stats.regression import ks_two_sample

    o = read_testdata_table(spark, sf_dir, "orders")
    return ks_two_sample(
        o,
        group_col="o_orderpriority",
        value_col="o_totalprice",
        group_a=_KS_A,
        group_b=_KS_B,
    )


_KS_DRIFT_ORACLE = f"""
WITH pooled AS (
  SELECT o_orderpriority AS g, o_totalprice AS v FROM orders
  WHERE o_orderpriority IN ('{_KS_A}', '{_KS_B}')
), c AS (
  SELECT v,
         sum(CASE WHEN g = '{_KS_A}' THEN 1 ELSE 0 END) OVER (
           ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         sum(CASE WHEN g = '{_KS_B}' THEN 1 ELSE 0 END) OVER (
           ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         sum(CASE WHEN g = '{_KS_A}' THEN 1 ELSE 0 END) OVER () AS na,
         sum(CASE WHEN g = '{_KS_B}' THEN 1 ELSE 0 END) OVER () AS nb
  FROM pooled
)
SELECT '{_KS_A}' AS group_a, '{_KS_B}' AS group_b,
       CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
       round(max(abs(CAST(ca AS DOUBLE) / nullif(na, 0)
                     - CAST(cb AS DOUBLE) / nullif(nb, 0))), 6)
         AS ks_d
FROM c
"""


def q_stats_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (stats/regression.py:ab_proportion_ztest):
    users split into A/B by user_id parity, conversion = any purchase
    event above 200 (non-degenerate rates at every sf). Exact unit
    counts; the only floats are divisions and one sqrt —
    correctly-rounded IEEE, so z hash-matches. The p-value is
    deliberately absent (erf is libm-specific across engines)."""
    from ..stats.regression import ab_proportion_ztest

    ev = read_testdata_table(spark, sf_dir, "events")
    return ab_proportion_ztest(
        ev,
        unit_col="user_id",
        variant_col=F.when(F.col("user_id") % 2 == 0, "A").otherwise("B"),
        conversion_col=(
            (F.col("event_type") == "purchase") & (F.col("value") > 200)
        ),
    )


_AB_TEST_ORACLE = """
WITH units AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         max(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1, 2
), pv AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(converted) AS BIGINT) AS c
  FROM units GROUP BY variant
), wide AS (
  SELECT max(CASE WHEN variant = 'A' THEN n END) AS n_a,
         max(CASE WHEN variant = 'A' THEN c END) AS conv_a,
         max(CASE WHEN variant = 'B' THEN n END) AS n_b,
         max(CASE WHEN variant = 'B' THEN c END) AS conv_b
  FROM pv
)
SELECT 'A' AS variant_a, 'B' AS variant_b,
       (SELECT CAST(count(*) AS BIGINT) FROM pv) AS n_variants,
       n_a, conv_a, n_b, conv_b,
       round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
       round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
       round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 0.0), 6) AS z_stat
FROM wide
"""


def q_feature_selection_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-point B end-to-end (Scripts/2_...py): correlation →
    chi-square → univariate selectors → variance threshold, returning
    the combined method × feature selection table.

    Categorical candidates are equal-cardinality (%5) bands so the
    chi-square p-value ranking is monotone in the SQL-computable raw
    statistic (same design as ``univariate_select_categorical``) —
    which makes the whole composite's output oracle-checkable."""
    from ..stats.feature_selection_job import feature_selection_job

    li = (
        read_testdata_table(spark, sf_dir, "lineitem")
        .withColumn("label", (F.col("l_orderkey") % 2).cast("double"))
        .withColumn("partkey_band", (F.col("l_partkey") % 5).cast("string"))
        .withColumn("suppkey_band", (F.col("l_suppkey") % 5).cast("string"))
    )
    artifacts = feature_selection_job(
        spark,
        li,
        categorical_cols=["partkey_band", "suppkey_band"],
        numeric_cols=_LINEITEM_NUMERIC,
        label_col="label",
        num_top_categorical=1,
        num_top_continuous=2,
        variance_k=3,
    )
    return artifacts["selected"]


def _feature_selection_job_oracle() -> str:
    cat_stats = " UNION ALL ".join(
        _chi2_feature_sql(
            f"CAST(l_{key}key % 5 AS VARCHAR)",
            f"{key}key_band",
            table="lineitem",
            label="l_orderkey % 2",
        )
        for key in ("part", "supp")
    )
    cont_stats = "\n  UNION ALL\n".join(_anova_f_sql(c) for c in _LINEITEM_NUMERIC)
    return f"""
WITH cat_stats AS ({cat_stats}),
cont_stats AS ({cont_stats}),
var_long AS (
  SELECT 'l_quantity' AS feature, var_samp(l_quantity) AS x FROM lineitem
  UNION ALL SELECT 'l_extendedprice', var_samp(l_extendedprice) FROM lineitem
  UNION ALL SELECT 'l_discount', var_samp(l_discount) FROM lineitem
  UNION ALL SELECT 'l_tax', var_samp(l_tax) FROM lineitem
),
var_thr AS (SELECT x AS t FROM var_long ORDER BY x DESC LIMIT 1 OFFSET 2)
SELECT 'univariate_categorical' AS method, feature
FROM (SELECT feature FROM cat_stats ORDER BY statistic DESC LIMIT 1)
UNION ALL
SELECT 'univariate_continuous', feature
FROM (SELECT feature FROM cont_stats ORDER BY f DESC LIMIT 2)
UNION ALL
SELECT 'variance_threshold', feature
FROM var_long CROSS JOIN var_thr WHERE x > t
"""


def q_feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group p01/p99 winsorization audit on l_extendedprice by
    l_returnflag — the DEFAULT sketch-threshold path
    (stats/winsorize.py, approx_percentile accuracy=10000).

    Sketch thresholds are engine-specific, so the driver-checkable
    projection follows the quantiles_approx within-bound contract:
    exact columns that hash identically on both engines (n_rows and a
    decimal-accumulated raw mean) beside booleans the sketch guarantee
    makes constant — with rank error ≤ n/accuracy, the clipped-row
    counts must land within p·n ± n/1000 (10× the theoretical bound,
    slack for ties), and the winsorized mean must sit inside [lo, hi].
    A drifting sketch flips a boolean and fails the hash; the exact
    interpolated-percentile twin is ``feature_winsorize_exact``.
    """
    from ..stats.winsorize import winsorize_summary

    li = read_testdata_table(spark, sf_dir, "lineitem")
    s = winsorize_summary(
        li, group_col="l_returnflag", value_col="l_extendedprice"
    )
    raw_mean = li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(
                F.round("l_extendedprice", 6).cast("decimal(28,6)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("raw_mean")
    )
    n = F.col("n_rows").cast("double")
    slack = F.greatest(n / 1000.0, F.lit(5.0))
    return (
        s.join(F.broadcast(raw_mean), "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            "raw_mean",
            (F.abs(F.col("n_clipped_low") - 0.01 * n) <= slack).alias(
                "clip_low_within_rank_bound"
            ),
            (F.abs(F.col("n_clipped_high") - 0.01 * n) <= slack).alias(
                "clip_high_within_rank_bound"
            ),
            (
                (F.col("lo") <= F.col("winsorized_mean"))
                & (F.col("winsorized_mean") <= F.col("hi"))
            ).alias("mean_within_thresholds"),
        )
    )


_WINSORIZE_APPROX_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(CAST(sum(CAST(round(l_extendedprice, 6) AS DECIMAL(28,6)))
                  AS DOUBLE) / count(*), 6) AS raw_mean,
       TRUE AS clip_low_within_rank_bound,
       TRUE AS clip_high_within_rank_bound,
       TRUE AS mean_within_thresholds
FROM lineitem GROUP BY l_returnflag
"""


def q_feature_winsorize_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact interpolated-percentile twin of ``feature_winsorize``
    (stats/winsorize.py ``exact=True``): every output column —
    thresholds, clipped counts, winsorized mean — is deterministic and
    hash-matched against DuckDB's quantile_cont. The oracle-checkable
    baseline; the sketch path is the scale default."""
    from ..stats.winsorize import winsorize_summary

    li = read_testdata_table(spark, sf_dir, "lineitem")
    return winsorize_summary(
        li, group_col="l_returnflag", value_col="l_extendedprice", exact=True
    )


_WINSORIZE_ORACLE = """
WITH pct AS (
  SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.01), 6) AS lo,
         round(quantile_cont(l_extendedprice, 0.99), 6) AS hi
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag, p.lo, p.hi,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l.l_extendedprice < p.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(sum(CASE WHEN l.l_extendedprice > p.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       round(CAST(sum(CAST(round(greatest(least(l.l_extendedprice, p.hi), p.lo), 6)
                           AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6)
         AS winsorized_mean
FROM lineitem l JOIN pct p USING (l_returnflag)
GROUP BY l.l_returnflag, p.lo, p.hi
"""




def q_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/scale per group: exact interpolated median plus
    the median absolute deviation (MAD) — the outlier-resistant stddev
    replacement every data-quality monitor reaches for when means drift
    on heavy tails. Two passes by necessity (the deviations need the
    median first): pass 1 is one hash aggregate; its per-group medians
    broadcast back (group-cardinality rows) so pass 2 stays a single
    scan + aggregate. Same interpolation (percentile / quantile_cont)
    on both engines, round(6)."""
    from ..stats.winsorize import spread_rows_for_heavy_agg

    li = read_testdata_table(spark, sf_dir, "lineitem")
    # both percentile partials buffer value→count maps; spread the
    # narrow row-group-bound scan across the session width first
    # (gated no-op at scale — stats/winsorize.py helper, r13, −35%)
    vals = spread_rows_for_heavy_agg(
        li.select("l_returnflag", "l_extendedprice"), "l_extendedprice"
    )
    med = vals.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("_med")
    )
    return (
        vals.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first("_med"), 6).alias("median_price"),
            F.round(
                F.expr("percentile(abs(l_extendedprice - _med), 0.5)"), 6
            ).alias("mad_price"),
        )
    )


_MAD_ORACLE = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS m
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(any_value(m), 6) AS median_price,
       round(quantile_cont(abs(l.l_extendedprice - m), 0.5), 6) AS mad_price
FROM lineitem l JOIN med USING (l_returnflag)
GROUP BY l.l_returnflag
"""


_FD_CANDIDATES = [
    ("o_custkey", "o_orderpriority"),
    ("o_custkey", "o_orderstatus"),
    ("o_orderkey", "o_orderstatus"),
]


def q_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling (the data-quality rule-mining
    primitive): for each candidate X → Y, how many X values map to more
    than one distinct Y. One hash aggregate per candidate (distinct-agg
    on the pair), unioned — three scans of the source, one per
    candidate (at production scale, cache the source table around the
    loop; the catalog-scale scans are cheaper than owning a release
    contract here). A candidate with 0 violations HOLDS and can be
    enforced as a constraint downstream."""
    o = read_testdata_table(spark, sf_dir, "orders")
    parts = []
    for lhs, rhs in _FD_CANDIDATES:
        per_lhs = o.groupBy(lhs).agg(
            F.count_distinct(F.col(rhs)).alias("_nd")
        )
        parts.append(
            per_lhs.agg(
                F.lit(lhs).alias("fd_lhs"),
                F.lit(rhs).alias("fd_rhs"),
                F.count(F.lit(1)).cast("long").alias("n_lhs"),
                F.sum((F.col("_nd") > 1).cast("long")).alias("n_violating"),
                (F.sum((F.col("_nd") > 1).cast("long")) == 0).alias("holds"),
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def _fd_oracle() -> str:
    selects = []
    for lhs, rhs in _FD_CANDIDATES:
        selects.append(f"""
SELECT '{lhs}' AS fd_lhs, '{rhs}' AS fd_rhs,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS nd FROM orders GROUP BY {lhs})""")
    return "\nUNION ALL\n".join(selects)


_RI_EDGES = [
    # (child table, child FK col, parent table, parent key col)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("events", "user_id", "customer", "c_custkey"),
    # deliberate tripwire: a MISWIRED edge (nation keys checked against
    # the region table) — only keys 0..4 find a parent
    ("supplier", "s_nationkey", "region", "r_regionkey"),
]


def q_ri_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: per FK edge, how many child rows
    have no matching parent (anti-join counts). The real star-schema
    edges hold by construction (including events→customer — verified,
    the generator draws user ids from the customer key space); the
    supplier→REGION edge is the deliberately MISWIRED tripwire (nation
    keys checked against the 5-row region table), so the report shows
    a failing edge's shape — same philosophy as data_quality_report's
    quantity tripwire. Each edge is one anti-join
    (broadcast for dimension parents) + count — no row ever leaves the
    executors."""
    rows = []
    for child, fk, parent, pk in _RI_EDGES:
        c = read_testdata_table(spark, sf_dir, child)
        p = read_testdata_table(spark, sf_dir, parent)
        n_child = c.count()
        n_orphans = (
            c.select(F.col(fk)).join(
                p.select(F.col(pk).alias(fk)), fk, "left_anti"
            ).count()
        )
        rows.append(
            (f"{child}.{fk}", f"{parent}.{pk}", n_child, n_orphans, n_orphans == 0)
        )
    return spark.createDataFrame(
        rows, "child_fk string, parent_key string, n_child long,"
        " n_orphans long, holds boolean"
    )


def _ri_oracle() -> str:
    selects = []
    for child, fk, parent, pk in _RI_EDGES:
        selects.append(f"""
SELECT '{child}.{fk}' AS child_fk, '{parent}.{pk}' AS parent_key,
       CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child,
       CAST((SELECT count(*) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pk} = c.{fk})) AS BIGINT) AS n_orphans,
       (SELECT count(*) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{pk} = c.{fk})) = 0 AS holds""")
    return "\nUNION ALL\n".join(selects)


_BS_REPLICAS = 32


def q_bootstrap_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap (stats/bootstrap.py): 32 replica
    means of o_totalprice whose spread is the sampling uncertainty —
    resampling with zero RNG state, every weight an md5 pure function
    the oracle replays."""
    from ..stats.bootstrap import bootstrap_replica_means

    o = read_testdata_table(spark, sf_dir, "orders")
    return bootstrap_replica_means(
        o, id_col="o_orderkey", value_col="o_totalprice",
        n_replicas=_BS_REPLICAS,
    )


def _bootstrap_oracle() -> str:
    from ..stats.bootstrap import POISSON1_CUTPOINTS

    u = (
        "list_sum(list_transform(generate_series(1, 14), j -> "
        "CAST(strpos('0123456789abcdef', substr(md5('bs_' || replica ||"
        " '_' || o_orderkey), j, 1)) - 1 AS BIGINT)"
        " * (CAST(1 AS BIGINT) << (4 * (14 - j)))))"
    )
    t0, t1, t2, t3 = POISSON1_CUTPOINTS
    return f"""
WITH r AS (
  SELECT o_orderkey, o_totalprice, CAST(b AS VARCHAR) AS replica_s,
         CAST(b AS BIGINT) AS replica
  FROM orders, unnest(generate_series(0, {_BS_REPLICAS - 1})) AS t(b)
), w AS (
  SELECT replica, o_totalprice,
         CASE WHEN ({u.replace("replica", "replica_s")}) < {t0} THEN 0
              WHEN ({u.replace("replica", "replica_s")}) < {t1} THEN 1
              WHEN ({u.replace("replica", "replica_s")}) < {t2} THEN 2
              WHEN ({u.replace("replica", "replica_s")}) < {t3} THEN 3
              ELSE 4 END AS wgt
  FROM r
)
SELECT replica,
       CAST(sum(wgt) AS BIGINT) AS n_eff,
       round(CAST(sum(wgt * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / sum(wgt), 6) AS mean_value
FROM w GROUP BY replica
"""


# log10(1 + 1/d) for d = 1..9, precomputed so neither engine's log10
# participates in the comparison
_BENFORD = (0.30103, 0.176091, 0.124939, 0.09691,
            0.079181, 0.066947, 0.057992, 0.051153, 0.045757)


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals — the classic
    fabricated-numbers screen: naturally occurring multi-magnitude
    amounts follow log10(1+1/d); a flat or spiky digit histogram flags
    synthetic or constrained data. First digit extracted from the
    string form (portable; no float log in the hot path), expected
    shares are fixed literals. One scan, one 9-group aggregate.
    (TPC-H-ish uniform prices are NOT Benford-distributed — the audit
    correctly reports that, which is the point of running it on
    synthetic data.)"""
    o = read_testdata_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.regexp_replace(F.col("o_totalprice").cast("string"), r"[^1-9]", ""),
        1, 1,
    ).cast("long")
    per = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = F.sum("n").over(Window.partitionBy())
    expected = F.element_at(F.lit(list(_BENFORD)), F.col("digit").cast("int"))
    return per.select(
        "digit",
        "n",
        F.round(F.col("n") / total, 6).alias("share"),
        expected.alias("benford_expected"),
    )


def _benford_oracle() -> str:
    arr = ", ".join(str(x) for x in _BENFORD)
    return f"""
WITH d AS (
  SELECT CAST(substr(regexp_replace(CAST(o_totalprice AS VARCHAR),
                                    '[^1-9]', '', 'g'), 1, 1) AS BIGINT)
           AS digit
  FROM orders
), per AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (), 6) AS share,
       ([{arr}])[digit] AS benford_expected
FROM per
"""


QUERIES: dict[str, QuerySpec] = {
    "stats_benford_audit": QuerySpec(
        "stats_benford_audit", q_benford_audit, _benford_oracle(),
        "Benford first-digit screen: observed vs log10(1+1/d) shares"
        " (literal expectations, string-extracted digits)",
    ),
    "stats_bootstrap_means": QuerySpec(
        "stats_bootstrap_means", q_bootstrap_means, _bootstrap_oracle(),
        "deterministic Poisson-bootstrap replica means (md5-weighted,"
        " zero RNG state, exact replay)",
    ),
    "ri_orphans": QuerySpec(
        "ri_orphans", q_ri_orphans, _ri_oracle(),
        "referential-integrity audit: orphan counts per FK edge"
        " (anti-join per edge, deliberate tripwire edge included)",
    ),
    "stats_ab_test": QuerySpec(
        "stats_ab_test", q_stats_ab_test, _AB_TEST_ORACLE,
        "two-proportion A/B z-test over experiment units, exact counts"
        " + value-hash-stable z",
    ),
    "stats_ks_drift": QuerySpec(
        "stats_ks_drift", q_stats_ks_drift, _KS_DRIFT_ORACLE,
        "exact two-sample Kolmogorov-Smirnov drift distance,"
        " tie-exact range-frame CDFs",
    ),
    "stats_group_ols": QuerySpec(
        "stats_group_ols", q_stats_group_ols, _GROUP_OLS_ORACLE,
        "per-group closed-form OLS (slope/intercept/R²) from exact"
        " DECIMAL moment sums — one map-combined aggregation",
    ),
    "stats_mad_by_group": QuerySpec(
        "stats_mad_by_group", q_stats_mad, _MAD_ORACLE,
        "robust per-group median + MAD (two-pass, broadcast medians)",
    ),
    "fd_violations": QuerySpec(
        "fd_violations", q_fd_violations, _fd_oracle(),
        "functional-dependency profiling: violations per candidate X->Y",
    ),
    "feature_winsorize": QuerySpec(
        "feature_winsorize",
        q_feature_winsorize,
        _WINSORIZE_APPROX_ORACLE,
        "per-group p01/p99 outlier-clipping audit — sketch-threshold default,"
        " within-rank-bound contract",
    ),
    "feature_winsorize_exact": QuerySpec(
        "feature_winsorize_exact",
        q_feature_winsorize_exact,
        _WINSORIZE_ORACLE,
        "exact interpolated-percentile winsorize twin (deterministic oracle baseline)",
    ),
    "feature_selection_job": QuerySpec(
        "feature_selection_job",
        q_feature_selection_job,
        _feature_selection_job_oracle(),
        "entry-point B composite: corr + chi2 + selectors + variance, oracled end-to-end",
    ),
    "mllib_correlation_matrix": QuerySpec(
        "mllib_correlation_matrix",
        q_mllib_correlation_matrix,
        _corr_matrix_oracle(),
        "M6 MLlib correlation matrix vs pairwise SQL corr",
    ),
    "mllib_chi_square": QuerySpec(
        "mllib_chi_square",
        q_mllib_chi_square,
        " UNION ALL ".join(
            [_chi2_feature_sql("o_orderpriority"), _chi2_feature_sql("o_orderstatus")]
        ),
        "M7 ChiSquareTest vs SQL contingency formula",
    ),
    "spearman_correlation": QuerySpec(
        "spearman_correlation",
        q_spearman_correlation,
        _SPEARMAN_ORACLE,
        "M6 spearman (MLlib) vs average-rank Pearson SQL",
    ),
    "variance_threshold_features": QuerySpec(
        "variance_threshold_features",
        q_variance_threshold_features,
        _VARIANCE_THRESHOLD_ORACLE,
        "M10/M11 kth-largest-variance threshold selection",
    ),
    "univariate_select_categorical": QuerySpec(
        "univariate_select_categorical",
        q_univariate_select_categorical,
        _UNIVARIATE_CAT_ORACLE,
        "M8 chi2 top-N categorical selector (equal-dof → statistic-ranked oracle)",
    ),
    "univariate_select_continuous": QuerySpec(
        "univariate_select_continuous",
        q_univariate_select_continuous,
        _UNIVARIATE_CONT_ORACLE,
        "M9 ANOVA-F top-N continuous selector (explicit-F oracle)",
    ),
}
