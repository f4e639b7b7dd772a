"""Unit + oracle-parity tests for the wave-5 analytics catalog
(plans/analytics_ops2.py): TPC-H Q3/Q5-style star joins, 2-D Pareto
skyline, closed-form 2-D PCA, DAU/WAU stickiness, and calendar linear
interpolation."""

from __future__ import annotations

import pytest

from big_data_analysis_of_airline_data_set_spark.plans import all_queries
from tests.oracle_harness import check_query

NEW_OPS = [
    "tpch_q3_style",
    "tpch_q5_style",
    "skyline_dominance",
    "stats_pca_2d",
    "events_stickiness",
    "events_linear_interpolation",
]


@pytest.mark.parametrize("name", NEW_OPS)
def test_oracle_parity(spark, name, sf_dir):
    check_query(spark, all_queries()[name], sf_dir)


# --------------------- skyline_2d units ---------------------


def _skyline(spark, rows, buckets=4):
    from big_data_analysis_of_airline_data_set_spark.operators.skyline import (
        skyline_2d,
    )

    df = spark.createDataFrame(rows, "x double, y long")
    out = skyline_2d(df, "x", "y", buckets=buckets)
    return sorted((r.x, r.y) for r in out.collect())


def test_skyline_basic_staircase(spark):
    # staircase (1,5) (2,3) (4,1) survives; interior points dominated
    rows = [(1.0, 5), (2.0, 3), (4.0, 1), (3.0, 4), (4.0, 5), (2.0, 7)]
    assert _skyline(spark, rows) == [(1.0, 5), (2.0, 3), (4.0, 1)]


def test_skyline_same_x_keeps_min_y_only(spark):
    rows = [(1.0, 5), (1.0, 2), (1.0, 9)]
    assert _skyline(spark, rows) == [(1.0, 2)]


def test_skyline_equal_y_at_larger_x_dominated(spark):
    # (2,3) is dominated by (1,3): x strictly larger, y equal
    rows = [(1.0, 3), (2.0, 3)]
    assert _skyline(spark, rows) == [(1.0, 3)]


def test_skyline_all_x_equal_single_bucket(spark):
    # zero-width x span exercises the width==0 guard
    rows = [(7.0, 4), (7.0, 2), (7.0, 8)]
    assert _skyline(spark, rows, buckets=8) == [(7.0, 2)]


def test_skyline_duplicates_collapse(spark):
    rows = [(1.0, 1), (1.0, 1), (2.0, 0), (2.0, 0)]
    assert _skyline(spark, rows) == [(1.0, 1), (2.0, 0)]


def test_skyline_bucket_count_invariance(spark):
    rows = [
        (float(x), (x * 7919) % 50 + (0 if x % 9 else -5) + 50)
        for x in range(1, 200)
    ]
    single = _skyline(spark, rows, buckets=1)
    assert single == _skyline(spark, rows, buckets=7)
    assert single == _skyline(spark, rows, buckets=64)


def test_skyline_rejects_bad_buckets(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.skyline import (
        skyline_2d,
    )

    df = spark.createDataFrame([(1.0, 1)], "x double, y long")
    with pytest.raises(ValueError):
        skyline_2d(df, "x", "y", buckets=0)


# --------------------- pca closed form unit ---------------------


def test_pca_2d_matches_numpy(spark, sf_dir):
    import numpy as np

    pdf = all_queries()["stats_pca_2d"].fn(spark, sf_dir).toPandas()
    from big_data_analysis_of_airline_data_set_spark.sources.readers import (
        read_testdata_table,
    )

    li = (
        read_testdata_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for _, row in pdf.iterrows():
        g = li[li.l_returnflag == row.l_returnflag]
        cov = np.cov(g.l_quantity, g.l_extendedprice, ddof=1)
        eig = np.sort(np.linalg.eigvalsh(cov))[::-1]
        assert row.lambda1 == pytest.approx(eig[0], rel=1e-6)
        assert row.lambda2 == pytest.approx(eig[1], rel=1e-6)
        assert row.explained_ratio == pytest.approx(
            eig[0] / eig.sum(), rel=1e-6
        )


# --------------------- interpolation unit ---------------------


def test_linear_interpolation_gap_math(spark):
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.plans.analytics_ops2 import (
        q_events_linear_interpolation,
    )

    # indirect check on real data: every interpolated row sits between
    # its neighbors' anchor values on the line — verified directly on a
    # tiny hand case via the same operators the query composes
    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 3, 40.0), (1, 5, 0.0)],
        "user_id long, day long, v double",
    )
    from pyspark.sql.window import Window as W

    back = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cal = (
        df.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("day"))
        .join(df, ["user_id", "day"], "left")
    )
    assert cal.count() == 6
    # day1 = 10 + (40-10)*1/3 = 20, day2 = 30, day4 = 20
    fwd = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, W.unboundedFollowing)
    )
    anchor_day = F.when(F.col("v").isNotNull(), F.col("day"))
    w = (
        cal.withColumn("pv", F.last("v", ignorenulls=True).over(back))
        .withColumn("pd", F.last(anchor_day, ignorenulls=True).over(back))
        .withColumn("nv", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("nd", F.first(anchor_day, ignorenulls=True).over(fwd))
    )
    filled = w.select(
        "day",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("day") - F.col("pd")).cast("double")
            / (F.col("nd") - F.col("pd")).cast("double")
        )
        .alias("value_filled"),
    )
    got = {r.day: r.value_filled for r in filled.collect()}
    assert got == {0: 10.0, 1: 20.0, 2: 30.0, 3: 40.0, 4: 20.0, 5: 0.0}
