"""Unit coverage for the small transform helpers (P1/P2/U1 variants)."""

from __future__ import annotations

import pytest

from big_data_analysis_of_airline_data_set_spark.operators.transforms import (
    keep_columns_matching,
    project_without,
    union_by_name,
    union_positional,
)


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, name string, name_string double"
    )


def test_project_without(small):
    out = project_without(small, ["name_string"])
    assert out.columns == ["id", "name"]


def test_keep_columns_matching_suffix_rule(small):
    """The reference's *_string-suffix projection (Scripts/2_...py:137)."""
    out = keep_columns_matching(small, lambda c: not c.endswith("_string"))
    assert out.columns == ["id", "name"]


def test_union_positional_is_positional(spark):
    a = spark.createDataFrame([(1, "x")], "c1 long, c2 string")
    b = spark.createDataFrame([(2, "y")], "k long, v string")  # different names
    out = union_positional([a, b])
    assert out.columns == ["c1", "c2"]  # first frame's names win, no dedup
    assert out.count() == 2


def test_union_by_name_reorders_and_fills(spark):
    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([("y", 2)], "v string, id long")  # swapped order
    out = union_by_name([a, b])
    rows = {tuple(r) for r in out.collect()}
    assert rows == {(1, "x"), (2, "y")}


def test_rebalance_for_fanout_expands_small_and_keeps_large(spark):
    """Round-10: fan-out operators rebalance a small input up to the
    session's default parallelism (scan partitioning is sized by input
    bytes, blind to work multiplication) and leave an already-wide
    input alone — so a large fact scan never pays the extra shuffle."""
    from big_data_analysis_of_airline_data_set_spark.operators.transforms import (
        rebalance_for_fanout,
    )

    target = spark.sparkContext.defaultParallelism
    small_df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    small_df = small_df.coalesce(1)
    out = rebalance_for_fanout(small_df)
    assert out.rdd.getNumPartitions() == target
    assert out.count() == 100
    wide = spark.range(1000).repartition(target + 7)
    kept = rebalance_for_fanout(wide)
    assert kept.rdd.getNumPartitions() == target + 7


def test_bind_once_single_evaluation_in_plan(spark):
    """Round-10: bind_once must leave exactly ONE occurrence of the
    expensive expression in the plan even when the body references its
    lambda variable many times — the textual-duplication trap behind
    the contamination/classifier/bootstrap regressions (Catalyst
    substitutes aliases into consumers and FilterExec/HOF lambdas get
    no CSE, so every textual xxhash64 executes per row)."""
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.text.analysis import (
        bind_once,
    )

    df = spark.range(10).select(F.col("id").cast("string").alias("s"))
    expensive = F.xxhash64(F.col("s"))

    # naive form: 4 textual references -> 4 occurrences in the plan
    naive = df.select(
        (expensive + expensive % 7 + expensive % 11 + expensive % 13).alias("x")
    )
    assert naive._jdf.queryExecution().analyzed().toString().count("xxhash64") == 4

    bound = df.select(
        bind_once(
            expensive, lambda h: h + h % 7 + h % 11 + h % 13
        ).alias("x")
    )
    assert bound._jdf.queryExecution().analyzed().toString().count("xxhash64") == 1
    # and the values are identical
    assert [r.x for r in naive.collect()] == [r.x for r in bound.collect()]


def test_ship_as_scalar_subquery_unique_names_and_safe_drop(spark):
    """Round-11 advice fix: each call binds its own uniquely-named view
    and the view can be dropped immediately after the consumer is
    built (eager analysis resolves the subquery into the view's
    LocalRelation) — a later re-bind or drop must not affect an
    already-analyzed plan, and concurrent callers can never collide on
    one shared name."""
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.operators.bloom_join import (
        ship_as_scalar_subquery,
    )

    arr1, view1 = ship_as_scalar_subquery(spark, [10, 20, 30])
    df1 = spark.range(3).select(
        F.element_at(arr1, (F.col("id") + 1).cast("int")).alias("v")
    )
    arr2, view2 = ship_as_scalar_subquery(spark, [7, 7, 7])
    df2 = spark.range(3).select(
        F.element_at(arr2, (F.col("id") + 1).cast("int")).alias("v")
    )
    assert view1 != view2
    spark.catalog.dropTempView(view1)
    spark.catalog.dropTempView(view2)
    # both plans keep their own resolved copies after the drops
    assert [r.v for r in df1.collect()] == [10, 20, 30]
    assert [r.v for r in df2.collect()] == [7, 7, 7]
