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
