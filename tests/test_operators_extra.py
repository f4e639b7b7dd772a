"""Salting equivalence, approx-distinct bounds, Bernoulli sample
statistics, and writer guards."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.operators.salting import salted_join
from big_data_analysis_of_airline_data_set_spark.operators.transforms import bernoulli_sample
from big_data_analysis_of_airline_data_set_spark.plans.relational2 import (
    q_approx_distinct_count,
    q_distinct_count,
)
from big_data_analysis_of_airline_data_set_spark.sources.readers import read_testdata_table
from big_data_analysis_of_airline_data_set_spark.sources.writers import (
    write_parquet,
    write_report_csv,
)


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = read_testdata_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    c = read_testdata_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    plain = o.join(c, "c_custkey").groupBy("c_nationkey").count()
    salted = salted_join(o, c, "c_custkey", salt=8).groupBy("c_nationkey").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_approx_distinct_within_rsd(spark, sf_dir):
    exact = q_distinct_count(spark, sf_dir).collect()[0].n_parts
    row = q_approx_distinct_count(spark, sf_dir).collect()[0]
    assert row.within_bound  # rsd=0.02 vs 5% band
    assert row.n_parts_exact == exact


def test_bernoulli_sample_statistics(spark, sf_dir):
    """P13 exact reference semantics: seeded, fraction-calibrated."""
    li = read_testdata_table(spark, sf_dir, "lineitem")
    n = li.count()
    s1 = bernoulli_sample(li, 0.1, seed=777).count()
    s2 = bernoulli_sample(li, 0.1, seed=777).count()
    assert s1 == s2  # same seed → same rows
    assert 0.05 * n < s1 < 0.15 * n


def test_write_parquet_partitioned_roundtrip(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="wp-")
    try:
        o = read_testdata_table(spark, sf_dir, "orders").withColumn(
            "o_year", F.year("o_orderdate")
        )
        write_parquet(o, d, partition_by=["o_year"])
        # partition dirs exist → year filters become partition pruning
        years = {p for p in os.listdir(d) if p.startswith("o_year=")}
        assert len(years) >= 2
        back = spark.read.parquet(d)
        assert back.count() == o.count()
        pruned = back.filter(F.col("o_year") == 1995)
        assert pruned.count() == o.filter(F.col("o_year") == 1995).count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_write_report_csv_guards_large_tables(spark, sf_dir):
    li = read_testdata_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        write_report_csv(li, "/tmp/should-not-exist", max_rows=10)
    d = tempfile.mkdtemp(prefix="rc-")
    try:
        small = li.groupBy("l_returnflag").count()
        write_report_csv(small, os.path.join(d, "out"))
        files = os.listdir(os.path.join(d, "out"))
        assert any(f.endswith(".csv") for f in files)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ------------------------- incremental MV merge -------------------------


def test_aggregate_state_merge_associative(spark):
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.operators.incremental import (
        aggregate_state,
        finalize_measures,
        merge_aggregate_states,
    )

    rows = [("a", float(i)) for i in range(10)] + [("b", 100.0), ("b", -3.5)]
    df = spark.createDataFrame(rows, "k string, v double")
    full = {
        r.k: r for r in finalize_measures(
            aggregate_state(df, keys=["k"], value_col="v"), keys=["k"]
        ).collect()
    }
    # split three ways, merge pairwise in two different orders
    parts = [df.filter(F.col("v") < 3), df.filter((F.col("v") >= 3) & (F.col("v") < 7)),
             df.filter(F.col("v") >= 7)]
    states = [aggregate_state(p, keys=["k"], value_col="v") for p in parts]
    m1 = merge_aggregate_states(
        merge_aggregate_states(states[0], states[1], keys=["k"]), states[2], keys=["k"]
    )
    m2 = merge_aggregate_states(
        states[0], merge_aggregate_states(states[2], states[1], keys=["k"]), keys=["k"]
    )
    for merged in (m1, m2):
        got = {r.k: r for r in finalize_measures(merged, keys=["k"]).collect()}
        for k in full:
            assert got[k].cnt == full[k].cnt
            assert got[k].total == full[k].total
            assert got[k].avg_v == full[k].avg_v
            assert got[k].min_v == full[k].min_v and got[k].max_v == full[k].max_v


# ------------------------- PIT join + snapshot diff -------------------------


def test_point_in_time_join_picks_version_at_event_time(spark):
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.operators.pit import (
        point_in_time_join,
    )

    dim = spark.createDataFrame(
        [
            (1, 10.0, "2020-01-01", "2021-01-01"),
            (1, 20.0, "2021-01-01", "9999-12-31"),
            (2, 5.0, "2020-01-01", "9999-12-31"),
        ],
        "k long, val double, valid_from string, valid_to string",
    ).select("k", "val",
             F.col("valid_from").cast("timestamp").alias("valid_from"),
             F.col("valid_to").cast("timestamp").alias("valid_to"))
    fact = spark.createDataFrame(
        [(100, 1, "2020-06-01"), (101, 1, "2021-06-01"),
         (102, 2, "2022-01-01"), (103, 3, "2022-01-01")],
        "fid long, k long, t string",
    ).select("fid", "k", F.col("t").cast("timestamp").alias("t"))
    got = {
        r.fid: r.val
        for r in point_in_time_join(fact, dim, key="k", time_col="t").collect()
    }
    # boundary: an event AT valid_from belongs to the NEW version
    assert got == {100: 10.0, 101: 20.0, 102: 5.0}  # fid 103: no version
    left = point_in_time_join(fact, dim, key="k", time_col="t", how="left")
    assert left.count() == 4  # audit mode keeps the uncovered fact
    boundary = spark.createDataFrame(
        [(104, 1, "2021-01-01")], "fid long, k long, t string"
    ).select("fid", "k", F.col("t").cast("timestamp").alias("t"))
    assert point_in_time_join(boundary, dim, key="k", time_col="t").first().val == 20.0


def test_snapshot_diff_classification(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.incremental import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (4, 40.0), (5, None)], "k long, v double"
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, key="k", compare_cols=["v"]).collect()
    }
    # null-safe compare: k=3 removed (not 'changed by null'), k=5 added
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added", 5: "added"}


def test_snapshot_diff_membership_only(spark):
    """compare_cols=[] is the pure-membership CDC: present-in-both rows
    are 'unchanged' (review finding: this used to TypeError)."""
    from big_data_analysis_of_airline_data_set_spark.operators.incremental import (
        snapshot_diff,
    )

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {r.k: r.change_type
           for r in snapshot_diff(old, new, key="k", compare_cols=[]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "added"}
