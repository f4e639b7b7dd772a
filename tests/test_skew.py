"""Skew handling: salted join must bound per-task key concentration on
a deliberately skewed dataset, while preserving results; approx
quantiles must stay within sketch error of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.operators.salting import salted_join
from big_data_analysis_of_airline_data_set_spark.plans.patterns import (
    q_quantiles,
    q_quantiles_approx,
)


def _skewed_frames(spark):
    """90% of fact rows share one key — the classic hot-key shape."""
    hot = spark.range(0, 9000).select(
        F.lit(1).cast("long").alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(9000, 10000).select(
        (F.col("id") % 50 + 2).cast("long").alias("k"), F.col("id").alias("payload")
    )
    facts = hot.unionByName(cold)
    dim = spark.range(1, 60).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    return facts, dim


def test_salted_join_preserves_results_under_skew(spark):
    facts, dim = _skewed_frames(spark)
    plain = facts.join(dim, "k").groupBy("label").count()
    salted = salted_join(facts, dim, "k", salt=8).groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salting_splits_the_hot_key(spark):
    """After salting, the hot key's rows spread across ~salt sub-keys;
    the max (key, salt) group is ~1/salt of the hot key's rows."""
    facts, _ = _skewed_frames(spark)
    salt = 8
    salted = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(salt))
    )
    sizes = (
        salted.groupBy("k", "_salt").count().agg(F.max("count").alias("mx")).collect()[0].mx
    )
    hot_total = 9000
    assert sizes < hot_total * 0.3  # vs 100% concentration unsalted


def test_approx_percentile_within_bounds(spark, sf_dir):
    exact = q_quantiles(spark, sf_dir).collect()[0].q50
    row = q_quantiles_approx(spark, sf_dir).collect()[0]
    assert row.within_bound
    assert abs(row.q50_exact - exact) / exact < 1e-6
