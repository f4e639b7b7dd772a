"""Skew-stress join strategies (operators/skew_stress.py): all three
plans must agree byte-for-byte, the distribution must actually be
skewed, and the plan shapes must be what each strategy claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.operators.skew_stress import (
    HOT_SHARE,
    skew_stress_plans,
    skewed_fact,
)
from big_data_analysis_of_airline_data_set_spark.sources.readers import read_testdata_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    return skew_stress_plans(spark, SF)


def test_distribution_is_actually_skewed(spark):
    fact = skewed_fact(read_testdata_table(spark, SF, "lineitem"))
    total = fact.count()
    hot = fact.filter(F.col("skew_key") == 0).count()
    share = hot / total
    assert abs(share - HOT_SHARE / 10) < 0.05, f"hot share {share:.3f}"
    # the cold side must cover the whole key space, not a residue class
    # (the round-4 review caught pmod(h,1000) conditioned on pmod(h,10)
    # touching only keys ≡ 7,8,9 mod 10)
    cold_keys = (
        fact.filter(F.col("skew_key") != 0)
        .select(F.pmod("skew_key", F.lit(10)).alias("r"))
        .distinct()
        .count()
    )
    assert cold_keys == 10, f"cold keys hit only {cold_keys}/10 residues"


def test_all_strategies_agree(plans):
    rows = {
        name: sorted(
            (r.skew_key, r.n_rows, r.weighted_amount) for r in df.collect()
        )
        for name, df in plans.items()
    }
    assert rows["plain"] == rows["salted"] == rows["broadcast"]
    assert len(rows["plain"]) > 1


def test_plan_shapes(plans):
    plain = plans["plain"]._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plain or "ShuffledHashJoin" in plain
    bcast = plans["broadcast"]._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bcast
    salted = plans["salted"]._jdf.queryExecution().executedPlan().toString()
    # the salted rewrite joins on (skew_key, _salt)
    assert "_salt" in salted
