"""Deliberately-skewed join stress — the tracked measurement behind the
salting/AQE skew claims (round-3 verdict, Next round #8).

``skewed_fact`` remaps lineitem onto a 1000-key space where ONE key
carries ~70% of all rows — the hot-carrier shape that breaks naive
shuffle joins at 100 TB (one task receives 70% of the table). Three
semantically identical plans join it to a small dim:

- ``plain``  — sort-merge join (broadcast suppressed via merge hint):
  the baseline that exposes the skew; AQE's skew-join splitting
  (spark.sql.adaptive.skewJoin) is the runtime mitigation.
- ``salted`` — the explicit 8-way salted rewrite (operators/salting.py):
  plan-stable mitigation independent of AQE heuristics.
- ``broadcast`` — the correct plan when the dim fits in memory: no
  shuffle of the fact at all. Included as the floor.

All three must return byte-identical aggregates (bench asserts it);
bench.py times them as ``skew_suite`` so the skew posture is a tracked
number, not a claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_KEYS = 1000
HOT_SHARE = 7  # of 10 → ~70% of rows on key 0
SALT = 8


def skewed_fact(li: DataFrame) -> DataFrame:
    """(skew_key, amount): ~70% of rows collapse onto key 0, the rest
    spread over the full key space — deterministic (xxhash64 of the
    order key), so every bench run stresses the identical distribution.

    The cold branch uses an INDEPENDENT hash: pmod(h, N_KEYS)
    conditioned on pmod(h, 10) >= HOT_SHARE would inherit the residue
    (only keys ≡ 7,8,9 mod 10 ever occur), silently concentrating the
    cold side on ~30% of the dim and mis-measuring the comparison."""
    h_hot = F.xxhash64("l_orderkey", "l_linenumber")
    h_cold = F.xxhash64("l_orderkey", "l_linenumber", F.lit("cold"))
    key = (
        F.when(F.pmod(h_hot, F.lit(10)) < HOT_SHARE, F.lit(0))
        .otherwise(F.pmod(h_cold, F.lit(N_KEYS)))
        .cast("long")
    )
    return li.select(key.alias("skew_key"), F.col("l_extendedprice").alias("amount"))


def skew_dim(spark: SparkSession) -> DataFrame:
    """Tiny dimension: (skew_key, weight)."""
    return spark.range(N_KEYS).select(
        F.col("id").alias("skew_key"),
        F.pmod(F.col("id"), F.lit(97)).cast("double").alias("weight"),
    )


def _agg(joined: DataFrame) -> DataFrame:
    # partial aggregation absorbs the post-join key skew map-side; the
    # JOIN is the operator under stress here
    weighted = F.sum(
        (F.col("amount") * F.col("weight")).cast("decimal(28,2)")
    )
    return (
        joined.groupBy("skew_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            weighted.cast("double").alias("weighted_amount"),
        )
    )


def skew_stress_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The three strategy plans over the same skewed inputs."""
    from ..sources.readers import read_testdata_table
    from .salting import salted_join

    fact = skewed_fact(read_testdata_table(spark, sf_dir, "lineitem"))
    dim = skew_dim(spark)
    return {
        "plain": _agg(fact.join(dim.hint("merge"), "skew_key")),
        "salted": _agg(salted_join(fact, dim.hint("merge"), "skew_key", salt=SALT)),
        "broadcast": _agg(fact.join(F.broadcast(dim), "skew_key")),
    }
