"""Relational transform library — pure DataFrame → DataFrame functions.

Covers SURVEY.md §2.2 (P1-P14) and §2.7 (U1). All are thin, typed
wrappers over Catalyst-optimizable built-ins: projection prunes into the
scan, filters push down to Parquet row groups, unions flatten
(CombineUnions), and nothing forces a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rebalance_for_fanout(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the
    input has fewer partitions — for operators that MULTIPLY per-row
    work (explode ×B, per-gram hashing, per-replica draws).

    Spark sizes scan partitions by INPUT bytes (maxPartitionBytes),
    which is blind to downstream fan-out: a few-MB single-file input
    runs a B×-the-bytes workload in ONE task while the rest of the
    cluster idles. The rebalance is a cheap shuffle of the skinny
    pre-fan-out rows, and a NO-OP whenever the input already has
    enough partitions — so a large fact-table scan never pays it
    (measured: stats_bootstrap_means 15 s single-task → 1.6 s at
    local[32]; BASELINE.md round-10).

    BATCH-SCAN-ONLY contract (round-11 advice): the partition-count
    probe goes through ``df.rdd``, which finalizes the physical plan —
    under AQE that can execute upstream shuffle stages (running them
    twice once the real query runs), and on a streaming DataFrame it
    raises AnalysisException. Streaming inputs return unchanged
    (micro-batch sizing is the scheduler's job there); batch callers
    should pass plain scan projections, not plans with shuffles below
    this point."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def project_without(df: DataFrame, remove: Iterable[str]) -> DataFrame:
    """P1 — drop a column set (the reference's 40-column remove list,
    Scripts/1_cs_777_cleaning_data.py:41-48). Catalyst column pruning
    pushes the narrowed schema into the scan."""
    remove_set = set(remove)
    return df.select([c for c in df.columns if c not in remove_set])


def keep_columns_matching(df: DataFrame, predicate) -> DataFrame:
    """P2 — name-pattern projection (e.g. drop ``*_string`` indexed copies,
    Scripts/2_cs_777_statistical_analysis_feature_selection.py:137)."""
    return df.select([c for c in df.columns if predicate(c)])


def filter_eq(df: DataFrame, column: str, value) -> DataFrame:
    """P3/P4 — equality filter (``Cancelled == False``,
    ``Year == 2022`` temporal split; Scripts/1_...py:50-53,
    Scripts/3_...py:52-53). Partition pruning applies when the table is
    partitioned by ``column``."""
    return df.filter(F.col(column) == F.lit(value))


def drop_any_null(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """P5 — any-null row elimination (``df.na.drop()``,
    Scripts/1_cs_777_cleaning_data.py:56). Catalyst rewrites this to
    IsNotNull conjunctions pushed toward the scan."""
    return df.na.drop("any", subset=subset)


def union_positional(dfs: list[DataFrame]) -> DataFrame:
    """U1 — positional UNION ALL (yearly files nb:5; cancelled∪cleaned
    Scripts/1_cs_777_cleaning_data.py:58). No dedup, column ORDER matters."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.union(d)
    return out


def union_by_name(dfs: list[DataFrame], allow_missing: bool = False) -> DataFrame:
    """Safer by-name union for the new engine (SURVEY.md §2.7 note)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=allow_missing)
    return out


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 777) -> DataFrame:
    """P13 — seeded Bernoulli sample (``df.sample(fraction=0.001,
    seed=777)``, nb:8). Exact reference semantics; NOT oracle-checkable
    across engines (sampler RNG differs), so tests assert statistically."""
    return df.sample(fraction=fraction, seed=seed)


def deterministic_sample(df: DataFrame, key: Column, one_in: int) -> DataFrame:
    """P13 oracle-checkable determinization: keep rows where
    ``key % one_in == 0``. Same rows in any engine; used by the t2
    correctness harness (FIXTURES.md §B P13)."""
    return df.filter(key % one_in == 0)
