"""Data-quality expectations: rule-based validation as ONE scan.

Every rule is a boolean Column; the evaluator folds all of them into a
single aggregate (conditional sums — partial/map-side combinable), then
explodes the one result row into a per-rule report. N rules cost one
pass over the data regardless of N — the property that matters when
the table is 100 TB and the alternative is N full scans.

The report is plain data (rule, n_rows, n_violations, violation_rate,
passed), so the pipeline gate is a DataFrame predicate, and the whole
thing is SQL-expressible for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def evaluate_expectations(
    df: DataFrame,
    rules: dict[str, Column],
    *,
    max_violation_rate: float = 0.0,
) -> DataFrame:
    """One row per rule. A NULL rule result counts as a violation
    (three-valued logic would otherwise let null rows pass every
    check silently)."""
    names = list(rules)
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                F.when(F.coalesce(rules[name], F.lit(False)), 0).otherwise(1)
            ).cast("long").alias(f"_v_{i}")
            for i, name in enumerate(names)
        ],
    )
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"_v_{i}").alias("n_violations"),
                )
                for i, name in enumerate(names)
            ]
        )
    ).alias("_r")
    rate = F.col("_r.n_violations").cast("double") / F.col("n_rows")
    return agg.select(F.col("_n").alias("n_rows"), report).select(
        "_r.rule",
        "n_rows",
        "_r.n_violations",
        F.round(rate, 6).alias("violation_rate"),
        (rate <= max_violation_rate).alias("passed"),
    )
