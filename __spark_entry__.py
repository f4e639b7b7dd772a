"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — name → (spark, sf_dir) → DataFrame, one per implemented
operator (SURVEY.md §2 inventory).
``oracle_sql()`` — matching DuckDB SQL per query (omitted for
non-SQL-expressible ops → driver records rows-only checks).

Implementation lives in ``big_data_analysis_of_airline_data_set_spark``;
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the sibling package importable even when the driver loads this
# module from outside the repo root.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from big_data_analysis_of_airline_data_set_spark.plans import all_queries  # noqa: E402

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1): carrier × delay-group pivot."""
    specs = all_queries()
    return specs["flagship_delay_summary_by_carrier"].fn(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
