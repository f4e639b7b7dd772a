"""Cross-scale oracle parity sweep (opt-in: slow).

The driver's correctness gate runs at sf0.01; oracles can agree there
by accident and diverge at scale (events_histogram's width_bucket
clamp was exactly such a bug — no event value reached the overflow
bucket until sf0.1). Run with

    SPARK_GRAFT_SCALE_SWEEP=1 python -m pytest tests/test_scale_parity.py

to re-check every oracled catalog query at sf0.1. Queries whose DuckDB
oracle is quadratic in document count are excluded (their Spark side
is banded; the oracle re-check at sf0.1 costs ~30 min of single-node
SQL and is already exercised at sf0.001/0.01).
"""

from __future__ import annotations

import os

import pytest

from big_data_analysis_of_airline_data_set_spark.plans import all_queries
from tests.oracle_harness import check_query

SF_LARGE = "/root/testdata/sf0.1"

_QUADRATIC_ORACLE = {"dedup_ngram_jaccard", "dedup_connected_components"}

_NAMES = [
    name
    for name, spec in all_queries().items()
    if spec.oracle is not None and name not in _QUADRATIC_ORACLE
]

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_SWEEP"),
    reason="slow cross-scale sweep; set SPARK_GRAFT_SCALE_SWEEP=1",
)


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_parity_at_sf01(spark, name):
    check_query(spark, all_queries()[name], SF_LARGE)
