"""As-of join: the applyInPandas merge_asof variant must equal the
union+window variant (which itself is oracled against DuckDB's native
ASOF JOIN in the catalog)."""

from __future__ import annotations

from big_data_analysis_of_airline_data_set_spark.operators.asof import (
    as_of_join,
    as_of_join_pandas,
)
from big_data_analysis_of_airline_data_set_spark.plans.patterns import (
    _purchases_and_clicks,
)


def test_pandas_asof_equals_window_asof(spark, sf_dir):
    purchases, clicks = _purchases_and_clicks(spark, sf_dir)
    kw = dict(on="user_id", left_cols=["event_id"], right_cols=["event_id"])
    a = as_of_join(purchases, clicks, **kw)
    b = as_of_join_pandas(purchases, clicks, **kw)
    rows_a = sorted((r.user_id, r.event_id, r.r_event_id) for r in a.collect())
    rows_b = sorted((r.user_id, r.event_id, r.r_event_id) for r in b.collect())
    assert rows_a == rows_b
    assert len(rows_a) > 0
