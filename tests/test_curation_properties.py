"""Property-based invariants for the corpus-assembly operators
(hypothesis). Few examples, Spark job per example — strategies are
biased toward the edges (budget 1, single-doc domains, zero tokens)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.curation import (
    pack_sequences,
    quota_sample,
)
from big_data_analysis_of_airline_data_set_spark.operators.expectations import (
    evaluate_expectations,
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from big_data_analysis_of_airline_data_set_spark.session import get_session

        _spark = get_session("tests", shuffle_partitions=4)
    return _spark


docs = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(min_value=0, max_value=40)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(docs=docs, budget=st.sampled_from([1, 7, 64]))
def test_packing_invariants(docs, budget):
    spark = _get_spark()
    rows = [(i, src, n) for i, (src, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    out = pd.DataFrame(
        pack_sequences(
            df, group_col="source", id_col="doc_id", tokens_col="n_tok", budget=budget
        ).collect(),
        columns=["source", "doc_id", "n_tokens", "pack_id", "pack_offset"],
    ).sort_values(["source", "doc_id"])
    assert len(out) == len(rows)  # no row lost or duplicated
    for _, g in out.groupby("source"):
        start = 0
        for _, r in g.iterrows():  # replay the stream cut sequentially
            assert r["pack_id"] == start // budget
            assert r["pack_offset"] == start % budget
            start += r["n_tokens"]


@settings(max_examples=8, deadline=None)
@given(
    sizes=st.dictionaries(
        st.sampled_from(["x", "y", "z"]), st.integers(min_value=1, max_value=15),
        min_size=1,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_quota_counts_and_contiguous_ranks(sizes, k):
    spark = _get_spark()
    rows = [(100 * gi + j, src) for gi, (src, n) in enumerate(sizes.items())
            for j in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = quota_sample(df, group_col="source", id_col="doc_id", k=k).collect()
    by_src: dict[str, list[int]] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["sample_rank"])
    for src, n in sizes.items():
        got = sorted(by_src.get(src, []))
        assert got == list(range(1, min(k, n) + 1))


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        min_size=1, max_size=20,
    ),
    thr=st.sampled_from([0.0, 0.3, 1.0]),
)
def test_expectations_match_reference_counts(vals, thr):
    spark = _get_spark()
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    out = evaluate_expectations(
        df, {"v_nonneg": F.col("v") >= 0}, max_violation_rate=thr
    ).collect()[0]
    expected_viol = sum(1 for v in vals if v is None or v < 0)
    assert out["n_rows"] == len(vals)
    assert out["n_violations"] == expected_viol
    assert out["passed"] == (expected_viol / len(vals) <= thr)
