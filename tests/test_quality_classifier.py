"""Hashed n-gram quality scorer (text/quality_classifier.py): edge
cases + determinism + plan shape (the catalog oracle covers value
parity with DuckDB)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.text.quality_classifier import (
    _SIGMOID_SCALE,
    _W_MOD,
    quality_scores,
)


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "single"),
            (3, ""),
            (4, "   "),
            (5, "the quick brown fox"),  # duplicate of 1
        ],
        "doc_id long, text string",
    )
    return {r.doc_id: r for r in quality_scores(df).collect()}


def test_gram_counts(scored):
    # 4 tokens → 4 unigrams + 3 bigrams
    assert scored[1].n_grams == 7
    # single token → 1 unigram, no bigrams
    assert scored[2].n_grams == 1


def test_identical_text_identical_score(scored):
    assert scored[1].quality_score == scored[5].quality_score
    assert scored[1].weight_numerator == scored[5].weight_numerator


def test_score_matches_numerator(scored):
    r = scored[1]
    raw = r.weight_numerator / ((_W_MOD // 2) * r.n_grams)
    expected = round(1.0 / (1.0 + math.exp(-_SIGMOID_SCALE * raw)), 6)
    assert abs(r.quality_score - expected) < 1e-9


def test_empty_docs_score_neutral(scored):
    for doc_id in (3, 4):
        # split('', '\s+') yields [''] — one empty-string gram; the
        # hash of '' is a fixed bucket, so the score is deterministic
        # and bounded, never NULL/NaN
        assert scored[doc_id].quality_score is not None
        assert 0.0 <= scored[doc_id].quality_score <= 1.0


def test_scores_bounded_and_plan_shuffle_free(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i*7%13}") for i in range(200)],
        "doc_id long, text string",
    )
    out = quality_scores(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only pass
    stats = out.agg(
        F.min("quality_score").alias("lo"), F.max("quality_score").alias("hi")
    ).first()
    assert 0.0 < stats.lo <= stats.hi < 1.0
