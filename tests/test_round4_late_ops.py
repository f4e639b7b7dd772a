"""Unit tests for the late round-4 operators: audio front-end
features, DSIR importance resampling, and quantized-rerank ANN.

The catalog-level oracle parity for each lives in the driver sweep
(plans registry); these tests pin the SEMANTICS on hand-constructed
inputs where the expected values are computable by eye.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.curation.dsir import (
    dsir_resample,
    dsir_scores,
)
from big_data_analysis_of_airline_data_set_spark.multimodal.codecs import (
    encode_wav_pcm16,
)
from big_data_analysis_of_airline_data_set_spark.multimodal.synthetic import (
    audio_feature_audit,
)
from big_data_analysis_of_airline_data_set_spark.similarity.brute import (
    brute_force_topk,
)
from big_data_analysis_of_airline_data_set_spark.similarity.quantized_rerank import (
    _int8_codes,
    quantized_rerank_topk,
)


# ------------------------- audio features -------------------------


def _asset_df(spark, samples, rate=8000, asset_id=1):
    payload = encode_wav_pcm16(np.asarray(samples, dtype=np.int16), sample_rate=rate)
    return spark.createDataFrame(
        [(asset_id, "audio", bytearray(payload), "audio/wav")],
        "asset_id long, modality string, payload binary, mime_type string",
    )


def test_audio_features_known_signal(spark):
    # s = [3, -1, 2, -2]: energy 9+1+4+4=18, ZCR: 3 strict sign flips,
    # peak 3; frames (i*4//4 = i) → each sample its own frame, loudest
    # is i=0 (energy 9).
    row = audio_feature_audit(_asset_df(spark, [3, -1, 2, -2])).first()
    assert row.n_samples == 4
    assert row.energy == 18
    assert row.zero_crossings == 3
    assert row.peak == 3
    assert row.loudest_frame == 0


def test_audio_features_zero_not_a_crossing_and_tie(spark):
    # zeros never flip sign (strict product < 0); equal frame energies
    # tie to the LOWEST frame index.
    row = audio_feature_audit(_asset_df(spark, [5, 0, 5, 0, -5, 0, -5, 0])).first()
    # every adjacent product touches a 0 → no STRICT sign flip anywhere
    assert row.zero_crossings == 0
    assert row.energy == 4 * 25
    # frames of 8 samples: [0,1],[2,3],[4,5],[6,7] → energies 25 each
    assert row.loudest_frame == 0


# ------------------------- DSIR -------------------------


def _docs(spark):
    rows = [
        # target domain speaks "alpha beta", background speaks "gamma delta"
        (1, "alpha beta alpha", "t"),
        (2, "beta alpha beta", "t"),
        (3, "gamma delta gamma", "b"),
        (4, "delta gamma delta", "b"),
        (5, "alpha beta gamma", "b"),  # background doc with target vocab
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dsir_scores_rank_target_vocab_higher(spark):
    scored = dsir_scores(
        _docs(spark),
        id_col="doc_id",
        text_col="text",
        domain_col="source",
        target_domains=("t",),
        n_buckets=64,
    )
    s = {r.doc_id: r.dsir_score for r in scored.collect()}
    # pure target-vocab docs beat pure background-vocab docs; the mixed
    # doc sits strictly between
    assert min(s[1], s[2]) > s[5] > max(s[3], s[4])


def test_dsir_resample_deterministic_topk(spark):
    sel = dsir_resample(
        _docs(spark),
        id_col="doc_id",
        text_col="text",
        domain_col="source",
        target_domains=("t",),
        k=3,
        n_buckets=64,
    )
    ids = [r.doc_id for r in sel.collect()]
    assert sorted(ids) == [1, 2, 5]
    again = dsir_resample(
        _docs(spark),
        id_col="doc_id",
        text_col="text",
        domain_col="source",
        target_domains=("t",),
        k=3,
        n_buckets=64,
    )
    assert sorted(r.doc_id for r in again.collect()) == sorted(ids)


# ------------------------- quantized rerank -------------------------


def test_int8_codes_contract():
    x = np.array([1.0, -0.5, 0.25])
    c = _int8_codes(x)
    assert c.tolist() == [127, -63, 32]  # floor(±63.5+0.5)=∓63/32? see below
    # floor(-0.5*127 + 0.5) = floor(-63.0) = -63; floor(0.25*127+0.5)=32
    assert _int8_codes(np.zeros(4)).tolist() == [0, 0, 0, 0]


def test_quantized_rerank_matches_brute_on_testdata(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    brute = brute_force_topk(e, qv, id_col="vec_id", vec_col="embedding", k=10)
    quant = quantized_rerank_topk(
        e, qv, id_col="vec_id", vec_col="embedding", k=10, candidates=30
    )
    b = [(r.id, r.cosine) for r in brute.collect()]
    q = [(r.id, r.cosine) for r in quant.select("id", "cosine").collect()]
    # 3× candidate pool recovers the exact top-10 at this scale — the
    # recall contract the catalog query's shared-shape oracle relies on
    assert q == b


def test_quantized_rerank_int_score_bound(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = e.filter(F.col("vec_id") == 0).first()
    qv = [float(x) for x in row.embedding]
    d = len(qv)
    quant = quantized_rerank_topk(
        e, qv, id_col="vec_id", vec_col="embedding", k=5, candidates=10
    )
    for r in quant.collect():
        assert abs(r.int_score) <= d * 127 * 127
    # the query itself is its own nearest neighbor with max int score
    top = quant.first()
    assert top.id == 0 and top.cosine == pytest.approx(1.0)
