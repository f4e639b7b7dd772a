"""SimHash bit-level correctness: single-token documents must hash to
exactly the md5-derived 64-bit digest of the token (every bit,
including the sign bit — cross-checked against Python's hashlib, a
third independent md5 implementation), and banded candidate generation
must find ALL low-hamming pairs (pigeonhole: hamming <= 3 over 4 bands
guarantees a shared band)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.dedup.simhash import (
    simhash_col,
    simhash_near_dup_pairs,
)


def _md5_value64(token: str) -> int:
    """First 16 hex chars of md5 as the signed 64-bit simhash a
    single-token document must produce (bit i of hi·2³²+lo)."""
    v = int(hashlib.md5(token.encode()).hexdigest()[:16], 16)
    return v - (1 << 64) if v >= (1 << 63) else v


def test_single_token_simhash_equals_md5_digest(spark):
    tokens = ["alpha", "bravo", "negative", "zulu", "x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.simhash
        for r in simhash_col(df, id_col="doc_id", text_col="text").collect()
    }
    want = {i: _md5_value64(t) for i, t in enumerate(tokens)}
    assert got == want
    # make sure the sign bit actually got exercised
    assert any(v < 0 for v in want.values())


def test_block_widths_partition_64_bits():
    from big_data_analysis_of_airline_data_set_spark.dedup.simhash import (
        _block_widths,
    )

    for blocks in (4, 5, 6, 7, 8, 13, 64):
        widths = _block_widths(blocks)
        assert sum(widths) == 64
        assert max(widths) - min(widths) <= 1


def test_block_combination_params_validated(spark):
    import pytest

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must exceed max_hamming"):
        simhash_near_dup_pairs(
            df, id_col="doc_id", text_col="text", max_hamming=3, blocks=3
        )
    with pytest.raises(ValueError, match="cannot exceed 64"):
        simhash_near_dup_pairs(
            df, id_col="doc_id", text_col="text", max_hamming=3, blocks=65
        )


def _twin_corpus(spark, sf_dir, n=120):
    """Documents plus exact copies of every 10th one — guarantees
    hamming-0 planted pairs so the equality tests compare non-empty
    outputs, not vacuous empties."""
    from big_data_analysis_of_airline_data_set_spark.sources.readers import (
        read_testdata_table,
    )

    docs = read_testdata_table(spark, sf_dir, "documents").limit(n)
    twins = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    return docs.select("doc_id", "text").unionByName(twins)


def test_block_combination_pairs_identical_to_banded(spark, sf_dir):
    """The Manku block-combination path (blocks=6) must return EXACTLY
    the banded path's pairs: both candidate schemes are recall-1
    supersets for hamming <= k (pigeonhole) and both verify exact
    64-bit hamming, so blocks trades join fanout against bucket
    selectivity, never output."""
    corpus = _twin_corpus(spark, sf_dir)
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(
            corpus, id_col="doc_id", text_col="text", max_hamming=3
        ).collect()
    }
    blocked = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(
            corpus, id_col="doc_id", text_col="text", max_hamming=3, blocks=6
        ).collect()
    }
    assert banded, "twin corpus must plant at least the hamming-0 pairs"
    assert blocked == banded


def test_stats_out_counts_candidates_before_verify(spark, sf_dir):
    corpus = _twin_corpus(spark, sf_dir)
    for blocks in (4, 6):
        stats: dict = {}
        out = simhash_near_dup_pairs(
            corpus,
            id_col="doc_id",
            text_col="text",
            max_hamming=3,
            blocks=blocks,
            stats_out=stats,
        )
        verified = out.count()
        assert stats["n_docs"] == corpus.count()
        assert stats["candidate_pairs"] >= verified > 0


def test_banded_pairs_complete_vs_bruteforce(spark, sf_dir):
    from big_data_analysis_of_airline_data_set_spark.sources.readers import (
        read_testdata_table,
    )

    docs = read_testdata_table(spark, sf_dir, "documents").limit(200)
    hashes = simhash_col(docs, id_col="doc_id", text_col="text")
    a = hashes.selectExpr("doc_id as id_a", "simhash as sh_a")
    b = hashes.selectExpr("doc_id as id_b", "simhash as sh_b")
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= 3)
    )
    want = {(r.id_a, r.id_b, r.hamming) for r in brute.collect()}
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(
            docs, id_col="doc_id", text_col="text", max_hamming=3
        ).collect()
    }
    assert got == want  # banding loses nothing within the pigeonhole bound


def test_default_band_path_validates_max_hamming(spark):
    """Round-10 advice (medium): the default 4-band path must reject
    max_hamming >= N_BANDS — a pair can differ one bit per band and
    share no band, so such pairs would be SILENTLY dropped (recall
    loss), unlike the block path which raises on the equivalent
    misuse. The guard routes the user to the block-combination melt."""
    import pytest

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="blocks >= 5"):
        simhash_near_dup_pairs(
            df, id_col="doc_id", text_col="text", max_hamming=4
        )
    # the same k is legal once blocks exceeds it (pigeonhole restored)
    simhash_near_dup_pairs(
        df, id_col="doc_id", text_col="text", max_hamming=4, blocks=5
    ).collect()


def test_stats_path_keeps_band_pin_for_sweep_reuse(spark, sf_dir):
    """Round-10 advice: the stats path must KEEP the single-slot band
    pin so the documented blocks=4-then-blocks=6 sweep actually reuses
    the persisted band table (the band table is blocks-independent);
    a different corpus's call then swaps the slot, so a corpora loop
    still holds at most one cached band table."""
    from big_data_analysis_of_airline_data_set_spark.dedup.simhash import (
        _BANDS_PIN,
    )

    corpus = _twin_corpus(spark, sf_dir, n=60)
    stats: dict = {}
    simhash_near_dup_pairs(
        corpus, id_col="doc_id", text_col="text", max_hamming=3,
        blocks=4, stats_out=stats,
    ).count()
    assert len(_BANDS_PIN) == 1
    pinned = _BANDS_PIN._pinned[-1]
    assert pinned.storageLevel.useMemory  # survived the stats release
    simhash_near_dup_pairs(
        corpus, id_col="doc_id", text_col="text", max_hamming=3,
        blocks=6, stats_out=stats,
    ).count()
    # same corpus: the sweep's second leg reused the very same frame
    assert _BANDS_PIN._pinned[-1] is pinned and len(_BANDS_PIN) == 1
    other = _twin_corpus(spark, sf_dir, n=30)
    simhash_near_dup_pairs(
        other, id_col="doc_id", text_col="text", max_hamming=3,
        stats_out=stats,
    ).count()
    # different corpus: slot swapped, old band table released
    assert _BANDS_PIN._pinned[-1] is not pinned and len(_BANDS_PIN) == 1
    assert not pinned.storageLevel.useMemory
