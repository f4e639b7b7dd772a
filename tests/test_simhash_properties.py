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
