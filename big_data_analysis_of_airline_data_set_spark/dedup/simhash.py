"""SimHash near-duplicate detection.

64-bit SimHash per document from xxhash64 token hashes: for each bit,
sum +1/-1 votes across tokens, bit set iff the sum is positive. Near
dups = pairs whose simhashes differ in <= k bits (hamming via
bit_count(xor)).

All JVM built-ins: explode → xxhash64 → 64 conditional sums → bitwise
assemble. One shuffle on doc id for the vote aggregation; the pair
stage blocks on band equality (any of 4 16-bit bands equal) so the
join key is a short int, not O(n²) — same banding idea as LSH.

Rows-only correctness (xxhash64 is Spark-specific; no cross-engine
oracle), property-tested instead: identical docs → identical hash,
near-identical docs → small hamming distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import tokens_col


def simhash_col(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash long) — one row per input row."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_col(F.col(text_col))).alias("_tok"),
    ).withColumn("_h", F.xxhash64("_tok"))
    votes = toks.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return votes.select(F.col("_id").alias(id_col), sim.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) for pairs with hamming(simhash) <= k.
    Banded: with 4 16-bit bands, any pair within hamming 3 shares at
    least one exact band (pigeonhole), so candidates come from 4
    equi-joins on short keys instead of a cross join."""
    hashes = simhash_col(df, id_col=id_col, text_col=text_col)
    bands = hashes.select(
        F.col(id_col).alias("_id"),
        "simhash",
        *[
            F.shiftrightunsigned(F.col("simhash"), 16 * b).bitwiseAND(F.lit(0xFFFF)).alias(f"band{b}")
            for b in range(4)
        ],
    )
    candidates = None
    for b in range(4):
        a = bands.select(
            F.col("_id").alias("id_a"), F.col("simhash").alias("sh_a"), F.col(f"band{b}").alias("_band")
        )
        c = bands.select(
            F.col("_id").alias("id_b"), F.col("simhash").alias("sh_b"), F.col(f"band{b}").alias("_band")
        )
        cand = a.join(c, "_band").filter(F.col("id_a") < F.col("id_b")).drop("_band")
        candidates = cand if candidates is None else candidates.unionByName(cand)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        candidates.dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
