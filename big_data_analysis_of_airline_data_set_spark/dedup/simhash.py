"""SimHash near-duplicate detection.

64-bit SimHash per document from md5 token digests: for each bit, sum
+1/-1 votes across tokens, bit set iff the sum is positive. Near dups =
pairs whose simhashes differ in <= k bits (hamming via bit_count(xor)).

The 64 bits come from the first 16 hex chars of ``md5(token)``, split
into two 32-bit halves parsed with ``conv`` — md5 is engine-universal
and the vote sums are integer-exact, so an external SQL engine can
replay the identical simhashes, bands, and candidate pairs (this is
what makes the catalog query hash-checkable against DuckDB; the
previous xxhash64 variant was Spark-only and hence rows-only).

All JVM built-ins: explode → md5/conv → 64 conditional sums → band
assembly. One shuffle on doc id for the vote aggregation; the pair
stage melts the 4 16-bit bands and equi-joins on (band_idx, band_val)
— any pair within hamming 3 shares at least one exact band
(pigeonhole), so candidates come from a short-key equi-join, not O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import tokens_col

N_BANDS = 4
BAND_BITS = 16


def _hex_long(hex_col):
    """Parse an 8-hex-char column into a non-negative long (0..2^32-1)."""
    return F.conv(hex_col, 16, 10).cast("long")


def simhash_bands(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """(id, band0..band3) — the four 16-bit chunks of the 64-bit
    simhash (band b covers bits 16b..16b+15, LSB-first over
    hi·2³² + lo where hi/lo are the digest's two 32-bit halves)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_col(F.col(text_col))).alias("_tok"),
    ).withColumn("_hx", F.md5(F.col("_tok")))
    toks = toks.select(
        "_id",
        _hex_long(F.substring("_hx", 1, 8)).alias("_hi"),
        _hex_long(F.substring("_hx", 9, 8)).alias("_lo"),
    )

    def bit(i: int):
        src = F.col("_lo") if i < 32 else F.col("_hi")
        return F.shiftright(src, i % 32).bitwiseAND(F.lit(1))

    votes = toks.groupBy("_id").agg(
        *[
            F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"v{i}")
            for i in range(64)
        ]
    )
    band_cols = []
    for b in range(N_BANDS):
        band = F.lit(0).cast("long")
        for j in range(BAND_BITS):
            band = band + F.when(
                F.col(f"v{b * BAND_BITS + j}") > 0, F.lit(1 << j).cast("long")
            ).otherwise(0)
        band_cols.append(band.alias(f"band{b}"))
    return votes.select(F.col("_id").alias(id_col), *band_cols)


def simhash_col(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash long) — the bands assembled into one two's-complement
    64-bit value (bit 63 is the sign bit)."""
    bands = simhash_bands(df, id_col=id_col, text_col=text_col)
    sim = F.lit(0).cast("long")
    for b in range(N_BANDS):
        sim = sim + F.shiftleft(F.col(f"band{b}"), b * BAND_BITS)
    return bands.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) for pairs with hamming(simhash) <= k.
    Banded: with 4 16-bit bands, any pair within hamming 3 shares at
    least one exact band (pigeonhole), so candidates come from one
    melted equi-join on (band_idx, band_val) instead of a cross join."""
    bands = simhash_bands(df, id_col=id_col, text_col=text_col).persist()
    melted = bands.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_val")
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_b.band_idx", "_b.band_val")
    left = melted.select(F.col("_id").alias("id_a"), "band_idx", "band_val")
    right = melted.select(F.col("_id").alias("id_b"), "band_idx", "band_val")
    candidates = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ba = bands.select(
        F.col(id_col).alias("id_a"), *[F.col(f"band{b}").alias(f"a{b}") for b in range(N_BANDS)]
    )
    bb = bands.select(
        F.col(id_col).alias("id_b"), *[F.col(f"band{b}").alias(f"b{b}") for b in range(N_BANDS)]
    )
    hamming = sum(
        F.bit_count(F.col(f"a{b}").bitwiseXOR(F.col(f"b{b}"))) for b in range(N_BANDS)
    )
    return (
        candidates.join(ba, "id_a")
        .join(bb, "id_b")
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
