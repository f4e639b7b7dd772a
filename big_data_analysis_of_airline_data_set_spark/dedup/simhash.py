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

Measured (tests/scale_stress.py simhash; BASELINE.md "Round-9 scale
stress"): real-text simhashes cluster, so 16-bit band candidates run
at a constant ~1.5 % of ALL pairs (quadratic with a 1.5 % constant);
the opt-in ``blocks`` parameter on ``simhash_near_dup_pairs`` (Manku
block-combination, ~32-bit keys at blocks=6) cuts that constant 39×
with provably identical output — the knob to turn past ~10^5 docs.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import PlanPin
from ..text.analysis import tokens_col

N_BANDS = 4
BAND_BITS = 16

# One persisted band table per session, keyed by plan identity — the
# same bounded pin the minhash shingle cache uses (caching.PlanPin):
# a repeat call over the same corpus (e.g. blocks=4 then blocks=6 in
# a near-dup sweep — the band table is blocks-independent) reuses the
# persisted copy instead of leaking one entry per call.
_BANDS_PIN = PlanPin()


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


def _block_widths(blocks: int) -> list[int]:
    """Near-equal bit widths for ``blocks`` chunks of the 64-bit simhash
    (first ``64 % blocks`` chunks take the extra bit)."""
    base, rem = divmod(64, blocks)
    return [base + (1 if i < rem else 0) for i in range(blocks)]


def simhash_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    blocks: int = N_BANDS,
    stats_out: dict | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) for pairs with hamming(simhash) <= k.

    Banded: with the default 4 16-bit bands, any pair within hamming 3
    shares at least one exact band (pigeonhole), so candidates come
    from one melted equi-join on (band_idx, band_val) instead of a
    cross join.

    ``blocks``: the candidate-pruning knob for LARGE corpora. 16-bit
    band values only have 2^16 distinct buckets, so banded candidates
    inherit an irreducible ~4·n²/2^17 uniform-collision floor — fine at
    n=10^5, quadratic-dominated at n=10^7 (measured:
    tests/scale_stress.py, BASELINE.md "Round-9 scale stress"). Passing
    ``blocks > max_hamming`` switches to the block-combination scheme
    of Manku, Jain & Das Sarma, "Detecting Near-Duplicates for Web
    Crawling" (WWW 2007, §3): split the 64 bits into ``blocks``
    near-equal chunks; a pair within hamming k must agree EXACTLY on
    some (blocks−k)-subset of chunks (pigeonhole again), so candidates
    come from one melted equi-join over the C(blocks, k) combinations,
    each keyed on ~64·(blocks−k)/blocks bits instead of 16. blocks=6,
    k=3 keys on ~32 bits (20 combos): the uniform-collision floor drops
    by ~2^16 for a 5× key-fanout cost. Both paths verify exact hamming
    on the full 64 bits, and any pair within k is guaranteed a shared
    key in both, so THE OUTPUT IS IDENTICAL — blocks trades join fanout
    against bucket selectivity, never recall
    (tests/test_simhash_properties.py asserts the equality).

    ``stats_out``: diagnostics hook (same contract as
    dedup/minhash.py): when a dict is passed it is filled with
    ``n_docs`` and ``candidate_pairs`` (the equi-join's output size
    BEFORE hamming verification — the number that must stay
    sub-quadratic). The stats path returns an eager localCheckpoint and
    releases the candidates persist it created; the band table stays
    in its single-slot session pin so a same-corpus blocks sweep
    reuses it (the next corpus's pin() evicts it, bounding a corpora
    loop to one cached band table). The default (None) leaves the
    plan exactly as before.
    """
    if blocks != N_BANDS:
        if blocks <= max_hamming:
            raise ValueError(
                f"blocks ({blocks}) must exceed max_hamming ({max_hamming}) "
                "for the block-combination pigeonhole to hold"
            )
        if blocks > 64:
            raise ValueError(f"blocks ({blocks}) cannot exceed 64 bits")
    elif max_hamming >= N_BANDS:
        # The default banded path needs the same pigeonhole: with 4
        # bands and max_hamming >= 4 a pair can differ one bit per band
        # and share NO band — such pairs would be silently dropped
        # (recall loss), not caught. Same guard as the block path.
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < {N_BANDS} on the "
            f"default {N_BANDS}-band path — a pair can differ one bit "
            "per band and share no band; pass "
            f"blocks >= {max_hamming + 1} to key on "
            "(blocks - max_hamming)-chunk combinations instead"
        )
    bands = _BANDS_PIN.pin(simhash_bands(df, id_col=id_col, text_col=text_col))
    if blocks == N_BANDS:
        melted = bands.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.col(f"band{b}").alias("band_val"),
                        )
                        for b in range(N_BANDS)
                    ]
                )
            ).alias("_b"),
        ).select("_id", "_b.band_idx", "_b.band_val")
    else:
        # Manku block-combination melt: assemble the 64-bit simhash,
        # slice it into `blocks` chunks, and key each row under every
        # (blocks - k)-subset of chunks, packed into ONE long (the
        # selected widths sum to <= 64, so the packing is injective —
        # wrap into the sign bit is harmless).
        sim = F.lit(0).cast("long")
        for b in range(N_BANDS):
            sim = sim + F.shiftleft(F.col(f"band{b}"), b * BAND_BITS)
        widths = _block_widths(blocks)
        offsets = [sum(widths[:i]) for i in range(blocks)]

        def chunk(i: int):
            return F.shiftrightunsigned(F.col("_sim"), offsets[i]).bitwiseAND(
                F.lit((1 << widths[i]) - 1).cast("long")
            )

        combo_cols = []
        for cid, keep in enumerate(combinations(range(blocks), blocks - max_hamming)):
            key = F.lit(0).cast("long")
            for i in keep:
                key = F.shiftleft(key, widths[i]) + chunk(i)
            combo_cols.append(
                F.struct(F.lit(cid).alias("band_idx"), key.alias("band_val"))
            )
        melted = (
            bands.select(F.col(id_col).alias("_id"), sim.alias("_sim"))
            .select("_id", F.explode(F.array(*combo_cols)).alias("_b"))
            .select("_id", "_b.band_idx", "_b.band_val")
        )
    left = melted.select(F.col("_id").alias("id_a"), "band_idx", "band_val")
    right = melted.select(F.col("_id").alias("id_b"), "band_idx", "band_val")
    candidates = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    if stats_out is not None:
        # same discipline as dedup/minhash.py: pay the signature build
        # + band join once for the diagnostic count AND the verify
        candidates = candidates.persist()
        stats_out["n_docs"] = bands.count()
        stats_out["candidate_pairs"] = candidates.count()
    ba = bands.select(
        F.col(id_col).alias("id_a"), *[F.col(f"band{b}").alias(f"a{b}") for b in range(N_BANDS)]
    )
    bb = bands.select(
        F.col(id_col).alias("id_b"), *[F.col(f"band{b}").alias(f"b{b}") for b in range(N_BANDS)]
    )
    hamming = sum(
        F.bit_count(F.col(f"a{b}").bitwiseXOR(F.col(f"b{b}"))) for b in range(N_BANDS)
    )
    out = (
        candidates.join(ba, "id_a")
        .join(bb, "id_b")
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
    if stats_out is not None:
        # diagnostics path: materialize NOW, then release the
        # candidates persist this call created. The band table stays
        # in its single-slot pin — a same-corpus sweep (blocks=4 then
        # blocks=6; the band table is blocks-independent) reuses the
        # persisted copy, and the NEXT corpus's pin() evicts it, so a
        # corpora loop holds at most one cached band table at a time.
        out = out.localCheckpoint(eager=True)
        candidates.unpersist()
    return out
