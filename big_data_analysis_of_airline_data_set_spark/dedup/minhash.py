"""MinHash-LSH near-duplicate detection — the scale path.

shingle → K minhash signatures → banded bucket join → exact Jaccard on
candidates only. Classic AND×OR amplification: signatures are split
into b bands of r rows (K = b·r); a pair becomes a candidate iff some
band matches exactly, so P(candidate) = 1-(1-j^r)^b — steep around the
threshold, ~0 for background similarity. (MLlib's MinHashLSH
approxSimilarityJoin offers only r=1 OR-amplification, which floods
candidates when many pairs share a little vocabulary — measured 30s vs
<5s on the 5k-doc bench for exactly that reason.)

The K hash families are INDEPENDENT per-family md5 draws: family k
hashes shingle g as the 56-bit hex prefix of ``md5("k<k>_" + g)``,
signature = min. md5 is engine-universal and integer-exact, so an
external SQL engine can replay the exact signatures, bands, and
candidate set — this is what makes the catalog query hash-checkable
against DuckDB rather than rows-only. (xxhash64 families are faster
JVM-side but exist nowhere else.)

Independence is LOAD-BEARING, not a style choice. An earlier version
used Kirsch-Mitzenmacher double hashing (h1 + k·h2 from two base
md5s, 2 md5s per shingle instead of K) — correct for Bloom filters,
ruinous for banded MinHash: every family's min is dominated by the
same few small-h1/small-h2 shingles, so the r rows WITHIN a band are
strongly correlated and the AND-amplification P(band)=j^r collapses
toward j^1. Measured on a 50k-doc corpus with ~1k planted near-dup
pairs: KM banding produced 1.79M candidates at r=2 and still 1.68M at
r=4 (the r knob did nothing — background candidates grew as ~0.13% of
ALL n²/2 pairs, i.e. quadratically); independent families produced
95k at r=2 and 1,015 at r=4. At 100 TB the extra K−2 md5s per shingle
are embarrassingly-parallel map work; a quadratic candidate join is
the end of the pipeline.

Plan shape at 100 TB:
- K signatures per row via array_min∘transform — no explode, no
  shuffle, whole-stage codegen;
- the bucket join shuffles only (band_idx, band_hash, id) triples —
  never document bodies;
- exact Jaccard runs only on candidate pairs, joining shingle arrays
  back by id.

Default b=8, r=2 (K=16): P(candidate) at j=0.5 is 0.90, at j=0.8 is
0.9998, at j=0.01 is ~0.003 — and with independent families those
textbook numbers now actually hold (see above).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import PlanPin
from ..text.analysis import tokens_col
from .ngram import shingles_from_tokens

# The shingle cache of the MOST RECENT call (single-threaded driver
# discipline, like caching.py). The returned pair frame consumes the
# persisted shingle table lazily, so the function itself cannot
# unpersist it — instead each new call releases the PREVIOUS call's
# pin, bounding a session at one pinned copy no matter how many times
# the catalog queries / bench repeats run (round-9 review finding: the
# r8 fix released only the stats_out diagnostics path). A caller still
# holding an unmaterialized result across a later call just recomputes
# — correctness is unaffected by cache eviction.
#
# PLAN-IDENTITY REUSE is load-bearing: Spark caches by CANONICAL PLAN,
# not by DataFrame object, so a repeat call over the same corpus joins
# the previous pin's cache entry rather than creating a second one.
# The first pin implementation persisted the new frame and THEN
# unpersisted the previous one — which evicted the shared entry the
# new call had just claimed, leaving every repeat call uncached. That
# is not a mild miss: without the persist barrier CollapseProject
# inlines the tokenize into the per-gram shingle lambda (the
# re-tokenize-per-gram trap ngram.py documents) and the whole chain
# runs ~5x slower (measured 9.9 s vs 2.0 s per call at sf0.1). The
# ordering lives in caching.PlanPin: same plan -> KEEP the previous
# pin; different plan (new corpus/params) -> swap.
_SHINGLE_PIN = PlanPin()


def minhash_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    stats_out: dict | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard_distance) for banded-candidate pairs whose
    EXACT Jaccard >= threshold. Docs with no shingles are excluded
    (MinHash is undefined on empty sets).

    ``stats_out``: diagnostics hook — when a dict is passed, it is
    filled with ``n_docs`` and ``candidate_pairs`` (the banded-bucket
    join's output size BEFORE exact verification, the number that must
    grow sub-quadratically for the 100-TB claim to hold). Counting it
    costs an extra action, so the default (None) leaves the plan
    exactly as before. The stats path returns an EAGER localCheckpoint
    and releases every cache it pinned (candidates + shingles) before
    returning — a diagnostics loop over many corpora in one session
    (tests/scale_stress.py) must not accumulate cached partitions."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands

    # Tokenize, spread across cores, THEN shingle: a single small input
    # file otherwise pins the whole CPU-bound shingle+hash stage to one
    # task (at real scale the file count provides parallelism and the
    # repartition collapses to a no-op-sized shuffle of token arrays).
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    shingled = (
        df.select(F.col(id_col).alias("_id"), tokens_col(F.col(text_col)).alias("_toks"))
        .repartition(parallelism, "_id")
        .select("_id", shingles_from_tokens(F.col("_toks"), n).alias("_sh"))
    )
    # persist BEFORE the size filter (a filter on a computed column
    # re-evaluates the expression), and because shingled feeds three
    # consumers (signatures + both sides of the exact verify join) —
    # without a persist the tokenize+shingle stage runs 3×. The pin
    # holder persists, reuses a plan-identical previous pin, and
    # releases a stale one (caching.PlanPin).
    shingled = _SHINGLE_PIN.pin(shingled)
    base = shingled.filter(F.size("_sh") > 0)

    # K INDEPENDENT min-hashes, shuffle-free: family k draws each
    # shingle's 56-bit integer from md5("k<k>_" + g) (hex-prefix →
    # long), min via array_min ∘ transform. Independence across the K
    # families is what makes the banded AND-amplification actually
    # selective — see the module docstring for the measured failure of
    # the double-hashing shortcut this replaces. K md5s per shingle is
    # deliberate, paid map-side once per document.
    def _minhash(k: int):
        return F.array_min(
            F.transform(
                "_sh",
                lambda s: F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"k{k}_"), s)), 1, 14),
                    16,
                    10,
                ).cast("long"),
            )
        ).alias(f"mh{k}")

    sigs = base.select("_id", *[_minhash(k) for k in range(num_hashes)])

    # br-band digests, melted to (id, band_idx, s1, s2)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            *[F.col(f"mh{b * r + j}").alias(f"s{j}") for j in range(r)],
        )
        for b in range(bands)
    ]
    melted = sigs.select("_id", F.explode(F.array(*band_cols)).alias("b")).select(
        "_id", "b.band_idx", *[F.col(f"b.s{j}") for j in range(r)]
    )

    band_keys = ["band_idx"] + [f"s{j}" for j in range(r)]
    left = melted.select(F.col("_id").alias("id_a"), *band_keys)
    right = melted.select(F.col("_id").alias("id_b"), *band_keys)
    candidates = (
        left.join(right, band_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    if stats_out is not None:
        # the count action would otherwise run the signature build +
        # band join once for the diagnostic and AGAIN for the verify
        # below — persist so the diagnostics pass pays it once
        candidates = candidates.persist()
        stats_out["n_docs"] = base.count()
        stats_out["candidate_pairs"] = candidates.count()

    # exact Jaccard on candidates only
    sh_a = base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    sh_b = base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    verified = candidates.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    out = (
        verified.select(
            "id_a", "id_b", F.round(1.0 - jac, 6).alias("jaccard_distance")
        )
        .filter(F.col("jaccard_distance") <= 1.0 - threshold)
    )
    if stats_out is not None:
        # diagnostics path: materialize NOW (eager checkpoint decouples
        # the result from the caches below), then release everything
        # this call pinned — scale_stress iterates corpora in one
        # session and must not accumulate cached partitions
        out = out.localCheckpoint(eager=True)
        candidates.unpersist()
        _SHINGLE_PIN.release(shingled)
    return out
