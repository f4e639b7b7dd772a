"""Embedding-cosine near-duplicate pairs.

Cosine is computed with JVM built-ins (zip_with product + aggregate
sum) over ``array<float>`` columns cast to double — no Python on the
data path.

Two pair generators:

- ``embedding_near_dup_pairs`` — exact all-pairs theta-join. O(n²)
  cartesian; kept ONLY as the recall oracle inside tests. Not a
  catalog query (a BroadcastNestedLoopJoin cannot survive 100 TB).
- ``banded_embedding_near_dup_pairs`` — the scale path: deterministic
  sign-LSH banding (md5-derived ±1 projections, integer-quantized dot
  products) generates candidates via an equi-join on (band, signature);
  only candidates pay the exact cosine verify. Every emitted pair is
  exactly verified ≥ threshold; recall < 1 is the inherent LSH
  trade-off (bits/bands tunable per threshold). Because the banding is
  hash-derived and integer-exact, a SQL engine can replay the identical
  candidate set — see ``plans/content.py`` for the DuckDB oracle.

Measured regime boundary (tests/scale_stress.py emb_lsh; BASELINE.md
"Round-9 scale stress"): candidate fraction is SCALE-INVARIANT at
fixed (bands, bits) — 40.8 % of all pairs at bits=4 on both 2k and
20k vectors — so candidates grow quadratically with a constant that
``bits`` divides down (~2^bits per band); bits must track log(n).
Whether the knob is usable depends on the threshold: a boundary pair
at cosine t agrees with a random hyperplane with p = 1 − acos(t)/π,
so at t=0.3 (p≈0.60) bits 4→12 collapses recall 0.70→0.02 (use IVF —
similarity/ivf.py — for low-threshold similarity), while at t=0.95
(p≈0.90) bits=12 keeps recall ≈ 1.0 at 0.33 % candidates. Sign-LSH
banding is the HIGH-threshold near-dup tool.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_sim_expr(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<numeric> columns (double math)."""
    ad, bd = _to_double(a), _to_double(b)
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def cosine_to_const_expr(vec: Column, query_vec: list[float]) -> Column:
    """``cosine_sim_expr(vec, query)`` for a DRIVER-CONSTANT query —
    the ANN probe shape (round-11 expression-shape audit). The generic
    form pays per ROW for work that is constant across rows: the query
    lands as a CreateArray of dim literals re-built per textual
    occurrence (3× — the dot plus both norms re-evaluate ``bd``), each
    re-cast elementwise, and ``sqrt(q·q)`` — a driver-computable
    number — re-folds dim multiplies per row. Here the query is ONE
    array Literal and its norm ONE double Literal.

    Float parity with the generic form (and hence the DuckDB oracles)
    is exact: the Python ``sum`` folds x·x in the same left-to-right
    element order as ``F.aggregate``, ``math.sqrt`` and JVM/DuckDB
    sqrt are all IEEE correctly-rounded, and the final
    dot/(norm_a·norm_q) grouping is unchanged."""
    import math

    qd = [float(x) for x in query_vec]
    q_norm = math.sqrt(sum(x * x for x in qd))
    ad = _to_double(vec)
    return _dot(ad, F.lit(qd)) / (F.sqrt(_dot(ad, ad)) * F.lit(q_norm))


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with cosine >= threshold.

    Exact all-pairs baseline — O(n²) theta-join. Test/recall-oracle
    use only; the catalog path is ``banded_embedding_near_dup_pairs``.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.round(cosine_sim_expr(F.col("va"), F.col("vb")), 6)
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


QUANT_SCALE = 1_000_000


def projection_sign(band: int, bit: int, dim: int) -> int:
    """Deterministic ±1 sign for one (band, bit, dim) cell.

    Derived from md5 of ``"{band}_{bit}_{dim}"`` — first hex digit's
    ASCII parity. md5 is identical everywhere, so any engine (DuckDB
    included) can regenerate the same projection matrix and hence the
    same candidate set. Replaces seeded RNG matrices, which are
    engine-specific.
    """
    h = hashlib.md5(f"{band}_{bit}_{dim}".encode()).hexdigest()
    return 1 if ord(h[0]) % 2 == 0 else -1


def _quantized(vec: Column) -> Column:
    # round(x·1e6) as long: the sign dot products below become exact
    # integer sums, immune to float summation-order drift across engines.
    return F.transform(vec, lambda x: F.round(x.cast("double") * QUANT_SCALE, 0).cast("long"))


def band_signatures(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dims: int,
    bands: int = 8,
    bits: int = 4,
) -> DataFrame:
    """(id, band, sig) — one row per (vector, band).

    sig is the band's bit-string: bit k is 1 iff the quantized vector's
    dot product with the (band, k) ±1 projection is ≥ 0. Computed as
    pure Column expressions (one scan, no shuffle); the ±1 matrices are
    plan literals.
    """
    q = _quantized(F.col(vec_col))
    out = df.select(F.col(id_col).alias("_id"), q.alias("_q"))
    sig_cols = []
    for b in range(bands):
        bit_chars = []
        for k in range(bits):
            signs = F.array(
                *[F.lit(projection_sign(b, k, i)).cast("long") for i in range(dims)]
            )
            dot = F.aggregate(
                F.zip_with(F.col("_q"), signs, lambda x, s: x * s),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            bit_chars.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
        sig_cols.append(
            F.struct(F.lit(b).cast("long").alias("band"), F.concat(*bit_chars).alias("sig"))
        )
    return out.select(
        "_id", F.explode(F.array(*sig_cols)).alias("_bs")
    ).select("_id", F.col("_bs.band").alias("band"), F.col("_bs.sig").alias("sig"))


def banded_embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dims: int,
    threshold: float = 0.95,
    bands: int = 8,
    bits: int = 4,
) -> DataFrame:
    """(id_a, id_b, cosine) — sign-LSH candidates, exact-cosine verified.

    Scale shape: signatures in one scan → equi-join on (band, sig)
    shuffling only (band, sig, id) triples → distinct candidate pairs →
    two id-joins back to the vectors → exact cosine only on candidates.
    No cartesian anywhere. Bits/bands trade recall for pruning: more
    bits per band prunes harder but needs a higher threshold to keep
    recall (production near-dup at t≥0.9 wants bits≈8-16; the
    near-orthogonal testdata at t=0.3 uses 4).
    """
    sigs = band_signatures(
        df, id_col=id_col, vec_col=vec_col, dims=dims, bands=bands, bits=bits
    )
    a = sigs.select(F.col("_id").alias("id_a"), "band", "sig")
    b = sigs.select(F.col("_id").alias("id_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    cos = F.round(cosine_sim_expr(F.col("_va"), F.col("_vb")), 6)
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
