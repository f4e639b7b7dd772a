"""Bloom-filter pre-filtered join — shrink the big side BEFORE the
shuffle when the filtering side is too big to broadcast raw.

The 100 TB join problem this solves: a selective dimension/key set
(say 10^8 keys after a filter) is too big for a raw broadcast-hash
join, so Spark falls back to shuffling BOTH sides — including the fact
table's rows that can never match. A Bloom filter of the key set is
thousands of times smaller than the keys themselves (ε=1% needs
~9.6 bits/key), broadcasts trivially, and drops the vast majority of
non-matching fact rows map-side, before they pay the shuffle. Bloom
filters have NO false negatives, so the subsequent exact join returns
byte-identical results — which is exactly what the catalog oracle
checks (plain-join SQL, no bloom anywhere): the optimization must be
invisible in the output.

This is the same idea as Spark's own runtime row-level filtering
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, the Catalyst
`BloomFilterAggregate` rewrite) — implemented here as an explicit,
plan-stable operator because (a) the runtime rewrite only triggers
under cost heuristics the user can't pin, and (b) the explicit form
works on any join the planner can't see through (UDF-derived keys,
unions, non-equi pre-stages).

Construction is fully distributed and deterministic:
- k hash positions per key via the Kirsch-Mitzenmacher double-hashing
  trick (h1 + i·h2 mod m) over two seeded ``xxhash64`` values — the
  JVM-native hash, NOT the md5+conv discipline the oracled sketches
  use, deliberately: the Bloom positions never need cross-engine
  replay (the oracle is the plain join), and xxhash64 runs in
  whole-stage codegen at a fraction of md5-string-parse cost
  (measured ~4× on the big-side probe);
- positions aggregate into m/64 longs with bit_or grouped by word
  index — the shuffle carries AT MOST m/64 rows regardless of input
  size;
- the finished word table is collected once (bounded by the FILTER
  size, a few KB–MB, never by data size — the same driver-boundary
  class as the DSIR bucket model) and re-broadcast as a literal array
  column, so membership tests run inside whole-stage codegen with no
  Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# 2^k as signed-long literals (k=63 is the sign bit in two's
# complement); a literal array because shiftleft() takes only a
# Python-int shift amount, not a per-row Column
_POW2 = [1 << k for k in range(63)] + [-(1 << 63)]


def _bit_mask(pos_in_word: F.Column) -> F.Column:
    return F.element_at(
        F.array(*[F.lit(w) for w in _POW2]), pos_in_word.cast("int") + 1
    )


def seeded_double_hash(col: F.Column, modulus: int) -> tuple[F.Column, F.Column]:
    """(h1, h2) for a Kirsch-Mitzenmacher family h_i = (h1 + i·h2) mod
    ``modulus`` over two seeded xxhash64 draws — shared by the Bloom
    filter and the heavy-hitter CMS (ONE copy of two load-bearing
    details, both round-5/6 review findings):

    - both hashes reduce mod ``modulus`` BEFORE combining — (h1 + i·h2)
      on raw signed-64 xxhash values overflows long, which ANSI mode
      (Spark 4 default) rejects; after reduction the largest
      intermediate is (k+1)·modulus, far inside int64;
    - h2 is forced into [1, modulus-1]: with h2 ≡ 0 every probe
      position collapses onto h1, so that key behaves like a 1-hash
      structure (a Bloom key sets ONE bit and quietly inflates the
      false-positive rate; a CMS key loses the min-over-d error
      reduction). The standard fix: draw h2 mod (modulus-1), add 1."""
    h1 = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(modulus))
    h2 = F.pmod(F.xxhash64(col, F.lit(2)), F.lit(modulus - 1)) + F.lit(1)
    return h1, h2


def _positions(col: F.Column, *, m_bits: int, k: int) -> F.Column:
    """array<long> of the k Bloom bit positions for a key:
    (h1 + i·h2) mod m, i = 0..k-1, over ``seeded_double_hash`` (see
    its docstring for the overflow and h2-nonzero disciplines)."""
    h1, h2 = seeded_double_hash(col, m_bits)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(m_bits)),
    )


def sized_m_bits(n_keys: int, *, bits_per_key: int = 10) -> int:
    """Power-of-two filter size giving ≥ ``bits_per_key`` bits per key
    (10 bits/key ≈ 1% false positives at k=7). Sizing from the actual
    key count matters: a fixed m silently saturates as the key set
    grows — at 2.4 bits/key the fill fraction passes 0.9 and the FP
    rate is ~67%, i.e. the filter stops filtering while every probe
    still pays k hashes."""
    m = 1 << 10
    while m < n_keys * bits_per_key:
        m <<= 1
    return m


def build_bloom_words(
    keys: DataFrame, key_col: str, *, m_bits: int | None = None, k: int = 7
) -> tuple[list[int], int]:
    """Distributed Bloom build → (dense list of m/64 words, m_bits).

    ``m_bits=None`` (default) sizes the filter from a count of the key
    set (one cheap aggregate on the SMALL side at build time) via
    ``sized_m_bits`` — pass an explicit power of two only when the
    artifact must match an existing layout. Shuffle volume: ≤ m/64
    rows (the word table), independent of |keys|. The returned words
    are the broadcastable artifact — persist them (with m) next to the
    dataset they summarize and reuse across queries."""
    if m_bits is None:
        m_bits = sized_m_bits(keys.count())
    n_words = m_bits // 64
    words = (
        keys.select(F.explode(_positions(F.col(key_col), m_bits=m_bits, k=k)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            _bit_mask(F.col("pos") % 64).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[int(r.w)] = int(r.word)
    return dense, m_bits


def _might_contain_cond(
    key: F.Column, arr: F.Column, *, m_bits: int, k: int
) -> F.Column:
    pos = _positions(key, m_bits=m_bits, k=k)
    return F.forall(
        pos,
        lambda p: (
            F.element_at(arr, (p / 64).cast("int") + 1).bitwiseAND(_bit_mask(p % 64))
        )
        != 0,
    )


def bloom_might_contain(
    col: F.Column, words: list[int], *, m_bits: int, k: int
) -> F.Column:
    """Boolean Column: all k bits set (no false negatives; false
    positives at the configured ε) over a LITERAL word array. Only for
    small filters (≤ a few hundred words): a many-thousand-element
    literal expression tree degrades codegen — properly-sized filters
    should go through ``apply_bloom_filter``, which ships the words as
    a broadcast array COLUMN instead."""
    return _might_contain_cond(
        col, F.array(*[F.lit(w) for w in words]), m_bits=m_bits, k=k
    )


def apply_bloom_filter(
    df: DataFrame, key_col: str, words: list[int], *, m_bits: int, k: int = 7
) -> DataFrame:
    """``df`` filtered to rows whose key might be in the filter. The
    word table rides in as a broadcast ONE-ROW array column (a
    nested-loop broadcast of a single row — free), so the filter
    expression stays small regardless of m: an 8192-word literal
    array measured 2.3× slower than the same filter as a column
    (giant literal trees fall out of efficient codegen)."""
    spark = df.sparkSession
    bf = spark.createDataFrame([(words,)], "___bf: array<long>")
    cond = _might_contain_cond(
        F.col(key_col), F.col("___bf"), m_bits=m_bits, k=k
    )
    return df.crossJoin(F.broadcast(bf)).filter(cond).drop("___bf")


def bloom_prefiltered_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    how: str = "inner",
    m_bits: int | None = None,
    k: int = 7,
) -> DataFrame:
    """``big ⋈ small`` on ``on`` with a Bloom pre-filter of small's key
    set applied to ``big`` before the shuffle. Result is EXACTLY the
    plain join (no false negatives; false positives are eliminated by
    the real join) — only the shuffle volume changes. The filter is
    sized from the key count by default (see ``sized_m_bits``).

    ``how`` supports 'inner' and 'left_semi' (the shapes where rows of
    ``big`` without a match are dropped anyway; outer joins must keep
    non-matching rows and cannot be pre-filtered this way)."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom_prefiltered_join: unsupported how={how!r}")
    words, m = build_bloom_words(small.select(on), on, m_bits=m_bits, k=k)
    pruned = apply_bloom_filter(big, on, words, m_bits=m, k=k)
    return pruned.join(small, on, how)
