"""Count-Min-prefiltered heavy-hitter join — restrict a join to the
keys that occur at least ``min_count`` times in the big side, without
paying an exact full-vocabulary count shuffle up front.

The 100 TB problem: "join the fact table to the dimension, but only
for hot keys" (top-seller analyses, abuse/hot-entity investigation,
skew quarantines). Done naively, finding the hot keys is itself a full
groupBy-count over the fact table's entire key vocabulary — a
vocabulary-sized shuffle just to discover that 95% of keys are cold.
A Count-Min sketch of the key frequencies is CONSTANT-size (d·w
counters) no matter the data size, and its point estimates NEVER
underestimate (est ≥ exact, the one-sided CMS guarantee), so filtering
on ``cms_estimate(key) >= min_count`` map-side keeps every truly-heavy
key's rows while dropping the vast majority of cold rows before any
shuffle. The exact count then runs on the SURVIVORS only — correct
because the prefilter is per-key deterministic (every row of a key
shares the same estimate), so a surviving key keeps ALL its rows and
its survivor-count equals its global count — and eliminates the CMS
false positives. Result is therefore EXACTLY the plain heavy-hitter
join (the bloom_join proven-equal-result discipline: the sketch must
be invisible in the output, which is what the catalog oracle — plain
SQL, no sketch anywhere — checks).

Plumbing shared with the package's sketch discipline: the sketch build
is one constant-size groupBy; the finished d·w counter table is
collected once (bounded by the SKETCH size, never the data) and
shipped back as a SCALAR SUBQUERY over a one-row view
(``bloom_join.ship_as_scalar_subquery``), so the probe sees it as a
runtime constant with no Python and no join. Round 11 moved here from
a broadcast-crossJoin array-column carry — the exact shape whose
per-row cost the bloom probe measured and abandoned in round 10
(34 s → 3.4 s on its x10 rung; this operator's own A/B is in
BASELINE.md round 11). Hashes are seeded ``xxhash64`` — the JVM-native hash,
NOT the md5+conv construction the ORACLED sketches (countmin/kmv/hll)
use, deliberately and for the same reason bloom_join documents: these
bucket positions never need cross-engine replay (the oracle is the
plain join, sketch invisible), and xxhash64 runs in whole-stage
codegen at a fraction of md5-string-parse cost — the md5 probe
measured ~4× slower over the fact scan, which is the whole hot path.
h2 is forced into [1, width-1] (the Kirsch-Mitzenmacher h2≡0 collapse,
see bloom_join.seeded_double_hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_exprs(key: Column, *, depth: int, width: int) -> list[Column]:
    """The d CMS bucket positions for a key: (h1 + j·h2) mod w over
    ``bloom_join.seeded_double_hash`` — ONE copy of the ANSI-overflow
    reduction order and the h2-nonzero guard across the Bloom and CMS
    operators (round-6 review dedup finding). Build and probe MUST
    share this function — a drifted hash family silently estimates
    garbage."""
    from .bloom_join import seeded_double_hash

    h1, h2 = seeded_double_hash(key, width)
    return [F.pmod(h1 + F.lit(j) * h2, F.lit(width)) for j in range(depth)]


def build_cms_counters(
    occurrences: DataFrame, *, term_col: str, depth: int = 4, width: int = 8192
) -> list[int]:
    """Dense row-major counter list (index j·width + bucket) of a d×w
    CMS over ``occurrences`` — one explode-by-depth + groupBy that
    collapses map-side to ≤ d·w rows; the collect is ≤ d·w rows
    regardless of input size (the bloom build_bloom_words
    driver-boundary class)."""
    buckets = _bucket_exprs(F.col(term_col), depth=depth, width=width)
    pairs = F.array(
        *[F.struct(F.lit(j).alias("j"), b.alias("bucket")) for j, b in enumerate(buckets)]
    )
    rows = (
        occurrences.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.j").alias("j"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("s"))
        .collect()
    )
    dense = [0] * (depth * width)
    for r in rows:
        dense[int(r.j) * width + int(r.bucket)] = int(r.s)
    return dense


def cms_estimate_expr(
    key: Column, arr: Column, *, depth: int, width: int
) -> Column:
    """CMS point estimate (min over depth rows) for ``key`` against a
    dense counter ARRAY column — codegen-friendly: d element_at probes
    + one least(), no join, no Python."""
    probes = [
        F.element_at(arr, (F.lit(j * width) + b).cast("int") + 1)
        for j, b in enumerate(_bucket_exprs(key, depth=depth, width=width))
    ]
    return F.least(*probes) if depth > 1 else probes[0]


def heavy_hitter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    min_count: int,
    depth: int = 4,
    width: int = 8192,
    count_col: str = "key_count",
    counters: list[int] | None = None,
) -> DataFrame:
    """``big ⋈ small`` on ``on``, restricted to keys occurring at least
    ``min_count`` times in ``big``, with the key's exact big-side count
    carried as ``count_col``. Byte-equal to the plain heavy-hitter join
    (see module docstring for why the two-phase CMS→exact cascade is
    lossless); only the shuffle volume changes — cold-key rows die
    map-side against the broadcast sketch.

    Size ``width`` ≳ a few × the expected distinct-key count so bucket
    collisions stay rare enough to prune (an undersized sketch is
    CORRECT — estimates only grow — but prunes nothing, the same
    saturation failure mode ``bloom_join.sized_m_bits`` documents).

    Pass a prebuilt ``counters`` list (from ``build_cms_counters`` with
    the SAME depth/width, over a superset of ``big``'s keys — a
    superset only ever raises estimates, staying lossless) to reuse a
    standing sketch instead of building one per call."""
    if counters is None:
        counters = build_cms_counters(
            big.select(on), term_col=on, depth=depth, width=width
        )
    elif len(counters) != depth * width:
        raise ValueError(
            f"counters has {len(counters)} entries, expected depth*width"
            f" = {depth * width} (sketch geometry must match the probe)"
        )
    spark = big.sparkSession
    # The d·w counter table rides in as a SCALAR SUBQUERY over a
    # one-row view (bloom_join.ship_as_scalar_subquery) so it reaches
    # the probe as a runtime constant. The previous broadcast-crossJoin
    # carried the 32k-long array as a per-row COLUMN through FilterExec
    # — the exact shape the bloom probe abandoned in round 10 (34 s →
    # 3.4 s on its x10 rung); the d textual repeats of the subquery in
    # the min-over-depth probe execute once (ReuseSubquery).
    from .bloom_join import ship_as_scalar_subquery

    arr, view = ship_as_scalar_subquery(spark, counters)
    est = cms_estimate_expr(F.col(on), arr, depth=depth, width=width)
    survivors = (
        big.filter(est >= F.lit(min_count))
        # survivors feed TWO consumers (the exact count and the final
        # join); a lazy localCheckpoint computes the fact scan + probe
        # ONCE at first materialization instead of per consumer — the
        # materialized set is hot-row-sized (the prefilter's output),
        # a fraction of rescanning the fact table, and the
        # ContextCleaner frees it when the frame is dropped
        .localCheckpoint(eager=False)
    )
    spark.catalog.dropTempView(view)
    # exact counts over survivors only == global counts for every
    # surviving key (per-key-deterministic prefilter); drops CMS false
    # positives. The count table is hot-key-sized — broadcast it back.
    exact_hot = (
        survivors.groupBy(on)
        .agg(F.count(F.lit(1)).alias(count_col))
        .filter(F.col(count_col) >= min_count)
    )
    return survivors.join(F.broadcast(exact_hot), on).join(small, on, "inner")
