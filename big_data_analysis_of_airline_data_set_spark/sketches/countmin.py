"""Count-Min Sketch as a declarative aggregate.

A CMS is d hash tables of w counters; occurrence (term, c) increments
table[j][h_j(term) mod w] for every j; a point estimate is
min_j table[j][h_j(term) mod w] — always ≥ the true count, within
ε·N = (e/w)·N with probability 1−(1/e)^d.

The 100 TB shape is the whole point: the sketch build is ONE groupBy
over (j, bucket) with d·w ≤ a few thousand distinct keys — partial
(map-side) aggregation collapses every partition to ≤ d·w rows, so the
shuffle is constant-size regardless of corpus size or vocabulary. An
exact term count, by contrast, shuffles the full vocabulary. That's
the trade a frequency sketch buys.

Hash families are an md5 Kirsch-Mitzenmacher construction
(h1 = md5('a_'+t) prefix, h2 = md5('b_'+t) prefix, h_j = h1 + j·h2 —
2 md5s per occurrence for any depth d, sums < 2⁶¹), so a SQL oracle
replays bucket assignment, bucket sums, and therefore every estimate
exactly. KM is CORRECT here — CMS only needs each h_j pairwise-
independent WITHIN itself, and taking the min of d estimates has no
cross-family independence requirement — unlike banded MinHash, where
round 8 measured KM collapsing the AND-amplification and moved
dedup.minhash to fully independent per-family draws (see its
docstring); don't port that fix back here, there is nothing to fix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h56(prefix: str, col: Column) -> Column:
    return F.conv(F.substring(F.md5(F.concat(F.lit(prefix), col)), 1, 14), 16, 10).cast(
        "long"
    )


def count_min_sketch_table(
    occurrences: DataFrame,
    *,
    term_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(j, bucket, s): bucket sums of a d×w CMS over one row per term
    OCCURRENCE. The explode-by-depth multiplies rows d× before the
    partial agg, which immediately collapses them to ≤ d·w per
    partition — constant-size shuffle."""
    h1 = _h56("a_", F.col(term_col))
    h2 = _h56("b_", F.col(term_col))
    js = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    return (
        occurrences.select(h1.alias("_h1"), h2.alias("_h2"))
        .select("_h1", "_h2", js)
        .select("j", ((F.col("_h1") + F.col("j") * F.col("_h2")) % width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("s"))
    )


def heavy_hitters_report(
    sketch: DataFrame,
    occurrences: DataFrame,
    *,
    term_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(term, exact_count, cms_estimate, overestimates) from an
    already-built (j, bucket, s) sketch table plus the raw occurrences
    for the exact top-k reference — the kmv_report/hll_report pattern:
    ONE assembly whether the sketch came from the batch plan or a
    drained streaming state table, so the probe (and the est ≥ exact
    guarantee column) cannot diverge between the two paths."""
    exact = (
        occurrences.groupBy(F.col(term_col).alias("term"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("term"))
        .limit(k)
    )
    h1 = _h56("a_", F.col("term"))
    h2 = _h56("b_", F.col("term"))
    probes = (
        exact.select("term", "exact_count", h1.alias("_h1"), h2.alias("_h2"))
        .select(
            "term",
            "exact_count",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
            F.col("_h1"),
            F.col("_h2"),
        )
        .select(
            "term",
            "exact_count",
            "j",
            ((F.col("_h1") + F.col("j") * F.col("_h2")) % width).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("term", "exact_count")
        .agg(F.min("s").alias("cms_estimate"))
        .select(
            "term",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_count")).alias("overestimates"),
        )
    )


def heavy_hitters_with_estimates(
    occurrences: DataFrame,
    *,
    term_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Exact top-k terms with their CMS point estimates side by side:
    (term, exact_count, cms_estimate, overestimates) — ``overestimates``
    is the CMS guarantee est ≥ exact, TRUE for every row by
    construction. The exact side exists to grade the sketch; a pure
    sketch pipeline would skip it and keep only the constant-size
    aggregate. Build + report in one call (batch convenience twin of
    the streamed sketch maintenance in streaming.jobs)."""
    sketch = count_min_sketch_table(
        occurrences, term_col=term_col, depth=depth, width=width
    )
    return heavy_hitters_report(
        sketch, occurrences, term_col=term_col, k=k, depth=depth, width=width
    )


def cms_join_size_estimate(
    occ_a: DataFrame,
    occ_b: DataFrame,
    *,
    term_col_a: str,
    term_col_b: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """One-row (cms_join_size_estimate, exact_join_size, overestimates):
    the classic CMS inner-product estimator for the SIZE of an
    equi-join, |A ⋈ B| = Σ_key cntA(key)·cntB(key) — the number a join
    planner needs BEFORE running the join (pick broadcast vs shuffle,
    pre-size partitions, veto a runaway join). The estimate is

        min_j Σ_bucket A_j[bucket] · B_j[bucket]

    over the two d×w frequency sketches: every truly-matching pair
    lands in the same bucket of every row (no undercount — the same
    one-sided guarantee as the point estimate), while hash collisions
    only ADD cross-terms, and the min over d rows takes the
    least-collided one. This is the occurrence-weighted complement of
    the KMV join-cardinality query (which estimates DISTINCT key
    overlap by sketch inclusion-exclusion — a different planning
    question): two tables can share every key yet produce a tiny or a
    quadratic join depending on multiplicities, which only the inner
    product sees.

    Scale shape: each sketch is the usual constant-size groupBy
    (≤ d·w rows shuffled regardless of table size); the inner product
    is a (j, bucket)-keyed join of two ≤ d·w-row tables — sketch-sized
    work end to end. In production the sketches would be standing
    artifacts maintained per table/partition and merged by cell-wise
    SUM; the exact count here rides along as the accuracy reference
    (itself Σ cntA·cntB over a key-level join — the full shuffle the
    sketch path avoids). Everything is exact integer arithmetic over
    md5-replayable hashes, so a SQL oracle re-derives estimate AND
    reference bit-for-bit."""
    a = count_min_sketch_table(
        occ_a, term_col=term_col_a, depth=depth, width=width
    ).select("j", "bucket", F.col("s").alias("_sa"))
    b = count_min_sketch_table(
        occ_b, term_col=term_col_b, depth=depth, width=width
    ).select("j", "bucket", F.col("s").alias("_sb"))
    # min over a SPINE of all d rows: a row whose buckets never
    # collide across the two sketches has inner product 0 and must
    # say so — dropping it (a bare inner-join groupBy) would both
    # inflate the min and emit NULL when NO buckets overlap anywhere
    # (disjoint inputs), instead of the correct 0
    spine = occ_a.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("j")
    )
    ip = (
        a.join(b, ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("_sa") * F.col("_sb")).alias("_ip"))
    )
    est = (
        spine.join(ip, "j", "left")
        .agg(
            F.min(F.coalesce(F.col("_ip"), F.lit(0)))
            .cast("long")
            .alias("cms_join_size_estimate")
        )
    )
    ca = occ_a.groupBy(F.col(term_col_a).alias("_t")).agg(
        F.count(F.lit(1)).alias("_ca")
    )
    cb = occ_b.groupBy(F.col(term_col_b).alias("_t")).agg(
        F.count(F.lit(1)).alias("_cb")
    )
    exact = ca.join(cb, "_t").agg(
        F.coalesce(F.sum(F.col("_ca") * F.col("_cb")), F.lit(0))
        .cast("long")
        .alias("exact_join_size")
    )
    return est.crossJoin(exact).select(
        "cms_join_size_estimate",
        "exact_join_size",
        (F.col("cms_join_size_estimate") >= F.col("exact_join_size")).alias(
            "overestimates"
        ),
    )
