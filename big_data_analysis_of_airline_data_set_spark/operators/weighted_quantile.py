"""Weighted median via range-bucketed prefix weights — the grouped
weighted-quantile operator without a whole-group ordered window.

No reference analogue (the reference's aggregation surface is
count/variance/correlation — mosama1994 Scripts/1-2); this is engine
surface for "median price weighted by volume" style questions, and a
second instance of the bucketed-prefix decomposition used by
``operators/skyline.py``.

The textbook plan — order the whole group by value, running-sum the
weights, pick the first row crossing half the total — puts an entire
group through ONE ordered window task. Decomposed:

1. collapse to distinct (group, value) with summed DECIMAL weights
   (hash aggregation, exact/order-independent);
2. range-bucket values on the global span (one 2-number scalar agg
   broadcast back); per-(group, bucket) weight sums are a tiny frame;
3. per-group prefix sums over that tiny frame find the single bucket
   where the cumulative weight crosses half the total, and the weight
   carried in from all prior buckets;
4. an ordered window runs ONLY inside the crossing bucket — state is
   one bucket's distinct values, 1/buckets of the group.

Exact decimal comparisons (2·cum >= total) make the crossing row
engine-deterministic; no float thresholds anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def weighted_median(
    df: DataFrame,
    group: str,
    val: str,
    weight_expr,
    buckets: int = 128,
) -> DataFrame:
    """Per-``group`` weighted lower median of ``val``.

    ``weight_expr`` must be a DECIMAL column expression (exact,
    order-independent accumulation). Returns one row per group:
    (group, weighted_median, total_weight) — the median is the
    smallest value whose cumulative weight reaches half the group
    total (the lower weighted median), total_weight a DOUBLE.
    """
    from .range_bucket import with_range_bucket

    # pairs feeds three plan references (bounds scalar, bucket sums
    # via bucketed, crossing-bucket rescan) — one lazy checkpoint or
    # the fact-table aggregation runs three times
    pairs = (
        df.groupBy(F.col(group).alias("_g"), F.col(val).alias("_v"))
        .agg(F.sum(weight_expr).alias("_w"))
        .localCheckpoint(eager=False)
    )
    bucketed = with_range_bucket(pairs, "_v", buckets)
    per_bucket = bucketed.groupBy("_g", "_b").agg(
        F.sum("_w").alias("_wb")
    )
    g_w = W.partitionBy("_g").orderBy("_b")
    cum = per_bucket.withColumn(
        "_cum", F.sum("_wb").over(g_w.rowsBetween(W.unboundedPreceding, 0))
    ).withColumn(
        "_total",
        F.sum("_wb").over(
            W.partitionBy("_g").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ),
    )
    # the single bucket where cumulative weight first reaches half the
    # total; prior-bucket carry-in = cum - own bucket weight
    carry = (
        cum.filter(F.lit(2) * F.col("_cum") >= F.col("_total"))
        .groupBy("_g")
        .agg(F.min_by(F.struct("_b", "_cum", "_wb", "_total"), "_b").alias("_s"))
        .select(
            "_g",
            F.col("_s._b").alias("_b"),
            (F.col("_s._cum") - F.col("_s._wb")).alias("_carry"),
            F.col("_s._total").alias("_total"),
        )
    )
    in_bucket = bucketed.join(F.broadcast(carry), ["_g", "_b"])
    vw = W.partitionBy("_g", "_b").orderBy("_v")
    hit = (
        in_bucket.withColumn(
            "_cumv",
            F.col("_carry")
            + F.sum("_w").over(vw.rowsBetween(W.unboundedPreceding, 0)),
        )
        .filter(F.lit(2) * F.col("_cumv") >= F.col("_total"))
        .groupBy("_g")
        .agg(
            F.min("_v").alias("weighted_median"),
            F.max("_total").cast("double").alias("total_weight"),
        )
    )
    return hit.select(
        F.col("_g").alias(group), "weighted_median", "total_weight"
    )
