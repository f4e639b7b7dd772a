"""Fixed-width range bucketing on a column's global span — the shared
first stage of the bucketed-prefix decomposition used by
``operators/skyline.py`` (prefix minima), ``operators/
weighted_quantile.py`` (prefix weights), and ``operators/ranking.py``
(prefix counts).

One 2-number scalar aggregate finds the span and broadcasts back;
every row gets a bucket index in ``[0, buckets)`` from exact-width
division, with a zero-width span collapsing to bucket 0. Downstream
stages then confine ordered windows to one bucket's rows and keep the
only cross-bucket state on a ``buckets``-sized frame.

The caller owns lineage control: the input frame is referenced twice
here (bounds scalar + bucketing join), so pass an already
lazily-checkpointed frame when the upstream plan is expensive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_range_bucket(
    df: DataFrame,
    val: str,
    buckets: int,
    descending: bool = False,
    bucket_col: str = "_b",
) -> DataFrame:
    """Append ``bucket_col`` (LONG in ``[0, buckets)``): the
    fixed-width range bucket of ``val`` over its global span,
    ascending by default, reversed when ``descending`` (bucket 0
    holds the largest values)."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    bounds = df.agg(
        F.min(F.col(val).cast("double")).alias("_vlo"),
        F.max(F.col(val).cast("double")).alias("_vhi"),
    )
    width = (F.col("_vhi") - F.col("_vlo")) / F.lit(float(buckets))
    last = F.lit(buckets - 1).cast("long")
    idx = F.least(
        last,
        F.floor((F.col(val).cast("double") - F.col("_vlo")) / width),
    )
    if descending:
        # NULL val must land in the LAST bucket in BOTH directions
        # (nulls-last ordering). Ascending gets that for free —
        # least() skips the NULL floor and yields buckets-1 — but the
        # flip would send it to bucket 0, so guard explicitly.
        idx = F.when(F.col(val).isNull(), last).otherwise(last - idx)
    return (
        df.join(F.broadcast(bounds))
        .withColumn(
            "__rb_idx",
            F.when(
                F.col("_vhi") <= F.col("_vlo"), F.lit(0).cast("long")
            ).otherwise(idx),
        )
        .drop("_vlo", "_vhi")
        .withColumnRenamed("__rb_idx", bucket_col)
    )
