"""Distributed sketches built declaratively (bounded-state aggregates
that survive any corpus size). HLL (approx_count_distinct) and KLL-ish
quantiles (approx_percentile) are Spark built-ins — catalog queries
`approx_distinct_count` / `quantiles_approx` wrap those. This package
holds the sketches Spark lacks as built-ins, constructed from
DataFrame ops with md5-replayable hash families so external SQL
engines re-derive the sketch bit-for-bit.
"""

from .countmin import count_min_sketch_table, heavy_hitters_with_estimates
from .quantile import (
    hdr_bucket_counts,
    hdr_quantile_report,
    hdr_quantiles_by_group,
)

__all__ = [
    "count_min_sketch_table",
    "heavy_hitters_with_estimates",
    "hdr_bucket_counts",
    "hdr_quantile_report",
    "hdr_quantiles_by_group",
]
