"""Distributed sketches built declaratively (bounded-state aggregates
that survive any corpus size). HLL (approx_count_distinct) and KLL-ish
quantiles (approx_percentile) are Spark built-ins — catalog queries
`approx_distinct_count` / `quantiles_approx` wrap those. This package
holds the sketch forms Spark's built-ins don't give you: the sketch as
a MERGEABLE TABLE (register/cell/bucket rows you can store, union
across days/clusters, and maintain as streaming state) with
engine-replayable construction (md5 hash families, integer bucket
arithmetic) so external SQL engines re-derive every estimate
bit-for-bit — e.g. quantile.py's HDR bucket table vs approx_percentile,
whose KLL compactor state is engine-private and neither mergeable from
SQL nor maintainable as a streaming aggregate.
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
