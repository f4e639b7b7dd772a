"""Named query catalog — the judge-visible surface.

Each module contributes ``QUERIES: dict[str, QuerySpec]``; this package
merges them. ``__spark_entry__.py`` exposes exactly this registry to the
driver's correctness harness.
"""

from __future__ import annotations

from .spec import QuerySpec
from . import (
    analytics_ops,
    analytics_ops2,
    analytics_ops3,
    analytics_ops4,
    analytics_ops5,
    analytics_ops6,
    analytics_ops7,
    analytics_ops8,
    analytics_ops9,
    content,
    curation_queries,
    events_queries,
    flights_job,
    ml_queries,
    multimodal_queries,
    patterns,
    relational,
    relational2,
    relational3,
    scale_ops,
    statistics,
)

_MODULES = [
    relational,
    relational2,
    relational3,
    patterns,
    statistics,
    ml_queries,
    content,
    curation_queries,
    events_queries,
    flights_job,
    scale_ops,
    multimodal_queries,
    analytics_ops,
    analytics_ops2,
    analytics_ops3,
    analytics_ops4,
    analytics_ops5,
    analytics_ops6,
    analytics_ops7,
    analytics_ops8,
    analytics_ops9,
]

# The driver's correctness harness records only the first 50 registry
# entries.  Round-13 window (r12 verdict item 8 + this round's changed
# plans): (a) every plan changed this optimization round re-proves
# first — the loop family whose edge builds dropped an exchange
# (repartition-then-distinct, operators/graph.py +
# dedup/components.py), the two KMV entries that dedup before hashing
# (sketches/kmv.py pre_distinct), the two exact-percentile entries
# whose partials spread across the session width
# (stats/winsorize.py:spread_rows_for_heavy_agg), and the two CV
# entries whose tuner moved to prefix-once fitting
# (ml/tuning.py:fit_cv_prefix_once) — 14 entries; then (b) the 21
# r6-era leftovers the r12 window note promised into r13, then (c) the
# 15 oldest r7-era rows (oldest-last-driver-row order, computed from
# CORRECTNESS_r*.json, ties by name).  14 + 21 + 15 = 50.  After this
# window the oldest latest-driver-row anywhere is r7.  The flagship
# stays driver-evidenced every round through the t1 entry() smoke
# check (and re-enters the window itself this round as an r6 row).
_CORRECTNESS_WINDOW = [
    # (a) changed plans this round
    "graph_pagerank",
    "graph_pagerank_converged",
    "graph_k_core",
    "graph_label_propagation",
    "graph_bfs_distances",
    "dedup_connected_components",
    "dedup_entity_resolution",
    "dedup_canonical_keeper",
    "sketch_kmv_distinct",
    "sketch_kmv_join_cardinality",
    "feature_winsorize_exact",
    "stats_mad_by_group",
    "ml_logistic_regression_cv",
    "ml_logistic_regression_cv_metrics_banded",
    # (b) the 21 r6-era leftovers (planner order)
    "events_peak_concurrency",
    "events_streaks",
    "events_twap",
    "events_upsert_sink_stream",
    "filter_status",
    "filter_year",
    "flagship_delay_summary_by_carrier",
    "flights_cleaning_job",
    "global_count",
    "ml_target_encoding",
    "projection",
    "scalar_functions",
    "set_intersect",
    "sketch_cms_join_size",
    "stats_ab_test",
    "stats_mannwhitney_u",
    "stats_multi_ols",
    "stats_welch_ttest",
    "string_functions",
    "top_k",
    "union_schema_evolution",
    # (c) the 15 oldest r7-era rows (name order within the era)
    "curation_temperature_mixture",
    "embedding_kmeans_assign",
    "embedding_label_centroids",
    "embedding_pq_codebook",
    "events_cohort_ltv",
    "events_funnel_ttc",
    "events_funnel_windowed",
    "events_uplift_by_segment",
    "graph_degree_histogram",
    "join_bucketed_colocated",
    "orders_abc_classification",
    "sink_jsonl_roundtrip",
    "sink_orc_roundtrip",
    "skyline_dominance",
    "stats_anova_oneway",
]


def all_queries() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for mod in _MODULES:
        for name, spec in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = spec
    missing = [n for n in _CORRECTNESS_WINDOW if n not in merged]
    if missing:
        raise ValueError(f"window names not in registry: {missing}")
    ordered = {n: merged[n] for n in _CORRECTNESS_WINDOW}
    for name, spec in merged.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


__all__ = ["QuerySpec", "all_queries"]
