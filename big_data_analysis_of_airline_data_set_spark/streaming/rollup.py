"""Hypertable-style multi-granularity rollup: one pass over events
produces minute/hour/day continuous aggregates (the TimescaleDB
"continuous aggregate" shape).

Computed hierarchically: the minute rollup aggregates raw events; hour
and day each re-aggregate the NEXT-FINER rollup, not the raw table —
at 100 TB that's the difference between one full scan and three. All
granularities are unioned long-form with a ``grain`` tag so a single
table serves dashboards at any zoom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def multi_granularity_rollup(events: DataFrame) -> DataFrame:
    """(grain, bucket_start, event_type, n_events, sum_value) for
    minute/hour/day grains; sums decimal-exact.

    ONE pass: ``GROUPING SETS ((et,day,hour,minute), (et,day,hour),
    (et,day))`` compiles to a single scan → Expand(3) → partial+final
    aggregate — one shuffle, no union. The earlier
    union-of-three-aggregations shape re-scanned the raw table per
    branch (the hierarchical reuse existed only in the logical plan;
    Catalyst does not share subplans across a union) — three full scans
    at 100 TB — and persisting the minute level traded the re-scan for
    a materialization barrier that measured slower at every tested
    scale. Grains fall out of ``grouping_id``; day⊃hour⊃minute makes
    the sets a strict rollup hierarchy.
    """
    dec = F.col("value").cast("decimal(18,2)")
    ts = F.col("ts")
    ev = events.select(
        "event_type",
        "value",
        F.date_trunc("day", ts).alias("_day"),
        F.date_trunc("hour", ts).alias("_hour"),
        F.date_trunc("minute", ts).alias("_minute"),
    )
    agg = ev.groupingSets(
        [
            ["event_type", "_day", "_hour", "_minute"],
            ["event_type", "_day", "_hour"],
            ["event_type", "_day"],
        ],
        "event_type",
        "_day",
        "_hour",
        "_minute",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec).alias("sum_dec"),
        F.grouping_id().alias("_gid"),
    )
    # gid bits (event_type, _day, _hour, _minute): 0 = minute level,
    # 1 = minute rolled away (hour), 3 = hour+minute away (day)
    grain = (
        F.when(F.col("_gid") == 0, F.lit("minute"))
        .when(F.col("_gid") == 1, F.lit("hour"))
        .otherwise(F.lit("day"))
    )
    bucket = (
        F.when(F.col("_gid") == 0, F.col("_minute"))
        .when(F.col("_gid") == 1, F.col("_hour"))
        .otherwise(F.col("_day"))
    )
    return agg.select(
        grain.alias("grain"),
        F.date_format(bucket, _TS_FMT).alias("bucket_start"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_dec").cast("double").alias("sum_value"),
    )
