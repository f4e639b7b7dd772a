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
    minute/hour/day grains; sums decimal-exact."""
    dec = F.col("value").cast("decimal(18,2)")
    minute = (
        events.groupBy(
            F.date_trunc("minute", "ts").alias("bucket"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(dec).alias("sum_dec"))
    )
    hour = (
        minute.groupBy(F.date_trunc("hour", "bucket").alias("bucket"), "event_type")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_dec").alias("sum_dec"))
    )
    day = (
        hour.groupBy(F.date_trunc("day", "bucket").alias("bucket"), "event_type")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_dec").alias("sum_dec"))
    )

    def fin(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.date_format("bucket", _TS_FMT).alias("bucket_start"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_dec").cast("double").alias("sum_value"),
        )

    return fin(minute, "minute").unionByName(fin(hour, "hour")).unionByName(fin(day, "day"))
