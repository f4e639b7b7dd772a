"""Bucketed tables: co-located, shuffle-free joins.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle. Writing
both sides bucketed by the join key (same bucket count) lets Spark plan
a SortMergeJoin with NO Exchange on either side — each task joins
bucket i against bucket i. This module wraps the saveAsTable bucketing
API (bucketed layout requires the session catalog; plain parquet paths
don't carry bucket metadata).

tests/test_bucketing.py asserts the bucketed join plan is
exchange-free while the unbucketed twin shuffles both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    *,
    bucket_by: str,
    num_buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    sorted) by the join key. ``path`` makes it an external table at an
    explicit location (keeps temp artifacts out of the session
    warehouse dir)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    plans without a shuffle when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
