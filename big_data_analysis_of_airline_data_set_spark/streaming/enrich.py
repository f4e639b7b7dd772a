"""Stream-static enrichment: join a stream against a slowly-changing
dimension table, then aggregate on the enriched attribute.

The standard deployment shape at scale: the fact stream is unbounded,
the dimension is small and broadcast — Structured Streaming re-plans
the static side per micro-batch, so a dimension refresh (new snapshot
under the same path) is picked up without restarting the query. The
explicit ``F.broadcast`` keeps the join shuffle-free on the stream
side: state-free enrichment, watermark only needed by the downstream
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dimension(
    stream_df: DataFrame,
    dim_df: DataFrame,
    *,
    stream_key: str,
    dim_key: str,
    dim_cols: tuple[str, ...] | list[str],
) -> DataFrame:
    """Broadcast inner join of an unbounded stream to a static dim."""
    dim = F.broadcast(dim_df.select(dim_key, *dim_cols))
    return stream_df.join(
        dim, stream_df[stream_key] == dim[dim_key], "inner"
    ).drop(dim_key)


def enriched_segment_counts(
    stream_df: DataFrame,
    dim_df: DataFrame,
    *,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    segment_col: str = "c_mktsegment",
) -> DataFrame:
    """Per-segment event counts/value sums over the enriched stream —
    runs identically in batch (DataFrame-symmetric, like
    streaming.windows transforms)."""
    enriched = enrich_with_dimension(
        stream_df, dim_df,
        stream_key=stream_key, dim_key=dim_key, dim_cols=(segment_col,),
    )
    return enriched.groupBy(segment_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "sum_value"
        ),
    )


def run_enriched_stream_available_now(
    spark,
    events_dir: str,
    dim_df: DataFrame,
    *,
    query_name: str = "enriched_counts",
) -> DataFrame:
    """Drain the enrichment + aggregation with availableNow into a
    memory sink (complete mode: the aggregate is global per segment)."""
    from .jobs import _run_to_memory, events_stream_reader

    stream = events_stream_reader(spark, events_dir)
    result = enriched_segment_counts(stream, dim_df)
    _run_to_memory(result, query_name=query_name, output_mode="complete")
    return spark.table(query_name)
