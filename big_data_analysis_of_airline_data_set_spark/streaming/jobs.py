"""Structured Streaming jobs over the events table.

``readStream`` file source with the pinned events schema → the SAME
window transforms as batch (streaming.windows) → memory/parquet sink.
``trigger(availableNow=True)`` drains all available input then stops —
the deterministic way to exercise a real streaming query in tests and
the idiomatic backfill pattern on a cluster.

Watermarks bound state: ``withWatermark('ts', ...)`` lets Spark drop
window state once the event-time frontier passes, and
``dropDuplicatesWithinWatermark`` dedups event_ids while holding only
watermark-deep state — both are required at 100 TB/day stream volume,
where unbounded state OOMs.

The stream source reads a LANDED events directory (ts already a proper
microsecond timestamp — batch ingestion detects the driver feed's on-disk
encoding and normalizes it at landing, sources.readers._normalize_events),
so batch and stream plans are column-for-column identical.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .windows import tumbling_counts

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream_reader(
    spark: SparkSession, events_dir: str, *, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """Streaming scan of a landed events parquet directory.
    ``max_files_per_trigger=1`` keeps micro-batches file-granular (tests
    use it to exercise multi-batch incremental state); ``None`` lets
    availableNow drain in as few batches as possible — the backfill
    shape, where per-micro-batch scheduling overhead (~100 ms each)
    would otherwise dominate a many-partition directory."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_dir)


def _run_to_memory(result: DataFrame, *, query_name: str, output_mode: str) -> None:
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt-{query_name}-")
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_tumbling_stream_available_now(
    spark: SparkSession,
    events_dir: str,
    *,
    watermark: str = "30 minutes",
    width: str = "1 hour",
    query_name: str = "events_tumbling_stream",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Watermarked tumbling-window counts, drained with availableNow.
    Returns the complete result (update mode drained to memory)."""
    stream = events_stream_reader(
        spark, events_dir, max_files_per_trigger=max_files_per_trigger
    ).withWatermark("ts", watermark)
    result = tumbling_counts(stream, width=width)
    _run_to_memory(result, query_name=query_name, output_mode="complete")
    return spark.table(query_name)


def run_dedup_stream_available_now(
    spark: SparkSession,
    events_dir: str,
    *,
    watermark: str = "30 minutes",
    query_name: str = "events_dedup_stream",
) -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state."""
    stream = events_stream_reader(spark, events_dir).withWatermark("ts", watermark)
    deduped = stream.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_id", "user_id", "event_type", "value"
    )
    _run_to_memory(deduped, query_name=query_name, output_mode="append")
    return spark.table(query_name)
