"""Small-file compaction.

Streaming sinks and partitioned ingests accumulate many small files;
at scale each file costs a task + a footer read, and tiny row groups
defeat min/max skipping. Compaction rewrites a parquet directory into
~target-sized files (count derived from the directory's actual bytes),
preserving partition columns.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite ``src_dir`` into ``dst_dir`` with ~target-sized files.
    Returns the number of output files requested. Writes to a NEW dir —
    atomic swap (rename) is the caller's choice, never in-place."""
    df = spark.read.parquet(src_dir)
    n_files = max(1, round(_dir_bytes(src_dir) / target_file_bytes))
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst_dir)
    return n_files
