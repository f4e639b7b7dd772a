"""Sinks.

Replaces reference S4/S5 (SURVEY.md §2.1): the reference writes every
dataset as a single-file CSV via ``coalesce(1)``
(``Scripts/1_cs_777_cleaning_data.py:61,102``) — a one-task,
single-threaded write that is an anti-pattern at any scale. Here:

- Data outputs → partitioned Parquet (optionally partitioned by a column,
  e.g. Year, so the reference's temporal train/test filter becomes static
  partition pruning).
- Tiny report artifacts (metric tables, selected-feature lists — the S5
  pandas sinks) → single CSV is acceptable and kept, but implemented as
  a driver-side write of an already-small DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] | list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_report_csv(df: DataFrame, path: str, *, max_rows: int = 100_000) -> None:
    """Small report table → one headered CSV file.

    Guarded: refuses tables above ``max_rows`` so the reference's
    coalesce(1)-everything habit can't reappear on a big table.
    """
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"write_report_csv is for small report artifacts (≤{max_rows} rows); "
            f"got >{max_rows}. Use write_parquet for data outputs."
        )
    df.coalesce(1).write.mode("overwrite").options(header=True).csv(path)
